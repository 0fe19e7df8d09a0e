"""Repro harness for the oct-kernel worker fault at 2M tris.

Bakes (or reuses) the detail-36 atrium (~2.02M tris), then runs the
requested stack kernel (KERN=oct|quad|pair, RAYS=..., PACKET=...)
directly on a tiled primary ray subset.  Used to bisect the
scale-sweep crash at detail=36 (oct tier, pk2048, 2.07M rays).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("VKPT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["VKPT_PLATFORM"])
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/vkpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    from assets.procedural import make_atrium
    from vulkan_pathtracer_tpu.app.camera_path import orbit_path
    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.camera import Camera
    from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
    from vulkan_pathtracer_tpu.render.pipeline import _tile_order, generate_rays

    detail = float(os.environ.get("DETAIL", "36"))
    kern = os.environ.get("KERN", "oct")
    n_rays = int(os.environ.get("RAYS", str(256 * 1024)))
    packet = int(os.environ.get("PACKET", "2048"))
    W, H = 1920, 1080

    path = f"/tmp/bench_atrium_{detail}.glb"
    if not os.path.exists(path):
        make_atrium(path, detail=detail)
    scene = gltf.load(path)
    dev = build_device_scene(scene, build_bvh=True, max_leaf_size=14)
    print(f"tris={dev.num_triangles} kern={kern} rays={n_rays} "
          f"pk={packet}", flush=True)

    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        oct_fits_vmem, pair_fits_vmem, quad_fits_vmem,
        pallas_oct_closest_hit, pallas_pair_closest_hit,
        pallas_quad_closest_hit,
    )

    fits = {"oct": oct_fits_vmem, "quad": quad_fits_vmem,
            "pair": pair_fits_vmem}[kern](dev)
    print(f"fits_vmem[{kern}]={fits}", flush=True)

    cam = Camera(aspect_ratio=W / H)
    orbit_path(radius=4.5, height=2.2, duration=4.0,
               center=(0.0, 1.2, 0.0)).apply(cam, 0.0)
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())
    o, d = generate_rays(pos, hor, ver, fwd, W, H)
    t_order, _ = _tile_order(H, W)
    off = int(os.environ.get("RAY_OFFSET", "0"))
    o = o[jnp.asarray(t_order)][off:off + n_rays]
    d = d[jnp.asarray(t_order)][off:off + n_rays]
    o, d = jax.device_put(o), jax.device_put(d)

    call = {"oct": pallas_oct_closest_hit, "quad": pallas_quad_closest_hit,
            "pair": pallas_pair_closest_hit}[kern]
    hbm = os.environ.get("HBM", "0") == "1"

    @jax.jit
    def run():
        if kern in ("oct", "quad"):
            return call(dev, o, d, None, seed=None, packet=packet,
                        hbm_leaves=hbm)
        return call(dev, o, d, None, seed=None, packet=packet)

    t0 = time.perf_counter()
    hit = run()
    s = float(hit.t.sum())
    print(f"first run ok: {time.perf_counter() - t0:.1f}s sum={s:.6g}",
          flush=True)
    best = 9e9
    for _ in range(3):
        t0 = time.perf_counter()
        hit = run()
        _ = float(hit.t.sum())
        best = min(best, time.perf_counter() - t0)
    print(f"best {best * 1000:.1f} ms  "
          f"{n_rays / best / 1e6:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
