"""Scene-size scaling of the traversal tiers (VERDICT #6 evidence).

For growing atrium tessellations, time a 1080p primary pass and a
sorted secondary pass through the AUTO dispatch, and report which
kernel tier ran (pair / packet / dense / dense+hbm-leaves / XLA).
The round-2 cliff: beyond ~1M tris the XLA path silently took over;
round 3 adds the single-table pair kernel (no octant duplication) and
HBM-streamed leaves so the fast path carries to multi-M tris.

    DETAILS="4.1 8 12" [REPS=4] python experiments/scale_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("VKPT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["VKPT_PLATFORM"])
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vkpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def tier_of(dev):
    """Mirror of wavefront._closest_hit's secondary auto dispatch
    (quad -> oct -> pair -> packet -> dense -> dense+hbm -> xla)."""
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        oct_fits_vmem,
        pair_fits_vmem,
        quad_fits_vmem,
    )
    from vulkan_pathtracer_tpu.ops.pallas_traverse import (
        dense_fits_vmem,
        dense_hbm_fits,
        fits_vmem,
    )

    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        oct_hbm_fits,
        quad_hbm_fits,
    )

    if os.environ.get("VKPT_PAIR", "1") == "1":
        if quad_fits_vmem(dev):
            return "quad"
        if quad_hbm_fits(dev):
            return "quad+hbm"
        if oct_fits_vmem(dev):
            return "oct"
        if oct_hbm_fits(dev):
            return "oct+hbm"
        if pair_fits_vmem(dev):
            return "pair"
    if fits_vmem(dev):
        return "packet"
    if dense_fits_vmem(dev):
        return "dense"
    if dense_hbm_fits(dev):
        return "dense+hbm"
    return "xla"


def main():
    from assets.procedural import make_atrium
    from vulkan_pathtracer_tpu.app.camera_path import orbit_path
    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.camera import Camera
    from vulkan_pathtracer_tpu.models.device_scene import (
        build_device_scene,
    )
    from vulkan_pathtracer_tpu.render.pipeline import (
        _tile_order, generate_rays,
    )
    from vulkan_pathtracer_tpu.render.wavefront import _closest_hit

    details = [float(x) for x in
               os.environ.get("DETAILS", "4.1 8").split()]
    reps = int(os.environ.get("REPS", "4"))
    W, H = 1920, 1080

    for detail in details:
        path = f"/tmp/bench_atrium_{detail}.glb"
        if not os.path.exists(path):
            make_atrium(path, detail=detail)
        scene = gltf.load(path)
        t0 = time.perf_counter()
        dev = build_device_scene(scene, build_bvh=True,
                                 max_leaf_size=int(os.environ.get(
                                     "LEAF", 14)))
        bake_s = time.perf_counter() - t0
        tier = tier_of(dev)
        print(f"detail={detail}: tris={dev.num_triangles} "
              f"tier={tier} bake={bake_s:.1f}s", flush=True)

        cam = Camera(aspect_ratio=W / H)
        orbit_path(radius=4.5, height=2.2, duration=4.0,
                   center=(0.0, 1.2, 0.0)).apply(cam, 0.0)
        pos, hor, ver, fwd = (jnp.asarray(v) for v in
                              cam.push_constants())
        o, d = generate_rays(pos, hor, ver, fwd, W, H)
        t_order, _ = _tile_order(H, W)
        o, d = o[jnp.asarray(t_order)], d[jnp.asarray(t_order)]
        o, d = jax.device_put(o), jax.device_put(d)
        n = o.shape[0]

        @jax.jit
        def primary():
            return _closest_hit(dev, o, d, None, "auto",
                                phase="primary")

        hit = primary()
        _ = float(hit.t.sum())
        best = 9e9
        for _i in range(reps):
            t0 = time.perf_counter()
            hit = primary()
            _ = float(hit.t.sum())
            best = min(best, time.perf_counter() - t0)
        print(f"  primary: {best * 1000:7.1f} ms "
              f"{n / best / 1e6:6.2f} Mrays/s", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
