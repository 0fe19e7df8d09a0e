"""Single-process A/B of packet-kernel variants on REAL sorted
secondary rays (atrium): leaf-gate on/off x packet size.  Min-over-reps
in one process so relay noise cancels.

    python experiments/leaf_gate_ab.py [detail]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vkpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def bounce_rays(dev, W=1920, H=1080):
    """Bounce-1 rays exactly as the production wavefront produces them,
    already (octant, Morton)-sorted."""
    from vulkan_pathtracer_tpu.app.camera_path import orbit_path
    from vulkan_pathtracer_tpu.models.camera import Camera
    from vulkan_pathtracer_tpu.ops import rng as rngmod
    from vulkan_pathtracer_tpu.ops.brdf import ShadingInfo, sample_brdf
    from vulkan_pathtracer_tpu.ops.intersect import MISS_T
    from vulkan_pathtracer_tpu.ops.vecmath import dot, mix
    from vulkan_pathtracer_tpu.render.pipeline import (
        _pixel_seeds, _tile_order, generate_rays,
    )
    from vulkan_pathtracer_tpu.render.shading import (
        get_material_data, get_triangle_data,
    )
    from vulkan_pathtracer_tpu.render.wavefront import (
        ORIGIN_OFFSET, ROUGHNESS_FLOOR, F0_DIELECTRIC, _bounce_sort_key,
        _closest_hit,
    )

    cam = Camera(aspect_ratio=W / H)
    orbit_path(radius=4.5, height=2.2, duration=4.0,
               center=(0.0, 1.2, 0.0)).apply(cam, 0.0)
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())

    @jax.jit
    def make():
        o, d = generate_rays(pos, hor, ver, fwd, W, H)
        sx, sy = _pixel_seeds(W, H, jnp.uint32(1))
        t_order, _ = _tile_order(H, W)
        t_order = jnp.asarray(t_order)
        o, d, sx, sy = o[t_order], d[t_order], sx[t_order], sy[t_order]
        hit = _closest_hit(dev, o, d, None, "auto", phase="primary")
        did = hit.t < MISS_T
        tri = get_triangle_data(dev, hit)
        mat = get_material_data(dev, tri)
        out_dir = -d
        sh = ShadingInfo(
            normal=mat.normal, out_dir=out_dir,
            lambert_out=dot(mat.normal, out_dir),
            fresnel_0=mix(jnp.float32(F0_DIELECTRIC), mat.albedo[:, :3],
                          mat.metallic[:, None]),
            diffuse_albedo=mat.albedo[:, :3]
            - mat.metallic[:, None] * mat.albedo[:, :3],
            roughness=jnp.maximum(ROUGHNESS_FLOOR, mat.roughness),
        )
        _, _, rx, ry = rngmod.pcg2d(sx, sy)
        o2 = o + hit.t[:, None] * d + tri.geometry_normal * ORIGIN_OFFSET
        d2 = sample_brdf(sh, rx, ry)
        alive = did & (dot(sh.normal, d2) > 0.0)
        key = _bounce_sort_key(dev, o2, d2, alive)
        order = jnp.argsort(key)
        return o2[order], d2[order], alive[order]

    return make()


def main():
    from assets.procedural import make_atrium
    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
    from vulkan_pathtracer_tpu.ops.pallas_traverse import pallas_closest_hit

    detail = float(sys.argv[1]) if len(sys.argv) > 1 else 4.1
    path = os.path.join(tempfile.gettempdir(), f"bench_atrium_{detail}.glb")
    if not os.path.exists(path):
        make_atrium(path, detail=detail)
    scene = gltf.load(path)
    dev = build_device_scene(scene, build_bvh=True, max_leaf_size=8)
    print(f"tris={dev.num_triangles}", flush=True)

    if os.environ.get("VARIANTS") == "prim":
        # Tile-ordered PRIMARY rays instead of bounce rays.
        from vulkan_pathtracer_tpu.app.camera_path import orbit_path
        from vulkan_pathtracer_tpu.models.camera import Camera
        from vulkan_pathtracer_tpu.render.pipeline import (
            _tile_order, generate_rays,
        )

        cam = Camera(aspect_ratio=1920 / 1080)
        orbit_path(radius=4.5, height=2.2, duration=4.0,
                   center=(0.0, 1.2, 0.0)).apply(cam, 0.0)
        pos, hor, ver, fwd = (jnp.asarray(v) for v in
                              cam.push_constants())
        o, d = generate_rays(pos, hor, ver, fwd, 1920, 1080)
        t_order, _ = _tile_order(1080, 1920)
        o, d = o[jnp.asarray(t_order)], d[jnp.asarray(t_order)]
        alive = None
    else:
        o, d, alive = bounce_rays(dev)
    o, d = jax.device_put(o), jax.device_put(d)
    n_alive = float(o.shape[0] if alive is None else jnp.sum(alive))
    print(f"rays: {o.shape[0]} ({n_alive:.0f} alive)", flush=True)

    from vulkan_pathtracer_tpu.ops.pallas_traverse import (
        pallas_dense_closest_hit,
    )

    which = os.environ.get("VARIANTS", "gate")
    if which == "gate":
        variants = [
            ("pk2048 gate=off", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=2048, leaf_gate=False)),
            ("pk2048 gate=on ", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=2048, leaf_gate=True)),
            ("pk4096 gate=off", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=4096, leaf_gate=False)),
            ("pk4096 gate=on ", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=4096, leaf_gate=True)),
            ("pk8192 gate=on ", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=8192, leaf_gate=True)),
        ]
    elif which == "prim":
        variants = [
            ("dense pk2048 (prod primary)",
             lambda: pallas_dense_closest_hit(
                 dev, o, d, alive, packet=2048, interleave=1)),
            ("packet pk4096", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=4096, leaf_gate=False)),
            ("packet pk2048", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=2048, leaf_gate=False)),
        ]
    elif which == "prod":
        variants = [
            ("pk4096 prod", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=4096, leaf_gate=False)),
        ]
    elif which == "pk":
        variants = [
            (f"pk{pk}", (lambda pk=pk: pallas_closest_hit(
                dev, o, d, alive, packet=pk, leaf_gate=False)))
            for pk in (2048, 3072, 4096, 5120, 6144)
        ]
    else:
        variants = [
            ("packet pk4096  ", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=4096, leaf_gate=False)),
            ("dense pk2048 C1", lambda: pallas_dense_closest_hit(
                dev, o, d, alive, packet=2048, interleave=1)),
            ("dense pk2048 C2", lambda: pallas_dense_closest_hit(
                dev, o, d, alive, packet=2048, interleave=2)),
            # dense pk4096 is INVALID (the 2-per-reduction hit packing
            # overflows at c0 == 4096; guarded with ValueError).
        ]
    reps = int(os.environ.get("REPS", 6))
    base = None
    for name, fn in variants:
        hit = fn()
        chk = float(jnp.sum(jnp.where(hit.t < 1e32, hit.t, 0.0)))
        best = 9e9
        for _ in range(reps):
            t0 = time.perf_counter()
            hit = fn()
            _ = float(hit.t.sum())
            best = min(best, time.perf_counter() - t0)
        mrays = n_alive / best / 1e6
        if base is None:
            base = best
        print(f"{name}: {best*1000:7.1f} ms  {mrays:6.2f} Mrays/s  "
              f"({base/best:.2f}x)  chk={chk:.6g}", flush=True)


if __name__ == "__main__":
    main()
