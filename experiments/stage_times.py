"""Stage timing: where does a 1080p 2-bounce frame go?

Times render_frame variants (bounces, sort_secondary, traversal) and
a bare primary-traversal call, min-over-reps, completion forced by
device-scalar fetches.  Run on TPU:

    python experiments/stage_times.py [grid] [segments]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vkpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    from assets.procedural import make_columns
    from vulkan_pathtracer_tpu.app.camera_path import orbit_path
    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.camera import Camera
    from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
    from vulkan_pathtracer_tpu.render.pipeline import render_frame

    if os.environ.get("SCENE") == "atrium":
        from assets.procedural import make_atrium

        detail = float(os.environ.get("DETAIL", 4.1))
        path = f"/tmp/bench_atrium_{detail}.glb"
        if not os.path.exists(path):
            make_atrium(path, detail=detail)
    else:
        grid = int(sys.argv[1]) if len(sys.argv) > 1 else 14
        segments = int(sys.argv[2]) if len(sys.argv) > 2 else 24
        path = f"/tmp/dense_cols_{grid}_{segments}.glb"
        if not os.path.exists(path):
            make_columns(path, grid=grid, segments=segments, n_materials=16)
    scene = gltf.load(path)
    dev = build_device_scene(scene, max_leaf_size=int(os.environ.get("LEAF", 8)))
    print(f"tris={dev.num_triangles}", flush=True)

    cam = Camera(aspect_ratio=1920 / 1080)
    if os.environ.get("SCENE") == "atrium":
        orbit_path(radius=4.5, height=2.2, duration=4.0,
                   center=(0.0, 1.2, 0.0)).apply(cam, 0.0)
    else:
        root_min, root_max = dev.root_bounds_host
        extent = float(np.max(root_max - root_min))
        center = (root_min + root_max) * 0.5
        orbit_path(radius=0.75 * extent, height=0.35 * extent,
                   center=tuple(center)).apply(cam, 0.0)
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())

    variants = [
        ("1-bounce (primary+shade)", dict(num_bounces=1)),
        ("2-bounce sorted", dict(num_bounces=2, sort_secondary=True)),
        ("2-bounce unsorted", dict(num_bounces=2, sort_secondary=False)),
        ("2-bounce sorted packet(r1)",
         dict(num_bounces=2, sort_secondary=True, traversal="pallas_packet")),
    ]
    for name, kw in variants:
        kw.setdefault("traversal", "auto")

        def run(kw=kw):
            img, rays = render_frame(
                dev, pos, hor, ver, fwd, jnp.uint32(1),
                num_samples=1, width=1920, height=1080, **kw,
            )
            return float(img.sum()), float(rays)

        t0 = time.time()
        _, rays = run()
        compile_s = time.time() - t0
        best = 9e9
        for _ in range(5):
            t0 = time.time()
            _, rays = run()
            best = min(best, time.time() - t0)
        print(f"{name}: {best*1000:.0f} ms  {rays/best/1e6:.1f} Mrays/s "
              f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
