"""A/B: sequential per-frame renders vs the cross-frame pooled
wavefront (frames-in-flight) on the atrium headline workload.

    python experiments/pooled_frames.py [F] [detail]
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


def main():
    from assets.procedural import make_atrium
    from vulkan_pathtracer_tpu.app.camera_path import orbit_path
    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.camera import Camera
    from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
    from vulkan_pathtracer_tpu.render.pipeline import RenderPipeline
    from vulkan_pathtracer_tpu.utils.config import RenderConfig

    F = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    detail = float(sys.argv[2]) if len(sys.argv) > 2 else 4.1
    W = int(os.environ.get("W", 1920))
    H = int(os.environ.get("H", 1080))
    bounces = int(os.environ.get("BOUNCES", 2))

    path = os.path.join(tempfile.gettempdir(), f"bench_atrium_{detail}.glb")
    if not os.path.exists(path):
        make_atrium(path, detail=detail)
    scene = gltf.load(path)
    dev = build_device_scene(scene, build_bvh=True, max_leaf_size=8)
    print(f"tris={dev.num_triangles}", flush=True)

    config = RenderConfig(num_samples=1, num_bounces=bounces,
                          resolution_x=W, resolution_y=H)
    pipe = RenderPipeline(dev, config)
    cpath = orbit_path(radius=4.5, height=2.2, duration=4.0,
                       center=(0.0, 1.2, 0.0))

    cams = []
    for f in range(F):
        cam = Camera(aspect_ratio=config.aspect_ratio)
        cpath.apply(cam, 4.0 * f / F)
        cams.append(cam)
    frames = list(range(1, F + 1))

    # Warm both paths.
    img, r = pipe.render(cams[0], 0)
    _ = float(img.sum()), float(r)
    imgs, r = pipe.render_pooled(cams, frames)
    _ = float(imgs.sum()), float(r)

    reps = int(os.environ.get("REPS", 3))
    best_seq = 9e9
    for _ in range(reps):
        t0 = time.perf_counter()
        tot = 0.0
        sums = []
        for cam, fr in zip(cams, frames):
            img, r = pipe.render(cam, fr)
            sums.append(img.sum())
            tot += float(r)
        _ = [float(s) for s in sums]
        best_seq = min(best_seq, time.perf_counter() - t0)
    print(f"sequential: {best_seq*1000:.0f} ms for {F} frames "
          f"({tot/best_seq/1e6:.2f} Mrays/s)", flush=True)

    best_pool = 9e9
    for _ in range(reps):
        t0 = time.perf_counter()
        imgs, r = pipe.render_pooled(cams, frames)
        _ = float(imgs.sum()), float(r)
        best_pool = min(best_pool, time.perf_counter() - t0)
    print(f"pooled F={F}: {best_pool*1000:.0f} ms "
          f"({float(r)/best_pool/1e6:.2f} Mrays/s)  "
          f"speedup {best_seq/best_pool:.2f}x", flush=True)


if __name__ == "__main__":
    main()
