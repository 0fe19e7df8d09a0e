"""Capture a jax.profiler trace of one 1080p frame (TPU).

    python experiments/profile_frame.py [trace_dir]

Inspect with TensorBoard, or grep the .trace.json.gz event names for
the op-level time split (pallas traversal vs XLA shading vs sort).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vkpt_jax_cache")

from assets.procedural import make_columns
from vulkan_pathtracer_tpu.models import gltf
from vulkan_pathtracer_tpu.models.camera import Camera
from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
from vulkan_pathtracer_tpu.app.camera_path import orbit_path
from vulkan_pathtracer_tpu.render.pipeline import render_frame


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vkpt_trace"
    leaf = int(os.environ.get("LEAF", 14))
    if os.environ.get("SCENE") == "atrium":
        from assets.procedural import make_atrium

        detail = float(os.environ.get("DETAIL", 4.1))
        path = f"/tmp/bench_atrium_{detail}.glb"
        if not os.path.exists(path):
            make_atrium(path, detail=detail)
    else:
        path = "/tmp/bench_columns_14_24.glb"
        if not os.path.exists(path):
            make_columns(path, grid=14, segments=24, n_materials=32)
    scene = gltf.load(path)
    dev = build_device_scene(scene, build_bvh=True, max_leaf_size=leaf)
    cam = Camera(aspect_ratio=1920 / 1080)
    if os.environ.get("SCENE") == "atrium":
        orbit_path(radius=4.5, height=2.2, duration=4.0,
                   center=(0.0, 1.2, 0.0)).apply(cam, 0.0)
    else:
        root_min = np.asarray(dev.bvh_packed[0, 0:3])
        root_max = np.asarray(dev.bvh_packed[0, 3:6])
        ext = float(np.max(root_max - root_min))
        c = (root_min + root_max) * 0.5
        orbit_path(radius=0.75 * ext, height=0.35 * ext,
                   center=tuple(c)).apply(cam, 0.0)
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())

    def frame(f):
        img, rays = render_frame(
            dev, pos, hor, ver, fwd, jnp.uint32(f),
            num_samples=1, num_bounces=2, width=1920, height=1080,
            traversal="auto",
        )
        return float(img.sum()), float(rays)

    frame(0)  # warm
    jax.profiler.start_trace(trace_dir)
    t0 = time.time()
    s, rays = frame(1)
    dt = time.time() - t0
    jax.profiler.stop_trace()
    print(f"frame: {dt*1000:.1f} ms, {rays/dt/1e6:.2f} Mrays/s; "
          f"trace in {trace_dir}")


if __name__ == "__main__":
    main()
