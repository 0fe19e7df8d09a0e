"""Animated instanced fly-through (BASELINE config[5] analog): per
frame, new 4x4 instance transforms (device-side O(transforms) refit,
instanced_scene.update_instance_transforms) + camera step + full
1080p render on the instanced packet kernel.  Reference semantics:
per-frame TLAS refit + render (Tlas.zig:81, RaytracingPass.zig).

    python experiments/animated_bench.py [grid] [segments] [frames]
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
    from vulkan_pathtracer_tpu.models.instanced_scene import (
        build_instanced_scene,
        update_instance_transforms,
    )
    from vulkan_pathtracer_tpu.render.pipeline import render_frame

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    segments = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    path = f"/tmp/bench_columns_{grid}_{segments}.glb"
    if not os.path.exists(path):
        make_columns(path, grid=grid, segments=segments, n_materials=32)
    host = gltf.load(path)
    dev = build_instanced_scene(
        host, max_leaf_size=int(os.environ.get("LEAF", 8)))
    base_tf = np.stack([i.transform for i in host.instances]).astype(
        np.float32)
    n_inst = base_tf.shape[0]
    print(f"tris={dev.num_triangles} instances={n_inst}", flush=True)

    root_min = np.asarray(dev.bvh_packed[0, 0:3])
    root_max = np.asarray(dev.bvh_packed[0, 3:6])
    ext = float(np.max(root_max - root_min))
    c = (root_min + root_max) * 0.5
    cam = Camera(aspect_ratio=1920 / 1080)
    path_o = orbit_path(radius=0.75 * ext, height=0.35 * ext,
                        duration=4.0, center=tuple(c))

    @jax.jit
    def animate(t):
        # Bob each instance vertically with a per-instance phase.
        phase = jnp.arange(n_inst, dtype=jnp.float32) * 0.7
        dy = 0.15 * ext * jnp.sin(t * 2.0 + phase)
        tf = jnp.asarray(base_tf)
        return tf.at[:, 1, 3].add(dy)

    def frame(i):
        t = 4.0 * i / frames
        path_o.apply(cam, t)
        pos, hor, ver, fwd = (jnp.asarray(v) for v in
                              cam.push_constants())
        scene_i = update_instance_transforms(dev, animate(jnp.float32(t)))
        img, rays = render_frame(
            scene_i, pos, hor, ver, fwd, jnp.uint32(i),
            num_samples=1, num_bounces=2, width=1920, height=1080,
            traversal="auto",
        )
        return float(img.sum()), float(rays)

    frame(0)  # compile
    best = 9e9
    reps = int(os.environ.get("REPS", 2))
    for _ in range(reps):
        t0 = time.perf_counter()
        total = 0.0
        for i in range(frames):
            _, rays = frame(i)
            total += rays
        dt = time.perf_counter() - t0
        best = min(best, dt)
    print(f"animated fly-through: {frames} frames in {best*1000:.0f} ms "
          f"= {frames/best:.2f} fps, {total/best/1e6:.1f} Mrays/s "
          f"(per-frame refit of {n_inst} instances on device)",
          flush=True)


if __name__ == "__main__":
    main()
