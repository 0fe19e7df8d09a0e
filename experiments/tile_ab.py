"""A/B: primary-dispatch tile size (VKPT_TILE_H/W) on 1080p atrium
primaries, packet kernel pk4096 (TPU).  Measured: 32x64 / 64x64 /
32x128 within noise (56.6-58.5 ms).

    VKPT_TILE_H=64 VKPT_TILE_W=64 python experiments/tile_ab.py
"""
import os, sys, time, tempfile
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/vkpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from vulkan_pathtracer_tpu.models import gltf
from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
from vulkan_pathtracer_tpu.ops.pallas_traverse import pallas_closest_hit
from vulkan_pathtracer_tpu.app.camera_path import orbit_path
from vulkan_pathtracer_tpu.models.camera import Camera
from vulkan_pathtracer_tpu.render.pipeline import _tile_order, generate_rays, TILE_H, TILE_W

path = os.path.join(tempfile.gettempdir(), "bench_atrium_4.1.glb")
scene = gltf.load(path)
dev = build_device_scene(scene, build_bvh=True, max_leaf_size=14)
cam = Camera(aspect_ratio=1920/1080)
orbit_path(radius=4.5, height=2.2, duration=4.0, center=(0.0,1.2,0.0)).apply(cam, 0.0)
pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())
o, d = generate_rays(pos, hor, ver, fwd, 1920, 1080)
t_order, _ = _tile_order(1080, 1920)
o, d = o[jnp.asarray(t_order)], d[jnp.asarray(t_order)]
fn = jax.jit(lambda: pallas_closest_hit(dev, o, d, None, packet=4096))
h = fn(); chk = float(jnp.sum(jnp.where(h.t < 1e32, h.t, 0.0)))
best = 9e9
for _ in range(4):
    t0 = time.perf_counter(); h = fn(); _ = float(h.t.sum())
    best = min(best, time.perf_counter() - t0)
print(f"tile {TILE_H}x{TILE_W}: {best*1000:.1f} ms  {2073600/best/1e6:.1f} Mrays/s  chk={chk:.6g}", flush=True)
