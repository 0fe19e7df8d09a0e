"""A/B: 8 per-octant BVH linearizations vs a single canonical order
(octant_order=False) on real sorted atrium bounce rays (TPU).
Measured: orders=8 still +12% under the 6d sort key (829 vs 927 ms).

    python experiments/orders_ab.py
"""
import os, sys, time, tempfile
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/vkpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from vulkan_pathtracer_tpu.models import gltf
from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
from vulkan_pathtracer_tpu.ops.pallas_traverse import pallas_closest_hit
sys.path.insert(0, "/root/repo/experiments")
from leaf_gate_ab import bounce_rays

path = os.path.join(tempfile.gettempdir(), "bench_atrium_4.1.glb")
scene = gltf.load(path)
dev8 = build_device_scene(scene, build_bvh=True, max_leaf_size=14)
dev1 = build_device_scene(scene, build_bvh=True, max_leaf_size=14,
                          octant_order=False)
print(f"orders8 nodes={dev8.bvh_packed.shape[0]} "
      f"orders1 nodes={dev1.bvh_packed.shape[0]}", flush=True)
o, d, alive, _ = bounce_rays(dev8)
o, d = jax.device_put(o), jax.device_put(d)
n_alive = float(jnp.sum(alive))
for name, dv in (("orders=8", dev8), ("orders=1", dev1)):
    fn = jax.jit(lambda dv=dv: pallas_closest_hit(dv, o, d, alive, packet=3072))
    h = fn(); chk = float(jnp.sum(jnp.where(h.t < 1e32, h.t, 0.0)))
    best = 9e9
    for _ in range(4):
        t0 = time.perf_counter(); h = fn(); _ = float(h.t.sum())
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1000:.1f} ms  {n_alive/best/1e6:.2f} Mrays/s  chk={chk:.6g}", flush=True)
