"""Fine sweep: 6d endpoint distance L x packet size on atrium
secondaries (TPU).  Measured optimum: L=0.5*diag, pk3072 (830 ms);
neighbors 0.4/0.6 and 2560/3584 all worse.

    python experiments/lsweep.py
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
os.environ["UNSORTED"] = "1"
from leaf_gate_ab import bounce_rays

path = os.path.join(tempfile.gettempdir(), "bench_atrium_4.1.glb")
scene = gltf.load(path)
dev = build_device_scene(scene, build_bvh=True, max_leaf_size=14)
o, d, alive, _ = bounce_rays(dev)
n_alive = float(jnp.sum(alive))
lo = dev.bvh_packed[0, 0:3]; hi = dev.bvh_packed[0, 3:6]
ext = jnp.maximum(hi - lo, 1e-9)
diag = float(np.linalg.norm(np.asarray(hi) - np.asarray(lo)))

def key6d(L):
    qo = jnp.clip((o - lo) / ext * 31.0, 0.0, 31.0).astype(jnp.uint32)
    qe = jnp.clip((o + L * d - lo) / ext * 31.0, 0.0, 31.0).astype(jnp.uint32)
    k = jnp.zeros(o.shape[0], jnp.uint32)
    for b in range(4, -1, -1):
        for comp in (qo[:,0], qo[:,1], qo[:,2], qe[:,0], qe[:,1], qe[:,2]):
            k = (k << jnp.uint32(1)) | ((comp >> jnp.uint32(b)) & jnp.uint32(1))
    return jnp.where(alive, k, jnp.uint32(0xFFFFFFFF))

def run(L, pk):
    def fn():
        order = jnp.argsort(key6d(L * diag))
        return pallas_closest_hit(dev, o[order], d[order], alive[order], packet=pk)
    return jax.jit(fn)

for L, pk in ((0.5, 3072), (0.4, 3072), (0.6, 3072), (0.5, 2560), (0.5, 3584)):
    fn = run(L, pk)
    h = fn(); chk = float(jnp.sum(jnp.where(h.t < 1e32, h.t, 0.0)))
    best = 9e9
    for _ in range(4):
        t0 = time.perf_counter(); h = fn(); _ = float(h.t.sum())
        best = min(best, time.perf_counter() - t0)
    print(f"L={L} pk{pk}: {best*1000:.1f} ms  {n_alive/best/1e6:.2f} Mrays/s  chk={chk:.6g}", flush=True)
