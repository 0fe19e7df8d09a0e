"""Presplit A/B on the MIXED-tessellation atrium (large floor/wall
polygons + fine columns, like real Sponza).  The uniformly-tessellated
atrium measured presplit as a no-op; this is the workload it exists
for.  TPU.

    python experiments/presplit_mixed.py [detail]
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
    from assets.procedural import make_atrium
    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
    from vulkan_pathtracer_tpu.ops.pallas_traverse import pallas_closest_hit
    from leaf_gate_ab import bounce_rays

    detail = float(sys.argv[1]) if len(sys.argv) > 1 else 35
    path = f"/tmp/atrium_mixed_{detail}.glb"
    if not os.path.exists(path):
        make_atrium(path, detail=detail, mixed=True)
    scene = gltf.load(path)

    variants = []
    for name, presplit in (("no presplit ", 0.0), ("presplit 0.3", 0.3),
                           ("presplit 0.6", 0.6)):
        dev = build_device_scene(scene, build_bvh=True, max_leaf_size=14,
                                 presplit=presplit or None)
        variants.append((name, dev))
    dev0 = variants[0][1]
    print(f"tris={dev0.num_triangles}", flush=True)
    os.environ.setdefault("UNSORTED", "0")
    o, d, alive, _ = bounce_rays(dev0)
    o, d = jax.device_put(o), jax.device_put(d)
    n_alive = float(jnp.sum(alive))
    print(f"rays: {o.shape[0]} ({n_alive:.0f} alive)", flush=True)

    for name, dev in variants:
        fn = jax.jit(lambda dev=dev: pallas_closest_hit(
            dev, o, d, alive, packet=3072))
        h = fn()
        chk = float(jnp.sum(jnp.where(h.t < 1e32, h.t, 0.0)))
        best = 9e9
        for _ in range(4):
            t0 = time.perf_counter()
            h = fn()
            _ = float(h.t.sum())
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1000:7.1f} ms  {n_alive/best/1e6:5.2f} "
              f"Mrays/s  leaf-rows={dev.tri_blocks.shape[0]}  "
              f"chk={chk:.6g}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__))))
    main()
