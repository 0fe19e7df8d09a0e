"""Bisect the leaf-28 TPU worker crash (round 4).

Twice (plan runs at 12:35 and 12:54 UTC), `VARIANTS=... AB_LEAF=28
leaf_gate_ab.py` killed the TPU worker ("TPU worker process crashed or
restarted") before ANY variant ran — i.e. inside bounce-ray
generation.  At leaf=28 every pallas tier refuses (tri rows are 252
lanes > 128), so the bounce rays' primary hit comes from the XLA
traversal (ops/traverse.bvh_closest_hit) — a plain lax.while_loop
program that should be structurally identical at every leaf size.

This script walks the suspect stages one at a time, forcing a device
sync after each, so the crash (if it reproduces) names its stage:

  1. bake+upload the leaf-28 scene
  2. XLA closest hit, 64k synthetic primaries
  3. XLA closest hit, full 2.07M tile-ordered primaries
  4. the full bounce_rays program (shading + BRDF + argsort), the
     exact crashing shape from leaf_gate_ab

Usage: timeout 1800 python experiments/leaf28_crash_bisect.py
Env: BISECT_LEAF (default 28), BISECT_STAGES (default "1234").
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/vkpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from assets.procedural import make_atrium
    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.device_scene import build_device_scene

    leaf = int(os.environ.get("BISECT_LEAF", "28"))
    stages = os.environ.get("BISECT_STAGES", "1234")
    path = os.path.join(tempfile.gettempdir(), "bench_atrium_4.1.glb")
    if not os.path.exists(path):
        make_atrium(path, detail=4.1)
    scene = gltf.load(path)

    stamp(f"stage 1: bake+upload leaf={leaf}")
    dev = build_device_scene(scene, build_bvh=True, max_leaf_size=leaf)
    # Force a real device sync (fetch a scalar through the relay).
    chk0 = float(jnp.sum(dev.tri_blocks[:1, :9]))
    stamp(f"stage 1 OK: tris={dev.num_triangles} chk0={chk0:.6g}")
    if "2" in stages or "3" in stages or "4" in stages:
        from vulkan_pathtracer_tpu.app.camera_path import orbit_path
        from vulkan_pathtracer_tpu.models.camera import Camera
        from vulkan_pathtracer_tpu.ops.traverse import bvh_closest_hit
        from vulkan_pathtracer_tpu.render.pipeline import (
            _tile_order, generate_rays,
        )

        cam = Camera(aspect_ratio=1920 / 1080)
        orbit_path(radius=4.5, height=2.2, duration=4.0,
                   center=(0.0, 1.2, 0.0)).apply(cam, 0.0)
        pos, hor, ver, fwd = (jnp.asarray(v) for v in
                              cam.push_constants())

    if "2" in stages:
        stamp("stage 2: XLA closest hit, 64k primaries")

        @jax.jit
        def small():
            o, d = generate_rays(pos, hor, ver, fwd, 256, 256)
            hit = bvh_closest_hit(dev, o, d, None)
            return jnp.sum(jnp.where(hit.t < 1e32, hit.t, 0.0))

        stamp(f"stage 2 OK: chk={float(small()):.6g}")

    if "3" in stages:
        stamp("stage 3: XLA closest hit, full 2.07M primaries")

        @jax.jit
        def full():
            o, d = generate_rays(pos, hor, ver, fwd, 1920, 1080)
            t_order, _ = _tile_order(1080, 1920)
            t_order = jnp.asarray(t_order)
            hit = bvh_closest_hit(dev, o[t_order], d[t_order], None)
            return jnp.sum(jnp.where(hit.t < 1e32, hit.t, 0.0))

        stamp(f"stage 3 OK: chk={float(full()):.6g}")

    if "4" in stages:
        stamp("stage 4: full bounce_rays program (shading+BRDF+sort)")
        from experiments.leaf_gate_ab import bounce_rays

        o2, d2, alive, _ = bounce_rays(dev)
        stamp(f"stage 4 OK: alive={float(jnp.sum(alive)):.0f}")

    stamp("bisect complete — no crash reproduced")


if __name__ == "__main__":
    main()
