"""First-contact smoke for the split-leaf (leaf-28) stack kernels on
real Mosaic: tiny scene, every kernel family, checksums vs the XLA
traversal on the same device.

    python experiments/leaf28_smoke.py

Cheap by construction (964 tris, 4096 rays): catches lowering
failures (the MXU tier's first contact found three) before the
production-scale A/B spends a long compile.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vkpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    from assets.procedural import make_columns
    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.device_scene import (
        build_device_scene,
    )
    from vulkan_pathtracer_tpu.ops import pallas_pair as pp
    from vulkan_pathtracer_tpu.ops.intersect import MISS_T
    from vulkan_pathtracer_tpu.ops.traverse import bvh_closest_hit

    path = os.path.join(tempfile.gettempdir(), "leaf28_smoke.glb")
    if not os.path.exists(path):
        make_columns(path, grid=4, segments=5)
    scene = gltf.load(path)
    dev = build_device_scene(scene, build_bvh=True, max_leaf_size=28)
    print(f"tris={dev.num_triangles} blocks={dev.tri_blocks.shape}",
          flush=True)

    rng = np.random.default_rng(7)
    n = 4096
    lo, hi = dev.root_bounds_host
    ctr = (lo + hi) / 2
    o = ctr + (rng.random((n, 3), np.float32) - 0.5) * (hi - lo) * 1.2
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    ref = bvh_closest_hit(dev, o, d)
    ref_t = np.asarray(ref.t)
    ref_chk = float(np.where(ref_t < 1e32, ref_t, 0.0).sum())
    occ_ref = ref_t < MISS_T
    print(f"xla chk={ref_chk:.6g} hits={occ_ref.sum()}", flush=True)

    for name, fn, kw in [
        ("quad      ", pp.pallas_quad_closest_hit, {}),
        ("quad_hbm  ", pp.pallas_quad_closest_hit,
         {"hbm_leaves": True}),
        ("pair      ", pp.pallas_pair_closest_hit, {}),
        ("oct       ", pp.pallas_oct_closest_hit, {}),
        ("oct_hbm   ", pp.pallas_oct_closest_hit,
         {"hbm_leaves": True}),
    ]:
        h = fn(dev, o, d, packet=1024, **kw)
        t = np.asarray(h.t)
        chk = float(np.where(t < 1e32, t, 0.0).sum())
        flips = int((np.abs(t - ref_t) > 1e-5 * np.maximum(
            1.0, np.abs(ref_t))).sum())
        print(f"{name} chk={chk:.6g} rel={chk / ref_chk - 1:+.2e} "
              f"flips={flips}", flush=True)

    for name, fn, kw in [
        ("quad_ah    ", pp.pallas_quad_any_hit, {}),
        ("quad_ah_hbm", pp.pallas_quad_any_hit, {"hbm_leaves": True}),
        ("pair_ah    ", pp.pallas_pair_any_hit, {}),
    ]:
        m = np.asarray(fn(dev, o, d, packet=1024, **kw))
        print(f"{name} mask_equal={bool((m == occ_ref).all())} "
              f"diff={int((m != occ_ref).sum())}", flush=True)


if __name__ == "__main__":
    main()
