"""8-wide BVH collapse + wide packet kernel (opt-in traversal)."""

import numpy as np
import jax.numpy as jnp

from vulkan_pathtracer_tpu.models import gltf
from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
from vulkan_pathtracer_tpu.ops.bvh_wide import EMPTY, INTERNAL
from vulkan_pathtracer_tpu.ops.pallas_traverse import (
    pallas_wide_closest_hit,
    wide_fits_vmem,
)
from vulkan_pathtracer_tpu.ops.traverse import bvh_closest_hit


def test_wide_structure(columns_glb):
    scene = gltf.load(columns_glb)
    dev = build_device_scene(scene)
    assert dev.bvh_wide_nodes is not None
    n_wide = dev.bvh_wide_nodes.shape[0] // 8
    nodes = np.asarray(dev.bvh_wide_nodes).reshape(8, n_wide, 8, 8)
    # Every octant's root is node 0 with a valid skip == n_wide.
    for o in range(8):
        assert int(nodes[o, 0, 0, 7]) <= n_wide
        leafwords = nodes[o, :, :, 6]
        # Slots are leaf (>=0), internal (-1) or empty (-2).
        assert np.isin(
            leafwords[leafwords < 0], [INTERNAL, EMPTY]
        ).all()
    # All leaf blocks referenced exactly once per octant.
    lw = nodes[0, :, :, 6]
    refs = np.sort(lw[lw >= 0].astype(np.int64))
    n_leaf_rows = dev.tri_blocks.shape[0]
    assert len(refs) == len(set(refs.tolist()))
    assert (refs // dev.max_leaf_size < n_leaf_rows).all()


def test_wide_kernel_matches_xla(columns_glb):
    scene = gltf.load(columns_glb)
    dev = build_device_scene(scene)
    assert wide_fits_vmem(dev)
    rng = np.random.default_rng(23)
    n = 900
    o = jnp.asarray(rng.uniform(-10, 10, size=(n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))
    ref = bvh_closest_hit(dev, o, d)
    got = pallas_wide_closest_hit(dev, o, d, interpret=True)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)
    assert (np.asarray(got.tri) == np.asarray(ref.tri)).mean() > 0.999
