"""Native (C++) LBVH builder vs the NumPy builder."""

import numpy as np
import pytest

from vulkan_pathtracer_tpu.ops.bvh import build_bvh_host, validate_bvh
from vulkan_pathtracer_tpu.ops.native import get_lib, lbvh_build_native


def _random_tris(n, seed=11):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    e1 = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    e2 = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    return v0, e1, e2


needs_native = pytest.mark.skipif(get_lib() is None,
                                  reason="native lib not built")


@needs_native
def test_native_matches_numpy_builder():
    v0, e1, e2 = _random_tris(2000)
    nat = build_bvh_host(v0, e1, e2, max_leaf_size=4, use_native=True,
                         builder="lbvh")
    ref = build_bvh_host(v0, e1, e2, max_leaf_size=4, use_native=False)
    assert nat.node_count == ref.node_count
    np.testing.assert_array_equal(nat.tri_order, ref.tri_order)
    np.testing.assert_array_equal(nat.skip, ref.skip)
    np.testing.assert_array_equal(nat.leaf_first, ref.leaf_first)
    np.testing.assert_array_equal(nat.leaf_count, ref.leaf_count)
    np.testing.assert_allclose(nat.bmin, ref.bmin, rtol=1e-6)
    np.testing.assert_allclose(nat.bmax, ref.bmax, rtol=1e-6)


@needs_native
def test_native_invariants_large():
    v0, e1, e2 = _random_tris(50000, seed=3)
    bvh = build_bvh_host(v0, e1, e2, max_leaf_size=4, use_native=True)
    validate_bvh(bvh, v0[bvh.tri_order], e1[bvh.tri_order],
                 e2[bvh.tri_order])


@needs_native
def test_native_single_triangle():
    out = lbvh_build_native(
        np.zeros((1, 3), np.float32),
        np.array([[1, 0, 0]], np.float32),
        np.array([[0, 1, 0]], np.float32),
        4,
    )
    assert out is not None
    bmin, bmax, skip, leaf_first, leaf_count, left, right, order = out
    assert len(skip) == 1 and skip[0] == 1
    assert leaf_first[0] == 0 and leaf_count[0] == 1


@needs_native
def test_native_build_speed():
    import time

    v0, e1, e2 = _random_tris(200000, seed=8)
    t0 = time.perf_counter()
    bvh = build_bvh_host(v0, e1, e2, use_native=True)
    native_t = time.perf_counter() - t0
    assert bvh.node_count > 0
    # Sanity: 200k tris should build well under 5s natively.
    assert native_t < 5.0, native_t


@needs_native
def test_sah_builder_invariants():
    v0, e1, e2 = _random_tris(30000, seed=21)
    bvh = build_bvh_host(v0, e1, e2, max_leaf_size=8, use_native=True,
                         builder="sah")
    validate_bvh(bvh, v0[bvh.tri_order], e1[bvh.tri_order],
                 e2[bvh.tri_order])
    assert (bvh.leaf_count[bvh.leaf_first >= 0] <= 8).all()


@needs_native
def test_sah_traversal_matches_brute(columns_glb):
    import jax.numpy as jnp

    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
    from vulkan_pathtracer_tpu.ops.intersect import brute_force_closest_hit
    from vulkan_pathtracer_tpu.ops.traverse import bvh_closest_hit

    scene = gltf.load(columns_glb)
    dev = build_device_scene(scene, build_bvh=True)  # default = SAH
    rng = np.random.default_rng(31)
    n = 400
    o = jnp.asarray(rng.uniform(-10, 10, size=(n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))
    brute = brute_force_closest_hit(dev, o, d)
    trav = bvh_closest_hit(dev, o, d)
    np.testing.assert_allclose(np.asarray(trav.t), np.asarray(brute.t),
                               rtol=1e-5, atol=1e-5)


@needs_native
def test_native_bake_matches_numpy_exactly():
    """The ingest fast path (native/ingest.cpp) must round bit-
    identically to the NumPy bake in device_scene._bake_instance so
    golden images are independent of which path baked the scene."""
    from vulkan_pathtracer_tpu.ops.native import (
        bake_triangles_native,
        transform_dirs_native,
        transform_points_native,
    )

    rng = np.random.default_rng(7)
    nv = 500
    positions = rng.uniform(-5, 5, size=(nv, 3)).astype(np.float32)
    normals = rng.normal(size=(nv, 3)).astype(np.float32)
    idx = rng.integers(0, nv, size=(300, 3)).astype(np.int64)
    M = np.eye(4)
    M[:3, :3] = rng.normal(size=(3, 3)) + np.eye(3) * 2.0  # non-orthogonal
    M[:3, 3] = rng.normal(size=3) * 3.0
    A = M[:3, :3]
    t = M[:3, 3]
    N = np.linalg.inv(A)

    v0n, e1n, e2n, gnn = bake_triangles_native(positions, idx, A, t, N)

    pos_w = (positions.astype(np.float64) @ A.T + t).astype(np.float32)
    v0 = pos_w[idx[:, 0]]
    e1 = pos_w[idx[:, 1]] - v0
    e2 = pos_w[idx[:, 2]] - v0
    obj = positions.astype(np.float64)
    e1o = obj[idx[:, 1]] - obj[idx[:, 0]]
    e2o = obj[idx[:, 2]] - obj[idx[:, 0]]
    gn = np.cross(e1o, e2o) @ N.T
    norm = np.linalg.norm(gn, axis=1, keepdims=True)
    gn = (gn / np.maximum(norm, 1e-30)).astype(np.float32)

    np.testing.assert_array_equal(v0n, v0)
    np.testing.assert_array_equal(e1n, e1)
    np.testing.assert_array_equal(e2n, e2)
    np.testing.assert_array_equal(gnn, gn)

    nrm_ref = (normals.astype(np.float64) @ N.T).astype(np.float32)
    np.testing.assert_array_equal(transform_dirs_native(normals, N), nrm_ref)
    np.testing.assert_array_equal(
        transform_points_native(positions, A, t), pos_w
    )
