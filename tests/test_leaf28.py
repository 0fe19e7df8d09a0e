"""Split-leaf (leaf-28) stack kernels vs the XLA traversal.

Leaf blocks wider than 14 tris exceed one 128-lane row, so the exact
stack kernels store them as ``block//14`` sub-rows of 14 tris and the
MT loop addresses ``tris_ref[leaf*rpl + rr, static_lane]`` (dynamic
sublane indices lower fine on Mosaic; ops/pallas_pair.
_leaf_rows_per_block).  These tests pin the layout's exactness on a
leaf-28 bake: closest hit (pair/quad/oct, VMEM + HBM-streamed leaves)
and any-hit must match the XLA traversal bit-for-bit per dispatch —
the same contract the leaf-14 kernels carry (tests/test_pallas.py).

Reference anchor: the driver-internal acceleration structure behind
traceRayEXT (ray_gen.rgen:50-63) has no leaf-size surface at all;
this is a TPU-side scheduling knob, exactness is the parity contract.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vulkan_pathtracer_tpu.models import gltf
from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
from vulkan_pathtracer_tpu.ops import pallas_pair as pp
from vulkan_pathtracer_tpu.ops.intersect import MISS_T
from vulkan_pathtracer_tpu.ops.traverse import bvh_closest_hit


@pytest.fixture(scope="module")
def dev28(request):
    scene = gltf.load(request.getfixturevalue("columns_glb"))
    return build_device_scene(scene, build_bvh=True, max_leaf_size=28)


def _rays(n, seed=3):
    rng = np.random.default_rng(seed)
    origins = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    targets = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    d = targets - origins
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(origins), jnp.asarray(d)


def test_leaf28_fits_gates(dev28):
    assert dev28.tri_blocks.shape[1] == 28 * 9
    assert pp.quad_fits_vmem(dev28)
    assert pp.pair_fits_vmem(dev28)
    assert pp.oct_fits_vmem(dev28)
    assert pp.quad_hbm_fits(dev28)


def test_leaf_rows_per_block():
    assert pp._leaf_rows_per_block(8) == 1
    assert pp._leaf_rows_per_block(14) == 1
    assert pp._leaf_rows_per_block(28) == 2
    assert pp._leaf_rows_per_block(42) == 3
    assert pp._leaf_rows_per_block(20) is None
    assert pp._leaf_rows_per_block(70) is None


@pytest.mark.parametrize(
    "call,kw",
    [
        (pp.pallas_quad_closest_hit, {}),
        (pp.pallas_quad_closest_hit, {"hbm_leaves": True}),
        (pp.pallas_pair_closest_hit, {}),
        (pp.pallas_oct_closest_hit, {}),
    ],
    ids=["quad", "quad_hbm", "pair", "oct"],
)
@pytest.mark.slow
def test_leaf28_closest_matches_xla(dev28, call, kw):
    # Same tolerances as the leaf-14 parity tests (test_pallas.py):
    # traversal ORDER differs from the XLA path, so ties between
    # equal-t triangles (shared edges) may resolve to another tri id.
    o, d = _rays(1024)
    ref = bvh_closest_hit(dev28, o, d)
    got = call(dev28, o, d, interpret=True, packet=512, **kw)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)
    assert (np.asarray(got.tri) == np.asarray(ref.tri)).mean() > 0.999
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(ref.u),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "call,kw",
    [
        (pp.pallas_quad_any_hit, {}),
        (pp.pallas_quad_any_hit, {"hbm_leaves": True}),
        (pp.pallas_pair_any_hit, {}),
    ],
    ids=["quad", "quad_hbm", "pair"],
)
def test_leaf28_anyhit_matches_closest(dev28, call, kw):
    o, d = _rays(1024, seed=9)
    ref = bvh_closest_hit(dev28, o, d)
    occ = np.asarray(ref.t) < MISS_T
    got = call(dev28, o, d, interpret=True, packet=512, **kw)
    np.testing.assert_array_equal(np.asarray(got), occ)


def test_leaf28_active_mask(dev28):
    o, d = _rays(512, seed=5)
    active = jnp.asarray(
        np.random.default_rng(1).random(512) < 0.5)
    ref = bvh_closest_hit(dev28, o, d, active=active)
    got = pp.pallas_quad_closest_hit(dev28, o, d, active=active,
                                     interpret=True, packet=512)
    keep = np.asarray(active)
    np.testing.assert_allclose(np.asarray(got.t)[keep],
                               np.asarray(ref.t)[keep],
                               rtol=1e-5, atol=1e-5)
