"""MXU frontier kernel (ops/pallas_frontier.py): 16-wide node phase
as one slab-coefficient matmul per visit, vs the XLA traversal and the
exact stack kernels (interpret mode on CPU; the same kernel runs
compiled on TPU)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

# Measured-dead-end opt-in tier (VERDICT r4 weak #3): fully
# exercised only in the full lane (pytest -m '').
pytestmark = pytest.mark.deadend

from vulkan_pathtracer_tpu.models import gltf
from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
from vulkan_pathtracer_tpu.ops.pallas_frontier import (
    FRONTIER_WIDTH,
    _SORT16,
    build_frontier_rows_device,
    frontier_fits_vmem,
    frontier_hbm_fits,
    pallas_frontier_closest_hit,
)
from vulkan_pathtracer_tpu.ops.traverse import bvh_closest_hit


@pytest.fixture(scope="module")
def cols_dev(request):
    scene = gltf.load(request.getfixturevalue("columns_glb"))
    return build_device_scene(scene, build_bvh=True)


def _rays(n, seed=3):
    rng = np.random.default_rng(seed)
    origins = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    targets = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    d = targets - origins
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(origins), jnp.asarray(d)


def _build_order_bounds(dev):
    """Exact build-order (bmin, bmax) recomputed from the device
    triangle arrays (test_refit.py pins refit == build bounds)."""
    from vulkan_pathtracer_tpu.ops.refit import refit_aabbs

    bmin, bmax = refit_aabbs(
        dev.tri_v0, dev.tri_e1, dev.tri_e2,
        dev.bvh_leaf_first_build, dev.bvh_leaf_count_build,
        dev.bvh_left, dev.bvh_right,
        depth=dev.bvh_depth, max_leaf_size=dev.max_leaf_size)
    return np.asarray(bmin), np.asarray(bmax)


def test_fits(cols_dev):
    assert frontier_fits_vmem(cols_dev)
    assert frontier_hbm_fits(cols_dev)


def test_frontier_rows_structure(cols_dev):
    """Tile invariants: (Nw, 8, 128) layout, guard-dilated boxes
    CONTAIN the binary children they collapse (dilation can only add
    visits, never drop geometry), every enc slot links a valid
    super-row or leaf block, empty slots carry NaN planes."""
    tiles = np.asarray(cols_dev.bvh_frontier)
    src = np.asarray(cols_dev.bvh_frontier_src)
    enc = np.asarray(cols_dev.bvh_frontier_enc)
    n_leaves = cols_dev.tri_blocks.shape[0]
    w = FRONTIER_WIDTH
    assert tiles.shape[1:] == (8, 128)
    assert tiles.shape[0] == src.shape[0] == enc.shape[0]

    lo = np.stack([tiles[:, a, a * w:(a + 1) * w] for a in range(3)],
                  axis=2)                      # (Nw, w, 3)
    hi = np.stack([tiles[:, a, (3 + a) * w:(4 + a) * w]
                   for a in range(3)], axis=2)
    live = src >= 0
    # Stored enc row matches the static map on live slots.
    np.testing.assert_array_equal(tiles[:, 6, :w][live], enc[live])
    internal = live & (enc >= 0)
    leaf = live & (enc < 0)
    assert (enc[internal] < tiles.shape[0]).all()
    leaf_rows = (-enc[leaf]) - 1
    assert (leaf_rows >= 0).all() and (leaf_rows < n_leaves).all()
    # Empty slots: NaN planes (never-hit under tn <= tf).
    assert np.isnan(lo[~live]).all() and np.isnan(hi[~live]).all()
    # Guard dilation contains the source child's exact box.
    bmin, bmax = _build_order_bounds(cols_dev)
    cid = src[live]
    assert (lo[live] <= bmin[cid] + 1e-6).all()
    assert (hi[live] >= bmax[cid] - 1e-6).all()
    # Feature rows 3-5 are the exact 0/1 mask, rows 6 tail + 7 zero.
    base = np.zeros((3, 6 * w))
    for a in range(3):
        base[a, a * w:(a + 1) * w] = 1.0
        base[a, (3 + a) * w:(4 + a) * w] = 1.0
    np.testing.assert_array_equal(
        np.broadcast_to(base[None], (tiles.shape[0], 3, 6 * w)),
        tiles[:, 3:6, :6 * w])
    assert (tiles[:, :, 6 * w:] == 0).all()
    assert (tiles[:, 7, :] == 0).all()


def test_sort16_network_sorts():
    """Batcher odd-even mergesort network: a wrong network would be a
    silent perf bug (far-first pushes), assert it actually sorts."""
    rng = np.random.default_rng(0)
    for _ in range(300):
        keys = rng.random(FRONTIER_WIDTH)
        k = keys.copy()
        for a, b in _SORT16:
            if k[a] > k[b]:
                k[a], k[b] = k[b], k[a]
        np.testing.assert_array_equal(k, np.sort(keys))


def test_frontier_kernel_matches(cols_dev):
    """Guard-banded node phase + exact leaf MT == the XLA traversal:
    dilation widens the visit set, strict-less best-hit updates keep
    the result identical."""
    o, d = _rays(1700, seed=21)
    ref = bvh_closest_hit(cols_dev, o, d)
    got = pallas_frontier_closest_hit(cols_dev, o, d, interpret=True,
                                      packet=512)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)
    assert (np.asarray(got.tri) == np.asarray(ref.tri)).mean() > 0.999
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(ref.u),
                               rtol=1e-4, atol=1e-5)


def test_frontier_active_mask_and_tnear(cols_dev):
    from vulkan_pathtracer_tpu.ops.intersect import MISS_T

    o, d = _rays(600, seed=22)
    rng = np.random.default_rng(0)
    active = jnp.asarray(rng.random(600) < 0.6)
    ref = bvh_closest_hit(cols_dev, o, d, active)
    got = pallas_frontier_closest_hit(cols_dev, o, d, active,
                                      interpret=True, packet=512)
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
    # t-window: [t_near, t_far) hits only.
    full = pallas_frontier_closest_hit(cols_dev, o, d, interpret=True,
                                       packet=512)
    t_np = np.asarray(full.t)
    lo_w = float(np.percentile(t_np[t_np < 1e31], 50))
    win = pallas_frontier_closest_hit(cols_dev, o, d, interpret=True,
                                      packet=512, t_near=lo_w)
    w_t = np.asarray(win.t)
    inside = t_np >= lo_w
    np.testing.assert_array_equal(w_t[inside & (t_np < 1e31)],
                                  t_np[inside & (t_np < 1e31)])
    assert (w_t[~inside] >= lo_w).all() | (w_t[~inside] == MISS_T).any()


def test_frontier_hbm_leaves_matches(cols_dev):
    """HBM-streamed leaf rows (DMA per queued leaf into a 16-slot
    scratch) must be bit-identical to the VMEM-resident kernel — same
    MT, only the fetch path changes."""
    o, d = _rays(1100, seed=61)
    ref = pallas_frontier_closest_hit(cols_dev, o, d, interpret=True,
                                      packet=512, hbm_leaves=False)
    got = pallas_frontier_closest_hit(cols_dev, o, d, interpret=True,
                                      packet=512, hbm_leaves=True)
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
    np.testing.assert_array_equal(np.asarray(got.tri),
                                  np.asarray(ref.tri))
    np.testing.assert_array_equal(np.asarray(got.u), np.asarray(ref.u))


def test_frontier_leaf_cond_matches_drain(cols_dev, monkeypatch):
    """VKPT_FRONTIER_LEAF=cond (the quad kernel's proven cond-chain
    shape, the fallback if the SMEM queue+drain hits a Mosaic wall on
    first TPU contact) must be bit-identical to the drain default."""
    o, d = _rays(900, seed=31)
    ref = pallas_frontier_closest_hit(cols_dev, o, d, interpret=True,
                                      packet=512)
    monkeypatch.setenv("VKPT_FRONTIER_LEAF", "cond")
    got = pallas_frontier_closest_hit(cols_dev, o, d, interpret=True,
                                      packet=512)
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
    np.testing.assert_array_equal(np.asarray(got.tri),
                                  np.asarray(ref.tri))
    # And with HBM leaves (per-slot DMA under pl.when).
    got_h = pallas_frontier_closest_hit(cols_dev, o, d, interpret=True,
                                        packet=512, hbm_leaves=True)
    np.testing.assert_array_equal(np.asarray(got_h.t),
                                  np.asarray(ref.t))


def test_frontier_mxu_leaf_composes(cols_dev, monkeypatch):
    """VKPT_MT=mxu swaps the exact leaf MT for the coefficient-matmul
    tier (RELAXED parity, same budget as the quad kernel's tier)."""
    from vulkan_pathtracer_tpu.ops.mxu_mt import ensure_mt_coefs

    dev = ensure_mt_coefs(cols_dev)
    o, d = _rays(1500, seed=3)
    ref = pallas_frontier_closest_hit(dev, o, d, interpret=True,
                                      packet=512)
    monkeypatch.setenv("VKPT_MT", "mxu")
    got = pallas_frontier_closest_hit(dev, o, d, interpret=True,
                                      packet=512)
    ref_t = np.asarray(ref.t)
    got_t = np.asarray(got.t)
    flips = (ref_t < 1e31) != (got_t < 1e31)
    assert flips.mean() <= 0.002, flips.mean()
    both = (ref_t < 1e31) & (got_t < 1e31)
    np.testing.assert_allclose(got_t[both], ref_t[both],
                               rtol=2e-4, atol=2e-4)
    same_tri = np.asarray(ref.tri)[both] == np.asarray(got.tri)[both]
    assert (~same_tri).mean() <= 0.002


def test_refit_regenerates_frontier_table(columns_glb):
    """Frontier-tile regeneration through the static (src, enc) maps:
    (a) on unchanged geometry it reproduces the baked tiles exactly,
    (b) after a shift+refit the frontier kernel agrees with XLA."""
    from vulkan_pathtracer_tpu.ops.refit import refit_scene

    scene = gltf.load(columns_glb)
    dev = build_device_scene(scene, build_bvh=True)

    same = refit_scene(dev)
    np.testing.assert_array_equal(np.asarray(same.bvh_frontier),
                                  np.asarray(dev.bvh_frontier))

    shift = jnp.asarray([[0.3, -0.2, 0.6]], jnp.float32)
    refitted = refit_scene(
        dataclasses.replace(dev, tri_v0=dev.tri_v0 + shift))
    rng = np.random.default_rng(7)
    o = jnp.asarray(rng.uniform(-8, 8, size=(600, 3)).astype(np.float32))
    d = rng.normal(size=(600, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))
    ref = bvh_closest_hit(refitted, o, d)
    got = pallas_frontier_closest_hit(refitted, o, d, interpret=True,
                                      packet=512)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)


def test_device_builder_matches_host(cols_dev):
    """build_frontier_rows_device (the jittable refit twin) rebuilt
    from the SAME build-order boxes must reproduce the host tiles."""
    bmin, bmax = _build_order_bounds(cols_dev)
    tiles = build_frontier_rows_device(
        jnp.asarray(bmin), jnp.asarray(bmax),
        cols_dev.bvh_frontier_src, cols_dev.bvh_frontier_enc)
    np.testing.assert_array_equal(np.asarray(tiles),
                                  np.asarray(cols_dev.bvh_frontier))


def test_frontier_anyhit_matches_closest(cols_dev):
    """Any-hit mask == closest-hit's hit set (exact leaf MT accepts
    the same triangles; the guard band only widens box visits)."""
    from vulkan_pathtracer_tpu.ops.intersect import MISS_T
    from vulkan_pathtracer_tpu.ops.pallas_frontier import (
        pallas_frontier_any_hit,
    )

    o, d = _rays(1200, seed=71)
    rng = np.random.default_rng(4)
    active = jnp.asarray(rng.random(1200) < 0.7)
    ch = pallas_frontier_closest_hit(cols_dev, o, d, active,
                                     interpret=True, packet=512)
    want = (np.asarray(ch.t) < MISS_T) & np.asarray(active)
    got = pallas_frontier_any_hit(cols_dev, o, d, active,
                                  interpret=True, packet=512)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_frontier_anyhit_variants_match(cols_dev, monkeypatch):
    """HBM-streamed leaves and the cond leaf fallback are bit-
    identical to the drain/VMEM any-hit; the MXU leaf tier matches
    within the relaxed budget."""
    from vulkan_pathtracer_tpu.ops.mxu_mt import ensure_mt_coefs
    from vulkan_pathtracer_tpu.ops.pallas_frontier import (
        pallas_frontier_any_hit,
    )

    o, d = _rays(800, seed=72)
    ref = pallas_frontier_any_hit(cols_dev, o, d, interpret=True,
                                  packet=512)
    hbm = pallas_frontier_any_hit(cols_dev, o, d, interpret=True,
                                  packet=512, hbm_leaves=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(hbm))
    monkeypatch.setenv("VKPT_FRONTIER_LEAF", "cond")
    cnd = pallas_frontier_any_hit(cols_dev, o, d, interpret=True,
                                  packet=512)
    monkeypatch.delenv("VKPT_FRONTIER_LEAF")
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(cnd))
    dev = ensure_mt_coefs(cols_dev)
    monkeypatch.setenv("VKPT_MT", "mxu")
    mxu = pallas_frontier_any_hit(dev, o, d, interpret=True,
                                  packet=512)
    flips = np.asarray(ref) != np.asarray(mxu)
    assert flips.mean() <= 0.002, flips.mean()


def test_anyhit_dispatch_frontier(cols_dev, monkeypatch):
    """VKPT_ANYHIT_KERNEL=frontier routes _any_hit through the
    frontier any-hit kernel and matches the closest-hit mask."""
    from vulkan_pathtracer_tpu.ops.intersect import MISS_T
    from vulkan_pathtracer_tpu.ops.traverse import bvh_closest_hit
    from vulkan_pathtracer_tpu.render.wavefront import _any_hit

    o, d = _rays(700, seed=73)
    want = np.asarray(bvh_closest_hit(cols_dev, o, d).t) < MISS_T
    monkeypatch.setenv("VKPT_ANYHIT_KERNEL", "frontier")
    monkeypatch.setenv("VKPT_FRONTIER_PACKET", "512")
    got = _any_hit(cols_dev, o, d, None, "pallas")
    np.testing.assert_array_equal(np.asarray(got), want)


def test_frontier_width32_matches(columns_glb, monkeypatch):
    """VKPT_FRONTIER_WIDTH=32 (the host-sim visit winner): tiles bake
    at (8, 256), the kernel infers the width from the tables, and
    results still match the XLA traversal; the device refit twin
    reproduces the host tiles at the wider layout too."""
    from vulkan_pathtracer_tpu.ops.refit import refit_scene

    monkeypatch.setenv("VKPT_FRONTIER_WIDTH", "32")
    scene = gltf.load(columns_glb)
    dev = build_device_scene(scene, build_bvh=True)
    assert dev.bvh_frontier.shape[1:] == (8, 256)
    assert dev.bvh_frontier_src.shape[1] == 32
    o, d = _rays(1100, seed=81)
    ref = bvh_closest_hit(dev, o, d)
    got = pallas_frontier_closest_hit(dev, o, d, interpret=True,
                                      packet=512)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)
    assert (np.asarray(got.tri) == np.asarray(ref.tri)).mean() > 0.999
    same = refit_scene(dev)
    np.testing.assert_array_equal(np.asarray(same.bvh_frontier),
                                  np.asarray(dev.bvh_frontier))


def test_device_rebuild_nulls_frontier_tables(columns_glb):
    """A full on-device rebuild changes topology; there is no device
    16-ary collapse, so the stale frontier tables must be NULLED
    (else VKPT_KERNEL_*=frontier would traverse the pre-rebuild
    tree's boxes and links) and the fits gate must reject."""
    from vulkan_pathtracer_tpu.ops.device_build import (
        device_rebuild_scene,
    )

    host = gltf.load(columns_glb)
    template = build_device_scene(host, build_bvh=True)
    assert template.bvh_frontier is not None
    shift = jnp.asarray(np.array([0.7, -0.3, 0.4], np.float32))
    rebuilt = device_rebuild_scene(
        template, template.tri_v0 + shift, template.tri_e1,
        template.tri_e2, template.tri_gn, template.tri_attr)
    assert rebuilt.bvh_frontier is None
    assert rebuilt.bvh_frontier_src is None
    assert not frontier_fits_vmem(rebuilt)
    assert not frontier_hbm_fits(rebuilt)


def test_wavefront_dispatch_frontier(cols_dev, monkeypatch):
    """VKPT_KERNEL_SECONDARY=frontier routes _closest_hit through the
    frontier kernel and still matches the XLA traversal."""
    from vulkan_pathtracer_tpu.render.wavefront import _closest_hit

    o, d = _rays(700, seed=77)
    ref = bvh_closest_hit(cols_dev, o, d)
    monkeypatch.setenv("VKPT_KERNEL_SECONDARY", "frontier")
    monkeypatch.setenv("VKPT_FRONTIER_PACKET", "512")
    got = _closest_hit(cols_dev, o, d, None, "pallas",
                       phase="secondary")
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)
