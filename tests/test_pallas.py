"""Pallas packet-traversal kernel vs the XLA traversal (interpret mode
on CPU; the same kernel runs compiled on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vulkan_pathtracer_tpu.models import gltf
from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
from vulkan_pathtracer_tpu.ops.pallas_traverse import (
    fits_vmem,
    pallas_closest_hit,
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


def test_fits_vmem(cols_dev):
    assert fits_vmem(cols_dev)


def test_matches_xla_traversal(cols_dev):
    o, d = _rays(1500)
    ref = bvh_closest_hit(cols_dev, o, d)
    got = pallas_closest_hit(cols_dev, o, d, interpret=True)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)
    assert (np.asarray(got.tri) == np.asarray(ref.tri)).mean() > 0.999
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(ref.u),
                               rtol=1e-4, atol=1e-5)


def test_leaf_gate_matches(cols_dev):
    """Opt-in leaf-MT sublane-group gating (VKPT_LEAF_GATE) must be
    exact: a no-box-hit group cannot contain an in-range triangle hit
    under the same t_lim bound."""
    o, d = _rays(700, seed=4)
    ref = pallas_closest_hit(cols_dev, o, d, interpret=True,
                             packet=2048, leaf_gate=False)
    got = pallas_closest_hit(cols_dev, o, d, interpret=True,
                             packet=2048, leaf_gate=True)
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
    np.testing.assert_array_equal(np.asarray(got.tri),
                                  np.asarray(ref.tri))


def test_dense_hbm_leaves_matches(cols_dev):
    """HBM-streamed leaf rows (DMA per on-chain leaf into 3-slot
    scratch) must be bit-identical to the VMEM-resident dense kernel
    — same MT, only the fetch path changes."""
    from vulkan_pathtracer_tpu.ops.pallas_traverse import (
        dense_hbm_fits,
        pallas_dense_closest_hit,
    )

    assert dense_hbm_fits(cols_dev)
    o, d = _rays(900, seed=11)
    ref = pallas_dense_closest_hit(cols_dev, o, d, interpret=True,
                                   hbm_leaves=False)
    got = pallas_dense_closest_hit(cols_dev, o, d, interpret=True,
                                   hbm_leaves=True)
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
    np.testing.assert_array_equal(np.asarray(got.tri),
                                  np.asarray(ref.tri))
    np.testing.assert_array_equal(np.asarray(got.u), np.asarray(ref.u))


def test_leaf_gate_partial_tail_group(cols_dev):
    """packet=2560 -> sub=20 is not a multiple of the (8,128) gate
    group; the tail rows must be processed as a partial group, not
    dropped (regression: shape error / silent drop at trace time)."""
    o, d = _rays(600, seed=5)
    ref = pallas_closest_hit(cols_dev, o, d, interpret=True,
                             packet=2560, leaf_gate=False)
    got = pallas_closest_hit(cols_dev, o, d, interpret=True,
                             packet=2560, leaf_gate=True)
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
    np.testing.assert_array_equal(np.asarray(got.tri),
                                  np.asarray(ref.tri))


def test_active_mask(cols_dev):
    o, d = _rays(600, seed=9)
    rng = np.random.default_rng(1)
    act = jnp.asarray(rng.random(600) < 0.5)
    ref = bvh_closest_hit(cols_dev, o, d)
    got = pallas_closest_hit(cols_dev, o, d, active=act, interpret=True)
    a = np.asarray(act)
    assert (np.asarray(got.t)[~a] >= 1e31).all()
    assert (np.asarray(got.tri)[~a] == -1).all()
    np.testing.assert_allclose(np.asarray(got.t)[a], np.asarray(ref.t)[a],
                               rtol=1e-5, atol=1e-5)


def test_non_packet_multiple(cols_dev):
    """Ray counts that aren't PACKET multiples are padded correctly."""
    o, d = _rays(777, seed=5)
    ref = bvh_closest_hit(cols_dev, o, d)
    got = pallas_closest_hit(cols_dev, o, d, interpret=True)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)


def test_render_with_pallas_traversal(request):
    """Full render with traversal='pallas' (interpret) matches 'bvh'."""
    from vulkan_pathtracer_tpu.models.camera import Camera
    from vulkan_pathtracer_tpu.render.pipeline import render_frame

    scene = gltf.load(request.getfixturevalue("box_glb"))
    dev = build_device_scene(scene, build_bvh=True)
    cam = Camera(aspect_ratio=1.0,
                 position=np.array([0, 0.4, -3], np.float32))
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())
    kwargs = dict(num_samples=1, num_bounces=2, width=24, height=24)
    img_a, rays_a = render_frame(dev, pos, hor, ver, fwd, jnp.uint32(0),
                                 traversal="bvh", **kwargs)
    img_b, rays_b = render_frame(dev, pos, hor, ver, fwd, jnp.uint32(0),
                                 traversal="pallas", **kwargs)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b),
                               rtol=1e-4, atol=1e-5)
    assert float(rays_a) == float(rays_b)


def test_dense_matches_xla_traversal(cols_dev):
    """Dense-row run kernel (interpret) vs XLA traversal."""
    from vulkan_pathtracer_tpu.ops.pallas_traverse import (
        dense_fits_vmem,
        pallas_dense_closest_hit,
    )

    assert dense_fits_vmem(cols_dev)
    o, d = _rays(1500)
    ref = bvh_closest_hit(cols_dev, o, d)
    got = pallas_dense_closest_hit(cols_dev, o, d, interpret=True,
                                   packet=256)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)
    assert (np.asarray(got.tri) == np.asarray(ref.tri)).mean() > 0.999
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(ref.u),
                               rtol=1e-4, atol=1e-5)


def test_dense_rejects_oversize_packet(cols_dev):
    """packet > 2048 would silently corrupt the 2-nodes-per-reduction
    hit packing (c0 + 4096*c1 collides when all lanes hit) — the dense
    path must refuse it."""
    import pytest

    from vulkan_pathtracer_tpu.ops.pallas_traverse import (
        pallas_dense_closest_hit,
    )

    o, d = _rays(64)
    with pytest.raises(ValueError, match="2048"):
        pallas_dense_closest_hit(cols_dev, o, d, interpret=True,
                                 packet=4096)


def test_dense_active_mask(cols_dev):
    from vulkan_pathtracer_tpu.ops.pallas_traverse import (
        pallas_dense_closest_hit,
    )

    o, d = _rays(600, seed=9)
    rng = np.random.default_rng(1)
    act = jnp.asarray(rng.random(600) < 0.5)
    ref = bvh_closest_hit(cols_dev, o, d)
    got = pallas_dense_closest_hit(cols_dev, o, d, active=act,
                                   interpret=True, packet=256)
    a = np.asarray(act)
    assert (np.asarray(got.t)[~a] >= 1e31).all()
    assert (np.asarray(got.tri)[~a] == -1).all()
    np.testing.assert_allclose(np.asarray(got.t)[a], np.asarray(ref.t)[a],
                               rtol=1e-5, atol=1e-5)


def test_dense_refit_rows(cols_dev):
    """bvh_rows regenerated by refit_scene matches a fresh traversal."""
    import dataclasses

    from vulkan_pathtracer_tpu.ops.pallas_traverse import (
        pallas_dense_closest_hit,
    )
    from vulkan_pathtracer_tpu.ops.refit import refit_scene

    moved = dataclasses.replace(
        cols_dev, tri_v0=cols_dev.tri_v0 + jnp.float32(0.25)
    )
    refitted = refit_scene(moved)
    o, d = _rays(800, seed=21)
    ref = bvh_closest_hit(refitted, o, d)
    got = pallas_dense_closest_hit(refitted, o, d, interpret=True,
                                   packet=256)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)


def test_dense_staged_octant_mode(cols_dev, monkeypatch):
    """One-octant-staged node rows (the >800k-tri mode) must produce
    identical results to the all-resident mode."""
    from vulkan_pathtracer_tpu.ops.pallas_traverse import (
        pallas_dense_closest_hit,
    )

    o, d = _rays(1200, seed=17)
    ref = pallas_dense_closest_hit(cols_dev, o, d, interpret=True,
                                   packet=256)
    monkeypatch.setenv("VKPT_DENSE_STAGED", "1")
    got = pallas_dense_closest_hit(cols_dev, o, d, interpret=True,
                                   packet=256)
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
    np.testing.assert_array_equal(np.asarray(got.tri),
                                  np.asarray(ref.tri))


def test_group_mt_matches_baseline(cols_dev):
    """Group-MT leaf variant (dynamic sublane groups + idempotent
    full-width fallback) must equal the baseline packet kernel."""
    o, d = _rays(4096, seed=11)
    rng = np.random.default_rng(11)
    act = jnp.asarray(rng.uniform(size=4096) > 0.1)
    base = pallas_closest_hit(cols_dev, o, d, act, interpret=True,
                              packet=2048)
    for gf in (1, 2):
        got = pallas_closest_hit(cols_dev, o, d, act, interpret=True,
                                 packet=2048, group_mt=gf)
        np.testing.assert_array_equal(np.asarray(got.tri),
                                      np.asarray(base.tri))
        np.testing.assert_allclose(np.asarray(got.t),
                                   np.asarray(base.t), rtol=0, atol=0)


def test_pipe_matches_baseline(cols_dev):
    """Pipelined-pair kernel (cross-iteration reduction carry) must
    equal the baseline, including odd sizes padded to 2*packet."""
    o, d = _rays(5000, seed=12)
    rng = np.random.default_rng(12)
    act = jnp.asarray(rng.uniform(size=5000) > 0.1)
    base = pallas_closest_hit(cols_dev, o, d, act, interpret=True,
                              packet=2048)
    got = pallas_closest_hit(cols_dev, o, d, act, interpret=True,
                             packet=2048, pipe=True)
    np.testing.assert_array_equal(np.asarray(got.tri),
                                  np.asarray(base.tri))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(base.t),
                               rtol=0, atol=0)


def test_t_window_cascade_tiles_exactly(cols_dev):
    """t-slab windows [0,a) [a,b) [b,inf) merged per-lane must equal a
    single full-range traversal bit-exactly (closed lower bounds tile
    the ray; boundary hits land in exactly one window)."""
    from vulkan_pathtracer_tpu.ops.intersect import MISS_T

    n = 4096
    o, d = _rays(n, seed=13)
    rng = np.random.default_rng(13)
    act = jnp.asarray(rng.uniform(size=n) > 0.1)
    base = pallas_closest_hit(cols_dev, o, d, act, interpret=True,
                              packet=2048)
    bounds = [0.0, 1.5, 4.0, float("inf")]
    t = jnp.full((n,), jnp.float32(MISS_T))
    tri = jnp.full((n,), -1, jnp.int32)
    found = jnp.zeros((n,), bool)
    for k in range(3):
        lo, hi = bounds[k], bounds[k + 1]
        a = act & ~found
        h = pallas_closest_hit(
            cols_dev, o, d, a, interpret=True, packet=2048,
            t_near=(None if k == 0 else lo),
            t_far=(None if hi == float("inf") else hi),
        )
        got = h.t < MISS_T
        t = jnp.where(got, h.t, t)
        tri = jnp.where(got, h.tri, tri)
        found = found | got
    np.testing.assert_array_equal(np.asarray(tri), np.asarray(base.tri))
    np.testing.assert_allclose(np.asarray(t), np.asarray(base.t),
                               rtol=0, atol=0)


def test_pair_kernel_matches(cols_dev):
    """The pair-stack BVH2 kernel (shared SMEM stack, dynamic
    near-first ordering, one canonical node table) must agree exactly
    with the XLA traversal."""
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        pair_fits_vmem,
        pallas_pair_closest_hit,
    )

    assert pair_fits_vmem(cols_dev)
    o, d = _rays(1700, seed=21)
    ref = bvh_closest_hit(cols_dev, o, d)
    got = pallas_pair_closest_hit(cols_dev, o, d, interpret=True,
                                  packet=512)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)
    assert (np.asarray(got.tri) == np.asarray(ref.tri)).mean() > 0.999


def test_pair_kernel_active_mask_and_tnear(cols_dev):
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        pallas_pair_closest_hit,
    )
    from vulkan_pathtracer_tpu.ops.intersect import MISS_T

    o, d = _rays(600, seed=22)
    rng = np.random.default_rng(0)
    active = jnp.asarray(rng.random(600) < 0.6)
    ref = bvh_closest_hit(cols_dev, o, d, active)
    got = pallas_pair_closest_hit(cols_dev, o, d, active,
                                  interpret=True, packet=512)
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
    # t-window: [t_near, t_far) hits only.
    full = pallas_pair_closest_hit(cols_dev, o, d, interpret=True,
                                   packet=512)
    t_np = np.asarray(full.t)
    lo_w = float(np.percentile(t_np[t_np < 1e31], 50))
    win = pallas_pair_closest_hit(cols_dev, o, d, interpret=True,
                                  packet=512, t_near=lo_w)
    w_t = np.asarray(win.t)
    inside = t_np >= lo_w
    np.testing.assert_array_equal(w_t[inside & (t_np < 1e31)],
                                  t_np[inside & (t_np < 1e31)])
    assert (w_t[~inside] >= lo_w).all() | (w_t[~inside] == MISS_T).any()


def test_quad_kernel_matches(cols_dev):
    """4-wide pair-stack kernel (BVH4 collapse) vs XLA traversal."""
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        pallas_quad_closest_hit,
    )

    o, d = _rays(1700, seed=41)
    ref = bvh_closest_hit(cols_dev, o, d)
    got = pallas_quad_closest_hit(cols_dev, o, d, interpret=True,
                                  packet=512)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)
    assert (np.asarray(got.tri) == np.asarray(ref.tri)).mean() > 0.999


def test_quad_kernel_active_mask(cols_dev):
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        pallas_quad_closest_hit,
    )

    o, d = _rays(600, seed=42)
    rng = np.random.default_rng(2)
    active = jnp.asarray(rng.random(600) < 0.6)
    ref = bvh_closest_hit(cols_dev, o, d, active)
    got = pallas_quad_closest_hit(cols_dev, o, d, active,
                                  interpret=True, packet=512)
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))


def test_oct_kernel_matches(cols_dev):
    """8-wide stack kernel (BVH8 collapse) vs XLA traversal."""
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        oct_fits_vmem,
        pallas_oct_closest_hit,
    )

    assert oct_fits_vmem(cols_dev)
    o, d = _rays(1700, seed=51)
    ref = bvh_closest_hit(cols_dev, o, d)
    got = pallas_oct_closest_hit(cols_dev, o, d, interpret=True,
                                 packet=512)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)
    assert (np.asarray(got.tri) == np.asarray(ref.tri)).mean() > 0.999


def test_oct_kernel_active_mask(cols_dev):
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        pallas_oct_closest_hit,
    )

    o, d = _rays(600, seed=52)
    rng = np.random.default_rng(3)
    active = jnp.asarray(rng.random(600) < 0.6)
    ref = bvh_closest_hit(cols_dev, o, d, active)
    got = pallas_oct_closest_hit(cols_dev, o, d, active,
                                 interpret=True, packet=512)
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))


def test_sort_networks_sort():
    """The comparator networks used for near-first slot ordering in
    the quad/oct kernels actually sort (a wrong network would be a
    silent perf bug: traversal stays exact but pushes far-first)."""
    from vulkan_pathtracer_tpu.ops.pallas_pair import _SORT_NETS

    rng = np.random.default_rng(0)
    for width, net in _SORT_NETS.items():
        for _ in range(200):
            keys = rng.random(width)
            vals = np.arange(width)
            k, v = keys.copy(), vals.copy()
            for a, b in net:
                if k[a] > k[b]:
                    k[a], k[b] = k[b], k[a]
                    v[a], v[b] = v[b], v[a]
            assert (np.diff(k) >= 0).all()
            np.testing.assert_array_equal(k, np.sort(keys))


def test_oct_rows_structure(cols_dev):
    """BVH8 collapse invariants: row width 64, node table at most the
    quad table's size, every enc slot either links a valid row or a
    valid leaf block, and empty slots carry NaN boxes."""
    oct_rows = np.asarray(cols_dev.bvh_oct)
    quad_rows = np.asarray(cols_dev.bvh_quad)
    n_leaves = cols_dev.tri_blocks.shape[0]
    assert oct_rows.shape[1] == 64
    assert oct_rows.shape[0] <= quad_rows.shape[0]
    encs = oct_rows[:, 48:56]
    boxes = oct_rows[:, :48].reshape(-1, 8, 6)
    internal = encs >= 0
    assert (encs[internal] < oct_rows.shape[0]).all()
    leaf_rows = (-encs[~internal]) - 1
    assert (leaf_rows >= 0).all() and (leaf_rows < n_leaves).all()
    # A NaN box must carry a dead enc (leaf row 0 encoding -1.0).
    empty = np.isnan(boxes).any(axis=2)
    assert (encs[empty] == -1.0).all()

def test_quad_hbm_leaves_matches(cols_dev):
    """HBM-streamed leaf rows for the quad stack kernel (DMA per
    hit-leaf slot into a width-slot scratch) must be bit-identical to
    the VMEM-resident quad kernel — same MT, only the fetch path
    changes."""
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        pallas_quad_closest_hit,
        quad_hbm_fits,
    )

    assert quad_hbm_fits(cols_dev)
    o, d = _rays(1100, seed=61)
    ref = pallas_quad_closest_hit(cols_dev, o, d, interpret=True,
                                  packet=512, hbm_leaves=False)
    got = pallas_quad_closest_hit(cols_dev, o, d, interpret=True,
                                  packet=512, hbm_leaves=True)
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
    np.testing.assert_array_equal(np.asarray(got.tri),
                                  np.asarray(ref.tri))
    np.testing.assert_array_equal(np.asarray(got.u), np.asarray(ref.u))


def test_oct_hbm_leaves_matches(cols_dev):
    """Same for the 8-wide oct kernel (8-slot scratch)."""
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        oct_hbm_fits,
        pallas_oct_closest_hit,
    )

    assert oct_hbm_fits(cols_dev)
    o, d = _rays(900, seed=62)
    ref = pallas_oct_closest_hit(cols_dev, o, d, interpret=True,
                                 packet=512, hbm_leaves=False)
    got = pallas_oct_closest_hit(cols_dev, o, d, interpret=True,
                                 packet=512, hbm_leaves=True)
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
    np.testing.assert_array_equal(np.asarray(got.tri),
                                  np.asarray(ref.tri))


def test_wavefront_dispatch_quad_hbm_override(cols_dev, monkeypatch):
    """An explicit ``*_hbm`` kernel override (VKPT_KERNEL_*=quad_hbm /
    VKPT_JOINT_KERNEL=quad_hbm) must dispatch the HBM-streamed-leaf
    tier DIRECTLY — not fall back to the in-VMEM twin first.  The
    worker-kill bisect relies on this to run a whole joint program
    with the leaf tables out of VMEM (ROADMAP round-4 finding 6)."""
    import vulkan_pathtracer_tpu.ops.pallas_pair as pp
    from vulkan_pathtracer_tpu.render.wavefront import _closest_hit

    o, d = _rays(700, seed=78)
    ref = bvh_closest_hit(cols_dev, o, d)
    seen = {}
    real = pp.pallas_quad_closest_hit

    def spy(*a, **kw):
        seen.update(kw)
        return real(*a, **kw)

    monkeypatch.setattr(pp, "pallas_quad_closest_hit", spy)
    monkeypatch.setenv("VKPT_KERNEL_SECONDARY", "quad_hbm")
    got = _closest_hit(cols_dev, o, d, None, "pallas",
                       phase="secondary")
    assert seen.get("hbm_leaves") is True
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("hbm", [False, True])
def test_quad_gated_bitexact(cols_dev, hbm):
    """Round-5 vreg-gated leaf MT: gating skips (8,128) vreg groups
    whose lanes ALL failed the leaf slab test — an exact skip (a tri
    inside the leaf AABB cannot be hit at a t the slab interval
    excluded), so gated output must be BIT-identical to ungated, in
    both the in-VMEM and HBM-streamed leaf tiers."""
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        pallas_quad_closest_hit,
    )

    o, d = _rays(3000, seed=55)
    rng = np.random.default_rng(5)
    active = jnp.asarray(rng.random(3000) < 0.8)
    ref = pallas_quad_closest_hit(cols_dev, o, d, active,
                                  interpret=True, packet=2048,
                                  hbm_leaves=hbm)
    got = pallas_quad_closest_hit(cols_dev, o, d, active,
                                  interpret=True, packet=2048,
                                  hbm_leaves=hbm, gated=True)
    for f in ("t", "tri", "u", "v"):
        np.testing.assert_array_equal(np.asarray(getattr(got, f)),
                                      np.asarray(getattr(ref, f)))
