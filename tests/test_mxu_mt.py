"""MXU leaf-intersection tier (ops/mxu_mt.py) correctness.

The coefficient rearrangement (det-scaled Plucker forms) is RELAXED
parity by design: on real hardware the matmul's bf16-pass accumulation
can flip hits within ~ulps of a triangle edge.  In interpret mode the
matmul is exact f32, so the remaining differences vs the exact kernels
come only from the rearranged arithmetic — these tests therefore
assert near-exact agreement (tiny mismatch budget on edge-grazing
rays) plus exact agreement of the coefficient FORMULAS against the
kernel's p/q forms in float64.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

# Measured-dead-end opt-in tier (VERDICT r4 weak #3): fully
# exercised only in the full lane (pytest -m '').
pytestmark = pytest.mark.deadend

from vulkan_pathtracer_tpu.models import gltf
from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
from vulkan_pathtracer_tpu.ops.intersect import MISS_T
from vulkan_pathtracer_tpu.ops.mxu_mt import (
    build_mt_coef_rows,
    ensure_mt_coefs,
)
from vulkan_pathtracer_tpu.ops.pallas_pair import pallas_quad_closest_hit


def _rays(n, seed=3):
    rng = np.random.default_rng(seed)
    origins = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    targets = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    d = targets - origins
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(origins), jnp.asarray(d)


def test_coefficient_formulas_match_exact_mt():
    """(det, u', v', t') from the coefficient dot products == the
    kernel's p = d x e2 / q = T x e1 forms, to float64 roundoff."""
    rng = np.random.default_rng(0)
    n, B = 7, 4
    blocks = rng.normal(size=(n, B * 9)).astype(np.float32)
    C = build_mt_coef_rows(blocks, B)
    assert C.shape == (n, 10, 4 * B)

    o = rng.normal(size=(3,))
    d = rng.normal(size=(3,))
    m = np.cross(o, d)
    feats = np.concatenate([d, m, o, [1.0]])
    got = np.einsum("k,nkc->nc", feats, C.astype(np.float64))

    t = blocks.reshape(n, B, 9).astype(np.float64)
    v0, e1, e2 = t[:, :, 0:3], t[:, :, 3:6], t[:, :, 6:9]
    p = np.cross(d, e2)
    det = (e1 * p).sum(-1)
    T = o - v0
    q = np.cross(T, e1)
    ref = np.concatenate(
        [det, (T * p).sum(-1), (d * q).sum(-1), (e2 * q).sum(-1)],
        axis=-1,
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_padded_slots_cannot_hit():
    """Zero-edge padding triangles produce all-zero coefficient
    columns => det == 0 => rejected by the front test."""
    blocks = np.zeros((2, 3 * 9), np.float32)
    blocks[0, 0:9] = [0, 0, 0, 1, 0, 0, 0, 1, 0]  # one real tri
    C = build_mt_coef_rows(blocks, 3)
    # Padding tri columns (k = 1, 2 of row 0; all of row 1) are zero.
    assert not C[0][:, [1, 2, 4, 5, 7, 8, 10, 11]].any()
    assert not C[1].any()


@pytest.fixture(scope="module")
def cols_mxu(request):
    scene = gltf.load(request.getfixturevalue("columns_glb"))
    dev = build_device_scene(scene, build_bvh=True)
    return ensure_mt_coefs(dev)


def _run_both(dev, n, seed, monkeypatch_env, hbm=False):
    o, d = _rays(n, seed)
    ref = pallas_quad_closest_hit(dev, o, d, interpret=True)
    monkeypatch_env.setenv("VKPT_MT", "mxu")
    try:
        got = pallas_quad_closest_hit(dev, o, d, interpret=True,
                                      hbm_leaves=hbm)
    finally:
        monkeypatch_env.delenv("VKPT_MT")
    return ref, got


def _assert_relaxed_parity(ref, got, n, max_mismatch=0.002):
    ref_t = np.asarray(ref.t)
    got_t = np.asarray(got.t)
    # Hit/miss agreement (edge-grazing rays may flip: tiny budget).
    flips = (ref_t < MISS_T) != (got_t < MISS_T)
    assert flips.mean() <= max_mismatch, flips.mean()
    both = (ref_t < MISS_T) & (got_t < MISS_T)
    np.testing.assert_allclose(got_t[both], ref_t[both],
                               rtol=2e-4, atol=2e-4)
    same_tri = np.asarray(ref.tri)[both] == np.asarray(got.tri)[both]
    # Different triangle with ~equal t = a shared-edge tie: allow few.
    assert (~same_tri).mean() <= max_mismatch
    np.testing.assert_allclose(
        np.asarray(got.u)[both][same_tri],
        np.asarray(ref.u)[both][same_tri], rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(got.v)[both][same_tri],
        np.asarray(ref.v)[both][same_tri], rtol=5e-3, atol=5e-3)


def test_quad_mxu_matches_exact(cols_mxu, monkeypatch):
    ref, got = _run_both(cols_mxu, 1500, 3, monkeypatch)
    _assert_relaxed_parity(ref, got, 1500)


def test_quad_mxu_hbm_matches_vmem(cols_mxu, monkeypatch):
    """HBM-streamed coefficient rows == VMEM-resident rows exactly
    (same arithmetic, different staging)."""
    o, d = _rays(900, seed=11)
    monkeypatch.setenv("VKPT_MT", "mxu")
    a = pallas_quad_closest_hit(cols_mxu, o, d, interpret=True)
    b = pallas_quad_closest_hit(cols_mxu, o, d, interpret=True,
                                hbm_leaves=True)
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))


def test_quad_mxu_respects_active_and_seed(cols_mxu, monkeypatch):
    """Dead lanes stay at their seeded state; alive lanes only
    improve on the seed (the t < t_lim window honors seeds)."""
    o, d = _rays(1024, seed=7)
    active = jnp.asarray(np.arange(1024) % 3 != 0)
    monkeypatch.setenv("VKPT_MT", "mxu")
    got = pallas_quad_closest_hit(cols_mxu, o, d, active,
                                  interpret=True)
    dead = ~np.asarray(active)
    assert (np.asarray(got.t)[dead] == MISS_T).all()
    assert (np.asarray(got.tri)[dead] == -1).all()


def test_quad_mxu_anyhit_matches_closest(cols_mxu, monkeypatch):
    """Any-hit MXU mask == closest-hit MXU (t < MISS_T) up to the
    det-scaled-vs-divided t-window rounding (tiny budget)."""
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        pallas_quad_any_hit,
    )

    o, d = _rays(1500, seed=13)
    monkeypatch.setenv("VKPT_MT", "mxu")
    ch = pallas_quad_closest_hit(cols_mxu, o, d, interpret=True)
    ah = pallas_quad_any_hit(cols_mxu, o, d, interpret=True)
    flips = np.asarray(ah) != (np.asarray(ch.t) < MISS_T)
    assert flips.mean() <= 0.002, flips.mean()


def test_quad_mxu_anyhit_hbm_matches_vmem(cols_mxu, monkeypatch):
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        pallas_quad_any_hit,
    )

    o, d = _rays(800, seed=19)
    monkeypatch.setenv("VKPT_MT", "mxu")
    a = pallas_quad_any_hit(cols_mxu, o, d, interpret=True)
    b = pallas_quad_any_hit(cols_mxu, o, d, interpret=True,
                            hbm_leaves=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quad_mxu_wide_leaf_matches_xla(request, monkeypatch):
    """Leaf blocks > 14 are MXU-tier-exclusive (the exact kernels'
    block*9-lane rows exceed Mosaic's static-lane-index tile, but
    4*block coefficient columns fit one lane tile up to block 32).
    Parity anchor at block 28 is the XLA traversal, which has no
    lane-width limit."""
    from vulkan_pathtracer_tpu.ops.traverse import bvh_closest_hit

    scene = gltf.load(request.getfixturevalue("columns_glb"))
    dev = build_device_scene(scene, build_bvh=True, max_leaf_size=28)
    assert dev.tri_blocks.shape[1] == 28 * 9  # exact tiers reject
    ensure_mt_coefs(dev)
    o, d = _rays(1200, seed=23)
    ref = bvh_closest_hit(dev, o, d)
    monkeypatch.setenv("VKPT_MT", "mxu")
    got = pallas_quad_closest_hit(dev, o, d, interpret=True)
    _assert_relaxed_parity(ref, got, 1200)


def test_device_coef_builder_matches_host():
    """build_mt_coef_rows_device (jnp, used by on-device rebuilds)
    == the host builder up to its float64-vs-f32 cross products."""
    from vulkan_pathtracer_tpu.ops.mxu_mt import (
        build_mt_coef_rows_device,
    )

    rng = np.random.default_rng(4)
    n, B = 6, 4
    blocks = rng.normal(size=(n, B * 9)).astype(np.float32)
    host = build_mt_coef_rows(blocks, B)
    t = blocks.reshape(n * B, 9)
    dev = build_mt_coef_rows_device(
        jnp.asarray(t[:, 0:3]), jnp.asarray(t[:, 3:6]),
        jnp.asarray(t[:, 6:9]), B)
    np.testing.assert_allclose(np.asarray(dev), host,
                               rtol=1e-6, atol=1e-6)


def test_deforming_rebuild_regenerates_coefs(request, monkeypatch):
    """A device rebuild must not leave stale MXU coefficients.  The
    stale-coef failure mode is the MXU tier intersecting the OLD
    triangles, so the property is: on the REBUILT (deformed) scene,
    MXU == the exact quad kernel (which reads the fresh tri_blocks)
    within the tier's usual tolerance — while differing wildly from
    the exact kernel on the pre-deform scene."""
    from vulkan_pathtracer_tpu.ops.device_build import (
        device_rebuild_scene,
    )

    scene = gltf.load(request.getfixturevalue("columns_glb"))
    template = ensure_mt_coefs(
        build_device_scene(scene, build_bvh=True))

    def warp(p):
        ang = 0.25 * p[:, 1:2]
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        x = ca[:, 0] * p[:, 0] - sa[:, 0] * p[:, 2]
        z = sa[:, 0] * p[:, 0] + ca[:, 0] * p[:, 2]
        return jnp.stack([x, p[:, 1], z], axis=1)

    v0, e1, e2 = template.tri_v0, template.tri_e1, template.tri_e2
    w0 = warp(v0)
    we1 = warp(v0 + e1) - w0
    we2 = warp(v0 + e2) - w0
    gn = jnp.cross(we1, we2)
    rebuilt = device_rebuild_scene(template, w0, we1, we2, gn,
                                   template.tri_attr)
    assert rebuilt.tri_coefs is not None

    o, d = _rays(800, seed=31)
    ref = pallas_quad_closest_hit(rebuilt, o, d, interpret=True)
    old = pallas_quad_closest_hit(template, o, d, interpret=True)
    monkeypatch.setenv("VKPT_MT", "mxu")
    got = pallas_quad_closest_hit(rebuilt, o, d, interpret=True)
    _assert_relaxed_parity(ref, got, 800)
    # Sanity: the deformation actually changed the answer (a stale-
    # coef bug could not pass _assert_relaxed_parity by accident).
    changed = (np.asarray(old.t) != np.asarray(ref.t)).mean()
    assert changed > 0.1, changed


def test_instanced_scene_ignores_mxu_env(request, monkeypatch):
    """Instanced scenes WITHOUT baked coefficient/feature tables must
    silently keep the exact kernels under VKPT_MT=mxu (identical
    results) — the tier only activates once ensure_mt_coefs (or a
    VKPT_MT=mxu bake) attaches tri_coefs + inst_feat."""
    from vulkan_pathtracer_tpu.models.instanced_scene import (
        build_instanced_scene,
    )
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        pallas_pair_closest_hit,
    )

    scene = gltf.load(request.getfixturevalue("columns_glb"))
    dev = build_instanced_scene(scene)
    assert dev.instanced and dev.tri_coefs is None
    o, d = _rays(600, seed=41)
    ref = pallas_pair_closest_hit(dev, o, d, interpret=True)
    monkeypatch.setenv("VKPT_MT", "mxu")
    got = pallas_pair_closest_hit(dev, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(got.t))


def test_instance_feature_map_math():
    """A @ pad16(feats_world) == packet features of the object-space
    ray, for random affine maps (incl. a mirrored one): the linearity
    derivation d'=Wd, m'=cof(W)m+[w]xWd, o'=Wo+w is exact."""
    from vulkan_pathtracer_tpu.ops.mxu_mt import instance_feature_maps

    rng = np.random.default_rng(11)
    for mirror in (1.0, -1.0):
        W = rng.normal(size=(3, 3)).astype(np.float32)
        W[0] *= mirror
        w = rng.normal(size=3).astype(np.float32)
        inst_inv = np.zeros((1, 16), np.float32)
        inst_inv[0, 0:9] = W.reshape(-1)
        inst_inv[0, 9:12] = w
        inst_inv[0, 12] = np.sign(np.linalg.det(W))
        A = instance_feature_maps(inst_inv)[0]          # (10, 16)
        o = rng.normal(size=3).astype(np.float32)
        d = rng.normal(size=3).astype(np.float32)
        feats_w = np.concatenate(
            [d, np.cross(o, d), o, [1.0]]).astype(np.float64)
        feats16 = np.concatenate([feats_w, np.zeros(6)])
        got = A.astype(np.float64) @ feats16
        oo = W.astype(np.float64) @ o + w
        dd = W.astype(np.float64) @ d
        want = np.concatenate([dd, np.cross(oo, dd), oo, [1.0]])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def inst_mxu(request):
    """Instanced columns scene with the MXU tables attached, plus the
    exact-kernel twin (same scene object pre-ensure — ensure mutates,
    so build two)."""
    from vulkan_pathtracer_tpu.models.instanced_scene import (
        build_instanced_scene,
    )

    scene = gltf.load(request.getfixturevalue("columns_glb"))
    dev = build_instanced_scene(scene, max_leaf_size=8)
    return ensure_mt_coefs(dev)


def test_instanced_pair_mxu_matches_exact(inst_mxu, monkeypatch):
    """Instanced MXU leaf tier (feature-transform matmul + object-
    space coefficient visit) vs the exact instanced pair kernel."""
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        pallas_pair_closest_hit,
    )

    o, d = _rays(1500, seed=43)
    ref = pallas_pair_closest_hit(inst_mxu, o, d, interpret=True,
                                  packet=512)
    monkeypatch.setenv("VKPT_MT", "mxu")
    got = pallas_pair_closest_hit(inst_mxu, o, d, interpret=True,
                                  packet=512)
    _assert_relaxed_parity(ref, got, 1500)


def test_instanced_mirrored_mxu(monkeypatch):
    """det_sign path: a mirrored (negative-determinant) instance must
    keep world-winding culling under the MXU tier."""
    import tempfile

    from assets import procedural as pr
    from vulkan_pathtracer_tpu.models.instanced_scene import (
        build_instanced_scene,
    )
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        pallas_pair_closest_hit,
    )

    prim = pr.box_prim((0, 0, 0), (1, 1, 1), 0)
    mats = [pr.MaterialDesc(base_color=(1, 0, 0, 1))]
    nodes = [
        pr.NodeDesc(mesh=0, translation=(-1.5, 0, 0)),
        pr.NodeDesc(mesh=0, translation=(1.5, 0, 0),
                    scale=(-1.0, 1.0, 1.0)),
    ]
    path = tempfile.mktemp(suffix=".glb")
    pr.write_glb(path, meshes=[[prim]], materials=mats, nodes=nodes)
    dev = ensure_mt_coefs(
        build_instanced_scene(gltf.load(path), max_leaf_size=8))
    o, d = _rays(900, seed=23)
    ref = pallas_pair_closest_hit(dev, o, d, interpret=True,
                                  packet=512)
    monkeypatch.setenv("VKPT_MT", "mxu")
    got = pallas_pair_closest_hit(dev, o, d, interpret=True,
                                  packet=512)
    _assert_relaxed_parity(ref, got, 900)
    # The mirrored instance must actually be hittable under the tier
    # (a wrong det_sign would cull it entirely).
    hit_right = (np.asarray(got.t) < MISS_T) & (np.asarray(o)[:, 0]
                                                + np.asarray(got.t)
                                                * np.asarray(d)[:, 0]
                                                > 0.5)
    assert hit_right.sum() > 10


def test_instanced_pair_mxu_anyhit(inst_mxu, monkeypatch):
    """Instanced any-hit MXU tier: occlusion mask vs the exact
    instanced any-hit kernel (tiny edge-grazing budget)."""
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        pallas_pair_any_hit,
    )

    o, d = _rays(1200, seed=44)
    ref = pallas_pair_any_hit(inst_mxu, o, d, interpret=True,
                              packet=512)
    monkeypatch.setenv("VKPT_MT", "mxu")
    got = pallas_pair_any_hit(inst_mxu, o, d, interpret=True,
                              packet=512)
    flips = np.asarray(ref) != np.asarray(got)
    assert flips.mean() <= 0.002, flips.mean()


def test_transform_update_regenerates_inst_feat(inst_mxu, request,
                                                monkeypatch):
    """update_instance_transforms must regenerate the feature tiles:
    after a move, the MXU pair kernel agrees with the XLA traversal
    over the SAME moved scene (a stale inst_feat would intersect
    pre-move geometry)."""
    from vulkan_pathtracer_tpu.models.instanced_scene import (
        update_instance_transforms,
    )
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        pallas_pair_closest_hit,
    )
    from vulkan_pathtracer_tpu.ops.traverse import bvh_closest_hit

    # Offset each instance's ORIGINAL transform (a uniform replacement
    # would stack every instance at one spot — coincident surfaces).
    host = gltf.load(request.getfixturevalue("columns_glb"))
    t = np.stack([i.transform for i in host.instances]).astype(
        np.float32)
    rng = np.random.default_rng(9)
    t[:, :3, 3] += rng.uniform(-0.6, 0.6, (t.shape[0], 3)).astype(
        np.float32)
    moved = update_instance_transforms(inst_mxu, jnp.asarray(t))
    assert moved.inst_feat is not None
    o, d = _rays(900, seed=45)
    ref = bvh_closest_hit(moved, o, d)
    monkeypatch.setenv("VKPT_MT", "mxu")
    got = pallas_pair_closest_hit(moved, o, d, interpret=True,
                                  packet=512)
    _assert_relaxed_parity(ref, got, 900)


def test_chunked_render_mxu(request, monkeypatch):
    """The headline program shape: quad MXU kernel inside a chunked
    lax.map trace (render_rows pins chunked traces to one stack-kernel
    family).  Chunked == unchunked under the tier (same tight band the
    exact kernels hold — ROADMAP finding 7: chunking reassociates),
    and MXU tracks the exact render loosely."""
    from vulkan_pathtracer_tpu.models.camera import Camera
    from vulkan_pathtracer_tpu.render.pipeline import render_rows
    from vulkan_pathtracer_tpu.render.wavefront import (
        uniform_stack_kernel,
    )

    for env in ("VKPT_PACKET", "VKPT_PAIR_PACKET", "VKPT_QUAD_PACKET"):
        monkeypatch.setenv(env + "_PRIMARY", "256")
        monkeypatch.setenv(env + "_SECONDARY", "256")
    scene = gltf.load(request.getfixturevalue("columns_glb"))
    dev = ensure_mt_coefs(build_device_scene(scene, build_bvh=True))
    cam = Camera(aspect_ratio=1.0,
                 position=np.array([0, 2, -8], np.float32))
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())
    kw = dict(num_samples=1, num_bounces=2, width=48, height=48,
              traversal="pallas", sort_secondary=True)

    with uniform_stack_kernel("quad"):
        exact, _ = render_rows(dev, pos, hor, ver, fwd, jnp.uint32(3),
                               ray_chunk=0, **kw)
        monkeypatch.setenv("VKPT_MT", "mxu")
        base, rays_base = render_rows(dev, pos, hor, ver, fwd,
                                      jnp.uint32(3), ray_chunk=0, **kw)
    monkeypatch.setenv("VKPT_CHUNK_KERNEL", "quad")
    img, rays = render_rows(dev, pos, hor, ver, fwd, jnp.uint32(3),
                            ray_chunk=576, **kw)
    np.testing.assert_allclose(np.asarray(img), np.asarray(base),
                               rtol=1e-4, atol=1e-5)
    assert float(rays) == float(rays_base)
    # Relaxed parity at the image level: radiance only moves where a
    # hit flipped; the columns view has none at this camera.
    np.testing.assert_allclose(np.asarray(base), np.asarray(exact),
                               rtol=5e-3, atol=5e-3)


def test_bake_attaches_coefs(request, monkeypatch):
    monkeypatch.setenv("VKPT_MT", "mxu")
    scene = gltf.load(request.getfixturevalue("columns_glb"))
    dev = build_device_scene(scene, build_bvh=True)
    assert dev.tri_coefs is not None
    assert dev.tri_coefs.shape[1] == 10
    assert dev.tri_coefs.shape[2] == 4 * dev.max_leaf_size
