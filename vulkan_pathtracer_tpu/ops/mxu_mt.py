"""MXU leaf intersection: Moller-Trumbore as one small matmul.

The stack kernels' per-leaf-visit cost decomposes as ~126 scalar VMEM
loads (9 per triangle x block 14, ~3-5 cycles each) plus ~55 vector
ops per triangle on the VPU — both at a measured floor (ROADMAP:
three latency-hiding structures lost; the triple products are 19
irreducible MACs/triangle on the VPU).  This module moves those MACs
to the MXU by precomputing, per triangle, the coefficients that make
the det-scaled MT quantities LINEAR in a 10-feature ray vector

    r = [d, m, o, 1],  m = o x d  (the ray's Plucker moment)

so a leaf visit becomes ONE (10, 4*block) x (10, packet) matmul plus
a short det-scaled epilogue and a cross-triangle min-reduction:

    det       = d . (e2 x e1)
    u * det   = m . e2          + d . (v0 x e2)
    v * det   = -(m . e1)       + d . (e1 x v0)
    t * det   = o . (e1 x e2)   - v0 . (e1 x e2)

(derived by scalar-triple-product rotation from the exact kernel's
p = d x e2, q = (o - v0) x e1 forms; verified to float64 precision in
tests/test_mxu_mt.py).  Hit conditions are evaluated det-scaled
(backface cull makes det > 0, so u' >= 0 <=> u >= 0 etc.); only the
winning candidate's t/u/v are divided back.

RELAXED-PARITY TIER: the rearranged arithmetic (precomputed cross
products, MXU accumulation order, det-scaled compares under f32
rounding) is NOT bit-exact vs the exact kernels / the XLA path /
brute force — hits within ~1 ulp of a triangle edge or of a t-window
boundary can flip.  It is therefore opt-in (VKPT_MT=mxu), excluded
from the bit-exact golden contract, and tested with tolerance +
mismatch-rate bounds instead (tests/test_mxu_mt.py).  Reference
anchor: this accelerates the intersection the driver's RT hardware
performs behind traceRayEXT (ray_gen.rgen:50-63); the reference never
wrote this code, so there is no exactness contract to break upstream
— only our internal XLA-parity one.

Matmul precision (VKPT_MXU_PRECISION): TPU f32 matmuls lower to 1/3/6
bf16 passes for DEFAULT/HIGH/HIGHEST.  Default here is HIGHEST
(accuracy first); HIGH is the expected speed/accuracy sweet spot —
A/B on hardware before changing the default.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_LANE = 128
_BIG = np.float32(3e38)
_KBIG = np.int32(1 << 20)


def mxu_precision():
    # Mosaic's dot lowering rejects Precision.HIGH outright (measured
    # round-4 first contact: "Unsupported dot precision: HIGH"), and
    # the visit microbench puts DEFAULT ~= HIGHEST per-visit cost
    # (11171 vs 11266 cyc — these small matmuls are latency-bound,
    # not MXU-pass-bound), so a 3-pass tier has no niche: "high"
    # aliases HIGHEST.
    name = os.environ.get("VKPT_MXU_PRECISION", "highest").lower()
    if name == "default":
        # Measured on hardware (round-4 isolated A/B): 1-pass bf16
        # coefficients produce a -3.8% checksum — a different HIT SET,
        # not 1-ulp drift.  Allowed for A/B harnesses only.
        import warnings

        warnings.warn(
            "VKPT_MXU_PRECISION=default is quality-broken (measured "
            "-3.8% hit checksum on the atrium A/B); use 'highest'.",
            stacklevel=2)
    return {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGHEST,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]


def build_mt_coef_rows(tri_blocks: np.ndarray, block: int) -> np.ndarray:
    """(n_leaves, block*9) [v0|e1|e2 per tri] -> (n_leaves, 10,
    4*block) f32 coefficient rows.

    Column groups: [0..B) det, [B..2B) u', [2B..3B) v', [3B..4B) t'.
    Feature rows: 0-2 multiply d, 3-5 m, 6-8 o, 9 the constant 1.
    Cross products are taken in float64 and rounded once so the
    precomputation adds at most 0.5 ulp on top of the matmul's own
    rounding.  Padded (degenerate, zero-edge) triangle slots yield
    all-zero columns => det == 0 => can never hit, matching the exact
    kernels' guarantee (models/device_scene.py pads with zero edges).
    """
    n = tri_blocks.shape[0]
    t = tri_blocks.reshape(n, block, 9).astype(np.float64)
    v0, e1, e2 = t[:, :, 0:3], t[:, :, 3:6], t[:, :, 6:9]
    nrm = np.cross(e1, e2)
    C = np.zeros((n, 10, 4 * block), np.float32)
    B = block

    def put(rows, cols, val):
        C[:, rows, cols] = val.transpose(0, 2, 1).astype(np.float32)

    put(slice(0, 3), slice(0, B), np.cross(e2, e1))
    put(slice(0, 3), slice(B, 2 * B), np.cross(v0, e2))
    put(slice(3, 6), slice(B, 2 * B), e2)
    put(slice(0, 3), slice(2 * B, 3 * B), np.cross(e1, v0))
    put(slice(3, 6), slice(2 * B, 3 * B), -e1)
    put(slice(6, 9), slice(3 * B, 4 * B), nrm)
    C[:, 9, 3 * B:4 * B] = -(v0 * nrm).sum(-1).astype(np.float32)
    return C


def build_mt_coef_rows_device(tri_v0, tri_e1, tri_e2, block):
    """jnp twin of build_mt_coef_rows for on-device scene rebuilds
    (ops/device_build.device_rebuild_scene): inputs are the padded
    per-slot (n_slots, 3) arrays (n_slots % block == 0, degenerate
    zero-edge padding slots).  f32 cross products (no float64 on
    TPU) — one extra rounding vs the host builder's float64 path,
    inside the tier's relaxed-parity budget either way."""
    n = tri_v0.shape[0]
    z = jnp.zeros((n, 3), jnp.float32)
    nrm = jnp.cross(tri_e1, tri_e2)
    rows012 = jnp.stack(
        [jnp.cross(tri_e2, tri_e1), jnp.cross(tri_v0, tri_e2),
         jnp.cross(tri_e1, tri_v0), z], axis=2)        # (n, 3, 4)
    rows345 = jnp.stack([z, tri_e2, -tri_e1, z], axis=2)
    rows678 = jnp.stack([z, z, z, nrm], axis=2)
    zc = jnp.zeros((n,), jnp.float32)
    row9 = jnp.stack(
        [zc, zc, zc, -(tri_v0 * nrm).sum(-1)], axis=1)[:, None, :]
    C = jnp.concatenate([rows012, rows345, rows678, row9], axis=1)
    C = C.reshape(n // block, block, 10, 4).transpose(0, 2, 3, 1)
    return C.reshape(n // block, 10, 4 * block)


def instance_feature_maps(inst_inv):
    """Per-instance WORLD->OBJECT feature-transform tiles for the
    instanced MXU leaf tier: (I, 16) inverse-transform rows
    [W row-major (9) | w (3) | det_sign | pad] -> (I, 10, 16) f32 A
    with  feats_object = A @ pad_features16(feats_world).

    The 10-feature ray vector r = [d, m, o, 1] (m = o x d) transforms
    LINEARLY under the affine map x -> W x + w:

        d' = W d
        m' = o' x d' = (W o + w) x (W d) = cof(W) m + [w]x W d
        o' = W o + w

    (cof(W) = det(W) W^-T, columns c1 x c2, c2 x c0, c0 x c1 of W's
    columns ci — the standard (Wa) x (Wb) = cof(W)(a x b) identity),
    so ONE tiny (10, 16) x (16, P) matmul per leaf visit replaces the
    exact kernel's 18-MAC object-space ray transform AND feeds the
    same per-MESH object-space coefficient table — instancing keeps
    its geometry-once memory contract (tri_coefs is mesh-local; only
    these 640 B/instance tiles depend on transforms).  Works with np
    rows (host bake) and jnp rows (device transform updates)."""
    xp = np if isinstance(inst_inv, np.ndarray) else jnp
    n = inst_inv.shape[0]
    W = inst_inv[:, 0:9].reshape(n, 3, 3)
    w = inst_inv[:, 9:12]
    c0, c1, c2 = W[:, :, 0], W[:, :, 1], W[:, :, 2]
    cof = xp.stack([xp.cross(c1, c2), xp.cross(c2, c0),
                    xp.cross(c0, c1)], axis=2)       # columns
    zc = xp.zeros((n,), inst_inv.dtype)
    skew = xp.stack([
        xp.stack([zc, -w[:, 2], w[:, 1]], axis=1),
        xp.stack([w[:, 2], zc, -w[:, 0]], axis=1),
        xp.stack([-w[:, 1], w[:, 0], zc], axis=1),
    ], axis=1)                                       # (n, 3, 3)
    skew_w = xp.einsum("nij,njk->nik", skew, W)
    z33 = xp.zeros((n, 3, 3), inst_inv.dtype)
    z37 = xp.zeros((n, 3, 7), inst_inv.dtype)
    rows_d = xp.concatenate([W, z33, z33, z37], axis=2)
    rows_m = xp.concatenate([skew_w, cof, z33, z37], axis=2)
    rows_o = xp.concatenate(
        [z33, z33, W, w[:, :, None],
         xp.zeros((n, 3, 6), inst_inv.dtype)], axis=2)
    row_1 = xp.concatenate(
        [xp.zeros((n, 1, 9), inst_inv.dtype),
         xp.ones((n, 1, 1), inst_inv.dtype),
         xp.zeros((n, 1, 6), inst_inv.dtype)], axis=2)
    A = xp.concatenate([rows_d, rows_m, rows_o, row_1], axis=1)
    return A.astype("float32")


def ensure_mt_coefs(dev):
    """Attach tri_coefs (and, for instanced scenes, inst_feat) to an
    already-baked DeviceScene (tests / experiment harnesses).  Syncs
    device arrays to host — do NOT call during a bake (relay stall;
    bake-time coefs come from the bake's host copies when
    VKPT_MT=mxu)."""
    if getattr(dev, "tri_coefs", None) is None and \
            dev.tri_blocks is not None:
        dev.tri_coefs = jnp.asarray(build_mt_coef_rows(
            np.asarray(dev.tri_blocks), dev.max_leaf_size))
    if getattr(dev, "instanced", False) and \
            getattr(dev, "inst_feat", None) is None:
        dev.inst_feat = jnp.asarray(instance_feature_maps(
            np.asarray(dev.inst_inv)))
    return dev


# -- kernel-side helpers (also valid outside Pallas for tests) -----------


def flatten_rows(x):
    """(sub, 128) -> (1, sub*128), element (s, l) -> column s*128+l.

    jnp.reshape: measured EXACT on real Mosaic (round-4 first
    contact).  The previous slice+lane-concat form dies in lowering —
    tpu.concatenate requires all inputs at sublane offset {0,0} but
    x[s:s+1] keeps offset {s,0} ("result/input offset mismatch on
    non-concat dimension").
    """
    sub = x.shape[0]
    if sub == 1:
        return x
    return jnp.reshape(x, (1, sub * _LANE))


def unflatten_rows(y, sub):
    """(1, sub*128) -> (sub, 128), inverse of flatten_rows (reshape
    measured exact on real Mosaic, as is the 128-aligned lane-slice
    concat it replaces)."""
    if sub == 1:
        return y
    return jnp.reshape(y, (sub, _LANE))


def packet_features(ox, oy, oz, dx, dy, dz):
    """Per-packet feature matrix F (10, P) from (sub, 128) comps.

    Built once per packet (the matmul rhs for every leaf visit):
    rows [dx, dy, dz, mx, my, mz, ox, oy, oz, 1], m = o x d.
    """
    mx = oy * dz - oz * dy
    my = oz * dx - ox * dz
    mz = ox * dy - oy * dx
    rows = [dx, dy, dz, mx, my, mz, ox, oy, oz]
    flat = [flatten_rows(r) for r in rows]
    flat.append(jnp.ones_like(flat[0]))
    return jnp.concatenate(flat, axis=0)


def pad_features16(feats):
    """(10, P) feature matrix -> (16, P): six zero rows so the
    instanced (10, 16) A-tiles contract without lane slicing."""
    return jnp.concatenate(
        [feats, jnp.zeros((6, feats.shape[1]), jnp.float32)], axis=0)


def mt_coef_visit(coef, feats, tnear_f, tlim_f, tri_base, block,
                  tmin, precision, det_sign=None):
    """One leaf visit, flat layout.

    coef (10, >=4*block) f32 (trailing lane padding is zero => those
    phantom triangles have det == 0 and never hit); feats (10, P);
    tnear_f/tlim_f (1, P).  ``det_sign`` (scalar, instanced world-
    winding cull) scales ALL det-linear quantities uniformly — the
    divided t/u/v are unchanged and det > 0 becomes det*sign > 0,
    exactly the exact kernels' mirrored-instance semantics.  Returns
    (t (1, P) with BIG for no-hit, tri (1, P) i32 block-LOCAL k +
    tri_base, u, v) — candidates only; the caller merges against its
    running best (a candidate exists iff t < tlim, which the hit test
    already enforced).
    """
    B = block
    res = jax.lax.dot_general(
        coef, feats, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    if det_sign is not None:
        res = res * det_sign
    det = res[0:B]
    up = res[B:2 * B]
    vp = res[2 * B:3 * B]
    tp = res[3 * B:4 * B]
    front = det > 0.0
    inv = 1.0 / jnp.where(front, det, 1.0)
    t = tp * inv
    hit = (front & (up >= 0.0) & (vp >= 0.0) & (up + vp <= det)
           & (t > tmin) & (t >= tnear_f) & (t < tlim_f))
    tc = jnp.where(hit, t, _BIG)
    tbest = jnp.min(tc, axis=0, keepdims=True)
    # First-triangle tie-break (== the exact kernels' ascending-k
    # strict-less update order).
    kidx = jax.lax.broadcasted_iota(jnp.int32, tc.shape, 0)
    ks = jnp.min(jnp.where(tc == tbest, kidx, _KBIG),
                 axis=0, keepdims=True)
    sel = jnp.logical_and(kidx == ks, hit)

    def pick(a):
        return jnp.sum(jnp.where(sel, a, 0.0), axis=0, keepdims=True)

    u = pick(up * inv)
    v = pick(vp * inv)
    tri = tri_base + jnp.minimum(ks, jnp.int32(B - 1))
    return tbest, tri, u, v


def mt_coef_visit_anyhit(coef, feats, tnear_f, tl_f, block, tmin,
                         precision, det_sign=None):
    """Any-hit leaf visit, flat layout: returns (1, P) f32 — 1.0
    where SOME triangle accepts.  Fully det-scaled (no division at
    all: under front, det > 0, so t-window compares multiply through
    by det; ``det_sign`` scales all rows uniformly, see
    mt_coef_visit).  The scaled compares can disagree with the
    closest-hit MXU tier's divided t by ~1 ulp on window-grazing hits
    — both are inside the relaxed-parity budget."""
    B = block
    res = jax.lax.dot_general(
        coef, feats, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    if det_sign is not None:
        res = res * det_sign
    det = res[0:B]
    up = res[B:2 * B]
    vp = res[2 * B:3 * B]
    tp = res[3 * B:4 * B]
    acc = ((det > 0.0) & (up >= 0.0) & (vp >= 0.0)
           & (up + vp <= det) & (tp > tmin * det)
           & (tp >= tnear_f * det) & (tp < tl_f * det))
    return jnp.max(acc.astype(jnp.float32), axis=0, keepdims=True)
