"""Frontier traversal: the node phase on the MXU.

The stack kernels' remaining per-visit floor is SERIAL node work: the
oct (8-wide) experiment showed wide collapses die on the 7*width
scalar VMEM loads per visit (ROADMAP round-3 finding 9 — "the doubled
per-visit scalar-load chain eats the visit reduction"), and the
cross-lane min-reductions cost ~100 cycles each (they pipeline 2-4
deep at best; three latency-hiding structures measured dead —
ROADMAP).  This kernel restructures the node visit so NEITHER cost
scales with width:

- Each visit tests a 16-child frontier (a BVH16 collapse — 4 binary
  levels) with ONE MXU matmul.  The node table is stored directly in
  COEFFICIENT layout, one (8, 128) f32 tile per super-node: the slab
  plane distance  t = b*inv_d - o*inv_d  is linear in the 6 ray
  features [ix, iy, iz, -ox*ix, -oy*iy, -oz*iz], so
  dot_general(tile, feats(8, P)) yields all 96 plane distances for
  the whole packet at once — the per-visit node fetch is one VMEM
  tile read (zero scalar box loads; the 16 child links are 16 scalar
  enc loads, vs the oct kernel's 56 box+enc loads for half the
  children).
- The 16 per-child packet-min entry distances come from ONE batched
  (16, P) axis-1 reduction instead of 16 serial cross-lane
  reductions — the ~100-cycle reduction is paid once per 16 children
  instead of once per 2-4.
- Leaf hits are queued in SMEM and drained by a nested while loop
  whose Moller-Trumbore visit runs UNconditionally — no
  dot_general-under-lax.cond (a recorded Mosaic first-contact risk
  for the quad MXU tier); VKPT_FRONTIER_LEAF=cond keeps the quad
  kernel's cond-chain shape as a fallback.

The collapse width is configurable (VKPT_FRONTIER_WIDTH = 16/32/64 at
bake; the kernels infer it from the baked tables).  Host sim: w=32
gives ~1.75x fewer super-visits than w=16 at flat box-test totals
(ROADMAP round-4 findings; w=64 regressed) — the matmul lanes and the
scalar sort grow with width, so the choice is a hardware A/B.

Tile layout (8 sublanes x lane_w lanes; shown for w = 16 slots,
lane_w = 128):

  lanes [0:16) [16:32) [32:48) [48:64) [64:80) [80:96)  [96:128)
        lo_x    lo_y    lo_z    hi_x    hi_y    hi_z     pad
  row 0: slot's plane value where the column's axis is x, else 0
  row 1/2: same for y/z
  row 3/4/5: 1.0 where the column's axis is x/y/z (multiplies the
             -o*inv feature), else 0
  row 6: child enc at lane s (>= 0: child super-row; < 0: leaf block
         row, -(row+1)); row 7: zero pad
  Empty slots carry NaN plane values — NaN propagates through the
  matmul and the slab min/max chain and tn <= tf compares False, the
  same never-hit encoding the quad/oct rows use.

Precision / guard band: the matmul runs at VKPT_FRONTIER_PRECISION
(default|high|highest; DEFAULT = one bf16 pass).  bf16 rounding could
turn a grazing box hit into a FALSE MISS (wrong image), so the
builders dilate every box by  guard * (|b| + |root|)  per axis
(VKPT_FRONTIER_GUARD, default 2^-7 ~ 2x the bf16 product error
bound): the dilation strictly dominates the rounding error, so
rounding can only ADD visits (perf), never drop geometry.  With
guard >= 0 the LEAF intersection is untouched — frontier + exact MT
returns the exact kernels' results (traversal visits a superset;
best-hit updates are strict-less).  Frontier + VKPT_MT=mxu composes
with the RELAXED-parity MXU leaf tier (ops/mxu_mt.py).

Reference anchor: this replaces the closest-hit BVH scheduling the
driver's RT hardware performs behind traceRayEXT
(/root/reference/src/shaders/ray_gen.rgen:50-63); the reference never
wrote traversal code — the MXU formulation is original, shaped by
Mosaic's measured serial-chain costs.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vulkan_pathtracer_tpu.ops.intersect import Hit, MISS_T, TMAX, TMIN
from vulkan_pathtracer_tpu.ops.pallas_traverse import vmem_clamp
from vulkan_pathtracer_tpu.ops.pallas_pair import (
    PAIR_BIG,
    STACK_CAP,
    _assert_depth,
    _nary_collapse,
)

_LANE = 128
FRONTIER_WIDTH = 16  # default; override at bake with VKPT_FRONTIER_WIDTH


def frontier_width() -> int:
    """Collapse width baked into the tiles (16, 32, or 64).  The host
    sim (experiments/frontier_sim.py + ROADMAP round-4 findings)
    measured w=32 at ~1.75x fewer super-visits than w=16 with flat
    box-test totals (w=64 regressed); the per-visit matmul doubles in
    lanes and the scalar sort grows (63 -> 191 comparators), so the
    width choice is a hardware A/B."""
    return int(os.environ.get("VKPT_FRONTIER_WIDTH", FRONTIER_WIDTH))


def _lane_w(width: int) -> int:
    """Tile lane width: 6*width plane columns padded to a lane tile."""
    return -(-6 * width // _LANE) * _LANE


def _fstack(width: int) -> int:
    """A width-ary collapse folds log2(width) binary levels per
    frontier level, so the collapsed depth is <= ceil(STACK_CAP /
    log2(width)) + 1; the packet-shared stack holds at most width-1
    deferred entries per level.  STACK_CAP // 2 per level is a >2x
    safety margin over the bound for every supported width."""
    return (width - 1) * (STACK_CAP // 2)


def _batcher_oem(n):
    """Batcher odd-even mergesort comparator list for n keys (63
    comparators at n=16).  A wrong network would only cost perf
    (far-first pushes) — unit-tested exact anyway."""
    pairs = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return pairs


_SORT16 = _batcher_oem(FRONTIER_WIDTH)


def _guard() -> float:
    """Guard-band scale, baked into the tiles at BUILD time.

    Default keys off VKPT_FRONTIER_PRECISION: DEFAULT (1 bf16 pass)
    needs 2^-7 (~2x the bf16 product error bound); HIGH/HIGHEST
    (3/6 passes ~ f32) need only 2^-12 — the host sim measured the
    2^-7 band at +15% super-visits / +35% leaf visits vs +1.4%/+5%
    at 2^-12 (experiments/frontier_sim.py), so a tight band is the
    difference between a real and a nullified node-phase win.
    CONSISTENCY: tiles baked under a HIGH/HIGHEST env must not be
    dispatched at DEFAULT precision (the baked band would be too
    small for 1-pass rounding) — set both envs once per run, or pin
    VKPT_FRONTIER_GUARD explicitly."""
    env = os.environ.get("VKPT_FRONTIER_GUARD")
    if env is not None:
        return float(env)
    name = os.environ.get("VKPT_FRONTIER_PRECISION",
                          "default").lower()
    return 2.0 ** -7 if name == "default" else 2.0 ** -12


def frontier_precision():
    name = os.environ.get("VKPT_FRONTIER_PRECISION", "default").lower()
    return {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGHEST,  # Mosaic rejects HIGH; see mxu_mt.mxu_precision
        "highest": jax.lax.Precision.HIGHEST,
    }[name]


def _base_tile(w: int) -> np.ndarray:
    base = np.zeros((8, _lane_w(w)), np.float32)
    for a in range(3):
        base[a, a * w:(a + 1) * w] = np.nan          # empty: NaN plane
        base[a, (3 + a) * w:(4 + a) * w] = np.nan
        base[3 + a, a * w:(a + 1) * w] = 1.0         # -o*inv feature
        base[3 + a, (3 + a) * w:(4 + a) * w] = 1.0
    base[6, 0:w] = -1.0                              # dead leaf row 0
    return base


def build_frontier_rows(bvh, block: int, guard: float = None,
                        width: int = None) -> np.ndarray:
    """(Nw, 8, lane_w) f32 coefficient tiles for a width-ary collapse
    of the binary tree (see module docstring for the layout; lane_w =
    6*width padded to a lane tile).  ``guard`` dilates each child box
    by guard * (|b| + |root|) per axis so low-precision matmul
    rounding can never turn a hit into a miss."""
    from vulkan_pathtracer_tpu.ops.bvh import tree_depth

    _assert_depth(tree_depth(bvh), "build frontier rows")
    if guard is None:
        guard = _guard()
    w = frontier_width() if width is None else width
    super_row, children = _nary_collapse(bvh, w)
    nw = len(children)
    tiles = np.tile(_base_tile(w)[None], (nw, 1, 1))
    R = np.maximum(np.abs(bvh.bmin[0]), np.abs(bvh.bmax[0]))
    for node, kids in children:
        r = super_row[node]
        for s, (kind, cid) in enumerate(kids):
            lo = bvh.bmin[cid].astype(np.float64)
            hi = bvh.bmax[cid].astype(np.float64)
            d = guard * (np.maximum(np.abs(lo), np.abs(hi)) + R)
            lo = (lo - d).astype(np.float32)
            hi = (hi + d).astype(np.float32)
            for a in range(3):
                tiles[r, a, a * w + s] = lo[a]
                tiles[r, a, (3 + a) * w + s] = hi[a]
            if kind == "super":
                tiles[r, 6, s] = float(super_row[cid])
            else:
                tiles[r, 6, s] = -float(
                    bvh.leaf_first[cid] // block + 1)
    return tiles


def frontier_static_maps(bvh, block: int, width: int = None):
    """Static (src, enc) maps for device-side tile regeneration after
    refit: src (Nw, width) int32 build-order node ids per slot (-1 =
    empty); enc (Nw, width) f32 with build_frontier_rows' encoding."""
    w = frontier_width() if width is None else width
    super_row, children = _nary_collapse(bvh, w)
    nw = len(children)
    src = np.full((nw, w), -1, np.int32)
    enc = np.full((nw, w), -1.0, np.float32)
    for node, kids in children:
        r = super_row[node]
        for s, (kind, cid) in enumerate(kids):
            src[r, s] = cid
            if kind == "super":
                enc[r, s] = float(super_row[cid])
            else:
                enc[r, s] = -float(bvh.leaf_first[cid] // block + 1)
    return src, enc


def build_frontier_rows_device(bmin, bmax, src, enc,
                               guard: float = None):
    """jnp twin of build_frontier_rows for topology-stable refits:
    fresh build-order boxes through static (src, enc) maps -> (Nw, 8,
    lane_w) tiles.  Width inferred from src; same guard-band dilation,
    f32 arithmetic."""
    if guard is None:
        guard = _guard()
    w = src.shape[1]
    nw = src.shape[0]
    live = src >= 0
    idx = jnp.maximum(src, 0)
    lo = jnp.take(bmin, idx, axis=0)      # (Nw, w, 3)
    hi = jnp.take(bmax, idx, axis=0)
    R = jnp.maximum(jnp.abs(bmin[0]), jnp.abs(bmax[0]))
    d = guard * (jnp.maximum(jnp.abs(lo), jnp.abs(hi)) + R)
    nan = jnp.float32(np.nan)
    lo = jnp.where(live[:, :, None], lo - d, nan)
    hi = jnp.where(live[:, :, None], hi + d, nan)

    z = jnp.zeros((nw, w), jnp.float32)
    one = jnp.ones((nw, w), jnp.float32)  # -o*inv feature rows
    pad_n = _lane_w(w) - 6 * w

    def lane_row(groups):
        groups = list(groups)
        if pad_n:
            groups.append(jnp.zeros((nw, pad_n), jnp.float32))
        return jnp.concatenate(groups, axis=1)

    rows = [
        lane_row([lo[:, :, 0], z, z, hi[:, :, 0], z, z]),
        lane_row([z, lo[:, :, 1], z, z, hi[:, :, 1], z]),
        lane_row([z, z, lo[:, :, 2], z, z, hi[:, :, 2]]),
        lane_row([one, z, z, one, z, z]),
        lane_row([z, one, z, z, one, z]),
        lane_row([z, z, one, z, z, one]),
        lane_row([enc, z, z, z, z, z]),
        lane_row([z, z, z, z, z, z]),
    ]
    return jnp.stack(rows, axis=1)


# ---------------------------------------------------------------- kernel


def _make_frontier_kernel(n_rows: int, block: int, packet: int,
                          tmin: float, hbm_leaves: bool = False,
                          mxu_precision=None, node_precision=None,
                          leaf_mode: str = "drain",
                          width: int = FRONTIER_WIDTH):
    """Closest-hit frontier kernel body.  ``mxu_precision`` non-None
    switches the leaf phase to the MXU coefficient tier (tris_ref is
    then (n_leaves, 10, >=4*block)); ``node_precision`` sets the slab
    matmul's passes; ``leaf_mode`` 'drain' uses the SMEM queue +
    nested while (no dot_general under cond), 'cond' keeps the quad
    kernel's proven cond-chain shape."""
    from vulkan_pathtracer_tpu.ops import mxu_mt

    sub = packet // _LANE
    w = width
    sortnet = _batcher_oem(w)
    mxu = mxu_precision is not None
    if node_precision is None:
        node_precision = jax.lax.Precision.HIGHEST

    def kernel(nodes_ref, tris_ref, rays_ref, out_ref, stack_ref,
               q_ref, qn_ref, mins_ref, *rest):
        leaf_scratch = leaf_sems = None
        if hbm_leaves:
            leaf_scratch, leaf_sems = rest
        comps = [rays_ref[0, 0, i, :].reshape(sub, _LANE)
                 for i in range(12)]
        eps = jnp.float32(1e-20)

        def sinv(d):
            return 1.0 / jnp.where(jnp.abs(d) < eps,
                                   jnp.where(d >= 0, eps, -eps), d)

        ox, oy, oz = comps[0], comps[1], comps[2]
        dx, dy, dz = comps[3], comps[4], comps[5]
        tl = comps[6]
        ix, iy, iz = sinv(dx), sinv(dy), sinv(dz)
        tnear = jnp.maximum(comps[11], jnp.float32(tmin))

        t0 = comps[7]
        tri0 = jax.lax.bitcast_convert_type(comps[8], jnp.int32)
        u0 = comps[9]
        v0 = comps[10]
        big = jnp.float32(PAIR_BIG)

        flat = mxu_mt.flatten_rows
        # Slab matmul rhs, built once per packet: rows 6-7 are zero so
        # the full (8, 128) node tile can be the lhs (enc row 6
        # contributes nothing — no sub-tile slice needed).
        feats = jnp.concatenate(
            [flat(ix), flat(iy), flat(iz),
             flat(-(ox * ix)), flat(-(oy * iy)), flat(-(oz * iz)),
             jnp.zeros((2, sub * _LANE), jnp.float32)],
            axis=0)                                    # (8, P)
        tnear_f = flat(tnear)
        if mxu:
            mfeats = mxu_mt.packet_features(ox, oy, oz, dx, dy, dz)

        def leaf_visit(row, slot, args):
            t_best, tri_best, u_best, v_best = args
            if hbm_leaves:
                pltpu.make_async_copy(
                    tris_ref.at[row],
                    leaf_scratch.at[slot],
                    leaf_sems.at[slot],
                ).wait()
            if mxu:
                coef = (leaf_scratch[slot] if hbm_leaves
                        else tris_ref[row])
                tlim_f = flat(jnp.minimum(t_best, tl))
                tb, trib, ub, vb = mxu_mt.mt_coef_visit(
                    coef, mfeats, tnear_f, tlim_f, row * block, block,
                    jnp.float32(tmin), mxu_precision)
                tb_u = mxu_mt.unflatten_rows(tb, sub)
                upd = tb_u < jnp.minimum(t_best, tl)
                return (
                    jnp.where(upd, tb_u, t_best),
                    jnp.where(upd, mxu_mt.unflatten_rows(trib, sub),
                              tri_best),
                    jnp.where(upd, mxu_mt.unflatten_rows(ub, sub),
                              u_best),
                    jnp.where(upd, mxu_mt.unflatten_rows(vb, sub),
                              v_best),
                )
            # Exact Moller-Trumbore block — identical math to the
            # pair/quad kernels (bit-exact parity with the XLA path).
            if hbm_leaves:
                tread = lambda base: leaf_scratch[slot, base]
            else:
                tread = lambda base: tris_ref[row, base]
            tri_base = row * block
            for k in range(block):
                base = k * 9
                v0x = tread(base + 0)
                v0y = tread(base + 1)
                v0z = tread(base + 2)
                e1x = tread(base + 3)
                e1y = tread(base + 4)
                e1z = tread(base + 5)
                e2x = tread(base + 6)
                e2y = tread(base + 7)
                e2z = tread(base + 8)
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                front = det > 0.0
                inv_det = 1.0 / jnp.where(front, det, 1.0)
                tx = ox - v0x
                ty = oy - v0y
                tz = oz - v0z
                u = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (dx * qx + dy * qy + dz * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                t_lim = jnp.minimum(t_best, tl)
                hit = (front & (u >= 0.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (t > tmin) & (t >= tnear)
                       & (t < t_lim))
                t_best = jnp.where(hit, t, t_best)
                tri_best = jnp.where(hit, tri_base + k, tri_best)
                u_best = jnp.where(hit, u, u_best)
                v_best = jnp.where(hit, v, v_best)
            return t_best, tri_best, u_best, v_best

        def cond(state):
            return state[0] >= 0

        def body(state):
            cur, sp, t_best, tri_best, u_best, v_best = state
            tile = nodes_ref[cur]                      # (8, 128)
            t_lim = jnp.minimum(t_best, tl)
            tlim_f = flat(t_lim)
            # ONE matmul: all 96 slab plane distances for the packet.
            res = jax.lax.dot_general(
                tile, feats, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=node_precision)              # (128, P)
            tx0 = res[0 * w:1 * w]
            ty0 = res[1 * w:2 * w]
            tz0 = res[2 * w:3 * w]
            tx1 = res[3 * w:4 * w]
            ty1 = res[4 * w:5 * w]
            tz1 = res[5 * w:6 * w]
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1),
                            jnp.minimum(ty0, ty1)),
                jnp.maximum(jnp.minimum(tz0, tz1), tnear_f))
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1),
                            jnp.maximum(ty0, ty1)),
                jnp.minimum(jnp.maximum(tz0, tz1), tlim_f))
            entry = jnp.where(tn <= tf, tn, big)       # (w, P)
            # ONE batched reduction for all 16 per-child packet mins.
            m = jnp.min(entry, axis=1, keepdims=True)  # (w, 1)
            mins_ref[...] = jnp.broadcast_to(m, (w, _LANE))
            ms = [mins_ref[s, 0] for s in range(w)]
            encs = [nodes_ref[cur, 6, s] for s in range(w)]
            hits = [ms[s] < big for s in range(w)]
            leafs = [e < 0.0 for e in encs]

            hb = (t_best, tri_best, u_best, v_best)
            if leaf_mode == "cond":
                # Quad-kernel shape: per-slot DMA + cond-chained MT.
                if hbm_leaves:
                    for s in range(w):
                        @pl.when(jnp.logical_and(hits[s], leafs[s]))
                        def _(s=s):
                            row = (-encs[s]).astype(jnp.int32) - 1
                            pltpu.make_async_copy(
                                tris_ref.at[row],
                                leaf_scratch.at[s],
                                leaf_sems.at[s],
                            ).start()
                for s in range(w):
                    hb = jax.lax.cond(
                        jnp.logical_and(hits[s], leafs[s]),
                        functools.partial(
                            lambda e, a, s=s: leaf_visit(
                                (-e).astype(jnp.int32) - 1, s, a),
                            encs[s]),
                        lambda a: a,
                        hb,
                    )
            else:
                # SMEM queue + drain: the MT visit runs with no cond
                # around it (hit-leaf slots only enter the queue).
                qn_ref[0] = 0
                for s in range(w):
                    @pl.when(jnp.logical_and(hits[s], leafs[s]))
                    def _(s=s):
                        qi = qn_ref[0]
                        row = (-encs[s]).astype(jnp.int32) - 1
                        q_ref[qi] = row
                        if hbm_leaves:
                            pltpu.make_async_copy(
                                tris_ref.at[row],
                                leaf_scratch.at[qi],
                                leaf_sems.at[qi],
                            ).start()
                        qn_ref[0] = qi + 1
                qn_total = qn_ref[0]

                def dcond(st):
                    return st[0] < qn_total

                def dbody(st):
                    i = st[0]
                    out = leaf_visit(q_ref[i], i, st[1:])
                    return (i + 1,) + tuple(out)

                st = jax.lax.while_loop(
                    dcond, dbody, (jnp.int32(0),) + tuple(hb))
                hb = st[1:]
            t_best, tri_best, u_best, v_best = hb

            # Internal slots: near-first sort + far-to-near pushes.
            keys = [jnp.where(
                jnp.logical_and(hits[s], jnp.logical_not(leafs[s])),
                ms[s], big) for s in range(w)]
            ks = list(keys)
            cs = [e.astype(jnp.int32) for e in encs]

            def cswap(a, b):
                lt = ks[a] <= ks[b]
                ka = jnp.where(lt, ks[a], ks[b])
                kb = jnp.where(lt, ks[b], ks[a])
                ca = jnp.where(lt, cs[a], cs[b])
                cb = jnp.where(lt, cs[b], cs[a])
                ks[a], ks[b], cs[a], cs[b] = ka, kb, ca, cb

            for a, b in sortnet:
                cswap(a, b)

            live = [k < big for k in ks]
            pos = [None] * w
            p = sp
            for s in range(w - 1, 0, -1):
                pos[s] = p
                p = p + live[s].astype(jnp.int32)
            sp_pushed = p

            for s in range(w - 1, 0, -1):
                @pl.when(live[s])
                def _(s=s):
                    stack_ref[pos[s]] = cs[s]

            desc = live[0]
            popped = stack_ref[jnp.maximum(sp_pushed - 1, 0)]
            can_pop = sp_pushed > 0
            cur_new = jnp.where(
                desc, cs[0],
                jnp.where(can_pop, popped, jnp.int32(-1)))
            sp_new = jnp.where(desc, sp_pushed,
                               jnp.maximum(sp_pushed - 1, 0))
            return (cur_new, sp_new, t_best, tri_best, u_best, v_best)

        init = (jnp.int32(0), jnp.int32(0), t0, tri0, u0, v0)
        _, _, tb, trib, ub, vb = jax.lax.while_loop(cond, body, init)
        out_ref[0, 0, 0, :] = tb.reshape(-1)
        out_ref[0, 0, 1, :] = jax.lax.bitcast_convert_type(
            trib, jnp.float32).reshape(-1)
        out_ref[0, 0, 2, :] = ub.reshape(-1)
        out_ref[0, 0, 3, :] = vb.reshape(-1)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "hbm_leaves", "mxu",
                              "node_precision", "leaf_mode", "width"))
def _frontier_traverse(nodes, tris, rays, *, interpret=False,
                       hbm_leaves=False, mxu=None,
                       node_precision=None, leaf_mode="drain",
                       width=FRONTIER_WIDTH):
    """nodes: (Nw, 8, 128) coefficient tiles; tris: (n_leaves,
    block*9) exact rows or (n_leaves, 10, >=4*block) coefficient rows
    when ``mxu`` (a Precision) is set; rays: (G, 1, 12, PACKET).
    Returns (G, 1, 4, PACKET)."""
    n_rows = nodes.shape[0]
    if mxu:
        n_leaves, _, cw = tris.shape
        block = cw // 4
        if cw % _LANE:
            tris = jnp.pad(tris, ((0, 0), (0, 0),
                                  (0, _LANE - cw % _LANE)))
        row_w = tris.shape[2]
        leaf_row_bytes = 10 * row_w * 4
    else:
        n_leaves, row_w = tris.shape
        block = row_w // 9
        leaf_row_bytes = 512
    g, _, _, packet = rays.shape

    if hbm_leaves:
        if not mxu and row_w % _LANE:
            tris = jnp.pad(tris, ((0, 0), (0, _LANE - row_w % _LANE)))
            row_w = tris.shape[1]
        tri_spec = pl.BlockSpec(memory_space=pl.ANY)
    elif mxu:
        tri_spec = pl.BlockSpec((n_leaves, 10, row_w),
                                lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        tri_spec = pl.BlockSpec((n_leaves, row_w), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
    w = width
    lw = nodes.shape[2]
    scratch_shapes = [
        pltpu.SMEM((_fstack(w),), jnp.int32),      # shared node stack
        pltpu.SMEM((w,), jnp.int32),            # leaf queue rows
        pltpu.SMEM((1,), jnp.int32),            # leaf queue count
        pltpu.VMEM((w, _LANE), jnp.float32),    # per-child mins
    ]
    if hbm_leaves:
        slot_shape = (w, 10, row_w) if mxu else (w, row_w)
        scratch_shapes += [
            pltpu.VMEM(slot_shape, jnp.float32),
            pltpu.SemaphoreType.DMA((w,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((n_rows, 8, lw), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            tri_spec,
            pl.BlockSpec((1, 1, 12, packet), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 4, packet),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
    )
    kernel = _make_frontier_kernel(
        n_rows, block, packet, TMIN, hbm_leaves=hbm_leaves,
        mxu_precision=mxu, node_precision=node_precision,
        leaf_mode=leaf_mode, width=w)
    leaf_resident = 0 if hbm_leaves else n_leaves * leaf_row_bytes
    # Per-visit temps: the (128, packet) slab matmul result + the
    # (w, packet) entry/tn/tf slices (~2.5 MB at pk2048) + the MXU
    # leaf tier's own temps.
    margin = (16 if mxu else 8) * 1024 * 1024
    need = n_rows * 8 * lw * 4 + leaf_resident + margin
    vmem_limit = vmem_clamp(need)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, 1, 4, packet), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(nodes, tris, rays)


def _make_frontier_anyhit_kernel(n_rows: int, block: int, packet: int,
                                 tmin: float, hbm_leaves: bool = False,
                                 mxu_precision=None,
                                 node_precision=None,
                                 leaf_mode: str = "drain",
                                 width: int = FRONTIER_WIDTH):
    """ANY-HIT frontier kernel: resolved lanes stop driving descent
    (their far plane drops to -1 before the node matmul), any
    accepting triangle resolves a lane, traversal ends when the
    shared stack drains.  Same node-matmul / SMEM-drain structure as
    the closest-hit kernel; same options."""
    from vulkan_pathtracer_tpu.ops import mxu_mt

    sub = packet // _LANE
    w = width
    sortnet = _batcher_oem(w)
    mxu = mxu_precision is not None
    if node_precision is None:
        node_precision = jax.lax.Precision.HIGHEST

    def kernel(nodes_ref, tris_ref, rays_ref, out_ref, stack_ref,
               q_ref, qn_ref, mins_ref, *rest):
        leaf_scratch = leaf_sems = None
        if hbm_leaves:
            leaf_scratch, leaf_sems = rest
        comps = [rays_ref[0, 0, i, :].reshape(sub, _LANE)
                 for i in range(12)]
        eps = jnp.float32(1e-20)

        def sinv(d):
            return 1.0 / jnp.where(jnp.abs(d) < eps,
                                   jnp.where(d >= 0, eps, -eps), d)

        ox, oy, oz = comps[0], comps[1], comps[2]
        dx, dy, dz = comps[3], comps[4], comps[5]
        tl = comps[6]
        ix, iy, iz = sinv(dx), sinv(dy), sinv(dz)
        tnear = jnp.maximum(comps[11], jnp.float32(tmin))
        big = jnp.float32(PAIR_BIG)
        hit0 = jnp.where(tl < 0.0, jnp.float32(1.0), jnp.float32(0.0))

        flat = mxu_mt.flatten_rows
        feats = jnp.concatenate(
            [flat(ix), flat(iy), flat(iz),
             flat(-(ox * ix)), flat(-(oy * iy)), flat(-(oz * iz)),
             jnp.zeros((2, sub * _LANE), jnp.float32)],
            axis=0)
        tnear_f = flat(tnear)
        if mxu:
            mfeats = mxu_mt.packet_features(ox, oy, oz, dx, dy, dz)
            tl_f = flat(tl)

        def leaf_visit(row, slot, hitf):
            if hbm_leaves:
                pltpu.make_async_copy(
                    tris_ref.at[row],
                    leaf_scratch.at[slot],
                    leaf_sems.at[slot],
                ).wait()
            if mxu:
                coef = (leaf_scratch[slot] if hbm_leaves
                        else tris_ref[row])
                accf = mxu_mt.mt_coef_visit_anyhit(
                    coef, mfeats, tnear_f, tl_f, block,
                    jnp.float32(tmin), mxu_precision)
                return jnp.maximum(hitf,
                                   mxu_mt.unflatten_rows(accf, sub))
            if hbm_leaves:
                tread = lambda base: leaf_scratch[slot, base]
            else:
                tread = lambda base: tris_ref[row, base]
            for k in range(block):
                base = k * 9
                v0x = tread(base + 0)
                v0y = tread(base + 1)
                v0z = tread(base + 2)
                e1x = tread(base + 3)
                e1y = tread(base + 4)
                e1z = tread(base + 5)
                e2x = tread(base + 6)
                e2y = tread(base + 7)
                e2z = tread(base + 8)
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                front = det > 0.0
                inv_det = 1.0 / jnp.where(front, det, 1.0)
                tx = ox - v0x
                ty = oy - v0y
                tz = oz - v0z
                u = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (dx * qx + dy * qy + dz * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                acc = (front & (u >= 0.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (t > tmin) & (t >= tnear)
                       & (t < tl))
                hitf = jnp.maximum(hitf, acc.astype(jnp.float32))
            return hitf

        def cond(state):
            return state[0] >= 0

        def body(state):
            cur, sp, hitf = state
            tile = nodes_ref[cur]
            # Resolved lanes leave the union: far plane -> -1.
            tlim_f = flat(jnp.where(hitf > 0.5, jnp.float32(-1.0), tl))
            res = jax.lax.dot_general(
                tile, feats, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=node_precision)
            tx0 = res[0 * w:1 * w]
            ty0 = res[1 * w:2 * w]
            tz0 = res[2 * w:3 * w]
            tx1 = res[3 * w:4 * w]
            ty1 = res[4 * w:5 * w]
            tz1 = res[5 * w:6 * w]
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1),
                            jnp.minimum(ty0, ty1)),
                jnp.maximum(jnp.minimum(tz0, tz1), tnear_f))
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1),
                            jnp.maximum(ty0, ty1)),
                jnp.minimum(jnp.maximum(tz0, tz1), tlim_f))
            entry = jnp.where(tn <= tf, tn, big)
            m = jnp.min(entry, axis=1, keepdims=True)
            mins_ref[...] = jnp.broadcast_to(m, (w, _LANE))
            ms = [mins_ref[s, 0] for s in range(w)]
            encs = [nodes_ref[cur, 6, s] for s in range(w)]
            hits = [ms[s] < big for s in range(w)]
            leafs = [e < 0.0 for e in encs]

            if leaf_mode == "cond":
                if hbm_leaves:
                    for s in range(w):
                        @pl.when(jnp.logical_and(hits[s], leafs[s]))
                        def _(s=s):
                            row = (-encs[s]).astype(jnp.int32) - 1
                            pltpu.make_async_copy(
                                tris_ref.at[row],
                                leaf_scratch.at[s],
                                leaf_sems.at[s],
                            ).start()
                for s in range(w):
                    hitf = jax.lax.cond(
                        jnp.logical_and(hits[s], leafs[s]),
                        functools.partial(
                            lambda e, h, s=s: leaf_visit(
                                (-e).astype(jnp.int32) - 1, s, h),
                            encs[s]),
                        lambda h: h,
                        hitf,
                    )
            else:
                qn_ref[0] = 0
                for s in range(w):
                    @pl.when(jnp.logical_and(hits[s], leafs[s]))
                    def _(s=s):
                        qi = qn_ref[0]
                        row = (-encs[s]).astype(jnp.int32) - 1
                        q_ref[qi] = row
                        if hbm_leaves:
                            pltpu.make_async_copy(
                                tris_ref.at[row],
                                leaf_scratch.at[qi],
                                leaf_sems.at[qi],
                            ).start()
                        qn_ref[0] = qi + 1
                qn_total = qn_ref[0]

                def dcond(st):
                    return st[0] < qn_total

                def dbody(st):
                    return (st[0] + 1,
                            leaf_visit(q_ref[st[0]], st[0], st[1]))

                _, hitf = jax.lax.while_loop(
                    dcond, dbody, (jnp.int32(0), hitf))

            keys = [jnp.where(
                jnp.logical_and(hits[s], jnp.logical_not(leafs[s])),
                ms[s], big) for s in range(w)]
            ks = list(keys)
            cs = [e.astype(jnp.int32) for e in encs]

            def cswap(a, b):
                lt = ks[a] <= ks[b]
                ka = jnp.where(lt, ks[a], ks[b])
                kb = jnp.where(lt, ks[b], ks[a])
                ca = jnp.where(lt, cs[a], cs[b])
                cb = jnp.where(lt, cs[b], cs[a])
                ks[a], ks[b], cs[a], cs[b] = ka, kb, ca, cb

            for a, b in sortnet:
                cswap(a, b)

            live = [k < big for k in ks]
            pos = [None] * w
            p = sp
            for s in range(w - 1, 0, -1):
                pos[s] = p
                p = p + live[s].astype(jnp.int32)
            sp_pushed = p

            for s in range(w - 1, 0, -1):
                @pl.when(live[s])
                def _(s=s):
                    stack_ref[pos[s]] = cs[s]

            desc = live[0]
            popped = stack_ref[jnp.maximum(sp_pushed - 1, 0)]
            can_pop = sp_pushed > 0
            cur_new = jnp.where(
                desc, cs[0],
                jnp.where(can_pop, popped, jnp.int32(-1)))
            sp_new = jnp.where(desc, sp_pushed,
                               jnp.maximum(sp_pushed - 1, 0))
            return (cur_new, sp_new, hitf)

        init = (jnp.int32(0), jnp.int32(0), hit0)
        _, _, hitf = jax.lax.while_loop(cond, body, init)
        flat_h = hitf.reshape(-1)
        out_ref[0, 0, 0, :] = flat_h
        out_ref[0, 0, 1, :] = flat_h
        out_ref[0, 0, 2, :] = flat_h
        out_ref[0, 0, 3, :] = flat_h

    return kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "hbm_leaves", "mxu",
                              "node_precision", "leaf_mode", "width"))
def _frontier_anyhit(nodes, tris, rays, *, interpret=False,
                     hbm_leaves=False, mxu=None,
                     node_precision=None, leaf_mode="drain",
                     width=FRONTIER_WIDTH):
    """Any-hit launch: same table/ray layout as _frontier_traverse,
    output one resolved-flag row per packet (written to all 4 out
    rows)."""
    n_rows = nodes.shape[0]
    if mxu:
        n_leaves, _, cw = tris.shape
        block = cw // 4
        if cw % _LANE:
            tris = jnp.pad(tris, ((0, 0), (0, 0),
                                  (0, _LANE - cw % _LANE)))
        row_w = tris.shape[2]
        leaf_row_bytes = 10 * row_w * 4
    else:
        n_leaves, row_w = tris.shape
        block = row_w // 9
        leaf_row_bytes = 512
    g, _, _, packet = rays.shape

    if hbm_leaves:
        if not mxu and row_w % _LANE:
            tris = jnp.pad(tris, ((0, 0), (0, _LANE - row_w % _LANE)))
            row_w = tris.shape[1]
        tri_spec = pl.BlockSpec(memory_space=pl.ANY)
    elif mxu:
        tri_spec = pl.BlockSpec((n_leaves, 10, row_w),
                                lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        tri_spec = pl.BlockSpec((n_leaves, row_w), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
    w = width
    lw = nodes.shape[2]
    scratch_shapes = [
        pltpu.SMEM((_fstack(w),), jnp.int32),
        pltpu.SMEM((w,), jnp.int32),
        pltpu.SMEM((1,), jnp.int32),
        pltpu.VMEM((w, _LANE), jnp.float32),
    ]
    if hbm_leaves:
        slot_shape = (w, 10, row_w) if mxu else (w, row_w)
        scratch_shapes += [
            pltpu.VMEM(slot_shape, jnp.float32),
            pltpu.SemaphoreType.DMA((w,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((n_rows, 8, lw), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            tri_spec,
            pl.BlockSpec((1, 1, 12, packet), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 4, packet),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
    )
    kernel = _make_frontier_anyhit_kernel(
        n_rows, block, packet, TMIN, hbm_leaves=hbm_leaves,
        mxu_precision=mxu, node_precision=node_precision,
        leaf_mode=leaf_mode, width=w)
    leaf_resident = 0 if hbm_leaves else n_leaves * leaf_row_bytes
    margin = (16 if mxu else 8) * 1024 * 1024
    need = n_rows * 8 * lw * 4 + leaf_resident + margin
    vmem_limit = vmem_clamp(need)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, 1, 4, packet), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(nodes, tris, rays)


def pallas_frontier_any_hit(scene, origin, direction, active=None,
                            interpret=False, packet: int = None,
                            hbm_leaves: bool = False) -> jnp.ndarray:
    """Any-hit query via the frontier kernel (opt-in,
    VKPT_ANYHIT_KERNEL=frontier): (N,) bool, True exactly where a
    closest-hit would report a hit.  Guard-banded nodes only widen
    the visit set; the leaf accept is the exact MT (or the det-scaled
    MXU tier under VKPT_MT=mxu)."""
    n = origin.shape[0]
    if packet is None:
        packet = int(os.environ.get("VKPT_FRONTIER_PACKET", "2048"))
    mxu, hbm_leaves = _frontier_mxu_dispatch(scene, hbm_leaves)
    t_lane = jnp.full((n,), jnp.float32(TMAX))
    if active is not None:
        t_lane = jnp.where(active, t_lane, jnp.float32(-1.0))
    pad = (-n) % packet
    total = n + pad
    g = total // packet

    def pad1(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill)

    zeros = jnp.zeros((n,), jnp.float32)
    rays = jnp.stack(
        [
            pad1(origin[:, 0]), pad1(origin[:, 1]), pad1(origin[:, 2]),
            pad1(direction[:, 0]), pad1(direction[:, 1]),
            pad1(direction[:, 2]),
            pad1(t_lane, -1.0),
            pad1(zeros), pad1(zeros), pad1(zeros), pad1(zeros),
            pad1(zeros),
        ],
        axis=0,
    ).reshape(12, g, 1, packet).transpose(1, 2, 0, 3)

    tri_table = scene.tri_coefs if mxu else scene.tri_blocks
    out = _frontier_anyhit(
        scene.bvh_frontier, tri_table, rays, interpret=interpret,
        hbm_leaves=hbm_leaves, mxu=mxu,
        node_precision=frontier_precision(),
        leaf_mode=os.environ.get("VKPT_FRONTIER_LEAF", "drain"),
        width=int(scene.bvh_frontier_src.shape[1]))
    hit = out[:, 0, 0, :].reshape(g * packet)[:n] > 0.5
    if active is not None:
        hit = hit & active
    return hit


def _frontier_mxu_dispatch(scene, hbm_leaves):
    """VKPT_MT=mxu gate for the frontier launcher (same contract as
    pallas_pair._mxu_dispatch, with the frontier node-table bytes)."""
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        _coef_row_bytes,
        _mxu_active,
    )

    if not _mxu_active(scene):
        if scene.tri_blocks.shape[1] > _LANE:
            # Exact leaves need static lane indices < 128 per scalar
            # load; block*9 > 128 dies inside Mosaic (measured round-4
            # first contact: remote-compile HTTP 500 on leaf=28 for
            # every exact leaf mode).  Raise before dispatch instead.
            raise ValueError(
                "frontier kernel with exact leaves requires leaf "
                "block*9 <= 128 lanes (leaf <= 14); rebuild with a "
                "smaller leaf or enable the MXU leaf tier "
                f"(VKPT_MT=mxu) — got {scene.tri_blocks.shape[1]} "
                "lanes")
        return None, hbm_leaves
    from vulkan_pathtracer_tpu.ops.mxu_mt import mxu_precision

    if not hbm_leaves:
        budget = int(os.environ.get("VKPT_VMEM_BUDGET",
                                    100 * 1024 * 1024))
        coef_bytes = scene.tri_coefs.shape[0] * _coef_row_bytes(scene)
        node_bytes = int(np.prod(scene.bvh_frontier.shape)) * 4
        hbm_leaves = (coef_bytes + node_bytes
                      + 8 * 1024 * 1024 > budget)
    return mxu_precision(), hbm_leaves


def frontier_fits_vmem(scene, budget_bytes: int = None,
                       packet: int = None) -> bool:
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        _coef_row_bytes,
        _mxu_active,
        _stack_depth_ok,
    )

    if budget_bytes is None:
        budget_bytes = int(os.environ.get(
            "VKPT_VMEM_BUDGET", 100 * 1024 * 1024))
    if getattr(scene, "bvh_frontier", None) is None or \
            scene.tri_blocks is None or not _stack_depth_ok(scene):
        return False
    mxu = _mxu_active(scene)
    if scene.tri_blocks.shape[1] > _LANE and not mxu:
        return False
    if packet is None:
        packet = 2048
    state = 8 * packet * 4 * 4 * 2
    leaf_bytes = (scene.tri_coefs.shape[0] * _coef_row_bytes(scene)
                  if mxu else scene.tri_blocks.shape[0] * 512)
    need = (int(np.prod(scene.bvh_frontier.shape)) * 4 + leaf_bytes
            + state)
    return need < budget_bytes


def frontier_hbm_fits(scene, budget_bytes=None,
                      packet: int = None) -> bool:
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        _coef_row_bytes,
        _mxu_active,
        _stack_depth_ok,
    )

    if budget_bytes is None:
        budget_bytes = int(os.environ.get(
            "VKPT_VMEM_BUDGET", 100 * 1024 * 1024))
    if getattr(scene, "bvh_frontier", None) is None or \
            scene.tri_blocks is None or not _stack_depth_ok(scene):
        return False
    mxu = _mxu_active(scene)
    if scene.tri_blocks.shape[1] > _LANE and not mxu:
        return False
    if packet is None:
        packet = 2048
    state = 8 * packet * 4 * 4 * 2
    slot_bytes = int(scene.bvh_frontier_src.shape[1]) * (
        _coef_row_bytes(scene) if mxu else 512)
    need = (int(np.prod(scene.bvh_frontier.shape)) * 4 + slot_bytes
            + state)
    return need < budget_bytes


def pallas_frontier_closest_hit(scene, origin, direction, active=None,
                                interpret=False, seed=None,
                                packet: int = None, t_far=None,
                                t_near=None,
                                hbm_leaves: bool = False) -> Hit:
    """Closest hit via the 16-wide MXU frontier kernel (bvh_frontier).

    Exact leaf MT by default (results match the quad/pair kernels —
    the guard-banded node phase only widens the visit set);
    VKPT_MT=mxu composes the RELAXED-parity MXU leaf tier.  Opt-in
    via VKPT_KERNEL_{PRIMARY,SECONDARY}=frontier until measured."""
    from vulkan_pathtracer_tpu.ops.pallas_traverse import _seed_channels

    n = origin.shape[0]
    if packet is None:
        packet = int(os.environ.get("VKPT_FRONTIER_PACKET", "2048"))
    mxu, hbm_leaves = _frontier_mxu_dispatch(scene, hbm_leaves)
    t_lane = jnp.full((n,), jnp.float32(TMAX))
    if t_far is not None:
        t_lane = jnp.minimum(t_lane, jnp.broadcast_to(
            jnp.asarray(t_far, jnp.float32), (n,)))
    if active is not None:
        t_lane = jnp.where(active, t_lane, jnp.float32(-1.0))
    tn_lane = jnp.zeros((n,), jnp.float32)
    if t_near is not None:
        tn_lane = jnp.broadcast_to(
            jnp.asarray(t_near, jnp.float32), (n,))
    pad = (-n) % packet
    total = n + pad
    g = total // packet

    def pad1(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill)

    st, strif, su, sv = _seed_channels(n, seed)
    miss_bits = float(
        np.frombuffer(np.int32(-1).tobytes(), dtype=np.float32)[0])
    rays = jnp.stack(
        [
            pad1(origin[:, 0]), pad1(origin[:, 1]), pad1(origin[:, 2]),
            pad1(direction[:, 0]), pad1(direction[:, 1]),
            pad1(direction[:, 2]),
            pad1(t_lane, -1.0),
            pad1(st, float(MISS_T)),
            pad1(strif, miss_bits),
            pad1(su), pad1(sv),
            pad1(tn_lane),
        ],
        axis=0,
    ).reshape(12, g, 1, packet).transpose(1, 2, 0, 3)

    tri_table = scene.tri_coefs if mxu else scene.tri_blocks
    out = _frontier_traverse(
        scene.bvh_frontier, tri_table, rays, interpret=interpret,
        hbm_leaves=hbm_leaves, mxu=mxu,
        node_precision=frontier_precision(),
        leaf_mode=os.environ.get("VKPT_FRONTIER_LEAF", "drain"),
        width=int(scene.bvh_frontier_src.shape[1]))
    out = out.transpose(2, 0, 1, 3).reshape(4, total)[:, :n]
    t = out[0]
    tri = jax.lax.bitcast_convert_type(out[1], jnp.int32)
    return Hit(t=t, tri=tri, u=out[2], v=out[3])
