"""Host sim for the TRANSPOSED BLOCK-MT leaf phase (round-4/5 sketch).

The structure under test (the "fused pallas structure" ROADMAP round-5
item 2 gates hardware work on):

  - node phase unchanged (quad shared-SMEM-stack, rays in lanes);
  - each leaf visit computes the interested-lane SPAN (2 cross-lane
    index reductions over the leaf's slab-hit mask), then runs MT in a
    TRANSPOSED layout: rays along SUBLANES (16-row blocks vector-loaded
    at dynamic sublane offsets from a transposed payload copy — legal
    Mosaic), triangles along LANES (a (9..16, 128) tile per leaf,
    vector-loaded / DMA'd — replacing the 126-scalar-load-per-sub-row
    serial chain entirely).  One MT MAC then covers 16 rays x 128 tris
    = 2048 (ray, tri) pairs per vreg-op, with 2D VPU utilization the
    lane-layout kernel cannot reach.  Arithmetic is per-pair identical
    to ops/pallas_pair.mt_block -> bit-exact (min-reductions are exact;
    tie-break = lowest tri index, matching first-wins serial order).
  - best-hit state (t, tri, u, v) lives in the transposed layout too;
    MT self-prunes EXACTLY per pair against it.  The node phase's
    per-lane prune bound, however, goes STALE: it is refreshed from the
    transposed t only every K leaf visits (a (2048,) sublane->lane
    transpose, cost unknown until microbenched).  Stale pruning is
    conservative => results stay exact; only visit counts inflate.
    This sim measures that inflation (K = 1 / 4 / 16 / never).

Because triangles sit on lanes, the natural leaf block is up to 128
tris — a regime the exact lane-layout kernels cannot reach (their
block*9-lane rows break static-lane-index scalar loads above 14) and
where node visits collapse (shallower tree).  The MXU tier reached
leaf 28+ too but paid a measured 3x per-visit matmul cost (ROADMAP
round-4 finding 3); this structure has no matmul, no relayouts inside
the MT, and no precision compromise.

Outputs per (leaf size L, refresh K): union node/leaf visits per
packet, interested-lane count/span/16-block histograms, and a cycle
model anchored to the MEASURED 505 ms leaf-28 quad secondary
(plan7, ROADMAP round-4 finding 7).

    SIM_LEAVES=28,56,126 python experiments/blockmt_sim.py [detail] [W H]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from union_stats import bounce_rays

TMIN = 0.001
F_HZ = 940e6


def mt_hits(o, d, tris, t_lim, tnear=TMIN):
    """Vectorized Moller-Trumbore: rays (R,3)x2 against tris (L,9)
    [v0|e1|e2].  Returns per-ray min-t over valid hits (inf if none).
    Same arithmetic as ops/pallas_pair.mt_block (world-space branch)."""
    v0 = tris[:, 0:3]
    e1 = tris[:, 3:6]
    e2 = tris[:, 6:9]
    # (R, L, 3) broadcasting
    px = np.cross(d[:, None, :], e2[None, :, :])
    det = np.einsum("lk,rlk->rl", e1, px)
    front = det > 0.0
    inv_det = 1.0 / np.where(front, det, 1.0)
    tv = o[:, None, :] - v0[None, :, :]
    u = np.einsum("rlk,rlk->rl", tv, px) * inv_det
    q = np.cross(tv, e1[None, :, :])
    v = np.einsum("rk,rlk->rl", d, q)[...] * inv_det
    t = np.einsum("lk,rlk->rl", e2, q) * inv_det
    hit = (front & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t > TMIN) & (t >= tnear) & (t < t_lim[:, None]))
    t = np.where(hit, t, np.inf)
    return t.min(axis=1)


def union_blockmt_sim(f, tris, block, oo, dd, al, start, packet,
                      refresh_k):
    """Union-packet traversal with real MT and stale node pruning.

    refresh_k: node-phase prune bound refreshed from the true best
    every refresh_k leaf visits (1 = exact/current; 0 = never).
    Returns (node_visits, leaf_visits, refreshes, per-visit stats).
    """
    o = oo[start:start + packet]
    d = dd[start:start + packet]
    a = al[start:start + packet]
    inv = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)
    t_true = np.full(packet, 1e4)
    t_node = t_true.copy()
    t_hi = np.where(a, 1e4, -1.0)
    nn = f.shape[0]
    node = 0
    nodes = leaves = refreshes = since = 0
    counts, spans, blocks16 = [], [], []
    while node < nn:
        row = f[node]
        tx0 = (row[0] - o[:, 0]) * inv[:, 0]
        tx1 = (row[3] - o[:, 0]) * inv[:, 0]
        ty0 = (row[1] - o[:, 1]) * inv[:, 1]
        ty1 = (row[4] - o[:, 1]) * inv[:, 1]
        tz0 = (row[2] - o[:, 2]) * inv[:, 2]
        tz1 = (row[5] - o[:, 2]) * inv[:, 2]
        tn = np.maximum.reduce([
            np.minimum(tx0, tx1), np.minimum(ty0, ty1),
            np.minimum(tz0, tz1), np.full(packet, TMIN),
        ])
        tf = np.minimum.reduce([
            np.maximum(tx0, tx1), np.maximum(ty0, ty1),
            np.maximum(tz0, tz1), np.minimum(t_node, t_hi),
        ])
        hit = tn <= tf
        nodes += 1
        if row[7] >= 0:
            idx = np.nonzero(hit)[0]
            if idx.size:
                leaves += 1
                lo, hi = int(idx[0]), int(idx[-1])
                counts.append(idx.size)
                spans.append(hi - lo + 1)
                blocks16.append((hi - lo) // 16 + 1)
                leaf_id = int(row[7]) // block
                # MT self-prune is EXACT (transposed best state).
                tl = np.minimum(t_true[idx], t_hi[idx])
                tmin = mt_hits(o[idx], d[idx], tris[leaf_id], tl)
                t_true[idx] = np.minimum(t_true[idx], tmin)
                since += 1
                if refresh_k and since >= refresh_k:
                    t_node = t_true.copy()
                    refreshes += 1
                    since = 0
            node = int(row[6])
        else:
            node = node + 1 if hit.any() else int(row[6])
    return nodes, leaves, refreshes, counts, spans, blocks16


# ---- cycle model ----------------------------------------------------
# Anchors: quad node visit ~370 cyc (leaf_size_sim, validated family);
# exact leaf-28 split-row visit = 126 scalar loads * 4 cyc * 2 sub-rows
# + 55 vec ops/tri * 28 * 2 vregs * 0.8.  The absolute scale is then
# pinned to the MEASURED 505 ms secondary (leaf 28, quad, pk2048).
PER_QUAD_NODE = 370.0
VEC = 0.8  # cyc per (8,128) vreg op


def exact_leaf_cyc(L):
    rpl = max(1, -(-L // 14))
    return 126 * 4 * rpl + 55 * L * 2 * VEC


def blockmt_leaf_cyc(nb16_mean, rows):
    """Span reductions ~150 + per 16-ray block: payload loads+lane
    broadcasts ~40, MT ~25 ops x 2 vregs, argmin/extract reduces ~200
    (4-5 pipelined cross-lane reduces), best-state rmw ~30; +30 DMA
    amortization per tri-tile row (rows = ceil(L/128))."""
    per_block = 40 + 25 * 2 * VEC + 200 + 30
    return 150 + nb16_mean * per_block * rows + 30 * rows


TRANSPOSE_CYC = 1500.0  # (2048,) sublane->lane relayout: GUESS, microbench


def main():
    detail = float(sys.argv[1]) if len(sys.argv) > 1 else 4.1
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    glb = f"/tmp/bench_atrium_{detail}.glb"
    if not os.path.exists(glb):
        from assets.procedural import make_atrium

        make_atrium(glb, detail=detail)

    dev14, (oo, dd, al) = bounce_rays(glb, W, H)
    print(f"tris={dev14.num_triangles} live={al.sum()}/{al.size}",
          flush=True)

    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.device_scene import (
        build_device_scene,
    )

    scene = gltf.load(glb)
    rng = np.random.default_rng(0)
    n = oo.shape[0]
    pk = 2048
    n_pkts = int(os.environ.get("SIM_PACKETS", "8"))
    starts = rng.choice(n // pk - 1, size=n_pkts, replace=False) * pk
    packets = al.sum() / pk

    sizes = tuple(int(x) for x in os.environ.get(
        "SIM_LEAVES", "28,56,126").split(","))
    ks = tuple(int(x) for x in os.environ.get(
        "SIM_KS", "1,4,16,0").split(","))

    anchor_ms = None  # modeled current leaf-28 exact -> scaled to 505
    MEASURED_LEAF28_MS = 505.0

    for L in sizes:
        dev = build_device_scene(scene, build_bvh=True, max_leaf_size=L)
        rows = np.asarray(dev.bvh_rows).reshape(dev.bvh_orders, -1, 128)
        ftab = [rows[o].reshape(-1, 8).astype(np.float64)
                for o in range(dev.bvh_orders)]
        tris = np.asarray(dev.tri_blocks, np.float64).reshape(-1, L, 9)
        tile_rows = -(-L // 128)

        for K in ks:
            tn = tl = tr = 0
            counts, spans, nb16 = [], [], []
            for s in starts:
                oct_counts = np.bincount(
                    (dd[s:s + pk, 0] < 0) + 2 * (dd[s:s + pk, 1] < 0)
                    + 4 * (dd[s:s + pk, 2] < 0),
                    weights=al[s:s + pk].astype(np.float64), minlength=8)
                f = ftab[int(np.argmax(oct_counts))]
                a, b, c, cc, ss_, bb = union_blockmt_sim(
                    f, tris, L, oo, dd, al, s, pk, K)
                tn += a
                tl += b
                tr += c
                counts += cc
                spans += ss_
                nb16 += bb
            m = len(starts)
            nodes_pkt, leaf_pkt, ref_pkt = tn / m, tl / m, tr / m
            cmean = np.mean(counts) if counts else 0
            smed = np.median(spans) if spans else 0
            s90 = np.percentile(spans, 90) if spans else 0
            nbm = np.mean(nb16) if nb16 else 0

            q_nodes = nodes_pkt / 2  # quad collapse ~ binary/2
            exact_cyc = (q_nodes * PER_QUAD_NODE
                         + leaf_pkt * exact_leaf_cyc(L))
            bmt_cyc = (q_nodes * PER_QUAD_NODE
                       + leaf_pkt * blockmt_leaf_cyc(nbm, tile_rows)
                       + ref_pkt * TRANSPOSE_CYC)
            exact_ms = exact_cyc * packets / F_HZ * 1e3
            bmt_ms = bmt_cyc * packets / F_HZ * 1e3
            if anchor_ms is None and L == 28 and K == 1:
                anchor_ms = exact_ms
            scale = (MEASURED_LEAF28_MS / anchor_ms) if anchor_ms else 1.0
            tag = "exact" if K == 1 else (f"K={K}" if K else "never")
            print(
                f"L={L:<4} refresh={tag:<6} nodes/pkt={nodes_pkt:<6.0f} "
                f"leaves/pkt={leaf_pkt:<5.0f} int={cmean:<5.1f} "
                f"span_med={smed:<5.0f} span_p90={s90:<6.0f} "
                f"blk16={nbm:<5.2f} exact~{exact_ms * scale:<6.0f}ms "
                f"blockMT~{bmt_ms * scale:<6.0f}ms", flush=True)
        # exact tier only exists at 14-multiples <= 28; print model
        # note once per L
    if anchor_ms is not None:
        print(f"(model scaled x{MEASURED_LEAF28_MS / anchor_ms:.2f} to "
              f"the measured 505 ms leaf-28 quad secondary)", flush=True)


if __name__ == "__main__":
    main()
