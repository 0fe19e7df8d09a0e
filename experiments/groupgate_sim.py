"""Host sim: VREG-GRANULAR GATED LEAF MT ("group gating"), round 5.

The quad kernel's leaf phase runs Moller-Trumbore on the FULL packet
slab for every visited leaf, but only ~tens of (sorted, contiguous-ish)
lanes pass the leaf's box test (round-4 span stats: med 433/2048 at 24
interested).  The VPU's native shape is an (8,128) vreg: a packet of
P lanes is P/1024 vregs, and the MT's vector work can be EXACTLY
skipped per vreg whose 1024 lanes ALL failed the leaf box test (a
triangle inside the leaf AABB cannot be hit at a t the slab interval
excluded).  This differs from every dead-end on the ledger:

  - NOT per-ray extraction (round-4 transposed block-MT kill: span
    scatter makes per-ray extraction cost equal the MT saved) — lanes
    stay in place, whole vregs are skipped;
  - NOT latency hiding (three measured ILP failures) — vector work is
    REMOVED, not overlapped;
  - NOT a leaf-size change — the scalar tri-load chain per group is
    the known tax, and this sim prices it per variant.

Two kernel structures are priced:
  group-outer: fori over a compacted occupied-vreg list; the 252
    scalar tri loads re-execute per occupied vreg (chain x n_occ).
  tri-outer:  tri loop outside, dynamic group loop inside; scalar
    loads shared but per-(tri,group) loop overhead.

The win grows with packet size (more vregs to skip; unions shared
across more rays), so the sim sweeps pk = 2048..16384 and reports
modeled secondary-bounce ms scaled to the MEASURED 505 ms leaf-28
quad pk2048 anchor (plan7) plus occupied-vreg histograms.

    SIM_PACKETS=8 SIM_PKS=2048,4096,8192,16384 \
        python experiments/groupgate_sim.py [detail] [W H]

Reference anchor: the per-visit intersection work the RT hardware
schedules per-ray behind traceRayEXT (ray_gen.rgen:50-63); here the
packet union does it per-lane and gating trims the dead lanes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from blockmt_sim import mt_hits
from union_stats import bounce_rays

TMIN = 0.001
F_HZ = 940e6
VEC = 0.8          # cyc per (8,128) vreg op
LANES_PER_VREG = 1024

# ---- cycle model (anchored like blockmt_sim/leaf_size_sim) ----------
# quad node visit at pk2048 = 370 cyc (validated family) split as
# serial 280 (cross-lane mins, stack, branch) + 45/vreg vector.
NODE_SERIAL = 280.0
NODE_VEC_PER_VREG = 45.0
SCALAR_LOAD = 4.0  # cyc per scalar VMEM load+broadcast
MT_OPS_PER_TRI = 55.0


def node_cyc(nvregs):
    # +10/vreg: gated kernels keep best-hit state in VMEM scratch and
    # re-read it per node visit for the prune bound.
    return NODE_SERIAL + (NODE_VEC_PER_VREG + 10.0) * nvregs


def leaf_exact_cyc(L, rpl, nvregs):
    return 126 * SCALAR_LOAD * rpl + MT_OPS_PER_TRI * L * nvregs * VEC


def leaf_gated_outer_cyc(L, rpl, nvregs, n_occ):
    """fori over compacted occupied vregs; scalar chain per vreg."""
    gate = 40.0 + 35.0 * nvregs  # per-vreg any-reduce + list build
    per_occ = 126 * SCALAR_LOAD * rpl + MT_OPS_PER_TRI * L * VEC + 30.0
    return gate + n_occ * per_occ


def leaf_gated_triouter_cyc(L, rpl, nvregs, n_occ):
    """tri loop outer (scalar loads shared), dynamic vreg loop inner."""
    gate = 40.0 + 35.0 * nvregs
    per_tri = 9 * SCALAR_LOAD + n_occ * (MT_OPS_PER_TRI * VEC + 25.0)
    return gate + L * per_tri


def traverse_groupstats(f, tris, block, o, d, a, packet):
    """Binary union traversal (exact prune, REAL MT as in
    blockmt_sim) collecting, per leaf visit, the OCCUPIED-VREG count
    of the box-pass mask."""
    inv = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)
    t_best = np.full(packet, 1e4)
    t_hi = np.where(a, 1e4, -1.0)
    nn = f.shape[0]
    node = 0
    nodes = leaves = 0
    occs = []
    nvregs = packet // LANES_PER_VREG
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
            np.maximum(tz0, tz1), np.minimum(t_best, t_hi),
        ])
        hit = tn <= tf
        nodes += 1
        if row[7] >= 0:  # leaf
            if hit.any():
                leaves += 1
                occ = int(hit.reshape(nvregs, LANES_PER_VREG)
                          .any(axis=1).sum())
                occs.append(occ)
                idx = np.nonzero(hit)[0]
                leaf_id = int(row[7]) // block
                tl = np.minimum(t_best[idx], t_hi[idx])
                tmin_ = mt_hits(o[idx], d[idx], tris[leaf_id], tl)
                t_best[idx] = np.minimum(t_best[idx], tmin_)
            node = int(row[6])
        else:
            node = node + 1 if hit.any() else int(row[6])
    return nodes, leaves, occs


def main():
    detail = float(sys.argv[1]) if len(sys.argv) > 1 else 4.1
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    glb = f"/tmp/bench_atrium_{detail}.glb"
    if not os.path.exists(glb):
        from assets.procedural import make_atrium

        make_atrium(glb, detail=detail)

    L = int(os.environ.get("SIM_LEAF", "28"))
    rpl = max(1, -(-L // 14))
    dev14, (oo, dd, al) = bounce_rays(glb, W, H)
    print(f"tris={dev14.num_triangles} live={al.sum()}/{al.size} "
          f"leaf={L}", flush=True)

    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.device_scene import (
        build_device_scene,
    )

    scene = gltf.load(glb)
    dev = build_device_scene(scene, build_bvh=True, max_leaf_size=L)
    rows = np.asarray(dev.bvh_rows).reshape(dev.bvh_orders, -1, 128)
    ftab = [rows[o].reshape(-1, 8).astype(np.float64)
            for o in range(dev.bvh_orders)]
    tris = np.asarray(dev.tri_blocks, np.float64).reshape(-1, L, 9)

    pks = tuple(int(x) for x in os.environ.get(
        "SIM_PKS", "2048,4096,8192,16384").split(","))
    n_pkts = int(os.environ.get("SIM_PACKETS", "8"))
    rng = np.random.default_rng(0)
    n = oo.shape[0]

    MEASURED_LEAF28_PK2048_MS = 505.0
    anchor_ms = None
    results = []
    for pk in pks:
        nvregs = pk // LANES_PER_VREG
        starts = rng.choice(n // pk - 1, size=n_pkts, replace=False) * pk
        tn_ = tl_ = 0
        occs = []
        for s in starts:
            o = oo[s:s + pk]
            d = dd[s:s + pk]
            a = al[s:s + pk]
            oct_counts = np.bincount(
                (d[:, 0] < 0) + 2 * (d[:, 1] < 0) + 4 * (d[:, 2] < 0),
                weights=a.astype(np.float64), minlength=8)
            f = ftab[int(np.argmax(oct_counts))]
            nodes, leaves, oc = traverse_groupstats(
                f, tris, L, o, d, a, pk)
            tn_ += nodes
            tl_ += leaves
            occs += oc
        m = len(starts)
        nodes_pkt, leaf_pkt = tn_ / m / 2, tl_ / m  # /2: quad collapse
        occs = np.asarray(occs, np.float64)
        occ_mean = occs.mean() if occs.size else 0.0
        hist = np.bincount(occs.astype(int), minlength=nvregs + 1)
        hist = hist / max(hist.sum(), 1)
        packets = al.sum() / pk

        exact = (nodes_pkt * node_cyc(nvregs)
                 + leaf_pkt * leaf_exact_cyc(L, rpl, nvregs))
        g_out = (nodes_pkt * node_cyc(nvregs)
                 + sum(leaf_gated_outer_cyc(L, rpl, nvregs, c)
                       for c in occs) / m)
        g_tri = (nodes_pkt * node_cyc(nvregs)
                 + sum(leaf_gated_triouter_cyc(L, rpl, nvregs, c)
                       for c in occs) / m)
        to_ms = packets / F_HZ * 1e3
        exact_ms, gout_ms, gtri_ms = (x * to_ms
                                      for x in (exact, g_out, g_tri))
        if pk == 2048 and anchor_ms is None:
            anchor_ms = exact_ms
        results.append((pk, nvregs, nodes_pkt, leaf_pkt, occ_mean,
                        hist, exact_ms, gout_ms, gtri_ms))

    scale = (MEASURED_LEAF28_PK2048_MS / anchor_ms) if anchor_ms else 1.0
    print(f"(model scaled x{scale:.2f} to the measured 505 ms "
          f"leaf-28 quad pk2048 secondary)")
    base = None
    for (pk, nv, npk, lpk, occm, hist, ex, go, gt) in results:
        ex, go, gt = ex * scale, go * scale, gt * scale
        if base is None:
            base = ex
        htxt = " ".join(f"{int(round(100 * h)):d}" for h in hist[:9])
        print(f"pk={pk:<6} vregs={nv:<2} nodes/pkt={npk:<6.0f} "
              f"leaves/pkt={lpk:<5.0f} occ_mean={occm:<4.2f} "
              f"occ%[0..8]=[{htxt}]", flush=True)
        print(f"        exact~{ex:6.0f}ms ({base / ex:4.2f}x)  "
              f"gated-outer~{go:6.0f}ms ({base / go:4.2f}x)  "
              f"gated-tri~{gt:6.0f}ms ({base / gt:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
