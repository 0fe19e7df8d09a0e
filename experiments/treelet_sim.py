"""Host sim: would two-phase treelet scheduling beat union packets?

Current secondary-bounce wall: a 3-4k-ray packet union-visits ~38x the
per-ray-necessary nodes (union breadth = the packet's visibility
region).  Treelet scheduling restructures the work: phase 1 traverses
only the TOP of the tree (subtrees > S collapsed to portal leaves)
recording (ray, treelet) pairs; phase 2 groups pairs BY TREELET and
union-traverses each treelet's subtree with only the rays that
actually want it.  The redundancy question moves from "how wide is a
packet's global visibility" to "how tight are within-treelet unions
when every lane wants the treelet" — this sim answers it with visit
counts + the same cycle model union_stats uses, before any kernel is
built.

Caveats modeled: phase 2 loses cross-treelet t-pruning (a ray's
treelets are processed in arbitrary order), so per-ray t_best carries
only box-entry bounds from phase 1; pair-expansion cost (the device
pair sort) is charged from the measured sort_ab rates.

    python experiments/treelet_sim.py [detail] [W H]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from union_stats import bounce_rays, union_sim  # noqa: E402


def treelet_partition(f, S):
    """Preorder nodes (n, 8) -> (treelet_id per node, treelet roots,
    top mask).  Treelet root: subtree size <= S but parent's > S."""
    n = f.shape[0]
    skip = f[:, 6].astype(np.int64)
    size = skip - np.arange(n)
    top = size > S
    tl_id = np.full(n, -1, np.int64)
    roots = []
    i = 0
    while i < n:
        if top[i]:
            i += 1
            continue
        r = len(roots)
        roots.append(i)
        end = skip[i]
        tl_id[i:end] = r
        i = int(end)
    return tl_id, np.asarray(roots, np.int64), top


def phase1_sim(f, top, o, d, a, t_hi, pk):
    """Union-packet traversal of the TOP tree only: treelet-root
    entries become recorded pairs.  Returns (node_visit_count,
    pairs per lane list, per-lane entry t for pruning)."""
    n = f.shape[0]
    skip = f[:, 6].astype(np.int64)
    inv = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)
    visits = 0
    pair_lists = [[] for _ in range(o.shape[0])]
    node = 0
    t_best = np.full(o.shape[0], 1e32)
    while node < n:
        row = f[node]
        tx0 = (row[0] - o[:, 0]) * inv[:, 0]
        tx1 = (row[3] - o[:, 0]) * inv[:, 0]
        ty0 = (row[1] - o[:, 1]) * inv[:, 1]
        ty1 = (row[4] - o[:, 1]) * inv[:, 1]
        tz0 = (row[2] - o[:, 2]) * inv[:, 2]
        tz1 = (row[5] - o[:, 2]) * inv[:, 2]
        tn = np.maximum.reduce([np.minimum(tx0, tx1),
                                np.minimum(ty0, ty1),
                                np.minimum(tz0, tz1),
                                np.full(o.shape[0], 0.001)])
        tf = np.minimum.reduce([np.maximum(tx0, tx1),
                                np.maximum(ty0, ty1),
                                np.maximum(tz0, tz1),
                                np.minimum(t_best, t_hi)])
        hit = tn <= tf
        visits += 1
        if not top[node]:
            # Treelet root: record entries, jump its subtree.
            for li in np.nonzero(hit)[0]:
                pair_lists[li].append((node, tn[li]))
            node = int(skip[node])
        elif row[7] >= 0:
            # top leaf (shouldn't happen at sane S, but handle)
            node = int(skip[node])
        else:
            node = node + 1 if hit.any() else int(skip[node])
    return visits, pair_lists


def treelet_union_sim(f, root, o, d, a, t_hi, t_best):
    """Union traversal of ONE treelet subtree for the given rays.
    Returns (node_visits, leaf_visits, updated t_best)."""
    skip = f[:, 6].astype(np.int64)
    end = int(skip[root])
    inv = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)
    node = root
    visits = leaves = 0
    while node < end:
        row = f[node]
        tx0 = (row[0] - o[:, 0]) * inv[:, 0]
        tx1 = (row[3] - o[:, 0]) * inv[:, 0]
        ty0 = (row[1] - o[:, 1]) * inv[:, 1]
        ty1 = (row[4] - o[:, 1]) * inv[:, 1]
        tz0 = (row[2] - o[:, 2]) * inv[:, 2]
        tz1 = (row[5] - o[:, 2]) * inv[:, 2]
        tn = np.maximum.reduce([np.minimum(tx0, tx1),
                                np.minimum(ty0, ty1),
                                np.minimum(tz0, tz1),
                                np.full(o.shape[0], 0.001)])
        tf = np.minimum.reduce([np.maximum(tx0, tx1),
                                np.maximum(ty0, ty1),
                                np.maximum(tz0, tz1),
                                np.minimum(t_best, t_hi)])
        hit = tn <= tf
        visits += 1
        if row[7] >= 0:
            if hit.any():
                leaves += 1
                t_best = np.where(hit, np.minimum(t_best, tf), t_best)
            node = int(skip[node])
        else:
            node = node + 1 if hit.any() else int(skip[node])
    return visits, leaves, t_best


def cycles(nodes, leaves, sub):
    """union_stats' model: per visit ~ serial chain 350 + slab vec
    ~17 ops per 8 sublane rows; leaf adds block MT ~ 14 tris x ~40
    vec ops per 8 rows."""
    slab = 17 * sub / 8 * 8
    mt = 14 * 40 * sub / 8
    return nodes * (350 + slab) + leaves * mt


def main():
    detail = float(sys.argv[1]) if len(sys.argv) > 1 else 4.1
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 720
    glb = f"/tmp/bench_atrium_{detail}.glb"
    if not os.path.exists(glb):
        from assets.procedural import make_atrium

        make_atrium(glb, detail=detail)
    dev, (oo, dd, al) = bounce_rays(glb, W, H)
    n = oo.shape[0]
    print(f"tris={dev.num_triangles} rays={n} live={al.sum()}", flush=True)

    rows = np.asarray(dev.bvh_rows).reshape(dev.bvh_orders, -1, 128)
    ftab = [rows[o].reshape(-1, 8).astype(np.float64)
            for o in range(dev.bvh_orders)]

    rng = np.random.default_rng(0)
    PK = 3072
    n_samp = 8
    starts = rng.choice(n // PK - 1, size=n_samp, replace=False) * PK

    # Baseline: current union packets.
    bn = bl = 0
    for s in starts:
        a_, b_, _ = union_sim(ftab, oo, dd, al, s, PK)
        bn += a_
        bl += b_
    base_cyc = cycles(bn / n_samp, bl / n_samp, PK // 128)
    packets_total = n // PK
    print(f"baseline pk{PK}: nodes/packet={bn / n_samp:.0f} "
          f"leaves/packet={bl / n_samp:.0f} "
          f"frame={base_cyc * packets_total / 940e6 * 1000:.0f} ms-model",
          flush=True)

    for S in (512, 2048, 8192):
        # Use octant-0 table for everything (sim simplification).
        f = ftab[0]
        tl_id, roots, top = treelet_partition(f, S)
        print(f"S={S}: treelets={len(roots)} top_nodes={top.sum()}",
              flush=True)

        # Phase 1 on sampled packets.
        p1_visits = 0
        all_pairs = []  # (treelet_root, ray_local_index, t_entry)
        ray_base = 0
        t_hi_all = np.where(al, 1e4, -1.0)
        sampled_rays = []
        for s in starts:
            sl = slice(s, s + PK)
            v, plists = phase1_sim(f, top, oo[sl], dd[sl], al[sl],
                                   t_hi_all[sl], PK)
            p1_visits += v
            for li, lst in enumerate(plists):
                for (root, tent) in lst:
                    all_pairs.append((root, ray_base + li, tent))
            sampled_rays.append(sl)
            ray_base += PK
        o_cat = np.concatenate([oo[sl] for sl in sampled_rays])
        d_cat = np.concatenate([dd[sl] for sl in sampled_rays])
        t_hi_cat = np.concatenate([t_hi_all[sl] for sl in sampled_rays])
        pairs = np.asarray([(p[0], p[1]) for p in all_pairs], np.int64)
        print(f"  pairs/ray={len(pairs) / ray_base:.2f} "
              f"phase1 nodes/packet={p1_visits / n_samp:.0f}", flush=True)

        # Phase 2: group pairs by treelet, union-traverse per treelet
        # in pair-packets of PK.
        order = np.lexsort((pairs[:, 1], pairs[:, 0]))
        pairs = pairs[order]
        p2n = p2l = 0
        t_best = np.full(ray_base, 1e32)
        i = 0
        while i < len(pairs):
            root = pairs[i, 0]
            j = i
            while j < len(pairs) and pairs[j, 0] == root:
                j += 1
            for k in range(i, j, PK):
                sel = pairs[k:min(k + PK, j), 1]
                v, l, tb = treelet_union_sim(
                    f, root, o_cat[sel], d_cat[sel], None,
                    t_hi_cat[sel], t_best[sel])
                t_best[sel] = tb
                p2n += v
                p2l += l
            i = j
        # Phase-2 packets are mostly PARTIAL (a treelet's pair count
        # rarely fills PK); model cost with the actual lane counts by
        # scaling sub to the mean occupancy.
        mean_occ = len(pairs) / max(
            sum(1 for _ in range(0, 1)) , 1)  # placeholder, see below
        # Count packets and mean size properly:
        sizes = []
        i = 0
        while i < len(pairs):
            root = pairs[i, 0]
            j = i
            while j < len(pairs) and pairs[j, 0] == root:
                j += 1
            for k in range(i, j, PK):
                sizes.append(min(PK, j - k))
            i = j
        sizes = np.asarray(sizes)
        eff_sub = max(np.mean(np.ceil(sizes / 128.0)), 1.0)
        p1_cyc = cycles(p1_visits / n_samp, 0, PK // 128) * packets_total
        p2_cyc = (p2n * (350 + 17 * eff_sub)
                  + p2l * 14 * 40 * eff_sub) * (packets_total / n_samp)
        sort_ms = len(pairs) / ray_base * n / 2e6 * 36  # sort_ab chunk rate
        print(f"  phase2: visits={p2n / n_samp:.0f}/packet-sample "
              f"leaves={p2l / n_samp:.0f} packets={len(sizes)} "
              f"mean_pairs/packet={sizes.mean():.0f}", flush=True)
        print(f"  model: p1={p1_cyc / 940e6 * 1000:.0f} ms "
              f"p2={p2_cyc / 940e6 * 1000:.0f} ms "
              f"pair-sort~{sort_ms:.0f} ms "
              f"vs baseline {base_cyc * packets_total / 940e6 * 1000:.0f} ms",
              flush=True)


if __name__ == "__main__":
    main()
