"""SAH-aware greedy quad collapse vs the fixed 2-level collapse
(host sim).

The production quad kernel (ops/pallas_pair.py) collapses the binary
SAH tree rigidly: each super-node's 4 slots are the descendants two
levels down, an early leaf terminating its branch (so a node with a
leaf child wastes a slot that could have tested a deeper box).  A
greedy collapse instead expands the INTERNAL slot with the largest
surface area until the row is full — the classic wide-BVH collapse —
which packs fuller rows, strictly reduces super-node count, and
should cut union-packet visits at IDENTICAL per-visit kernel cost
(the kernel only sees (N,32) rows either way).

This sim counts union-packet super-node visits and leaf-block visits
on the same sorted atrium bounce rays as union_stats.py for both
collapses:

    python experiments/collapse_sim.py [detail] [W H]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from union_stats import bounce_rays


def _area(bmin, bmax):
    e = np.maximum(bmax - bmin, 0.0)
    return 2.0 * (e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2]
                  + e[:, 2] * e[:, 0])


def greedy_collapse(bvh, width):
    """Greedy surface-area collapse: same return shape as
    ops.pallas_pair._nary_collapse (super_row, children)."""
    internal = bvh.left_child >= 0
    if not internal[0]:
        raise ValueError("n-ary rows need an internal root")
    area = _area(bvh.bmin, bvh.bmax)
    super_row = {}
    children = []
    stack = [0]
    while stack:
        node = stack.pop()
        if node in super_row:
            continue
        super_row[node] = len(children)
        slots = [int(bvh.left_child[node]), int(bvh.right_child[node])]
        while len(slots) < width:
            cand = [(area[s], i) for i, s in enumerate(slots)
                    if internal[s]]
            if not cand:
                break
            _, i = max(cand)
            s = slots[i]
            slots[i:i + 1] = [int(bvh.left_child[s]),
                              int(bvh.right_child[s])]
        kids = []
        for s in slots:
            if internal[s]:
                kids.append(("super", s))
                stack.append(s)
            else:
                kids.append(("leaf", s))
        children.append((node, kids))
    return super_row, children


def rows_from_collapse(bvh, block, width, collapse):
    super_row, children = collapse
    nw = len(children)
    rows = np.zeros((nw, 8 * width), np.float64)
    rows[:, 0:6 * width] = np.nan
    rows[:, 6 * width:7 * width] = -1.0
    for node, kids in children:
        r = super_row[node]
        for s, (kind, cid) in enumerate(kids):
            rows[r, s * 6:s * 6 + 3] = bvh.bmin[cid]
            rows[r, s * 6 + 3:s * 6 + 6] = bvh.bmax[cid]
            if kind == "super":
                rows[r, 6 * width + s] = float(super_row[cid])
            else:
                rows[r, 6 * width + s] = -float(
                    bvh.leaf_first[cid] // block + 1)
    return rows


def quad_union_sim(rows, width, oo, dd, al, start, packet,
                   t_far=1e4):
    """Union-packet stack traversal over n-ary rows: a super-node is
    visited when ANY lane hits >= 1 of its parent's slot boxes;
    leaf-block visits counted per hit leaf slot.  Near-first dynamic
    ordering (pop nearest tn first), box-exit t pruning proxy on leaf
    hits — the same proxy as union_stats.union_sim, applied equally
    to both collapses."""
    o = oo[start:start + packet]
    d = dd[start:start + packet]
    a = al[start:start + packet]
    inv = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)
    t_best = np.full(packet, 1e32)
    t_hi = np.where(a, t_far, -1.0)
    supers = leaves = lane_hits = 0
    stack = [(0.0, 0)]
    while stack:
        stack.sort(key=lambda x: -x[0])
        _, r = stack.pop()
        supers += 1
        row = rows[r]
        hits = []
        for s in range(width):
            lo = row[s * 6:s * 6 + 3]
            hi = row[s * 6 + 3:s * 6 + 6]
            if np.isnan(lo[0]):
                continue
            tx0 = (lo[0] - o[:, 0]) * inv[:, 0]
            tx1 = (hi[0] - o[:, 0]) * inv[:, 0]
            ty0 = (lo[1] - o[:, 1]) * inv[:, 1]
            ty1 = (hi[1] - o[:, 1]) * inv[:, 1]
            tz0 = (lo[2] - o[:, 2]) * inv[:, 2]
            tz1 = (hi[2] - o[:, 2]) * inv[:, 2]
            tn = np.maximum.reduce([
                np.minimum(tx0, tx1), np.minimum(ty0, ty1),
                np.minimum(tz0, tz1), np.full(packet, 0.001)])
            tf = np.minimum.reduce([
                np.maximum(tx0, tx1), np.maximum(ty0, ty1),
                np.maximum(tz0, tz1), np.minimum(t_best, t_hi)])
            hit = tn <= tf
            nh = int(hit.sum())
            if nh == 0:
                continue
            enc = row[6 * width + s]
            tmin = float(tn[hit].min())
            if enc >= 0:
                hits.append((tmin, int(enc)))
            else:
                leaves += 1
                lane_hits += nh
                t_best = np.where(hit, np.minimum(t_best, tf), t_best)
        stack.extend(hits)
    return supers, leaves, lane_hits


def main():
    from vulkan_pathtracer_tpu.ops.pallas_pair import _nary_collapse

    detail = float(sys.argv[1]) if len(sys.argv) > 1 else 4.1
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 720
    block = int(os.environ.get("SIM_LEAF", 14))
    width = int(os.environ.get("SIM_WIDTH", 4))
    glb = f"/tmp/bench_atrium_{detail}.glb"
    if not os.path.exists(glb):
        from assets.procedural import make_atrium

        make_atrium(glb, detail=detail)
    dev, (oo, dd, al) = bounce_rays(glb, W, H)
    print(f"tris={dev.num_triangles} live={al.sum()}/{al.size}",
          flush=True)

    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.device_scene import (
        _bake_instance,
        bvh_with_leaf_blocks,
    )

    scene = gltf.load(glb)
    acc = {k: [] for k in (
        "tri_v0", "tri_e1", "tri_e2", "tri_gn", "tri_index",
        "tri_material", "tri_primitive", "tri_local", "vert_normal",
        "vert_tangent", "vert_uv")}
    vb = 0
    for inst in scene.instances:
        vb = _bake_instance(scene, inst, acc, vb)
    v0 = np.concatenate(acc["tri_v0"]).astype(np.float32).reshape(-1, 3)
    e1 = np.concatenate(acc["tri_e1"]).astype(np.float32).reshape(-1, 3)
    e2 = np.concatenate(acc["tri_e2"]).astype(np.float32).reshape(-1, 3)
    bvh, _ = bvh_with_leaf_blocks(v0, e1, e2, block)

    fixed = _nary_collapse(bvh, width)
    greedy = greedy_collapse(bvh, width)
    rows_f = rows_from_collapse(bvh, block, width, fixed)
    rows_g = rows_from_collapse(bvh, block, width, greedy)
    occ_f = np.isfinite(rows_f[:, 0:6 * width:6]).sum() / (
        rows_f.shape[0] * width)
    occ_g = np.isfinite(rows_g[:, 0:6 * width:6]).sum() / (
        rows_g.shape[0] * width)
    print(f"supers fixed={rows_f.shape[0]} greedy={rows_g.shape[0]} "
          f"({rows_g.shape[0]/rows_f.shape[0]:.3f}x)  slot-occupancy "
          f"fixed={occ_f:.3f} greedy={occ_g:.3f}", flush=True)

    rng = np.random.default_rng(0)
    n = oo.shape[0]
    pk = int(os.environ.get("SIM_PACKET", 2048))
    starts = rng.choice(n // pk - 1, size=12, replace=False) * pk
    tot = {"fixed": [0, 0, 0], "greedy": [0, 0, 0]}
    for s in starts:
        for name, rows in (("fixed", rows_f), ("greedy", rows_g)):
            a, b, c = quad_union_sim(rows, width, oo, dd, al, s, pk)
            tot[name][0] += a
            tot[name][1] += b
            tot[name][2] += c
    m = len(starts)
    for name in ("fixed", "greedy"):
        a, b, c = tot[name]
        print(f"{name:6s}: supers/packet={a/m:8.1f} "
              f"leaf-visits/packet={b/m:8.1f} lane-hits={c/m:9.0f}",
              flush=True)
    sf, sg = tot["fixed"][0], tot["greedy"][0]
    lf, lg = tot["fixed"][1], tot["greedy"][1]
    print(f"greedy/fixed: supers {sg/sf:.3f}x  leaves {lg/lf:.3f}x",
          flush=True)
    # Cycle model: super visit ~690 cyc (measured quad per-visit,
    # ROADMAP round-3), leaf-block drain ~450 cyc (leaf DMA + MT at
    # block 14 rides partly under the node phase).  Report a range.
    for leaf_cyc in (300, 450, 600):
        cf = sf * 690 + lf * leaf_cyc
        cg = sg * 690 + lg * leaf_cyc
        print(f"  model leaf={leaf_cyc}cyc: greedy {cf/cg:.3f}x faster",
              flush=True)


if __name__ == "__main__":
    main()
