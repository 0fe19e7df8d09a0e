"""Frontier (16-ary MXU node phase) visit counts vs the quad kernel —
host sim on real sorted atrium bounce rays, plus a cycle model.

What it answers before the TPU relay is back:
  1. How many SUPER-node visits does a 16-ary collapse take vs the
     quad (4-ary) collapse on the same union packets?  (Each frontier
     visit tests 16 children = 4 binary levels; each quad visit 4
     children = 2 levels — but a wider frontier descends into MORE
     subtrees per level, so visits don't divide by 4.)
  2. How much does the 2^-7 guard-band dilation inflate visits?
     (It can only ADD visits — exactness is proven in tests; this
     quantifies the perf tax for each precision's guard.)
  3. A cycle model per visit: the frontier visit replaces
     width/2 x (28 scalar box loads + 2 slab chains + 2 ~100-cycle
     cross-lane mins) with ONE (8,128)x(8,P) matmul + ONE batched
     16-child reduction + 16 scalar enc loads + a 63-comparator
     scalar sort.  MODEL ONLY until measured on real Mosaic.

    python experiments/frontier_sim.py [detail] [W H]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from union_stats import bounce_rays


def nary_stack_sim(bvh, width, tris, oo, dd, al, start, packet, block,
                   guard=0.0):
    """Union-packet stack traversal of the width-ary collapse with
    REAL leaf Moller-Trumbore pruning (``tris`` = slot-mapped
    (v0, e1, e2) arrays), so guard dilation can only ADD visits —
    exactly the kernel's semantics.  Returns (super_visits,
    leaf_visits, child_box_tests)."""
    from vulkan_pathtracer_tpu.ops.pallas_pair import _nary_collapse

    super_row, children = _nary_collapse(bvh, width)
    kids_of = {super_row[n]: kids for n, kids in children}
    R = np.maximum(np.abs(bvh.bmin[0]), np.abs(bvh.bmax[0]))
    tv0, te1, te2 = tris

    o = oo[start:start + packet]
    d = dd[start:start + packet]
    a = al[start:start + packet]
    inv = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)
    t_best = np.full(packet, 1e32)
    t_hi = np.where(a, 1e4, -1.0)

    def mt_prune(first):
        """Closest accepted t over the leaf's block (backface cull),
        vectorized over the packet."""
        nonlocal t_best
        for k in range(block):
            ti = first + k
            if ti >= tv0.shape[0]:
                break
            v0, e1, e2 = tv0[ti], te1[ti], te2[ti]
            if not e1.any() and not e2.any():
                continue  # block padding slot
            p = np.cross(d, e2)                      # (P, 3)
            det = p @ e1                             # (P,)
            front = det > 0.0
            inv_det = 1.0 / np.where(front, det, 1.0)
            tvec = o - v0
            u = (tvec * p).sum(1) * inv_det
            q = np.cross(tvec, e1)
            v = (d * q).sum(1) * inv_det
            t = (q @ e2) * inv_det
            ok = (front & (u >= 0) & (v >= 0) & (u + v <= 1)
                  & (t > 1e-3) & (t < np.minimum(t_best, t_hi)))
            t_best = np.where(ok, t, t_best)

    visits = leaves = tests = 0
    stack = [0]
    while stack:
        r = stack.pop()
        visits += 1
        entries = []
        for kind, cid in kids_of[r]:
            lo = bvh.bmin[cid].astype(np.float64)
            hi = bvh.bmax[cid].astype(np.float64)
            dil = guard * (np.maximum(np.abs(lo), np.abs(hi)) + R)
            lo, hi = lo - dil, hi + dil
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
            tests += 1
            if not hit.any():
                continue
            m = float(tn[hit].min())
            if kind == "leaf":
                leaves += 1
                mt_prune(int(bvh.leaf_first[cid]))
            else:
                entries.append((m, super_row[cid]))
        for _, row in sorted(entries, key=lambda e: -e[0]):
            stack.append(row)
    return visits, leaves, tests


def main():
    detail = float(sys.argv[1]) if len(sys.argv) > 1 else 4.1
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 720
    glb = f"/tmp/bench_atrium_{detail}.glb"
    if not os.path.exists(glb):
        from assets.procedural import make_atrium

        make_atrium(glb, detail=detail)
    dev, (oo, dd, al) = bounce_rays(glb, W, H)
    print(f"tris={dev.num_triangles} live={al.sum()}/{al.size}",
          flush=True)

    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.device_scene import (
        bvh_with_leaf_blocks,
    )

    scene = gltf.load(glb)
    pk = 2048
    rng = np.random.default_rng(0)
    n = oo.shape[0]
    starts = rng.choice(n // pk - 1, size=8, replace=False) * pk
    packets = al.sum() / pk
    f_hz = 940e6

    # World-space triangle soup exactly as the flat bake assembles it.
    v0s, e1s, e2s = [], [], []
    for inst in scene.instances:
        M = inst.transform[:3, :3]
        t = inst.transform[:3, 3]
        mesh = scene.meshes[inst.mesh_index]
        for pg in range(mesh.start, mesh.end):
            prim = scene.primitives[pg]
            idx = prim.indices.reshape(-1, 3)
            pos = prim.positions @ M.T + t
            v0s.append(pos[idx[:, 0]])
            e1s.append(pos[idx[:, 1]] - pos[idx[:, 0]])
            e2s.append(pos[idx[:, 2]] - pos[idx[:, 0]])
    tv0 = np.concatenate(v0s).astype(np.float32)
    te1 = np.concatenate(e1s).astype(np.float32)
    te2 = np.concatenate(e2s).astype(np.float32)

    from vulkan_pathtracer_tpu.models.device_scene import apply_slot_map

    for L in (14, 28):
        bvh, slot_map = bvh_with_leaf_blocks(tv0, te1, te2, L)
        tris = (apply_slot_map(tv0, slot_map),
                apply_slot_map(te1, slot_map),
                apply_slot_map(te2, slot_map))

        print(f"\nleaf={L}  (per packet of {pk}, mean over "
              f"{len(starts)} packets; {packets:.0f} packets total)",
              flush=True)
        rows = []
        for name, width, guard in (
                ("quad  w=4  exact", 4, 0.0),
                ("oct   w=8  exact", 8, 0.0),
                ("front w=16 exact", 16, 0.0),
                ("front w=16 g2^-12", 16, 2.0 ** -12),
                ("front w=16 g2^-7", 16, 2.0 ** -7),
                ("front w=16 g2^-5", 16, 2.0 ** -5),
        ):
            tv = tl = tt = 0
            for s in starts:
                a, b, c = nary_stack_sim(bvh, width, tris, oo, dd, al,
                                         int(s), pk, L, guard)
                tv += a
                tl += b
                tt += c
            m = len(starts)
            rows.append((name, width, tv / m, tl / m, tt / m))
        # Cycle model per SUPER-visit (pk2048, f32-highest matmul):
        #   quad: 28 loads*3cyc + 4 slab chains (17 ops*2vreg*0.8) +
        #         4 cross-lane mins ~110 pipelined + sort5*2 + stack 40
        #   front: matmul 16 N-tiles * 6 passes * ~10cyc (HIGHEST; 1
        #         pass at DEFAULT) + slab epilogue 10ops*32vreg*0.8 +
        #         ONE batched (16,P) reduce ~150 + 16 enc loads*3 +
        #         63 cmp*2 + stack ~60
        leaf_cost = 126 * 4 + 55 * L * 2 * 0.8  # exact MT (<=14)
        mxu_leaf = 16 * 3 * 10 + 25 * ((L + 7) // 8) * (pk // 512) \
            * 0.8 + 80
        fixed16 = 10 * 32 * 0.8 + 150 + 16 * 3 + 63 * 2 + 60
        for name, width, v, lf, tt_ in rows:
            if width == 4:
                pers = [28 * 3 + 2 * 17 * 2 * 0.8 * 2 + 110 + 10 + 40]
            elif width == 8:
                pers = [56 * 3 + 4 * 17 * 2 * 0.8 * 2 + 140 + 38 + 50]
            else:
                # HIGHEST (6 bf16 passes) and DEFAULT (1 pass — the
                # guard band makes it exact-conservative too).
                pers = [16 * 6 * 10 + fixed16, 16 * 1 * 10 + fixed16]
            leaf_ms = lf * (leaf_cost if L <= 14 else mxu_leaf) \
                * packets / f_hz * 1e3
            node_ms = [v * p * packets / f_hz * 1e3 for p in pers]
            alt = (f" (node {node_ms[1]:.0f} ms @ default-prec)"
                   if len(node_ms) > 1 else "")
            print(f"  {name}: visits={v:7.0f} leaf={lf:6.0f} "
                  f"tests={tt_:7.0f}  model: node {node_ms[0]:5.0f} ms "
                  f"+ leaf {leaf_ms:5.0f} ms = "
                  f"{node_ms[0] + leaf_ms:5.0f} ms{alt}", flush=True)


if __name__ == "__main__":
    main()
