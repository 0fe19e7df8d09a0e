"""Host sim: quad-stack CLOSEST-HIT vs ANY-HIT visit counts on real
sorted atrium bounce rays (the emissive-free last-bounce question).

Mirrors ops/pallas_pair._make_nary_kernel / _make_nary_anyhit_kernel
semantics exactly: shared stack, packet-min near-first ordering,
leaf MT immediate, union descent; the any-hit variant collapses
resolved lanes' slab windows and terminates when all lanes resolve.
MT here is exact (vectorized numpy), so closest visit counts are the
real kernel's visit counts, not the box proxy union_stats uses.

    python experiments/anyhit_sim.py [detail] [W H] [PK=2048] [NPKT=8]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from union_stats import bounce_rays  # noqa: E402


def quad_sim(nodes, tris, block, o, d, a, mode, t_far=1e4):
    """One packet through the quad table.  Returns (node_visits,
    leaf_visits, resolved_or_hit_mask)."""
    pk = o.shape[0]
    inv = 1.0 / np.where(np.abs(d) < 1e-20,
                         np.where(d >= 0, 1e-20, -1e-20), d)
    oi = o * inv
    tl = np.where(a, t_far, -1.0)
    tmin = 0.001
    width = nodes.shape[1] // 8
    if mode == "closest":
        t_best = np.full(pk, 1e32)
    else:
        resolved = tl < 0.0
    stack = []
    cur = 0
    nv = lv = 0
    while cur >= 0:
        nv += 1
        row = nodes[cur]
        if mode == "closest":
            tlim = np.minimum(t_best, tl)
        else:
            tlim = np.where(resolved, -1.0, tl)
            if resolved.all():
                break
        ms = []
        for s in range(width):
            b = row[s * 6:s * 6 + 6]
            tx0 = b[0] * inv[:, 0] - oi[:, 0]
            tx1 = b[3] * inv[:, 0] - oi[:, 0]
            ty0 = b[1] * inv[:, 1] - oi[:, 1]
            ty1 = b[4] * inv[:, 1] - oi[:, 1]
            tz0 = b[2] * inv[:, 2] - oi[:, 2]
            tz1 = b[5] * inv[:, 2] - oi[:, 2]
            with np.errstate(invalid="ignore"):
                tn = np.maximum.reduce([
                    np.minimum(tx0, tx1), np.minimum(ty0, ty1),
                    np.minimum(tz0, tz1), np.full(pk, tmin)])
                tf = np.minimum.reduce([
                    np.maximum(tx0, tx1), np.maximum(ty0, ty1),
                    np.maximum(tz0, tz1), tlim])
                e = np.where(tn <= tf, tn, 3e38)
            ms.append(e.min())
        encs = row[6 * width:7 * width]
        # Leaf slots first (slot order), like the kernel.
        for s in range(width):
            if ms[s] < 3e38 and encs[s] < 0.0:
                lv += 1
                leaf = int(-encs[s]) - 1
                tb = tris[leaf].reshape(block, 9)
                v0 = tb[:, 0:3]
                e1 = tb[:, 3:6]
                e2 = tb[:, 6:9]
                p = np.cross(d[:, None, :], e2[None, :, :])
                det = np.einsum("kj,ikj->ik", e1, p)
                front = det > 0.0
                invd = 1.0 / np.where(front, det, 1.0)
                tx = o[:, None, :] - v0[None, :, :]
                u = np.einsum("ikj,ikj->ik", tx, p) * invd
                q = np.cross(tx, e1[None, :, :])
                v = np.einsum("ij,ikj->ik", d, q) * invd
                t = np.einsum("kj,ikj->ik", e2, q) * invd
                if mode == "closest":
                    tlim2 = np.minimum(t_best, tl)[:, None]
                    acc = (front & (u >= 0) & (v >= 0) & (u + v <= 1)
                           & (t > tmin) & (t < tlim2))
                    t_best = np.minimum(
                        t_best, np.where(acc, t, 1e32).min(axis=1))
                else:
                    acc = (front & (u >= 0) & (v >= 0) & (u + v <= 1)
                           & (t > tmin) & (t < tl[:, None]))
                    resolved |= acc.any(axis=1)
        # Internal slots near-first.
        internals = sorted(
            (ms[s], s) for s in range(width)
            if ms[s] < 3e38 and encs[s] >= 0.0)
        for _, s in reversed(internals[1:]):
            stack.append(int(encs[s]))
        if internals:
            cur = int(encs[internals[0][1]])
        elif stack:
            cur = stack.pop()
        else:
            cur = -1
    out = (t_best < 1e32) if mode == "closest" else (resolved & a)
    return nv, lv, out


def main():
    detail = float(sys.argv[1]) if len(sys.argv) > 1 else 4.1
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    pk = int(os.environ.get("PK", 2048))
    npkt = int(os.environ.get("NPKT", 8))
    glb = f"/tmp/bench_atrium_{detail}.glb"
    if not os.path.exists(glb):
        from assets.procedural import make_atrium

        make_atrium(glb, detail=detail)
    dev, (oo, dd, al) = bounce_rays(glb, W, H)
    print(f"tris={dev.num_triangles} live={al.sum()}/{al.size} pk={pk}",
          flush=True)
    nodes = np.asarray(dev.bvh_quad, np.float64)
    tris = np.asarray(dev.tri_blocks, np.float64)
    block = tris.shape[1] // 9

    rng = np.random.default_rng(0)
    n = oo.shape[0]
    starts = np.sort(rng.choice(n // pk - 1, size=npkt, replace=False)) * pk
    tn_c = tl_c = tn_a = tl_a = 0
    for s in starts:
        o = oo[s:s + pk]
        d = dd[s:s + pk]
        a = al[s:s + pk]
        nv, lv, hc = quad_sim(nodes, tris, block, o, d, a, "closest")
        nv2, lv2, ha = quad_sim(nodes, tris, block, o, d, a, "anyhit")
        assert ((hc & a) == ha).all(), "mask mismatch"
        tn_c += nv
        tl_c += lv
        tn_a += nv2
        tl_a += lv2
        print(f"  start={s:>8}: closest {nv:5d}n/{lv:4d}l  "
              f"anyhit {nv2:5d}n/{lv2:4d}l  "
              f"({(nv + 2.2 * lv) / max(nv2 + 2.2 * lv2, 1):.2f}x wtd)",
              flush=True)
    m = npkt
    # Weighted visit model: a leaf visit costs ~2.2 node visits
    # (block-14 MT ~ 14 x ~20 vec ops vs 4 slabs x ~17 + reductions).
    wc = tn_c + 2.2 * tl_c
    wa = tn_a + 2.2 * tl_a
    print(f"mean/packet: closest {tn_c/m:.0f}n/{tl_c/m:.0f}l  "
          f"anyhit {tn_a/m:.0f}n/{tl_a/m:.0f}l", flush=True)
    print(f"weighted-visit speedup: {wc/wa:.2f}x "
          f"(nodes {tn_c/max(tn_a,1):.2f}x, leaves {tl_c/max(tl_a,1):.2f}x)",
          flush=True)

    # ---- Two-pass any-hit with compaction ----
    # Pass 1 clamps every lane to t_far=T0: t-slab-limited traversal
    # visits only boxes entered below T0 (tiny unions).  Unresolved
    # lanes are COMPACTED across packets, re-sorted by the 6d key,
    # and re-packed densely for a full-range pass 2 — so pass-2 cost
    # scales with the unresolved fraction, unlike the closest-hit
    # two-pass (measured 0.74-0.91x: its pass-2 rays re-traversed
    # everything from every packet).
    from vulkan_pathtracer_tpu.render.wavefront import _bounce_sort_key
    from vulkan_pathtracer_tpu.ops.traverse import bvh_closest_hit
    import jax.numpy as jnp

    # Hit-distance quantiles from a closest XLA pass over a sample.
    samp = slice(0, 65536)
    h = bvh_closest_hit(dev, jnp.asarray(oo[samp]),
                        jnp.asarray(dd[samp]), jnp.asarray(al[samp]))
    t_np = np.asarray(h.t)
    hits_t = t_np[(t_np < 1e31) & al[samp]]
    for frac_name, T0q in (("p50", 50), ("p75", 75), ("p90", 90)):
        T0 = float(np.percentile(hits_t, T0q))
        tn1 = tl1 = 0
        unres_o = []
        unres_d = []
        for s in starts:
            o = oo[s:s + pk]
            d = dd[s:s + pk]
            a = al[s:s + pk]
            nv, lv, res = quad_sim(nodes, tris, block, o, d, a,
                                   "anyhit", t_far=T0)
            tn1 += nv
            tl1 += lv
            un = a & ~res
            unres_o.append(o[un])
            unres_d.append(d[un])
        uo = np.concatenate(unres_o)
        ud = np.concatenate(unres_d)
        u_frac = uo.shape[0] / (npkt * pk)
        # Re-sort survivors by the production key and re-pack densely.
        key = np.asarray(_bounce_sort_key(
            dev, jnp.asarray(uo, jnp.float32),
            jnp.asarray(ud, jnp.float32),
            jnp.ones(uo.shape[0], bool)))
        o2 = uo[np.argsort(key)]
        d2 = ud[np.argsort(key)]
        tn2 = tl2 = 0
        for s2 in range(0, o2.shape[0] - pk + 1, pk) or [0]:
            nv, lv, _ = quad_sim(
                nodes, tris, block, o2[s2:s2 + pk], d2[s2:s2 + pk],
                np.ones(pk, bool), "anyhit")
            tn2 += nv
            tl2 += lv
        n2pk = max(len(range(0, o2.shape[0] - pk + 1, pk)), 1)
        # Scale pass-2 to the full unresolved set (partial tail packet
        # modeled at the mean packet cost).
        scale = (uo.shape[0] / pk) / n2pk
        w2p = (tn1 + 2.2 * tl1) + scale * (tn2 + 2.2 * tl2)
        print(f"two-pass T0={frac_name}({T0:.2f}): pass1 "
              f"{tn1/m:.0f}n/{tl1/m:.0f}l/pkt, unresolved "
              f"{100*u_frac:.1f}%, pass2(x{scale:.2f}) "
              f"{tn2/max(n2pk,1):.0f}n/{tl2/max(n2pk,1):.0f}l/pkt "
              f"-> total speedup vs closest {wc/w2p:.2f}x "
              f"(vs 1-pass anyhit {wa/w2p:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
