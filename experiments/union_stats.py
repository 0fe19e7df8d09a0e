"""Union-packet visit counts on real sorted atrium bounce rays, with
an optional windowed-cascade model: node/leaf visits per packet for
several packet sizes and t-window partitions.  Pure CPU host sim —
predicts kernel time as visits x per-visit cycle cost so window
boundaries can be tuned without TPU runs.

    python experiments/union_stats.py [detail] [W H]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def bounce_rays(glb_path, W, H):
    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
    from vulkan_pathtracer_tpu.app.camera_path import orbit_path
    from vulkan_pathtracer_tpu.models.camera import Camera
    from vulkan_pathtracer_tpu.ops import rng as rngmod
    from vulkan_pathtracer_tpu.ops.brdf import ShadingInfo, sample_brdf
    from vulkan_pathtracer_tpu.ops.intersect import MISS_T
    from vulkan_pathtracer_tpu.ops.traverse import bvh_closest_hit
    from vulkan_pathtracer_tpu.ops.vecmath import dot, mix
    from vulkan_pathtracer_tpu.render.pipeline import (
        _pixel_seeds, _tile_order, generate_rays,
    )
    from vulkan_pathtracer_tpu.render.shading import (
        get_material_data, get_triangle_data,
    )
    from vulkan_pathtracer_tpu.render.wavefront import _bounce_sort_key

    scene = gltf.load(glb_path)
    dev = build_device_scene(scene)
    cam = Camera(aspect_ratio=W / H)
    orbit_path(radius=4.5, height=2.2, duration=4.0,
               center=(0.0, 1.2, 0.0)).apply(cam, 0.0)
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())
    o, d = generate_rays(pos, hor, ver, fwd, W, H)
    sx, sy = _pixel_seeds(W, H, jnp.uint32(1))
    order, _ = _tile_order(H, W)
    o, d = o[jnp.asarray(order)], d[jnp.asarray(order)]
    sx, sy = sx[jnp.asarray(order)], sy[jnp.asarray(order)]
    hit = bvh_closest_hit(dev, o, d)
    did_hit = hit.t < MISS_T
    tri_data = get_triangle_data(dev, hit)
    mat = get_material_data(dev, tri_data)
    out_dir = -d
    sh = ShadingInfo(
        normal=mat.normal, out_dir=out_dir,
        lambert_out=dot(mat.normal, out_dir),
        fresnel_0=mix(jnp.float32(0.02), mat.albedo[:, :3],
                      mat.metallic[:, None]),
        diffuse_albedo=mat.albedo[:, :3]
        - mat.metallic[:, None] * mat.albedo[:, :3],
        roughness=jnp.maximum(jnp.float32(0.006), mat.roughness),
    )
    _, _, rx, ry = rngmod.pcg2d(sx, sy)
    new_o = o + hit.t[:, None] * d + tri_data.geometry_normal * 1e-5
    new_d = sample_brdf(sh, rx, ry)
    alive = did_hit & (dot(sh.normal, new_d) > 0.0)
    key = _bounce_sort_key(dev, new_o, new_d, alive)
    ordr = jnp.argsort(key)
    return dev, (np.asarray(new_o[ordr]), np.asarray(new_d[ordr]),
                 np.asarray(alive[ordr]))


def union_sim(ftab, oo, dd, al, start, packet, t_near=0.0, t_far=1e4,
              t_seed=None):
    """Vectorized union-packet traversal of rays [start, start+packet).
    Returns (node_visits, leaf_visits, leaf_hit_lane_count, t_best).
    t_seed carries per-lane prior best (cascade passes run with the
    prior window's survivors at MISS)."""
    o = oo[start:start + packet]
    d = dd[start:start + packet]
    a = al[start:start + packet]
    oct_counts = np.bincount(
        (d[:, 0] < 0) + 2 * (d[:, 1] < 0) + 4 * (d[:, 2] < 0),
        weights=a.astype(np.float64), minlength=8)
    oct_ = int(np.argmax(oct_counts))
    f = ftab[oct_]
    nn = f.shape[0]
    inv = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)
    t_best = np.full(packet, 1e32 if t_seed is None else t_seed,
                     np.float64)
    t_hi = np.where(a, t_far, -1.0)
    node = 0
    nodes = leaves = lane_hits = 0
    tri = None  # not tracked
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
            np.minimum(tz0, tz1),
            np.full(packet, max(0.001, t_near)),
        ])
        tf = np.minimum.reduce([
            np.maximum(tx0, tx1), np.maximum(ty0, ty1),
            np.maximum(tz0, tz1), np.minimum(t_best, t_hi),
        ])
        hit = tn <= tf
        nodes += 1
        if row[7] >= 0:
            nh = int(hit.sum())
            if nh:
                leaves += 1
                lane_hits += nh
                # Approximate MT by clamping t_best to box-entry tn of
                # hitting lanes (optimistic pruning proxy; real MT can
                # only be >= tn).  Keeps the sim cheap but box-accurate.
                t_best = np.where(hit, np.minimum(t_best, tf), t_best)
            node = int(row[6])
        else:
            node = node + 1 if hit.any() else int(row[6])
    return nodes, leaves, lane_hits


def main():
    detail = float(sys.argv[1]) if len(sys.argv) > 1 else 4.1
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 720
    glb = f"/tmp/bench_atrium_{detail}.glb"
    if not os.path.exists(glb):
        from assets.procedural import make_atrium

        make_atrium(glb, detail=detail)
    dev, (oo, dd, al) = bounce_rays(glb, W, H)
    print(f"tris={dev.num_triangles} live={al.sum()}/{al.size}", flush=True)

    rows = np.asarray(dev.bvh_rows).reshape(dev.bvh_orders, -1, 128)
    ftab = [rows[o].reshape(-1, 8).astype(np.float64)
            for o in range(dev.bvh_orders)]

    lo = ftab[0][0, 0:3]
    hi = ftab[0][0, 3:6]
    diag = float(np.linalg.norm(hi - lo))
    print(f"diag={diag:.2f}", flush=True)

    rng = np.random.default_rng(0)
    n = oo.shape[0]

    # Per-ray ideal (sampled): nodes/leaf-hits with exact t pruning.
    live_idx = np.nonzero(al)[0]
    sample = rng.choice(live_idx, size=400, replace=False)
    tot_n = tot_l = 0
    for ri in sample:
        o1, d1 = oo[ri], dd[ri]
        i1 = 1.0 / np.where(np.abs(d1) < 1e-20, 1e-20, d1)
        oct_ = int((d1[0] < 0) + 2 * (d1[1] < 0) + 4 * (d1[2] < 0))
        f = ftab[oct_]
        nn = f.shape[0]
        t_best = 1e4
        node = 0
        while node < nn:
            tot_n += 1
            row = f[node]
            tx0 = (row[0] - o1[0]) * i1[0]
            tx1 = (row[3] - o1[0]) * i1[0]
            ty0 = (row[1] - o1[1]) * i1[1]
            ty1 = (row[4] - o1[1]) * i1[1]
            tz0 = (row[2] - o1[2]) * i1[2]
            tz1 = (row[5] - o1[2]) * i1[2]
            tn = max(min(tx0, tx1), min(ty0, ty1), min(tz0, tz1), 0.001)
            tf = min(max(tx0, tx1), max(ty0, ty1), max(tz0, tz1), t_best)
            hit = tn <= tf
            if row[7] >= 0:
                if hit:
                    tot_l += 1
                    t_best = min(t_best, tf)  # box proxy for MT prune
                node = int(row[6])
            else:
                node = node + 1 if hit else int(row[6])
    print(f"per-ray ideal: nodes={tot_n/400:.1f} leaf-visits={tot_l/400:.1f}",
          flush=True)

    for pk in (2048, 3072, 4096):
        starts = rng.choice(n // pk - 1, size=12, replace=False) * pk
        tn = tl = th = 0
        for s in starts:
            a, b, c = union_sim(ftab, oo, dd, al, s, pk)
            tn += a
            tl += b
            th += c
        m = len(starts)
        # Cycle model (pk-dependent): slab ~17 vreg-ops x rows/8 x
        # 0.8cyc + 110 sums + ~40 scalar; leaf adds ~300 (gmt MT).
        vregs = pk // 1024
        per_node = 17 * vregs * 0.8 + 110 + 40
        est_ms = (tn / m * per_node + tl / m * 300) * (al.sum() / pk) \
            / 940e6 * 1e3
        print(f"pk{pk}: nodes/packet={tn/m:.0f} leaves/packet={tl/m:.0f} "
              f"lanes-hit/leaf={th/max(tl,1):.1f} "
              f"floor~{est_ms:.0f}ms", flush=True)

    # Windowed cascade model at pk8192: survivors resorted per window.
    pk = 8192
    for fracs in ((0.1, 0.3), (0.05, 0.15, 0.4), (0.15,)):
        bounds = [0.0] + [f * diag for f in fracs] + [1e4]
        o_c, d_c, a_c = oo.copy(), dd.copy(), al.copy()
        total_nodes = total_leaves = 0.0
        est_ms = 0.0
        for k in range(len(bounds) - 1):
            blo, bhi = bounds[k], bounds[k + 1]
            live_n = int(a_c.sum())
            if live_n == 0:
                break
            idx = np.argsort(~a_c, kind="stable")  # live first
            o_c, d_c, a_c = o_c[idx], d_c[idx], a_c[idx]
            n_pk = max(live_n // pk, 1)
            starts = (rng.choice(n_pk, size=min(8, n_pk), replace=False)
                      * pk)
            wn = wl = 0
            found_frac = []
            for s in starts:
                nodes, leaves, _ = union_sim(
                    ftab, o_c, d_c, a_c, s, pk, t_near=blo, t_far=bhi)
                wn += nodes
                wl += leaves
            m = len(starts)
            vregs = pk // 1024
            per_node = 17 * vregs * 0.8 + 110 + 40
            packets = live_n / pk
            est_ms += (wn / m * per_node + wl / m * 300) * packets \
                / 940e6 * 1e3
            total_nodes += wn / m * packets
            total_leaves += wl / m * packets
            # Survivors: lanes with no hit below bhi (approximate with
            # true distances from a full-range sim? too slow — instead
            # drop lanes whose box-entry clamp fell below bhi).  Use
            # the real t from the production hit if available: here we
            # conservatively keep all (upper bound).
            # Cheap survivor estimate: re-run sim storing t_best.
            # (skipped: use hit-distance percentiles printed by the
            # TPU harness to cross-check.)
            break  # only window 0 modeled without true distances
        print(f"cascade {fracs}: window0 nodes/packet={wn/m:.0f} "
              f"leaves/packet={wl/m:.0f} est_w0={est_ms:.0f}ms",
              flush=True)


if __name__ == "__main__":
    main()
