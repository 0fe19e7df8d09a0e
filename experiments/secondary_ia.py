"""Measure IA (packet-interval) vs exact-union traversal visits on
REAL secondary bounce rays (CPU; small frame).

Generates bounce-1 rays exactly like render/wavefront.py (primary
trace + BRDF sample), sorts them with the production key, then counts
row-visits/node-visits/leaf-visits per 2048-ray packet for exact-union
and IA hit tests over the dense rows.

    VKPT_PLATFORM ignored; forced CPU.  python experiments/secondary_ia.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from assets.procedural import make_columns
    from vulkan_pathtracer_tpu.app.camera_path import orbit_path
    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.camera import Camera
    from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
    from vulkan_pathtracer_tpu.ops import rng as rngmod
    from vulkan_pathtracer_tpu.ops.brdf import ShadingInfo, sample_brdf
    from vulkan_pathtracer_tpu.ops.intersect import MISS_T
    from vulkan_pathtracer_tpu.ops.traverse import bvh_closest_hit
    from vulkan_pathtracer_tpu.ops.vecmath import dot, mix
    from vulkan_pathtracer_tpu.render.pipeline import (
        _pixel_seeds,
        _tile_order,
        generate_rays,
    )
    from vulkan_pathtracer_tpu.render.shading import (
        get_material_data,
        get_triangle_data,
    )

    W, H = 640, 360
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    segments = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    path = f"/tmp/dense_cols_{grid}_{segments}.glb"
    if not os.path.exists(path):
        make_columns(path, grid=grid, segments=segments, n_materials=16)
    scene = gltf.load(path)
    dev = build_device_scene(scene, max_leaf_size=int(os.environ.get("LEAF", 8)))
    print(f"tris={dev.num_triangles}", flush=True)

    cam = Camera(aspect_ratio=W / H)
    rmin = np.asarray(dev.bvh_packed[0, 0:3])
    rmax = np.asarray(dev.bvh_packed[0, 3:6])
    ext = float(np.max(rmax - rmin))
    c = (rmin + rmax) * 0.5
    orbit_path(radius=0.75 * ext, height=0.35 * ext,
               center=tuple(c)).apply(cam, 0.0)
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())
    o, d = generate_rays(pos, hor, ver, fwd, W, H)
    sx, sy = _pixel_seeds(W, H, jnp.uint32(1))
    order, _ = _tile_order(H, W)
    o = o[jnp.asarray(order)]
    d = d[jnp.asarray(order)]
    sx = sx[jnp.asarray(order)]
    sy = sy[jnp.asarray(order)]

    # First bounce exactly as wavefront.trace_sample.
    hit = bvh_closest_hit(dev, o, d)
    did_hit = hit.t < MISS_T
    tri_data = get_triangle_data(dev, hit)
    mat = get_material_data(dev, tri_data)
    out_dir = -d
    shading = ShadingInfo(
        normal=mat.normal,
        out_dir=out_dir,
        lambert_out=dot(mat.normal, out_dir),
        fresnel_0=mix(jnp.float32(0.02), mat.albedo[:, :3],
                      mat.metallic[:, None]),
        diffuse_albedo=mat.albedo[:, :3]
        - mat.metallic[:, None] * mat.albedo[:, :3],
        roughness=jnp.maximum(jnp.float32(0.006), mat.roughness),
    )
    _, _, rx, ry = rngmod.pcg2d(sx, sy)
    new_o = o + hit.t[:, None] * d + tri_data.geometry_normal * 1e-5
    new_d = sample_brdf(shading, rx, ry)
    lambert_in = dot(shading.normal, new_d)
    alive = did_hit & (lambert_in > 0.0)

    oo = np.asarray(new_o)
    dd = np.asarray(new_d)
    al = np.asarray(alive)
    print(f"secondary rays: {al.sum()} / {al.size} alive", flush=True)

    # Production sort key (wavefront._closest_hit_sorted, "oct").
    octant = ((dd[:, 0] < 0).astype(np.uint32)
              + 2 * (dd[:, 1] < 0).astype(np.uint32)
              + 4 * (dd[:, 2] < 0).astype(np.uint32))
    lo = rmin
    ext3 = np.maximum(rmax - rmin, 1e-9)
    q = np.clip((oo - lo) / ext3 * 1023.0, 0, 1023).astype(np.uint32)

    def il10(v):
        v = v.astype(np.uint64) & np.uint64(0x3FF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x030000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x0300F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x030C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x09249249)
        return v.astype(np.uint32)

    morton = il10(q[:, 0]) | (il10(q[:, 1]) << 1) | (il10(q[:, 2]) << 2)
    key = (octant << np.uint32(28)) | (morton >> np.uint32(2))
    key = np.where(al, key, np.uint32(0xFFFFFFFF))
    srt = np.argsort(key, kind="stable")
    oo, dd, al = oo[srt], dd[srt], al[srt]

    rows = np.asarray(dev.bvh_rows).reshape(dev.bvh_orders, -1, 128)
    tris = np.asarray(dev.tri_blocks)
    block = tris.shape[1] // 9
    nn_pad = rows.shape[1] * 16
    inv = 1.0 / np.where(np.abs(dd) < 1e-20, 1e-20, dd)

    PK = 2048
    n_pk = oo.shape[0] // PK
    rngr = np.random.default_rng(0)
    packs = rngr.choice(n_pk, size=min(16, n_pk), replace=False)

    for mode in ("exact", "ia"):
        tot_rows = tot_nodes = tot_leaf = 0
        live_packs = 0
        for p in packs:
            sl = slice(p * PK, (p + 1) * PK)
            ooP, ddP, iiP, alP = oo[sl], dd[sl], inv[sl], al[sl]
            if not alP.any():
                continue
            live_packs += 1
            oct_ = int(((ddP[0, 0] < 0) + 2 * (ddP[0, 1] < 0)
                        + 4 * (ddP[0, 2] < 0)))
            fields = rows[oct_].reshape(-1, 8)
            t_best = np.where(alP, 1e32, -1.0).astype(np.float32)
            t_cap = np.where(alP, 1e4, -1.0).astype(np.float32)
            live = alP
            o_lo, o_hi = ooP[live].min(0), ooP[live].max(0)
            i_lo, i_hi = iiP[live].min(0), iiP[live].max(0)
            node = 0
            row_visits = node_visits = leaf_visits = 0
            while node < nn_pad:
                r = node // 16
                row_visits += 1
                t_max = float(np.minimum(t_best, t_cap).max())
                nxt = node
                for j in range(16):
                    n_abs = r * 16 + j
                    if nxt != n_abs:
                        continue
                    node_visits += 1
                    f = fields[n_abs]
                    leaf = f[7]
                    if mode == "exact":
                        tx0 = (f[0] - ooP[:, 0]) * iiP[:, 0]
                        tx1 = (f[3] - ooP[:, 0]) * iiP[:, 0]
                        ty0 = (f[1] - ooP[:, 1]) * iiP[:, 1]
                        ty1 = (f[4] - ooP[:, 1]) * iiP[:, 1]
                        tz0 = (f[2] - ooP[:, 2]) * iiP[:, 2]
                        tz1 = (f[5] - ooP[:, 2]) * iiP[:, 2]
                        tn = np.maximum(
                            np.maximum(np.minimum(tx0, tx1),
                                       np.minimum(ty0, ty1)),
                            np.maximum(np.minimum(tz0, tz1), 0.001))
                        tf = np.minimum(
                            np.minimum(np.maximum(tx0, tx1),
                                       np.maximum(ty0, ty1)),
                            np.minimum(np.maximum(tz0, tz1),
                                       np.minimum(t_best, t_cap)))
                        hitb = (tn <= tf).any()
                    else:
                        with np.errstate(over="ignore"):
                            tn_ax, tf_ax = [], []
                            for ax in range(3):
                                cands = []
                                for b in (f[ax], f[3 + ax]):
                                    for ol in (o_lo[ax], o_hi[ax]):
                                        for il_ in (i_lo[ax], i_hi[ax]):
                                            cands.append((b - ol) * il_)
                                tn_ax.append(min(cands))
                                tf_ax.append(max(cands))
                            tn = max(max(tn_ax), 0.001)
                            tf = min(min(tf_ax), t_max)
                            hitb = tn <= tf
                    if leaf >= 0:
                        leaf_visits += 1
                        li = int(leaf)
                        trow = tris[li // block].reshape(block, 9)
                        for k in range(block):
                            v0 = trow[k, 0:3]
                            e1 = trow[k, 3:6]
                            e2 = trow[k, 6:9]
                            pv = np.cross(ddP, e2)
                            det = (e1 * pv).sum(1)
                            front = det > 0
                            invd = 1.0 / np.where(front, det, 1.0)
                            tv = ooP - v0
                            u = (tv * pv).sum(1) * invd
                            qv = np.cross(tv, e1)
                            v = (ddP * qv).sum(1) * invd
                            t = (e2 * qv).sum(1) * invd
                            h = (front & (u >= 0) & (v >= 0) & (u + v <= 1)
                                 & (t > 0.001) & (t < np.minimum(t_best, t_cap)))
                            t_best = np.where(h, t, t_best)
                        nxt = int(f[6])
                    else:
                        nxt = n_abs + 1 if hitb else int(f[6])
                node = nxt
            tot_rows += row_visits
            tot_nodes += node_visits
            tot_leaf += leaf_visits
        m = max(live_packs, 1)
        print(f"{mode}: rows/packet={tot_rows/m:.0f} nodes/packet={tot_nodes/m:.0f} "
              f"leaves/packet={tot_leaf/m:.0f} (live packets {live_packs})",
              flush=True)


if __name__ == "__main__":
    main()
