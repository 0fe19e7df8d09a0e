"""Size the destination-grouping (portal) design on real secondary
rays: per-ray node/leaf visits (the ideal), union-packet visits (the
status quo), and portals-per-ray at several subtree cut sizes (the
pair-expansion cost).  CPU host sim on the atrium stand-in.

    python experiments/portal_stats.py [detail]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def secondary_rays(glb_path, W=512, H=288):
    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.camera import Camera
    from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
    from vulkan_pathtracer_tpu.app.camera_path import orbit_path
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

    scene = gltf.load(glb_path)
    dev = build_device_scene(scene, max_leaf_size=8)
    cam = Camera(aspect_ratio=W / H)
    orbit_path(radius=4.5, height=2.2, center=(0, 1.2, 0)).apply(cam, 0.7)
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
    return dev, (np.asarray(new_o), np.asarray(new_d), np.asarray(alive))


def main():
    detail = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    glb = f"/tmp/atrium_{detail}.glb"
    if not os.path.exists(glb):
        from assets.procedural import make_atrium

        make_atrium(glb, detail=detail)
    dev, (oo, dd, al) = secondary_rays(glb)
    print(f"tris={dev.num_triangles} live={al.sum()}/{al.size}", flush=True)

    rows = np.asarray(dev.bvh_rows).reshape(dev.bvh_orders, -1, 128)
    fields0 = rows[0].reshape(-1, 8)
    nn_pad = fields0.shape[0]
    # Build per-octant field tables.
    ftab = [rows[o].reshape(-1, 8) for o in range(dev.bvh_orders)]
    inv = 1.0 / np.where(np.abs(dd) < 1e-20, 1e-20, dd)

    # ---- per-ray traversal stats on a sample ----
    rng = np.random.default_rng(0)
    live_idx = np.nonzero(al)[0]
    sample = rng.choice(live_idx, size=400, replace=False)
    tot_nodes = tot_leaves = 0
    for ri in sample:
        o1, d1, i1 = oo[ri], dd[ri], inv[ri]
        oct_ = int((d1[0] < 0) + 2 * (d1[1] < 0) + 4 * (d1[2] < 0))
        f = ftab[oct_]
        t_best = 1e4
        node = 0
        while node < nn_pad:
            tot_nodes += 1
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
                    tot_leaves += 1
                node = int(row[6])
            else:
                node = node + 1 if hit else int(row[6])
    m = len(sample)
    print(f"per-ray: nodes={tot_nodes/m:.1f} leaf-hits={tot_leaves/m:.1f}",
          flush=True)

    # ---- portals per ray at cut sizes (preorder subtree ranges) ----
    # Subtree size of node n (preorder) = skip(n) - n.  A cut at size S
    # marks portal nodes: size <= S and parent size > S.
    skip = fields0[:, 6].astype(np.int64)
    size = skip - np.arange(nn_pad)
    for S in (2048, 8192, 32768):
        # portals: nodes with size<=S whose parent has size>S. Compute
        # by preorder walk: a node is a portal iff size<=S and it is
        # not inside another portal.
        is_portal = np.zeros(nn_pad, bool)
        n = 0
        portals = []
        while n < nn_pad:
            if size[n] <= S:
                is_portal[n] = True
                portals.append(n)
                n = skip[n]
            else:
                n += 1
        portal_of = np.full(nn_pad, -1, np.int32)
        for pi, p in enumerate(portals):
            portal_of[p:skip[p]] = pi
        # per-ray portal count on the sample
        tot_p = 0
        maxp = 0
        for ri in sample:
            o1, d1, i1 = oo[ri], dd[ri], inv[ri]
            oct_ = int((d1[0] < 0) + 2 * (d1[1] < 0) + 4 * (d1[2] < 0))
            f = ftab[oct_]
            t_best = 1e4
            node = 0
            seen = set()
            while node < nn_pad:
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
                # NOTE: octant ordering permutes nodes, so portal ids
                # differ per octant; using octant-0 ranges on octant-o
                # tables is wrong in general — for STATISTICS we use
                # the ray's own octant table with octant-o ranges
                # derived identically (sizes are the same per octant).
                if hit and size[node] <= S and row[7] < 0:
                    seen.add(node)
                    node = int(skip[node])  # treat portal as opaque
                    continue
                if row[7] >= 0:
                    if hit and size[node] > 0:
                        seen.add(node)  # leaf outside any portal
                    node = int(row[6])
                else:
                    node = node + 1 if hit else int(row[6])
            tot_p += len(seen)
            maxp = max(maxp, len(seen))
        print(f"cut S={S}: portals={len(portals)} "
              f"avg/ray={tot_p/m:.2f} max/ray={maxp}", flush=True)


if __name__ == "__main__":
    main()
