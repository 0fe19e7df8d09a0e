"""Experiment: dense-row run kernel vs the round-1 packet kernel.

Measures Mrays/s on coherent primary rays for both kernels on the
headline columns scene (and a Sponza-scale variant).  Run on TPU:

    python experiments/dense_kernel.py [grid] [segments]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vkpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    from assets.procedural import make_columns
    from vulkan_pathtracer_tpu.app.camera_path import orbit_path
    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.camera import Camera
    from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
    from vulkan_pathtracer_tpu.ops.pallas_traverse import (
        dense_fits_vmem,
        fits_vmem,
        pallas_closest_hit,
        pallas_dense_closest_hit,
    )
    from vulkan_pathtracer_tpu.render.pipeline import generate_rays

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    segments = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    leaf = int(os.environ.get("LEAF", 8))

    path = f"/tmp/dense_cols_{grid}_{segments}.glb"
    if not os.path.exists(path):
        make_columns(path, grid=grid, segments=segments, n_materials=16)
    scene = gltf.load(path)
    dev = build_device_scene(scene, max_leaf_size=leaf)
    print(f"tris={dev.num_triangles} rows={dev.bvh_rows.shape} "
          f"leaf={leaf} dense_fits={dense_fits_vmem(dev)} "
          f"packet_fits={fits_vmem(dev)}", flush=True)

    cam = Camera(aspect_ratio=1920 / 1080)
    root_min = np.asarray(dev.bvh_packed[0, 0:3])
    root_max = np.asarray(dev.bvh_packed[0, 3:6])
    extent = float(np.max(root_max - root_min))
    center = (root_min + root_max) * 0.5
    orbit_path(radius=0.75 * extent, height=0.35 * extent,
               center=tuple(center)).apply(cam, 0.0)
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())
    o, d = generate_rays(pos, hor, ver, fwd, 1920, 1080)
    n = o.shape[0]
    if os.environ.get("TILE"):
        from vulkan_pathtracer_tpu.render.pipeline import _tile_order
        order, _ = _tile_order(1080, 1920)
        o = o[jnp.asarray(order)]
        d = d[jnp.asarray(order)]

    ref = None
    variants = []
    for pk in (1024, 2048):
        variants.append((f"dense pk={pk}",
                         lambda pk=pk: pallas_dense_closest_hit(
                             dev, o, d, packet=pk)))
    if fits_vmem(dev):
        variants.append(("packet(r1)",
                         lambda: pallas_closest_hit(dev, o, d)))

    for name, fn in variants:
        t0 = time.time()
        hit = fn()
        tsum = float(hit.t.sum())
        compile_s = time.time() - t0
        t_np = np.asarray(hit.t)
        if ref is None:
            ref = t_np
            ok = True
        else:
            ok = np.allclose(t_np, ref, rtol=1e-5, atol=1e-4)
        best = 9e9
        for _ in range(6):
            t0 = time.time()
            hit = fn()
            _ = float(hit.t.sum())
            best = min(best, time.time() - t0)
        print(f"{name}: correct={ok} {n / best / 1e6:.1f} Mrays/s "
              f"(compile {compile_s:.0f}s, tsum={tsum:.3e})", flush=True)


def count_iters():
    """Variant: report while-loop iterations (row-visits) per packet
    for the dense kernel and node-visits for the packet kernel, to
    measure chain advance per iteration."""
    from assets.procedural import make_columns
    from vulkan_pathtracer_tpu.app.camera_path import orbit_path
    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.camera import Camera
    from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
    from vulkan_pathtracer_tpu.render.pipeline import generate_rays
    import vulkan_pathtracer_tpu.ops.pallas_traverse as pt
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import functools

    grid = int(sys.argv[2]) if len(sys.argv) > 2 else 14
    segments = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    path = f"/tmp/dense_cols_{grid}_{segments}.glb"
    if not os.path.exists(path):
        make_columns(path, grid=grid, segments=segments, n_materials=16)
    scene = gltf.load(path)
    dev = build_device_scene(scene, max_leaf_size=int(os.environ.get("LEAF", 8)))

    cam = Camera(aspect_ratio=1920 / 1080)
    root_min = np.asarray(dev.bvh_packed[0, 0:3])
    root_max = np.asarray(dev.bvh_packed[0, 3:6])
    extent = float(np.max(root_max - root_min))
    center = (root_min + root_max) * 0.5
    orbit_path(radius=0.75 * extent, height=0.35 * extent,
               center=tuple(center)).apply(cam, 0.0)
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())
    o, d = generate_rays(pos, hor, ver, fwd, 1920, 1080)
    n = o.shape[0]

    # Hack: wrap the dense kernel body's while loop with an iteration
    # counter by monkey-patching state through an extra channel: easier
    # = emulate on host. Instead, run the traversal cursor walk in
    # NumPy over the dense rows to count row-visits and node-visits.
    nn_pad = (dev.bvh_rows.shape[0] // dev.bvh_orders) * 16
    rows = np.asarray(dev.bvh_rows).reshape(dev.bvh_orders, -1, 128)
    tris = np.asarray(dev.tri_blocks)
    block = tris.shape[1] // 9

    o_np = np.asarray(o)
    d_np = np.asarray(d)
    PK = 2048
    octs = ((d_np[:, 0] < 0).astype(int) + 2 * (d_np[:, 1] < 0).astype(int)
            + 4 * (d_np[:, 2] < 0).astype(int))
    rng = np.random.default_rng(0)
    packs = rng.choice(n // PK, size=12, replace=False)
    inv = 1.0 / np.where(np.abs(d_np) < 1e-20, 1e-20, d_np)

    tot_rows = tot_nodes = tot_leaf = 0
    for p in packs:
        sl = slice(p * PK, (p + 1) * PK)
        oo, dd, ii = o_np[sl], d_np[sl], inv[sl]
        oct_ = octs[p * PK]
        R = rows[oct_]
        fields = R.reshape(-1, 8)  # (nn_pad, 8)
        t_best = np.full(PK, 1e32, np.float32)
        node = 0
        row_visits = node_visits = leaf_visits = 0
        last_row = -1
        while node < nn_pad:
            r = node // 16
            if r != last_row:
                pass
            row_visits += 1
            # chain through the row like the kernel
            nxt = node
            for j in range(16):
                n_abs = r * 16 + j
                if nxt != n_abs:
                    continue
                node_visits += 1
                f = fields[n_abs]
                leaf = f[7]
                tx0 = (f[0] - oo[:, 0]) * ii[:, 0]
                tx1 = (f[3] - oo[:, 0]) * ii[:, 0]
                ty0 = (f[1] - oo[:, 1]) * ii[:, 1]
                ty1 = (f[4] - oo[:, 1]) * ii[:, 1]
                tz0 = (f[2] - oo[:, 2]) * ii[:, 2]
                tz1 = (f[5] - oo[:, 2]) * ii[:, 2]
                tn = np.maximum(np.maximum(np.minimum(tx0, tx1), np.minimum(ty0, ty1)),
                                np.maximum(np.minimum(tz0, tz1), 0.001))
                tf = np.minimum(np.minimum(np.maximum(tx0, tx1), np.maximum(ty0, ty1)),
                                np.minimum(np.maximum(tz0, tz1), np.minimum(t_best, 1e4)))
                hit = (tn <= tf).any()
                if leaf >= 0:
                    leaf_visits += 1
                    li = int(leaf)
                    trow = tris[li // block].reshape(block, 9)
                    for k in range(block):
                        v0 = trow[k, 0:3]; e1 = trow[k, 3:6]; e2 = trow[k, 6:9]
                        pvec = np.cross(dd, e2)
                        det = (e1 * pvec).sum(1)
                        front = det > 0
                        invd = 1.0 / np.where(front, det, 1.0)
                        tv = oo - v0
                        u = (tv * pvec).sum(1) * invd
                        qv = np.cross(tv, e1)
                        v = (dd * qv).sum(1) * invd
                        t = (e2 * qv).sum(1) * invd
                        h = front & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0.001) & (t < np.minimum(t_best, 1e4))
                        t_best = np.where(h, t, t_best)
                    nxt = int(f[6])
                else:
                    nxt = n_abs + 1 if hit else int(f[6])
            node = nxt
        tot_rows += row_visits
        tot_nodes += node_visits
        tot_leaf += leaf_visits
    m = len(packs)
    print(f"rows/packet={tot_rows/m:.0f} node-visits/packet={tot_nodes/m:.0f} "
          f"leaf-visits/packet={tot_leaf/m:.0f} advance/row={tot_nodes/tot_rows:.2f}")





def count_ia():
    """IA (packet-interval) traversal visit counts vs exact-union, on
    host.  Measures the visit/leaf inflation the vector-walk IA kernel
    would pay for dropping per-ray slab tests."""
    from assets.procedural import make_columns
    from vulkan_pathtracer_tpu.app.camera_path import orbit_path
    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.camera import Camera
    from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
    from vulkan_pathtracer_tpu.render.pipeline import generate_rays

    grid = int(sys.argv[2]) if len(sys.argv) > 2 else 14
    segments = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    path = f"/tmp/dense_cols_{grid}_{segments}.glb"
    if not os.path.exists(path):
        make_columns(path, grid=grid, segments=segments, n_materials=16)
    scene = gltf.load(path)
    dev = build_device_scene(scene, max_leaf_size=int(os.environ.get("LEAF", 8)))

    cam = Camera(aspect_ratio=1920 / 1080)
    root_min = np.asarray(dev.bvh_packed[0, 0:3])
    root_max = np.asarray(dev.bvh_packed[0, 3:6])
    extent = float(np.max(root_max - root_min))
    center = (root_min + root_max) * 0.5
    orbit_path(radius=0.75 * extent, height=0.35 * extent,
               center=tuple(center)).apply(cam, 0.0)
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())
    o, d = generate_rays(pos, hor, ver, fwd, 1920, 1080)
    n = o.shape[0]

    rows = np.asarray(dev.bvh_rows).reshape(dev.bvh_orders, -1, 128)
    tris = np.asarray(dev.tri_blocks)
    block = tris.shape[1] // 9
    nn_pad = rows.shape[1] * 16

    o_np = np.asarray(o)
    d_np = np.asarray(d)
    PK = int(os.environ.get("PK", 2048))
    th = int(os.environ.get("TILE_H", 0))
    if th:
        tw = PK // th
        H, W = 1080, 1920
        idx = np.arange(H * W).reshape(H, W)
        ph, pw = H // th, W // tw
        idx = idx[:ph * th, :pw * tw].reshape(ph, th, pw, tw)
        order = idx.transpose(0, 2, 1, 3).reshape(-1)
        o_np = o_np[order]
        d_np = d_np[order]
        n = order.shape[0]
    octs = ((d_np[:, 0] < 0).astype(int) + 2 * (d_np[:, 1] < 0).astype(int)
            + 4 * (d_np[:, 2] < 0).astype(int))
    rng = np.random.default_rng(0)
    packs = rng.choice(n // PK, size=12, replace=False)
    inv = 1.0 / np.where(np.abs(d_np) < 1e-20, 1e-20, d_np)

    for mode in ("exact", "ia"):
        tot_rows = tot_nodes = tot_leaf = 0
        for p in packs:
            sl = slice(p * PK, (p + 1) * PK)
            oo, dd, ii = o_np[sl], d_np[sl], inv[sl]
            oct_ = octs[p * PK]
            fields = rows[oct_].reshape(-1, 8)
            t_best = np.full(PK, 1e32, np.float32)
            # Packet intervals (recomputed per row in 'ia' for t_max).
            o_lo, o_hi = oo.min(0), oo.max(0)
            i_lo, i_hi = ii.min(0), ii.max(0)
            node = 0
            row_visits = node_visits = leaf_visits = 0
            while node < nn_pad:
                r = node // 16
                row_visits += 1
                t_max = float(np.minimum(t_best, 1e4).max())
                nxt = node
                for j in range(16):
                    n_abs = r * 16 + j
                    if nxt != n_abs:
                        continue
                    node_visits += 1
                    f = fields[n_abs]
                    leaf = f[7]
                    if mode == "exact":
                        tx0 = (f[0] - oo[:, 0]) * ii[:, 0]
                        tx1 = (f[3] - oo[:, 0]) * ii[:, 0]
                        ty0 = (f[1] - oo[:, 1]) * ii[:, 1]
                        ty1 = (f[4] - oo[:, 1]) * ii[:, 1]
                        tz0 = (f[2] - oo[:, 2]) * ii[:, 2]
                        tz1 = (f[5] - oo[:, 2]) * ii[:, 2]
                        tn = np.maximum(np.maximum(np.minimum(tx0, tx1), np.minimum(ty0, ty1)),
                                        np.maximum(np.minimum(tz0, tz1), 0.001))
                        tf = np.minimum(np.minimum(np.maximum(tx0, tx1), np.maximum(ty0, ty1)),
                                        np.minimum(np.maximum(tz0, tz1), np.minimum(t_best, 1e4)))
                        hit = (tn <= tf).any()
                    else:
                        # interval slab: per-axis min/max over the 4
                        # products of (b - o_interval) * i_interval
                        tn_ax = []
                        tf_ax = []
                        for ax in range(3):
                            cands0 = [(f[ax] - o_lo[ax]) * i_lo[ax],
                                      (f[ax] - o_lo[ax]) * i_hi[ax],
                                      (f[ax] - o_hi[ax]) * i_lo[ax],
                                      (f[ax] - o_hi[ax]) * i_hi[ax]]
                            cands1 = [(f[3 + ax] - o_lo[ax]) * i_lo[ax],
                                      (f[3 + ax] - o_lo[ax]) * i_hi[ax],
                                      (f[3 + ax] - o_hi[ax]) * i_lo[ax],
                                      (f[3 + ax] - o_hi[ax]) * i_hi[ax]]
                            lo = min(min(cands0), min(cands1))
                            hi = max(max(cands0), max(cands1))
                            tn_ax.append(lo)
                            tf_ax.append(hi)
                        tn = max(max(tn_ax), 0.001)
                        tf = min(min(tf_ax), t_max)
                        hit = tn <= tf
                    if leaf >= 0:
                        leaf_visits += 1
                        li = int(leaf)
                        trow = tris[li // block].reshape(block, 9)
                        for k in range(block):
                            v0 = trow[k, 0:3]; e1 = trow[k, 3:6]; e2 = trow[k, 6:9]
                            pvec = np.cross(dd, e2)
                            det = (e1 * pvec).sum(1)
                            front = det > 0
                            invd = 1.0 / np.where(front, det, 1.0)
                            tv = oo - v0
                            u = (tv * pvec).sum(1) * invd
                            qv = np.cross(tv, e1)
                            v = (dd * qv).sum(1) * invd
                            t = (e2 * qv).sum(1) * invd
                            h = front & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0.001) & (t < np.minimum(t_best, 1e4))
                            t_best = np.where(h, t, t_best)
                        nxt = int(f[6])
                    else:
                        nxt = n_abs + 1 if hit else int(f[6])
                node = nxt
            tot_rows += row_visits
            tot_nodes += node_visits
            tot_leaf += leaf_visits
        m = len(packs)
        print(f"{mode}: rows/packet={tot_rows/m:.0f} nodes/packet={tot_nodes/m:.0f} "
              f"leaves/packet={tot_leaf/m:.0f}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "count":
        count_iters()
    elif len(sys.argv) > 1 and sys.argv[1] == "ia":
        count_ia()
    else:
        main()
