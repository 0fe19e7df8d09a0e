"""Experiment: C-way packet interleaving in the traversal kernel.

The single-cursor kernel is latency-bound: each while iteration is a
serial chain (scalar node loads -> vector slab -> cross-lane reduce ->
scalar branch).  Interleaving C independent packet cursors in one
kernel body lets the VLIW scheduler overlap chains.  Run on TPU:

    python experiments/interleave_kernel.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/vkpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

MISS = np.float32(1e32)


def make_kernel(n_nodes, block, packet, C):
    sub = packet // 128

    def kernel(octant_ref, nodes_ref, meta_ref, tris_ref, rays_ref, out_ref):
        comps = []
        for c in range(C):
            comps.append([rays_ref[0, c, i, :].reshape(sub, 128) for i in range(8)])

        eps = jnp.float32(1e-20)

        def sinv(d):
            return 1.0 / jnp.where(jnp.abs(d) < eps,
                                   jnp.where(d >= 0, eps, -eps), d)

        inv = [[sinv(comps[c][3]), sinv(comps[c][4]), sinv(comps[c][5])]
               for c in range(C)]

        t0 = jnp.full((sub, 128), MISS)
        tri0 = jnp.full((sub, 128), -1, jnp.int32)
        zero = jnp.zeros((sub, 128), jnp.float32)

        def cond(state):
            nodes = state[0]
            alive = nodes[0] < n_nodes
            for c in range(1, C):
                alive = jnp.logical_or(alive, nodes[c] < n_nodes)
            return alive

        def body(state):
            nodes, tb, trib, ub, vb = state
            new_nodes = []
            tb = list(tb); trib = list(trib); ub = list(ub); vb = list(vb)
            for c in range(C):
                node = nodes[c]
                nd = jnp.minimum(node, n_nodes - 1)
                live = node < n_nodes
                b = [nodes_ref[0, nd, i] for i in range(6)]
                skip_i = meta_ref[0, nd, 0]
                leaf_i = meta_ref[0, nd, 1]
                ox, oy, oz, dx, dy, dz, tl, _ = comps[c]
                ix, iy, iz = inv[c]
                tx0 = (b[0] - ox) * ix
                tx1 = (b[3] - ox) * ix
                ty0 = (b[1] - oy) * iy
                ty1 = (b[4] - oy) * iy
                tz0 = (b[2] - oz) * iz
                tz1 = (b[5] - oz) * iz
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                    jnp.maximum(jnp.minimum(tz0, tz1), jnp.float32(0.001)))
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                    jnp.minimum(jnp.maximum(tz0, tz1),
                                jnp.minimum(tb[c], tl)))
                box_hit = tn <= tf
                any_hit = jnp.logical_and(jnp.any(box_hit), live)
                is_leaf = leaf_i >= 0

                def leaf_case(args, c=c, leaf_i=leaf_i, box_hit=box_hit):
                    t_best, tri_best, u_best, v_best = args
                    ox, oy, oz, dx, dy, dz, tl, _ = comps[c]
                    row = leaf_i // block
                    for k in range(block):
                        base = k * 9
                        v0x = tris_ref[row, base + 0]
                        v0y = tris_ref[row, base + 1]
                        v0z = tris_ref[row, base + 2]
                        e1x = tris_ref[row, base + 3]
                        e1y = tris_ref[row, base + 4]
                        e1z = tris_ref[row, base + 5]
                        e2x = tris_ref[row, base + 6]
                        e2y = tris_ref[row, base + 7]
                        e2z = tris_ref[row, base + 8]
                        px = dy * e2z - dz * e2y
                        py = dz * e2x - dx * e2z
                        pz = dx * e2y - dy * e2x
                        det = e1x * px + e1y * py + e1z * pz
                        front = det > 0.0
                        inv_det = 1.0 / jnp.where(front, det, 1.0)
                        tx = ox - v0x
                        ty = oy - v0y
                        tz = oz - v0z
                        u = (tx * px + ty * py + tz * pz) * inv_det
                        qx = ty * e1z - tz * e1y
                        qy = tz * e1x - tx * e1z
                        qz = tx * e1y - ty * e1x
                        v = (dx * qx + dy * qy + dz * qz) * inv_det
                        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                        t_lim = jnp.minimum(t_best, tl)
                        hit = (front & (u >= 0.0) & (v >= 0.0)
                               & (u + v <= 1.0) & (t > 0.001)
                               & (t < t_lim) & box_hit)
                        t_best = jnp.where(hit, t, t_best)
                        tri_best = jnp.where(hit, leaf_i + k, tri_best)
                        u_best = jnp.where(hit, u, u_best)
                        v_best = jnp.where(hit, v, v_best)
                    return t_best, tri_best, u_best, v_best

                do_leaf = jnp.logical_and(any_hit, is_leaf)
                tb[c], trib[c], ub[c], vb[c] = jax.lax.cond(
                    do_leaf, leaf_case, lambda a: a,
                    (tb[c], trib[c], ub[c], vb[c]))
                descend = jnp.logical_and(any_hit, jnp.logical_not(is_leaf))
                nxt = jnp.where(descend, node + 1, skip_i)
                new_nodes.append(jnp.where(live, nxt, node))
            return (tuple(new_nodes), tuple(tb), tuple(trib), tuple(ub),
                    tuple(vb))

        init = (tuple(jnp.int32(0) for _ in range(C)),
                tuple(t0 for _ in range(C)),
                tuple(tri0 for _ in range(C)),
                tuple(zero for _ in range(C)),
                tuple(zero for _ in range(C)))
        _, tb, trib, ub, vb = jax.lax.while_loop(cond, body, init)
        for c in range(C):
            out_ref[0, c, 0, :] = tb[c].reshape(-1)
            out_ref[0, c, 1, :] = jax.lax.bitcast_convert_type(
                trib[c], jnp.float32).reshape(-1)
            out_ref[0, c, 2, :] = ub[c].reshape(-1)
            out_ref[0, c, 3, :] = vb[c].reshape(-1)

    return kernel


def traverse_c(nodes8, meta8, tris, rays, octants, C):
    n_oct, n_nodes, _ = nodes8.shape
    n_leaves, row_w = tris.shape
    p = rays.shape[0]  # packet groups
    packet = rays.shape[3]
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(p,),
        in_specs=[
            pl.BlockSpec((1, n_nodes, 8), lambda i, octs: (octs[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_nodes, 2), lambda i, octs: (octs[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_leaves, row_w), lambda i, octs: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 8, packet),
                         lambda i, octs: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, 4, packet),
                               lambda i, octs: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM))
    kern = make_kernel(n_nodes, row_w // 9, packet, C)
    return pl.pallas_call(
        kern, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((p, C, 4, packet), jnp.float32),
    )(octants, nodes8, meta8, tris, rays)


def main():
    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
    from vulkan_pathtracer_tpu.models.camera import Camera
    from vulkan_pathtracer_tpu.app.camera_path import orbit_path
    from vulkan_pathtracer_tpu.render.pipeline import generate_rays
    from vulkan_pathtracer_tpu.ops.pallas_traverse import pallas_closest_hit
    from assets.procedural import make_columns

    path = "/tmp/bench_cols_small.glb"
    if not os.path.exists(path):
        make_columns(path, grid=8, segments=8, n_materials=16)
    scene = gltf.load(path)
    dev = build_device_scene(scene)
    cam = Camera(aspect_ratio=1920 / 1080)
    orbit_path(radius=8.0, height=4.0).apply(cam, 0.0)
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())
    o, d = generate_rays(pos, hor, ver, fwd, 1920, 1080)
    n = o.shape[0]

    n_nodes = dev.bvh_packed.shape[0] // 8
    nodes8 = dev.bvh_packed.reshape(8, n_nodes, 8)
    meta8 = jax.lax.bitcast_convert_type(
        dev.bvh_packed_tail, jnp.int32).reshape(8, n_nodes, 2)
    octant = ((d[:, 0] < 0).astype(jnp.int32)
              + 2 * (d[:, 1] < 0).astype(jnp.int32)
              + 4 * (d[:, 2] < 0).astype(jnp.int32))

    ref = pallas_closest_hit(dev, o, d)
    t_ref = np.asarray(ref.t)

    PK = 1024
    for C in (1, 2, 4):
        group = C * PK
        pad = (-n) % group
        total = n + pad

        def pad1(x, f=0.0):
            return jnp.pad(x, (0, pad), constant_values=f)

        rays = jnp.stack(
            [pad1(o[:, 0]), pad1(o[:, 1]), pad1(o[:, 2]),
             pad1(d[:, 0]), pad1(d[:, 1]), pad1(d[:, 2]),
             pad1(jnp.full((n,), 1e4, jnp.float32), -1.0),
             jnp.zeros((total,), jnp.float32)], 0,
        ).reshape(8, total // group, C, PK).transpose(1, 2, 0, 3)
        po = jnp.pad(octant, (0, pad)).reshape(total // group, group)[:, 0]

        out = traverse_c(nodes8, meta8, dev.tri_blocks, rays, po, C)
        t_got = np.asarray(out[:, :, 0, :]).reshape(-1)[:n]
        ok = np.allclose(t_got, t_ref, rtol=1e-5, atol=1e-4)
        best = 9e9
        for r in range(6):
            t0 = time.time()
            out = traverse_c(nodes8, meta8, dev.tri_blocks, rays, po, C)
            _ = float(out[:, :, 0, :].sum())
            best = min(best, time.time() - t0)
        print(f"C={C}: correct={ok} {n/best/1e6:.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
