"""Pallas packet BVH traversal kernel.

The XLA traversal (ops/traverse.py) is gather-bound: every ray fetches
its own node row per step.  TPUs have no per-lane program counters or
fast vector gathers, but they broadcast scalars to (8, 128) lanes for
free.  So this kernel flips the parallelism: a *packet* of B rays
shares ONE traversal cursor (a scalar in SMEM-land), and every visit
tests all B rays against the broadcast node AABB on the VPU:

  - grid = one step per ray packet;
  - the packet's direction-octant picks which of the 8 near-first
    skip-pointer linearizations to stage into VMEM (scalar-prefetch
    index map; consecutive packets with the same octant reuse the
    staged block without re-DMA);
  - node visit: 8 scalar VMEM reads (the packed node row) + a
    lane-parallel slab test + `any()` reduction; descend if any lane
    hit, else take the skip pointer — no stack, no gather;
  - leaf visit: the fixed-size-4 triangle block is read as 36 scalars
    and intersected against all lanes (Möller–Trumbore, backface cull)
    under a scalar branch.

Ordering only affects *efficiency*, never results: a packet whose rays
straddle octants still intersects everything (each lane keeps its own
t_best).  Rays should be packed coherently (primary rays are, by
image-tile construction) for the union-of-visits to stay near the
per-ray visit count.

VMEM budget: one octant's node block (Nn x 8 f32) + the full leaf
table (n_leaves x 36 f32) + ray/hit state. Scenes beyond the budget
fall back to the XLA path (see traverse.dispatch logic in
render/wavefront.py).

Semantics parity: identical MT + slab tests as ops/intersect.py /
ops/traverse.py — tmin 0.001, tmax 10000, miss t == 1e32
(ray_gen.rgen:38-50), backface culling via det > 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vulkan_pathtracer_tpu.ops.intersect import Hit, MISS_T, TMAX, TMIN

PACKET = 1024  # rays per packet (multiple of 128)
_LANE = 128


def _traverse_kernel(octant_ref, nodes_ref, meta_ref, tris_ref, rays_ref,
                     out_ref, *, n_nodes: int, block: int, tmin: float,
                     tmax: float, packet: int):
    del octant_ref  # consumed by the index map only
    sub = packet // _LANE

    def comp(c):
        return rays_ref[0, c, :].reshape(sub, _LANE)

    ox, oy, oz = comp(0), comp(1), comp(2)
    dx, dy, dz = comp(3), comp(4), comp(5)
    t_lane_max = comp(6)  # per-lane tmax (-1 for inactive lanes)

    eps = jnp.float32(1e-20)

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < eps,
                               jnp.where(d >= 0.0, eps, -eps), d)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    t0 = jnp.full((sub, _LANE), MISS_T, dtype=jnp.float32)
    tri0 = jnp.full((sub, _LANE), -1, dtype=jnp.int32)
    zero = jnp.zeros((sub, _LANE), dtype=jnp.float32)

    def cond(state):
        node = state[0]
        return node < n_nodes

    def body(state):
        node, t_best, tri_best, u_best, v_best = state

        bminx = nodes_ref[0, node, 0]
        bminy = nodes_ref[0, node, 1]
        bminz = nodes_ref[0, node, 2]
        bmaxx = nodes_ref[0, node, 3]
        bmaxy = nodes_ref[0, node, 4]
        bmaxz = nodes_ref[0, node, 5]
        skip_i = meta_ref[0, node, 0]
        leaf_i = meta_ref[0, node, 1]

        tx0 = (bminx - ox) * ix
        tx1 = (bmaxx - ox) * ix
        ty0 = (bminy - oy) * iy
        ty1 = (bmaxy - oy) * iy
        tz0 = (bminz - oz) * iz
        tz1 = (bmaxz - oz) * iz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.maximum(jnp.minimum(tz0, tz1), jnp.float32(tmin)),
        )
        t_limit = jnp.minimum(t_best, t_lane_max)
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.minimum(jnp.maximum(tz0, tz1), t_limit),
        )
        box_hit = tn <= tf
        any_hit = jnp.any(box_hit)
        is_leaf = leaf_i >= 0

        def leaf_case(args):
            t_best, tri_best, u_best, v_best = args
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
                t_lim = jnp.minimum(t_best, t_lane_max)
                hit = (
                    front & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                    & (t > tmin) & (t < t_lim) & box_hit
                )
                t_best = jnp.where(hit, t, t_best)
                tri_best = jnp.where(hit, leaf_i + k, tri_best)
                u_best = jnp.where(hit, u, u_best)
                v_best = jnp.where(hit, v, v_best)
            return t_best, tri_best, u_best, v_best

        do_leaf = jnp.logical_and(any_hit, is_leaf)
        t_best, tri_best, u_best, v_best = jax.lax.cond(
            do_leaf, leaf_case, lambda a: a,
            (t_best, tri_best, u_best, v_best),
        )

        descend = jnp.logical_and(any_hit, jnp.logical_not(is_leaf))
        next_node = jnp.where(descend, node + 1, skip_i)
        return next_node, t_best, tri_best, u_best, v_best

    node0 = jnp.int32(0)
    _, t_best, tri_best, u_best, v_best = jax.lax.while_loop(
        cond, body, (node0, t0, tri0, zero, zero)
    )

    out_ref[0, 0, :] = t_best.reshape(-1)
    out_ref[0, 1, :] = jax.lax.bitcast_convert_type(
        tri_best, jnp.float32
    ).reshape(-1)
    out_ref[0, 2, :] = u_best.reshape(-1)
    out_ref[0, 3, :] = v_best.reshape(-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _packet_traverse(nodes8, meta8, tris, rays, octants, *, interpret=False):
    """nodes8: (8, Nn, 8) f32; meta8: (8, Nn, 2) int32 (skip, leaf);
    tris: (n_leaves, block*9) f32; rays: (P, 8, PACKET) f32;
    octants: (P,) int32.  Returns (P, 4, PACKET) f32."""
    n_oct, n_nodes, _ = nodes8.shape
    n_leaves, row_w = tris.shape
    block = row_w // 9
    p = rays.shape[0]
    packet = rays.shape[2]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(p,),
        in_specs=[
            pl.BlockSpec(
                (1, n_nodes, 8),
                lambda i, octs: (octs[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_nodes, 2),
                lambda i, octs: (octs[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_leaves, row_w),
                lambda i, octs: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, packet),
                lambda i, octs: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, packet),
            lambda i, octs: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _traverse_kernel, n_nodes=n_nodes, block=block,
        tmin=TMIN, tmax=TMAX, packet=packet,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p, 4, packet), jnp.float32),
        interpret=interpret,
    )(octants, nodes8, meta8, tris, rays)


def pallas_closest_hit(scene, origin, direction, active=None,
                       interpret=False) -> Hit:
    """Drop-in closest-hit using the packet kernel.

    Pads the ray set to a PACKET multiple; inactive/padding lanes get
    per-lane tmax = -1 so they never hit (and never extend traversal).
    """
    n = origin.shape[0]
    n_nodes = scene.bvh_skip.shape[0] // scene.bvh_orders

    octant = (
        (direction[:, 0] < 0).astype(jnp.int32)
        + 2 * (direction[:, 1] < 0).astype(jnp.int32)
        + 4 * (direction[:, 2] < 0).astype(jnp.int32)
    )
    t_lane = jnp.full((n,), jnp.float32(TMAX))
    if active is not None:
        t_lane = jnp.where(active, t_lane, jnp.float32(-1.0))

    pad = (-n) % PACKET
    total = n + pad

    def pad1(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill)

    rays = jnp.stack(
        [
            pad1(origin[:, 0]), pad1(origin[:, 1]), pad1(origin[:, 2]),
            pad1(direction[:, 0]), pad1(direction[:, 1]),
            pad1(direction[:, 2]),
            pad1(t_lane, -1.0),
            jnp.zeros((total,), jnp.float32),
        ],
        axis=0,
    ).reshape(8, total // PACKET, PACKET).transpose(1, 0, 2)

    oct_padded = jnp.pad(octant, (0, pad))
    packet_oct = oct_padded.reshape(total // PACKET, PACKET)[:, 0]

    nodes8 = scene.bvh_packed.reshape(scene.bvh_orders, n_nodes, 8)
    meta8 = jax.lax.bitcast_convert_type(
        scene.bvh_packed_tail, jnp.int32
    ).reshape(scene.bvh_orders, n_nodes, 2)

    out = _packet_traverse(nodes8, meta8, scene.tri_blocks, rays,
                           packet_oct, interpret=interpret)
    out = out.transpose(1, 0, 2).reshape(4, total)[:, :n]
    t = out[0]
    tri = jax.lax.bitcast_convert_type(out[1], jnp.int32)
    return Hit(t=t, tri=tri, u=out[2], v=out[3])


def fits_vmem(scene, budget_bytes: int = 12 * 1024 * 1024) -> bool:
    """Whether one octant's nodes + the leaf table fit the VMEM budget."""
    if scene.bvh_packed is None or scene.tri_blocks is None:
        return False
    n_nodes = scene.bvh_packed.shape[0] // scene.bvh_orders
    node_bytes = n_nodes * 8 * 4
    tri_bytes = int(np.prod(scene.tri_blocks.shape)) * 4
    state = 8 * PACKET * 4 * 4
    return (node_bytes * 2 + tri_bytes + state) < budget_bytes
