"""Pallas packet BVH traversal kernel.

The XLA traversal (ops/traverse.py) is gather-bound: every ray fetches
its own node row per step.  TPUs have no per-lane program counters or
fast vector gathers, but they broadcast scalars to (8, 128) lanes for
free.  So this kernel flips the parallelism: a *packet* of B rays
shares ONE traversal cursor, and every visit tests all B rays against
the broadcast node AABB on the VPU:

  - grid = one step per packet *group* (C packets interleaved — the
    per-packet while chain is latency-bound: scalar node loads ->
    vector slab -> cross-lane reduce -> scalar branch; C independent
    cursors per body let the VLIW scheduler overlap the chains);
  - the group's direction-octant picks which of the 8 near-first
    skip-pointer linearizations to stage into VMEM (scalar-prefetch
    index map; consecutive groups with the same octant reuse the
    staged block without re-DMA);
  - node visit: 8 scalar VMEM reads (packed node row + int meta) + a
    lane-parallel slab test + `any()` reduction; descend if any lane
    hit, else take the skip pointer — no stack, no gather;
  - leaf visit: the fixed-size-4 triangle block is read as 36 scalars
    and intersected against all lanes (Möller–Trumbore, backface cull)
    under a scalar branch.

**VMEM layout**: Mosaic scalar loads need STATIC lane indices, so the
node table is (Nn, 8) f32 rows — dynamic node index on the sublane
dim, static field index on the lane dim — which the (8,128) tiling
pads to 512B/node.  skip/leaf live in the same row as FLOAT-VALUED
ints (exact below 2^24) so no second table is staged.  The leaf table
is (n_leaves, block*9) with the same padding.  fits_vmem() accounts
for the padded sizes against the raised scoped-VMEM limit (v5e has
128MB; the 16MB default is overridden per kernel) — with leaf-14
blocks the ceiling is ~550k triangles (one octant staged, double
buffered); beyond that the dense-row kernel's staged mode carries to
~1M+ and the XLA path takes over after that.  This kernel now
dispatches BOTH wavefront phases (phase-tuned packet sizes) and
decodes two-level instanced leaves (object-space packet transform).

Ordering only affects *efficiency*, never results: a packet whose rays
straddle octants still intersects everything (each lane keeps its own
t_best).  Rays should be packed coherently (primary rays are, by
image-tile construction; bounce rays get the octant+Morton sort in
render/wavefront.py).

Semantics parity: identical MT + slab tests as ops/intersect.py /
ops/traverse.py — tmin 0.001, tmax 10000, miss t == 1e32
(ray_gen.rgen:38-50), backface culling via det > 0.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vulkan_pathtracer_tpu.ops.intersect import Hit, MISS_T, TMAX, TMIN


def vmem_clamp(need: int) -> int:
    """Scoped-VMEM budget for a pallas call: clamp(need, floor, cap).

    VKPT_VMEM_FLOOR_MB (16) / VKPT_VMEM_CAP_MB (120) expose the clamp
    for the round-5 VMEM-pressure audit (VERDICT r4 item 2): the floor
    is MARGIN above the kernel's static need — shrinking it hands VMEM
    back to the surrounding chunked program (the quad_hbm 12% win came
    from exactly that), raising it gives Mosaic more room to
    double-buffer.  Never clamps below need (the kernel would fail to
    compile).
    """
    floor = int(os.environ.get("VKPT_VMEM_FLOOR_MB", "16")) * 1024 * 1024
    cap = int(os.environ.get("VKPT_VMEM_CAP_MB", "120")) * 1024 * 1024
    return min(max(need, floor), max(cap, need))


PACKET = int(os.environ.get("VKPT_PACKET", 2048))  # rays/packet (x128)
INTERLEAVE = 1  # packets per kernel body (C): measured flat in C on
# uncontended runs (8.8-9.1 Mrays/s for C in {1,2,4}); keep the
# simplest kernel
_LANE = 128


def _make_kernel(n_nodes: int, block: int, packet: int, C: int,
                 tmin: float, leaf_gate: bool = True,
                 instanced: bool = False, mb_bits: int = 0):
    sub = packet // _LANE

    def kernel(octant_ref, nodes_ref, tris_ref, *rest):
        if instanced:
            inst_ref, rays_ref, out_ref = rest
        else:
            inst_ref = None
            rays_ref, out_ref = rest

        comps = []
        for c in range(C):
            comps.append(
                [rays_ref[0, c, i, :].reshape(sub, _LANE) for i in range(12)]
            )

        eps = jnp.float32(1e-20)

        def sinv(d):
            return 1.0 / jnp.where(jnp.abs(d) < eps,
                                   jnp.where(d >= 0, eps, -eps), d)

        inv = [[sinv(comps[c][3]), sinv(comps[c][4]), sinv(comps[c][5])]
               for c in range(C)]
        # Hoisted per-ray slab terms: t_plane = b * inv - o*inv (one
        # fma per plane instead of sub+mul).
        oinv = [[comps[c][0] * inv[c][0],
                 comps[c][1] * inv[c][1],
                 comps[c][2] * inv[c][2]] for c in range(C)]
        # Channel 11: per-lane CLOSED lower bound t_near (0 = off).
        # Windowed-cascade dispatch restricts each pass to a t-slab
        # [t_near, t_far); slab tn includes it and MT accepts t >=
        # t_near, so window passes tile [tmin, inf) exactly.
        tnears = [jnp.maximum(comps[c][11], jnp.float32(tmin))
                  for c in range(C)]

        # Seeded initial state (channels 7-10: t, bitcast tri, u, v) —
        # a valid prior hit tightens t_best from the first visit.
        t0s = [comps[c][7] for c in range(C)]
        tri0s = [jax.lax.bitcast_convert_type(comps[c][8], jnp.int32)
                 for c in range(C)]
        u0s = [comps[c][9] for c in range(C)]
        v0s = [comps[c][10] for c in range(C)]

        def cond(state):
            nodes = state[0]
            alive = nodes[0] < n_nodes
            for c in range(1, C):
                alive = jnp.logical_or(alive, nodes[c] < n_nodes)
            return alive

        def body(state):
            nodes, tb, trib, ub, vb = state
            new_nodes = []
            tb = list(tb)
            trib = list(trib)
            ub = list(ub)
            vb = list(vb)
            for c in range(C):
                node = nodes[c]
                nd = jnp.minimum(node, n_nodes - 1)
                live = node < n_nodes
                b = [nodes_ref[0, nd, i] for i in range(6)]
                skip_i = nodes_ref[0, nd, 6].astype(jnp.int32)
                leaf_f = nodes_ref[0, nd, 7]
                leaf_i = leaf_f.astype(jnp.int32)
                ox, oy, oz, dx, dy, dz, tl = comps[c][:7]
                ix, iy, iz = inv[c]
                oxi, oyi, ozi = oinv[c]
                tx0 = b[0] * ix - oxi
                tx1 = b[3] * ix - oxi
                ty0 = b[1] * iy - oyi
                ty1 = b[4] * iy - oyi
                tz0 = b[2] * iz - ozi
                tz1 = b[5] * iz - ozi
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1),
                                jnp.minimum(ty0, ty1)),
                    jnp.maximum(jnp.minimum(tz0, tz1), tnears[c]),
                )
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1),
                                jnp.maximum(ty0, ty1)),
                    jnp.minimum(jnp.maximum(tz0, tz1),
                                jnp.minimum(tb[c], tl)),
                )
                box_hit = tn <= tf
                is_leaf = leaf_f >= 0.0

                def leaf_case(args, c=c, leaf_i=leaf_i, box_hit=box_hit):
                    # Leaf MT is gated per vreg-sized SUBLANE GROUP on
                    # the node visit's box_hit: after the bounce sort,
                    # the ~dozen rays that want a given leaf are
                    # contiguous, so usually one (8, 128) group of the
                    # packet carries all hits and the others skip their
                    # MT entirely (cross-lane sums pipeline and
                    # lax.cond is ~free per experiments/mosaic_costs).
                    # Skipping a no-box-hit group is exact: a triangle
                    # hit with t in (tmin, min(t_best, tmax)) implies
                    # its leaf AABB passes the slab test under the SAME
                    # t_lim bound.  Within a gated group the MT updates
                    # stay unmasked (any in-range MT hit is a true
                    # candidate).
                    t_best, tri_best, u_best, v_best = args
                    ox, oy, oz, dx, dy, dz, tl = comps[c][:7]
                    if instanced:
                        # Packed leaf: (inst << mb_bits | global mesh
                        # block).  Transform the packet into object
                        # space (world t preserved: the object-space
                        # direction stays unnormalized); cull on world
                        # winding via det_sign (same contract as the
                        # dense kernel, instanced_scene.py).
                        inst = leaf_i >> mb_bits
                        row = leaf_i & ((1 << mb_bits) - 1)
                        m = [inst_ref[inst, f] for f in range(13)]
                        det_sign = m[12]
                        tri_base = leaf_i * block
                    else:
                        row = leaf_i // block
                        m = None
                        det_sign = None
                        tri_base = leaf_i

                    def mt_group(sl, args):
                        t_best, tri_best, u_best, v_best = args
                        oxg, oyg, ozg = ox[sl], oy[sl], oz[sl]
                        dxg, dyg, dzg = dx[sl], dy[sl], dz[sl]
                        tlg = tl[sl]
                        tng = tnears[c][sl]
                        if instanced:
                            nox = m[0] * oxg + m[1] * oyg + m[2] * ozg \
                                + m[9]
                            noy = m[3] * oxg + m[4] * oyg + m[5] * ozg \
                                + m[10]
                            noz = m[6] * oxg + m[7] * oyg + m[8] * ozg \
                                + m[11]
                            ndx = m[0] * dxg + m[1] * dyg + m[2] * dzg
                            ndy = m[3] * dxg + m[4] * dyg + m[5] * dzg
                            ndz = m[6] * dxg + m[7] * dyg + m[8] * dzg
                            oxg, oyg, ozg = nox, noy, noz
                            dxg, dyg, dzg = ndx, ndy, ndz
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
                            px = dyg * e2z - dzg * e2y
                            py = dzg * e2x - dxg * e2z
                            pz = dxg * e2y - dyg * e2x
                            det = e1x * px + e1y * py + e1z * pz
                            if det_sign is not None:
                                front = det * det_sign > 0.0
                            else:
                                front = det > 0.0
                            inv_det = 1.0 / jnp.where(front, det, 1.0)
                            tx = oxg - v0x
                            ty = oyg - v0y
                            tz = ozg - v0z
                            u = (tx * px + ty * py + tz * pz) * inv_det
                            qx = ty * e1z - tz * e1y
                            qy = tz * e1x - tx * e1z
                            qz = tx * e1y - ty * e1x
                            v = (dxg * qx + dyg * qy + dzg * qz) * inv_det
                            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                            t_lim = jnp.minimum(t_best, tlg)
                            hit = (front & (u >= 0.0) & (v >= 0.0)
                                   & (u + v <= 1.0) & (t > tmin)
                                   & (t >= tng) & (t < t_lim))
                            t_best = jnp.where(hit, t, t_best)
                            tri_best = jnp.where(hit, tri_base + k,
                                                 tri_best)
                            u_best = jnp.where(hit, u, u_best)
                            v_best = jnp.where(hit, v, v_best)
                        return t_best, tri_best, u_best, v_best

                    gsub = 8  # one (8, 128) vreg per gated group
                    if not leaf_gate or sub <= gsub:
                        return mt_group(slice(None), args)
                    outs = []
                    # Partial tail group when sub % 8 != 0 (VKPT_PACKET
                    # can be any multiple of 128, e.g. 2560 -> sub=20).
                    for g0 in range(0, sub, gsub):
                        sl = slice(g0, min(g0 + gsub, sub))
                        any_g = jnp.sum(
                            jnp.where(box_hit[sl], 1.0, 0.0)
                        ) > 0.0
                        outs.append(jax.lax.cond(
                            any_g,
                            lambda a, sl=sl: mt_group(sl, a),
                            lambda a: a,
                            (t_best[sl], tri_best[sl], u_best[sl],
                             v_best[sl]),
                        ))
                    return tuple(
                        jnp.concatenate([o[i] for o in outs], axis=0)
                        for i in range(4)
                    )

                # Leaf visits never need the vector->scalar `any()`
                # sync: their successor is always the skip pointer, and
                # box_hit masks the MT updates on the vector side.
                # Only internal nodes pay the reduction (to decide
                # descend-vs-skip), halving the serial sync chain.
                tb[c], trib[c], ub[c], vb[c] = jax.lax.cond(
                    jnp.logical_and(is_leaf, live), leaf_case,
                    lambda a: a, (tb[c], trib[c], ub[c], vb[c]),
                )

                def next_internal(box_hit=box_hit, node=node,
                                  skip_i=skip_i):
                    return jnp.where(jnp.any(box_hit), node + 1, skip_i)

                nxt = jax.lax.cond(
                    is_leaf, lambda skip_i=skip_i: skip_i, next_internal
                )
                new_nodes.append(jnp.where(live, nxt, node))
            return (tuple(new_nodes), tuple(tb), tuple(trib), tuple(ub),
                    tuple(vb))

        init = (tuple(jnp.int32(0) for _ in range(C)),
                tuple(t0s), tuple(tri0s), tuple(u0s), tuple(v0s))
        _, tb, trib, ub, vb = jax.lax.while_loop(cond, body, init)
        for c in range(C):
            out_ref[0, c, 0, :] = tb[c].reshape(-1)
            out_ref[0, c, 1, :] = jax.lax.bitcast_convert_type(
                trib[c], jnp.float32
            ).reshape(-1)
            out_ref[0, c, 2, :] = ub[c].reshape(-1)
            out_ref[0, c, 3, :] = vb[c].reshape(-1)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "leaf_gate",
                                             "mb_bits"))
def _packet_traverse(nodes8, tris, rays, octants, inst_inv=None, *,
                     interpret=False, leaf_gate=True, mb_bits=0):
    """nodes8: (8, Nn, 8) f32 (bmin|bmax|skip|leaf as float values);
    tris: (n_leaves, block*9) f32; rays: (G, C, 12, PACKET) f32;
    octants: (G,) int32; inst_inv: optional (I, 16) instance inverse
    transforms (two-level scenes).  Returns (G, C, 4, PACKET) f32."""
    _, n_nodes, _ = nodes8.shape
    n_leaves, row_w = tris.shape
    block = row_w // 9
    g, C, _, packet = rays.shape
    instanced = inst_inv is not None

    in_specs = [
        pl.BlockSpec((1, n_nodes, 8), lambda i, octs: (octs[i], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_leaves, row_w), lambda i, octs: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [octants, nodes8, tris]
    if instanced:
        in_specs.append(
            pl.BlockSpec(inst_inv.shape, lambda i, octs: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(inst_inv)
    in_specs.append(
        pl.BlockSpec((1, C, 12, packet), lambda i, octs: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    args.append(rays)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, C, 4, packet),
                               lambda i, octs: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = _make_kernel(n_nodes, block, packet, C, TMIN,
                          leaf_gate=leaf_gate, instanced=instanced,
                          mb_bits=mb_bits)
    # Default scoped-VMEM limit is 16MB; v5e has 128MB — size the limit
    # to the (lane-padded) tables + state, capped below the hardware.
    need = 2 * n_nodes * 512 + n_leaves * 512 + 4 * 1024 * 1024
    if instanced:
        need += inst_inv.shape[0] * 512
    vmem_limit = vmem_clamp(need)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, C, 4, packet), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(*args)


def _seed_channels(n, seed):
    """Channels 7-10 of the ray block: (t, bitcast tri, u, v)."""
    if seed is None:
        return (
            jnp.full((n,), MISS_T),
            jax.lax.bitcast_convert_type(
                jnp.full((n,), -1, jnp.int32), jnp.float32
            ),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32),
        )
    return (
        seed.t,
        jax.lax.bitcast_convert_type(seed.tri, jnp.float32),
        seed.u,
        seed.v,
    )


def pallas_closest_hit(scene, origin, direction, active=None,
                       interpret=False, seed=None,
                       packet: int = None, leaf_gate: bool = None,
                       t_far=None, t_near=None,
                       group_mt: int = None, spec: bool = None,
                       pipe: bool = None) -> Hit:
    """Drop-in closest-hit using the packet kernel.

    Pads the ray set to a PACKET*INTERLEAVE multiple; inactive/padding
    lanes get per-lane tmax = -1 so they never hit (and never extend
    traversal).  ``seed`` (optional Hit) pre-loads t/tri/u/v — a valid
    prior hit (e.g. from ops.intersect.leaf_seed_hit) that tightens
    t_best from the first node visit without changing results.
    ``t_far`` (scalar or (n,) f32) clamps the per-lane far plane below
    TMAX: hits at t >= t_far are NOT returned (the lane reports miss).
    ``t_near`` (scalar or (n,) f32) is a CLOSED per-lane lower bound:
    only hits with t >= t_near are returned and traversal skips boxes
    entirely below it.  Together they restrict a pass to the t-slab
    [t_near, t_far) so windowed-cascade passes tile [tmin, inf)
    exactly (boundary hits land in exactly one window).
    """
    n = origin.shape[0]
    n_nodes = scene.bvh_skip.shape[0] // scene.bvh_orders
    if packet is None:
        packet = PACKET
    if leaf_gate is None:
        # Measured DEAD END on the atrium (experiments/leaf_gate_ab):
        # gating leaf MT per (8,128) group costs 15-21% — the per-leaf
        # cross-lane sums + conds exceed the skipped MT work.  Kept as
        # an opt-in for future hardware where branches are cheaper.
        leaf_gate = os.environ.get("VKPT_LEAF_GATE", "0") == "1"
    if group_mt is None:
        group_mt = int(os.environ.get("VKPT_GROUP_MT", "0"))
    if spec is None:
        spec = os.environ.get("VKPT_SPEC2", "0") == "1"
    if pipe is None:
        pipe = os.environ.get("VKPT_PIPE", "0") == "1"
    if pipe and getattr(scene, "instanced", False):
        pipe = False  # pipe kernel is not instance-aware
    if packet < 2048:
        group_mt = 0  # needs >= 2 sublane groups of (8, 128)
        spec = False

    octant = (
        (direction[:, 0] < 0).astype(jnp.int32)
        + 2 * (direction[:, 1] < 0).astype(jnp.int32)
        + 4 * (direction[:, 2] < 0).astype(jnp.int32)
    )
    if scene.bvh_orders == 1:
        # Single canonical linearization (octant_order=False): every
        # packet stages block 0 — an octant block index would run off
        # the (1, ...) node array and crash the backend.
        octant = jnp.zeros_like(octant)
    if t_far is None:
        t_lane = jnp.full((n,), jnp.float32(TMAX))
    else:
        t_lane = jnp.broadcast_to(
            jnp.minimum(jnp.asarray(t_far, jnp.float32),
                        jnp.float32(TMAX)), (n,)
        )
    if active is not None:
        t_lane = jnp.where(active, t_lane, jnp.float32(-1.0))

    group = packet * (2 if pipe else INTERLEAVE)
    pad = (-n) % group
    total = n + pad
    n_groups = total // group

    def pad1(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill)

    st, strif, su, sv = _seed_channels(n, seed)
    miss_bits = float(
        np.frombuffer(np.int32(-1).tobytes(), dtype=np.float32)[0]
    )
    stacked = jnp.stack(
        [
            pad1(origin[:, 0]), pad1(origin[:, 1]), pad1(origin[:, 2]),
            pad1(direction[:, 0]), pad1(direction[:, 1]),
            pad1(direction[:, 2]),
            pad1(t_lane, -1.0),
            pad1(st, float(MISS_T)),
            pad1(strif, miss_bits),
            pad1(su), pad1(sv),
            (jnp.zeros((total,), jnp.float32) if t_near is None
             else pad1(jnp.broadcast_to(
                 jnp.asarray(t_near, jnp.float32), (n,)))),
        ],
        axis=0,
    )

    oct_padded = jnp.pad(octant, (0, pad))
    group_oct = oct_padded.reshape(n_groups, group)[:, 0]

    # Node rows with skip/leaf as FLOAT VALUES (scalar bitcasts are not
    # lowerable in Mosaic; int values < 2^24 are exact in f32).
    meta_i = jax.lax.bitcast_convert_type(scene.bvh_packed_tail, jnp.int32)
    nodes8 = jnp.concatenate(
        [scene.bvh_packed[:, 0:6], meta_i.astype(jnp.float32)], axis=1
    ).reshape(scene.bvh_orders, n_nodes, 8)

    if group_mt > 0 and getattr(scene, "instanced", False):
        group_mt = 0  # gmt/spec kernels are not instance-aware
    if pipe:
        rays = stacked.reshape(12, n_groups, 2, packet).transpose(
            1, 2, 0, 3)
        out = _packet_traverse_pipe(nodes8, scene.tri_blocks, rays,
                                    group_oct, interpret=interpret)
        out = out.transpose(2, 0, 1, 3).reshape(4, total)[:, :n]
        t = out[0]
        tri = jax.lax.bitcast_convert_type(out[1], jnp.int32)
        return Hit(t=t, tri=tri, u=out[2], v=out[3])
    if group_mt > 0:
        sub = packet // _LANE
        rays = stacked.reshape(12, n_groups, sub, _LANE).transpose(
            1, 0, 2, 3).reshape(n_groups, 12 * sub, _LANE)
        out = _packet_traverse_gmt(nodes8, scene.tri_blocks, rays,
                                   group_oct, interpret=interpret,
                                   gf=group_mt, spec=spec)
        out = out.transpose(1, 0, 2).reshape(4, total)[:, :n]
        t = out[0]
        tri = jax.lax.bitcast_convert_type(out[1], jnp.int32)
        return Hit(t=t, tri=tri, u=out[2], v=out[3])

    rays = stacked.reshape(12, n_groups, INTERLEAVE, packet).transpose(
        1, 2, 0, 3)
    if getattr(scene, "instanced", False):
        out = _packet_traverse(nodes8, scene.tri_blocks, rays, group_oct,
                               scene.inst_inv, interpret=interpret,
                               leaf_gate=leaf_gate,
                               mb_bits=scene.mb_bits)
    else:
        out = _packet_traverse(nodes8, scene.tri_blocks, rays, group_oct,
                               interpret=interpret, leaf_gate=leaf_gate)
    out = out.transpose(2, 0, 1, 3).reshape(4, total)[:, :n]
    t = out[0]
    tri = jax.lax.bitcast_convert_type(out[1], jnp.int32)
    return Hit(t=t, tri=tri, u=out[2], v=out[3])


def fits_vmem(scene, budget_bytes: int = None,
              packet: int = None) -> bool:
    """Whether one octant's node rows (double-buffered) + the leaf
    table + ray state fit VMEM (v5e: 128MB total).  Mosaic tiles the
    8-wide lane dim up to 128, so a node row costs 512B and a leaf row
    512B regardless of logical width — ceiling ~90k nodes per octant
    (~140k triangles)."""
    import os

    if budget_bytes is None:
        budget_bytes = int(os.environ.get(
            "VKPT_VMEM_BUDGET", 100 * 1024 * 1024
        ))
    if scene.bvh_packed is None or scene.tri_blocks is None:
        return False
    if scene.tri_blocks.shape[1] > _LANE:
        # Scalar reads need static lane indices within one 128-lane
        # tile: leaf rows wider than 128 floats (max_leaf_size > 14)
        # cannot run on the Pallas path.
        return False
    n_nodes = scene.bvh_packed.shape[0] // scene.bvh_orders
    node_bytes = n_nodes * 512          # (Nn, 8) -> (8,128)-tile padded
    tri_rows = scene.tri_blocks.shape[0]
    tri_bytes = tri_rows * 512          # (L, 36) -> lane-padded
    if packet is None:
        # _closest_hit dispatches phase-tuned packets up to 4096
        # (VKPT_PACKET_SECONDARY default); budget for the larger of
        # the module default and that, so the guard tracks what
        # pallas_closest_hit actually allocates.
        packet = max(PACKET, 4096)
    state = 8 * packet * INTERLEAVE * 4 * 4 * 2
    if getattr(scene, "instanced", False):
        state += scene.inst_inv.shape[0] * 512
    return (2 * node_bytes + tri_bytes + state) < budget_bytes


# ---------------------------------------------------------------------------
# Pipelined-pair variant: cross-iteration reduction carry.
#
# The packet kernel's per-visit critical path is the synchronous
# cross-lane reduction (~100 cyc) between the slab test and the
# descend branch.  Same-iteration latency hiding is a measured dead
# end (C-interleave flat; spec-2 0.80x — Mosaic schedules the chains
# sequentially and waits at the consumer).  This kernel moves the
# consumer a full loop iteration away instead: TWO independent packet
# chains advance in one while body, and each chain's any()-sum is
# ISSUED at the end of iteration i but CONSUMED at the start of
# iteration i+1 — with the OTHER chain's scalar loads + slab test
# emitted between issue and consume, the reduction's latency is
# covered by real work even under in-order VLIW scheduling (VPU
# reductions are pipelined: 8 independent sums retire in ~108 cyc).
#
#   carry: (nodeA, nodeB, pendA, pendB, hit-states)
#   body : resolve A from pendA -> leaf MT (pre-MT t bound, exact) ->
#          slab(nextA) -> issue pendA'   [B's slab covers this sum]
#          resolve B from pendB -> slab(nextB) -> issue pendB'
#          [A's resolve+slab next iteration covers this sum]
#
# Results are exact: the slab uses the chain's own live t_best and
# the decide/MT logic is the baseline kernel's.
# ---------------------------------------------------------------------------
def _make_pipe_kernel(n_nodes: int, block: int, packet: int, tmin: float):
    sub = packet // _LANE

    def kernel(octant_ref, nodes_ref, tris_ref, rays_ref, out_ref):
        del octant_ref

        comps = [
            [rays_ref[0, c, i, :].reshape(sub, _LANE) for i in range(12)]
            for c in range(2)
        ]

        eps = jnp.float32(1e-20)

        def sinv(d):
            return 1.0 / jnp.where(jnp.abs(d) < eps,
                                   jnp.where(d >= 0, eps, -eps), d)

        inv = [[sinv(comps[c][3]), sinv(comps[c][4]), sinv(comps[c][5])]
               for c in range(2)]
        oinv = [[comps[c][0] * inv[c][0],
                 comps[c][1] * inv[c][1],
                 comps[c][2] * inv[c][2]] for c in range(2)]
        tnears = [jnp.maximum(comps[c][11], jnp.float32(tmin))
                  for c in range(2)]

        def slab_sum(c, nd, t_best):
            b = [nodes_ref[0, nd, i] for i in range(6)]
            ix, iy, iz = inv[c]
            oxi, oyi, ozi = oinv[c]
            tl = comps[c][6]
            tx0 = b[0] * ix - oxi
            tx1 = b[3] * ix - oxi
            ty0 = b[1] * iy - oyi
            ty1 = b[4] * iy - oyi
            tz0 = b[2] * iz - ozi
            tz1 = b[5] * iz - ozi
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1),
                            jnp.minimum(ty0, ty1)),
                jnp.maximum(jnp.minimum(tz0, tz1), tnears[c]),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1),
                            jnp.maximum(ty0, ty1)),
                jnp.minimum(jnp.maximum(tz0, tz1),
                            jnp.minimum(t_best, tl)),
            )
            return jnp.sum(jnp.where(tn <= tf, 1.0, 0.0))

        def mt_leaf(c, leaf_i, args):
            t_best, tri_best, u_best, v_best = args
            ox, oy, oz, dx, dy, dz, tl = comps[c][:7]
            tng = tnears[c]
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
                       & (u + v <= 1.0) & (t > tmin) & (t >= tng)
                       & (t < t_lim))
                t_best = jnp.where(hit, t, t_best)
                tri_best = jnp.where(hit, leaf_i + k, tri_best)
                u_best = jnp.where(hit, u, u_best)
                v_best = jnp.where(hit, v, v_best)
            return t_best, tri_best, u_best, v_best

        t0s = [comps[c][7] for c in range(2)]
        tri0s = [jax.lax.bitcast_convert_type(comps[c][8], jnp.int32)
                 for c in range(2)]
        u0s = [comps[c][9] for c in range(2)]
        v0s = [comps[c][10] for c in range(2)]

        # Prime: sums for node 0 of both chains.
        pend0 = [slab_sum(c, jnp.int32(0), t0s[c]) for c in range(2)]

        def cond(state):
            nodes = state[0]
            return jnp.logical_or(nodes[0] < n_nodes, nodes[1] < n_nodes)

        def advance(c, node, pend, hitstate):
            """Resolve the chain's current node from the CARRIED sum,
            run leaf MT, then slab+issue the successor's sum."""
            nd = jnp.minimum(node, n_nodes - 1)
            live = node < n_nodes
            skip_i = nodes_ref[0, nd, 6].astype(jnp.int32)
            leaf_f = nodes_ref[0, nd, 7]
            any_hit = pend > 0.0
            is_leaf = leaf_f >= 0.0

            hitstate = jax.lax.cond(
                jnp.logical_and(jnp.logical_and(is_leaf, live), any_hit),
                lambda a: mt_leaf(c, leaf_f.astype(jnp.int32), a),
                lambda a: a, hitstate,
            )
            nxt = jnp.where(
                is_leaf, skip_i,
                jnp.where(any_hit, node + 1, skip_i),
            )
            nxt = jnp.where(live, nxt, node)
            pend_n = slab_sum(c, jnp.minimum(nxt, n_nodes - 1),
                              hitstate[0])
            return nxt, pend_n, hitstate

        def body(state):
            (nodes, pends, hA, hB) = state
            nA, pA, hA = advance(0, nodes[0], pends[0], hA)
            nB, pB, hB = advance(1, nodes[1], pends[1], hB)
            return ((nA, nB), (pA, pB), hA, hB)

        init = (
            (jnp.int32(0), jnp.int32(0)),
            (pend0[0], pend0[1]),
            (t0s[0], tri0s[0], u0s[0], v0s[0]),
            (t0s[1], tri0s[1], u0s[1], v0s[1]),
        )
        _, _, hA, hB = jax.lax.while_loop(cond, body, init)
        for c, h in ((0, hA), (1, hB)):
            out_ref[0, c, 0, :] = h[0].reshape(-1)
            out_ref[0, c, 1, :] = jax.lax.bitcast_convert_type(
                h[1], jnp.float32
            ).reshape(-1)
            out_ref[0, c, 2, :] = h[2].reshape(-1)
            out_ref[0, c, 3, :] = h[3].reshape(-1)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _packet_traverse_pipe(nodes8, tris, rays, octants, *, interpret=False):
    """rays: (G, 2, 12, PACKET) — two pipelined chains per group.
    Returns (G, 2, 4, PACKET) f32."""
    _, n_nodes, _ = nodes8.shape
    n_leaves, row_w = tris.shape
    block = row_w // 9
    g, C, _, packet = rays.shape
    assert C == 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, n_nodes, 8), lambda i, octs: (octs[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_leaves, row_w), lambda i, octs: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 12, packet),
                         lambda i, octs: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, 4, packet),
                               lambda i, octs: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = _make_pipe_kernel(n_nodes, block, packet, TMIN)
    need = 2 * n_nodes * 512 + n_leaves * 512 + 4 * 1024 * 1024
    vmem_limit = vmem_clamp(need)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, 2, 4, packet), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(octants, nodes8, tris, rays)


# ---------------------------------------------------------------------------
# Group-MT variant: leaf Moller-Trumbore on DYNAMIC sublane groups.
#
# After the bounce sort, the ~dozen rays that box-hit a given leaf are
# contiguous in the packet, so they land in 1-2 of the (8, 128)-row
# sublane groups.  The earlier per-group lax.cond gate LOST 15-21%
# (cond bodies carrying vector state inhibit Mosaic's pipelining —
# experiments/mosaic_costs.py).  This kernel keeps control flow FIXED
# and moves the data instead: every leaf visit intersects exactly GF
# groups addressed by a *dynamic sublane offset* (the first hitting
# group, computed from per-group cross-lane sums that replace the
# descend `any()`), falling back to full-width MT only when hits span
# more than GF groups (rare; the replay is idempotent — a replayed
# triangle has t == t_best, never < , so results are identical).
#
# Ray components and the hit state live in VMEM (rays reshaped to
# (12*sub, 128) rows; state in a (4*sub, 128) scratch) because vregs
# cannot be sliced at dynamic offsets but VMEM rows can (dynamic
# sublane start, static lanes — the same constraint the node table
# already exploits).  tri ids are stored as f32 VALUES (< 2^24 exact).
#
# Leaf visits whose box mask is empty (the packet reached the leaf in
# preorder without any lane hitting it) skip MT entirely — the
# baseline kernel pays full-width MT for those.
# ---------------------------------------------------------------------------
def _make_gmt_kernel(n_nodes: int, block: int, packet: int, tmin: float,
                     gf: int):
    sub = packet // _LANE
    ngrp = sub // 8

    def kernel(octant_ref, nodes_ref, tris_ref, rays_ref, out_ref,
               state_ref):
        del octant_ref

        comps = [rays_ref[0, i * sub:(i + 1) * sub, :] for i in range(12)]

        eps = jnp.float32(1e-20)

        def sinv(d):
            return 1.0 / jnp.where(jnp.abs(d) < eps,
                                   jnp.where(d >= 0, eps, -eps), d)

        inv = [sinv(comps[3]), sinv(comps[4]), sinv(comps[5])]
        oinv = [comps[0] * inv[0], comps[1] * inv[1], comps[2] * inv[2]]
        tl_full = comps[6]
        # Channel 11: per-lane CLOSED lower bound t_near (0 = off).
        tnear_full = jnp.maximum(comps[11], jnp.float32(tmin))

        # Seed state: t rows [0,sub), tri-as-f32 [sub,2sub), u, v.
        state_ref[0:sub, :] = comps[7]
        state_ref[sub:2 * sub, :] = jax.lax.bitcast_convert_type(
            comps[8], jnp.int32
        ).astype(jnp.float32)
        state_ref[2 * sub:3 * sub, :] = comps[9]
        state_ref[3 * sub:4 * sub, :] = comps[10]

        def mt_rows(o3, d3, tlg, tng, tg, trig, ug, vg, leaf_i):
            """MT of the leaf block against a row set; returns updated
            (t, tri, u, v).  Same arithmetic as the baseline kernel."""
            ox, oy, oz = o3
            dx, dy, dz = d3
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
                t_lim = jnp.minimum(tg, tlg)
                hit = (front & (u >= 0.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (t > tmin) & (t >= tng)
                       & (t < t_lim))
                tg = jnp.where(hit, t, tg)
                trig = jnp.where(hit, jnp.float32(1.0) * (leaf_i + k),
                                 trig)
                ug = jnp.where(hit, u, ug)
                vg = jnp.where(hit, v, vg)
            return tg, trig, ug, vg

        def cond(state):
            return state[0] < n_nodes

        def body(state):
            (node,) = state
            nd = jnp.minimum(node, n_nodes - 1)
            live = node < n_nodes
            b = [nodes_ref[0, nd, i] for i in range(6)]
            skip_i = nodes_ref[0, nd, 6].astype(jnp.int32)
            leaf_f = nodes_ref[0, nd, 7]
            leaf_i = leaf_f.astype(jnp.int32)
            ix, iy, iz = inv
            oxi, oyi, ozi = oinv
            t_best_full = state_ref[0:sub, :]
            t_lim = jnp.minimum(t_best_full, tl_full)
            tx0 = b[0] * ix - oxi
            tx1 = b[3] * ix - oxi
            ty0 = b[1] * iy - oyi
            ty1 = b[4] * iy - oyi
            tz0 = b[2] * iz - ozi
            tz1 = b[5] * iz - ozi
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1),
                            jnp.minimum(ty0, ty1)),
                jnp.maximum(jnp.minimum(tz0, tz1), tnear_full),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1),
                            jnp.maximum(ty0, ty1)),
                jnp.minimum(jnp.maximum(tz0, tz1), t_lim),
            )
            bh_f = jnp.where(tn <= tf, 1.0, 0.0)
            # Per-group hit counts replace the descend any(): the G
            # cross-lane sums pipeline (~108 cyc for 8 — mosaic_costs).
            sg = [jnp.sum(bh_f[g * 8:(g + 1) * 8, :]) for g in range(ngrp)]
            total = sg[0]
            for g in range(1, ngrp):
                total = total + sg[g]
            any_hit = total > 0.0
            is_leaf = leaf_f >= 0.0

            @pl.when(jnp.logical_and(jnp.logical_and(is_leaf, live),
                                     any_hit))
            def leaf_case():
                first = jnp.int32(ngrp - 1)
                last = jnp.int32(0)
                for g in range(ngrp - 1, -1, -1):
                    first = jnp.where(sg[g] > 0.0, jnp.int32(g), first)
                for g in range(ngrp):
                    last = jnp.where(sg[g] > 0.0, jnp.int32(g), last)
                span = last - first

                for i in range(gf):
                    g = jnp.minimum(first + i, jnp.int32(ngrp - 1))
                    r0 = g * 8

                    def rrow(comp_i):
                        return rays_ref[0, pl.ds(comp_i * sub + r0, 8), :]

                    def srow(field):
                        return state_ref[pl.ds(field * sub + r0, 8), :]

                    o3 = (rrow(0), rrow(1), rrow(2))
                    d3 = (rrow(3), rrow(4), rrow(5))
                    tng = jnp.maximum(rrow(11), jnp.float32(tmin))
                    tg, trig, ug, vg = mt_rows(
                        o3, d3, rrow(6), tng, srow(0), srow(1), srow(2),
                        srow(3), leaf_i,
                    )
                    state_ref[pl.ds(0 * sub + r0, 8), :] = tg
                    state_ref[pl.ds(1 * sub + r0, 8), :] = trig
                    state_ref[pl.ds(2 * sub + r0, 8), :] = ug
                    state_ref[pl.ds(3 * sub + r0, 8), :] = vg

                @pl.when(span >= gf)
                def full_mt():
                    # Hits span more than GF groups: replay full width
                    # (idempotent — replayed triangles have t == t_best).
                    tg, trig, ug, vg = mt_rows(
                        (comps[0], comps[1], comps[2]),
                        (comps[3], comps[4], comps[5]),
                        tl_full,
                        tnear_full,
                        state_ref[0:sub, :],
                        state_ref[sub:2 * sub, :],
                        state_ref[2 * sub:3 * sub, :],
                        state_ref[3 * sub:4 * sub, :],
                        leaf_i,
                    )
                    state_ref[0:sub, :] = tg
                    state_ref[sub:2 * sub, :] = trig
                    state_ref[2 * sub:3 * sub, :] = ug
                    state_ref[3 * sub:4 * sub, :] = vg

            nxt = jnp.where(
                is_leaf, skip_i,
                jnp.where(any_hit, node + 1, skip_i),
            )
            return (jnp.where(live, nxt, node),)

        jax.lax.while_loop(cond, body, (jnp.int32(0),))
        out_ref[0, 0, :] = state_ref[0:sub, :].reshape(-1)
        out_ref[0, 1, :] = jax.lax.bitcast_convert_type(
            state_ref[sub:2 * sub, :].astype(jnp.int32), jnp.float32
        ).reshape(-1)
        out_ref[0, 2, :] = state_ref[2 * sub:3 * sub, :].reshape(-1)
        out_ref[0, 3, :] = state_ref[3 * sub:4 * sub, :].reshape(-1)

    return kernel


# ---------------------------------------------------------------------------
# Spec-2 variant: 2-level speculative advance per serial sync.
#
# The packet kernel's per-visit critical path is LATENCY-bound: scalar
# node loads -> slab -> cross-lane reduction (~100 cyc) -> branch, and
# the reduction cannot pipeline across iterations because the next
# node id depends on it.  But INDEPENDENT reductions pipeline almost
# perfectly (8 sums ~ 108 cyc total — experiments/mosaic_costs.py).
# So each iteration slab-tests THREE nodes concurrently — the cursor
# n and both possible successors n+1 and skip(n) — and advances TWO
# levels per sync:
#
#   next1 = leaf(n)    ? skip(n) : any(n)     ? n+1    : skip(n)
#   next2 = leaf(next1)? skip(n1): any(next1) ? next1+1: skip(next1)
#
# next1's box mask/leafness/skip are selected from the two speculated
# candidates (already tested); only next2's test is deferred to the
# next iteration.  1.5 slab tests per advance instead of 1.0, but
# half the serial syncs.  Successor tests use t_best as of the
# iteration start (pre-MT) — a LOOSER bound than the baseline's, so
# speculation can only add box-hit false positives (extra visits),
# never lose hits; MT itself re-checks against live t_best in
# scratch.  Leaf MT reuses the group-MT path for both visited nodes.
# ---------------------------------------------------------------------------
def _make_gmt2_kernel(n_nodes: int, block: int, packet: int, tmin: float,
                      gf: int):
    sub = packet // _LANE
    ngrp = sub // 8

    def kernel(octant_ref, nodes_ref, tris_ref, rays_ref, out_ref,
               state_ref):
        del octant_ref

        comps = [rays_ref[0, i * sub:(i + 1) * sub, :] for i in range(12)]

        eps = jnp.float32(1e-20)

        def sinv(d):
            return 1.0 / jnp.where(jnp.abs(d) < eps,
                                   jnp.where(d >= 0, eps, -eps), d)

        inv = [sinv(comps[3]), sinv(comps[4]), sinv(comps[5])]
        oinv = [comps[0] * inv[0], comps[1] * inv[1], comps[2] * inv[2]]
        tl_full = comps[6]
        tnear_full = jnp.maximum(comps[11], jnp.float32(tmin))

        state_ref[0:sub, :] = comps[7]
        state_ref[sub:2 * sub, :] = jax.lax.bitcast_convert_type(
            comps[8], jnp.int32
        ).astype(jnp.float32)
        state_ref[2 * sub:3 * sub, :] = comps[9]
        state_ref[3 * sub:4 * sub, :] = comps[10]

        def mt_rows(o3, d3, tlg, tng, tg, trig, ug, vg, leaf_i):
            ox, oy, oz = o3
            dx, dy, dz = d3
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
                t_lim = jnp.minimum(tg, tlg)
                hit = (front & (u >= 0.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (t > tmin) & (t >= tng)
                       & (t < t_lim))
                tg = jnp.where(hit, t, tg)
                trig = jnp.where(hit, jnp.float32(1.0) * (leaf_i + k),
                                 trig)
                ug = jnp.where(hit, u, ug)
                vg = jnp.where(hit, v, vg)
            return tg, trig, ug, vg

        def visit_leaf(leaf_i, sg):
            """Group-MT a leaf given its per-group hit counts."""
            first = jnp.int32(ngrp - 1)
            last = jnp.int32(0)
            for g in range(ngrp - 1, -1, -1):
                first = jnp.where(sg[g] > 0.0, jnp.int32(g), first)
            for g in range(ngrp):
                last = jnp.where(sg[g] > 0.0, jnp.int32(g), last)
            span = last - first

            for i in range(gf):
                g = jnp.minimum(first + i, jnp.int32(ngrp - 1))
                r0 = g * 8

                def rrow(comp_i):
                    return rays_ref[0, pl.ds(comp_i * sub + r0, 8), :]

                def srow(field):
                    return state_ref[pl.ds(field * sub + r0, 8), :]

                o3 = (rrow(0), rrow(1), rrow(2))
                d3 = (rrow(3), rrow(4), rrow(5))
                tng = jnp.maximum(rrow(11), jnp.float32(tmin))
                tg, trig, ug, vg = mt_rows(
                    o3, d3, rrow(6), tng, srow(0), srow(1), srow(2),
                    srow(3), leaf_i,
                )
                state_ref[pl.ds(0 * sub + r0, 8), :] = tg
                state_ref[pl.ds(1 * sub + r0, 8), :] = trig
                state_ref[pl.ds(2 * sub + r0, 8), :] = ug
                state_ref[pl.ds(3 * sub + r0, 8), :] = vg

            @pl.when(span >= gf)
            def full_mt():
                tg, trig, ug, vg = mt_rows(
                    (comps[0], comps[1], comps[2]),
                    (comps[3], comps[4], comps[5]),
                    tl_full,
                    tnear_full,
                    state_ref[0:sub, :],
                    state_ref[sub:2 * sub, :],
                    state_ref[2 * sub:3 * sub, :],
                    state_ref[3 * sub:4 * sub, :],
                    leaf_i,
                )
                state_ref[0:sub, :] = tg
                state_ref[sub:2 * sub, :] = trig
                state_ref[2 * sub:3 * sub, :] = ug
                state_ref[3 * sub:4 * sub, :] = vg

        def cond(state):
            return state[0] < n_nodes

        def body(state):
            (node,) = state
            ix, iy, iz = inv
            oxi, oyi, ozi = oinv
            t_best_full = state_ref[0:sub, :]
            t_lim = jnp.minimum(t_best_full, tl_full)

            nd0 = jnp.minimum(node, n_nodes - 1)
            skip0 = nodes_ref[0, nd0, 6].astype(jnp.int32)
            leaf0_f = nodes_ref[0, nd0, 7]
            # Candidates: A = n+1, B = skip(n).
            ndA = jnp.minimum(node + 1, n_nodes - 1)
            ndB = jnp.minimum(skip0, n_nodes - 1)

            def slab_sums(nd):
                b = [nodes_ref[0, nd, i] for i in range(6)]
                tx0 = b[0] * ix - oxi
                tx1 = b[3] * ix - oxi
                ty0 = b[1] * iy - oyi
                ty1 = b[4] * iy - oyi
                tz0 = b[2] * iz - ozi
                tz1 = b[5] * iz - ozi
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1),
                                jnp.minimum(ty0, ty1)),
                    jnp.maximum(jnp.minimum(tz0, tz1), tnear_full),
                )
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1),
                                jnp.maximum(ty0, ty1)),
                    jnp.minimum(jnp.maximum(tz0, tz1), t_lim),
                )
                bh_f = jnp.where(tn <= tf, 1.0, 0.0)
                sg = [jnp.sum(bh_f[g * 8:(g + 1) * 8, :])
                      for g in range(ngrp)]
                total = sg[0]
                for g in range(1, ngrp):
                    total = total + sg[g]
                return sg, total

            sg0, tot0 = slab_sums(nd0)
            sgA, totA = slab_sums(ndA)
            sgB, totB = slab_sums(ndB)

            live0 = node < n_nodes
            is_leaf0 = leaf0_f >= 0.0

            @pl.when(jnp.logical_and(jnp.logical_and(is_leaf0, live0),
                                     tot0 > 0.0))
            def _():
                visit_leaf(leaf0_f.astype(jnp.int32), sg0)

            # next1 and its (already computed) test results.
            next1 = jnp.where(
                is_leaf0, skip0,
                jnp.where(tot0 > 0.0, node + 1, skip0),
            )
            next1 = jnp.where(live0, next1, node)
            from_A = next1 == node + 1
            skipA = nodes_ref[0, ndA, 6].astype(jnp.int32)
            leafA_f = nodes_ref[0, ndA, 7]
            skipB = nodes_ref[0, ndB, 6].astype(jnp.int32)
            leafB_f = nodes_ref[0, ndB, 7]
            skip1 = jnp.where(from_A, skipA, skipB)
            leaf1_f = jnp.where(from_A, leafA_f, leafB_f)
            tot1 = jnp.where(from_A, totA, totB)
            sg1 = [jnp.where(from_A, sgA[g], sgB[g]) for g in range(ngrp)]

            live1 = next1 < n_nodes
            is_leaf1 = leaf1_f >= 0.0

            @pl.when(jnp.logical_and(jnp.logical_and(is_leaf1, live1),
                                     tot1 > 0.0))
            def _():
                visit_leaf(leaf1_f.astype(jnp.int32), sg1)

            next2 = jnp.where(
                is_leaf1, skip1,
                jnp.where(tot1 > 0.0, next1 + 1, skip1),
            )
            next2 = jnp.where(live1, next2, next1)
            return (next2,)

        jax.lax.while_loop(cond, body, (jnp.int32(0),))
        out_ref[0, 0, :] = state_ref[0:sub, :].reshape(-1)
        out_ref[0, 1, :] = jax.lax.bitcast_convert_type(
            state_ref[sub:2 * sub, :].astype(jnp.int32), jnp.float32
        ).reshape(-1)
        out_ref[0, 2, :] = state_ref[2 * sub:3 * sub, :].reshape(-1)
        out_ref[0, 3, :] = state_ref[3 * sub:4 * sub, :].reshape(-1)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "gf", "spec"))
def _packet_traverse_gmt(nodes8, tris, rays, octants, *, interpret=False,
                         gf=1, spec=False):
    """nodes8: (8, Nn, 8) f32; tris: (n_leaves, block*9) f32;
    rays: (G, 12*sub, 128) f32 row-major comp rows; octants: (G,) i32.
    Returns (G, 4, PACKET) f32."""
    _, n_nodes, _ = nodes8.shape
    n_leaves, row_w = tris.shape
    block = row_w // 9
    g, rows12, _ = rays.shape
    sub = rows12 // 12
    packet = sub * _LANE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, n_nodes, 8), lambda i, octs: (octs[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_leaves, row_w), lambda i, octs: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows12, _LANE),
                         lambda i, octs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, packet),
                               lambda i, octs: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((4 * sub, _LANE), jnp.float32)],
    )
    if spec:
        kernel = _make_gmt2_kernel(n_nodes, block, packet, TMIN, gf)
    else:
        kernel = _make_gmt_kernel(n_nodes, block, packet, TMIN, gf)
    need = 2 * n_nodes * 512 + n_leaves * 512 + 8 * 1024 * 1024
    vmem_limit = vmem_clamp(need)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, 4, packet), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(octants, nodes8, tris, rays)


# ---------------------------------------------------------------------------
# 8-wide variant: slot-tile node tests with zero scalar box loads.
# ---------------------------------------------------------------------------
def _make_wide_kernel(n_wide: int, block: int, packet: int, tmin: float):
    sub = packet // _LANE

    def kernel(octant_ref, nodes_ref, tris_ref, rays_ref, out_ref):
        del octant_ref

        comps = [rays_ref[0, 0, i, :].reshape(sub, _LANE) for i in range(12)]
        ox, oy, oz, dx, dy, dz, tl = comps[:7]

        eps = jnp.float32(1e-20)

        def sinv(d):
            return 1.0 / jnp.where(jnp.abs(d) < eps,
                                   jnp.where(d >= 0, eps, -eps), d)

        ix, iy, iz = sinv(dx), sinv(dy), sinv(dz)

        t0 = comps[7]
        tri0 = jax.lax.bitcast_convert_type(comps[8], jnp.int32)
        zero_u = comps[9]
        zero_v = comps[10]

        def cond(state):
            return state[0] < n_wide

        def body(state):
            node, t_best, tri_best, u_best, v_best = state
            nd = jnp.minimum(node, n_wide - 1)
            tile = nodes_ref[0, nd]            # (8 slots, 8 fields)
            bminx = tile[:, 0:1]
            bminy = tile[:, 1:2]
            bminz = tile[:, 2:3]
            bmaxx = tile[:, 3:4]
            bmaxy = tile[:, 4:5]
            bmaxz = tile[:, 5:6]
            leafcol = tile[:, 6:7]             # (8, 1)
            # f32 mask (i1 broadcasts across sublanes don't lower).
            internal_f = jnp.where(
                leafcol == jnp.float32(-1.0), 1.0, 0.0
            )
            skip_i = nodes_ref[0, nd, 0, 7].astype(jnp.int32)

            # Slab tests: slots on sublanes x 128-ray chunks on lanes.
            hits = []
            internal_acc = jnp.zeros((8, _LANE), dtype=jnp.float32)
            for j in range(sub):
                oxj = ox[j:j + 1, :]
                oyj = oy[j:j + 1, :]
                ozj = oz[j:j + 1, :]
                ixj = ix[j:j + 1, :]
                iyj = iy[j:j + 1, :]
                izj = iz[j:j + 1, :]
                t_lim_j = jnp.minimum(t_best[j:j + 1, :], tl[j:j + 1, :])
                tx0 = (bminx - oxj) * ixj
                tx1 = (bmaxx - oxj) * ixj
                ty0 = (bminy - oyj) * iyj
                ty1 = (bmaxy - oyj) * iyj
                tz0 = (bminz - ozj) * izj
                tz1 = (bmaxz - ozj) * izj
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1),
                                jnp.minimum(ty0, ty1)),
                    jnp.maximum(jnp.minimum(tz0, tz1), jnp.float32(tmin)),
                )
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1),
                                jnp.maximum(ty0, ty1)),
                    jnp.minimum(jnp.maximum(tz0, tz1), t_lim_j),
                )
                # Keep the hit matrix in f32: i1 vregs at (8,128) hit
                # unsupported bitcasts when sliced/concatenated.
                hit_j = jnp.where(tn <= tf, 1.0, 0.0)  # (8 slots, 128)
                hits.append(hit_j)
                internal_acc = jnp.maximum(internal_acc, hit_j * internal_f)

            # Leaf slots: unrolled; each under a scalar branch on its
            # leafword (one scalar load per slot).
            def make_leaf(k):
                def leaf_case(args):
                    t_best, tri_best, u_best, v_best = args
                    leaf_f = nodes_ref[0, nd, k, 6]
                    leaf_i = leaf_f.astype(jnp.int32)
                    row = leaf_i // block
                    mask = jnp.concatenate(
                        [hits[j][k:k + 1, :] for j in range(sub)], axis=0
                    ) > 0.5                     # (sub, 128)
                    for kk in range(block):
                        base = kk * 9
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
                               & (u + v <= 1.0) & (t > tmin)
                               & (t < t_lim) & mask)
                        t_best = jnp.where(hit, t, t_best)
                        tri_best = jnp.where(hit, leaf_i + kk, tri_best)
                        u_best = jnp.where(hit, u, u_best)
                        v_best = jnp.where(hit, v, v_best)
                    return t_best, tri_best, u_best, v_best

                return leaf_case

            for k in range(8):
                is_leaf_k = nodes_ref[0, nd, k, 6] >= 0.0
                t_best, tri_best, u_best, v_best = jax.lax.cond(
                    is_leaf_k, make_leaf(k), lambda a: a,
                    (t_best, tri_best, u_best, v_best),
                )

            any_internal = jnp.max(internal_acc) > 0.0
            nxt = jnp.where(any_internal, node + 1, skip_i)
            return nxt, t_best, tri_best, u_best, v_best

        node0 = jnp.int32(0)
        _, t_best, tri_best, u_best, v_best = jax.lax.while_loop(
            cond, body, (node0, t0, tri0, zero_u, zero_v)
        )
        out_ref[0, 0, 0, :] = t_best.reshape(-1)
        out_ref[0, 0, 1, :] = jax.lax.bitcast_convert_type(
            tri_best, jnp.float32).reshape(-1)
        out_ref[0, 0, 2, :] = u_best.reshape(-1)
        out_ref[0, 0, 3, :] = v_best.reshape(-1)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _packet_traverse_wide(wnodes, tris, rays, octants, *, interpret=False):
    """wnodes: (8, Nw, 8, 8) f32 slot tiles; tris: (n_leaves, block*9);
    rays: (G, 1, 12, PACKET) f32; octants: (G,) int32."""
    _, n_wide, _, _ = wnodes.shape
    n_leaves, row_w = tris.shape
    block = row_w // 9
    g = rays.shape[0]
    packet = rays.shape[3]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, n_wide, 8, 8),
                         lambda i, octs: (octs[i], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_leaves, row_w), lambda i, octs: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 12, packet),
                         lambda i, octs: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 4, packet),
                               lambda i, octs: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = _make_wide_kernel(n_wide, block, packet, TMIN)
    need = 2 * n_wide * 4096 + n_leaves * 512 + 4 * 1024 * 1024
    vmem_limit = vmem_clamp(need)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, 1, 4, packet), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(octants, wnodes, tris, rays)


def pallas_wide_closest_hit(scene, origin, direction, active=None,
                            interpret=False, seed=None) -> Hit:
    """Closest hit via the 8-wide packet kernel (scene.bvh_wide_*)."""
    n = origin.shape[0]
    n_wide = scene.bvh_wide_nodes.shape[0] // scene.bvh_orders

    octant = (
        (direction[:, 0] < 0).astype(jnp.int32)
        + 2 * (direction[:, 1] < 0).astype(jnp.int32)
        + 4 * (direction[:, 2] < 0).astype(jnp.int32)
    )
    if scene.bvh_orders == 1:
        # Single canonical linearization (octant_order=False): every
        # packet stages block 0 — an octant block index would run off
        # the (1, ...) node array and crash the backend.
        octant = jnp.zeros_like(octant)
    t_lane = jnp.full((n,), jnp.float32(TMAX))
    if active is not None:
        t_lane = jnp.where(active, t_lane, jnp.float32(-1.0))

    pad = (-n) % PACKET
    total = n + pad
    n_groups = total // PACKET

    def pad1(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill)

    st, strif, su, sv = _seed_channels(n, seed)
    rays = jnp.stack(
        [
            pad1(origin[:, 0]), pad1(origin[:, 1]), pad1(origin[:, 2]),
            pad1(direction[:, 0]), pad1(direction[:, 1]),
            pad1(direction[:, 2]),
            pad1(t_lane, -1.0),
            pad1(st, float(MISS_T)),
            pad1(strif, float(
                np.frombuffer(np.int32(-1).tobytes(), dtype=np.float32)[0]
            )),
            pad1(su), pad1(sv),
            jnp.zeros((total,), jnp.float32),
        ],
        axis=0,
    ).reshape(12, n_groups, 1, PACKET).transpose(1, 2, 0, 3)

    group_oct = jnp.pad(octant, (0, pad)).reshape(n_groups, PACKET)[:, 0]

    wnodes = scene.bvh_wide_nodes.reshape(scene.bvh_orders, n_wide, 8, 8)
    out = _packet_traverse_wide(wnodes, scene.tri_blocks, rays, group_oct,
                                interpret=interpret)
    out = out.transpose(2, 0, 1, 3).reshape(4, total)[:, :n]
    t = out[0]
    tri = jax.lax.bitcast_convert_type(out[1], jnp.int32)
    return Hit(t=t, tri=tri, u=out[2], v=out[3])


def wide_fits_vmem(scene, budget_bytes: int = None) -> bool:
    import os

    if budget_bytes is None:
        budget_bytes = int(os.environ.get(
            "VKPT_VMEM_BUDGET", 100 * 1024 * 1024
        ))
    if getattr(scene, "bvh_wide_nodes", None) is None:
        return False
    if scene.tri_blocks is None:
        return False
    n_wide = scene.bvh_wide_nodes.shape[0] // scene.bvh_orders
    node_bytes = n_wide * 4096  # (8 slots, 8->128 lane-padded fields)
    tri_bytes = scene.tri_blocks.shape[0] * 512
    state = 8 * PACKET * 4 * 4 * 2
    return (2 * node_bytes + tri_bytes + state) < budget_bytes


# ---------------------------------------------------------------------------
# Dense-row run kernel: 16 preorder nodes per 128-lane VMEM row.
#
# The binary packet kernel above is per-visit-overhead-bound (~350
# cycles per node: serial scalar loads -> vector slab -> cross-lane
# reduce -> branch) and its (Nn, 8) node rows tile-pad to 512B/node.
# This kernel attacks both:
#
#   - 16 consecutive preorder nodes share one (1, 128) VMEM row
#     (8 f32 fields each), so node storage is 32B/node -- 8x denser --
#     and ALL 8 octant linearizations stay resident (no re-staging on
#     octant switches).  Scene ceiling rises to ~800k triangles.
#   - One loop iteration slab-tests all 16 nodes of the cursor's row
#     (static lane offsets, dynamic sublane row) and then follows the
#     traversal chain through the row with pure scalar selects:
#     descending packets advance up to 16 nodes per serial iteration
#     instead of 1.  Off-chain tests are speculative but harmless --
#     intersections can only be true hits (a triangle hit implies its
#     leaf AABB is hit), so results are identical.
#   - Per-node union-hit flags are extracted 2-per-reduction by
#     packing two 0/1 hit masks as counts (c0 + 4096*c1 <= 2^23, exact
#     in f32) -- 8 reductions per row instead of 16 `any()`s.
#   - Leaf intersection drops the (redundant) per-lane box mask: any
#     Moller-Trumbore hit with t in (tmin, min(t_best, tmax)) is a true
#     closest-hit candidate whether or not the slab test passed.
#
# Semantics parity with the packet kernel / XLA path / brute force is
# unchanged (same MT + slab arithmetic, t==1e32 miss sentinel).
# ---------------------------------------------------------------------------
NODES_PER_ROW = 16

DENSE_PACKET = int(os.environ.get("VKPT_DENSE_PACKET", 2048))


def _make_dense_kernel(n_nodes: int, rows_per_oct: int, block: int,
                       packet: int, C: int, tmin: float,
                       instanced: bool = False, mb_bits: int = 0,
                       staged: bool = False, hbm_leaves: bool = False):
    sub = packet // _LANE
    npr = NODES_PER_ROW

    def kernel(octant_ref, rows_ref, tris_ref, *rest):
        leaf_scratch = leaf_sems = None
        if hbm_leaves:
            rest, leaf_scratch, leaf_sems = rest[:-2], rest[-2], rest[-1]
        if instanced:
            inst_ref, rays_ref, out_ref = rest
        else:
            inst_ref = None
            rays_ref, out_ref = rest
        if staged:
            # One octant's rows staged by the scalar-prefetch index
            # map (re-DMA'd only on octant switches — rays arrive
            # sorted); the block is octant-local.
            base_row = jnp.int32(0)
        else:
            oct_ = octant_ref[pl.program_id(0)]
            base_row = oct_ * rows_per_oct

        comps = []
        for c in range(C):
            comps.append(
                [rays_ref[0, c, i, :].reshape(sub, _LANE) for i in range(12)]
            )

        eps = jnp.float32(1e-20)

        def sinv(d):
            return 1.0 / jnp.where(jnp.abs(d) < eps,
                                   jnp.where(d >= 0, eps, -eps), d)

        inv = [[sinv(comps[c][3]), sinv(comps[c][4]), sinv(comps[c][5])]
               for c in range(C)]
        # Hoisted per-ray slab terms: t_plane = b * inv - o*inv.
        oinv = [[comps[c][0] * inv[c][0],
                 comps[c][1] * inv[c][1],
                 comps[c][2] * inv[c][2]] for c in range(C)]

        t0s = [comps[c][7] for c in range(C)]
        tri0s = [jax.lax.bitcast_convert_type(comps[c][8], jnp.int32)
                 for c in range(C)]
        u0s = [comps[c][9] for c in range(C)]
        v0s = [comps[c][10] for c in range(C)]

        def cond(state):
            nodes = state[0]
            alive = nodes[0] < n_nodes
            for c in range(1, C):
                alive = jnp.logical_or(alive, nodes[c] < n_nodes)
            return alive

        def body(state):
            nodes, tb, trib, ub, vb = state
            new_nodes = []
            tb = list(tb)
            trib = list(trib)
            ub = list(ub)
            vb = list(vb)
            for c in range(C):
                node = nodes[c]
                nd = jnp.minimum(node, n_nodes - 1)
                live = node < n_nodes
                rrel = nd // npr
                row = base_row + rrel
                nbase = rrel * npr
                ox, oy, oz, dx, dy, dz, tl = comps[c][:7]
                ix, iy, iz = inv[c]
                oxi, oyi, ozi = oinv[c]
                t_lim = jnp.minimum(tb[c], tl)

                def slab(j):
                    b = [rows_ref[row, j * 8 + f] for f in range(6)]
                    tx0 = b[0] * ix - oxi
                    tx1 = b[3] * ix - oxi
                    ty0 = b[1] * iy - oyi
                    ty1 = b[4] * iy - oyi
                    tz0 = b[2] * iz - ozi
                    tz1 = b[5] * iz - ozi
                    tn = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.maximum(jnp.minimum(tz0, tz1),
                                    jnp.float32(tmin)),
                    )
                    tf = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.minimum(jnp.maximum(tz0, tz1), t_lim),
                    )
                    return jnp.where(tn <= tf, 1.0, 0.0)

                # Union-hit flags, two nodes per cross-lane reduction:
                # per-lane counts c0 + 4096*c1 stay exact in f32
                # (packet <= 4096 => c0 < 2^12, total < 2^24).
                hits = []
                for jp in range(npr // 2):
                    h = slab(2 * jp) + slab(2 * jp + 1) * jnp.float32(4096.0)
                    s = jnp.sum(h).astype(jnp.int32)
                    hits.append((s & 4095) > 0)
                    hits.append(s >= 4096)

                metas = [rows_ref[row, j * 8 + 6].astype(jnp.int32)
                         for j in range(npr)]
                leafs = [rows_ref[row, j * 8 + 7] for j in range(npr)]

                # Follow the traversal chain through the row with pure
                # scalar selects: at the node the cursor occupies, the
                # successor is skip for leaves (and misses) or the next
                # preorder node for hit internals.  Skips are strictly
                # forward, so one pass over j covers any chain.  The
                # path never depends on leaf intersections (a leaf's
                # successor is always its skip), so on-chain leaf
                # VALUES are recorded into 3 slots during the walk and
                # intersected afterwards -- 3 lax.conds threading the
                # 4-vreg hit state instead of 16.  A 4th on-chain leaf
                # freezes the cursor on itself; the next iteration
                # redoes the row (rare).
                nxt = node
                neg1 = jnp.float32(-1.0)
                lv0 = neg1
                lv1 = neg1
                lv2 = neg1
                for j in range(npr):
                    n_abs = nbase + j
                    is_leaf_j = leafs[j] >= 0.0
                    on = jnp.logical_and(live, nxt == n_abs)
                    hit_leaf = jnp.logical_and(on, is_leaf_j)
                    frozen = jnp.logical_and(hit_leaf, lv2 >= 0.0)
                    take2 = hit_leaf & (lv1 >= 0.0) & (lv2 < 0.0)
                    take1 = hit_leaf & (lv0 >= 0.0) & (lv1 < 0.0)
                    take0 = hit_leaf & (lv0 < 0.0)
                    lv2 = jnp.where(take2, leafs[j], lv2)
                    lv1 = jnp.where(take1, leafs[j], lv1)
                    lv0 = jnp.where(take0, leafs[j], lv0)
                    succ = jnp.where(
                        is_leaf_j, metas[j],
                        jnp.where(hits[j], n_abs + 1, metas[j]),
                    )
                    nxt = jnp.where(on & ~frozen, succ, nxt)

                def leaf_row_of(leaf_i):
                    if instanced:
                        return leaf_i & ((1 << mb_bits) - 1)
                    return leaf_i // block

                if hbm_leaves:
                    # Issue all on-chain leaf-row DMAs up front so MT
                    # of slot s overlaps the copies of s+1.. (the leaf
                    # table lives in HBM; only the 3 visited rows land
                    # in VMEM scratch).
                    for s_, lv_ in enumerate((lv0, lv1, lv2)):
                        @pl.when(lv_ >= 0.0)
                        def _(s_=s_, lv_=lv_):
                            trow = leaf_row_of(lv_.astype(jnp.int32))
                            pltpu.make_async_copy(
                                tris_ref.at[trow],
                                leaf_scratch.at[s_],
                                leaf_sems.at[s_],
                            ).start()

                def make_leaf_case(lv, c=c, slot=0):
                    leaf_i = lv.astype(jnp.int32)

                    def leaf_case(args, leaf_i=leaf_i):
                        t_best, tri_best, u_best, v_best = args
                        ox, oy, oz, dx, dy, dz, tl = comps[c][:7]
                        if instanced:
                            # Packed leaf: (inst << mb_bits | global
                            # mesh block).  Transform the packet into
                            # object space (world t preserved: the
                            # object direction stays unnormalized);
                            # cull on world winding via det_sign.
                            inst = leaf_i >> mb_bits
                            trow = leaf_i & ((1 << mb_bits) - 1)
                            m = [inst_ref[inst, f] for f in range(13)]
                            nox = m[0] * ox + m[1] * oy + m[2] * oz + m[9]
                            noy = m[3] * ox + m[4] * oy + m[5] * oz + m[10]
                            noz = m[6] * ox + m[7] * oy + m[8] * oz + m[11]
                            ndx = m[0] * dx + m[1] * dy + m[2] * dz
                            ndy = m[3] * dx + m[4] * dy + m[5] * dz
                            ndz = m[6] * dx + m[7] * dy + m[8] * dz
                            ox, oy, oz = nox, noy, noz
                            dx, dy, dz = ndx, ndy, ndz
                            det_sign = m[12]
                            tri_base = leaf_i * block
                        else:
                            trow = leaf_i // block
                            det_sign = None
                            tri_base = leaf_i
                        if hbm_leaves:
                            pltpu.make_async_copy(
                                tris_ref.at[trow],
                                leaf_scratch.at[slot],
                                leaf_sems.at[slot],
                            ).wait()
                            tread = lambda base: leaf_scratch[slot, base]
                        else:
                            tread = lambda base: tris_ref[trow, base]
                        for k in range(block):
                            base = k * 9
                            v0x = tread(base + 0)
                            v0y = tread(base + 1)
                            v0z = tread(base + 2)
                            e1x = tread(base + 3)
                            e1y = tread(base + 4)
                            e1z = tread(base + 5)
                            e2x = tread(base + 6)
                            e2y = tread(base + 7)
                            e2z = tread(base + 8)
                            px = dy * e2z - dz * e2y
                            py = dz * e2x - dx * e2z
                            pz = dx * e2y - dy * e2x
                            det = e1x * px + e1y * py + e1z * pz
                            if det_sign is not None:
                                front = det * det_sign > 0.0
                            else:
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
                            t_hi = jnp.minimum(t_best, tl)
                            hit = (front & (u >= 0.0) & (v >= 0.0)
                                   & (u + v <= 1.0) & (t > tmin)
                                   & (t < t_hi))
                            t_best = jnp.where(hit, t, t_best)
                            tri_best = jnp.where(hit, tri_base + k,
                                                 tri_best)
                            u_best = jnp.where(hit, u, u_best)
                            v_best = jnp.where(hit, v, v_best)
                        return t_best, tri_best, u_best, v_best

                    return leaf_case

                tbc, tric, ubc, vbc = tb[c], trib[c], ub[c], vb[c]
                for s_, lv in enumerate((lv0, lv1, lv2)):
                    tbc, tric, ubc, vbc = jax.lax.cond(
                        lv >= 0.0, make_leaf_case(lv, slot=s_),
                        lambda a: a,
                        (tbc, tric, ubc, vbc),
                    )
                tb[c], trib[c], ub[c], vb[c] = tbc, tric, ubc, vbc
                new_nodes.append(jnp.where(live, nxt, node))
            return (tuple(new_nodes), tuple(tb), tuple(trib), tuple(ub),
                    tuple(vb))

        init = (tuple(jnp.int32(0) for _ in range(C)),
                tuple(t0s), tuple(tri0s), tuple(u0s), tuple(v0s))
        _, tb, trib, ub, vb = jax.lax.while_loop(cond, body, init)
        for c in range(C):
            out_ref[0, c, 0, :] = tb[c].reshape(-1)
            out_ref[0, c, 1, :] = jax.lax.bitcast_convert_type(
                trib[c], jnp.float32
            ).reshape(-1)
            out_ref[0, c, 2, :] = ub[c].reshape(-1)
            out_ref[0, c, 3, :] = vb[c].reshape(-1)

    return kernel


@functools.partial(jax.jit, static_argnames=("orders", "interpret",
                                             "mb_bits", "staged",
                                             "hbm_leaves"))
def _dense_traverse(rows, tris, rays, octants, inst_inv=None, *,
                    orders=8, interpret=False, mb_bits=0,
                    staged=False, hbm_leaves=False):
    """rows: (orders*R, 128) f32 dense node rows; tris: (n_leaves,
    block*9) f32; rays: (G, C, 12, PACKET) f32; octants: (G,) int32;
    inst_inv: optional (I, 16) instance inverse transforms (two-level
    scenes).  Returns (G, C, 4, PACKET) f32."""
    total_rows = rows.shape[0]
    rows_per_oct = total_rows // orders
    n_nodes = rows_per_oct * NODES_PER_ROW  # includes exit-padding nodes
    n_leaves, row_w = tris.shape
    block = row_w // 9
    g, C, _, packet = rays.shape
    instanced = inst_inv is not None

    # staged=True: one octant's rows per packet group via the
    # scalar-prefetch index map — 8x less node VMEM, lifting the
    # scene ceiling to ~1M+ triangles on the fast path.
    if staged:
        node_spec = pl.BlockSpec(
            (rows_per_oct, 8 * NODES_PER_ROW),
            lambda i, octs: (octs[i], 0),
            memory_space=pltpu.VMEM,
        )
    else:
        node_spec = pl.BlockSpec(
            (total_rows, 8 * NODES_PER_ROW),
            lambda i, octs: (0, 0),
            memory_space=pltpu.VMEM,
        )
    if hbm_leaves:
        # Leaf table stays in HBM; visited rows are DMA'd into a
        # 3-slot scratch (one per on-chain leaf) per row visit.
        if C != 1:
            raise ValueError("hbm_leaves requires interleave C == 1")
        if row_w % 128:
            # Mosaic requires HBM DMA slices lane-aligned to 128;
            # pad once per call (block above uses the un-padded
            # width).
            tris = jnp.pad(tris, ((0, 0), (0, 128 - row_w % 128)))
            row_w = tris.shape[1]
        tri_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        tri_spec = pl.BlockSpec((n_leaves, row_w),
                                lambda i, octs: (0, 0),
                                memory_space=pltpu.VMEM)
    in_specs = [node_spec, tri_spec]
    args = [octants, rows, tris]
    if instanced:
        in_specs.append(
            pl.BlockSpec(inst_inv.shape, lambda i, octs: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(inst_inv)
    in_specs.append(
        pl.BlockSpec((1, C, 12, packet), lambda i, octs: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    args.append(rays)
    scratch_shapes = []
    if hbm_leaves:
        scratch_shapes = [
            pltpu.VMEM((3, row_w), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, C, 4, packet),
                               lambda i, octs: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
    )
    # Padding nodes carry skip == true Nn, and cursors treat any node
    # id >= n_nodes as done; using the padded count keeps the kernel
    # honest for rays that finish on a padding node.
    kernel = _make_dense_kernel(n_nodes, rows_per_oct, block, packet, C,
                                TMIN, instanced=instanced,
                                mb_bits=mb_bits, staged=staged,
                                hbm_leaves=hbm_leaves)
    node_rows_resident = rows_per_oct * 2 if staged else total_rows
    leaf_resident = 0 if hbm_leaves else n_leaves * 512
    need = node_rows_resident * 512 + leaf_resident + 8 * 1024 * 1024
    if instanced:
        need += inst_inv.shape[0] * 512
    vmem_limit = vmem_clamp(need)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, C, 4, packet), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(*args)


def pallas_dense_closest_hit(scene, origin, direction, active=None,
                             interpret=False, seed=None,
                             packet: int = None, interleave: int = 1,
                             hbm_leaves: bool = None) -> Hit:
    """Closest hit via the dense-row run kernel (scene.bvh_rows).

    ``hbm_leaves``: keep the leaf-triangle table in HBM and DMA the
    up-to-3 visited rows per node row into VMEM scratch (issue all,
    then intersect slot 0 while 1..2 stream in).  Auto-enabled when
    the leaf table would not fit VMEM — this removes the scene-size
    ceiling on the fast path (only the staged node rows must fit)."""
    n = origin.shape[0]
    if packet is None:
        packet = DENSE_PACKET
    if packet > 2048:
        # The row kernel extracts two nodes' union-hit flags per
        # cross-lane reduction as counts c0 + 4096*c1; at packet 4096 a
        # full-packet hit makes c0 == 4096 and collides with c1's
        # weight (measured: silently wrong hits).  c0 <= 2048 keeps the
        # packed value < 2^24 (exact in f32).
        raise ValueError("dense kernel packet must be <= 2048")
    C = interleave

    octant = (
        (direction[:, 0] < 0).astype(jnp.int32)
        + 2 * (direction[:, 1] < 0).astype(jnp.int32)
        + 4 * (direction[:, 2] < 0).astype(jnp.int32)
    )
    if scene.bvh_orders == 1:
        # Single canonical linearization (octant_order=False): every
        # packet stages block 0 — an octant block index would run off
        # the (1, ...) node array and crash the backend.
        octant = jnp.zeros_like(octant)
    t_lane = jnp.full((n,), jnp.float32(TMAX))
    if active is not None:
        t_lane = jnp.where(active, t_lane, jnp.float32(-1.0))

    group = packet * C
    pad = (-n) % group
    total = n + pad
    n_groups = total // group

    def pad1(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill)

    st, strif, su, sv = _seed_channels(n, seed)
    miss_bits = float(
        np.frombuffer(np.int32(-1).tobytes(), dtype=np.float32)[0]
    )
    rays = jnp.stack(
        [
            pad1(origin[:, 0]), pad1(origin[:, 1]), pad1(origin[:, 2]),
            pad1(direction[:, 0]), pad1(direction[:, 1]),
            pad1(direction[:, 2]),
            pad1(t_lane, -1.0),
            pad1(st, float(MISS_T)),
            pad1(strif, miss_bits),
            pad1(su), pad1(sv),
            jnp.zeros((total,), jnp.float32),
        ],
        axis=0,
    ).reshape(12, n_groups, C, packet).transpose(1, 2, 0, 3)

    group_oct = jnp.pad(octant, (0, pad)).reshape(n_groups, group)[:, 0]

    staged = os.environ.get("VKPT_DENSE_STAGED") == "1" or (
        scene.bvh_rows.shape[0] * 512
        + scene.tri_blocks.shape[0] * 512 > 90 * 1024 * 1024
    )
    if hbm_leaves is None:
        hbm_leaves = os.environ.get("VKPT_HBM_LEAVES") == "1" or (
            C == 1 and not dense_fits_vmem(scene)
        )
    if hbm_leaves:
        staged = True
    if getattr(scene, "instanced", False):
        out = _dense_traverse(scene.bvh_rows, scene.tri_blocks, rays,
                              group_oct, scene.inst_inv,
                              orders=scene.bvh_orders,
                              interpret=interpret,
                              mb_bits=scene.mb_bits, staged=staged,
                              hbm_leaves=hbm_leaves)
    else:
        out = _dense_traverse(scene.bvh_rows, scene.tri_blocks, rays,
                              group_oct, orders=scene.bvh_orders,
                              interpret=interpret, staged=staged,
                              hbm_leaves=hbm_leaves)
    out = out.transpose(2, 0, 1, 3).reshape(4, total)[:, :n]
    t = out[0]
    tri = jax.lax.bitcast_convert_type(out[1], jnp.int32)
    return Hit(t=t, tri=tri, u=out[2], v=out[3])


def dense_fits_vmem(scene, budget_bytes: int = None) -> bool:
    """Dense rows are 512B per 16 nodes with no tile waste.  All 8
    octant orders stay resident when they fit (~800k-tri ceiling);
    beyond that _dense_traverse stages ONE octant per packet group
    (double-buffered), lifting the fast-path ceiling to ~1M+ tris
    (the leaf table then dominates VMEM)."""
    import os

    if budget_bytes is None:
        budget_bytes = int(os.environ.get(
            "VKPT_VMEM_BUDGET", 100 * 1024 * 1024
        ))
    if getattr(scene, "bvh_rows", None) is None or scene.tri_blocks is None:
        return False
    if scene.tri_blocks.shape[1] > _LANE:
        return False
    rows_bytes = scene.bvh_rows.shape[0] * 512
    tri_bytes = scene.tri_blocks.shape[0] * 512
    state = 8 * DENSE_PACKET * 4 * 4 * 2
    if (rows_bytes + tri_bytes + state) < budget_bytes:
        return True
    # Staged mode: two octant blocks resident (double buffering).
    staged_rows = (scene.bvh_rows.shape[0] // scene.bvh_orders) * 2 * 512
    return (staged_rows + tri_bytes + state) < budget_bytes


def dense_hbm_fits(scene, budget_bytes: int = None) -> bool:
    """Fast-path feasibility with HBM-streamed leaves: only the two
    staged octant node blocks (+ ray state) must fit VMEM, so the
    scene ceiling moves from ~1M tris (leaf table) to tens of
    millions (node rows at 32B/node)."""
    import os

    if budget_bytes is None:
        budget_bytes = int(os.environ.get(
            "VKPT_VMEM_BUDGET", 100 * 1024 * 1024
        ))
    if getattr(scene, "bvh_rows", None) is None or scene.tri_blocks is None:
        return False
    if scene.tri_blocks.shape[1] > _LANE:
        return False
    staged_rows = (scene.bvh_rows.shape[0] // scene.bvh_orders) * 2 * 512
    state = 8 * DENSE_PACKET * 4 * 4 * 2
    return (staged_rows + state) < budget_bytes
