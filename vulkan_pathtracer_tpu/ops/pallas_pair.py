"""Paired-children packet traversal: a shared-stack BVH2 kernel.

The round-1/2 packet kernel traverses a PREORDER skip-pointer array:
one node per visit, one box test, one cross-lane reduction — and the
~350-cycle load->slab->reduce->branch serial chain per visit is a
measured hardware floor (three latency-hiding structures all lost;
ROADMAP).  This kernel changes what a visit BUYS instead of what it
costs:

- Each (internal) node row stores BOTH children's boxes + links
  (16 floats -> the same 512B tile-padded row the old kernel spent on
  ONE node).  A visit slab-tests two sibling boxes and runs TWO
  cross-lane min-reductions, which pipeline (~108 cycles for the
  pair, per experiments/mosaic_costs.py) — so per node tested, the
  serial-chain cost halves.
- The reductions return the packet-min ENTRY DISTANCE per child, so
  the packet descends the truly nearer child first and pushes the far
  one on a packet-shared scalar stack (SMEM).  Dynamic near-to-far
  ordering replaces the 8 static direction-octant linearizations —
  and with them the 8x node-table duplication: ONE canonical table,
  no octant staging, no scalar-prefetch index map.  The VMEM node
  budget drops 16x vs the staged octant table (Nn/2 rows x 512B),
  lifting the packet-kernel scene ceiling from ~550k to multi-M tris.
- Both-children-miss pops the stack; an empty stack terminates.
  Union semantics (any lane's hit drives descent) and the leaf
  Moller-Trumbore block are IDENTICAL to the preorder kernel, so
  results are bit-exact vs the XLA path / brute force.  Scope: that
  claim holds per DISPATCH (same rays in, same hits out, tested in
  tests/test_pallas.py).  A chunked lax.map trace around the kernel
  is allclose-not-bitexact vs the unchunked program (~2^-18 diffs on
  a few permille of lanes — XLA reassociates the surrounding shading
  arithmetic differently across program shapes; ROADMAP finding 7).

Reference anchor: this replaces the closest-hit scheduling the
driver's RT hardware performs behind traceRayEXT
(ray_gen.rgen:50-63); the stack lives per packet, not per ray,
because traversal is union-based (SIMT lanes never diverge).
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
from vulkan_pathtracer_tpu.ops.pallas_traverse import vmem_clamp

_LANE = 128
STACK_CAP = 96  # >= max tree depth (SAH/LBVH builds are ~2logN; the
# host row builders assert depth <= cap and every *_fits_vmem gate
# rejects deeper scenes — see _stack_depth_ok)
PAIR_BIG = np.float32(3e38)


def _leaf_rows_per_block(block: int):
    """Stored tri-table rows per leaf block, or None if the stack
    kernels cannot run this leaf size.

    A leaf block of B tris is B*9 lanes wide, and Mosaic scalar loads
    need STATIC lane indices < 128 — which capped one-row blocks at 14
    tris (126 lanes) and with them the exact kernels' leaf size, while
    the host sims showed leaf-28 cuts production node visits 2.27x
    (ROADMAP round-3 finding 14).  For B a multiple of 14 the
    (n, B*9) table row-major reshapes — free, no data movement — into
    (n*rpl, 126) sub-rows of 14 tris each (tri k of a leaf lives at
    sub-row k//14, lane (k%14)*9), and the MT loop reads
    tris_ref[leaf*rpl + rr, static_lane]: dynamic SUBLANE indices
    lower fine.  That unlocks the leaf-28 bake for the EXACT kernels,
    which previously only the (measured-dead-end) MXU coefficient
    tier could reach."""
    if block <= 14:
        return 1
    if block % 14 == 0 and block // 14 <= 4:
        return block // 14
    return None


def _split_leaf_table(tris):
    """Validate + split an exact (n_leaves, block*9) leaf table for
    the stack kernels: returns (tris, block, rpl) with the split-row
    reshape applied when block > 14 (see _leaf_rows_per_block).
    Raises for leaf sizes the kernels cannot run."""
    n_leaves, row_w = tris.shape
    block = row_w // 9
    rpl = _leaf_rows_per_block(block)
    if rpl is None:
        raise ValueError(
            f"stack kernels cannot run leaf block {block} "
            f"(needs block <= 14 or a multiple of 14 <= 56)")
    if rpl > 1:
        tris = tris.reshape(n_leaves * rpl, (block // rpl) * 9)
    return tris, block, rpl


def _leaf_copy(tris_ref, leaf_scratch, leaf_sems, row, slot: int,
               rpl: int):
    """Async copy descriptor for one leaf block's rows (HBM-streamed
    leaves): rpl consecutive tri-table rows into the slot's scratch
    rows, one DMA + one semaphore per leaf visit."""
    if rpl == 1:
        return pltpu.make_async_copy(
            tris_ref.at[row], leaf_scratch.at[slot],
            leaf_sems.at[slot])
    return pltpu.make_async_copy(
        tris_ref.at[pl.ds(row * rpl, rpl)],
        leaf_scratch.at[pl.ds(slot * rpl, rpl)],
        leaf_sems.at[slot])


def _stack_depth_ok(scene) -> bool:
    """SMEM stack-capacity gate shared by all *_fits_vmem gates.

    The packet-shared stack holds at most one deferred entry per
    ancestor level for the pair kernel (cap STACK_CAP) and width-1 per
    level for the n-ary kernels (cap (width-1)*STACK_CAP) — both
    bounded by tree depth <= STACK_CAP.  A deeper (degenerate SAH /
    device-built) tree must fall back to the dense/XLA tiers instead
    of silently overflowing SMEM.  Device Karras builds store the
    static bound 34+log2(L) (ops/device_build._depth_bound), under
    the cap at any realistic scale."""
    return 0 < getattr(scene, "bvh_depth", 0) <= STACK_CAP


def _assert_depth(depth: int, what: str) -> None:
    if depth > STACK_CAP:
        raise ValueError(
            f"{what}: tree depth {depth} exceeds the packet-shared "
            f"SMEM stack capacity {STACK_CAP}; use the dense/XLA "
            f"tiers for this scene")


def build_pair_rows(bvh, block: int) -> np.ndarray:
    """(Ni, 16) f32 rows for internal nodes, ordered by preorder rank
    among internals (root = row 0):

      [lo0.xyz, hi0.xyz, lo1.xyz, hi1.xyz, enc0, enc1, 0, 0]

    enc >= 0: child's internal ROW index; enc < 0: leaf, value
    -(leaf_block_row + 1) (leaf_first is block-aligned after
    pad_leaves_to_blocks).
    """
    from vulkan_pathtracer_tpu.ops.bvh import tree_depth

    n = bvh.node_count
    internal = bvh.left_child >= 0
    ni = int(internal.sum())
    if ni == 0:
        raise ValueError("pair rows need an internal root")
    _assert_depth(tree_depth(bvh), "build_pair_rows")
    row_of = np.cumsum(internal) - 1  # preorder rank among internals

    def enc(child):
        if internal[child]:
            return float(row_of[child])
        return -float(bvh.leaf_first[child] // block + 1)

    rows = np.zeros((ni, 16), np.float32)
    idx = np.nonzero(internal)[0]
    for i in idx:
        r = row_of[i]
        l, rr = int(bvh.left_child[i]), int(bvh.right_child[i])
        rows[r, 0:3] = bvh.bmin[l]
        rows[r, 3:6] = bvh.bmax[l]
        rows[r, 6:9] = bvh.bmin[rr]
        rows[r, 9:12] = bvh.bmax[rr]
        rows[r, 12] = enc(l)
        rows[r, 13] = enc(rr)
    return rows


def _nary_collapse(bvh, width: int):
    """Walk the binary tree collapsing log2(width) levels per
    super-node: each super's slots are the descendants ``levels``
    levels down (an early leaf terminates its branch and fills one
    slot directly).  Returns (super_row: node id -> row,
    children: list of (node, [(kind, id), ...]) in row order).

    The walk (DFS, slots expanded left-to-right, internal slots
    pushed in slot order) fixes row numbering: root = row 0."""
    internal = bvh.left_child >= 0
    if not internal[0]:
        raise ValueError("n-ary rows need an internal root")
    levels = width.bit_length() - 1  # 4 -> 2, 8 -> 3

    super_row = {}
    children = []
    stack = [0]
    while stack:
        node = stack.pop()
        if node in super_row:
            continue
        super_row[node] = len(children)
        slots = [int(bvh.left_child[node]), int(bvh.right_child[node])]
        for _ in range(levels - 1):
            nxt = []
            for s in slots:
                if internal[s]:
                    nxt.append(int(bvh.left_child[s]))
                    nxt.append(int(bvh.right_child[s]))
                else:
                    nxt.append(s)
            slots = nxt
        kids = []
        for s in slots:
            if internal[s]:
                kids.append(("super", s))
                stack.append(s)
            else:
                kids.append(("leaf", s))
        children.append((node, kids))
    return super_row, children


def _build_nary_rows(bvh, block: int, width: int) -> np.ndarray:
    """(Nw, 8*width) f32 rows for a width-ary collapse of the binary
    tree.  Layout per row (w = width):

      [lo0,hi0 .. lo{w-1},hi{w-1} (6w), enc0..enc{w-1} (w), pad (w)]

    enc >= 0: child super-node ROW; enc < 0: leaf block row,
    -(row+1); empty slots carry NaN boxes — NaN propagates through
    the slab min/max chain and tn <= tf compares False, so they can
    NEVER hit (an "inverted" lo>hi box would NOT work: per-axis
    min/max re-normalizes it into an infinite slab that always hits).
    """
    from vulkan_pathtracer_tpu.ops.bvh import tree_depth

    _assert_depth(tree_depth(bvh), f"build {width}-ary rows")
    super_row, children = _nary_collapse(bvh, width)
    nw = len(children)
    rows = np.zeros((nw, 8 * width), np.float32)
    rows[:, 0:6 * width] = np.nan    # empty slots: NaN box never hits
    rows[:, 6 * width:7 * width] = -1.0  # unused enc -> dead leaf row 0
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


def build_quad_rows(bvh, block: int) -> np.ndarray:
    """(N4, 32) f32 rows: 4-ary collapse (see _build_nary_rows)."""
    return _build_nary_rows(bvh, block, 4)


def build_oct_rows(bvh, block: int) -> np.ndarray:
    """(N8, 64) f32 rows: 8-ary collapse (see _build_nary_rows).
    Three binary levels fold into one visit — the node table shrinks
    ~2x vs quad and visits drop further, while the extra sibling slab
    tests ride the already-paid per-visit serial chain (the 8
    cross-lane min-reductions pipeline; mosaic_costs: 8 independent
    sums ~108 cyc vs ~100 for one)."""
    return _build_nary_rows(bvh, block, 8)


def build_pair_rows_preorder(bmin, bmax, skip_local, leaf_first
                             ) -> np.ndarray:
    """Pair rows from ONE preorder+skip linearization (numpy).  For a
    binary preorder tree: left(n) = n+1, right(n) = skip(n+1).  Leaf
    enc = -(leaf_value + 1) with leaf_value passed through VERBATIM
    (flat scenes store block-aligned slots; instanced scenes store
    packed (inst << mb_bits | mesh block) values — the kernel's
    instanced flag picks the decoding)."""
    n = bmin.shape[0]
    internal = leaf_first < 0
    ni = int(internal.sum())
    if ni == 0:
        raise ValueError("pair rows need an internal root")
    row_of = np.cumsum(internal) - 1
    rows = np.zeros((ni, 16), np.float32)
    idx = np.nonzero(internal)[0]
    left = idx + 1
    right = skip_local[left]
    _assert_depth(_preorder_depth(internal, left, right),
                  "build_pair_rows_preorder")

    def enc(child):
        if internal[child]:
            return float(row_of[child])
        return -float(leaf_first[child] + 1)

    for i, l, r in zip(idx, left, right):
        rr = row_of[i]
        rows[rr, 0:3] = bmin[l]
        rows[rr, 3:6] = bmax[l]
        rows[rr, 6:9] = bmin[r]
        rows[rr, 9:12] = bmax[r]
        rows[rr, 12] = enc(l)
        rows[rr, 13] = enc(int(r))
    return rows


def _preorder_depth(internal, left, right) -> int:
    """Max depth (root = 1) of a preorder tree given its internal
    nodes' child indices (bounds the SMEM stack the kernels need)."""
    depth = np.zeros(internal.shape[0], np.int32)
    depth[0] = 1
    idx = np.nonzero(internal)[0]
    for i, l, r in zip(idx, left, right):
        depth[l] = depth[r] = depth[i] + 1
    return int(depth.max()) if depth.size else 0


def pair_static_maps_preorder(skip_local, leaf_first):
    """Static (src, enc) maps for device-side pair-row regeneration
    when the preorder topology is fixed and only boxes move (instanced
    transform updates): src (Ni, 2) int32 preorder node ids of each
    internal row's two children; enc (Ni, 2) f32 slot links with the
    SAME encoding as build_pair_rows_preorder (row index for internal
    children, -(leaf_value + 1) verbatim for leaves)."""
    leaf_first = np.asarray(leaf_first)
    internal = leaf_first < 0
    if not internal.any():
        raise ValueError("pair maps need an internal root")
    row_of = np.cumsum(internal) - 1
    idx = np.nonzero(internal)[0]
    left = idx + 1
    right = np.asarray(skip_local)[left]
    src = np.stack([left, right], axis=1).astype(np.int32)
    enc = np.where(internal[src], row_of[src].astype(np.float32),
                   -(leaf_first[src] + 1).astype(np.float32))
    return src, enc.astype(np.float32)


def build_pair_rows_from_maps(bmin, bmax, src, enc):
    """Regenerate (Ni, 16) pair rows from fresh boxes through static
    (src, enc) maps (device twin of build_pair_rows_preorder for
    topology-stable updates, e.g. update_instance_transforms)."""
    li = src[:, 0]
    ri = src[:, 1]
    return jnp.concatenate(
        [
            jnp.take(bmin, li, axis=0), jnp.take(bmax, li, axis=0),
            jnp.take(bmin, ri, axis=0), jnp.take(bmax, ri, axis=0),
            enc, jnp.zeros((src.shape[0], 2), jnp.float32),
        ],
        axis=1,
    )


def _nary_static_maps(bvh, block: int, width: int):
    """Static (src, enc) maps for device-side n-ary-row regeneration
    after refit: src (Nw, w) int32 build-order node ids per slot (-1
    = empty), enc (Nw, w) f32 slot links (same encoding as
    _build_nary_rows).  The collapse topology is box-independent, so
    refit only re-gathers boxes through src."""
    rows = _build_nary_rows(bvh, block, width)
    super_row, children = _nary_collapse(bvh, width)
    nw = len(children)
    src = np.full((nw, width), -1, np.int32)
    for node, kids in children:
        r = super_row[node]
        for s, (_, cid) in enumerate(kids):
            src[r, s] = cid
    enc = rows[:, 6 * width:7 * width].copy()
    return src, enc


def quad_static_maps(bvh, block: int):
    return _nary_static_maps(bvh, block, 4)


def oct_static_maps(bvh, block: int):
    return _nary_static_maps(bvh, block, 8)


def nary_maps_device(left, right, leaf_first, block: int,
                     width: int = 4):
    """Dynamic (src, enc) collapse maps over BUILD-order arrays — the
    device twin of _nary_static_maps for on-device Karras rebuilds,
    whose topology changes every frame (the host maps, and any n-ary
    table built from them, are stale the moment device_rebuild_scene
    runs).  One row per node, internals compacted to the front by
    rank (root = node 0 = row 0); callers slice [:Ni].  Over-allocates
    ~2x vs the host DFS collapse — rows not reachable by grandchild
    links are dead weight the traversal never visits — and pads
    early-leaf branches with EMPTY slots (src -1 -> NaN box, enc -1)
    instead of compacting them, both harmless by the same NaN-slab
    argument as _build_nary_rows."""
    levels = width.bit_length() - 1
    internal = left >= 0
    row_of = jnp.cumsum(internal.astype(jnp.int32)) - 1

    def expand(slots):
        out = []
        for s in slots:
            sv = jnp.maximum(s, 0)
            s_int = jnp.logical_and(s >= 0, jnp.take(internal, sv))
            out.append(jnp.where(s_int, jnp.take(left, sv), s))
            out.append(jnp.where(s_int, jnp.take(right, sv),
                                 jnp.int32(-1)))
        return out

    slots = [left, right]
    for _ in range(levels - 1):
        slots = expand(slots)
    src = jnp.stack(slots, axis=1)
    sv = jnp.maximum(src, 0)
    s_int = jnp.logical_and(src >= 0, jnp.take(internal, sv))
    row = jnp.take(row_of, sv).astype(jnp.float32)
    leaf_val = -(jnp.take(leaf_first, sv) // block
                 + 1).astype(jnp.float32)
    enc = jnp.where(src < 0, jnp.float32(-1.0),
                    jnp.where(s_int, row, leaf_val))
    order = jnp.argsort(jnp.logical_not(internal), stable=True)
    return (jnp.take(src, order, axis=0),
            jnp.take(enc, order, axis=0))


def _build_nary_rows_device(bmin_build, bmax_build, src, enc):
    """Regenerate (Nw, 8w) n-ary rows from refitted BUILD-order boxes
    through the static (src, enc) maps (width inferred from src)."""
    nw, width = src.shape
    valid = src >= 0
    idx = jnp.maximum(src, 0)
    lo = jnp.take(bmin_build, idx.reshape(-1), axis=0).reshape(
        nw, width, 3)
    hi = jnp.take(bmax_build, idx.reshape(-1), axis=0).reshape(
        nw, width, 3)
    nan = jnp.float32(np.nan)
    lo = jnp.where(valid[..., None], lo, nan)
    hi = jnp.where(valid[..., None], hi, nan)
    boxes = jnp.concatenate([lo, hi], axis=2).reshape(nw, 6 * width)
    return jnp.concatenate(
        [boxes, enc, jnp.zeros((nw, width), jnp.float32)], axis=1)


def build_quad_rows_device(bmin_build, bmax_build, src, enc):
    return _build_nary_rows_device(bmin_build, bmax_build, src, enc)


def build_oct_rows_device(bmin_build, bmax_build, src, enc):
    return _build_nary_rows_device(bmin_build, bmax_build, src, enc)


def _mxu_active(scene, allow_instanced: bool = False) -> bool:
    """The MXU leaf tier will be taken by the launchers: no scalar
    leaf loads, so tri rows wider than one lane tile (leaf block > 14)
    are fine — the fit gates must not reject them.  Instanced scenes
    additionally need the per-instance feature-transform tiles
    (mxu_mt.instance_feature_maps) and are only supported by the PAIR
    kernels, which carry the object-space leaf decode — the quad/oct/
    frontier call sites keep the default ``allow_instanced=False``."""
    import os

    if (os.environ.get("VKPT_MT", "exact").lower() != "mxu"
            or getattr(scene, "tri_coefs", None) is None):
        return False
    if scene.instanced:
        return (allow_instanced
                and getattr(scene, "inst_feat", None) is not None)
    return True


def _coef_row_bytes(scene) -> int:
    """VMEM bytes of ONE padded coefficient row.  BOTH dims tile-pad:
    the 10 sublanes round up to 16 (f32 (8,128) tiling) and the lane
    dim to 128-lane tiles (block > 32 spills into a second tile).
    Measured round-4: the un-padded-sublane estimate (5120 B/row)
    said the 246k-tri leaf-14 table fit in VMEM; the real allocation
    was 17604 rows x 8192 B = 137.5 MB > the 128 MB chip."""
    cw = scene.tri_coefs.shape[2]
    sub = -(-scene.tri_coefs.shape[1] // 8) * 8
    return sub * (-(-cw // _LANE) * _LANE) * 4


def _mxu_dispatch(scene, hbm_leaves):
    """Resolve the VKPT_MT env gate for the quad launchers: returns
    (precision | None, hbm_leaves), auto-promoting to HBM-streamed
    coefficient rows when the table would overflow the VMEM budget.
    The single source of truth for activation + promotion (the fit
    gates and both launchers must agree or the dispatcher could pick
    a tier the launcher then re-routes)."""
    import os

    if not _mxu_active(scene):
        return None, hbm_leaves
    from vulkan_pathtracer_tpu.ops.mxu_mt import mxu_precision

    if not hbm_leaves:
        budget = int(os.environ.get("VKPT_VMEM_BUDGET",
                                    100 * 1024 * 1024))
        coef_bytes = scene.tri_coefs.shape[0] * _coef_row_bytes(scene)
        node_bytes = scene.bvh_quad.shape[0] * 512
        hbm_leaves = (coef_bytes + node_bytes
                      + 8 * 1024 * 1024 > budget)
    return mxu_precision(), hbm_leaves


def quad_fits_vmem(scene, budget_bytes: int = None,
                   packet: int = None) -> bool:
    import os

    if budget_bytes is None:
        budget_bytes = int(os.environ.get(
            "VKPT_VMEM_BUDGET", 100 * 1024 * 1024))
    if getattr(scene, "bvh_quad", None) is None or \
            scene.tri_blocks is None or not _stack_depth_ok(scene):
        return False
    mxu = _mxu_active(scene)
    rpl = _leaf_rows_per_block(scene.tri_blocks.shape[1] // 9)
    if rpl is None and not mxu:
        return False
    if packet is None:
        packet = 4096
    state = 8 * packet * 4 * 4 * 2
    leaf_bytes = (scene.tri_coefs.shape[0] * _coef_row_bytes(scene)
                  if mxu else scene.tri_blocks.shape[0] * 512 * rpl)
    need = (scene.bvh_quad.shape[0] * 512 + leaf_bytes + state)
    return need < budget_bytes


def _nary_hbm_fits(scene, table_attr: str, budget_bytes=None,
                   packet: int = None) -> bool:
    """VMEM gate for the HBM-streamed-leaf variant: only the node
    table (+ray state and the width-slot leaf scratch) must be
    resident — the leaf table streams from HBM per visited row."""
    import os

    if budget_bytes is None:
        budget_bytes = int(os.environ.get(
            "VKPT_VMEM_BUDGET", 100 * 1024 * 1024))
    table = getattr(scene, table_attr, None)
    if table is None or scene.tri_blocks is None or \
            not _stack_depth_ok(scene):
        return False
    mxu = table_attr == "bvh_quad" and _mxu_active(scene)
    rpl = _leaf_rows_per_block(scene.tri_blocks.shape[1] // 9)
    if rpl is None and not mxu:
        return False
    if packet is None:
        packet = 4096
    state = 8 * packet * 4 * 4 * 2
    width = table.shape[1] // 8
    slot_bytes = width * (_coef_row_bytes(scene) if mxu
                          else 512 * rpl)
    need = table.shape[0] * 512 + slot_bytes + state
    return need < budget_bytes


def quad_hbm_fits(scene, budget_bytes=None, packet: int = None) -> bool:
    return _nary_hbm_fits(scene, "bvh_quad", budget_bytes, packet)


def oct_hbm_fits(scene, budget_bytes=None, packet: int = None) -> bool:
    return _nary_hbm_fits(scene, "bvh_oct", budget_bytes, packet)


def build_pair_rows_device(bmin, bmax, left, right, leaf_first,
                           block: int):
    """jnp version of build_pair_rows over BUILD-order arrays —
    regenerates the pair table after a device refit or device build
    (topology static, boxes fresh).  Returns (Ni, 16) f32 with Ni
    inferred from the static left/right arrays via shape-stable
    masking (Ni = number of internal nodes, known at trace time from
    the host-built topology)."""
    internal = left >= 0
    row_of = (jnp.cumsum(internal.astype(jnp.int32)) - 1)
    li = jnp.maximum(left, 0)
    ri = jnp.maximum(right, 0)

    def enc(child):
        child_internal = jnp.take(internal, child)
        child_row = jnp.take(row_of, child).astype(jnp.float32)
        leaf_val = -(jnp.take(leaf_first, child) // block
                     + 1).astype(jnp.float32)
        return jnp.where(child_internal, child_row, leaf_val)

    rows_all = jnp.concatenate(
        [
            jnp.take(bmin, li, axis=0), jnp.take(bmax, li, axis=0),
            jnp.take(bmin, ri, axis=0), jnp.take(bmax, ri, axis=0),
            enc(li)[:, None], enc(ri)[:, None],
            jnp.zeros((left.shape[0], 2), jnp.float32),
        ],
        axis=1,
    )
    # Compact internals to the front IN PREORDER-RANK ORDER: build
    # order is preorder, so stable selection preserves rank.  Use a
    # static-shape gather: positions of internals via argsort of
    # (~internal) — stable, internals keep relative order.
    order = jnp.argsort(jnp.logical_not(internal), stable=True)
    return jnp.take(rows_all, order, axis=0)


def _make_pair_kernel(n_rows: int, block: int, packet: int,
                      tmin: float, instanced: bool = False,
                      mb_bits: int = 0, mxu_precision=None,
                      rows_per_leaf: int = 1):
    """``mxu_precision`` non-None switches the leaf phase to the MXU
    coefficient tier (tris_ref: (n_leaves, 10, >=4*block) OBJECT-space
    coefficient rows).  Instanced scenes additionally take ifeat_ref
    (I, 10, 16) feature-transform tiles: the leaf visit becomes TWO
    chained matmuls — feats_obj = A @ feats16_world (replacing the
    exact path's 18-MAC object-space ray transform) then the usual
    coefficient visit, with det_sign scaling for world-winding cull
    (mxu_mt.instance_feature_maps / mt_coef_visit)."""
    sub = packet // _LANE
    mxu = mxu_precision is not None

    def kernel(pairs_ref, tris_ref, *rest):
        ifeat_ref = None
        if instanced and mxu:
            inst_ref, ifeat_ref, rays_ref, out_ref, stack_ref = rest
        elif instanced:
            inst_ref, rays_ref, out_ref, stack_ref = rest
        else:
            inst_ref = None
            rays_ref, out_ref, stack_ref = rest
        comps = [rays_ref[0, 0, i, :].reshape(sub, _LANE)
                 for i in range(12)]
        eps = jnp.float32(1e-20)

        def sinv(d):
            return 1.0 / jnp.where(jnp.abs(d) < eps,
                                   jnp.where(d >= 0, eps, -eps), d)

        ox, oy, oz = comps[0], comps[1], comps[2]
        dx, dy, dz = comps[3], comps[4], comps[5]
        tl = comps[6]
        ix, iy, iz = sinv(dx), sinv(dy), sinv(dz)
        oxi, oyi, ozi = ox * ix, oy * iy, oz * iz
        tnear = jnp.maximum(comps[11], jnp.float32(tmin))

        t0 = comps[7]
        tri0 = jax.lax.bitcast_convert_type(comps[8], jnp.int32)
        u0 = comps[9]
        v0 = comps[10]

        big = jnp.float32(PAIR_BIG)

        def slab(b):
            tx0 = b[0] * ix - oxi
            tx1 = b[3] * ix - oxi
            ty0 = b[1] * iy - oyi
            ty1 = b[4] * iy - oyi
            tz0 = b[2] * iz - ozi
            tz1 = b[5] * iz - ozi
            return (tx0, tx1, ty0, ty1, tz0, tz1)

        def mt_block(leaf_i, args):
            t_best, tri_best, u_best, v_best = args
            mox, moy, moz = ox, oy, oz
            mdx, mdy, mdz = dx, dy, dz
            if instanced:
                # Packed leaf (inst << mb_bits | mesh block): object-
                # space transform, world-winding cull via det_sign —
                # same contract as the packet/dense kernels.
                inst = leaf_i >> mb_bits
                row = leaf_i & ((1 << mb_bits) - 1)
                m = [inst_ref[inst, f_] for f_ in range(13)]
                det_sign = m[12]
                tri_base = leaf_i * block
                nox = m[0] * mox + m[1] * moy + m[2] * moz + m[9]
                noy = m[3] * mox + m[4] * moy + m[5] * moz + m[10]
                noz = m[6] * mox + m[7] * moy + m[8] * moz + m[11]
                ndx = m[0] * mdx + m[1] * mdy + m[2] * mdz
                ndy = m[3] * mdx + m[4] * mdy + m[5] * mdz
                ndz = m[6] * mdx + m[7] * mdy + m[8] * mdz
                mox, moy, moz = nox, noy, noz
                mdx, mdy, mdz = ndx, ndy, ndz
            else:
                row = leaf_i
                det_sign = None
                tri_base = leaf_i * block
            sub_b = block // rows_per_leaf
            for k in range(block):
                rr, kk = divmod(k, sub_b)
                srow = row if rows_per_leaf == 1 \
                    else row * rows_per_leaf + rr
                base = kk * 9
                v0x = tris_ref[srow, base + 0]
                v0y = tris_ref[srow, base + 1]
                v0z = tris_ref[srow, base + 2]
                e1x = tris_ref[srow, base + 3]
                e1y = tris_ref[srow, base + 4]
                e1z = tris_ref[srow, base + 5]
                e2x = tris_ref[srow, base + 6]
                e2y = tris_ref[srow, base + 7]
                e2z = tris_ref[srow, base + 8]
                px = mdy * e2z - mdz * e2y
                py = mdz * e2x - mdx * e2z
                pz = mdx * e2y - mdy * e2x
                det = e1x * px + e1y * py + e1z * pz
                if det_sign is not None:
                    front = det * det_sign > 0.0
                else:
                    front = det > 0.0
                inv_det = 1.0 / jnp.where(front, det, 1.0)
                tx = mox - v0x
                ty = moy - v0y
                tz = moz - v0z
                u = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (mdx * qx + mdy * qy + mdz * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                t_lim = jnp.minimum(t_best, tl)
                hit = (front & (u >= 0.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (t > tmin) & (t >= tnear)
                       & (t < t_lim))
                t_best = jnp.where(hit, t, t_best)
                tri_best = jnp.where(hit, tri_base + k, tri_best)
                u_best = jnp.where(hit, u, u_best)
                v_best = jnp.where(hit, v, v_best)
            return t_best, tri_best, u_best, v_best

        if mxu:
            from vulkan_pathtracer_tpu.ops import mxu_mt

            # Matmul rhs + flat per-ray rows, built ONCE per packet
            # (world space; instanced visits transform the FEATURES,
            # not the rays — one (10,16)x(16,P) matmul per visit).
            feats_w = mxu_mt.packet_features(ox, oy, oz, dx, dy, dz)
            feats16 = (mxu_mt.pad_features16(feats_w)
                       if instanced else None)
            tnear_f = mxu_mt.flatten_rows(tnear)

            def mt_block_mxu(leaf_i, args):
                t_best, tri_best, u_best, v_best = args
                if instanced:
                    inst = leaf_i >> mb_bits
                    row = leaf_i & ((1 << mb_bits) - 1)
                    # Feature transform at HIGHEST: errors here shift
                    # the ray itself and amplify into every t/u/v.
                    feats = jax.lax.dot_general(
                        ifeat_ref[inst], feats16,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    det_sign = inst_ref[inst, 12]
                else:
                    row = leaf_i
                    feats = feats_w
                    det_sign = None
                tlim_f = mxu_mt.flatten_rows(jnp.minimum(t_best, tl))
                tb, trib, ub, vb = mxu_mt.mt_coef_visit(
                    tris_ref[row], feats, tnear_f, tlim_f,
                    leaf_i * block, block, jnp.float32(tmin),
                    mxu_precision, det_sign=det_sign)
                tb_u = mxu_mt.unflatten_rows(tb, sub)
                upd = tb_u < jnp.minimum(t_best, tl)
                return (
                    jnp.where(upd, tb_u, t_best),
                    jnp.where(upd, mxu_mt.unflatten_rows(trib, sub),
                              tri_best),
                    jnp.where(upd, mxu_mt.unflatten_rows(ub, sub),
                              u_best),
                    jnp.where(upd, mxu_mt.unflatten_rows(vb, sub),
                              v_best),
                )

            mt_block = mt_block_mxu

        def cond(state):
            return state[0] >= 0

        def body(state):
            cur, sp, t_best, tri_best, u_best, v_best = state
            f = [pairs_ref[cur, i] for i in range(14)]
            t_lim = jnp.minimum(t_best, tl)

            s0 = slab(f[0:6])
            s1 = slab(f[6:12])

            def entry(s):
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(s[0], s[1]),
                                jnp.minimum(s[2], s[3])),
                    jnp.maximum(jnp.minimum(s[4], s[5]), tnear),
                )
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(s[0], s[1]),
                                jnp.maximum(s[2], s[3])),
                    jnp.minimum(jnp.maximum(s[4], s[5]), t_lim),
                )
                return jnp.where(tn <= tf, tn, big)

            e0 = entry(s0)
            e1 = entry(s1)
            # Two independent cross-lane mins — they pipeline.
            m0 = jnp.min(e0)
            m1 = jnp.min(e1)
            h0 = m0 < big
            h1 = m1 < big

            c0 = f[12]
            c1 = f[13]
            leaf0 = c0 < 0.0
            leaf1 = c1 < 0.0

            # Leaf children intersect immediately (near one first so
            # its t_best tightens the far one's MT window).
            near0 = m0 <= m1
            hits = (t_best, tri_best, u_best, v_best)

            def leaf_mt(cv, hits):
                leaf_i = (-cv).astype(jnp.int32) - 1
                return mt_block(leaf_i, hits)

            def maybe_leaf(h, lf, cv, hits):
                return jax.lax.cond(
                    jnp.logical_and(h, lf),
                    functools.partial(leaf_mt, cv),
                    lambda a: a,
                    hits,
                )

            def first_then_second(hits):
                hits = maybe_leaf(h0, leaf0, c0, hits)
                return maybe_leaf(h1, leaf1, c1, hits)

            def second_then_first(hits):
                hits = maybe_leaf(h1, leaf1, c1, hits)
                return maybe_leaf(h0, leaf0, c0, hits)

            t_best, tri_best, u_best, v_best = jax.lax.cond(
                near0, first_then_second, second_then_first, hits)

            # Internal descend / push.
            i0 = jnp.logical_and(h0, jnp.logical_not(leaf0))
            i1 = jnp.logical_and(h1, jnp.logical_not(leaf1))
            both = jnp.logical_and(i0, i1)
            near_enc = jnp.where(near0, c0, c1).astype(jnp.int32)
            far_enc = jnp.where(near0, c1, c0).astype(jnp.int32)

            @pl.when(both)
            def _():
                stack_ref[sp] = far_enc

            sp_pushed = sp + both.astype(jnp.int32)
            one = jnp.where(i0, c0, c1).astype(jnp.int32)
            desc = jnp.logical_or(i0, i1)
            nxt_desc = jnp.where(both, near_enc, one)

            popped = stack_ref[jnp.maximum(sp_pushed - 1, 0)]
            can_pop = sp_pushed > 0
            cur_new = jnp.where(
                desc, nxt_desc,
                jnp.where(can_pop, popped, jnp.int32(-1)),
            )
            sp_new = jnp.where(desc, sp_pushed,
                               jnp.maximum(sp_pushed - 1, 0))
            return (cur_new, sp_new, t_best, tri_best, u_best, v_best)

        init = (jnp.int32(0), jnp.int32(0), t0, tri0, u0, v0)
        _, _, tb, trib, ub, vb = jax.lax.while_loop(cond, body, init)
        out_ref[0, 0, 0, :] = tb.reshape(-1)
        out_ref[0, 0, 1, :] = jax.lax.bitcast_convert_type(
            trib, jnp.float32).reshape(-1)
        out_ref[0, 0, 2, :] = ub.reshape(-1)
        out_ref[0, 0, 3, :] = vb.reshape(-1)

    return kernel


# Sorting networks on the (scalar) per-slot packet-min keys: width 4
# is the 5-comparator optimum, width 8 is Batcher's odd-even merge
# sort (19 comparators).  Correctness note: a WRONG network would
# only cost perf (far-first pushes), never results — every live slot
# is still pushed and t_lim prunes — but these are exact (unit test).
_SORT_NETS = {
    4: [(0, 1), (2, 3), (0, 2), (1, 3), (1, 2)],
    8: [(0, 1), (2, 3), (4, 5), (6, 7),
        (0, 2), (1, 3), (4, 6), (5, 7),
        (1, 2), (5, 6),
        (0, 4), (1, 5), (2, 6), (3, 7),
        (2, 4), (3, 5),
        (1, 2), (3, 4), (5, 6)],
}


def _make_nary_kernel(n_rows: int, block: int, packet: int,
                      tmin: float, width: int,
                      hbm_leaves: bool = False,
                      mxu_precision=None,
                      rows_per_leaf: int = 1,
                      gated: bool = False):
    """``mxu_precision`` non-None switches the leaf phase to the MXU
    coefficient-matmul tier (ops/mxu_mt.py — RELAXED parity):
    tris_ref then holds (n_leaves, 10, >=4*block) coefficient rows
    instead of (n_leaves, block*9) vertex rows.  ``gated``: vreg-
    granular leaf MT (round 5; requires packet %% 1024 == 0, exact)."""
    sub = packet // _LANE
    mxu = mxu_precision is not None
    if gated:
        assert not mxu, "gated leaf phase is exact-tier only"
        assert sub % 8 == 0, "gated needs packet % 1024 == 0"

    def kernel(quads_ref, tris_ref, rays_ref, out_ref, stack_ref,
               *rest):
        leaf_scratch = leaf_sems = None
        if hbm_leaves:
            leaf_scratch, leaf_sems = rest
        comps = [rays_ref[0, 0, i, :].reshape(sub, _LANE)
                 for i in range(12)]
        eps = jnp.float32(1e-20)

        def sinv(d):
            return 1.0 / jnp.where(jnp.abs(d) < eps,
                                   jnp.where(d >= 0, eps, -eps), d)

        ox, oy, oz = comps[0], comps[1], comps[2]
        dx, dy, dz = comps[3], comps[4], comps[5]
        tl = comps[6]
        ix, iy, iz = sinv(dx), sinv(dy), sinv(dz)
        oxi, oyi, ozi = ox * ix, oy * iy, oz * iz
        tnear = jnp.maximum(comps[11], jnp.float32(tmin))

        t0 = comps[7]
        tri0 = jax.lax.bitcast_convert_type(comps[8], jnp.int32)
        u0 = comps[9]
        v0 = comps[10]
        big = jnp.float32(PAIR_BIG)

        def mt_block(row, args, slot=0, gsl=None, wait=True):
            """gsl: static sublane slice — the MT then runs on that
            vreg group only (gated leaf phase); wait=False skips the
            HBM-slot semaphore wait (the gated caller waits once per
            slot before fanning out groups)."""
            t_best, tri_best, u_best, v_best = args
            tri_base = row * block
            if hbm_leaves:
                # The slot's row DMA was issued when the leaf hit was
                # detected; wait here (MT of earlier slots overlaps
                # the copies of later ones).
                if wait:
                    _leaf_copy(tris_ref, leaf_scratch, leaf_sems, row,
                               slot, rows_per_leaf).wait()
                tread = lambda rr, base: leaf_scratch[
                    slot if rows_per_leaf == 1
                    else slot * rows_per_leaf + rr, base]
            else:
                tread = lambda rr, base: tris_ref[
                    row if rows_per_leaf == 1
                    else row * rows_per_leaf + rr, base]
            if gsl is None:
                gox, goy, goz, gdx, gdy, gdz = ox, oy, oz, dx, dy, dz
                gtl, gtnear = tl, tnear
            else:
                gox, goy, goz = ox[gsl], oy[gsl], oz[gsl]
                gdx, gdy, gdz = dx[gsl], dy[gsl], dz[gsl]
                gtl, gtnear = tl[gsl], tnear[gsl]
            sub_b = block // rows_per_leaf
            for k in range(block):
                rr, kk = divmod(k, sub_b)
                base = kk * 9
                v0x = tread(rr, base + 0)
                v0y = tread(rr, base + 1)
                v0z = tread(rr, base + 2)
                e1x = tread(rr, base + 3)
                e1y = tread(rr, base + 4)
                e1z = tread(rr, base + 5)
                e2x = tread(rr, base + 6)
                e2y = tread(rr, base + 7)
                e2z = tread(rr, base + 8)
                px = gdy * e2z - gdz * e2y
                py = gdz * e2x - gdx * e2z
                pz = gdx * e2y - gdy * e2x
                det = e1x * px + e1y * py + e1z * pz
                front = det > 0.0
                inv_det = 1.0 / jnp.where(front, det, 1.0)
                tx = gox - v0x
                ty = goy - v0y
                tz = goz - v0z
                u = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (gdx * qx + gdy * qy + gdz * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                t_lim = jnp.minimum(t_best, gtl)
                hit = (front & (u >= 0.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (t > tmin) & (t >= gtnear)
                       & (t < t_lim))
                t_best = jnp.where(hit, t, t_best)
                tri_best = jnp.where(hit, tri_base + k, tri_best)
                u_best = jnp.where(hit, u, u_best)
                v_best = jnp.where(hit, v, v_best)
            return t_best, tri_best, u_best, v_best

        if mxu:
            from vulkan_pathtracer_tpu.ops import mxu_mt

            # Matmul rhs + flat per-ray rows, built ONCE per packet.
            feats = mxu_mt.packet_features(ox, oy, oz, dx, dy, dz)
            tnear_f = mxu_mt.flatten_rows(tnear)

            def mt_block_mxu(row, args, slot=0):
                t_best, tri_best, u_best, v_best = args
                if hbm_leaves:
                    pltpu.make_async_copy(
                        tris_ref.at[row],
                        leaf_scratch.at[slot],
                        leaf_sems.at[slot],
                    ).wait()
                    coef = leaf_scratch[slot]
                else:
                    coef = tris_ref[row]
                tlim_f = mxu_mt.flatten_rows(jnp.minimum(t_best, tl))
                tb, trib, ub, vb = mxu_mt.mt_coef_visit(
                    coef, feats, tnear_f, tlim_f, row * block, block,
                    jnp.float32(tmin), mxu_precision)
                tb_u = mxu_mt.unflatten_rows(tb, sub)
                # A candidate exists iff it already beat min(t_best,
                # tl) inside the visit, so the merge predicate is just
                # that compare again (avoids relayouting a bool row).
                upd = tb_u < jnp.minimum(t_best, tl)
                return (
                    jnp.where(upd, tb_u, t_best),
                    jnp.where(upd, mxu_mt.unflatten_rows(trib, sub),
                              tri_best),
                    jnp.where(upd, mxu_mt.unflatten_rows(ub, sub),
                              u_best),
                    jnp.where(upd, mxu_mt.unflatten_rows(vb, sub),
                              v_best),
                )

            mt_block = mt_block_mxu

        def cond(state):
            return state[0] >= 0

        def body(state):
            cur, sp, t_best, tri_best, u_best, v_best = state
            f = [quads_ref[cur, i] for i in range(7 * width)]
            t_lim = jnp.minimum(t_best, tl)

            def entry(s):
                b = f[s * 6:s * 6 + 6]
                tx0 = b[0] * ix - oxi
                tx1 = b[3] * ix - oxi
                ty0 = b[1] * iy - oyi
                ty1 = b[4] * iy - oyi
                tz0 = b[2] * iz - ozi
                tz1 = b[5] * iz - ozi
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1),
                                jnp.minimum(ty0, ty1)),
                    jnp.maximum(jnp.minimum(tz0, tz1), tnear),
                )
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1),
                                jnp.maximum(ty0, ty1)),
                    jnp.minimum(jnp.maximum(tz0, tz1), t_lim),
                )
                return jnp.where(tn <= tf, tn, big)

            es = [entry(s) for s in range(width)]
            # Independent cross-lane mins — they pipeline.
            ms = [jnp.min(e) for e in es]
            encs = [f[6 * width + s] for s in range(width)]
            hits = [m < big for m in ms]
            leafs = [c < 0.0 for c in encs]

            # Leaf slots: MT immediately (fixed slot order).
            if hbm_leaves:
                # Issue every hit-leaf slot's row DMA up front so the
                # MT of slot s overlaps the copies of slots s+1.. (the
                # leaf table lives in HBM; only visited rows land in
                # the width-slot VMEM scratch).
                for s in range(width):
                    @pl.when(jnp.logical_and(hits[s], leafs[s]))
                    def _(s=s):
                        row = (-encs[s]).astype(jnp.int32) - 1
                        _leaf_copy(tris_ref, leaf_scratch, leaf_sems,
                                   row, s, rows_per_leaf).start()
            leaf_hit = [jnp.logical_and(hits[s], leafs[s])
                        for s in range(width)]
            if gated:
                # VREG-GATED leaf phase (round 5): MT runs only on the
                # (8,128) vreg groups with at least one lane passing
                # the leaf's slab test — an EXACT skip (a triangle
                # inside the leaf AABB cannot be hit at a t the slab
                # interval excluded; the ungated kernel already relies
                # on this for whole-packet gating).  Sorted packets
                # concentrate a leaf's interested lanes in a short
                # contiguous span (round-4 span stats), so most groups
                # skip.  Per-group occupancy comes free from the es[s]
                # values the node phase already computed.
                if hbm_leaves:
                    # Wait ONCE per started slot DMA (group conds may
                    # each skip; an unconsumed semaphore would corrupt
                    # the slot's next use).
                    for s in range(width):
                        @pl.when(leaf_hit[s])
                        def _(s=s):
                            row = (-encs[s]).astype(jnp.int32) - 1
                            _leaf_copy(tris_ref, leaf_scratch,
                                       leaf_sems, row, s,
                                       rows_per_leaf).wait()
                any_leaf = leaf_hit[0]
                for s in range(1, width):
                    any_leaf = jnp.logical_or(any_leaf, leaf_hit[s])
                nv = sub // 8

                def leafwork(hb4):
                    t_b, tri_b, u_b, v_b = hb4
                    parts = []
                    for gi in range(nv):
                        gsl = slice(gi * 8, gi * 8 + 8)
                        hb_g = (t_b[gsl], tri_b[gsl], u_b[gsl],
                                v_b[gsl])
                        for s in range(width):
                            occ = jnp.min(es[s][gsl]) < big
                            hb_g = jax.lax.cond(
                                jnp.logical_and(leaf_hit[s], occ),
                                functools.partial(
                                    lambda cv, a, s=s, gsl=gsl:
                                    mt_block(
                                        (-cv).astype(jnp.int32) - 1,
                                        a, slot=s, gsl=gsl,
                                        wait=False),
                                    encs[s]),
                                lambda a: a,
                                hb_g,
                            )
                        parts.append(hb_g)
                    return tuple(
                        jnp.concatenate([p[i] for p in parts])
                        for i in range(4))

                hb = jax.lax.cond(
                    any_leaf, leafwork, lambda a: a,
                    (t_best, tri_best, u_best, v_best))
            else:
                hb = (t_best, tri_best, u_best, v_best)
                for s in range(width):
                    hb = jax.lax.cond(
                        leaf_hit[s],
                        functools.partial(
                            lambda cv, a, s=s: mt_block(
                                (-cv).astype(jnp.int32) - 1, a,
                                slot=s),
                            encs[s]),
                        lambda a: a,
                        hb,
                    )
            t_best, tri_best, u_best, v_best = hb

            # Internal slots: sort (near first) and push far-to-near.
            keys = [jnp.where(
                jnp.logical_and(hits[s], jnp.logical_not(leafs[s])),
                ms[s], big) for s in range(width)]
            ks = list(keys)
            cs = [c.astype(jnp.int32) for c in encs]

            def cswap(a, b):
                lt = ks[a] <= ks[b]
                ka = jnp.where(lt, ks[a], ks[b])
                kb = jnp.where(lt, ks[b], ks[a])
                ca = jnp.where(lt, cs[a], cs[b])
                cb = jnp.where(lt, cs[b], cs[a])
                ks[a], ks[b], cs[a], cs[b] = ka, kb, ca, cb

            for a, b in _SORT_NETS[width]:
                cswap(a, b)

            live = [k < big for k in ks]
            # Push far-to-near: slot width-1 (farthest) at the bottom.
            pos = [None] * width
            p = sp
            for s in range(width - 1, 0, -1):
                pos[s] = p
                p = p + live[s].astype(jnp.int32)
            sp_pushed = p

            for s in range(width - 1, 0, -1):
                @pl.when(live[s])
                def _(s=s):
                    stack_ref[pos[s]] = cs[s]

            desc = live[0]
            popped = stack_ref[jnp.maximum(sp_pushed - 1, 0)]
            can_pop = sp_pushed > 0
            cur_new = jnp.where(
                desc, cs[0],
                jnp.where(can_pop, popped, jnp.int32(-1)))
            sp_new = jnp.where(desc, sp_pushed,
                               jnp.maximum(sp_pushed - 1, 0))
            return (cur_new, sp_new, t_best, tri_best, u_best, v_best)

        init = (jnp.int32(0), jnp.int32(0), t0, tri0, u0, v0)
        _, _, tb, trib, ub, vb = jax.lax.while_loop(cond, body, init)
        out_ref[0, 0, 0, :] = tb.reshape(-1)
        out_ref[0, 0, 1, :] = jax.lax.bitcast_convert_type(
            trib, jnp.float32).reshape(-1)
        out_ref[0, 0, 2, :] = ub.reshape(-1)
        out_ref[0, 0, 3, :] = vb.reshape(-1)

    return kernel


def _make_nary_anyhit_kernel(n_rows: int, block: int, packet: int,
                             tmin: float, width: int,
                             hbm_leaves: bool = False,
                             mxu_precision=None,
                             rows_per_leaf: int = 1,
                             gated: bool = False):
    """ANY-HIT variant of the n-ary stack kernel: per-lane state is a
    single resolved bit instead of (t, tri, u, v).  ``gated``: vreg-
    granular leaf MT (round 5; exact — see _make_nary_kernel).

    Exactness: a lane resolves iff SOME triangle passes the identical
    Moller-Trumbore accept window (t_near, t_limit) the closest-hit
    kernel uses — the hit/miss classification is an order-independent
    OR over per-triangle tests, so it matches the closest-hit kernel's
    ``t < MISS_T`` mask bit-for-bit (tests/test_anyhit.py).

    Why it's fast: resolved lanes stop driving slab descent (their
    entry window collapses to empty), so the packet's visit union
    SHRINKS as lanes find occluders — and a pipelined all-resolved
    reduction terminates the whole packet early instead of refining a
    closest t nobody needs.  Used for zero-emissive last bounces,
    where radiance needs only the sky/miss decision (the TPU analog
    of gl_RayFlagsTerminateOnFirstHitEXT shadow rays — the reference
    pays full closest-hit on its last bounce, ray_gen.rgen:50-63).

    ``mxu_precision`` non-None: MXU coefficient leaf tier (RELAXED
    parity; fully det-scaled — no divisions; see ops/mxu_mt.py).
    """
    sub = packet // _LANE
    mxu = mxu_precision is not None
    if gated:
        assert not mxu, "gated leaf phase is exact-tier only"
        assert sub % 8 == 0, "gated needs packet % 1024 == 0"

    def kernel(quads_ref, tris_ref, rays_ref, out_ref, stack_ref,
               *rest):
        leaf_scratch = leaf_sems = None
        if hbm_leaves:
            leaf_scratch, leaf_sems = rest
        comps = [rays_ref[0, 0, i, :].reshape(sub, _LANE)
                 for i in range(12)]
        eps = jnp.float32(1e-20)

        def sinv(d):
            return 1.0 / jnp.where(jnp.abs(d) < eps,
                                   jnp.where(d >= 0, eps, -eps), d)

        ox, oy, oz = comps[0], comps[1], comps[2]
        dx, dy, dz = comps[3], comps[4], comps[5]
        tl = comps[6]
        ix, iy, iz = sinv(dx), sinv(dy), sinv(dz)
        oxi, oyi, ozi = ox * ix, oy * iy, oz * iz
        tnear = jnp.maximum(comps[11], jnp.float32(tmin))
        big = jnp.float32(PAIR_BIG)

        # Inactive lanes (tl < 0) start resolved so a packet of dead
        # rays terminates on its first visit; callers mask the output
        # with their own active set anyway.
        hit0 = jnp.where(tl < 0.0, jnp.float32(1.0), jnp.float32(0.0))

        def mt_block(row, hitf, slot=0, gsl=None, wait=True):
            if hbm_leaves:
                if wait:
                    _leaf_copy(tris_ref, leaf_scratch, leaf_sems, row,
                               slot, rows_per_leaf).wait()
                tread = lambda rr, base: leaf_scratch[
                    slot if rows_per_leaf == 1
                    else slot * rows_per_leaf + rr, base]
            else:
                tread = lambda rr, base: tris_ref[
                    row if rows_per_leaf == 1
                    else row * rows_per_leaf + rr, base]
            if gsl is None:
                gox, goy, goz, gdx, gdy, gdz = ox, oy, oz, dx, dy, dz
                gtl, gtnear = tl, tnear
            else:
                gox, goy, goz = ox[gsl], oy[gsl], oz[gsl]
                gdx, gdy, gdz = dx[gsl], dy[gsl], dz[gsl]
                gtl, gtnear = tl[gsl], tnear[gsl]
            sub_b = block // rows_per_leaf
            for k in range(block):
                rr, kk = divmod(k, sub_b)
                base = kk * 9
                v0x = tread(rr, base + 0)
                v0y = tread(rr, base + 1)
                v0z = tread(rr, base + 2)
                e1x = tread(rr, base + 3)
                e1y = tread(rr, base + 4)
                e1z = tread(rr, base + 5)
                e2x = tread(rr, base + 6)
                e2y = tread(rr, base + 7)
                e2z = tread(rr, base + 8)
                px = gdy * e2z - gdz * e2y
                py = gdz * e2x - gdx * e2z
                pz = gdx * e2y - gdy * e2x
                det = e1x * px + e1y * py + e1z * pz
                front = det > 0.0
                inv_det = 1.0 / jnp.where(front, det, 1.0)
                tx = gox - v0x
                ty = goy - v0y
                tz = goz - v0z
                u = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (gdx * qx + gdy * qy + gdz * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                # Accept window identical to the closest-hit kernel's
                # FIRST accept (t_best starts at MISS_T > tl): any
                # accepted triangle resolves the lane.
                acc = (front & (u >= 0.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (t > tmin) & (t >= gtnear)
                       & (t < gtl))
                hitf = jnp.maximum(hitf, acc.astype(jnp.float32))
            return hitf

        if mxu:
            from vulkan_pathtracer_tpu.ops import mxu_mt

            feats = mxu_mt.packet_features(ox, oy, oz, dx, dy, dz)
            tnear_f = mxu_mt.flatten_rows(tnear)
            tl_f = mxu_mt.flatten_rows(tl)

            def mt_block_mxu(row, hitf, slot=0):
                if hbm_leaves:
                    pltpu.make_async_copy(
                        tris_ref.at[row],
                        leaf_scratch.at[slot],
                        leaf_sems.at[slot],
                    ).wait()
                    coef = leaf_scratch[slot]
                else:
                    coef = tris_ref[row]
                accf = mxu_mt.mt_coef_visit_anyhit(
                    coef, feats, tnear_f, tl_f, block,
                    jnp.float32(tmin), mxu_precision)
                return jnp.maximum(
                    hitf, mxu_mt.unflatten_rows(accf, sub))

            mt_block = mt_block_mxu

        def cond(state):
            return state[0] >= 0

        def body(state):
            cur, sp, hitf = state
            f = [quads_ref[cur, i] for i in range(7 * width)]
            # Resolved lanes stop driving descent: their slab window
            # collapses (tf < 0 <= tn), shrinking the packet union.
            tl_eff = jnp.where(hitf > 0.5, jnp.float32(-1.0), tl)

            def entry(s):
                b = f[s * 6:s * 6 + 6]
                tx0 = b[0] * ix - oxi
                tx1 = b[3] * ix - oxi
                ty0 = b[1] * iy - oyi
                ty1 = b[4] * iy - oyi
                tz0 = b[2] * iz - ozi
                tz1 = b[5] * iz - ozi
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1),
                                jnp.minimum(ty0, ty1)),
                    jnp.maximum(jnp.minimum(tz0, tz1), tnear),
                )
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1),
                                jnp.maximum(ty0, ty1)),
                    jnp.minimum(jnp.maximum(tz0, tz1), tl_eff),
                )
                return jnp.where(tn <= tf, tn, big)

            es = [entry(s) for s in range(width)]
            # Independent cross-lane reductions — the width mins and
            # the all-resolved min pipeline together (~108 cyc for 8,
            # mosaic_costs).
            ms = [jnp.min(e) for e in es]
            m_res = jnp.min(hitf)
            encs = [f[6 * width + s] for s in range(width)]
            hits = [m < big for m in ms]
            leafs = [c < 0.0 for c in encs]

            if hbm_leaves:
                for s in range(width):
                    @pl.when(jnp.logical_and(hits[s], leafs[s]))
                    def _(s=s):
                        row = (-encs[s]).astype(jnp.int32) - 1
                        _leaf_copy(tris_ref, leaf_scratch, leaf_sems,
                                   row, s, rows_per_leaf).start()
            leaf_hit = [jnp.logical_and(hits[s], leafs[s])
                        for s in range(width)]
            if gated:
                # VREG-GATED leaf phase (see _make_nary_kernel): MT
                # only on groups with a slab-passing lane; exact.
                if hbm_leaves:
                    for s in range(width):
                        @pl.when(leaf_hit[s])
                        def _(s=s):
                            row = (-encs[s]).astype(jnp.int32) - 1
                            _leaf_copy(tris_ref, leaf_scratch,
                                       leaf_sems, row, s,
                                       rows_per_leaf).wait()
                any_leaf = leaf_hit[0]
                for s in range(1, width):
                    any_leaf = jnp.logical_or(any_leaf, leaf_hit[s])
                nv = sub // 8

                def leafwork(hf):
                    parts = []
                    for gi in range(nv):
                        gsl = slice(gi * 8, gi * 8 + 8)
                        hf_g = hf[gsl]
                        for s in range(width):
                            occ = jnp.min(es[s][gsl]) < big
                            hf_g = jax.lax.cond(
                                jnp.logical_and(leaf_hit[s], occ),
                                functools.partial(
                                    lambda cv, h, s=s, gsl=gsl:
                                    mt_block(
                                        (-cv).astype(jnp.int32) - 1,
                                        h, slot=s, gsl=gsl,
                                        wait=False),
                                    encs[s]),
                                lambda h: h,
                                hf_g,
                            )
                        parts.append(hf_g)
                    return jnp.concatenate(parts)

                hitf = jax.lax.cond(any_leaf, leafwork, lambda h: h,
                                    hitf)
            else:
                for s in range(width):
                    hitf = jax.lax.cond(
                        leaf_hit[s],
                        functools.partial(
                            lambda cv, h, s=s: mt_block(
                                (-cv).astype(jnp.int32) - 1, h,
                                slot=s),
                            encs[s]),
                        lambda h: h,
                        hitf,
                    )

            keys = [jnp.where(
                jnp.logical_and(hits[s], jnp.logical_not(leafs[s])),
                ms[s], big) for s in range(width)]
            ks = list(keys)
            cs = [c.astype(jnp.int32) for c in encs]

            def cswap(a, b):
                lt = ks[a] <= ks[b]
                ka = jnp.where(lt, ks[a], ks[b])
                kb = jnp.where(lt, ks[b], ks[a])
                ca = jnp.where(lt, cs[a], cs[b])
                cb = jnp.where(lt, cs[b], cs[a])
                ks[a], ks[b], cs[a], cs[b] = ka, kb, ca, cb

            for a, b in _SORT_NETS[width]:
                cswap(a, b)

            live = [k < big for k in ks]
            pos = [None] * width
            p = sp
            for s in range(width - 1, 0, -1):
                pos[s] = p
                p = p + live[s].astype(jnp.int32)
            sp_pushed = p

            for s in range(width - 1, 0, -1):
                @pl.when(live[s])
                def _(s=s):
                    stack_ref[pos[s]] = cs[s]

            desc = live[0]
            popped = stack_ref[jnp.maximum(sp_pushed - 1, 0)]
            can_pop = sp_pushed > 0
            cur_new = jnp.where(
                desc, cs[0],
                jnp.where(can_pop, popped, jnp.int32(-1)))
            # All-resolved early exit (one visit of lag: m_res was
            # read before this visit's MT — conservative, never skips
            # an unresolved lane).
            cur_new = jnp.where(m_res > 0.5, jnp.int32(-1), cur_new)
            sp_new = jnp.where(desc, sp_pushed,
                               jnp.maximum(sp_pushed - 1, 0))
            return (cur_new, sp_new, hitf)

        init = (jnp.int32(0), jnp.int32(0), hit0)
        _, _, hb = jax.lax.while_loop(cond, body, init)
        # Proven output block shape (4, packet): the closest-hit
        # kernels compile with it on real Mosaic; rows 1-3 are unused.
        flat = hb.reshape(-1)
        out_ref[0, 0, 0, :] = flat
        out_ref[0, 0, 1, :] = flat
        out_ref[0, 0, 2, :] = flat
        out_ref[0, 0, 3, :] = flat

    return kernel


def _make_pair_anyhit_kernel(n_rows: int, block: int, packet: int,
                             tmin: float, instanced: bool = False,
                             mb_bits: int = 0, mxu_precision=None,
                             rows_per_leaf: int = 1):
    """ANY-HIT variant of the pair (BVH2 shared-stack) kernel — the
    instanced-capable tier (object-space MT per leaf visit, same
    contract as _make_pair_kernel).  See _make_nary_anyhit_kernel for
    the resolved-bit semantics and exactness argument.
    ``mxu_precision`` non-None: MXU coefficient leaf tier (RELAXED
    parity, fully det-scaled); instanced scenes take ifeat_ref like
    _make_pair_kernel."""
    sub = packet // _LANE
    mxu = mxu_precision is not None

    def kernel(pairs_ref, tris_ref, *rest):
        ifeat_ref = None
        if instanced and mxu:
            inst_ref, ifeat_ref, rays_ref, out_ref, stack_ref = rest
        elif instanced:
            inst_ref, rays_ref, out_ref, stack_ref = rest
        else:
            inst_ref = None
            rays_ref, out_ref, stack_ref = rest
        comps = [rays_ref[0, 0, i, :].reshape(sub, _LANE)
                 for i in range(12)]
        eps = jnp.float32(1e-20)

        def sinv(d):
            return 1.0 / jnp.where(jnp.abs(d) < eps,
                                   jnp.where(d >= 0, eps, -eps), d)

        ox, oy, oz = comps[0], comps[1], comps[2]
        dx, dy, dz = comps[3], comps[4], comps[5]
        tl = comps[6]
        ix, iy, iz = sinv(dx), sinv(dy), sinv(dz)
        oxi, oyi, ozi = ox * ix, oy * iy, oz * iz
        tnear = jnp.maximum(comps[11], jnp.float32(tmin))
        big = jnp.float32(PAIR_BIG)
        hit0 = jnp.where(tl < 0.0, jnp.float32(1.0), jnp.float32(0.0))

        def mt_block(leaf_i, hitf):
            mox, moy, moz = ox, oy, oz
            mdx, mdy, mdz = dx, dy, dz
            if instanced:
                inst = leaf_i >> mb_bits
                row = leaf_i & ((1 << mb_bits) - 1)
                m = [inst_ref[inst, f_] for f_ in range(13)]
                det_sign = m[12]
                nox = m[0] * mox + m[1] * moy + m[2] * moz + m[9]
                noy = m[3] * mox + m[4] * moy + m[5] * moz + m[10]
                noz = m[6] * mox + m[7] * moy + m[8] * moz + m[11]
                ndx = m[0] * mdx + m[1] * mdy + m[2] * mdz
                ndy = m[3] * mdx + m[4] * mdy + m[5] * mdz
                ndz = m[6] * mdx + m[7] * mdy + m[8] * mdz
                mox, moy, moz = nox, noy, noz
                mdx, mdy, mdz = ndx, ndy, ndz
            else:
                row = leaf_i
                det_sign = None
            sub_b = block // rows_per_leaf
            for k in range(block):
                rr, kk = divmod(k, sub_b)
                srow = row if rows_per_leaf == 1 \
                    else row * rows_per_leaf + rr
                base = kk * 9
                v0x = tris_ref[srow, base + 0]
                v0y = tris_ref[srow, base + 1]
                v0z = tris_ref[srow, base + 2]
                e1x = tris_ref[srow, base + 3]
                e1y = tris_ref[srow, base + 4]
                e1z = tris_ref[srow, base + 5]
                e2x = tris_ref[srow, base + 6]
                e2y = tris_ref[srow, base + 7]
                e2z = tris_ref[srow, base + 8]
                px = mdy * e2z - mdz * e2y
                py = mdz * e2x - mdx * e2z
                pz = mdx * e2y - mdy * e2x
                det = e1x * px + e1y * py + e1z * pz
                if det_sign is not None:
                    front = det * det_sign > 0.0
                else:
                    front = det > 0.0
                inv_det = 1.0 / jnp.where(front, det, 1.0)
                tx = mox - v0x
                ty = moy - v0y
                tz = moz - v0z
                u = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (mdx * qx + mdy * qy + mdz * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                acc = (front & (u >= 0.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (t > tmin) & (t >= tnear)
                       & (t < tl))
                hitf = jnp.maximum(hitf, acc.astype(jnp.float32))
            return hitf

        if mxu:
            from vulkan_pathtracer_tpu.ops import mxu_mt

            feats_w = mxu_mt.packet_features(ox, oy, oz, dx, dy, dz)
            feats16 = (mxu_mt.pad_features16(feats_w)
                       if instanced else None)
            tnear_f = mxu_mt.flatten_rows(tnear)
            tl_f = mxu_mt.flatten_rows(tl)

            def mt_block_mxu(leaf_i, hitf):
                if instanced:
                    inst = leaf_i >> mb_bits
                    row = leaf_i & ((1 << mb_bits) - 1)
                    feats = jax.lax.dot_general(
                        ifeat_ref[inst], feats16,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    det_sign = inst_ref[inst, 12]
                else:
                    row = leaf_i
                    feats = feats_w
                    det_sign = None
                accf = mxu_mt.mt_coef_visit_anyhit(
                    tris_ref[row], feats, tnear_f, tl_f, block,
                    jnp.float32(tmin), mxu_precision,
                    det_sign=det_sign)
                return jnp.maximum(
                    hitf, mxu_mt.unflatten_rows(accf, sub))

            mt_block = mt_block_mxu

        def cond(state):
            return state[0] >= 0

        def body(state):
            cur, sp, hitf = state
            f = [pairs_ref[cur, i] for i in range(14)]
            tl_eff = jnp.where(hitf > 0.5, jnp.float32(-1.0), tl)

            def slab(b):
                tx0 = b[0] * ix - oxi
                tx1 = b[3] * ix - oxi
                ty0 = b[1] * iy - oyi
                ty1 = b[4] * iy - oyi
                tz0 = b[2] * iz - ozi
                tz1 = b[5] * iz - ozi
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1),
                                jnp.minimum(ty0, ty1)),
                    jnp.maximum(jnp.minimum(tz0, tz1), tnear),
                )
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1),
                                jnp.maximum(ty0, ty1)),
                    jnp.minimum(jnp.maximum(tz0, tz1), tl_eff),
                )
                return jnp.where(tn <= tf, tn, big)

            e0 = slab(f[0:6])
            e1 = slab(f[6:12])
            m0 = jnp.min(e0)
            m1 = jnp.min(e1)
            m_res = jnp.min(hitf)
            h0 = m0 < big
            h1 = m1 < big
            c0 = f[12]
            c1 = f[13]
            leaf0 = c0 < 0.0
            leaf1 = c1 < 0.0

            def maybe_leaf(h, lf, cv, hitf):
                return jax.lax.cond(
                    jnp.logical_and(h, lf),
                    lambda hf: mt_block((-cv).astype(jnp.int32) - 1, hf),
                    lambda hf: hf,
                    hitf,
                )

            hitf = maybe_leaf(h0, leaf0, c0, hitf)
            hitf = maybe_leaf(h1, leaf1, c1, hitf)

            i0 = jnp.logical_and(h0, jnp.logical_not(leaf0))
            i1 = jnp.logical_and(h1, jnp.logical_not(leaf1))
            both = jnp.logical_and(i0, i1)
            near0 = m0 <= m1
            near_enc = jnp.where(near0, c0, c1).astype(jnp.int32)
            far_enc = jnp.where(near0, c1, c0).astype(jnp.int32)

            @pl.when(both)
            def _():
                stack_ref[sp] = far_enc

            sp_pushed = sp + both.astype(jnp.int32)
            one = jnp.where(i0, c0, c1).astype(jnp.int32)
            desc = jnp.logical_or(i0, i1)
            nxt_desc = jnp.where(both, near_enc, one)

            popped = stack_ref[jnp.maximum(sp_pushed - 1, 0)]
            can_pop = sp_pushed > 0
            cur_new = jnp.where(
                desc, nxt_desc,
                jnp.where(can_pop, popped, jnp.int32(-1)),
            )
            cur_new = jnp.where(m_res > 0.5, jnp.int32(-1), cur_new)
            sp_new = jnp.where(desc, sp_pushed,
                               jnp.maximum(sp_pushed - 1, 0))
            return (cur_new, sp_new, hitf)

        init = (jnp.int32(0), jnp.int32(0), hit0)
        _, _, hb = jax.lax.while_loop(cond, body, init)
        # Proven output block shape (4, packet): the closest-hit
        # kernels compile with it on real Mosaic; rows 1-3 are unused.
        flat = hb.reshape(-1)
        out_ref[0, 0, 0, :] = flat
        out_ref[0, 0, 1, :] = flat
        out_ref[0, 0, 2, :] = flat
        out_ref[0, 0, 3, :] = flat

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "mb_bits",
                                              "mxu"))
def _pair_anyhit(pairs, tris, rays, inst_inv=None, inst_feat=None, *,
                 interpret=False, mb_bits=0, mxu=None):
    """Any-hit launch on the pair table; output one row per packet.
    ``mxu``/``inst_feat``: same contract as _pair_traverse."""
    n_rows = pairs.shape[0]
    if mxu:
        n_leaves, _, cw = tris.shape
        block = cw // 4
        if cw % _LANE:
            tris = jnp.pad(tris, ((0, 0), (0, 0),
                                  (0, _LANE - cw % _LANE)))
        tri_spec = pl.BlockSpec(tris.shape, lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        leaf_bytes = n_leaves * 10 * tris.shape[2] * 4
        rpl = 1
    else:
        n_leaves = tris.shape[0]
        tris, block, rpl = _split_leaf_table(tris)
        tri_spec = pl.BlockSpec(tris.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        leaf_bytes = n_leaves * 512 * rpl
    g, _, _, packet = rays.shape
    instanced = inst_inv is not None

    in_specs = [
        pl.BlockSpec((n_rows, 16), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        tri_spec,
    ]
    args = [pairs, tris]
    if instanced:
        in_specs.append(
            pl.BlockSpec(inst_inv.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM))
        args.append(inst_inv)
        if mxu:
            in_specs.append(
                pl.BlockSpec(inst_feat.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM))
            args.append(inst_feat)
    in_specs.append(
        pl.BlockSpec((1, 1, 12, packet), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM))
    args.append(rays)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 4, packet), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((STACK_CAP,), jnp.int32)],
    )
    kernel = _make_pair_anyhit_kernel(n_rows, block, packet, TMIN,
                                      instanced=instanced,
                                      mb_bits=mb_bits,
                                      mxu_precision=mxu,
                                      rows_per_leaf=rpl)
    need = (n_rows * 512 + leaf_bytes
            + (12 if mxu else 4) * 1024 * 1024)
    if instanced:
        need += inst_inv.shape[0] * 512
        if mxu:
            need += inst_feat.shape[0] * 10 * _LANE * 4
    vmem_limit = vmem_clamp(need)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, 1, 4, packet), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(*args)


def pallas_pair_any_hit(scene, origin, direction, active=None,
                        interpret=False, packet: int = None
                        ) -> jnp.ndarray:
    """Any-hit query via the pair-stack kernel — carries the instanced
    object-space leaf decode, so two-level scenes get the emissive-free
    last-bounce fast path too."""
    n = origin.shape[0]
    if packet is None:
        packet = int(os.environ.get("VKPT_PAIR_PACKET", "3072"))
    t_lane = jnp.full((n,), jnp.float32(TMAX))
    if active is not None:
        t_lane = jnp.where(active, t_lane, jnp.float32(-1.0))
    pad = (-n) % packet
    total = n + pad
    g = total // packet

    def pad1(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill)

    zeros = jnp.zeros((n,), jnp.float32)
    rays = jnp.stack(
        [
            pad1(origin[:, 0]), pad1(origin[:, 1]), pad1(origin[:, 2]),
            pad1(direction[:, 0]), pad1(direction[:, 1]),
            pad1(direction[:, 2]),
            pad1(t_lane, -1.0),
            pad1(zeros), pad1(zeros), pad1(zeros), pad1(zeros),
            pad1(zeros),
        ],
        axis=0,
    ).reshape(12, g, 1, packet).transpose(1, 2, 0, 3)

    inst = scene.inst_inv if getattr(scene, "instanced", False) else None
    mxu = None
    ifeat = None
    if _mxu_active(scene, allow_instanced=True):
        from vulkan_pathtracer_tpu.ops.mxu_mt import mxu_precision

        mxu = mxu_precision()
        if inst is not None:
            ifeat = scene.inst_feat
    tri_table = scene.tri_coefs if mxu else scene.tri_blocks
    out = _pair_anyhit(scene.bvh_pair, tri_table, rays, inst, ifeat,
                       interpret=interpret,
                       mb_bits=getattr(scene, "mb_bits", 0),
                       mxu=mxu)
    hit = out[:, 0, 0, :].reshape(g * packet)[:n] > 0.5
    if active is not None:
        hit = hit & active
    return hit


@functools.partial(jax.jit,
                   static_argnames=("interpret", "hbm_leaves", "mxu",
                                    "gated"))
def _nary_anyhit(nodes, tris, rays, *, interpret=False,
                 hbm_leaves=False, mxu=None, gated=False):
    """Any-hit launch: same table/ray layout as _nary_traverse, output
    is one row per packet (resolved flag, 1.0/0.0).  ``mxu``: a
    jax.lax.Precision — tris is then the coefficient table and the
    leaf phase runs on the MXU (see _nary_traverse)."""
    n_rows, node_w = nodes.shape
    width = node_w // 8
    if mxu:
        n_leaves, ten, cw = tris.shape
        block = cw // 4
        if cw % _LANE:
            tris = jnp.pad(tris, ((0, 0), (0, 0),
                                  (0, _LANE - cw % _LANE)))
        row_w = tris.shape[2]
        leaf_row_bytes = 10 * row_w * 4
        rpl = 1
    else:
        n_leaves = tris.shape[0]
        tris, block, rpl = _split_leaf_table(tris)
        row_w = tris.shape[1]
    g, _, _, packet = rays.shape

    if hbm_leaves:
        if not mxu and row_w % _LANE:
            tris = jnp.pad(tris, ((0, 0), (0, _LANE - row_w % _LANE)))
            row_w = tris.shape[1]
        tri_spec = pl.BlockSpec(memory_space=pl.ANY)
    elif mxu:
        tri_spec = pl.BlockSpec((n_leaves, 10, row_w),
                                lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        tri_spec = pl.BlockSpec(tris.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
    scratch_shapes = [
        pltpu.SMEM(((width - 1) * STACK_CAP,), jnp.int32)]
    if hbm_leaves:
        slot_shape = ((width, 10, row_w) if mxu
                      else (width * rpl, row_w))
        scratch_shapes += [
            pltpu.VMEM(slot_shape, jnp.float32),
            pltpu.SemaphoreType.DMA((width,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((n_rows, node_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            tri_spec,
            pl.BlockSpec((1, 1, 12, packet), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 4, packet), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
    )
    kernel = _make_nary_anyhit_kernel(n_rows, block, packet, TMIN,
                                      width, hbm_leaves=hbm_leaves,
                                      mxu_precision=mxu,
                                      rows_per_leaf=rpl, gated=gated)
    leaf_row_cost = leaf_row_bytes if mxu else 512 * rpl
    leaf_resident = 0 if hbm_leaves else n_leaves * leaf_row_cost
    # The MXU tier materializes a (4*block->128, packet) matmul result
    # (+ det-scaled slices) per leaf visit — budget extra scratch.
    margin = (12 if mxu else 4) * 1024 * 1024
    need = n_rows * 512 + leaf_resident + margin
    vmem_limit = vmem_clamp(need)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, 1, 4, packet), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(nodes, tris, rays)


def pallas_quad_any_hit(scene, origin, direction, active=None,
                        interpret=False, packet: int = None,
                        hbm_leaves: bool = False,
                        gated: bool = False) -> jnp.ndarray:
    """Any-hit (occlusion) query via the 4-wide stack kernel: returns
    a (N,) bool — True iff the closest-hit kernel would report a hit
    (t < MISS_T) for that lane.  Inactive lanes return False.

    VKPT_MT=mxu + baked scene.tri_coefs: MXU coefficient leaf tier
    (relaxed parity; see pallas_quad_closest_hit)."""
    n = origin.shape[0]
    if packet is None:
        packet = int(os.environ.get("VKPT_QUAD_PACKET", "3072"))
    mxu, hbm_leaves = _mxu_dispatch(scene, hbm_leaves)
    t_lane = jnp.full((n,), jnp.float32(TMAX))
    if active is not None:
        t_lane = jnp.where(active, t_lane, jnp.float32(-1.0))
    pad = (-n) % packet
    total = n + pad
    g = total // packet

    def pad1(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill)

    zeros = jnp.zeros((n,), jnp.float32)
    rays = jnp.stack(
        [
            pad1(origin[:, 0]), pad1(origin[:, 1]), pad1(origin[:, 2]),
            pad1(direction[:, 0]), pad1(direction[:, 1]),
            pad1(direction[:, 2]),
            pad1(t_lane, -1.0),   # pad lanes: inactive -> pre-resolved
            pad1(zeros), pad1(zeros), pad1(zeros), pad1(zeros),
            pad1(zeros),
        ],
        axis=0,
    ).reshape(12, g, 1, packet).transpose(1, 2, 0, 3)

    tri_table = scene.tri_coefs if mxu else scene.tri_blocks
    out = _nary_anyhit(scene.bvh_quad, tri_table, rays,
                       interpret=interpret, hbm_leaves=hbm_leaves,
                       mxu=mxu,
                       gated=gated and not mxu and packet % 1024 == 0)
    hitf = out[:, 0, 0, :].reshape(g * packet)[:n]
    hit = hitf > 0.5
    if active is not None:
        hit = hit & active
    return hit


@functools.partial(jax.jit,
                   static_argnames=("interpret", "hbm_leaves", "mxu",
                                    "gated"))
def _nary_traverse(nodes, tris, rays, *, interpret=False,
                   hbm_leaves=False, mxu=None, gated=False):
    """nodes: (Nw, 8*width) f32 (width inferred from the row width);
    tris: (n_leaves, block*9); rays: (G, 1, 12, PACKET).  Returns
    (G, 1, 4, PACKET).  ``hbm_leaves``: keep the leaf table in HBM
    and DMA visited rows into a width-slot VMEM scratch — lifts the
    stack-kernel scene ceiling past the VMEM leaf-table limit.
    ``mxu``: a jax.lax.Precision — tris is then the (n_leaves, 10,
    4*block) coefficient table and the leaf phase runs on the MXU at
    that matmul precision (ops/mxu_mt.py; RELAXED parity, opt-in via
    VKPT_MT=mxu).  Passed as a static arg (not read from env here) so
    precision A/Bs retrace."""
    n_rows, node_w = nodes.shape
    width = node_w // 8
    mxu_precision = mxu
    if mxu:
        n_leaves, ten, cw = tris.shape
        block = cw // 4
        if cw % _LANE:
            # Lane-align the coefficient rows once per call: required
            # for HBM DMA slices, and the natural (zero-coefficient =>
            # det 0, unhittable) padding for the matmul either way.
            tris = jnp.pad(tris, ((0, 0), (0, 0),
                                  (0, _LANE - cw % _LANE)))
        row_w = tris.shape[2]
        leaf_row_bytes = 10 * row_w * 4
        rpl = 1
    else:
        n_leaves = tris.shape[0]
        tris, block, rpl = _split_leaf_table(tris)
        row_w = tris.shape[1]
    g, _, _, packet = rays.shape

    if hbm_leaves:
        if not mxu and row_w % _LANE:
            # Mosaic requires HBM DMA slices lane-aligned to 128
            # ("Slice shape along dimension 1 must be aligned to
            # tiling"); pad the table once per call — one XLA pad op
            # (~0.2 ms at 74 MB), dwarfed by traversal.  block was
            # computed from the un-padded width above.
            tris = jnp.pad(tris, ((0, 0), (0, _LANE - row_w % _LANE)))
            row_w = tris.shape[1]
        tri_spec = pl.BlockSpec(memory_space=pl.ANY)
    elif mxu:
        tri_spec = pl.BlockSpec((n_leaves, 10, row_w),
                                lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        tri_spec = pl.BlockSpec(tris.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
    scratch_shapes = [
        pltpu.SMEM(((width - 1) * STACK_CAP,), jnp.int32)]
    if hbm_leaves:
        slot_shape = ((width, 10, row_w) if mxu
                      else (width * rpl, row_w))
        scratch_shapes += [
            pltpu.VMEM(slot_shape, jnp.float32),
            pltpu.SemaphoreType.DMA((width,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((n_rows, node_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            tri_spec,
            pl.BlockSpec((1, 1, 12, packet), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 4, packet), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
    )
    kernel = _make_nary_kernel(n_rows, block, packet, TMIN, width,
                               hbm_leaves=hbm_leaves,
                               mxu_precision=mxu_precision,
                               rows_per_leaf=rpl, gated=gated)
    leaf_row_cost = leaf_row_bytes if mxu else 512 * rpl
    leaf_resident = 0 if hbm_leaves else n_leaves * leaf_row_cost
    # The MXU tier materializes a (4*block->128, packet) matmul result
    # (+ det-scaled slices) per leaf visit — budget extra scratch.
    margin = (12 if mxu else 4) * 1024 * 1024
    need = n_rows * 512 + leaf_resident + margin
    vmem_limit = vmem_clamp(need)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, 1, 4, packet), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(nodes, tris, rays)


def pallas_quad_closest_hit(scene, origin, direction, active=None,
                            interpret=False, seed=None,
                            packet: int = None,
                            hbm_leaves: bool = False,
                            gated: bool = False) -> Hit:
    """Closest hit via the 4-wide pair-stack kernel (bvh_quad).

    VKPT_MT=mxu + a baked ``scene.tri_coefs`` switch the leaf phase
    to the MXU coefficient tier (ops/mxu_mt.py; RELAXED parity,
    non-instanced scenes only).  The 10x-wider coefficient rows are
    auto-promoted to HBM streaming when they no longer fit VMEM.
    """
    from vulkan_pathtracer_tpu.ops.pallas_traverse import _seed_channels

    n = origin.shape[0]
    if packet is None:
        packet = int(os.environ.get("VKPT_QUAD_PACKET", "3072"))
    mxu, hbm_leaves = _mxu_dispatch(scene, hbm_leaves)
    t_lane = jnp.full((n,), jnp.float32(TMAX))
    if active is not None:
        t_lane = jnp.where(active, t_lane, jnp.float32(-1.0))
    pad = (-n) % packet
    total = n + pad
    g = total // packet

    def pad1(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill)

    st, strif, su, sv = _seed_channels(n, seed)
    miss_bits = float(
        np.frombuffer(np.int32(-1).tobytes(), dtype=np.float32)[0])
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
    ).reshape(12, g, 1, packet).transpose(1, 2, 0, 3)

    tri_table = scene.tri_coefs if mxu else scene.tri_blocks
    gated = gated and not mxu and packet % 1024 == 0
    out = _nary_traverse(scene.bvh_quad, tri_table, rays,
                         interpret=interpret, hbm_leaves=hbm_leaves,
                         mxu=mxu, gated=gated)
    out = out.transpose(2, 0, 1, 3).reshape(4, total)[:, :n]
    t = out[0]
    tri = jax.lax.bitcast_convert_type(out[1], jnp.int32)
    return Hit(t=t, tri=tri, u=out[2], v=out[3])


def oct_fits_vmem(scene, budget_bytes: int = None,
                  packet: int = None) -> bool:
    import os

    if budget_bytes is None:
        budget_bytes = int(os.environ.get(
            "VKPT_VMEM_BUDGET", 100 * 1024 * 1024))
    if getattr(scene, "bvh_oct", None) is None or \
            scene.tri_blocks is None or not _stack_depth_ok(scene):
        return False
    rpl = _leaf_rows_per_block(scene.tri_blocks.shape[1] // 9)
    if rpl is None:
        return False
    if packet is None:
        packet = 4096
    state = 8 * packet * 4 * 4 * 2
    need = (scene.bvh_oct.shape[0] * 512
            + scene.tri_blocks.shape[0] * 512 * rpl + state)
    return need < budget_bytes


def pallas_oct_closest_hit(scene, origin, direction, active=None,
                           interpret=False, seed=None,
                           packet: int = None,
                           hbm_leaves: bool = False,
                           gated: bool = False) -> Hit:
    """Closest hit via the 8-wide stack kernel (bvh_oct): a BVH8
    collapse — three binary levels per visit, 8 pipelined cross-lane
    min-reductions, ~half the node table of the quad collapse."""
    from vulkan_pathtracer_tpu.ops.pallas_traverse import _seed_channels

    n = origin.shape[0]
    if packet is None:
        packet = int(os.environ.get("VKPT_OCT_PACKET", "2048"))
    t_lane = jnp.full((n,), jnp.float32(TMAX))
    if active is not None:
        t_lane = jnp.where(active, t_lane, jnp.float32(-1.0))
    pad = (-n) % packet
    total = n + pad
    g = total // packet
    # The in-VMEM oct kernel reproducibly faulted the TPU worker on
    # >512-group launches at production table sizes (ROADMAP round-3
    # finding 10; unexplained, fenced).  Auto-promote such launches to
    # HBM-streamed leaves — same results, no fault pattern.
    # VKPT_OCT_FORCE_VMEM=1 opts back in for repro experiments only.
    if (not hbm_leaves and not interpret and g > 512
            and os.environ.get("VKPT_OCT_FORCE_VMEM", "0") != "1"):
        hbm_leaves = True

    def pad1(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill)

    st, strif, su, sv = _seed_channels(n, seed)
    miss_bits = float(
        np.frombuffer(np.int32(-1).tobytes(), dtype=np.float32)[0])
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
    ).reshape(12, g, 1, packet).transpose(1, 2, 0, 3)

    out = _nary_traverse(scene.bvh_oct, scene.tri_blocks, rays,
                         interpret=interpret, hbm_leaves=hbm_leaves,
                         gated=gated and packet % 1024 == 0)
    out = out.transpose(2, 0, 1, 3).reshape(4, total)[:, :n]
    t = out[0]
    tri = jax.lax.bitcast_convert_type(out[1], jnp.int32)
    return Hit(t=t, tri=tri, u=out[2], v=out[3])


@functools.partial(jax.jit, static_argnames=("interpret", "mb_bits",
                                              "mxu"))
def _pair_traverse(pairs, tris, rays, inst_inv=None, inst_feat=None, *,
                   interpret=False, mb_bits=0, mxu=None):
    """pairs: (Ni, 16) f32; tris: (n_leaves, block*9) f32 exact rows
    or (n_leaves, 10, >=4*block) coefficient rows when ``mxu`` (a
    Precision) is set; rays: (G, 1, 12, PACKET) f32; inst_inv:
    optional (I, 16) instance inverse transforms; inst_feat: (I, 10,
    16) feature-transform tiles (required iff instanced and mxu).
    Returns (G, 1, 4, PACKET) f32."""
    n_rows = pairs.shape[0]
    if mxu:
        n_leaves, _, cw = tris.shape
        block = cw // 4
        if cw % _LANE:
            tris = jnp.pad(tris, ((0, 0), (0, 0),
                                  (0, _LANE - cw % _LANE)))
        tri_spec = pl.BlockSpec(tris.shape, lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        leaf_bytes = n_leaves * 10 * tris.shape[2] * 4
        rpl = 1
    else:
        n_leaves = tris.shape[0]
        tris, block, rpl = _split_leaf_table(tris)
        tri_spec = pl.BlockSpec(tris.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        leaf_bytes = n_leaves * 512 * rpl
    g, _, _, packet = rays.shape
    instanced = inst_inv is not None

    in_specs = [
        pl.BlockSpec((n_rows, 16), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        tri_spec,
    ]
    args = [pairs, tris]
    if instanced:
        in_specs.append(
            pl.BlockSpec(inst_inv.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM))
        args.append(inst_inv)
        if mxu:
            in_specs.append(
                pl.BlockSpec(inst_feat.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM))
            args.append(inst_feat)
    in_specs.append(
        pl.BlockSpec((1, 1, 12, packet), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM))
    args.append(rays)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 4, packet), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((STACK_CAP,), jnp.int32)],
    )
    kernel = _make_pair_kernel(n_rows, block, packet, TMIN,
                               instanced=instanced, mb_bits=mb_bits,
                               mxu_precision=mxu,
                               rows_per_leaf=rpl)
    # Per-visit MXU temps ((4B, P) result + feature matrices).
    need = (n_rows * 512 + leaf_bytes
            + (12 if mxu else 4) * 1024 * 1024)
    if instanced:
        need += inst_inv.shape[0] * 512
        if mxu:
            need += inst_feat.shape[0] * 10 * _LANE * 4
    vmem_limit = vmem_clamp(need)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, 1, 4, packet), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(*args)


def pair_fits_vmem(scene, budget_bytes: int = None,
                   packet: int = None) -> bool:
    import os

    if budget_bytes is None:
        budget_bytes = int(os.environ.get(
            "VKPT_VMEM_BUDGET", 100 * 1024 * 1024))
    if getattr(scene, "bvh_pair", None) is None or \
            scene.tri_blocks is None or not _stack_depth_ok(scene):
        return False
    mxu = _mxu_active(scene, allow_instanced=True)
    rpl = _leaf_rows_per_block(scene.tri_blocks.shape[1] // 9)
    if rpl is None and not mxu:
        return False
    if packet is None:
        packet = 4096
    state = 8 * packet * 4 * 4 * 2
    leaf_bytes = (scene.tri_coefs.shape[0] * _coef_row_bytes(scene)
                  if mxu else scene.tri_blocks.shape[0] * 512 * rpl)
    need = scene.bvh_pair.shape[0] * 512 + leaf_bytes + state
    if mxu and getattr(scene, "inst_feat", None) is not None:
        need += scene.inst_feat.shape[0] * 10 * _LANE * 4
    return need < budget_bytes


def pallas_pair_closest_hit(scene, origin, direction, active=None,
                            interpret=False, seed=None,
                            packet: int = None, t_far=None,
                            t_near=None) -> Hit:
    """Drop-in closest hit via the pair-stack kernel (bvh_pair)."""
    from vulkan_pathtracer_tpu.ops.pallas_traverse import _seed_channels

    n = origin.shape[0]
    if packet is None:
        packet = int(os.environ.get("VKPT_PAIR_PACKET", "3072"))

    t_lane = jnp.full((n,), jnp.float32(TMAX))
    if t_far is not None:
        t_lane = jnp.minimum(t_lane, jnp.broadcast_to(
            jnp.asarray(t_far, jnp.float32), (n,)))
    if active is not None:
        t_lane = jnp.where(active, t_lane, jnp.float32(-1.0))
    tn_lane = jnp.zeros((n,), jnp.float32)
    if t_near is not None:
        tn_lane = jnp.broadcast_to(
            jnp.asarray(t_near, jnp.float32), (n,))

    pad = (-n) % packet
    total = n + pad
    g = total // packet

    def pad1(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill)

    st, strif, su, sv = _seed_channels(n, seed)
    miss_bits = float(
        np.frombuffer(np.int32(-1).tobytes(), dtype=np.float32)[0])
    rays = jnp.stack(
        [
            pad1(origin[:, 0]), pad1(origin[:, 1]), pad1(origin[:, 2]),
            pad1(direction[:, 0]), pad1(direction[:, 1]),
            pad1(direction[:, 2]),
            pad1(t_lane, -1.0),
            pad1(st, float(MISS_T)),
            pad1(strif, miss_bits),
            pad1(su), pad1(sv),
            pad1(tn_lane),
        ],
        axis=0,
    ).reshape(12, g, 1, packet).transpose(1, 2, 0, 3)

    inst = scene.inst_inv if getattr(scene, "instanced", False) else None
    mxu = None
    ifeat = None
    if _mxu_active(scene, allow_instanced=True):
        from vulkan_pathtracer_tpu.ops.mxu_mt import mxu_precision

        mxu = mxu_precision()
        if inst is not None:
            ifeat = scene.inst_feat
    tri_table = scene.tri_coefs if mxu else scene.tri_blocks
    out = _pair_traverse(scene.bvh_pair, tri_table, rays, inst, ifeat,
                         interpret=interpret,
                         mb_bits=getattr(scene, "mb_bits", 0),
                         mxu=mxu)
    out = out.transpose(2, 0, 1, 3).reshape(4, total)[:, :n]
    t = out[0]
    tri = jax.lax.bitcast_convert_type(out[1], jnp.int32)
    return Hit(t=t, tri=tri, u=out[2], v=out[3])
