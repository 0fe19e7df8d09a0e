"""8-wide BVH: binary collapse + per-octant preorder emission.

The packet kernel's per-visit cost is dominated by the scalar node
loads + one vector->scalar sync.  An 8-wide node amortizes both: its
eight child AABBs live in ONE (8 slots x 8 fields) VMEM tile that the
kernel reads with a dynamic *sublane* index and static lane indices —
no scalar loads — and tests against 128-ray chunks as (8,128) vector
ops (slots on sublanes).  Visits drop ~3x vs the binary tree.

Build: collapse the binary LBVH by repeatedly expanding the
largest-area internal slot until a node has 8 slots (or all leaves).
Each octant gets its own preorder with near-first slot ordering
(slots sorted by the signed projection of their box centers) and skip
pointers; control flow stays stackless: descend to node+1 when any
*internal* slot was hit, else take the skip pointer.  A non-hit
internal child that gets entered wastes one visit and skips — the
fixed price of statelessness.

Slot fields (float32): [bmin xyz, bmax xyz, leafword, pad] where
leafword >= 0 is the slot's leaf-block first-triangle index, -1 marks
an internal slot, -2 an empty slot (its box is inverted so it can
never hit).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from vulkan_pathtracer_tpu.ops.bvh import HostBVH

EMPTY = -2.0
INTERNAL = -1.0
BIG = np.float32(3e38)

_OCT_SIGNS = np.array(
    [[1 if (o >> a) & 1 == 0 else -1 for a in range(3)] for o in range(8)],
    dtype=np.float64,
)  # +1 where direction >= 0 (octant bit clear)


@dataclass
class WideBVH:
    # Stacked per octant: [oct * Nw + i]
    nodes: np.ndarray   # (8*Nw, 8, 8) f32 slot tiles
    skip: np.ndarray    # (8*Nw,) int32, octant-LOCAL skip pointers
    n_wide: int


def _area(bmin, bmax):
    d = np.maximum(bmax - bmin, 0.0)
    return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]


def collapse8(bvh: HostBVH) -> List[dict]:
    """Collapse to wide nodes (binary ids in slots).

    Returns a list of wide-node dicts:
      {"slots": [binary ids], "children": {binary_id: wide_index}}
    in discovery (BFS) order; wide node 0 is the root.
    """
    left = bvh.left_child
    right = bvh.right_child
    leaf_first = bvh.leaf_first

    wide: List[dict] = []
    # Each work item: binary root of a wide node.
    work = [0]
    wide_index_of_root = {}
    while work:
        root = work.pop()
        if root in wide_index_of_root:
            continue
        slots = [root] if leaf_first[root] >= 0 else [left[root], right[root]]
        # Expand largest-area internal slot until 8 slots or all leaves.
        while len(slots) < 8:
            best = -1
            best_area = -1.0
            for i, s in enumerate(slots):
                if leaf_first[s] < 0:
                    a = _area(bvh.bmin[s].astype(np.float64),
                              bvh.bmax[s].astype(np.float64))
                    if a > best_area:
                        best_area = a
                        best = i
            if best < 0:
                break
            s = slots.pop(best)
            slots.extend([left[s], right[s]])
        wide_index_of_root[root] = len(wide)
        wide.append({"root": root, "slots": slots})
        for s in slots:
            if leaf_first[s] < 0:
                work.append(s)
    # Map internal slots to their wide-node index (second pass after
    # all nodes are discovered).
    # Note: every internal slot becomes the root of exactly one wide
    # node (work de-dups by root).
    for node in wide:
        node["child_wide"] = {
            s: None for s in node["slots"] if leaf_first[s] < 0
        }
    # Rebuild index map including late discoveries.
    root_to_wide = {node["root"]: i for i, node in enumerate(wide)}
    for node in wide:
        for s in list(node["child_wide"]):
            node["child_wide"][s] = root_to_wide[s]
    return wide


def build_wide_bvh(bvh: HostBVH, block: int) -> WideBVH:
    """Collapse + emit 8 octant-ordered preorders with skip pointers."""
    wide = collapse8(bvh)
    n_wide = len(wide)
    leaf_first = bvh.leaf_first
    centers = (bvh.bmin.astype(np.float64) + bvh.bmax) * 0.5

    nodes = np.zeros((8, n_wide, 8, 8), dtype=np.float32)
    skip = np.zeros((8, n_wide), dtype=np.int32)

    for o in range(8):
        signs = _OCT_SIGNS[o]
        # order[oct][old_wide_index] -> new preorder index, via DFS.
        out_index = np.full(n_wide, -1, dtype=np.int64)
        count = 0
        # Iterative preorder with skip patching.
        stack = [(0, -1)]  # (wide index, patch-out-index)
        order_slots = {}
        while stack:
            w, patch = stack.pop()
            if patch >= 0:
                skip[o, patch] = count
                continue
            me = count
            count += 1
            out_index[w] = me
            node = wide[w]
            slots = node["slots"]
            keys = [float(signs @ centers[s]) for s in slots]
            ordered = [s for _, s in sorted(zip(keys, slots),
                                            key=lambda kv: kv[0])]
            order_slots[(o, w)] = ordered
            # Fill the slot tile in visit order.
            for k, s in enumerate(ordered):
                nodes[o, me, k, 0:3] = bvh.bmin[s]
                nodes[o, me, k, 3:6] = bvh.bmax[s]
                lf = leaf_first[s]
                nodes[o, me, k, 6] = float(lf) if lf >= 0 else INTERNAL
            for k in range(len(ordered), 8):
                nodes[o, me, k, 0:3] = BIG
                nodes[o, me, k, 3:6] = -BIG
                nodes[o, me, k, 6] = EMPTY
            stack.append((w, me))
            # Children subtrees in REVERSE visit order (stack pops
            # the nearest first).
            internal_children = [s for s in ordered if leaf_first[s] < 0]
            for s in reversed(internal_children):
                stack.append((node["child_wide"][s], -1))
        assert count == n_wide, (count, n_wide)
        # Bake the skip pointer into the tile (slot 0, field 7) so the
        # kernel reads it without a second table.
        nodes[o, :, 0, 7] = skip[o].astype(np.float32)

    return WideBVH(
        nodes=nodes.reshape(8 * n_wide, 8, 8),
        skip=skip.reshape(-1),
        n_wide=n_wide,
    )
