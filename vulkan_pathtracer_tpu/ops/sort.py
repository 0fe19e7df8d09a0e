"""Device sorting / wavefront reordering — the TPU stand-in for the
GPU hardware ray scheduler (reference: the driver behind
ray_gen.rgen:50-63 schedules rays in hardware; this build runs on
sorted coherence instead, so ordering cost is first-class).

Measured design (experiments/sort_ab.py, single v5e via the relay,
min-over-reps; ROADMAP round-3):

| N lanes | argsort | row gather (N,16) | argsort+gather | chunk C=16 |
|---------|---------|-------------------|----------------|------------|
| 2M      |  28 ms  |  74 ms            |  78 ms         |  36 ms     |
| 16M     |  88 ms  | 427 ms            | 463 ms         | 130 ms     |
| 66M     | 211 ms  | (OOM standalone)  | 1711 ms (prod) | ~500 ms projected |

1. XLA's sort is NOT the bottleneck: 28 ms at 2M keys beats the
   round-2 40 ms radix-sort budget outright.  The cost is the (N, 16)
   ROW GATHER applying the permutation (64B rows gather at ~3.6 GB/s
   effective).
2. A hand radix sort cannot win here: the rank computation via
   one-hot chunked scans measured 87 ms @ 2M (3x the XLA sort), and
   the VPU has no lane scatter, so a Pallas radix kernel bottoms out
   on the same permutation-apply problem.  Measured out; keep XLA's
   comparator sort for keys.
3. The winning lever is GATHER GRANULARITY: sorting C-lane groups by
   their min key gathers (N/C, C*16) rows — 8x fewer, 8x bigger rows
   — for 2-3.5x on the whole ordering step.  Groups of contiguous
   lanes are key-coherent by construction (pixel order at bounce 1,
   the previous bounce's sort afterwards), so packet quality loss is
   small (experiments/leaf_gate_ab.py VARIANTS=csort).

4. A single lax.sort carrying the 16 payload columns as extra
   operands beats argsort+gather end to end: 59.3 vs 79.3 ms at 2M
   lanes (1.34x), 403.9 vs 460.0 ms at 16.6M (1.14x — the edge
   narrows with width; experiments/joint_sort_cost.py, round 5).
   The comparator network moves the payload during the sort instead
   of paying the 64B-row random gather afterwards.  Opt-in via
   VKPT_PERMUTE=laxsort (c == 1 only); default flips only after a
   joint-density TPU A/B.

``sort_chunk()`` reads VKPT_SORT_CHUNK (1 = exact lane sort).
Results are bit-exact per-lane under ANY order: ordering is
scheduling-only (tests/test_wavefront_sort.py).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax import lax


def sort_chunk() -> int:
    """Group size for wavefront sorts (VKPT_SORT_CHUNK, default 1)."""
    return int(os.environ.get("VKPT_SORT_CHUNK", "1"))


def permute_mode() -> str:
    """VKPT_PERMUTE: 'gather' (default, argsort + row gather) or
    'laxsort' (one fused comparator sort carrying the payload columns
    as extra lax.sort operands — measured 1.34x on the whole ordering
    step at 2M lanes, experiments/joint_sort_cost.py).  laxsort is
    unstable across equal keys; per-lane results are exact under any
    order (ordering is scheduling-only), so this is a perf knob."""
    return os.environ.get("VKPT_PERMUTE", "gather")


def state_sort_order(key, c: int):
    """(group_order | None, lane_order) permutations grouping lanes
    by key; group-granular when c > 1 and c divides the lane count."""
    m = key.shape[0]
    if c > 1 and m % c == 0:
        rep = key.reshape(m // c, c).min(axis=1)
        gorder = jnp.argsort(rep)
        lane = (gorder[:, None].astype(jnp.int32) * c
                + jnp.arange(c, dtype=jnp.int32)[None, :]).reshape(-1)
        return gorder, lane
    return None, jnp.argsort(key)


def permute_rows(state, key, c: int):
    """Reorder a packed (M, K) row matrix so equal/nearby keys become
    contiguous; uses the big-row gather when c > 1.  With
    VKPT_PERMUTE=laxsort (and c == 1) the argsort + (M, K) row gather
    is replaced by one lax.sort carrying the K payload columns."""
    if c <= 1 and permute_mode() == "laxsort":
        cols = tuple(state[:, i] for i in range(state.shape[1]))
        out = lax.sort((key,) + cols, num_keys=1)
        return jnp.stack(out[1:], axis=1)
    gorder, lane = state_sort_order(key, c)
    if gorder is None:
        return state[lane]
    m, k = state.shape
    return state.reshape(m // c, c * k)[gorder].reshape(m, k)
