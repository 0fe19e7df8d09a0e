"""Pallas DMA-gather microbench (round-5 item 1: re-price the per-ray
leaf phase on the right primitive).

The round-4 closure of the two-stage per-ray leaf phase rests on XLA's
MEASURED ~1.7 GB/s row-gather throughput (ROADMAP round-4 "leaf-MT
waste" entry) — about 0.2% of v5e HBM bandwidth.  This kernel measures
what a dedicated Pallas gather can actually do: stream N RANDOM rows
(512 B – 4 KB each) from a large HBM table into VMEM via K-deep
pipelined `make_async_copy` descriptors driven by an SMEM index list,
consuming each row with a trivial vector accumulate.

Decision rule from VERDICT r4: >= ~15 GB/s -> prototype the two-stage
per-ray leaf phase (emit sorted (ray,leaf) pairs, DMA-gather rows,
per-ray MT); < 5 GB/s -> the ledger entry is genuinely closed.

Reference anchor: the per-ray (not union) intersection the RT hardware
performs behind traceRayEXT (/root/reference/src/shaders/ray_gen.rgen:50-63).

Usage (real chip):
  python experiments/dma_gather_bench.py | tee -a experiments/logs/r5_dma_gather.log
Env: DMA_FETCHES (8192), DMA_REPS (16), DMA_ROWS (131072 table rows),
     DMA_SWEEP ("rsub,nbuf;..." default sweep), DMA_SEQ=1 sequential
     (non-random) index baseline, VKPT_PLATFORM=cpu for interpret-mode
     smoke (shapes only; no bandwidth meaning).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

LANE = 128


def build_kernel(num_fetches: int, rsub: int, nbuf: int, reps: int,
                 ib: int = 1, interpret: bool = False):
    """One pallas_call: grid=(reps,), each step streams the whole index
    list through an nbuf-deep DMA pipeline, accumulating row sums into
    the (8,128) output (prevents DCE; consumption cost ~2 vector ops
    per fetch, negligible vs the copies).

    ib = issue block: each fori iteration waits/consumes/starts ib
    fetches (unrolled), amortizing the per-iteration scalar chain —
    this is the knob that establishes the DMA ISSUE-RATE ceiling (the
    first sweep measured a flat ~200 ns/fetch wall, i.e. issue-bound,
    at ib=1)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert num_fetches % ib == 0 and nbuf % ib == 0

    def kernel(idx_ref, table_ref, out_ref, scratch, sems):
        rep = pl.program_id(0)

        @pl.when(rep == 0)
        def _():
            out_ref[:] = jnp.zeros((8, LANE), jnp.float32)

        def get_dma(i, slot):
            row = idx_ref[i]
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(row * rsub, rsub)],
                scratch.at[pl.ds(slot * rsub, rsub)],
                sems.at[slot])

        # Warm-up: fill the pipeline.
        for s in range(nbuf):
            get_dma(s, s).start()

        def body(blk, acc):
            i0 = blk * ib
            base_slot = jax.lax.rem(i0, nbuf)
            for u in range(ib):  # unrolled: ib fetches per iteration
                slot = base_slot + u
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(0, rsub)],  # shape-only
                    scratch.at[pl.ds(slot * rsub, rsub)],
                    sems.at[slot]).wait()
                rows = scratch[pl.ds(slot * rsub, rsub)]
                acc = acc + jnp.sum(rows.reshape(rsub, LANE), axis=0,
                                    keepdims=True)

                @pl.when(i0 + u + nbuf < num_fetches)
                def _():
                    get_dma(i0 + u + nbuf, slot).start()

            return acc

        acc = jax.lax.fori_loop(
            0, num_fetches // ib, body,
            jnp.zeros((1, LANE), jnp.float32))
        out_ref[0:1, :] = out_ref[0:1, :] + acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(reps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((8, LANE), lambda r, *pref: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nbuf * rsub, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )
    return jax.jit(call)


def main() -> int:
    import jax
    import jax.numpy as jnp

    plat = os.environ.get("VKPT_PLATFORM")
    interpret = False
    if plat:
        jax.config.update("jax_platforms", plat)
        interpret = plat == "cpu"
    jax.config.update("jax_compilation_cache_dir", "/tmp/vkpt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    num_fetches = int(os.environ.get("DMA_FETCHES", 8192))
    reps = int(os.environ.get("DMA_REPS", 16))
    n_rows = int(os.environ.get("DMA_ROWS", 131072))  # x512B = 64MB table
    seq = os.environ.get("DMA_SEQ", "0") == "1"
    sweep = os.environ.get(
        "DMA_SWEEP",
        "1,4;1,8;1,16;2,4;2,8;2,16;4,8;4,16;8,8;8,16")
    timing_reps = int(os.environ.get("DMA_TIMING_REPS", 3))

    rng = np.random.default_rng(7)
    dev = jax.devices()[0]
    print(f"# device={dev} table_rows={n_rows} fetches={num_fetches} "
          f"grid_reps={reps} seq={seq}", flush=True)

    results = []
    for part in sweep.split(";"):
        vals = [int(x) for x in part.split(",")]
        rsub, nbuf = vals[0], vals[1]
        ib = vals[2] if len(vals) > 2 else 1
        # Row index space: rows of rsub sublanes each.
        max_start = n_rows // rsub
        if seq:
            idx = (np.arange(num_fetches, dtype=np.int32) % max_start)
        else:
            idx = rng.integers(0, max_start, size=num_fetches,
                               dtype=np.int32)
        table = rng.standard_normal((n_rows, LANE), dtype=np.float32)
        fn = build_kernel(num_fetches, rsub, nbuf, reps, ib=ib,
                          interpret=interpret)
        idx_d = jnp.asarray(idx)
        table_d = jnp.asarray(table)
        out = fn(idx_d, table_d)
        # Checksum parity vs numpy (also forces completion through the
        # relay, which block_until_ready alone does not).
        got = np.asarray(out)[0]
        want_full = np.zeros(LANE, np.float32)
        for s in range(rsub):
            want_full += table[idx * rsub + s].sum(axis=0)
        want_full *= reps
        rel = float(np.abs(got - want_full).max()
                    / (np.abs(want_full).max() + 1e-6))
        best = float("inf")
        for _ in range(timing_reps):
            t0 = time.perf_counter()
            out = fn(idx_d, table_d)
            _ = float(out.sum())
            best = min(best, time.perf_counter() - t0)
        bytes_moved = num_fetches * reps * rsub * LANE * 4
        gbs = bytes_moved / best / 1e9
        row_b = rsub * LANE * 4
        print(f"rsub={rsub} ({row_b}B/row) nbuf={nbuf} ib={ib}: "
              f"{gbs:8.2f} GB/s  ({best*1e3:7.2f} ms for "
              f"{bytes_moved/1e6:.0f} MB)  chk_rel={rel:.1e}",
              flush=True)
        results.append((rsub, nbuf, ib, gbs))

    best = max(results, key=lambda r: r[-1])
    print(f"# BEST: rsub={best[0]} nbuf={best[1]} ib={best[2]} "
          f"{best[3]:.2f} GB/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
