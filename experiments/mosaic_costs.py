"""Microbenchmark Mosaic primitive costs inside a while-loop kernel:
scalar VMEM loads, cross-lane reductions, lax.cond branches, vector
ops — to attribute the traversal kernel's per-iteration fixed cost.

    python experiments/mosaic_costs.py
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

ITERS = int(__import__('os').environ.get('ITERS', 20000))


def run(kernel_body, name, table, vec):
    def kernel(tab_ref, vec_ref, out_ref):
        v = vec_ref[0, :].reshape(vec.shape[1] // 128, 128)

        def body(state):
            i, acc, vacc = state
            acc, vacc = kernel_body(tab_ref, i, acc, vacc, v)
            return i + 1, acc, vacc

        def cond(state):
            return state[0] < ITERS

        _, acc, vacc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.float32(0.0), v)
        )
        out_ref[0, :] = (vacc + acc).reshape(-1)

    @jax.jit
    def go(table, vec):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, vec.shape[1]), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, vec)

    out = go(table, vec)
    _ = float(out.sum())
    best = 9e9
    for _ in range(5):
        t0 = time.time()
        out = go(table, vec)
        _ = float(out.sum())
        best = min(best, time.time() - t0)
    cyc = best * 0.94e9 / ITERS  # v5e ~940MHz
    print(f"{name}: {best*1000:.2f} ms ({cyc:.0f} cyc/iter)", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "frontier":
        frontier_visit_bench()  # just the round-4 model validation
        return
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((4096, 128)).astype(np.float32))
    vec = jnp.asarray(rng.random((1, 2048)).astype(np.float32))

    def empty(tab, i, acc, vacc, v):
        return acc + 1.0, vacc

    run(empty, "empty loop", table, vec)

    def loads8(tab, i, acc, vacc, v):
        r = i & 4095
        s = tab[r, 0]
        for k in range(1, 8):
            s = s + tab[r, k]
        return acc + s, vacc

    run(loads8, "8 scalar loads (same row)", table, vec)

    def loads64(tab, i, acc, vacc, v):
        r = i & 4095
        s = tab[r, 0]
        for k in range(1, 64):
            s = s + tab[r, k * 2]
        return acc + s, vacc

    run(loads64, "64 scalar loads (same row)", table, vec)

    def loads128(tab, i, acc, vacc, v):
        r = i & 4095
        s = tab[r, 0]
        for k in range(1, 128):
            s = s + tab[r, k]
        return acc + s, vacc

    run(loads128, "128 scalar loads (same row)", table, vec)

    def vecload(tab, i, acc, vacc, v):
        r = i & 4095
        row = tab[r, :]   # (128,) vector load, dynamic sublane
        return acc, vacc + row.reshape(1, 128)

    run(vecload, "1 vector row load", table, vec)

    def reduce1(tab, i, acc, vacc, v):
        return acc + jnp.sum(vacc), vacc

    run(reduce1, "1 cross-lane sum (16,128)", table, vec)

    def reduce8(tab, i, acc, vacc, v):
        s = acc
        for k in range(8):
            s = s + jnp.sum(vacc + jnp.float32(k))
        return s, vacc

    run(reduce8, "8 cross-lane sums (16,128)", table, vec)

    def cond1(tab, i, acc, vacc, v):
        vacc = jax.lax.cond(i & 7 == 0, lambda a: a + 1.0, lambda a: a,
                            vacc)
        return acc, vacc

    run(cond1, "1 lax.cond (vec state, 1/8 taken)", table, vec)

    def cond3(tab, i, acc, vacc, v):
        for k in range(3):
            vacc = jax.lax.cond((i & 7) == k, lambda a: a + 1.0,
                                lambda a: a, vacc)
        return acc, vacc

    run(cond3, "3 lax.cond (vec state)", table, vec)

    def vec20(tab, i, acc, vacc, v):
        x = vacc
        for _ in range(10):
            x = x * 1.0001 + 0.5
        return acc, x

    run(vec20, "20 vector ops (16,128)", table, vec)

    def vec320(tab, i, acc, vacc, v):
        x = vacc
        for _ in range(160):
            x = x * 1.0001 + 0.5
        return acc, x

    run(vec320, "320 vector ops (16,128)", table, vec)

    def walk_scalars(tab, i, acc, vacc, v):
        r = i & 4095
        nxt = i
        for j in range(16):
            sk = tab[r, j * 8 + 6].astype(jnp.int32)
            lf = tab[r, j * 8 + 7]
            on = nxt == i + j
            succ = jnp.where(lf >= 0, sk, i + j + 1)
            nxt = jnp.where(on, succ, nxt)
        return acc + nxt.astype(jnp.float32), vacc

    run(walk_scalars, "walk: 32 loads + 16x selects", table, vec)

    def vec320_bf16(tab, i, acc, vacc, v):
        x = vacc.astype(jnp.bfloat16)
        for _ in range(160):
            x = x * jnp.bfloat16(1.0001) + jnp.bfloat16(0.5)
        return acc, vacc + x.astype(jnp.float32) * 1e-9

    run(vec320_bf16, "320 bf16 vector ops (16,128)", table, vec)

    # Full-row pattern vs group-staged: does splitting the 16-node
    # slab into cond-gated groups of 4 (early exit when the chain
    # leaves the row) recover the speculative waste?
    def full_row(tab, i, acc, vacc, v):
        r = i & 4095
        x = vacc
        s = acc
        for j in range(16):
            b = [tab[r, j * 8 + f] for f in range(8)]
            for f in range(6):
                x = jnp.maximum(x * b[f], x - b[f])
        for jp in range(8):
            s = s + jnp.sum(x + jnp.float32(jp))
        return s, x

    run(full_row, "row: 128 loads + 16-node fake slab + 8 sums", table, vec)

    def grouped_row(tab, i, acc, vacc, v):
        # Groups of 4 nodes; cond predicate i&3!=3 approximates a
        # 75% early-exit after the first group (chain-length ~5).
        r = i & 4095
        s = acc

        def group(g, x, s):
            for j in range(4 * g, 4 * g + 4):
                b = [tab[r, j * 8 + f] for f in range(8)]
                for f in range(6):
                    x = jnp.maximum(x * b[f], x - b[f])
            s = s + jnp.sum(x) + jnp.sum(x + 1.0)
            return x, s

        x, s = group(0, vacc, s)

        def rest(args):
            x, s = args
            for g in range(1, 4):
                x, s = group(g, x, s)
            return x, s

        x, s = jax.lax.cond((i & 3) == 3, rest, lambda a: a, (x, s))
        return s, x

    run(grouped_row, "row: grouped 4+cond(25% rest)", table, vec)

    frontier_visit_bench()


def frontier_visit_bench():
    """Measure the frontier kernel's per-NODE-VISIT cost in isolation
    (the round-4 cycle model's unvalidated guess — ROADMAP round-4
    finding 1): a while-loop whose body is the real node visit minus
    leaves, at stages (a) matmul only, (b) + slab epilogue + batched
    16-child min, (c) + scalar mins/enc reads + 63-comparator sort +
    stack push/pop, at DEFAULT and HIGHEST matmul precision."""
    w = 16
    pk = 2048
    iters = ITERS // 10  # heavier body than the primitive benches
    rng = np.random.default_rng(1)
    tiles = jnp.asarray(rng.random((512, 8, 128)).astype(np.float32))
    feats = jnp.asarray(rng.random((8, pk)).astype(np.float32))
    from vulkan_pathtracer_tpu.ops.pallas_frontier import _SORT16

    def make(stage, precision):
        def kernel(tiles_ref, feats_ref, out_ref, mins_ref, stack_ref):
            fts = feats_ref[...]

            def body(state):
                i, vacc = state
                tile = tiles_ref[i & 511]
                if stage == "empty":
                    # Loop + one scalar load + vreg add only: subtract
                    # this from the other stages to cancel
                    # dispatch/relay + loop overhead.
                    return i + 1, vacc + tile[0, 0]
                res = jax.lax.dot_general(
                    tile, fts, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)
                if stage == "matmul":
                    return i + 1, vacc + res[:16, :128]
                tx0 = res[0 * w:1 * w]
                ty0 = res[1 * w:2 * w]
                tz0 = res[2 * w:3 * w]
                tx1 = res[3 * w:4 * w]
                ty1 = res[4 * w:5 * w]
                tz1 = res[5 * w:6 * w]
                tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                             jnp.minimum(ty0, ty1)),
                                 jnp.minimum(tz0, tz1))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                             jnp.maximum(ty0, ty1)),
                                 jnp.maximum(tz0, tz1))
                entry = jnp.where(tn <= tf, tn, jnp.float32(1e30))
                m = jnp.min(entry, axis=1, keepdims=True)
                if stage == "epilogue":
                    return i + 1, vacc + jnp.broadcast_to(m, (16, 128))
                mins_ref[...] = jnp.broadcast_to(m, (w, 128))
                ms = [mins_ref[s, 0] for s in range(w)]
                encs = [tiles_ref[i & 511, 6, s] for s in range(w)]
                big = jnp.float32(1e30)
                ks = [jnp.where(ms[s] < big, ms[s], big)
                      for s in range(w)]
                cs = [e.astype(jnp.int32) for e in encs]

                def cswap(a, b):
                    lt = ks[a] <= ks[b]
                    ka = jnp.where(lt, ks[a], ks[b])
                    kb = jnp.where(lt, ks[b], ks[a])
                    ca = jnp.where(lt, cs[a], cs[b])
                    cb = jnp.where(lt, cs[b], cs[a])
                    ks[a], ks[b], cs[a], cs[b] = ka, kb, ca, cb

                for a, b in _SORT16:
                    cswap(a, b)
                live = [k < big for k in ks]
                p = jnp.int32(0)
                pos = [None] * w
                for s in range(w - 1, 0, -1):
                    pos[s] = p
                    p = p + live[s].astype(jnp.int32)
                for s in range(w - 1, 0, -1):
                    @pl.when(live[s])
                    def _(s=s):
                        stack_ref[pos[s]] = cs[s]
                popped = stack_ref[jnp.maximum(p - 1, 0)]
                return (i + 1 + 0 * popped,
                        vacc + jnp.broadcast_to(m, (16, 128)))

            def cond(state):
                return state[0] < iters

            _, vacc = jax.lax.while_loop(
                cond, body, (jnp.int32(0),
                             jnp.zeros((16, 128), jnp.float32)))
            out_ref[...] = vacc

        @jax.jit
        def go(tiles, feats):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((w, 128), jnp.float32),
                    pltpu.SMEM((256,), jnp.int32),
                ],
                interpret=os.environ.get("VKPT_PLATFORM") == "cpu",
            )(tiles, feats)

        return go

    for stage in ("empty", "matmul", "epilogue", "full"):
        for pname, prec in (("default", jax.lax.Precision.DEFAULT),
                            ("highest", jax.lax.Precision.HIGHEST)):
            if stage == "empty" and pname == "highest":
                continue
            try:
                go = make(stage, prec)
                out = go(tiles, feats)
                _ = float(out.sum())
                best = 9e9
                for _ in range(5):
                    t0 = time.time()
                    out = go(tiles, feats)
                    _ = float(out.sum())
                    best = min(best, time.time() - t0)
                cyc = best * 0.94e9 / iters
                print(f"frontier visit [{stage:8s} {pname}]: "
                      f"{best*1000:.2f} ms ({cyc:.0f} cyc/iter)",
                      flush=True)
            except Exception as e:
                print(f"frontier visit [{stage} {pname}]: FAIL "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
