"""Mosaic cost of the vreg-gated leaf-MT structures, in isolation.

plan15 measured the shipped gated kernel (lax.cond on value slices +
concat) at 0.64-0.69x — ~400 cyc/leaf-visit of structure overhead
against a modeled ~100.  This bench prices the three candidate leaf
structures on a fake 28-tri MT body so the rescue decision is a
measurement, not another model:

  ungated      : 28 tris x ~12 vector ops on the full (16,128) slab
  gated-cond   : per (8,128) vreg group, lax.cond on carried value
                 slices + concat (the shipped structure)
  gated-when   : state in VMEM scratch; per group pl.when writes
                 static scratch rows (no value threading, no concat)

Group-1 predicate is always-taken, group-2 ~40% taken (occ_mean 1.4,
the measured pk2048 distribution).  Per-iteration cycles printed at
940 MHz.

    python experiments/gate_costs.py   (TPU)
"""

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

ITERS = int(os.environ.get("ITERS", 4000))
TRIS = 28
F_HZ = 940e6


def fake_mt(x, scal):
    """~12 vector ops per 'triangle' on slab x (cheap stand-in: the
    REAL MT is ~40 ops/tri; ratios between structures still hold and
    absolute overhead per structure is what we want)."""
    for k in range(TRIS):
        s = scal[k % len(scal)]
        x = jnp.maximum(x * s, x - s) + 0.25
    return x


def time_call(go, table, vec, name):
    out = go(table, vec)
    _ = float(jnp.sum(out))
    best = 9e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = go(table, vec)
        _ = float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    cyc = best * F_HZ / ITERS
    print(f"{name:<28}: {best*1e3:8.2f} ms  {cyc:8.0f} cyc/iter",
          flush=True)
    return cyc


def build(kind):
    def kernel(tab_ref, vec_ref, out_ref, scratch):
        v = vec_ref[0, :].reshape(16, 128)
        scratch[:, :] = v

        def body(state):
            i, vacc = state
            r = i & 1023
            scal = [tab_ref[r, f] for f in range(8)]
            occ2 = (i % 5) < 2  # ~40% second-group occupancy

            if kind == "ungated":
                vacc = fake_mt(vacc, scal)
            elif kind == "cond":
                g0 = fake_mt(vacc[0:8], scal)
                g1 = jax.lax.cond(occ2,
                                  lambda a: fake_mt(a, scal),
                                  lambda a: a, vacc[8:16])
                vacc = jnp.concatenate([g0, g1])
            elif kind == "when":
                scratch[0:8, :] = fake_mt(scratch[0:8, :], scal)

                @pl.when(occ2)
                def _():
                    scratch[8:16, :] = fake_mt(scratch[8:16, :], scal)

                vacc = vacc  # state lives in scratch
            return i + 1, vacc

        def cond_fn(state):
            return state[0] < ITERS

        _, vacc = jax.lax.while_loop(cond_fn, body,
                                     (jnp.int32(0), v))
        if kind == "when":
            out_ref[0, :] = scratch[:, :].reshape(-1)
        else:
            out_ref[0, :] = vacc.reshape(-1)

    @jax.jit
    def go(table, vec):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 16 * 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((16, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024),
        )(table, vec)

    return go


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((1024, 128)).astype(np.float32))
    vec = jnp.asarray(rng.random((1, 16 * 128)).astype(np.float32))
    base = None
    for kind in ("ungated", "cond", "when"):
        cyc = time_call(build(kind), table, vec, f"leaf28 {kind}")
        if base is None:
            base = cyc
        else:
            # occ 1.4/2: ideal gated = base * (0.5*1.0 + 0.5*0.7) =
            # 0.85x-ish of vector work + structure overhead
            print(f"    -> vs ungated: {base/cyc:.2f}x "
                  f"(overhead {cyc - base * 0.7:.0f} cyc/iter vs the "
                  f"0.7x vector-work ideal)", flush=True)


if __name__ == "__main__":
    main()
