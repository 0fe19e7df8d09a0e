"""Device sort A/B: where does the wavefront's per-bounce global
argsort+gather cost go, and what beats it on TPU?

    [N=<lanes>] [REPS=N] [VARIANTS=base|chunk|radix|all] \
        python experiments/sort_ab.py

Context (ROADMAP round-2): the B=32 joint-batch path argsorts 66M u32
keys + row-gathers (66M, 16) f32 state per bounce = 1711 ms = 11% of a
convergence batch; chunked *batched* sorts measured 2x WORSE (XLA
lowers batched sorts badly).  The scheduling need is PACKET COHERENCE
(group rays into 3-4k-lane packets with tight key unions), not a total
order — so candidates below trade exactness of the order for
asymptotically less sorting:

- base: jnp.argsort(keys) alone; row gather alone; sort_key_val.
- chunk: sort C-row GROUPS by a representative key (one argsort of
  N/C lanes + block row gather).  Rows within a group stay together
  across bounces, and groups are key-coherent by construction (the
  previous bounce's sort / pixel order made neighbors coherent).
- radix: counting-sort rank computation via chunked one-hot scan
  (the Pallas-less radix-pass core) + scatter/gather apply, to bound
  what a hand-rolled radix pass could win.

Verdicts land in ROADMAP.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("VKPT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["VKPT_PLATFORM"])
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vkpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timeit(name, fn, args, reps, force):
    """fn is jitted and takes args explicitly (closure-captured device
    arrays would be embedded as constants and constant-folded)."""
    fn(*args)  # compile
    best = 9e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        force(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best * 1000:8.2f} ms", flush=True)
    return best


def main():
    n = int(os.environ.get("N", str(1 << 21)))
    reps = int(os.environ.get("REPS", "5"))
    which = os.environ.get("VARIANTS", "all")
    rng = np.random.default_rng(0)
    keys_np = rng.integers(0, 1 << 30, size=n, dtype=np.uint32)
    state_np = rng.standard_normal((n, 16), dtype=np.float32)
    keys = jax.device_put(jnp.asarray(keys_np))
    state = jax.device_put(jnp.asarray(state_np))
    order_np = rng.permutation(n).astype(np.int32)
    order_rand = jax.device_put(jnp.asarray(order_np))
    print(f"N={n} ({n * 4 / 1e6:.0f} MB keys, {n * 64 / 1e6:.0f} MB "
          f"state) backend={jax.default_backend()}", flush=True)

    fscalar = lambda out: jax.tree_util.tree_map(
        lambda x: float(jnp.ravel(x)[0]) if hasattr(x, "ravel") else x,
        out if isinstance(out, tuple) else (out,))

    if which in ("base", "all"):
        timeit("argsort u32          ",
               jax.jit(lambda k: jnp.argsort(k)), (keys,), reps, fscalar)
        timeit("sort_key_val u32/i32 ",
               jax.jit(lambda k: jax.lax.sort_key_val(
                   k, jnp.arange(n, dtype=jnp.int32))), (keys,),
               reps, fscalar)
        timeit("row gather (n,16)    ",
               jax.jit(lambda s, o: s[o]), (state, order_rand),
               reps, fscalar)
        timeit("argsort+gather (prod)",
               jax.jit(lambda s, k: s[jnp.argsort(k)]), (state, keys),
               reps, fscalar)
        timeit("scatter rows .at[set]",
               jax.jit(lambda s, o: jnp.zeros_like(s).at[o].set(s)),
               (state, order_rand), reps, fscalar)
        timeit("iota scatter (invert)",
               jax.jit(lambda o: jnp.zeros(n, jnp.int32).at[o]
                       .set(jnp.arange(n, dtype=jnp.int32))),
               (order_rand,), reps, fscalar)

    if which in ("chunk", "all"):
        for c in (8, 16, 32, 64, 128):
            ng = n // c

            def chunk_sort(k, s, c=c, ng=ng):
                # Representative = min key in the group (an all-dead
                # group keys to the end only if every lane is dead).
                k2 = k[: ng * c].reshape(ng, c)
                rep = k2.min(axis=1)
                gorder = jnp.argsort(rep)
                s2 = s[: ng * c].reshape(ng, c * 16)
                return s2[gorder].reshape(-1, 16)

            timeit(f"chunk_sort C={c:<4}     ",
                   jax.jit(chunk_sort), (keys, state), reps, fscalar)

    if which in ("radix", "all"):
        # One counting-sort pass over the top `bits` bits: per-chunk
        # histograms -> exclusive scan -> per-lane rank via one-hot
        # cumsum inside each chunk (vectorized, no batched sort).
        def radix_rank(k, bits, d_):
            digit = (k >> jnp.uint32(30 - bits)).astype(jnp.int32)
            ch = 1 << 15
            nch = n // ch
            dg = digit[: nch * ch].reshape(nch, ch)
            onehot = jax.nn.one_hot(dg, d_, dtype=jnp.int32)
            # (nch, ch, D) within-chunk exclusive cumsum + chunk
            # histograms.
            csum = jnp.cumsum(onehot, axis=1)
            hist = csum[:, -1, :]                      # (nch, D)
            within = csum - onehot                     # exclusive
            # Across chunks (digit-major global offsets).
            chunk_base = jnp.cumsum(hist, axis=0) - hist  # (nch, D)
            total = hist.sum(axis=0)
            digit_base = jnp.cumsum(total) - total     # (D,)
            base = digit_base[None, :] + chunk_base    # (nch, D)
            rank = jnp.take_along_axis(
                within + base[:, None, :], dg[..., None], axis=2,
            )[..., 0].reshape(-1)
            return rank

        for bits in (8, 12):
            d_ = 1 << bits
            timeit(f"radix rank {bits}b       ",
                   jax.jit(lambda k, bits=bits, d_=d_:
                           radix_rank(k, bits, d_)),
                   (keys,), reps, fscalar)
            timeit(f"radix rank+scatter {bits}b",
                   jax.jit(lambda k, s, bits=bits, d_=d_:
                           jnp.zeros_like(s)
                           .at[radix_rank(k, bits, d_)].set(s)),
                   (keys, state), reps, fscalar)


if __name__ == "__main__":
    main()
