"""Sort/gather cost at the JOINT-batch width (B*N lanes).

The round-2 cost tables (ops/sort.py docstring) price argsort and the
(N,16) row gather at 2M lanes; the joint progressive batch sorts
B*2.07M lanes per bounce (66M at B=32).  This times both primitives at
the actual joint widths so the "Pallas bucket sort" next-steps item is
priced on today's program, not an extrapolation.

    python experiments/joint_sort_cost.py [B ...]   # default 1 8 32
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vkpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N = 1920 * 1080  # rays per frame at the headline resolution


@jax.jit
def _sort_only(keys):
    return jnp.argsort(keys)


@jax.jit
def _sort_gather(keys, rows):
    order = jnp.argsort(keys)
    return jnp.take_along_axis(rows, order[:, None], axis=0)


# Donating the payload lets XLA alias the gather output onto the input
# buffer — the B=32 standalone otherwise dies compiling a T(8,128)
# lane-padded copy (16 -> 128 lanes, 34 GB).
_sort_gather_donated = jax.jit(
    lambda keys, rows: jnp.take_along_axis(
        rows, jnp.argsort(keys)[:, None], axis=0),
    donate_argnums=(1,),
)


@jax.jit
def _lax_sort_payload(keys, rows):
    """One fused comparator sort carrying the 16 payload columns as
    extra operands — the drop-in alternative to argsort+take for the
    joint path (render/wavefront.py permute_rows call, no inverse
    permutation needed there)."""
    cols = tuple(rows[:, i] for i in range(rows.shape[1]))
    out = jax.lax.sort((keys,) + cols, num_keys=1)
    return jnp.stack(out[1:], axis=1)


def _time(fn, *args, reps=3):
    out = fn(*args)  # compile
    jax.block_until_ready(out)
    best = 9e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        # Force completion through the relay with a scalar fetch.
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(leaf.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def _time_fresh(fn, keys, make_rows, reps=3):
    """Like _time, but rebuilds the payload each rep (donated buffers
    are consumed) and keeps the upload outside the timed region."""
    rows = make_rows()
    jax.block_until_ready(rows)
    out = fn(keys, rows)  # compile (consumes rows if donated)
    jax.block_until_ready(out)
    best = 9e9
    for _ in range(reps):
        rows = make_rows()
        jax.block_until_ready(rows)
        t0 = time.perf_counter()
        out = fn(keys, rows)
        _ = float(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
    rng = np.random.default_rng(0)
    for b in batches:
        m = b * N
        keys = jnp.asarray(rng.integers(0, 2**30, size=m, dtype=np.uint32))
        rows = jnp.asarray(rng.random((m, 16), dtype=np.float32))
        t_sort = _time(_sort_only, keys)
        t_lax = _time_fresh(_lax_sort_payload, keys, lambda: jnp.asarray(
            rng.random((m, 16), dtype=np.float32)))
        if b < 32:
            t_both = _time(_sort_gather, keys, rows)
        else:
            # Undonated B=32 dies compiling the padded copy; time the
            # donated form (payload re-uploaded per rep).
            t_both = _time_fresh(
                _sort_gather_donated, keys,
                lambda: jnp.asarray(rng.random((m, 16), dtype=np.float32)))
        print(
            f"B={b:3d} lanes={m/1e6:7.2f}M  argsort {t_sort:8.1f} ms"
            f"  sort+16-row-gather {t_both:8.1f} ms"
            f"  ({t_both/m*1e6:.1f} ns/lane)"
            f"  lax.sort+payload {t_lax:8.1f} ms"
            f" ({t_lax/m*1e6:.1f} ns/lane)",
            flush=True,
        )


if __name__ == "__main__":
    main()
