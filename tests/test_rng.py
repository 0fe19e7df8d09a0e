"""RNG bit-exactness vs. the GLSL constants (rand.glsl:76-94)."""

import numpy as np
import jax.numpy as jnp

from vulkan_pathtracer_tpu.ops import rng


def prng_seed_ref(px: int, py: int, frame: int):
    m = 0xFFFFFFFF
    sx = (px * 0x9E3779B9 + frame) & m
    sy = (py * 0x9E3779B9 + frame) & m
    sx ^= sx >> 16
    sy ^= sy >> 16
    return (sx * 0x9E3779B9) & m, (sy * 0x9E3779B9) & m


def test_prng_seed_bit_exact():
    pixels = [(0, 0), (1, 0), (0, 1), (123, 456), (1919, 1079)]
    frames = [0, 1, 2, 77, 0xFFFFFFFF]
    for frame in frames:
        px = jnp.array([p[0] for p in pixels], dtype=jnp.uint32)
        py = jnp.array([p[1] for p in pixels], dtype=jnp.uint32)
        sx, sy = rng.prng_seed(px, py, jnp.uint32(frame))
        for i, (x, y) in enumerate(pixels):
            ex, ey = prng_seed_ref(x, y, frame)
            assert int(sx[i]) == ex
            assert int(sy[i]) == ey


def test_pcg2d_bit_exact_sequence():
    # Walk 100 draws from several seeds; states must match the pure
    # python uint32 model exactly, floats must match f32(state)*C.
    seeds = [(1, 2), (0, 0), (0xDEADBEEF, 0xCAFEBABE), (12345, 67890)]
    sx = jnp.array([s[0] for s in seeds], dtype=jnp.uint32)
    sy = jnp.array([s[1] for s in seeds], dtype=jnp.uint32)
    ref = list(seeds)
    for _ in range(100):
        sx, sy, fx, fy = rng.pcg2d(sx, sy)
        for i in range(len(seeds)):
            ref[i] = rng.pcg2d_reference_u32(*ref[i])
            assert int(sx[i]) == ref[i][0]
            assert int(sy[i]) == ref[i][1]
            expected_fx = np.float32(np.float32(ref[i][0]) * np.float32(2.32830643654e-10))
            assert np.float32(fx[i]) == expected_fx


def test_pcg2d_uniformity():
    # Statistical sanity: mean ~0.5, range within [0,1).
    n = 50000
    px = jnp.arange(n, dtype=jnp.uint32) % 1920
    py = jnp.arange(n, dtype=jnp.uint32) // 1920
    sx, sy = rng.prng_seed(px, py, jnp.uint32(3))
    sx, sy, fx, fy = rng.pcg2d(sx, sy)
    f = np.concatenate([np.asarray(fx), np.asarray(fy)])
    assert f.min() >= 0.0
    assert f.max() < 1.0
    assert abs(f.mean() - 0.5) < 0.01
    # bucket chi-square-ish check
    hist, _ = np.histogram(f, bins=16, range=(0, 1))
    expected = len(f) / 16
    assert np.abs(hist - expected).max() < expected * 0.1
