"""Counter-style PCG2D RNG, bit-exact to the reference's GLSL.

Reproduces ``src/shaders/rand.glsl:76-94`` of the reference: the
``prng_seed`` hash (pixel, frame) -> uvec2 state and the ``pcg2d``
generator which advances the 2-lane state in place and returns two
f32 uniforms in [0, 1).

The state is carried as two uint32 arrays (SoA) so the whole image's
RNG advances as pure vector ops on the VPU.  All arithmetic wraps
mod 2^32 exactly as in GLSL.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# np (not jnp) scalars: module-level jnp constants would initialize the
# default backend at import time, before the app can select a platform.
_MUL = np.uint32(1664525)
_INC = np.uint32(1013904223)
_GOLDEN = np.uint32(0x9E3779B9)
# float(vec2(seed)) * 2.32830643654e-10 — the GLSL constant, kept verbatim
# (it is not exactly 2^-32).
_TO_FLOAT = np.float32(2.32830643654e-10)


def prng_seed(px, py, frame):
    """Seed hash — rand.glsl:89-94.

    px, py: integer pixel coordinates (any uint/int array, same shape).
    frame: frame counter (scalar or broadcastable array).
    Returns (sx, sy) uint32 state arrays.
    """
    px = px.astype(jnp.uint32)
    py = py.astype(jnp.uint32)
    frame = jnp.asarray(frame).astype(jnp.uint32)
    sx = px * _GOLDEN + frame
    sy = py * _GOLDEN + frame
    sx = sx ^ (sx >> 16)
    sy = sy ^ (sy >> 16)
    return sx * _GOLDEN, sy * _GOLDEN


def pcg2d(sx, sy):
    """One PCG2D step — rand.glsl:76-87.

    Takes the current state (sx, sy) and returns
    ``(new_sx, new_sy, fx, fy)`` where fx, fy are the two f32 uniforms
    derived from the *updated* state (matching the GLSL inout
    semantics).  Callers must thread the new state onward, and must
    only commit the state where the lane actually drew (masked
    ``jnp.where``) to stay stream-exact with the reference's early
    loop breaks.
    """
    sx = sx * _MUL + _INC
    sy = sy * _MUL + _INC
    sx = sx + _MUL * sy
    sy = sy + _MUL * sx
    sx = sx ^ (sx >> 16)
    sy = sy ^ (sy >> 16)
    sx = sx + _MUL * sy
    sy = sy + _MUL * sx
    sx = sx ^ (sx >> 16)
    sy = sy ^ (sy >> 16)
    fx = sx.astype(jnp.float32) * _TO_FLOAT
    fy = sy.astype(jnp.float32) * _TO_FLOAT
    return sx, sy, fx, fy


def pcg2d_reference_u32(sx: int, sy: int):
    """Pure-python uint32 model of one pcg2d step (for tests)."""
    m = 0xFFFFFFFF

    def step(x, y):
        x = (x * 1664525 + 1013904223) & m
        y = (y * 1664525 + 1013904223) & m
        x = (x + 1664525 * y) & m
        y = (y + 1664525 * x) & m
        x ^= x >> 16
        y ^= y >> 16
        x = (x + 1664525 * y) & m
        y = (y + 1664525 * x) & m
        x ^= x >> 16
        y ^= y >> 16
        return x, y

    return step(sx, sy)
