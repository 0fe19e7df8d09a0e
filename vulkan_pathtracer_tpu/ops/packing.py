"""unorm8 packing helpers.

Mirrors the reference's RGBA8 quantization of material factors
(``Scene.zig:457-475``: Zig ``@intFromFloat`` truncates toward zero)
and GLSL ``unpackUnorm4x8`` (``material.glsl:35-53``: byte / 255).
Component x = bits 0..7, y = 8..15, z = 16..23, w = 24..31.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def pack_unorm4x8(r: float, g: float, b: float, a: float) -> int:
    """Host-side factor quantization: trunc(f*255) per component.

    Matches Zig's ``@intFromFloat(f * 255.0)`` at Scene.zig:457-475.
    Inputs are clamped to [0, 1] (glTF factors are spec-bounded).
    """
    def q(f: float) -> int:
        return int(min(max(f, 0.0), 1.0) * 255.0)  # trunc toward zero

    return q(r) | (q(g) << 8) | (q(b) << 16) | (q(a) << 24)


def unpack_unorm4x8(word):
    """Device-side unpack: uint32 array -> 4 f32 arrays in [0,1].

    GLSL unpackUnorm4x8 semantics (byte / 255.0).
    """
    word = word.astype(jnp.uint32)
    d = jnp.float32(255.0)
    x = (word & jnp.uint32(0xFF)).astype(jnp.float32) / d
    y = ((word >> 8) & jnp.uint32(0xFF)).astype(jnp.float32) / d
    z = ((word >> 16) & jnp.uint32(0xFF)).astype(jnp.float32) / d
    w = ((word >> 24) & jnp.uint32(0xFF)).astype(jnp.float32) / d
    return x, y, z, w


def unpack_unorm4x8_np(word: int):
    """NumPy/host unpack (tests, loaders)."""
    return np.array(
        [
            (word & 0xFF) / 255.0,
            ((word >> 8) & 0xFF) / 255.0,
            ((word >> 16) & 0xFF) / 255.0,
            ((word >> 24) & 0xFF) / 255.0,
        ],
        dtype=np.float32,
    )
