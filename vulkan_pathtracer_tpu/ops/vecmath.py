"""Small vec3 helpers over the trailing axis (f32 SoA-friendly).

These mirror GLSL semantics precisely where it matters:
``normalize`` uses 1/sqrt(dot) with no epsilon (GLSL normalize of a
zero vector is undefined there too — callers mask instead).
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def cross(a, b):
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def normalize(v):
    return v * jax_rsqrt(dot(v, v))[..., None]


def jax_rsqrt(x):
    import jax.lax as lax

    return lax.rsqrt(x)


def mix(a, b, t):
    """GLSL mix: a*(1-t) + b*t (GLSL computes x*(1-a)+y*a)."""
    return a * (1.0 - t) + b * t


def reflect(i, n):
    """GLSL reflect(I, N) = I - 2*dot(N, I)*N."""
    return i - 2.0 * dot(n, i)[..., None] * n


def luminance(rgb):
    """Rec.709 luma, constants from brdf.glsl:120."""
    return (
        rgb[..., 0] * 0.2126 + rgb[..., 1] * 0.7152 + rgb[..., 2] * 0.0722
    )
