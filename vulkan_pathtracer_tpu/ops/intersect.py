"""Ray-triangle intersection (Möller–Trumbore) + brute-force closest hit.

The reference gets intersection for free from RT hardware via
``traceRayEXT`` with flags Opaque | CullBackFacingTriangles
(ray_gen.rgen:50-63); here it is explicit vector math.

Semantics parity:

- tmin = 0.001, tmax = 10000.0 (ray_gen.rgen:38-39); miss sentinel
  t == 1e32 (ray_gen.rgen:50, 65).
- Backface culling via the MT determinant sign on world-space edges:
  det <= 0 -> cull (counter-clockwise front faces, Vulkan default).
- Barycentrics (u, v) match ``hitAttributeEXT vec2 attribs``:
  weights (1-u-v, u, v) for vertices 0, 1, 2 (triangle.glsl:50-54).

The brute-force path is the correctness oracle (and is exact for tiny
scenes like the Box config); production traversal lives in
``ops.traverse``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# np (not jnp) scalar: a module-level jnp constant would initialize the
# default backend at import time, before the app can select a platform.
MISS_T = np.float32(1e32)
TMIN = 0.001
TMAX = 10000.0


class Hit(NamedTuple):
    t: jnp.ndarray        # (N,) f32 — MISS_T where missed
    tri: jnp.ndarray      # (N,) int32 — -1 where missed
    u: jnp.ndarray        # (N,) f32
    v: jnp.ndarray        # (N,) f32


def moller_trumbore(origin, direction, v0, e1, e2, tmin, t_limit,
                    det_sign=None):
    """Batched MT with backface culling.

    origin/direction: (..., 3); v0/e1/e2: broadcast-compatible (..., 3).
    ``det_sign`` (optional, broadcastable): multiplies the determinant
    in the cull test only — instanced object-space intersection keeps
    the reference's WORLD-winding cull under mirroring transforms
    (sign(det world) = sign(det object) * sign(det M)).
    Returns (hit_mask, t, u, v) with shapes (...,).
    """
    px = direction[..., 1] * e2[..., 2] - direction[..., 2] * e2[..., 1]
    py = direction[..., 2] * e2[..., 0] - direction[..., 0] * e2[..., 2]
    pz = direction[..., 0] * e2[..., 1] - direction[..., 1] * e2[..., 0]
    det = e1[..., 0] * px + e1[..., 1] * py + e1[..., 2] * pz
    # Backface cull: front faces have det > 0 (CCW winding).
    if det_sign is not None:
        front = det * det_sign > 0.0
    else:
        front = det > 0.0
    inv_det = 1.0 / jnp.where(front, det, 1.0)

    tx = origin[..., 0] - v0[..., 0]
    ty = origin[..., 1] - v0[..., 1]
    tz = origin[..., 2] - v0[..., 2]
    u = (tx * px + ty * py + tz * pz) * inv_det

    qx = ty * e1[..., 2] - tz * e1[..., 1]
    qy = tz * e1[..., 0] - tx * e1[..., 2]
    qz = tx * e1[..., 1] - ty * e1[..., 0]
    v = (
        direction[..., 0] * qx + direction[..., 1] * qy + direction[..., 2] * qz
    ) * inv_det
    t = (e2[..., 0] * qx + e2[..., 1] * qy + e2[..., 2] * qz) * inv_det

    hit = (
        front
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmin)
        & (t < t_limit)
    )
    return hit, t, u, v


def leaf_seed_hit(scene, origin, direction, block_idx, active=None,
                  tmin=TMIN, tmax=TMAX) -> Hit:
    """Cheap local pre-pass: intersect each ray against ONE leaf block
    (typically the block its origin surface belongs to).  The result
    seeds t_best for the full traversal — a tight initial bound that
    lets the BVH prune everything farther than local geometry.  The
    seed is itself a valid hit, so traversal results are unchanged.

    block_idx: (N,) int32 leaf-block row ids (clamped); scene needs
    tri_blocks.
    """
    n = origin.shape[0]
    block = scene.max_leaf_size
    n_blocks = scene.tri_blocks.shape[0]
    rows = jnp.take(
        scene.tri_blocks,
        jnp.clip(block_idx, 0, n_blocks - 1),
        axis=0,
    )  # (N, block*9)
    t_best = jnp.full((n,), MISS_T, dtype=jnp.float32)
    tri_best = jnp.full((n,), -1, dtype=jnp.int32)
    u_best = jnp.zeros((n,), dtype=jnp.float32)
    v_best = jnp.zeros((n,), dtype=jnp.float32)
    base = jnp.clip(block_idx, 0, n_blocks - 1) * block
    for k in range(block):
        tri9 = rows[:, k * 9:(k + 1) * 9]
        t_lim = jnp.minimum(t_best, jnp.float32(tmax))
        hit, t, u, v = moller_trumbore(
            origin, direction,
            tri9[:, 0:3], tri9[:, 3:6], tri9[:, 6:9], tmin, t_lim,
        )
        if active is not None:
            hit = hit & active
        t_best = jnp.where(hit, t, t_best)
        tri_best = jnp.where(hit, (base + k).astype(jnp.int32), tri_best)
        u_best = jnp.where(hit, u, u_best)
        v_best = jnp.where(hit, v, v_best)
    return Hit(t=t_best, tri=tri_best, u=u_best, v=v_best)


def brute_force_closest_hit(scene, origin, direction, active=None,
                            tmin=TMIN, tmax=TMAX, chunk: int = 256) -> Hit:
    """O(rays x tris) closest hit, chunked over triangles to bound the
    (N, chunk) intermediate. scene: DeviceScene."""
    n = origin.shape[0]
    t_total = scene.tri_v0.shape[0]  # padded to a multiple of PAD >= chunk?
    chunk = min(chunk, t_total)
    # padded triangle count is a multiple of 128; use a chunk that divides it.
    while t_total % chunk != 0:
        chunk //= 2
    num_chunks = t_total // chunk

    t_best0 = jnp.full((n,), MISS_T, dtype=jnp.float32)
    tri0 = jnp.full((n,), -1, dtype=jnp.int32)
    uv0 = jnp.zeros((n, 2), dtype=jnp.float32)

    o = origin[:, None, :]
    d = direction[:, None, :]

    def body(i, state):
        t_best, tri_best, uv_best = state
        start = i * chunk
        v0 = jax.lax.dynamic_slice(scene.tri_v0, (start, 0), (chunk, 3))
        e1 = jax.lax.dynamic_slice(scene.tri_e1, (start, 0), (chunk, 3))
        e2 = jax.lax.dynamic_slice(scene.tri_e2, (start, 0), (chunk, 3))
        t_limit = jnp.minimum(t_best, jnp.float32(tmax))
        hit, t, u, v = moller_trumbore(
            o, d, v0[None], e1[None], e2[None], tmin, t_limit[:, None]
        )
        t = jnp.where(hit, t, MISS_T)
        best = jnp.argmin(t, axis=1)
        t_new = jnp.take_along_axis(t, best[:, None], axis=1)[:, 0]
        improved = t_new < t_best
        rows = jnp.arange(n)
        u_new = u[rows, best]
        v_new = v[rows, best]
        t_best = jnp.where(improved, t_new, t_best)
        tri_best = jnp.where(
            improved, (start + best).astype(jnp.int32), tri_best
        )
        uv_best = jnp.where(
            improved[:, None], jnp.stack([u_new, v_new], axis=-1), uv_best
        )
        return t_best, tri_best, uv_best

    t_best, tri_best, uv_best = jax.lax.fori_loop(
        0, num_chunks, body, (t_best0, tri0, uv0)
    )
    if active is not None:
        t_best = jnp.where(active, t_best, MISS_T)
        tri_best = jnp.where(active, tri_best, -1)
    return Hit(t=t_best, tri=tri_best, u=uv_best[:, 0], v=uv_best[:, 1])
