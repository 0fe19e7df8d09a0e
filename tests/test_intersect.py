"""Möller–Trumbore + brute force closest hit."""

import numpy as np
import jax.numpy as jnp

from vulkan_pathtracer_tpu.models import gltf
from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
from vulkan_pathtracer_tpu.ops.intersect import (
    MISS_T,
    brute_force_closest_hit,
    moller_trumbore,
)


def test_single_triangle_hit():
    v0 = jnp.array([[0.0, 0.0, 5.0]])
    e1 = jnp.array([[2.0, 0.0, 0.0]])   # v1 = (2,0,5)
    e2 = jnp.array([[0.0, 2.0, 0.0]])   # v2 = (0,2,5)
    origin = jnp.array([[0.5, 0.5, 0.0]])
    direction = jnp.array([[0.0, 0.0, 1.0]])
    # winding: cross(e1,e2) = +z; ray dir +z => dot>0 => det<0 => culled!
    hit, t, u, v = moller_trumbore(origin, direction, v0, e1, e2, 0.001, 1e9)
    assert not bool(hit[0])
    # flip winding (swap e1/e2): front face toward -z ray? cross(e2,e1)=-z
    hit, t, u, v = moller_trumbore(origin, direction, e2, e1, v0 * 0 + v0, 0.001, 1e9)
    # Construct properly: v0=(0,0,5), e1=(0,2,0), e2=(2,0,0)
    hit, t, u, v = moller_trumbore(
        origin, direction,
        jnp.array([[0.0, 0.0, 5.0]]),
        jnp.array([[0.0, 2.0, 0.0]]),
        jnp.array([[2.0, 0.0, 0.0]]),
        0.001, 1e9,
    )
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 5.0, rtol=1e-6)
    # barycentrics: hit point (0.5,0.5): u along e1=(0,2,0) -> 0.25
    np.testing.assert_allclose(float(u[0]), 0.25, rtol=1e-5)
    np.testing.assert_allclose(float(v[0]), 0.25, rtol=1e-5)


def test_backface_culling_box(box_glb):
    """Rays from inside the box hit nothing (all faces point outward)."""
    scene = gltf.load(box_glb)
    dev = build_device_scene(scene, build_bvh=False)
    n = 16
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origin = jnp.zeros((n, 3), jnp.float32)
    hit = brute_force_closest_hit(dev, origin, jnp.asarray(dirs, jnp.float32))
    assert (np.asarray(hit.t) >= float(MISS_T)).all()


def test_box_hit_from_outside(box_glb):
    scene = gltf.load(box_glb)
    dev = build_device_scene(scene, build_bvh=False)
    origin = jnp.array([[0.0, 0.0, -3.0]], jnp.float32)
    direction = jnp.array([[0.0, 0.0, 1.0]], jnp.float32)
    hit = brute_force_closest_hit(dev, origin, direction)
    np.testing.assert_allclose(float(hit.t[0]), 2.5, rtol=1e-5)
    assert int(hit.tri[0]) >= 0


def test_tmin_respected(box_glb):
    scene = gltf.load(box_glb)
    dev = build_device_scene(scene, build_bvh=False)
    # Origin exactly on the front face, looking in: tmin skips self-hit,
    # and the back face is culled -> miss.
    origin = jnp.array([[0.0, 0.0, -0.5]], jnp.float32)
    direction = jnp.array([[0.0, 0.0, 1.0]], jnp.float32)
    hit = brute_force_closest_hit(dev, origin, direction)
    assert float(hit.t[0]) >= float(MISS_T)


def test_active_mask(box_glb):
    scene = gltf.load(box_glb)
    dev = build_device_scene(scene, build_bvh=False)
    origin = jnp.tile(jnp.array([[0.0, 0.0, -3.0]], jnp.float32), (2, 1))
    direction = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (2, 1))
    active = jnp.array([True, False])
    hit = brute_force_closest_hit(dev, origin, direction, active=active)
    assert float(hit.t[0]) < 1e31
    assert float(hit.t[1]) >= float(MISS_T)
    assert int(hit.tri[1]) == -1
