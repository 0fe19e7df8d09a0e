"""Sorted-dispatch property tests: the octant+Morton bounce sort is
pure scheduling — per-ray results must be identical."""

import numpy as np
import jax.numpy as jnp

from vulkan_pathtracer_tpu.models import gltf
from vulkan_pathtracer_tpu.models.camera import Camera
from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
from vulkan_pathtracer_tpu.render.wavefront import (
    _closest_hit,
    _closest_hit_sorted,
)
from vulkan_pathtracer_tpu.render.pipeline import render_frame


def test_sorted_dispatch_identical(columns_glb):
    scene = gltf.load(columns_glb)
    dev = build_device_scene(scene)
    rng = np.random.default_rng(17)
    n = 700
    o = jnp.asarray(rng.uniform(-8, 8, size=(n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))
    active = jnp.asarray(rng.random(n) < 0.7)

    plain = _closest_hit(dev, o, d, active, "bvh")
    sorted_ = _closest_hit_sorted(dev, o, d, active, "bvh")
    np.testing.assert_array_equal(np.asarray(plain.t), np.asarray(sorted_.t))
    np.testing.assert_array_equal(np.asarray(plain.tri),
                                  np.asarray(sorted_.tri))
    np.testing.assert_array_equal(np.asarray(plain.u), np.asarray(sorted_.u))


def test_render_with_and_without_compaction(box_glb):
    scene = gltf.load(box_glb)
    dev = build_device_scene(scene)
    cam = Camera(aspect_ratio=1.0, position=np.array([0, 0.3, -3], np.float32))
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())
    kwargs = dict(num_samples=2, num_bounces=3, width=24, height=24,
                  traversal="bvh")
    img_a, rays_a = render_frame(dev, pos, hor, ver, fwd, jnp.uint32(3),
                                 sort_secondary=False, **kwargs)
    img_b, rays_b = render_frame(dev, pos, hor, ver, fwd, jnp.uint32(3),
                                 sort_secondary=True, **kwargs)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b),
                               atol=1e-6)
    assert float(rays_a) == float(rays_b)
