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


def test_chunk_sorted_dispatch_identical(columns_glb, monkeypatch):
    """VKPT_SORT_CHUNK>1 orders C-lane groups instead of lanes — still
    pure scheduling; per-ray results must be identical to the exact
    sort AND the unsorted dispatch (n deliberately not divisible by
    the chunk to exercise the fallback)."""
    scene = gltf.load(columns_glb)
    dev = build_device_scene(scene)
    rng = np.random.default_rng(23)
    for n in (768, 700):  # divisible / NOT divisible by 16
        o = jnp.asarray(rng.uniform(-8, 8, size=(n, 3)).astype(np.float32))
        d = rng.normal(size=(n, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d.astype(np.float32))
        active = jnp.asarray(rng.random(n) < 0.7)

        plain = _closest_hit(dev, o, d, active, "bvh")
        monkeypatch.setenv("VKPT_SORT_CHUNK", "16")
        chunked = _closest_hit_sorted(dev, o, d, active, "bvh")
        monkeypatch.delenv("VKPT_SORT_CHUNK")
        np.testing.assert_array_equal(np.asarray(plain.t),
                                      np.asarray(chunked.t))
        np.testing.assert_array_equal(np.asarray(plain.tri),
                                      np.asarray(chunked.tri))


def test_progressive_batch_chunk_sort_matches(columns_glb, monkeypatch):
    """The joint progressive batch under chunk-granular sorting must
    reproduce the exact-sort radiance (scatter-add order may differ ->
    allclose, not equal) and the same traced-ray count."""
    from vulkan_pathtracer_tpu.render.pipeline import (
        _pixel_seeds, generate_rays,
    )
    from vulkan_pathtracer_tpu.render.wavefront import (
        trace_progressive_batch,
    )

    scene = gltf.load(columns_glb)
    dev = build_device_scene(scene)
    cam = Camera(aspect_ratio=1.0,
                 position=np.array([0, 2, -8], np.float32))
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())
    W = H = 32
    o, d = generate_rays(pos, hor, ver, fwd, W, H)
    sx0, sy0 = _pixel_seeds(W, H, jnp.uint32(1))
    sx1, sy1 = _pixel_seeds(W, H, jnp.uint32(2))
    sx = jnp.stack([sx0, sx1])
    sy = jnp.stack([sy0, sy1])

    kw = dict(batch=2, num_bounces=3, traversal="bvh")
    ref, rays_ref = trace_progressive_batch(dev, o, d, sx, sy, **kw)
    monkeypatch.setenv("VKPT_SORT_CHUNK", "16")
    got, rays_got = trace_progressive_batch(dev, o, d, sx, sy, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    assert float(rays_got) == float(rays_ref)


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


def test_laxsort_permute_identical(monkeypatch):
    """VKPT_PERMUTE=laxsort replaces argsort + row gather with one
    fused lax.sort carrying the payload columns.  With unique keys the
    two orderings are bit-identical; laxsort only differs (legally) in
    tie order across equal keys."""
    from vulkan_pathtracer_tpu.ops.sort import permute_rows

    rng = np.random.default_rng(3)
    m, k = 4096, 16
    key = jnp.asarray(rng.permutation(m).astype(np.uint32))
    state = jnp.asarray(rng.random((m, k), dtype=np.float32))

    monkeypatch.delenv("VKPT_PERMUTE", raising=False)
    ref = np.asarray(permute_rows(state, key, 1))
    monkeypatch.setenv("VKPT_PERMUTE", "laxsort")
    got = np.asarray(permute_rows(state, key, 1))
    np.testing.assert_array_equal(ref, got)

    # Duplicate keys: rows must be key-grouped and a permutation of
    # the input (scheduling-only contract).
    dup = jnp.asarray((rng.integers(0, 7, size=m)).astype(np.uint32))
    got_dup = np.asarray(permute_rows(state, dup, 1))
    order = np.argsort(np.asarray(dup), kind="stable")
    np.testing.assert_array_equal(
        np.sort(got_dup, axis=0), np.sort(np.asarray(state)[order], axis=0))
    # c>1 ignores the knob (group gather path unchanged).
    grp = np.asarray(permute_rows(state, key, 16))
    monkeypatch.delenv("VKPT_PERMUTE")
    np.testing.assert_array_equal(grp, np.asarray(permute_rows(state, key, 16)))
