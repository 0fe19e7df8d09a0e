"""BVH refit + animated scene rebake (the TLAS-refit analog)."""

import numpy as np
import jax.numpy as jnp

from vulkan_pathtracer_tpu.models import gltf
from vulkan_pathtracer_tpu.models.animation import build_animated_scene
from vulkan_pathtracer_tpu.models.camera import Camera
from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
from vulkan_pathtracer_tpu.ops.refit import refit_scene
from vulkan_pathtracer_tpu.render.pipeline import RenderPipeline, render_frame
from vulkan_pathtracer_tpu.utils.config import RenderConfig


def test_refit_reproduces_build_bounds(columns_glb):
    """Refitting the unmodified scene must reproduce the build AABBs."""
    scene = gltf.load(columns_glb)
    dev = build_device_scene(scene, build_bvh=True)
    refitted = refit_scene(dev)
    np.testing.assert_allclose(
        np.asarray(refitted.bvh_bmin), np.asarray(dev.bvh_bmin),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(refitted.bvh_bmax), np.asarray(dev.bvh_bmax),
        rtol=1e-6, atol=1e-6,
    )


def test_animated_identity_matches_static(box_glb):
    scene = gltf.load(box_glb)
    anim = build_animated_scene(scene)
    transforms = anim.initial_transforms(scene)
    dev = anim.with_transforms(transforms)

    np.testing.assert_allclose(
        np.asarray(dev.tri_v0), np.asarray(anim.base.tri_v0), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dev.bvh_bmin), np.asarray(anim.base.bvh_bmin), atol=1e-5
    )


def test_animated_translation_moves_hits(box_glb):
    scene = gltf.load(box_glb)
    anim = build_animated_scene(scene)
    t0 = np.asarray(anim.initial_transforms(scene))

    cam = Camera(aspect_ratio=1.0, position=np.array([0, 0, -3], np.float32))
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())

    def render(dev):
        img, _ = render_frame(
            dev, pos, hor, ver, fwd, jnp.uint32(0),
            num_samples=1, num_bounces=2, width=32, height=32,
            traversal="bvh",
        )
        return np.asarray(img)

    img_before = render(anim.with_transforms(jnp.asarray(t0)))
    # Move the box out of view.
    t1 = t0.copy()
    t1[0, :3, 3] += np.array([100.0, 0.0, 0.0])
    img_after = render(anim.with_transforms(jnp.asarray(t1)))

    # After the move every pixel is sky (blue >= red, strictly positive).
    assert (img_after[..., 2] >= img_after[..., 0]).all()
    assert img_after.min() > 0.1
    # Before the move the box occludes the center: images must differ.
    patch_b = img_before[12:20, 12:20]
    patch_a = img_after[12:20, 12:20]
    assert np.abs(patch_b - patch_a).max() > 0.05


def test_animated_rotation_keeps_finite(columns_glb):
    scene = gltf.load(columns_glb)
    anim = build_animated_scene(scene)
    t = np.asarray(anim.initial_transforms(scene))
    # Rotate all instances 45 deg about Y.
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    R = np.array([[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]],
                 np.float32)
    t2 = np.einsum("ij,njk->nik", R, t)
    dev = anim.with_transforms(jnp.asarray(t2))

    cam = Camera(aspect_ratio=1.0, position=np.array([0, 3, -10], np.float32))
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())
    img, _ = render_frame(
        dev, pos, hor, ver, fwd, jnp.uint32(0),
        num_samples=1, num_bounces=2, width=32, height=32, traversal="bvh",
    )
    assert np.isfinite(np.asarray(img)).all()


def test_ray_chunking_is_exact(box_glb):
    """Chunked dispatch must be bit-identical to unchunked."""
    scene = gltf.load(box_glb)
    dev = build_device_scene(scene, build_bvh=True)
    cam = Camera(aspect_ratio=1.0, position=np.array([0.3, 0.2, -3], np.float32))
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())

    kwargs = dict(num_samples=2, num_bounces=2, width=32, height=32,
                  traversal="bvh")
    img_a, rays_a = render_frame(dev, pos, hor, ver, fwd, jnp.uint32(1),
                                 ray_chunk=0, **kwargs)
    img_b, rays_b = render_frame(dev, pos, hor, ver, fwd, jnp.uint32(1),
                                 ray_chunk=256, **kwargs)
    # Different XLA fusion decisions between the two programs allow
    # 1-ulp drift; the sampling decisions themselves must agree.
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b),
                               atol=1e-6)
    assert float(rays_a) == float(rays_b)


def test_refit_regenerates_pair_table(columns_glb):
    """After a device refit the pair-stack table must reflect the new
    boxes: pair-kernel traversal over the refitted scene == XLA
    traversal over the same refitted scene."""
    import dataclasses

    import jax.numpy as jnp

    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.device_scene import (
        build_device_scene,
    )
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        pallas_pair_closest_hit,
    )
    from vulkan_pathtracer_tpu.ops.refit import refit_scene
    from vulkan_pathtracer_tpu.ops.traverse import bvh_closest_hit

    scene = gltf.load(columns_glb)
    dev = build_device_scene(scene, build_bvh=True)
    # Shift all geometry; refit must track it.
    shift = jnp.asarray([[0.5, 0.25, -0.75]], jnp.float32)
    moved = dataclasses.replace(dev, tri_v0=dev.tri_v0 + shift)
    refitted = refit_scene(moved)

    rng = np.random.default_rng(5)
    o = jnp.asarray(rng.uniform(-8, 8, size=(700, 3)).astype(np.float32))
    d = rng.normal(size=(700, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))

    ref = bvh_closest_hit(refitted, o, d)
    got = pallas_pair_closest_hit(refitted, o, d, interpret=True,
                                  packet=512)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)


def test_refit_regenerates_quad_table(columns_glb):
    """Quad-table regeneration through the static (src, enc) maps:
    (a) on unchanged geometry it reproduces the baked rows exactly,
    (b) after a shift+refit the quad kernel agrees with XLA."""
    import dataclasses

    import jax.numpy as jnp

    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.device_scene import (
        build_device_scene,
    )
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        pallas_quad_closest_hit,
    )
    from vulkan_pathtracer_tpu.ops.refit import refit_scene
    from vulkan_pathtracer_tpu.ops.traverse import bvh_closest_hit

    scene = gltf.load(columns_glb)
    dev = build_device_scene(scene, build_bvh=True)

    same = refit_scene(dev)
    np.testing.assert_array_equal(np.asarray(same.bvh_quad),
                                  np.asarray(dev.bvh_quad))

    shift = jnp.asarray([[0.3, -0.2, 0.6]], jnp.float32)
    refitted = refit_scene(
        dataclasses.replace(dev, tri_v0=dev.tri_v0 + shift))
    rng = np.random.default_rng(7)
    o = jnp.asarray(rng.uniform(-8, 8, size=(600, 3)).astype(np.float32))
    d = rng.normal(size=(600, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))
    ref = bvh_closest_hit(refitted, o, d)
    got = pallas_quad_closest_hit(refitted, o, d, interpret=True,
                                  packet=512)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)


def test_refit_regenerates_oct_table(columns_glb):
    """Oct-table regeneration through the static (src, enc) maps:
    (a) on unchanged geometry it reproduces the baked rows exactly,
    (b) after a shift+refit the oct kernel agrees with XLA."""
    import dataclasses

    import jax.numpy as jnp

    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.device_scene import (
        build_device_scene,
    )
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        pallas_oct_closest_hit,
    )
    from vulkan_pathtracer_tpu.ops.refit import refit_scene
    from vulkan_pathtracer_tpu.ops.traverse import bvh_closest_hit

    scene = gltf.load(columns_glb)
    dev = build_device_scene(scene, build_bvh=True)

    same = refit_scene(dev)
    np.testing.assert_array_equal(np.asarray(same.bvh_oct),
                                  np.asarray(dev.bvh_oct))

    shift = jnp.asarray([[0.3, -0.2, 0.6]], jnp.float32)
    refitted = refit_scene(
        dataclasses.replace(dev, tri_v0=dev.tri_v0 + shift))
    rng = np.random.default_rng(8)
    o = jnp.asarray(rng.uniform(-8, 8, size=(600, 3)).astype(np.float32))
    d = rng.normal(size=(600, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))
    ref = bvh_closest_hit(refitted, o, d)
    got = pallas_oct_closest_hit(refitted, o, d, interpret=True,
                                 packet=512)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)
