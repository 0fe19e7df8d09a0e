"""End-to-end render tests: the M1 minimum slice (BASELINE config[0])."""

import numpy as np
import pytest

from vulkan_pathtracer_tpu.models import gltf
from vulkan_pathtracer_tpu.models.camera import Camera
from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
from vulkan_pathtracer_tpu.render.pipeline import RenderPipeline
from vulkan_pathtracer_tpu.utils.config import RenderConfig


@pytest.fixture(scope="module")
def box_pipeline(request):
    box_glb = request.getfixturevalue("box_glb")
    scene = gltf.load(box_glb)
    dev = build_device_scene(scene, build_bvh=True)
    config = RenderConfig(
        num_samples=1, num_bounces=2, resolution_x=64, resolution_y=64
    )
    return RenderPipeline(dev, config)


def make_camera(config, position=(0.0, 0.0, -3.0), yaw=180.0, pitch=0.0):
    cam = Camera(aspect_ratio=config.aspect_ratio,
                 position=np.asarray(position, np.float32))
    # Default camera at origin looks +z; the box sits at origin, so
    # place the camera at -z looking +z (yaw 180 looks -z... our
    # camera at (0,0,-3) with identity yaw looks +z toward the box).
    cam.set_orientation(yaw=yaw, pitch=pitch)
    return cam


def test_box_render_smoke(box_pipeline):
    cam = Camera(aspect_ratio=1.0, position=np.array([0, 0, -3], np.float32))
    image, rays = box_pipeline.render_numpy(cam, frame=0)
    assert image.shape == (64, 64, 3)
    assert np.isfinite(image).all()
    assert rays > 0
    # Center pixels hit the red-ish box; corners see sky.
    center = image[32, 32]
    corner = image[0, 0]
    assert center[0] > center[2]  # red-dominant box
    # Sky at the top corner is the mix(white, blue) gradient: blue >= red.
    assert corner[2] >= corner[0]


def test_box_render_deterministic(box_pipeline):
    cam = Camera(aspect_ratio=1.0, position=np.array([0, 0, -3], np.float32))
    img1, _ = box_pipeline.render_numpy(cam, frame=7)
    img2, _ = box_pipeline.render_numpy(cam, frame=7)
    np.testing.assert_array_equal(img1, img2)
    img3, _ = box_pipeline.render_numpy(cam, frame=8)
    assert not np.array_equal(img1, img3)  # frame seeds the RNG


def test_sky_only_render(box_pipeline):
    """Camera looking straight up: pure sky gradient, analytically known."""
    cam = Camera(aspect_ratio=1.0, position=np.array([0, 5, 0], np.float32))
    cam.set_orientation(yaw=0.0, pitch=-90.0)  # pitch -90 -> forward +y
    image, _ = box_pipeline.render_numpy(cam, frame=0)
    # All rays point up-ish: sky = mix(white, blue, .5*(y+1)), y near 1
    # at center -> color ~ (0.5, 0.7, 1.0)
    center = image[32, 32]
    np.testing.assert_allclose(center, [0.5, 0.7, 1.0], atol=0.03)


def test_brute_and_bvh_agree(request):
    box_glb = request.getfixturevalue("box_glb")
    scene = gltf.load(box_glb)
    dev = build_device_scene(scene, build_bvh=True)
    config_bvh = RenderConfig(resolution_x=32, resolution_y=32,
                              traversal="bvh")
    config_brt = RenderConfig(resolution_x=32, resolution_y=32,
                              traversal="brute")
    cam = Camera(aspect_ratio=1.0, position=np.array([0.5, 0.5, -3], np.float32))
    img_bvh, _ = RenderPipeline(dev, config_bvh).render_numpy(cam, 0)
    img_brt, _ = RenderPipeline(dev, config_brt).render_numpy(cam, 0)
    np.testing.assert_allclose(img_bvh, img_brt, atol=1e-5)


def test_emissive_cornell(request):
    cornell_glb = request.getfixturevalue("cornell_glb")
    scene = gltf.load(cornell_glb)
    dev = build_device_scene(scene, build_bvh=True)
    config = RenderConfig(num_samples=4, num_bounces=4,
                          resolution_x=32, resolution_y=32)
    cam = Camera(aspect_ratio=1.0, position=np.array([0, 1.0, 0.9], np.float32))
    cam.set_orientation(yaw=180.0, pitch=0.0)  # look -z into the room
    image, _ = RenderPipeline(dev, config).render_numpy(cam, frame=0)
    assert np.isfinite(image).all()
    # The interior receives light only from the emissive panel: image
    # must be non-black somewhere and not all sky.
    assert image.max() > 0.05
    assert image.mean() < 0.9  # it's an interior, not the sky


def test_textured_sphere_render(request):
    sphere_glb = request.getfixturevalue("sphere_glb")
    scene = gltf.load(sphere_glb)
    dev = build_device_scene(scene, build_bvh=True)
    config = RenderConfig(num_samples=2, num_bounces=2,
                          resolution_x=48, resolution_y=48)
    cam = Camera(aspect_ratio=1.0, position=np.array([0, 0, -3], np.float32))
    image, _ = RenderPipeline(dev, config).render_numpy(cam, frame=0)
    assert np.isfinite(image).all()
    # checker texture should produce visible variance on the sphere
    patch = image[20:28, 20:28]
    assert patch.std() > 0.01


def test_russian_roulette_unbiased(request):
    """RR render mean ~= plain render mean (within MC tolerance)."""
    cornell_glb = request.getfixturevalue("cornell_glb")
    scene = gltf.load(cornell_glb)
    dev = build_device_scene(scene, build_bvh=True)
    cam = Camera(aspect_ratio=1.0, position=np.array([0, 1.0, 0.9], np.float32))
    cam.set_orientation(yaw=180.0, pitch=0.0)
    base = RenderConfig(num_samples=32, num_bounces=5,
                        resolution_x=16, resolution_y=16)
    rr = RenderConfig(num_samples=32, num_bounces=5,
                      resolution_x=16, resolution_y=16,
                      russian_roulette=True, rr_start_bounce=2)
    img_a, _ = RenderPipeline(dev, base).render_numpy(cam, frame=0)
    img_b, _ = RenderPipeline(dev, rr).render_numpy(cam, frame=0)
    assert abs(img_a.mean() - img_b.mean()) < 0.05


def test_joint_progressive_batch_matches_sequential(columns_glb):
    """render_frames_joint (shared primary + cross-frame sorted
    bounces) must equal the sum of individually rendered frames to fp
    noise, including with Russian roulette (per-frame RNG streams are
    independent, so vectorizing over frames is exact)."""
    import jax.numpy as jnp

    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.camera import Camera
    from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
    from vulkan_pathtracer_tpu.render.pipeline import (
        render_frame,
        render_frames_joint,
    )

    scene = gltf.load(columns_glb)
    dev = build_device_scene(scene, build_bvh=True)
    cam = Camera(aspect_ratio=1.0,
                 position=np.array([0, 2, -8], np.float32))
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())
    kw = dict(num_bounces=3, width=40, height=40, traversal="bvh")
    B = 3
    joint, rays_j = render_frames_joint(
        dev, pos, hor, ver, fwd, jnp.uint32(5), batch=B,
        russian_roulette=True, **kw,
    )
    seq = np.zeros((40, 40, 3), np.float32)
    for k in range(B):
        img, _ = render_frame(dev, pos, hor, ver, fwd, jnp.uint32(5 + k),
                              num_samples=1, russian_roulette=True, **kw)
        seq = seq + np.asarray(img)
    np.testing.assert_allclose(np.asarray(joint), seq,
                               rtol=1e-5, atol=1e-5)
    # Physical ray count: one shared primary + per-frame bounces.
    assert float(rays_j) < B * 40 * 40 * 3


def test_chunked_render_matches_unchunked(request, monkeypatch):
    """ray_chunk lax.map chunking is pure scheduling: the chunked
    render (which forces ONE stack-kernel family for every phase —
    mixed pair+quad bodies inside a chunked trace faulted the TPU
    worker, see wavefront.uniform_stack_kernel) must match unchunked
    renders to float-reassociation tolerance and trace EXACTLY the
    same ray count.  Bit-exactness is not claimed: chunking changes
    the compiled program's shapes, and XLA's fusion/reassociation
    choices differ between programs (measured: 69/12288 elements off
    by 2^-18 on CPU even with identical kernels and no sorting)."""
    import jax.numpy as jnp

    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
    from vulkan_pathtracer_tpu.render.pipeline import render_rows
    from vulkan_pathtracer_tpu.render.wavefront import uniform_stack_kernel

    for env in ("VKPT_PACKET", "VKPT_PAIR_PACKET", "VKPT_QUAD_PACKET"):
        monkeypatch.setenv(env + "_PRIMARY", "256")
        monkeypatch.setenv(env + "_SECONDARY", "256")
    scene = gltf.load(request.getfixturevalue("cornell_glb"))
    dev = build_device_scene(scene, build_bvh=True)
    cam = Camera(aspect_ratio=1.0,
                 position=np.array([0, 1, 3], np.float32))
    cam.set_orientation(yaw=180.0, pitch=0.0)
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())
    kw = dict(num_samples=1, num_bounces=2, width=64, height=64,
              traversal="pallas", sort_secondary=True)
    mixed, rays_mixed = render_rows(dev, pos, hor, ver, fwd,
                                    jnp.uint32(3), ray_chunk=0, **kw)
    for family in ("quad", "pair"):
        with uniform_stack_kernel(family):
            base, rays_base = render_rows(dev, pos, hor, ver, fwd,
                                          jnp.uint32(3), ray_chunk=0,
                                          **kw)
        monkeypatch.setenv("VKPT_CHUNK_KERNEL", family)
        img, rays = render_rows(dev, pos, hor, ver, fwd, jnp.uint32(3),
                                ray_chunk=1024, **kw)
        np.testing.assert_allclose(np.asarray(img), np.asarray(base),
                                   rtol=1e-4, atol=1e-5)
        assert float(rays) == float(rays_base)
        np.testing.assert_allclose(np.asarray(img), np.asarray(mixed),
                                   rtol=1e-4, atol=1e-5)
        assert float(rays) == float(rays_mixed)
