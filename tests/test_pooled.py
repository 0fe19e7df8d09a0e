"""Cross-frame pooled wavefront (frames-in-flight) exactness tests.

render_pooled merges several frames' rays into one sorted wavefront
purely for traversal-packet density; per-frame pcg2d streams are
independent (frame seeds the stream, ray_gen.rgen:41) and every lane
scatters to its own output row, so each pooled frame equals rendering
it alone up to XLA fma-fusion differences between the two programs
(1-ulp; same tolerance as the render_frames_joint exactness test).
"""

import numpy as np
import pytest

from vulkan_pathtracer_tpu.models import gltf
from vulkan_pathtracer_tpu.models.camera import Camera
from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
from vulkan_pathtracer_tpu.render.pipeline import RenderPipeline
from vulkan_pathtracer_tpu.utils.config import RenderConfig


@pytest.fixture(scope="module")
def cornell_pipeline(request):
    scene = gltf.load(request.getfixturevalue("cornell_glb"))
    dev = build_device_scene(scene, build_bvh=True)
    config = RenderConfig(
        num_samples=1, num_bounces=3, resolution_x=48, resolution_y=40
    )
    return RenderPipeline(dev, config)


def _cam(pos, yaw):
    cam = Camera(aspect_ratio=48 / 40,
                 position=np.asarray(pos, np.float32))
    cam.set_orientation(yaw=yaw, pitch=0.0)
    return cam


def test_pooled_matches_sequential(cornell_pipeline):
    """Three frames, three different cameras: pooled == sequential,
    bit for bit, and the ray count matches."""
    cams = [_cam((0, 1, 2.5), 180.0), _cam((0.3, 1, 2.4), 175.0),
            _cam((-0.3, 1.1, 2.6), 185.0)]
    frames = [5, 6, 9]
    images, rays = cornell_pipeline.render_pooled(cams, frames)
    images = np.asarray(images)
    assert images.shape == (3, 40, 48, 3)

    seq_rays = 0.0
    for i, (cam, fr) in enumerate(zip(cams, frames)):
        ref, r = cornell_pipeline.render_numpy(cam, fr)
        seq_rays += r
        np.testing.assert_allclose(images[i], ref, rtol=1e-5, atol=1e-6)
    assert float(rays) == pytest.approx(seq_rays)


def test_pooled_single_frame(cornell_pipeline):
    """F=1 degenerates to a plain render."""
    cam = _cam((0, 1, 2.5), 180.0)
    images, _ = cornell_pipeline.render_pooled([cam], [3])
    ref, _ = cornell_pipeline.render_numpy(cam, 3)
    np.testing.assert_allclose(np.asarray(images)[0], ref,
                               rtol=1e-5, atol=1e-6)


def test_pooled_rejects_multisample(cornell_pipeline):
    import dataclasses

    config = dataclasses.replace(cornell_pipeline.config, num_samples=2)
    pipe = RenderPipeline(cornell_pipeline.scene, config)
    with pytest.raises(ValueError):
        pipe.render_pooled([_cam((0, 1, 2.5), 180.0)], [0])
