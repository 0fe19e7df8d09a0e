"""Parity extras: divider present path, resize quirk, distributed
single-host no-op, profiling utilities."""

import numpy as np

from vulkan_pathtracer_tpu.models import gltf
from vulkan_pathtracer_tpu.models.camera import Camera
from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
from vulkan_pathtracer_tpu.render.output import Accumulator, upsample_nearest
from vulkan_pathtracer_tpu.render.pipeline import RenderPipeline
from vulkan_pathtracer_tpu.utils.config import RenderConfig
from vulkan_pathtracer_tpu.utils.png import quantize_unorm8


def test_divider_render_dimensions(box_glb):
    scene = gltf.load(box_glb)
    dev = build_device_scene(scene)
    config = RenderConfig(resolution_x=64, resolution_y=48,
                          render_resolution_divider=2)
    assert config.render_width == 32 and config.render_height == 24
    pipe = RenderPipeline(dev, config)
    cam = Camera(aspect_ratio=config.aspect_ratio,
                 position=np.array([0, 0, -3], np.float32))
    img, _ = pipe.render_numpy(cam, 0)
    assert img.shape == (24, 32, 3)
    up = upsample_nearest(img, 64, 48)
    assert up.shape == (48, 64, 3)
    # nearest: every 2x2 block constant
    assert np.array_equal(up[::2, ::2], up[1::2, 1::2])


def test_resize_drops_divider_like_reference(box_glb):
    """RaytracingPass.zig:677-704: resize recreates the storage image
    at the FULL new extent, not reapplying the divider."""
    scene = gltf.load(box_glb)
    dev = build_device_scene(scene)
    pipe = RenderPipeline(dev, RenderConfig(
        resolution_x=64, resolution_y=64, render_resolution_divider=2))
    assert pipe.width == 32
    pipe2 = pipe.resize(48, 48)
    assert pipe2.width == 48 and pipe2.height == 48
    assert pipe2.config.render_resolution_divider == 1


def test_unorm8_quantize_round_semantics():
    vals = np.array([[[0.0, 1.0, 2.0]]], dtype=np.float32)  # clamps 2->1
    q = quantize_unorm8(vals)
    assert list(q[0, 0]) == [0, 255, 255]
    # round-to-nearest-even at .5 boundaries: 0.5/255*... check 127.5
    v = np.array([[[127.5 / 255.0]]], dtype=np.float32)
    assert quantize_unorm8(v)[0, 0, 0] in (127, 128)


def test_distributed_single_host_noop():
    from vulkan_pathtracer_tpu.parallel import distributed

    assert distributed.initialize() is False
    assert distributed.is_primary() is True
    mesh = distributed.global_mesh()
    assert mesh.devices.size >= 1


def test_distributed_arg_and_env_plumbing(monkeypatch):
    """Mocked jax.distributed.initialize: explicit args and the
    JAX_* env fallbacks must reach the group-formation call with the
    right values (real multi-host hardware is unavailable here)."""
    import jax

    from vulkan_pathtracer_tpu.parallel import distributed

    calls = []

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None):
        calls.append((coordinator_address, num_processes, process_id))

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)

    # Explicit arguments win.
    assert distributed.initialize("10.0.0.1:8476", 4, 2) is True
    assert calls[-1] == ("10.0.0.1:8476", 4, 2)

    # Env fallbacks.
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "host0:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "8")
    monkeypatch.setenv("JAX_PROCESS_ID", "5")
    assert distributed.initialize() is True
    assert calls[-1] == ("host0:1234", 8, 5)

    # Args override env.
    assert distributed.initialize(process_id=0) is True
    assert calls[-1] == ("host0:1234", 8, 0)

    # Incomplete config (single process) -> no group, no call.
    n_calls = len(calls)
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    assert distributed.initialize() is False
    assert len(calls) == n_calls


def test_frame_profiler():
    import time

    from vulkan_pathtracer_tpu.utils.profiling import FrameProfiler

    prof = FrameProfiler()
    for _ in range(3):
        with prof.phase("render"):
            time.sleep(0.001)
    summary = prof.summary()
    assert summary["render"]["count"] == 3
    assert summary["render"]["mean_ms"] >= 1.0


def test_accumulator_checkpoint_roundtrip(tmp_path):
    acc = Accumulator(4, 4, spp_per_frame=2)
    img = np.random.default_rng(0).random((4, 4, 3)).astype(np.float32)
    acc.add_frame(img)
    acc.add_frame(img * 0.5)
    path = str(tmp_path / "acc.npz")
    acc.save(path)
    acc2 = Accumulator.load(path)
    assert acc2.spp == 4 and acc2.frame == 2
    np.testing.assert_allclose(acc2.mean, acc.mean)
