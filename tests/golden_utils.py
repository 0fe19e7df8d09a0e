"""Golden-image helpers with Monte-Carlo-aware comparison.

The comparison pipeline replicates the reference's present path:
clamp + unorm8 quantize (SURVEY.md §7 hard-part #4), then compares at
two levels:

- strict: per-pixel |delta| <= tol_levels on >= frac_exact of pixels
  (catches code regressions; goldens are rendered by this repo)
- statistical: mean/std of the linear images within MC tolerance
  (robust to 1-ulp backend drift)
"""

from __future__ import annotations

import os

import numpy as np

from vulkan_pathtracer_tpu.models import gltf
from vulkan_pathtracer_tpu.models.camera import Camera
from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
from vulkan_pathtracer_tpu.render.pipeline import RenderPipeline
from vulkan_pathtracer_tpu.utils.config import RenderConfig
from vulkan_pathtracer_tpu.utils.png import quantize_unorm8, read_png, write_png

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

# (name, scene fixture, config kwargs, camera kwargs)
GOLDEN_CONFIGS = {
    # BASELINE config[0]: Box, low res for CI speed.
    "box": dict(
        scene="box",
        config=dict(num_samples=1, num_bounces=2,
                    resolution_x=64, resolution_y=64),
        camera=dict(position=(0.0, 0.5, -3.0), yaw=0.0, pitch=10.0),
        frame=0,
    ),
    # BASELINE config[3]: emissive interior, deeper bounces.
    "cornell": dict(
        scene="cornell",
        config=dict(num_samples=4, num_bounces=4,
                    resolution_x=48, resolution_y=48),
        camera=dict(position=(0.0, 1.0, 0.9), yaw=180.0, pitch=0.0),
        frame=0,
    ),
    # BASELINE config[1]: textured PBR.
    "sphere": dict(
        scene="sphere",
        config=dict(num_samples=2, num_bounces=2,
                    resolution_x=48, resolution_y=48),
        camera=dict(position=(0.0, 0.0, -3.0), yaw=0.0, pitch=0.0),
        frame=0,
    ),
    # config[1] close-up: the sphere fills the frame so the pinned
    # image is dominated by the checker base-color x factor product,
    # the metal-rough texture's BRDF lobes, and the normal-map TBN
    # perturbation (material.glsl:31-68 semantics end to end).
    "textured": dict(
        scene="sphere",
        config=dict(num_samples=4, num_bounces=2,
                    resolution_x=64, resolution_y=64),
        camera=dict(position=(0.55, 0.35, -1.75), yaw=-8.0,
                    pitch=-10.0),
        frame=0,
    ),
}


def render_golden(name: str, scene_path: str) -> np.ndarray:
    spec = GOLDEN_CONFIGS[name]
    config = RenderConfig(**spec["config"])
    scene = gltf.load(scene_path)
    dev = build_device_scene(scene, build_bvh=True)
    cam = Camera(aspect_ratio=config.aspect_ratio,
                 position=np.asarray(spec["camera"]["position"], np.float32))
    cam.set_orientation(yaw=spec["camera"]["yaw"],
                        pitch=spec["camera"]["pitch"])
    image, _ = RenderPipeline(dev, config).render_numpy(cam, spec["frame"])
    return image


def golden_path(name: str) -> str:
    return os.path.join(GOLDEN_DIR, f"{name}.png")


def compare_to_golden(name: str, image: np.ndarray,
                      tol_levels: int = 2, frac_exact: float = 0.995,
                      mean_tol: float = 0.01):
    golden = read_png(golden_path(name)).astype(np.int32)
    got = quantize_unorm8(image).astype(np.int32)
    assert golden.shape == got.shape, (golden.shape, got.shape)
    delta = np.abs(golden - got)
    frac_ok = float((delta <= tol_levels).mean())
    mean_diff = abs(golden.mean() - got.mean()) / 255.0
    assert frac_ok >= frac_exact, (
        f"{name}: only {frac_ok:.4f} of channel values within "
        f"{tol_levels} levels (max delta {delta.max()})"
    )
    assert mean_diff <= mean_tol, f"{name}: mean drift {mean_diff:.4f}"


def write_golden(name: str, image: np.ndarray) -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    write_png(golden_path(name), image)
