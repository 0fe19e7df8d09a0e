"""vulkan_pathtracer_tpu — a TPU-native wavefront path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``antlilja/vulkan-pathtracer`` reference (Zig + Vulkan KHR ray tracing +
GLSL).  Everything the Vulkan *driver* did implicitly for the reference
(BVH build, traversal, ray-triangle intersection, texture sampling) is
first-class code here; everything the reference did explicitly (glTF
contract, material math, BRDF sampling, RNG, camera, CLI semantics) is
reproduced with the same numeric semantics.

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):

- ``ops``      — device math kernels: RNG, BRDF, intersection, BVH,
                 texture sampling (JAX + Pallas).
- ``models``   — scene/asset model: glTF loader, materials, textures,
                 camera, flattened device scene (SoA arrays).
- ``render``   — the compiled render pipeline: wavefront bounce loop,
                 progressive accumulation, unorm8 output.
- ``parallel`` — device mesh + shard_map framebuffer tiling, collectives.
- ``utils``    — CLI, timer, stats/metrics, PNG IO, config.
- ``app``      — headless driver loop and camera-path playback.
"""

__version__ = "0.1.0"

from vulkan_pathtracer_tpu.utils.config import RenderConfig  # noqa: F401
