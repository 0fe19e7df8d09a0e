"""BASELINE config[4] end-to-end: animated fly-through with per-frame
rebake + BVH refit + framebuffer tiling across the 8-device mesh —
all one jitted step per frame."""

import numpy as np
import jax
import jax.numpy as jnp

from vulkan_pathtracer_tpu.models import gltf
from vulkan_pathtracer_tpu.models.animation import build_animated_scene
from vulkan_pathtracer_tpu.models.camera import Camera
from vulkan_pathtracer_tpu.app.camera_path import orbit_path
from vulkan_pathtracer_tpu.parallel.mesh import make_render_mesh
from vulkan_pathtracer_tpu.parallel.sharding import make_sharded_render


def test_animated_flythrough_multichip(columns_glb):
    scene = gltf.load(columns_glb)
    anim = build_animated_scene(scene)
    t0 = anim.initial_transforms(scene)

    # Example scene AFTER rebake (refit drops the wide tiles, so the
    # pytree structure differs from anim.base).
    example = anim.with_transforms(t0)

    mesh = make_render_mesh(8)
    width, height = 16, 32
    render = make_sharded_render(
        mesh, example, num_samples=1, num_bounces=2,
        width=width, height=height, traversal="bvh",
    )

    @jax.jit
    def step(transforms, pos, hor, ver, fwd, frame):
        dev = anim.with_transforms(transforms)
        return render(dev, pos, hor, ver, fwd, frame)

    cam = Camera(aspect_ratio=width / height)
    path = orbit_path(radius=10.0, height=4.0, duration=2.0)

    t = np.asarray(t0)
    images = []
    for frame in range(3):
        path.apply(cam, frame * 0.5)
        pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())
        # Animate: instances drift upward each frame.
        t_f = t.copy()
        t_f[:, 1, 3] += 0.3 * frame
        img, rays = step(jnp.asarray(t_f), pos, hor, ver, fwd,
                         jnp.uint32(frame))
        img = np.asarray(img)
        assert img.shape == (height, width, 3)
        assert np.isfinite(img).all()
        assert float(rays) >= width * height
        images.append(img)

    # Camera + geometry move => frames must differ.
    assert np.abs(images[0] - images[1]).max() > 1e-4
    assert np.abs(images[1] - images[2]).max() > 1e-4
