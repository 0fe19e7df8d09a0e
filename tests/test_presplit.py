"""Triangle pre-splitting (ops.bvh.presplit_triangle_refs): reference
boxes must cover each triangle, and rendering a presplit scene must be
radiance-identical (duplicate slots carry the same attributes; any
in-range MT hit is the same physical hit)."""

import numpy as np
import pytest

from vulkan_pathtracer_tpu.models import gltf
from vulkan_pathtracer_tpu.models.camera import Camera
from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
from vulkan_pathtracer_tpu.ops.bvh import presplit_triangle_refs
from vulkan_pathtracer_tpu.render.pipeline import RenderPipeline
from vulkan_pathtracer_tpu.utils.config import RenderConfig


def test_refs_cover_triangles():
    rng = np.random.default_rng(3)
    n = 2000
    v0 = rng.normal(size=(n, 3)).astype(np.float32)
    e1 = rng.normal(size=(n, 3)).astype(np.float32)
    e2 = rng.normal(size=(n, 3)).astype(np.float32)
    # A few huge triangles that should attract the splits.
    e1[:5] *= 50.0
    e2[:5] *= 50.0
    lo, hi, ref = presplit_triangle_refs(v0, e1, e2, budget_factor=0.25)
    assert lo.shape == hi.shape == (ref.shape[0], 3)
    assert ref.shape[0] > n  # some splits happened
    assert ref.shape[0] <= n + int(0.25 * n)
    # Every triangle still referenced; boxes non-degenerate ordering.
    assert np.array_equal(np.unique(ref), np.arange(n))
    assert (hi >= lo - 1e-6).all()
    # The union of a split triangle's ref boxes covers its full AABB.
    v1 = v0 + e1
    v2 = v0 + e2
    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)
    for t in range(5):
        rs = np.nonzero(ref == t)[0]
        assert len(rs) >= 2  # the huge ones got split
        np.testing.assert_allclose(lo[rs].min(axis=0), tmin[t], atol=1e-4)
        np.testing.assert_allclose(hi[rs].max(axis=0), tmax[t], atol=1e-4)


def test_presplit_render_identical(request):
    scene = gltf.load(request.getfixturevalue("columns_glb"))
    d0 = build_device_scene(scene, build_bvh=True, max_leaf_size=8,
                            presplit=0.0)
    d1 = build_device_scene(scene, build_bvh=True, max_leaf_size=8,
                            presplit=0.3)
    assert d1.tri_v0.shape[0] >= d0.tri_v0.shape[0]
    cfg = RenderConfig(num_samples=1, num_bounces=3,
                       resolution_x=64, resolution_y=48)
    cam = Camera(aspect_ratio=64 / 48,
                 position=np.array([4, 3, -8], np.float32))
    cam.set_orientation(yaw=150.0, pitch=-10.0)
    i0, _ = RenderPipeline(d0, cfg).render(cam, 3)
    i1, _ = RenderPipeline(d1, cfg).render(cam, 3)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
