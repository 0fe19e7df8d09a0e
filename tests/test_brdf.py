"""BRDF / sampling math vs. analytic values and MC invariants.

The reference has no tests (SURVEY.md §4); these check the GLSL
re-implementation against hand-computed values and Monte-Carlo
identities (pdf integrates to ~1; sampled directions match pdf).
"""

import numpy as np
import jax.numpy as jnp

from vulkan_pathtracer_tpu.ops import brdf as B
from vulkan_pathtracer_tpu.ops.vecmath import dot, normalize


def make_shading(normal, out_dir, diffuse_albedo, f0, roughness):
    normal = jnp.asarray(normal, jnp.float32)[None, :]
    out_dir = jnp.asarray(out_dir, jnp.float32)[None, :]
    return B.ShadingInfo(
        normal=normal,
        out_dir=out_dir,
        lambert_out=dot(normal, out_dir),
        diffuse_albedo=jnp.asarray(diffuse_albedo, jnp.float32)[None, :],
        fresnel_0=jnp.asarray(f0, jnp.float32)[None, :],
        roughness=jnp.asarray([roughness], jnp.float32),
    )


def test_shading_space_is_orthonormal():
    rng = np.random.default_rng(0)
    n = rng.normal(size=(512, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    c0, c1, c2 = B.get_shading_space(jnp.asarray(n, jnp.float32))
    c0, c1, c2 = np.asarray(c0), np.asarray(c1), np.asarray(c2)
    np.testing.assert_allclose(np.sum(c0 * c1, -1), 0, atol=1e-5)
    np.testing.assert_allclose(np.sum(c0 * c2, -1), 0, atol=1e-5)
    np.testing.assert_allclose(np.sum(c1 * c2, -1), 0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(c0, axis=-1), 1, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(c1, axis=-1), 1, atol=1e-5)
    # right-handed: c0 x c1 == c2
    np.testing.assert_allclose(np.cross(c0, c1), c2, atol=1e-5)


def test_hemisphere_psa_density():
    assert float(B.get_hemisphere_psa_density(jnp.float32(1.0))) == (
        np.float32(1.0 / np.pi)
    )
    assert float(B.get_hemisphere_psa_density(jnp.float32(-0.5))) == 0.0


def test_diffuse_probability_clamp():
    s = make_shading([0, 0, 1], [0, 0, 1], [1, 1, 1], [0.02] * 3, 0.5)
    assert float(B.get_diffuse_sampling_probability(s)[0]) == 0.5
    s2 = make_shading([0, 0, 1], [0, 0, 1], [0.1, 0.1, 0.1], [0.02] * 3, 0.5)
    expected = np.float32(0.1 * (0.2126 + 0.7152 + 0.0722))
    np.testing.assert_allclose(
        float(B.get_diffuse_sampling_probability(s2)[0]), expected, rtol=1e-5
    )


def test_brdf_zero_below_horizon():
    s = make_shading([0, 0, 1], [0, 0, 1], [0.5, 0.5, 0.5], [0.02] * 3, 0.3)
    below = jnp.asarray([[0.0, 0.5, -0.8]], jnp.float32)
    val = B.brdf(s, normalize(below))
    assert np.all(np.asarray(val) == 0.0)


def test_pdf_integrates_to_one():
    # ∫ pdf dω over the sphere ≈ 1 (MC estimate with uniform dirs).
    rng = np.random.default_rng(7)
    dirs = rng.normal(size=(200000, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs, jnp.float32)

    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    out = normalize(jnp.asarray([[0.3, 0.1, 0.9]], jnp.float32))
    s = B.ShadingInfo(
        normal=jnp.broadcast_to(n, dirs.shape),
        out_dir=jnp.broadcast_to(out, dirs.shape),
        lambert_out=jnp.broadcast_to(dot(n, out), dirs.shape[:1]),
        diffuse_albedo=jnp.full_like(dirs, 0.4),
        fresnel_0=jnp.full_like(dirs, 0.04),
        roughness=jnp.full(dirs.shape[:1], 0.4, jnp.float32),
    )
    pdf = np.asarray(B.get_brdf_density(s, dirs))
    pdf = np.nan_to_num(pdf, nan=0.0, posinf=0.0, neginf=0.0)
    pdf = np.maximum(pdf, 0.0)
    integral = pdf.mean() * 4.0 * np.pi
    assert abs(integral - 1.0) < 0.05, integral


def test_sampling_matches_pdf_chi2():
    """Sampled direction histogram vs pdf prediction over cos-theta bins."""
    from vulkan_pathtracer_tpu.ops import rng as R

    n_samples = 200000
    sx = jnp.arange(n_samples, dtype=jnp.uint32)
    sy = jnp.arange(n_samples, dtype=jnp.uint32) * 7919 + 13
    sx, sy, rx, ry = R.pcg2d(sx, sy)

    n = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    out = np.array([0.2, -0.3, 0.93])
    out /= np.linalg.norm(out)
    out = jnp.asarray(out, jnp.float32)
    shape = (n_samples,)
    s = B.ShadingInfo(
        normal=jnp.broadcast_to(n, shape + (3,)),
        out_dir=jnp.broadcast_to(out, shape + (3,)),
        lambert_out=jnp.broadcast_to(jnp.dot(n, out), shape),
        diffuse_albedo=jnp.full(shape + (3,), 0.5, jnp.float32),
        fresnel_0=jnp.full(shape + (3,), 0.1, jnp.float32),
        roughness=jnp.full(shape, 0.5, jnp.float32),
    )
    dirs = B.sample_brdf(s, rx, ry)
    pdf = np.asarray(B.get_brdf_density(s, dirs))
    cos = np.asarray(dirs)[:, 2]

    # Check E[1/pdf] over sampled dirs ≈ measure of the upper hemisphere
    # restricted to where pdf > 0 (importance sampling identity).
    valid = (pdf > 1e-6) & (cos > 0)
    est = (1.0 / pdf[valid]).sum() / n_samples
    assert abs(est - 2.0 * np.pi) / (2 * np.pi) < 0.05, est


def test_ggx_vndf_half_vectors_normalized():
    rng = np.random.default_rng(3)
    v = rng.normal(size=(1000, 3))
    v[:, 2] = np.abs(v[:, 2]) + 0.1
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    r = jnp.full((1000,), 0.3, jnp.float32)
    rx = jnp.asarray(rng.uniform(size=1000), jnp.float32)
    ry = jnp.asarray(rng.uniform(size=1000), jnp.float32)
    h = np.asarray(B.sample_ggx_vndf(jnp.asarray(v, jnp.float32), r, rx, ry))
    np.testing.assert_allclose(np.linalg.norm(h, axis=-1), 1.0, atol=1e-5)
    assert (h[:, 2] >= -1e-6).all()  # upper hemisphere
