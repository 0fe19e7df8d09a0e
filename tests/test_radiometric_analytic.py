"""Analytic radiometric anchors (VERDICT r4 item 5).

Every other image test compares the renderer against itself (goldens)
or against a brute-force oracle that SHARES the repo's shading code.
These four tests pin the radiometry against closed forms and
independent numpy quadrature transcribed directly from the REFERENCE
GLSL (ray_gen.rgen:65-95, brdf.glsl:22-50, material semantics of
Scene.zig:457-475) — expected values share no code with the renderer,
so an independent implementation of the reference would pass them too.

1. Sky-only: every pixel = mix(white,(.5,.7,1),.5(dir.y+1)) with ray
   dirs recomputed here from Camera.zig/ray_gen.rgen conventions.
2. Emissive enclosure, 1 bounce: every pixel = quantized_emissive*10.
3. Furnace (constant-emission enclosure, 2 bounces): pixel =
   10E*(1 + rho(wo)) with rho the BRDF directional albedo by
   quadrature — catches pdf-weighting bugs MC cannot hide from.
4. Single-bounce diffuse+specular plane under the sky: pixel =
   integral of f(wo,wi) cos(wi) sky(wi) by quadrature.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from assets.procedural import MaterialDesc, _quad, box_prim, write_glb
from vulkan_pathtracer_tpu.models import gltf
from vulkan_pathtracer_tpu.models.camera import Camera
from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
from vulkan_pathtracer_tpu.render.pipeline import RenderPipeline
from vulkan_pathtracer_tpu.utils.config import RenderConfig


# --------------------------------------------------------------------------
# Independent reference math (transcribed from the GLSL, NOT imported
# from vulkan_pathtracer_tpu — that is the whole point of these tests).
# --------------------------------------------------------------------------
def _q8(f: float) -> float:
    """Factor quantization: trunc(clamp(f)*255)/255 (Scene.zig:457-475
    @intFromFloat + material.glsl unpackUnorm4x8)."""
    return int(min(max(f, 0.0), 1.0) * 255.0) / 255.0


def _sky(dirs: np.ndarray) -> np.ndarray:
    """ray_gen.rgen:65-70: mix(white, (.5,.7,1), .5*(dir.y+1))."""
    t = 0.5 * (dirs[..., 1] + 1.0)
    white = np.array([1.0, 1.0, 1.0])
    blue = np.array([0.5, 0.7, 1.0])
    return white + t[..., None] * (blue - white)


def _camera_dirs(width: int, height: int, pitch_deg: float,
                 fov: float = math.pi / 4.0) -> np.ndarray:
    """Per-pixel ray dirs for yaw=0: Camera.zig:86-102 basis
    (forward=(0,0,1) pitched about +X; left=(-1,0,0); up=left x fwd;
    vh=2tan(fov/2), vw=vh*aspect) + ray_gen.rgen:34-48 NDC."""
    p = math.radians(pitch_deg)
    forward = np.array([0.0, -math.sin(p), math.cos(p)])
    left = np.array([-1.0, 0.0, 0.0])
    up = np.cross(left, forward)
    vh = 2.0 * math.tan(fov * 0.5)
    vw = vh * (width / height)
    horizontal = left * vw
    vertical = up * vh
    px = (np.arange(width) + 0.5) / width * 2.0 - 1.0
    py = (np.arange(height) + 0.5) / height * 2.0 - 1.0
    dx, dy = np.meshgrid(px, py)
    d = (forward[None, None]
         + dx[..., None] * horizontal[None, None]
         - dy[..., None] * vertical[None, None])
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def _ref_brdf(n, wo, wi, diffuse_albedo, f0, roughness):
    """brdf.glsl:22-50 verbatim (incl. the UN-squared half_dot_normal
    in the GGX denominator — the reference's idiosyncrasy).
    n,wo: (3,); wi: (M,3); diffuse_albedo,f0: (3,). Returns (M,3)."""
    ndl = wi @ n
    ndv = float(wo @ n)
    h = wi + wo[None, :]
    h = h / np.linalg.norm(h, axis=-1, keepdims=True)
    hdv = h @ wo
    f90 = hdv * hdv * (2.0 * roughness) + 0.5

    def schlick(a, b, cos):  # mix(a, b, (1-cos)^5)
        fac = (1.0 - cos)
        f5 = fac * fac * fac * fac * fac
        return a + (b - a) * f5

    diffuse_fresnel = schlick(1.0, f90, ndv) * schlick(1.0, f90, ndl)
    out = diffuse_fresnel[:, None] * diffuse_albedo[None, :]

    hdn = h @ n
    a2 = roughness * roughness
    denom = hdn * (a2 - 1.0) + 1.0
    dist = a2 / (denom * denom)
    masking = ndl * np.sqrt((ndv - a2 * ndv) * ndv + a2)
    shadowing = ndv * np.sqrt((ndl - a2 * ndl) * ndl + a2)
    geometry = 0.5 / (masking + shadowing)
    spec_f = (f0[None, :] + (1.0 - f0[None, :])
              * ((1.0 - np.maximum(0.0, hdv)) ** 5)[:, None])
    out = out + (dist * geometry)[:, None] * spec_f
    out = np.where((np.minimum(ndl, ndv) < 0.0)[:, None], 0.0, out)
    return out / math.pi


def _hemi_dirs(n: np.ndarray, n_mu: int = 384, n_phi: int = 512):
    """Midpoint quadrature nodes over the hemisphere about n:
    returns (M,3) dirs and (M,) weights with sum(w) = 2*pi, and mu."""
    mu = (np.arange(n_mu) + 0.5) / n_mu  # cos(theta) in (0,1)
    phi = (np.arange(n_phi) + 0.5) / n_phi * 2.0 * math.pi
    mu_g, phi_g = np.meshgrid(mu, phi, indexing="ij")
    sin_t = np.sqrt(1.0 - mu_g * mu_g)
    local = np.stack([sin_t * np.cos(phi_g), sin_t * np.sin(phi_g),
                      mu_g], axis=-1).reshape(-1, 3)
    # Orthonormal frame about n (any frame: the integral is isotropic
    # in phi about n only if the integrand is; it is not, so rotate
    # properly: build tangent/bitangent).
    a = np.array([1.0, 0.0, 0.0])
    if abs(n[0]) > 0.9:
        a = np.array([0.0, 1.0, 0.0])
    t = np.cross(n, a)
    t = t / np.linalg.norm(t)
    b = np.cross(n, t)
    dirs = local[:, 0:1] * t + local[:, 1:2] * b + local[:, 2:3] * n
    w = np.full(local.shape[0], 2.0 * math.pi / local.shape[0])
    return dirs, w, local[:, 2]


def _render_frames(scene_path, cam_kwargs, config_kwargs, frames):
    scene = gltf.load(scene_path)
    dev = build_device_scene(scene, build_bvh=True)
    config = RenderConfig(**config_kwargs)
    cam = Camera(aspect_ratio=config.aspect_ratio,
                 position=np.asarray(cam_kwargs["position"], np.float32))
    cam.set_orientation(yaw=cam_kwargs.get("yaw", 0.0),
                        pitch=cam_kwargs.get("pitch", 0.0))
    pipe = RenderPipeline(dev, config)
    imgs = []
    for f in range(frames):
        img, _ = pipe.render_numpy(cam, frame=f)
        imgs.append(np.asarray(img, np.float64))
    return np.stack(imgs)


def _assert_mc_match(imgs: np.ndarray, expected: np.ndarray,
                     what: str, mean_rtol: float = 0.01,
                     sigmas: float = 5.0):
    """Per-pixel |mean - expected| <= sigmas*stderr + eps, plus a tight
    image-mean check (stderr estimated from inter-frame variance)."""
    mean = imgs.mean(axis=0)
    stderr = imgs.std(axis=0, ddof=1) / math.sqrt(imgs.shape[0])
    tol = sigmas * stderr + 5e-4
    bad = np.abs(mean - expected) > tol
    frac_bad = float(bad.mean())
    assert frac_bad < 0.01, (
        f"{what}: {frac_bad:.3%} of channels outside {sigmas} sigma "
        f"(max |err| {np.abs(mean - expected).max():.4f}, "
        f"max tol {tol.max():.4f})")
    mdiff = abs(mean.mean() - expected.mean()) / expected.mean()
    assert mdiff <= mean_rtol, (
        f"{what}: image mean off by {mdiff:.4%} "
        f"(got {mean.mean():.5f}, want {expected.mean():.5f})")


# --------------------------------------------------------------------------
# 1. Sky-only closed form
# --------------------------------------------------------------------------
def test_sky_closed_form(tmp_path):
    path = str(tmp_path / "far_box.glb")
    cube = box_prim((0.0, 0.0, -60.0), (1.0, 1.0, 1.0), material=0)
    write_glb(path, meshes=[[cube]],
              materials=[MaterialDesc(base_color=(0.5, 0.5, 0.5, 1.0))])
    w = h = 16
    imgs = _render_frames(
        path, dict(position=(0.0, 0.0, 0.0), pitch=20.0),
        dict(num_samples=1, num_bounces=2, resolution_x=w,
             resolution_y=h), frames=1)
    dirs = _camera_dirs(w, h, pitch_deg=20.0)
    expected = _sky(dirs)
    # Deterministic (no MC): f32 renderer vs f64 expectation.
    assert np.abs(imgs[0] - expected).max() < 2e-5


# --------------------------------------------------------------------------
# 2. Emissive enclosure, 1 bounce: pixel == q8(emissive)*10 exactly
# --------------------------------------------------------------------------
def test_emissive_enclosure_closed_form(tmp_path):
    path = str(tmp_path / "furnace1.glb")
    emissive = (0.04, 0.07, 0.02)
    room = box_prim((0.0, 1.0, 0.0), (2.0, 2.0, 2.0), material=0,
                    inward=True)
    write_glb(path, meshes=[[room]],
              materials=[MaterialDesc(base_color=(0.0, 0.0, 0.0, 1.0),
                                      emissive=emissive, roughness=1.0)])
    w = h = 8
    imgs = _render_frames(
        path, dict(position=(0.0, 1.0, 0.0)),
        dict(num_samples=1, num_bounces=1, resolution_x=w,
             resolution_y=h), frames=1)
    expected = np.array([_q8(e) * 10.0 for e in emissive])
    assert np.abs(imgs[0] - expected[None, None]).max() < 1e-5


# --------------------------------------------------------------------------
# 3. Furnace, 2 bounces: pixel == 10E*(1 + rho(wo)) with rho by
#    quadrature of the reference BRDF (directional albedo)
# --------------------------------------------------------------------------
@pytest.mark.slow
def test_furnace_two_bounce_quadrature(tmp_path):
    path = str(tmp_path / "furnace2.glb")
    emissive = (0.05, 0.05, 0.05)
    albedo, rough = 0.6, 1.0
    room = box_prim((0.0, 1.0, 0.0), (2.0, 2.0, 2.0), material=0,
                    inward=True)
    write_glb(path, meshes=[[room]],
              materials=[MaterialDesc(
                  base_color=(albedo, albedo, albedo, 1.0),
                  emissive=emissive, roughness=rough, metallic=0.0)])
    w = h = 8
    frames, spp = 24, 64
    imgs = _render_frames(
        path, dict(position=(0.0, 1.0, 0.0)),
        dict(num_samples=spp, num_bounces=2, resolution_x=w,
             resolution_y=h), frames=frames)

    e10 = np.array([_q8(e) * 10.0 for e in emissive])
    alb_q = _q8(albedo)
    diffuse_albedo = np.full(3, alb_q)          # metallic = 0
    f0 = np.full(3, 0.02)                       # mix(0.02, albedo, 0)
    rough_q = max(0.006, _q8(rough))
    # Camera at the box center looking +z: every pixel's primary hit is
    # the far wall (frustum half-width tan(pi/8)=0.414 < 1), whose
    # inward normal is (0,0,-1).
    n = np.array([0.0, 0.0, -1.0])
    dirs = _camera_dirs(w, h, pitch_deg=0.0)
    wi, qw, _ = _hemi_dirs(n)
    expected = np.zeros((h, w, 3))
    for y in range(h):
        for x in range(w):
            wo = -dirs[y, x]
            f = _ref_brdf(n, wo, wi, diffuse_albedo, f0, rough_q)
            rho = (f * ((wi @ n) * qw)[:, None]).sum(axis=0)
            expected[y, x] = e10 * (1.0 + rho)
    _assert_mc_match(imgs, expected, "furnace2")


# --------------------------------------------------------------------------
# 4. Single bounce off a PBR plane under the sky: pixel ==
#    integral f(wo,wi) cos(wi) sky(wi) dwi by quadrature
# --------------------------------------------------------------------------
@pytest.mark.slow
def test_plane_sky_single_bounce_quadrature(tmp_path):
    path = str(tmp_path / "plane.glb")
    base = (0.8, 0.6, 0.4)
    metallic, rough = 0.2, 0.4
    plane = _quad((-100.0, 0.0, 100.0), (100.0, 0.0, 100.0),
                  (100.0, 0.0, -100.0), (-100.0, 0.0, -100.0),
                  material=0)
    write_glb(path, meshes=[[plane]],
              materials=[MaterialDesc(base_color=base + (1.0,),
                                      metallic=metallic,
                                      roughness=rough)])
    w = h = 8
    frames, spp = 24, 64
    pitch = 55.0
    imgs = _render_frames(
        path, dict(position=(0.0, 2.0, 0.0), pitch=pitch),
        dict(num_samples=spp, num_bounces=2, resolution_x=w,
             resolution_y=h), frames=frames)

    alb_q = np.array([_q8(c) for c in base])
    met_q = _q8(metallic)
    rough_q = max(0.006, _q8(rough))
    diffuse_albedo = alb_q * (1.0 - met_q)
    f0 = 0.02 + (alb_q - 0.02) * met_q          # mix(0.02, albedo, m)
    n = np.array([0.0, 1.0, 0.0])
    dirs = _camera_dirs(w, h, pitch_deg=pitch)
    assert (dirs[..., 1] < 0).all()             # every pixel hits the plane
    wi, qw, _ = _hemi_dirs(n)
    sky_wi = _sky(wi)
    expected = np.zeros((h, w, 3))
    for y in range(h):
        for x in range(w):
            wo = -dirs[y, x]
            f = _ref_brdf(n, wo, wi, diffuse_albedo, f0, rough_q)
            expected[y, x] = (f * sky_wi
                              * ((wi @ n) * qw)[:, None]).sum(axis=0)
    _assert_mc_match(imgs, expected, "plane_sky")
