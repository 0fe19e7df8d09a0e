"""Camera math vs Camera.zig / ray_gen.rgen conventions."""

import math

import numpy as np

from vulkan_pathtracer_tpu.models.camera import Camera


def test_identity_orientation_basis():
    cam = Camera(fov=math.pi / 4, aspect_ratio=16 / 9)
    np.testing.assert_allclose(cam.forward, [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(cam.left, [-1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(cam.up, [0, 1, 0], atol=1e-6)


def test_viewport_dimensions():
    cam = Camera(fov=math.pi / 4, aspect_ratio=2.0)
    vh = 2.0 * math.tan(math.pi / 8)
    np.testing.assert_allclose(np.linalg.norm(cam.vertical), vh, rtol=1e-6)
    np.testing.assert_allclose(
        np.linalg.norm(cam.horizontal), vh * 2.0, rtol=1e-6
    )
    # horizontal along left, vertical along up
    np.testing.assert_allclose(cam.horizontal / np.linalg.norm(cam.horizontal),
                               cam.left, atol=1e-6)


def test_yaw_rotation():
    cam = Camera(aspect_ratio=1.0)
    cam.set_orientation(yaw=90.0, pitch=0.0)
    # yaw +90 about +Y: forward (0,0,1) -> (sin90, 0, cos90) = (1,0,0)
    np.testing.assert_allclose(cam.forward, [1, 0, 0], atol=1e-6)


def test_pitch_clamped():
    cam = Camera(aspect_ratio=1.0)
    cam.look(0.0, 1000.0)  # pitch += 250 -> clamp 90
    assert cam.pitch == 90.0
    cam.look(0.0, -10000.0)
    assert cam.pitch == -90.0


def test_pitch_rotation_direction():
    cam = Camera(aspect_ratio=1.0)
    cam.set_orientation(yaw=0.0, pitch=90.0)
    # pitch +90 about +X: forward (0,0,1) -> (0,-1,0)? quaternion
    # fromAxis(90, +X) rotates z->-y? Verify with right-hand rule:
    # rotating +Z about +X by +90 deg gives +Y... actually R_x(90):
    # (0,0,1) -> (0, -sin90*1? ) Use matrix: y' = y cos - z sin = -1.
    np.testing.assert_allclose(cam.forward, [0, -1, 0], atol=1e-6)


def test_move_speed():
    cam = Camera(aspect_ratio=1.0)
    cam.move(np.array([0.0, 0.0, 2.0]), dt=0.5)
    np.testing.assert_allclose(cam.position, [0, 0, 2.5], atol=1e-6)
    cam2 = Camera(aspect_ratio=1.0)
    cam2.move(np.array([0.0, 0.0, 1.0]), dt=0.5, fast=True)
    np.testing.assert_allclose(cam2.position, [0, 0, 5.0], atol=1e-6)


def test_primary_ray_directions():
    import jax.numpy as jnp

    from vulkan_pathtracer_tpu.render.pipeline import generate_rays

    cam = Camera(fov=math.pi / 2, aspect_ratio=1.0)
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())
    origin, direction = generate_rays(pos, hor, ver, fwd, 2, 2)
    d = np.asarray(direction).reshape(2, 2, 3)
    # fov 90: viewport height 2, d in {-0.5, 0.5}
    # pixel (0,0): d.x=-0.5, d.y=-0.5 ->
    # dir = normalize(fwd + hor*(-0.5) - ver*(-0.5))
    expected = cam.forward - cam.horizontal * 0.5 + cam.vertical * 0.5
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(d[0, 0], expected, atol=1e-6)
    # top row should look up (+y component with default orientation)
    assert d[0, 0, 1] > 0 and d[1, 0, 1] < 0
    # left column looks toward +x? horizontal = left*vw = (-vw,0,0);
    # d.x=-0.5 -> -hor*(-0.5)... dir = fwd + hor*dx = (0,0,1)+(0.5*vw,0,0)
    assert d[0, 0, 0] > 0
