"""Non-self-authored asset evidence (round-2 VERDICT missing #6).

This environment has zero egress, no glTF sample assets, and no
third-party glTF writer libraries (checked: trimesh/pygltflib/
gltflib/open3d absent), so true Khronos-sample ingestion is not
possible.  Best available substitute, per the VERDICT's fallback: a
test whose GEOMETRY BYTES this repo did not author — dm_control's
binary STL meshes (a third-party package baked into the image) —
wrapped in a GLB whose layout mimics the Khronos Blender exporter
(named scenes/nodes/meshes, per-attribute bufferViews with explicit
byteStride on vertex views, POSITION min/max, generator string),
which is deliberately DIFFERENT from assets/procedural.py's writer
(no names, no byteStride, no generator).  Loader semantics under
test follow Scene.zig:169-335 (required attribute set, u16 indices,
node flattening).
"""

import json
import os
import struct

import numpy as np
import pytest

from vulkan_pathtracer_tpu.models import gltf

STL_CANDIDATES = [
    "/opt/venv/lib/python3.12/site-packages/dm_control/mjcf/"
    "test_assets/meshes/cube.stl",
    "/opt/venv/lib/python3.12/site-packages/dm_control/mujoco/"
    "testing/assets/cube.stl",
]


def _find_stl():
    for p in STL_CANDIDATES:
        if os.path.exists(p):
            return p
    import glob

    hits = glob.glob(
        "/opt/venv/lib/python3.12/site-packages/dm_control/**/*.stl",
        recursive=True)
    return hits[0] if hits else None


def _parse_binary_stl(path):
    """Binary STL: 80-byte header, u32 tri count, 50 bytes/tri
    (normal + 3 vertices f32, u16 attr)."""
    raw = open(path, "rb").read()
    n = struct.unpack("<I", raw[80:84])[0]
    rec = np.frombuffer(raw[84:84 + 50 * n], dtype=np.uint8)
    rec = rec.reshape(n, 50)
    f = rec[:, :48].copy().view("<f4").reshape(n, 12)
    normals = f[:, 0:3]
    verts = f[:, 3:12].reshape(n, 3, 3)
    return normals.astype(np.float32), verts.astype(np.float32)


def _blender_style_glb(tmp_path, normals, verts):
    """GLB shaped like Khronos Blender I/O output.  STL carries only
    positions + facet normals; TANGENT/TEXCOORD_0 are synthesized
    (documented conversion additions — the loader contract requires
    them, Scene.zig:176-182)."""
    n_tri = verts.shape[0]
    pos = verts.reshape(-1, 3)
    # Many STL writers (Blender's among them) emit zero facet
    # normals; recompute from the winding where needed (conversion
    # addition, like the tangents below).
    face_n = np.cross(verts[:, 1] - verts[:, 0],
                      verts[:, 2] - verts[:, 0])
    mag = np.linalg.norm(face_n, axis=1, keepdims=True)
    face_n = face_n / np.maximum(mag, 1e-12)
    given_mag = np.linalg.norm(normals, axis=1, keepdims=True)
    normals = np.where(given_mag > 1e-6, normals, face_n)
    nrm = np.repeat(normals, 3, axis=0).astype(np.float32)
    # Arbitrary valid tangent frame orthogonal-ish to the normal.
    up = np.where(np.abs(nrm[:, 1:2]) < 0.9,
                  np.array([[0, 1, 0]], np.float32),
                  np.array([[1, 0, 0]], np.float32))
    t = np.cross(up, nrm)
    t /= np.maximum(np.linalg.norm(t, axis=1, keepdims=True), 1e-9)
    tan = np.concatenate(
        [t, np.ones((t.shape[0], 1), np.float32)], axis=1)
    uv = (pos[:, :2] - pos[:, :2].min(0)) / np.maximum(
        np.ptp(pos[:, :2], axis=0), 1e-9)
    idx = np.arange(n_tri * 3, dtype=np.uint16)

    chunks, views, accessors = [], [], []

    def view(data, stride=None, target=None):
        off = sum(len(c) for c in chunks)
        pad = (-off) % 4
        if pad:
            chunks.append(b"\x00" * pad)
            off += pad
        chunks.append(data)
        v = {"buffer": 0, "byteLength": len(data), "byteOffset": off}
        if stride is not None:
            v["byteStride"] = stride
        if target is not None:
            v["target"] = target
        views.append(v)
        return len(views) - 1

    def accessor(arr, type_, comp, minmax=False, stride=None,
                 target=34962):
        vi = view(np.ascontiguousarray(arr).tobytes(), stride, target)
        a = {"bufferView": vi, "componentType": comp,
             "count": int(arr.shape[0]), "type": type_}
        if minmax:
            a["min"] = [float(x) for x in arr.min(0)]
            a["max"] = [float(x) for x in arr.max(0)]
        accessors.append(a)
        return len(accessors) - 1

    ap = accessor(pos.astype(np.float32), "VEC3", 5126, minmax=True,
                  stride=12)
    an = accessor(nrm.astype(np.float32), "VEC3", 5126, stride=12)
    at = accessor(tan.astype(np.float32), "VEC4", 5126, stride=16)
    au = accessor(uv.astype(np.float32), "VEC2", 5126, stride=8)
    ai = accessor(idx, "SCALAR", 5123, target=34963)

    doc = {
        "asset": {"generator": "Khronos glTF Blender I/O v3.6.27",
                  "version": "2.0"},
        "scene": 0,
        "scenes": [{"name": "Scene", "nodes": [0]}],
        "nodes": [{"mesh": 0, "name": "Cube"}],
        "materials": [{
            "name": "Material",
            "pbrMetallicRoughness": {
                "baseColorFactor": [0.8, 0.1, 0.1, 1.0],
                "metallicFactor": 0.0,
                "roughnessFactor": 0.5,
            },
        }],
        "meshes": [{
            "name": "Cube",
            "primitives": [{
                "attributes": {"POSITION": ap, "NORMAL": an,
                               "TANGENT": at, "TEXCOORD_0": au},
                "indices": ai,
                "material": 0,
            }],
        }],
        "bufferViews": views,
        "accessors": accessors,
        "buffers": [{"byteLength": sum(len(c) for c in chunks)}],
    }
    blob = b"".join(chunks)
    blob += b"\x00" * ((-len(blob)) % 4)
    js = json.dumps(doc).encode()
    js += b" " * ((-len(js)) % 4)
    glb = (struct.pack("<III", 0x46546C67, 2,
                       12 + 8 + len(js) + 8 + len(blob))
           + struct.pack("<II", len(js), 0x4E4F534A) + js
           + struct.pack("<II", len(blob), 0x004E4942) + blob)
    path = os.path.join(str(tmp_path), "thirdparty_cube.glb")
    with open(path, "wb") as f:
        f.write(glb)
    return path


def test_thirdparty_stl_geometry_roundtrip(tmp_path):
    stl = _find_stl()
    assert stl is not None, "dm_control STL assets missing from image"
    normals, verts = _parse_binary_stl(stl)
    assert verts.shape[0] >= 4  # a real mesh, not a stub

    path = _blender_style_glb(tmp_path, normals, verts)
    scene = gltf.load(path)

    # Contract semantics (Scene.zig:169-335): one scene, one mesh
    # instance, triangle count preserved, u16 indices accepted.
    assert len(scene.instances) == 1
    assert scene.triangle_count == verts.shape[0]
    assert len(scene.materials) == 1

    # Geometry fidelity: the loaded positions are EXACTLY the
    # third-party STL bytes (no quantization in the chain).
    prim = scene.primitives[0]
    got = np.sort(prim.positions.reshape(-1), kind="stable")
    want = np.sort(verts.reshape(-1), kind="stable")
    np.testing.assert_array_equal(got, want)


def test_thirdparty_asset_renders(tmp_path):
    """End to end: the third-party-geometry asset goes through the
    bake + BVH + wavefront and produces finite radiance."""
    import jax.numpy as jnp

    from vulkan_pathtracer_tpu.models.camera import Camera
    from vulkan_pathtracer_tpu.models.device_scene import (
        build_device_scene,
    )
    from vulkan_pathtracer_tpu.render.pipeline import render_frame

    stl = _find_stl()
    assert stl is not None
    normals, verts = _parse_binary_stl(stl)
    path = _blender_style_glb(tmp_path, normals, verts)
    scene = gltf.load(path)
    dev = build_device_scene(scene, build_bvh=True)
    span = float(np.abs(verts).max())
    cam = Camera(aspect_ratio=1.0,
                 position=np.array([0, 0.5 * span, -3.0 * span],
                                   np.float32))
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())
    img, rays = render_frame(dev, pos, hor, ver, fwd, jnp.uint32(0),
                             num_samples=1, num_bounces=2,
                             width=32, height=32, traversal="bvh")
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img.std() > 0.0  # the cube is visible against the sky
