"""Loader hardening on realistic asset layouts (Scene.zig:169-335
semantics): external-.bin .gltf files, interleaved/strided accessors,
multi-primitive meshes sharing bufferViews, and data: URIs — the
layouts Khronos sample assets actually use, which the procedural GLB
writer never emits."""

import base64
import json
import struct

import numpy as np
import pytest

from vulkan_pathtracer_tpu.models import gltf


def _quad_data():
    """Two-triangle quad with full attributes."""
    positions = np.array(
        [[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]], np.float32
    )
    normals = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    tangents = np.tile(np.array([[1, 0, 0, 1]], np.float32), (4, 1))
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    indices = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    return positions, normals, tangents, uvs, indices


def _write_interleaved_gltf(tmp_path, external_bin: bool):
    """.gltf with POSITION+NORMAL interleaved in ONE bufferView
    (byteStride 24), TANGENT/UV/indices in a second shared view, and
    TWO primitives (different materials) sharing every bufferView."""
    positions, normals, tangents, uvs, indices = _quad_data()

    inter = np.concatenate([positions, normals], axis=1).astype(
        np.float32
    )  # (4, 6) -> stride 24: pos at 0, normal at 12
    blob_a = inter.tobytes()
    blob_b = (
        tangents.tobytes() + uvs.tobytes() + indices.tobytes()
    )
    blob = blob_a + blob_b
    if len(blob) % 4:
        blob += b"\x00" * (4 - len(blob) % 4)

    doc = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}],
        "scene": 0,
        "nodes": [{"mesh": 0}],
        "meshes": [{
            "primitives": [
                {
                    "attributes": {"POSITION": 0, "NORMAL": 1,
                                   "TANGENT": 2, "TEXCOORD_0": 3},
                    "indices": 4, "material": 0,
                },
                {
                    "attributes": {"POSITION": 0, "NORMAL": 1,
                                   "TANGENT": 2, "TEXCOORD_0": 3},
                    "indices": 4, "material": 1,
                },
            ],
        }],
        "materials": [
            {"pbrMetallicRoughness": {
                "baseColorFactor": [1, 0, 0, 1]}},
            {"pbrMetallicRoughness": {
                "baseColorFactor": [0, 1, 0, 1]}},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(blob_a),
             "byteStride": 24},
            {"buffer": 0, "byteOffset": len(blob_a),
             "byteLength": tangents.nbytes},
            {"buffer": 0,
             "byteOffset": len(blob_a) + tangents.nbytes,
             "byteLength": uvs.nbytes},
            {"buffer": 0,
             "byteOffset": len(blob_a) + tangents.nbytes + uvs.nbytes,
             "byteLength": indices.nbytes},
        ],
        "accessors": [
            {"bufferView": 0, "byteOffset": 0, "componentType": 5126,
             "count": 4, "type": "VEC3"},
            {"bufferView": 0, "byteOffset": 12, "componentType": 5126,
             "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC4"},
            {"bufferView": 2, "componentType": 5126, "count": 4,
             "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
    }
    if external_bin:
        bin_path = tmp_path / "geometry.bin"
        bin_path.write_bytes(blob)
        doc["buffers"] = [{"uri": "geometry.bin",
                           "byteLength": len(blob)}]
    else:
        doc["buffers"] = [{
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(blob).decode(),
            "byteLength": len(blob),
        }]
    path = tmp_path / "quad.gltf"
    path.write_text(json.dumps(doc))
    return str(path)


@pytest.mark.parametrize("external_bin", [True, False],
                         ids=["external-bin", "data-uri"])
def test_interleaved_external_gltf(tmp_path, external_bin):
    positions, normals, tangents, uvs, indices = _quad_data()
    path = _write_interleaved_gltf(tmp_path, external_bin)
    scene = gltf.load(path)
    assert len(scene.primitives) == 2
    assert len(scene.meshes) == 1
    assert scene.meshes[0].start == 0 and scene.meshes[0].end == 2
    for prim in scene.primitives:
        np.testing.assert_array_equal(prim.positions, positions)
        np.testing.assert_array_equal(prim.normals, normals)
        np.testing.assert_array_equal(prim.tangents, tangents)
        np.testing.assert_array_equal(prim.uvs, uvs)
        np.testing.assert_array_equal(prim.indices,
                                      indices.astype(np.uint32))
    assert scene.primitives[0].material_index == 0
    assert scene.primitives[1].material_index == 1
    assert scene.triangle_count == 4


def test_interleaved_scene_renders(tmp_path):
    """End-to-end: the strided/multi-primitive scene bakes and renders
    (both materials visible)."""
    import jax.numpy as jnp

    from vulkan_pathtracer_tpu.models.camera import Camera
    from vulkan_pathtracer_tpu.models.device_scene import (
        build_device_scene,
    )
    from vulkan_pathtracer_tpu.render.pipeline import render_frame

    path = _write_interleaved_gltf(tmp_path, external_bin=True)
    scene = gltf.load(path)
    dev = build_device_scene(scene, build_bvh=True)
    cam = Camera(aspect_ratio=1.0,
                 position=np.array([0, 2.0, -2.5], np.float32),
                 pitch=30.0)
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())
    img, _ = render_frame(dev, pos, hor, ver, fwd, jnp.uint32(0),
                          num_samples=1, num_bounces=2,
                          width=24, height=24, traversal="bvh")
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img.std() > 0.01  # quad visible against the sky


def test_sparse_accessor_rejected(tmp_path):
    path = _write_interleaved_gltf(tmp_path, external_bin=True)
    doc = json.loads(open(path).read())
    doc["accessors"][0]["sparse"] = {"count": 1}
    p2 = tmp_path / "sparse.gltf"
    p2.write_text(json.dumps(doc))
    with pytest.raises(gltf.UnsupportedFile):
        gltf.load(str(p2))
