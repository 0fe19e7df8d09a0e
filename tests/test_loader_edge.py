"""Loader edge cases: u32 indices, quirk mode, info-word packing."""

import numpy as np

from assets.procedural import PrimData, MaterialDesc, write_glb
from vulkan_pathtracer_tpu.models import gltf
from vulkan_pathtracer_tpu.models.device_scene import build_device_scene


def _big_grid_prim(n_side: int, material: int = 0) -> PrimData:
    """A grid with > 65535 vertices to force uint32 indices."""
    xs = np.linspace(-1, 1, n_side, dtype=np.float32)
    xx, yy = np.meshgrid(xs, xs, indexing="ij")
    positions = np.stack(
        [xx.ravel(), yy.ravel(), np.zeros(n_side * n_side, np.float32)],
        axis=1,
    )
    v = positions.shape[0]
    normals = np.tile(np.array([0, 0, -1], np.float32), (v, 1))
    tangents = np.tile(np.array([1, 0, 0, 1], np.float32), (v, 1))
    uvs = (positions[:, :2] + 1.0) * 0.5
    idx = []
    for i in range(n_side - 1):
        for j in range(n_side - 1):
            a = i * n_side + j
            b = a + 1
            c = a + n_side
            d = c + 1
            idx.extend([a, b, c, b, d, c])
    return PrimData(positions, normals, tangents, uvs,
                    np.asarray(idx, np.uint32), material)


def test_uint32_indices_roundtrip(tmp_path):
    path = str(tmp_path / "big.glb")
    n_side = 260  # 67,600 vertices > 65,535
    write_glb(path, meshes=[[_big_grid_prim(n_side)]],
              materials=[MaterialDesc(base_color=(0.5, 0.5, 0.5, 1.0))])
    scene = gltf.load(path)
    prim = scene.primitives[0]
    assert prim.uint32_indices
    assert prim.positions.shape[0] == n_side * n_side
    # info word: bit 31 set for u32 indices (Scene.zig:32-36 parity)
    assert prim.info & 0x80000000
    assert (prim.info & 0xFFFFFF) == 0
    dev = build_device_scene(scene, build_bvh=True)
    assert dev.num_triangles == 2 * (n_side - 1) ** 2


def test_quirk_mode_flattening(tmp_path, box_glb):
    """quirk_mode reproduces the reference's S·T·inherited·R order and
    non-mesh passthrough."""
    import json
    import struct

    raw = open(box_glb, "rb").read()
    json_len, _ = struct.unpack_from("<II", raw, 12)
    doc = json.loads(raw[20:20 + json_len])
    # parent (non-mesh, with ignored TRS) -> child (mesh with T and S)
    doc["nodes"] = [
        {"children": [1], "translation": [5.0, 0.0, 0.0]},
        {"mesh": 0, "translation": [1.0, 2.0, 3.0],
         "scale": [2.0, 2.0, 2.0]},
    ]
    doc["scenes"] = [{"nodes": [0]}]
    new_json = json.dumps(doc, separators=(",", ":")).encode()
    new_json += b" " * ((-len(new_json)) % 4)
    rest = raw[20 + json_len:]
    total = 12 + 8 + len(new_json) + len(rest)
    out = struct.pack("<III", 0x46546C67, 2, total)
    out += struct.pack("<II", len(new_json), 0x4E4F534A) + new_json + rest
    p = tmp_path / "nested.glb"
    p.write_bytes(out)

    # Correct glTF: parent T applies; world = T_p · T · S
    scene = gltf.load(str(p))
    m = scene.instances[0].transform
    np.testing.assert_allclose(m[:3, 3], [6.0, 2.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(np.diag(m)[:3], [2.0, 2.0, 2.0], atol=1e-6)

    # Quirk mode: parent's own TRS ignored (passthrough), child =
    # S · T · I · R  => translation scaled by S.
    scene_q = gltf.load(str(p), quirk_mode=True)
    mq = scene_q.instances[0].transform
    np.testing.assert_allclose(mq[:3, 3], [2.0, 4.0, 6.0], atol=1e-6)


def test_material_index_packing_limit(box_glb):
    scene = gltf.load(box_glb)
    prim = scene.primitives[0]
    # 24-bit material index mask parity (triangle.glsl:4).
    assert (prim.info & 0xFFFFFF) == prim.material_index
