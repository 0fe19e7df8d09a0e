"""Hit-point attribute fetch + material evaluation.

JAX re-design of the reference's hit shading data path:

- ``get_triangle_data`` == triangle.glsl:46-112 — barycentric
  interpolation of uv/normal/tangent over SoA vertex arrays (the
  buffer-device-address fetches become batched gathers), with
  normals/tangents already baked to world space at load
  (models.device_scene) so only interpolate + normalize remains.
- ``get_material_data`` == material.glsl:31-68 — RGBA8 factor unpack,
  factor x texture modulation, TBN normal mapping with tangent.w
  handedness.  "No texture" lanes sample the 1x1 white dummy (exact
  multiply-by-one), except the normal map which keeps a boolean mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vulkan_pathtracer_tpu.ops.packing import unpack_unorm4x8
from vulkan_pathtracer_tpu.ops.texture import sample_bilinear
from vulkan_pathtracer_tpu.ops.vecmath import cross, normalize


class TriangleData(NamedTuple):
    uv: jnp.ndarray               # (N, 2)
    normal: jnp.ndarray           # (N, 3) shading normal (world)
    tangent: jnp.ndarray          # (N, 4) xyz world + w handedness
    geometry_normal: jnp.ndarray  # (N, 3)
    material_index: jnp.ndarray   # (N,) int32
    primitive_index: jnp.ndarray  # (N,) int32 (payload parity)
    triangle_index: jnp.ndarray   # (N,) int32 (payload parity)


class MaterialData(NamedTuple):
    albedo: jnp.ndarray    # (N, 4)
    normal: jnp.ndarray    # (N, 3)
    emissive: jnp.ndarray  # (N, 3)
    roughness: jnp.ndarray  # (N,)
    metallic: jnp.ndarray   # (N,)


def get_triangle_data(scene, hit) -> TriangleData:
    """Gather + interpolate hit attributes (triangle.glsl:46-112).

    Lanes with hit.tri < 0 produce garbage-but-finite values; callers
    mask on the hit flag.  Fast path: ONE (34,) packed-row gather per
    hit (scene.tri_attr) instead of ~14 separate array gathers.
    """
    tri = jnp.maximum(hit.tri, 0)
    w1 = hit.u
    w2 = hit.v
    w0 = 1.0 - w1 - w2

    if getattr(scene, "instanced", False):
        # Two-level hit ids: tri = packed(inst << mb_bits | block)*B+k.
        # Attribute rows are OBJECT space, shared across instances;
        # interpolate first (linear), then transform by the instance
        # normal matrix inv(A) — same row-vector semantics as the flat
        # bake (triangle.glsl:79-97), equal up to f32 rounding.
        block = scene.max_leaf_size
        vblock = tri // block
        k = tri - vblock * block
        inst = vblock >> scene.mb_bits
        mb = vblock & ((1 << scene.mb_bits) - 1)
        mesh_tri = mb * block + k
        row = jnp.take(scene.tri_attr, mesh_tri, axis=0)  # (N, 34)
        nm = jnp.take(scene.inst_nrm, inst, axis=0).reshape(-1, 3, 3)

        def xform(v):
            return jnp.einsum("njk,nk->nj", nm, v)

        w0e = w0[:, None]
        w1e = w1[:, None]
        w2e = w2[:, None]
        normal = normalize(xform(
            row[:, 0:3] * w0e + row[:, 3:6] * w1e + row[:, 6:9] * w2e
        ))
        tangent4 = (
            row[:, 9:13] * w0e + row[:, 13:17] * w1e + row[:, 17:21] * w2e
        )
        tangent = jnp.concatenate(
            [normalize(xform(tangent4[:, :3])), tangent4[:, 3:4]], axis=-1
        )
        uv = row[:, 21:23] * w0e + row[:, 23:25] * w1e + row[:, 25:27] * w2e
        geometry_normal = normalize(xform(row[:, 27:30]))
        ids = jax.lax.bitcast_convert_type(row[:, 30:33], jnp.int32)
        return TriangleData(
            uv=uv,
            normal=normal,
            tangent=tangent,
            geometry_normal=geometry_normal,
            material_index=ids[:, 0],
            primitive_index=ids[:, 1],
            triangle_index=ids[:, 2],
        )

    if getattr(scene, "tri_attr", None) is not None:
        row = jnp.take(scene.tri_attr, tri, axis=0)  # (N, 34)
        w0e = w0[:, None]
        w1e = w1[:, None]
        w2e = w2[:, None]
        normal = normalize(
            row[:, 0:3] * w0e + row[:, 3:6] * w1e + row[:, 6:9] * w2e
        )
        tangent4 = (
            row[:, 9:13] * w0e + row[:, 13:17] * w1e + row[:, 17:21] * w2e
        )
        tangent = jnp.concatenate(
            [normalize(tangent4[:, :3]), tangent4[:, 3:4]], axis=-1
        )
        uv = row[:, 21:23] * w0e + row[:, 23:25] * w1e + row[:, 25:27] * w2e
        geometry_normal = row[:, 27:30]
        ids = jax.lax.bitcast_convert_type(row[:, 30:33], jnp.int32)
        return TriangleData(
            uv=uv,
            normal=normal,
            tangent=tangent,
            geometry_normal=geometry_normal,
            material_index=ids[:, 0],
            primitive_index=ids[:, 1],
            triangle_index=ids[:, 2],
        )

    idx = jnp.take(scene.tri_index, tri, axis=0)  # (N, 3)

    def interp(arr):
        a0 = jnp.take(arr, idx[:, 0], axis=0)
        a1 = jnp.take(arr, idx[:, 1], axis=0)
        a2 = jnp.take(arr, idx[:, 2], axis=0)
        return a0 * w0[:, None] + a1 * w1[:, None] + a2 * w2[:, None]

    uv = interp(scene.vert_uv)
    normal = normalize(interp(scene.vert_normal))
    tangent4 = interp(scene.vert_tangent)
    tangent = jnp.concatenate(
        [normalize(tangent4[:, :3]), tangent4[:, 3:4]], axis=-1
    )
    geometry_normal = jnp.take(scene.tri_gn, tri, axis=0)
    material_index = jnp.take(scene.tri_material, tri)
    primitive_index = jnp.take(scene.tri_primitive, tri)
    triangle_index = jnp.take(scene.tri_local, tri)
    return TriangleData(
        uv=uv,
        normal=normal,
        tangent=tangent,
        geometry_normal=geometry_normal,
        material_index=material_index,
        primitive_index=primitive_index,
        triangle_index=triangle_index,
    )


def get_material_data(scene, tri_data: TriangleData) -> MaterialData:
    """material.glsl:31-68 with dummy-white texture unification.

    Fast paths: one packed (8,) uint32 material-row gather per hit;
    texture sampling elided entirely for textureless scenes (the
    factors multiply by exactly 1.0 either way, matching the dummy
    white texel).
    """
    m = tri_data.material_index

    if getattr(scene, "mat_packed", None) is not None:
        mrow = jnp.take(scene.mat_packed, m, axis=0)  # (N, 8) uint32
        albedo_word = mrow[:, 0]
        mr_word = mrow[:, 1]
        emissive_word = mrow[:, 2]
        albedo_tex = mrow[:, 3].astype(jnp.int32)
        mr_tex_i = mrow[:, 4].astype(jnp.int32)
        emissive_tex = mrow[:, 5].astype(jnp.int32)
        normal_tex = mrow[:, 6].astype(jnp.int32)
        has_map = mrow[:, 7] != 0
    else:
        albedo_word = jnp.take(scene.mat_albedo_factor, m)
        mr_word = jnp.take(scene.mat_mr_factor, m)
        emissive_word = jnp.take(scene.mat_emissive_factor, m)
        albedo_tex = jnp.take(scene.mat_albedo_tex, m)
        mr_tex_i = jnp.take(scene.mat_mr_tex, m)
        emissive_tex = jnp.take(scene.mat_emissive_tex, m)
        normal_tex = jnp.take(scene.mat_normal_tex, m)
        has_map = jnp.take(scene.mat_has_normal_tex, m)

    def sample(tex_idx):
        return sample_bilinear(
            scene.tex_texels,
            scene.tex_offset,
            scene.tex_width,
            scene.tex_height,
            tex_idx,
            tri_data.uv,
        )

    textured = bool(scene.has_textures)

    ar, ag, ab, aa = unpack_unorm4x8(albedo_word)
    albedo = jnp.stack([ar, ag, ab, aa], axis=-1)
    if textured:
        albedo = albedo * sample(albedo_tex)

    _, mr_g, mr_b, _ = unpack_unorm4x8(mr_word)
    if textured:
        mr_tex = sample(mr_tex_i)
        roughness = mr_g * mr_tex[:, 1]
        metallic = mr_b * mr_tex[:, 2]
    else:
        roughness = mr_g
        metallic = mr_b

    er, eg, eb, _ = unpack_unorm4x8(emissive_word)
    emissive = jnp.stack([er, eg, eb], axis=-1)
    if textured:
        emissive = emissive * sample(emissive_tex)[:, :3]

    normal = tri_data.normal
    if textured:
        # Normal mapping (material.glsl:56-67): the reference does NOT
        # re-normalize after the TBN transform.
        nrm_tex = sample(normal_tex)[:, :3]
        n_ts = normalize(2.0 * nrm_tex - 1.0)
        tangent_xyz = tri_data.tangent[:, :3]
        bitangent = (
            cross(tri_data.normal, tangent_xyz) * tri_data.tangent[:, 3:4]
        )
        mapped = (
            tangent_xyz * n_ts[:, 0:1]
            + bitangent * n_ts[:, 1:2]
            + tri_data.normal * n_ts[:, 2:3]
        )
        normal = jnp.where(has_map[:, None], mapped, tri_data.normal)

    return MaterialData(
        albedo=albedo,
        normal=normal,
        emissive=emissive,
        roughness=roughness,
        metallic=metallic,
    )


def get_emissive_lean(scene, hit):
    """Last-bounce fast path: only ``mat.emissive`` feeds radiance on
    the final bounce (ray_gen.rgen:72-77 — no extension ray follows),
    yet the generic path pays the full 34-f32 attribute-row gather +
    material decode per lane for it.  For FLAT, TEXTURELESS scenes
    with packed tables this instead fetches one (N,) material-id
    gather + one (8,) uint32 material row and unpacks the emissive
    factor — identical values to get_material_data(...).emissive (the
    dummy-white texture multiplies by exactly 1.0, material.glsl:47).
    Returns None when the lean path doesn't apply (instanced /
    textured / unpacked scenes); callers fall back to the full fetch.
    """
    import os

    if os.environ.get("VKPT_LEAN_EMISSIVE", "1") != "1":
        return None
    if getattr(scene, "instanced", False):
        return None
    if getattr(scene, "mat_packed", None) is None:
        return None
    if bool(scene.has_textures):
        return None
    tri = jnp.maximum(hit.tri, 0)
    m = jnp.take(scene.tri_material, tri)
    mrow = jnp.take(scene.mat_packed, m, axis=0)
    er, eg, eb, _ = unpack_unorm4x8(mrow[:, 2])
    return jnp.stack([er, eg, eb], axis=-1)
