"""Animated scenes: per-frame instance transforms + BVH refit.

The reference builds its TLAS once (Tlas.zig:141-171) and has no
animation path; this module provides the per-frame-refit capability
(BASELINE configs[4]).  The object-space geometry and BVH topology
stay fixed on device; ``with_transforms`` re-bakes world-space
triangles/attributes from a stacked (I, 4, 4) transform array and
refits the BVH bounds — all jittable, so an animated render step is
one compiled program: rebake -> refit -> render.

Normal semantics match the static bake (models/device_scene.py):
normals/tangents/geometric normals transform by inverse(A) (the
reference's row-vector quirk, triangle.glsl:79-107).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from vulkan_pathtracer_tpu.models.device_scene import (
    DeviceScene,
    build_device_scene,
)
from vulkan_pathtracer_tpu.models.gltf import Scene
from vulkan_pathtracer_tpu.ops.refit import refit_scene


@jax.tree_util.register_pytree_node_class
@dataclass
class AnimatedScene:
    """DeviceScene + the object-space sources needed to re-bake."""

    base: DeviceScene
    # Object-space triangle data, in the SAME (BVH leaf) order as
    # base.tri_* so refit topology stays valid:
    obj_v0: jnp.ndarray        # (T, 3)
    obj_e1: jnp.ndarray        # (T, 3)
    obj_e2: jnp.ndarray        # (T, 3)
    obj_gn: jnp.ndarray        # (T, 3) object-space edge cross (unnormalized)
    tri_instance: jnp.ndarray  # (T,) int32
    obj_normal: jnp.ndarray    # (V, 3) object-space vertex normals
    obj_tangent: jnp.ndarray   # (V, 4)
    vert_instance: jnp.ndarray  # (V,) int32

    _FIELDS = ("base", "obj_v0", "obj_e1", "obj_e2", "obj_gn",
               "tri_instance", "obj_normal", "obj_tangent",
               "vert_instance")

    def tree_flatten(self):
        return tuple(getattr(self, f) for f in self._FIELDS), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(**dict(zip(cls._FIELDS, children)))

    @property
    def num_instances(self) -> int:
        return int(jnp.max(self.tri_instance)) + 1 if self.tri_instance.size else 0

    def initial_transforms(self, scene: Scene) -> jnp.ndarray:
        return jnp.asarray(
            np.stack([inst.transform for inst in scene.instances]),
            dtype=jnp.float32,
        )

    def with_transforms(self, transforms) -> DeviceScene:
        """Re-bake world-space arrays for (I, 4, 4) transforms and
        refit the BVH. Jittable."""
        import dataclasses

        A = transforms[:, :3, :3].astype(jnp.float32)       # (I, 3, 3)
        t = transforms[:, :3, 3].astype(jnp.float32)        # (I, 3)
        N = jnp.linalg.inv(A)                               # normal quirk

        A_t = jnp.take(A, self.tri_instance, axis=0)        # (T, 3, 3)
        t_t = jnp.take(t, self.tri_instance, axis=0)
        N_t = jnp.take(N, self.tri_instance, axis=0)

        def mul(M, v):  # (T,3,3) @ (T,3)
            return jnp.einsum("tij,tj->ti", M, v)

        v0 = mul(A_t, self.obj_v0) + t_t
        e1 = mul(A_t, self.obj_e1)
        e2 = mul(A_t, self.obj_e2)
        gn = mul(N_t, self.obj_gn)
        gn = gn / jnp.maximum(
            jnp.linalg.norm(gn, axis=-1, keepdims=True), 1e-30
        )

        A_v = jnp.take(N, self.vert_instance, axis=0)
        nrm = jnp.einsum("vij,vj->vi", A_v, self.obj_normal)
        tan_xyz = jnp.einsum("vij,vj->vi", A_v, self.obj_tangent[:, :3])
        tan = jnp.concatenate([tan_xyz, self.obj_tangent[:, 3:4]], axis=-1)

        updates = dict(
            tri_v0=v0, tri_e1=e1, tri_e2=e2, tri_gn=gn,
            vert_normal=nrm, vert_tangent=tan,
        )
        if self.base.tri_attr is not None:
            # Rebuild the packed shading rows from the new attributes
            # (uv + id columns are transform-invariant).
            idx = self.base.tri_index
            n0 = jnp.take(nrm, idx[:, 0], axis=0)
            n1 = jnp.take(nrm, idx[:, 1], axis=0)
            n2 = jnp.take(nrm, idx[:, 2], axis=0)
            t0 = jnp.take(tan, idx[:, 0], axis=0)
            t1 = jnp.take(tan, idx[:, 1], axis=0)
            t2 = jnp.take(tan, idx[:, 2], axis=0)
            updates["tri_attr"] = jnp.concatenate(
                [n0, n1, n2, t0, t1, t2, self.base.tri_attr[:, 21:27],
                 gn, self.base.tri_attr[:, 30:34]],
                axis=1,
            )
        scene = dataclasses.replace(self.base, **updates)
        return refit_scene(scene)


def build_animated_scene(scene: Scene, max_leaf_size: int = 4) -> AnimatedScene:
    """Bake the static DeviceScene, then derive the object-space
    sources in the same (BVH-reordered, padded) triangle order."""
    base = build_device_scene(scene, build_bvh=True,
                              max_leaf_size=max_leaf_size)

    # Reconstruct per-triangle/per-vertex instance ids + object-space
    # data in the ORIGINAL bake order, then apply the same reorder/pad.
    tri_inst, obj_v0, obj_e1, obj_e2, obj_gn = [], [], [], [], []
    vert_inst, obj_n, obj_t = [], [], []
    for ii, inst in enumerate(scene.instances):
        mesh = scene.meshes[inst.mesh_index]
        for prim in scene.primitives[mesh.start:mesh.end]:
            idx = prim.indices.reshape(-1, 3).astype(np.int64)
            p = prim.positions.astype(np.float64)
            v0 = p[idx[:, 0]]
            e1 = p[idx[:, 1]] - v0
            e2 = p[idx[:, 2]] - v0
            tri_inst.append(np.full(idx.shape[0], ii, np.int32))
            obj_v0.append(v0.astype(np.float32))
            obj_e1.append(e1.astype(np.float32))
            obj_e2.append(e2.astype(np.float32))
            obj_gn.append(np.cross(e1, e2).astype(np.float32))
            vert_inst.append(np.full(p.shape[0], ii, np.int32))
            obj_n.append(prim.normals)
            obj_t.append(prim.tangents)

    tri_inst = np.concatenate(tri_inst)
    obj_v0 = np.concatenate(obj_v0)
    obj_e1 = np.concatenate(obj_e1)
    obj_e2 = np.concatenate(obj_e2)
    obj_gn = np.concatenate(obj_gn)
    vert_inst = np.concatenate(vert_inst)
    obj_n = np.concatenate(obj_n)
    obj_t = np.concatenate(obj_t)

    # Recover the reorder+pad applied by build_device_scene by
    # rebuilding the identical BVH order.
    from vulkan_pathtracer_tpu.models.device_scene import (
        apply_slot_map,
        bvh_with_leaf_blocks,
    )

    # World-space arrays in original order (to match the build input):
    # build_device_scene built its BVH on the *baked* arrays; rebuild
    # on the same inputs to get the same slot map.
    world = {"v0": [], "e1": [], "e2": []}
    for inst in scene.instances:
        M = inst.transform.astype(np.float64)
        A = M[:3, :3]
        tv = M[:3, 3]
        mesh = scene.meshes[inst.mesh_index]
        for prim in scene.primitives[mesh.start:mesh.end]:
            idx = prim.indices.reshape(-1, 3).astype(np.int64)
            pw = (prim.positions.astype(np.float64) @ A.T + tv).astype(np.float32)
            w0 = pw[idx[:, 0]]
            world["v0"].append(w0)
            world["e1"].append(pw[idx[:, 1]] - w0)
            world["e2"].append(pw[idx[:, 2]] - w0)
    wv0 = np.concatenate(world["v0"])
    we1 = np.concatenate(world["e1"])
    we2 = np.concatenate(world["e2"])
    _, slot_map = bvh_with_leaf_blocks(
        wv0.astype(np.float32), we1.astype(np.float32),
        we2.astype(np.float32), max_leaf_size,
    )

    def reorder_pad(arr):
        arr = apply_slot_map(np.ascontiguousarray(arr), slot_map)
        target = base.tri_v0.shape[0]
        if arr.shape[0] < target:
            pad = np.zeros((target - arr.shape[0],) + arr.shape[1:], arr.dtype)
            arr = np.concatenate([arr, pad])
        return jnp.asarray(arr)

    return AnimatedScene(
        base=base,
        obj_v0=reorder_pad(obj_v0),
        obj_e1=reorder_pad(obj_e1),
        obj_e2=reorder_pad(obj_e2),
        obj_gn=reorder_pad(obj_gn),
        tri_instance=reorder_pad(tri_inst),
        obj_normal=jnp.asarray(obj_n),
        obj_tangent=jnp.asarray(obj_t),
        vert_instance=jnp.asarray(vert_inst),
    )
