"""Single-process A/B of packet-kernel variants on REAL sorted
secondary rays (atrium by default): min-over-reps in one process so
relay noise cancels.

    VARIANTS=<set> [UNSORTED=1] [AB_LEAF=N] [SCENE=columns] [REPS=N] \
        python experiments/leaf_gate_ab.py [detail]

Variant sets: gate (leaf-gate on/off x pk), prim (tile-ordered
primaries: dense vs packet vs gmt), prod, shortray (t_far two-pass),
cascade (t-slab windows), key (sort-key shootout; UNSORTED=1),
final (key x pk combos; UNSORTED=1), seed (origin-block t-seeding),
gmt (group-MT x pk), spec (spec-2), pipe (pipelined pair), pk
(packet sweep).  Measured verdicts live in ROADMAP.md.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vkpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def bounce_rays(dev, W=1920, H=1080):
    """Bounce-1 rays exactly as the production wavefront produces them,
    already (octant, Morton)-sorted."""
    from vulkan_pathtracer_tpu.app.camera_path import orbit_path
    from vulkan_pathtracer_tpu.models.camera import Camera
    from vulkan_pathtracer_tpu.ops import rng as rngmod
    from vulkan_pathtracer_tpu.ops.brdf import ShadingInfo, sample_brdf
    from vulkan_pathtracer_tpu.ops.intersect import MISS_T
    from vulkan_pathtracer_tpu.ops.vecmath import dot, mix
    from vulkan_pathtracer_tpu.render.pipeline import (
        _pixel_seeds, _tile_order, generate_rays,
    )
    from vulkan_pathtracer_tpu.render.shading import (
        get_material_data, get_triangle_data,
    )
    from vulkan_pathtracer_tpu.render.wavefront import (
        ORIGIN_OFFSET, ROUGHNESS_FLOOR, F0_DIELECTRIC, _bounce_sort_key,
        _closest_hit,
    )

    cam = Camera(aspect_ratio=W / H)
    orbit_path(radius=4.5, height=2.2, duration=4.0,
               center=(0.0, 1.2, 0.0)).apply(cam, 0.0)
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())

    @jax.jit
    def make():
        o, d = generate_rays(pos, hor, ver, fwd, W, H)
        sx, sy = _pixel_seeds(W, H, jnp.uint32(1))
        t_order, _ = _tile_order(H, W)
        t_order = jnp.asarray(t_order)
        o, d, sx, sy = o[t_order], d[t_order], sx[t_order], sy[t_order]
        hit = _closest_hit(dev, o, d, None, "auto", phase="primary")
        did = hit.t < MISS_T
        prev_tri = hit.tri
        tri = get_triangle_data(dev, hit)
        mat = get_material_data(dev, tri)
        out_dir = -d
        sh = ShadingInfo(
            normal=mat.normal, out_dir=out_dir,
            lambert_out=dot(mat.normal, out_dir),
            fresnel_0=mix(jnp.float32(F0_DIELECTRIC), mat.albedo[:, :3],
                          mat.metallic[:, None]),
            diffuse_albedo=mat.albedo[:, :3]
            - mat.metallic[:, None] * mat.albedo[:, :3],
            roughness=jnp.maximum(ROUGHNESS_FLOOR, mat.roughness),
        )
        _, _, rx, ry = rngmod.pcg2d(sx, sy)
        o2 = o + hit.t[:, None] * d + tri.geometry_normal * ORIGIN_OFFSET
        d2 = sample_brdf(sh, rx, ry)
        alive = did & (dot(sh.normal, d2) > 0.0)
        key = _bounce_sort_key(dev, o2, d2, alive)
        order = jnp.argsort(key)
        prev_block = jnp.maximum(prev_tri, 0) // dev.max_leaf_size
        if os.environ.get("UNSORTED") == "1":
            return o2, d2, alive, prev_block
        return (o2[order], d2[order], alive[order], prev_block[order])

    return make()


def main():
    from assets.procedural import make_atrium
    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
    from vulkan_pathtracer_tpu.ops.pallas_traverse import pallas_closest_hit

    detail = float(sys.argv[1]) if len(sys.argv) > 1 else 4.1
    if os.environ.get("SCENE") == "columns":
        from assets.procedural import make_columns

        path = os.path.join(tempfile.gettempdir(),
                            f"bench_columns_{detail}.glb")
        if not os.path.exists(path):
            make_columns(path, grid=int(detail), segments=24)
    else:
        path = os.path.join(tempfile.gettempdir(),
                            f"bench_atrium_{detail}.glb")
        if not os.path.exists(path):
            make_atrium(path, detail=detail)
    scene = gltf.load(path)
    leaf = int(os.environ.get("AB_LEAF", "8"))
    dev = build_device_scene(scene, build_bvh=True, max_leaf_size=leaf)
    print(f"tris={dev.num_triangles} leaf={leaf}", flush=True)

    # AB_RAYGEN_LEAF: generate the bounce rays against a SEPARATE
    # device scene at this leaf size.  Round-4 finding: at leaf=28 the
    # auto primary dispatch falls through every pallas tier (252-lane
    # tri rows) to the XLA traversal, and that bounce-ray program
    # crashed the TPU worker twice before any variant ran — decoupling
    # ray gen (leaf=14, known-good quad kernel) both sidesteps the
    # crash and isolates it.  Geometry is identical, so rays/checksums
    # are unchanged; only prev_block (used by the "seed" variants
    # alone) is keyed to the ray-gen leaf size.
    raygen_leaf = os.environ.get("AB_RAYGEN_LEAF")
    dev_rg = dev
    if raygen_leaf and int(raygen_leaf) != leaf:
        dev_rg = build_device_scene(scene, build_bvh=True,
                                    max_leaf_size=int(raygen_leaf))
        print(f"raygen leaf={int(raygen_leaf)}", flush=True)

    if os.environ.get("VARIANTS") in ("prim", "vgate_prim"):
        # Tile-ordered PRIMARY rays instead of bounce rays.
        from vulkan_pathtracer_tpu.app.camera_path import orbit_path
        from vulkan_pathtracer_tpu.models.camera import Camera
        from vulkan_pathtracer_tpu.render.pipeline import (
            _tile_order, generate_rays,
        )

        cam = Camera(aspect_ratio=1920 / 1080)
        orbit_path(radius=4.5, height=2.2, duration=4.0,
                   center=(0.0, 1.2, 0.0)).apply(cam, 0.0)
        pos, hor, ver, fwd = (jnp.asarray(v) for v in
                              cam.push_constants())
        o, d = generate_rays(pos, hor, ver, fwd, 1920, 1080)
        t_order, _ = _tile_order(1080, 1920)
        o, d = o[jnp.asarray(t_order)], d[jnp.asarray(t_order)]
        alive = None
    else:
        o, d, alive, prev_block = bounce_rays(dev_rg)
    o, d = jax.device_put(o), jax.device_put(d)
    n_alive = float(o.shape[0] if alive is None else jnp.sum(alive))
    print(f"rays: {o.shape[0]} ({n_alive:.0f} alive)", flush=True)

    from vulkan_pathtracer_tpu.ops.pallas_traverse import (
        pallas_dense_closest_hit,
    )

    which = os.environ.get("VARIANTS", "gate")
    if which == "gate":
        variants = [
            ("pk2048 gate=off", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=2048, leaf_gate=False)),
            ("pk2048 gate=on ", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=2048, leaf_gate=True)),
            ("pk4096 gate=off", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=4096, leaf_gate=False)),
            ("pk4096 gate=on ", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=4096, leaf_gate=True)),
            ("pk8192 gate=on ", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=8192, leaf_gate=True)),
        ]
    elif which == "prim":
        from vulkan_pathtracer_tpu.ops.pallas_pair import (
            pallas_pair_closest_hit,
            pallas_quad_closest_hit,
        )

        variants = [
            ("packet pk4096", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=4096, leaf_gate=False)),
            ("pair pk4096  ", lambda: pallas_pair_closest_hit(
                dev, o, d, alive, packet=4096)),
            ("quad pk2048  ", lambda: pallas_quad_closest_hit(
                dev, o, d, alive, packet=2048)),
            ("quad pk3072  ", lambda: pallas_quad_closest_hit(
                dev, o, d, alive, packet=3072)),
            ("quad pk4096  ", lambda: pallas_quad_closest_hit(
                dev, o, d, alive, packet=4096)),
            ("dense pk2048 ", lambda: pallas_dense_closest_hit(
                dev, o, d, alive, packet=2048, interleave=1)),
        ]
    elif which == "prod":
        variants = [
            ("pk4096 prod", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=4096, leaf_gate=False)),
        ]
    elif which == "shortray":
        # Two-pass short-ray traversal: pass 1 clamps every lane's far
        # plane to T0 (tight tf bound -> small packet unions); lanes
        # with no hit below T0 re-traverse at full range in pass 2.
        # Exact: a hit below T0 is the global closest hit.
        from vulkan_pathtracer_tpu.ops.intersect import MISS_T as _MISS

        base_fn = jax.jit(lambda: pallas_closest_hit(
            dev, o, d, alive, packet=4096, leaf_gate=False))
        bh = base_fn()
        t_np = np.asarray(bh.t)
        a_np = (np.ones(t_np.shape, bool) if alive is None
                else np.asarray(alive))
        hits = t_np[a_np & (t_np < 1e31)]
        pcts = {p: float(np.percentile(hits, p)) for p in (50, 70, 85, 95)}
        print("hit-dist percentiles:", {k: round(v, 3) for k, v in
                                        pcts.items()}, flush=True)

        def two_pass(T0, pk=4096):
            h1 = pallas_closest_hit(dev, o, d, alive, packet=pk,
                                    leaf_gate=False, t_far=T0)
            miss1 = h1.t >= _MISS
            act2 = miss1 if alive is None else jnp.logical_and(alive, miss1)
            h2 = pallas_closest_hit(dev, o, d, act2, packet=pk,
                                    leaf_gate=False)
            from vulkan_pathtracer_tpu.ops.intersect import Hit as _Hit
            return _Hit(
                t=jnp.where(miss1, h2.t, h1.t),
                tri=jnp.where(miss1, h2.tri, h1.tri),
                u=jnp.where(miss1, h2.u, h1.u),
                v=jnp.where(miss1, h2.v, h1.v),
            )

        def pass1_only(T0, pk=4096):
            return pallas_closest_hit(dev, o, d, alive, packet=pk,
                                      leaf_gate=False, t_far=T0)

        variants = [("full pk4096    ", base_fn)]
        for p in (50, 70, 85, 95):
            T0 = pcts[p]
            n_m = float(np.sum(a_np & (t_np >= T0)))
            print(f"  T0=p{p} ({T0:.2f}): pass2 rays = {n_m:.0f} "
                  f"({100*n_m/max(np.sum(a_np),1):.1f}%)", flush=True)
            variants.append((f"p1-only p{p}    ",
                             jax.jit(lambda T0=T0: pass1_only(T0))))
            variants.append((f"two-pass p{p}   ",
                             jax.jit(lambda T0=T0: two_pass(T0))))
    elif which == "anyhit":
        # ANY-HIT vs closest-hit on the same rays (the emissive-free
        # last-bounce question).  The hit masks must agree: the
        # closest-hit rows report chk = sum of miss-filtered 1s via a
        # mask wrapper so every row's chk is the HIT COUNT.
        from vulkan_pathtracer_tpu.ops.pallas_pair import (
            pallas_pair_any_hit,
            pallas_quad_any_hit,
            pallas_quad_closest_hit,
        )

        class _M:  # adapt a mask (or Hit) to the timing loop's .t
            def __init__(self, t):
                self.t = t

        def ah(pk, hbm=False):
            return lambda: _M(pallas_quad_any_hit(
                dev, o, d, alive, packet=pk,
                hbm_leaves=hbm).astype(jnp.float32))

        def ch(pk):
            def fn():
                h = pallas_quad_closest_hit(dev, o, d, alive, packet=pk)
                return _M((h.t < 1e32).astype(jnp.float32))
            return fn

        variants = [
            ("quad closest pk2048", ch(2048)),
            ("anyhit pk1024      ", ah(1024)),
            ("anyhit pk2048      ", ah(2048)),
            ("anyhit pk3072      ", ah(3072)),
            ("anyhit pk4096      ", ah(4096)),
            ("anyhit pair pk3072 ", lambda: _M(pallas_pair_any_hit(
                dev, o, d, alive, packet=3072).astype(jnp.float32))),
        ]
    elif which == "pipe":
        variants = [
            ("pk3072 baseline", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=3072)),
            ("pk3072 pipe    ", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=3072, pipe=True)),
            ("pk2048 pipe    ", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=2048, pipe=True)),
            ("pk4096 pipe    ", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=4096, pipe=True)),
            ("pk1536 pipe    ", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=1536, pipe=True)),
        ]
    elif which == "spec":
        variants = [
            ("pk8192 gmt1      ", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=8192, group_mt=1)),
            ("pk8192 gmt1 spec2", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=8192, group_mt=1, spec=True)),
            ("pk4096 gmt1 spec2", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=4096, group_mt=1, spec=True)),
            ("pk16384 gmt1 spec2", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=16384, group_mt=1, spec=True)),
            ("pk16384 gmt2 spec2", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=16384, group_mt=2, spec=True)),
        ]
    elif which == "cascade":
        # Windowed-cascade traversal (run with UNSORTED=1): pass k
        # traverses only the t-slab [b_k, b_k+1) with survivors
        # re-sorted each pass (found rays keyed to the end -> their
        # packets go all-dead and exit in ~2 node visits).  Short
        # windows mean tight tf bounds -> small packet unions.
        from vulkan_pathtracer_tpu.ops.intersect import MISS_T as _MISS
        from vulkan_pathtracer_tpu.render.wavefront import _bounce_sort_key

        lo_r = dev.bvh_packed[0, 0:3]
        hi_r = dev.bvh_packed[0, 3:6]
        diag = float(jnp.linalg.norm(np.asarray(hi_r) - np.asarray(lo_r)))
        print(f"scene diag: {diag:.2f}", flush=True)

        def cascade(fracs, pk=8192, gmt=1):
            bounds = [0.0] + [f * diag for f in fracs] + [float("inf")]

            def fn():
                n = o.shape[0]
                t = jnp.full((n,), jnp.float32(_MISS))
                tri = jnp.full((n,), -1, jnp.int32)
                uu = jnp.zeros((n,), jnp.float32)
                vv = jnp.zeros((n,), jnp.float32)
                found = jnp.zeros((n,), bool)
                for k in range(len(bounds) - 1):
                    blo, bhi = bounds[k], bounds[k + 1]
                    a = jnp.logical_and(alive, ~found)
                    key = _bounce_sort_key(dev, o, d, a)
                    order = jnp.argsort(key)
                    h = pallas_closest_hit(
                        dev, o[order], d[order], a[order], packet=pk,
                        group_mt=gmt,
                        t_near=(None if k == 0 else blo),
                        t_far=(None if bhi == float("inf") else bhi),
                    )
                    got = h.t < _MISS
                    t = t.at[order].set(jnp.where(got, h.t, t[order]))
                    tri = tri.at[order].set(
                        jnp.where(got, h.tri, tri[order]))
                    uu = uu.at[order].set(jnp.where(got, h.u, uu[order]))
                    vv = vv.at[order].set(jnp.where(got, h.v, vv[order]))
                    found = found.at[order].set(
                        jnp.logical_or(got, found[order]))
                from vulkan_pathtracer_tpu.ops.intersect import Hit as _H
                return _H(t=t, tri=tri, u=uu, v=vv)

            return jax.jit(fn)

        def sorted_base(pk, gmt):
            def fn():
                key = _bounce_sort_key(dev, o, d, alive)
                order = jnp.argsort(key)
                return pallas_closest_hit(dev, o[order], d[order],
                                          alive[order], packet=pk,
                                          group_mt=gmt)
            return jax.jit(fn)

        variants = [
            ("sorted pk8192 gmt1 ", sorted_base(8192, 1)),
            ("casc .1/.3         ", cascade((0.1, 0.3))),
            ("casc .07/.2/.45    ", cascade((0.07, 0.2, 0.45))),
            ("casc .05/.12/.3    ", cascade((0.05, 0.12, 0.3))),
            ("casc .15           ", cascade((0.15,))),
        ]
    elif which == "key":
        # Sort-key shootout: octant+origin-Morton (prod) vs endpoint-
        # pair keys (bin rays by origin AND expected hit point so a
        # packet shares both ends of its segment).  Run with UNSORTED=1.
        from vulkan_pathtracer_tpu.render.wavefront import (
            _bounce_sort_key, _interleave10,
        )

        lo = dev.bvh_packed[0, 0:3]
        hi = dev.bvh_packed[0, 3:6]
        ext = jnp.maximum(hi - lo, 1e-9)
        diag = float(jnp.linalg.norm(ext))

        def m10(p, bits=10):
            q = jnp.clip((p - lo) / ext * (2.0 ** bits - 1), 0.0,
                         2.0 ** bits - 1).astype(jnp.uint32)
            return (_interleave10(q[:, 0]) | (_interleave10(q[:, 1]) << 1)
                    | (_interleave10(q[:, 2]) << 2))

        def key_prod():
            return _bounce_sort_key(dev, o, d, alive)

        def key_endpoint(L, o_bits):
            # Top o_bits of origin Morton (major) | top (28 - o_bits)
            # of endpoint Morton (minor); <= 28 bits total.
            e_bits = 28 - o_bits
            mo = m10(o) >> jnp.uint32(30 - o_bits)
            me = m10(o + L * d) >> jnp.uint32(30 - e_bits)
            k = (mo << jnp.uint32(e_bits)) | me
            return jnp.where(alive, k, jnp.uint32(0xFFFFFFFF))

        def key_6d_raw(L):
            # Interleaved origin/endpoint Morton (5 bits/axis each).
            qo = jnp.clip((o - lo) / ext * 31.0, 0.0, 31.0).astype(
                jnp.uint32)
            pe = o + L * d
            qe = jnp.clip((pe - lo) / ext * 31.0, 0.0, 31.0).astype(
                jnp.uint32)
            k = jnp.zeros(o.shape[0], jnp.uint32)
            for b in range(4, -1, -1):
                for comp in (qo[:, 0], qo[:, 1], qo[:, 2],
                             qe[:, 0], qe[:, 1], qe[:, 2]):
                    k = (k << jnp.uint32(1)) | ((comp >> jnp.uint32(b))
                                                & jnp.uint32(1))
            return k

        def key_6d(L):
            return jnp.where(alive, key_6d_raw(L),
                             jnp.uint32(0xFFFFFFFF))

        def run_with(keyfn):
            def fn():
                order = jnp.argsort(keyfn())
                return pallas_closest_hit(dev, o[order], d[order],
                                          alive[order], packet=8192,
                                          group_mt=1)
            return jax.jit(fn)

        L1 = 0.15 * diag
        def key_oct6d(L):
            oc = (
                (d[:, 0] < 0).astype(jnp.uint32)
                + 2 * (d[:, 1] < 0).astype(jnp.uint32)
                + 4 * (d[:, 2] < 0).astype(jnp.uint32)
            )
            k = (oc << jnp.uint32(28)) | (key_6d_raw(L) >> jnp.uint32(4))
            return jnp.where(alive, k, jnp.uint32(0xFFFFFFFF))

        variants = [
            ("prod oct+morton ", run_with(key_prod)),
            ("6d L=.3dg       ", run_with(lambda: key_6d(0.3 * diag))),
            ("6d L=.5dg       ", run_with(lambda: key_6d(0.5 * diag))),
            ("6d L=.7dg       ", run_with(lambda: key_6d(0.7 * diag))),
            ("oct|6d L=.3dg   ", run_with(lambda: key_oct6d(0.3 * diag))),
            ("oct|6d L=.5dg   ", run_with(lambda: key_oct6d(0.5 * diag))),
        ]
    elif which == "final":
        # Combined config pick (run with UNSORTED=1, AB_LEAF=N): key x
        # packet at the current leaf size, same rays, one process.
        from vulkan_pathtracer_tpu.render.wavefront import _interleave10

        lo = dev.bvh_packed[0, 0:3]
        hi = dev.bvh_packed[0, 3:6]
        ext = jnp.maximum(hi - lo, 1e-9)
        diag = float(jnp.linalg.norm(np.asarray(hi) - np.asarray(lo)))

        def k6d_raw(L):
            qo = jnp.clip((o - lo) / ext * 31.0, 0.0, 31.0).astype(
                jnp.uint32)
            qe = jnp.clip((o + L * d - lo) / ext * 31.0, 0.0,
                          31.0).astype(jnp.uint32)
            k = jnp.zeros(o.shape[0], jnp.uint32)
            for b in range(4, -1, -1):
                for comp in (qo[:, 0], qo[:, 1], qo[:, 2],
                             qe[:, 0], qe[:, 1], qe[:, 2]):
                    k = (k << jnp.uint32(1)) | ((comp >> jnp.uint32(b))
                                                & jnp.uint32(1))
            return k

        def k_oct6d(L):
            oc = (
                (d[:, 0] < 0).astype(jnp.uint32)
                + 2 * (d[:, 1] < 0).astype(jnp.uint32)
                + 4 * (d[:, 2] < 0).astype(jnp.uint32)
            )
            k = (oc << jnp.uint32(28)) | (k6d_raw(L) >> jnp.uint32(4))
            return jnp.where(alive, k, jnp.uint32(0xFFFFFFFF))

        def k_6d(L):
            return jnp.where(alive, k6d_raw(L), jnp.uint32(0xFFFFFFFF))

        def runv(keyfn, pk):
            def fn():
                order = jnp.argsort(keyfn())
                return pallas_closest_hit(dev, o[order], d[order],
                                          alive[order], packet=pk,
                                          leaf_gate=False)
            return jax.jit(fn)

        variants = []
        for kname, kf in (("6d.5", lambda: k_6d(0.5 * diag)),
                          ("oc6d.3", lambda: k_oct6d(0.3 * diag)),
                          ("oc6d.5", lambda: k_oct6d(0.5 * diag))):
            for pk in (3072, 4096):
                variants.append((f"{kname} pk{pk}", runv(kf, pk)))
    elif which == "seed":
        # Exact t-seeding: intersect each bounce ray against its
        # ORIGIN's leaf block first (leaf_seed_hit); any hit is a valid
        # t_best that prunes traversal from the first node visit.
        from vulkan_pathtracer_tpu.ops.intersect import leaf_seed_hit

        def seeded(pk, gmt):
            def fn():
                seed = leaf_seed_hit(dev, o, d, prev_block, active=alive)
                return pallas_closest_hit(dev, o, d, alive, packet=pk,
                                          leaf_gate=False, seed=seed,
                                          group_mt=gmt)
            return jax.jit(fn)

        sh = leaf_seed_hit(dev, o, d, prev_block, active=alive)
        frac = float(jnp.sum(jnp.where(
            alive if alive is not None else True, sh.t < 1e31, False))
        ) / max(n_alive, 1)
        print(f"seed coverage: {100*frac:.1f}% of alive rays", flush=True)
        variants = [
            ("pk4096 baseline ", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=4096, leaf_gate=False)),
            ("pk4096 seeded   ", seeded(4096, 0)),
            ("pk8192 gmt1     ", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=8192, group_mt=1)),
            ("pk8192 gmt1 seed", seeded(8192, 1)),
        ]
    elif which == "gmt":
        variants = [
            ("pk4096 baseline", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=4096, leaf_gate=False)),
            ("pk4096 gmt gf=1", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=4096, group_mt=1)),
            ("pk4096 gmt gf=2", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=4096, group_mt=2)),
            ("pk8192 gmt gf=1", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=8192, group_mt=1)),
            ("pk8192 gmt gf=2", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=8192, group_mt=2)),
            ("pk16384 gmt gf=2", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=16384, group_mt=2)),
        ]
    elif which == "pk":
        variants = [
            (f"pk{pk}", (lambda pk=pk: pallas_closest_hit(
                dev, o, d, alive, packet=pk, leaf_gate=False)))
            for pk in (2048, 3072, 4096, 5120, 6144)
        ]
    elif which in ("vgate", "vgate_prim"):
        # Round-5 vreg-gated leaf MT (groupgate_sim modeled 1.33x at
        # pk4096 on these exact rays): gated vs ungated quad across
        # packets, VMEM + HBM leaf tiers.  Checksums must match
        # bit-exactly (gating is an exact skip).
        from vulkan_pathtracer_tpu.ops.pallas_pair import (
            pallas_quad_closest_hit,
        )

        def qv(pk, hbm, g):
            return lambda: pallas_quad_closest_hit(
                dev, o, d, alive, packet=pk, hbm_leaves=hbm, gated=g)

        variants = [
            ("quad pk2048 ungated ", qv(2048, False, False)),
            ("quad pk2048 gated   ", qv(2048, False, True)),
            ("quad pk4096 ungated ", qv(4096, False, False)),
            ("quad pk4096 gated   ", qv(4096, False, True)),
            ("quad pk8192 gated   ", qv(8192, False, True)),
            ("qhbm pk4096 ungated ", qv(4096, True, False)),
            ("qhbm pk4096 gated   ", qv(4096, True, True)),
            ("qhbm pk8192 gated   ", qv(8192, True, True)),
        ]
        if which == "vgate_prim":
            # Coherent primaries: occupancy per leaf visit is near 1
            # group, so big gated packets should shine; include the
            # production primary tier (pair pk4096) as the baseline.
            from vulkan_pathtracer_tpu.ops.pallas_pair import (
                pallas_pair_closest_hit,
            )

            variants = [
                ("pair pk4096 (prod)  ", lambda:
                 pallas_pair_closest_hit(dev, o, d, alive,
                                         packet=4096)),
                ("quad pk4096 ungated ", qv(4096, False, False)),
                ("quad pk4096 gated   ", qv(4096, False, True)),
                ("quad pk8192 gated   ", qv(8192, False, True)),
                ("quad pk16384 gated  ", qv(16384, False, True)),
            ]
    elif which == "pair":
        # Pair-stack BVH2 kernel vs the preorder packet kernel on the
        # SAME (6d-sorted) rays: two sibling boxes per visit, twin
        # pipelined min-reductions, dynamic near-first via a shared
        # SMEM stack, one canonical node table (no octant staging).
        from vulkan_pathtracer_tpu.ops.pallas_pair import (
            pallas_pair_closest_hit,
        )

        from vulkan_pathtracer_tpu.ops.pallas_pair import (
            pallas_quad_closest_hit,
        )

        variants = [
            ("packet pk3072 (prod)", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=3072, leaf_gate=False)),
            ("pair pk2048   ", lambda: pallas_pair_closest_hit(
                dev, o, d, alive, packet=2048)),
            ("pair pk3072   ", lambda: pallas_pair_closest_hit(
                dev, o, d, alive, packet=3072)),
            ("pair pk4096   ", lambda: pallas_pair_closest_hit(
                dev, o, d, alive, packet=4096)),
            ("pair pk6144   ", lambda: pallas_pair_closest_hit(
                dev, o, d, alive, packet=6144)),
            ("quad pk2048   ", lambda: pallas_quad_closest_hit(
                dev, o, d, alive, packet=2048)),
            ("quad pk3072   ", lambda: pallas_quad_closest_hit(
                dev, o, d, alive, packet=3072)),
            ("quad pk4096   ", lambda: pallas_quad_closest_hit(
                dev, o, d, alive, packet=4096)),
        ]
    elif which == "oct":
        # BVH8 collapse: 3 binary levels per visit, 8 pipelined
        # min-reductions, half the node table of quad.  vs the
        # production quad tiers on the same sorted rays.
        from vulkan_pathtracer_tpu.ops.pallas_pair import (
            pallas_oct_closest_hit,
            pallas_quad_closest_hit,
        )

        variants = [
            ("quad pk2048 (prod)", lambda: pallas_quad_closest_hit(
                dev, o, d, alive, packet=2048)),
            ("oct pk1024    ", lambda: pallas_oct_closest_hit(
                dev, o, d, alive, packet=1024)),
            ("oct pk2048    ", lambda: pallas_oct_closest_hit(
                dev, o, d, alive, packet=2048)),
            ("oct pk3072    ", lambda: pallas_oct_closest_hit(
                dev, o, d, alive, packet=3072)),
            ("oct pk4096    ", lambda: pallas_oct_closest_hit(
                dev, o, d, alive, packet=4096)),
        ]
    elif which == "kmeans":
        # Union-aware packet FORMATION (run with UNSORTED=1): balanced
        # k-means in the 6d (origin, endpoint) space vs the production
        # Morton-interleave sort.  Morton cells are fixed axis-aligned
        # boxes; Lloyd iterations adapt cell boundaries to the actual
        # ray distribution, so packets should union-visit fewer nodes
        # at identical sort cost class.  Centroids are seeded from the
        # production sorted order (every pk-th ray), so k-means can
        # only refine, not lose, the Morton structure.
        from vulkan_pathtracer_tpu.render.wavefront import (
            _bounce_sort_key,
        )

        n_rays = o.shape[0]
        lo = dev.bvh_packed[0, 0:3]
        hi = dev.bvh_packed[0, 3:6]
        extent = jnp.maximum(hi - lo, 1e-9)
        diag = float(np.linalg.norm(np.asarray(extent)))

        def embed():
            L = 0.5 * diag
            po = (o - lo) / extent
            pe = (o + L * d - lo) / extent
            return jnp.concatenate([po, pe], axis=1)  # (n, 6)

        def kmeans_order(iters, pk):
            key = _bounce_sort_key(dev, o, d, alive)
            base = jnp.argsort(key)
            x = embed()
            k = n_rays // pk
            cent = x[base[pk // 2::pk]][:k]              # (k, 6)

            def assign(cent):
                # argmin ||x - c||^2 = argmax (x.c - |c|^2/2), chunked.
                half = 0.5 * jnp.sum(cent * cent, axis=1)

                def chunk_assign(xc):
                    score = xc @ cent.T - half[None, :]
                    return jnp.argmax(score, axis=1).astype(jnp.int32)

                ch = 1 << 17
                pad = (-n_rays) % ch
                xp = jnp.pad(x, ((0, pad), (0, 0)))
                a = jax.lax.map(chunk_assign,
                                xp.reshape(-1, ch, 6)).reshape(-1)
                return a[:n_rays]

            a = assign(cent)
            for _ in range(iters):
                # Lloyd update (dead rays excluded from centroids).
                w = alive.astype(jnp.float32)
                cnt = jnp.zeros((k,), jnp.float32).at[a].add(w)
                s = jnp.zeros((k, 6), jnp.float32).at[a].add(
                    x * w[:, None])
                cent = jnp.where(cnt[:, None] > 0,
                                 s / jnp.maximum(cnt, 1.0)[:, None],
                                 cent)
                a = assign(cent)
            # Order clusters along the production key of their centroid
            # (approx: key of the member nearest the centroid is
            # overkill; centroid Morton rank keeps neighbors adjacent).
            crank = jnp.argsort(jnp.argsort(
                _centroid_key(cent, lo, extent)))
            # Dead rays to the end regardless of cluster.
            sort_key = jnp.where(
                alive,
                crank[a].astype(jnp.uint32),
                jnp.uint32(0xFFFFFFFF),
            )
            return jnp.argsort(sort_key)

        def _centroid_key(cent, lo_, ext_):
            qo = jnp.clip(cent[:, 0:3] * 31.0, 0.0, 31.0).astype(
                jnp.uint32)
            qe = jnp.clip(cent[:, 3:6] * 31.0, 0.0, 31.0).astype(
                jnp.uint32)
            kk = jnp.zeros(cent.shape[0], jnp.uint32)
            for b in range(4, -1, -1):
                for comp in (qo[:, 0], qo[:, 1], qo[:, 2],
                             qe[:, 0], qe[:, 1], qe[:, 2]):
                    kk = (kk << jnp.uint32(1)) | (
                        (comp >> jnp.uint32(b)) & jnp.uint32(1))
            return kk

        def run_kmeans(iters, pk=3072):
            @jax.jit
            def fn():
                order = kmeans_order(iters, pk)
                return pallas_closest_hit(
                    dev, o[order], d[order], alive[order],
                    packet=pk, leaf_gate=False)
            return fn

        @jax.jit
        def baseline():
            key = _bounce_sort_key(dev, o, d, alive)
            order = jnp.argsort(key)
            return pallas_closest_hit(dev, o[order], d[order],
                                      alive[order], packet=3072,
                                      leaf_gate=False)

        variants = [("6d sort (prod)", baseline),
                    ("kmeans it=0   ", run_kmeans(0)),
                    ("kmeans it=1   ", run_kmeans(1)),
                    ("kmeans it=2   ", run_kmeans(2)),
                    ("kmeans it=3   ", run_kmeans(3))]
    elif which == "csort":
        # Chunk-granularity sorting (run with UNSORTED=1): sort C-lane
        # GROUPS by their min key instead of every lane.  The sort_ab
        # measurement says the per-bounce argsort+row-gather cost drops
        # >2x; this measures what packet coherence pays.  End-to-end
        # timing: key + order + gather + traversal in one jit, exactly
        # the production shape.
        from vulkan_pathtracer_tpu.render.wavefront import (
            _bounce_sort_key,
        )

        n_rays = o.shape[0]

        def run_sorted(c):
            @jax.jit
            def fn():
                key = _bounce_sort_key(dev, o, d, alive)
                if c == 1:
                    order = jnp.argsort(key)
                else:
                    ng = n_rays // c
                    rep = key[: ng * c].reshape(ng, c).min(axis=1)
                    gorder = jnp.argsort(rep)
                    order = (gorder[:, None] * c
                             + jnp.arange(c)[None, :]).reshape(-1)
                return pallas_closest_hit(
                    dev, o[order], d[order], alive[order],
                    packet=3072, leaf_gate=False)
            return fn

        @jax.jit
        def unsorted():
            return pallas_closest_hit(dev, o, d, alive, packet=3072,
                                      leaf_gate=False)

        variants = [("nosort        ", unsorted),
                    ("exact C=1     ", run_sorted(1))]
        variants += [(f"chunk C={c:<4}  ", run_sorted(c))
                     for c in (8, 16, 32, 64, 128)]
    elif which == "stack":
        # Exact stack kernels at the AB_LEAF bake — the split-leaf
        # A/B (leaf 28 = 2x14 sub-rows; ops/pallas_pair.
        # _leaf_rows_per_block).  Run AB_LEAF=14 then AB_LEAF=28 with
        # AB_RAYGEN_LEAF=14 and compare: the round-3 host sim says
        # leaf-28 cuts production node visits 886->391 and leaf
        # visits 227->89 per pk2048 packet (ROADMAP finding 14).
        from vulkan_pathtracer_tpu.ops.pallas_pair import (
            pallas_oct_closest_hit,
            pallas_pair_closest_hit,
            pallas_quad_closest_hit,
        )

        variants = [
            ("quad pk2048      ", lambda: pallas_quad_closest_hit(
                dev, o, d, alive, packet=2048)),
            ("quad pk3072      ", lambda: pallas_quad_closest_hit(
                dev, o, d, alive, packet=3072)),
            ("quad pk4096      ", lambda: pallas_quad_closest_hit(
                dev, o, d, alive, packet=4096)),
            ("quad_hbm pk2048  ", lambda: pallas_quad_closest_hit(
                dev, o, d, alive, packet=2048, hbm_leaves=True)),
            ("pair pk3072      ", lambda: pallas_pair_closest_hit(
                dev, o, d, alive, packet=3072)),
            ("oct pk2048       ", lambda: pallas_oct_closest_hit(
                dev, o, d, alive, packet=2048)),
        ]
    elif which == "mxu":
        # MXU leaf-coefficient tier (ops/mxu_mt.py; VKPT_MT=mxu,
        # relaxed parity) vs the exact quad kernel on the same rays.
        # chk differences quantify the relaxed-parity drift.
        from vulkan_pathtracer_tpu.ops.mxu_mt import ensure_mt_coefs
        from vulkan_pathtracer_tpu.ops.pallas_pair import (
            pallas_quad_closest_hit,
        )

        ensure_mt_coefs(dev)

        def q(pk, mt=None, prec=None, hbm=False):
            def fn():
                if mt:
                    os.environ["VKPT_MT"] = mt
                else:
                    os.environ.pop("VKPT_MT", None)
                if prec:
                    os.environ["VKPT_MXU_PRECISION"] = prec
                try:
                    return pallas_quad_closest_hit(
                        dev, o, d, alive, packet=pk, hbm_leaves=hbm)
                finally:
                    os.environ.pop("VKPT_MT", None)
            return fn

        variants = [
            ("mxu highest pk2048 ", q(2048, "mxu", "highest")),
            ("mxu high    pk2048 ", q(2048, "mxu", "high")),
            ("mxu default pk2048 ", q(2048, "mxu", "default")),
            ("mxu high    pk3072 ", q(3072, "mxu", "high")),
            ("mxu high    pk4096 ", q(4096, "mxu", "high")),
            ("mxu high hbm pk2048", q(2048, "mxu", "high", hbm=True)),
        ]
        if dev.tri_blocks.shape[1] <= 128:
            # Exact quad kernel only exists at leaf <= 14 (scalar
            # leaf loads need static lane indices < 128).
            variants.insert(0, ("quad exact pk2048  ", q(2048)))
    elif which == "frontier":
        # 16-wide MXU node-phase kernel (ops/pallas_frontier.py) vs
        # the quad stack kernel on the same rays.  The node phase is
        # one (8,128)x(8,P) matmul per visit; precision sets the slab
        # passes (guard band keeps every precision exact-conservative).
        from vulkan_pathtracer_tpu.ops.mxu_mt import ensure_mt_coefs
        from vulkan_pathtracer_tpu.ops.pallas_frontier import (
            pallas_frontier_closest_hit,
        )
        from vulkan_pathtracer_tpu.ops.pallas_pair import (
            pallas_quad_closest_hit,
        )

        ensure_mt_coefs(dev)

        def f(pk, prec="highest", mt=None, hbm=False, leaf=None):
            def fn():
                os.environ["VKPT_FRONTIER_PRECISION"] = prec
                if mt:
                    os.environ["VKPT_MT"] = mt
                if leaf:
                    os.environ["VKPT_FRONTIER_LEAF"] = leaf
                try:
                    return pallas_frontier_closest_hit(
                        dev, o, d, alive, packet=pk, hbm_leaves=hbm)
                finally:
                    os.environ.pop("VKPT_MT", None)
                    os.environ.pop("VKPT_FRONTIER_LEAF", None)
            return fn

        variants = [
            ("frt highest pk2048 ", f(2048)),
            ("frt high    pk2048 ", f(2048, "high")),
            ("frt default pk2048 ", f(2048, "default")),
            ("frt highest pk1024 ", f(1024)),
            ("frt highest pk4096 ", f(4096)),
            ("frt hst cond pk2048", f(2048, leaf="cond")),
            ("frt hst hbm pk2048 ", f(2048, hbm=True)),
            ("frt+mxu high pk2048", f(2048, "high", mt="mxu")),
        ]
        if dev.tri_blocks.shape[1] <= 128:
            variants.insert(0, ("quad exact pk2048  ", lambda:
                                pallas_quad_closest_hit(
                                    dev, o, d, alive, packet=2048)))
    else:
        variants = [
            ("packet pk4096  ", lambda: pallas_closest_hit(
                dev, o, d, alive, packet=4096, leaf_gate=False)),
            ("dense pk2048 C1", lambda: pallas_dense_closest_hit(
                dev, o, d, alive, packet=2048, interleave=1)),
            ("dense pk2048 C2", lambda: pallas_dense_closest_hit(
                dev, o, d, alive, packet=2048, interleave=2)),
            # dense pk4096 is INVALID (the 2-per-reduction hit packing
            # overflows at c0 == 4096; guarded with ValueError).
        ]
    reps = int(os.environ.get("REPS", 6))
    base = None
    for name, fn in variants:
        hit = fn()
        chk = float(jnp.sum(jnp.where(hit.t < 1e32, hit.t, 0.0)))
        best = 9e9
        for _ in range(reps):
            t0 = time.perf_counter()
            hit = fn()
            _ = float(hit.t.sum())
            best = min(best, time.perf_counter() - t0)
        mrays = n_alive / best / 1e6
        if base is None:
            base = best
        print(f"{name}: {best*1000:7.1f} ms  {mrays:6.2f} Mrays/s  "
              f"({base/best:.2f}x)  chk={chk:.6g}", flush=True)


if __name__ == "__main__":
    main()
