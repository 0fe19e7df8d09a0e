"""First-contact Mosaic smoke for the MXU leaf tier (ops/mxu_mt.py).

Compiles and runs the quad closest-hit + any-hit kernels with
VKPT_MT=mxu on a small scene — catches lowering errors (dot_general
under lax.cond, flat<->state relayout concats, 3D coefficient-table
dynamic-row loads) in ~a minute instead of inside the 2.4ks A/B
harness.  Prints agreement vs the exact kernel and rough timings.

    python experiments/mxu_smoke.py            # TPU
    VKPT_PLATFORM=cpu python experiments/mxu_smoke.py   # interpret
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("VKPT_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/vkpt_jax_cache")

import jax.numpy as jnp
import numpy as np


def main():
    from assets.procedural import make_columns
    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.device_scene import (
        build_device_scene,
    )
    from vulkan_pathtracer_tpu.ops.mxu_mt import ensure_mt_coefs
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        pallas_quad_any_hit,
        pallas_quad_closest_hit,
    )

    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu
    path = "/tmp/mxu_smoke_cols.glb"
    if not os.path.exists(path):
        make_columns(path, grid=2, segments=16)
    leaf = int(os.environ.get("AB_LEAF", "14"))
    dev = build_device_scene(gltf.load(path), build_bvh=True,
                             max_leaf_size=leaf)
    ensure_mt_coefs(dev)
    print(f"tris={dev.num_triangles} leaf={leaf} backend="
          f"{jax.default_backend()}", flush=True)

    rng = np.random.default_rng(5)
    n = 8192
    o = jnp.asarray(rng.uniform(-8, 8, (n, 3)).astype(np.float32))
    tgt = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = tgt - np.asarray(o)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)

    def run(tag, mt, prec="high", hbm=False, anyhit=False):
        if mt:
            os.environ["VKPT_MT"] = mt
            os.environ["VKPT_MXU_PRECISION"] = prec
        else:
            os.environ.pop("VKPT_MT", None)
        try:
            t0 = time.perf_counter()
            if anyhit:
                r = pallas_quad_any_hit(dev, o, d, interpret=interp,
                                        packet=2048, hbm_leaves=hbm)
                chk = float(jnp.sum(r))
            else:
                r = pallas_quad_closest_hit(
                    dev, o, d, interpret=interp, packet=2048,
                    hbm_leaves=hbm)
                chk = float(jnp.sum(jnp.where(r.t < 1e32, r.t, 0.0)))
            dt = time.perf_counter() - t0
            print(f"{tag}: OK {dt*1000:.0f} ms (incl compile) "
                  f"chk={chk:.6g}", flush=True)
            return r
        finally:
            os.environ.pop("VKPT_MT", None)

    if leaf <= 14:
        ref = run("exact ch        ", None)
    else:
        ref = None
    got = run("mxu ch high     ", "mxu")
    run("mxu ch highest  ", "mxu", "highest")
    run("mxu ch hbm      ", "mxu", hbm=True)
    run("mxu ah high     ", "mxu", anyhit=True)
    if ref is not None:
        rt, gt = np.asarray(ref.t), np.asarray(got.t)
        flips = (rt < 1e32) != (gt < 1e32)
        both = (rt < 1e32) & (gt < 1e32)
        rel = np.abs(gt[both] - rt[both]) / np.maximum(rt[both], 1e-6)
        print(f"flips={flips.mean():.5f} max_rel_t={rel.max():.2e}",
              flush=True)

    # ---- instanced tier: feature-transform matmul + det_sign -------
    from vulkan_pathtracer_tpu.models.instanced_scene import (
        build_instanced_scene,
    )
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
        pallas_pair_any_hit,
        pallas_pair_closest_hit,
    )

    idev = ensure_mt_coefs(
        build_instanced_scene(gltf.load(path), max_leaf_size=8))
    print(f"instanced: {idev.inst_inv.shape[0]} instances", flush=True)

    def irun(tag, mt, anyhit=False):
        if mt:
            os.environ["VKPT_MT"] = mt
        try:
            t0 = time.perf_counter()
            if anyhit:
                r = pallas_pair_any_hit(idev, o, d, interpret=interp,
                                        packet=2048)
                chk = float(jnp.sum(r))
            else:
                r = pallas_pair_closest_hit(
                    idev, o, d, interpret=interp, packet=2048)
                chk = float(jnp.sum(jnp.where(r.t < 1e32, r.t, 0.0)))
            dt = time.perf_counter() - t0
            print(f"{tag}: OK {dt*1000:.0f} ms (incl compile) "
                  f"chk={chk:.6g}", flush=True)
            return r
        except Exception as e:
            print(f"{tag}: FAIL {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            return None
        finally:
            os.environ.pop("VKPT_MT", None)

    iref = irun("inst pair exact ", None)
    igot = irun("inst pair mxu   ", "mxu")
    irun("inst ah mxu     ", "mxu", anyhit=True)
    if iref is not None and igot is not None:
        rt, gt = np.asarray(iref.t), np.asarray(igot.t)
        flips = (rt < 1e32) != (gt < 1e32)
        print(f"inst flips={flips.mean():.5f}", flush=True)


if __name__ == "__main__":
    main()
