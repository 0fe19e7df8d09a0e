"""First-contact Mosaic smoke for the MXU frontier kernel
(ops/pallas_frontier.py).

Compiles and runs the 16-wide node-phase-as-matmul closest-hit kernel
on a small scene — catches lowering errors (the (8,128)x(8,P)
dot_general inside the traversal while_loop, the SMEM leaf queue +
nested drain loop, the batched (w,P) axis-1 min into VMEM scratch)
in ~a minute instead of inside the 2.4ks A/B harness.  Prints
agreement vs the exact quad kernel and rough timings.

    python experiments/frontier_smoke.py            # TPU
    VKPT_PLATFORM=cpu python experiments/frontier_smoke.py   # interpret

Fallback ladder if a shape dies on real Mosaic: VKPT_FRONTIER_LEAF=cond
(quad-style cond-chained leaves), then gate the kernel off entirely
(it is opt-in via VKPT_KERNEL_*=frontier).
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
    from vulkan_pathtracer_tpu.ops.pallas_frontier import (
        pallas_frontier_closest_hit,
    )
    from vulkan_pathtracer_tpu.ops.pallas_pair import (
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
    print(f"tris={dev.num_triangles} leaf={leaf} "
          f"tiles={dev.bvh_frontier.shape[0]} backend="
          f"{jax.default_backend()}", flush=True)

    rng = np.random.default_rng(5)
    n = 8192
    o = jnp.asarray(rng.uniform(-8, 8, (n, 3)).astype(np.float32))
    tgt = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = tgt - np.asarray(o)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)

    def run(tag, prec="highest", mt=None, hbm=False, leaf_mode=None):
        os.environ["VKPT_FRONTIER_PRECISION"] = prec
        if mt:
            os.environ["VKPT_MT"] = mt
        if leaf_mode:
            os.environ["VKPT_FRONTIER_LEAF"] = leaf_mode
        try:
            t0 = time.perf_counter()
            r = pallas_frontier_closest_hit(
                dev, o, d, interpret=interp, packet=2048,
                hbm_leaves=hbm)
            chk = float(jnp.sum(jnp.where(r.t < 1e32, r.t, 0.0)))
            dt = time.perf_counter() - t0
            print(f"{tag}: OK {dt*1000:.0f} ms (incl compile) "
                  f"chk={chk:.6g}", flush=True)
            return r
        except Exception as e:  # first-contact: record, keep going
            print(f"{tag}: FAIL {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            return None
        finally:
            os.environ.pop("VKPT_MT", None)
            os.environ.pop("VKPT_FRONTIER_LEAF", None)

    if leaf <= 14:
        t0 = time.perf_counter()
        ref = pallas_quad_closest_hit(dev, o, d, interpret=interp,
                                      packet=2048)
        chk = float(jnp.sum(jnp.where(ref.t < 1e32, ref.t, 0.0)))
        print(f"quad exact      : OK {(time.perf_counter()-t0)*1000:.0f}"
              f" ms chk={chk:.6g}", flush=True)
    else:
        ref = None
    got = run("frt highest     ")
    run("frt high        ", "high")
    run("frt default     ", "default")
    run("frt cond leaves ", leaf_mode="cond")
    run("frt hbm leaves  ", hbm=True)
    run("frt + mxu leaf  ", "high", mt="mxu")
    if ref is not None and got is not None:
        rt, gt = np.asarray(ref.t), np.asarray(got.t)
        flips = (rt < 1e32) != (gt < 1e32)
        both = (rt < 1e32) & (gt < 1e32)
        rel = np.abs(gt[both] - rt[both]) / np.maximum(rt[both], 1e-6)
        print(f"flips={flips.mean():.5f} max_rel_t={rel.max():.2e}",
              flush=True)


if __name__ == "__main__":
    main()
