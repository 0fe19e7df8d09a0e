"""Leaf-block-size scaling under union-packet traversal (host sim).

Motivation: the MXU leaf tier (ops/mxu_mt.py) has NO per-triangle
scalar loads and its per-visit matmul cost is constant up to
block = 32 (4*32 = 128 coefficient columns = exactly one lane tile),
so doubling the leaf block halves leaf visits at ~constant per-visit
cost — a regime the exact kernels cannot reach (their block*9-lane
rows break Mosaic's static-lane-index limit above block 14).

This sim counts union-packet node/leaf visits on the SAME sorted
atrium bounce rays for several max_leaf_size bakes, plus a cycle
model for the exact VPU tier (block <= 14 only) and the MXU tier:

    python experiments/leaf_size_sim.py [detail] [W H]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from union_stats import bounce_rays, union_sim


def main():
    detail = float(sys.argv[1]) if len(sys.argv) > 1 else 4.1
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 720
    glb = f"/tmp/bench_atrium_{detail}.glb"
    if not os.path.exists(glb):
        from assets.procedural import make_atrium

        make_atrium(glb, detail=detail)

    # Rays once (leaf size does not change the bounce distribution).
    dev14, (oo, dd, al) = bounce_rays(glb, W, H)
    print(f"tris={dev14.num_triangles} live={al.sum()}/{al.size}",
          flush=True)

    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.device_scene import (
        build_device_scene,
    )

    scene = gltf.load(glb)
    rng = np.random.default_rng(0)
    n = oo.shape[0]
    pk = 2048
    starts = rng.choice(n // pk - 1, size=12, replace=False) * pk

    print("L    Nn      leaves  nodes/pkt leaf/pkt  "
          "exactVPU-ms mxu-ms  (cycle model, quad collapse)",
          flush=True)
    sizes = tuple(int(x) for x in os.environ.get(
        "SIM_LEAVES", "8,14,20,28,32").split(","))
    for L in sizes:
        dev = build_device_scene(scene, build_bvh=True,
                                 max_leaf_size=L)
        rows = np.asarray(dev.bvh_rows).reshape(dev.bvh_orders, -1, 128)
        ftab = [rows[o].reshape(-1, 8).astype(np.float64)
                for o in range(dev.bvh_orders)]
        tn = tl = th = 0
        for s in starts:
            a, b, c = union_sim(ftab, oo, dd, al, s, pk)
            tn += a
            tl += b
            th += c
        m = len(starts)
        nodes_pkt = tn / m
        leaf_pkt = tl / m
        packets = al.sum() / pk
        # Quad collapse visits ~ half the binary internal visits; per
        # QUAD-node-visit ~ 28 loads*3 + 4 slabs*17*2vregs*0.8 + 110
        # pipelined mins + 40 stack = ~370 cyc at pk2048.
        per_node = 370.0
        q_nodes = nodes_pkt / 2
        # Exact leaf visit: 126 scalar loads*4 PER SUB-ROW (split-leaf
        # rows carry ceil(L/14) rows per block) + 55 vec ops/tri * B
        # * 2vregs * 0.8.
        rpl = max(1, -(-L // 14))
        exact_leaf = 126 * 4 * rpl + 55 * L * 2 * 0.8
        # MXU leaf visit: matmul ~16 N-tiles * 3 passes * ~10cyc +
        # epilogue ~25 ops * ceil(B/8) sublane-tiles * 2vregs * 0.8 *
        # 16 lane-tiles/8 + relayout ~5*16.
        ep_vregs = ((L + 7) // 8) * (pk // 512)
        mxu_leaf = 16 * 3 * 10 + 25 * ep_vregs * 0.8 + 80
        f_hz = 940e6
        exact_ms = ((q_nodes * per_node + leaf_pkt * exact_leaf)
                    * packets / f_hz * 1e3)
        mxu_ms = ((q_nodes * per_node + leaf_pkt * mxu_leaf)
                  * packets / f_hz * 1e3)
        note = "" if L <= 14 or L % 14 == 0 else \
            "(exact tier N/A: not a 14-multiple)"
        print(f"{L:<4} {dev.bvh_bmin.shape[0]:<7} "
              f"{np.asarray(dev.tri_blocks).shape[0]:<7} "
              f"{nodes_pkt:<9.0f} {leaf_pkt:<9.0f} "
              f"{exact_ms:<11.0f} {mxu_ms:<7.0f} {note}", flush=True)


if __name__ == "__main__":
    main()
