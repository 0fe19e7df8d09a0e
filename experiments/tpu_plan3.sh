#!/bin/bash
# Round-4 plan3 (rewritten mid-round): the MXU-quad decision steps,
# informed by plan1/plan2 results:
#   - frontier node-phase kernel: measured 0.43-0.88x vs quad across
#     precision/guard/width/packet — dead end, no more frontier steps.
#   - MXU leaf tier: all smoke variants pass exactly post-fix; the
#     246k-tri coefficient table auto-promotes to HBM rows now that
#     the VMEM estimate includes sublane padding.  These ABs are the
#     first at-scale measurement of the round-3 bet.
#   - leaf-28 ABs crashed the TPU worker inside BOUNCE-RAY GENERATION
#     (auto primary -> XLA traversal at leaf28), not in any MXU code;
#     AB_RAYGEN_LEAF=14 decouples ray gen, and the bisect step (last,
#     since it may kill the worker) isolates the faulting stage.
cd /root/repo
L=/tmp/tpu_plan.log
echo "=== plan3 start $(date -u +%H:%M:%S) ===" >> $L

SNAP=experiments/tpu_plan_results.log
step() {
  echo "--- $1 ($(date -u +%H:%M:%S)) ---" >> $L
  cp "$L" "$SNAP" 2>/dev/null
}

step sanity
timeout 600 python -c "
import jax; jax.config.update('jax_compilation_cache_dir','/tmp/vkpt_jax_cache')
import jax.numpy as jnp
print('TPU-OK', float(jnp.arange(8.0).sum()))" >> $L 2>&1 || { echo 'SANITY FAILED' >> $L; exit 1; }

# Retries of the plan2 steps that died at their first device fetch:
# every such crash followed a step that ran MXU/HBM kernels or a
# failed program load, and each "crashed" step's compile still landed
# in /tmp/vkpt_jax_cache (e.g. the 29.9MB jit_render_frames_joint
# entry written at 13:17 by the crashed joint-AB).  Cache-warm retries
# decide between "worker residue/cold-compile crash" (retry succeeds)
# and "real kernel fault in the joint-exact program" (retry crashes
# again with a warm cache).
step spp-convergence-128-retry
BENCH_MODE=spp BENCH_TARGET_SPP=128 timeout 3000 python bench.py >> $L 2>&1

step headline-joint-retry
BENCH_HEADLINE=joint timeout 2400 python bench.py >> $L 2>&1

step spp-anyhit-off-retry
VKPT_ANYHIT=0 BENCH_MODE=spp BENCH_TARGET_SPP=64 timeout 2400 python bench.py >> $L 2>&1

step mxu-isolated-AB
VARIANTS=mxu AB_LEAF=14 REPS=4 timeout 2400 python experiments/leaf_gate_ab.py 4.1 >> $L 2>&1

step mxu-isolated-AB-leaf28
VARIANTS=mxu AB_LEAF=28 AB_RAYGEN_LEAF=14 REPS=4 timeout 2400 python experiments/leaf_gate_ab.py 4.1 >> $L 2>&1

step headline-mxu
VKPT_MT=mxu timeout 2400 python bench.py >> $L 2>&1

step headline-mxu-leaf28
VKPT_MT=mxu VKPT_LEAF=28 timeout 2400 python bench.py >> $L 2>&1

step spp-mxu-leaf28
VKPT_MT=mxu VKPT_LEAF=28 BENCH_MODE=spp BENCH_TARGET_SPP=128 timeout 3000 python bench.py >> $L 2>&1

step leaf28-crash-bisect
timeout 1800 python experiments/leaf28_crash_bisect.py >> $L 2>&1

step headline-default-refresh
timeout 2400 python bench.py >> $L 2>&1

echo "=== plan3 done $(date -u +%H:%M:%S) ===" >> $L
cp "$L" "$SNAP" 2>/dev/null
