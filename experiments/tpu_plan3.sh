#!/bin/bash
# Round-4 plan3: re-run the MXU-quad decision steps that crashed in
# plan2 — the leaf-14 AB died on the coefficient-table VMEM
# mis-estimate (fixed: sublane tile padding), the leaf-28 AB on the
# worker restart that followed, and the leaf-28 headline on the same
# compile failure.  These decide whether the bench defaults flip
# (VERDICT round-3 item 2).
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

step mxu-isolated-AB-r2
VARIANTS=mxu AB_LEAF=14 REPS=4 timeout 2400 python experiments/leaf_gate_ab.py 4.1 >> $L 2>&1

step mxu-isolated-AB-leaf28-r2
VARIANTS=mxu AB_LEAF=28 REPS=4 timeout 2400 python experiments/leaf_gate_ab.py 4.1 >> $L 2>&1

step headline-mxu-leaf28-r2
VKPT_MT=mxu VKPT_LEAF=28 timeout 2400 python bench.py >> $L 2>&1

step headline-mxu-leaf14
VKPT_MT=mxu timeout 2400 python bench.py >> $L 2>&1

echo "=== plan3 done $(date -u +%H:%M:%S) ===" >> $L
cp "$L" "$SNAP" 2>/dev/null
