#!/bin/bash
# Round-4 plan6: the worker-kill discriminator, next axis.
#
# Evidence in (plan5): single-family VKPT_JOINT_KERNEL=quad STILL
# crashed (survived ~3x longer than mixed, but died) — family-mix
# alone is NOT the discriminator.  Remaining axis shared by every
# survivor: the VKPT_MT=mxu twins all auto-promoted to quad_hbm
# (HBM-streamed leaf tables; the 137.5 MB coef estimate fails every
# in-VMEM fit gate), while every killer kept leaf tables in VMEM.
# spp-sequential (in-VMEM quad, NO joint chunked lax.map) survived,
# so in-VMEM alone is fine — the hypothesis is the COMBINATION:
# in-VMEM leaf tables inside the long joint chunked-lax.map program.
#
# Test: VKPT_JOINT_KERNEL=quad_hbm (explicit HBM tier, new dispatcher
# support) with everything else default.  Predicted: survives.
# Also bank the BASELINE primary metric via the known-safe
# sequential structure (spp-1024-seq) FIRST so a real 1024-spp wall
# clock exists whatever the bisect says.
cd /root/repo
L=/tmp/tpu_plan.log
echo "=== plan6 start $(date -u +%H:%M:%S) ===" >> $L

SNAP=experiments/tpu_plan_results.log
step() {
  echo "--- $1 ($(date -u +%H:%M:%S)) ---" >> $L
  cp "$L" "$SNAP" 2>/dev/null
}

probe() {
  for i in 1 2 3 4 5 6 7 8 9 10 11 12; do
    if timeout 150 python -c "
import jax; jax.config.update('jax_compilation_cache_dir','/tmp/vkpt_jax_cache')
import jax.numpy as jnp
print('PROBE-OK', float(jnp.arange(8.0).sum()))" >> $L 2>&1; then
      return 0
    fi
    echo "probe $i failed, sleeping 60" >> $L
    sleep 60
  done
  echo "PROBE EXHAUSTED — relay down" >> $L
  return 1
}

run() {
  name=$1; to=$2; shift 2
  probe || return 1
  step "$name"
  if ! timeout "$to" "$@" >> $L 2>&1; then
    echo "--- $name FAILED after PROBE-OK ---" >> $L
    probe || return 1
    step "$name-retry"
    timeout "$to" "$@" >> $L 2>&1 || { echo "--- $name-retry FAILED after PROBE-OK (program-induced) ---" >> $L; return 2; }
  fi
  return 0
}

# 1. Bank the BASELINE primary metric on the known-safe structure.
#    (spp-sequential measured 1.498 spp/s at 128; 1024 ~ 690 s run.)
run spp-1024-seq 3000 env BENCH_JOINT=0 BENCH_MODE=spp BENCH_TARGET_SPP=1024 python bench.py

# 2. The hypothesis test: joint program, HBM-streamed leaves.
run spp-joint-quadhbm 3000 env VKPT_JOINT_KERNEL=quad_hbm BENCH_MODE=spp BENCH_TARGET_SPP=128 python bench.py
rc=$?

# 3. If it survived, the joint 1024 run (predicted faster than seq).
if [ "$rc" = "0" ]; then
  run spp-1024-joint-quadhbm 3000 env VKPT_JOINT_KERNEL=quad_hbm BENCH_MODE=spp BENCH_TARGET_SPP=1024 python bench.py
fi

# 4. Leave the sidecar holding the headline metric for the driver.
run headline-final6 2400 python bench.py

echo "=== plan6 done $(date -u +%H:%M:%S) ===" >> $L
cp "$L" "$SNAP" 2>/dev/null
