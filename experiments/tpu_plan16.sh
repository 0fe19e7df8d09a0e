#!/bin/bash
# Round-5 plan16: convergence levers after the plan14/15 results.
#
#   1. compiler-options channel VALIDATION: a deliberately tiny
#      scoped-vmem value must change behavior (slower or compile
#      error) — otherwise the plan14 "flat" rows mean the option never
#      reached the remote compiler (cache-hit false negative).
#   2. render_frames_pooled at 1080p F=32 (VERDICT r4 item 3 lever b:
#      measured 1.58-2.06x on small launches, never at production).
#   3. headline + spp convergence under VKPT_JOINT_KERNEL=vgate_hbm
#      (only meaningful if plan15 shows the gated kernels win).
#
# Waits for plan15.
cd /root/repo
mkdir -p experiments/logs
L=experiments/logs/r5_plan16_convergence.log
echo "=== plan16 start $(date -u +%H:%M:%S) ===" >> $L

if [ -f /tmp/plan15.pid ]; then
  while kill -0 "$(cat /tmp/plan15.pid)" 2>/dev/null; do
    sleep 30
  done
  echo "plan15 finished at $(date -u +%H:%M:%S)" >> $L
fi

probe() {
  for i in $(seq 1 12); do
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
  echo "--- $name ($(date -u +%H:%M:%S)) ---" >> $L
  if ! timeout "$to" "$@" >> $L 2>&1; then
    echo "--- $name FAILED after PROBE-OK ---" >> $L
    probe || return 1
    sleep 120
    echo "--- $name-retry ($(date -u +%H:%M:%S)) ---" >> $L
    if ! timeout "$to" "$@" >> $L 2>&1; then
      echo "--- $name-retry FAILED after PROBE-OK (program-induced) ---" >> $L
    fi
  fi
}

# 1. Channel validation: 2 MB scoped vmem on the HEADLINE shape (small
# timeout; slower-or-error both prove the option lands server-side).
run opts-validate-2mb 1800 env BENCH_FRAMES=1 BENCH_PASSES=1 BENCH_COMPARE=0 \
  VKPT_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=2048 python bench.py

# 2. Pooled frames-in-flight at production scale.
run pooled-1080p-f32 3600 python experiments/pooled_frames.py 32

echo "=== plan16 done $(date -u +%H:%M:%S) ===" >> $L
