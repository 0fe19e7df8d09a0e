#!/bin/bash
# Round-4 plan8: full-frame decisions after plan7.
#
# plan7 measured the split-leaf quad at 1.066x isolated (504.9 vs
# 538.4 ms, exact).  Full-frame A/Bs decide the default leaf, and the
# new joint quad_hbm pin (plan6 survivor) makes the any-hit-inside-
# joint measurement safe for the first time (the 1.15x last-bounce
# lever, plan5 measured isolated).
#
# Steps:
#   1 headline-28 / headline-14: BENCH_LEAF full-frame A/B
#   2 spp128-28: convergence at leaf 28 under the new joint default
#     (quad_hbm pin — first end-to-end run of the new default)
#   3 spp128-28-anyhit: + VKPT_ANYHIT_CHUNKED=1 (HBM any-hit in the
#     joint chunk bodies — predicted fault-free under the pin)
#   4 spp1024-best: BASELINE primary metric at the winner config
cd /root/repo
L=/tmp/tpu_plan.log
echo "=== plan8 start $(date -u +%H:%M:%S) ===" >> $L

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
    sleep 120
    step "$name-retry"
    if ! timeout "$to" "$@" >> $L 2>&1; then
      echo "--- $name-retry FAILED after PROBE-OK (program-induced) ---" >> $L
    fi
  fi
  cp "$L" "$SNAP" 2>/dev/null
}

run headline-28 2400 env BENCH_LEAF=28 python bench.py
run headline-14 2400 python bench.py
run spp128-28 2400 env BENCH_MODE=spp BENCH_TARGET_SPP=128 BENCH_LEAF=28 \
  python bench.py
run spp128-28-anyhit 2400 env BENCH_MODE=spp BENCH_TARGET_SPP=128 \
  BENCH_LEAF=28 VKPT_ANYHIT_CHUNKED=1 python bench.py

echo "=== plan8 done $(date -u +%H:%M:%S) ===" >> $L
cp "$L" "$SNAP" 2>/dev/null
