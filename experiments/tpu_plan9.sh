#!/bin/bash
# Round-4 plan9: validate the new DEFAULTS end to end and bank the
# BASELINE primary metric at the winner config.
#
# New defaults being validated (plan7/plan8 measured):
#   - leaf 28 split rows everywhere (bench + app)
#   - joint chunked traces pin quad_hbm on production scenes
#   - any-hit ON inside joint chunk bodies when the pin is an
#     HBM-leaf family (the measured fault-free + faster shape)
#
# Steps: headline-default (re-banks .bench_last_good at the new
# default) -> spp128-default (expect ~3.02 spp/s with no env vars) ->
# spp128-nosort (VKPT_ANYHIT_SORT=0 A/B on the last-bounce sort skip)
# -> spp1024-final (BASELINE primary metric, wall clock).
cd /root/repo
L=/tmp/tpu_plan.log
echo "=== plan9 start $(date -u +%H:%M:%S) ===" >> $L

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

run headline-default 2400 python bench.py
run spp128-default 2400 env BENCH_MODE=spp BENCH_TARGET_SPP=128 \
  python bench.py
run spp128-nosort 2400 env BENCH_MODE=spp BENCH_TARGET_SPP=128 \
  VKPT_ANYHIT_SORT=0 python bench.py
run spp1024-final 2400 env BENCH_MODE=spp BENCH_TARGET_SPP=1024 \
  python bench.py

echo "=== plan9 done $(date -u +%H:%M:%S) ===" >> $L
cp "$L" "$SNAP" 2>/dev/null
