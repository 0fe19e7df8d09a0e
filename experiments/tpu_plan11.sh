#!/bin/bash
# Round-4 plan11: marginal-gain sweeps on the new spp production
# config (leaf-28 + joint quad_hbm pin + HBM any-hit last bounce).
#
#   1 chunk sweep: VKPT_CHUNK 512k / 2M (default 1M) — round-2 chunk
#     sizing was worth ~5%; re-tune at the new kernel mix
#   2 any-hit packet sweep: VKPT_ANYHIT_PACKET 3072 (isolated said
#     2048; joint-density unions may differ)
cd /root/repo
L=/tmp/tpu_plan.log
echo "=== plan11 start $(date -u +%H:%M:%S) ===" >> $L

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

# The quad_hbm chunked pin took the headline 5.76 -> 6.47 Mrays/s
# (in-VMEM vs HBM tied ISOLATED at leaf 28, but the full chunked
# frame gains 12% — freed VMEM helps the surrounding program).  Probe
# the oct_hbm twin (half the node table resident).
run headline-octhbm 2400 env VKPT_CHUNK_KERNEL=oct_hbm python bench.py

run spp128-chunk512k 2400 env BENCH_MODE=spp BENCH_TARGET_SPP=128 \
  VKPT_CHUNK=524288 python bench.py
run spp128-chunk2m 2400 env BENCH_MODE=spp BENCH_TARGET_SPP=128 \
  VKPT_CHUNK=2097152 python bench.py
run spp128-ahpk3072 2400 env BENCH_MODE=spp BENCH_TARGET_SPP=128 \
  VKPT_ANYHIT_PACKET=3072 python bench.py

echo "=== plan11 done $(date -u +%H:%M:%S) ===" >> $L
cp "$L" "$SNAP" 2>/dev/null
