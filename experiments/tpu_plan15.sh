#!/bin/bash
# Round-5 plan15: vreg-gated leaf MT (vgate) hardware A/B.
# Host sim (experiments/groupgate_sim.py, real 1080p atrium bounce
# rays, anchored to the measured 505 ms quad secondary) models
# gated-outer 1.33x at pk4096; this measures it on real Mosaic.
# Gating is an exact skip — checksums must match ungated bit-exactly.
#
# Waits for plan14 (same shared TPU worker) if its pid file is live.
cd /root/repo
mkdir -p experiments/logs
L=experiments/logs/r5_plan15_vgate_ab.log
echo "=== plan15 start $(date -u +%H:%M:%S) ===" >> $L

if [ -f /tmp/plan14.pid ]; then
  while kill -0 "$(cat /tmp/plan14.pid)" 2>/dev/null; do
    sleep 30
  done
  echo "plan14 finished at $(date -u +%H:%M:%S)" >> $L
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

# Secondary bounce rays, production leaf 28 (ray gen pinned to the
# known-good leaf-14 quad per the round-4 lesson), REPS=3 min-over.
run vgate-ab-leaf28 3600 env VARIANTS=vgate AB_LEAF=28 AB_RAYGEN_LEAF=14 REPS=3 \
  python experiments/leaf_gate_ab.py

run vgate-prim-leaf28 3600 env VARIANTS=vgate_prim AB_LEAF=28 AB_RAYGEN_LEAF=14 REPS=3 \
  python experiments/leaf_gate_ab.py

echo "=== plan15 done $(date -u +%H:%M:%S) ===" >> $L
