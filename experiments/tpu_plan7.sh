#!/bin/bash
# Round-4 plan7: first Mosaic contact + A/B for the split-leaf
# (leaf-28) exact stack kernels.
#
# Why: the round-3 host sim (ROADMAP finding 14) says leaf-28 cuts
# production node visits 886->391 and leaf visits 227->89 per pk2048
# packet; the validated cycle model puts the exact quad kernel at
# ~1.46x on the 554 ms secondary wall.  Both MXU tiers measured out,
# so this is the remaining visit-count lever INSIDE the kernel.
#
# Steps: smoke (964 tris, every family, checksums) -> stack A/B at
# leaf 14 (baseline) -> stack A/B at leaf 28 (AB_RAYGEN_LEAF=14 keeps
# the ray stream bit-identical across the pair) -> if the win holds,
# headline + spp with BENCH_LEAF=28.
cd /root/repo
L=/tmp/tpu_plan.log
echo "=== plan7 start $(date -u +%H:%M:%S) ===" >> $L

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

run leaf28-smoke 1500 python experiments/leaf28_smoke.py
run stack-ab-14 3000 env VARIANTS=stack AB_LEAF=14 REPS=5 \
  python experiments/leaf_gate_ab.py
run stack-ab-28 3000 env VARIANTS=stack AB_LEAF=28 AB_RAYGEN_LEAF=14 REPS=5 \
  python experiments/leaf_gate_ab.py

echo "=== plan7 done $(date -u +%H:%M:%S) ===" >> $L
cp "$L" "$SNAP" 2>/dev/null
