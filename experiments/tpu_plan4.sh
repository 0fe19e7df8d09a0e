#!/bin/bash
# Round-4 plan4: cache-warm retries of the steps that died on the
# worker-residue pattern (ROADMAP round-4 finding 6), with one
# automatic in-plan retry each (sleep through the ~2-4 min worker
# recovery window), then the BASELINE primary metric: real wall-clock
# to 1024 spp.
cd /root/repo
L=/tmp/tpu_plan.log
echo "=== plan4 start $(date -u +%H:%M:%S) ===" >> $L

SNAP=experiments/tpu_plan_results.log
step() {
  echo "--- $1 ($(date -u +%H:%M:%S)) ---" >> $L
  cp "$L" "$SNAP" 2>/dev/null
}

# run <name> <timeout> <cmd...>: one retry after a recovery sleep.
run() {
  name=$1; to=$2; shift 2
  step "$name"
  if ! timeout "$to" "$@" >> $L 2>&1; then
    echo "--- $name FAILED, sleeping 180 then retrying ---" >> $L
    sleep 180
    step "$name-retry"
    timeout "$to" "$@" >> $L 2>&1
  fi
}

step sanity
timeout 600 python -c "
import jax; jax.config.update('jax_compilation_cache_dir','/tmp/vkpt_jax_cache')
import jax.numpy as jnp
print('TPU-OK', float(jnp.arange(8.0).sum()))" >> $L 2>&1 || { echo 'SANITY FAILED' >> $L; exit 1; }

run spp-convergence-128 3000 env BENCH_MODE=spp BENCH_TARGET_SPP=128 python bench.py
run headline-joint 2400 env BENCH_HEADLINE=joint python bench.py
run spp-anyhit-off 2400 env VKPT_ANYHIT=0 BENCH_MODE=spp BENCH_TARGET_SPP=64 python bench.py
run spp-anyhit-nosort 2400 env VKPT_ANYHIT_SORT=0 BENCH_MODE=spp BENCH_TARGET_SPP=64 python bench.py

# BASELINE primary metric: real (not projected) wall-clock to 1024 spp.
run spp-convergence-1024 3000 env BENCH_MODE=spp BENCH_TARGET_SPP=1024 python bench.py

# Leave the last-good sidecar holding the headline metric for the
# driver capture.
run headline-final 2400 python bench.py

echo "=== plan4 done $(date -u +%H:%M:%S) ===" >> $L
cp "$L" "$SNAP" 2>/dev/null
