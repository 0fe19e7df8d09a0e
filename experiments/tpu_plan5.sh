#!/bin/bash
# Round-4 plan5: the joint-convergence worker-kill bisect, now with an
# INTER-STEP SANITY PROBE so residue (a dead worker left by the
# previous step) can no longer masquerade as a program fault: every
# step launches only after a cheap device op answers.
#
# Evidence going in (ROADMAP round-4 finding 6 + plan4):
#   - exact joint spp/joint-headline programs crashed 8x (incl.
#     cache-warm, post-180s-sleep retries); the VKPT_MT=mxu twins
#     succeed; anyhit off still crashed (one possibly-residue, one
#     post-sleep).
#   - new code gates any-hit OUT of the joint chunk bodies by default
#     and adds VKPT_JOINT_KERNEL to unify the kernel family.
cd /root/repo
L=/tmp/tpu_plan.log
echo "=== plan5 start $(date -u +%H:%M:%S) ===" >> $L

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

# run <name> <timeout> <cmd...>: probe-gated, one probe-gated retry.
run() {
  name=$1; to=$2; shift 2
  probe || return 1
  step "$name"
  if ! timeout "$to" "$@" >> $L 2>&1; then
    echo "--- $name FAILED after PROBE-OK ---" >> $L
    probe || return 1
    step "$name-retry"
    timeout "$to" "$@" >> $L 2>&1 || echo "--- $name-retry FAILED after PROBE-OK (program-induced) ---" >> $L
  fi
}

# 1. The gated default program (any-hit no longer in chunk bodies).
run spp-gated 3000 env BENCH_MODE=spp BENCH_TARGET_SPP=128 python bench.py

# 2. One kernel family across the whole joint program.
run spp-joint-quad 3000 env VKPT_JOINT_KERNEL=quad BENCH_MODE=spp BENCH_TARGET_SPP=128 python bench.py

# 3. Halve the lax.map length (32 chunks instead of 64).
run spp-chunk2m 3000 env VKPT_CHUNK=2097152 BENCH_MODE=spp BENCH_TARGET_SPP=128 python bench.py

# 4. Sequential device-side scan — a structurally different program
#    that must yield a REAL convergence number even if the joint
#    structure stays cursed.
run spp-sequential 3600 env BENCH_JOINT=0 BENCH_MODE=spp BENCH_TARGET_SPP=128 python bench.py

# 5. BASELINE primary metric, best-known-safe config (default gated;
#    if it crashed above this records the same — the log decides).
run spp-1024 3600 env BENCH_MODE=spp BENCH_TARGET_SPP=1024 python bench.py

# 6. Joint headline with the gate: under mxu the joint structure ran
#    10% faster than per-frame (2.12 vs 1.92) — if the gate fixed the
#    exact joint program, this could beat the 5.68 default.
run headline-joint-gated 2400 env BENCH_HEADLINE=joint python bench.py

# 7. Leave the sidecar holding the headline metric.
run headline-final 2400 python bench.py

echo "=== plan5 done $(date -u +%H:%M:%S) ===" >> $L
cp "$L" "$SNAP" 2>/dev/null
