#!/bin/bash
# Round-4 plan10: refresh the BASELINE config table at the new
# defaults, and measure the instanced split-leaf path.
#
#   1 animated-14 / animated-28: instanced fly-through (config[5]
#     analog) at LEAF=14 vs 28 — the split rows are supported but
#     unmeasured on the instanced pair kernel
#   2 config1: textured sphere 512^2 4spp (DamagedHelmet analog) at
#     the new defaults (leaf 28)
#   3 config3: Cornell emissive 8-bounce + RR 512^2 4spp
cd /root/repo
L=/tmp/tpu_plan.log
echo "=== plan10 start $(date -u +%H:%M:%S) ===" >> $L

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

python - <<'PY'
import sys; sys.path.insert(0, '.')
from assets.procedural import make_textured_sphere, make_cornell
make_textured_sphere('/tmp/plan_sphere.glb')
make_cornell('/tmp/plan_cornell.glb')
PY

run animated-14 1800 env LEAF=14 python experiments/animated_bench.py
run animated-28 1800 env LEAF=28 python experiments/animated_bench.py
run config1-textured 1800 python -m vulkan_pathtracer_tpu \
  -s /tmp/plan_sphere.glb -x 512 -y 512 -c 4 --frames 6 \
  -o /tmp/plan_c1.png
run config3-cornell 1800 python -m vulkan_pathtracer_tpu \
  -s /tmp/plan_cornell.glb -x 512 -y 512 -c 4 -b 8 \
  --russian-roulette --frames 6 -o /tmp/plan_c3.png

echo "=== plan10 done $(date -u +%H:%M:%S) ===" >> $L
cp "$L" "$SNAP" 2>/dev/null
