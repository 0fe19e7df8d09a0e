#!/bin/bash
# Round-4 continuation plan: the steps that ran against pre-fix code
# (Mosaic rejected Precision.HIGH; flatten_rows' lane concat died in
# lowering) plus everything after the point the first plan was
# stopped.  headline-default already landed (5.68 Mrays/s, tight
# spread) and mxu-smoke was re-verified manually post-fix — not
# repeated here.
cd /root/repo
L=/tmp/tpu_plan.log
echo "=== plan2 start $(date -u +%H:%M:%S) ===" >> $L

SNAP=experiments/tpu_plan_results.log
step() {
  echo "--- $1 ($(date -u +%H:%M:%S)) ---" >> $L
  cp "$L" "$SNAP" 2>/dev/null
}

step sanity
timeout 600 python -c "
import jax; jax.config.update('jax_compilation_cache_dir','/tmp/vkpt_jax_cache')
import jax.numpy as jnp
print('TPU-OK', float(jnp.arange(8.0).sum()))" >> $L 2>&1 || { echo 'SANITY FAILED' >> $L; exit 1; }

step frontier-smoke
timeout 1200 python experiments/frontier_smoke.py >> $L 2>&1
timeout 1200 env AB_LEAF=28 python experiments/frontier_smoke.py >> $L 2>&1

step mxu-smoke-leaf28
timeout 1200 env AB_LEAF=28 python experiments/mxu_smoke.py >> $L 2>&1

step mxu-isolated-AB
VARIANTS=mxu AB_LEAF=14 REPS=4 timeout 2400 python experiments/leaf_gate_ab.py 4.1 >> $L 2>&1

step mxu-isolated-AB-leaf28
VARIANTS=mxu AB_LEAF=28 REPS=4 timeout 2400 python experiments/leaf_gate_ab.py 4.1 >> $L 2>&1

step headline-mxu-leaf28
VKPT_MT=mxu VKPT_LEAF=28 timeout 2400 python bench.py >> $L 2>&1

step frontier-isolated-AB
VARIANTS=frontier AB_LEAF=14 REPS=4 timeout 2400 python experiments/leaf_gate_ab.py 4.1 >> $L 2>&1

step frontier-isolated-AB-highprec-tightguard
VKPT_FRONTIER_PRECISION=high VARIANTS=frontier AB_LEAF=14 REPS=4 timeout 2400 python experiments/leaf_gate_ab.py 4.1 >> $L 2>&1

step frontier-isolated-AB-width32
VKPT_FRONTIER_WIDTH=32 VKPT_FRONTIER_PRECISION=high VARIANTS=frontier AB_LEAF=14 REPS=4 timeout 2400 python experiments/leaf_gate_ab.py 4.1 >> $L 2>&1

step frontier-isolated-AB-leaf28
VKPT_FRONTIER_PRECISION=high VARIANTS=frontier AB_LEAF=28 REPS=4 timeout 2400 python experiments/leaf_gate_ab.py 4.1 >> $L 2>&1

step frontier-visit-microbench
timeout 1200 python experiments/mosaic_costs.py frontier >> $L 2>&1

step spp-mxu-leaf28
VKPT_MT=mxu VKPT_LEAF=28 BENCH_MODE=spp BENCH_TARGET_SPP=128 timeout 3000 python bench.py >> $L 2>&1

step spp-convergence-128
BENCH_MODE=spp BENCH_TARGET_SPP=128 timeout 3000 python bench.py >> $L 2>&1

step anyhit-isolated-AB
VARIANTS=anyhit AB_LEAF=14 REPS=4 timeout 2400 python experiments/leaf_gate_ab.py 4.1 >> $L 2>&1

step headline-frontier
VKPT_KERNEL_PRIMARY=frontier VKPT_KERNEL_SECONDARY=frontier timeout 2400 python bench.py >> $L 2>&1

step headline-frontier-mxu-leaf28
VKPT_KERNEL_PRIMARY=frontier VKPT_KERNEL_SECONDARY=frontier VKPT_MT=mxu VKPT_LEAF=28 timeout 2400 python bench.py >> $L 2>&1

step headline-joint-AB
BENCH_HEADLINE=joint timeout 2400 python bench.py >> $L 2>&1

step headline-joint-mxu-leaf28
BENCH_HEADLINE=joint VKPT_MT=mxu VKPT_LEAF=28 timeout 2400 python bench.py >> $L 2>&1

step spp-anyhit-off-AB
VKPT_ANYHIT=0 BENCH_MODE=spp BENCH_TARGET_SPP=64 timeout 2400 python bench.py >> $L 2>&1

step spp-anyhit-nosort-AB
VKPT_ANYHIT_SORT=0 BENCH_MODE=spp BENCH_TARGET_SPP=64 timeout 2400 python bench.py >> $L 2>&1

step config1-textured-512-4spp
python - <<'PY'
import sys; sys.path.insert(0, '.')
from assets.procedural import make_textured_sphere, make_cornell
make_textured_sphere('/tmp/plan_sphere.glb')
make_cornell('/tmp/plan_cornell.glb')
PY
timeout 1800 python -m vulkan_pathtracer_tpu -s /tmp/plan_sphere.glb -x 512 -y 512 -c 4 --frames 6 -o /tmp/plan_c1.png >> $L 2>&1
VKPT_MT=mxu VKPT_LEAF=28 timeout 1800 python -m vulkan_pathtracer_tpu -s /tmp/plan_sphere.glb -x 512 -y 512 -c 4 --frames 6 -o /tmp/plan_c1m.png >> $L 2>&1

step config3-cornell-8b-rr
timeout 1800 python -m vulkan_pathtracer_tpu -s /tmp/plan_cornell.glb -x 512 -y 512 -c 4 -b 8 --russian-roulette --frames 6 -o /tmp/plan_c3.png >> $L 2>&1

echo "=== plan2 done $(date -u +%H:%M:%S) ===" >> $L
cp "$L" "$SNAP" 2>/dev/null
