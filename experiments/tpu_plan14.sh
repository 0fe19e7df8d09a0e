#!/bin/bash
# Round-5 plan14: systematic VMEM-pressure audit at joint density
# (VERDICT r4 item 2).  The accidental round-4 datum — quad_hbm chunk
# bodies beating in-VMEM quad 12% full-frame while tying isolated —
# says the chunked joint program is VMEM-starved.  Two levers, swept
# at the BENCH_MODE=spp 1080p/B=32 production shape (128-spp slice):
#
#   (a) XLA's own scoped-VMEM budget for the surrounding program
#       (xla_tpu_scoped_vmem_limit_kib via VKPT_XLA_OPTS jit
#       compiler_options — the axon relay's client-side XLA_FLAGS
#       parser rejects TPU-only flag names, measured 11:55; options
#       attached to the jit ship to the remote compiler)
#   (b) the pallas kernels' scoped-VMEM FLOOR (VKPT_VMEM_FLOOR_MB,
#       default 16 MB — margin above static need; shrinking hands
#       VMEM back to the program, raising gives Mosaic headroom)
#
# Raw log is TEE'D PER-PLAN and committed (VERDICT r4 item 4).
cd /root/repo
mkdir -p experiments/logs
L=experiments/logs/r5_plan14_vmem_audit.log
echo "=== plan14 start $(date -u +%H:%M:%S) ===" >> $L

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

SPP="env BENCH_MODE=spp BENCH_TARGET_SPP=128"

# baseline already captured 11:44 (3.027 spp/s, = plan9 exactly)
run spp-xla-vmem-64m  2400 $SPP VKPT_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=65536 python bench.py
run spp-xla-vmem-96m  2400 $SPP VKPT_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=98304 python bench.py
run spp-floor-8m      2400 $SPP VKPT_VMEM_FLOOR_MB=8 python bench.py
run spp-floor-48m     2400 $SPP VKPT_VMEM_FLOOR_MB=48 python bench.py
run spp-xla96-floor8  2400 $SPP VKPT_VMEM_FLOOR_MB=8 VKPT_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=98304 python bench.py

echo "=== plan14 done $(date -u +%H:%M:%S) ===" >> $L
