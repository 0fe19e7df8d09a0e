#!/bin/bash
# Relay poller: probe the TPU until it answers, then run the queued
# measurement plan (experiments/tpu_plan.sh).  The relay can be
# hard-down for hours (CLAUDE.md) — this turns recovery into measured
# numbers without a human in the loop.  Logs: /tmp/relay_poller.log,
# plan output in /tmp/tpu_plan.log.
cd /root/repo || exit 1
L=/tmp/relay_poller.log
END=$(($(date +%s) + ${POLL_BUDGET_S:-39600}))  # default 11 h
echo "=== poller start $(date -u +%F' '%T) ===" >> "$L"
while [ "$(date +%s)" -lt "$END" ]; do
  timeout 420 python -c "
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/vkpt_jax_cache')
print('TPU-OK', float(jnp.arange(8.0).sum()))" >> "$L" 2>&1
  if [ $? -eq 0 ]; then
    echo "relay up $(date -u +%F' '%T) — running plan" >> "$L"
    bash experiments/tpu_plan.sh
    echo "plan finished $(date -u +%F' '%T)" >> "$L"
    exit 0
  fi
  echo "probe failed $(date -u +%F' '%T); sleep 600" >> "$L"
  sleep 600
done
echo "poller budget exhausted $(date -u +%F' '%T)" >> "$L"
exit 2
