#!/bin/bash
# Wait until the axon TPU grant is claimable, then exit 0.
#
# Background (2026-08-17 outage, CLAUDE.md): after a tunnel stall the grant
# can hang EVERY new claim indefinitely — even a 10-minute single claim.
# The only recovery observed is waiting for the backend to come back while
# probing with small bounded claims. Usage:
#   bash scripts/wait_for_tpu.sh [max_attempts] && python bench.py
log=${TPU_PROBE_LOG:-/tmp/tpu_probe.log}
for i in $(seq 1 "${1:-100}"); do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
print('PROBE_OK', float(jnp.sum(jnp.ones((128,128)))))" >> "$log" 2>&1; then
    echo "TPU claimable (attempt $i)"; exit 0
  fi
  echo "probe $i failed $(date)" >> "$log"
  sleep 300
done
echo "TPU never came back after ${1:-100} attempts" >&2
exit 1
