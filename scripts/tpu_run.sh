#!/bin/bash
# Serialize TPU jobs against the flaky axon tunnel: probe until a trivial
# device op completes (the tunnel wedges during session teardown and
# while draining orphaned work), then exec the real job.
set -u
n=0
while true; do
  if timeout 150 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" >/dev/null 2>&1; then
    break
  fi
  n=$((n+1))
  echo "[tpu_run] probe $n failed; waiting" >&2
  sleep 60
done
sleep 5
exec "$@"
