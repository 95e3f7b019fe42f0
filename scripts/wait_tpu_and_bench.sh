#!/bin/bash
# Wait for the TPU tunnel to respond, then run the headline bench.
cd /root/repo
for i in $(seq 1 60); do
  if timeout 90 python -c "import jax, jax.numpy as jnp; (jnp.arange(4.0)*2).sum().item()" >/dev/null 2>&1; then
    echo "TPU responsive after probe $i" >&2
    BENCH_STEPS=${BENCH_STEPS:-16} exec python -u bench.py
  fi
  sleep 30
done
echo '{"error": "tpu never became responsive"}'
