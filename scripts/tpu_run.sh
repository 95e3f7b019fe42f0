#!/bin/bash
# Wait for the TPU tunnel to respond, then exec the given command.
cd /root/repo
for i in $(seq 1 200); do
  if timeout 90 python -c "import jax, jax.numpy as jnp; (jnp.arange(4.0)*2).sum().item()" >/dev/null 2>&1; then
    echo "[tpu_run] responsive after probe $i" >&2
    exec "$@"
  fi
  sleep 60
done
echo "[tpu_run] tpu never became responsive" >&2
exit 1
