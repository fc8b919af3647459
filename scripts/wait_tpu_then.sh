#!/bin/bash
# Poll until the axon TPU backend initializes, then exec the given command.
# Usage: scripts/wait_tpu_then.sh <cmd...>
cd /root/repo
while true; do
  if timeout 300 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "[wait_tpu] TPU up at $(date -u +%H:%M:%S)"
    break
  fi
  echo "[wait_tpu] TPU unavailable at $(date -u +%H:%M:%S); retrying in 60s"
  sleep 60
done
exec "$@"
