#!/bin/bash
# Round-4 TPU measurement queue. Same flap-tolerant structure as
# tpu_queue_r3.sh (re-check tunnel, .done markers, multi-pass) PLUS the
# fail-fast the r3 queue lacked (VERDICT r3 weak #4: a deterministic
# KeyError was retried blindly 7x, burning ~55 min of TPU window):
# a leg that exits nonzero twice with the SAME exit code while the tunnel
# is still up immediately afterwards is deterministic, not a flap — it is
# marked .failed and never retried.
# Logs: runs/tpu_queue_r4/<name>.log ; markers: .done / .failed
set -u
cd /root/repo
mkdir -p runs/tpu_queue_r4

tpu_up() {
  timeout 300 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null
}

wait_tpu() {
  while ! tpu_up; do
    echo "[queue] TPU unavailable at $(date -u +%H:%M:%S); retrying in 60s"
    sleep 60
  done
}

# leg <name> <timeout_s> <cmd...>: skip if done/failed, else wait for TPU
# and run; two identical nonzero exits with the tunnel up -> .failed
leg() {
  local name="$1" tmo="$2"; shift 2
  [ -e "runs/tpu_queue_r4/${name}.done" ] && return 0
  [ -e "runs/tpu_queue_r4/${name}.failed" ] && return 0
  wait_tpu
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" >> "runs/tpu_queue_r4/${name}.log" 2>&1
  local rc=$?
  echo "=== [$name] exit $rc at $(date -u +%H:%M:%S) ==="
  if [ "$rc" -eq 0 ]; then
    touch "runs/tpu_queue_r4/${name}.done"
    return 0
  fi
  # deterministic-failure detection: tunnel still up means the failure was
  # the leg's own; a second identical exit code confirms it
  if tpu_up; then
    local rcfile="runs/tpu_queue_r4/${name}.rc"
    if [ -e "$rcfile" ] && [ "$(cat "$rcfile")" = "$rc" ]; then
      echo "=== [$name] FAILED deterministically (rc=$rc twice with TPU up); not retrying ==="
      touch "runs/tpu_queue_r4/${name}.failed"
    else
      echo "$rc" > "$rcfile"
    fi
  fi
  return 0
}

pending() {
  for n in "$@"; do
    [ -e "runs/tpu_queue_r4/${n}.done" ] || [ -e "runs/tpu_queue_r4/${n}.failed" ] || return 0
  done
  return 1
}

LEGS=(serving bench_headline)

for pass in 1 2 3 4 5 6 7 8; do
  pending "${LEGS[@]}" || break
  echo "=== queue pass $pass $(date -u +%H:%M:%S) ==="

  # serving p50/p95 latency table (fixed event contract, BASELINE.md item)
  leg serving 3600 python scripts/measure_serving_latency.py

  # headline bench at production settings, median-of-reps timing
  leg bench_headline 7200 python bench.py
done

echo "=== queue finished $(date -u +%H:%M:%S) ==="
for n in "${LEGS[@]}"; do
  if [ -e "runs/tpu_queue_r4/${n}.done" ]; then s=done;
  elif [ -e "runs/tpu_queue_r4/${n}.failed" ]; then s=FAILED;
  else s=pending; fi
  echo "  $n: $s"
done
