#!/bin/bash
# Round-5 TPU measurement queue (same flap-tolerant + deterministic-fail-fast
# structure as tpu_queue_r4.sh).  Legs:
#   tpu_golden   — freeze the production-path (flash_nomax + fused, bf16)
#                  sampler golden on the closure_sr checkpoint
#   train_bench  — SR train-step MFU matrix (fused/remat levers) + PF train step
#   serving      — p50/p95 table + concurrent leg with cross-request batching
#   bench_headline — full headline bench (now also self-checks the TPU golden)
# Logs: runs/tpu_queue_r5/<name>.log ; markers: .done / .failed
set -u
cd /root/repo
mkdir -p runs/tpu_queue_r5

tpu_up() {
  timeout 300 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null
}

wait_tpu() {
  while ! tpu_up; do
    echo "[queue] TPU unavailable at $(date -u +%H:%M:%S); retrying in 60s"
    sleep 60
  done
}

leg() {
  local name="$1" tmo="$2"; shift 2
  [ -e "runs/tpu_queue_r5/${name}.done" ] && return 0
  [ -e "runs/tpu_queue_r5/${name}.failed" ] && return 0
  wait_tpu
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" >> "runs/tpu_queue_r5/${name}.log" 2>&1
  local rc=$?
  echo "=== [$name] exit $rc at $(date -u +%H:%M:%S) ==="
  if [ "$rc" -eq 0 ]; then
    touch "runs/tpu_queue_r5/${name}.done"
    return 0
  fi
  if tpu_up; then
    local rcfile="runs/tpu_queue_r5/${name}.rc"
    if [ -e "$rcfile" ] && [ "$(cat "$rcfile")" = "$rc" ]; then
      echo "=== [$name] FAILED deterministically (rc=$rc twice with TPU up); not retrying ==="
      touch "runs/tpu_queue_r5/${name}.failed"
    else
      echo "$rc" > "$rcfile"
    fi
  fi
  return 0
}

pending() {
  for n in "$@"; do
    [ -e "runs/tpu_queue_r5/${n}.done" ] || [ -e "runs/tpu_queue_r5/${n}.failed" ] || return 0
  done
  return 1
}

LEGS=(tpu_golden train_bench serving bench_headline bench_merge256)

for pass in 1 2 3 4 5 6 7 8; do
  pending "${LEGS[@]}" || break
  echo "=== queue pass $pass $(date -u +%H:%M:%S) ==="
  leg tpu_golden 3600 python scripts/make_tpu_golden.py
  leg train_bench 5400 python scripts/measure_train_bench.py
  leg serving 7200 python scripts/measure_serving_latency.py
  leg bench_headline 7200 python bench.py
  # A/B vs the plain 256-quantum sweep: fold <=3-event bucket tails into the
  # next bucket up (tiny batches are dispatch-bound, ~0.1-0.9 s each)
  leg bench_merge256 7200 env BENCH_QUANTUM=256 BENCH_MERGE_TAILS=3 python bench.py
done

echo "=== queue finished $(date -u +%H:%M:%S) ==="
for n in "${LEGS[@]}"; do
  if [ -e "runs/tpu_queue_r5/${n}.done" ]; then s=done;
  elif [ -e "runs/tpu_queue_r5/${n}.failed" ]; then s=FAILED;
  else s=pending; fi
  echo "  $n: $s"
done
