#!/bin/bash
# Round-3 TPU measurement queue: run pending chip measurements in priority
# order as soon as the axon tunnel is back, then the long vanilla-closure
# training run.  Each stage logs to runs/tpu_queue/.
set -u
cd /root/repo
mkdir -p runs/tpu_queue

run() {
  local name="$1"; shift
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  timeout 7200 "$@" > "runs/tpu_queue/${name}.log" 2>&1
  echo "=== [$name] exit $? at $(date -u +%H:%M:%S) ==="
}

# 1. packed bench (ONE compiled shape; cheap compile, answers the >=4 ev/s
#    question) then the bucketed fast-path bench (warms the .jax_cache the
#    driver's end-of-round bench.py run will reuse)
# S=6144 x 10 rows: 13 batches vs 14 at the 5120x12 default (dense slots
# -7.1%, banded attention exec/true 1.088 vs 1.095 — measured on the bench
# distribution with tools in scripts/bench_packed_kernel.py)
run bench_packed   env BENCH_PACKED=1 BENCH_PACK_S=6144 BENCH_PACK_ROWS=10 python bench.py
run bench_bucketed env BENCH_PACKED=0 python bench.py

# 2. kernel-level packed block sweep + serving latency table
run packed_sweep   python scripts/bench_packed_kernel.py --S 6144 --rows 10
run serving        python scripts/measure_serving_latency.py

# 3. the long one: exact-reference-architecture (vanilla) closure in the
#    localized-axis regime, lr 3e-4 (VERDICT r2 item 4)
run_long() {
  local name="$1"; shift
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  timeout 14400 "$@" > "runs/tpu_queue/${name}.log" 2>&1
  echo "=== [$name] exit $? at $(date -u +%H:%M:%S) ==="
}
run_long vanilla python scripts/closure_suite.py \
  --outdir runs/closure_vanilla_local2 --axis-jitter 1.5 \
  --n-train 4096 --n-val 256 --n-test 256 --epochs 150 --lr 3e-4

# 4. second vanilla leg (VERDICT r2 #4 'coarser pitch' alternative): wider
#    showers => smooth subcell ratio field within the raw-coordinate MLP's
#    spectral capacity
run_long vanilla_sigma python scripts/closure_suite.py \
  --outdir runs/closure_vanilla_sigma16 --sigma 1.6 \
  --n-train 4096 --n-val 256 --n-test 256 --epochs 120 --lr 1e-3 \
  --eval-every 2

echo "=== queue done $(date -u +%H:%M:%S) ==="
