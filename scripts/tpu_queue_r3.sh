#!/bin/bash
# Round-3 TPU measurement queue, flap-tolerant: each leg re-checks that the
# axon tunnel is up, runs, and drops a .done marker on success.  The whole
# list loops until every leg is done (a leg that dies when the tunnel drops
# mid-run stays pending and is retried on the next pass; the vanilla
# closure legs resume training from their last checkpoint via --resume).
# Logs: runs/tpu_queue/<name>.log ; markers: runs/tpu_queue/<name>.done
set -u
cd /root/repo
mkdir -p runs/tpu_queue

tpu_up() {
  timeout 300 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null
}

wait_tpu() {
  while ! tpu_up; do
    echo "[queue] TPU unavailable at $(date -u +%H:%M:%S); retrying in 60s"
    sleep 60
  done
}

# leg <name> <timeout_s> <cmd...>: skip if done, else wait for TPU and run
leg() {
  local name="$1" tmo="$2"; shift 2
  [ -e "runs/tpu_queue/${name}.done" ] && return 0
  wait_tpu
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" >> "runs/tpu_queue/${name}.log" 2>&1
  local rc=$?
  echo "=== [$name] exit $rc at $(date -u +%H:%M:%S) ==="
  [ "$rc" -eq 0 ] && touch "runs/tpu_queue/${name}.done"
  return 0
}

pending() {
  for n in bench_packed bench_packed_nofuse bench_bucketed bench_nofuse packed_sweep serving packed_train packed_train_fused vanilla_fast vanilla vanilla_sigma; do
    [ -e "runs/tpu_queue/${n}.done" ] || return 0
  done
  return 1
}

for pass in 1 2 3 4 5 6 7 8; do
  pending || break
  echo "=== queue pass $pass $(date -u +%H:%M:%S) ==="

  # 1. packed bench (ONE compiled shape; answers the >=4 ev/s question),
  #    then the bucketed fast-path bench (warms .jax_cache for the driver's
  #    end-of-round bench.py run).
  # S=6144 x 10 rows: 13 batches vs 14 at the 5120x12 default (dense slots
  # -7.1%, banded attention exec/true 1.088 vs 1.095 — measured on the bench
  # distribution with tools in scripts/bench_packed_kernel.py)
  leg bench_packed   7200 env BENCH_PACKED=1 BENCH_PACK_S=6144 BENCH_PACK_ROWS=10 python bench.py
  # fused x packed ablation: the packed leg above now composes with the
  # fused DiT layer kernels (fused prologue emits the packed kernel's
  # transposed layout, ops/fused_qkv.py -> packed_flash_attention_T); this
  # leg isolates the composition's contribution
  leg bench_packed_nofuse 7200 env BENCH_PACKED=1 BENCH_PACK_S=6144 BENCH_PACK_ROWS=10 BENCH_FUSED=0 python bench.py
  leg bench_bucketed 7200 env BENCH_PACKED=0 python bench.py
  # fused-prologue ablation: BENCH_FUSED defaults to 1 since the fused
  # LN+adaLN+QKV kernel landed, so bench_bucketed above measures WITH the
  # fusion; this leg re-measures the r3 baseline config without it
  leg bench_nofuse   7200 env BENCH_PACKED=0 BENCH_FUSED=0 python bench.py

  # 2. kernel-level packed block sweep + serving latency table + packed
  #    TRAINING throughput (bucketed vs one-shape packed, custom-VJP kernel)
  leg packed_sweep   7200 python scripts/bench_packed_kernel.py --S 6144 --rows 10
  leg serving        7200 python scripts/measure_serving_latency.py
  leg packed_train   7200 python scripts/bench_packed_train.py
  # fused-kernel training ablation (ref-recompute VJP: saves the forward
  # elementwise passes, pays one ref recompute in backward — measure, don't
  # assume)
  leg packed_train_fused 7200 python scripts/bench_packed_train.py --fused

  # 3a. cheap insurance leg (~20 min chip): the localized-regime evidence run
  #     (runs/closure_vanilla_local, 16384 ev, lr 1e-3) hit train loss 0.06 by
  #     epoch 7 before a saturated-logit spike wiped it at epoch 9 — with
  #     eval-every-1 and best-3 checkpointing the formed circuit is captured
  #     even if the spike recurs
  leg vanilla_fast 5400 python scripts/closure_suite.py \
    --outdir runs/closure_vanilla_fast --axis-jitter 1.5 \
    --n-train 16384 --n-val 256 --n-test 256 --epochs 10 --lr 1e-3 \
    --eval-every 1

  # 3. the long one: exact-reference-architecture (vanilla) closure in the
  #    localized-axis regime, lr 3e-4 (VERDICT r2 item 4); resumes from the
  #    last checkpoint if a previous pass died mid-run
  leg vanilla 14400 python scripts/closure_suite.py \
    --outdir runs/closure_vanilla_local2 --axis-jitter 1.5 \
    --n-train 4096 --n-val 256 --n-test 256 --epochs 150 --lr 3e-4 \
    --eval-every 3

  # 4. second vanilla leg (VERDICT r2 #4 'coarser pitch' alternative): wider
  #    showers => smooth subcell ratio field within the raw-coordinate MLP's
  #    spectral capacity
  leg vanilla_sigma 14400 python scripts/closure_suite.py \
    --outdir runs/closure_vanilla_sigma16 --sigma 1.6 \
    --n-train 4096 --n-val 256 --n-test 256 --epochs 120 --lr 1e-3 \
    --eval-every 2
done

echo "=== queue done $(date -u +%H:%M:%S) ==="
