"""Benchmark harness: SR ensemble inference throughput (events/sec/chip).

Production sampler settings from the reference deployment
(configs/multipart/inference_batch.yml: n_steps=25, n_ensemble=10) over
multipart-shaped synthetic events (res_factor=4, ~3.9k HR cells/event) run
through the real pipeline: host preprocessing -> bucketed padded batches ->
jitted vmapped-ensemble lax.scan sampler with the Pallas masked
flash-attention kernel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (BASELINE.md), so vs_baseline
is reported against the recorded value in BASELINE.json "published" when
present, else null.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from superresolutionhep_tpu.utils.hostmem import ensure_tuned  # noqa: E402

ensure_tuned()  # glibc malloc tunables via one-time re-exec (hostmem.py)

N_STEPS = 25
N_ENSEMBLE = 10
N_EVENTS = 256
METHOD = "ab2e"  # 2nd-order multistep, Euler bootstrap: n_steps-1 evals total (flow/ode.py)
MEASURED_CHIP_TFS = 96.9  # large-matmul bf16 rate measured on this chip with
                          # 50 chained 4096^2 matmuls inside one jit (per-call
                          # dispatch over the axon tunnel pollutes naive
                          # timing); nominal v5e peak is 197 — this instance
                          # delivers half


def _wait_for_tpu(max_wait_s, probe_timeout_s=300):
    """Bounded wait for the axon tunnel: probe in a subprocess (an in-process
    backend-init failure is cached by jax for the life of the process, so the
    probe must be external). Proceeds after the deadline either way — if the
    chip never comes back the real error surfaces downstream."""
    import subprocess

    deadline = time.time() + max_wait_s
    probe = "import jax; raise SystemExit(0 if jax.devices()[0].platform != 'cpu' else 1)"
    while True:
        try:
            rc = subprocess.run(
                [sys.executable, "-c", probe], timeout=probe_timeout_s,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            return True
        if time.time() >= deadline:
            print(f"[bench] TPU still unavailable after {max_wait_s:.0f}s wait; proceeding", file=sys.stderr)
            return False
        print("[bench] TPU unavailable; retrying in 60s", file=sys.stderr)
        time.sleep(60)


def main():
    global N_STEPS, N_ENSEMBLE, N_EVENTS
    tpu_ok = _wait_for_tpu(float(os.environ.get("BENCH_TPU_WAIT_S", "900")))
    import jax

    if not tpu_ok:
        # Tunnel down: an in-process jax.devices() can HANG inside the axon
        # plugin (observed: probes blocked >300 s while the tunnel flapped)
        # rather than fall back — select the CPU backend explicitly before
        # the first devices() call (JAX_PLATFORMS env is ignored by the
        # plugin; the config update is honored, CLAUDE.md).
        jax.config.update("jax_platforms", "cpu")

    # degraded CPU mode: production settings (256 ev x 250 evals) need many
    # hours on the 1-core CPU backend — shrink the workload so a bench run
    # with the TPU tunnel down still completes and emits an honestly-labeled
    # JSON line instead of hanging the round.  BENCH_ALLOW_SLOW_CPU=1 keeps
    # full settings (e.g. for a deliberate CPU baseline).
    degraded = (
        jax.devices()[0].platform == "cpu"
        and os.environ.get("BENCH_ALLOW_SLOW_CPU", "0") != "1"
    )
    if degraded:
        N_STEPS, N_ENSEMBLE, N_EVENTS = 5, 2, 16
        print(
            "[bench] CPU backend: degraded mode (16 ev, 2x5 evals); "
            "metric labeled accordingly",
            file=sys.stderr,
        )

    # persistent compile cache: the axon remote-compile path is slow; cache
    # compiled programs across bench invocations
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np
    import yaml

    from superresolutionhep_tpu.data.bucketing import BucketBatcher
    from superresolutionhep_tpu.data.sr_dataset import SupResEvents, collate
    from superresolutionhep_tpu.data.synthetic import GeneratorConfig, write_synthetic_file
    from superresolutionhep_tpu.flow.sampling import generate_ensemble
    from superresolutionhep_tpu.models.flow_model import FlowModel

    repo = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(repo, "configs", "multipart", "model_and_var.yml")) as fp:
        config_mv = yaml.safe_load(fp)

    bench_dir = os.path.join(repo, "data", "bench")
    os.makedirs(bench_dir, exist_ok=True)
    tag = "degraded" if degraded else "multipart"
    path = os.path.join(bench_dir, f"{tag}_{N_EVENTS}.h5")
    if not os.path.exists(path):
        write_synthetic_file(
            path,
            n_events=N_EVENTS,
            seed=42,
            # window 2 at rf=4 yields ~1.2-4.8k HR ECAL cells/event, matching
            # the real multipart distribution (packer cap 3520, SURVEY §6).
            # degraded CPU mode shrinks cells/event via particles+window only;
            # res_factor must stay 4 — the multipart config's proxy/target
            # transforms assume it (truth-vs-proxy length check in
            # transforms.py).  The point is a completed, honestly-labeled
            # run, not a number comparable to the TPU headline.
            config=(
                GeneratorConfig(res_factor=4, max_particles=2, window_lr_cells=1)
                if degraded
                else GeneratorConfig(res_factor=4, max_particles=4, window_lr_cells=2)
            ),
        )

    ds = SupResEvents(path, config_mv)
    # bfloat16 compute (fp32 params/accumulation in the flash kernel) — the
    # TPU production configuration.  BENCH_FAST=1 (default) uses the
    # inference-only no-max clipped-softmax kernel, the production
    # `fast_softmax` path (validated per checkpoint by nomax_selfcheck in
    # inference/sr.py; here by the robust-vs-fast first-batch compare below).
    fast = os.environ.get("BENCH_FAST", "1") != "0"
    # BENCH_FUSED=1 (default with fast): fuse norm1 + adaLN + QKV per DiT
    # layer into one Pallas pass (ops/fused_qkv.py) — validated against the
    # fully-unfused robust model by the same first-batch compare
    fused = fast and os.environ.get("BENCH_FUSED", "1") != "0"
    model = FlowModel(
        config=config_mv["flow_model"],
        dtype=jnp.bfloat16,
        attn_impl="flash_nomax" if fast else "auto",
        fused_prologue=fused,
    )

    # init params once on a small shape
    db_pad = 256
    dummy = collate([ds.get_event(0)] if ds.cell_count_high[0] <= db_pad else [None], 4096)
    dummy = {k: jnp.asarray(v) for k, v in dummy.items() if isinstance(v, np.ndarray) and k != "idx"}
    params = model.init(
        jax.random.PRNGKey(0), dummy, dummy["target"], jnp.zeros((dummy["eta"].shape[0],))
    )
    # one-time bf16 param cast (geometry embedder stays fp32): without it the
    # fp32->bf16 weight convert + layout copy is re-staged inside the sampler
    # scan every iteration (~3-4 ms/iter at small L, BASELINE.md round-3)
    from superresolutionhep_tpu.models.precision import cast_params_for_inference

    params = cast_params_for_inference(params)

    apply_fn = lambda v, b, x, t: model.apply(v, b, x, t)  # noqa: E731

    def run_batch(batch, key):
        return generate_ensemble(
            apply_fn,
            params,
            batch,
            key,
            n_ensemble=N_ENSEMBLE,
            n_steps=N_STEPS,
            method=METHOD,
            ret_seq=False,
        )

    jitted = jax.jit(run_batch)

    # 512-cell quantum: padding cost is quadratic in the pad ratio, so finer
    # buckets cut wasted attention FLOPs ~2x vs a 2048 quantum (measured:
    # the 2048-bucket mean event uses only ~24% of its padded compute).
    # Each distinct shape compiles once (slow on axon) and persists in
    # .jax_cache; the flash kernel accepts any L that is a multiple of 128
    # BENCH_FINE_Q/BENCH_FINE_ABOVE: hybrid quantum — finer pad quantum for
    # events above a length threshold (absolute padding waste ~2*N*pad grows
    # with N, so the fine quantum at the top end buys most of the padding
    # back for few extra compiled shapes; see data/bucketing.py)
    fine_q = os.environ.get("BENCH_FINE_Q")
    batcher = BucketBatcher(
        ds.cell_count_high,
        quantum=int(os.environ.get("BENCH_QUANTUM", "512")),
        fine_quantum=int(fine_q) if fine_q else None,
        fine_above=int(os.environ.get("BENCH_FINE_ABOVE", "3072")),
        cost_budget=4096 * 4096 * 16,
        max_batch_size=int(os.environ.get("BENCH_MAXB", "64")),
        shuffle=False,
        # underfilled tail batches run at a smaller B; "exact" removes every
        # filler row (7.4% of executed attention flops vs "pow2" on this
        # event set — see data/bucketing.py)
        tail_shrink=os.environ.get("BENCH_TAIL", "exact"),
        # BENCH_MERGE_TAILS=k: move <=k-event bucket tails into the next
        # bucket up — tiny batches are dispatch-bound (~0.1-0.9 s each for
        # 1-2 events; see data/bucketing.py merge_tail_up)
        merge_tail_up=int(os.environ.get("BENCH_MERGE_TAILS", "0")),
    )

    # BENCH_PACKED=1: segment-packed batches — ONE compiled shape for the
    # whole set, padding only to the 128-cell block alignment, banded
    # attention skipping cross-event blocks (ops/flash_packed.py)
    packed = os.environ.get("BENCH_PACKED", "0") != "0"
    pack_S = int(os.environ.get("BENCH_PACK_S", "5120"))
    pack_rows = int(os.environ.get("BENCH_PACK_ROWS", "12"))

    # prepare host batches once (host prep is timed separately below)
    t_prep0 = time.time()
    batches = []
    if packed:
        from superresolutionhep_tpu.data.packing import collate_packed, pack_events
        from superresolutionhep_tpu.ops.flash_packed import set_packed_defaults

        max_ev = int(max(ds.cell_count_high))
        blk = int(os.environ.get("BENCH_PACK_BLOCK", "256"))
        set_packed_defaults(
            block_q=blk, block_k=blk, max_segment_len=-(-max_ev // 128) * 128
        )
        layouts = pack_events(ds.cell_count_high, S=pack_S, rows_per_batch=pack_rows)

        class _EvCache:
            def __getitem__(self, i):
                return ds.get_event(i)

        cache = _EvCache()
        for lay in layouts:
            hb = collate_packed(cache, lay, S=pack_S)
            mb = {k: jnp.asarray(v) for k, v in hb.items()}
            n_valid = [n for row in lay.rows for (_, _, n) in row]
            batches.append((mb, lay.n_events, n_valid))
    else:
        for idxs, bucket in batcher:
            events = [ds.get_event(i) if i >= 0 else None for i in idxs]
            hb = collate(events, bucket.pad_n)
            mb = {
                k: jnp.asarray(v)
                for k, v in hb.items()
                if isinstance(v, np.ndarray) and k not in ("idx",)
            }
            n_real = int((idxs >= 0).sum())
            n_valid = [ds.cell_count_high[i] for i in idxs if i >= 0]
            batches.append((mb, n_real, n_valid))
    host_prep_s = time.time() - t_prep0

    # warmup/compile per bucket shape
    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))  # axon: block_until_ready is a no-op

    key = jax.random.PRNGKey(1)
    seen_shapes = set()
    for mb, _, _ in batches:
        shape = mb["eta"].shape
        if shape in seen_shapes:
            continue
        seen_shapes.add(shape)
        tc = time.time()
        sync(jitted(mb, key))
        # second warm run: first execution after (cached) compile can pay a
        # one-time load/installation stall on axon
        sync(jitted(mb, key))
        print(f"compiled {shape}: {time.time()-tc:.1f}s", file=sys.stderr)

    # validate the no-max kernel against the robust online-softmax on the
    # first batch (same gate production inference applies per checkpoint)
    nomax_ok = None
    if fast:
        from superresolutionhep_tpu.ops.flash_attention import nomax_selfcheck

        model_robust = FlowModel(config=config_mv["flow_model"], dtype=jnp.bfloat16)
        mb0 = batches[0][0]
        x0 = jnp.zeros_like(mb0["e_proxy"])
        t0 = jnp.full((mb0["eta"].shape[0],), 0.5, jnp.float32)
        nomax_ok = nomax_selfcheck(
            jax.jit(lambda b: model_robust.apply(params, b, x0, t0)),
            jax.jit(lambda b: model.apply(params, b, x0, t0)),
            mb0,
        )
        print(f"nomax selfcheck: {'OK' if nomax_ok else 'FAILED'}", file=sys.stderr)
        if not nomax_ok:
            # production semantics (inference/sr.py): fall back to the robust
            # online-softmax kernel — never publish throughput measured with
            # a kernel that failed its own numerical gate
            fast = False

            def run_batch_robust(batch, key):
                return generate_ensemble(
                    lambda v, b, x, t: model_robust.apply(v, b, x, t),
                    params, batch, key, n_ensemble=N_ENSEMBLE,
                    n_steps=N_STEPS, method=METHOD, ret_seq=False,
                )

            jitted = jax.jit(run_batch_robust)
            rewarmed = set()
            for mb, _, _ in batches:
                if mb["eta"].shape not in rewarmed:
                    rewarmed.add(mb["eta"].shape)
                    sync(jitted(mb, key))
                    sync(jitted(mb, key))

    # analytic FLOPs per batch (XLA cost_analysis cannot see through the
    # Pallas custom call and missed ~5/6 of the work in round 2 — VERDICT r2;
    # tools/flops.py counts the attention matmuls + every Dense kernel)
    from superresolutionhep_tpu.tools.flops import flow_model_flops, sampler_evals

    evals = sampler_evals(N_STEPS, METHOD) * N_ENSEMBLE
    batch_flops = []  # (padded, masked, attention_padded) per batch
    for mb, _, n_valid in batches:
        B, N = mb["eta"].shape[:2]
        if packed:
            from superresolutionhep_tpu.ops.flash_packed import PACKED_DEFAULTS
            from superresolutionhep_tpu.tools.flops import flow_model_flops_packed

            f = flow_model_flops_packed(
                params, config_mv, np.asarray(mb["seg"]),
                PACKED_DEFAULTS["block_q"], PACKED_DEFAULTS["block_k"],
            )
        else:
            f = flow_model_flops(params, config_mv, B, N, n_valid=n_valid)
        batch_flops.append(
            (f["total"] * evals, f["total_masked"] * evals, f["attention"] * evals)
        )

    # optional: capture a profiler trace of the timed pass (works on axon)
    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    # timed pass: each batch is executed BENCH_REPS times and scored by its
    # median wall — a single run folds tunnel/warm-state variance into the
    # headline (the r3 driver run paid a 13.58 s first (10,5120) batch vs
    # 4.97 s steady state, VERDICT r3 weak #2).  The headline is steady-state
    # throughput: sum(events) / sum(median batch wall).
    n_reps = int(os.environ.get("BENCH_REPS", "1" if degraded else "3"))
    per_batch = []
    event_latencies = []  # batch wall-time, once per real event in the batch
    total_flops = total_flops_masked = total_attn_flops = 0.0
    wall_raw = 0.0  # sum over every reps (what the clock actually saw)
    dt = 0.0  # sum of per-batch medians (the headline wall)
    total_events = 0
    for i, (mb, n_real, _) in enumerate(batches):
        reps = []
        for r in range(n_reps):
            tb = time.time()
            out = jitted(mb, jax.random.fold_in(key, i * 1024 + r))
            sync(out)
            reps.append(time.time() - tb)
        bt = float(np.median(reps))
        wall_raw += sum(reps)
        dt += bt
        per_batch.append(
            (tuple(mb["eta"].shape[:2]), n_real, [round(r, 3) for r in reps])
        )
        event_latencies.extend([bt] * n_real)
        fp, fm, fa = batch_flops[i]
        total_flops += fp
        total_flops_masked += fm
        total_attn_flops += fa
        total_events += n_real
    if profile_dir:
        jax.profiler.stop_trace()

    events_per_sec = total_events / dt
    lat = np.asarray(event_latencies)
    achieved_tfs = total_flops / dt / 1e12

    published = {}
    try:
        with open(os.path.join(repo, "BASELINE.json")) as fp:
            published = json.load(fp).get("published", {}) or {}
    except Exception:
        pass
    base = published.get("sr_inference_events_per_sec")
    # degraded mode: the published baseline is a TPU number at production
    # settings — a CPU/16-event ratio against it is meaningless, null it
    vs = (events_per_sec / base) if (base and not degraded) else None

    # TPU-numerics golden (scripts/make_tpu_golden.py): pins the production
    # flash_nomax + fused-prologue bf16 sampler against a frozen fixture —
    # the committed test goldens pin CPU float32 einsum only
    tpu_golden = None
    if not degraded and os.environ.get("BENCH_TPU_GOLDEN", "1") != "0":
        try:
            import importlib.util

            spec = importlib.util.spec_from_file_location(
                "make_tpu_golden", os.path.join(repo, "scripts", "make_tpu_golden.py")
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            tpu_golden = mod.check(verbose=False)
            print(json.dumps({"tpu_golden": tpu_golden}), file=sys.stderr)
        except Exception as e:
            tpu_golden = {"ok": None, "reason": f"{type(e).__name__}: {e}"[:200]}
            print(json.dumps({"tpu_golden": tpu_golden}), file=sys.stderr)

    # secondary metrics: skipped in degraded CPU mode (each would take
    # longer than the whole degraded headline run)
    pf_events_per_sec = None
    pf_train_metrics = None
    train_metrics = None
    if not degraded:
        try:
            pf_events_per_sec = _pf_bench(jax, jnp, np, repo)
        except Exception as e:  # secondary metric never blocks the headline
            print(json.dumps({"pf_bench_error": str(e)[:200]}), file=sys.stderr)

        try:
            pf_train_metrics = _pf_train_bench(jax, jnp, np, repo)
        except Exception as e:
            print(json.dumps({"pf_train_bench_error": str(e)[:200]}), file=sys.stderr)

        # secondary metric: SR training step throughput at multipart scale
        try:
            train_metrics = [
                _train_bench(jax, jnp, np, config_mv, B=8, N=2048),
                # multipart bucket top-end: the packer cap is 3520 cells
                # (SURVEY §6); 3584 = next flash-block-divisible pad
                _train_bench(jax, jnp, np, config_mv, B=6, N=3584),
            ]
            # BENCH_TRAIN_VARIANTS=1: fused-prologue-ON and no-remat legs
            # (training-lever measurements, BASELINE.md round-5)
            if os.environ.get("BENCH_TRAIN_VARIANTS", "0") != "0":
                train_metrics += [
                    _train_bench(jax, jnp, np, config_mv, B=8, N=2048, fused=True),
                    _train_bench(jax, jnp, np, config_mv, B=8, N=2048, remat=False),
                    _train_bench(jax, jnp, np, config_mv, B=6, N=3584, fused=True),
                ]
        except Exception as e:
            print(json.dumps({"train_bench_error": str(e)[:200]}), file=sys.stderr)

    result = {
        "metric": f"sr_inference_events_per_sec_per_chip_nsteps{N_STEPS}_ens{N_ENSEMBLE}",
        "value": round(events_per_sec, 3),
        "unit": "events/s",
        "vs_baseline": round(vs, 3) if vs else None,
    }
    if degraded:
        result["degraded"] = "cpu-backend"
    print(json.dumps(result))
    # extra context on stderr (driver reads stdout's single JSON line)
    print(
        json.dumps(
            {
                "detail": {
                    "device": str(jax.devices()[0]),
                    "n_events": total_events,
                    "wall_s": round(dt, 3),
                    "wall_raw_s": round(wall_raw, 3),
                    "reps_per_batch": n_reps,
                    "host_prep_s": round(host_prep_s, 3),
                    # latency of an event = wall time of the batch that
                    # carried it (what a caller waits for); quantiles over
                    # all real events
                    "p50_event_latency_ms": round(1000.0 * float(np.percentile(lat, 50)), 2),
                    "p95_event_latency_ms": round(1000.0 * float(np.percentile(lat, 95)), 2),
                    "mean_event_cost_ms": round(1000.0 * dt / max(total_events, 1), 2),
                    # analytic accounting (tools/flops.py): padded = what the
                    # chip executes; masked discounts pad cells (the gap IS
                    # the padding overhead); attention_share of padded FLOPs
                    "achieved_tfs": round(achieved_tfs, 1),
                    "achieved_tfs_masked": round(total_flops_masked / dt / 1e12, 1),
                    "mfu_vs_measured_chip_peak": round(achieved_tfs / MEASURED_CHIP_TFS, 3),
                    "mfu_masked_vs_measured_chip_peak": round(
                        total_flops_masked / dt / 1e12 / MEASURED_CHIP_TFS, 3
                    ),
                    "attention_flop_share": round(total_attn_flops / total_flops, 3),
                    "fast_softmax": fast,
                    "nomax_selfcheck_ok": nomax_ok,
                    "padding_flop_overhead": round(total_flops / total_flops_masked - 1.0, 3),
                    "packed": packed,
                    "buckets": (
                        [("packed", pack_rows, pack_S)]
                        if packed
                        else [(int(b.pad_n), int(b.batch_size)) for b in batcher.buckets]
                    ),
                    "per_batch": per_batch,
                    "tpu_golden": tpu_golden,
                    "pf_inference_events_per_sec": pf_events_per_sec,
                    "pf_train": pf_train_metrics,
                    "sr_train": train_metrics,
                }
            }
        ),
        file=sys.stderr,
    )


def _train_bench(jax, jnp, np, config_mv, B=8, N=2048, n_rep=8,
                 fused=False, remat=True):
    """SR training-step throughput (fwd+bwd+AdamW) at multipart scale,
    bf16 compute with per-layer rematerialisation; reports executed-flop
    MFU (tools/flops.py::train_step_flops — remat recomputes are real chip
    work) beside the hardware-independent useful-flop rate."""
    import tempfile
    import time

    from superresolutionhep_tpu.tools.flops import train_step_flops

    from superresolutionhep_tpu.train.sr_trainer import SRTrainer

    cfg_t = {
        "num_epochs": 1, "learningrate": 1e-3, "lr_scheduler": None,
        "remat": remat, "bucket_quantum": N, "fused_prologue": fused,
    }
    with tempfile.TemporaryDirectory() as td:
        trainer = SRTrainer(config_mv, cfg_t, run_dir=td, dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        host = {
            "eta": rng.normal(size=(B, N, 1)).astype(np.float32),
            "cosphi": rng.normal(size=(B, N, 1)).astype(np.float32),
            "sinphi": rng.normal(size=(B, N, 1)).astype(np.float32),
            "layer": rng.integers(0, 3, size=(B, N, 1)).astype(np.int32),
            "e_proxy": rng.normal(size=(B, N, 1)).astype(np.float32),
            "q_mask": np.ones((B, N), bool),
            "target": rng.normal(size=(B, N, 1)).astype(np.float32),
        }
        batch = trainer._device_batch(host)
        lr = jnp.asarray(1e-3, jnp.float32)
        p, o = trainer.state.params, trainer.state.opt_state

        def sync(stats):
            return float(stats["loss"])

        key = jax.random.PRNGKey(0)
        for _ in range(2):  # compile + first-exec stall
            p, o, stats = trainer._train_step(p, o, batch, key, lr)
            sync(stats)
        # median of 3 timed blocks: a single transient tunnel/host stall
        # (observed ~1-2 s in per-batch reps) would sink a one-block number
        blocks = []
        for blk in range(3):
            t0 = time.time()
            for i in range(n_rep):
                p, o, stats = trainer._train_step(
                    p, o, batch, jax.random.fold_in(key, blk * n_rep + i), lr
                )
            sync(stats)
            blocks.append((time.time() - t0) / n_rep)
        dt = sorted(blocks)[1]
        tf = train_step_flops(trainer.state.params, config_mv, B, N, remat=remat)
        return {
            "steps_per_sec": round(1.0 / dt, 2),
            "events_per_sec": round(B / dt, 1),
            "batch": [B, N],
            "fused_prologue": fused,
            "remat": remat,
            "train_tfs_executed": round(tf["total"] / dt / 1e12, 1),
            "train_tfs_useful": round(tf["total_useful"] / dt / 1e12, 1),
            "train_mfu": round(tf["total"] / dt / 1e12 / MEASURED_CHIP_TFS, 3),
            "train_mfu_useful": round(
                tf["total_useful"] / dt / 1e12 / MEASURED_CHIP_TFS, 3
            ),
        }


def _pf_train_bench(jax, jnp, np, repo, B=25, N=2048, n_rep=8):
    """Stage-2 training-step throughput: SAPF fwd+bwd + on-device Hungarian
    matching inside the loss + global-norm clip (1.0) + AdamW, at the
    reference PF packer scale (pflow/configs/train.yml: n_sq_sum 2138^2*25
    -> ~(25, 2048) is the dominant bucket shape).  Reference analog: the
    manual-optimization step /root/reference/pflow/lightning_pf.py:162-180
    (which pays a device->host sync + scipy loop per batch for matching)."""
    import tempfile
    import time

    import yaml

    from superresolutionhep_tpu.train.pf_trainer import PFTrainer

    with open(os.path.join(repo, "configs", "pflow", "model_and_var.yml")) as fp:
        cfg_mv = yaml.safe_load(fp)
    P = int(cfg_mv["pf_model"]["max_particles"])
    cfg_t = {
        "num_epochs": 1, "learningrate": 1e-3, "lr_scheduler": None,
        "loss_on_inc_wts": True, "card_loss_weight": 0.5,
        "grad_clip_norm": 1.0, "bucket_quantum": N,
    }
    with tempfile.TemporaryDirectory() as td:
        trainer = PFTrainer(cfg_mv, cfg_t, run_dir=td)
        rng = np.random.default_rng(0)
        z = lambda *s: rng.normal(size=s).astype(np.float32)  # noqa: E731
        inc = np.abs(z(B, N, P)) + 1e-3
        inc = inc / inc.sum(-1, keepdims=True)
        host = {
            "cell_e": z(B, N), "cell_eta": z(B, N), "cell_phi": z(B, N),
            "cell_cosphi": z(B, N), "cell_sinphi": z(B, N),
            "cell_e_raw": np.abs(z(B, N)) * 20, "cell_eta_raw": z(B, N),
            "cell_layer": rng.integers(0, 3, (B, N)).astype(np.int32),
            "cell_mask": np.ones((B, N), bool),
            "part_pt": z(B, P), "part_eta": z(B, P), "part_phi": z(B, P),
            "part_dep_e": np.abs(z(B, P)) * 10,
            "part_mask": np.ones((B, P), bool),
            "cardinality": np.full((B,), P, np.int32),
            "incidence_matrix": inc.astype(np.float32),
        }
        batch = trainer._device_batch(host)
        lr = jnp.asarray(1e-3, jnp.float32)
        p, o = trainer.state.params, trainer.state.opt_state
        key = jax.random.PRNGKey(0)
        for _ in range(2):  # compile + first-exec stall
            p, o, logs = trainer._train_step(p, o, batch, key, lr)
            float(logs["loss"])
        blocks = []  # median-of-3 blocks, same stall shielding as _train_bench
        for blk in range(3):
            t0 = time.time()
            for i in range(n_rep):
                p, o, logs = trainer._train_step(
                    p, o, batch, jax.random.fold_in(key, blk * n_rep + i), lr
                )
            float(logs["loss"])
            blocks.append((time.time() - t0) / n_rep)
        dt = sorted(blocks)[1]
        return {
            "steps_per_sec": round(1.0 / dt, 2),
            "events_per_sec": round(B / dt, 1),
            "batch": [B, N],
        }


def _pf_bench(jax, jnp, np, repo, B=64, N=2048):
    """Stage-2 throughput: SAPF forward + on-device Hungarian matching
    (the PF inference hot path) on multipart-scale cell sets."""
    import time

    import yaml

    from superresolutionhep_tpu.losses.set2set import set_to_set_incidence_loss
    from superresolutionhep_tpu.models.pf.model_pf import SAPF
    from superresolutionhep_tpu.transforms import build_var_transforms

    with open(os.path.join(repo, "configs", "pflow", "model_and_var.yml")) as fp:
        cfg = yaml.safe_load(fp)
    P = int(cfg["pf_model"]["max_particles"])
    rng = np.random.default_rng(0)
    z = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))  # noqa: E731
    batch = {
        "cell_e": z(B, N), "cell_eta": z(B, N), "cell_phi": z(B, N),
        "cell_cosphi": z(B, N), "cell_sinphi": z(B, N),
        "cell_e_raw": jnp.abs(z(B, N)) * 20, "cell_eta_raw": z(B, N),
        "cell_layer": jnp.asarray(rng.integers(0, 3, (B, N)).astype(np.int32)),
        "cell_mask": jnp.ones((B, N), bool),
        "part_pt": z(B, P), "part_eta": z(B, P), "part_phi": z(B, P),
        "part_dep_e": z(B, P), "part_mask": jnp.ones((B, P), bool),
        "incidence_matrix": jnp.abs(z(B, N, P)),
    }
    # fused_prologue mirrors the PFInference default; at the reference
    # h_dim=64 the fused_qkv gate (F%128) falls back to the equivalent
    # unfused formulation, so this is parity-neutral for this config
    model = SAPF(
        config_pf=cfg["pf_model"],
        transforms=build_var_transforms(cfg["var_transform"]),
        inference=True,
        fused_prologue=os.environ.get("BENCH_FUSED", "1") != "0",
    )
    variables = model.init(jax.random.PRNGKey(0), batch)

    @jax.jit
    def fwd(v, b):
        logits, kin, inc = model.apply(v, b)
        _, _, assign = set_to_set_incidence_loss(inc, b, kin)
        return jnp.argmax(logits, -1), kin, assign

    def sync(o):
        return float(jnp.sum(o[0].astype(jnp.float32)))

    sync(fwd(variables, batch))
    t0 = time.time()
    n_rep = 10
    outs = [fwd(variables, batch) for _ in range(n_rep)]
    sync(outs[-1])
    dt = (time.time() - t0) / n_rep
    return round(B / dt, 1)


if __name__ == "__main__":
    main()
