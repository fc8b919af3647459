"""SR training throughput: bucketed vs segment-packed batches.

One pass ("epoch") of real train steps (fwd+bwd+AdamW, bf16 compute,
per-layer remat) over the bench multipart event distribution
(data/bench/multipart_256.h5, ~1.2-4.8k HR cells/event), through the SAME
jitted SRTrainer._train_step — only the batch layout differs:

- bucketed: 512-cell quantum, n^2 cost budget (the reference's multipart
  packer semantics, configs/multipart/train.yml n_sq_sum < 3520^2*6) — one
  compiled step per bucket shape, padding to the bucket quantum;
- packed: events packed into (rows, S) rows of ONE static shape
  (data/packing.py) with the differentiable banded kernel
  (ops/flash_packed.py custom VJP), padding only to the 128-cell alignment.

Prints one JSON line with events/s trained per leg and the speedup.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from superresolutionhep_tpu.utils.hostmem import ensure_tuned  # noqa: E402

ensure_tuned()  # glibc malloc tunables via one-time re-exec (hostmem.py)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=6144)
    ap.add_argument("--rows", type=int, default=8)
    ap.add_argument("--quantum", type=int, default=512)
    ap.add_argument("--cost-budget", type=int, default=3520 * 3520 * 6)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--n-events", type=int, default=256, help="use the first N bench events")
    ap.add_argument("--data", default=None, help="override the event file (smoke tests)")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument(
        "--fused", action="store_true",
        help="train with the fused DiT layer kernels (ref-recompute VJP); "
        "composes with the packed leg via per-cell modulation rows",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np
    import yaml

    from superresolutionhep_tpu.data.bucketing import BucketBatcher
    from superresolutionhep_tpu.data.packing import aligned_len, collate_packed, pack_events
    from superresolutionhep_tpu.data.sr_dataset import SupResEvents, collate
    from superresolutionhep_tpu.data.synthetic import GeneratorConfig, write_synthetic_file
    from superresolutionhep_tpu.ops.flash_packed import set_packed_defaults
    from superresolutionhep_tpu.train.sr_trainer import SRTrainer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "configs", "multipart", "model_and_var.yml")) as fp:
        config_mv = yaml.safe_load(fp)
    path = args.data or os.path.join(repo, "data", "bench", "multipart_256.h5")
    if not os.path.exists(path):
        write_synthetic_file(
            path, n_events=256, seed=42,
            config=GeneratorConfig(res_factor=4, max_particles=4, window_lr_cells=2),
        )
    ds = SupResEvents(path, config_mv)
    counts = np.asarray(ds.cell_count_high)[: args.n_events]

    import tempfile

    cfg_t = {
        "num_epochs": 1, "learningrate": 1e-3, "lr_scheduler": None, "remat": True,
        "fused_prologue": bool(args.fused),
    }
    with tempfile.TemporaryDirectory() as td:
        trainer = SRTrainer(config_mv, cfg_t, run_dir=td, dtype=jnp.bfloat16)
        lr = jnp.asarray(1e-3, jnp.float32)
        key = jax.random.PRNGKey(0)

        def sync(stats):
            return float(stats["loss"])

        cache = {}

        def get_ev(i):
            if i not in cache:
                cache[i] = ds.get_event(i)
            return cache[i]

        def run_leg(batches, name):
            """batches: list of host dicts. Warm per shape, then timed pass."""
            dev = [trainer._device_batch(hb) for hb in batches]
            # _train_step donates params/opt_state — each leg trains on its
            # own copy and every call rebinds to the returned state
            p = jax.tree_util.tree_map(jnp.array, trainer.state.params)
            o = jax.tree_util.tree_map(jnp.array, trainer.state.opt_state)
            seen = set()
            for b in dev:
                shape = b["eta"].shape
                if shape not in seen:
                    seen.add(shape)
                    tc = time.time()
                    p, o, stats = trainer._train_step(p, o, b, key, lr)
                    sync(stats)
                    p, o, stats = trainer._train_step(p, o, b, key, lr)
                    sync(stats)
                    print(f"[{name}] compiled {shape}: {time.time()-tc:.1f}s", file=sys.stderr)
            t0 = time.time()
            for i, b in enumerate(dev):
                p, o, stats = trainer._train_step(p, o, b, jax.random.fold_in(key, i), lr)
            loss = sync(stats)
            dt = time.time() - t0
            assert np.isfinite(loss), f"non-finite loss in {name} leg"
            return dt, len(dev), sorted(seen)

        # --- bucketed leg --------------------------------------------------
        bb = BucketBatcher(
            counts, quantum=args.quantum, cost_budget=args.cost_budget,
            max_batch_size=args.max_batch, shuffle=False, tail_shrink=True,
        )
        bucketed_batches = []
        for idxs, bucket in bb:
            events = [get_ev(i) if i >= 0 else None for i in idxs]
            bucketed_batches.append(collate(events, bucket.pad_n))
        dt_b, nb_b, shapes_b = run_leg(bucketed_batches, "bucketed")

        # --- packed leg ----------------------------------------------------
        set_packed_defaults(max_segment_len=aligned_len(int(counts.max())))
        layouts = pack_events(counts, S=args.S, rows_per_batch=args.rows)

        class _C:
            def __getitem__(self, i):
                return get_ev(i)

        packed_batches = [collate_packed(_C(), lay, S=args.S) for lay in layouts]
        dt_p, nb_p, shapes_p = run_leg(packed_batches, "packed")

    n_events = len(counts)
    result = {
        "metric": "sr_train_events_per_sec",
        "n_events": n_events,
        "bucketed": {
            "wall_s": round(dt_b, 3), "events_per_sec": round(n_events / dt_b, 2),
            "n_batches": nb_b, "n_shapes": len(shapes_b),
        },
        "packed": {
            "wall_s": round(dt_p, 3), "events_per_sec": round(n_events / dt_p, 2),
            "n_batches": nb_p, "n_shapes": len(shapes_p), "S": args.S, "rows": args.rows,
        },
        "packed_speedup": round(dt_b / dt_p, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
