"""Segment-packed banded flash-attention kernel microbenchmark.

Compares the packed kernel (ops/flash_packed.py) against the bucketed
kernel (ops/flash_attention.py) on the SAME event set — the bench's
multipart cell-count distribution — and sweeps the packed block size.

Two rates are reported per config:
  * tfs_true:   TF/s on the mask-true attention FLOPs (4*H*D*sum n_i^2) —
                the physics-useful rate, directly comparable across layouts;
  * tfs_exec:   TF/s on the FLOPs the kernel actually executes (banded
                blocks / padded bucket), the MXU-utilization view.

Usage: python scripts/bench_packed_kernel.py [--reps 10] [--rows 12]
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
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--rows", type=int, default=12)
    ap.add_argument("--S", type=int, default=5120)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from superresolutionhep_tpu.data.packing import pack_events
    from superresolutionhep_tpu.ops.flash_attention import masked_flash_attention
    from superresolutionhep_tpu.ops.flash_packed import band_ranges, packed_flash_attention

    H, D = 8, 64
    rng = np.random.default_rng(args.seed)
    # the bench multipart distribution (window 2, rf 4): ~1.2k-4.8k cells
    counts = rng.integers(1200, 4801, 256)

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    true_pairs = float((counts.astype(np.float64) ** 2).sum())
    true_flops = 4.0 * H * D * true_pairs

    results = []

    # ---- packed, block sweep ----
    layouts = pack_events(counts, S=args.S, rows_per_batch=args.rows)
    seg_batches = []
    for lay in layouts:
        seg = np.full((len(lay.rows), args.S), -1, np.int32)
        for bi, row in enumerate(lay.rows):
            for si, (_, off, n) in enumerate(sorted(row, key=lambda t: t[1])):
                seg[bi, off : off + n] = si
        seg_batches.append(seg)

    max_seg = int(-(-counts.max() // 128) * 128)
    for blk in (512, 256, 128):
        for softmax in ("max", "nomax_clip"):
            fn = jax.jit(
                lambda q, k, v, seg: packed_flash_attention(
                    q, k, v, seg, scale=1.0 / np.sqrt(D), softmax=softmax,
                    block_q=blk, block_k=blk, max_segment_len=max_seg,
                )
            )
            datas = []
            exec_pairs = 0.0
            for seg in seg_batches:
                B = seg.shape[0]
                q, k, v = (
                    jnp.asarray(rng.normal(size=(B, args.S, H, D)), jnp.bfloat16)
                    for _ in range(3)
                )
                datas.append((q, k, v, jnp.asarray(seg)))
                _, kc = band_ranges(jnp.asarray(seg), blk, blk)
                exec_pairs += float(np.asarray(kc, np.float64).sum()) * blk * blk
            sync(fn(*datas[0]))  # compile
            for d in datas:
                sync(fn(*d))  # warm
            t0 = time.time()
            for _ in range(args.reps):
                outs = [fn(*d) for d in datas]
                sync(outs[-1])
            dt = (time.time() - t0) / args.reps
            exec_flops = 4.0 * H * D * exec_pairs
            results.append({
                "layout": "packed", "block": blk, "softmax": softmax,
                "batches": len(datas), "wall_ms": round(dt * 1e3, 2),
                "tfs_true": round(true_flops / dt / 1e12, 1),
                "tfs_exec": round(exec_flops / dt / 1e12, 1),
                "band_overhead": round(exec_pairs / true_pairs - 1.0, 3),
            })
            print(json.dumps(results[-1]))

    # ---- bucketed baseline (512 quantum) on the same events ----
    for softmax in ("max", "nomax_clip"):
        fn = jax.jit(
            lambda q, k, v, valid: masked_flash_attention(
                q, k, v, valid, valid, scale=1.0 / np.sqrt(D), softmax=softmax
            )
        )
        # group into buckets of equal padded length, batch to ~64k cells
        pad = (-(-counts // 512) * 512).astype(int)
        datas = []
        exec_pairs = 0.0
        for L in sorted(set(pad)):
            idxs = np.nonzero(pad == L)[0]
            bs = max(1, min(64, (64 * 1536) // L))
            for s in range(0, len(idxs), bs):
                chunk = idxs[s : s + bs]
                # pad tail chunks to a full B: one compiled shape per L
                # (every distinct shape is a 30-240 s axon compile); dead
                # rows skip kernel compute via the valid mask
                cnt = np.zeros(bs, np.int64)
                cnt[: len(chunk)] = counts[chunk]
                q, k, v = (
                    jnp.asarray(rng.normal(size=(bs, L, H, D)), jnp.bfloat16)
                    for _ in range(3)
                )
                valid = jnp.asarray(np.arange(L)[None, :] < cnt[:, None])
                datas.append((q, k, v, valid))
                exec_pairs += float(len(chunk)) * L * L  # upper bound; block skip trims tails
        for d in datas:
            sync(fn(*d))  # compile+warm
        for d in datas:
            sync(fn(*d))
        t0 = time.time()
        for _ in range(args.reps):
            outs = [fn(*d) for d in datas]
            sync(outs[-1])
        dt = (time.time() - t0) / args.reps
        results.append({
            "layout": "bucketed512", "softmax": softmax, "batches": len(datas),
            "wall_ms": round(dt * 1e3, 2),
            "tfs_true": round(true_flops / dt / 1e12, 1),
            "tfs_exec": round(4.0 * H * D * exec_pairs / dt / 1e12, 1),
            "pad_overhead": round(exec_pairs / true_pairs - 1.0, 3),
        })
        print(json.dumps(results[-1]))

    out = os.path.join(repo, "docs", "packed_kernel_bench.json")
    json.dump(results, open(out, "w"), indent=2)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
