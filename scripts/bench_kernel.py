"""Flash-attention kernel microbenchmark (forward and train-step fwd+bwd).

Measures achieved TF/s against the *shape-limited* MXU roofline: at
head_dim 64 both kernel matmuls contract/produce 64 of the MXU's 128 lanes,
so the attainable peak is ~half the chip's bf16 peak.  Prints one JSON line
per configuration.

Usage:  python scripts/bench_kernel.py [--fp32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from superresolutionhep_tpu.ops.flash_attention import masked_flash_attention

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    # (B, L, H, D, valid_fraction)
    cases = [
        (8, 2048, 8, 64, 1.0),
        (4, 3584, 8, 64, 1.0),
        (4, 3584, 8, 64, 0.6),  # bucketed padding: block skip should track this
        (16, 1024, 8, 64, 1.0),
    ]
    for B, L, H, D, frac in cases:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(B, L, H, D)), dtype)
        k = jnp.asarray(rng.normal(size=(B, L, H, D)), dtype)
        v = jnp.asarray(rng.normal(size=(B, L, H, D)), dtype)
        n_valid = int(L * frac)
        valid = jnp.asarray(np.arange(L)[None, :] < n_valid) & jnp.ones((B, 1), bool)
        scale = 1.0 / np.sqrt(D)

        fwd = jax.jit(lambda q, k, v: masked_flash_attention(q, k, v, valid, valid, scale))

        def loss(q, k, v):
            o = masked_flash_attention(q, k, v, valid, valid, scale)
            return (o.astype(jnp.float32) ** 2).sum()

        grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        sync(fwd(q, k, v))
        t0 = time.time()
        for _ in range(args.reps):
            o = fwd(q, k, v)
        sync(o)
        dt_f = (time.time() - t0) / args.reps

        g = grad(q, k, v)
        sync(g[0])
        t0 = time.time()
        for _ in range(args.reps):
            g = grad(q, k, v)
        sync(g[0])
        dt_b = (time.time() - t0) / args.reps

        # useful flops on the *valid* region
        Lv = n_valid
        fwd_flops = 4 * B * H * Lv * Lv * D
        # bwd = fwd recompute x2 + 5 grad matmuls = 7 matmuls of 2*L^2*D
        bwd_flops = 14 * B * H * Lv * Lv * D + fwd_flops  # grad() reruns fwd too
        print(
            json.dumps(
                {
                    "shape": [B, L, H, D],
                    "valid_frac": frac,
                    "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
                    "fwd_ms": round(dt_f * 1e3, 2),
                    "fwd_tfs": round(fwd_flops / dt_f / 1e12, 1),
                    "fwd_bwd_ms": round(dt_b * 1e3, 2),
                    "fwd_bwd_tfs": round(bwd_flops / dt_b / 1e12, 1),
                }
            )
        )


if __name__ == "__main__":
    main()
