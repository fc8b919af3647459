"""Production-batch wall-time attribution on the real TPU (VERDICT r2 #2/#3).

Decomposes the SR inference sampler's wall time at the two extreme production
bucket shapes — (64, 1536) and (10, 5120) — into:

  * flash-attention kernel time (chained pure-kernel calls at the model's
    exact shapes, robust and no-max variants),
  * everything else (full chained model evals minus the attention share):
    embedders, DiT dense stack, LayerNorms, adaLN modulation, sampler glue.

Dispatch pollution is avoided the same way the kernel benches do it: chain N
evals inside one jit via lax.scan and sync once (axon's block_until_ready is
a no-op; per-call timing adds ~0.9 ms dispatch each).  Optionally captures a
jax.profiler trace of each timed segment (--trace <dir>), verified working on
axon (CLAUDE.md).

Writes docs/PROFILE_r3.json and prints a human summary.

Usage:  python tools/profile_inference.py [--trace runs/profile_r3] [--reps 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = [(64, 1536), (10, 5120)]  # production bucket extremes (bench.py)
N_EVAL_CHAIN = 20  # model evals chained per timed segment


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, help="jax.profiler trace output dir")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    import yaml
    from jax import lax

    from superresolutionhep_tpu.models.flow_model import FlowModel
    from superresolutionhep_tpu.ops.flash_attention import masked_flash_attention
    from superresolutionhep_tpu.tools.flops import flow_model_flops

    with open(os.path.join(repo, "configs", "multipart", "model_and_var.yml")) as fp:
        config_mv = yaml.safe_load(fp)
    tcfg = config_mv["flow_model"]["transformer"]
    n_layers = int(tcfg["num_transformer_layers"])
    H = int(tcfg["num_heads"])
    h_dim = int(config_mv["flow_model"]["h_dim"])
    D = h_dim // H

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    def timed(fn, *xs, reps):
        sync(fn(*xs))  # compile + first-exec stall
        sync(fn(*xs))
        t0 = time.time()
        for _ in range(reps):
            out = fn(*xs)
        sync(out)
        return (time.time() - t0) / reps

    results = {"device": str(jax.devices()[0]), "shapes": {}}
    rng = np.random.default_rng(0)

    for B, L in SHAPES:
        key = f"{B}x{L}"
        batch = {
            "eta": jnp.asarray(rng.normal(size=(B, L, 1)).astype(np.float32)),
            "cosphi": jnp.asarray(rng.normal(size=(B, L, 1)).astype(np.float32)),
            "sinphi": jnp.asarray(rng.normal(size=(B, L, 1)).astype(np.float32)),
            "layer": jnp.asarray(rng.integers(0, 3, size=(B, L, 1)).astype(np.int32)),
            "e_proxy": jnp.asarray(rng.normal(size=(B, L, 1)).astype(np.float32)),
            "q_mask": jnp.ones((B, L), bool),
        }
        shape_res = {}
        for fast in (False, True):
            model = FlowModel(
                config=config_mv["flow_model"],
                dtype=jnp.bfloat16,
                attn_impl="flash_nomax" if fast else "auto",
            )
            params = model.init(
                jax.random.PRNGKey(0), batch, batch["e_proxy"], jnp.zeros((B,))
            )

            # full model: N_EVAL_CHAIN chained evals in one jit
            @jax.jit
            def model_chain(x0):
                def step(x, t):
                    v = model.apply(params, batch, x, jnp.full((B,), t, jnp.float32))
                    return x + 0.01 * v.astype(x.dtype), ()

                xT, _ = lax.scan(step, x0, jnp.linspace(0.0, 1.0, N_EVAL_CHAIN))
                return xT

            x0 = jnp.zeros((B, L, 1), jnp.float32)
            if args.trace and not fast:
                jax.profiler.start_trace(os.path.join(args.trace, key))
            t_model = timed(model_chain, x0, reps=args.reps) / N_EVAL_CHAIN
            if args.trace and not fast:
                jax.profiler.stop_trace()

            # pure attention at the model's shapes: n_layers calls per eval
            qkv = jnp.asarray(
                rng.normal(size=(B, L, H, D)).astype(np.float32), jnp.bfloat16
            )
            mask = jnp.ones((B, L), bool)
            smode = "nomax_clip" if fast else "max"

            @jax.jit
            def attn_chain(q):
                def step(q, _):
                    o = masked_flash_attention(
                        q, qkv, qkv, mask, mask, scale=0.125, softmax=smode
                    )
                    return o, ()

                o, _ = lax.scan(step, q, None, length=N_EVAL_CHAIN * n_layers)
                return o

            t_attn = timed(attn_chain, qkv, reps=args.reps) / N_EVAL_CHAIN

            f = flow_model_flops(params, config_mv, B, L)
            attn_tfs = f["attention"] / t_attn / 1e12
            shape_res["fast" if fast else "robust"] = {
                "model_eval_ms": round(1e3 * t_model, 2),
                "attention_ms": round(1e3 * t_attn, 2),
                "other_ms": round(1e3 * (t_model - t_attn), 2),
                "attention_frac_of_wall": round(t_attn / t_model, 3),
                "attention_tfs": round(attn_tfs, 1),
                "model_tfs": round(f["total"] / t_model / 1e12, 1),
                "flops_per_eval_attention": f["attention"],
                "flops_per_eval_total": f["total"],
            }
        results["shapes"][key] = shape_res
        print(key, json.dumps(shape_res, indent=2))

    out = os.path.join(repo, "docs", "PROFILE_r3.json")
    json.dump(results, open(out, "w"), indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
