"""Probe the in-loop copy/layout residual in the production sampler.

Round-3 trace attribution left ~3-4 ms/iter of copy/layout ops inside the
jitted AB2 ensemble sampler at the small-L production shape (BASELINE.md
round-3; VERDICT r3 weak #2 names pre-transposed/pinned weight layouts as
the next lever).  The one-time bf16 pre-cast (models/precision.py) removed
the fp32->bf16 convert; this probe measures what is LEFT and whether
XLA-chosen input layouts (jax.experimental.layout AUTO) remove it.

Runs the exact bench.py production configuration (fast no-max kernel +
fused prologue + pre-cast params, n_steps=25 ab2, ens=10) at (64,1536) and
(10,5120):

  A. default layouts  — params passed as ordinary committed arrays
  B. AUTO layouts     — jit compiled with Format(Layout.AUTO) on the param
                        leaves; params re-committed to the compiler-chosen
                        formats with device_put

and reports wall/eval for both plus a trace-summary class breakdown
(pallas / matmul / fusion / copy-layout) for each variant.

Usage: python scripts/probe_layout_copies.py [--trace runs/probe_layout]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from superresolutionhep_tpu.utils import hostmem
from superresolutionhep_tpu.tools.flops import sampler_evals

hostmem.ensure_tuned()

SHAPES = [(64, 1536), (10, 5120)]
N_STEPS = 25
N_ENSEMBLE = 10
if os.environ.get("PROBE_TINY"):  # CPU smoke of the script itself
    SHAPES, N_STEPS, N_ENSEMBLE = [(2, 256)], 3, 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    ap.add_argument("--reps", type=int, default=5)
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
    from jax.experimental.layout import Format, Layout

    from superresolutionhep_tpu.flow.sampling import generate_ensemble
    from superresolutionhep_tpu.models.flow_model import FlowModel
    from superresolutionhep_tpu.models.precision import cast_params_for_inference

    with open(os.path.join(repo, "configs", "multipart", "model_and_var.yml")) as fp:
        config_mv = yaml.safe_load(fp)

    model = FlowModel(
        config=config_mv["flow_model"],
        dtype=jnp.bfloat16,
        attn_impl="flash_nomax",
        fused_prologue=True,
    )

    def sync(x):
        return float(jnp.sum(jnp.asarray(x, jnp.float32)))

    def run_batch(params, batch, key):
        return generate_ensemble(
            lambda v, b, x, t: model.apply(v, b, x, t),
            params,
            batch,
            key,
            n_ensemble=N_ENSEMBLE,
            n_steps=N_STEPS,
            method="ab2",
            ret_seq=False,
        )

    rng = np.random.default_rng(0)
    results = {"device": str(jax.devices()[0]), "shapes": {}}
    # ab2 costs exactly n_steps model evals (heun bootstrap's 2 evals cover
    # the first 2 grid points; tools/flops.py sampler_evals(25,'ab2')==25)
    n_evals = sampler_evals(N_STEPS, "ab2") * N_ENSEMBLE

    for B, L in SHAPES:
        skey = f"{B}x{L}"
        batch = {
            "eta": jnp.asarray(rng.normal(size=(B, L, 1)).astype(np.float32)),
            "cosphi": jnp.asarray(rng.normal(size=(B, L, 1)).astype(np.float32)),
            "sinphi": jnp.asarray(rng.normal(size=(B, L, 1)).astype(np.float32)),
            "layer": jnp.asarray(rng.integers(0, 3, size=(B, L, 1)).astype(np.int32)),
            "e_proxy": jnp.asarray(rng.normal(size=(B, L, 1)).astype(np.float32)),
            "q_mask": jnp.ones((B, L), bool),
        }
        params = model.init(
            jax.random.PRNGKey(0), batch, batch["e_proxy"], jnp.zeros((B,))
        )
        params = cast_params_for_inference(params)
        key = jax.random.PRNGKey(1)

        shape_res = {}
        for variant in ("default", "auto_layout"):
            if variant == "default":
                jitted = jax.jit(run_batch)
                p_use = params
                call = jitted
                t0 = time.time()
                sync(call(p_use, batch, key))
                compile_s = time.time() - t0
            else:
                # AUTO on the params only; batch/key keep default layouts so
                # the comparison isolates the weight-layout effect
                fmt = Format(Layout.AUTO)
                in_sh = (
                    jax.tree_util.tree_map(lambda _: fmt, params),
                    jax.tree_util.tree_map(lambda _: None, batch),
                    None,
                )
                jitted = jax.jit(run_batch, in_shardings=in_sh)
                p_abs = jax.tree_util.tree_map(
                    lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params
                )
                t0 = time.time()
                compiled = jitted.lower(p_abs, batch, key).compile()
                compile_s = time.time() - t0
                pfmt = compiled.input_formats[0][0]
                # report how many leaves got a non-row-major layout
                flat_p, _ = jax.tree_util.tree_flatten(params)
                flat_f, _ = jax.tree_util.tree_flatten(
                    pfmt, is_leaf=lambda x: isinstance(x, Format)
                )
                nondefault = sum(
                    1
                    for a, f in zip(flat_p, flat_f)
                    if a.ndim >= 2
                    and f.layout is not None
                    and f.layout.major_to_minor
                    != tuple(range(a.ndim))
                )
                shape_res["auto_nonrowmajor_leaves"] = nondefault
                p_use = jax.device_put(params, pfmt)
                call = compiled
                sync(call(p_use, batch, key))
            sync(call(p_use, batch, key))  # warm
            trace_dir = None
            if args.trace:
                trace_dir = os.path.join(args.trace, f"{skey}_{variant}")
                jax.profiler.start_trace(trace_dir)
            t0 = time.time()
            for _ in range(args.reps):
                out = call(p_use, batch, key)
            sync(out)
            wall = (time.time() - t0) / args.reps
            if args.trace:
                jax.profiler.stop_trace()
            shape_res[variant] = {
                "wall_s": round(wall, 4),
                "ms_per_eval": round(wall / n_evals * 1e3, 3),
                "compile_s": round(compile_s, 1),
                "trace": trace_dir,
            }
            print(
                f"[{skey}] {variant}: {wall:.4f} s/batch, "
                f"{wall / n_evals * 1e3:.3f} ms/eval (compile {compile_s:.0f}s)",
                flush=True,
            )
        results["shapes"][skey] = shape_res

    out_path = os.path.join(repo, "docs", "probe_layout_copies.json")
    with open(out_path, "w") as fp:
        json.dump(results, fp, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
