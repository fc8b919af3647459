"""Measure SR/PF training-step throughput + MFU on the real TPU.

Round-5 training-lever measurements (VERDICT r4 items 3 and 6) without
re-running the full headline bench: the SR train step at both production
shapes with the fused-prologue and remat levers toggled, plus the PF
train step (fwd+bwd + on-device Hungarian + clip + AdamW) at the reference
packer scale.  Reuses bench.py's _train_bench/_pf_train_bench so the
numbers are definitionally the same as the BENCH_rN `sr_train`/`pf_train`
entries.

    python scripts/measure_train_bench.py   # writes docs/train_bench.json
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from superresolutionhep_tpu.utils.hostmem import ensure_tuned  # noqa: E402

ensure_tuned()


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    import yaml

    import bench

    with open(os.path.join(ROOT, "configs", "multipart", "model_and_var.yml")) as fp:
        config_mv = yaml.safe_load(fp)

    out = {"device": str(jax.devices()[0]), "sr_train": [], "pf_train": None}
    legs = [
        dict(B=8, N=2048, fused=False, remat=True),
        dict(B=8, N=2048, fused=True, remat=True),
        dict(B=8, N=2048, fused=False, remat=False),
        dict(B=8, N=2048, fused=True, remat=False),
        dict(B=6, N=3584, fused=False, remat=True),
        dict(B=6, N=3584, fused=True, remat=True),
    ]
    for leg in legs:
        try:
            r = bench._train_bench(jax, jnp, np, config_mv, n_rep=8, **leg)
        except Exception as e:  # OOM on a no-remat leg etc. — record, continue
            r = dict(leg, error=f"{type(e).__name__}: {e}"[:200])
        out["sr_train"].append(r)
        print(json.dumps(r), flush=True)

    try:
        out["pf_train"] = bench._pf_train_bench(jax, jnp, np, ROOT)
    except Exception as e:
        out["pf_train"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    print(json.dumps({"pf_train": out["pf_train"]}), flush=True)

    path = os.path.join(ROOT, "docs", "train_bench.json")
    json.dump(out, open(path, "w"), indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
