"""Measure online-serving latency (SRServer) at production sampler settings.

Produces the BASELINE.md serving table: per-bucket p50/p95 single-request
latency plus a concurrent-client throughput check, on single_e-scale and
multipart-scale events.  Weights are random-init (latency is weight-value
independent); sampler settings are the production ones (n_steps=25, ens=10,
ab2, fast_softmax gated by the selfcheck).

Usage: python scripts/measure_serving_latency.py [--reps 12]
"""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from superresolutionhep_tpu.utils.hostmem import ensure_tuned  # noqa: E402

ensure_tuned()  # glibc malloc tunables via one-time re-exec (hostmem.py)


def synth_event(n_cells: int, seed: int = 0) -> dict:
    import numpy as np

    rng = np.random.default_rng(seed)
    return {
        "cell_eta": rng.uniform(-1.2, 1.2, n_cells).tolist(),
        "cell_phi": rng.uniform(-3.1, 3.1, n_cells).tolist(),
        "cell_layer": rng.integers(0, 3, n_cells).tolist(),
        "cell_e": np.abs(rng.normal(50.0, 20.0, n_cells)).tolist(),  # MeV
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=12)
    ap.add_argument("--concurrency", type=int, default=4)
    args = ap.parse_args()

    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from superresolutionhep_tpu.inference.server import SRServer

    inf_cfg = {
        "model": {
            "config_path_mv": os.path.join(repo, "configs/multipart/model_and_var.yml"),
            "config_path_t": os.path.join(repo, "configs/multipart/train.yml"),
            "checkpoint_path": None,
            "n_steps": 25,
            "fast_softmax": True,
        },
        "n_ensemble": 10,
        "ode_method": "ab2",
    }
    # random-init params via SRInference(params=...) path: init on a small batch
    import jax.numpy as jnp
    from superresolutionhep_tpu.config import load_yaml
    from superresolutionhep_tpu.models.flow_model import FlowModel

    config_mv = load_yaml(inf_cfg["model"]["config_path_mv"])
    model = FlowModel(config=config_mv["flow_model"])
    dummy = {
        "eta": jnp.zeros((1, 256, 1)), "cosphi": jnp.ones((1, 256, 1)),
        "sinphi": jnp.zeros((1, 256, 1)), "layer": jnp.zeros((1, 256, 1), jnp.int32),
        "e_proxy": jnp.zeros((1, 256, 1)), "q_mask": jnp.ones((1, 256), bool),
    }
    params = model.init(jax.random.PRNGKey(0), dummy, dummy["e_proxy"], jnp.zeros((1,)))[
        "params"
    ]

    server = SRServer(inf_cfg, params=params)
    t0 = time.time()
    server.warmup()
    warmup_s = time.time() - t0

    table = {"warmup_s": round(warmup_s, 1), "buckets": {}}
    sizes = [200, 480, 1000, 1900, 3400, 4900]
    for n in sizes:
        ev = synth_event(n, seed=n)
        lat = []
        for r in range(args.reps):
            t0 = time.time()
            out = server.predict_event(ev)
            lat.append((time.time() - t0) * 1e3)
        lat = np.asarray(lat[2:])  # drop straggler warmup pair
        table["buckets"][str(n)] = {
            "bucket": out["bucket"],
            "p50_ms": round(float(np.percentile(lat, 50)), 1),
            "p95_ms": round(float(np.percentile(lat, 95)), 1),
            "device_ms": out["device_ms"],
        }
        print(n, table["buckets"][str(n)], flush=True)

    # concurrent clients: total throughput at a mid-size event
    ev = synth_event(1900, seed=7)
    n_req = args.reps * args.concurrency
    done = []
    lock = threading.Lock()

    def client(n_calls):
        for _ in range(n_calls):
            t0 = time.time()
            server.predict_event(ev)
            with lock:
                done.append((time.time() - t0) * 1e3)

    t0 = time.time()
    threads = [threading.Thread(target=client, args=(args.reps,)) for _ in range(args.concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.time() - t0
    table["concurrent"] = {
        "clients": args.concurrency,
        "events_per_sec": round(n_req / dt, 2),
        "p50_ms": round(float(np.percentile(done, 50)), 1),
        "p95_ms": round(float(np.percentile(done, 95)), 1),
    }
    print(json.dumps(table, indent=2))
    out_path = os.path.join(repo, "docs", "serving_latency.json")
    json.dump(table, open(out_path, "w"), indent=2)
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
