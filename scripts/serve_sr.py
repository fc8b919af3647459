#!/usr/bin/env python
"""Online SR serving entry point (see superresolutionhep_tpu/inference/server.py).

    python scripts/serve_sr.py --config-mv <mv.yml> --config-t <t.yml> \
        --checkpoint saved_checkpoints/closure_sr/params.msgpack \
        --port 8310 --buckets 256 512 1024 --n-ensemble 10 --n-steps 25

Accepts msgpack param blobs (the shipped-checkpoint format) or Orbax
checkpoint directories.  POST /predict one event: {"low": {cell_* arrays,
high_cell_to_low_cell_edge}, "high": {cell geometry arrays}}.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_checkpoint_params(path, config_mv):
    if path.endswith(".msgpack"):
        import jax
        import jax.numpy as jnp
        import flax.serialization as fser

        from superresolutionhep_tpu.models.flow_model import FlowModel

        model = FlowModel(config=config_mv["flow_model"])
        B, N = 1, 64
        batch = {
            "eta": jnp.zeros((B, N, 1)), "cosphi": jnp.ones((B, N, 1)),
            "sinphi": jnp.zeros((B, N, 1)), "layer": jnp.zeros((B, N, 1), jnp.int32),
            "e_proxy": jnp.zeros((B, N, 1)), "q_mask": jnp.ones((B, N), bool),
        }
        variables = model.init(jax.random.PRNGKey(0), batch, jnp.zeros((B, N, 1)), jnp.zeros((B,)))
        with open(path, "rb") as f:
            return fser.from_bytes(variables["params"], f.read())
    return None  # Orbax dir: SRInference resolves checkpoint_path itself


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-mv", required=True)
    ap.add_argument("--config-t", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8310)
    ap.add_argument("--buckets", type=int, nargs="+",
                    default=[256, 512, 1024, 2048, 3072, 4096, 5120])
    ap.add_argument("--n-ensemble", type=int, default=10)
    ap.add_argument("--n-steps", type=int, default=25)
    ap.add_argument("--ode-method", default="ab2e")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import yaml

    from superresolutionhep_tpu.inference.server import SRServer

    config_mv = yaml.safe_load(open(args.config_mv))
    params = load_checkpoint_params(args.checkpoint, config_mv)
    inf_cfg = {
        "model": {
            "config_path_mv": args.config_mv,
            "config_path_t": args.config_t,
            "checkpoint_path": None if params is not None else args.checkpoint,
            "n_steps": args.n_steps,
            "n_steps_to_store": 1,
        },
        "n_ensemble": args.n_ensemble,
        "ode_method": args.ode_method,
    }
    server = SRServer(inf_cfg, buckets=tuple(args.buckets), params=params)
    server.warmup()
    server.serve(args.host, args.port)


if __name__ == "__main__":
    main()
