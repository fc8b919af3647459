#!/usr/bin/env python
"""Run SR inference with the shipped trained checkpoint through the standard
config-driven path (checkpoint_path can point straight at the .msgpack blob).

    python examples/shipped_checkpoint_demo.py [--out /tmp/demo_pred.h5]

Generates a few events with the closure generator the checkpoint was trained
on, predicts, and prints the per-cell residual-IQR ratio vs the naive flat
split — reproducing the docs/CLOSURE.md headline on fresh events.
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--n-events", type=int, default=16)
    ap.add_argument("--n-steps", type=int, default=25)
    ap.add_argument("--n-ensemble", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import scripts.closure_suite as cs
    from superresolutionhep_tpu.data.synthetic import GeneratorConfig, write_synthetic_file
    from superresolutionhep_tpu.inference.sr import SRInference

    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "saved_checkpoints", "closure_sr")
    with tempfile.TemporaryDirectory() as td:
        truth = write_synthetic_file(
            os.path.join(td, "demo.h5"), args.n_events, seed=777,
            config=GeneratorConfig(**cs.GEN),
        )
        pred = args.out or os.path.join(td, "demo_pred.h5")
        inf = SRInference(
            {"model": {
                "config_path_mv": os.path.join(root, "model_and_var.yml"),
                "config_path_t": os.path.join(root, "train.yml"),
                "checkpoint_path": os.path.join(root, "params.msgpack"),
                "n_steps": args.n_steps, "n_steps_to_store": 1,
            }}
        )
        inf.run_pred(
            {"truth_path": truth, "pred_path": pred, "entry_start": 0,
             "n_events": args.n_events, "n_ensemble": args.n_ensemble, "batch_size": 16,
             "ode_method": "ab2", "save_ensemble_components": False,
             "store_energy_incidence": False, "max_particles": 1}
        )
        metrics = cs.evaluate(truth, pred)
        print(f"cells: {metrics['n_cells']}")
        print(f"naive flat-split residual IQR: {metrics['naive_iqr']:.3f}")
        print(f"SR prediction residual IQR:    {metrics['pred_iqr']:.4f}")
        print(f"IQR ratio: {metrics['iqr_ratio']:.1f}x")


if __name__ == "__main__":
    main()
