#!/usr/bin/env python
"""End-to-end PF (stage-2) physics-closure experiment.

Counterpart of scripts/closure_suite.py for the particle-flow stage: does
SAPF, trained through the production pipeline on synthetic multi-particle
events, actually reconstruct the particles?  Gates on:

  * cardinality accuracy (predicted particle count == truth count),
  * matched kinematic residual IQRs (pt / eta / phi),
  * predicted-incidence quality vs the truth incidence (mean |dw| per cell
    on matched particles).

Pipeline (all production code paths): generate multipart truth -> stage-1
inference in LR-passthrough mode (the Low_Tree of the SR output file carries
the measured cells + per-particle energy-incidence branches the PF dataset
trains on; the HR branches are not used at res='low') -> train SAPF via the
PF trainer -> PF inference -> metrics JSON.

Usage:
    python scripts/closure_pf_suite.py --outdir runs/closure_pf --epochs 80
    python scripts/closure_pf_suite.py --outdir runs/closure_pf --eval-only
"""

import argparse
import glob as globlib
import json
import os
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from superresolutionhep_tpu.utils.hostmem import ensure_tuned  # noqa: E402

ensure_tuned()  # glibc malloc tunables via one-time re-exec (hostmem.py)

from superresolutionhep_tpu.data import root_io
from superresolutionhep_tpu.data.synthetic import GeneratorConfig, write_synthetic_file

GEN = dict(
    min_particles=1,
    max_particles=4,
    shower_sigma_cells=0.8,
    split_noise=0.1,
    noise_frac=0.01,
    window_lr_cells=2,
    e_min_gev=10.0,
    e_max_gev=100.0,
)


def generate(outdir, n_train, n_val, n_test):
    os.makedirs(os.path.join(outdir, "data"), exist_ok=True)
    paths = {}
    for split, n, seed in [("train", n_train, 21), ("val", n_val, 22), ("test", n_test, 23)]:
        p = os.path.join(outdir, "data", f"{split}.h5")
        if not os.path.exists(p):
            print(f"[gen] {split}: {n} events -> {p}")
            write_synthetic_file(p, n, seed=seed, config=GeneratorConfig(**GEN))
        paths[split] = p
    return paths


def sr_passthrough(outdir, paths):
    """Produce SR-output-schema files: Low_Tree measured cells + e_part_i
    incidence branches (what PF res='low' trains on).  Uses a random-weight
    FlowModel at 2 steps — the HR prediction is irrelevant here."""
    mv = yaml.safe_load(open("configs/single_e/model_and_var_synth.yml"))
    mv["res_factor"] = 2
    tr = {
        "res_factor": 2, "detector": "COCOA", "dataset": "closure_pf",
        "learningrate": 1e-3, "lr_scheduler": None, "num_epochs": 1,
    }
    mv_path = os.path.join(outdir, "sr_mv.yml")
    t_path = os.path.join(outdir, "sr_t.yml")
    yaml.safe_dump(mv, open(mv_path, "w"))
    yaml.safe_dump(tr, open(t_path, "w"))

    from superresolutionhep_tpu.train.sr_trainer import SRTrainer
    from superresolutionhep_tpu.inference.sr import SRInference

    trainer = SRTrainer(mv, tr, run_dir=os.path.join(outdir, "sr_init"), seed=0)
    inf = SRInference(
        {"model": {"config_path_mv": mv_path, "config_path_t": t_path,
                   "checkpoint_path": None, "n_steps": 2, "n_steps_to_store": 1}},
        params=trainer.state.params,
    )
    out = {}
    for split in ("train", "val", "test"):
        d = os.path.join(outdir, "sr_out", split)
        os.makedirs(d, exist_ok=True)
        pred = os.path.join(d, f"{split}_pred_0_0.h5")
        if not os.path.exists(pred):
            n = root_io.num_entries(paths[split], "Low_Tree")
            inf.run_pred(
                {"truth_path": paths[split], "pred_path": pred, "entry_start": 0,
                 "n_events": n, "n_ensemble": 1, "batch_size": 64,
                 "ode_method": "euler", "save_ensemble_components": False,
                 "store_energy_incidence": True, "max_particles": GEN["max_particles"]}
            )
        out[split] = os.path.join(d, f"{split}_pred_*_*.h5")
    return out


def train_pf(outdir, globs, epochs):
    cfg_mv = yaml.safe_load(open("configs/pflow/model_and_var.yml"))
    cfg_mv["pf_model"]["max_particles"] = GEN["max_particles"]
    cfg_t = yaml.safe_load(open("configs/pflow/train.yml"))
    cfg_t.update(
        num_epochs=epochs,
        eval_every_n_epoch=max(epochs // 8, 1),
        train_glob_arg=globs["train"],
        val_glob_arg=globs["val"],
        base_root_dir=outdir,
        run_name="closure_pf",
        n_sq_sum_threshold_train="1024**2 * 24",
        n_sq_sum_threshold_val="1024**2 * 64",
    )
    mv_path = os.path.join(outdir, "pf_mv.yml")
    t_path = os.path.join(outdir, "pf_t.yml")
    yaml.safe_dump(cfg_mv, open(mv_path, "w"))
    yaml.safe_dump(cfg_t, open(t_path, "w"))

    from superresolutionhep_tpu.cli.train_pf import main as pf_main

    pf_main(["-cmv", mv_path, "-ct", t_path, "--run_dir", os.path.join(outdir, "run"), "--debug_mode"])
    return mv_path, t_path


def infer_pf(outdir, globs, mv_path, t_path):
    from superresolutionhep_tpu.inference.pf import PFInference

    pred_path = os.path.join(outdir, "pf_test_pred.h5")
    inf = PFInference(
        {"model": {"config_path_mv": mv_path, "config_path_t": t_path,
                   "checkpoint_path": os.path.join(outdir, "run", "checkpoints", "best")},
         "batch_size": 64}
    )
    inf.run_pred({"glob_arg": globs["test"], "pred_path": pred_path, "store_inc_wt": True})
    return pred_path


def evaluate(pred_path, sr_test_glob=None):
    tree = root_io.read_tree(pred_path, "Particle_Tree")
    truth_card = np.asarray(tree["truth_card"])
    pred_card = np.asarray(tree["pred_card"])
    out = {
        "n_events": int(truth_card.size),
        "cardinality_accuracy": float((truth_card == pred_card).mean()),
        "cardinality_accuracy_by_n": {
            str(n): float((pred_card[truth_card == n] == n).mean())
            for n in sorted(set(truth_card.tolist()))
        },
    }

    def iqr(a):
        return float(np.subtract(*np.percentile(a, [75, 25]))) if a.size else None

    res = {}
    for name in ("pt", "eta", "phi"):
        t_rows = tree[f"truth_{name}_raw" if name != "phi" else "truth_phi"]
        p_rows = tree[f"pred_{name}_raw" if name != "phi" else "pred_phi"]
        diffs = []
        for i in range(len(truth_card)):
            t = np.asarray(t_rows[i], np.float64)
            p = np.asarray(p_rows[i], np.float64)
            k = min(t.size, p.size)
            d = t[:k] - p[:k]
            if name == "phi":
                d = (d + np.pi) % (2 * np.pi) - np.pi
            if name == "pt":
                d = d / np.maximum(np.abs(t[:k]), 1e-9)  # relative pt residual
            diffs.append(d)
        res[name] = np.hstack(diffs) if diffs else np.zeros(0)
    out["residual_iqr"] = {
        "pt_rel": iqr(res["pt"]), "eta": iqr(res["eta"]), "phi": iqr(res["phi"])
    }

    # incidence closeness on matched particles: mean |w_pred - w_true| per
    # (cell, particle), truth weights from the per-particle energy branches
    # of the SR-out file the PF dataset trained on (PF inference aligns the
    # predicted particle order to truth via the matching)
    inc_keys = sorted(k for k in tree if k.startswith("pred_inc_wt_"))
    out["n_incidence_branches"] = len(inc_keys)
    if inc_keys and sr_test_glob and globlib.glob(sr_test_glob):
        srf = sorted(globlib.glob(sr_test_glob))[0]
        n_part = len(inc_keys)
        low = root_io.read_tree(
            srf, "Low_Tree", ["e_meas_raw"] + [f"e_part_{i}" for i in range(n_part)]
        )
        idx = np.asarray(tree["idx"])
        abs_err, n_terms = 0.0, 0
        for row, ev in enumerate(idx):
            e = np.asarray(low["e_meas_raw"][ev], np.float64)
            keep = e > 1.0  # the PF dataset's MeV threshold
            ep = np.stack(
                [np.asarray(low[f"e_part_{i}"][ev], np.float64)[keep] for i in range(n_part)],
                axis=-1,
            )
            tot = ep.sum(-1, keepdims=True)
            w_true = ep / np.maximum(tot, 1e-12)
            w_pred = np.stack(
                [np.asarray(tree[k][row], np.float64) for k in inc_keys], axis=-1
            )
            if w_pred.shape[0] != w_true.shape[0]:
                continue
            ncard = int(truth_card[row])
            m = (tot[:, 0] > 0)[:, None] & (np.arange(n_part)[None, :] < ncard)
            abs_err += float(np.abs(w_pred - w_true)[m].sum())
            n_terms += int(m.sum())
        out["incidence_mae"] = abs_err / max(n_terms, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="runs/closure_pf")
    ap.add_argument("--n-train", type=int, default=3072)
    ap.add_argument("--n-val", type=int, default=256)
    ap.add_argument("--n-test", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend (smoke tests)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.outdir, exist_ok=True)
    paths = generate(args.outdir, args.n_train, args.n_val, args.n_test)
    pred_path = os.path.join(args.outdir, "pf_test_pred.h5")
    if not args.eval_only:
        globs = sr_passthrough(args.outdir, paths)
        mv_path, t_path = train_pf(args.outdir, globs, args.epochs)
        pred_path = infer_pf(args.outdir, globs, mv_path, t_path)

    metrics = evaluate(
        pred_path, sr_test_glob=os.path.join(args.outdir, "sr_out", "test", "test_pred_*_*.h5")
    )
    metrics["generator"] = GEN
    metrics["gate_cardinality_ge_0p8"] = metrics["cardinality_accuracy"] >= 0.8
    out_path = os.path.join(args.outdir, "closure_pf_metrics.json")
    json.dump(metrics, open(out_path, "w"), indent=2)
    print(json.dumps(metrics, indent=2))
    print(f"[closure-pf] wrote {out_path}")


if __name__ == "__main__":
    main()
