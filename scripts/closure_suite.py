#!/usr/bin/env python
"""End-to-end SR physics-closure experiment.

The reference validates stage 1 on real COCOA data (zenodo 15582324, not
fetchable here); this suite is the synthetic stand-in that must demonstrate
the same *capability*: super-resolution recovering subcell structure that
the naive flat split (proxy / res_factor^2 — the reference's ``low_e_split``
baseline in its substructure comparison) cannot.

Generator regime chosen for a decisive closure (docs/CLOSURE.md round-1
analysis): sharp showers (sigma = 0.6 LR cells, so subcell shares within a
cell vary by factors of several), fully deterministic conditional structure
(split_noise = 0 — p(HR | LR neighborhood) has a point mass the model can
in principle hit exactly), low measurement noise, single electron (no
combinatoric shower overlaps confounding the conditioning).

Pipeline: generate -> fit transform statistics -> write config pair ->
train (production CLI path) -> ensemble inference (production sampler) ->
per-cell residual IQR of SR prediction vs naive split, per layer + overall.
Writes closure_metrics.json; the gate VERDICT asks for is
iqr_ratio (naive / SR) >= 1.5.

Usage:
    python scripts/closure_suite.py --outdir runs/closure_v2 \
        --n-train 4096 --epochs 120
    python scripts/closure_suite.py --outdir runs/closure_v2 --eval-only
"""

import argparse
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
    single_electron=True,
    shower_sigma_cells=0.6,
    split_noise=0.0,
    noise_frac=0.005,
    window_lr_cells=3,
    e_min_gev=20.0,
    e_max_gev=100.0,
)

# hard mode: multiple overlapping showers per event (same sharp deterministic
# conditional structure; the model must separate superposed profiles)
GEN_MULTI = dict(
    single_electron=False,
    min_particles=2,
    max_particles=4,
    shower_sigma_cells=0.6,
    split_noise=0.0,
    noise_frac=0.005,
    window_lr_cells=2,
    e_min_gev=20.0,
    e_max_gev=100.0,
)


def generate(outdir, n_train, n_val, n_test, gen=None):
    gen = gen or GEN
    os.makedirs(os.path.join(outdir, "data"), exist_ok=True)
    paths = {}
    for split, n, seed in [("train", n_train, 11), ("val", n_val, 12), ("test", n_test, 13)]:
        p = os.path.join(outdir, "data", f"{split}.h5")
        if not os.path.exists(p):
            print(f"[gen] {split}: {n} events -> {p}")
            write_synthetic_file(p, n, seed=seed, config=GeneratorConfig(**gen))
        paths[split] = p
    return paths


def write_configs(outdir, paths, epochs, fourier=0, lr=1.0e-3, eval_every=None):
    from scripts.compute_scale import compute_target_stats

    mv = yaml.safe_load(open("configs/single_e/model_and_var_synth.yml"))
    if fourier:
        # optional multi-scale geometry features (flow_model.py): resolves
        # the subcell-pitch structure a plain coordinate MLP cannot express
        mv["flow_model"]["etaphi_emb"]["fourier_features"] = int(fourier)
    mean, std = compute_target_stats(paths["train"], entry_stop=512)
    mv["target_transform"]["mean"] = round(mean, 6)
    mv["target_transform"]["std"] = round(std, 6)
    # x/y/z statistics over the training file (closure grid != real COCOA)
    hi = root_io.read_tree(paths["train"], "High_Tree", ["cell_x", "cell_y", "cell_z"], 0, 512)
    for br in ("cell_x", "cell_y", "cell_z"):
        flat = np.hstack(list(hi[br]))
        blk = mv["var_transform"][br.replace("cell_", "")]
        blk["mean"] = round(float(flat.mean()), 3)
        blk["std"] = round(float(flat.std()), 3)
        blk["min"] = round(float(flat.min()), 3)
        blk["max"] = round(float(flat.max()), 3)

    tr = yaml.safe_load(open("configs/single_e/train_closure.yml"))
    tr.update(
        num_epochs=epochs,
        run_name="closure_v2",
        base_root_dir=outdir,
        train_path=paths["train"],
        val_path=paths["val"],
        eval_every_n_epoch=eval_every if eval_every else max(epochs // 10, 1),
        batch_size_train=64,
        batch_size_val=64,
        learningrate=float(lr),
        # the sharp generator's saturated-logit tails produce occasional
        # huge-gradient batches; clip like the reference's PF stage does
        grad_clip_norm=1.0,
    )
    tr["lr_scheduler"] = dict(
        name="CustomLRScheduler",
        warm_start_epochs=0.03,
        cosine_epochs=0.9,
        eta_min=1.0e-5,
        last_epoch=-1,
        max_epochs="take_as_num_epochs",
    )
    mv_path = os.path.join(outdir, "model_and_var.yml")
    tr_path = os.path.join(outdir, "train.yml")
    yaml.safe_dump(mv, open(mv_path, "w"))
    yaml.safe_dump(tr, open(tr_path, "w"))
    return mv_path, tr_path


def train(mv_path, tr_path, outdir):
    from superresolutionhep_tpu.cli.train_sr import main as train_main

    # --resume: no-op on a fresh run dir; after a mid-run crash (e.g. the
    # TPU tunnel dropping during a long vanilla leg) a re-invocation with
    # the same args continues from the last checkpoint instead of epoch 0
    train_main(
        ["-cmv", mv_path, "-ct", tr_path, "--run_dir", os.path.join(outdir, "run"),
         "--debug_mode", "--resume"]
    )


def infer(mv_path, tr_path, outdir, paths, n_ensemble, n_steps, ode_method, max_particles=1):
    inf_cfg = {
        "dataset": "single_e",
        "batch_size": 64,
        "max_particles": max_particles,
        "model": {
            "config_path_mv": mv_path,
            "config_path_t": tr_path,
            "checkpoint_path": os.path.join(outdir, "run", "checkpoints", "best"),
            "n_steps": n_steps,
            "n_steps_to_store": 2,
        },
        "items": [
            {
                "info": "closure test split",
                "run_pred": True,
                "run_plot": False,
                "n_ensemble": n_ensemble,
                "save_ensemble_components": False,
                "store_energy_incidence": False,
                "truth_path": paths["test"],
                "pred_path": os.path.join(outdir, "pred_test.h5"),
                "dir_flag": "closure",
                "entry_start": 0,
                "n_events": 10**6,
                "ode_method": ode_method,
            }
        ],
    }
    from superresolutionhep_tpu.inference.sr import SRInference

    inf = SRInference(inf_cfg)
    inf.run_pred(dict(inf_cfg["items"][0], batch_size=64, max_particles=max_particles))
    return inf_cfg["items"][0]["pred_path"]


def evaluate(truth_path, pred_path, rf=2, e_min_mev=1.0):
    """Per-HR-cell relative residuals, SR ensemble prediction vs naive flat
    split (e_proxy_raw / rf^2), ECAL layers only.  All branches come from the
    prediction file itself (truth / proxy are copied through by the inference
    driver in the same LR-grouped cell order as the prediction).  Cells with
    truth below ``e_min_mev`` are excluded from BOTH estimators (identical
    denominators, so the comparison is estimator-only)."""
    pr = root_io.read_tree(
        pred_path, "High_Tree", ["e_pred_raw", "e_truth_raw", "e_proxy_raw", "layer"]
    )

    res_naive, res_pred, layers = [], [], []
    rf2 = rf * rf
    for j in range(len(pr["e_pred_raw"])):
        e_true = np.asarray(pr["e_truth_raw"][j], np.float64)  # MeV
        e_naive = np.asarray(pr["e_proxy_raw"][j], np.float64) / rf2
        e_pred = np.asarray(pr["e_pred_raw"][j], np.float64)
        lay = np.asarray(pr["layer"][j])
        sel = e_true > e_min_mev
        res_naive.append((e_naive[sel] - e_true[sel]) / e_true[sel])
        res_pred.append((e_pred[sel] - e_true[sel]) / e_true[sel])
        layers.append(lay[sel])

    res_naive = np.hstack(res_naive)
    res_pred = np.hstack(res_pred)
    layers = np.hstack(layers)

    def iqr(a):
        return float(np.subtract(*np.percentile(a, [75, 25])))

    out = {
        "n_cells": int(res_naive.size),
        "e_min_mev": e_min_mev,
        "naive_iqr": iqr(res_naive),
        "pred_iqr": iqr(res_pred),
        "iqr_ratio": iqr(res_naive) / iqr(res_pred),
        "naive_std": float(res_naive.std()),
        "pred_std": float(res_pred.std()),
        "per_layer": {},
    }
    for layer in (0, 1, 2):
        m = layers == layer
        if m.sum() < 10:
            continue
        out["per_layer"][str(layer)] = {
            "n": int(m.sum()),
            "naive_iqr": iqr(res_naive[m]),
            "pred_iqr": iqr(res_pred[m]),
            "iqr_ratio": iqr(res_naive[m]) / iqr(res_pred[m]),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="runs/closure_v2")
    ap.add_argument("--n-train", type=int, default=4096)
    ap.add_argument("--n-val", type=int, default=256)
    ap.add_argument("--n-test", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--n-ensemble", type=int, default=10)
    ap.add_argument("--n-steps", type=int, default=25)
    ap.add_argument("--ode-method", default="ab2e")
    ap.add_argument("--fourier", type=int, default=0, help="fourier_features octaves (0 = exact reference architecture)")
    ap.add_argument("--multipart", action="store_true", help="overlapping-shower generator (hard mode)")
    ap.add_argument("--train-glob", default=None, help="override train path (e.g. pre-generated multi-file set)")
    ap.add_argument("--lr", type=float, default=1.0e-3, help="peak learning rate (the localized vanilla runs diverge at 1e-3: the circuit forms by epoch ~7, then a saturated-logit gradient spike wipes it — 3e-4 is stable)")
    ap.add_argument(
        "--eval-every", type=int, default=None,
        help="val cadence in epochs (default epochs//10). The vanilla runs "
        "need a dense cadence: best-3 checkpointing keys on val/loss_raw, "
        "and a saturated-logit spike can wipe a freshly-formed circuit "
        "between two sparse evals, losing the best window entirely",
    )
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument(
        "--axis-jitter", type=float, default=None,
        help="localized-axis generator: shower centers confined to +/- this "
        "many layer-0 LR cells around a fixed (eta, phi) axis, so the "
        "subcell-parity sawtooth has only a handful of periods — the "
        "generator regime within the exact reference featurization's "
        "spectral capacity (VERDICT r2 #4, 'coarser pitch' leg)",
    )
    ap.add_argument(
        "--sigma", type=float, default=None,
        help="shower_sigma_cells override (LR-cell units): wider showers give a "
        "smoother subcell ratio field — the regime where the reference's "
        "raw-coordinate etaphi MLP has enough spectral capacity (VERDICT r2 #4)",
    )
    ap.add_argument(
        "--device", default=None,
        help="force a jax platform (e.g. 'cpu' to run the whole suite "
        "off-TPU; the axon plugin ignores JAX_PLATFORMS so this must be a "
        "config update before backend init)",
    )
    args = ap.parse_args()
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    os.makedirs(args.outdir, exist_ok=True)
    gen = GEN_MULTI if args.multipart else GEN
    if args.sigma is not None:
        gen = dict(gen, shower_sigma_cells=args.sigma)
    if args.axis_jitter is not None:
        gen = dict(gen, axis_eta=0.35, axis_phi=0.6, axis_jitter_lr_cells=args.axis_jitter)
    paths = generate(args.outdir, args.n_train, args.n_val, args.n_test, gen=gen)
    if args.train_glob:
        paths["train"] = args.train_glob
    mv_path = os.path.join(args.outdir, "model_and_var.yml")
    tr_path = os.path.join(args.outdir, "train.yml")
    pred_path = os.path.join(args.outdir, "pred_test.h5")

    if not args.eval_only:
        if not os.path.exists(mv_path):
            mv_path, tr_path = write_configs(
                args.outdir, paths, args.epochs, fourier=args.fourier, lr=args.lr,
                eval_every=args.eval_every,
            )
        if not args.skip_train:
            train(mv_path, tr_path, args.outdir)
        pred_path = infer(
            mv_path, tr_path, args.outdir, paths, args.n_ensemble, args.n_steps, args.ode_method,
            max_particles=gen.get("max_particles", 1),
        )

    metrics = evaluate(paths["test"], pred_path)
    metrics["generator"] = gen
    metrics["gate_iqr_ratio_ge_1p5"] = metrics["iqr_ratio"] >= 1.5
    out_path = os.path.join(args.outdir, "closure_metrics.json")
    json.dump(metrics, open(out_path, "w"), indent=2)
    print(json.dumps(metrics, indent=2))
    print(f"[closure] wrote {out_path}")


if __name__ == "__main__":
    main()
