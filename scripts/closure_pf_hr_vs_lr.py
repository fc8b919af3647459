#!/usr/bin/env python
"""The two-stage scientific closure: does PF trained on SR-predicted HR cells
beat PF trained on the measured LR cells?

This reproduces the reference's headline result — its shipped pf_hr model
(val 0.3318) beats pf_lr (0.4034), trained via ``resolution: low | high``
(/root/reference/pflow/configs/train.yml:6, pflow/dataset_pf.py:25-27) on the
chunked outputs of stage-1 inference, with the comparison figures in
notebooks/performance/performance_multipart_pf.ipynb cells 10-16.

Chain (all production code paths, no shortcuts):
  1. generate collimated multi-particle events (particles within ~1.5 LR
     cells of a common axis, so showers overlap at LR pitch but separate at
     HR pitch — the regime where resolution actually matters for PF);
  2. train the SR flow model on them (production CLI);
  3. run real SR ensemble inference over train/val/test, writing the chunked
     ``*_pred_*_*.h5`` files with ``High_Tree/e_pred_raw`` and the
     per-particle energy-incidence branches on BOTH trees;
  4. train SAPF twice from those files — once ``resolution: low`` (measured
     LR cells), once ``resolution: high`` (SR-predicted HR cells);
  5. PF inference on the test split for both; report cardinality accuracy,
     matched kinematic residual IQRs, and incidence MAE side by side.

Gate (VERDICT r2 item 1): HR-PF beats LR-PF on incidence MAE and on the
eta/phi kinematic IQRs.

Usage:
    python scripts/closure_pf_hr_vs_lr.py --outdir runs/closure_pf_hr
    python scripts/closure_pf_hr_vs_lr.py --outdir runs/closure_pf_hr --eval-only
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

# jet-like events: 2-4 particles collimated within 1.5 LR cells, shower
# sigma 0.55 LR cells -> pair separations straddle the LR pitch (median
# ~1.1 LR cells = 2.2 HR cells), deterministic conditional split
GEN = dict(
    min_particles=2,
    max_particles=4,
    shower_sigma_cells=0.55,
    split_noise=0.0,
    noise_frac=0.005,
    window_lr_cells=2,
    e_min_gev=20.0,
    e_max_gev=100.0,
    collimate_delta_r_lr_cells=1.5,
)
MAX_PART = GEN["max_particles"]
E_THRESHOLD_MEV = 1.0


def generate(outdir, n_train, n_val, n_test):
    os.makedirs(os.path.join(outdir, "data"), exist_ok=True)
    paths = {}
    for split, n, seed in [("train", n_train, 31), ("val", n_val, 32), ("test", n_test, 33)]:
        p = os.path.join(outdir, "data", f"{split}.h5")
        if not os.path.exists(p):
            print(f"[gen] {split}: {n} events -> {p}")
            write_synthetic_file(p, n, seed=seed, config=GeneratorConfig(**GEN))
        paths[split] = p
    return paths


def train_sr(outdir, paths, epochs, fourier):
    from scripts.closure_suite import write_configs, train

    mv_path = os.path.join(outdir, "model_and_var.yml")
    tr_path = os.path.join(outdir, "train.yml")
    if not os.path.exists(mv_path):
        mv_path, tr_path = write_configs(outdir, paths, epochs, fourier=fourier)
    ckpt = os.path.join(outdir, "run", "checkpoints", "best")
    if not os.path.exists(ckpt):
        train(mv_path, tr_path, outdir)
    return mv_path, tr_path


def sr_inference(outdir, paths, mv_path, tr_path, n_ensemble, n_steps, ode_method):
    """Real trained-SR inference over all three splits, writing the chunked
    prediction files stage 2 globs (inference.py batch-mode contract)."""
    from superresolutionhep_tpu.inference.sr import SRInference

    inf = SRInference(
        {"model": {"config_path_mv": mv_path, "config_path_t": tr_path,
                   "checkpoint_path": os.path.join(outdir, "run", "checkpoints", "best"),
                   "n_steps": n_steps, "n_steps_to_store": 0}}
    )
    globs = {}
    for split in ("train", "val", "test"):
        d = os.path.join(outdir, "sr_out", split)
        os.makedirs(d, exist_ok=True)
        n = root_io.num_entries(paths[split], "Low_Tree")
        pred = os.path.join(d, f"{split}_pred_0_{n}.h5")
        if not os.path.exists(pred):
            print(f"[sr-infer] {split}: {n} events -> {pred}")
            inf.run_pred(
                {"truth_path": paths[split], "pred_path": pred, "entry_start": 0,
                 "n_events": n, "n_ensemble": n_ensemble, "batch_size": 64,
                 "ode_method": ode_method, "save_ensemble_components": False,
                 "store_energy_incidence": True, "max_particles": MAX_PART}
            )
        globs[split] = os.path.join(d, f"{split}_pred_*_*.h5")
    return globs


def train_pf(outdir, globs, epochs, res):
    cfg_mv = yaml.safe_load(open("configs/pflow/model_and_var.yml"))
    cfg_mv["pf_model"]["max_particles"] = MAX_PART
    cfg_t = yaml.safe_load(open("configs/pflow/train.yml"))
    cfg_t.update(
        resolution=res,
        energy_threshold=E_THRESHOLD_MEV,
        num_epochs=epochs,
        eval_every_n_epoch=max(epochs // 10, 1),
        train_glob_arg=globs["train"],
        val_glob_arg=globs["val"],
        base_root_dir=outdir,
        run_name=f"closure_pf_{res}",
        n_sq_sum_threshold_train="1024**2 * 24",
        n_sq_sum_threshold_val="1024**2 * 64",
    )
    tag = os.path.join(outdir, f"pf_{res}")
    os.makedirs(tag, exist_ok=True)
    mv_path = os.path.join(tag, "pf_mv.yml")
    t_path = os.path.join(tag, "pf_t.yml")
    yaml.safe_dump(cfg_mv, open(mv_path, "w"))
    yaml.safe_dump(cfg_t, open(t_path, "w"))

    run_dir = os.path.join(tag, "run")
    if not os.path.exists(os.path.join(run_dir, "checkpoints", "best")):
        from superresolutionhep_tpu.cli.train_pf import main as pf_main

        pf_main(["-cmv", mv_path, "-ct", t_path, "--run_dir", run_dir, "--debug_mode"])
    return mv_path, t_path, run_dir


def infer_pf(outdir, globs, mv_path, t_path, run_dir, res):
    from superresolutionhep_tpu.inference.pf import PFInference

    pred_path = os.path.join(outdir, f"pf_{res}", "pf_test_pred.h5")
    if not os.path.exists(pred_path):
        inf = PFInference(
            {"model": {"config_path_mv": mv_path, "config_path_t": t_path,
                       "checkpoint_path": os.path.join(run_dir, "checkpoints", "best")},
             "batch_size": 64}
        )
        inf.run_pred({"glob_arg": globs["test"], "pred_path": pred_path, "store_inc_wt": True})
    return pred_path


def evaluate(pred_path, sr_test_glob, res):
    """Cardinality accuracy, matched kinematic residual IQRs, and incidence
    MAE for one PF model, against the truth stored in the SR output file the
    model trained on (Low_Tree at res=low, High_Tree at res=high)."""
    tree = root_io.read_tree(pred_path, "Particle_Tree")
    truth_card = np.asarray(tree["truth_card"])
    pred_card = np.asarray(tree["pred_card"])
    out = {
        "res": res,
        "n_events": int(truth_card.size),
        "cardinality_accuracy": float((truth_card == pred_card).mean()),
        "cardinality_accuracy_by_n": {
            str(n): float((pred_card[truth_card == n] == n).mean())
            for n in sorted(set(truth_card.tolist()))
        },
    }

    def iqr(a):
        return float(np.subtract(*np.percentile(a, [75, 25]))) if a.size else None

    res_d = {}
    for name in ("pt", "eta", "phi", "e"):
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
            if name in ("pt", "e"):
                d = d / np.maximum(np.abs(t[:k]), 1e-9)  # relative residual
            diffs.append(d)
        res_d[name] = np.hstack(diffs) if diffs else np.zeros(0)
    out["residual_iqr"] = {
        "pt_rel": iqr(res_d["pt"]), "eta": iqr(res_d["eta"]),
        "phi": iqr(res_d["phi"]), "e_rel": iqr(res_d["e"]),
    }

    # incidence MAE over the same threshold-cut cells the PF model saw:
    # truth weights from the per-particle energy branches of the SR output
    tree_name = "High_Tree" if res == "high" else "Low_Tree"
    e_branch = "e_pred_raw" if res == "high" else "e_meas_raw"
    # numeric sort: lexicographic would pair pred_inc_wt_10 before _2 and
    # misalign the columns against e_part_{i} truth order at >=10 particles
    inc_keys = sorted(
        (k for k in tree if k.startswith("pred_inc_wt_")),
        key=lambda k: int(k.rsplit("_", 1)[1]),
    )
    out["n_incidence_branches"] = len(inc_keys)
    if inc_keys and globlib.glob(sr_test_glob):
        srf = sorted(globlib.glob(sr_test_glob))[0]
        n_part = len(inc_keys)
        sr = root_io.read_tree(
            srf, tree_name, [e_branch] + [f"e_part_{i}" for i in range(n_part)]
        )
        idx = np.asarray(tree["idx"])
        abs_err, n_terms = 0.0, 0
        for row, ev in enumerate(idx):
            e = np.asarray(sr[e_branch][ev], np.float64)
            keep = e > E_THRESHOLD_MEV
            ep = np.stack(
                [np.asarray(sr[f"e_part_{i}"][ev], np.float64)[keep] for i in range(n_part)],
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

    # best val loss from the training run's metric log
    run_metrics = os.path.join(os.path.dirname(pred_path), "run", "metrics.jsonl")
    if os.path.exists(run_metrics):
        best = None
        for line in open(run_metrics):
            rec = json.loads(line)
            v = rec.get("val_loss_to_optimize_on")
            if v is not None:
                best = v if best is None else min(best, v)
        out["best_val_loss_to_optimize_on"] = best
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="runs/closure_pf_hr")
    ap.add_argument("--n-train", type=int, default=8192)
    ap.add_argument("--n-val", type=int, default=512)
    ap.add_argument("--n-test", type=int, default=512)
    ap.add_argument("--sr-epochs", type=int, default=120)
    ap.add_argument("--pf-epochs", type=int, default=100)
    ap.add_argument("--n-ensemble", type=int, default=10)
    ap.add_argument("--n-steps", type=int, default=25)
    ap.add_argument("--ode-method", default="ab2e")
    ap.add_argument("--fourier", type=int, default=9)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.outdir, exist_ok=True)
    paths = generate(args.outdir, args.n_train, args.n_val, args.n_test)
    globs = {s: os.path.join(args.outdir, "sr_out", s, f"{s}_pred_*_*.h5") for s in ("train", "val", "test")}
    results = {}
    if not args.eval_only:
        mv_path, tr_path = train_sr(args.outdir, paths, args.sr_epochs, args.fourier)

        # SR quality sanity on the test split (reuses the stage-1 closure gate)
        from scripts.closure_suite import evaluate as sr_evaluate

        globs = sr_inference(args.outdir, paths, mv_path, tr_path,
                             args.n_ensemble, args.n_steps, args.ode_method)
        sr_pred = sorted(globlib.glob(globs["test"]))[0]
        results["sr_closure"] = sr_evaluate(paths["test"], sr_pred)
        print(f"[sr] IQR ratio vs naive split: {results['sr_closure']['iqr_ratio']:.2f}")

        for res in ("low", "high"):
            mvp, tp, run_dir = train_pf(args.outdir, globs, args.pf_epochs, res)
            infer_pf(args.outdir, globs, mvp, tp, run_dir, res)

    for res in ("low", "high"):
        pred = os.path.join(args.outdir, f"pf_{res}", "pf_test_pred.h5")
        results[f"pf_{res}"] = evaluate(pred, globs["test"], res)

    lo, hi = results["pf_low"], results["pf_high"]
    results["comparison"] = {
        "cardinality_accuracy": {"low": lo["cardinality_accuracy"], "high": hi["cardinality_accuracy"]},
        "eta_iqr_ratio_low_over_high": lo["residual_iqr"]["eta"] / hi["residual_iqr"]["eta"],
        "phi_iqr_ratio_low_over_high": lo["residual_iqr"]["phi"] / hi["residual_iqr"]["phi"],
        "pt_iqr_ratio_low_over_high": lo["residual_iqr"]["pt_rel"] / hi["residual_iqr"]["pt_rel"],
        "incidence_mae": {"low": lo.get("incidence_mae"), "high": hi.get("incidence_mae")},
        "best_val_loss": {"low": lo.get("best_val_loss_to_optimize_on"),
                          "high": hi.get("best_val_loss_to_optimize_on")},
    }
    results["generator"] = GEN
    results["gate_hr_beats_lr"] = bool(
        hi.get("incidence_mae", np.inf) < lo.get("incidence_mae", np.inf)
        and hi["residual_iqr"]["eta"] < lo["residual_iqr"]["eta"]
        and hi["residual_iqr"]["phi"] < lo["residual_iqr"]["phi"]
    )
    out_path = os.path.join(args.outdir, "closure_pf_hr_vs_lr.json")
    json.dump(results, open(out_path, "w"), indent=2)
    print(json.dumps(results, indent=2, default=float))
    print(f"[closure-pf-hr-vs-lr] wrote {out_path}")


if __name__ == "__main__":
    main()
