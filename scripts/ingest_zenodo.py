"""Scripted ingestion of the reference's published datasets (zenodo 15582324).

The reference trains on two COCOA samples published at
https://zenodo.org/records/15582324 (reference README.md:7): single-electron
and multi-particle, each a {train,val,test}.root triplet with
Low_Tree/High_Tree cell branches (+ particle branches on the multipart
sample; reference dataset.py:26-95).  This container has zero egress, so the
drill is: the moment someone drops those files into a directory, this script
turns them into validated, config-wired training runs targeting the
reference's shipped val losses — with no new code (VERDICT r2 item 8).

Usage:
    python scripts/ingest_zenodo.py --data-dir /path/to/downloads \
        [--convert-h5] [--configs-out configs/real] [--check-only]

Steps performed per discovered split file:
  1. schema validation: tree presence, required cell/particle branches,
     entry counts, reorder-map + res_factor consistency on a sample event,
     MeV unit sanity (median cell energy);
  2. optional .root -> .h5 container conversion (needs uproot; the HDF5
     container is the faster repeated-read path on TPU hosts);
  3. emit config pairs cloned from the shipped reference-parity configs with
     all data paths substituted, plus the exact launch commands.

Reference targets the emitted runs aim at (SURVEY.md §6 / reference
saved_checkpoints):
  SR single_e   val NN-MSE 3.88   (saved_checkpoints/single_e)
  SR multipart  val NN-MSE 3.58   (saved_checkpoints/multipart)
  PF low-res    val 0.4034        (saved_checkpoints/pf_lr)
  PF high-res   val 0.3318        (saved_checkpoints/pf_hr)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from superresolutionhep_tpu.data import root_io

CELL_VARS = ["cell_eta", "cell_phi", "cell_layer", "cell_e", "cell_x", "cell_y", "cell_z"]
SPLITS = ("train", "val", "test")

TARGETS = {
    "single_e": {"val_nn_mse": 3.88, "checkpoint": "saved_checkpoints/single_e"},
    "multipart": {"val_nn_mse": 3.58, "checkpoint": "saved_checkpoints/multipart"},
    "pf_lr": {"val_loss": 0.4034, "checkpoint": "saved_checkpoints/pf_lr"},
    "pf_hr": {"val_loss": 0.3318, "checkpoint": "saved_checkpoints/pf_hr"},
}


def discover(data_dir: str) -> dict:
    """Find {dataset: {split: path}} among common zenodo layout variants."""
    found: dict = {}
    for ds in ("single_e", "multipart"):
        for split in SPLITS:
            cands = []
            for ext in (".root", ".h5", ".hdf5"):
                cands += glob.glob(os.path.join(data_dir, ds, split + ext))
                cands += glob.glob(os.path.join(data_dir, f"{ds}_{split}" + ext))
                cands += glob.glob(os.path.join(data_dir, "**", ds, split + ext), recursive=True)
            if cands:
                found.setdefault(ds, {})[split] = sorted(cands)[0]
    return found


def validate(path: str, dataset: str) -> dict:
    """Schema + physics sanity checks on one split file; returns a report.

    Never raises: a malformed file (missing tree/branch, unreadable blob)
    is exactly what this classifier exists to report, so any exception from
    the checks becomes a failed ``readable`` check instead of aborting the
    whole ingest run."""
    report = {"path": path, "ok": True, "checks": {}, "n_entries": 0}

    def check(name, cond, detail=""):
        report["checks"][name] = {"ok": bool(cond), "detail": str(detail)}
        report["ok"] = report["ok"] and bool(cond)

    try:
        _validate_checks(path, dataset, report, check)
    except Exception as e:
        check("readable", False, f"{type(e).__name__}: {e}")
    return report


def _validate_checks(path: str, dataset: str, report: dict, check) -> None:
    n_low = root_io.num_entries(path, "Low_Tree")
    n_high = root_io.num_entries(path, "High_Tree")
    check("entries_match", n_low == n_high, f"low={n_low} high={n_high}")
    check("nonempty", n_low > 0, n_low)

    low = root_io.read_tree(path, "Low_Tree", CELL_VARS + ["high_cell_to_low_cell_edge"],
                            entry_start=0, entry_stop=min(8, n_low))
    high = root_io.read_tree(path, "High_Tree", CELL_VARS, entry_start=0, entry_stop=min(8, n_low))
    for v in CELL_VARS:
        check(f"low_has_{v}", v in low)
        check(f"high_has_{v}", v in high)

    # reorder map: one entry per HR cell, indices within range
    rmap = low["high_cell_to_low_cell_edge"][0]
    nh0 = len(high["cell_e"][0])
    check("reorder_len", len(rmap) == nh0, f"map={len(rmap)} hr_cells={nh0}")
    check("reorder_range", len(rmap) == 0 or (np.min(rmap) >= 0 and np.max(rmap) < nh0),
          f"[{np.min(rmap)},{np.max(rmap)}] vs {nh0}")

    # MeV units on disk: median nonzero ECAL cell energy for a >=1 GeV shower
    e = np.concatenate([np.asarray(high["cell_e"][i]) for i in range(len(high["cell_e"]))])
    e = e[e > 0]
    check("mev_scale", e.size and 1.0 < np.median(e) < 1.0e5,
          f"median cell_e = {np.median(e) if e.size else 'n/a'} (expect MeV)")

    if dataset == "multipart":
        part = root_io.read_tree(path, "Low_Tree", ["particle_pt", "particle_eta", "particle_phi"],
                                 entry_start=0, entry_stop=min(8, n_low))
        check("particle_branches", all(k in part for k in ("particle_pt", "particle_eta", "particle_phi")))
        inc = root_io.read_tree(path, "High_Tree", ["particle_to_node_idx", "particle_to_node_weight"],
                                entry_start=0, entry_stop=min(8, n_low))
        check("incidence_branches",
              "particle_to_node_idx" in inc and "particle_to_node_weight" in inc)

    report["n_entries"] = int(n_low)


def convert_h5(src: str, dst: str):
    """ROOT -> HDF5 container conversion through the common IO layer."""
    trees = {}
    for tree in ("Low_Tree", "High_Tree"):
        trees[tree] = root_io.read_tree(src, tree)
    try:
        trees["Particle_Tree"] = root_io.read_tree(src, "Particle_Tree")
    except Exception:
        pass  # single_e files may not carry a particle tree
    root_io.write_trees(dst, trees)


def emit_configs(found: dict, configs_out: str, repo_root: str) -> list:
    """Clone the shipped reference-parity config pairs with real paths."""
    cmds = []
    for ds, splits in found.items():
        if not all(s in splits for s in ("train", "val")):
            continue
        src_dir = os.path.join(repo_root, "configs", ds)
        out_dir = os.path.join(configs_out, ds)
        os.makedirs(out_dir, exist_ok=True)
        for name in ("model_and_var.yml", "train.yml"):
            cfg = yaml.safe_load(open(os.path.join(src_dir, name)))
            if name == "train.yml":
                cfg["train_path"] = splits["train"]
                cfg["val_path"] = splits["val"]
                cfg["base_root_dir"] = os.path.join("runs", f"real_{ds}")
            yaml.safe_dump(cfg, open(os.path.join(out_dir, name), "w"), sort_keys=False)
        tgt = TARGETS[ds]
        cmds.append(
            f"python train.py -cmv {out_dir}/model_and_var.yml -ct {out_dir}/train.yml"
            f"   # target val NN-MSE {tgt['val_nn_mse']} (reference {tgt['checkpoint']})"
        )
        if "test" in splits:
            inf = yaml.safe_load(open(os.path.join(src_dir, "inference_batch.yml"))) \
                if os.path.exists(os.path.join(src_dir, "inference_batch.yml")) else None
            if inf is not None:
                for entry in inf.get("datasets", inf if isinstance(inf, list) else []):
                    if isinstance(entry, dict) and "truth_path" in entry:
                        entry["truth_path"] = splits.get(
                            os.path.basename(str(entry["truth_path"])).split(".")[0], splits["test"])
                yaml.safe_dump(inf, open(os.path.join(out_dir, "inference_batch.yml"), "w"),
                               sort_keys=False)
    if "multipart" in found:
        cmds.append("# then: SR batch inference over train/val/test -> PF training at "
                    "resolution low (target 0.4034) and high (target 0.3318), as in "
                    "scripts/closure_pf_hr_vs_lr.py but pointed at runs/real_multipart")
    return cmds


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data-dir", required=True, help="directory holding the zenodo download")
    ap.add_argument("--configs-out", default="configs/real")
    ap.add_argument("--convert-h5", action="store_true",
                    help="convert .root splits to the HDF5 container (needs uproot)")
    ap.add_argument("--check-only", action="store_true", help="validate schema, emit nothing")
    args = ap.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    found = discover(args.data_dir)
    if not found:
        print(f"[ingest] no single_e/multipart split files found under {args.data_dir}")
        print("         expected <dir>/{single_e,multipart}/{train,val,test}.root "
              "(or .h5 container files)")
        sys.exit(2)

    reports = {}
    for ds, splits in found.items():
        for split, path in splits.items():
            if path.endswith(".root") and not root_io.HAVE_UPROOT:
                print(f"[ingest] {ds}/{split}: {path} is ROOT but uproot is not installed; "
                      "install uproot+awkward or pre-convert to .h5")
                reports[f"{ds}/{split}"] = {"path": path, "ok": False,
                                            "checks": {"uproot_available": {"ok": False}}}
                continue
            rep = validate(path, ds)
            reports[f"{ds}/{split}"] = rep
            status = "OK" if rep["ok"] else "FAIL"
            print(f"[ingest] {ds}/{split}: {status} ({rep.get('n_entries', '?')} events) {path}")
            for cname, c in rep["checks"].items():
                if not c["ok"]:
                    print(f"         FAIL {cname}: {c['detail']}")

    if args.convert_h5:
        for ds, splits in found.items():
            for split, path in list(splits.items()):
                if path.endswith(".root"):
                    dst = os.path.splitext(path)[0] + ".h5"
                    print(f"[ingest] converting {path} -> {dst}")
                    convert_h5(path, dst)
                    splits[split] = dst

    report_path = os.path.join(args.data_dir, "ingest_report.json")
    try:
        json.dump(reports, open(report_path, "w"), indent=2)
        print(f"[ingest] wrote {report_path}")
    except OSError:
        pass

    if args.check_only:
        sys.exit(0 if all(r["ok"] for r in reports.values()) else 1)

    cmds = emit_configs(found, args.configs_out, repo_root)
    print("\n[ingest] configs written under", args.configs_out)
    print("[ingest] launch sequence:")
    for c in cmds:
        print("   ", c)
    sys.exit(0 if all(r["ok"] for r in reports.values()) else 1)


if __name__ == "__main__":
    main()
