"""Full CLI surface smoke test: train.py -> inference.py (batch mode) ->
train_pf.py -> inference_pf.py as subprocesses on tiny synthetic data —
the complete reference workflow driven through the compatible CLIs."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from superresolutionhep_tpu.data.synthetic import GeneratorConfig, write_synthetic_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args, **kw):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env, capture_output=True, text=True, timeout=900, **kw
    )


@pytest.mark.slow
def test_full_cli_workflow(tmp_path):
    gen = GeneratorConfig(single_electron=False, max_particles=3, window_lr_cells=1)
    train = write_synthetic_file(str(tmp_path / "train.h5"), 6, seed=0, config=gen)
    val = write_synthetic_file(str(tmp_path / "val.h5"), 4, seed=1, config=gen)

    from test_flow_model import small_flow_config

    config_mv = {
        "graph_building": "all2all",
        "res_factor": 2,
        "flow_model": small_flow_config("DiT"),
        "var_transform": {
            "eta": {"transformation": None, "scale_mode": "min_max", "min": -2.988, "max": 2.988, "range": [-1, 1]},
            "e": {"transformation": "pow(x,m)", "m": 0.2, "scale_mode": "standard"},
        },
        "target_transform": {
            "transformation": "logit_ratio", "f": 1.2, "alpha": 1.0e-6,
            "scale_mode": "standard", "mean": -1.1424768, "std": 3.616942,
        },
    }
    config_t = {
        "num_epochs": 1, "eval_every_n_epoch": 1,
        "batch_size_train": 4, "batch_size_val": 4, "bucket_quantum": 64,
        "learningrate": 1.0e-3, "lr_scheduler": None,
        "train_path": train, "val_path": val,
        "reduce_ds_train": -1, "reduce_ds_val": -1,
        "one_event_train": False, "one_event_idx": 0,
        "val_ode_method": "midpoint", "n_event_displays": 0,
        "base_root_dir": str(tmp_path / "runs"), "project_name": "sr", "run_name": "t",
    }
    mv_path = str(tmp_path / "mv.yml")
    t_path = str(tmp_path / "t.yml")
    yaml.safe_dump(config_mv, open(mv_path, "w"))
    yaml.safe_dump(config_t, open(t_path, "w"))

    # ---- stage 1 training ------------------------------------------------
    r = run(["train.py", "-cmv", mv_path, "-ct", t_path, "-d", "--device", "cpu"])
    assert r.returncode == 0, r.stderr[-3000:]
    run_dir = tmp_path / "runs" / "sr_t"
    assert (run_dir / "metrics.jsonl").exists()

    # ---- stage 1 inference, batch mode ------------------------------------
    inf_cfg = {
        "dataset": "single_e", "batch_size": 4, "max_particles": 4,
        "model": {
            "config_path_mv": mv_path, "config_path_t": t_path,
            "checkpoint_path": str(run_dir / "checkpoints"),
            "n_steps": 4, "n_steps_to_store": 2,
        },
        "inf_dict": {
            "n_ensemble": 2, "save_ensemble_components": True,
            "store_energy_incidence": True, "truth_path": val,
            "dir_flag": "smoke", "ode_method": "midpoint",
        },
    }
    inf_path = str(tmp_path / "inf.yml")
    yaml.safe_dump(inf_cfg, open(inf_path, "w"))
    r = run(["inference.py", "-i", inf_path, "-bm", "-estart", "0", "-estop", "4"])
    assert r.returncode == 0, r.stderr[-3000:]
    pred_glob = str(tmp_path / "inference" / "smoke" / "val_pred_*_*.h5")
    import glob as _g

    preds = _g.glob(pred_glob)
    assert len(preds) == 1, (pred_glob, r.stdout[-500:])

    # ---- stage 2 training --------------------------------------------------
    from test_pf_pipeline import pf_config_mv

    cfg_pf_mv = pf_config_mv()
    cfg_pf_mv["pf_model"]["max_particles"] = 4
    cfg_pf_t = {
        "num_epochs": 1, "eval_every_n_epoch": 1,
        "batch_size_train": 4, "batch_size_val": 4, "bucket_quantum": 64,
        "learningrate": 1.0e-3, "lr_scheduler": None,
        "energy_threshold": 1.0, "resolution": "low",
        "loss_on_inc_wts": True, "card_loss_weight": 0.5,
        "train_glob_arg": pred_glob, "val_glob_arg": pred_glob,
        "reduce_ds_train": -1, "reduce_ds_val": -1,
        "base_root_dir": str(tmp_path / "runs"), "project_name": "pf", "run_name": "t",
    }
    pf_mv_path = str(tmp_path / "pf_mv.yml")
    pf_t_path = str(tmp_path / "pf_t.yml")
    yaml.safe_dump(cfg_pf_mv, open(pf_mv_path, "w"))
    yaml.safe_dump(cfg_pf_t, open(pf_t_path, "w"))
    r = run(["train_pf.py", "-cmv", pf_mv_path, "-ct", pf_t_path, "-d", "--device", "cpu"])
    assert r.returncode == 0, r.stderr[-3000:]
    pf_run = tmp_path / "runs" / "pf_t"
    assert (pf_run / "metrics.jsonl").exists()

    # ---- stage 2 inference --------------------------------------------------
    pf_inf = {
        "batch_size": 4,
        "model": {
            "config_path_mv": pf_mv_path, "config_path_t": pf_t_path,
            "checkpoint_path": str(pf_run / "checkpoints"),
        },
        "items": [
            {"info": "smoke", "run_pred": True, "store_inc_wt": True,
             "glob_arg": pred_glob, "pred_path": str(tmp_path / "pf_pred.h5"),
             "reduce_ds": -1}
        ],
    }
    pf_inf_path = str(tmp_path / "pf_inf.yml")
    yaml.safe_dump(pf_inf, open(pf_inf_path, "w"))
    r = run(["inference_pf.py", "-i", pf_inf_path])
    assert r.returncode == 0, r.stderr[-3000:]

    from superresolutionhep_tpu.data import root_io

    tree = root_io.read_tree(str(tmp_path / "pf_pred.h5"), "Particle_Tree")
    assert "pred_pt_raw" in tree and "pred_card" in tree
    assert len(np.asarray(tree["pred_card"])) == 4
