"""End-to-end stage-1 -> stage-2 chain on synthetic data:
SR inference writes chunked three-tree files; the PF dataset consumes them;
the PF trainer runs an epoch with on-device Hungarian matching."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolutionhep_tpu.data.pf_dataset import PflowEvents, collate_pf
from superresolutionhep_tpu.data.synthetic import GeneratorConfig, write_synthetic_file
from superresolutionhep_tpu.inference.sr import SRInference
from superresolutionhep_tpu.models.pf.model_pf import SAPF
from superresolutionhep_tpu.train.pf_trainer import PFTrainer
from superresolutionhep_tpu.transforms import build_var_transforms

from test_flow_model import small_flow_config
from test_sr_trainer import make_configs


def pf_config_mv():
    return {
        "pf_model": {
            "init_weights": {"all_linear": "xavier_uniform", "layer_emb_table": "normal", "ln_modulation": "zero"},
            "h_dim": 32,
            "max_particles": 4,
            "encoder": {
                "layer_emb_dim": 4,
                "transformer": {
                    "type": "DiT", "num_heads": 4, "num_transformer_layers": 2,
                    "dense_config": {"hidden_layers": [32], "activation": "LeakyReLU", "final_activation": None,
                                      "norm_layer": "LayerNorm", "norm_final_layer": False, "dropout": 0.0,
                                      "context_size": 0},
                    "context_size": 32,
                },
            },
            "cardinality_predictor": {
                "input_size": 32, "output_size": None, "hidden_layers": [32, 16],
                "activation": "LeakyReLU", "final_activation": None,
                "norm_layer": "LayerNorm", "norm_final_layer": False, "dropout": 0.0,
            },
            "kinematics_predictor": {
                "init_particles": {"type": "embedding", "embedding_dim": 4},
                "transformer": {
                    "type": "DiT", "num_heads": 4, "num_transformer_layers": 2,
                    "dense_config": {"hidden_layers": [32], "activation": "LeakyReLU", "final_activation": None,
                                      "norm_layer": "LayerNorm", "norm_final_layer": False, "dropout": 0.0},
                    "context_size": 32,
                },
                "use_attn_kinematics": True,
            },
        },
        "var_transform": {
            "eta": {"transformation": None, "scale_mode": "min_max", "min": -2.988, "max": 2.988, "range": [-1, 1]},
            "e": {"transformation": "pow(x,m)", "m": 0.5, "scale_mode": "standard", "mean": 7.35, "std": 15.65},
            "pt": {"transformation": "pow(x,m)", "m": 0.5, "scale_mode": "standard", "mean": 7.35, "std": 15.65},
        },
    }


@pytest.fixture(scope="module")
def sr_pred_files(tmp_path_factory):
    """Run tiny SR inference over two chunks of a synthetic file."""
    d = tmp_path_factory.mktemp("chain")
    gen = GeneratorConfig(max_particles=4, window_lr_cells=1)
    truth = write_synthetic_file(str(d / "test.h5"), n_events=8, seed=3, config=gen)

    config_mv, config_t = make_configs(truth, truth, str(d / "run"))
    import yaml

    os.makedirs(d / "saved", exist_ok=True)
    mv_path, t_path = str(d / "saved" / "config_mv.yml"), str(d / "saved" / "config_t.yml")
    yaml.safe_dump(config_mv, open(mv_path, "w"))
    yaml.safe_dump(config_t, open(t_path, "w"))

    # random-weight model: build params via SRTrainer init path
    from superresolutionhep_tpu.train.sr_trainer import SRTrainer

    trainer = SRTrainer(config_mv, config_t, run_dir=str(d / "run"), seed=0)

    inf_cfg = {
        "model": {
            "config_path_mv": mv_path, "config_path_t": t_path,
            "checkpoint_path": None, "n_steps": 5, "n_steps_to_store": 2,
        }
    }
    inf = SRInference(inf_cfg, params=trainer.state.params)

    paths = []
    for start, stop in [(0, 4), (4, 8)]:
        pred_path = str(d / f"test_pred_{start}_{stop}.h5")
        inf.run_pred(
            {
                "truth_path": truth, "pred_path": pred_path,
                "entry_start": start, "n_events": stop - start,
                "n_ensemble": 2, "batch_size": 4, "ode_method": "midpoint",
                "save_ensemble_components": True,
                "store_energy_incidence": True, "max_particles": 4,
            }
        )
        paths.append(pred_path)
    return str(d / "test_pred_*_*.h5"), paths


def test_sr_inference_output_schema(sr_pred_files):
    glob_arg, paths = sr_pred_files
    from superresolutionhep_tpu.data import root_io

    high = root_io.read_tree(paths[0], "High_Tree")
    for key in ["eta_raw", "phi", "layer", "e_pred_raw", "e_pred_avg_raw", "raw_nn_pred",
                "e_truth_raw", "e_proxy_raw", "e_proxy", "raw_nn_cond", "raw_nn_target",
                "e_pred_raw_comp_0", "e_part_0", "e_part_3"]:
        assert key in high, f"missing branch {key}"
    # stored intermediate timesteps exist (n_steps=5, store 2 -> t=0.00, 0.50)
    assert any(k.startswith("e_pred_raw_0.") for k in high)
    low = root_io.read_tree(paths[0], "Low_Tree")
    assert "e_meas_raw" in low and "e_part_0" in low
    part = root_io.read_tree(paths[0], "Particle_Tree")
    assert len(part["particle_pt"]) == 4
    # MeV units on disk: raw energies scaled by 1e3 vs GeV internals
    assert np.asarray(high["e_truth_raw"][0]).max() > 10.0


def test_pf_dataset_reads_chunks(sr_pred_files):
    glob_arg, _ = sr_pred_files
    ds = PflowEvents(glob_arg, pf_config_mv(), energy_threshold=1.0, res="low", load_incidence=True)
    assert len(ds) == 8
    ev = ds.get_event(0)
    assert ev["cell_e_raw"].min() > 1.0  # threshold cut
    assert ev["incidence_matrix"].shape[1] == 4
    rs = ev["incidence_matrix"].sum(1)
    assert np.all((np.abs(rs - 1) < 1e-5) | (rs == 0))
    # high-res variant reads e_pred_raw
    ds_hr = PflowEvents(glob_arg, pf_config_mv(), energy_threshold=1.0, res="high")
    assert len(ds_hr) == 8
    assert ds_hr.cell_count[0] > 0


def test_sapf_forward_and_cardinality_gating(sr_pred_files):
    glob_arg, _ = sr_pred_files
    cfg = pf_config_mv()
    ds = PflowEvents(glob_arg, cfg, energy_threshold=1.0, res="low", load_incidence=True)
    events = [ds.get_event(i) for i in range(4)]
    batch_np = collate_pf(events, pad_n=128, max_part=4)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items() if k != "idx"}

    transforms = build_var_transforms(cfg["var_transform"])
    model = SAPF(config_pf=cfg["pf_model"], transforms=transforms, attn_impl="xla")
    variables = model.init(jax.random.PRNGKey(0), batch)
    logits, kin, inc = model.apply(variables, batch)
    assert logits.shape == (4, 5)
    assert kin.shape == (4, 4, 4)
    assert inc.shape == (4, 4, 128)
    # inc weights: per-cell distribution over particles sums to 1 on valid cells
    s = np.asarray(inc.sum(1))
    valid = np.asarray(batch["cell_mask"])
    np.testing.assert_allclose(s[valid], 1.0, rtol=1e-4)

    model_inf = SAPF(config_pf=cfg["pf_model"], transforms=transforms, inference=True, attn_impl="xla")
    logits2, kin2, inc2 = model_inf.apply(variables, batch)
    assert kin2.shape == (4, 4, 4)


def test_sapf_fused_prologue_parity(sr_pred_files):
    """SAPF(fused_prologue=True) — the PFInference default — must match the
    unfused model on identical params (kernel parity lives in
    tests/test_fused_{qkv,mlp}.py; this pins the PF-stack plumbing)."""
    glob_arg, _ = sr_pred_files
    cfg = pf_config_mv()
    ds = PflowEvents(glob_arg, cfg, energy_threshold=1.0, res="low", load_incidence=True)
    events = [ds.get_event(i) for i in range(4)]
    batch_np = collate_pf(events, pad_n=128, max_part=4)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items() if k != "idx"}
    transforms = build_var_transforms(cfg["var_transform"])

    kw = dict(config_pf=cfg["pf_model"], transforms=transforms, inference=True, attn_impl="flash")
    model = SAPF(**kw)
    model_f = SAPF(**kw, fused_prologue=True)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    out_f = model_f.apply(variables, batch)
    for a, b in zip(out, out_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-3)


def test_pf_training_epoch(sr_pred_files, tmp_path):
    glob_arg, _ = sr_pred_files
    cfg_mv = pf_config_mv()
    cfg_t = {
        "num_epochs": 1,
        "eval_every_n_epoch": 1,
        "batch_size_train": 4,
        "batch_size_val": 4,
        "bucket_quantum": 64,
        "learningrate": 1.0e-3,
        "lr_scheduler": None,
        "energy_threshold": 1.0,
        "resolution": "low",
        "loss_on_inc_wts": True,
        "card_loss_weight": 0.5,
        "train_glob_arg": glob_arg,
        "val_glob_arg": glob_arg,
        "reduce_ds_train": -1,
        "reduce_ds_val": -1,
    }
    trainer = PFTrainer(cfg_mv, cfg_t, run_dir=str(tmp_path / "pf_run"), seed=0)
    state = trainer.fit()
    assert state.epoch == 1
    import json

    lines = [json.loads(l) for l in open(tmp_path / "pf_run" / "metrics.jsonl")]
    rec = lines[-1]
    assert "val_loss_to_optimize_on" in rec
    assert np.isfinite(rec["train/loss"])
    assert "val/card_accuracy" in rec


def test_pf_training_kinematics_loss_variant(sr_pred_files, tmp_path):
    """The non-incidence set-to-set loss path (loss_on_inc_wts: false) with
    the reference's component weights (pflow/configs/train.yml comments)."""
    glob_arg, _ = sr_pred_files
    cfg_mv = pf_config_mv()
    cfg_t = {
        "num_epochs": 1,
        "eval_every_n_epoch": 1,
        "batch_size_train": 4,
        "batch_size_val": 4,
        "bucket_quantum": 64,
        "learningrate": 1.0e-3,
        "lr_scheduler": None,
        "energy_threshold": 1.0,
        "resolution": "low",
        "loss_on_inc_wts": False,
        "card_loss_weight": 0.5,
        "pt_loss_wt": 0.0,
        "eta_loss_wt": 500.0,
        "phi_loss_wt": 5.0,
        "e_loss_wt": 1.0,
        "train_glob_arg": glob_arg,
        "val_glob_arg": glob_arg,
        "reduce_ds_train": -1,
        "reduce_ds_val": -1,
        "epoch_end_plots": False,
    }
    trainer = PFTrainer(cfg_mv, cfg_t, run_dir=str(tmp_path / "pf_kin"), seed=0)
    state = trainer.fit()
    assert state.epoch == 1
    import json

    rec = [json.loads(l) for l in open(tmp_path / "pf_kin" / "metrics.jsonl")][-1]
    assert "train/kin_loss" in rec and np.isfinite(rec["train/kin_loss"])
    assert "train/eta_loss" in rec


def test_pf_resume_from_checkpoint(sr_pred_files, tmp_path):
    """PF fit(resume=True): a fresh trainer on the same run dir restores the
    last checkpoint, re-places it on the mesh (committed single-device
    arrays from orbax conflict with the data-sharded batch in jit), and
    trains only the remaining epochs."""
    glob_arg, _ = sr_pred_files
    cfg_mv = pf_config_mv()
    cfg_t = {
        "num_epochs": 1,
        "eval_every_n_epoch": 1,
        "batch_size_train": 4,
        "batch_size_val": 4,
        "bucket_quantum": 64,
        "learningrate": 1.0e-3,
        "lr_scheduler": None,
        "energy_threshold": 1.0,
        "resolution": "low",
        "loss_on_inc_wts": True,
        "card_loss_weight": 0.5,
        "train_glob_arg": glob_arg,
        "val_glob_arg": glob_arg,
        "reduce_ds_train": -1,
        "reduce_ds_val": -1,
    }
    run = str(tmp_path / "pf_resume")
    t1 = PFTrainer(cfg_mv, cfg_t, run_dir=run, seed=0)
    s1 = t1.fit()
    assert s1.epoch == 1
    t1.ckpt.wait()

    t2 = PFTrainer(cfg_mv, dict(cfg_t, num_epochs=2), run_dir=run, seed=1)
    s2 = t2.fit(resume=True)
    assert s2.epoch == 2
    t2.ckpt.wait()
    assert t2.ckpt.latest_step() == 1
