import numpy as np
import pytest

from superresolutionhep_tpu.data.sr_dataset import SupResEvents
from superresolutionhep_tpu.data.synthetic import GeneratorConfig, write_synthetic_file
from superresolutionhep_tpu.train.schedule import warmup_cosine_epoch_schedule
from superresolutionhep_tpu.train.sr_trainer import SRTrainer

from test_flow_model import small_flow_config


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("srtrain")
    gen = GeneratorConfig(single_electron=True, window_lr_cells=1)
    train = write_synthetic_file(str(d / "train.h5"), n_events=8, seed=1, config=gen)
    val = write_synthetic_file(str(d / "val.h5"), n_events=4, seed=2, config=gen)
    return train, val, str(d / "run")


def make_configs(train, val, run):
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
        "num_epochs": 2,
        "eval_every_n_epoch": 1,
        "batch_size_train": 4,
        "batch_size_val": 4,
        "bucket_quantum": 64,
        "learningrate": 1.0e-3,
        "lr_scheduler": {
            "name": "CustomLRScheduler", "warm_start_epochs": 1, "cosine_epochs": 1,
            "eta_min": 1.0e-5, "last_epoch": -1, "max_epochs": "take_as_num_epochs",
        },
        "train_path": train,
        "val_path": val,
        "reduce_ds_train": -1,
        "reduce_ds_val": -1,
        "one_event_train": False,
        "one_event_idx": 0,
        "val_ode_method": "midpoint",
        "n_event_displays": 2,
    }
    return config_mv, config_t


def test_schedule_shape():
    lr = warmup_cosine_epoch_schedule(1e-3, 10, 80, eta_min=1e-5, max_epoch=100)
    assert lr(0) == pytest.approx(1e-5)
    assert lr(10) == pytest.approx(1e-3)  # end of warmup
    assert lr(90) == pytest.approx(1e-5)
    assert lr(99) == pytest.approx(1e-5)
    # fractional resolution
    lr2 = warmup_cosine_epoch_schedule(1e-3, 0.1, 0.8, eta_min=1e-5, max_epoch=100)
    assert lr2(10) == pytest.approx(1e-3)


def test_sr_training_two_epochs(paths):
    train, val, run = paths
    config_mv, config_t = make_configs(train, val, run)
    trainer = SRTrainer(config_mv, config_t, run_dir=run, seed=0)

    train_ds = SupResEvents(train, config_mv)
    val_ds = SupResEvents(val, config_mv)
    state = trainer.fit(train_ds, val_ds)
    assert state.epoch == 2

    # metrics written
    import json, os

    lines = [json.loads(l) for l in open(os.path.join(run, "metrics.jsonl"))]
    assert any("val/loss_raw" in l for l in lines)
    assert all(np.isfinite(l.get("train/loss", 0.0)) for l in lines)

    # checkpoints exist and can restore
    assert trainer.ckpt.latest_step() == 1
    restored = trainer.ckpt.restore(
        {"params": state.params, "opt_state": state.opt_state}, which="last"
    )
    leaves0 = [np.asarray(x) for x in __import__("jax").tree_util.tree_leaves(state.params)]
    leaves1 = [np.asarray(x) for x in __import__("jax").tree_util.tree_leaves(restored["params"])]
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_array_equal(a, b)


def test_nonfinite_diagnostics_dump(paths, tmp_path):
    """The non-finite abort must first write per-layer param/activation
    forensics (the reference's verbose re-forward, flow_model.py:176-262)."""
    import jax
    import jax.numpy as jnp
    import json

    train, val, _ = paths
    run = str(tmp_path / "nf_run")
    config_mv, config_t = make_configs(train, val, run)
    trainer = SRTrainer(config_mv, config_t, run_dir=run, seed=0)

    # poison one kernel so the very first forward goes non-finite
    def poison(tree):
        k = sorted(tree.keys())[0]
        sub = tree[k]
        if isinstance(sub, dict):
            poison(sub)
        else:
            tree[k] = jnp.full_like(sub, jnp.nan)

    params = jax.tree_util.tree_map(lambda x: x, trainer.state.params)  # copy
    import flax

    params = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") else params
    poison(params)
    trainer.state.params = params

    ds = SupResEvents(train, config_mv)
    with pytest.raises(FloatingPointError, match="diagnostics at"):
        trainer.fit(train_ds=ds, val_ds=None, num_epochs=1)

    path = run + "/nonfinite_diagnostics.json"
    import os

    assert os.path.exists(path)
    rep = json.load(open(path))
    assert "params" in rep and "activations" in rep
    # at least one captured activation must be flagged non-finite
    assert any(v.get("n_nonfinite", 0) > 0 for v in rep["activations"].values())


def test_resume_from_checkpoint(paths, tmp_path):
    """fit(resume=True) continues from the last checkpoint: a fresh trainer
    on the same run dir picks up params/opt_state and the epoch counter
    (train/sr_trainer.py fit), and a resumed fit on an already-complete run
    is a clean no-op — the contract the flap-tolerant TPU queue's closure
    legs rely on (scripts/tpu_queue_r3.sh retries a leg whose process died
    mid-training)."""
    import jax

    train, val, _ = paths
    run = str(tmp_path / "resume_run")
    config_mv, config_t = make_configs(train, val, run)
    config_t = dict(config_t, n_event_displays=0)
    ds, vds = SupResEvents(train, config_mv), SupResEvents(val, config_mv)

    t1 = SRTrainer(config_mv, config_t, run_dir=run, seed=0)
    s1 = t1.fit(ds, vds, num_epochs=1)
    assert s1.epoch == 1
    t1.ckpt.wait()

    # new process/trainer (different seed => different fresh init): resume
    # must restore epoch 0's checkpoint and train only the remaining epoch
    t2 = SRTrainer(config_mv, config_t, run_dir=run, seed=1)
    s2 = t2.fit(ds, vds, num_epochs=2, resume=True)
    assert s2.epoch == 2
    t2.ckpt.wait()
    assert t2.ckpt.latest_step() == 1

    # already complete: a further resumed fit is a no-op that leaves the
    # checkpointed params untouched
    t3 = SRTrainer(config_mv, config_t, run_dir=run, seed=2)
    s3 = t3.fit(ds, vds, num_epochs=2, resume=True)
    assert s3.epoch == 2
    restored = t3.ckpt.restore(
        {"params": s3.params, "opt_state": s3.opt_state}, which="last"
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s3.params),
        jax.tree_util.tree_leaves(restored["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sr_training_packed_mode(paths, tmp_path):
    """`packed: true` trains on segment-packed rows (one static shape,
    data/packing.py + the differentiable banded kernel): two epochs run,
    losses stay finite, checkpoints land — the packed training surface."""
    import json

    train, val, _ = paths
    run = str(tmp_path / "packed_run")
    config_mv, config_t = make_configs(train, val, run)
    config_t = dict(config_t, packed=True, pack_s=1024, pack_rows=8, n_event_displays=0)
    trainer = SRTrainer(config_mv, config_t, run_dir=run, seed=0)

    ds = SupResEvents(train, config_mv)
    vds = SupResEvents(val, config_mv)
    state = trainer.fit(ds, vds, num_epochs=2)
    assert state.epoch == 2

    lines = [json.loads(l) for l in open(run + "/metrics.jsonl")]
    assert len(lines) == 2
    assert all(np.isfinite(l["train/loss"]) for l in lines)
    assert any("val/loss_raw" in l for l in lines)

    # mesh-divisibility guard: pack_rows must shard evenly
    bad = dict(config_t, pack_rows=3)
    t2 = SRTrainer(config_mv, bad, run_dir=str(tmp_path / "bad"), seed=0)
    with pytest.raises(ValueError, match="multiple of the mesh"):
        t2.fit(ds, vds, num_epochs=1)


def test_sr_training_fused_packed_opt_in(paths, tmp_path):
    """`fused_prologue: true` + `packed: true` (the fused x packed training
    composition, ref-recompute VJP): one epoch runs with finite loss, and
    the flag reaches the model."""
    import json

    train, val, _ = paths
    run = str(tmp_path / "fused_packed_run")
    config_mv, config_t = make_configs(train, val, run)
    config_t = dict(
        config_t, packed=True, pack_s=1024, pack_rows=8,
        fused_prologue=True, n_event_displays=0,
    )
    trainer = SRTrainer(config_mv, config_t, run_dir=run, seed=0)
    assert trainer.model.fused_prologue is True

    ds = SupResEvents(train, config_mv)
    vds = SupResEvents(val, config_mv)
    state = trainer.fit(ds, vds, num_epochs=1)
    assert state.epoch == 1
    lines = [json.loads(l) for l in open(run + "/metrics.jsonl")]
    assert np.isfinite(lines[0]["train/loss"])
