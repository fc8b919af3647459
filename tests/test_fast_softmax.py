"""End-to-end test of the `fast_softmax` inference option: the no-max
clipped-softmax kernel path must validate itself on the first batch
(nomax_selfcheck) and produce the same prediction files as the robust
kernel.  Kernel-level parity/saturation coverage: test_flash_attention.py."""

import os

import numpy as np
import pytest
import yaml

from superresolutionhep_tpu.data import root_io
from superresolutionhep_tpu.data.synthetic import GeneratorConfig, write_synthetic_file
from superresolutionhep_tpu.inference.sr import SRInference


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from test_sr_trainer import make_configs
    from superresolutionhep_tpu.train.sr_trainer import SRTrainer

    d = tmp_path_factory.mktemp("fast_softmax")
    gen = GeneratorConfig(max_particles=2, window_lr_cells=1)
    truth = write_synthetic_file(str(d / "test.h5"), n_events=4, seed=9, config=gen)
    config_mv, config_t = make_configs(truth, truth, str(d / "run"))
    os.makedirs(d / "saved", exist_ok=True)
    mv_path, t_path = str(d / "saved" / "config_mv.yml"), str(d / "saved" / "config_t.yml")
    yaml.safe_dump(config_mv, open(mv_path, "w"))
    yaml.safe_dump(config_t, open(t_path, "w"))
    trainer = SRTrainer(config_mv, config_t, run_dir=str(d / "run"), seed=0)
    base_cfg = {
        "config_path_mv": mv_path, "config_path_t": t_path,
        "checkpoint_path": None, "n_steps": 4,
    }
    return d, truth, base_cfg, trainer.state.params


def _run(d, truth, base_cfg, params, fast, name):
    inf = SRInference({"model": dict(base_cfg, fast_softmax=fast)}, params=params)
    pred = str(d / f"{name}.h5")
    inf.run_pred({
        "truth_path": truth, "pred_path": pred, "n_ensemble": 2,
        "batch_size": 4, "ode_method": "midpoint",
    })
    return inf, pred


def test_fast_softmax_validates_and_matches(setup):
    d, truth, base_cfg, params = setup
    inf_fast, pred_fast = _run(d, truth, base_cfg, params, True, "pred_fast")
    assert inf_fast._nomax_validated
    # random-init weights keep logits far inside the clip bounds -> gate passes
    assert inf_fast.fast_softmax, "selfcheck unexpectedly rejected the no-max kernel"

    _, pred_robust = _run(d, truth, base_cfg, params, False, "pred_robust")
    a = root_io.read_tree(pred_fast, "High_Tree", ["e_pred_raw"])["e_pred_raw"]
    b = root_io.read_tree(pred_robust, "High_Tree", ["e_pred_raw"])["e_pred_raw"]
    for i in range(len(a)):
        np.testing.assert_allclose(np.asarray(a[i]), np.asarray(b[i]), rtol=1e-4, atol=1e-3)
