"""End-to-end test of the segment-packed inference path (`model.packed`):
the packed run must produce the same prediction file contents as the
bucketed path — same events, same sampler, only the batch layout differs
(data/packing.py, ops/flash_packed.py; layout-equivalence at the model
level is covered by tests/test_packing.py)."""

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

    d = tmp_path_factory.mktemp("packed_inf")
    gen = GeneratorConfig(max_particles=2, window_lr_cells=1)
    truth = write_synthetic_file(str(d / "test.h5"), n_events=6, seed=9, config=gen)
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


def _run(d, truth, base_cfg, params, packed, name):
    inf = SRInference({"model": dict(base_cfg, packed=packed, pack_s=1024, pack_rows=2)}, params=params)
    pred = str(d / f"{name}.h5")
    inf.run_pred({
        "truth_path": truth, "pred_path": pred, "n_ensemble": 2,
        "batch_size": 4, "ode_method": "midpoint",
    })
    return pred


def test_packed_inference_matches_bucketed(setup):
    """Pass-through branches must agree EXACTLY (they expose any offset/
    ordering/slicing bug in the pack-unpack plumbing); predictions are
    checked for shape/finiteness only — the two paths draw different
    sampler noise by construction (per-batch keys, different layouts), and
    value-level packed==bucketed equivalence is already proven cell-for-cell
    at the model level in tests/test_packing.py."""
    d, truth, base_cfg, params = setup
    pred_packed = _run(d, truth, base_cfg, params, True, "pred_packed")
    pred_bucketed = _run(d, truth, base_cfg, params, False, "pred_bucketed")
    for branch in ("e_truth_raw", "e_proxy_raw", "eta_raw", "e_proxy"):
        a = root_io.read_tree(pred_packed, "High_Tree", [branch])[branch]
        b = root_io.read_tree(pred_bucketed, "High_Tree", [branch])[branch]
        assert len(a) == len(b) == 6
        for i in range(len(a)):
            np.testing.assert_array_equal(
                np.asarray(a[i]), np.asarray(b[i]), err_msg=f"{branch} event {i}"
            )
    for branch in ("e_pred_raw", "e_pred_avg_raw"):
        a = root_io.read_tree(pred_packed, "High_Tree", [branch])[branch]
        b = root_io.read_tree(pred_bucketed, "High_Tree", [branch])[branch]
        for i in range(len(a)):
            ai, bi = np.asarray(a[i]), np.asarray(b[i])
            assert ai.shape == bi.shape
            assert np.isfinite(ai).all()


def test_packed_oversize_events_route_to_bucketed(setup):
    """Events whose aligned length exceeds pack_s must fall through to the
    bucketed path (the data/packing.py contract) instead of aborting the
    run — the output file still contains every event with exact
    pass-through branches."""
    d, truth, base_cfg, params = setup
    counts = [len(np.asarray(e)) for e in root_io.read_tree(truth, "High_Tree", ["cell_e"])["cell_e"]]
    aligned = sorted(-(-c // 128) * 128 for c in counts)
    # a pack_s that fits the smallest events but not the largest ones
    # (fixture aligned sizes: [256, 256, 384, 512, 512, 512])
    pack_s = aligned[0]
    assert aligned[-1] > pack_s, "fixture must contain an oversize event"

    inf = SRInference(
        {"model": dict(base_cfg, packed=True, pack_s=pack_s, pack_rows=2)}, params=params
    )
    pred = str(d / "pred_mixed.h5")
    inf.run_pred({
        "truth_path": truth, "pred_path": pred, "n_ensemble": 2,
        "batch_size": 4, "ode_method": "midpoint",
    })
    # bucketed reference: the pass-through branches (post-ECAL-cut) must
    # agree exactly event-for-event regardless of which path carried them
    ref_pred = _run(d, truth, base_cfg, params, False, "pred_bucketed_mixed_ref")
    ref = root_io.read_tree(ref_pred, "High_Tree", ["e_truth_raw"])["e_truth_raw"]
    got = root_io.read_tree(pred, "High_Tree", ["e_truth_raw", "e_pred_raw"])
    assert len(got["e_truth_raw"]) == len(ref) == 6
    for i in range(len(ref)):
        np.testing.assert_array_equal(
            np.asarray(got["e_truth_raw"][i]), np.asarray(ref[i]),
            err_msg=f"event {i} misrouted or misordered",
        )
        assert np.isfinite(np.asarray(got["e_pred_raw"][i])).all()


def test_packed_fast_softmax_fused_composition(setup):
    """The expected-best production config — packed + fast_softmax (no-max
    clip) + fused DiT layer kernels — must pass the first-packed-batch
    selfcheck (robust unfused vs fused no-max on the SAME packed batch) and
    produce a complete, finite prediction file with exact pass-through
    branches."""
    d, truth, base_cfg, params = setup
    inf = SRInference(
        {"model": dict(base_cfg, packed=True, pack_s=1024, pack_rows=2,
                       fast_softmax=True)},
        params=params,
    )
    assert inf.model_fast is not None and inf.model_fast.fused_prologue
    pred = str(d / "pred_packed_fast.h5")
    inf.run_pred({
        "truth_path": truth, "pred_path": pred, "n_ensemble": 2,
        "batch_size": 4, "ode_method": "midpoint",
    })
    # the selfcheck must have validated (random init -> LN-bounded logits,
    # well inside the clip) rather than silently falling back
    assert inf._nomax_validated and inf.fast_softmax
    ref_pred = _run(d, truth, base_cfg, params, False, "pred_bucketed_fast_ref")
    ref = root_io.read_tree(ref_pred, "High_Tree", ["e_truth_raw"])["e_truth_raw"]
    got = root_io.read_tree(pred, "High_Tree", ["e_truth_raw", "e_pred_raw"])
    assert len(got["e_truth_raw"]) == len(ref) == 6
    for i in range(len(ref)):
        np.testing.assert_array_equal(
            np.asarray(got["e_truth_raw"][i]), np.asarray(ref[i]),
            err_msg=f"event {i}",
        )
        assert np.isfinite(np.asarray(got["e_pred_raw"][i])).all()
