"""Real-data readiness drill: the zenodo ingestion path works end-to-end on
the HDF5 container (the backend available in this image), so a zenodo-15582324
data drop turns into validated configs with zero new code (VERDICT r2 item 8).
The .root leg of the same path is covered by test_root_io_uproot.py when
uproot is present."""

import os
import subprocess
import sys

import numpy as np
import yaml

from superresolutionhep_tpu.data.synthetic import GeneratorConfig, write_synthetic_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_layout(tmp_path, multipart=False):
    ds = "multipart" if multipart else "single_e"
    d = os.path.join(tmp_path, ds)
    os.makedirs(d, exist_ok=True)
    cfg = GeneratorConfig(single_electron=not multipart)
    for i, split in enumerate(("train", "val", "test")):
        write_synthetic_file(os.path.join(d, f"{split}.h5"), 4, seed=10 + i, config=cfg)
    return d


def test_ingest_validates_and_emits_configs(tmp_path):
    _make_layout(tmp_path, multipart=False)
    _make_layout(tmp_path, multipart=True)
    configs_out = os.path.join(tmp_path, "configs_real")

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ingest_zenodo.py"),
         "--data-dir", str(tmp_path), "--configs-out", configs_out],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "single_e/train: OK" in proc.stdout
    assert "multipart/train: OK" in proc.stdout

    # config pairs cloned with real paths substituted
    for ds in ("single_e", "multipart"):
        tr = yaml.safe_load(open(os.path.join(configs_out, ds, "train.yml")))
        assert tr["train_path"] == os.path.join(str(tmp_path), ds, "train.h5")
        assert tr["val_path"] == os.path.join(str(tmp_path), ds, "val.h5")
        mv = yaml.safe_load(open(os.path.join(configs_out, ds, "model_and_var.yml")))
        assert "flow_model" in mv
    assert "train.py -cmv" in proc.stdout

    report = os.path.join(str(tmp_path), "ingest_report.json")
    assert os.path.exists(report)


def test_ingest_flags_broken_schema(tmp_path):
    """A file with a corrupted reorder map must FAIL validation loudly."""
    import h5py

    d = _make_layout(tmp_path, multipart=False)
    path = os.path.join(d, "train.h5")
    with h5py.File(path, "r+") as f:
        flat = f["Low_Tree/high_cell_to_low_cell_edge/flat"]
        flat[0] = 10 ** 6  # out-of-range HR index

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ingest_zenodo.py"),
         "--data-dir", str(tmp_path), "--check-only"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert proc.returncode == 1, proc.stdout + proc.stderr
    assert "FAIL reorder_range" in proc.stdout
