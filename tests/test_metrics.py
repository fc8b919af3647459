"""MetricsLogger sink tests, incl. the source-snapshot asset parity
(the reference uploads configs + the full source tree to Comet,
/root/reference/train.py:96-104; here the snapshot always lands in the run
dir and is attached to Comet only when available)."""

import json
import os
import zipfile

from superresolutionhep_tpu.train.metrics import MetricsLogger


def test_scalars_jsonl_and_metadata(tmp_path):
    m = MetricsLogger(str(tmp_path / "run"))
    m.log_scalars({"loss": 1.5, "skipme": "not-a-number"}, step=3, prefix="train/")
    m.close()
    rows = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert rows[0]["train/loss"] == 1.5 and rows[0]["step"] == 3
    assert "train/skipme" not in rows[0]
    meta = json.load(open(tmp_path / "run" / "run_metadata.json"))
    assert "argv" in meta


def test_snapshot_source(tmp_path):
    m = MetricsLogger(str(tmp_path / "run"))
    zp = m.snapshot_source({"train": {"num_epochs": 7}})
    m.close()
    assert os.path.exists(zp)
    with zipfile.ZipFile(zp) as zf:
        names = zf.namelist()
        # the framework package itself must be inside
        assert any(n.endswith("train/metrics.py") for n in names)
        assert any(n.endswith("models/flow_model.py") for n in names)
        # resolved configs recorded alongside the code
        assert "configs_resolved/train.yml" in names
        assert b"num_epochs: 7" in zf.read("configs_resolved/train.yml")
        # only source files — no checkpoints/fixtures dragged in
        assert all(n.endswith((".py", ".yml")) for n in names)
