import os

import pytest
import yaml

from superresolutionhep_tpu.config import (
    FrozenConfig,
    deep_update,
    load_config_pair,
    resolve_threshold,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_shipped_configs_load():
    for pair in [("single_e", "single_e"), ("multipart", "multipart")]:
        mv, t = load_config_pair(
            os.path.join(REPO, "configs", pair[0], "model_and_var.yml"),
            os.path.join(REPO, "configs", pair[1], "train.yml"),
        )
        assert "flow_model" in mv and "var_transform" in mv and "target_transform" in mv
        assert mv["flow_model"]["transformer"]["type"] == "DiT"
        assert "learningrate" in t
    pf = yaml.safe_load(open(os.path.join(REPO, "configs", "pflow", "model_and_var.yml")))
    assert pf["pf_model"]["max_particles"] == 4


def test_resolve_threshold():
    # the reference eval()'s strings like "3520**2 * 6" (utility/sampler.py:18)
    assert resolve_threshold("3520**2 * 6") == 3520**2 * 6
    assert resolve_threshold(12345) == 12345
    assert resolve_threshold(None) is None
    with pytest.raises(ValueError):
        resolve_threshold("__import__('os').system('true')")


def test_deep_update_and_frozen():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    out = deep_update(base, {"a": {"b": 9}, "e": 4})
    assert out == {"a": {"b": 9, "c": 2}, "d": 3, "e": 4}
    assert base["a"]["b"] == 1  # no mutation

    f = FrozenConfig(base)
    assert f["a"]["b"] == 1
    assert f.get("missing", "x") == "x"
    with pytest.raises(TypeError):
        f["d"] = 5  # type: ignore[index]
