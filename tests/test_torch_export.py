"""JAX -> Lightning-checkpoint export (tools/torch_export.py).

Three layers of evidence that exported checkpoints run under the
reference's own load path (inference.py:74-83 / inference_pf.py:75-84):

  1. self-contained: flax -> state_dict -> flax round-trips bitwise through
     the existing converter for both model families;
  2. the saved artifact is a loadable Lightning-shaped torch checkpoint;
  3. (when /root/reference is mounted) the shipped pf_lr checkpoint
     round-trips torch -> flax -> torch bitwise with the full original key
     set, and an exported SR state_dict strict-loads into the reference's
     actual FlowModel module.
"""

import os
import sys

import numpy as np
import pytest
import yaml

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
REF = "/root/reference"

sys.path.insert(0, HERE)


def _flow_setup(config_path):
    import jax
    import jax.numpy as jnp

    from superresolutionhep_tpu.models.flow_model import FlowModel

    cfg = yaml.safe_load(open(config_path))
    model = FlowModel(config=cfg["flow_model"], attn_impl="einsum")
    B, N = 2, 64
    batch = {
        "eta": jnp.zeros((B, N, 1)), "cosphi": jnp.ones((B, N, 1)),
        "sinphi": jnp.zeros((B, N, 1)), "layer": jnp.zeros((B, N, 1), jnp.int32),
        "e_proxy": jnp.zeros((B, N, 1)), "q_mask": jnp.ones((B, N), bool),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch, jnp.zeros((B, N, 1)), jnp.zeros((B,))
    )
    return cfg, params


def _leaves(tree):
    import jax.tree_util as jtu

    return {jtu.keystr(k): np.asarray(v) for k, v in jtu.tree_leaves_with_path(tree)}


def test_flow_export_roundtrip_bitwise():
    from superresolutionhep_tpu.tools.torch_convert import convert_flow_state_dict
    from superresolutionhep_tpu.tools.torch_export import export_flow_params

    cfg, params = _flow_setup(os.path.join(REPO, "configs/multipart/model_and_var.yml"))
    sd = export_flow_params(params, cfg["flow_model"])
    assert all(k.startswith("net.") for k in sd)
    tree2 = convert_flow_state_dict(sd, cfg["flow_model"])
    l1, l2 = _leaves(params["params"]), _leaves(tree2)
    assert set(l1) == set(l2)
    for k in l1:
        np.testing.assert_array_equal(l1[k].astype(np.float32), l2[k])


def test_pf_export_roundtrip_bitwise():
    import jax
    import jax.numpy as jnp

    from superresolutionhep_tpu.models.pf.model_pf import SAPF
    from superresolutionhep_tpu.tools.torch_convert import convert_pf_state_dict
    from superresolutionhep_tpu.tools.torch_export import export_pf_params
    from superresolutionhep_tpu.transforms import build_var_transforms
    from test_pf_pipeline import pf_config_mv

    cfg = pf_config_mv()
    model = SAPF(
        config_pf=cfg["pf_model"],
        transforms=build_var_transforms(cfg["var_transform"]),
        attn_impl="xla",
    )
    B, N, P = 2, 32, cfg["pf_model"]["max_particles"]
    z = lambda *s: jnp.zeros(s, jnp.float32)  # noqa: E731
    batch = {
        "cell_e": z(B, N), "cell_eta": z(B, N), "cell_phi": z(B, N),
        "cell_cosphi": z(B, N), "cell_sinphi": z(B, N),
        "cell_e_raw": z(B, N), "cell_eta_raw": z(B, N),
        "cell_layer": jnp.zeros((B, N), jnp.int32),
        "cell_mask": jnp.ones((B, N), bool),
        "part_pt": z(B, P), "part_eta": z(B, P), "part_phi": z(B, P),
        "part_dep_e": z(B, P), "part_mask": jnp.ones((B, P), bool),
        "incidence_matrix": z(B, N, P),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    sd = export_pf_params(variables["params"], cfg["pf_model"])
    tree2 = convert_pf_state_dict(sd, cfg["pf_model"])
    l1, l2 = _leaves(variables["params"]), _leaves(tree2)
    assert set(l1) == set(l2)
    for k in l1:
        np.testing.assert_array_equal(l1[k].astype(np.float32), l2[k])


def test_saved_checkpoint_is_lightning_shaped(tmp_path):
    import torch

    from superresolutionhep_tpu.tools.torch_export import (
        export_flow_params, save_lightning_checkpoint,
    )

    cfg, params = _flow_setup(os.path.join(REPO, "configs/multipart/model_and_var.yml"))
    sd = export_flow_params(params, cfg["flow_model"])
    path = str(tmp_path / "export.ckpt")
    save_lightning_checkpoint(sd, path, hyper_parameters={"foo": 1}, epoch=7)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert set(ckpt["state_dict"]) == set(sd)
    assert ckpt["epoch"] == 7 and ckpt["hyper_parameters"] == {"foo": 1}
    for k, v in ckpt["state_dict"].items():
        assert isinstance(v, torch.Tensor)
        np.testing.assert_array_equal(v.numpy(), sd[k])


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference mirror not mounted")
def test_shipped_pf_checkpoint_roundtrips_bitwise():
    """torch(pf_lr) -> flax -> torch reproduces the ORIGINAL state dict
    exactly: same key set, every tensor bitwise-equal."""
    import glob

    from superresolutionhep_tpu.tools.torch_convert import (
        convert_pf_state_dict, load_lightning_checkpoint,
    )
    from superresolutionhep_tpu.tools.torch_export import export_pf_params

    cks = glob.glob(os.path.join(REF, "saved_checkpoints/pf_lr/*.ckpt"))
    if not cks:
        pytest.skip("pf_lr ckpt stripped from mirror")
    sd, _ = load_lightning_checkpoint(cks[0])
    cfg = yaml.safe_load(open(os.path.join(REF, "saved_checkpoints/pf_lr/config_mv.yml")))
    tree = convert_pf_state_dict(sd, cfg["pf_model"])
    exp = export_pf_params(tree, cfg["pf_model"])
    orig = {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()}
    assert set(exp) == set(orig)
    for k in orig:
        np.testing.assert_array_equal(exp[k], orig[k])


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference mirror not mounted")
def test_exported_sr_strict_loads_into_reference_module():
    """The exported state_dict strict-loads into the reference's own
    FlowModel (its unavailable deps stubbed) — key-layout parity is checked
    by torch itself, not by our converter."""
    import copy
    import types

    import torch

    from superresolutionhep_tpu.tools.torch_export import export_flow_params

    cfg, params = _flow_setup(os.path.join(REPO, "configs/multipart/model_and_var.yml"))
    sd = export_flow_params(params, cfg["flow_model"])

    for mod, attrs in [
        ("torchcfm", {}),
        ("torchcfm.conditional_flow_matching",
         {"TargetConditionalFlowMatcher": type("T", (), {"__init__": lambda self, *a, **k: None})}),
        ("torchdiffeq", {}),
    ]:
        m = types.ModuleType(mod)
        for a, v in attrs.items():
            setattr(m, a, v)
        sys.modules.setdefault(mod, m)
    sys.path.insert(0, REF)
    try:
        from models.flow_model import FlowModel as RefFlowModel

        ref = RefFlowModel(copy.deepcopy(cfg["flow_model"]))
        inner = {
            k[len("net."):]: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd.items()
        }
        res = ref.load_state_dict(inner, strict=True)
        assert not res.missing_keys and not res.unexpected_keys
    finally:
        sys.path.remove(REF)
