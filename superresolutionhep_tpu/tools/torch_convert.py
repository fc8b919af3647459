"""Torch(Lightning) checkpoint -> flax parameter conversion.

The reference ships trained PF checkpoints (saved_checkpoints/pf_lr, pf_hr —
Lightning ckpts with a ``state_dict`` of plain tensors).  This module maps
those state dicts onto this framework's parameter trees so the shipped
weights run natively on TPU, and powers the golden parity tests.

Layout notes:
  * torch ``nn.Linear.weight`` is (out, in) -> flax kernel (in, out): transpose;
  * the reference ``Dense`` is an ``nn.Sequential`` where LayerNorms carry no
    params (elementwise_affine=False), so Linears are mapped in Sequential
    order onto this framework's ``linear_{i}`` names;
  * affine LayerNorms (norm1/norm2/final_norm/norm_v_t) map weight->scale.
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Dict

import numpy as np


def _set(tree: dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _numpy_state_dict(state_dict) -> Dict[str, np.ndarray]:
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v) for k, v in state_dict.items()}


def _map_linear(tree, path, w, b=None):
    _set(tree, path + ("kernel",), w.T.copy())
    if b is not None:
        _set(tree, path + ("bias",), b.copy())


def _collect_sequential_linears(sd: Dict[str, np.ndarray], prefix: str):
    """Return [(seq_idx, W, b)] for ``{prefix}.net.{i}`` Linear entries."""
    found = defaultdict(dict)
    pat = re.compile(re.escape(prefix) + r"\.net\.(\d+)\.(weight|bias)$")
    for k, v in sd.items():
        m = pat.match(k)
        if m:
            found[int(m.group(1))][m.group(2)] = v
    return [(i, found[i]["weight"], found[i].get("bias")) for i in sorted(found)]


def _map_dense(tree, sd, torch_prefix: str, flax_path: tuple):
    for j, (_, w, b) in enumerate(_collect_sequential_linears(sd, torch_prefix)):
        _map_linear(tree, flax_path + (f"linear_{j}",), w, b)


def _map_layernorm(tree, sd, torch_prefix: str, flax_path: tuple):
    if f"{torch_prefix}.weight" in sd:
        _set(tree, flax_path + ("scale",), sd[f"{torch_prefix}.weight"].copy())
        _set(tree, flax_path + ("bias",), sd[f"{torch_prefix}.bias"].copy())


def _map_mha(tree, sd, torch_prefix: str, flax_path: tuple):
    for name in ["linear_q", "linear_k", "linear_v", "linear_out", "linear_e", "linear_g", "linear_e_out"]:
        wk = f"{torch_prefix}.{name}.weight"
        if wk in sd:
            _map_linear(tree, flax_path + (name,), sd[wk], sd.get(f"{torch_prefix}.{name}.bias"))


def _map_dit_stack(tree, sd, torch_prefix: str, flax_path: tuple, num_layers: int):
    for n in range(num_layers):
        lp = f"{torch_prefix}.layers.{n}"
        fp = flax_path + (f"layers_{n}",)
        _map_mha(tree, sd, f"{lp}.mha", fp + ("mha",))
        _map_dense(tree, sd, f"{lp}.dense", fp + ("dense",))
        _map_layernorm(tree, sd, f"{lp}.norm1", fp + ("norm1",))
        _map_layernorm(tree, sd, f"{lp}.norm2", fp + ("norm2",))
        if f"{lp}.adaLN_modulation.1.weight" in sd:
            _map_linear(
                tree, fp + ("adaLN_modulation",),
                sd[f"{lp}.adaLN_modulation.1.weight"], sd[f"{lp}.adaLN_modulation.1.bias"],
            )
    _map_layernorm(tree, sd, f"{torch_prefix}.final_norm", flax_path + ("final_norm",))
    if f"{torch_prefix}.final_linear.weight" in sd:
        _map_linear(
            tree, flax_path + ("final_linear",),
            sd[f"{torch_prefix}.final_linear.weight"], sd.get(f"{torch_prefix}.final_linear.bias"),
        )


def convert_pf_state_dict(state_dict, config_pf: dict) -> dict:
    """Lightning PF ``state_dict`` (keys ``net.*``) -> SAPF flax params."""
    sd = _numpy_state_dict(state_dict)
    sd = {k[len("net."):]: v for k, v in sd.items() if k.startswith("net.")}
    tree: dict = {}

    # encoder (pflow/models/encoder.py)
    _set(tree, ("encoder", "layer_emb_net", "embedding"), sd["encoder.layer_emb_net.weight"].copy())
    _map_linear(tree, ("encoder", "cell_init_0"), sd["encoder.cell_init_net.0.weight"], sd["encoder.cell_init_net.0.bias"])
    _map_linear(tree, ("encoder", "cell_init_1"), sd["encoder.cell_init_net.2.weight"], sd["encoder.cell_init_net.2.bias"])
    n_enc = config_pf["encoder"]["transformer"]["num_transformer_layers"]
    _map_dit_stack(tree, sd, "encoder.transformer", ("encoder", "transformer"), n_enc)

    # cardinality head
    if any(k.startswith("cardinality_predictor.") for k in sd):
        _map_dense(tree, sd, "cardinality_predictor.card_pred_net", ("cardinality_predictor", "card_pred_net"))

    # kinematics head
    if any(k.startswith("kinematics_predictor.") for k in sd):
        kp = ("kinematics_predictor",)
        if "kinematics_predictor.particle_emb_net.weight" in sd:
            _set(tree, kp + ("particle_emb_net", "embedding"), sd["kinematics_predictor.particle_emb_net.weight"].copy())
            _map_linear(tree, kp + ("particle_proj",), sd["kinematics_predictor.particle_proj.weight"], sd["kinematics_predictor.particle_proj.bias"])
        if "kinematics_predictor.edges_mu" in sd:
            _set(tree, kp + ("edges_mu",), sd["kinematics_predictor.edges_mu"].copy())
            _set(tree, kp + ("edges_logsigma",), sd["kinematics_predictor.edges_logsigma"].copy())
        n_kin = config_pf["kinematics_predictor"]["transformer"]["num_transformer_layers"]
        _map_dit_stack(tree, sd, "kinematics_predictor.transformer", kp + ("transformer",), n_kin)
        if "kinematics_predictor.kin_net.linear_q.weight" in sd:
            _map_linear(tree, kp + ("kin_net", "linear_q"), sd["kinematics_predictor.kin_net.linear_q.weight"], sd["kinematics_predictor.kin_net.linear_q.bias"])
            _map_linear(tree, kp + ("kin_net", "linear_k"), sd["kinematics_predictor.kin_net.linear_k.weight"], sd["kinematics_predictor.kin_net.linear_k.bias"])
        else:
            _map_dense(tree, sd, "kinematics_predictor.kin_net", kp + ("kin_net",))
    return tree


def convert_flow_state_dict(state_dict, flow_config: dict) -> dict:
    """Lightning SR ``state_dict`` (keys ``net.*``) -> FlowModel flax params."""
    sd = _numpy_state_dict(state_dict)
    sd = {k[len("net."):]: v for k, v in sd.items() if k.startswith("net.")}
    tree: dict = {}

    _map_linear(tree, ("time_step_embedder", "mlp_0"), sd["time_step_embedder.mlp.0.weight"], sd["time_step_embedder.mlp.0.bias"])
    _map_linear(tree, ("time_step_embedder", "mlp_2"), sd["time_step_embedder.mlp.2.weight"], sd["time_step_embedder.mlp.2.bias"])
    _set(tree, ("layer_emb_table", "embedding"), sd["layer_emb_table.weight"].copy())
    for torch_name, flax_name in [
        ("layer_emb_net", "layer_emb_net"),
        ("etaphi_emb_net", "etaphi_emb_net"),
        ("proxy_emb_net", "proxy_emb_net"),
        ("noisy_input_emb_net", "noisy_input_emb_net"),
        ("feat_0_mlp", "feat_0_mlp"),
        ("v_t_pred_net", "v_t_pred_net"),
    ]:
        _map_dense(tree, sd, torch_name, (flax_name,))

    n_layers = flow_config["transformer"]["num_transformer_layers"]
    _map_dit_stack(tree, sd, "transformer", ("transformer",), n_layers)

    if "v_t_adaLN_modulation.1.weight" in sd:
        _map_linear(tree, ("v_t_adaLN_modulation",), sd["v_t_adaLN_modulation.1.weight"], sd["v_t_adaLN_modulation.1.bias"])
        _map_layernorm(tree, sd, "norm_v_t", ("norm_v_t",))
    return tree


def load_lightning_checkpoint(path: str):
    """Load a Lightning .ckpt (requires torch) and return (state_dict,
    hyper_parameters)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt["state_dict"], ckpt.get("hyper_parameters", {})
