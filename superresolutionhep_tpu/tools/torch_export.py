"""Flax parameter tree -> Lightning-checkpoint-shaped export.

The inverse of ``torch_convert.py`` (SURVEY §7 hard-part 6, second half):
weights trained in this framework are emitted as a ``state_dict`` of plain
tensors under the reference's exact key layout, wrapped in a minimal
Lightning checkpoint dict, so the reference's own load paths —
``inference.py:74-83`` (SR) and ``inference_pf.py:75-84`` (PF) — can run
them with ``load_state_dict(strict=True)``.

Layout notes (mirroring torch_convert.py in reverse):
  * flax ``kernel`` (in, out) -> torch ``nn.Linear.weight`` (out, in):
    transpose;
  * this framework's ``linear_{j}`` Dense members map back to the
    reference ``Dense.net.{i}`` Sequential slots, whose indices are
    recomputed from the dense config by replaying the reference's
    construction rule (norm -> dropout -> Linear -> activation per layer,
    /root/reference/models/dense.py:54-77);
  * affine LayerNorm ``scale``/``bias`` -> ``weight``/``bias``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def _get(tree: dict, path):
    node = tree
    for k in path:
        if not isinstance(node, dict) or k not in node:
            return None
        node = node[k]
    return node


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def dense_linear_indices(dense_config: dict, n_hidden: Optional[int] = None):
    """Sequential indices of the Linear modules the reference ``Dense``
    builds from this config (models/dense.py:54-77): per layer —
    optional norm, optional dropout, Linear, then an activation on hidden
    layers (or ``final_activation`` on the last)."""
    hidden = dense_config.get("hidden_layers", [])
    n_layers = (len(hidden) if n_hidden is None else n_hidden) + 1
    norm = dense_config.get("norm_layer")
    norm_final = bool(dense_config.get("norm_final_layer", False))
    dropout = float(dense_config.get("dropout", 0.0) or 0.0)
    final_act = dense_config.get("final_activation")

    idx, out = 0, []
    for i in range(n_layers):
        is_final = i == n_layers - 1
        if norm and (norm_final or not is_final):
            idx += 1
        if dropout and (norm_final or not is_final):
            idx += 1
        out.append(idx)
        idx += 1
        if not is_final:
            idx += 1
        elif final_act:
            idx += 1
    return out


def _export_linear(out: Dict[str, np.ndarray], node: Optional[dict], key: str):
    if node is None or "kernel" not in node:
        return
    out[f"{key}.weight"] = _np(node["kernel"]).T.copy()
    if "bias" in node:
        out[f"{key}.bias"] = _np(node["bias"]).copy()


def _export_dense(out, tree: dict, path, torch_prefix: str, dense_cfg: dict):
    node = _get(tree, path)
    if node is None:
        return
    linears = sorted(
        (int(k.split("_")[-1]), k) for k in node if k.startswith("linear_")
    )
    idxs = dense_linear_indices(dense_cfg, n_hidden=len(linears) - 1)
    for (j, name), seq_i in zip(linears, idxs):
        _export_linear(out, node[name], f"{torch_prefix}.net.{seq_i}")


def _export_layernorm(out, tree: dict, path, torch_prefix: str):
    node = _get(tree, path)
    if node is None or "scale" not in node:
        return
    out[f"{torch_prefix}.weight"] = _np(node["scale"]).copy()
    out[f"{torch_prefix}.bias"] = _np(node["bias"]).copy()


def _export_mha(out, tree: dict, path, torch_prefix: str):
    node = _get(tree, path)
    if node is None:
        return
    for name in ["linear_q", "linear_k", "linear_v", "linear_out",
                 "linear_e", "linear_g", "linear_e_out"]:
        if name in node:
            _export_linear(out, node[name], f"{torch_prefix}.{name}")


def _export_dit_stack(out, tree, path, torch_prefix: str, dense_cfg: dict):
    node = _get(tree, path)
    if node is None:
        return
    n = 0
    while f"layers_{n}" in node:
        lp, fp = f"{torch_prefix}.layers.{n}", path + (f"layers_{n}",)
        _export_mha(out, tree, fp + ("mha",), f"{lp}.mha")
        _export_dense(out, tree, fp + ("dense",), f"{lp}.dense", dense_cfg)
        _export_layernorm(out, tree, fp + ("norm1",), f"{lp}.norm1")
        _export_layernorm(out, tree, fp + ("norm2",), f"{lp}.norm2")
        # reference adaLN is Sequential(SiLU, Linear) -> slot 1
        _export_linear(out, _get(tree, fp + ("adaLN_modulation",)), f"{lp}.adaLN_modulation.1")
        n += 1
    _export_layernorm(out, tree, path + ("final_norm",), f"{torch_prefix}.final_norm")
    _export_linear(out, _get(tree, path + ("final_linear",)), f"{torch_prefix}.final_linear")


def export_flow_params(params: Dict[str, Any], flow_config: dict) -> Dict[str, np.ndarray]:
    """FlowModel flax params -> reference ``net.*`` state-dict arrays
    (inverse of torch_convert.convert_flow_state_dict)."""
    tree = params.get("params", params)
    out: Dict[str, np.ndarray] = {}

    tse = _get(tree, ("time_step_embedder",)) or {}
    _export_linear(out, tse.get("mlp_0"), "time_step_embedder.mlp.0")
    _export_linear(out, tse.get("mlp_2"), "time_step_embedder.mlp.2")
    emb = _get(tree, ("layer_emb_table", "embedding"))
    if emb is not None:
        out["layer_emb_table.weight"] = _np(emb).copy()

    for name, cfg in [
        ("layer_emb_net", flow_config["layer_emb"]["dense_config"]),
        ("etaphi_emb_net", flow_config["etaphi_emb"]),
        ("proxy_emb_net", flow_config["e_proxy_emb"]),
        ("noisy_input_emb_net", flow_config["noisy_input_emb"]),
        ("feat_0_mlp", flow_config["feat_0_mlp"]),
        ("v_t_pred_net", flow_config["v_t_pred"]),
    ]:
        _export_dense(out, tree, (name,), name, cfg)

    _export_dit_stack(out, tree, ("transformer",), "transformer",
                      flow_config["transformer"]["dense_config"])

    _export_linear(out, _get(tree, ("v_t_adaLN_modulation",)), "v_t_adaLN_modulation.1")
    _export_layernorm(out, tree, ("norm_v_t",), "norm_v_t")
    return {f"net.{k}": v for k, v in out.items()}


def export_pf_params(params: Dict[str, Any], config_pf: dict) -> Dict[str, np.ndarray]:
    """SAPF flax params -> reference ``net.*`` state-dict arrays
    (inverse of torch_convert.convert_pf_state_dict)."""
    tree = params.get("params", params)
    out: Dict[str, np.ndarray] = {}

    emb = _get(tree, ("encoder", "layer_emb_table", "embedding"))
    if emb is None:
        emb = _get(tree, ("encoder", "layer_emb_net", "embedding"))
    if emb is not None:
        out["encoder.layer_emb_net.weight"] = _np(emb).copy()
    _export_linear(out, _get(tree, ("encoder", "cell_init_0")), "encoder.cell_init_net.0")
    _export_linear(out, _get(tree, ("encoder", "cell_init_1")), "encoder.cell_init_net.2")
    _export_dit_stack(out, tree, ("encoder", "transformer"), "encoder.transformer",
                      config_pf["encoder"]["transformer"]["dense_config"])

    _export_dense(out, tree, ("cardinality_predictor", "card_pred_net"),
                  "cardinality_predictor.card_pred_net",
                  config_pf["cardinality_predictor"])

    kp = ("kinematics_predictor",)
    node = _get(tree, kp)
    if node is not None:
        if "particle_emb_net" in node:
            out["kinematics_predictor.particle_emb_net.weight"] = _np(
                node["particle_emb_net"]["embedding"]).copy()
            _export_linear(out, node.get("particle_proj"), "kinematics_predictor.particle_proj")
        if "edges_mu" in node:
            out["kinematics_predictor.edges_mu"] = _np(node["edges_mu"]).copy()
            out["kinematics_predictor.edges_logsigma"] = _np(node["edges_logsigma"]).copy()
        _export_dit_stack(out, tree, kp + ("transformer",),
                          "kinematics_predictor.transformer",
                          config_pf["kinematics_predictor"]["transformer"]["dense_config"])
        kin = node.get("kin_net")
        if kin is not None and "linear_q" in kin:
            _export_linear(out, kin["linear_q"], "kinematics_predictor.kin_net.linear_q")
            _export_linear(out, kin["linear_k"], "kinematics_predictor.kin_net.linear_k")
        elif kin is not None:
            _export_dense(out, tree, kp + ("kin_net",), "kinematics_predictor.kin_net",
                          config_pf["kinematics_predictor"].get("kin_net", {"hidden_layers": []}))
    return {f"net.{k}": v for k, v in out.items()}


def save_lightning_checkpoint(
    state_dict: Dict[str, np.ndarray],
    path: str,
    hyper_parameters: Optional[dict] = None,
    epoch: int = 0,
    global_step: int = 0,
):
    """Wrap exported arrays in a minimal Lightning-shaped checkpoint dict
    (the keys the reference load paths touch: ``state_dict`` always,
    ``hyper_parameters`` optionally) and ``torch.save`` it."""
    import torch

    ckpt = {
        "state_dict": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state_dict.items()},
        "hyper_parameters": hyper_parameters or {},
        "epoch": epoch,
        "global_step": global_step,
        "pytorch-lightning_version": "2.0.0",
    }
    torch.save(ckpt, path)
    return path
