"""Kinematics predictor: learned particle query slots, DiT cross-attention
over cells, and the attention-based kinematic head.

Capability mirror of pflow/models/kinematics_predictor.py:11-135:
  * slots from an Embedding+projection or random gaussian (slot-attention
    style mu/logsigma) (:67-77,99-111);
  * DiT cross-attention (queries x cell keys) conditioned on the pooled cell
    context (:79-88,122-125);
  * AttnKinematicNet (:11-57): single-head q.k scores, softmax over the
    *particle* axis so each cell's energy splits across particles,
    energy-weighted incidence -> per-particle E/eta/phi by weighted sums,
    pt = E/cosh(eta) (zero mass), then forward transforms into target space.
"""

from __future__ import annotations

import math
from typing import Any, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.masked import masked_mean, masked_softmax, merge_masks
from ...transforms import VarTransform
from ..dense import Dense, xavier_uniform
from ..dit import DiTEncoder


class AttnKinematicNet(nn.Module):
    h_dim: int
    transforms: Optional[Mapping[str, VarTransform]] = None
    dtype: Any = None
    # sequence-parallel axis: cells sharded; per-particle sums over cells
    # psum-reduce so the kinematics come out replicated across shards
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, q, k, part_valid, cell_valid, batch):
        """q: (B, P, H) particle features; k: (B, N, H) cell features.
        Returns (kin_pred (B,P,4), inc_weights (B,P,N))."""
        mask = merge_masks(part_valid, cell_valid, None, q.shape[1], k.shape[1])
        q_p = nn.Dense(self.h_dim, kernel_init=xavier_uniform, dtype=self.dtype, name="linear_q")(q)
        k_p = nn.Dense(self.h_dim, kernel_init=xavier_uniform, dtype=self.dtype, name="linear_k")(k)

        scores = jnp.einsum("bph,bnh->bpn", q_p, k_p) / math.sqrt(self.h_dim)
        # softmax over the PARTICLE axis: each cell's unit weight splits
        # across particles (kinematics_predictor.py:32)
        inc_weights = masked_softmax(scores, mask, axis=1)

        e_raw_inc = inc_weights * batch["cell_e_raw"][:, None, :]  # (B, P, N)

        def cell_sum(x, keepdims=False):
            out = x.sum(axis=-1, keepdims=keepdims)
            if self.sp_axis is not None:
                out = jax.lax.psum(out, self.sp_axis)
            return out

        row_sum = cell_sum(e_raw_inc, keepdims=True)
        inc = e_raw_inc / (row_sum + (row_sum == 0))  # per-particle cell shares

        eta_pred_raw = cell_sum(inc * batch["cell_eta_raw"][:, None, :])
        phi_pred = cell_sum(inc * batch["cell_phi"][:, None, :])
        e_pred_raw = cell_sum(e_raw_inc)
        pt_pred_raw = e_pred_raw / jnp.cosh(eta_pred_raw)  # zero-mass

        tr = self.transforms
        kin_pred = jnp.stack(
            [
                tr["pt"].forward(pt_pred_raw),
                tr["eta"].forward(eta_pred_raw),
                phi_pred,
                tr["e"].forward(e_pred_raw),
            ],
            axis=-1,
        )
        return kin_pred, inc_weights


class KinematicsPredictor(nn.Module):
    config_pf: dict
    transforms: Optional[Mapping[str, VarTransform]] = None
    dtype: Any = None
    attn_impl: str = "auto"
    sp_axis: Optional[str] = None
    sp_mode: str = "gather"
    tp_axis: Optional[str] = None
    tp_size: int = 1

    @nn.compact
    def __call__(self, cell_feat, cell_mask, part_mask, batch, rng=None, deterministic=True):
        cfg = self.config_pf
        kcfg = cfg["kinematics_predictor"]
        h_dim = int(cfg["h_dim"])
        max_part = int(cfg["max_particles"])
        B = cell_feat.shape[0]

        init_cfg = kcfg["init_particles"]
        if init_cfg["type"] == "embedding":
            table = nn.Embed(
                max_part, init_cfg["embedding_dim"], dtype=self.dtype, name="particle_emb_net"
            )(jnp.broadcast_to(jnp.arange(max_part)[None, :], (B, max_part)))
            particle_emb = nn.Dense(
                h_dim, kernel_init=xavier_uniform, dtype=self.dtype, name="particle_proj"
            )(table)
        elif init_cfg["type"] == "random":
            mu = self.param("edges_mu", nn.initializers.normal(1.0), (1, 1, h_dim))
            logsigma = self.param("edges_logsigma", xavier_uniform, (1, 1, h_dim))
            noise_rng = rng if rng is not None else self.make_rng("slots")
            noise = jax.random.normal(noise_rng, (B, max_part, h_dim), mu.dtype)
            particle_emb = mu + jnp.exp(logsigma) * noise
        else:
            raise ValueError(f"unknown init_particles type {init_cfg['type']!r}")

        cell_global = masked_mean(cell_feat, cell_mask, axis=1, psum_axis=self.sp_axis)

        tcfg = kcfg["transformer"]
        part_feat = DiTEncoder(
            embed_dim=h_dim,
            num_layers=tcfg["num_transformer_layers"],
            num_heads=tcfg["num_heads"],
            dense_config=dict(tcfg["dense_config"]),
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            sp_axis=self.sp_axis,
            sp_mode=self.sp_mode,
            tp_axis=self.tp_axis,
            tp_size=self.tp_size,
            name="transformer",
        )(
            particle_emb,
            q_valid=part_mask,
            k=cell_feat,
            kv_valid=cell_mask,
            context=cell_global,
            deterministic=deterministic,
        )

        if kcfg.get("use_attn_kinematics", False):
            kin_net = AttnKinematicNet(
                h_dim=h_dim, transforms=self.transforms, dtype=self.dtype,
                sp_axis=self.sp_axis, name="kin_net"
            )
            return kin_net(part_feat, cell_feat, part_mask, cell_mask, batch)

        kin_pred = Dense.from_config(kcfg["pt_eta_phi_e_net"], dtype=self.dtype, name="kin_net")(
            part_feat, deterministic=deterministic
        )
        return kin_pred, None
