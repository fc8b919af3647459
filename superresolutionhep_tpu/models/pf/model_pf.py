"""SAPF — set-attention particle-flow model (stage 2).

Capability mirror of pflow/models/model_pf.py:9-74: encoder + optional
cardinality head + optional kinematics head; at inference the predicted
cardinality gates the particle query mask
(``arange(maxP) < argmax(logits)``, model_pf.py:65-69).
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import flax.linen as nn
import jax.numpy as jnp

from ...transforms import VarTransform
from .cardinality import CardinalityPredictor
from .encoder import PFEncoder
from .kinematics import KinematicsPredictor


class SAPF(nn.Module):
    config_pf: dict
    transforms: Optional[Mapping[str, VarTransform]] = None
    inference: bool = False
    dtype: Any = None
    attn_impl: str = "auto"
    sp_axis: Optional[str] = None
    sp_mode: str = "gather"
    # Megatron tensor parallelism for both DiT stacks (parallel/tp.py)
    tp_axis: Optional[str] = None
    tp_size: int = 1
    # fused DiT layer kernels in the cell encoder (ops/fused_{qkv,mlp}.py)
    fused_prologue: bool = False

    @nn.compact
    def __call__(self, batch, deterministic: bool = True, rng=None):
        cfg = self.config_pf
        encoded = PFEncoder(
            cfg, dtype=self.dtype, attn_impl=self.attn_impl,
            sp_axis=self.sp_axis, sp_mode=self.sp_mode,
            tp_axis=self.tp_axis, tp_size=self.tp_size,
            fused_prologue=self.fused_prologue, name="encoder",
        )(batch, deterministic=deterministic)

        n_pred_logits = None
        if cfg.get("cardinality_predictor") is not None:
            n_pred_logits = CardinalityPredictor(
                cfg, dtype=self.dtype, sp_axis=self.sp_axis, name="cardinality_predictor"
            )(encoded, batch["cell_mask"], deterministic=deterministic)

        kin_pred = None
        inc_weights = None
        if cfg.get("kinematics_predictor") is not None:
            if self.inference:
                n_pred = jnp.argmax(n_pred_logits, axis=-1)
                part_mask = (
                    jnp.arange(int(cfg["max_particles"]))[None, :] < n_pred[:, None]
                )
            else:
                part_mask = batch["part_mask"]
            kin_pred, inc_weights = KinematicsPredictor(
                cfg,
                transforms=self.transforms,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                sp_axis=self.sp_axis,
                sp_mode=self.sp_mode,
                tp_axis=self.tp_axis,
                tp_size=self.tp_size,
                name="kinematics_predictor",
            )(encoded, batch["cell_mask"], part_mask, batch, rng=rng, deterministic=deterministic)

        return n_pred_logits, kin_pred, inc_weights
