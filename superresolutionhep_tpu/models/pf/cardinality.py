"""Cardinality head: masked mean pool -> Dense -> logits over
max_particles+1 classes (class 0 = no particles).

Capability mirror of pflow/models/cardinality_predictor.py:6-22.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from ...ops.masked import masked_mean
from ..dense import Dense


class CardinalityPredictor(nn.Module):
    config_pf: dict
    dtype: Any = None
    sp_axis: str = None

    @nn.compact
    def __call__(self, encoded_feat, cell_mask, deterministic: bool = True):
        n_classes = int(self.config_pf["max_particles"]) + 1
        head_cfg = dict(self.config_pf["cardinality_predictor"], output_size=n_classes)
        pooled = masked_mean(encoded_feat, cell_mask, axis=1, psum_axis=self.sp_axis)
        return Dense.from_config(head_cfg, dtype=self.dtype, name="card_pred_net")(
            pooled, deterministic=deterministic
        )
