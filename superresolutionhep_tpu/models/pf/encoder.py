"""PF cell encoder.

Capability mirror of pflow/models/encoder.py:9-58: featurise each cell as
[e, eta, cosphi, sinphi, layer_emb] -> 2-layer MLP -> h_dim; pool a masked
mean global context; DiT self-attention stack conditioned on it.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...ops.masked import masked_mean
from ..dense import xavier_uniform
from ..dit import DiTEncoder

N_CALO_LAYERS = 3


class PFEncoder(nn.Module):
    config_pf: dict
    dtype: Any = None
    attn_impl: str = "auto"
    sp_axis: str = None
    sp_mode: str = "gather"
    # Megatron tensor parallelism (parallel/tp.py): heads + MLP sharded
    tp_axis: str = None
    tp_size: int = 1
    # fused DiT layer kernels (ops/fused_{qkv,mlp}.py); inference opt-in
    fused_prologue: bool = False

    @nn.compact
    def __call__(self, batch, deterministic: bool = True):
        cfg = self.config_pf
        h_dim = int(cfg["h_dim"])
        enc_cfg = cfg["encoder"]
        cell_mask = batch["cell_mask"]

        layer_emb = nn.Embed(
            N_CALO_LAYERS, enc_cfg["layer_emb_dim"], dtype=self.dtype, name="layer_emb_net"
        )(batch["cell_layer"])
        feat0 = jnp.concatenate(
            [
                batch["cell_e"][..., None],
                batch["cell_eta"][..., None],
                batch["cell_cosphi"][..., None],
                batch["cell_sinphi"][..., None],
                layer_emb,
            ],
            axis=-1,
        )
        # first (geometry-carrying) matmul at full fp32 precision: bf16
        # matmul inputs quantize normalized eta below the HR cell pitch
        # (see flow_model.py etaphi_emb note; reference trains at
        # torch float32_matmul_precision 'highest')
        x = nn.Dense(
            h_dim, kernel_init=xavier_uniform, dtype=None, precision="highest", name="cell_init_0"
        )(feat0.astype(jnp.float32))
        x = nn.leaky_relu(x, negative_slope=0.01).astype(self.dtype or feat0.dtype)
        x = nn.Dense(h_dim, kernel_init=xavier_uniform, dtype=self.dtype, name="cell_init_1")(x)

        global_feat = masked_mean(x, cell_mask, axis=1, psum_axis=self.sp_axis)

        tcfg = enc_cfg["transformer"]
        feat = DiTEncoder(
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
            fused_prologue=self.fused_prologue,
            name="transformer",
        )(x, q_valid=cell_mask, context=global_feat, deterministic=deterministic)
        return feat
