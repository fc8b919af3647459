"""Diffusion Transformer (DiT) layers with adaLN conditioning.

Capability mirror of models/diffusion_transformer.py:8-87: per-layer context ->
SiLU -> Linear -> 6-way (shift/scale/gate for MSA and MLP) modulation; gated
residual attention and FFN; cross-attention variant applies the modulation to
the *keys* (diffusion_transformer.py:42-45).  This is the production
transformer for both pipeline stages (``transformer.type: 'DiT'`` in all
shipped configs).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from .attention import MultiheadAttention
from .dense import Dense, LN_EPS, xavier_uniform


def modulate(x, shift, scale):
    """x: (B, L, F); shift/scale: (B, F), or (B, L, F) for the packed path
    where the conditioning context is per-cell (one event per segment of a
    packed row, ops/flash_packed.py) (diffusion_transformer.py:8-9)."""
    if shift.ndim < x.ndim:
        shift = shift[:, None, :]
        scale = scale[:, None, :]
    return x * (1 + scale) + shift


def _gate(g, x):
    """Broadcast a (B, F) or per-cell (B, L, F) residual gate onto x."""
    return (g if g.ndim == x.ndim else g[:, None, :]) * x


class DiTLayer(nn.Module):
    embed_dim: int
    num_heads: int
    dense_config: Optional[dict] = None
    dtype: Any = None
    attn_impl: str = "auto"
    sp_axis: Optional[str] = None
    sp_mode: str = "gather"
    # fuse norm1 + adaLN modulate + QKV projection into one Pallas pass
    # (ops/fused_qkv.py): saves the HBM round-trips between the elementwise
    # prologue and the attention matmuls.  Self-attention + padding masks
    # only; inference default (SRInference), opt-in for training.
    fused_prologue: bool = False
    # Megatron tensor parallelism over ``tp_axis`` (size ``tp_size``): the
    # attention heads and the MLP hidden width are sharded — this module
    # then declares LOCAL widths (num_heads/tp, embed_dim/tp attention
    # projections, hidden/tp MLP) so the head-sliced parameter shards from
    # parallel/tp.py bind directly.  LayerNorms and the adaLN modulation
    # net stay replicated; the row-parallel reduce points live in
    # models/attention.py and models/dense.py.
    tp_axis: Optional[str] = None
    tp_size: int = 1

    @nn.compact
    def __call__(
        self,
        q,
        q_valid=None,
        k=None,
        kv_valid=None,
        context=None,
        context_seg=None,
        seg_onehot=None,
        attn_valid=None,
        attn_bias=None,
        segment_ids=None,
        deterministic: bool = True,
    ):
        # packed path (context_seg (B,E,C) + seg_onehot (B,S,E)): the context
        # is constant within a segment, so the 6-way modulation net runs per
        # segment and its output is scattered per cell by one (S x E) matmul
        # — ~25x fewer modulation-net FLOPs than evaluating it per cell
        mod = nn.Dense(
            6 * self.embed_dim, kernel_init=xavier_uniform, dtype=self.dtype, name="adaLN_modulation"
        )(nn.silu(context_seg if context_seg is not None else context))
        if context_seg is not None:
            mod = jnp.einsum("bse,bef->bsf", seg_onehot, mod)
        (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp) = jnp.split(mod, 6, axis=-1)

        tp = self.tp_size
        if tp > 1 and (self.num_heads % tp or self.embed_dim % tp):
            raise ValueError(
                f"tp_size {tp} must divide num_heads {self.num_heads} and "
                f"embed_dim {self.embed_dim}"
            )
        norm1 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")
        mha = MultiheadAttention(
            embed_dim=self.embed_dim // tp,
            num_heads=self.num_heads // tp,
            q_dim=self.embed_dim if tp > 1 else None,
            dtype=self.dtype,
            impl=self.attn_impl,
            sp_axis=self.sp_axis,
            sp_mode=self.sp_mode,
            tp_axis=self.tp_axis if tp > 1 else None,
            name="mha",
        )
        fuse = (
            self.fused_prologue
            and tp == 1
            and k is None
            # packed rows (segment_ids + per-segment context) fuse too: the
            # scattered modulation is per-cell, the fused_qkv kernel takes
            # (B, L, F) rows, and attention runs the banded packed kernel
            and (segment_ids is None) == (context_seg is None)
            and attn_valid is None
            and attn_bias is None
            and self.sp_axis is None
            and not self.is_initializing()
        )
        if fuse:
            # bind norm1 (cheap dummy slice; output is dead code) and fold
            # its gamma/beta with the adaLN shift/scale into the two affine
            # rows the fused kernel consumes — norm1 itself never runs over
            # the full activation.  The (F,) LN params broadcast against
            # per-batch (B, F) and per-cell (B, L, F) modulation alike.
            _ = norm1(q[:, :1])
            ln_p = norm1.variables["params"]
            one_scale = 1.0 + scale_msa.astype(jnp.float32)
            eff_a = ln_p["scale"] * one_scale
            eff_b = ln_p["bias"] * one_scale + shift_msa.astype(jnp.float32)
            q_attn = mha(
                q=q, q_valid=q_valid, fused_ln=(eff_a, eff_b),
                segment_ids=segment_ids, deterministic=deterministic,
            )
        elif k is None:  # self-attention: modulate the tokens themselves
            q_attn = mha(
                q=modulate(norm1(q), shift_msa, scale_msa),
                q_valid=q_valid,
                attn_valid=attn_valid,
                attn_bias=attn_bias,
                segment_ids=segment_ids,
                deterministic=deterministic,
            )
        else:  # cross-attention: modulation applied to the keys (dit ref :42-45)
            q_attn = mha(
                q=q,
                k=modulate(norm1(k), shift_msa, scale_msa),
                q_valid=q_valid,
                kv_valid=kv_valid,
                attn_valid=attn_valid,
                attn_bias=attn_bias,
                deterministic=deterministic,
            )
        mlp_cfg = (
            dict(self.dense_config, output_size=self.embed_dim)
            if self.dense_config is not None
            else None
        )
        if mlp_cfg is not None and tp > 1:
            hl = list(mlp_cfg.get("hidden_layers") or ())
            if len(hl) != 1 or hl[0] % tp:
                raise ValueError(
                    f"tp_size {tp} needs one tp-divisible MLP hidden layer, got {hl}"
                )
            mlp_cfg["hidden_layers"] = (hl[0] // tp,)
        if fuse and mlp_cfg is not None:
            from ..ops.fused_mlp import fused_dit_mlp, fused_mlp_ok, mlp_config_fusable

            Fh = (mlp_cfg.get("hidden_layers") or [0])[0]
            if mlp_config_fusable(mlp_cfg) and fused_mlp_ok(q.shape[1], self.embed_dim, Fh):
                # both residuals, norm2+modulate, Dense's internal LN and
                # the two MLP matmuls run as ONE Pallas pass per block
                # (ops/fused_mlp.py); params come from the same norm2/dense
                # modules the standard path uses (dummy-slice bind)
                dense = Dense.from_config(mlp_cfg, dtype=self.dtype, name="dense")
                norm2 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")
                _ = norm2(q[:, :1])
                _ = dense(q[:, :1], context=context, deterministic=deterministic)
                n2 = norm2.variables["params"]
                dp = dense.variables["params"]
                # (F,) LN params broadcast against per-batch (B, F) and
                # per-cell (B, L, F) modulation rows alike (packed path)
                one_mlp = 1.0 + scale_mlp.astype(jnp.float32)
                eff2_a = n2["scale"] * one_mlp
                eff2_b = n2["bias"] * one_mlp + shift_mlp.astype(jnp.float32)
                dt = self.dtype or q.dtype
                return fused_dit_mlp(
                    q,
                    q_attn,
                    gate_msa.astype(jnp.float32),
                    eff2_a,
                    eff2_b,
                    gate_mlp.astype(jnp.float32),
                    dp["linear_0"]["kernel"].astype(dt),
                    dp["linear_0"]["bias"],
                    dp["linear_1"]["kernel"].astype(dt),
                    dp["linear_1"]["bias"],
                )

        q = q + _gate(gate_msa, q_attn)

        if mlp_cfg is not None:
            dense = Dense.from_config(
                mlp_cfg,
                dtype=self.dtype,
                tp_axis=self.tp_axis if tp > 1 else None,
                name="dense",
            )
            q_mlp = dense(
                modulate(nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")(q), shift_mlp, scale_mlp),
                context=context,
                deterministic=deterministic,
            )
            q = q + _gate(gate_mlp, q_mlp)
        return q


class DiTEncoder(nn.Module):
    embed_dim: int
    num_layers: int
    num_heads: int
    dense_config: Optional[dict] = None
    out_dim: int = 0
    dtype: Any = None
    attn_impl: str = "auto"
    sp_axis: Optional[str] = None
    sp_mode: str = "gather"
    fused_prologue: bool = False
    tp_axis: Optional[str] = None
    tp_size: int = 1
    # rematerialise each layer in the backward pass (jax.checkpoint): trades
    # FLOPs for HBM, the standard lever for long-cell-set training
    remat: bool = False

    @nn.compact
    def __call__(self, q, **kwargs):
        layer_cls = nn.remat(DiTLayer) if self.remat else DiTLayer
        for i in range(self.num_layers):
            q = layer_cls(
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                dense_config=self.dense_config,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                sp_axis=self.sp_axis,
                sp_mode=self.sp_mode,
                fused_prologue=self.fused_prologue,
                tp_axis=self.tp_axis,
                tp_size=self.tp_size,
                name=f"layers_{i}",
            )(q, **kwargs)
        q = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="final_norm")(q)
        if self.out_dim:
            q = nn.Dense(self.out_dim, kernel_init=xavier_uniform, dtype=self.dtype, name="final_linear")(q)
        return q
