"""Conditional flow-matching super-resolution denoiser (stage 1).

Capability mirror of the reference FlowModel (models/flow_model.py:23-264):
embeds cell geometry (eta/cosphi/sinphi), calorimeter layer, proxy energy and
the noisy per-cell state, each conditioned on the timestep embedding; pools a
masked-mean global conditioning vector; runs a DiT (or Normformer) stack over
the cell set; skip-concatenates the conditional features; optional final adaLN
modulation; and predicts a per-cell scalar velocity.

Config layout is identical to the reference ``flow_model`` YAML block
(configs/single_e/model_and_var.yml:6-96) so shipped configs load unchanged.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.masked import masked_mean, segment_mean, segment_onehot
from .dense import Dense, LN_EPS, xavier_uniform
from .dit import DiTEncoder, modulate
from .embed import TimestepEmbedder
from .transformer import TransformerEncoder

N_CALO_LAYERS = 3  # ECAL layers kept after the layer<3 cut (dataset.py:278-283)


class FlowModel(nn.Module):
    config: dict  # the `flow_model` config block
    dtype: Any = None
    attn_impl: str = "auto"
    # sequence-parallel mesh axis (cells sharded across devices); pooled
    # context and attention K/V reduce/gather over it
    sp_axis: str = None
    sp_mode: str = "gather"
    # Megatron tensor parallelism over ``tp_axis`` (size ``tp_size``):
    # attention heads + DiT MLP hidden sharded, everything else replicated.
    # The module then declares LOCAL widths, binding the head-sliced param
    # shards from parallel/tp.py.  Composes with sp_axis (cells) and a data
    # axis on a 3D mesh.
    tp_axis: str = None
    tp_size: int = 1
    remat: bool = False
    # fuse norm1 + adaLN + QKV per DiT layer (ops/fused_qkv.py); enabled by
    # the inference drivers, off for training/parity paths
    fused_prologue: bool = False

    @nn.compact
    def __call__(self, batch, noisy_input, time_step, deterministic: bool = True):
        """batch: dict with (B,N,1) float features ``eta,cosphi,sinphi,e_proxy``,
        (B,N,1) int ``layer`` and (B,N) bool ``q_mask`` (True==valid).
        noisy_input: (B,N,1); time_step: (B,). Returns v_t (B,N,1)."""
        cfg = self.config
        context_size = cfg["time_embedding_size"]  # flow_model.py:42

        time_emb = TimestepEmbedder(context_size, dtype=self.dtype, name="time_step_embedder")(time_step)

        eta, cosphi, sinphi = batch["eta"], batch["cosphi"], batch["sinphi"]
        layer, e_proxy, q_mask = batch["layer"], batch["e_proxy"], batch["q_mask"]

        # conditional feature embedders, each context-conditioned on time_emb
        layer_tab = nn.Embed(
            N_CALO_LAYERS, cfg["layer_emb"]["emb_dim"], dtype=self.dtype, name="layer_emb_table"
        )(layer.squeeze(-1))
        layer_emb = Dense.from_config(
            dict(cfg["layer_emb"]["dense_config"], context_size=context_size),
            dtype=self.dtype,
            name="layer_emb_net",
        )(layer_tab, context=time_emb, deterministic=deterministic)

        # geometry embedder runs at full fp32 precision regardless of the
        # compute dtype: bf16 matmul inputs quantize normalized eta (ulp
        # ~0.008 at |eta|~1.2) near the HR subcell half-pitch (~0.006 at
        # layer-0 granularity), eroding sibling-subcell contrast — the SR
        # task's whole signal.  The reference trains with
        # torch.set_float32_matmul_precision('highest') (train.py:35,46).
        # O(L x 64) flops: negligible next to the h=256 stack.
        geo = jnp.concatenate([eta, cosphi, sinphi], axis=-1).astype(jnp.float32)
        # optional multi-scale Fourier features (etaphi_emb.fourier_features:
        # K octaves) — absent from every reference config, so the default
        # path is exactly the reference architecture.  A plain MLP on raw
        # coordinates cannot express the subcell-pitch-scale structure the
        # SR target carries (it would need ~HR-granularity many linear
        # regions along eta); sin/cos at octave frequencies make the
        # intra-parent subcell position linearly available (the NeRF
        # positional-encoding remedy for coordinate-MLP spectral bias).
        n_fourier = int(cfg["etaphi_emb"].get("fourier_features", 0) or 0)
        if n_fourier:
            freqs = (2.0 ** jnp.arange(n_fourier)) * jnp.pi  # (K,) octaves
            phi_ang = jnp.arctan2(sinphi, cosphi).astype(jnp.float32)
            ang = jnp.concatenate(
                [eta.astype(jnp.float32) * freqs, phi_ang * freqs], axis=-1
            )  # (..., 2K)
            geo = jnp.concatenate([geo, jnp.sin(ang), jnp.cos(ang)], axis=-1)
        etaphi_emb = Dense.from_config(
            dict(cfg["etaphi_emb"], context_size=context_size),
            dtype=None,
            precision="highest",
            name="etaphi_emb_net",
        )(geo, context=time_emb.astype(jnp.float32), deterministic=deterministic)
        etaphi_emb = etaphi_emb.astype(self.dtype or etaphi_emb.dtype)

        e_proxy_emb = Dense.from_config(
            dict(cfg["e_proxy_emb"], context_size=context_size), dtype=self.dtype, name="proxy_emb_net"
        )(e_proxy, context=time_emb, deterministic=deterministic)

        cond_feat = jnp.concatenate([etaphi_emb, layer_emb, e_proxy_emb, e_proxy], axis=-1)

        # segment-packed batches (batch["seg"]: (B,S) int32, -1 = pad) carry
        # several events per row: the pooled conditioning context becomes
        # per-cell (each cell gets its own event's mean) and attention is
        # restricted to same-segment pairs (ops/flash_packed.py)
        seg = batch.get("seg")
        seg_onehot = None
        if seg is not None:
            from ..ops.flash_packed import SEG_ALIGN

            seg = seg.astype(jnp.int32)
            n_seg = seg.shape[1] // SEG_ALIGN  # packer aligns events to this
            seg_onehot = segment_onehot(seg, n_seg, cond_feat.dtype)  # (B,S,E)
            cond_seg = segment_mean(cond_feat, seg_onehot)  # (B, E, C)
        else:
            cond_feat_global = masked_mean(cond_feat, q_mask, axis=1, psum_axis=self.sp_axis)

        noisy_input_emb = Dense.from_config(
            dict(cfg["noisy_input_emb"], context_size=context_size),
            dtype=self.dtype,
            name="noisy_input_emb_net",
        )(noisy_input, context=time_emb, deterministic=deterministic)

        # context = [time_emb ‖ pooled conditional features] (flow_model.py:222)
        if seg is not None:
            # packed path: the context is constant within a segment, so the
            # adaLN modulation nets run per SEGMENT (B, E, ...) and their
            # outputs are scattered per cell with a one-hot matmul — the
            # per-cell context below feeds only the Dense concat paths
            B, E = seg_onehot.shape[0], seg_onehot.shape[2]
            time_seg = jnp.broadcast_to(time_emb[:, None, :], (B, E, time_emb.shape[-1]))
            context_seg = jnp.concatenate([time_seg, cond_seg], axis=-1)  # (B,E,Ctx)
            context = jnp.einsum("bse,bec->bsc", seg_onehot, context_seg)  # per-cell
        else:
            context_seg = None
            context = jnp.concatenate([time_emb, cond_feat_global], axis=-1)
        context_size_plus = context.shape[-1]

        feat_0 = jnp.concatenate([cond_feat, noisy_input_emb], axis=-1)
        feat = Dense.from_config(
            dict(cfg["feat_0_mlp"], context_size=context_size_plus), dtype=self.dtype, name="feat_0_mlp"
        )(feat_0, context=context, deterministic=deterministic)

        tcfg = cfg["transformer"]
        if tcfg["type"] == "DiT":
            feat = DiTEncoder(
                embed_dim=int(cfg["h_dim"]),
                num_layers=tcfg["num_transformer_layers"],
                num_heads=tcfg["num_heads"],
                dense_config=dict(tcfg["dense_config"]),
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                sp_axis=self.sp_axis,
                sp_mode=self.sp_mode,
                fused_prologue=self.fused_prologue,
                tp_axis=self.tp_axis,
                tp_size=self.tp_size,
                remat=self.remat,
                name="transformer",
            )(
                feat,
                q_valid=q_mask,
                context=context,
                context_seg=context_seg,
                seg_onehot=seg_onehot,
                segment_ids=seg,
                deterministic=deterministic,
            )
        elif tcfg["type"] == "GPT-2+Normformer":
            if seg is not None:
                raise NotImplementedError("segment packing requires the DiT transformer")
            if self.tp_size > 1:
                raise NotImplementedError("tensor parallelism requires the DiT transformer")
            feat = TransformerEncoder(
                embed_dim=int(cfg["h_dim"]),
                num_layers=tcfg["num_transformer_layers"],
                num_heads=tcfg["num_heads"],
                dense_config=dict(tcfg["dense_config"]),
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name="transformer",
            )(feat, valid=q_mask, context=context, deterministic=deterministic)
        else:
            raise ValueError(f"unknown transformer type {tcfg['type']!r}")

        # final skip connection with the conditional features (flow_model.py:241)
        feat = jnp.concatenate([feat, cond_feat], axis=-1)

        if cfg.get("final_modulation", False):
            mod = nn.Dense(
                2 * feat.shape[-1], kernel_init=xavier_uniform, dtype=self.dtype, name="v_t_adaLN_modulation"
            )(nn.silu(context_seg if context_seg is not None else context))
            if context_seg is not None:  # scatter per-segment mods to cells
                mod = jnp.einsum("bse,bef->bsf", seg_onehot, mod)
            v_t_shift, v_t_scale = jnp.split(mod, 2, axis=-1)
            feat = modulate(
                nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm_v_t")(feat), v_t_shift, v_t_scale
            )

        v_t = Dense.from_config(
            dict(cfg["v_t_pred"], context_size=context_size_plus), dtype=self.dtype, name="v_t_pred_net"
        )(feat, context=context, deterministic=deterministic)
        return v_t
