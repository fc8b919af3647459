"""Masked multi-head attention over padded variable-length sets.

Capability mirror of the reference MultiheadAttention /
ScaledDotProductAttention (models/attention.py:12-265): self/cross attention,
padding + adjacency masking, optional per-edge additive bias ``E`` and sigmoid
gate ``G`` derived from edge features, optional edge updates from raw scores,
optional output projection, dropout applied to scores *pre*-softmax (the
reference's quirk, models/attention.py:257).

TPU-first differences:
  * mask convention: True == valid (see ops/masked.py)
  * the hot path (no edges / bias / score return) can dispatch to a Pallas
    blockwise flash-attention kernel (`impl='flash'`); otherwise a fused-by-XLA
    einsum path is used.  Both consume the same parameters.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.masked import masked_softmax, merge_masks
from .dense import xavier_uniform


def _can_use_flash(edges, attn_bias, attn_valid, update_edges, dropout) -> bool:
    return (
        edges is None
        and attn_bias is None
        and attn_valid is None
        and not update_edges
        and dropout == 0.0
    )


class MultiheadAttention(nn.Module):
    embed_dim: int
    num_heads: int
    edge_embed_dim: int = 0
    q_dim: Optional[int] = None
    out_proj: bool = True
    update_edges: bool = False
    dropout: float = 0.0
    dtype: Any = None
    impl: str = "auto"  # 'xla' | 'flash' | 'flash_nomax' (inference-only) | 'auto'
    # sequence-parallel (context-parallel) mesh axis: when set, the token
    # axis of k/v arrives sharded and is either all-gathered over ICI
    # (sp_mode='gather') or rotated around the ring with online-softmax
    # accumulation (sp_mode='ring', ops/ring_attention.py) while queries
    # stay local
    sp_axis: Optional[str] = None
    sp_mode: str = "gather"  # 'gather' | 'ring'
    # tensor-parallel mesh axis (Megatron attention split): this module then
    # holds a HEAD-sharded slice — ``num_heads``/``embed_dim`` are the LOCAL
    # counts, ``q_dim`` the full model width.  Q/K/V are column-parallel,
    # the output projection is row-parallel: its partial products psum over
    # ``tp_axis``.  The caller shards the kernels and pre-divides the output
    # bias by the axis size (parallel/tp.py).
    tp_axis: Optional[str] = None

    def setup(self):
        if self.embed_dim % self.num_heads:
            raise ValueError(f"embed_dim {self.embed_dim} not divisible by {self.num_heads} heads")
        if self.edge_embed_dim % max(self.num_heads, 1):
            raise ValueError("edge_embed_dim must be divisible by num_heads")
        if self.tp_axis is not None:
            if not self.out_proj:
                raise ValueError("tp_axis requires out_proj (row-parallel reduce point)")
            if self.edge_embed_dim > 0:
                raise ValueError("tp_axis does not support edge features")
            if self.dropout > 0.0:
                raise ValueError("tp_axis: score dropout would desync shards")
        dense = lambda feats, name: nn.Dense(  # noqa: E731
            feats, kernel_init=xavier_uniform, dtype=self.dtype, name=name
        )
        self.linear_q = dense(self.embed_dim, "linear_q")
        self.linear_k = dense(self.embed_dim, "linear_k")
        self.linear_v = dense(self.embed_dim, "linear_v")
        if self.edge_embed_dim > 0:
            self.linear_e = dense(self.num_heads, "linear_e")
            self.linear_g = dense(self.num_heads, "linear_g")
            if self.update_edges:
                self.linear_e_out = dense(self.edge_embed_dim, "linear_e_out")
        if self.out_proj:
            self.linear_out = dense(self.q_dim or self.embed_dim, "linear_out")

    def __call__(
        self,
        q,
        k=None,
        v=None,
        edges=None,
        q_valid=None,
        kv_valid=None,
        attn_valid=None,
        attn_bias=None,
        segment_ids=None,
        fused_ln=None,
        deterministic: bool = True,
    ):
        """q/k/v: (B, L, F). Masks are True==valid. Returns (B, Lq, q_dim or
        embed_dim); with ``edges`` given, returns (out, edge_out).

        ``segment_ids`` (B, L) int32 (-1 = pad): segment-packed self-
        attention — cells attend only within their own event.  Dispatches
        to the banded Pallas kernel (ops/flash_packed.py) on TPU-friendly
        shapes, else to the einsum path with a segment-equality mask.

        ``fused_ln`` (eff_a, eff_b): self-attention prologue fusion — ``q``
        arrives RAW (pre-norm) and the LayerNorm + adaLN modulate + QKV
        projections run as one Pallas pass (ops/fused_qkv.py) emitting the
        flash kernel's transposed layout directly.  eff_a/eff_b are the
        folded affine coefficients (B, F).  Caller guarantees self-attention
        with padding masks only."""
        if fused_ln is not None:
            # enforce the full contract, not just the mask subset: silently
            # ignoring k/v (cross-attention), a sharded kv axis, or active
            # score dropout would return plausible-shaped but wrong output
            # (code-review r3)
            if (
                edges is not None
                or attn_bias is not None
                or attn_valid is not None
                or k is not None
                or v is not None
                or self.sp_axis is not None
                or self.tp_axis is not None
                or (self.dropout > 0.0 and not deterministic)
            ):
                raise ValueError(
                    "fused_ln supports padding-masked self-attention only "
                    "(no k/v, edges, attn_bias/valid, sp_axis, tp_axis, or active dropout)"
                )
            return self._fused_self_attention(q, q_valid, fused_ln, segment_ids)
        if self.tp_axis is not None:
            # Megatron 'f' at the column-parallel Q/K/V entry: identity fwd,
            # psum bwd (ops/tp.py).  Applied before the k=q aliasing so one
            # boundary covers all three self-attention projections.
            from ..ops.tp import tp_block_input

            q = tp_block_input(q, self.tp_axis)
            if k is not None:
                k = tp_block_input(k, self.tp_axis)
            if v is not None:
                v = tp_block_input(v, self.tp_axis)
        if k is None:
            k = q
            if kv_valid is None:
                kv_valid = q_valid
        if v is None:
            v = k

        B, Lq, _ = q.shape
        Lk = k.shape[1]
        H, HD = self.num_heads, self.embed_dim // self.num_heads
        scale = math.sqrt(HD)

        q_p = self.linear_q(q).reshape(B, Lq, H, HD)
        k_p = self.linear_k(k).reshape(B, Lk, H, HD)
        v_p = self.linear_v(v).reshape(B, Lk, H, HD)

        if self.sp_axis is not None and self.sp_mode == "ring":
            if edges is not None or attn_bias is not None or attn_valid is not None:
                raise NotImplementedError("ring attention supports padding masks only")
            from ..ops.ring_attention import ring_masked_attention

            out = ring_masked_attention(
                q_p, k_p, v_p, q_valid, kv_valid, 1.0 / scale, self.sp_axis
            ).reshape(B, Lq, self.embed_dim)
            return self._project_out(out)

        if self.sp_axis is not None:
            # gather the sharded token axis of keys/values across the mesh;
            # queries stay local (output token axis remains sharded)
            k_p = jax.lax.all_gather(k_p, self.sp_axis, axis=1, tiled=True)
            v_p = jax.lax.all_gather(v_p, self.sp_axis, axis=1, tiled=True)
            if kv_valid is not None:
                kv_valid = jax.lax.all_gather(kv_valid, self.sp_axis, axis=1, tiled=True)
            Lk = k_p.shape[1]

        # Edge features -> additive bias E and sigmoid gate G (attention.py:188-203)
        if edges is not None:
            e = self.linear_e(edges)  # (B, Lq, Lk, H)
            attn_bias = e if attn_bias is None else attn_bias + e
            g = nn.sigmoid(self.linear_g(edges))  # (B, Lq, Lk, H)

        if segment_ids is not None:
            if edges is not None or attn_bias is not None or attn_valid is not None:
                raise NotImplementedError("segment packing supports padding masks only")
            if self.sp_axis is not None:
                raise NotImplementedError("segment packing and sequence parallelism are exclusive")
            from ..ops.flash_packed import packed_flash_attention, packed_shapes_ok

            if self.impl != "xla" and packed_shapes_ok(Lq, HD) and (
                self.impl in ("flash", "flash_nomax") or jax.default_backend() == "tpu"
            ):
                out = packed_flash_attention(
                    q_p, k_p, v_p, segment_ids, scale=1.0 / scale,
                    softmax="nomax_clip" if self.impl == "flash_nomax" else "max",
                ).reshape(B, Lq, self.embed_dim)
                return self._project_out(out)
            # einsum fallback: block-diagonal mask from segment equality
            attn_valid = (segment_ids[:, :, None] == segment_ids[:, None, :]) & (
                segment_ids >= 0
            )[:, None, :]

        use_flash = self.impl != "xla" and _can_use_flash(
            edges, attn_bias, attn_valid, self.update_edges, self.dropout
        )
        if use_flash and (
            self.impl in ("flash", "flash_nomax") or jax.default_backend() == "tpu"
        ):
            from ..ops.flash_attention import masked_flash_attention

            out = masked_flash_attention(
                q_p, k_p, v_p, q_valid, kv_valid, scale=1.0 / scale,
                # inference-only clipped-exp2 softmax (no running max);
                # validated per checkpoint via nomax_selfcheck
                softmax="nomax_clip" if self.impl == "flash_nomax" else "max",
            )
            out = out.reshape(B, Lq, self.embed_dim)
            return self._project_out(out)

        mask = merge_masks(q_valid, kv_valid, attn_valid, Lq, Lk)  # (B, Lq, Lk) or None

        scores = jnp.einsum("bqhd,bkhd->bhqk", q_p, k_p) / scale
        if attn_bias is not None:  # (B, Lq, Lk, H) -> (B, H, Lq, Lk)
            scores = scores + jnp.transpose(attn_bias, (0, 3, 1, 2))

        # dropout on raw scores pre-softmax — the reference's behaviour
        # (models/attention.py:257); all shipped configs use dropout 0.
        if self.dropout > 0.0 and not deterministic:
            scores = nn.Dropout(self.dropout, deterministic=False, name="score_dropout")(scores)

        weights = masked_softmax(scores, mask[:, None] if mask is not None else None, axis=-1)

        if edges is not None:
            weights = weights * jnp.transpose(g, (0, 3, 1, 2))

        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v_p).reshape(B, Lq, self.embed_dim)
        out = self._project_out(out)

        if edges is not None:
            edge_out = None
            if self.update_edges:
                edge_out = self.linear_e_out(jnp.transpose(scores, (0, 2, 3, 1)))
            return out, edge_out
        return out

    def _project_out(self, out):
        """Output projection; under tensor parallelism the row-parallel
        partial products all-reduce over ``tp_axis`` via Megatron's 'g'
        (psum fwd / identity bwd, ops/tp.py — a plain lax.psum would
        inflate crossing cotangents by the axis size).  The output bias
        arrives pre-divided by the axis size (parallel/tp.py), so the
        reduce reconstitutes it exactly once."""
        if self.out_proj:
            out = self.linear_out(out)
        if self.tp_axis is not None:
            from ..ops.tp import tp_allreduce

            out = tp_allreduce(out, self.tp_axis)
        return out

    def _fused_self_attention(self, x, valid, fused_ln, segment_ids=None):
        """Fused-prologue self-attention: LN + modulate + QKV in one Pallas
        pass (ops/fused_qkv.py) straight into the transposed flash kernel —
        the padding-masked kernel for bucketed batches, the banded
        segment-packed kernel when ``segment_ids`` is given (eff_a/eff_b are
        then per-cell (B, L, F) rows).  Falls back to an equivalent unfused
        formulation when the shape gates fail, so the caller never needs a
        second code path."""
        from ..ops.flash_attention import (
            LOG2E,
            flash_shapes_ok,
            masked_flash_attention,
            masked_flash_attention_T,
        )
        from ..ops.fused_qkv import LN_EPS, fused_ln_mod_proj, fused_qkv_ok

        eff_a, eff_b = fused_ln
        B, L, F = x.shape
        H, HD = self.num_heads, self.embed_dim // self.num_heads
        scale = 1.0 / math.sqrt(HD)
        softmax = "nomax_clip" if self.impl == "flash_nomax" else "max"
        dt = self.dtype or x.dtype
        packed = segment_ids is not None
        if packed:
            from ..ops.flash_packed import (
                PAD_SEG,
                packed_flash_attention,
                packed_flash_attention_T,
                packed_shapes_ok,
            )

            kernel_shapes_ok = packed_shapes_ok(L, HD)
        else:
            kernel_shapes_ok = flash_shapes_ok(L, L, HD)

        fuse_ok = (
            not self.is_initializing()
            and self.impl != "xla"
            and fused_qkv_ok(L, F)
            and kernel_shapes_ok
            and (self.impl in ("flash", "flash_nomax") or jax.default_backend() == "tpu")
        )
        if fuse_ok:
            pq = self.linear_q.variables["params"]
            pk = self.linear_k.variables["params"]
            pv = self.linear_v.variables["params"]
            c = jnp.asarray(scale * LOG2E, pq["kernel"].dtype)
            w = jnp.concatenate(
                [pq["kernel"] * c, pk["kernel"], pv["kernel"]], axis=1
            ).astype(dt)  # (F, 3F), flash pre-scale folded into the Q columns
            bias = jnp.concatenate([pq["bias"] * c, pk["bias"], pv["bias"]])[:, None]
            qkvT = fused_ln_mod_proj(x.astype(dt), eff_a, eff_b, w, bias)
            qkvT = qkvT.reshape(B, 3, H, HD, L)
            if packed:
                outT = packed_flash_attention_T(
                    qkvT[:, 0], qkvT[:, 1], qkvT[:, 2], segment_ids, softmax=softmax
                )
            else:
                outT = masked_flash_attention_T(
                    qkvT[:, 0], qkvT[:, 1], qkvT[:, 2], valid, valid, softmax=softmax
                )
            out = jnp.transpose(outT, (0, 3, 1, 2)).reshape(B, L, self.embed_dim)
        else:
            # unfused equivalent: parameter-free LN + folded affine, then the
            # standard projection / attention path (also the init-time path,
            # which creates the very params the fused branch reads)
            xf = x.astype(jnp.float32)
            mu = xf.mean(-1, keepdims=True)
            xc = xf - mu
            var = (xc * xc).mean(-1, keepdims=True)
            xhat = xc * jax.lax.rsqrt(var + LN_EPS)
            a3 = eff_a if eff_a.ndim == 3 else eff_a[:, None, :]
            b3 = eff_b if eff_b.ndim == 3 else eff_b[:, None, :]
            y = (xhat * a3 + b3).astype(dt)
            q_p = self.linear_q(y).reshape(B, L, H, HD)
            k_p = self.linear_k(y).reshape(B, L, H, HD)
            v_p = self.linear_v(y).reshape(B, L, H, HD)
            if packed and kernel_shapes_ok and (
                self.impl in ("flash", "flash_nomax") or jax.default_backend() == "tpu"
            ) and self.impl != "xla":
                out = packed_flash_attention(
                    q_p, k_p, v_p, segment_ids, scale=scale, softmax=softmax
                ).reshape(B, L, self.embed_dim)
            elif packed:
                # einsum fallback with the segment-equality mask (mirrors the
                # unfused packed fallback in __call__)
                seg = segment_ids
                seg_mask = (seg[:, :, None] == seg[:, None, :]) & (
                    seg != PAD_SEG
                )[:, None, :]
                scores = jnp.einsum("bqhd,bkhd->bhqk", q_p, k_p) * scale
                weights = masked_softmax(scores, seg_mask[:, None], axis=-1)
                out = jnp.einsum("bhqk,bkhd->bqhd", weights, v_p).reshape(
                    B, L, self.embed_dim
                )
            elif kernel_shapes_ok and (
                self.impl in ("flash", "flash_nomax") or jax.default_backend() == "tpu"
            ) and self.impl != "xla":
                out = masked_flash_attention(
                    q_p, k_p, v_p, valid, valid, scale=scale, softmax=softmax
                ).reshape(B, L, self.embed_dim)
            else:
                # einsum fallback mirroring __call__'s dispatch gates: on the
                # CPU backend (or impl='xla') the Pallas kernel would run in
                # interpret mode, which is orders of magnitude slower
                # (code-review r3)
                scores = jnp.einsum("bqhd,bkhd->bhqk", q_p, k_p) * scale
                vmask = (
                    None
                    if valid is None
                    else (valid[:, :, None] & valid[:, None, :])[:, None]
                )
                weights = masked_softmax(scores, vmask, axis=-1)
                out = jnp.einsum("bhqk,bkhd->bqhd", weights, v_p).reshape(
                    B, L, self.embed_dim
                )
        if self.out_proj:
            out = self.linear_out(out)
        return out
