"""Fused DiT MLP half-layer: residuals, norms, modulation and both MLP
matmuls in one Pallas pass.

Companion to ops/fused_qkv.py (the attention prologue).  Everything a DiT
layer does AFTER the attention output projection is a chain of elementwise
passes wrapped around two (F, F) matmuls (models/dit.py:101-112, mirroring
the reference models/diffusion_transformer.py:30-36 + models/dense.py:55-75):

    h  = q + gate_msa * attn_out                  # gated residual
    u  = modulate(norm2(h), shift_mlp, scale_mlp) # affine LN (gamma2/beta2)
    u2 = LN_noaffine(u)                           # Dense's internal pre-
    z  = leaky_relu(u2 @ W0 + b0)                 #   linear norm (dense.py)
    z2 = leaky_relu(z @ W1 + b1)
    q' = h + gate_mlp * z2                        # gated residual

Executed by XLA that chain round-trips the (B, L, F) activation through HBM
several times between the two matmuls.  Here one kernel reads the q and
attn_out blocks once, keeps every intermediate in VMEM, and writes the new
q block once.

Folding (as in fused_qkv): with norm2 params (gamma2, beta2),
`modulate(norm2(h), shift, scale) = hhat * eff_a + eff_b` where
eff_a = gamma2 * (1 + scale), eff_b = beta2 * (1 + scale) + shift.

Shape contract: the production DiT MLP exactly — one hidden layer,
pre-linear parameter-free LayerNorm, LeakyReLU(0.01) activations, no
context concat, dropout 0 (configs/*/model_and_var.yml transformer
dense_config).  The caller gates on that config and falls back to the
standard path otherwise.

Differentiable via custom VJP through the jnp reference (one recomputed
forward in the backward — the fused path is an inference default).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_qkv import LN_EPS, MAX_BLOCK_L, _interpret, _largest_block

LRELU_SLOPE = 0.01  # torch default — models/dense.py ACTIVATIONS


def fused_mlp_ok(L: int, F: int, Fh: int) -> bool:
    return (
        F % 128 == 0
        and Fh % 128 == 0
        and max(F, Fh) <= 1024
        and _largest_block(L, MAX_BLOCK_L) is not None
    )


def _ln(x):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * lax.rsqrt(var + LN_EPS)


def _lrelu(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


def _kernel(
    q_ref, att_ref, ga_ref, a_ref, b_ref, gm_ref, w0_ref, b0_ref, w1_ref, b1_ref, o_ref,
    *, per_cell: bool,
):
    """Grid (B, nL).  Blocks: q/attn (1, BL, F); gate/affine rows (1, 1, F)
    over a (B, 1, F) view — or (1, BL, F) when the modulation is per-cell
    (segment-packed rows); w0 (F, Fh); b0 (1, Fh); w1 (Fh, F); b1 (1, F);
    o (1, BL, F)."""
    q = q_ref[0].astype(jnp.float32)  # (BL, F)
    att = att_ref[0].astype(jnp.float32)
    if per_cell:
        ga = ga_ref[0].astype(jnp.float32)  # (BL, F)
        a = a_ref[0].astype(jnp.float32)
        b = b_ref[0].astype(jnp.float32)
        gm = gm_ref[0].astype(jnp.float32)
    else:
        ga = ga_ref[0].astype(jnp.float32)  # (1, F) row broadcast
        a = a_ref[0].astype(jnp.float32)
        b = b_ref[0].astype(jnp.float32)
        gm = gm_ref[0].astype(jnp.float32)
    h = q + ga * att
    u = _ln(h) * a + b
    u2 = _ln(u)
    w0 = w0_ref[...]
    z = lax.dot_general(
        u2.astype(w0.dtype), w0, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    z = _lrelu(z + b0_ref[...].astype(jnp.float32))
    w1 = w1_ref[...]
    z2 = lax.dot_general(
        z.astype(w1.dtype), w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    z2 = _lrelu(z2 + b1_ref[...].astype(jnp.float32))
    o_ref[0] = (h + gm * z2).astype(o_ref.dtype)


def _row3(r):
    """(B, F) row -> broadcastable (B, 1, F); per-cell (B, L, F) unchanged."""
    return r if r.ndim == 3 else r[:, None, :]


def _ref_dit_mlp(q, attn_out, gate_a, eff_a, eff_b, gate_m, w0, b0, w1, b1):
    """jnp ground truth (tests + custom-VJP backward)."""
    qf = q.astype(jnp.float32)
    h = qf + _row3(gate_a).astype(jnp.float32) * attn_out.astype(jnp.float32)
    u = _ln(h) * _row3(eff_a).astype(jnp.float32) + _row3(eff_b).astype(jnp.float32)
    u2 = _ln(u)
    z = jnp.einsum("blf,fh->blh", u2.astype(w0.dtype), w0, preferred_element_type=jnp.float32)
    z = _lrelu(z + b0[None, None].astype(jnp.float32))
    z2 = jnp.einsum("blh,hf->blf", z.astype(w1.dtype), w1, preferred_element_type=jnp.float32)
    z2 = _lrelu(z2 + b1[None, None].astype(jnp.float32))
    return (h + _row3(gate_m).astype(jnp.float32) * z2).astype(q.dtype)


def _pallas_dit_mlp(q, attn_out, gate_a, eff_a, eff_b, gate_m, w0, b0, w1, b1):
    B, L, F = q.shape
    Fh = w0.shape[1]
    BL = _largest_block(L, MAX_BLOCK_L)
    per_cell = gate_a.ndim == 3
    grid = (B, L // BL)
    blk = pl.BlockSpec((1, BL, F), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM)
    if per_cell:
        row = blk
    else:
        # TPU sublane rule: (1, F) blocks over (B, F) rows are illegal; lift
        # the folded rows to (B, 1, F) and block (1, 1, F) (see fused_qkv.py)
        gate_a = gate_a[:, None, :]
        eff_a = eff_a[:, None, :]
        eff_b = eff_b[:, None, :]
        gate_m = gate_m[:, None, :]
        row = pl.BlockSpec((1, 1, F), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, per_cell=per_cell),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            blk,
            blk,
            row,
            row,
            row,
            row,
            pl.BlockSpec((F, Fh), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fh), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Fh, F), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=blk,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * F * Fh * 2 + 16 * B * L * F,
            bytes_accessed=3 * q.size * q.dtype.itemsize
            + (L // BL) * (w0.size + w1.size) * w0.dtype.itemsize,
            transcendentals=2 * B * L,
        ),
        interpret=_interpret(),
    )(q, attn_out, gate_a, eff_a, eff_b, gate_m, w0, b0.reshape(1, Fh), w1, b1.reshape(1, F))


@jax.custom_vjp
def fused_dit_mlp(q, attn_out, gate_a, eff_a, eff_b, gate_m, w0, b0, w1, b1):
    """One-pass DiT MLP half-layer (module docstring).  q/attn_out:
    (B, L, F); gate_a/eff_a/eff_b/gate_m: (B, F) folded rows — or per-cell
    (B, L, F) for segment-packed rows; w0: (F, Fh); b0: (Fh,); w1: (Fh, F);
    b1: (F,).  Returns the layer's new q."""
    return _pallas_dit_mlp(q, attn_out, gate_a, eff_a, eff_b, gate_m, w0, b0, w1, b1)


def _vjp_fwd(*args):
    return _pallas_dit_mlp(*args), args


def _vjp_bwd(res, g):
    _, vjp = jax.vjp(_ref_dit_mlp, *res)
    return vjp(g)


fused_dit_mlp.defvjp(_vjp_fwd, _vjp_bwd)


def mlp_config_fusable(dense_config: dict) -> bool:
    """True iff the Dense config matches the kernel's fixed chain: one
    hidden layer, LayerNorm pre-linear norm, LeakyReLU activations (hidden
    and final), no dropout, no final-layer norm, no context concat."""
    return (
        list(dense_config.get("hidden_layers", ()) or ()) != []
        and len(dense_config.get("hidden_layers")) == 1
        and dense_config.get("norm_layer") == "LayerNorm"
        and not dense_config.get("norm_final_layer", False)
        and dense_config.get("activation") == "LeakyReLU"
        and dense_config.get("final_activation") == "LeakyReLU"
        and not float(dense_config.get("dropout", 0.0) or 0.0)
        and not int(dense_config.get("context_size", 0) or 0)
    )
