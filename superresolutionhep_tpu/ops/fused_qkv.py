"""Fused LayerNorm + adaLN-modulate + QKV-projection Pallas kernel.

The DiT attention prologue is `modulate(norm1(x), shift, scale)` followed by
three (F, F) projections and a layout transpose into the flash kernel's
(B, H, D, L) layout (models/dit.py, models/attention.py).  Executed by XLA
that chain costs several full HBM passes over the (B, L, F) activation
between matmuls — the round-3 trace attributed ~15-23% of non-attention eval
time to exactly these elementwise/layout passes (BASELINE.md round-3
attribution; the reference pays the same passes eagerly in torch,
models/diffusion_transformer.py:30-36).

This kernel reads the raw activation block ONCE, computes the row statistics
in fp32, applies the folded affine, and feeds the MXU directly, emitting the
TRANSPOSED (3F, L) projection block the flash kernel wants — no normalized
tensor, no per-projection re-read, no separate layout transpose ever touches
HBM.

Folding: with LayerNorm params (gamma, beta) and adaLN modulation
(shift, scale), `modulate(LN(x)) = xhat * eff_a + eff_b` where

    eff_a = gamma * (1 + scale)          # (B, F) — or (B, L, F) packed
    eff_b = beta  * (1 + scale) + shift

so the kernel only needs the normalized xhat and two broadcast coefficient
rows.  The flash softmax pre-scale (1/sqrt(D) * log2(e)) is folded into the
Q columns of the weight by the caller — the kernel output IS qT_pre.

Differentiable: custom VJP whose backward recomputes through the jnp
reference formulation (one extra forward — the fused path is an inference
default; training uses it only when explicitly enabled).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# single source for the TPU block-divisor heuristic and the backend gate
# (code-review r3: forked copies would drift from the flash kernel's rules);
# fused_mlp.py re-imports these names from here
from .flash_attention import _interpret, _largest_block  # noqa: E402

# torch LayerNorm default eps — matches models/dense.py::LN_EPS (norm1/norm2
# in the DiT layer are built with it)
LN_EPS = 1e-5

MAX_BLOCK_L = 512


def fused_qkv_ok(L: int, F: int) -> bool:
    """Shape gate: F on full lanes, L splittable into 128-aligned blocks,
    F small enough that a (BL, F) tile plus the (F, 3F) weight fit VMEM."""
    return F % 128 == 0 and F <= 1024 and _largest_block(L, MAX_BLOCK_L) is not None


def _kernel(x_ref, a_ref, b_ref, w_ref, bias_ref, o_ref, *, per_cell: bool):
    """Grid (B, nL).  Blocks: x (1, BL, F); a/b (1, 1, F) over a (B, 1, F)
    view — or (1, BL, F) when the modulation is per-cell (segment-packed
    rows); w (F, O) full; bias (O, 1) full; o (1, O, BL)."""
    x = x_ref[0].astype(jnp.float32)  # (BL, F)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xhat = xc * lax.rsqrt(var + LN_EPS)
    if per_cell:
        a = a_ref[0].astype(jnp.float32)  # (BL, F)
        b = b_ref[0].astype(jnp.float32)
    else:
        a = a_ref[0].astype(jnp.float32)  # (1, F) broadcast over rows
        b = b_ref[0].astype(jnp.float32)
    y = xhat * a + b
    w = w_ref[...]  # (F, O)
    # (O, BL) = w^T @ y^T in one full-depth MXU pass: contraction over all F
    # lanes, output already in the flash kernel's transposed layout
    o = lax.dot_general(
        w, y.astype(w.dtype), (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = (o + bias_ref[...]).astype(o_ref.dtype)


def _ref_ln_mod_proj(x, a, b, w, bias):
    """jnp reference: modulate(LN_noparam(x), ...) @ w + bias, transposed out.
    Ground truth for tests and the custom-VJP backward."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    xc = xf - mu
    var = (xc * xc).mean(-1, keepdims=True)
    xhat = xc * lax.rsqrt(var + LN_EPS)
    a3 = a if a.ndim == 3 else a[:, None, :]
    b3 = b if b.ndim == 3 else b[:, None, :]
    y = xhat * a3.astype(jnp.float32) + b3.astype(jnp.float32)
    o = jnp.einsum("blf,fo->bol", y.astype(w.dtype), w, preferred_element_type=jnp.float32)
    return (o + bias[None]).astype(x.dtype)


def _pallas_ln_mod_proj(x, a, b, w, bias):
    B, L, F = x.shape
    O = w.shape[1]
    BL = _largest_block(L, MAX_BLOCK_L)
    per_cell = a.ndim == 3
    grid = (B, L // BL)
    if per_cell:
        ab_spec = pl.BlockSpec((1, BL, F), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM)
    else:
        # TPU sublane rule: a (1, F) block over (B, F) is illegal (second-to-
        # last block dim 1 != B and not 8-divisible); feed the rows as
        # (B, 1, F) so the (1, 1, F) block's last two dims match the array
        a = a[:, None, :]
        b = b[:, None, :]
        ab_spec = pl.BlockSpec((1, 1, F), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, per_cell=per_cell),
        out_shape=jax.ShapeDtypeStruct((B, O, L), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BL, F), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            ab_spec,
            ab_spec,
            pl.BlockSpec((F, O), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((O, 1), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, O, BL), lambda bi, i: (bi, 0, i), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * F * O + 8 * B * L * F,
            bytes_accessed=x.size * x.dtype.itemsize
            + B * O * L * x.dtype.itemsize
            + (L // BL) * w.size * w.dtype.itemsize,
            transcendentals=B * L,  # rsqrt per row
        ),
        interpret=_interpret(),
    )(x, a, b, w, bias)


@jax.custom_vjp
def fused_ln_mod_proj(x, a, b, w, bias):
    """modulate(LN(x), ...) @ w + bias with transposed (B, O, L) output.

    x: (B, L, F) activations; a/b: (B, F) folded affine coefficients (or
    (B, L, F) per-cell for packed rows); w: (F, O); bias: (O, 1).
    The LN here is parameter-free — fold gamma/beta into a/b (module doc).
    """
    return _pallas_ln_mod_proj(x, a, b, w, bias)


def _vjp_fwd(x, a, b, w, bias):
    return _pallas_ln_mod_proj(x, a, b, w, bias), (x, a, b, w, bias)


def _vjp_bwd(res, g):
    # one recomputed reference forward; exactness of the cotangents against
    # the unfused graph is what training parity tests check
    _, vjp = jax.vjp(_ref_ln_mod_proj, *res)
    return vjp(g)


fused_ln_mod_proj.defvjp(_vjp_fwd, _vjp_bwd)
