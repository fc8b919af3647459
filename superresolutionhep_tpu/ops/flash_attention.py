"""Pallas TPU blockwise masked flash attention (forward + backward).

This is the hot kernel of both pipeline stages: masked self/cross attention
over padded variable-length cell sets (up to ~3.5k cells/event in the
multipart dataset).  The reference materialises the full (B,H,L,L) score
tensor (models/attention.py:250-260); here the online-softmax blockwise
formulation keeps O(BQ x BK) live in VMEM, streams K/V blocks through the
grid, and never writes the score matrix to HBM — in either direction:
the backward pass is two Pallas kernels (dq; dk/dv) that recompute scores
blockwise from the saved log-sum-exp, so training memory is O(L) too.

Performance notes (TPU v5e):
  * large forward blocks (default 1024x1024, swept empirically) so each grid
    step feeds the MXU enough work; backward uses 512x512 (4 live (BQ,BK)
    f32 temporaries per step);
  * fully-padded Q/K blocks skip all compute, so cost tracks the actual
    event length under bucketed padding;
  * the softmax runs in base-2: the scale and log2(e) are folded into Q
    *outside* the kernel (O(L*D) elementwise, XLA-fused into the projection)
    so the kernel never multiplies the (BQ,BK) score tile by a scalar;
  * the padding mask is applied as an *additive bias* built from the mask
    row ((km-1)*BIG, O(BK) work) — one VPU add per score element instead of
    compare+select;
  * fp32 accumulation via preferred_element_type; bf16 inputs run the exp in
    bf16 (packed VPU lanes).

Supported fast path: padding masks only (no adjacency mask / edge bias /
score dropout) — exactly the configuration every shipped config uses.  The
general path stays on the XLA einsum implementation (attention.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
BIG = 1e30

DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024
DEFAULT_BWD_BLOCK = 512

LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453


def _pick_block(n: int, preferred: int) -> Optional[int]:
    for b in (preferred, 1024, 512, 256, 128, 64, 32, 16, 8):
        if b <= preferred and n % b == 0:
            return b
    return None


def flash_shapes_ok(Lq: int, Lk: int, d: int) -> bool:
    return (
        _pick_block(Lq, DEFAULT_BLOCK_Q) is not None
        and _pick_block(Lk, DEFAULT_BLOCK_K) is not None
        and d % 8 == 0
    )


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref, k_ref, v_ref, km_ref, qm_ref, o_ref, *rest, softmax_bf16, with_lse
):
    if with_lse:
        lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        lse_ref, (m_scr, l_scr, acc_scr) = None, rest
    """Grid (B, H, nQ, nK) with nK innermost/sequential; online-softmax carry
    lives in VMEM scratch across the K-block sweep.

    Q arrives pre-scaled by scale*log2(e), so scores are base-2 logits
    straight off the MXU.  Emits the base-2 log-sum-exp per query row
    ((B, H, Lq, 1) layout: backward blocks read it as a (BQ, 1) column).
    """
    j = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    km = km_ref[0]  # (1, BK) float
    qm = qm_ref[0]  # (1, BQ) float
    block_live = (jnp.sum(km) > 0) & (jnp.sum(qm) > 0)

    @pl.when(block_live)
    def _update():
        q = q_ref[0, 0]  # (BQ, D) pre-scaled
        k = k_ref[0, 0]  # (BK, D)
        v = v_ref[0, 0]  # (BK, D)

        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s + (km - 1.0) * BIG  # additive padding bias: one VPU add/elt

        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
        if softmax_bf16:
            # bf16 exp for bf16 inputs: ~10% kernel speedup, ~3e-4 mean
            # relative output error (2 ulps at bf16) — below sampler noise
            p = jnp.exp2((s - m_new).astype(jnp.bfloat16))
            p_sum = p.astype(jnp.float32).sum(axis=-1, keepdims=True)
        else:
            p = jnp.exp2(s - m_new)
            p_sum = p.sum(axis=-1, keepdims=True)
        alpha = jnp.exp2(m_prev - m_new)
        l_scr[:] = l_scr[:] * alpha + p_sum
        acc_scr[:] = acc_scr[:] * alpha + lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_scr[:] = m_new

    @pl.when(j == n_k - 1)
    def _finalize():
        l = l_scr[:]
        out = acc_scr[:] / jnp.maximum(l, 1e-30)
        out = out * (jnp.transpose(qm) > 0)  # zero padded queries
        o_ref[0, 0] = out.astype(o_ref.dtype)
        if with_lse:
            # base-2 LSE; NEG_INF rows (no valid key anywhere) stay hugely
            # negative, and backward skips dead blocks before exponentiating
            lse_ref[0, 0] = m_scr[:] + jnp.log2(jnp.maximum(l, 1e-30))


def _flash_fwd(q, k, v, qm, km, with_lse=True):
    """q (pre-scaled by scale*log2e), k, v: (B,H,L,D); qm: (B,1,Lq) float;
    km: (B,1,Lk) float.  Returns (out, lse) with lse shaped (B, H, Lq, 1)
    (trailing singleton keeps the TPU tile rule and reads back as a (BQ, 1)
    column in the backward kernels).  The pure-inference path skips the LSE
    residual entirely (``with_lse=False``): the degenerate-lane (BQ, 1)
    store per q-block costs real wall-time on TPU."""
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    BQ = _pick_block(Lq, DEFAULT_BLOCK_Q)
    # wider K blocks amortise per-step overhead; bf16 only — the fp32 path's
    # (BQ, BK) f32 score+prob tiles would blow the 16 MB VMEM budget
    BK = _pick_block(Lk, 2048 if q.dtype == jnp.bfloat16 and D <= 64 else DEFAULT_BLOCK_K)

    out_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    out_spec = pl.BlockSpec(
        (1, 1, BQ, D), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM
    )
    if with_lse:
        out_shape = (out_shape, jax.ShapeDtypeStruct((B, H, Lq, 1), jnp.float32))
        out_spec = (
            out_spec,
            pl.BlockSpec((1, 1, BQ, 1), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM),
        )

    grid = (B, H, Lq // BQ, Lk // BK)
    res = pl.pallas_call(
        functools.partial(
            _fwd_kernel, softmax_bf16=q.dtype == jnp.bfloat16, with_lse=with_lse
        ),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, BQ, D), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BK, D), lambda b, h, i, j: (b, h, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BK, D), lambda b, h, i, j: (b, h, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BK), lambda b, h, i, j: (b, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BQ), lambda b, h, i, j: (b, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((BQ, 1), jnp.float32),
            pltpu.VMEM((BQ, 1), jnp.float32),
            pltpu.VMEM((BQ, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lq * Lk * D,
            bytes_accessed=4 * (q.size + k.size * (Lq // BQ) + v.size * (Lq // BQ) + q.size),
            transcendentals=B * H * Lq * Lk,
        ),
        interpret=_interpret(),
    )(q, k, v, km, qm)
    return res if with_lse else (res, None)


# ---------------------------------------------------------------------------
# backward kernels: blockwise recompute from LSE (O(L) memory)
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, g_ref, lse_ref, dl_ref, km_ref, qm_ref, dq_ref, dq_scr, *, bf16
):
    """Grid (B, H, nQ, nK), K innermost; dq accumulates in VMEM scratch.

    p is recomputed exactly as exp2(s - lse): one matmul + exp per block,
    never materialising (Lq, Lk).  g must arrive pre-masked by qm.
    """
    j = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    km = km_ref[0]  # (1, BK)
    qm = qm_ref[0]  # (1, BQ)
    block_live = (jnp.sum(km) > 0) & (jnp.sum(qm) > 0)

    @pl.when(block_live)
    def _update():
        q = q_ref[0, 0]  # (BQ, D) pre-scaled
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        g = g_ref[0, 0]  # (BQ, D), qm-masked
        lse = lse_ref[0, 0]  # (BQ, 1)
        dl = dl_ref[0, 0]  # (BQ, 1)  = sum_d(out * g)

        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) + (km - 1.0) * BIG
        if bf16:
            p = jnp.exp2((s - lse).astype(jnp.bfloat16)).astype(jnp.float32)
        else:
            p = jnp.exp2(s - lse)
        dp = lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - dl)
        dq_scr[:] += lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(j == n_k - 1)
    def _finalize():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, g_ref, lse_ref, dl_ref, km_ref, qm_ref,
    dk_ref, dv_ref, dk_scr, dv_scr, *, bf16,
):
    """Grid (B, H, nK, nQ), Q innermost; dk/dv accumulate in VMEM scratch.
    Scores stay in (BQ, BK) orientation — the q-axis contractions
    (p^T g, ds^T q) are expressed through dot_general dimension numbers, so
    no VMEM transposes are needed."""
    j = pl.program_id(3)
    n_q = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    km = km_ref[0]  # (1, BK)
    qm = qm_ref[0]  # (1, BQ)
    block_live = (jnp.sum(km) > 0) & (jnp.sum(qm) > 0)

    @pl.when(block_live)
    def _update():
        q = q_ref[0, 0]  # (BQ, D) pre-scaled
        k = k_ref[0, 0]  # (BK, D)
        v = v_ref[0, 0]
        g = g_ref[0, 0]  # (BQ, D), qm-masked
        lse = lse_ref[0, 0]  # (BQ, 1)
        dl = dl_ref[0, 0]  # (BQ, 1)

        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) + (km - 1.0) * BIG
        if bf16:
            p = jnp.exp2((s - lse).astype(jnp.bfloat16)).astype(jnp.float32)
        else:
            p = jnp.exp2(s - lse)
        # dv += p^T @ g : contract over the q axis (dim 0 of both)
        dv_scr[:] += lax.dot_general(
            p.astype(g.dtype), g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - dl)
        # dk += ds^T @ q : contract over the q axis
        dk_scr[:] += lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(j == n_q - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, qm, km, out, lse, g):
    """Blockwise backward. q is pre-scaled; returns (dq_pre, dk, dv) where
    dq_pre is the gradient w.r.t. the *pre-scaled* q (the outer chain rule
    through q*scale*log2e recovers d/dq)."""
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    BQ = _pick_block(Lq, DEFAULT_BWD_BLOCK)
    BK = _pick_block(Lk, DEFAULT_BWD_BLOCK)
    bf16 = q.dtype == jnp.bfloat16

    # zero cotangents on padded queries; precompute dl = sum_d(out * g)
    g = g * (jnp.swapaxes(qm, -1, -2)[:, None] > 0)
    dl = (out.astype(jnp.float32) * g.astype(jnp.float32)).sum(-1, keepdims=True)
    # (B, H, Lq, 1) like lse

    qspec = pl.BlockSpec((1, 1, BQ, D), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, 1, BK, D), lambda b, h, i, j: (b, h, j, 0), memory_space=pltpu.VMEM)
    rowq = pl.BlockSpec((1, 1, BQ, 1), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM)
    kmspec = pl.BlockSpec((1, 1, BK), lambda b, h, i, j: (b, 0, j), memory_space=pltpu.VMEM)
    qmspec = pl.BlockSpec((1, 1, BQ), lambda b, h, i, j: (b, 0, i), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, bf16=bf16),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(B, H, Lq // BQ, Lk // BK),
        in_specs=[qspec, kspec, kspec, qspec, rowq, rowq, kmspec, qmspec],
        out_specs=qspec,
        scratch_shapes=[pltpu.VMEM((BQ, D), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * B * H * Lq * Lk * D,
            bytes_accessed=4 * (2 * q.size + 2 * k.size * (Lq // BQ)),
            transcendentals=B * H * Lq * Lk,
        ),
        interpret=_interpret(),
    )(q, k, v, g, lse, dl, km, qm)

    # swap streaming dims: grid iterates (kv block, q block inner)
    qspec2 = pl.BlockSpec((1, 1, BQ, D), lambda b, h, i, j: (b, h, j, 0), memory_space=pltpu.VMEM)
    kspec2 = pl.BlockSpec((1, 1, BK, D), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM)
    rowq2 = pl.BlockSpec((1, 1, BQ, 1), lambda b, h, i, j: (b, h, j, 0), memory_space=pltpu.VMEM)
    kmspec2 = pl.BlockSpec((1, 1, BK), lambda b, h, i, j: (b, 0, i), memory_space=pltpu.VMEM)
    qmspec2 = pl.BlockSpec((1, 1, BQ), lambda b, h, i, j: (b, 0, j), memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, bf16=bf16),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(B, H, Lk // BK, Lq // BQ),
        in_specs=[qspec2, kspec2, kspec2, qspec2, rowq2, rowq2, kmspec2, qmspec2],
        out_specs=(kspec2, kspec2),
        scratch_shapes=[
            pltpu.VMEM((BK, D), jnp.float32),
            pltpu.VMEM((BK, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * B * H * Lq * Lk * D,
            bytes_accessed=4 * (2 * k.size + 2 * q.size * (Lk // BK)),
            transcendentals=B * H * Lq * Lk,
        ),
        interpret=_interpret(),
    )(q, k, v, g, lse, dl, km, qm)

    # base-2 parametrization: d(exp2 logits)/d(logits) carries ln2
    return (dq.astype(jnp.float32) * LN2).astype(q.dtype), (
        dk.astype(jnp.float32) * LN2
    ).astype(k.dtype), dv


# ---------------------------------------------------------------------------
# custom VJP around the pre-scaled-q kernels
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _flash_attention(q_pre, k, v, qm, km):
    out, _ = _flash_fwd(q_pre, k, v, qm, km, with_lse=False)
    return out


def _vjp_fwd(q_pre, k, v, qm, km):
    out, lse = _flash_fwd(q_pre, k, v, qm, km)
    return out, (q_pre, k, v, qm, km, out, lse)


def _vjp_bwd(res, g):
    q_pre, k, v, qm, km, out, lse = res
    dq_pre, dk, dv = _flash_bwd(q_pre, k, v, qm, km, out, lse, g)
    return dq_pre, dk, dv, None, None


_flash_attention.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# einsum reference (general-path fallback; also used by tests)
# ---------------------------------------------------------------------------


def _ref_attention(q, k, v, qm, km, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    mask = km[:, None, :, :] > 0  # (B,1,1,Lk)
    s = jnp.where(mask, s, NEG_INF)
    s = s - s.max(axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.maximum(p.sum(axis=-1, keepdims=True), 1e-30)
    p = jnp.where(mask, p, 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    out = out * (jnp.swapaxes(qm, -1, -2)[:, None] > 0)  # (B,1,Lq,1) query mask
    return out, p


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def masked_flash_attention(q, k, v, q_valid, kv_valid, scale: float):
    """q,k,v: (B, L, H, D) with True==valid padding masks (B, L) or None.

    Returns (B, Lq, H, D).  Falls back to the einsum formulation when block
    constraints don't hold (tiny/odd shapes).
    """
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    qm = (
        jnp.ones((B, 1, Lq), jnp.float32)
        if q_valid is None
        else q_valid.astype(jnp.float32)[:, None, :]
    )
    km = (
        jnp.ones((B, 1, Lk), jnp.float32)
        if kv_valid is None
        else kv_valid.astype(jnp.float32)[:, None, :]
    )

    if flash_shapes_ok(Lq, Lk, D):
        # fold softmax scale and the base-2 conversion into Q outside the
        # kernel; autodiff chains d/dq through this product
        out = _flash_attention(qt * jnp.asarray(scale * LOG2E, qt.dtype), kt, vt, qm, km)
    else:
        out, _ = _ref_attention(qt, kt, vt, qm, km, scale)
    return jnp.transpose(out, (0, 2, 1, 3))
