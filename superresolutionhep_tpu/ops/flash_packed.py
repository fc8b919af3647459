"""Segment-packed banded flash attention (Pallas TPU, inference path).

Bucketed padding costs ~20-27% of executed attention FLOPs at production
quanta (BASELINE.md round-3 bucket-quantum sweep), and every bucket shape is
a separate compiled program (slow compiles + per-shape switch cost on axon).
Packing several events back-to-back into one fixed-length sequence removes
both: ONE compiled shape, and per-event padding only up to the 128-cell
block alignment.

Naive packing would *increase* attention FLOPs (S^2 per row vs sum L_i^2),
so the kernel is banded: events are contiguous runs of a per-cell segment
id, hence the block-diagonal attention pattern is a contiguous band of K
blocks per Q block.  The band's [start, count] per (row, q-block) is
precomputed outside the kernel and fed through scalar prefetch
(pltpu.PrefetchScalarGridSpec) so the index_map only DMAs K/V blocks inside
the band — off-band blocks are neither fetched nor computed.  Within the
band, a (BK, BQ) segment-equality compare masks cross-event pairs.

Layout matches ops/flash_attention.py: transposed (B, H, D, S) operands,
base-2 logits pre-scaled into Q, fp32 accumulation, online softmax with a
running max (robust) or the clipped no-max variant (inference fast path,
same CLIP bounds and caveats as flash_attention.py — validate per
checkpoint via nomax_selfcheck).

Forward/inference only: the training path keeps bucketed batches and the
differentiable kernel in flash_attention.py.  Reference hot loop this
replaces: /root/reference/models/attention.py:250-260 (dense masked
attention over padded per-event rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import BIG, CLIP_HI, CLIP_LO, LOG2E, NEG_INF, _interpret

PAD_SEG = -1  # segment id of padding cells
# event-start alignment inside a packed row (the flash/MXU lane block).
# Single source of truth: data/packing.py aligns events to it at pack time
# and models/flow_model.py derives the max-segments-per-row bound (S //
# SEG_ALIGN) from it — a packer aligning more finely would silently break
# the model's one-hot segment scatter.
SEG_ALIGN = 128

# process-wide packed-kernel tuning; inference entry points override at
# startup (set_packed_defaults) so model code needs no extra plumbing
PACKED_DEFAULTS = {"block_q": 512, "block_k": 512, "max_segment_len": None}


_UNSET = object()


def set_packed_defaults(block_q: int = None, block_k: int = None, max_segment_len=_UNSET):
    """Update only the provided knobs.  Pass ``max_segment_len=None``
    explicitly to clear the band bound (falls back to a full-sequence
    band); omitting it leaves the current bound untouched — a block-size
    tune must not silently discard the banded-DMA saving."""
    if block_q is not None:
        PACKED_DEFAULTS["block_q"] = int(block_q)
    if block_k is not None:
        PACKED_DEFAULTS["block_k"] = int(block_k)
    if max_segment_len is not _UNSET:
        PACKED_DEFAULTS["max_segment_len"] = max_segment_len


def packed_shapes_ok(S: int, d: int) -> bool:
    bq, bk = PACKED_DEFAULTS["block_q"], PACKED_DEFAULTS["block_k"]
    return S % bq == 0 and S % bk == 0 and d % 8 == 0


def band_ranges(seg, BQ: int, BK: int):
    """Per-(row, q-block) contiguous K-block band covering every key that
    shares a segment with the block's queries.

    seg: (B, S) int32, PAD_SEG for padding, valid ids nondecreasing along S
    (the packer's contract).  Returns (kstart, kcnt) int32 (B, nQ).  The
    band is [first overlapping K block, last overlapping K block] inclusive
    — interior all-pad blocks (alignment gaps) are included and masked in
    the kernel rather than splitting the band.
    """
    B, S = seg.shape
    nQ, nK = S // BQ, S // BK
    segq = seg.reshape(B, nQ, BQ)
    vq = segq != PAD_SEG
    qmin = jnp.where(vq, segq, 2**30).min(axis=-1)  # (B, nQ)
    qmax = jnp.where(vq, segq, -(2**30)).max(axis=-1)
    segk = seg.reshape(B, nK, BK)
    vk = segk != PAD_SEG
    kmin = jnp.where(vk, segk, 2**30).min(axis=-1)  # (B, nK)
    kmax = jnp.where(vk, segk, -(2**30)).max(axis=-1)

    ov = (kmin[:, None, :] <= qmax[:, :, None]) & (kmax[:, None, :] >= qmin[:, :, None])
    any_ov = ov.any(axis=-1)
    first = jnp.argmax(ov, axis=-1)
    last = nK - 1 - jnp.argmax(ov[:, :, ::-1], axis=-1)
    kstart = jnp.where(any_ov, first, 0).astype(jnp.int32)
    kcnt = jnp.where(any_ov, last - first + 1, 0).astype(jnp.int32)
    return kstart, kcnt


def _packed_fwd_kernel(
    kstart_ref, kcnt_ref, qT_ref, kT_ref, vT_ref, qseg_ref, kseg_ref, oT_ref,
    m_scr, l_scr, acc_scr, *, nomax: bool,
):
    b = pl.program_id(0)
    i = pl.program_id(2)
    j = pl.program_id(3)
    n_j = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        if not nomax:
            m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qseg = qseg_ref[...].astype(jnp.float32)  # (1, BQ); ids < 2^24, fp32-exact
    kseg = kseg_ref[...].astype(jnp.float32)  # (1, BK)

    @pl.when(j < kcnt_ref[b, i])
    def _update():
        qT = qT_ref[0, 0]  # (D, BQ) pre-scaled base-2 logits
        kT = kT_ref[0, 0]  # (D, BK)
        vT = vT_ref[0, 0]  # (D, BK)
        # (BK, BQ) same-event mask; PAD_SEG keys never match valid queries
        eq = (jnp.transpose(kseg) == qseg).astype(jnp.float32)

        sT = lax.dot_general(
            kT, qT, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        if nomax:
            # multiplicative mask (additive -BIG would explode the unclamped
            # exp2); exact for in-bound logits, inference-only (see module
            # constants in flash_attention.py)
            pT = jnp.exp2(jnp.clip(sT, CLIP_LO, CLIP_HI)) * eq
            l_scr[:] += pT.sum(axis=0, keepdims=True)
            acc_scr[:] += lax.dot_general(
                vT, pT.astype(vT.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            sT = sT + (eq - 1.0) * BIG
            m_prev = m_scr[:]
            m_new = jnp.maximum(m_prev, sT.max(axis=0, keepdims=True))  # (1, BQ)
            pT = jnp.exp2(sT - m_new)
            alpha = jnp.exp2(m_prev - m_new)
            l_scr[:] = l_scr[:] * alpha + pT.sum(axis=0, keepdims=True)
            acc_scr[:] = acc_scr[:] * alpha + lax.dot_general(
                vT, pT.astype(vT.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_scr[:] = m_new

    @pl.when(j == n_j - 1)
    def _finalize():
        out = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)
        oT_ref[0, 0] = (out * (qseg != float(PAD_SEG))).astype(oT_ref.dtype)


def _packed_fwd(qT, kT, vT, seg, BQ: int, BK: int, max_band_blocks: int, nomax: bool):
    """qT/kT/vT: (B, H, D, S) with qT pre-scaled by scale*log2(e); seg:
    (B, S) int32.  Returns outT (B, H, D, S)."""
    B, H, D, S = qT.shape
    nQ, nK = S // BQ, S // BK
    NKB = min(nK, max_band_blocks)
    kstart, kcnt = band_ranges(seg, BQ, BK)

    def _band_idx(b, i, j, ks, kc):
        # steps beyond the band (j >= kcnt, compute skipped by pl.when) clamp
        # to the band's LAST block, not nK-1: the repeated block index lets
        # the Mosaic pipeline skip the copy, so off-band steps cost no DMA
        # (clamping to nK-1 kept streaming new, never-read K/V blocks)
        last = jnp.maximum(kc[b, i] - 1, 0)
        return jnp.minimum(jnp.minimum(ks[b, i] + j, ks[b, i] + last), nK - 1)

    def kmap(b, h, i, j, ks, kc):
        return (b, h, 0, _band_idx(b, i, j, ks, kc))

    def ksegmap(b, h, i, j, ks, kc):
        return (b, _band_idx(b, i, j, ks, kc))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H, nQ, NKB),
        in_specs=[
            pl.BlockSpec((1, 1, D, BQ), lambda b, h, i, j, ks, kc: (b, h, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D, BK), kmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D, BK), kmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ), lambda b, h, i, j, ks, kc: (b, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK), ksegmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, D, BQ), lambda b, h, i, j, ks, kc: (b, h, 0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((1, BQ), jnp.float32),  # running max m (unused for nomax)
            pltpu.VMEM((1, BQ), jnp.float32),  # running sum l
            pltpu.VMEM((D, BQ), jnp.float32),  # output accumulator
        ],
    )
    return pl.pallas_call(
        functools.partial(_packed_fwd_kernel, nomax=nomax),
        out_shape=jax.ShapeDtypeStruct(qT.shape, qT.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            # banded: ~NKB of nK blocks execute per q block
            flops=4 * B * H * S * (NKB * BK) * D,
            bytes_accessed=4 * (2 * qT.size + 2 * B * H * D * NKB * BK * nQ),
            transcendentals=B * H * S * NKB * BK,
        ),
        interpret=_interpret(),
    )(kstart, kcnt, qT, kT, vT, seg, seg)


def packed_flash_attention(
    q, k, v, seg, scale: float,
    softmax: str = "max",
    block_q: int | None = None,
    block_k: int | None = None,
    max_segment_len: int | None = None,
):
    """Banded segment-packed attention.  q/k/v: (B, S, H, D); seg: (B, S)
    int32 with PAD_SEG (-1) padding and nondecreasing valid ids (the
    packer's contract, data/packing.py).  Cells attend exactly to cells of
    the same segment.  Returns (B, S, H, D).

    ``max_segment_len`` (static): upper bound on any event's cell count —
    sets the banded grid depth.  Events longer than it would silently lose
    attention mass, so the packer enforces it at pack time.
    Forward-only: use the bucketed path for training.
    """
    B, S, H, D = q.shape
    block_q = block_q or PACKED_DEFAULTS["block_q"]
    block_k = block_k or PACKED_DEFAULTS["block_k"]
    if max_segment_len is None:
        max_segment_len = PACKED_DEFAULTS["max_segment_len"]
    if S % block_q or S % block_k:
        raise ValueError(f"S={S} must be a multiple of block_q/block_k")
    if max_segment_len is None:
        max_band = S // block_k
    else:
        # a q block may straddle two events: band <= BQ + 2*max_segment_len
        # cells, rounded out to blocks
        span = block_q + 2 * int(max_segment_len)
        max_band = -(-span // block_k) + 1

    qT = jnp.transpose(q, (0, 2, 3, 1))
    kT = jnp.transpose(k, (0, 2, 3, 1))
    vT = jnp.transpose(v, (0, 2, 3, 1))
    qT_pre = qT * jnp.asarray(scale * LOG2E, qT.dtype)
    outT = _packed_fwd(
        qT_pre, kT, vT, seg.astype(jnp.int32), block_q, block_k,
        max_band, nomax=(softmax == "nomax_clip"),
    )
    return jnp.transpose(outT, (0, 3, 1, 2))


def ref_packed_attention(q, k, v, seg, scale: float):
    """O(S^2) einsum reference for tests: softmax over same-segment keys."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    mask = (seg[:, :, None] == seg[:, None, :]) & (seg != PAD_SEG)[:, None, :]
    s = jnp.where(mask[:, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(mask[:, None], p, 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
    return out * (seg != PAD_SEG)[:, :, None, None]
