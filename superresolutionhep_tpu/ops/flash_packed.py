"""Segment-packed banded flash attention (Pallas TPU).

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

The robust-softmax path carries a custom VJP (banded blockwise backward,
same structure as flash_attention.py's _bwd_dq/_bwd_dkv with scalar-prefetch
band indexing on both passes), so packed batches serve training as well as
inference.  Reference hot loop this replaces:
/root/reference/models/attention.py:250-260 (dense masked attention over
padded per-event rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import BIG, CLIP_HI, CLIP_LO, LN2, LOG2E, NEG_INF, _interpret

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
    kstart_ref, kcnt_ref, qT_ref, kT_ref, vT_ref, qseg_ref, kseg_ref, *rest,
    nomax: bool, with_lse: bool,
):
    if with_lse:
        oT_ref, lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        (oT_ref, m_scr, l_scr, acc_scr), lse_ref = rest, None
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

    qseg = qseg_ref[0].astype(jnp.float32)  # (1, BQ); ids < 2^24, fp32-exact
    kseg = kseg_ref[0].astype(jnp.float32)  # (1, BK)

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
        if with_lse:
            # true base-2 LSE per query column (training residual); all-pad
            # columns bottom out hugely negative and the backward's exponent
            # cap keeps them finite (flash_attention.py:_bwd_dq_kernel)
            lse_ref[0, 0] = m_scr[:] + jnp.log2(jnp.maximum(l_scr[:], 1e-30))


def _packed_fwd(
    qT, kT, vT, seg, BQ: int, BK: int, max_band_blocks: int, nomax: bool,
    with_lse: bool = False,
):
    """qT/kT/vT: (B, H, D, S) with qT pre-scaled by scale*log2(e); seg:
    (B, S) int32.  Returns (outT, lse) with outT (B, H, D, S) and lse
    (B, H, 1, S) base-2 (None unless ``with_lse``)."""
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
        return (b, 0, _band_idx(b, i, j, ks, kc))

    # TPU lowering requires the last two block dims be (8,128)-divisible or
    # equal to the array dims; a (1, BQ) block over (B, S) seg violates the
    # sublane rule, so seg gets a singleton middle axis: (B, 1, S) blocked
    # as (1, 1, BQ) is legal (second-to-last block dim == array dim 1).
    seg3 = seg[:, None, :]

    out_shape = jax.ShapeDtypeStruct(qT.shape, qT.dtype)
    out_specs = pl.BlockSpec(
        (1, 1, D, BQ), lambda b, h, i, j, ks, kc: (b, h, 0, i), memory_space=pltpu.VMEM
    )
    if with_lse:
        out_shape = (out_shape, jax.ShapeDtypeStruct((B, H, 1, S), jnp.float32))
        out_specs = (
            out_specs,
            pl.BlockSpec((1, 1, 1, BQ), lambda b, h, i, j, ks, kc: (b, h, 0, i), memory_space=pltpu.VMEM),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H, nQ, NKB),
        in_specs=[
            pl.BlockSpec((1, 1, D, BQ), lambda b, h, i, j, ks, kc: (b, h, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D, BK), kmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D, BK), kmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BQ), lambda b, h, i, j, ks, kc: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BK), ksegmap, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((1, BQ), jnp.float32),  # running max m (unused for nomax)
            pltpu.VMEM((1, BQ), jnp.float32),  # running sum l
            pltpu.VMEM((D, BQ), jnp.float32),  # output accumulator
        ],
    )
    res = pl.pallas_call(
        functools.partial(_packed_fwd_kernel, nomax=nomax, with_lse=with_lse),
        out_shape=out_shape,
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            # banded: ~NKB of nK blocks execute per q block
            flops=4 * B * H * S * (NKB * BK) * D,
            bytes_accessed=4 * (2 * qT.size + 2 * B * H * D * NKB * BK * nQ),
            transcendentals=B * H * S * NKB * BK,
        ),
        interpret=_interpret(),
    )(kstart, kcnt, qT, kT, vT, seg3, seg3)
    return res if with_lse else (res, None)


# ---------------------------------------------------------------------------
# banded backward (training path) — blockwise recompute against the stored
# LSE, mirroring flash_attention.py's _bwd_dq/_bwd_dkv in the packed layout:
# the same scalar-prefetch band indexing skips off-band K/V (dq pass) and
# off-band Q/G (dkv pass) blocks entirely.
# ---------------------------------------------------------------------------


def _packed_bwd_dq_kernel(
    kstart_ref, kcnt_ref, qT_ref, kT_ref, vT_ref, gT_ref, lse_ref, dl_ref,
    qseg_ref, kseg_ref, dqT_ref, dq_scr,
):
    b = pl.program_id(0)
    i = pl.program_id(2)
    j = pl.program_id(3)
    n_j = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    qseg = qseg_ref[0].astype(jnp.float32)  # (1, BQ)
    kseg = kseg_ref[0].astype(jnp.float32)  # (1, BK)

    @pl.when(j < kcnt_ref[b, i])
    def _update():
        qT = qT_ref[0, 0]  # (D, BQ) pre-scaled base-2 logits
        kT = kT_ref[0, 0]
        vT = vT_ref[0, 0]
        gT = gT_ref[0, 0]  # (D, BQ), pad-query-masked
        lse = lse_ref[0, 0]  # (1, BQ)
        dl = dl_ref[0, 0]  # (1, BQ) = sum_d(out * g)

        eq = (jnp.transpose(kseg) == qseg).astype(jnp.float32)  # (BK, BQ)
        sT = lax.dot_general(
            kT, qT, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + (eq - 1.0) * BIG
        # capped recompute: p <= 1 in exact math; keeps all-pad query
        # columns (lse ~ -1e30) finite — their cotangents are zero anyway
        pT = jnp.exp2(jnp.minimum(sT - lse, 0.0))
        dpT = lax.dot_general(
            vT, gT, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dsT = pT * (dpT - dl)
        dq_scr[:] += lax.dot_general(
            kT, dsT.astype(kT.dtype), (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(j == n_j - 1)
    def _finalize():
        dqT_ref[0, 0] = dq_scr[:].astype(dqT_ref.dtype)


def _packed_bwd_dkv_kernel(
    qstart_ref, qcnt_ref, qT_ref, kT_ref, vT_ref, gT_ref, lse_ref, dl_ref,
    qseg_ref, kseg_ref, dkT_ref, dvT_ref, dk_scr, dv_scr,
):
    b = pl.program_id(0)
    i = pl.program_id(2)  # k block
    j = pl.program_id(3)  # q block within this k block's band
    n_j = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    qseg = qseg_ref[0].astype(jnp.float32)  # (1, BQ)
    kseg = kseg_ref[0].astype(jnp.float32)  # (1, BK)

    @pl.when(j < qcnt_ref[b, i])
    def _update():
        qT = qT_ref[0, 0]  # (D, BQ) pre-scaled
        kT = kT_ref[0, 0]  # (D, BK)
        vT = vT_ref[0, 0]
        gT = gT_ref[0, 0]  # (D, BQ)
        lse = lse_ref[0, 0]  # (1, BQ)
        dl = dl_ref[0, 0]

        eq = (jnp.transpose(kseg) == qseg).astype(jnp.float32)  # (BK, BQ)
        sT = lax.dot_general(
            kT, qT, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + (eq - 1.0) * BIG
        pT = jnp.exp2(jnp.minimum(sT - lse, 0.0))
        # dvT (D, BK) += gT @ pT^T: contract the BQ axis
        dv_scr[:] += lax.dot_general(
            gT, pT.astype(gT.dtype), (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dpT = lax.dot_general(
            vT, gT, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dsT = pT * (dpT - dl)
        # dkT (D, BK) += qT @ dsT^T: contract the BQ axis
        dk_scr[:] += lax.dot_general(
            qT, dsT.astype(qT.dtype), (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(j == n_j - 1)
    def _finalize():
        dkT_ref[0, 0] = dk_scr[:].astype(dkT_ref.dtype)
        dvT_ref[0, 0] = dv_scr[:].astype(dvT_ref.dtype)


def _packed_bwd(qT, kT, vT, seg, outT, lse, gT, BQ: int, BK: int, msl: int):
    """Banded blockwise backward.  Returns (dqT_pre, dkT, dvT); the ln2
    factor converts the base-2 logit parametrization back (see
    flash_attention.py:_flash_bwd)."""
    B, H, D, S = qT.shape
    nQ, nK = S // BQ, S // BK

    seg3 = seg[:, None, :]  # (B, 1, S): legal TPU block (1, 1, BQ/BK)
    # zero cotangents on pad queries; dl = sum_d(out * g), (B, H, 1, S)
    gT = gT * (seg != PAD_SEG)[:, None, None, :]
    dl = (outT.astype(jnp.float32) * gT.astype(jnp.float32)).sum(2, keepdims=True)

    # dq pass: same per-q-block K band as the forward
    NKB = min(nK, -(-(BQ + 2 * msl) // BK) + 1)
    kstart, kcnt = band_ranges(seg, BQ, BK)

    def _bidx(b, i, j, st, ct):
        last = jnp.maximum(ct[b, i] - 1, 0)
        return jnp.minimum(jnp.minimum(st[b, i] + j, st[b, i] + last), nK - 1)

    qspec = pl.BlockSpec((1, 1, D, BQ), lambda b, h, i, j, st, ct: (b, h, 0, i), memory_space=pltpu.VMEM)
    rowq = pl.BlockSpec((1, 1, 1, BQ), lambda b, h, i, j, st, ct: (b, h, 0, i), memory_space=pltpu.VMEM)
    qsegspec = pl.BlockSpec((1, 1, BQ), lambda b, h, i, j, st, ct: (b, 0, i), memory_space=pltpu.VMEM)
    kband = pl.BlockSpec((1, 1, D, BK), lambda b, h, i, j, st, ct: (b, h, 0, _bidx(b, i, j, st, ct)), memory_space=pltpu.VMEM)
    ksegband = pl.BlockSpec((1, 1, BK), lambda b, h, i, j, st, ct: (b, 0, _bidx(b, i, j, st, ct)), memory_space=pltpu.VMEM)

    dqT = pl.pallas_call(
        _packed_bwd_dq_kernel,
        out_shape=jax.ShapeDtypeStruct(qT.shape, qT.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, H, nQ, NKB),
            in_specs=[qspec, kband, kband, qspec, rowq, rowq, qsegspec, ksegband],
            out_specs=qspec,
            scratch_shapes=[pltpu.VMEM((D, BQ), jnp.float32)],
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * H * S * (NKB * BK) * D,
            bytes_accessed=4 * (3 * qT.size + 2 * B * H * D * NKB * BK * nQ),
            transcendentals=B * H * S * NKB * BK,
        ),
        interpret=_interpret(),
    )(kstart, kcnt, qT, kT, vT, gT, lse, dl, seg3, seg3)

    # dkv pass: per-K-block Q band — band_ranges with the roles swapped
    # (segment overlap is symmetric, so treating K blocks as "queries" over
    # Q blocks of size BQ gives exactly the transposed band)
    NQB = min(nQ, -(-(BK + 2 * msl) // BQ) + 1)
    qstart2, qcnt2 = band_ranges(seg, BK, BQ)

    def _bidx2(b, i, j, st, ct):
        last = jnp.maximum(ct[b, i] - 1, 0)
        return jnp.minimum(jnp.minimum(st[b, i] + j, st[b, i] + last), nQ - 1)

    kspec2 = pl.BlockSpec((1, 1, D, BK), lambda b, h, i, j, st, ct: (b, h, 0, i), memory_space=pltpu.VMEM)
    ksegspec2 = pl.BlockSpec((1, 1, BK), lambda b, h, i, j, st, ct: (b, 0, i), memory_space=pltpu.VMEM)
    qband2 = pl.BlockSpec((1, 1, D, BQ), lambda b, h, i, j, st, ct: (b, h, 0, _bidx2(b, i, j, st, ct)), memory_space=pltpu.VMEM)
    rowq2 = pl.BlockSpec((1, 1, 1, BQ), lambda b, h, i, j, st, ct: (b, h, 0, _bidx2(b, i, j, st, ct)), memory_space=pltpu.VMEM)
    qsegband2 = pl.BlockSpec((1, 1, BQ), lambda b, h, i, j, st, ct: (b, 0, _bidx2(b, i, j, st, ct)), memory_space=pltpu.VMEM)

    dkT, dvT = pl.pallas_call(
        _packed_bwd_dkv_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(kT.shape, kT.dtype),
            jax.ShapeDtypeStruct(vT.shape, vT.dtype),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, H, nK, NQB),
            in_specs=[qband2, kspec2, kspec2, qband2, rowq2, rowq2, qsegband2, ksegspec2],
            out_specs=(kspec2, kspec2),
            scratch_shapes=[
                pltpu.VMEM((D, BK), jnp.float32),
                pltpu.VMEM((D, BK), jnp.float32),
            ],
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * H * S * (NQB * BQ) * D,
            bytes_accessed=4 * (2 * kT.size + 3 * B * H * D * NQB * BQ * nK),
            transcendentals=B * H * S * NQB * BQ,
        ),
        interpret=_interpret(),
    )(qstart2, qcnt2, qT, kT, vT, gT, lse, dl, seg3, seg3)

    return (dqT.astype(jnp.float32) * LN2).astype(qT.dtype), (
        dkT.astype(jnp.float32) * LN2
    ).astype(kT.dtype), dvT


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _packed_attention(qT_pre, kT, vT, seg, BQ, BK, msl):
    out, _ = _packed_fwd(
        qT_pre, kT, vT, seg, BQ, BK, min(kT.shape[3] // BK, -(-(BQ + 2 * msl) // BK) + 1),
        nomax=False, with_lse=False,
    )
    return out


def _packed_vjp_fwd(qT_pre, kT, vT, seg, BQ, BK, msl):
    out, lse = _packed_fwd(
        qT_pre, kT, vT, seg, BQ, BK, min(kT.shape[3] // BK, -(-(BQ + 2 * msl) // BK) + 1),
        nomax=False, with_lse=True,
    )
    return out, (qT_pre, kT, vT, seg, out, lse)


def _packed_vjp_bwd(BQ, BK, msl, res, g):
    qT_pre, kT, vT, seg, out, lse = res
    dqT_pre, dkT, dvT = _packed_bwd(qT_pre, kT, vT, seg, out, lse, g, BQ, BK, msl)
    return dqT_pre, dkT, dvT, None


_packed_attention.defvjp(_packed_vjp_fwd, _packed_vjp_bwd)


def packed_flash_attention_T(
    qT_pre, kT, vT, seg,
    softmax: str = "max",
    block_q: int | None = None,
    block_k: int | None = None,
    max_segment_len: int | None = None,
):
    """Transposed-layout entry: qT_pre/kT/vT (B, H, D, S) with the softmax
    scale and base-2 conversion ALREADY folded into qT_pre — the fused
    LN+adaLN+QKV prologue (ops/fused_qkv.py) emits exactly this layout, so
    the packed fast path composes with the fused DiT kernels without any
    HBM layout pass in between.  Returns outT (B, H, D, S).  Caller must
    have checked packed_shapes_ok."""
    S = qT_pre.shape[3]
    block_q = block_q or PACKED_DEFAULTS["block_q"]
    block_k = block_k or PACKED_DEFAULTS["block_k"]
    if max_segment_len is None:
        max_segment_len = PACKED_DEFAULTS["max_segment_len"]
    if S % block_q or S % block_k:
        raise ValueError(f"S={S} must be a multiple of block_q/block_k")
    # a q block may straddle two events: band <= BQ + 2*max_segment_len
    # cells, rounded out to blocks (the band bound caps at the full row)
    msl = int(max_segment_len) if max_segment_len is not None else S
    seg = seg.astype(jnp.int32)
    if softmax == "nomax_clip":
        max_band = min(S // block_k, -(-(block_q + 2 * msl) // block_k) + 1)
        outT, _ = _packed_fwd(
            qT_pre, kT, vT, seg, block_q, block_k, max_band, nomax=True
        )
        return outT
    return _packed_attention(qT_pre, kT, vT, seg, block_q, block_k, msl)


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

    The robust ("max") softmax path is differentiable: a custom VJP runs the
    banded blockwise backward (_packed_bwd) so segment-packed batches can
    train.  The no-max clip variant stays inference-only (the clip is a
    one-way door under training, flash_attention.py module docstring).
    """
    qT = jnp.transpose(q, (0, 2, 3, 1))
    kT = jnp.transpose(k, (0, 2, 3, 1))
    vT = jnp.transpose(v, (0, 2, 3, 1))
    qT_pre = qT * jnp.asarray(scale * LOG2E, qT.dtype)
    outT = packed_flash_attention_T(
        qT_pre, kT, vT, seg,
        softmax=softmax, block_q=block_q, block_k=block_k,
        max_segment_len=max_segment_len,
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
