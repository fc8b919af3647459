"""Masked primitives for variable-length sets padded to static shapes.

Convention (everywhere in this framework): **mask == True means VALID**.
The reference uses the torch transformer convention True==padded internally
(models/utils.py:46-51) and flips with ``~`` at call sites; we standardise on
valid=True to remove the double negation.

Capability mirror of models/utils.py:11-124 (masked_softmax, merge_masks,
attach_context) re-expressed for XLA: branch-free `where` selects instead of
`masked_fill`, and guarded denominators so fully-padded rows (possible with
bucketed batching) yield zeros rather than NaN.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e30  # large-but-finite: keeps softmax well-defined for all-pad rows


def masked_softmax(x, valid_mask, axis: int = -1):
    """Softmax over ``axis`` that ignores padded entries and re-zeros them
    afterwards (mirrors models/utils.py:23-34).

    valid_mask broadcasts against x (extra leading dims added as needed).
    """
    if valid_mask is None:
        return _softmax(x, axis)
    mask = _broadcast_mask(valid_mask, x.ndim)
    x = jnp.where(mask, x, NEG_INF)
    out = _softmax(x, axis)
    return jnp.where(mask, out, 0.0)


def _softmax(x, axis):
    x = x - jnp.max(x, axis=axis, keepdims=True)
    e = jnp.exp(x)
    return e / jnp.maximum(e.sum(axis=axis, keepdims=True), 1e-30)


def _broadcast_mask(mask, ndim):
    """Left-pad mask shape after the batch dim until it has `ndim` dims
    (mirrors add_dims, models/utils.py:11-19)."""
    while mask.ndim < ndim:
        mask = mask[:, None, ...]
    return mask


def merge_masks(q_valid, kv_valid, attn_valid, q_len: int, k_len: int):
    """Combine padding masks and an optional adjacency mask into a single
    (B, Lq, Lk) valid mask (True = attend). Mirrors models/utils.py:38-67 with
    the inverted convention.

    Any of the inputs may be None; returns None if all are None.
    """
    merged = None
    if q_valid is not None or kv_valid is not None:
        if q_valid is None:
            q_valid = jnp.ones((kv_valid.shape[0], q_len), dtype=bool)
        if kv_valid is None:
            kv_valid = jnp.ones((q_valid.shape[0], k_len), dtype=bool)
        merged = q_valid[..., :, None] & kv_valid[..., None, :]
    if attn_valid is not None:
        merged = attn_valid if merged is None else (attn_valid & merged)
    return merged


def masked_mean(x, valid_mask, axis: int = 1, psum_axis=None):
    """Mean over ``axis`` counting only valid entries; guarded denominator.

    Mirrors the pooled-context computation `sum(x*m)/sum(m)`
    (models/flow_model.py:210-211, pflow/models/encoder.py:52-53) but never
    divides by zero (fully-padded filler events in a bucket batch).

    ``psum_axis``: mesh axis name for sequence-parallel execution — the token
    axis is sharded, so numerator/denominator are psum-reduced across shards.
    """
    import jax

    m = valid_mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    num = (x * m).sum(axis=axis)
    den = m.sum(axis=axis)
    if psum_axis is not None:
        num = jax.lax.psum(num, psum_axis)
        den = jax.lax.psum(den, psum_axis)
    return num / jnp.maximum(den, 1.0)


def segment_onehot(seg, n_seg: int, dtype):
    """(B, S) segment ids -> (B, S, n_seg) one-hot; pad cells (seg == -1)
    are all-zero rows.  The packed path's gather/scatter currency: both the
    per-segment reduction and the per-cell broadcast are (S x n_seg)
    matmuls that ride the MXU instead of gather/scatter lanes."""
    return (seg[..., None] == jnp.arange(n_seg)[None, None, :]).astype(dtype)


def segment_mean(x, onehot):
    """Per-segment mean of ``x`` (B, S, C) given a segment_onehot (B, S, E):
    returns (B, E, C); empty segments are zero."""
    num = jnp.einsum("bse,bsc->bec", onehot, x)
    den = onehot.sum(axis=1)  # (B, E)
    return num / jnp.maximum(den, 1.0)[..., None]


def attach_context(x, context):
    """Broadcast-concatenate a lower-rank context onto x's feature axis
    (mirrors models/utils.py:84-124)."""
    if context is None:
        raise ValueError("expected context is missing")
    if x.ndim < context.ndim:
        raise ValueError(f"context rank {context.ndim} exceeds input rank {x.ndim}")
    while context.ndim < x.ndim:
        context = context[:, None, ...]
    context = jnp.broadcast_to(context, (*x.shape[:-1], context.shape[-1]))
    return jnp.concatenate([x, context], axis=-1)
