"""Inference-time parameter precision management.

Flax modules built with ``dtype=bfloat16`` promote their (fp32) params to
bf16 at every apply.  Inside the sampler's ``lax.scan`` loop that convert —
and the layout copy XLA fuses with it — is re-staged every iteration: the
round-3 trace attributed ~3-4 ms/iter at small L to exactly these in-loop
weight convert/copy ops (BASELINE.md round-3 section).  Casting the params
to the compute dtype ONCE, outside the loop, removes them; the result is
bitwise identical because flax's ``promote_dtype`` performs the same
fp32->bf16 rounding at apply time.

The geometry embedder (``etaphi_emb_net``) is excluded: it computes at full
fp32 / 'highest' precision (models/flow_model.py — bf16 inputs quantize
normalized eta below the HR subcell half-pitch), and with ``dtype=None`` a
bf16 param would silently *change* its compute type via dtype promotion.
"""

from __future__ import annotations

import jax.numpy as jnp

# module names whose params must stay fp32 (full-precision geometry path)
FP32_MODULES = ("etaphi_emb_net",)


def cast_params_for_inference(params, dtype=jnp.bfloat16, keep_fp32=FP32_MODULES):
    """Cast float params to ``dtype`` except those under ``keep_fp32`` names.

    ``params`` is the flax param pytree of nested dicts (with or without the
    top-level ``{"params": ...}`` wrapper).  Non-float leaves pass through.
    """

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if any(name in path for name in keep_fp32):
            return tree
        arr = jnp.asarray(tree)
        if jnp.issubdtype(arr.dtype, jnp.floating):
            return arr.astype(dtype)
        return arr

    return walk(params, ())
