"""Tensor-parallel collective operators (Megatron's ``f``/``g`` pair).

The reference framework is single-device torch and has no tensor parallelism
(SURVEY §5); this is the TPU-native head/MLP sharding story for the DiT stack
(models/dit.py), built on ``shard_map`` over a ('data', 'model') mesh.

Megatron-style TP splits each transformer block into a column-parallel
projection (QKV / MLP fc1: output features sharded) followed by a
row-parallel projection (attention out / MLP fc2: input features sharded)
whose partial products all-reduce over the model axis.  Correct gradients
need BOTH conjugate operators:

  g = ``tp_allreduce``:  psum in the forward pass, identity in the backward
      pass.  A plain ``jax.lax.psum`` would NOT do: under ``shard_map`` the
      transpose of psum is psum (the true adjoint of the all-to-all-copies
      linear map), so the cotangent crossing each reduce point would be
      inflated by the axis size — measured 4x per crossing on a 4-way mesh,
      compounding per layer.

  f = ``tp_block_input``: identity in the forward pass, psum in the
      backward pass, at the *entry* of each sharded block.  Without it, the
      cotangent flowing upstream from a shard's local Q/K/V (or fc1) slice
      is only that shard's partial contribution, and every replicated
      module upstream (embedders, adaLN modulation, LayerNorms) would
      accumulate partial, shard-varying gradients.

With both in place, every cotangent upstream of the TP blocks is complete
and identical on all model shards, so replicated-parameter gradients need
no model-axis reduction at all, and the per-shard gradient of the
pre-divided row-parallel bias equals the master-bias gradient directly
(parallel/tp.py relies on both properties; tests/test_tensor_parallel.py
pins them leaf by leaf against single-device autodiff).
"""

from __future__ import annotations

from functools import lru_cache

import jax


@lru_cache(maxsize=None)
def _f_op(axis_name: str):
    @jax.custom_vjp
    def f(x):
        return x

    def fwd(x):
        return x, None

    def bwd(_, g):
        return (jax.lax.psum(g, axis_name),)

    f.defvjp(fwd, bwd)
    return f


@lru_cache(maxsize=None)
def _g_op(axis_name: str):
    @jax.custom_vjp
    def g(x):
        return jax.lax.psum(x, axis_name)

    def fwd(x):
        return jax.lax.psum(x, axis_name), None

    def bwd(_, ct):
        return (ct,)

    g.defvjp(fwd, bwd)
    return g


def tp_block_input(x, axis_name):
    """Megatron ``f``: identity forward / psum-over-``axis_name`` backward.

    Apply to every replicated activation entering a column-parallel
    projection.  Must run inside a ``shard_map`` that binds ``axis_name``.
    """
    if axis_name is None:
        return x
    return _f_op(axis_name)(x)


def tp_allreduce(x, axis_name):
    """Megatron ``g``: psum-over-``axis_name`` forward / identity backward.

    Apply to every row-parallel partial product (attention output
    projection, MLP fc2).  Must run inside a ``shard_map`` that binds
    ``axis_name``.
    """
    if axis_name is None:
        return x
    return _g_op(axis_name)(x)
