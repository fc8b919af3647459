"""Context-aware MLP block.

Capability mirror of the reference ``Dense`` (models/dense.py:4-83): per-layer
optional LayerNorm (no learnable affine), dropout, activation; optional final
activation; optional broadcast-concatenated context.  Input sizes are shape-
inferred (no ``input_size`` plumbing — the reference patches sizes into config
dicts in place, models/flow_model.py:44-110; we don't need to).

Kernel init is Xavier-uniform with zero bias by default, which realises the
reference's ``init_weights.all_linear: xavier_uniform`` policy
(models/flow_model.py:116-126) at construction time.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.masked import attach_context

ACTIVATIONS: dict[str, Callable] = {
    "ReLU": nn.relu,
    "LeakyReLU": lambda x: nn.leaky_relu(x, negative_slope=0.01),  # torch default slope
    "SiLU": nn.silu,
    "GELU": nn.gelu,
    "Tanh": jnp.tanh,
    "Sigmoid": nn.sigmoid,
    "ELU": nn.elu,
}

# torch.nn.LayerNorm default eps (flax default is 1e-6)
LN_EPS = 1e-5

xavier_uniform = nn.initializers.xavier_uniform()


def norm_layer_cls(name: str, dtype=None):
    if name == "LayerNorm":
        # elementwise_affine=False in the reference Dense (models/dense.py:60)
        return nn.LayerNorm(use_bias=False, use_scale=False, epsilon=LN_EPS, dtype=dtype)
    raise ValueError(f"unsupported norm layer {name!r}")


class Dense(nn.Module):
    """MLP with optional per-layer norm/dropout/activation and context concat."""

    output_size: int
    hidden_layers: Sequence[int] = ()
    activation: str = "ReLU"
    final_activation: Optional[str] = None
    norm_layer: Optional[str] = None
    norm_final_layer: bool = False
    dropout: float = 0.0
    context_size: int = 0
    dtype: Any = None
    # matmul precision (None | 'highest').  'highest' forces full-fp32 MXU
    # passes — used for the geometry embedders, where bf16 matmul inputs
    # quantize eta/phi below the HR subcell pitch (the reference trains at
    # torch.set_float32_matmul_precision('highest'), train.py:35,46)
    precision: Any = None
    # tensor-parallel mesh axis (Megatron MLP split): the single hidden
    # layer is column-parallel (this module then sees the LOCAL hidden
    # width), the output layer is row-parallel — its partial products psum
    # over ``tp_axis`` BEFORE the final activation.  The caller shards the
    # kernels and pre-divides the output bias by the axis size
    # (parallel/tp.py).  Requires exactly one hidden layer and no norm or
    # active dropout ahead of the final layer.
    tp_axis: Optional[str] = None

    @classmethod
    def from_config(cls, cfg: dict, dtype=None, **overrides) -> "Dense":
        """Build from a reference-style dense config dict (ignores
        ``input_size`` — shapes are inferred)."""
        kw = dict(
            output_size=cfg["output_size"],
            hidden_layers=tuple(cfg.get("hidden_layers", ()) or ()),
            activation=cfg.get("activation") or "ReLU",
            final_activation=cfg.get("final_activation"),
            norm_layer=cfg.get("norm_layer"),
            norm_final_layer=bool(cfg.get("norm_final_layer", False)),
            dropout=float(cfg.get("dropout", 0.0) or 0.0),
            context_size=int(cfg.get("context_size", 0) or 0),
            dtype=dtype,
        )
        kw.update(overrides)
        return cls(**kw)

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True):
        if self.context_size:
            x = attach_context(x, context)

        if self.tp_axis is not None:
            if len(self.hidden_layers) != 1:
                raise ValueError("tp_axis requires exactly one hidden layer")
            if self.norm_final_layer:
                raise ValueError(
                    "tp_axis: norm_final_layer would normalize the sharded hidden"
                )
            if self.dropout and not deterministic:
                raise ValueError("tp_axis: active dropout would desync shards")
            # Megatron 'f': identity fwd, psum bwd — complete cotangents for
            # everything upstream of the column-parallel first matmul
            from ..ops.tp import tp_block_input

            x = tp_block_input(x, self.tp_axis)

        sizes = [*self.hidden_layers, self.output_size]
        num_layers = len(sizes)
        for i, size in enumerate(sizes):
            is_final = i == num_layers - 1
            # normalisation first, then dropout, then linear (models/dense.py:55-75)
            if self.norm_layer and (self.norm_final_layer or not is_final):
                x = norm_layer_cls(self.norm_layer, self.dtype)(x)
            if self.dropout and (self.norm_final_layer or not is_final):
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
            x = nn.Dense(
                size,
                kernel_init=xavier_uniform,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                precision=self.precision,
                name=f"linear_{i}",
            )(x)
            if is_final and self.tp_axis is not None:
                # row-parallel output: all-reduce the per-shard partial
                # products (Megatron 'g': psum fwd / identity bwd) before
                # any final activation
                from ..ops.tp import tp_allreduce

                x = tp_allreduce(x, self.tp_axis)
            if not is_final:
                x = ACTIVATIONS[self.activation](x)
            elif self.final_activation:
                x = ACTIVATIONS[self.final_activation](x)
        return x
