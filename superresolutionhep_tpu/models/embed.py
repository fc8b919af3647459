"""Timestep embedding (GLIDE-style sinusoidal + SiLU MLP).

Capability mirror of models/utils.py:128-166.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .dense import xavier_uniform


def timestep_embedding(t, dim: int, max_period: float = 10_000.0):
    """Sinusoidal frequency embedding of scalar timesteps.

    t: (B,) possibly-fractional timesteps. Returns (B, dim) as
    [cos(t*f_0..), sin(t*f_0..)] (models/utils.py:142-161).
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, t):
        t_freq = timestep_embedding(t, self.frequency_embedding_size)
        x = nn.Dense(self.hidden_size, kernel_init=xavier_uniform, dtype=self.dtype, name="mlp_0")(t_freq)
        x = nn.silu(x)
        x = nn.Dense(self.hidden_size, kernel_init=xavier_uniform, dtype=self.dtype, name="mlp_2")(x)
        return x
