"""GPT-2 + Normformer encoder stack.

Capability mirror of models/transformer.py:9-230: pre-norm layer
``x + norm2(mha(norm1(x)))`` followed by ``x + dense(x, context)``; stack with
final LayerNorm and optional resize; cross-attention variant.  Optional edge
features/updates are threaded through the shared MultiheadAttention.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from .attention import MultiheadAttention
from .dense import Dense, LN_EPS


class TransformerEncoderLayer(nn.Module):
    embed_dim: int
    num_heads: int
    dense_config: Optional[dict] = None
    edge_embed_dim: int = 0
    update_edges: bool = False
    dtype: Any = None
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        x,
        edge_x=None,
        valid=None,
        context=None,
        attn_valid=None,
        attn_bias=None,
        deterministic: bool = True,
    ):
        mha = MultiheadAttention(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            edge_embed_dim=self.edge_embed_dim,
            update_edges=self.update_edges,
            dtype=self.dtype,
            impl=self.attn_impl,
            name="mha",
        )
        norm1 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")

        if edge_x is not None:
            enorm1 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="enorm1")
            xi, edge_xi = mha(
                norm1(x),
                edges=enorm1(edge_x),
                q_valid=valid,
                attn_valid=attn_valid,
                attn_bias=attn_bias,
                deterministic=deterministic,
            )
        else:
            xi = mha(
                norm1(x),
                q_valid=valid,
                attn_valid=attn_valid,
                attn_bias=attn_bias,
                deterministic=deterministic,
            )

        x = x + norm2(xi)
        if self.update_edges and edge_x is not None:
            enorm2 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="enorm2")
            edge_x = edge_x + enorm2(edge_xi)
        if self.dense_config is not None:
            x = x + Dense.from_config(
                dict(self.dense_config, output_size=self.embed_dim), dtype=self.dtype, name="dense"
            )(x, context=context, deterministic=deterministic)

        if edge_x is not None:
            return x, edge_x
        return x


class TransformerEncoder(nn.Module):
    embed_dim: int
    num_layers: int
    num_heads: int
    dense_config: Optional[dict] = None
    out_dim: int = 0
    edge_embed_dim: int = 0
    update_edges: bool = False
    dtype: Any = None
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, edge_x=None, **kwargs):
        for i in range(self.num_layers):
            layer = TransformerEncoderLayer(
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                dense_config=self.dense_config,
                edge_embed_dim=self.edge_embed_dim,
                # last layer never updates edges (transformer.py:172)
                update_edges=self.update_edges if i != self.num_layers - 1 else False,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name=f"layers_{i}",
            )
            if edge_x is not None:
                x, edge_x = layer(x, edge_x, **kwargs)
            else:
                x = layer(x, **kwargs)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="final_norm")(x)
        if self.out_dim:
            x = nn.Dense(self.out_dim, dtype=self.dtype, name="final_linear")(x)
        return x


class TransformerCrossAttentionLayer(nn.Module):
    """query + norm2(mha(norm1(query), norm0(key_value))) then FFN
    (transformer.py:198-230)."""

    embed_dim: int
    num_heads: int
    dense_config: Optional[dict] = None
    dtype: Any = None
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self, query, key_value, query_valid=None, key_value_valid=None, context=None, deterministic=True
    ):
        mha = MultiheadAttention(
            embed_dim=self.embed_dim, num_heads=self.num_heads, dtype=self.dtype, impl=self.attn_impl, name="mha"
        )
        q = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")(query)
        kv = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm0")(key_value)
        xi = mha(q, kv, q_valid=query_valid, kv_valid=key_value_valid, deterministic=deterministic)
        query = query + nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")(xi)
        if self.dense_config is not None:
            query = query + Dense.from_config(
                dict(self.dense_config, output_size=self.embed_dim), dtype=self.dtype, name="dense"
            )(query, context=context, deterministic=deterministic)
        return query
