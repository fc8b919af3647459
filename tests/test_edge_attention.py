"""Edge-feature attention hooks: additive per-edge bias E, sigmoid gate G,
and edge updates from raw scores (the particle-transformer-style path of the
reference MultiheadAttention, models/attention.py:115-212 — unused by shipped
configs but part of the capability surface)."""

import jax
import jax.numpy as jnp
import numpy as np

from superresolutionhep_tpu.models.attention import MultiheadAttention
from superresolutionhep_tpu.models.transformer import TransformerEncoder


def test_mha_with_edges_returns_edge_out():
    B, L, F, E = 2, 6, 16, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, F)).astype(np.float32))
    edges = jnp.asarray(rng.normal(size=(B, L, L, E)).astype(np.float32))
    valid = jnp.asarray(np.array([[True] * 6, [True] * 4 + [False] * 2]))

    mha = MultiheadAttention(embed_dim=16, num_heads=4, edge_embed_dim=E, update_edges=True, impl="xla")
    variables = mha.init(jax.random.PRNGKey(0), x, edges=edges, q_valid=valid)
    out, edge_out = mha.apply(variables, x, edges=edges, q_valid=valid)
    assert out.shape == (B, L, 16)
    assert edge_out.shape == (B, L, L, E)
    assert np.all(np.isfinite(np.asarray(out)))

    # gating: edges strongly negative -> sigmoid gate ~0 -> output ~0 for
    # the attention mix (out_proj bias still applies; compare two gates)
    out_lo, _ = mha.apply(variables, x, edges=edges - 100.0, q_valid=valid)
    assert not np.allclose(np.asarray(out), np.asarray(out_lo))


def test_normformer_encoder_with_edge_updates():
    B, L, F, E = 2, 5, 16, 8
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, L, F)).astype(np.float32))
    edges = jnp.asarray(rng.normal(size=(B, L, L, E)).astype(np.float32))
    valid = jnp.ones((B, L), bool)

    enc = TransformerEncoder(
        embed_dim=F, num_layers=3, num_heads=4,
        dense_config={"hidden_layers": [16], "activation": "ReLU"},
        edge_embed_dim=E, update_edges=True, attn_impl="xla",
    )
    variables = enc.init(jax.random.PRNGKey(0), x, edges, valid=valid)
    # the encoder returns node features only (transformer.py:183-195)
    out = enc.apply(variables, x, edges, valid=valid)
    assert out.shape == (B, L, F)

    def loss(p):
        o = enc.apply({"params": p}, x, edges, valid=valid)
        return (o**2).sum()

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(t))) for t in flat)
    # last layer must NOT have edge-update params (transformer.py:172)
    assert "linear_e_out" not in variables["params"]["layers_2"]["mha"]
