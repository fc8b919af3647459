"""Fused DiT MLP half-layer (ops/fused_mlp.py): kernel parity vs the jnp
reference, gradients through the custom VJP, and the config gate.  The
combined fused layer (prologue + MLP) is exercised against the standard
path by the DiT parity tests in test_fused_qkv.py."""

import jax
import jax.numpy as jnp
import numpy as np

from superresolutionhep_tpu.ops.fused_mlp import (
    _ref_dit_mlp,
    fused_dit_mlp,
    fused_mlp_ok,
    mlp_config_fusable,
)


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape), jnp.float32)


def _args(rng, B=2, L=256, F=256, Fh=256, per_cell=False):
    row = (B, L, F) if per_cell else (B, F)
    return (
        _rand(rng, B, L, F),
        _rand(rng, B, L, F),
        _rand(rng, *row),
        _rand(rng, *row),
        _rand(rng, *row),
        _rand(rng, *row),
        _rand(rng, F, Fh) * 0.05,
        _rand(rng, Fh),
        _rand(rng, Fh, F) * 0.05,
        _rand(rng, F),
    )


def test_kernel_parity():
    args = _args(np.random.default_rng(0))
    np.testing.assert_allclose(
        np.asarray(fused_dit_mlp(*args)), np.asarray(_ref_dit_mlp(*args)), rtol=1e-5, atol=1e-5
    )


def test_kernel_parity_percell():
    """Per-cell gate/affine rows (B, L, F) — the segment-packed path where
    the adaLN modulation is scattered per cell."""
    args = _args(np.random.default_rng(2), per_cell=True)
    np.testing.assert_allclose(
        np.asarray(fused_dit_mlp(*args)), np.asarray(_ref_dit_mlp(*args)), rtol=1e-5, atol=1e-5
    )


def test_kernel_grad_parity():
    args = _args(np.random.default_rng(1), B=1, L=128, F=128, Fh=128)
    idx = tuple(range(len(args)))
    g = jax.grad(lambda *a: jnp.sum(fused_dit_mlp(*a) ** 2), argnums=idx)(*args)
    gr = jax.grad(lambda *a: jnp.sum(_ref_dit_mlp(*a) ** 2), argnums=idx)(*args)
    for u, v in zip(g, gr):
        scale = max(float(jnp.max(jnp.abs(v))), 1.0)
        assert float(jnp.max(jnp.abs(u - v))) / scale < 1e-5


def test_kernel_grad_parity_percell():
    args = _args(np.random.default_rng(3), B=1, L=128, F=128, Fh=128, per_cell=True)
    idx = tuple(range(len(args)))
    g = jax.grad(lambda *a: jnp.sum(fused_dit_mlp(*a) ** 2), argnums=idx)(*args)
    gr = jax.grad(lambda *a: jnp.sum(_ref_dit_mlp(*a) ** 2), argnums=idx)(*args)
    for u, v in zip(g, gr):
        scale = max(float(jnp.max(jnp.abs(v))), 1.0)
        assert float(jnp.max(jnp.abs(u - v))) / scale < 1e-5


def test_config_gate():
    good = {
        "activation": "LeakyReLU",
        "dropout": 0.0,
        "final_activation": "LeakyReLU",
        "hidden_layers": [256],
        "norm_final_layer": False,
        "norm_layer": "LayerNorm",
        "output_size": 256,
    }
    assert mlp_config_fusable(good)
    assert not mlp_config_fusable(dict(good, hidden_layers=[256, 256]))
    assert not mlp_config_fusable(dict(good, activation="GELU"))
    assert not mlp_config_fusable(dict(good, dropout=0.1))
    assert not mlp_config_fusable(dict(good, norm_final_layer=True))
    assert not mlp_config_fusable(dict(good, context_size=64))
    assert fused_mlp_ok(512, 256, 256)
    assert not fused_mlp_ok(100, 256, 256)
    assert not fused_mlp_ok(512, 256, 100)
