"""Fused LN + adaLN + QKV prologue (ops/fused_qkv.py): kernel parity vs the
jnp reference, gradient parity through the custom VJP, and model-level
equivalence of the fused DiT path against the standard unfused path (same
param tree, so shipped checkpoints load unchanged)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolutionhep_tpu.models.dit import DiTEncoder
from superresolutionhep_tpu.ops.fused_qkv import (
    _ref_ln_mod_proj,
    fused_ln_mod_proj,
    fused_qkv_ok,
)

DENSE_CFG = {
    "activation": "LeakyReLU",
    "dropout": 0.0,
    "final_activation": "LeakyReLU",
    "hidden_layers": [256],
    "norm_final_layer": False,
    "norm_layer": "LayerNorm",
    "output_size": 256,
}


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape), jnp.float32)


def test_kernel_parity_broadcast_and_percell():
    rng = np.random.default_rng(0)
    B, L, F, O = 3, 256, 256, 768
    x, w = _rand(rng, B, L, F), _rand(rng, F, O) * 0.05
    bias = _rand(rng, O, 1)
    a2, b2 = _rand(rng, B, F), _rand(rng, B, F)
    assert fused_qkv_ok(L, F)
    np.testing.assert_allclose(
        np.asarray(fused_ln_mod_proj(x, a2, b2, w, bias)),
        np.asarray(_ref_ln_mod_proj(x, a2, b2, w, bias)),
        rtol=1e-5,
        atol=1e-5,
    )
    a3, b3 = _rand(rng, B, L, F), _rand(rng, B, L, F)
    np.testing.assert_allclose(
        np.asarray(fused_ln_mod_proj(x, a3, b3, w, bias)),
        np.asarray(_ref_ln_mod_proj(x, a3, b3, w, bias)),
        rtol=1e-5,
        atol=1e-5,
    )


def test_kernel_grad_parity():
    rng = np.random.default_rng(1)
    B, L, F, O = 2, 128, 128, 384
    args = (_rand(rng, B, L, F), _rand(rng, B, F), _rand(rng, B, F), _rand(rng, F, O) * 0.05, _rand(rng, O, 1))
    g = jax.grad(lambda *a: jnp.sum(fused_ln_mod_proj(*a) ** 2), argnums=tuple(range(5)))(*args)
    gr = jax.grad(lambda *a: jnp.sum(_ref_ln_mod_proj(*a) ** 2), argnums=tuple(range(5)))(*args)
    for u, v in zip(g, gr):
        scale = max(float(jnp.max(jnp.abs(v))), 1.0)
        assert float(jnp.max(jnp.abs(u - v))) / scale < 1e-5


def test_shape_gate():
    assert not fused_qkv_ok(100, 256)  # L not 128-splittable
    assert not fused_qkv_ok(256, 100)  # F off-lane
    assert fused_qkv_ok(512, 256)


@pytest.fixture(scope="module")
def dit_pair():
    kw = dict(embed_dim=256, num_layers=2, num_heads=4, dense_config=DENSE_CFG, attn_impl="flash")
    enc = DiTEncoder(**kw)
    enc_f = DiTEncoder(**kw, fused_prologue=True)
    rng = np.random.default_rng(2)
    x = _rand(rng, 2, 256, 256)
    ctx = _rand(rng, 2, 160)
    valid = jnp.asarray(rng.random((2, 256)) > 0.2)
    params = enc.init(jax.random.PRNGKey(0), x, q_valid=valid, context=ctx)
    return enc, enc_f, params, x, ctx, valid


def test_dit_param_tree_identical(dit_pair):
    enc, enc_f, params, x, ctx, valid = dit_pair
    pf = enc_f.init(jax.random.PRNGKey(0), x, q_valid=valid, context=ctx)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(pf)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(pf)):
        assert a.shape == b.shape


def test_dit_fused_forward_parity(dit_pair):
    enc, enc_f, params, x, ctx, valid = dit_pair
    out = enc.apply(params, x, q_valid=valid, context=ctx)
    outf = enc_f.apply(params, x, q_valid=valid, context=ctx)
    m = np.asarray(valid)
    np.testing.assert_allclose(
        np.asarray(out)[m], np.asarray(outf)[m], rtol=2e-4, atol=2e-4
    )


def test_dit_fused_grad_parity(dit_pair):
    enc, enc_f, params, x, ctx, valid = dit_pair

    def loss(p, mod):
        out = mod.apply(p, x, q_valid=valid, context=ctx)
        return jnp.sum(jnp.where(valid[..., None], out, 0.0) ** 2)

    g = jax.grad(lambda p: loss(p, enc))(params)
    gf = jax.grad(lambda p: loss(p, enc_f))(params)
    for u, v in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(gf)):
        scale = max(float(jnp.max(jnp.abs(u))), 1.0)
        assert float(jnp.max(jnp.abs(u - v))) / scale < 1e-4


def test_dit_fused_xla_fallback(dit_pair):
    """attn_impl='xla' (the explicit Pallas opt-out) with fused_prologue on a
    gated shape: the unfused fallback must honor the opt-out and take the
    einsum path (code-review r3 — it used to call the Pallas flash kernel
    unconditionally, running interpret-mode on CPU), matching the standard
    path."""
    enc, enc_f, params, x, ctx, valid = dit_pair
    kw = dict(embed_dim=256, num_layers=2, num_heads=4, dense_config=DENSE_CFG, attn_impl="xla")
    out = DiTEncoder(**kw).apply(params, x, q_valid=valid, context=ctx)
    outf = DiTEncoder(**kw, fused_prologue=True).apply(params, x, q_valid=valid, context=ctx)
    m = np.asarray(valid)
    np.testing.assert_allclose(
        np.asarray(out)[m], np.asarray(outf)[m], rtol=2e-4, atol=2e-4
    )


def test_fused_ln_contract_guard():
    """fused_ln with cross-attention k/v must raise, not silently compute
    self-attention on q (code-review r3)."""
    from superresolutionhep_tpu.models.attention import MultiheadAttention

    mha = MultiheadAttention(embed_dim=256, num_heads=4, impl="xla")
    rng = np.random.default_rng(7)
    x = _rand(rng, 2, 256, 256)
    y = _rand(rng, 2, 128, 256)
    params = mha.init(jax.random.PRNGKey(0), x)
    a = jnp.ones((2, 256), jnp.float32)
    b = jnp.zeros((2, 256), jnp.float32)
    with pytest.raises(ValueError, match="fused_ln"):
        mha.apply(params, x, k=y, fused_ln=(a, b))


def test_fused_fallback_on_ungated_shape(dit_pair):
    """L=192 fails the 128-block gate: the fused request must fall back to
    the equivalent unfused formulation inside MultiheadAttention and still
    match the standard path."""
    enc, enc_f, params, x, ctx, valid = dit_pair
    rng = np.random.default_rng(3)
    xs = _rand(rng, 2, 192, 256)
    vs = jnp.asarray(rng.random((2, 192)) > 0.2)
    out = enc.apply(params, xs, q_valid=vs, context=ctx)
    outf = enc_f.apply(params, xs, q_valid=vs, context=ctx)
    m = np.asarray(vs)
    np.testing.assert_allclose(
        np.asarray(out)[m], np.asarray(outf)[m], rtol=2e-4, atol=2e-4
    )


# ---------------------------------------------------------------------------
# fused x segment-packed composition: the fused prologue emits the packed
# kernel's transposed layout directly (packed_flash_attention_T), with
# per-cell modulation rows from the per-segment adaLN scatter
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dit_packed_pair():
    from superresolutionhep_tpu.ops.flash_packed import PACKED_DEFAULTS, set_packed_defaults

    kw = dict(embed_dim=256, num_layers=2, num_heads=4, dense_config=DENSE_CFG, attn_impl="flash")
    enc = DiTEncoder(**kw)
    enc_f = DiTEncoder(**kw, fused_prologue=True)
    rng = np.random.default_rng(5)
    B, S, E, C = 2, 512, 4, 160
    x = _rand(rng, B, S, 256)
    # packer layout (data/packing.py): seg id = event index within the row,
    # events start 128-aligned, -1 pads trail each event's aligned slot
    seg = np.full((B, S), -1, np.int32)
    seg[0, 0:200] = 0
    seg[0, 256 : 256 + 150] = 1
    seg[1, 0:128] = 0
    seg[1, 128 : 128 + 250] = 1
    seg[1, 384 : 384 + 96] = 2
    seg = jnp.asarray(seg)
    onehot = jnp.asarray(
        (np.asarray(seg)[..., None] == np.arange(E)[None, None, :]).astype(np.float32)
    )
    context_seg = _rand(rng, B, E, C)
    context = jnp.einsum("bse,bec->bsc", onehot, context_seg)
    valid = seg >= 0
    saved = dict(PACKED_DEFAULTS)
    set_packed_defaults(block_q=128, block_k=128, max_segment_len=256)
    params = enc.init(
        jax.random.PRNGKey(0), x, q_valid=valid, context=context,
        context_seg=context_seg, seg_onehot=onehot, segment_ids=seg,
    )
    yield enc, enc_f, params, x, context, context_seg, onehot, seg, valid
    set_packed_defaults(**saved)


def _apply_packed(mod, params, x, context, context_seg, onehot, seg, valid):
    return mod.apply(
        params, x, q_valid=valid, context=context,
        context_seg=context_seg, seg_onehot=onehot, segment_ids=seg,
    )


def test_dit_fused_packed_forward_parity(dit_packed_pair):
    enc, enc_f, params, *rest = dit_packed_pair
    valid = rest[-1]
    out = _apply_packed(enc, params, *rest)
    outf = _apply_packed(enc_f, params, *rest)
    m = np.asarray(valid)
    np.testing.assert_allclose(
        np.asarray(out)[m], np.asarray(outf)[m], rtol=2e-4, atol=2e-4
    )


def test_dit_fused_packed_grad_parity(dit_packed_pair):
    enc, enc_f, params, *rest = dit_packed_pair
    valid = rest[-1]

    def loss(p, mod):
        out = _apply_packed(mod, p, *rest)
        return jnp.sum(jnp.where(valid[..., None], out, 0.0) ** 2)

    g = jax.grad(lambda p: loss(p, enc))(params)
    gf = jax.grad(lambda p: loss(p, enc_f))(params)
    for u, v in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(gf)):
        scale = max(float(jnp.max(jnp.abs(u))), 1.0)
        assert float(jnp.max(jnp.abs(u - v))) / scale < 1e-4


def test_dit_fused_packed_xla_fallback(dit_packed_pair):
    """attn_impl='xla' on CPU fails the fused gate: the per-cell fallback
    (manual LN + folded affine + segment-equality einsum) must still match
    the standard packed path."""
    enc, enc_f, params, *rest = dit_packed_pair
    valid = rest[-1]
    kw = dict(embed_dim=256, num_layers=2, num_heads=4, dense_config=DENSE_CFG, attn_impl="xla")
    out = _apply_packed(DiTEncoder(**kw), params, *rest)
    outf = _apply_packed(DiTEncoder(**kw, fused_prologue=True), params, *rest)
    m = np.asarray(valid)
    np.testing.assert_allclose(
        np.asarray(out)[m], np.asarray(outf)[m], rtol=2e-4, atol=2e-4
    )
