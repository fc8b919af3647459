import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolutionhep_tpu.ops.flash_attention import (
    _ref_attention,
    flash_shapes_ok,
    masked_flash_attention,
)


def dense_reference(q, k, v, q_valid, kv_valid, scale):
    """Straightforward masked softmax attention in (B,L,H,D) layout."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    mask = kv_valid[:, None, None, :]
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(mask, p, 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    return out * q_valid[:, :, None, None]


@pytest.mark.parametrize("Lq,Lk", [(128, 128), (256, 128), (128, 384)])
def test_flash_matches_dense(Lq, Lk):
    B, H, D = 2, 4, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Lq, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Lk, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Lk, H, D)).astype(np.float32))
    q_valid = jnp.asarray(np.arange(Lq)[None, :] < np.array([[Lq], [Lq // 3]]))
    kv_valid = jnp.asarray(np.arange(Lk)[None, :] < np.array([[Lk], [Lk // 2]]))

    scale = 1.0 / np.sqrt(D)
    assert flash_shapes_ok(Lq, Lk, D)
    out = masked_flash_attention(q, k, v, q_valid, kv_valid, scale)
    ref = dense_reference(q, k, v, q_valid, kv_valid, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_all_padded_rows_zero():
    B, L, H, D = 1, 128, 2, 32
    q = jnp.ones((B, L, H, D))
    kv_valid = jnp.zeros((B, L), bool)  # no valid keys at all
    out = masked_flash_attention(q, q, q, jnp.ones((B, L), bool), kv_valid, 0.1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_flash_gradients_match_dense():
    B, L, H, D = 1, 128, 2, 32
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    valid = jnp.asarray(np.arange(L)[None, :] < 100)
    scale = 1.0 / np.sqrt(D)

    def f_flash(q, k, v):
        return (masked_flash_attention(q, k, v, valid, valid, scale) ** 2).sum()

    def f_dense(q, k, v):
        return (dense_reference(q, k, v, valid, valid, scale) ** 2).sum()

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_flash_gradients_multiblock_rectangular():
    """Backward kernels across multiple q/k blocks with partial padding on
    both sides (BQ=BK=512 internally at these lengths)."""
    B, Lq, Lk, H, D = 2, 1024, 512, 2, 32
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(B, Lq, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Lk, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Lk, H, D)).astype(np.float32))
    q_valid = jnp.asarray(np.arange(Lq)[None, :] < np.array([[700], [1024]]))
    kv_valid = jnp.asarray(np.arange(Lk)[None, :] < np.array([[300], [512]]))
    scale = 1.0 / np.sqrt(D)

    def f_flash(q, k, v):
        o = masked_flash_attention(q, k, v, q_valid, kv_valid, scale)
        return (o**2 * jnp.cos(o)).sum()

    def f_dense(q, k, v):
        o = dense_reference(q, k, v, q_valid, kv_valid, scale)
        return (o**2 * jnp.cos(o)).sum()

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_flash, g_dense):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=f"d{name}"
        )
    # padded-position grads must be exactly zero for k/v
    assert np.all(np.asarray(g_flash[1])[0, 300:] == 0)
    assert np.all(np.asarray(g_flash[2])[0, 300:] == 0)


def test_flash_bf16_forward_close():
    B, L, H, D = 1, 256, 2, 64
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    valid = jnp.asarray(np.arange(L)[None, :] < 200)
    scale = 1.0 / np.sqrt(D)
    ref = dense_reference(q, q, q, valid, valid, scale)
    out = masked_flash_attention(
        q.astype(jnp.bfloat16), q.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
        valid, valid, scale,
    )
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    assert err.mean() < 2e-2


def test_flash_gradients_finite_with_saturating_scores():
    """Mid-training attention can push logits to very large magnitudes.  The
    production kernel keeps the running-max online softmax in the forward and
    the backward recomputes p from the true LSE with the exponent capped at
    zero (exp2(min(s - lse, 0))), so saturating scores must yield finite
    gradients — the round-2 closure run stalled on inf gradients from an
    earlier clip-based design in exactly this regime."""
    B, L, H, D = 1, 256, 2, 64
    rng = np.random.default_rng(3)
    # scale inputs so raw scores span far beyond 2^80 base-2 logits
    q = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32)) * 30.0
    k = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32)) * 30.0
    v = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    valid = jnp.asarray(np.arange(L)[None, :] < 200)
    scale = 1.0 / np.sqrt(D)

    def f(q, k, v):
        return (masked_flash_attention(q, k, v, valid, valid, scale) ** 2).sum()

    out = masked_flash_attention(q, k, v, valid, valid, scale)
    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    assert np.isfinite(np.asarray(out)).all()
    for name, a in zip("qkv", g):
        assert np.isfinite(np.asarray(a)).all(), f"non-finite d{name}"
    # saturated softmax ~= hard max: the output should match the dense
    # reference closely even this deep into the clip regime for rows whose
    # max logit stays below the clip bound; global sanity: bounded by |v|
    assert np.abs(np.asarray(out)).max() <= np.abs(np.asarray(v)).max() + 1e-3


@pytest.mark.parametrize("Lq,Lk", [(256, 256), (128, 384)])
def test_nomax_matches_robust(Lq, Lk):
    """Inference no-max clipped-softmax variant is exact for in-bound logits."""
    B, H, D = 2, 4, 64
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(B, Lq, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Lk, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Lk, H, D)).astype(np.float32))
    q_valid = jnp.asarray(np.arange(Lq)[None, :] < np.array([[Lq], [Lq - 70]]))
    kv_valid = jnp.asarray(np.arange(Lk)[None, :] < np.array([[Lk], [Lk // 2]]))
    scale = 1.0 / np.sqrt(D)
    fast = masked_flash_attention(q, k, v, q_valid, kv_valid, scale, softmax="nomax_clip")
    robust = masked_flash_attention(q, k, v, q_valid, kv_valid, scale, softmax="max")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(robust), rtol=2e-5, atol=2e-5)


def test_nomax_selfcheck_detects_saturation():
    """The per-checkpoint gate must catch logits beyond the clip bound (where
    the no-max kernel is no longer exact) and pass in the benign regime."""
    from superresolutionhep_tpu.ops.flash_attention import nomax_selfcheck

    B, L, H, D = 1, 128, 2, 64
    rng = np.random.default_rng(7)
    base = rng.normal(size=(B, L, H, D)).astype(np.float32)
    valid = jnp.ones((B, L), bool)
    scale = 1.0 / np.sqrt(D)

    def pair(mult):
        q = jnp.asarray(base * mult)
        k = jnp.asarray(base * mult)  # q=k makes diagonal logits ~ mult^2 * D
        v = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
        robust = lambda _: masked_flash_attention(q, k, v, valid, valid, scale)  # noqa: E731
        fast = lambda _: masked_flash_attention(  # noqa: E731
            q, k, v, valid, valid, scale, softmax="nomax_clip"
        )
        return robust, fast

    robust, fast = pair(1.0)
    assert nomax_selfcheck(robust, fast, None)
    # logits ~ 40 * sqrt(D) ~ 320 >> CLIP_HI: clip saturates, outputs diverge
    robust, fast = pair(40.0)
    assert not nomax_selfcheck(robust, fast, None)
