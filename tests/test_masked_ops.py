import jax
import jax.numpy as jnp
import numpy as np

from superresolutionhep_tpu.ops.masked import attach_context, masked_mean, masked_softmax, merge_masks


def test_masked_softmax_matches_dense_on_valid():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 8)).astype(np.float32))
    mask = jnp.asarray(np.array([[True] * 5 + [False] * 3, [True] * 8]))
    out = masked_softmax(x, mask, axis=-1)
    # valid entries: softmax over the valid slice
    ref = np.exp(np.asarray(x[0, :, :5]))
    ref = ref / ref.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out[0, :, :5]), ref, rtol=1e-5)
    # padded entries exactly zero
    assert np.all(np.asarray(out[0, :, 5:]) == 0.0)
    # rows sum to 1
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-5)


def test_masked_softmax_all_padded_row_is_finite():
    x = jnp.ones((1, 2, 4))
    mask = jnp.zeros((1, 4), bool)
    out = masked_softmax(x, mask, axis=-1)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.all(np.asarray(out) == 0.0)


def test_masked_mean_guards_empty():
    x = jnp.ones((2, 4, 3))
    mask = jnp.asarray([[True, True, False, False], [False] * 4])
    out = masked_mean(x, mask, axis=1)
    np.testing.assert_allclose(np.asarray(out[0]), 1.0)
    assert np.all(np.isfinite(np.asarray(out[1])))


def test_merge_masks():
    q = jnp.asarray([[True, True, False]])
    kv = jnp.asarray([[True, False]])
    m = merge_masks(q, kv, None, 3, 2)
    expect = np.array([[[True, False], [True, False], [False, False]]])
    np.testing.assert_array_equal(np.asarray(m), expect)

    adj = jnp.asarray([[[True, True], [False, True], [True, True]]])
    m2 = merge_masks(q, kv, adj, 3, 2)
    np.testing.assert_array_equal(np.asarray(m2), expect & np.asarray(adj))

    assert merge_masks(None, None, None, 3, 2) is None


def test_attach_context_broadcast():
    x = jnp.ones((2, 5, 3))
    ctx = jnp.arange(8.0).reshape(2, 4)
    out = attach_context(x, ctx)
    assert out.shape == (2, 5, 7)
    np.testing.assert_allclose(np.asarray(out[0, 2, 3:]), np.arange(4.0))
