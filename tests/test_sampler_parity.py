"""Production fixed-step sampling vs the reference-parity adaptive dopri5:
same noise draw, same model — the midpoint/heun scan paths must land within
solver tolerance of the adaptive integrator (justifying the fast TPU path)."""

import jax
import jax.numpy as jnp
import numpy as np

from superresolutionhep_tpu.flow.sampling import generate_ensemble, generate_samples
from superresolutionhep_tpu.models.flow_model import FlowModel

from test_flow_model import make_batch, small_flow_config


def _setup():
    cfg = small_flow_config("DiT")
    # non-degenerate dynamics: disable the zero-init head policies
    model = FlowModel(config=cfg, attn_impl="xla")
    batch = make_batch(B=2, N=16, lengths=(16, 10), seed=3)
    noisy = jnp.zeros((2, 16, 1))
    t = jnp.zeros((2,))
    variables = model.init(jax.random.PRNGKey(7), batch, noisy, t)
    apply_fn = lambda v, b, x, tt: model.apply(v, b, x, tt)  # noqa: E731
    return apply_fn, variables, batch


def test_fixed_step_matches_dopri5():
    apply_fn, variables, batch = _setup()
    key = jax.random.PRNGKey(0)
    ref = generate_samples(apply_fn, variables, batch, key, n_steps=25, method="dopri5")
    mid = generate_samples(apply_fn, variables, batch, key, n_steps=25, method="midpoint")
    heun = generate_samples(apply_fn, variables, batch, key, n_steps=25, method="heun")
    m = np.asarray(batch["q_mask"])
    for fast in (mid, heun):
        diff = np.abs(np.asarray(fast) - np.asarray(ref))[..., 0][m]
        scale = np.abs(np.asarray(ref))[..., 0][m].mean() + 1e-3
        assert diff.max() / scale < 0.05, diff.max()


def test_store_indices_match_full_trajectory():
    apply_fn, variables, batch = _setup()
    key = jax.random.PRNGKey(1)
    full = generate_samples(
        apply_fn, variables, batch, key, n_steps=9, method="midpoint", ret_seq=True
    )
    stored = generate_samples(
        apply_fn, variables, batch, key, n_steps=9, method="midpoint",
        store_indices=[0, 4, 8],
    )
    np.testing.assert_allclose(np.asarray(stored[0]), np.asarray(full[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(stored[1]), np.asarray(full[4]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(stored[2]), np.asarray(full[8]), rtol=1e-5, atol=1e-6)


def test_ensemble_mean_variance_shrinks():
    apply_fn, variables, batch = _setup()
    key = jax.random.PRNGKey(2)
    ens = generate_ensemble(
        apply_fn, variables, batch, key, n_ensemble=6, n_steps=9,
        method="midpoint", ret_seq=False,
    )
    assert ens.shape[0] == 6
    # members differ (independent noise draws)
    spread = np.asarray(ens).std(axis=0)[np.asarray(batch["q_mask"])]
    assert spread.mean() > 1e-4


def test_ab2_matches_dopri5_and_store():
    apply_fn, variables, batch = _setup()
    key = jax.random.PRNGKey(4)
    ref = generate_samples(apply_fn, variables, batch, key, n_steps=25, method="dopri5")
    ab2 = generate_samples(apply_fn, variables, batch, key, n_steps=25, method="ab2")
    m = np.asarray(batch["q_mask"])
    diff = np.abs(np.asarray(ab2) - np.asarray(ref))[..., 0][m]
    scale = np.abs(np.asarray(ref))[..., 0][m].mean() + 1e-3
    assert diff.max() / scale < 0.05, diff.max()

    full = generate_samples(apply_fn, variables, batch, key, n_steps=9, method="ab2", ret_seq=True)
    stored = generate_samples(
        apply_fn, variables, batch, key, n_steps=9, method="ab2", store_indices=[0, 1, 4, 8]
    )
    for s_i, pos in enumerate([0, 1, 4, 8]):
        np.testing.assert_allclose(
            np.asarray(stored[s_i]), np.asarray(full[pos]), rtol=1e-5, atol=1e-6
        )


def test_ab2e_matches_dopri5_and_store():
    """ab2e (Euler bootstrap): one fewer f-eval than ab2 on the trajectory,
    same global 2nd order — must pass the same 5% gate vs dopri5, and its
    store path must match its own full trajectory."""
    apply_fn, variables, batch = _setup()
    key = jax.random.PRNGKey(4)
    ref = generate_samples(apply_fn, variables, batch, key, n_steps=25, method="dopri5")
    fast = generate_samples(apply_fn, variables, batch, key, n_steps=25, method="ab2e")
    m = np.asarray(batch["q_mask"])
    diff = np.abs(np.asarray(fast) - np.asarray(ref))[..., 0][m]
    scale = np.abs(np.asarray(ref))[..., 0][m].mean() + 1e-3
    assert diff.max() / scale < 0.05, diff.max()

    full = generate_samples(apply_fn, variables, batch, key, n_steps=9, method="ab2e", ret_seq=True)
    stored = generate_samples(
        apply_fn, variables, batch, key, n_steps=9, method="ab2e", store_indices=[0, 1, 4, 8]
    )
    for s_i, pos in enumerate([0, 1, 4, 8]):
        np.testing.assert_allclose(
            np.asarray(stored[s_i]), np.asarray(full[pos]), rtol=1e-5, atol=1e-6
        )


def test_ab3_matches_dopri5_and_store():
    """AB3: 1 eval/step at 3rd order — within the same 5% gate as ab2
    (VERDICT r1 item 10), and the O(S) store path matches the trajectory."""
    apply_fn, variables, batch = _setup()
    key = jax.random.PRNGKey(4)
    ref = generate_samples(apply_fn, variables, batch, key, n_steps=25, method="dopri5")
    ab3 = generate_samples(apply_fn, variables, batch, key, n_steps=25, method="ab3")
    m = np.asarray(batch["q_mask"])
    diff = np.abs(np.asarray(ab3) - np.asarray(ref))[..., 0][m]
    scale = np.abs(np.asarray(ref))[..., 0][m].mean() + 1e-3
    assert diff.max() / scale < 0.05, diff.max()

    full = generate_samples(
        apply_fn, variables, batch, key, n_steps=9, method="ab3", ret_seq=True
    )
    stored = generate_samples(
        apply_fn, variables, batch, key, n_steps=9, method="ab3",
        store_indices=[0, 1, 2, 5, 8],
    )
    for s_i, pos in enumerate([0, 1, 2, 5, 8]):
        np.testing.assert_allclose(
            np.asarray(stored[s_i]), np.asarray(full[pos]), rtol=1e-5, atol=1e-6
        )


def test_ab3_beats_ab2_on_a_stiffish_field():
    """On a known ODE the 3rd-order method should cut the error vs ab2 at
    equal step count (the point of adding it)."""
    from superresolutionhep_tpu.flow.ode import odeint_ab2, odeint_ab3

    def f(t, y):
        return -3.0 * y + jnp.sin(7.0 * t)

    y0 = jnp.ones((4,))
    ts = jnp.linspace(0.0, 1.0, 81)
    exact = odeint_ab3(f, y0, jnp.linspace(0.0, 1.0, 2001))[-1]
    e2 = float(jnp.abs(odeint_ab2(f, y0, ts)[-1] - exact).max())
    e3 = float(jnp.abs(odeint_ab3(f, y0, ts)[-1] - exact).max())
    assert e3 < e2 * 0.5, (e2, e3)
    # and the order: halving h cuts the ab3 error ~8x (3rd order), ab2 ~4x
    e3_half = float(jnp.abs(odeint_ab3(f, y0, jnp.linspace(0.0, 1.0, 161))[-1] - exact).max())
    assert e3_half < e3 / 5.0, (e3, e3_half)
