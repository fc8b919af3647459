import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolutionhep_tpu.flow.cfm import sample_location_and_conditional_flow
from superresolutionhep_tpu.flow.ode import odeint_ab2, odeint_ab3, odeint_dopri5, odeint_fixed


def exp_decay(t, y):
    return -y


def test_fixed_step_solvers_converge():
    y0 = jnp.ones((4, 3))
    ts = jnp.linspace(0.0, 1.0, 65)
    for method, tol in [("euler", 1e-2), ("midpoint", 1e-4), ("heun", 1e-4), ("rk4", 1e-6)]:
        ys = odeint_fixed(exp_decay, y0, ts, method)
        np.testing.assert_allclose(np.asarray(ys[-1]), np.exp(-1.0), rtol=tol)
        np.testing.assert_allclose(np.asarray(ys[0]), 1.0)


def test_ab3_short_grids_stay_on_grid():
    """ab3 on 2- and 3-point grids must return a trajectory of exactly
    len(ts) states ending at ts[-1] (ADVICE r2: n_steps=2 used to emit a
    3-state trajectory extrapolating past t=1)."""
    y0 = jnp.ones((4,))
    for n, tol in [(2, 0.4), (3, 0.15)]:
        ts = jnp.linspace(0.0, 1.0, n)
        ys = odeint_ab3(exp_decay, y0, ts)
        assert ys.shape[0] == n
        np.testing.assert_allclose(np.asarray(ys[-1]), np.exp(-1.0), rtol=tol)
        # store_idx variant agrees with the trajectory tail
        last = odeint_ab3(exp_decay, y0, ts, store_idx=[n - 1])
        np.testing.assert_allclose(np.asarray(last[0]), np.asarray(ys[-1]))
    # ab2 2-point behavior (the delegate target) is itself on-grid
    ys2 = odeint_ab2(exp_decay, y0, jnp.linspace(0.0, 1.0, 2))
    assert ys2.shape[0] == 2


def test_dopri5_linear_ode_dense_output():
    y0 = jnp.ones((8,))
    ts = jnp.linspace(0.0, 2.0, 25)
    ys = jax.jit(lambda y: odeint_dopri5(exp_decay, y, ts, rtol=1e-6, atol=1e-8))(y0)
    expect = np.exp(-np.asarray(ts))[:, None] * np.ones((1, 8))
    np.testing.assert_allclose(np.asarray(ys), expect, rtol=1e-4, atol=1e-6)


def test_dopri5_nonlinear_matches_scipy():
    from scipy.integrate import solve_ivp

    def f(t, y):
        return jnp.sin(t) * y - 0.5 * y**2 / (1 + t)

    y0 = jnp.asarray([0.8, 1.5])
    ts = np.linspace(0.0, 3.0, 11)
    ours = odeint_dopri5(f, y0, jnp.asarray(ts), rtol=1e-6, atol=1e-8)
    ref = solve_ivp(
        lambda t, y: np.sin(t) * y - 0.5 * y**2 / (1 + t),
        (0, 3),
        np.asarray(y0),
        t_eval=ts,
        rtol=1e-8,
        atol=1e-10,
    )
    np.testing.assert_allclose(np.asarray(ours), ref.y.T, rtol=2e-4, atol=1e-6)


def test_dopri5_vmappable():
    y0 = jnp.ones((3, 5))
    ts = jnp.linspace(0.0, 1.0, 5)
    out = jax.vmap(lambda y: odeint_dopri5(exp_decay, y, ts))(y0)
    assert out.shape == (3, 5, 5)
    np.testing.assert_allclose(np.asarray(out[:, -1]), np.exp(-1.0), rtol=1e-4)


def test_cfm_interpolant_math():
    key = jax.random.PRNGKey(0)
    x1 = jax.random.normal(jax.random.PRNGKey(1), (16, 8, 1))
    sigma = 1e-5
    t, xt, ut = sample_location_and_conditional_flow(key, x1, sigma)
    assert t.shape == (16,)
    # reconstruct x0 from xt and check ut = x1 - (1-sigma) x0
    tb = t[:, None, None]
    x0 = (xt - tb * x1) / (1 - (1 - sigma) * tb)
    np.testing.assert_allclose(
        np.asarray(ut), np.asarray(x1 - (1 - sigma) * x0), rtol=1e-3, atol=1e-5
    )
    # at t the interpolant has the right endpoints
    t0, xt0, _ = sample_location_and_conditional_flow(key, x1, sigma, t=jnp.ones((16,)))
    np.testing.assert_allclose(np.asarray(xt0), np.asarray(x1) * 1.0, atol=1e-4)
