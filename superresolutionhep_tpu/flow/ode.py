"""ODE integrators for flow-matching sample generation.

The reference integrates the learned vector field with
``torchdiffeq.odeint(..., linspace(0,1,n_steps), method='dopri5',
atol=rtol=1e-4)`` (models/flow_model.py:315-324).

TPU-first design:
  * Production path: fixed-step solvers (euler / midpoint / heun / rk4) as a
    single ``lax.scan`` over the time grid — static shapes, one compiled
    program, trajectory output for the intermediate-timestep storage feature
    of the inference driver (inference.py:54-69).
  * Parity path: a native Dormand-Prince 5(4) adaptive integrator
    (``odeint_dopri5``) with scipy-RK45-style error control and quartic dense
    output, run under ``lax.while_loop`` — matches the reference sampler
    within tolerance without any Python-level control flow.

All integrators share the signature ``odeint(f, y0, ts)`` with
``f(t, y) -> dy/dt`` and return the trajectory at the requested grid points,
shape (T, *y0.shape), with ``y[0] == y0`` (torchdiffeq convention).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

# ----------------------------------------------------------------------------
# fixed-step solvers
# ----------------------------------------------------------------------------


def _euler_step(f, t0, t1, y):
    return y + (t1 - t0) * f(t0, y)


def _midpoint_step(f, t0, t1, y):
    h = t1 - t0
    return y + h * f(t0 + h / 2, y + (h / 2) * f(t0, y))


def _heun_step(f, t0, t1, y):
    h = t1 - t0
    k1 = f(t0, y)
    k2 = f(t1, y + h * k1)
    return y + (h / 2) * (k1 + k2)


def _rk4_step(f, t0, t1, y):
    h = t1 - t0
    k1 = f(t0, y)
    k2 = f(t0 + h / 2, y + (h / 2) * k1)
    k3 = f(t0 + h / 2, y + (h / 2) * k2)
    k4 = f(t1, y + h * k3)
    return y + (h / 6) * (k1 + 2 * k2 + 2 * k3 + k4)


FIXED_STEP_METHODS = {
    "euler": _euler_step,
    "midpoint": _midpoint_step,
    "heun": _heun_step,
    "rk4": _rk4_step,
}

# multistep methods reuse previous evaluations (1 f-eval per step at 2nd/3rd
# order — half the cost of midpoint/heun); handled by odeint_ab2/odeint_ab3.
# "ab2e" is ab2 with an Euler bootstrap (one fewer eval on the trajectory).
MULTISTEP_METHODS = ("ab2", "ab2e", "ab3")


def odeint_ab2(f: Callable, y0, ts, store_idx=None, bootstrap: str = "heun"):
    """Adams-Bashforth-2 over the grid: Heun bootstrap on the first interval,
    then x_{n+1} = x_n + h[(1 + r) f_n - r f_{n-1}], r = h / (2 h_prev) —
    one vector-field evaluation per step with 2nd-order accuracy (the
    training-free fast-solver direction for flow ODEs; see PAPERS.md).

    ``bootstrap="euler"`` starts with a plain Euler step instead, reusing the
    already-computed f0 — one fewer vector-field evaluation on the whole
    trajectory (25 -> 24 at the production n_steps=25, a 4% cost cut).  A
    single O(h^2) local error at the first step matches AB2's global O(h^2)
    order, so the asymptotic accuracy is unchanged; the constant is measured
    on the trained checkpoint in tests/test_sampler_parity_trained.py.

    Returns the full trajectory (T, *y) when store_idx is None, else the
    states at the (sorted, static) ``store_idx`` grid positions, collected in
    an O(S) carry buffer instead of an O(T) trajectory.
    """
    ts = jnp.asarray(ts)
    T = ts.shape[0]
    store = sorted(set(int(i) for i in store_idx)) if store_idx is not None else None

    t0, t1 = ts[0], ts[1]
    h0 = t1 - t0
    f0 = f(t0, y0)
    if bootstrap == "euler":
        y1 = y0 + h0 * f0  # Euler bootstrap: no extra f-eval
    elif bootstrap == "heun":
        y1 = y0 + (h0 / 2) * (f0 + f(t1, y0 + h0 * f0))  # Heun bootstrap
    else:
        raise ValueError(f"unknown ab2 bootstrap {bootstrap!r}")

    if store is not None:
        buf = jnp.stack([y0] * len(store))
        for s_i, pos in enumerate(store):
            if pos == 0:
                buf = buf.at[s_i].set(y0)
            elif pos == 1:
                buf = buf.at[s_i].set(y1)

        def body(carry, inp):
            y, f_prev, h_prev, n, buf = carry
            t_n, t_np1 = inp
            f_n = f(t_n, y)
            h = t_np1 - t_n
            r = h / (2 * h_prev)
            y_new = y + h * ((1 + r) * f_n - r * f_prev)
            for s_i, pos in enumerate(store):
                if pos >= 2:
                    buf = buf.at[s_i].set(jnp.where(n == pos, y_new, buf[s_i]))
            return (y_new, f_n, h, n + 1, buf), None

        init = (y1, f0, h0, jnp.array(2, jnp.int32), buf)
        (_, _, _, _, buf), _ = lax.scan(body, init, (ts[1:-1], ts[2:]))
        return buf

    def body(carry, inp):
        y, f_prev, h_prev = carry
        t_n, t_np1 = inp
        f_n = f(t_n, y)
        h = t_np1 - t_n
        r = h / (2 * h_prev)
        y_new = y + h * ((1 + r) * f_n - r * f_prev)
        return (y_new, f_n, h), y_new

    (_, _, _), ys = lax.scan(body, (y1, f0, h0), (ts[1:-1], ts[2:]))
    return jnp.concatenate([y0[None], y1[None], ys], axis=0)


def odeint_ab3(f: Callable, y0, ts, store_idx=None):
    """Adams-Bashforth-3 on a UNIFORM grid: Heun bootstrap for y1, AB2 for
    y2, then x_{n+1} = x_n + h(23 f_n - 16 f_{n-1} + 5 f_{n-2})/12 — still
    one vector-field evaluation per step, 3rd-order accuracy (one more
    eval-count cut at fixed order over ab2; TODO.md round-2 item).

    The sampler grids are ``linspace(0, 1, n)`` so uniform-step coefficients
    apply exactly.  Same ``store_idx`` contract as :func:`odeint_ab2`.

    Grids shorter than 3 points cannot host the AB3 bootstrap (the y2 step
    would integrate past the grid); they delegate to :func:`odeint_ab2`,
    which handles 2-point grids exactly (ADVICE r2: ab3 at n_steps=2 used to
    silently return an out-of-range final state).
    """
    ts = jnp.asarray(ts)
    if ts.shape[0] < 3:
        return odeint_ab2(f, y0, ts, store_idx=store_idx)
    store = sorted(set(int(i) for i in store_idx)) if store_idx is not None else None

    h = ts[1] - ts[0]
    f0 = f(ts[0], y0)
    y1 = y0 + (h / 2) * (f0 + f(ts[1], y0 + h * f0))  # Heun bootstrap
    f1 = f(ts[1], y1)
    y2 = y1 + h * (1.5 * f1 - 0.5 * f0)  # uniform-step AB2
    boot = [y0, y1, y2]

    if store is not None:
        buf = jnp.stack([y0] * len(store))
        for s_i, pos in enumerate(store):
            if pos <= 2:
                buf = buf.at[s_i].set(boot[pos])

        def body(carry, inp):
            y, f_nm1, f_nm2, n, buf = carry
            t_n = inp
            f_n = f(t_n, y)
            y_new = y + (h / 12.0) * (23.0 * f_n - 16.0 * f_nm1 + 5.0 * f_nm2)
            for s_i, pos in enumerate(store):
                if pos >= 3:
                    buf = buf.at[s_i].set(jnp.where(n == pos, y_new, buf[s_i]))
            return (y_new, f_n, f_nm1, n + 1, buf), None

        init = (y2, f1, f0, jnp.array(3, jnp.int32), buf)
        (_, _, _, _, buf), _ = lax.scan(body, init, ts[2:-1])
        return buf

    def body(carry, t_n):
        y, f_nm1, f_nm2 = carry
        f_n = f(t_n, y)
        y_new = y + (h / 12.0) * (23.0 * f_n - 16.0 * f_nm1 + 5.0 * f_nm2)
        return (y_new, f_n, f_nm1), y_new

    (_, _, _), ys = lax.scan(body, (y2, f1, f0), ts[2:-1])
    return jnp.concatenate([y0[None], y1[None], y2[None], ys], axis=0)


def odeint_fixed(f: Callable, y0, ts, method: str = "midpoint"):
    """Integrate with one fixed step per grid interval via ``lax.scan``."""
    step = FIXED_STEP_METHODS[method]

    def body(y, t_pair):
        t0, t1 = t_pair
        y1 = step(f, t0, t1, y)
        return y1, y1

    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=-1)
    _, ys = lax.scan(body, y0, t_pairs)
    return jnp.concatenate([y0[None], ys], axis=0)


def odeint_fixed_store(f: Callable, y0, ts, store_idx, method: str = "midpoint"):
    """Fixed-step integration storing ONLY the grid states in ``store_idx``
    (sorted, static).  The full-trajectory variant costs O(T x state) HBM —
    at production inference shapes that's gigabytes of trajectory for a
    handful of wanted snapshots (inference.py:54-69 stores ~5).

    Returns (len(store_idx), *y0.shape) stacked in store_idx order.
    """
    step = FIXED_STEP_METHODS[method]
    store_idx = sorted(set(int(i) for i in store_idx))
    out = []
    y = y0
    pos = 0
    for target in store_idx:
        if target == 0:
            out.append(y0)
            continue
        seg = jnp.stack([ts[pos:target], ts[pos + 1 : target + 1]], axis=-1)

        def body(y, t_pair):
            t0, t1 = t_pair
            return step(f, t0, t1, y), None

        y, _ = lax.scan(body, y, seg)
        pos = target
        out.append(y)
    return jnp.stack(out, axis=0)


# ----------------------------------------------------------------------------
# Dormand-Prince 5(4) adaptive solver with dense output
# ----------------------------------------------------------------------------

_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0], dtype=jnp.float32)

_A = [
    jnp.array([1 / 5], dtype=jnp.float32),
    jnp.array([3 / 40, 9 / 40], dtype=jnp.float32),
    jnp.array([44 / 45, -56 / 15, 32 / 9], dtype=jnp.float32),
    jnp.array([19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729], dtype=jnp.float32),
    jnp.array([9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656], dtype=jnp.float32),
]

_B = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84], dtype=jnp.float32)

# b - b* (5th-order minus embedded 4th-order weights), incl. the FSAL stage
_E = jnp.array(
    [
        35 / 384 - 5179 / 57600,
        0.0,
        500 / 1113 - 7571 / 16695,
        125 / 192 - 393 / 640,
        -2187 / 6784 + 92097 / 339200,
        11 / 84 - 187 / 2100,
        -1 / 40,
    ],
    dtype=jnp.float32,
)

# scipy RK45 dense-output interpolation matrix (7 stages x 4 powers of theta)
_P = jnp.array(
    [
        [1.0, -8048581381 / 2820520608, 8663915743 / 2820520608, -12715105075 / 11282082432],
        [0.0, 0.0, 0.0, 0.0],
        [0.0, 131558114200 / 32700410799, -68118460800 / 10900136933, 87487479700 / 32700410799],
        [0.0, -1754552775 / 470086768, 14199869525 / 1410260304, -10690763975 / 1880347072],
        [0.0, 127303824393 / 49829197408, -318862633887 / 49829197408, 701980252875 / 199316789632],
        [0.0, -282668133 / 205662961, 2019193451 / 616988883, -1453857185 / 822651844],
        [0.0, 40617522 / 29380423, -110615467 / 29380423, 69997945 / 29380423],
    ],
    dtype=jnp.float32,
)

_SAFETY = 0.9
_MIN_FACTOR = 0.2
_MAX_FACTOR = 10.0
_ORDER_EXP = -1.0 / 5.0


def _rms_norm(x):
    return jnp.sqrt(jnp.mean(x * x))


def _initial_step(f, t0, y0, f0, t1, atol, rtol):
    """scipy `_select_initial_step` heuristic (jittable)."""
    scale = atol + jnp.abs(y0) * rtol
    d0 = _rms_norm(y0 / scale)
    d1 = _rms_norm(f0 / scale)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    y1 = y0 + h0 * f0
    f1 = f(t0 + h0, y1)
    d2 = _rms_norm((f1 - f0) / scale) / h0
    h1 = jnp.where(
        (d1 <= 1e-15) & (d2 <= 1e-15),
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / jnp.maximum(d1, d2)) ** (1.0 / 5.0),
    )
    return jnp.minimum(jnp.minimum(100 * h0, h1), t1 - t0)


def odeint_dopri5(
    f: Callable,
    y0,
    ts,
    rtol: float = 1e-4,
    atol: float = 1e-4,
    max_steps: int = 10_000,
):
    """Adaptive DOPRI5 with dense output at the grid points ``ts``.

    Matches the reference sampler's torchdiffeq call (atol=rtol=1e-4,
    models/flow_model.py:315-324) within solver tolerance.
    """
    ts = jnp.asarray(ts, jnp.float32)
    t0, t1 = ts[0], ts[-1]
    f0 = f(t0, y0)
    h0 = _initial_step(f, t0, y0, f0, t1, atol, rtol)

    n_out = ts.shape[0]
    ys = jnp.zeros((n_out,) + y0.shape, y0.dtype)
    ys = ys.at[0].set(y0)

    def step_once(t, y, k1, h):
        """One RK step attempt; returns (y_new, err_norm, K stages incl. FSAL)."""
        ks = [k1]
        for i in range(5):
            ti = t + _C[i + 1] * h
            yi = y + h * sum(_A[i][j] * ks[j] for j in range(i + 1))
            ks.append(f(ti, yi))
        y_new = y + h * sum(_B[j] * ks[j] for j in range(6))
        k7 = f(t + h, y_new)
        ks.append(k7)
        K = jnp.stack(ks)  # (7, *y.shape)
        err = h * jnp.tensordot(_E, K, axes=1, precision=lax.Precision.HIGHEST)
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_new))
        return y_new, _rms_norm(err / scale), K

    def cond(state):
        t, y, k1, h, ys, n_iter = state
        return (t < t1) & (n_iter < max_steps)

    def body(state):
        t, y, k1, h, ys, n_iter = state
        h = jnp.minimum(h, t1 - t)
        y_new, err_norm, K = step_once(t, y, k1, h)
        accept = err_norm <= 1.0

        factor = jnp.where(
            err_norm == 0.0,
            _MAX_FACTOR,
            jnp.clip(_SAFETY * err_norm**_ORDER_EXP, _MIN_FACTOR, _MAX_FACTOR),
        )
        factor = jnp.where(accept, factor, jnp.minimum(factor, 1.0))
        h_next = h * factor

        # dense output: evaluate at every grid point inside (t, t+h].
        # HIGHEST precision: on TPU the default matmul precision is bf16,
        # which would swamp the solver tolerance.
        t_new = t + h
        theta = jnp.clip((ts - t) / jnp.maximum(h, 1e-30), 0.0, 1.0)  # (T,)
        powers = jnp.stack([theta, theta**2, theta**3, theta**4], axis=-1)  # (T,4)
        w = jnp.matmul(powers, _P.T, precision=lax.Precision.HIGHEST)  # (T, 7)
        dense = y[None] + h * jnp.tensordot(w, K, axes=1, precision=lax.Precision.HIGHEST)
        in_window = (ts > t) & (ts <= t_new + 1e-12) & accept
        mask = in_window.reshape((n_out,) + (1,) * y.ndim)
        ys = jnp.where(mask, dense, ys)

        t = jnp.where(accept, t_new, t)
        y = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, a, b), y_new, y)
        k1 = jnp.where(accept, K[6], k1)  # FSAL
        return (t, y, k1, h_next, ys, n_iter + 1)

    state = (t0, y0, f0, h0, ys, jnp.array(0, jnp.int32))
    _, _, _, _, ys, _ = lax.while_loop(cond, body, state)
    return ys


def odeint(f, y0, ts, method: str = "dopri5", rtol: float = 1e-4, atol: float = 1e-4):
    if method in FIXED_STEP_METHODS:
        return odeint_fixed(f, y0, ts, method)
    if method == "ab2":
        return odeint_ab2(f, y0, ts)
    if method == "ab2e":
        return odeint_ab2(f, y0, ts, bootstrap="euler")
    if method == "ab3":
        return odeint_ab3(f, y0, ts)
    if method == "dopri5":
        return odeint_dopri5(f, y0, ts, rtol=rtol, atol=atol)
    raise ValueError(f"unknown ODE method {method!r}")
