"""Sample generation for the SR flow model.

Mirrors FlowModel.generate_samples (models/flow_model.py:302-329): integrate
the learned vector field from x0 ~ N(0,I) over t in linspace(0,1,n_steps),
optionally returning the full trajectory.

TPU-first: the reference's sequential ensemble loop (inference.py:145-152)
becomes a vmap over ensemble noise keys — one compiled program, ensemble axis
batched onto the MXU alongside the batch axis.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from .ode import FIXED_STEP_METHODS, odeint, odeint_ab2, odeint_fixed_store


def generate_samples(
    apply_fn: Callable,
    variables,
    batch: dict,
    key: jax.Array,
    n_steps: int,
    method: str = "dopri5",
    ret_seq: bool = False,
    rtol: float = 1e-4,
    atol: float = 1e-4,
    store_indices=None,
):
    """apply_fn(variables, batch, noisy, t) -> v_t.

    Returns the final sample (B,N,1); with ``ret_seq`` the full trajectory
    (n_steps,B,N,1); with ``store_indices`` (fixed-step methods) only the
    selected grid states (S,B,N,1) — O(S) instead of O(T) trajectory memory.
    """
    e_proxy = batch["e_proxy"]
    x0 = jax.random.normal(key, e_proxy.shape, e_proxy.dtype)
    ts = jnp.linspace(0.0, 1.0, n_steps)

    def vector_field(t, x):
        t_vec = jnp.full((x.shape[0],), t, x.dtype)
        return apply_fn(variables, batch, x, t_vec)

    if store_indices is not None and method in ("ab2", "ab2e"):
        boot = "euler" if method == "ab2e" else "heun"
        return odeint_ab2(vector_field, x0, ts, store_idx=store_indices, bootstrap=boot)
    if store_indices is not None and method == "ab3":
        from .ode import odeint_ab3

        return odeint_ab3(vector_field, x0, ts, store_idx=store_indices)
    if store_indices is not None and method in FIXED_STEP_METHODS:
        return odeint_fixed_store(vector_field, x0, ts, store_indices, method)

    traj = odeint(vector_field, x0, ts, method=method, rtol=rtol, atol=atol)
    if store_indices is not None:
        return traj[jnp.asarray(sorted(set(int(i) for i in store_indices)))]
    return traj if ret_seq else traj[-1]


def generate_ensemble(
    apply_fn: Callable,
    variables,
    batch: dict,
    key: jax.Array,
    n_ensemble: int,
    n_steps: int,
    method: str = "midpoint",
    ret_seq: bool = True,
    rtol: float = 1e-4,
    atol: float = 1e-4,
    store_indices=None,
):
    """Vmapped ensemble of generate_samples over independent noise draws.

    Returns (n_ensemble, n_steps, B, N, 1) when ret_seq, (n_ensemble, S, B,
    N, 1) with store_indices, else (n_ensemble, B, N, 1).
    """
    keys = jax.random.split(key, n_ensemble)
    fn = partial(
        generate_samples,
        apply_fn,
        variables,
        batch,
        n_steps=n_steps,
        method=method,
        ret_seq=ret_seq,
        rtol=rtol,
        atol=atol,
        store_indices=store_indices,
    )
    return jax.vmap(fn)(keys)
