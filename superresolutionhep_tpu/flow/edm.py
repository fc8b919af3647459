"""Alternative diffusion samplers (EDM / Karras family).

Capability mirror of models/samplers.py:6-236 (vestigial in the reference —
imported nowhere — but part of the capability surface): the Karras EDM
sampler with rho-schedule, 2nd-order Heun correction and S_churn noise
injection; a DPM-Solver-2 variant; and a linear-multistep (LMS) sampler with
quadrature coefficients.

TPU-first: all samplers are `lax.scan` loops over a *static* sigma schedule;
the LMS quadrature coefficients are precomputed on host at trace time.

All samplers share the signature
``sampler(denoise_fn, x_init, key, num_steps, ...)`` where
``denoise_fn(x, sigma) -> D(x; sigma)`` is the denoiser (x0-prediction).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def karras_sigmas(num_steps: int, sigma_min: float = 0.002, sigma_max: float = 80.0, rho: float = 7.0):
    """Karras et al. rho-schedule, descending, with terminal 0."""
    i = np.arange(num_steps)
    s = (sigma_max ** (1 / rho) + i / max(num_steps - 1, 1) * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))) ** rho
    return np.concatenate([s, [0.0]]).astype(np.float32)


def edm_sampler(
    denoise_fn: Callable,
    x_init,
    key,
    num_steps: int = 18,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
    S_churn: float = 0.0,
    S_min: float = 0.0,
    S_max: float = float("inf"),
    S_noise: float = 1.0,
    ret_seq: bool = False,
):
    """Karras EDM sampler: optional churn, Euler step + Heun correction
    (mirrors models/samplers.py:6-77)."""
    sigmas = jnp.asarray(karras_sigmas(num_steps, sigma_min, sigma_max, rho))
    x = x_init * sigmas[0]
    gamma_base = min(S_churn / num_steps, np.sqrt(2.0) - 1.0)

    def body(carry, inp):
        x, key = carry
        t_cur, t_next = inp
        key, k1 = jax.random.split(key)

        gamma = jnp.where((t_cur >= S_min) & (t_cur <= S_max), gamma_base, 0.0)
        t_hat = t_cur * (1 + gamma)
        noise = S_noise * jax.random.normal(k1, x.shape, x.dtype)
        x_hat = x + jnp.sqrt(jnp.maximum(t_hat**2 - t_cur**2, 0.0)) * noise

        d_cur = (x_hat - denoise_fn(x_hat, t_hat)) / jnp.maximum(t_hat, 1e-12)
        x_euler = x_hat + (t_next - t_hat) * d_cur

        # Heun 2nd-order correction for all but the last (t_next==0) step
        d_prime = (x_euler - denoise_fn(x_euler, jnp.maximum(t_next, 1e-12))) / jnp.maximum(t_next, 1e-12)
        x_heun = x_hat + (t_next - t_hat) * 0.5 * (d_cur + d_prime)
        x_new = jnp.where(t_next > 0, x_heun, x_euler)
        return (x_new, key), x_new

    (x, _), seq = lax.scan(body, (x, key), (sigmas[:-1], sigmas[1:]))
    return seq if ret_seq else x


def dpm2_sampler(
    denoise_fn: Callable,
    x_init,
    key,
    num_steps: int = 18,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
    ret_seq: bool = False,
):
    """DPM-Solver-2 on the Karras schedule (mirrors models/samplers.py:79-163):
    midpoint evaluation at the log-space geometric mean sigma."""
    sigmas = jnp.asarray(karras_sigmas(num_steps, sigma_min, sigma_max, rho))
    x = x_init * sigmas[0]

    def body(x, inp):
        t_cur, t_next = inp
        d = (x - denoise_fn(x, t_cur)) / jnp.maximum(t_cur, 1e-12)
        # euler fallback for the terminal step
        x_euler = x + (t_next - t_cur) * d
        sigma_mid = jnp.exp(0.5 * (jnp.log(jnp.maximum(t_cur, 1e-12)) + jnp.log(jnp.maximum(t_next, 1e-12))))
        x_mid = x + (sigma_mid - t_cur) * d
        d_mid = (x_mid - denoise_fn(x_mid, sigma_mid)) / jnp.maximum(sigma_mid, 1e-12)
        x_dpm = x + (t_next - t_cur) * d_mid
        x_new = jnp.where(t_next > 0, x_dpm, x_euler)
        return x_new, x_new

    x, seq = lax.scan(body, x, (sigmas[:-1], sigmas[1:]))
    return seq if ret_seq else x


def _lms_coefficients(sigmas: np.ndarray, order: int) -> np.ndarray:
    """Adams-Bashforth-style coefficients over the sigma grid via quadrature
    (mirrors the scipy.integrate.quad construction, models/samplers.py:167-236)."""
    from scipy.integrate import quad

    n = len(sigmas) - 1
    coeffs = np.zeros((n, order), np.float32)
    for i in range(n):
        cur_order = min(i + 1, order)
        for j in range(cur_order):
            def lms_fn(tau, i=i, j=j, cur_order=cur_order):
                prod = 1.0
                for k in range(cur_order):
                    if j == k:
                        continue
                    prod *= (tau - sigmas[i - k]) / (sigmas[i - j] - sigmas[i - k])
                return prod

            coeffs[i, j] = quad(lms_fn, sigmas[i], sigmas[i + 1])[0]
    return coeffs


def lms_sampler(
    denoise_fn: Callable,
    x_init,
    key,
    num_steps: int = 18,
    order: int = 4,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
    ret_seq: bool = False,
):
    """Linear multistep sampler: history of derivatives combined with
    precomputed quadrature coefficients, as a lax.scan with a fixed-size
    derivative buffer."""
    sig_np = karras_sigmas(num_steps, sigma_min, sigma_max, rho)
    coeffs = jnp.asarray(_lms_coefficients(sig_np, order))  # (n, order)
    sigmas = jnp.asarray(sig_np)
    x = x_init * sigmas[0]
    d_hist = jnp.zeros((order,) + x.shape, x.dtype)

    def body(carry, inp):
        x, d_hist = carry
        t_cur, cs = inp
        d = (x - denoise_fn(x, t_cur)) / jnp.maximum(t_cur, 1e-12)
        d_hist = jnp.roll(d_hist, 1, axis=0).at[0].set(d)
        x_new = x + jnp.tensordot(cs, d_hist, axes=1)
        return (x_new, d_hist), x_new

    (x, _), seq = lax.scan(body, (x, d_hist), (sigmas[:-1], coeffs))
    return seq if ret_seq else x
