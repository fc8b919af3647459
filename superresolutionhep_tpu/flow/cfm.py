"""Target-OT conditional flow matching.

The reference delegates to ``torchcfm.TargetConditionalFlowMatcher``
(models/flow_model.py:12,32,275).  The math is a few lines and is implemented
natively here:

  x_t = (1 - (1 - sigma) t) * x0 + t * x1
  u_t = x1 - (1 - sigma) * x0

with x0 ~ N(0, I) the noise, x1 the data, t ~ U(0,1) per event.
t=0 is noise, t=1 is data (lightning convention, models/flow_model.py:267-270).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_location_and_conditional_flow(key: jax.Array, x1, sigma_min: float, t=None):
    """Returns (t, x_t, u_t). x1: (B, ...) data; t: (B,) or None to sample."""
    k_noise, k_t = jax.random.split(key)
    x0 = jax.random.normal(k_noise, x1.shape, x1.dtype)
    if t is None:
        t = jax.random.uniform(k_t, (x1.shape[0],), x1.dtype)
    t_b = t.reshape((-1,) + (1,) * (x1.ndim - 1))
    xt = (1.0 - (1.0 - sigma_min) * t_b) * x0 + t_b * x1
    ut = x1 - (1.0 - sigma_min) * x0
    return t, xt, ut


def flow_matching_loss(v_pred, u_target, valid_mask):
    """Masked MSE over valid cells: mean of (v-u)^2 restricted to q_mask
    (models/flow_model.py:278-297). Also returns the per-element stats the
    reference logs every step (ut/vt/loss min/max/mean/std) computed over
    valid entries only where masking matters."""
    se = (v_pred - u_target) ** 2
    m = valid_mask
    while m.ndim < se.ndim:
        m = m[..., None]
    m = m.astype(se.dtype)
    n_valid = jnp.maximum(m.sum(), 1.0)
    loss = (se * m).sum() / n_valid

    def _stats(x, prefix):
        return {
            f"{prefix}_max": x.max(),
            f"{prefix}_min": x.min(),
            f"{prefix}_mean": x.mean(),
            f"{prefix}_std": x.std(),
        }

    masked_se = jnp.where(m > 0, se, jnp.nan)
    stats = {}
    stats.update(_stats(u_target, "ut"))
    stats.update(_stats(v_pred, "vt"))
    stats.update(
        {
            "loss_max": jnp.nanmax(masked_se),
            "loss_min": jnp.nanmin(masked_se),
            "loss_mean": loss,
            "loss_std": jnp.sqrt(
                jnp.maximum(((se - loss) ** 2 * m).sum() / jnp.maximum(n_valid - 1.0, 1.0), 0.0)
            ),
        }
    )
    return loss, stats
