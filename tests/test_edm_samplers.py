import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolutionhep_tpu.flow.edm import (
    dpm2_sampler,
    edm_sampler,
    karras_sigmas,
    lms_sampler,
)


def test_karras_schedule_monotone():
    s = karras_sigmas(18, 0.002, 80.0, 7.0)
    assert s[0] == pytest.approx(80.0)
    assert s[-1] == 0.0
    assert np.all(np.diff(s) < 0)


@pytest.mark.parametrize("sampler", [edm_sampler, dpm2_sampler, lms_sampler])
def test_samplers_converge_to_perfect_denoiser_target(sampler):
    """With a perfect denoiser D(x, sigma) = x0, the probability-flow ODE
    dx/dt = (x - D)/t drives every sampler to x0."""
    target = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32))

    def denoise(x, sigma):
        return target

    x = sampler(denoise, jnp.ones_like(target), jax.random.PRNGKey(1), num_steps=24)
    np.testing.assert_allclose(np.asarray(x), np.asarray(target), atol=5e-2)


def test_edm_sampler_ret_seq_and_churn():
    target = jnp.zeros((2, 4))

    def denoise(x, sigma):
        return target

    seq = edm_sampler(
        denoise, jnp.ones_like(target), jax.random.PRNGKey(0),
        num_steps=10, S_churn=10.0, S_min=0.01, S_max=50.0, ret_seq=True,
    )
    assert seq.shape == (10, 2, 4)
    np.testing.assert_allclose(np.asarray(seq[-1]), 0.0, atol=5e-2)


def test_samplers_jittable():
    target = jnp.zeros((2, 4))

    def denoise(x, sigma):
        return target

    out = jax.jit(
        lambda k: edm_sampler(denoise, jnp.ones_like(target), k, num_steps=8)
    )(jax.random.PRNGKey(2))
    assert np.all(np.isfinite(np.asarray(out)))
