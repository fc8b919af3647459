"""Analytic FLOP accounting (tools/flops.py) vs XLA cost analysis.

XLA's cost analysis is correct for the einsum attention path on CPU (no
Pallas custom call in the way), so it can validate the analytic counter the
bench now uses for MFU (round-2 verdict: cost_analysis under the Pallas path
missed ~5/6 of the work).
"""

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from superresolutionhep_tpu.models.flow_model import FlowModel
from superresolutionhep_tpu.tools.flops import flow_model_flops, sampler_evals


def _setup(B=2, N=128):
    cfg = yaml.safe_load(open("configs/multipart/model_and_var.yml"))
    model = FlowModel(config=cfg["flow_model"], attn_impl="einsum")
    batch = {
        "eta": jnp.zeros((B, N, 1)),
        "cosphi": jnp.ones((B, N, 1)),
        "sinphi": jnp.zeros((B, N, 1)),
        "layer": jnp.zeros((B, N, 1), jnp.int32),
        "e_proxy": jnp.zeros((B, N, 1)),
        "q_mask": jnp.ones((B, N), bool),
    }
    params = model.init(jax.random.PRNGKey(0), batch, jnp.zeros((B, N, 1)), jnp.zeros((B,)))
    return cfg, model, batch, params


def test_analytic_flops_match_xla_einsum_count():
    B, N = 2, 128
    cfg, model, batch, params = _setup(B, N)
    f = flow_model_flops(params, cfg, B, N)

    def fwd(p, b, x, t):
        return model.apply(p, b, x, t)

    ca = (
        jax.jit(fwd)
        .lower(params, batch, jnp.zeros((B, N, 1)), jnp.zeros((B,)))
        .compile()
        .cost_analysis()
    )
    xla = float(ca.get("flops", 0.0))
    assert xla > 0
    # analytic excludes elementwise work (norms/activations/softmax): it must
    # sit just below XLA's count, within a few percent
    assert f["total"] <= xla * 1.001
    assert f["total"] >= 0.93 * xla


def test_masked_discount_and_attention_share():
    B, N = 2, 128
    cfg, _, _, params = _setup(B, N)
    n_valid = [100, 60]
    f = flow_model_flops(params, cfg, B, N, n_valid=n_valid)
    nv = np.array(n_valid, float)
    assert np.isclose(f["attention_masked"] / f["attention"], (nv**2).sum() / (B * N**2))
    assert f["total_masked"] < f["total"]
    # attention must scale quadratically with N
    f2 = flow_model_flops(params, cfg, B, 2 * N)
    assert np.isclose(f2["attention"] / f["attention"], 4.0)
    # and the per-cell linear term linearly
    assert np.isclose((f2["linear"]) / (f["linear"]), 2.0, rtol=0.02)


def test_sampler_eval_counts():
    assert sampler_evals(25, "ab2") == 25
    assert sampler_evals(25, "ab3") == 25
    assert sampler_evals(25, "euler") == 24
    assert sampler_evals(25, "midpoint") == 48
    assert sampler_evals(25, "rk4") == 96
