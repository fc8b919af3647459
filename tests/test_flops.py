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
    assert sampler_evals(25, "ab2e") == 24
    assert sampler_evals(25, "ab3") == 25
    assert sampler_evals(25, "euler") == 24
    assert sampler_evals(25, "midpoint") == 48
    assert sampler_evals(25, "rk4") == 96


def test_packed_counter_consistent_with_bucketed():
    """Packed-layout counter vs the bucketed counter on an equivalent batch:
    B rows of E full 128-cell segments == B*E events of 128 cells.  With
    block sizes 128 the band covers exactly the diagonal, so banded
    attention must equal the bucketed mask-true count; the packed linear
    count differs only by the one-hot gather/scatter matmuls (per-segment
    adaLN modulation, models/flow_model.py packed path) — a small,
    strictly positive overhead."""
    from superresolutionhep_tpu.tools.flops import flow_model_flops_packed

    B, E = 2, 4
    S = E * 128
    cfg, _, _, params = _setup(2, 128)
    seg = np.repeat(np.arange(E, dtype=np.int32)[None, :], 128, axis=0).T.reshape(1, S)
    seg = np.repeat(seg, B, axis=0)

    fp = flow_model_flops_packed(params, cfg, seg, block_q=128, block_k=128)
    fb = flow_model_flops(params, cfg, B * E, 128, n_valid=[128] * (B * E))

    # attention: diagonal band == mask-true bucketed count, padded == masked
    assert np.isclose(fp["attention"], fb["attention_masked"])
    assert np.isclose(fp["attention_masked"], fb["attention_masked"])

    # linear: bucketed + scatter overhead; time embedder runs per ROW on the
    # packed path (B rows) vs per event (B*E) on the bucketed one, so the
    # packed count is lower on that term — bound both sides
    assert fp["linear_masked"] > 0.95 * fb["linear_masked"]
    assert fp["linear_masked"] < 1.25 * fb["linear_masked"]
    assert fp["total_masked"] == fp["linear_masked"] + fp["attention_masked"]


def test_train_step_flops_vs_xla_grad():
    """The no-recompute ("useful", 3x fwd) train-step count must match XLA's
    cost analysis of value_and_grad on the einsum path (whose attention
    backward is exactly the 4 needed matmuls); the executed counts add the
    Pallas backward's S recomputes and the per-layer remat re-runs on top."""
    B, N = 2, 128
    cfg, model, batch, params = _setup(B, N)
    from superresolutionhep_tpu.tools.flops import train_step_flops

    def loss(p, b, x, t):
        return jnp.sum(model.apply(p, b, x, t) ** 2)

    ca = (
        jax.jit(jax.value_and_grad(loss))
        .lower(params, batch, jnp.zeros((B, N, 1)), jnp.zeros((B,)))
        .compile()
        .cost_analysis()
    )
    xla = float(ca.get("flops", 0.0))
    assert xla > 0
    tf = train_step_flops(params, cfg, B, N, remat=False)
    assert 0.93 * xla <= tf["total_useful"] <= 1.001 * xla
    # executed counts are strictly ordered: useful < no-remat < remat
    tfr = train_step_flops(params, cfg, B, N, remat=True)
    assert tf["total_useful"] < tf["total"] < tfr["total"]
    # masked variant discounts padding
    tm = train_step_flops(params, cfg, B, N, n_valid=[100, 60], remat=True)
    assert tm["total_masked"] < tm["total"]
