"""Frozen trained-SR golden (VERDICT r3 item 7).

Unlike test_sampler_parity_trained.py (which compares live samplers against
each other and would miss a numerics drift that shifts all of them equally),
this pins the shipped ``closure_sr`` checkpoint's end-to-end sampler outputs
— ab2 (production fixed-step) AND dopri5 (adaptive reference) at n_steps=25 —
against expectations frozen in ``tests/golden/sr_trained_golden.npz``.  Any
future kernel/layout/transform refactor that changes SR numerics beyond
bf16-reassociation noise fails here.  Reference-free at test time like
``pf_{lr,hr}_golden.npz``; substitute for the reference's stripped SR
checkpoints (``/root/reference/.MISSING_LARGE_BLOBS``).

Regenerate (only after an *intentional* numerics change, with justification
in the commit message): ``python scripts/make_sr_trained_golden.py``.
"""

import hashlib
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from superresolutionhep_tpu.flow.sampling import generate_samples
from superresolutionhep_tpu.models.flow_model import FlowModel
from superresolutionhep_tpu.train.checkpoint import load_params

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden", "sr_trained_golden.npz")
CKPT = os.path.join(os.path.dirname(HERE), "saved_checkpoints", "closure_sr")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(GOLDEN) and os.path.exists(os.path.join(CKPT, "params.msgpack"))),
    reason="trained-SR golden fixture or shipped closure_sr checkpoint not present",
)


@pytest.fixture(scope="module")
def golden():
    z = np.load(GOLDEN)
    ckpt_bytes = open(os.path.join(CKPT, "params.msgpack"), "rb").read()
    assert hashlib.sha256(ckpt_bytes).digest() == bytes(z["params_sha256"]), (
        "saved_checkpoints/closure_sr/params.msgpack does not match the weights the "
        "golden was frozen against — regenerate the fixture or restore the checkpoint"
    )
    params = load_params(os.path.join(CKPT, "params.msgpack"))
    params = params["params"] if "params" in params else params
    config_mv = yaml.safe_load(open(os.path.join(CKPT, "model_and_var.yml")))
    model = FlowModel(config=config_mv["flow_model"], attn_impl="einsum")
    apply_fn = lambda v, b, x, t: model.apply(v, b, x, t)  # noqa: E731
    batch = {k.split("::", 1)[1]: jnp.asarray(z[k]) for k in z.files if k.startswith("batch::")}
    return z, apply_fn, {"params": params}, batch


@pytest.mark.parametrize("method", ["ab2", "dopri5"])
def test_trained_sampler_outputs_are_pinned(golden, method):
    z, apply_fn, variables, batch = golden
    key = jax.random.PRNGKey(int(z["key_seed"]))
    out = generate_samples(
        apply_fn, variables, batch, key, n_steps=int(z["n_steps"]), method=method
    )
    m = np.asarray(batch["q_mask"])
    got = np.asarray(out)[..., 0][m]
    want = z[f"expected::{method}"][..., 0][m]
    # float32 CPU numerics of record; tolerance covers einsum-order /
    # fusion-reassociation noise, not model drift (trained logits span ~±6).
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    # physics space: per-cell HR/proxy energy share must pin tighter still
    np.testing.assert_allclose(
        1.0 / (1.0 + np.exp(-got)), 1.0 / (1.0 + np.exp(-want)), atol=5e-4
    )
