"""Freeze a trained-SR golden fixture (VERDICT r3 item 7).

Pins sampler+model+transform end-to-end numerics on the shipped
``saved_checkpoints/closure_sr`` training the way ``tests/golden/pf_*_golden.npz``
pins PF: a frozen input batch + the expected final samples for the production
fixed-step sampler (ab2) AND the adaptive reference solver (dopri5) at
n_steps=25.  The weights themselves stay in ``saved_checkpoints/closure_sr``
(committed in-repo); the fixture records their SHA-256 so the test detects a
silently swapped checkpoint.  Substitute for the reference's stripped SR
checkpoints (``/root/reference/.MISSING_LARGE_BLOBS``).

Run on the CPU backend (numerics of record for goldens):

    python scripts/make_sr_trained_golden.py
"""

import hashlib
import os
import sys
import tempfile

# mirror tests/conftest.py EXACTLY: the 8-device virtual CPU platform changes
# XLA-CPU partitioning (and so reduction order); dopri5's adaptive stepping
# amplifies those last-ulp differences into visible trajectory drift, so the
# fixture must be frozen under the same environment the test runs in.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import yaml  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from superresolutionhep_tpu.data.sr_dataset import SupResEvents, collate  # noqa: E402
from superresolutionhep_tpu.data.synthetic import GeneratorConfig, write_synthetic_file  # noqa: E402
from superresolutionhep_tpu.flow.sampling import generate_samples  # noqa: E402
from superresolutionhep_tpu.models.flow_model import FlowModel  # noqa: E402
from superresolutionhep_tpu.train.checkpoint import load_params  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(ROOT, "saved_checkpoints", "closure_sr")
OUT = os.path.join(ROOT, "tests", "golden", "sr_trained_golden.npz")

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
N_EVENTS = 2
SEED = 321
KEY_SEED = 11
N_STEPS = 25


def main():
    config_mv = yaml.safe_load(open(os.path.join(CKPT, "model_and_var.yml")))
    params = load_params(os.path.join(CKPT, "params.msgpack"))
    params = params["params"] if "params" in params else params
    model = FlowModel(config=config_mv["flow_model"], attn_impl="einsum")
    apply_fn = lambda v, b, x, t: model.apply(v, b, x, t)  # noqa: E731
    variables = {"params": params}

    with tempfile.TemporaryDirectory() as td:
        truth = write_synthetic_file(
            os.path.join(td, "ev.h5"), N_EVENTS, seed=SEED, config=GeneratorConfig(**GEN)
        )
        ds = SupResEvents(truth, config_mv)
        events = [ds.get_event(i) for i in range(N_EVENTS)]
    pad = int(np.ceil(max(len(e.high["e_proxy"]) for e in events) / 64) * 64)
    hb = collate(events, pad)
    batch = {k: jnp.asarray(v) for k, v in hb.items() if isinstance(v, np.ndarray) and k != "idx"}

    key = jax.random.PRNGKey(KEY_SEED)
    out = {}
    for method in ("ab2", "dopri5"):
        s = generate_samples(apply_fn, variables, batch, key, n_steps=N_STEPS, method=method)
        out[f"expected::{method}"] = np.asarray(s)
        m = np.asarray(batch["q_mask"])
        print(f"{method}: shape {s.shape}, masked |x| p50 "
              f"{np.percentile(np.abs(np.asarray(s)[..., 0][m]), 50):.4f}")

    for k, v in batch.items():
        out[f"batch::{k}"] = np.asarray(v)
    out["params_sha256"] = np.frombuffer(
        hashlib.sha256(open(os.path.join(CKPT, "params.msgpack"), "rb").read()).digest(),
        dtype=np.uint8,
    )
    out["key_seed"] = np.int64(KEY_SEED)
    out["n_steps"] = np.int64(N_STEPS)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({os.path.getsize(OUT) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
