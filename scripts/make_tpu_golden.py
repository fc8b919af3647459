"""Freeze / check a TPU-numerics golden on the production sampler path.

VERDICT r4 weak #5: the committed goldens (tests/golden/sr_trained_golden.npz,
pf goldens) pin CPU float32 einsum numerics only; the path that actually
ships — Pallas flash_nomax kernel + fused DiT prologue, bf16 compute — was
guarded only by self-consistent runtime checks, so a kernel regression that
shifts TPU outputs while staying self-consistent would pass every test.

``make`` (default) runs the production-path sampler on the shipped
``saved_checkpoints/closure_sr`` weights over a deterministic synthetic
batch ON THE REAL TPU and freezes the outputs into
``tests/golden/sr_tpu_golden.npz``.  ``--check`` re-runs the same program
and compares against the fixture within a physics tolerance calibrated to
measured bf16 accumulation-order noise (the nomax selfcheck's 3e-2
raw-space scale); bench.py runs the check automatically when the fixture
exists (BENCH_TPU_GOLDEN=0 disables).

Inputs mirror scripts/make_sr_trained_golden.py (same generator regime and
seeds) but padded to a flash-eligible length (multiple of 128, >=256) so
the Pallas kernel — not the intended-dense small-L fallback — is on the
measured path.
"""

import argparse
import hashlib
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from superresolutionhep_tpu.utils import hostmem  # noqa: E402

hostmem.ensure_tuned()

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(ROOT, "saved_checkpoints", "closure_sr")
OUT = os.path.join(ROOT, "tests", "golden", "sr_tpu_golden.npz")

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
N_EVENTS = 4
SEED = 321
KEY_SEED = 11
N_STEPS = 25
METHOD = "ab2e"  # bench.py production METHOD
TOL = 3e-2  # max |diff| in NN sample space; calibrated like the nomax selfcheck


def _run_production(jax, jnp, np, yaml):
    from superresolutionhep_tpu.data.sr_dataset import SupResEvents, collate
    from superresolutionhep_tpu.data.synthetic import GeneratorConfig, write_synthetic_file
    from superresolutionhep_tpu.flow.sampling import generate_samples
    from superresolutionhep_tpu.models.flow_model import FlowModel
    from superresolutionhep_tpu.models.precision import cast_params_for_inference
    from superresolutionhep_tpu.train.checkpoint import load_params

    config_mv = yaml.safe_load(open(os.path.join(CKPT, "model_and_var.yml")))
    params = load_params(os.path.join(CKPT, "params.msgpack"))
    params = params["params"] if "params" in params else params
    model = FlowModel(
        config=config_mv["flow_model"], dtype=jnp.bfloat16,
        attn_impl="flash_nomax", fused_prologue=True,
    )
    variables = cast_params_for_inference({"params": params})
    apply_fn = lambda v, b, x, t: model.apply(v, b, x, t)  # noqa: E731

    with tempfile.TemporaryDirectory() as td:
        truth = write_synthetic_file(
            os.path.join(td, "ev.h5"), N_EVENTS, seed=SEED, config=GeneratorConfig(**GEN)
        )
        ds = SupResEvents(truth, config_mv)
        events = [ds.get_event(i) for i in range(N_EVENTS)]
    pad = max(256, int(np.ceil(max(len(e.high["e_proxy"]) for e in events) / 128) * 128))
    hb = collate(events, pad)
    batch = {k: jnp.asarray(v) for k, v in hb.items() if isinstance(v, np.ndarray) and k != "idx"}

    key = jax.random.PRNGKey(KEY_SEED)
    s = generate_samples(apply_fn, variables, batch, key, n_steps=N_STEPS, method=METHOD)
    return np.asarray(s, np.float32), {k: np.asarray(v) for k, v in batch.items()}


def params_sha():
    return hashlib.sha256(open(os.path.join(CKPT, "params.msgpack"), "rb").read()).digest()


def check(verbose=True) -> dict:
    """Re-run the frozen program and compare. Returns a result dict with
    ``ok``; raises nothing (callers decide severity)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml

    if not os.path.exists(OUT):
        return {"ok": None, "reason": "fixture missing"}
    fix = np.load(OUT)
    if bytes(fix["params_sha256"].tobytes()) != params_sha():
        return {"ok": False, "reason": "checkpoint SHA changed"}
    if jax.devices()[0].platform == "cpu":
        return {"ok": None, "reason": "not on TPU"}
    got, batch = _run_production(jax, jnp, np, yaml)
    exp = fix["expected"]
    mask = fix["batch::q_mask"].astype(bool)
    # final samples, (B, N, 1); compare valid cells only
    d = np.abs(got[..., 0] - exp[..., 0])[mask]
    res = {
        "ok": bool(d.max() <= TOL),
        "max_diff": float(d.max()),
        "p99_diff": float(np.percentile(d, 99)),
        "tol": TOL,
    }
    if verbose:
        print(f"[tpu-golden] {res}")
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    import jax
    import numpy as np
    import yaml

    jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.check:
        res = check()
        raise SystemExit(0 if res["ok"] else 1)

    import jax.numpy as jnp

    assert jax.devices()[0].platform != "cpu", (
        "the TPU golden must be frozen on the real chip (CPU numerics are "
        "pinned by tests/golden/sr_trained_golden.npz already)"
    )
    s, batch = _run_production(jax, jnp, np, yaml)
    out = {"expected": s}
    for k, v in batch.items():
        out[f"batch::{k}"] = v
    out["params_sha256"] = np.frombuffer(params_sha(), dtype=np.uint8)
    out["key_seed"] = np.int64(KEY_SEED)
    out["n_steps"] = np.int64(N_STEPS)
    out["method"] = np.bytes_(METHOD.encode())
    m = batch["q_mask"].astype(bool)
    print(f"masked |x| p50 {np.percentile(np.abs(s[..., 0][m]), 50):.4f}")
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({os.path.getsize(OUT) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
