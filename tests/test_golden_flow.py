"""Golden parity test for the SR FlowModel against the reference torch
implementation (random xavier weights, zero-policies disabled so the output
is non-degenerate; fixture generated from the reference model at
saved_checkpoints/single_e/config_mv.yml with reduced depth/width)."""

import os

import jax.numpy as jnp
import numpy as np
import yaml

from superresolutionhep_tpu.models.flow_model import FlowModel

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "flow_golden.npz")


def unflatten(flat):
    tree = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def test_flow_model_matches_reference_torch():
    z = np.load(GOLDEN)
    cfg = yaml.safe_load(bytes(z["config"]).decode())
    batch = {k.split("::", 1)[1]: jnp.asarray(z[k]) for k in z.files if k.startswith("batch::")}
    params = unflatten({k.split("::", 1)[1]: z[k] for k in z.files if k.startswith("param::")})

    model = FlowModel(config=cfg, attn_impl="xla")
    vt = model.apply({"params": params}, batch, jnp.asarray(z["noisy"]), jnp.asarray(z["t"]))

    mask = np.asarray(batch["q_mask"])
    np.testing.assert_allclose(
        np.asarray(vt)[mask], z["vt"][mask], rtol=2e-4, atol=2e-4
    )
