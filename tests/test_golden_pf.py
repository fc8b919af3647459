"""Golden parity tests against the reference's shipped trained PF checkpoints.

Fixtures (tests/golden/*.npz) were generated once by running the reference
torch SAPF (saved_checkpoints/pf_lr, pf_hr — the intact Lightning ckpts) on a
fixed synthetic batch and converting the weights with
tools/torch_convert.convert_pf_state_dict.  The tests rebuild this
framework's SAPF from the stored config, load the converted weights, and
require numerical agreement with the stored torch outputs — proving layer-by-
layer parity of the DiT encoder, cardinality head, cross-attention kinematics
predictor and attention-kinematic net with trained (non-symmetric) weights.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from superresolutionhep_tpu.models.pf.model_pf import SAPF
from superresolutionhep_tpu.transforms import build_var_transforms

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


@pytest.mark.parametrize("tag", ["pf_lr", "pf_hr"])
def test_shipped_pf_checkpoint_parity(tag):
    path = os.path.join(GOLDEN_DIR, f"{tag}_golden.npz")
    z = np.load(path)
    cfg_mv = yaml.safe_load(bytes(z["config_mv"]).decode())

    batch = {
        k.split("::", 1)[1]: jnp.asarray(z[k]) for k in z.files if k.startswith("batch::")
    }
    params = unflatten(
        {k.split("::", 1)[1]: z[k] for k in z.files if k.startswith("param::")}
    )

    model = SAPF(
        config_pf=cfg_mv["pf_model"],
        transforms=build_var_transforms(cfg_mv["var_transform"]),
        inference=False,
        attn_impl="xla",
    )
    logits, kin, inc = model.apply({"params": params}, batch)

    np.testing.assert_allclose(np.asarray(logits), z["logits"], rtol=2e-4, atol=2e-4)
    # compare only valid particle slots/cells (padded slots may differ in
    # framework-specific masked fills)
    part_mask = np.asarray(batch["part_mask"])
    cell_mask = np.asarray(batch["cell_mask"])
    np.testing.assert_allclose(
        np.asarray(kin)[part_mask], z["kin"][part_mask], rtol=2e-3, atol=2e-3
    )
    inc_ours = np.asarray(inc)
    inc_ref = z["inc"]
    for b in range(inc_ours.shape[0]):
        np.testing.assert_allclose(
            inc_ours[b][part_mask[b]][:, cell_mask[b]],
            inc_ref[b][part_mask[b]][:, cell_mask[b]],
            rtol=2e-3,
            atol=2e-3,
        )
