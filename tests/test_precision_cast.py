"""Pre-cast bf16 inference params must be bitwise-equivalent to flax's
apply-time promotion (models/precision.py) — the optimization only moves the
fp32->bf16 convert out of the sampler loop, it must not change any value."""

import jax
import jax.numpy as jnp
import numpy as np

from superresolutionhep_tpu.models.flow_model import FlowModel
from superresolutionhep_tpu.models.precision import cast_params_for_inference

from test_flow_model import make_batch, small_flow_config


def test_precast_params_bitwise_equal():
    cfg = small_flow_config()
    model = FlowModel(config=cfg, dtype=jnp.bfloat16, attn_impl="xla")
    batch = make_batch()
    t = jnp.linspace(0.2, 0.8, batch["eta"].shape[0])
    x = jnp.asarray(np.random.default_rng(3).normal(size=batch["e_proxy"].shape), jnp.float32)

    variables = model.init(jax.random.PRNGKey(0), batch, x, t)
    out_fp32_params = model.apply(variables, batch, x, t)

    cast = cast_params_for_inference(variables)
    out_precast = model.apply(cast, batch, x, t)

    assert out_precast.dtype == out_fp32_params.dtype
    np.testing.assert_array_equal(np.asarray(out_fp32_params), np.asarray(out_precast))


def test_precast_keeps_geometry_fp32():
    cfg = small_flow_config()
    model = FlowModel(config=cfg, dtype=jnp.bfloat16, attn_impl="xla")
    batch = make_batch()
    t = jnp.linspace(0.2, 0.8, batch["eta"].shape[0])
    x = jnp.zeros_like(batch["e_proxy"])
    variables = model.init(jax.random.PRNGKey(0), batch, x, t)
    cast = cast_params_for_inference(variables)

    leaves = jax.tree_util.tree_leaves_with_path(cast)
    n_fp32 = n_bf16 = 0
    for path, leaf in leaves:
        names = [getattr(p, "key", "") for p in path]
        if "etaphi_emb_net" in names:
            assert leaf.dtype == jnp.float32, names
            n_fp32 += 1
        elif jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.bfloat16, names
            n_bf16 += 1
    assert n_fp32 > 0 and n_bf16 > 0
