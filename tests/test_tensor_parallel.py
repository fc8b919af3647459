"""Tensor-parallel (Megatron head/MLP sharding) execution on virtual CPU
meshes: forward outputs and training gradients must match single-device
execution.  The reference framework is single-device torch (SURVEY §5) —
TP is TPU-native surface with no reference counterpart."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from superresolutionhep_tpu.flow.cfm import sample_location_and_conditional_flow
from superresolutionhep_tpu.models.flow_model import FlowModel
from superresolutionhep_tpu.parallel.tp import (
    _tp_role,
    make_dp_sp_tp_mesh,
    make_dp_tp_mesh,
    make_sp_tp_forward,
    make_tp_forward,
    make_tp_train_step,
    tp_param_view,
)

from test_flow_model import make_batch, small_flow_config


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest provides 8 virtual CPU devices"
    cfg = small_flow_config("DiT")
    batch = make_batch(B=4, N=32, lengths=(32, 20, 9, 27), seed=5)
    batch["target"] = jnp.asarray(
        np.random.default_rng(9).normal(size=(4, 32, 1)).astype(np.float32)
    )
    noisy = jnp.asarray(np.random.default_rng(6).normal(size=(4, 32, 1)).astype(np.float32))
    t = jnp.asarray([0.2, 0.5, 0.7, 0.9])
    model = FlowModel(config=cfg, attn_impl="xla")
    variables = model.init(jax.random.PRNGKey(0), batch, noisy, t)
    ref = model.apply(variables, batch, noisy, t)
    return cfg, batch, noisy, t, model, variables, ref


def test_tp_role_classification(setup):
    """Exactly the DiT-layer Q/K/V + MLP fc1 leaves are column-parallel and
    the out-proj + fc2 leaves row-parallel; everything else (embedders,
    norms, adaLN, v_t head) replicated."""
    _, _, _, _, _, variables, _ = setup
    counts = {"col_kernel": 0, "col_bias": 0, "row_kernel": 0, "row_bias": 0, None: 0}
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    for path, _ in flat:
        counts[_tp_role(path)] += 1
    # 2 DiT layers x (linear_q/k/v + dense.linear_0) = 8 column pairs
    assert counts["col_kernel"] == 8 and counts["col_bias"] == 8
    # 2 DiT layers x (linear_out + dense.linear_1) = 4 row pairs
    assert counts["row_kernel"] == 4 and counts["row_bias"] == 4
    assert counts[None] > 0
    # the view divides exactly the row biases
    view = tp_param_view(variables["params"], 4)
    for (path, a), (_, b) in zip(
        flat, jax.tree_util.tree_flatten_with_path(view)[0]
    ):
        if _tp_role(path) == "row_bias":
            np.testing.assert_allclose(np.asarray(b), np.asarray(a) / 4)
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("n_data,n_tp", [(2, 4), (4, 2)])
def test_tp_forward_matches_single_device(setup, n_data, n_tp):
    cfg, batch, noisy, t, _, variables, ref = setup
    mesh = make_dp_tp_mesh(n_data, n_tp)
    _, fwd = make_tp_forward(cfg, mesh, attn_impl="xla")
    out = fwd(variables, batch, noisy, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_sp_tp_forward_matches_single_device(setup):
    """3D dp(2) x sp(2) x tp(2): sequence gather over head-local K/V plus
    tensor psums must still reproduce the single-device output."""
    cfg, batch, noisy, t, _, variables, ref = setup
    mesh = make_dp_sp_tp_mesh(2, 2, 2)
    _, fwd = make_sp_tp_forward(cfg, mesh)
    out = fwd(variables, batch, noisy, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_tp_train_step_grads_match_single_device(setup):
    """dp(1) x tp(4) with SGD(lr=1): params_old - params_new recovers the
    gradients exactly; they must match a single-device value_and_grad of the
    identical flow-matching loss (same t/x0 draws).  This pins down the
    whole manual-grad story: the 'f' boundary (complete replicated-leaf
    cotangents), per-shard ownership of sharded slices, and the
    divided-row-bias identity."""
    cfg, batch, noisy, t, model, variables, _ = setup
    cfg1 = dict(cfg, transformer=dict(cfg["transformer"], num_transformer_layers=1))
    model1 = FlowModel(config=cfg1, attn_impl="xla")
    variables1 = model1.init(jax.random.PRNGKey(0), batch, noisy, t)
    params = variables1["params"]

    mesh = make_dp_tp_mesh(1, 4)
    tx = optax.sgd(1.0)
    _, step = make_tp_train_step(cfg1, tx, mesh, sigma_min=1e-5)
    rng = jax.random.PRNGKey(3)
    params2, _, loss = step(params, tx.init(params), batch, rng)
    grads_tp = jax.tree_util.tree_map(lambda a, b: np.asarray(a) - np.asarray(b), params, params2)

    # single-device reference with the step's exact rng stream (d_idx == 0)
    key_t, key_x0 = jax.random.split(jax.random.fold_in(rng, 0))
    target = batch["target"]
    t_draw = jax.random.uniform(key_t, (target.shape[0],), target.dtype)
    _, xt, ut = sample_location_and_conditional_flow(key_x0, target, 1e-5, t=t_draw)

    def ref_loss(p):
        vt = model1.apply({"params": p}, batch, xt, t_draw)
        m = batch["q_mask"][..., None].astype(vt.dtype)
        return ((vt - ut) ** 2 * m).sum() / jnp.maximum(m.sum(), 1.0)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    flat_tp = jax.tree_util.tree_flatten_with_path(grads_tp)[0]
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_g)[0]
    assert len(flat_tp) == len(flat_ref)
    for (path, g_tp), (_, g_ref) in zip(flat_tp, flat_ref):
        name = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(g_tp), np.asarray(g_ref), rtol=2e-4, atol=1e-6,
            err_msg=f"grad mismatch at {name} (role={_tp_role(path)})",
        )


def test_pf_tp_forward_matches_single_device():
    """Stage-2 SAPF with heads/MLP sharded over 'model' in BOTH DiT stacks
    (cell self-attention encoder + kinematics cross-attention)."""
    from superresolutionhep_tpu.models.pf.model_pf import SAPF
    from superresolutionhep_tpu.parallel.tp import make_pf_tp_forward
    from superresolutionhep_tpu.transforms import build_var_transforms
    from test_pf_pipeline import pf_config_mv
    from test_sequence_parallel import _pf_sp_batch

    cfg = pf_config_mv()
    batch = _pf_sp_batch()
    transforms = build_var_transforms(cfg["var_transform"])
    model = SAPF(config_pf=cfg["pf_model"], transforms=transforms, attn_impl="xla")
    variables = model.init(jax.random.PRNGKey(0), batch)
    logits_ref, kin_ref, inc_ref = model.apply(variables, batch)

    mesh = make_dp_tp_mesh(2, 4)
    _, fwd = make_pf_tp_forward(cfg["pf_model"], transforms, mesh)
    logits, kin, inc = fwd(variables, batch)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(kin), np.asarray(kin_ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(inc_ref), rtol=2e-5, atol=2e-6)


def test_pf_tp_train_step_loss_matches_single_device():
    """dp(2) x tp(4) PF train step reproduces the single-device set-to-set
    loss (no model-axis collectives needed in the loss: activations are
    replicated after the row-parallel psums)."""
    from superresolutionhep_tpu.losses.set2set import set_to_set_incidence_loss
    from superresolutionhep_tpu.models.pf.model_pf import SAPF
    from superresolutionhep_tpu.parallel.tp import make_pf_tp_train_step
    from superresolutionhep_tpu.train.pf_trainer import cross_entropy_int_labels
    from superresolutionhep_tpu.transforms import build_var_transforms
    from test_pf_pipeline import pf_config_mv
    from test_sequence_parallel import _pf_sp_batch

    cfg = pf_config_mv()
    batch = _pf_sp_batch(with_incidence=True, seed=13)
    transforms = build_var_transforms(cfg["var_transform"])
    config_t = {"loss_on_inc_wts": True, "card_loss_weight": 0.5}

    model = SAPF(config_pf=cfg["pf_model"], transforms=transforms, attn_impl="xla")
    variables = model.init(jax.random.PRNGKey(0), batch)
    logits, kin, inc = model.apply(variables, batch)
    ev_mask = batch["cell_mask"].any(-1)
    inc_loss, _, _ = set_to_set_incidence_loss(inc, batch, kin, ev_mask)
    ref_loss = 0.5 * cross_entropy_int_labels(logits, batch["cardinality"], ev_mask) + inc_loss

    mesh = make_dp_tp_mesh(2, 4)
    tx = optax.adam(1e-3)
    _, step = make_pf_tp_train_step(
        cfg["pf_model"], transforms, tx, mesh, config_t=config_t
    )
    params2, _, loss = step(variables["params"], tx.init(variables["params"]), batch)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-4, atol=1e-5)
    leaves0 = jax.tree_util.tree_leaves(variables["params"])
    leaves1 = jax.tree_util.tree_leaves(params2)
    assert any(not np.allclose(a, b) for a, b in zip(leaves0, leaves1))


def test_tp_train_step_runs_dp_tp(setup):
    """dp(2) x tp(4): two steps run, losses finite, params move."""
    cfg, batch, noisy, t, _, _, _ = setup
    cfg1 = dict(cfg, transformer=dict(cfg["transformer"], num_transformer_layers=1))
    model1 = FlowModel(config=cfg1, attn_impl="xla")
    variables1 = model1.init(jax.random.PRNGKey(0), batch, noisy, t)
    params = variables1["params"]

    mesh = make_dp_tp_mesh(2, 4)
    tx = optax.adam(1e-3)
    _, step = make_tp_train_step(cfg1, tx, mesh, sigma_min=1e-5)
    opt_state = tx.init(params)
    losses = []
    for i in range(2):
        params, opt_state, loss = step(
            params, opt_state, batch, jax.random.fold_in(jax.random.PRNGKey(7), i)
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    leaves0 = jax.tree_util.tree_leaves(variables1["params"])
    leaves1 = jax.tree_util.tree_leaves(params)
    assert any(not np.allclose(a, b) for a, b in zip(leaves0, leaves1))
