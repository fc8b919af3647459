"""Sequence-parallel (context-parallel) execution on a 2x4 dp x sp mesh:
outputs must match single-device execution exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from superresolutionhep_tpu.models.flow_model import FlowModel
from superresolutionhep_tpu.parallel.sp import make_dp_sp_mesh, make_sp_forward, make_sp_train_step

from test_flow_model import make_batch, small_flow_config


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest provides 8 virtual CPU devices"
    cfg = small_flow_config("DiT")
    mesh = make_dp_sp_mesh(2, 4)
    batch = make_batch(B=4, N=32, lengths=(32, 20, 9, 27), seed=5)
    batch["target"] = jnp.asarray(
        np.random.default_rng(9).normal(size=(4, 32, 1)).astype(np.float32)
    )
    noisy = jnp.asarray(np.random.default_rng(6).normal(size=(4, 32, 1)).astype(np.float32))
    t = jnp.asarray([0.2, 0.5, 0.7, 0.9])
    return cfg, mesh, batch, noisy, t


def test_sp_forward_matches_single_device(setup):
    cfg, mesh, batch, noisy, t = setup
    model = FlowModel(config=cfg, attn_impl="xla")
    variables = model.init(jax.random.PRNGKey(0), batch, noisy, t)
    ref = model.apply(variables, batch, noisy, t)

    _, sp_forward = make_sp_forward(cfg, mesh)
    out = sp_forward(variables, batch, noisy, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_sp_train_step_grads_match_single_device(setup):
    """dp(2) x sp(4) with SGD(lr=1): params_old - params_new recovers the
    gradients; they must match single-device value_and_grad of the identical
    flow-matching loss (same per-shard t/x0 streams).  Regression test for
    the shard-count gradient inflation bug: psum-ing the loss inside the
    differentiated function scales every gradient by n_shards because psum
    transposes to psum (ops/tp.py)."""
    from superresolutionhep_tpu.flow.cfm import sample_location_and_conditional_flow

    cfg, mesh, batch, noisy, t = setup
    # single-layer config: the grad-of-shard_map compile is expensive on the
    # virtual CPU mesh and one layer exercises the same collectives
    cfg = dict(cfg, transformer=dict(cfg["transformer"], num_transformer_layers=1))
    model = FlowModel(config=cfg, attn_impl="xla")
    variables = model.init(jax.random.PRNGKey(0), batch, noisy, t)
    params = variables["params"]

    tx = optax.sgd(1.0)
    _, step = make_sp_train_step(cfg, tx, mesh, sigma_min=1e-5)
    rng = jax.random.PRNGKey(3)
    params2, _, loss = step(params, tx.init(params), batch, rng)
    grads_sp = jax.tree_util.tree_map(
        lambda a, b: np.asarray(a) - np.asarray(b), params, params2
    )

    # reproduce the step's per-shard rng streams on the host: t per data
    # shard (fold d), x0 per (data, seq) shard (fold d then s)
    target = np.asarray(batch["target"])
    B, N = target.shape[:2]
    n_data, n_seq = mesh.shape["data"], mesh.shape["seq"]
    Bl, Nl = B // n_data, N // n_seq
    xt = np.zeros_like(target)
    ut = np.zeros_like(target)
    t_parts = []
    for d in range(n_data):
        key_t, key_x0 = jax.random.split(jax.random.fold_in(rng, d))
        td = jax.random.uniform(key_t, (Bl,), jnp.float32)
        t_parts.append(td)
        for s in range(n_seq):
            rng_x = jax.random.fold_in(key_x0, s)
            tgt = jnp.asarray(target[d * Bl:(d + 1) * Bl, s * Nl:(s + 1) * Nl])
            _, xt_c, ut_c = sample_location_and_conditional_flow(rng_x, tgt, 1e-5, t=td)
            xt[d * Bl:(d + 1) * Bl, s * Nl:(s + 1) * Nl] = np.asarray(xt_c)
            ut[d * Bl:(d + 1) * Bl, s * Nl:(s + 1) * Nl] = np.asarray(ut_c)
    t_full = jnp.concatenate(t_parts)
    xt_j, ut_j = jnp.asarray(xt), jnp.asarray(ut)

    def ref_loss(p):
        vt = model.apply({"params": p}, batch, xt_j, t_full)
        m = batch["q_mask"][..., None].astype(vt.dtype)
        return ((vt - ut_j) ** 2 * m).sum() / jnp.maximum(m.sum(), 1.0)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    flat_sp = jax.tree_util.tree_flatten_with_path(grads_sp)[0]
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_g)[0]
    for (path, g_sp), (_, g_ref) in zip(flat_sp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(g_sp), np.asarray(g_ref), rtol=2e-4, atol=1e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_ring_attention_matches_single_device(setup):
    cfg, mesh, batch, noisy, t = setup
    model = FlowModel(config=cfg, attn_impl="xla")
    variables = model.init(jax.random.PRNGKey(0), batch, noisy, t)
    ref = model.apply(variables, batch, noisy, t)

    _, sp_forward = make_sp_forward(cfg, mesh, sp_mode="ring")
    out = sp_forward(variables, batch, noisy, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_host_entry_range_partition():
    from superresolutionhep_tpu.parallel.distributed import host_entry_range

    ranges = [host_entry_range(103, pid, 8) for pid in range(8)]
    assert ranges[0][0] == 0 and ranges[-1][1] == 103
    covered = []
    for a, b in ranges:
        covered.extend(range(a, b))
    assert covered == list(range(103))
    sizes = [b - a for a, b in ranges]
    assert max(sizes) - min(sizes) <= 1


def _pf_sp_batch(B=4, N=32, Pmax=4, seed=11, with_incidence=False):
    from superresolutionhep_tpu.data.pf_dataset import collate_pf

    rng = np.random.default_rng(seed)
    events = []
    for i in range(B):
        n = int(rng.integers(8, N + 1))
        npart = int(rng.integers(1, Pmax + 1))
        ev = {
            "cell_e_raw": np.abs(rng.normal(20, 10, n)).astype(np.float32),
            "cell_eta_raw": rng.uniform(-2, 2, n).astype(np.float32),
            "cell_phi": rng.uniform(-3, 3, n).astype(np.float32),
            "cell_layer": rng.integers(0, 3, n).astype(np.int32),
            "n_particles": npart,
            "part_phi": rng.uniform(-3, 3, Pmax).astype(np.float32),
            "part_class": np.zeros(Pmax, np.int32),
        }
        ev["cell_cosphi"] = np.cos(ev["cell_phi"])
        ev["cell_sinphi"] = np.sin(ev["cell_phi"])
        ev["cell_e"] = (ev["cell_e_raw"] ** 0.5 - 7.35) / 15.65
        ev["cell_eta"] = ev["cell_eta_raw"] / 2.988
        for k in ["part_pt", "part_e", "part_eta", "part_dep_e",
                  "part_pt_raw", "part_e_raw", "part_eta_raw", "part_dep_e_raw"]:
            ev[k] = rng.normal(size=Pmax).astype(np.float32)
        if with_incidence:
            inc = np.abs(rng.normal(size=(n, Pmax))).astype(np.float32)
            ev["incidence_matrix"] = inc / inc.sum(axis=1, keepdims=True)
        events.append(ev)
    return {k: jnp.asarray(v) for k, v in collate_pf(events, N, Pmax).items() if k != "idx"}


def test_pf_sp_forward_matches_single_device():
    from superresolutionhep_tpu.models.pf.model_pf import SAPF
    from superresolutionhep_tpu.parallel.sp import make_pf_sp_forward
    from superresolutionhep_tpu.transforms import build_var_transforms
    from test_pf_pipeline import pf_config_mv

    cfg = pf_config_mv()
    batch = _pf_sp_batch()

    transforms = build_var_transforms(cfg["var_transform"])
    model = SAPF(config_pf=cfg["pf_model"], transforms=transforms, attn_impl="xla")
    variables = model.init(jax.random.PRNGKey(0), batch)
    logits_ref, kin_ref, inc_ref = model.apply(variables, batch)

    from superresolutionhep_tpu.parallel.sp import make_dp_sp_mesh

    mesh = make_dp_sp_mesh(2, 4)
    _, fwd = make_pf_sp_forward(cfg["pf_model"], transforms, mesh)
    logits, kin, inc = fwd(variables, batch)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(kin), np.asarray(kin_ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(inc_ref), rtol=2e-5, atol=2e-6)


def test_pf_sp_train_step_loss_matches_single_device():
    """dp(2) x sp(4) PF train step: the sharded loss (psum'd incidence KL +
    cardinality CE over real events) must equal the single-device value."""
    from superresolutionhep_tpu.losses.set2set import set_to_set_incidence_loss
    from superresolutionhep_tpu.models.pf.model_pf import SAPF
    from superresolutionhep_tpu.parallel.sp import make_dp_sp_mesh, make_pf_sp_train_step
    from superresolutionhep_tpu.train.pf_trainer import cross_entropy_int_labels
    from superresolutionhep_tpu.transforms import build_var_transforms
    from test_pf_pipeline import pf_config_mv

    cfg = pf_config_mv()
    batch = _pf_sp_batch(with_incidence=True, seed=13)
    transforms = build_var_transforms(cfg["var_transform"])
    config_t = {"loss_on_inc_wts": True, "card_loss_weight": 0.5}

    # single-device reference loss
    model = SAPF(config_pf=cfg["pf_model"], transforms=transforms, attn_impl="xla")
    variables = model.init(jax.random.PRNGKey(0), batch)
    logits, kin, inc = model.apply(variables, batch)
    ev_mask = batch["cell_mask"].any(-1)
    inc_loss, _, _ = set_to_set_incidence_loss(inc, batch, kin, ev_mask)
    ref_loss = 0.5 * cross_entropy_int_labels(logits, batch["cardinality"], ev_mask) + inc_loss

    mesh = make_dp_sp_mesh(2, 4)
    tx = optax.sgd(1.0)  # SGD(lr=1): params_old - params_new == gradients
    opt_state = tx.init(variables["params"])
    _, step = make_pf_sp_train_step(
        cfg["pf_model"], transforms, tx, mesh, config_t=config_t
    )
    params2, opt_state2, loss = step(variables["params"], opt_state, batch)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-4, atol=1e-5)

    # gradient parity vs single-device autodiff of the identical loss
    # (regression for the n_shards inflation bug — see ops/tp.py)
    def ref_loss_fn(p):
        logits, kin, inc = model.apply({"params": p}, batch)
        inc_loss, _, _ = set_to_set_incidence_loss(inc, batch, kin, ev_mask)
        return 0.5 * cross_entropy_int_labels(logits, batch["cardinality"], ev_mask) + inc_loss

    ref_g = jax.grad(ref_loss_fn)(variables["params"])
    grads_sp = jax.tree_util.tree_map(
        lambda a, b: np.asarray(a) - np.asarray(b), variables["params"], params2
    )
    flat_sp = jax.tree_util.tree_flatten_with_path(grads_sp)[0]
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_g)[0]
    for (path, g_sp), (_, g_ref) in zip(flat_sp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(g_sp), np.asarray(g_ref), rtol=3e-4, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )
