import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from superresolutionhep_tpu.losses.set2set import (
    hungarian,
    incidence_pairwise_cost,
    pad_cost_masks,
    set_to_set_incidence_loss,
    set_to_set_kinematics_loss,
)


def test_hungarian_matches_scipy():
    rng = np.random.default_rng(0)
    cost = rng.normal(size=(16, 4, 4)).astype(np.float32)
    ours = np.asarray(hungarian(jnp.asarray(cost)))
    for b in range(16):
        _, cols = linear_sum_assignment(cost[b])
        total_ours = cost[b, np.arange(4), ours[b]].sum()
        total_ref = cost[b, np.arange(4), cols].sum()
        np.testing.assert_allclose(total_ours, total_ref, rtol=1e-6)


def test_pad_cost_masks_structure():
    # 3 real + 2 padded particles (set_to_set_loss.py docstring example)
    mask = jnp.asarray([[True, True, True, False, False]])
    not_q4, q2_q3_inf = pad_cost_masks(mask)
    nq = np.asarray(not_q4)[0]
    qi = np.asarray(q2_q3_inf)[0]
    assert np.all(nq[:3, :3] == 1) and np.all(qi[:3, :3] == 0)  # RR: keep
    assert np.all(qi[3:, :3] == 1e6) and np.all(qi[:3, 3:] == 1e6)  # RF: inf
    assert np.all(nq[3:, 3:] == 0) and np.all(qi[3:, 3:] == 0)  # FF: zero


def _pf_batch(B=3, P=4, N=32, seed=0, full=False):
    rng = np.random.default_rng(seed)
    n_parts = np.full(B, P) if full else rng.integers(1, P + 1, B)
    part_mask = np.arange(P)[None, :] < n_parts[:, None]
    inc = rng.uniform(0, 1, (B, N, P)).astype(np.float32)
    inc = inc / inc.sum(-1, keepdims=True)
    batch = {
        "part_pt": rng.normal(size=(B, P)).astype(np.float32) * part_mask,
        "part_eta": rng.normal(size=(B, P)).astype(np.float32) * part_mask,
        "part_phi": rng.uniform(-np.pi, np.pi, (B, P)).astype(np.float32) * part_mask,
        "part_dep_e": rng.normal(size=(B, P)).astype(np.float32) * part_mask,
        "part_mask": part_mask,
        "cell_mask": np.ones((B, N), bool),
        "incidence_matrix": inc,
    }
    return {k: jnp.asarray(v) for k, v in batch.items()}, n_parts


def test_kinematics_loss_permutation_invariant():
    """Permuting predictions must not change the matched loss (full-
    cardinality events: with padded slots the pad-mask convention ties pred
    slot validity to the truth slot index, as in the reference)."""
    batch, n_parts = _pf_batch(full=True)
    rng = np.random.default_rng(1)
    kin = jnp.asarray(rng.normal(size=(3, 4, 4)).astype(np.float32))
    cfg = {"pt_loss_wt": 1.0, "eta_loss_wt": 1.0, "phi_loss_wt": 1.0, "e_loss_wt": 1.0}
    loss1, _, _ = set_to_set_kinematics_loss(kin, batch, cfg)
    perm = np.array([2, 0, 3, 1])
    loss2, _, _ = set_to_set_kinematics_loss(kin[:, perm, :], batch, cfg)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)


def test_kinematics_loss_zero_for_exact_match():
    batch, n_parts = _pf_batch(seed=3, full=True)
    P = 4
    kin = jnp.stack(
        [batch["part_pt"], batch["part_eta"], batch["part_phi"], batch["part_dep_e"]], axis=-1
    )
    # shuffle predictions — Hungarian must recover the alignment
    perm = np.array([3, 1, 0, 2])
    cfg = {"pt_loss_wt": 1.0, "eta_loss_wt": 1.0, "phi_loss_wt": 1.0, "e_loss_wt": 1.0}
    loss, comps, assign = set_to_set_kinematics_loss(kin[:, perm, :], batch, cfg)
    # matched real-real pairs contribute 0; real-pad contribute BIG only if
    # cardinality mismatch is forced (here P==P so pads match pads: 0)
    assert float(loss) < 1e-4


def test_incidence_loss_recovers_identity_assignment():
    batch, n_parts = _pf_batch(seed=5)
    # predicted incidence == truth transposed -> KL minimal on diagonal
    inc_pred = jnp.swapaxes(batch["incidence_matrix"], 1, 2)  # (B, P, N)
    kin = jnp.zeros((3, 4, 4))
    loss, comps, assign = set_to_set_incidence_loss(inc_pred, batch, kin)
    a = np.asarray(assign)
    for b, n in enumerate(n_parts):
        # real slots must map to themselves (cost strictly minimal on diag)
        np.testing.assert_array_equal(a[b, :n], np.arange(n))
    assert "kin_loss" in comps


def test_losses_jit_and_grad():
    batch, _ = _pf_batch(seed=7)
    cfg = {"pt_loss_wt": 1.0, "eta_loss_wt": 1.0, "phi_loss_wt": 1.0, "e_loss_wt": 1.0}

    def f(kin):
        loss, _, _ = set_to_set_kinematics_loss(kin, batch, cfg)
        return loss

    kin = jnp.zeros((3, 4, 4))
    g = jax.jit(jax.grad(f))(kin)
    assert np.all(np.isfinite(np.asarray(g)))


def test_event_mask_excludes_filler_events():
    """Filler slots (all-masked events from the bucket packer) must not dilute
    the loss: a batch with k fillers appended gives the same loss as without."""
    batch, _ = _pf_batch(B=3, seed=11)
    cfg = {"pt_loss_wt": 1.0, "eta_loss_wt": 1.0, "phi_loss_wt": 1.0, "e_loss_wt": 1.0}
    kin = jnp.asarray(np.random.default_rng(1).normal(size=(3, 4, 4)).astype(np.float32))
    ev_mask = batch["cell_mask"].any(-1)
    loss_real, comps_real, _ = set_to_set_kinematics_loss(kin, batch, cfg, ev_mask)

    # append 2 filler events (everything zero / masked-out)
    def pad(v):
        filler = jnp.zeros((2,) + v.shape[1:], v.dtype)
        return jnp.concatenate([v, filler], axis=0)

    padded = {k: pad(v) for k, v in batch.items()}
    kin_p = jnp.concatenate([kin, jnp.zeros((2, 4, 4))], axis=0)
    ev_mask_p = padded["cell_mask"].any(-1)
    assert not bool(ev_mask_p[-1])
    loss_pad, comps_pad, _ = set_to_set_kinematics_loss(kin_p, padded, cfg, ev_mask_p)
    np.testing.assert_allclose(float(loss_pad), float(loss_real), rtol=1e-6)
    for k in comps_real:
        np.testing.assert_allclose(float(comps_pad[k]), float(comps_real[k]), rtol=1e-6)

    # incidence variant too
    li_real, ci_real, _ = set_to_set_incidence_loss(
        jnp.swapaxes(batch["incidence_matrix"], 1, 2), batch, kin, ev_mask
    )
    li_pad, ci_pad, _ = set_to_set_incidence_loss(
        jnp.swapaxes(padded["incidence_matrix"], 1, 2), padded, kin_p, ev_mask_p
    )
    np.testing.assert_allclose(float(li_pad), float(li_real), rtol=1e-6)
    np.testing.assert_allclose(float(ci_pad["kin_loss"]), float(ci_real["kin_loss"]), rtol=1e-6)


def test_cardinality_ce_excludes_filler_events():
    from superresolutionhep_tpu.train.pf_trainer import cross_entropy_int_labels

    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(4, 5)).astype(np.float32))
    labels = jnp.asarray([1, 2, 3, 4], jnp.int32)
    mask = jnp.asarray([True, True, False, False])
    full = cross_entropy_int_labels(logits[:2], labels[:2])
    masked = cross_entropy_int_labels(logits, labels, mask)
    np.testing.assert_allclose(float(masked), float(full), rtol=1e-6)
