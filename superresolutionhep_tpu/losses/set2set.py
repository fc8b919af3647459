"""Hungarian-matched set-to-set losses for particle-flow training.

Capability mirror of utility/set_to_set_loss.py:28-205 with the decisive
TPU-first change: the reference syncs the cost matrix to host every step and
runs scipy ``linear_sum_assignment`` per event (set_to_set_loss.py:111-116,
a device->host round-trip in the middle of training).  Here, with
``max_particles`` small (4 in every shipped config), the optimal assignment
is an **exhaustive argmin over all P! permutations evaluated on device** —
exact, jittable, batched, differentiable-through-gather, and it removes the
sync entirely.  For large P a scipy ``pure_callback`` path is kept.

Cost-mask convention (set_to_set_loss.py:35-68): real x real keeps the cost,
real x pad gets +1e6 (forces real<->real matches first), pad x pad gets 0.
"""

from __future__ import annotations

import itertools
import jax
import jax.numpy as jnp
import numpy as np

BIG = 1.0e6
EPS = 1e-8
MAX_EXHAUSTIVE_P = 8  # 8! = 40320 permutations — still trivially on-device


def _permutations(p: int) -> np.ndarray:
    return np.array(list(itertools.permutations(range(p))), dtype=np.int32)


def pad_cost_masks(part_valid):
    """(not_q4, q2_q3_inf) from the particle validity mask (B, P) —
    set_to_set_loss.py:35-68 with valid==True convention."""
    pv = part_valid.astype(jnp.float32)
    sum_mask = pv[:, None, :] + pv[:, :, None]  # (B, P, P): 2=RR, 1=RF, 0=FF
    q2_q3_inf = (sum_mask == 1.0) * BIG
    not_q4 = (sum_mask != 0.0).astype(jnp.float32)
    return not_q4, q2_q3_inf


def hungarian(cost):
    """Optimal assignment for a (B, P, P) cost batch.

    Returns ``col_of_row`` (B, P): for truth row i, the matched prediction
    column.  Exhaustive on-device for P <= MAX_EXHAUSTIVE_P, scipy callback
    beyond.
    """
    P = cost.shape[-1]
    if P <= MAX_EXHAUSTIVE_P:
        perms = jnp.asarray(_permutations(P))  # (P!, P)
        # total cost of each permutation: sum_i cost[b, i, perm[i]]
        rows = jnp.arange(P)  # broadcasts with (P!, P) -> (B, P!, P)
        perm_costs = cost[:, rows, perms].sum(-1)  # (B, P!)
        best = jnp.argmin(perm_costs, axis=-1)  # (B,)
        return perms[best]  # (B, P)

    def host_lsa(c):
        from scipy.optimize import linear_sum_assignment

        out = np.zeros(c.shape[:2], np.int32)
        for b in range(c.shape[0]):
            _, cols = linear_sum_assignment(c[b])
            out[b] = cols
        return out

    return jax.pure_callback(
        host_lsa,
        jax.ShapeDtypeStruct(cost.shape[:2], jnp.int32),
        cost,
        vmap_method="sequential",
    )


def _gather_matched(cost_terms, assign):
    """cost_terms: (B, P, P) keyed [truth_i, pred_j]; assign: (B, P) pred col
    per truth row. Returns (B, P) matched entries."""
    B, P = assign.shape
    rows = jnp.arange(P)[None, :]
    return cost_terms[jnp.arange(B)[:, None], rows, assign]


def _event_weighted_mean(per_event, event_mask):
    """Mean of a (B,) per-event vector over *real* events only.

    ``event_mask=None`` keeps the plain batch mean.  Bucketed batches pad
    partial batches with filler slots (all-masked events, data/bucketing.py);
    the reference never sees fillers, so averaging over B would dilute the
    loss (and its gradient scale) by the fill fraction."""
    if event_mask is None:
        return per_event.mean()
    w = event_mask.astype(per_event.dtype)
    return (per_event * w).sum() / jnp.maximum(w.sum(), 1.0)


def _event_weighted_mean2(per_slot, event_mask):
    """Mean of a (B, P) per-slot tensor over real events' slots."""
    if event_mask is None:
        return per_slot.mean()
    w = event_mask.astype(per_slot.dtype)[:, None]
    return (per_slot * w).sum() / jnp.maximum(w.sum() * per_slot.shape[1], 1.0)


# ---------------------------------------------------------------------------
# kinematics variant (SetToSetLossKinematics, set_to_set_loss.py:72-146)
# ---------------------------------------------------------------------------


def kinematics_pairwise_cost(kin_pred, batch, weights):
    """Pairwise weighted cost (B, P, P) with [truth_i, pred_j] indexing.

    kin_pred: (B, P, 4) = (pt, eta, phi, e) in transformed space;
    truth from batch keys part_pt/part_eta/part_phi/part_dep_e (dep_e is the
    energy target, set_to_set_loss.py:96).
    """
    pred_pt = kin_pred[:, None, :, 0]
    pred_eta = kin_pred[:, None, :, 1]
    pred_phi = kin_pred[:, None, :, 2]
    pred_e = kin_pred[:, None, :, 3]

    tr_pt = batch["part_pt"][:, :, None]
    tr_eta = batch["part_eta"][:, :, None]
    tr_phi = batch["part_phi"][:, :, None]
    tr_e = batch["part_dep_e"][:, :, None]

    pt_l = weights["pt_loss_wt"] * (pred_pt - tr_pt) ** 2
    eta_l = weights["eta_loss_wt"] * (pred_eta - tr_eta) ** 2
    phi_l = weights["phi_loss_wt"] * (1.0 - jnp.cos(pred_phi - tr_phi))
    e_l = weights["e_loss_wt"] * (pred_e - tr_e) ** 2

    not_q4, q2_q3_inf = pad_cost_masks(batch["part_mask"])
    terms = {
        "pt_loss": pt_l * not_q4 + q2_q3_inf,
        "eta_loss": eta_l * not_q4 + q2_q3_inf,
        "phi_loss": phi_l * not_q4 + q2_q3_inf,
        "e_loss": e_l * not_q4 + q2_q3_inf,
    }
    total = sum(terms.values())
    return total, terms


def set_to_set_kinematics_loss(kin_pred, batch, config, event_mask=None):
    """Returns (loss, components, assign) — assign (B,P) maps truth row ->
    matched prediction index (mirrors ``assgn_indices``,
    set_to_set_loss.py:144-146).  ``event_mask`` (B,) restricts the batch
    mean to real (non-filler) events."""
    weights = {
        k: float(config.get(k, 1.0))
        for k in ("pt_loss_wt", "eta_loss_wt", "phi_loss_wt", "e_loss_wt")
    }
    total, terms = kinematics_pairwise_cost(kin_pred, batch, weights)
    assign = hungarian(jax.lax.stop_gradient(total))
    matched = _gather_matched(total, assign)
    loss = _event_weighted_mean(matched.mean(axis=1), event_mask)
    components = {
        k: _event_weighted_mean2(_gather_matched(v, assign), event_mask)
        for k, v in terms.items()
    }
    return loss, components, assign


# ---------------------------------------------------------------------------
# incidence variant (SetToSetLossIncidence, set_to_set_loss.py:150-205)
# ---------------------------------------------------------------------------


def incidence_pairwise_cost(inc_weights, batch, axis_name=None):
    """Masked-KL pairwise cost (B, P, P): truth incidence row_i vs predicted
    incidence row_j (set_to_set_loss.py:155-172).

    ``axis_name`` supports sequence parallelism: when cells are sharded over
    that mesh axis, the per-shard partial KL sums and cell counts psum into
    the exact global cost (the KL is a plain sum over cells)."""
    cell_mask = batch["cell_mask"].astype(jnp.float32)  # (B, N)
    target = jnp.swapaxes(batch["incidence_matrix"], 1, 2)  # (B, P, N)
    inp = inc_weights * cell_mask[:, None, :]
    target = target * cell_mask[:, None, :]

    # kld[b, i, j] = -sum_c target[b,i,c] * log(input[b,j,c] + eps) / n_cells
    logs = jnp.log(inp + EPS)  # (B, P, N)
    kld = -jnp.einsum("bin,bjn->bij", target, logs)
    n_cells = cell_mask.sum(axis=-1)
    if axis_name is not None:
        kld = jax.lax.psum(kld, axis_name)
        n_cells = jax.lax.psum(n_cells, axis_name)
    kld = kld / jnp.maximum(n_cells, 1.0)[:, None, None]

    not_q4, q2_q3_inf = pad_cost_masks(batch["part_mask"])
    return kld * not_q4 + q2_q3_inf


def set_to_set_incidence_loss(inc_weights, batch, kin_pred, event_mask=None):
    """Returns (loss, components, assign). Kinematics components are computed
    post-assignment for logging only (set_to_set_loss.py:188-201).
    ``event_mask`` (B,) restricts batch means to real (non-filler) events."""
    pdist = incidence_pairwise_cost(inc_weights, batch)
    assign = hungarian(jax.lax.stop_gradient(pdist))
    matched = _gather_matched(pdist, assign)
    loss = _event_weighted_mean(matched.mean(axis=1), event_mask)

    B, P = assign.shape
    wm = _event_weighted_mean2
    kin_reordered = kin_pred[jnp.arange(B)[:, None], assign, :]  # (B, P, 4)
    pt_loss = wm((kin_reordered[:, :, 0] - batch["part_pt"]) ** 2, event_mask)
    eta_loss = wm((kin_reordered[:, :, 1] - batch["part_eta"]) ** 2, event_mask)
    phi_loss = wm(1.0 - jnp.cos(kin_reordered[:, :, 2] - batch["part_phi"]), event_mask)
    e_loss = wm((kin_reordered[:, :, 3] - batch["part_dep_e"]) ** 2, event_mask)
    components = {
        "pt_loss": pt_loss,
        "eta_loss": eta_loss,
        "phi_loss": phi_loss,
        "e_loss": e_loss,
        "kin_loss": pt_loss + eta_loss + phi_loss + e_loss,
    }
    return loss, components, assign
