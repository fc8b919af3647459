"""Sequence (context) parallelism for the SR flow model.

The reference handles up to ~3.5k cells on one device with dense O(N^2)
attention and has no CP/ring/Ulysses anywhere (SURVEY §5).  The blockwise
attention here makes the shard_map CP extension straightforward: cells are
sharded over a ``seq`` mesh axis; inside the shard_map body

  * per-cell ops (embedders, FFNs, norms) run local;
  * the pooled conditioning vector psum-reduces over ``seq``
    (ops/masked.masked_mean);
  * attention all-gathers K/V over ICI while queries stay local
    (models/attention.MultiheadAttention.sp_axis).

Composes with data parallelism on a ('data', 'seq') mesh: batch sharded over
``data``, cells over ``seq``, params replicated, gradient psum over both.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..flow.cfm import sample_location_and_conditional_flow
from ..models.flow_model import FlowModel

DATA, SEQ = "data", "seq"


def make_dp_sp_mesh(n_data: int, n_seq: int) -> Mesh:
    devs = np.array(jax.devices()[: n_data * n_seq]).reshape(n_data, n_seq)
    return Mesh(devs, (DATA, SEQ))


def _batch_specs(batch):
    specs = {}
    for k, v in batch.items():
        if v.ndim >= 2:
            specs[k] = P(DATA, SEQ, *([None] * (v.ndim - 2)))
        else:
            specs[k] = P(DATA)
    return specs


def make_sp_forward(flow_config: dict, mesh: Mesh, dtype=None, sp_mode: str = "gather"):
    """Returns (model_sp, forward_fn) where forward_fn(variables, batch,
    noisy, t) runs the FlowModel with cells sharded over ``seq``;
    ``sp_mode`` picks all-gather vs ring K/V movement."""
    model_sp = FlowModel(config=flow_config, dtype=dtype, sp_axis=SEQ, sp_mode=sp_mode)

    def local(variables, batch, noisy, t):
        return model_sp.apply(variables, batch, noisy, t)

    def forward(variables, batch, noisy, t):
        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), _batch_specs(batch), P(DATA, SEQ, None), P(DATA)),
            out_specs=P(DATA, SEQ, None),
            check_vma=False,
        )
        return fn(variables, batch, noisy, t)

    return model_sp, forward


def make_sp_train_step(flow_config: dict, tx, mesh: Mesh, sigma_min: float, dtype=None):
    """Full dp x sp flow-matching train step: per-shard loss contributions
    psum into the global masked-MSE; grads psum over both mesh axes."""
    model_sp = FlowModel(config=flow_config, dtype=dtype, sp_axis=SEQ)

    def local_grads(params, batch, rng):
        # per-event time draws must agree across seq shards of the same
        # event (split-then-fold keeps the t stream and the per-shard x0
        # streams disjoint for any seq-axis size)
        d_idx = jax.lax.axis_index(DATA)
        s_idx = jax.lax.axis_index(SEQ)
        key_t, key_x0 = jax.random.split(jax.random.fold_in(rng, d_idx))
        rng_x = jax.random.fold_in(key_x0, s_idx)

        target = batch["target"]
        B = target.shape[0]
        t = jax.random.uniform(key_t, (B,), target.dtype)
        # interpolate locally with per-cell iid noise (x0 differs per shard)
        _, xt, ut = sample_location_and_conditional_flow(rng_x, target, sigma_min, t=t)

        def loss_fn(p):
            vt = model_sp.apply({"params": p}, batch, xt, t)
            m = batch["q_mask"][..., None].astype(vt.dtype)
            # the shard's LOCAL squared-error share over the GLOBAL cell
            # count: psum-ing se inside the differentiated function would
            # inflate every gradient by the shard count (psum transposes
            # to psum, ops/tp.py) — the grad psum below is the one and
            # only cross-shard accumulation
            se = ((vt - ut) ** 2 * m).sum()
            n = jax.lax.psum(m.sum(), (DATA, SEQ))  # no grad path
            return se / jnp.maximum(n, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.psum(grads, (DATA, SEQ))
        loss = jax.lax.psum(loss, (DATA, SEQ))  # logging only
        return loss, grads

    def step(params, opt_state, batch, rng):
        fn = jax.shard_map(
            local_grads,
            mesh=mesh,
            in_specs=(P(), _batch_specs(batch), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        loss, grads = fn(params, batch, rng)
        import optax

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return model_sp, step


def _pf_batch_specs(batch):
    out = {}
    for k, v in batch.items():
        if k.startswith("cell_") or k == "incidence_matrix":
            out[k] = P(DATA, SEQ, *([None] * (v.ndim - 2)))
        elif v.ndim >= 2:
            out[k] = P(DATA, *([None] * (v.ndim - 1)))
        else:
            out[k] = P(DATA)
    return out


def make_pf_sp_train_step(
    config_pf: dict,
    transforms,
    tx,
    mesh: Mesh,
    config_t: Optional[dict] = None,
    dtype=None,
    sp_mode: str = "gather",
):
    """Stage-2 (SAPF) dp x sp train step: cells sharded over ``seq``.

    The set-to-set incidence KL is a plain sum over cells, so each shard's
    partial cost psums into the exact global (B, P, P) cost matrix
    (losses/set2set.incidence_pairwise_cost ``axis_name``); the Hungarian
    argmin then runs replicated (P! small).  The cardinality CE and the
    kinematics-cost variant touch no cell axis and run replicated over
    ``seq``.  All per-event means are restricted to real events via a
    psum'd cell-validity flag (same fix as pf_trainer.compute_loss).
    Grads psum over both mesh axes.
    """
    import optax

    from ..losses.set2set import (
        _gather_matched,
        hungarian,
        incidence_pairwise_cost,
        kinematics_pairwise_cost,
    )
    from ..models.pf.model_pf import SAPF

    config_t = config_t or {}
    loss_on_inc = bool(config_t.get("loss_on_inc_wts", True))
    card_weight = float(config_t.get("card_loss_weight", 1.0))
    kin_weights = {
        k: float(config_t.get(k, 1.0))
        for k in ("pt_loss_wt", "eta_loss_wt", "phi_loss_wt", "e_loss_wt")
    }
    model_sp = SAPF(
        config_pf=config_pf, transforms=transforms, sp_axis=SEQ, sp_mode=sp_mode, dtype=dtype
    )
    n_seq = mesh.shape[SEQ]

    def local_grads(params, batch):
        # real (non-filler) events: any valid cell on any seq shard
        ev_local = batch["cell_mask"].any(axis=-1).astype(jnp.float32)
        w = (jax.lax.psum(ev_local, SEQ) > 0).astype(jnp.float32)  # (B_local,)
        n_real = jnp.maximum(jax.lax.psum(w.sum(), DATA), 1.0)

        def loss_fn(p):
            card_logits, kin_pred, inc_weights = model_sp.apply({"params": p}, batch)
            loss_sum = 0.0
            if card_logits is not None:
                logp = jax.nn.log_softmax(card_logits, axis=-1)
                ce = -jnp.take_along_axis(
                    logp, batch["cardinality"][:, None].astype(jnp.int32), axis=-1
                )[:, 0]
                loss_sum = loss_sum + card_weight * (ce * w).sum()
            if kin_pred is not None:
                if loss_on_inc:
                    pdist = incidence_pairwise_cost(inc_weights, batch, axis_name=SEQ)
                else:
                    pdist, _ = kinematics_pairwise_cost(kin_pred, batch, kin_weights)
                assign = hungarian(jax.lax.stop_gradient(pdist))
                per_event = _gather_matched(pdist, assign).mean(axis=1)
                loss_sum = loss_sum + (per_event * w).sum()
            # loss_sum is replicated along SEQ (the pairwise costs psum over
            # it), so the per-shard loss share is loss_sum/(n_real * n_seq):
            # summed over ALL mesh shards that recovers the global loss
            # exactly once.  psum-ing inside the differentiated function
            # would inflate every gradient by the shard count (psum
            # transposes to psum, ops/tp.py).
            return loss_sum / (n_real * n_seq)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.psum(grads, (DATA, SEQ))
        loss = jax.lax.psum(loss, (DATA, SEQ))  # logging only
        return loss, grads

    def step(params, opt_state, batch):
        fn = jax.shard_map(
            local_grads,
            mesh=mesh,
            in_specs=(P(), _pf_batch_specs(batch)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        loss, grads = fn(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return model_sp, step


def make_pf_sp_forward(config_pf: dict, transforms, mesh: Mesh, dtype=None, sp_mode: str = "gather"):
    """Stage-2 (SAPF) forward with cells sharded over ``seq``: cell features
    and incidence weights stay sharded, pooled context / cardinality logits /
    matched kinematics psum into replicated outputs."""
    from ..models.pf.model_pf import SAPF

    model_sp = SAPF(
        config_pf=config_pf, transforms=transforms, sp_axis=SEQ, sp_mode=sp_mode, dtype=dtype
    )

    def local(variables, batch):
        return model_sp.apply(variables, batch)

    def forward(variables, batch):
        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), _pf_batch_specs(batch)),
            out_specs=(P(DATA), P(DATA), P(DATA, None, SEQ)),
            check_vma=False,
        )
        return fn(variables, batch)

    return model_sp, forward
