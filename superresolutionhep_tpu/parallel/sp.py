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
            se = ((vt - ut) ** 2 * m).sum()
            n = m.sum()
            se = jax.lax.psum(se, (DATA, SEQ))
            n = jax.lax.psum(n, (DATA, SEQ))
            return se / jnp.maximum(n, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.psum(grads, (DATA, SEQ))
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

    def specs(batch):
        out = {}
        for k, v in batch.items():
            if k.startswith("cell_") or k == "incidence_matrix":
                out[k] = P(DATA, SEQ, *([None] * (v.ndim - 2)))
            elif v.ndim >= 2:
                out[k] = P(DATA, *([None] * (v.ndim - 1)))
            else:
                out[k] = P(DATA)
        return out

    def forward(variables, batch):
        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), specs(batch)),
            out_specs=(P(DATA), P(DATA), P(DATA, None, SEQ)),
            check_vma=False,
        )
        return fn(variables, batch)

    return model_sp, forward
