"""Tensor parallelism (Megatron head/MLP sharding) for the SR flow model.

The reference is single-device torch with no model parallelism of any kind
(SURVEY §5; reference train.py runs one GPU).  This is the TPU-native TP
story: attention heads and the DiT MLP hidden width shard over a ``model``
mesh axis via ``shard_map``, with the two classic reduce points per DiT
layer (attention output projection, MLP second matmul) psumming partial
products over ICI, and everything else — embedders, LayerNorms, adaLN
modulation, the v_t head — replicated.

Parameter layout (FlowModel params tree, models/flow_model.py):

  transformer/layers_i/mha/linear_{q,k,v}   kernel P(None, 'model'), bias P('model')   [column]
  transformer/layers_i/mha/linear_out       kernel P('model', None), bias replicated/tp [row]
  transformer/layers_i/dense/linear_0       kernel P(None, 'model'), bias P('model')   [column]
  transformer/layers_i/dense/linear_1       kernel P('model', None), bias replicated/tp [row]
  everything else                           replicated

Row-parallel biases are PRE-DIVIDED by the axis size in the sharded view
(``tp_param_view``) so the forward psum reconstitutes them exactly once; by
the same token the per-shard gradient of the divided view leaf already
equals the master-parameter gradient, so no un-view correction is needed
(see ``make_tp_train_step``).

Gradient correctness rests on the Megatron 'f' boundary
(ops/tp.tp_block_input): identity forward / psum backward at each
column-parallel entry makes every cotangent upstream of the TP blocks
complete and identical on all model shards, so replicated-parameter grads
need no model-axis reduction — the train step psums grads over 'data' only.

Composes with data parallelism on a ('data', 'model') mesh: batch sharded
over 'data', cells unsharded (that is sp.py's job), params sharded as above.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..flow.cfm import sample_location_and_conditional_flow
from ..models.flow_model import FlowModel

DATA, MODEL = "data", "model"
SEQ = "seq"


def make_dp_tp_mesh(n_data: int, n_tp: int) -> Mesh:
    devs = np.array(jax.devices()[: n_data * n_tp]).reshape(n_data, n_tp)
    return Mesh(devs, (DATA, MODEL))


def make_dp_sp_tp_mesh(n_data: int, n_seq: int, n_tp: int) -> Mesh:
    """3D mesh: batch over 'data', cells over 'seq', heads/MLP over 'model'."""
    devs = np.array(jax.devices()[: n_data * n_seq * n_tp]).reshape(n_data, n_seq, n_tp)
    return Mesh(devs, (DATA, SEQ, MODEL))


def _path_keys(path) -> tuple:
    return tuple(str(getattr(p, "key", p)) for p in path)


def _tp_role(path):
    """Classify a FlowModel param leaf: 'col_kernel' | 'col_bias' |
    'row_kernel' | 'row_bias' | None (replicated).  Scoped to the DiT layer
    modules so e.g. v_t_pred_net/linear_0 stays replicated."""
    keys = _path_keys(path)
    if not any(k.startswith("layers_") for k in keys):
        return None
    leaf = keys[-1]
    if "mha" in keys:
        mod = keys[keys.index("mha") + 1]
        if mod in ("linear_q", "linear_k", "linear_v"):
            return "col_kernel" if leaf == "kernel" else "col_bias"
        if mod == "linear_out":
            return "row_kernel" if leaf == "kernel" else "row_bias"
    elif "dense" in keys:
        mod = keys[keys.index("dense") + 1]
        if mod == "linear_0":
            return "col_kernel" if leaf == "kernel" else "col_bias"
        if mod == "linear_1":
            return "row_kernel" if leaf == "kernel" else "row_bias"
    return None


_SPEC_BY_ROLE = {
    "col_kernel": P(None, MODEL),
    "col_bias": P(MODEL),
    "row_kernel": P(MODEL, None),
    "row_bias": P(),
    None: P(),
}


def tp_param_specs(params):
    """PartitionSpec pytree mirroring ``params`` for the TP layout above."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _SPEC_BY_ROLE[_tp_role(path)], params
    )


def tp_param_view(params, n_tp: int):
    """The sharded-execution view of replicated master params: row-parallel
    biases divided by the axis size (each shard adds bias/n_tp; the forward
    psum then adds the bias exactly once)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: x / n_tp if _tp_role(path) == "row_bias" else x, params
    )


def _batch_specs(batch):
    return {k: P(DATA) for k in batch}


def _tp_model(flow_config: dict, mesh: Mesh, dtype, attn_impl: str = "auto"):
    n_tp = mesh.shape[MODEL]
    return (
        FlowModel(
            config=flow_config,
            dtype=dtype,
            attn_impl=attn_impl,
            tp_axis=MODEL,
            tp_size=n_tp,
        ),
        n_tp,
    )


def make_tp_forward(flow_config: dict, mesh: Mesh, dtype=None, attn_impl: str = "auto"):
    """Returns (model_tp, forward_fn): forward_fn(variables, batch, noisy, t)
    runs the FlowModel with heads/MLP sharded over 'model' and the batch
    sharded over 'data'.  ``variables`` are the ordinary replicated params
    (e.g. from FlowModel.init or a shipped checkpoint) — the head-sliced
    view is taken internally."""
    model_tp, n_tp = _tp_model(flow_config, mesh, dtype, attn_impl)

    def forward(variables, batch, noisy, t):
        params = variables["params"]
        view = tp_param_view(params, n_tp)
        fn = jax.shard_map(
            lambda p, b, x, tt: model_tp.apply({"params": p}, b, x, tt),
            mesh=mesh,
            in_specs=(tp_param_specs(params), _batch_specs(batch), P(DATA), P(DATA)),
            out_specs=P(DATA),
            check_vma=False,
        )
        return fn(view, batch, noisy, t)

    return model_tp, forward


def make_sp_tp_forward(flow_config: dict, mesh: Mesh, dtype=None, sp_mode: str = "gather"):
    """3D dp x sp x tp forward on a ('data', 'seq', 'model') mesh: batch
    sharded over 'data', cells over 'seq' (attention K/V gather + pooled-
    context psum, parallel/sp.py), heads/MLP over 'model' (this module).
    The two manual-collective families compose: the sequence gather moves
    the token axis of HEAD-LOCAL projections; the tensor psums reduce the
    feature axis of CELL-LOCAL activations."""
    from .sp import _batch_specs as _sp_batch_specs

    n_tp = mesh.shape[MODEL]
    model_3d = FlowModel(
        config=flow_config,
        dtype=dtype,
        sp_axis=SEQ,
        sp_mode=sp_mode,
        tp_axis=MODEL,
        tp_size=n_tp,
    )

    def forward(variables, batch, noisy, t):
        params = variables["params"]
        fn = jax.shard_map(
            lambda p, b, x, tt: model_3d.apply({"params": p}, b, x, tt),
            mesh=mesh,
            in_specs=(
                tp_param_specs(params),
                _sp_batch_specs(batch),
                P(DATA, SEQ, None),
                P(DATA),
            ),
            out_specs=P(DATA, SEQ, None),
            check_vma=False,
        )
        return fn(tp_param_view(params, n_tp), batch, noisy, t)

    return model_3d, forward


def make_pf_tp_forward(config_pf: dict, transforms, mesh: Mesh, dtype=None):
    """Stage-2 (SAPF) forward with heads/MLP sharded over 'model' in both
    DiT stacks (cell encoder self-attention + kinematics cross-attention,
    models/pf/{encoder,kinematics}.py).  Outputs are replicated over
    'model' after the row-parallel psums, sharded over 'data' only."""
    from ..models.pf.model_pf import SAPF

    n_tp = mesh.shape[MODEL]
    model_tp = SAPF(
        config_pf=config_pf,
        transforms=transforms,
        tp_axis=MODEL,
        tp_size=n_tp,
        dtype=dtype,
    )

    def forward(variables, batch):
        params = variables["params"]
        fn = jax.shard_map(
            lambda p, b: model_tp.apply({"params": p}, b),
            mesh=mesh,
            in_specs=(tp_param_specs(params), _batch_specs(batch)),
            out_specs=(P(DATA), P(DATA), P(DATA)),
            check_vma=False,
        )
        return fn(tp_param_view(params, n_tp), batch)

    return model_tp, forward


def make_pf_tp_train_step(
    config_pf: dict, transforms, tx, mesh: Mesh, config_t=None, dtype=None
):
    """Stage-2 (SAPF) dp x tp train step.  Unlike the sp variant
    (sp.make_pf_sp_train_step), the set-to-set loss needs no model-axis
    collectives at all: every activation entering it is already replicated
    over 'model' after the row-parallel psums, so the single-device loss
    runs verbatim per shard and grads psum over 'data' only (the 'f'
    boundary guarantees replicated-leaf completeness)."""
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
    n_tp = mesh.shape[MODEL]
    model_tp = SAPF(
        config_pf=config_pf, transforms=transforms, tp_axis=MODEL, tp_size=n_tp, dtype=dtype
    )

    def local_grads(view, batch):
        w = batch["cell_mask"].any(axis=-1).astype(jnp.float32)  # real events
        n_real = jnp.maximum(jax.lax.psum(w.sum(), DATA), 1.0)

        def loss_fn(p):
            card_logits, kin_pred, inc_weights = model_tp.apply({"params": p}, batch)
            loss_sum = 0.0
            if card_logits is not None:
                logp = jax.nn.log_softmax(card_logits, axis=-1)
                ce = -jnp.take_along_axis(
                    logp, batch["cardinality"][:, None].astype(jnp.int32), axis=-1
                )[:, 0]
                loss_sum = loss_sum + card_weight * (ce * w).sum()
            if kin_pred is not None:
                if loss_on_inc:
                    pdist = incidence_pairwise_cost(inc_weights, batch)
                else:
                    pdist, _ = kinematics_pairwise_cost(kin_pred, batch, kin_weights)
                assign = hungarian(jax.lax.stop_gradient(pdist))
                per_event = _gather_matched(pdist, assign).mean(axis=1)
                loss_sum = loss_sum + (per_event * w).sum()
            # local share / global event count — no psum inside the grad
            # (psum transposes to psum, see ops/tp.py)
            return loss_sum / n_real

        loss, grads = jax.value_and_grad(loss_fn)(view)
        grads = jax.lax.psum(grads, DATA)
        loss = jax.lax.psum(loss, DATA)  # logging only
        return loss, grads

    def step(params, opt_state, batch):
        specs = tp_param_specs(params)
        fn = jax.shard_map(
            local_grads,
            mesh=mesh,
            in_specs=(specs, _batch_specs(batch)),
            out_specs=(P(), specs),
            check_vma=False,
        )
        loss, grads = fn(tp_param_view(params, n_tp), batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return model_tp, step


def make_tp_train_step(flow_config: dict, tx, mesh: Mesh, sigma_min: float, dtype=None):
    """dp x tp flow-matching train step on a ('data', 'model') mesh.

    Grads psum over 'data' only: sharded leaves are owned per model shard,
    and the 'f' boundary (ops/tp.py) makes replicated-leaf grads complete
    and identical across model shards.  Grads of the divided row-bias view
    equal the master-bias grads directly (y = sum_s x W_s + n_tp*(b/n_tp),
    so dL/d(b/n_tp) arriving per shard is dL/dy = dL/db)."""
    import optax

    model_tp, n_tp = _tp_model(flow_config, mesh, dtype)

    def local_grads(view, batch, rng):
        # per-event draws agree across model shards (no fold over MODEL):
        # every shard must see identical t and x0 streams
        d_idx = jax.lax.axis_index(DATA)
        key_t, key_x0 = jax.random.split(jax.random.fold_in(rng, d_idx))

        target = batch["target"]
        B = target.shape[0]
        t = jax.random.uniform(key_t, (B,), target.dtype)
        _, xt, ut = sample_location_and_conditional_flow(key_x0, target, sigma_min, t=t)

        def loss_fn(p):
            vt = model_tp.apply({"params": p}, batch, xt, t)
            m = batch["q_mask"][..., None].astype(vt.dtype)
            # the LOCAL squared-error share with the GLOBAL normalization:
            # psum-ing se inside the differentiated function would inflate
            # every gradient by the data-axis size (psum transposes to
            # psum — see ops/tp.py); the data-axis grad psum below is the
            # one and only cross-shard accumulation
            se = ((vt - ut) ** 2 * m).sum()
            n = jax.lax.psum(m.sum(), DATA)  # no grad path through the mask
            return se / jnp.maximum(n, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(view)
        grads = jax.lax.psum(grads, DATA)
        loss = jax.lax.psum(loss, DATA)  # logging only (outside the grad)
        return loss, grads

    def step(params, opt_state, batch, rng):
        specs = tp_param_specs(params)
        fn = jax.shard_map(
            local_grads,
            mesh=mesh,
            in_specs=(specs, _batch_specs(batch), P()),
            out_specs=(P(), specs),
            check_vma=False,
        )
        loss, grads = fn(tp_param_view(params, n_tp), batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return model_tp, step
