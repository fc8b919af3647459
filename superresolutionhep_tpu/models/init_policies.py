"""Weight-initialisation policies applied as param-tree surgery.

The reference applies config-keyed init policies after module construction
(models/flow_model.py:116-154, pflow/models/model_pf.py:25-53):

  * ``all_linear: xavier_uniform`` — all Linear kernels Xavier-uniform, zero
    bias.  Realised at construction time in our modules (dense.py), nothing to
    do here.
  * ``layer_emb_table: normal`` — embedding table ~ N(0, 0.02).
  * ``time_step_embedder: normal`` — the two timestep-MLP kernels ~ N(0, 0.02).
  * ``ln_modulation: zero`` — zero every adaLN modulation Linear (kernel+bias),
    including the final ``v_t_adaLN_modulation``.
  * ``v_t_pred_linear: zero`` — zero the last linear of the v_t head.

These matter for training stability (zero-init adaLN makes every DiT block an
identity at step 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _walk(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, path + (k,))
    else:
        yield path, tree


def _set(tree: dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def _final_linear_name(subtree: dict) -> str:
    idxs = [int(k.split("_")[-1]) for k in subtree if k.startswith("linear_")]
    return f"linear_{max(idxs)}"


def apply_init_policies(params: dict, init_cfg: dict, rng: jax.Array) -> dict:
    """Return a new param tree with the configured policies applied.

    ``params`` is a flax param dict (the subtree under 'params').
    """
    params = jax.tree_util.tree_map(lambda x: x, params)  # rebuilds containers, safe to mutate
    flat = list(_walk(params))

    if init_cfg.get("ln_modulation") == "zero":
        for path, leaf in flat:
            if any("adaLN_modulation" in p for p in path):
                _set(params, path, jnp.zeros_like(leaf))
            if any(p == "v_t_adaLN_modulation" for p in path):
                _set(params, path, jnp.zeros_like(leaf))

    if init_cfg.get("layer_emb_table") == "normal":
        for path, leaf in flat:
            if "layer_emb_table" in path and path[-1] == "embedding":
                rng, sub = jax.random.split(rng)
                _set(params, path, 0.02 * jax.random.normal(sub, leaf.shape, leaf.dtype))

    if init_cfg.get("time_step_embedder") == "normal":
        for path, leaf in flat:
            if "time_step_embedder" in path and path[-1] == "kernel":
                rng, sub = jax.random.split(rng)
                _set(params, path, 0.02 * jax.random.normal(sub, leaf.shape, leaf.dtype))

    if init_cfg.get("v_t_pred_linear") == "zero":
        for path, leaf in flat:
            if "v_t_pred_net" in path:
                head = params
                for k in path[: path.index("v_t_pred_net") + 1]:
                    head = head[k]
                final = _final_linear_name(head)
                if final in path:
                    _set(params, path, jnp.zeros_like(leaf))

    return params
