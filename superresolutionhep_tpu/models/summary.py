"""Parameter summaries (weight statistics per top-level module).

Capability mirror of FlowModel.get_param_summary (models/flow_model.py:332-363):
min/max/mean/std over the concatenated Linear kernels and biases of each
top-level submodule — the reference's init-sanity diagnostic.
"""

from __future__ import annotations

import numpy as np


def _collect(tree, kernels, biases):
    if isinstance(tree, dict):
        for k, v in tree.items():
            if k == "kernel":
                kernels.append(np.asarray(v).ravel())
            elif k == "bias":
                biases.append(np.asarray(v).ravel())
            else:
                _collect(v, kernels, biases)


def _stats(vec):
    return {
        "min": float(vec.min()),
        "max": float(vec.max()),
        "mean": float(vec.mean()),
        "std": float(vec.std()),
    }


def param_summary(params: dict) -> dict:
    """Per-top-level-module weight/bias statistics from a flax param tree."""
    out = {}
    for name, sub in params.items():
        kernels, biases = [], []
        _collect(sub if isinstance(sub, dict) else {"kernel": sub}, kernels, biases)
        if not kernels:
            continue
        entry = {"weight": _stats(np.concatenate(kernels))}
        if biases:
            entry["bias"] = _stats(np.concatenate(biases))
        out[name] = entry
    return out


def param_count(params) -> int:
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
