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


def activation_summary(intermediates: dict) -> dict:
    """Per-module statistics over captured intermediate activations
    (``model.apply(..., capture_intermediates=True)``).

    The reference re-runs its forward with per-layer verbose printing before
    aborting on a non-finite loss (models/flow_model.py:176-262); this is the
    structured equivalent: min/max/mean/std and a non-finite count per
    captured tensor, keyed by the module path.
    """
    out = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{path}/{k}" if path else k)
        elif isinstance(tree, (tuple, list)):
            for i, v in enumerate(tree):
                walk(v, f"{path}[{i}]" if len(tree) > 1 else path)
        else:
            a = np.asarray(tree, np.float32).ravel()
            if a.size == 0:
                return
            finite = np.isfinite(a)
            entry = {"n_nonfinite": int((~finite).sum()), "shape": list(np.shape(tree))}
            if finite.any():
                f = a[finite]
                entry.update(
                    {"min": float(f.min()), "max": float(f.max()),
                     "mean": float(f.mean()), "std": float(f.std())}
                )
            out[path] = entry

    walk(intermediates, "")
    return out
