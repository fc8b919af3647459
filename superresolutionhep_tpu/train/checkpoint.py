"""Orbax checkpointing with the reference's retention policy.

Mirrors PyTorch-Lightning ModelCheckpoint as configured in train.py:62-70 /
train_pf.py:54-62: keep the best-3 checkpoints by a monitored metric (min
mode) plus always the last; embed both configs alongside the weights
(save_hyperparameters, lightning.py:34); resume support.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        monitor: str = "val/loss_raw",
        max_to_keep: int = 3,
        mode: str = "min",
        configs: Optional[dict] = None,
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitor = monitor

        def best_fn(metrics):
            return metrics.get(self.monitor, float("inf"))

        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=best_fn,
            best_mode=mode,
            create=True,
        )
        self._best = ocp.CheckpointManager(os.path.join(self.directory, "best"), options=options)
        self._last = ocp.CheckpointManager(
            os.path.join(self.directory, "last"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True),
        )
        self._history: dict = {}
        meta_path = os.path.join(self.directory, "best_meta.json")
        if os.path.exists(meta_path):
            try:
                with open(meta_path) as fp:
                    self._history = {int(k): v for k, v in json.load(fp).get("history", {}).items()}
            except Exception:
                pass
        if configs is not None:
            with open(os.path.join(self.directory, "configs.json"), "w") as fp:
                json.dump(configs, fp, indent=2, default=str)

    def save(self, step: int, state: Any, metrics: dict):
        metrics = {k: float(v) for k, v in metrics.items() if isinstance(v, (int, float))}
        self._best.save(step, args=ocp.args.StandardSave(state), metrics=metrics)
        self._last.save(step, args=ocp.args.StandardSave(state))
        # marker so path-based loading (load_params) can identify the true
        # best step without reconstructing the manager's best_fn
        self._history[step] = metrics.get(self.monitor, float("inf"))
        best_step = min(self._history, key=self._history.get)
        with open(os.path.join(self.directory, "best_meta.json"), "w") as fp:
            json.dump({"monitor": self.monitor, "best_step": best_step, "history": self._history}, fp)

    def wait(self):
        self._best.wait_until_finished()
        self._last.wait_until_finished()

    def best_step(self) -> Optional[int]:
        return self._best.best_step()

    def latest_step(self) -> Optional[int]:
        return self._last.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None, which: str = "last") -> Any:
        mgr = self._last if which == "last" else self._best
        step = step if step is not None else (
            mgr.latest_step() if which == "last" else self._best.best_step()
        )
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        return mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def close(self):
        self._best.close()
        self._last.close()


def load_params(path: str) -> Any:
    """Resolve a checkpoint path flexibly and return the saved state.

    Accepts: a direct Orbax item dir; a CheckpointManager root (picks the
    best step, falling back to the latest); ``<root>/best`` / ``<root>/last``;
    or a flax-serialized ``.msgpack`` params blob (the shipped-checkpoint
    format under saved_checkpoints/).
    """
    p = os.path.abspath(path)

    if p.endswith(".msgpack"):
        from flax.serialization import msgpack_restore

        with open(p, "rb") as f:
            tree = msgpack_restore(f.read())
        return tree if "params" in tree else {"params": tree}

    def _try(d):
        """Restore as plain numpy arrays — immune to device-topology changes
        between save (e.g. 8-device training mesh) and load (1 chip)."""
        try:
            import numpy as np

            ckptr = ocp.PyTreeCheckpointer()
            meta = ckptr.metadata(d)
            tree = getattr(meta, "item_metadata", meta)
            tree = getattr(tree, "tree", tree)
            restore_args = jax.tree_util.tree_map(
                lambda m: ocp.RestoreArgs(restore_type=np.ndarray), tree
            )
            return ckptr.restore(d, args=ocp.args.PyTreeRestore(restore_args=restore_args))
        except Exception:
            return None

    for cand in (p, os.path.join(p, "default")):
        out = _try(cand)
        if out is not None:
            return out

    # manager layouts
    for which in ("best", "last"):
        root = p if os.path.basename(p) == which else os.path.join(p, which)
        if os.path.isdir(root):
            steps = sorted(
                int(d) for d in os.listdir(root) if d.isdigit() and os.path.isdir(os.path.join(root, d))
            )
            if which == "best":
                # prefer the recorded metric-best step over the latest kept one
                meta_path = os.path.join(os.path.dirname(root), "best_meta.json")
                try:
                    with open(meta_path) as fp:
                        bs = int(json.load(fp)["best_step"])
                    if bs in steps:
                        steps = [s for s in steps if s != bs] + [bs]
                except Exception:
                    pass
            for step in reversed(steps):
                for cand in (
                    os.path.join(root, str(step), "default"),
                    os.path.join(root, str(step)),
                ):
                    out = _try(cand)
                    if out is not None:
                        return out
    raise FileNotFoundError(f"no restorable checkpoint found under {path!r}")


def save_single(path: str, state: Any):
    """One-shot checkpoint save (for inference export)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def load_single(path: str, template: Any = None):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=template)
