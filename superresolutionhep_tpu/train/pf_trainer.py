"""Stage-2 (particle-flow) training harness.

Capability mirror of PflowLightning + train_pf.py (pflow/lightning_pf.py:30-355,
train_pf.py:25-111): loss = card_loss_weight * CE(cardinality) + Hungarian-
matched set loss (incidence-KL or kinematics variant per ``loss_on_inc_wts``),
global-norm gradient clipping at 1.0 (the reference's manual-optimization
step, lightning_pf.py:162-180), AdamW + warmup-cosine epoch schedule,
best-3+last checkpoints keyed on ``val_loss_to_optimize_on``, validation
collects matched kinematics residuals in raw space for the epoch plots.

TPU-first: the Hungarian assignment runs on-device (losses/set2set.py), so
the training step is one jitted program with no host sync — removing the
reference's per-step ``.cpu().numpy()`` + scipy round trip
(set_to_set_loss.py:111-116).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import resolve_threshold
from ..data.bucketing import BucketBatcher
from ..data.pf_dataset import PflowEvents, collate_pf
from ..losses.set2set import set_to_set_incidence_loss, set_to_set_kinematics_loss
from ..models.pf.model_pf import SAPF
from ..parallel.mesh import data_sharding, make_mesh, replicate
from ..transforms import build_var_transforms
from .checkpoint import CheckpointManager
from .metrics import MetricsLogger
from .schedule import schedule_from_config


def cross_entropy_int_labels(logits, labels, event_mask=None):
    """Per-event CE averaged over real events only (``event_mask`` True ==
    real).  Bucketed batches pad with all-masked filler events (idx -1,
    cardinality 0); training the head on those would bias it toward zero."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if event_mask is None:
        return ce.mean()
    w = event_mask.astype(ce.dtype)
    return (ce * w).sum() / jnp.maximum(w.sum(), 1.0)


@dataclasses.dataclass
class PFTrainState:
    params: Any
    opt_state: Any
    epoch: int = 0


class PFTrainer:
    def __init__(
        self,
        config_mv: dict,
        config_t: dict,
        run_dir: str = "runs/pf",
        seed: int = 0,
        mesh=None,
        dtype=None,
        use_comet: bool = False,
    ):
        self.config_mv = config_mv
        self.config_t = config_t
        self.run_dir = run_dir
        self.mesh = mesh if mesh is not None else make_mesh()

        pf_cfg = config_mv["pf_model"]
        self.max_part = int(pf_cfg["max_particles"])
        self.transforms = build_var_transforms(config_mv["var_transform"])
        self.model = SAPF(config_pf=pf_cfg, transforms=self.transforms, dtype=dtype)
        self.model_inf = SAPF(
            config_pf=pf_cfg, transforms=self.transforms, inference=True, dtype=dtype
        )
        self.loss_on_inc = bool(config_t.get("loss_on_inc_wts", False))
        self.card_weight = float(config_t.get("card_loss_weight", 1.0))

        rng = jax.random.PRNGKey(seed)
        rng, init_rng = jax.random.split(rng)
        dummy = self._dummy_batch()
        variables = self.model.init(init_rng, dummy)
        from ..models.init_policies import apply_init_policies

        params = apply_init_policies(
            variables["params"], pf_cfg.get("init_weights", {}), jax.random.PRNGKey(seed + 1)
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(float(config_t.get("grad_clip_norm", 1.0))),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(float(config_t.get("weight_decay", 0.01))),
            optax.scale(-1.0),
        )
        self.state = PFTrainState(params=params, opt_state=self.tx.init(params))
        self.rng = rng

        self.lr_fn = schedule_from_config(config_t)
        self.metrics = MetricsLogger(run_dir, use_comet=use_comet)
        self.metrics.snapshot_source({"model_and_var": config_mv, "train": config_t})
        self.ckpt: Optional[CheckpointManager] = None
        self._bsh = data_sharding(self.mesh)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0, 1))
        self._val_step = jax.jit(self._val_step_impl)

    def _dummy_batch(self, B=2, N=16):
        P = self.max_part
        z = lambda *s: jnp.zeros(s, jnp.float32)  # noqa: E731
        return {
            "cell_e": z(B, N), "cell_eta": z(B, N), "cell_phi": z(B, N),
            "cell_cosphi": z(B, N), "cell_sinphi": z(B, N),
            "cell_e_raw": z(B, N), "cell_eta_raw": z(B, N),
            "cell_layer": jnp.zeros((B, N), jnp.int32),
            "cell_mask": jnp.ones((B, N), bool),
            "part_pt": z(B, P), "part_eta": z(B, P), "part_phi": z(B, P),
            "part_dep_e": z(B, P), "part_mask": jnp.ones((B, P), bool),
            "cardinality": jnp.ones((B,), jnp.int32),
            "incidence_matrix": z(B, N, P),
        }

    # ------------------------------------------------------------------
    def compute_loss(self, pred, batch):
        """Mirrors PflowLightning.compute_loss (lightning_pf.py:124-159).

        All batch means are restricted to real events (cell_mask.any(-1)):
        filler slots from the bucket packer would otherwise train the
        cardinality head on zero-context events and dilute the set loss."""
        card_logits, kin_pred, inc_weights = pred
        event_mask = batch["cell_mask"].any(axis=-1)
        loss = 0.0
        logs: Dict[str, Any] = {}
        if card_logits is not None:
            card_loss = self.card_weight * cross_entropy_int_labels(
                card_logits, batch["cardinality"], event_mask
            )
            loss = loss + card_loss
            logs["card_loss"] = card_loss

        assign = None
        if kin_pred is not None:
            if self.loss_on_inc:
                set_loss, comps, assign = set_to_set_incidence_loss(
                    inc_weights, batch, kin_pred, event_mask
                )
                logs["inc_loss"] = set_loss
            else:
                set_loss, comps, assign = set_to_set_kinematics_loss(
                    kin_pred, batch, self.config_t, event_mask
                )
                logs["kin_loss"] = set_loss
            loss = loss + set_loss
            logs.update(comps)
        logs["loss"] = loss
        return loss, logs, assign

    def _loss_for_grad(self, params, batch, rng):
        pred = self.model.apply({"params": params}, batch, rng=rng)
        loss, logs, _ = self.compute_loss(pred, batch)
        return loss, logs

    def _train_step_impl(self, params, opt_state, batch, rng, lr):
        (loss, logs), grads = jax.value_and_grad(self._loss_for_grad, has_aux=True)(
            params, batch, rng
        )
        updates, opt_state = self.tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        logs["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, logs

    def _val_step_impl(self, params, batch, rng):
        pred = self.model.apply({"params": params}, batch, rng=rng)
        loss, logs, assign = self.compute_loss(pred, batch)
        card_logits, kin_pred, _ = pred
        out = {f"val/{k}": v for k, v in logs.items()}
        out["val_loss_to_optimize_on"] = loss
        extras = {}
        if card_logits is not None:
            extras["card_pred"] = jnp.argmax(card_logits, axis=-1)
            extras["card_truth"] = batch["cardinality"]
        if kin_pred is not None and assign is not None:
            B = kin_pred.shape[0]
            extras["kin_pred_matched"] = kin_pred[jnp.arange(B)[:, None], assign, :]
        return out, extras

    # ------------------------------------------------------------------
    def _dataset(self, split: str) -> PflowEvents:
        ct = self.config_t
        return PflowEvents(
            ct[f"{split}_glob_arg"],
            config_mv=self.config_mv,
            energy_threshold=float(ct.get("energy_threshold", 0.0)),
            reduce_ds=int(ct.get(f"reduce_ds_{split}", -1)),
            res=ct.get("resolution", "low"),
            drop_single_part_events=bool(ct.get("drop_single_part_events", False)),
            load_incidence=self.loss_on_inc,
        )

    def _batcher(self, ds: PflowEvents, split: str, seed: int) -> BucketBatcher:
        ct = self.config_t
        budget = None
        if ct.get("use_sampler", False):
            budget = resolve_threshold(ct.get(f"n_sq_sum_threshold_{split}"))
        return BucketBatcher(
            ds.cell_count,
            quantum=int(ct.get("bucket_quantum", 128)),
            cost_budget=budget,
            max_batch_size=int(ct.get(f"batch_size_{split}", 32)),
            shuffle=(split == "train"),
            seed=seed,
            batch_multiple_of=len(self.mesh.devices.flat),
        )

    def _device_batch(self, hb):
        return {
            k: jax.device_put(v, self._bsh)
            for k, v in hb.items()
            if isinstance(v, np.ndarray) and k != "idx"
        }

    # ------------------------------------------------------------------
    def fit(self, train_ds=None, val_ds=None, num_epochs=None, resume: bool = False):
        ct = self.config_t
        train_ds = train_ds or self._dataset("train")
        val_ds = val_ds if val_ds is not None else (
            self._dataset("val") if ct.get("val_glob_arg") else None
        )
        self.ckpt = CheckpointManager(
            os.path.join(self.run_dir, "checkpoints"),
            monitor="val_loss_to_optimize_on",
            configs={"config_mv": self.config_mv, "config_t": self.config_t},
        )
        if resume:
            try:
                restored = self.ckpt.restore(
                    {"params": self.state.params, "opt_state": self.state.opt_state}, which="last"
                )
                # re-place on the mesh (committed single-device arrays from
                # orbax restore conflict with the data-sharded batch in jit)
                rep = replicate(self.mesh)
                self.state.params = jax.device_put(restored["params"], rep)
                self.state.opt_state = jax.device_put(restored["opt_state"], rep)
                self.state.epoch = (self.ckpt.latest_step() or 0) + 1
            except FileNotFoundError:
                pass

        num_epochs = num_epochs or int(ct["num_epochs"])
        eval_every = int(ct.get("eval_every_n_epoch", 1))
        cache: Dict[int, dict] = {}

        num_workers = int(ct.get("num_workers", 2))
        cache_events = bool(ct.get("cache_events", True))

        def prepare(item):
            idxs, bucket = item
            if cache_events:
                events = [
                    (cache.setdefault(i, train_ds.get_event(i)) if i >= 0 else None) for i in idxs
                ]
            else:
                events = [train_ds.get_event(i) if i >= 0 else None for i in idxs]
            return collate_pf(events, bucket.pad_n, self.max_part)

        from ..data.prefetch import BatchPrefetcher

        # --profile: trace exactly one epoch (SURVEY §5 profiling hook)
        profile_epoch = self.state.epoch if ct.get("profile") else None

        for epoch in range(self.state.epoch, num_epochs):
            lr = jnp.asarray(self.lr_fn(epoch), jnp.float32)
            t0 = time.time()
            sums, n_b = {}, 0
            if epoch == profile_epoch:
                try:
                    self.metrics.start_profile()
                except Exception:
                    self.metrics.log_scalars({"profile_unavailable": 1.0}, step=epoch)
                    profile_epoch = None
            for hb in BatchPrefetcher(
                self._batcher(train_ds, "train", seed=epoch), prepare, num_workers=num_workers
            ):
                batch = self._device_batch(hb)
                self.rng, srng = jax.random.split(self.rng)
                self.state.params, self.state.opt_state, logs = self._train_step(
                    self.state.params, self.state.opt_state, batch, srng, lr
                )
                n_b += 1
                for k, v in logs.items():
                    sums[k] = sums.get(k, 0.0) + v
            ep = {f"train/{k}": float(v) / max(n_b, 1) for k, v in sums.items()}
            ep["lr"] = float(lr)
            ep["train/epoch_s"] = time.time() - t0
            if epoch == profile_epoch:
                try:
                    self.metrics.stop_profile()
                except Exception:
                    pass

            if val_ds is not None and (epoch % eval_every == 0 or epoch == num_epochs - 1):
                ep.update(self.evaluate(val_ds, make_plots=bool(ct.get("epoch_end_plots", True))))

            self.metrics.log_scalars(ep, step=epoch)
            self.ckpt.save(
                epoch, {"params": self.state.params, "opt_state": self.state.opt_state}, ep
            )
            self.state.epoch = epoch + 1

        self.ckpt.wait()
        return self.state

    # ------------------------------------------------------------------
    def evaluate(self, val_ds: PflowEvents, make_plots: bool = False) -> Dict[str, float]:
        sums, n_b = {}, 0
        card_t, card_p = [], []
        kin_res: Dict[str, list] = {k: [] for k in ["pt", "eta", "phi", "e"]}
        for idxs, bucket in self._batcher(val_ds, "val", seed=0):
            events = [val_ds.get_event(i) if i >= 0 else None for i in idxs]
            hb = collate_pf(events, bucket.pad_n, self.max_part)
            batch = self._device_batch(hb)
            self.rng, vrng = jax.random.split(self.rng)
            out, extras = self._val_step(self.state.params, batch, vrng)
            real = idxs >= 0
            n_b += 1
            for k, v in out.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            if "card_pred" in extras:
                card_t.append(np.asarray(extras["card_truth"])[real])
                card_p.append(np.asarray(extras["card_pred"])[real])
            if make_plots and "kin_pred_matched" in extras:
                # matched raw-space residuals (lightning_pf.py:200-220)
                km = np.asarray(extras["kin_pred_matched"])
                pm = hb["part_mask"] & real[:, None]
                tr = self.transforms
                kin_res["pt"].append(
                    hb["part_pt_raw"][pm] - np.asarray(tr["pt"].inverse(km[..., 0]))[pm]
                )
                kin_res["eta"].append(
                    hb["part_eta_raw"][pm] - np.asarray(tr["eta"].inverse(km[..., 1]))[pm]
                )
                dphi = hb["part_phi"][pm] - km[..., 2][pm]
                kin_res["phi"].append((dphi + np.pi) % (2 * np.pi) - np.pi)
                # reference plots the residual against the *full* particle
                # energy (lightning_pf.py truth_e_raw == part_e_raw), even
                # though the training target is dep_e
                kin_res["e"].append(
                    hb["part_e_raw"][pm] - np.asarray(tr["e"].inverse(km[..., 3]))[pm]
                )
        res = {k: v / max(n_b, 1) for k, v in sums.items()}
        if card_t:
            t = np.concatenate(card_t)
            p = np.concatenate(card_p)
            res["val/card_accuracy"] = float((t == p).mean())
            if make_plots:
                self._plot_cardinality_confusion(t, p)
        if make_plots and any(len(v) for v in kin_res.values()):
            self._plot_kinematics_residuals({k: np.hstack(v) for k, v in kin_res.items() if v})
        return res

    def _plot_cardinality_confusion(self, truth, pred):
        """Confusion-matrix heatmap (lightning_pf.py:283-298)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = self.max_part + 1
        cm = np.zeros((n, n), int)
        for t, p in zip(truth, pred):
            cm[min(int(p), n - 1), min(int(t), n - 1)] += 1
        fig, ax = plt.subplots(figsize=(6, 5), dpi=100)
        im = ax.imshow(cm, cmap="Blues")
        for i in range(n):
            for j in range(n):
                ax.text(j, i, str(cm[i, j]), ha="center", va="center", fontsize=8)
        ax.set_xlabel("truth cardinality")
        ax.set_ylabel("pred cardinality")
        fig.colorbar(im, ax=ax)
        self.metrics.log_figure(fig, "cardinality")
        plt.close(fig)

    def _plot_kinematics_residuals(self, res: Dict[str, np.ndarray]):
        """Residual histograms with mu/sigma/median/IQR labels
        (lightning_pf.py:301-337)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, len(res), figsize=(4 * len(res), 3.5), dpi=100)
        for ax, (name, r) in zip(np.atleast_1d(axes), res.items()):
            if r.size == 0:
                continue
            lo, hi = np.percentile(r, [3, 97])
            bins = np.linspace(lo, hi if hi > lo else lo + 1, 60)
            ax.hist(r, bins=bins, histtype="stepfilled", color="cornflowerblue", ec="k", lw=0.5)
            iqr = np.subtract(*np.percentile(r, [75, 25]))
            ax.set_title(
                rf"$\mu$={r.mean():.2f}, $\sigma$={r.std():.2f}"
                f"\nmed={np.median(r):.2f}, IQR={iqr:.2f}",
                fontsize=9,
            )
            ax.set_xlabel(f"{name} (truth - pred)")
        fig.tight_layout()
        self.metrics.log_figure(fig, "kinematics")
        plt.close(fig)
