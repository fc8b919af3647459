"""Stage-1 (super-resolution) training harness.

Capability mirror of SupResLightning + train.py (lightning.py:29-286,
train.py:26-119): AdamW with warmup-cosine epoch schedule, masked
flow-matching loss with the reference's per-step stats, full generative
validation with NN-space and raw-energy MSE, best-3+last checkpointing keyed
on ``val/loss_raw``, resume, debug mode, metrics sink.

TPU-first design: one jitted train step per bucket shape (static shapes, no
recompiles within an epoch), batch sharded over the ``data`` mesh axis with
replicated params (XLA inserts the grad psum — the reference's latent DDP
made real), donated arguments so params/opt state update in place in HBM.
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
from ..data.sr_dataset import SupResEvents, collate
from ..flow.cfm import flow_matching_loss, sample_location_and_conditional_flow
from ..flow.sampling import generate_samples
from ..models.flow_model import FlowModel
from ..models.init_policies import apply_init_policies
from ..parallel.mesh import data_sharding, make_mesh, replicate
from ..transforms import TargetTransform
from .checkpoint import CheckpointManager
from .metrics import MetricsLogger
from .schedule import schedule_from_config


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    epoch: int = 0


def _dummy_batch(pad_n: int = 8, B: int = 2):
    return {
        "eta": jnp.zeros((B, pad_n, 1), jnp.float32),
        "cosphi": jnp.zeros((B, pad_n, 1), jnp.float32),
        "sinphi": jnp.zeros((B, pad_n, 1), jnp.float32),
        "layer": jnp.zeros((B, pad_n, 1), jnp.int32),
        "e_proxy": jnp.zeros((B, pad_n, 1), jnp.float32),
        "q_mask": jnp.ones((B, pad_n), bool),
        "target": jnp.zeros((B, pad_n, 1), jnp.float32),
    }


class SRTrainer:
    def __init__(
        self,
        config_mv: dict,
        config_t: dict,
        run_dir: str = "runs/sr",
        seed: int = 0,
        mesh=None,
        dtype=None,
        use_comet: bool = False,
    ):
        self.config_mv = config_mv
        self.config_t = config_t
        self.run_dir = run_dir
        self.mesh = mesh if mesh is not None else make_mesh()
        self.dtype = dtype

        fm_cfg = config_mv["flow_model"]
        self.model = FlowModel(
            config=fm_cfg, dtype=dtype, remat=bool(config_t.get("remat", False)),
            # training opt-in for the fused DiT layer kernels (inference
            # default): differentiable via ref-recompute VJP, grad-parity
            # tested (tests/test_fused_{qkv,mlp}.py); composes with
            # `packed: true` (per-cell modulation rows)
            fused_prologue=bool(config_t.get("fused_prologue", False)),
        )
        self.sigma_min = float(fm_cfg["sigma_min"])
        self.n_steps = int(fm_cfg["n_steps"])
        self.target_transform = TargetTransform.from_config(config_mv["target_transform"])

        rng = jax.random.PRNGKey(seed)
        rng, init_rng, pol_rng = jax.random.split(rng, 3)
        db = _dummy_batch()
        variables = self.model.init(init_rng, db, db["target"], jnp.zeros((2,)))
        params = apply_init_policies(variables["params"], fm_cfg.get("init_weights", {}), pol_rng)

        self.tx = self._make_optimizer()
        opt_state = self.tx.init(params)
        self.state = TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))
        self.rng = rng

        self.lr_fn = schedule_from_config(config_t)
        self.metrics = MetricsLogger(run_dir, use_comet=use_comet)
        self.metrics.snapshot_source({"model_and_var": config_mv, "train": config_t})
        self.ckpt: Optional[CheckpointManager] = None

        self._bsh = data_sharding(self.mesh)
        self._rep = replicate(self.mesh)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0, 1))
        self._val_step = jax.jit(self._val_step_impl, static_argnames=("n_steps", "method"))

    # ------------------------------------------------------------------
    def _make_optimizer(self):
        # torch AdamW defaults (lightning.py:170): betas (0.9,0.999), eps 1e-8,
        # weight_decay 0.01; optional global-norm clip (PF uses 1.0)
        chain = []
        clip = self.config_t.get("grad_clip_norm")
        if clip:
            chain.append(optax.clip_by_global_norm(float(clip)))
        chain += [
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(float(self.config_t.get("weight_decay", 0.01))),
            optax.scale(-1.0),
        ]
        tx = optax.chain(*chain)
        # gradient accumulation (the reference's latent effective_batch_size
        # knob, configs/single_e/train.yml): one optimizer step per N batches
        accum = int(self.config_t.get("grad_accum_steps", 0) or 0)
        if accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        return tx

    # ------------------------------------------------------------------
    def _loss_fn(self, params, batch, rng):
        target = batch["target"]
        t, xt, ut = sample_location_and_conditional_flow(rng, target, self.sigma_min)
        vt = self.model.apply({"params": params}, batch, xt, t, deterministic=True)
        return flow_matching_loss(vt, ut, batch["q_mask"])

    def _train_step_impl(self, params, opt_state, batch, rng, lr):
        (loss, stats), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(params, batch, rng)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        # finite-loss guard: the reference aborts the run on non-finite loss
        # (models/flow_model.py:283-285); we surface a flag instead of a sync
        stats["nonfinite"] = jnp.logical_not(jnp.isfinite(loss)).astype(jnp.float32)
        stats["loss"] = loss
        stats["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, stats

    def _val_step_impl(self, params, batch, rng, n_steps: int, method: str):
        pred = generate_samples(
            lambda v, b, x, t: self.model.apply(v, b, x, t),
            {"params": params},
            batch,
            rng,
            n_steps=n_steps,
            method=method,
            ret_seq=False,
        )
        m = batch["q_mask"][..., None].astype(jnp.float32)
        n_valid = jnp.maximum(m.sum(), 1.0)
        se_nn = ((pred - batch["target"]) ** 2 * m).sum()

        e_pred_raw = self.target_transform.inverse(pred, batch["e_proxy_raw"])
        se_raw = ((e_pred_raw - batch["e_truth_raw"]) ** 2 * m).sum()
        return {
            "se_nn": se_nn,
            "se_raw": se_raw,
            "n_valid": n_valid,
            "pred": pred,
            "e_pred_raw": e_pred_raw,
        }

    # ------------------------------------------------------------------
    def _batcher(self, ds: SupResEvents, split: str, seed: int) -> BucketBatcher:
        ct = self.config_t
        budget = None
        if ct.get("use_sampler", False):
            budget = resolve_threshold(ct.get(f"n_sq_sum_threshold_{split}"))
        return BucketBatcher(
            ds.cell_count_high,
            quantum=int(ct.get("bucket_quantum", 128)),
            cost_budget=budget,
            max_batch_size=int(ct.get(f"batch_size_{split}", 32)),
            shuffle=(split == "train"),
            seed=seed,
            batch_multiple_of=len(self.mesh.devices.flat),
        )

    def _device_batch(self, host_batch: Dict[str, np.ndarray]):
        out = {}
        for k, v in host_batch.items():
            if isinstance(v, np.ndarray) and k not in ("idx",):
                out[k] = jax.device_put(v, self._bsh)
        return out

    # ------------------------------------------------------------------
    def fit(
        self,
        train_ds: Optional[SupResEvents] = None,
        val_ds: Optional[SupResEvents] = None,
        num_epochs: Optional[int] = None,
        resume: bool = False,
    ):
        ct = self.config_t
        if train_ds is None:
            train_ds = SupResEvents(
                ct["train_path"],
                self.config_mv,
                reduce_ds=ct.get("reduce_ds_train", -1),
                one_event_train=ct.get("one_event_train", False),
                one_event_idx=ct.get("one_event_idx", 0),
            )
        if val_ds is None and ct.get("val_path"):
            val_ds = SupResEvents(
                ct["val_path"],
                self.config_mv,
                make_low=True,
                reduce_ds=ct.get("reduce_ds_val", -1),
                one_event_train=ct.get("one_event_train", False),
                one_event_idx=ct.get("one_event_idx", 0),
            )

        self.ckpt = CheckpointManager(
            os.path.join(self.run_dir, "checkpoints"),
            monitor="val/loss_raw",
            configs={"config_mv": self.config_mv, "config_t": self.config_t},
        )
        if resume:
            try:
                restored = self.ckpt.restore(
                    {"params": self.state.params, "opt_state": self.state.opt_state}, which="last"
                )
                # re-place on the mesh: restored arrays are committed to a
                # single device, which jit rejects against the data-sharded
                # batch (fresh-init params are uncommitted and auto-replicate)
                self.state.params = jax.device_put(restored["params"], self._rep)
                self.state.opt_state = jax.device_put(restored["opt_state"], self._rep)
                self.state.epoch = (self.ckpt.latest_step() or 0) + 1
            except FileNotFoundError:
                pass

        num_epochs = num_epochs or int(ct["num_epochs"])
        eval_every = int(ct.get("eval_every_n_epoch", 1))
        train_cache: Dict[int, Any] = {}

        num_workers = int(ct.get("num_workers", 2))
        # preprocessed-event cache trades host RAM for per-epoch CPU; disable
        # for datasets that don't fit (e.g. the 250k-event multipart set)
        cache_events = bool(ct.get("cache_events", True))

        def prepare(item):
            """Host-side batch prep — runs in the prefetch thread pool
            (the reference's DataLoader workers, lightning.py:71-75)."""
            idxs, bucket = item
            if cache_events:
                events = [
                    (train_cache.setdefault(i, train_ds.get_event(i)) if i >= 0 else None)
                    for i in idxs
                ]
            else:
                events = [train_ds.get_event(i) if i >= 0 else None for i in idxs]
            return collate(events, bucket.pad_n)

        # packed training (`packed: true`): events packed into rows of one
        # static length — ONE compiled train step for any event-length mix,
        # padding only to the 128-cell alignment, banded attention with the
        # differentiable kernel (ops/flash_packed.py custom VJP).  The layout
        # is packed once (first-fit decreasing is deterministic); per-epoch
        # shuffling permutes the batch order.  Validation stays bucketed
        # (the generative val path is sampler-driven and cheap).
        packed = bool(ct.get("packed", False))
        pack_layouts = None
        if packed:
            from ..data.packing import aligned_len, collate_packed, pack_events
            from ..ops.flash_packed import set_packed_defaults

            pack_s = int(ct.get("pack_s", 5120))
            pack_rows = int(ct.get("pack_rows", 8))
            ndev = len(self.mesh.devices.flat)
            if pack_rows % ndev:
                raise ValueError(
                    f"pack_rows={pack_rows} must be a multiple of the mesh size {ndev}"
                )
            counts = np.asarray(train_ds.cell_count_high)
            n_over = int(sum(aligned_len(int(c)) > pack_s for c in counts))
            if n_over:
                raise ValueError(
                    f"{n_over} events exceed pack_s={pack_s} after 128-cell "
                    "alignment; raise pack_s (training has no bucketed mop-up)"
                )
            set_packed_defaults(max_segment_len=aligned_len(int(counts.max())))
            pack_layouts = pack_events(counts, S=pack_s, rows_per_batch=pack_rows)

            class _EvCache:
                def __getitem__(self, i):
                    if cache_events:
                        return train_cache.setdefault(i, train_ds.get_event(i))
                    return train_ds.get_event(i)

            def prepare_packed(lay):
                return collate_packed(_EvCache(), lay, S=pack_s)

        from ..data.prefetch import BatchPrefetcher

        # --profile: trace exactly one epoch (SURVEY §5 profiling hook)
        profile_epoch = self.state.epoch if ct.get("profile") else None

        for epoch in range(self.state.epoch, num_epochs):
            lr = jnp.asarray(self.lr_fn(epoch), jnp.float32)
            t_ep = time.time()
            ep_stats, n_batches = {}, 0
            last_hb, last_rng = None, None
            if epoch == profile_epoch:
                try:
                    self.metrics.start_profile()
                except Exception as e:  # backend without trace support
                    self.metrics.log_scalars({"profile_unavailable": 1.0}, step=epoch)
                    profile_epoch = None
            if packed:
                order = np.random.default_rng(epoch).permutation(len(pack_layouts))
                batches = BatchPrefetcher(
                    [pack_layouts[i] for i in order], prepare_packed, num_workers=num_workers
                )
            else:
                batches = BatchPrefetcher(
                    self._batcher(train_ds, "train", seed=epoch), prepare, num_workers=num_workers
                )
            for hb in batches:
                batch = self._device_batch(hb)
                self.rng, step_rng = jax.random.split(self.rng)
                self.state.params, self.state.opt_state, stats = self._train_step(
                    self.state.params, self.state.opt_state, batch, step_rng, lr
                )
                n_batches += 1
                last_hb, last_rng = hb, step_rng
                for k, v in stats.items():
                    ep_stats[k] = ep_stats.get(k, 0.0) + v

            ep_stats = {f"train/{k}": float(v) / max(n_batches, 1) for k, v in ep_stats.items()}
            ep_stats["lr"] = float(lr)
            ep_stats["train/epoch_s"] = time.time() - t_ep
            if epoch == profile_epoch:
                try:
                    self.metrics.stop_profile()
                except Exception:
                    pass

            if ep_stats.get("train/nonfinite", 0) > 0:
                # mirror of the reference's non-finite abort: re-run the
                # forward verbosely (per-layer stats) before stopping
                # (models/flow_model.py:176-262,283-285)
                diag = self._dump_nonfinite_diagnostics(last_hb, last_rng, epoch)
                self.metrics.log_scalars({"fatal_nonfinite_loss": 1.0}, step=epoch)
                raise FloatingPointError(
                    f"non-finite training loss at epoch {epoch}; diagnostics at {diag}"
                )

            if val_ds is not None and (epoch % eval_every == 0 or epoch == num_epochs - 1):
                make_plots = int(ct.get("n_event_displays", 0)) > 0
                ep_stats.update(self.evaluate(val_ds, make_plots=make_plots, epoch=epoch))

            self.metrics.log_scalars(ep_stats, step=epoch)
            if self.ckpt is not None:
                self.ckpt.save(
                    epoch,
                    {"params": self.state.params, "opt_state": self.state.opt_state},
                    ep_stats,
                )
            self.state.epoch = epoch + 1

        if self.ckpt is not None:
            self.ckpt.wait()
        return self.state

    # ------------------------------------------------------------------
    def _dump_nonfinite_diagnostics(self, host_batch, rng, epoch: int) -> str:
        """Per-layer forensic dump on the non-finite-loss trip — the
        structured equivalent of the reference's verbose re-forward
        (models/flow_model.py:176-262).  Non-finite params persist once
        produced, so re-running the *last* batch of the epoch with
        intermediate capture localises the first offending module even if an
        earlier batch tripped the flag."""
        import json

        from ..models.summary import activation_summary, param_summary

        report = {"epoch": epoch, "params": param_summary(self.state.params)}
        try:
            batch = self._device_batch(host_batch)
            t, xt, ut = sample_location_and_conditional_flow(
                rng, batch["target"], self.sigma_min
            )
            _, state = self.model.apply(
                {"params": self.state.params}, batch, xt, t,
                capture_intermediates=True,
            )
            report["activations"] = activation_summary(
                jax.tree_util.tree_map(np.asarray, dict(state["intermediates"]))
            )
        except Exception as e:  # diagnostics must never mask the abort
            report["activation_capture_error"] = str(e)[:500]
        path = os.path.join(self.run_dir, "nonfinite_diagnostics.json")
        with open(path, "w") as fp:
            json.dump(report, fp, indent=2, default=str)
        return path

    # ------------------------------------------------------------------
    def evaluate(
        self, val_ds: SupResEvents, n_steps: Optional[int] = None, make_plots: bool = False, epoch: int = 0
    ) -> Dict[str, float]:
        """Full generative validation. With ``make_plots``, mirrors the
        reference's epoch-end visuals (lightning.py:251-267): event displays
        for the first batch plus residual summary plots via the live
        accumulator."""
        method = self.config_t.get("val_ode_method", "dopri5")
        n_steps = n_steps or self.n_steps
        n_displays = int(self.config_t.get("n_event_displays", 0)) if make_plots else 0
        perf_live = None
        if make_plots:
            from ..analysis.live import PerformanceCOCOALive

            perf_live = PerformanceCOCOALive(int(self.config_mv.get("res_factor", 2)))

        tot_nn = tot_raw = tot_n = 0.0
        first_batch = True
        for idxs, bucket in self._batcher(val_ds, "val", seed=0):
            events = [val_ds.get_event(i) if i >= 0 else None for i in idxs]
            hb = collate(events, bucket.pad_n, with_low=make_plots)
            batch = self._device_batch(hb)
            self.rng, vrng = jax.random.split(self.rng)
            out = self._val_step(self.state.params, batch, vrng, n_steps=n_steps, method=method)
            tot_nn += float(out["se_nn"])
            tot_raw += float(out["se_raw"])
            tot_n += float(out["n_valid"])

            if perf_live is not None:
                e_pred_raw = np.asarray(out["e_pred_raw"])
                perf_live.update(hb, e_pred_raw)
                if first_batch and n_displays > 0:
                    from ..analysis.live import event_display_figure

                    pred = np.asarray(out["pred"])
                    for p_i, ev in enumerate(events[:n_displays]):
                        if ev is None:
                            continue
                        m = hb["q_mask"][p_i]
                        pl_dict = {
                            "eta_raw": hb["eta_raw"][p_i, m, 0],
                            "phi": hb["phi"][p_i, m, 0],
                            "layer": hb["layer"][p_i, m, 0],
                            "target": hb["target"][p_i, m, 0],
                            "e_truth_raw": hb["e_truth_raw"][p_i, m, 0] * 1e3,
                            "pred": pred[p_i, m, 0],
                            "e_pred_raw": e_pred_raw[p_i, m, 0] * 1e3,
                        }
                        fig = event_display_figure(pl_dict)
                        self.metrics.log_figure(fig, f"ED_{p_i}")
                        import matplotlib.pyplot as plt

                        plt.close(fig)
                first_batch = False

        extra = {}
        if perf_live is not None and perf_live.n_events:
            import matplotlib.pyplot as plt

            fig, summ = perf_live.plot_residual_event()
            self.metrics.log_figure(fig, "residual_event_energy")
            plt.close(fig)
            extra.update(summ)
            fig = perf_live.plot_residual_cell()
            self.metrics.log_figure(fig, "residual_cell_energy")
            plt.close(fig)

        n = max(tot_n, 1.0)
        # node-count-weighted epoch means (lightning.py:240-249)
        return {"val/loss": tot_nn / n, "val/loss_raw": tot_raw / n, **extra}
