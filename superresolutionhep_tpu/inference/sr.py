"""Stage-1 inference driver: ensemble ODE sampling -> three-tree event files.

Capability mirror of inference.py:39-393:
  * loads the saved YAML pair + checkpoint (:74-83);
  * precomputes which of the n_steps uniform ODE timesteps to store (:54-69);
  * per batch, runs the sampler n_ensemble times and averages — here as one
    vmapped, jitted program instead of a sequential python loop (:145-152);
  * writes ``Low_Tree``/``High_Tree``/``Particle_Tree`` with the exact branch
    schema (:96-130, :291-310): per-event raw predictions via the inverse
    target transform at the final and stored timesteps, both avg-then-unscale
    (``e_pred_avg_raw``) and unscale-then-avg (``e_pred_raw``) variants,
    optional ensemble components, optional per-particle energy incidence;
  * entry-range batch mode with ``_{start}_{stop}`` output suffix (:341-367)
    — the unit of multi-host fan-out.

Energies are written in MeV (x1e3) like the reference (:190-201).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_yaml
from ..data import root_io
from ..data.bucketing import BucketBatcher
from ..data.jagged import JaggedArray
from ..data.sr_dataset import SupResEvents, collate
from ..flow.sampling import generate_ensemble
from ..models.flow_model import FlowModel
from ..train.checkpoint import load_params
from ..transforms import TargetTransform


class SRInference:
    def __init__(self, inf_cfg: dict, params=None):
        self.inf_cfg = inf_cfg
        self.config_mv = load_yaml(inf_cfg["model"]["config_path_mv"])
        self.config_t = load_yaml(inf_cfg["model"]["config_path_t"])
        # opt-in bf16 compute (`model.dtype: bfloat16` in the inference YAML):
        # the TPU production configuration — dense stack on the MXU at bf16,
        # geometry embedder kept fp32 (models/precision.py).  Default stays
        # fp32 (the torch-parity configuration).
        dtype_name = str(inf_cfg["model"].get("dtype", "") or "")
        self.dtype = jnp.bfloat16 if dtype_name in ("bfloat16", "bf16") else None
        self.model = FlowModel(config=self.config_mv["flow_model"], dtype=self.dtype)
        # opt-in inference fast path: clipped no-max softmax kernel (~15-30%
        # faster attention); validated against the robust kernel on the first
        # batch of every run (nomax_selfcheck) before it is trusted
        self.fast_softmax = bool(inf_cfg["model"].get("fast_softmax", False))
        # the fast model also fuses the DiT attention prologue (norm1 + adaLN
        # + QKV in one Pallas pass, ops/fused_qkv.py); the robust model stays
        # fully unfused, so the first-batch selfcheck validates the fused
        # kernel together with the no-max softmax against the reference path
        self.model_fast = (
            FlowModel(
                config=self.config_mv["flow_model"],
                dtype=self.dtype,
                attn_impl="flash_nomax",
                fused_prologue=bool(inf_cfg["model"].get("fused_prologue", True)),
            )
            if self.fast_softmax
            else None
        )
        self._nomax_validated = False
        self.target_transform = TargetTransform.from_config(self.config_mv["target_transform"])

        if params is None:
            ckpt = load_params(inf_cfg["model"]["checkpoint_path"])
            params = ckpt["params"] if isinstance(ckpt, dict) and "params" in ckpt else ckpt
        if self.dtype is not None:
            from ..models.precision import cast_params_for_inference

            params = cast_params_for_inference(params, self.dtype)
        self.params = params

        n_steps = int(inf_cfg["model"]["n_steps"])
        self.n_steps = n_steps
        ts_used = np.linspace(0, 1, n_steps)
        n_store = int(inf_cfg["model"].get("n_steps_to_store", 0))
        self.ts_to_store: List[float] = []
        self.ts_to_store_idx: List[int] = []
        if n_store:
            for t in np.linspace(0, 1, n_store + 1)[:-1]:
                idx = int(np.argmin(np.abs(ts_used - t)))
                self.ts_to_store.append(float(ts_used[idx]))
                self.ts_to_store_idx.append(idx)

        # selective trajectory capture: only the stored intermediate steps +
        # the final state live in HBM (O(S) not O(n_steps) trajectory memory)
        self.store_set = sorted(set(self.ts_to_store_idx) | {n_steps - 1})
        self.store_pos = {idx: i for i, idx in enumerate(self.store_set)}
        self._jitted = jax.jit(
            self._gen, static_argnames=("n_ensemble", "n_steps", "method", "fast")
        )

    # ------------------------------------------------------------------
    def _validate_nomax(self, batch) -> bool:
        """First-batch gate for the no-max kernel: one model eval at t=0.5
        through both attention variants must agree (exact iff the trained
        logits respect the clip bounds — proven, not assumed)."""
        from ..ops.flash_attention import nomax_selfcheck

        x = jnp.zeros_like(batch["e_proxy"])
        t = jnp.full((batch["eta"].shape[0],), 0.5, jnp.float32)
        robust = jax.jit(lambda b: self.model.apply({"params": self.params}, b, x, t))
        fast = jax.jit(lambda b: self.model_fast.apply({"params": self.params}, b, x, t))
        ok = nomax_selfcheck(robust, fast, batch)
        if not ok:
            import warnings

            warnings.warn(
                "fast_softmax: no-max kernel failed the first-batch selfcheck "
                "(attention logits outside the clip bounds for this checkpoint); "
                "falling back to the robust online-softmax kernel",
                stacklevel=2,
            )
        return ok

    # ------------------------------------------------------------------
    def _gen(self, batch, key, n_ensemble: int, n_steps: int, method: str, fast: bool = False):
        model = self.model_fast if fast else self.model
        apply_fn = lambda v, b, x, t: model.apply(v, b, x, t)  # noqa: E731
        from ..flow.ode import FIXED_STEP_METHODS, MULTISTEP_METHODS

        store = (
            self.store_set
            if (method in FIXED_STEP_METHODS or method in MULTISTEP_METHODS)
            else None
        )
        out = generate_ensemble(
            apply_fn,
            {"params": self.params},
            batch,
            key,
            n_ensemble=n_ensemble,
            n_steps=n_steps,
            method=method,
            ret_seq=True,
            store_indices=store,
        )
        if store is None:  # full trajectory: slice down to the stored states
            out = out[:, jnp.asarray(self.store_set)]
        return out

    # ------------------------------------------------------------------
    def run_pred(self, inf_dict: dict) -> str:
        ds = SupResEvents(
            inf_dict["truth_path"],
            self.config_mv,
            make_low=True,
            make_particles=True,
            entry_start=int(inf_dict.get("entry_start", 0)),
            reduce_ds=int(inf_dict["n_events"]) if inf_dict.get("n_events") else -1,
            one_event_train=self.config_t.get("one_event_train", False),
            one_event_idx=self.config_t.get("one_event_idx", 0),
        )
        n_ensemble = int(inf_dict.get("n_ensemble", 1))
        method = inf_dict.get("ode_method", self.config_t.get("val_ode_method", "dopri5"))
        store_comp = bool(inf_dict.get("save_ensemble_components", False) or inf_dict.get("store_ensemble_components", False))
        store_inc = bool(inf_dict.get("store_energy_incidence", False))
        max_particles = int(inf_dict.get("max_particles", 0))

        low_z: Dict[str, list] = {k: [] for k in ["eta_raw", "phi", "layer", "e_meas_raw"]}
        high_z: Dict[str, list] = {
            k: []
            for k in [
                "eta_raw", "phi", "layer", "e_proxy", "e_truth_raw", "e_proxy_raw",
                "e_pred_raw", "e_pred_avg_raw", "raw_nn_cond", "raw_nn_target", "raw_nn_pred",
            ]
        }
        for t in self.ts_to_store:
            for stem in ("e_pred_raw", "e_pred_avg_raw", "raw_nn_pred"):
                high_z[f"{stem}_{t:.2f}"] = []
        if n_ensemble > 1 and store_comp:
            for ci in range(n_ensemble):
                high_z[f"e_pred_raw_comp_{ci}"] = []
                high_z[f"raw_nn_pred_comp_{ci}"] = []
                for t in self.ts_to_store:
                    high_z[f"e_pred_raw_{t:.2f}_comp_{ci}"] = []
                    high_z[f"raw_nn_pred_{t:.2f}_comp_{ci}"] = []
        part_z: Dict[str, list] = {
            k: [] for k in ["particle_pt", "particle_eta", "particle_phi", "particle_e", "particle_pdgid", "particle_dep_e"]
        }
        if store_inc:
            for pi in range(max_particles):
                low_z[f"e_part_{pi}"] = []
                high_z[f"e_part_{pi}"] = []

        key = jax.random.PRNGKey(int(inf_dict.get("seed", 0)))
        # stream: each batch's trajectories are consumed into the output
        # branches immediately (no per-run (E, T, N) trajectory buffer);
        # branch rows are reordered to event-index order once at the end
        positions: List[int] = []

        # segment-packed fast path (`model.packed: true` or item `packed`):
        # ONE compiled shape for the whole run, 128-cell alignment padding,
        # banded attention (ops/flash_packed.py, data/packing.py)
        packed = bool(inf_dict.get("packed", self.inf_cfg["model"].get("packed", False)))
        oversize_idx = np.empty(0, np.int64)
        if packed:
            from ..data.packing import aligned_len, collate_packed, pack_events
            from ..ops.flash_packed import set_packed_defaults

            pack_s = int(inf_dict.get("pack_s", self.inf_cfg["model"].get("pack_s", 5120)))
            pack_rows = int(inf_dict.get("pack_rows", self.inf_cfg["model"].get("pack_rows", 8)))
            counts = np.asarray(ds.cell_count_high, np.int64)
            # events too long for a packed row fall through to the bucketed
            # path below (the packing.py contract) instead of aborting the run
            fits = np.array([aligned_len(int(n)) <= pack_s for n in counts])
            oversize_idx = np.nonzero(~fits)[0]
            sub = np.nonzero(fits)[0]
            if oversize_idx.size:
                print(
                    f"[packed] {oversize_idx.size} event(s) exceed pack_s={pack_s}"
                    " after alignment; routing them through the bucketed path",
                    file=sys.stderr,
                )

            class _SubsetCache:
                """Layout indices -> dataset events, fetched once per batch
                (collate_packed and the unpack loop share the fetch)."""

                def __init__(self):
                    self._c = {}

                def __getitem__(self, i):
                    gi = int(sub[i])
                    if gi not in self._c:
                        self._c[gi] = ds.get_event(gi)
                    return self._c[gi]

            if sub.size:
                set_packed_defaults(max_segment_len=aligned_len(int(counts[sub].max())))
            for bi, lay in enumerate(pack_events(counts[sub], S=pack_s, rows_per_batch=pack_rows)):
                cache = _SubsetCache()
                hb = collate_packed(cache, lay, S=pack_s)
                batch = {k: jnp.asarray(v) for k, v in hb.items()}
                if self.fast_softmax and not self._nomax_validated:
                    self.fast_softmax = self._validate_nomax(batch)
                    self._nomax_validated = True
                traj = np.asarray(
                    self._jitted(
                        batch, jax.random.fold_in(key, bi), n_ensemble=n_ensemble,
                        n_steps=self.n_steps, method=method, fast=self.fast_softmax,
                    )
                )  # (E, T, B, S, 1)
                for row_i, row in enumerate(lay.rows):
                    for ev_idx, off, n in sorted(row, key=lambda t: t[1]):
                        ev = cache[ev_idx]
                        self._fill_event(
                            ev, traj[:, :, row_i, off : off + n, 0], low_z, high_z, part_z,
                            n_ensemble=n_ensemble, store_comp=store_comp,
                            store_inc=store_inc, max_particles=max_particles,
                        )
                        positions.append(ev.idx)

        if packed and oversize_idx.size:
            # bucketed mop-up of the oversize remainder: batch over their
            # lengths, translating batcher-local indices back to dataset ones
            _bb = BucketBatcher(
                np.asarray(ds.cell_count_high)[oversize_idx],
                quantum=int(self.config_t.get("bucket_quantum", 128)),
                max_batch_size=int(inf_dict.get("batch_size", 32)),
                shuffle=False,
                tail_shrink=inf_dict.get("tail_shrink", "exact"),
            )
            batcher = (
                (np.where(ii >= 0, oversize_idx[np.clip(ii, 0, None)], -1), bucket)
                for ii, bucket in _bb
            )
        elif packed:
            batcher = []
        else:
            batcher = BucketBatcher(
                ds.cell_count_high,
                quantum=int(self.config_t.get("bucket_quantum", 128)),
                max_batch_size=int(inf_dict.get("batch_size", 32)),
                shuffle=False,
                # shrink underfilled tail batches (padded slots cost real
                # compute); a few extra compiled shapes, amortised by the
                # persistent cache
                tail_shrink=inf_dict.get("tail_shrink", "exact"),
            )
        for bi, (idxs, bucket) in enumerate(batcher):
            events = [ds.get_event(i) if i >= 0 else None for i in idxs]
            hb = collate(events, bucket.pad_n, with_low=True, pad_n_low=bucket.pad_n)
            batch = {
                k: jnp.asarray(v)
                for k, v in hb.items()
                if isinstance(v, np.ndarray) and k != "idx"
            }
            if self.fast_softmax and not self._nomax_validated:
                self.fast_softmax = self._validate_nomax(batch)
                self._nomax_validated = True
            traj = self._jitted(
                batch, jax.random.fold_in(key, bi), n_ensemble=n_ensemble,
                n_steps=self.n_steps, method=method, fast=self.fast_softmax,
            )  # (E, T, B, N, 1)
            traj = np.asarray(traj)
            for slot, ev in enumerate(events):
                if ev is not None:
                    self._fill_event(
                        ev, traj[:, :, slot, :, 0], low_z, high_z, part_z,
                        n_ensemble=n_ensemble, store_comp=store_comp,
                        store_inc=store_inc, max_particles=max_particles,
                    )
                    positions.append(ev.idx)

        order = np.argsort(np.asarray(positions, np.int64), kind="stable")
        for zd in (low_z, high_z, part_z):
            for k in zd:
                zd[k] = [zd[k][i] for i in order]

        pred_path = inf_dict["pred_path"]
        os.makedirs(os.path.dirname(os.path.abspath(pred_path)), exist_ok=True)
        root_io.write_trees(
            pred_path,
            {
                "Low_Tree": {k: JaggedArray.from_list(v) for k, v in low_z.items()},
                "High_Tree": {k: JaggedArray.from_list(v) for k, v in high_z.items()},
                "Particle_Tree": {k: JaggedArray.from_list(v) for k, v in part_z.items()},
            },
        )
        return pred_path

    # ------------------------------------------------------------------
    def _fill_event(self, ev, traj, low_z, high_z, part_z, *, n_ensemble, store_comp, store_inc, max_particles):
        """traj: (E, T, N_pad) ensemble trajectories for one event."""
        n_high = len(ev.high["eta_raw"])
        n_low = len(ev.low["eta_raw"])
        tt = self.target_transform
        proxy_raw = ev.high["e_proxy_raw"]

        low_z["eta_raw"].append(ev.low["eta_raw"])
        low_z["phi"].append(ev.low["phi"])
        low_z["layer"].append(ev.low["layer"].astype(np.float32))
        low_z["e_meas_raw"].append(ev.low["e_meas_raw"] * 1e3)

        high_z["eta_raw"].append(ev.high["eta_raw"])
        high_z["phi"].append(ev.high["phi"])
        high_z["layer"].append(ev.high["layer"].astype(np.float32))
        high_z["e_truth_raw"].append(ev.high["e_truth_raw"] * 1e3)
        high_z["e_proxy"].append(ev.high["e_proxy"])
        high_z["e_proxy_raw"].append(proxy_raw * 1e3)
        high_z["raw_nn_cond"].append(ev.high["e_proxy"])
        high_z["raw_nn_target"].append(ev.high["target"])

        comp_final = traj[:, self.store_pos[self.n_steps - 1], :n_high]  # (E, N)
        avg_final = comp_final.mean(axis=0)
        high_z["raw_nn_pred"].append(avg_final)

        # avg-then-unscale
        high_z["e_pred_avg_raw"].append(np.asarray(tt.inverse(avg_final, proxy_raw)) * 1e3)
        # unscale-then-avg ("this one seems better", inference.py:163-175)
        comp_raw_final = np.stack([np.asarray(tt.inverse(c, proxy_raw)) for c in comp_final])
        high_z["e_pred_raw"].append(comp_raw_final.mean(axis=0) * 1e3)

        for t, ts_i in zip(self.ts_to_store, self.ts_to_store_idx):
            comp_t = traj[:, self.store_pos[ts_i], :n_high]
            avg_t = comp_t.mean(axis=0)
            high_z[f"raw_nn_pred_{t:.2f}"].append(avg_t)
            high_z[f"e_pred_avg_raw_{t:.2f}"].append(np.asarray(tt.inverse(avg_t, proxy_raw)) * 1e3)
            comp_raw_t = np.stack([np.asarray(tt.inverse(c, proxy_raw)) for c in comp_t])
            high_z[f"e_pred_raw_{t:.2f}"].append(comp_raw_t.mean(axis=0) * 1e3)
            if n_ensemble > 1 and store_comp:
                for ci in range(n_ensemble):
                    high_z[f"e_pred_raw_{t:.2f}_comp_{ci}"].append(comp_raw_t[ci] * 1e3)
                    high_z[f"raw_nn_pred_{t:.2f}_comp_{ci}"].append(comp_t[ci])
        if n_ensemble > 1 and store_comp:
            for ci in range(n_ensemble):
                high_z[f"e_pred_raw_comp_{ci}"].append(comp_raw_final[ci] * 1e3)
                high_z[f"raw_nn_pred_comp_{ci}"].append(comp_final[ci])

        part_z["particle_pt"].append(ev.particles["pt"])
        part_z["particle_eta"].append(ev.particles["eta"])
        part_z["particle_phi"].append(ev.particles["phi"])
        part_z["particle_e"].append(ev.particles["e"])
        part_z["particle_pdgid"].append(ev.particles["pdgid"].astype(np.float32))
        part_z["particle_dep_e"].append(ev.particles["dep_e"])

        if store_inc:
            n_part = ev.high_e_part.shape[1]
            for pi in range(max_particles):
                if pi < n_part:
                    low_z[f"e_part_{pi}"].append(ev.low_e_part[:, pi])
                    high_z[f"e_part_{pi}"].append(ev.high_e_part[:, pi])
                else:
                    low_z[f"e_part_{pi}"].append(np.zeros(n_low, np.float32))
                    high_z[f"e_part_{pi}"].append(np.zeros(n_high, np.float32))

    # ------------------------------------------------------------------
    def get_output_path(self, inf_dict: dict) -> str:
        outputdir = os.path.join(os.path.dirname(self.inf_cfg["model"]["config_path_mv"]), "inference")
        if inf_dict.get("dir_flag"):
            outputdir = os.path.join(outputdir, inf_dict["dir_flag"])
        Path(outputdir).mkdir(parents=True, exist_ok=True)
        stem = os.path.basename(inf_dict["truth_path"]).rsplit(".", 1)[0]
        ext = ".h5" if str(inf_dict["truth_path"]).endswith((".h5", ".hdf5")) else ".root"
        return os.path.join(outputdir, f"{stem}_pred{ext}")
