"""Stage-2 inference driver: particle predictions -> ``Particle_Tree`` file.

Capability mirror of inference_pf.py:47-236: loads the saved PF config pair +
checkpoint with predicted-cardinality masking enabled (:76), iterates the SR
output chunks, and per batch: forward pass, argmax cardinality, runs the
set-to-set matching *only to get the Hungarian alignment* for pred<->truth
ordering in the output (:146-149), writes truth/pred kinematics, cardinality,
event idx and optional per-particle incidence-weight branches over the masked
cells (:178-207).
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_yaml
from ..data import root_io
from ..data.bucketing import BucketBatcher
from ..data.jagged import JaggedArray
from ..data.pf_dataset import PflowEvents, collate_pf
from ..losses.set2set import set_to_set_incidence_loss, set_to_set_kinematics_loss
from ..models.pf.model_pf import SAPF
from ..train.checkpoint import load_params
from ..transforms import build_var_transforms


class PFInference:
    def __init__(self, inf_cfg: dict, params=None):
        self.inf_cfg = inf_cfg
        self.config_mv = load_yaml(inf_cfg["model"]["config_path_mv"])
        self.config_t = load_yaml(inf_cfg["model"]["config_path_t"])
        pf_cfg = self.config_mv["pf_model"]
        self.max_part = int(pf_cfg["max_particles"])
        self.transforms = build_var_transforms(self.config_mv["var_transform"])
        # fused DiT layer kernels in the cell encoder (ops/fused_{qkv,mlp}.py):
        # parity-tested against the unfused path (tests/test_fused_*.py);
        # opt-out via `fused_prologue: false` in the inference YAML
        self.model = SAPF(
            config_pf=pf_cfg,
            transforms=self.transforms,
            inference=True,
            fused_prologue=bool(inf_cfg["model"].get("fused_prologue", True)),
        )
        if params is None:
            ckpt = load_params(inf_cfg["model"]["checkpoint_path"])
            params = ckpt["params"] if isinstance(ckpt, dict) and "params" in ckpt else ckpt
        self.params = params
        self.loss_on_inc = bool(self.config_t.get("loss_on_inc_wts", False))
        self._fwd = jax.jit(self._fwd_impl)

    def _fwd_impl(self, batch, rng):
        logits, kin_pred, inc_weights = self.model.apply(
            {"params": self.params}, batch, rng=rng
        )
        n_pred = jnp.argmax(logits, axis=-1)
        if self.loss_on_inc:
            _, _, assign = set_to_set_incidence_loss(inc_weights, batch, kin_pred)
        else:
            _, _, assign = set_to_set_kinematics_loss(kin_pred, batch, self.config_t)
        B = kin_pred.shape[0]
        kin_matched = kin_pred[jnp.arange(B)[:, None], assign, :]
        inc_matched = (
            inc_weights[jnp.arange(B)[:, None], assign, :] if inc_weights is not None else None
        )
        return n_pred, kin_matched, inc_matched

    def run_pred(self, inf_dict: dict) -> str:
        ds = PflowEvents(
            inf_dict["glob_arg"],
            config_mv=self.config_mv,
            energy_threshold=float(self.config_t.get("energy_threshold", 0.0)),
            reduce_ds=int(inf_dict.get("reduce_ds", -1)),
            res=self.config_t.get("resolution", "low"),
            load_incidence=self.loss_on_inc,
        )
        store_inc = bool(inf_dict.get("store_inc_wt", False))
        tr = self.transforms

        # reference branch schema (inference_pf.py:96-207): jagged kinematics
        # branches masked by the TRUTH particle mask with predictions
        # Hungarian-reordered into truth order; flat truth/pred cardinality.
        out: Dict[str, list] = {
            k: []
            for k in [
                "truth_pt_raw", "truth_eta_raw", "truth_phi", "truth_e_raw", "truth_dep_e_raw",
                "pred_pt_raw", "pred_eta_raw", "pred_phi", "pred_e_raw",
            ]
        }
        card_truth, card_pred, card_idx = [], [], []
        cell_out: Dict[str, list] = (
            {f"pred_inc_wt_{pi}": [] for pi in range(self.max_part)} if store_inc else {}
        )

        batcher = BucketBatcher(
            ds.cell_count,
            quantum=int(self.config_t.get("bucket_quantum", 128)),
            max_batch_size=int(self.inf_cfg.get("batch_size", 32)),
            shuffle=False,
        )
        key = jax.random.PRNGKey(0)
        results = {}
        for bi, (idxs, bucket) in enumerate(batcher):
            events = [ds.get_event(i) if i >= 0 else None for i in idxs]
            hb = collate_pf(events, bucket.pad_n, self.max_part)
            batch = {
                k: jnp.asarray(v) for k, v in hb.items() if isinstance(v, np.ndarray) and k != "idx"
            }
            n_pred, kin_m, inc_m = self._fwd(batch, jax.random.fold_in(key, bi))
            n_pred = np.asarray(n_pred)
            kin_m = np.asarray(kin_m)
            inc_m = np.asarray(inc_m) if inc_m is not None else None
            for slot, (i, ev) in enumerate(zip(idxs, events)):
                if ev is None:
                    continue
                results[int(i)] = (
                    ev, int(n_pred[slot]), kin_m[slot],
                    None if inc_m is None else inc_m[slot], hb["cell_mask"][slot],
                )

        for i in sorted(results):
            ev, n_pred_i, kin_i, inc_i, cmask = results[i]
            n_true = min(ev["n_particles"], self.max_part)
            card_truth.append(n_true)
            card_pred.append(n_pred_i)
            card_idx.append(i)
            out["truth_pt_raw"].append(ev["part_pt_raw"][:n_true])
            out["truth_eta_raw"].append(ev["part_eta_raw"][:n_true])
            out["truth_phi"].append(ev["part_phi"][:n_true])
            out["truth_e_raw"].append(ev["part_e_raw"][:n_true])
            out["truth_dep_e_raw"].append(ev["part_dep_e_raw"][:n_true])
            out["pred_pt_raw"].append(np.asarray(tr["pt"].inverse(kin_i[:n_true, 0]), np.float32))
            out["pred_eta_raw"].append(np.asarray(tr["eta"].inverse(kin_i[:n_true, 1]), np.float32))
            out["pred_phi"].append(kin_i[:n_true, 2].astype(np.float32))
            out["pred_e_raw"].append(np.asarray(tr["e"].inverse(kin_i[:n_true, 3]), np.float32))
            if store_inc and inc_i is not None:
                valid = np.asarray(cmask)
                for pi in range(self.max_part):
                    cell_out[f"pred_inc_wt_{pi}"].append(inc_i[pi, valid].astype(np.float32))

        tree = {k: JaggedArray.from_list(v) for k, v in out.items()}
        tree["truth_card"] = np.asarray(card_truth, np.int32)
        tree["pred_card"] = np.asarray(card_pred, np.int32)
        tree["idx"] = np.asarray(card_idx, np.int64)
        for k, v in cell_out.items():
            tree[k] = JaggedArray.from_list(v)

        pred_path = inf_dict["pred_path"]
        os.makedirs(os.path.dirname(os.path.abspath(pred_path)), exist_ok=True)
        root_io.write_trees(pred_path, {"Particle_Tree": tree})
        return pred_path
