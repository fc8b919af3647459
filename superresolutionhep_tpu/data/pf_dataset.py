"""Stage-2 (particle-flow) event pipeline.

Capability mirror of pflow/dataset_pf.py:12-267: globs the chunked SR
inference outputs sorted by entry-start index (:29-31), reads cells from
``Low_Tree``/``e_meas_raw`` or ``High_Tree``/``e_pred_raw`` per the
resolution setting (:23-27), applies the per-cell MeV energy-threshold cut
(:81-87), reads particles, optional per-particle incidence columns
``e_part_i`` (:58-60,94-97), optional dropping of single-particle events
(:33-36); per event: pt/e/eta transforms, pdgid -> class map
{+-11: 1, 22: 0} (:49-53,156-157), optional row-normalised incidence matrix
(:165-173).  Batches pad cells to bucketed static shapes and particles to
``max_particles`` (collate_fn, :179-267).
"""

from __future__ import annotations

from glob import glob
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..transforms import build_var_transforms
from . import root_io

PDGID_TO_CLASS = {-11: 1, 11: 1, 22: 0}


def sorted_chunk_files(glob_arg: str) -> List[str]:
    files = glob(glob_arg)
    try:
        files.sort(key=lambda x: int(x.split("_")[-2]))
    except (ValueError, IndexError):
        files.sort()
    return files


class PflowEvents:
    def __init__(
        self,
        glob_arg: str,
        config_mv: dict,
        reduce_ds: int = -1,
        energy_threshold: float = 0.0,
        res: str = "low",
        drop_single_part_events: bool = False,
        load_incidence: bool = False,
    ):
        self.config_mv = config_mv
        self.max_part = int(config_mv["pf_model"]["max_particles"])
        self.load_incidence = load_incidence
        self.transforms = build_var_transforms(config_mv["var_transform"])

        tree_name = "High_Tree" if res == "high" else "Low_Tree"
        e_branch = "e_pred_raw" if res == "high" else "e_meas_raw"

        cells: Dict[str, list] = {k: [] for k in ["e", "eta", "phi", "layer"]}
        incidence: List[np.ndarray] = []
        parts: Dict[str, list] = {
            k: [] for k in ["pt", "e", "eta", "phi", "pdgid", "dep_e"]
        }

        n_events = 0
        for path in sorted_chunk_files(glob_arg):
            branches = [e_branch, "eta_raw", "phi", "layer"]
            if load_incidence:
                branches += [f"e_part_{i}" for i in range(self.max_part)]
            tree = root_io.read_tree(path, tree_name, branches)
            ptree = root_io.read_tree(
                path,
                "Particle_Tree",
                ["particle_pt", "particle_e", "particle_eta", "particle_phi", "particle_pdgid", "particle_dep_e"],
            )
            n_file = len(tree["layer"])
            for i in range(n_file):
                if reduce_ds != -1 and n_events >= reduce_ds:
                    break
                e = np.asarray(tree[e_branch][i], np.float32)
                keep = e > energy_threshold  # MeV cut (dataset_pf.py:81-87)
                cells["e"].append(e[keep])
                cells["eta"].append(np.asarray(tree["eta_raw"][i], np.float32)[keep])
                cells["phi"].append(np.asarray(tree["phi"][i], np.float32)[keep])
                cells["layer"].append(np.asarray(tree["layer"][i], np.int32)[keep])
                if load_incidence:
                    inc = np.stack(
                        [np.asarray(tree[f"e_part_{p}"][i], np.float32)[keep] for p in range(self.max_part)],
                        axis=1,
                    )
                    incidence.append(inc)
                for k, b in [
                    ("pt", "particle_pt"),
                    ("e", "particle_e"),
                    ("eta", "particle_eta"),
                    ("phi", "particle_phi"),
                    ("pdgid", "particle_pdgid"),
                    ("dep_e", "particle_dep_e"),
                ]:
                    parts[k].append(np.asarray(ptree[b][i]))
                n_events += 1
            if reduce_ds != -1 and n_events >= reduce_ds:
                break

        if drop_single_part_events:
            keep_idx = [i for i in range(n_events) if len(parts["e"][i]) > 1]
            cells = {k: [v[i] for i in keep_idx] for k, v in cells.items()}
            parts = {k: [v[i] for i in keep_idx] for k, v in parts.items()}
            if load_incidence:
                incidence = [incidence[i] for i in keep_idx]
            n_events = len(keep_idx)

        self.cells = cells
        self.parts = parts
        self.incidence = incidence
        self.n_events = n_events
        self.cell_count = [len(x) for x in cells["e"]]

    def __len__(self):
        return self.n_events

    def get_event(self, idx: int) -> dict:
        tr = self.transforms
        c_e_raw = self.cells["e"][idx]
        c_eta_raw = self.cells["eta"][idx]
        c_phi = self.cells["phi"][idx]
        pdgid = self.parts["pdgid"][idx].astype(np.int64)

        ev = {
            "cell_e_raw": c_e_raw,
            "cell_eta_raw": c_eta_raw,
            "cell_phi": c_phi,
            "cell_cosphi": np.cos(c_phi),
            "cell_sinphi": np.sin(c_phi),
            "cell_layer": self.cells["layer"][idx],
            "cell_e": np.asarray(tr["e"].forward(c_e_raw), np.float32),
            "cell_eta": np.asarray(tr["eta"].forward(c_eta_raw), np.float32),
            "part_pt_raw": self.parts["pt"][idx].astype(np.float32),
            "part_e_raw": self.parts["e"][idx].astype(np.float32),
            "part_eta_raw": self.parts["eta"][idx].astype(np.float32),
            "part_dep_e_raw": self.parts["dep_e"][idx].astype(np.float32),
            "part_phi": self.parts["phi"][idx].astype(np.float32),
            "part_class": np.array([PDGID_TO_CLASS[int(x)] for x in pdgid], np.int32),
        }
        ev["part_pt"] = np.asarray(tr["pt"].forward(ev["part_pt_raw"]), np.float32)
        ev["part_e"] = np.asarray(tr["e"].forward(ev["part_e_raw"]), np.float32)
        ev["part_eta"] = np.asarray(tr["eta"].forward(ev["part_eta_raw"]), np.float32)
        ev["part_dep_e"] = np.asarray(tr["e"].forward(ev["part_dep_e_raw"]), np.float32)
        ev["n_particles"] = len(ev["part_e_raw"])

        if self.load_incidence:
            energy = self.incidence[idx]  # (n_cells, max_part)
            row_sum = energy.sum(axis=1, keepdims=True)
            row_sum[row_sum == 0] = 1.0
            ev["incidence_matrix"] = energy / row_sum
        return ev


CELL_F32 = ["cell_e", "cell_eta", "cell_phi", "cell_cosphi", "cell_sinphi", "cell_e_raw", "cell_eta_raw"]
PART_F32 = ["part_pt", "part_e", "part_eta", "part_phi", "part_dep_e", "part_pt_raw", "part_e_raw", "part_eta_raw", "part_dep_e_raw"]


def collate_pf(events: Sequence[Optional[dict]], pad_n: int, max_part: int) -> Dict[str, np.ndarray]:
    B = len(events)
    out: Dict[str, np.ndarray] = {}
    for k in CELL_F32:
        out[k] = np.zeros((B, pad_n), np.float32)
    out["cell_layer"] = np.zeros((B, pad_n), np.int32)
    out["cell_mask"] = np.zeros((B, pad_n), bool)
    for k in PART_F32:
        out[k] = np.zeros((B, max_part), np.float32)
    out["part_class"] = np.zeros((B, max_part), np.int32)
    out["part_mask"] = np.zeros((B, max_part), bool)
    out["cardinality"] = np.zeros((B,), np.int32)
    out["idx"] = np.full((B,), -1, np.int64)

    has_inc = any(ev is not None and "incidence_matrix" in ev for ev in events)
    if has_inc:
        out["incidence_matrix"] = np.zeros((B, pad_n, max_part), np.float32)

    for i, ev in enumerate(events):
        if ev is None:
            continue
        n = len(ev["cell_e"])
        if n > pad_n:
            raise ValueError(f"event has {n} cells > pad_n {pad_n}")
        for k in CELL_F32:
            out[k][i, :n] = ev[k]
        out["cell_layer"][i, :n] = ev["cell_layer"]
        out["cell_mask"][i, :n] = True
        np_ = min(ev["n_particles"], max_part)
        for k in PART_F32:
            out[k][i, :np_] = ev[k][:np_]
        out["part_class"][i, :np_] = ev["part_class"][:np_]
        out["part_mask"][i, :np_] = True
        out["cardinality"][i] = np_
        if has_inc and "incidence_matrix" in ev:
            out["incidence_matrix"][i, :n, :] = ev["incidence_matrix"][:, :max_part]
    return out
