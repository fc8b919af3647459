"""Synthetic COCOA-like calorimeter event generator.

The reference datasets (single-electron / multi-particle COCOA, zenodo record
15582324, README.md:7) are not redistributable inside this repo, so this
module generates events with the *exact same file schema* the reference
readers expect (dataset.py:40-95): paired ``Low_Tree``/``High_Tree`` cell
branches, the ``high_cell_to_low_cell_edge`` reorder map, particle branches on
the low tree and ``particle_to_node_idx``/``particle_to_node_weight``
incidence on the high tree.

Physics is a cartoon (Gaussian EM showers over an ideal barrel grid) but the
*structural* properties match what the pipeline cares about: variable cell
counts per event, res_factor^2 HR children per LR cell, 6 layers with only the
first 3 (ECAL) kept downstream, electrons' incidence attenuated by the x2
convention (dataset.py:252), energies stored in MeV.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .jagged import Jagged2Array, JaggedArray
from . import root_io

# per-layer eta granularity of the HR grid; LR = HR / res_factor
# (matches the hard-coded granularities in performance/performance.py:14-18)
HIGH_GRANULARITY = (256, 256, 128, 64, 64, 32)
ETA_RANGE = (-3.0, 3.0)
LAYER_RADII = (1500.0, 1600.0, 1700.0, 2100.0, 2500.0, 3000.0)  # mm, cartoon


@dataclasses.dataclass
class GeneratorConfig:
    res_factor: int = 2
    n_layers: int = 6
    min_particles: int = 1
    max_particles: int = 4
    e_min_gev: float = 10.0
    e_max_gev: float = 100.0
    shower_sigma_cells: float = 1.5  # lateral shower width in LR-cell units
    window_lr_cells: int = 4  # half-window of LR cells kept around each shower
    noise_frac: float = 0.02
    # fraction of each LR cell's energy split stochastically (dirichlet)
    # instead of by the deterministic shower profile; 0 = fully learnable
    split_noise: float = 0.2
    electron_fraction: float = 0.5
    single_electron: bool = False
    # jet-like collimation: when > 0, all particles of an event land within
    # this radius (in layer-0 LR-cell-pitch units) of a common axis, so
    # their showers overlap at LR pitch while remaining separable at HR
    # pitch — the regime where the reference's HR-trained PF model beats the
    # LR-trained one (saved_checkpoints/pf_hr 0.3318 vs pf_lr 0.4034)
    collimate_delta_r_lr_cells: float = 0.0
    # localized-axis regime: when axis_eta is set, shower centers are drawn
    # from a band of +/- axis_jitter_lr_cells (layer-0 LR pitch units) around
    # (axis_eta, axis_phi) instead of the full detector.  The subcell-share
    # target is a sawtooth at LR pitch in *absolute* coordinates; over the
    # full detector it has ~75 periods (beyond the spectral capacity of the
    # reference's raw-coordinate 3->64->32 etaphi MLP,
    # /root/reference/models/flow_model.py:44-46), while a localized band
    # keeps only a handful — the generator regime where the exact reference
    # featurization can express the task (VERDICT r2, next-round item 4)
    axis_eta: float | None = None
    axis_phi: float = 0.6
    axis_jitter_lr_cells: float = 1.5


def _layer_grid(layer: int, res_factor: int):
    n_eta_hr = HIGH_GRANULARITY[layer]
    n_phi_hr = n_eta_hr  # square cartoon grid
    return n_eta_hr, n_phi_hr, n_eta_hr // res_factor, n_phi_hr // res_factor


def generate_events(n_events: int, seed: int = 0, config: GeneratorConfig | None = None):
    """Returns the three-tree dict ready for root_io.write_trees."""
    cfg = config or GeneratorConfig()
    rng = np.random.default_rng(seed)
    rf = cfg.res_factor

    low = {k: [] for k in ["cell_eta", "cell_phi", "cell_layer", "cell_e", "cell_x", "cell_y", "cell_z"]}
    high = {k: [] for k in low}
    low["high_cell_to_low_cell_edge"] = []
    part = {k: [] for k in [
        "particle_pt", "particle_eta", "particle_phi", "particle_e", "particle_pdgid", "particle_dep_energy"
    ]}
    p2n_idx, p2n_wt = [], []

    if cfg.collimate_delta_r_lr_cells > 0 and cfg.axis_eta is not None:
        # the axis block would silently overwrite the collimated draw with
        # independent uniform jitter — a different physics regime than asked
        raise ValueError(
            "collimate_delta_r_lr_cells and axis_eta are mutually exclusive "
            "generator regimes (collimated disk vs localized-axis jitter)"
        )
    for _ in range(n_events):
        n_part = 1 if cfg.single_electron else int(rng.integers(cfg.min_particles, cfg.max_particles + 1))
        if cfg.collimate_delta_r_lr_cells > 0 and not cfg.single_electron:
            # layer-0 LR pitch sets the collimation scale (square cartoon grid)
            pitch0 = (ETA_RANGE[1] - ETA_RANGE[0]) / (HIGH_GRANULARITY[0] // rf)
            r_max = cfg.collimate_delta_r_lr_cells * pitch0
            axis_eta = rng.uniform(-1.5, 1.5)
            axis_phi = rng.uniform(-np.pi, np.pi)
            r = r_max * np.sqrt(rng.uniform(0, 1, n_part))  # uniform over the disk
            ang = rng.uniform(0, 2 * np.pi, n_part)
            p_eta = np.clip(axis_eta + r * np.cos(ang), -1.6, 1.6)
            p_phi = axis_phi + r * np.sin(ang)
            p_phi = (p_phi + np.pi) % (2 * np.pi) - np.pi
        else:
            p_eta = rng.uniform(-1.5, 1.5, n_part)
            p_phi = rng.uniform(-np.pi, np.pi, n_part)
        if cfg.axis_eta is not None:
            pitch0 = (ETA_RANGE[1] - ETA_RANGE[0]) / (HIGH_GRANULARITY[0] // rf)
            j = cfg.axis_jitter_lr_cells * pitch0
            p_eta = np.clip(cfg.axis_eta + rng.uniform(-j, j, n_part), -1.6, 1.6)
            p_phi = cfg.axis_phi + rng.uniform(-j, j, n_part)
            p_phi = (p_phi + np.pi) % (2 * np.pi) - np.pi
        p_e = rng.uniform(cfg.e_min_gev, cfg.e_max_gev, n_part) * 1e3  # MeV
        if cfg.single_electron:
            pdgid = np.array([11], np.int32)
        else:
            is_e = rng.random(n_part) < cfg.electron_fraction
            pdgid = np.where(is_e, rng.choice([-11, 11], n_part), 22).astype(np.int32)

        ev_low = {k: [] for k in low if k != "high_cell_to_low_cell_edge"}
        ev_high = {k: [] for k in high}
        hr_owner_energy = []  # per HR cell: array of per-particle energies
        low_count = 0

        for layer in range(cfg.n_layers):
            n_eta_hr, n_phi_hr, n_eta_lr, n_phi_lr = _layer_grid(layer, rf)
            d_eta_lr = (ETA_RANGE[1] - ETA_RANGE[0]) / n_eta_lr
            d_phi_lr = 2 * np.pi / n_phi_lr
            # deposit fraction per layer: EM showers mostly in ECAL (0-2)
            layer_frac = np.array([0.3, 0.45, 0.2, 0.03, 0.015, 0.005])[layer]

            # active LR cells: union of windows around each particle
            active = {}
            for pi in range(n_part):
                ie = int((p_eta[pi] - ETA_RANGE[0]) / d_eta_lr)
                ip = int((p_phi[pi] + np.pi) / d_phi_lr)
                w = cfg.window_lr_cells
                for de in range(-w, w + 1):
                    for dp in range(-w, w + 1):
                        ce, cp = ie + de, (ip + dp) % n_phi_lr
                        if 0 <= ce < n_eta_lr:
                            active.setdefault((ce, cp), np.zeros(n_part))
            if not active:
                continue

            keys = sorted(active.keys())
            for (ce, cp) in keys:
                eta_c = ETA_RANGE[0] + (ce + 0.5) * d_eta_lr
                phi_c = -np.pi + (cp + 0.5) * d_phi_lr
                for pi in range(n_part):
                    d2 = ((eta_c - p_eta[pi]) / d_eta_lr) ** 2 + (
                        ((phi_c - p_phi[pi] + np.pi) % (2 * np.pi) - np.pi) / d_phi_lr
                    ) ** 2
                    amp = p_e[pi] * layer_frac * np.exp(-d2 / (2 * cfg.shower_sigma_cells**2))
                    active[(ce, cp)][pi] = amp / (2 * np.pi * cfg.shower_sigma_cells**2)

            r = LAYER_RADII[layer]
            for (ce, cp) in keys:
                eta_c = ETA_RANGE[0] + (ce + 0.5) * d_eta_lr
                phi_c = -np.pi + (cp + 0.5) * d_phi_lr

                # HR truth: evaluate each particle's shower at the HR subcell
                # centers (geometry-determined, so super-resolution is
                # *learnable*); optional dirichlet jitter adds an irreducible
                # stochastic component (split_noise in [0,1])
                hr_pp = np.zeros((rf * rf, n_part))
                for k in range(rf * rf):
                    de, dp = divmod(k, rf)
                    eta_h = ETA_RANGE[0] + (ce * rf + de + 0.5) * d_eta_lr / rf
                    phi_h = -np.pi + (cp * rf + dp + 0.5) * d_phi_lr / rf
                    for pi in range(n_part):
                        d2 = ((eta_h - p_eta[pi]) / d_eta_lr) ** 2 + (
                            ((phi_h - p_phi[pi] + np.pi) % (2 * np.pi) - np.pi) / d_phi_lr
                        ) ** 2
                        hr_pp[k, pi] = np.exp(-d2 / (2 * cfg.shower_sigma_cells**2))
                col = hr_pp.sum(axis=0)
                col[col == 0] = 1.0
                # normalise so HR children sum to the LR-cell shower amplitude
                hr_pp = hr_pp / col[None, :] * active[(ce, cp)][None, :]
                if cfg.split_noise > 0:
                    jit = rng.dirichlet(np.ones(rf * rf) * 2.0)[:, None]
                    hr_pp = (1 - cfg.split_noise) * hr_pp + cfg.split_noise * jit * active[(ce, cp)][None, :]

                e_lr_true = float(hr_pp.sum())
                noise_lr = 1.0 + cfg.noise_frac * rng.normal()
                ev_low["cell_eta"].append(eta_c)
                ev_low["cell_phi"].append(phi_c)
                ev_low["cell_layer"].append(layer)
                ev_low["cell_e"].append(max(e_lr_true * noise_lr, 1e-3))
                theta = 2 * np.arctan(np.exp(-eta_c))
                ev_low["cell_x"].append(r * np.cos(phi_c))
                ev_low["cell_y"].append(r * np.sin(phi_c))
                ev_low["cell_z"].append(r / np.tan(theta))

                for k in range(rf * rf):
                    de, dp = divmod(k, rf)
                    eta_h = ETA_RANGE[0] + (ce * rf + de + 0.5) * d_eta_lr / rf
                    phi_h = -np.pi + (cp * rf + dp + 0.5) * d_phi_lr / rf
                    ev_high["cell_eta"].append(eta_h)
                    ev_high["cell_phi"].append(phi_h)
                    ev_high["cell_layer"].append(layer)
                    ev_high["cell_e"].append(max(float(hr_pp[k].sum()), 1e-4))
                    theta_h = 2 * np.arctan(np.exp(-eta_h))
                    ev_high["cell_x"].append(r * np.cos(phi_h))
                    ev_high["cell_y"].append(r * np.sin(phi_h))
                    ev_high["cell_z"].append(r / np.tan(theta_h))
                    hr_owner_energy.append(hr_pp[k].copy())
                low_count += 1

        n_high = len(ev_high["cell_eta"])
        # shuffle HR cells and emit the reorder map (high_cell_to_low_cell_edge
        # holds, per HR *slot*, the index into the shuffled array such that
        # high[reorder][k] belongs to LR cell k // rf^2 — dataset.py:92,120-127)
        perm = rng.permutation(n_high)  # shuffled_pos -> canonical
        inv = np.argsort(perm)  # canonical -> shuffled_pos
        for k in ev_high:
            arr = np.asarray(ev_high[k])[perm]
            ev_high[k] = arr
        hr_energy_mat = np.asarray(hr_owner_energy)[perm]  # (n_high, n_part) shuffled order

        for k in ev_low:
            low[k].append(np.asarray(ev_low[k], np.float32 if "layer" not in k else np.int32))
        for k in ev_high:
            high[k].append(np.asarray(ev_high[k], np.float32 if "layer" not in k else np.int32))
        low["high_cell_to_low_cell_edge"].append(inv.astype(np.int64))

        # particle-to-HR-cell incidence (weights sum to 1 per particle; stored
        # against the *shuffled* HR order, like the reference file layout)
        idx_lists, wt_lists, dep_e = [], [], np.zeros(n_part)
        for pi in range(n_part):
            e_pi = hr_energy_mat[:, pi]
            nz = np.nonzero(e_pi > 0)[0]
            tot = e_pi[nz].sum()
            w = e_pi[nz] / max(tot, 1e-12)
            # electrons stored with the 1/2 attenuation the reader undoes (x2)
            if abs(pdgid[pi]) == 11:
                w = w / 2.0
            idx_lists.append(nz.astype(np.int64))
            wt_lists.append(w.astype(np.float32))
            dep_e[pi] = tot
        p2n_idx.append(idx_lists)
        p2n_wt.append(wt_lists)

        part["particle_pt"].append((p_e / np.cosh(p_eta)).astype(np.float32))
        part["particle_eta"].append(p_eta.astype(np.float32))
        part["particle_phi"].append(p_phi.astype(np.float32))
        part["particle_e"].append(p_e.astype(np.float32))
        part["particle_pdgid"].append(pdgid)
        part["particle_dep_energy"].append(dep_e.astype(np.float32))

    low_tree = {k: JaggedArray.from_list(v) for k, v in low.items()}
    high_tree = {k: JaggedArray.from_list(v) for k, v in high.items()}
    for k, v in part.items():
        low_tree[k] = JaggedArray.from_list(v)
    high_tree["particle_to_node_idx"] = Jagged2Array.from_list(p2n_idx)
    high_tree["particle_to_node_weight"] = Jagged2Array.from_list(p2n_wt)
    return {"Low_Tree": low_tree, "High_Tree": high_tree}


def write_synthetic_file(path, n_events: int, seed: int = 0, config: GeneratorConfig | None = None):
    trees = generate_events(n_events, seed=seed, config=config)
    root_io.write_trees(path, trees)
    return path
