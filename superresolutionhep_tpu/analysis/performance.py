"""Offline analysis loaders for SR / PF inference outputs.

Capability mirror of performance/performance.py:6-217: re-reads the inference
event files (LR/HR geometry, truth/pred/proxy energies, NN-space branches,
per-timestep and per-ensemble-component branches), recomputes ensemble
averages, joins PF outputs by the ``idx`` branch with truth-consistency
asserts, and exposes the plotting surface of performance/plot_*.py as
methods (the reference attaches them by monkey-patching,
performance/__init__.py:6-25).

Hard-coded per-layer eta granularities: high = [256,256,128,64,64,32],
low = high / res_factor (performance/performance.py:14-18).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..data import root_io
from .util import mean_std_iqr_label, robust_bins

HIGH_GRAN = [256, 256, 128, 64, 64, 32]


def _jag_list(branch) -> List[np.ndarray]:
    if hasattr(branch, "to_list"):
        return branch.to_list()
    return [np.asarray(x) for x in branch]


class PerformanceCOCOA:
    def __init__(self, inference_path, res_factor, cmap="viridis", entry_stop=None, max_comp=-1):
        self.res_factor = res_factor
        if res_factor not in (2, 4):
            raise ValueError("res_factor must be 2 or 4")
        self.high_gran = HIGH_GRAN
        self.low_gran = [g // res_factor for g in HIGH_GRAN]
        self.cmap = cmap

        low = root_io.read_tree(inference_path, "Low_Tree", None, 0, entry_stop)
        high = root_io.read_tree(inference_path, "High_Tree", None, 0, entry_stop)

        self.low_phi = _jag_list(low["phi"])
        self.low_layer = _jag_list(low["layer"])
        self.low_eta = _jag_list(low["eta_raw"])
        self.low_e_measured = _jag_list(low["e_meas_raw"])
        self.n_events = len(self.low_phi)

        self.high_phi = _jag_list(high["phi"])
        self.high_layer = _jag_list(high["layer"])
        self.high_eta = _jag_list(high["eta_raw"])
        self.high_e_truth = _jag_list(high["e_truth_raw"])
        self.high_e_pred_direct = _jag_list(high["e_pred_raw"])
        self.high_e_proxy = _jag_list(high["e_proxy_raw"])
        self.high_raw_nn_cond = _jag_list(high["raw_nn_cond"])
        self.high_raw_nn_target = _jag_list(high["raw_nn_target"])
        self.high_raw_nn_pred = _jag_list(high["raw_nn_pred"])

        self.high_e_pred_step: Dict[str, list] = {}
        self.high_raw_nn_pred_step: Dict[str, list] = {}
        self.high_e_pred_raw_comp: Dict[str, list] = {}
        for br in high:
            if "e_pred_raw_comp" in br:
                self.high_e_pred_raw_comp[br] = _jag_list(high[br])
            elif "e_pred_raw_" in br and "comp" not in br:
                self.high_e_pred_step[br] = _jag_list(high[br])
            elif "raw_nn_pred_" in br and "comp" not in br:
                self.high_raw_nn_pred_step[br] = _jag_list(high[br])

        # ensemble average recomputed from components when present
        # (performance.py:61-93); the file-level average is kept as
        # ``high_e_pred_direct``
        if self.high_e_pred_raw_comp:
            keys = sorted(self.high_e_pred_raw_comp)
            if max_comp > 0:
                keys = keys[:max_comp]
            self.high_e_pred = [
                np.mean([self.high_e_pred_raw_comp[k][i] for k in keys], axis=0)
                for i in range(self.n_events)
            ]
        else:
            self.high_e_pred = self.high_e_pred_direct

    # ------------------------------------------------------------------
    def compute_ensemble_average(self, n: int) -> List[np.ndarray]:
        keys = sorted(self.high_e_pred_raw_comp)[:n]
        return [
            np.mean([self.high_e_pred_raw_comp[k][i] for k in keys], axis=0)
            for i in range(self.n_events)
        ]

    # ------------------------------------------------------------------
    def _layer_sums(self, pred=None):
        """Per-event energy sums per ECAL layer and overall, for LR-measured,
        HR-truth and HR-pred (plot_summaries.py:15-35)."""
        pred = pred if pred is not None else self.high_e_pred
        out = {k: {L: [] for L in [0, 1, 2, "all"]} for k in ["low_meas", "high_truth", "high_pred"]}
        for i in range(self.n_events):
            for L in range(3):
                out["low_meas"][L].append(self.low_e_measured[i][self.low_layer[i] == L].sum())
                out["high_truth"][L].append(self.high_e_truth[i][self.high_layer[i] == L].sum())
                out["high_pred"][L].append(np.asarray(pred[i])[self.high_layer[i] == L].sum())
            out["low_meas"]["all"].append(self.low_e_measured[i].sum())
            out["high_truth"]["all"].append(self.high_e_truth[i].sum())
            out["high_pred"]["all"].append(np.asarray(pred[i]).sum())
        return {k: {L: np.asarray(v) for L, v in d.items()} for k, d in out.items()}

    def plot_residual_event(self, dir=None, truth_e_range=None, pred=None):
        """Event-sum residual histograms per ECAL layer, absolute and
        relative, LR-meas vs HR-pred against HR truth
        (plot_summaries.py:13-120). Returns (fig, summary_dict)."""
        import matplotlib.pyplot as plt

        sums = self._layer_sums(pred)
        if truth_e_range is not None:
            for L in [0, 1, 2, "all"]:
                m = (sums["high_truth"][L] > truth_e_range[0]) & (
                    sums["high_truth"][L] < truth_e_range[1]
                )
                for k in sums:
                    sums[k][L] = sums[k][L][m]

        fig, axes = plt.subplots(2, 4, figsize=(16, 8), dpi=120)
        summary = {}
        for col, L in enumerate(["all", 0, 1, 2]):
            truth = sums["high_truth"][L]
            meas_res = sums["low_meas"][L] - truth
            pred_res = sums["high_pred"][L] - truth
            title = "All layers" if L == "all" else f"ECAL{L + 1}"

            ax = axes[0, col]
            bins = robust_bins(meas_res, pred_res)
            lbl_m, _ = mean_std_iqr_label(meas_res, 1)
            lbl_p, stats = mean_std_iqr_label(pred_res, 1)
            ax.hist(meas_res, bins=bins, histtype="stepfilled", alpha=0.8, color="cornflowerblue", label=f"LR meas {lbl_m}")
            ax.hist(pred_res, bins=bins, histtype="step", ec="r", label=f"HR pred {lbl_p}")
            ax.set_xlabel(r"$E_X - E_{truth}$ [MeV]")
            ax.set_title(title)
            ax.legend(fontsize=6)
            if L == "all":
                summary["res_event/pred_mean"], summary["res_event/pred_std"], summary["res_event/pred_iqr"] = stats

            ax = axes[1, col]
            with np.errstate(divide="ignore", invalid="ignore"):
                r_m = meas_res / truth
                r_p = pred_res / truth
            r_m, r_p = r_m[np.isfinite(r_m)], r_p[np.isfinite(r_p)]
            bins = robust_bins(r_m, r_p)
            lbl_m, _ = mean_std_iqr_label(r_m)
            lbl_p, stats = mean_std_iqr_label(r_p)
            ax.hist(r_m, bins=bins, histtype="stepfilled", alpha=0.8, color="cornflowerblue", label=f"LR meas {lbl_m}")
            ax.hist(r_p, bins=bins, histtype="step", ec="r", label=f"HR pred {lbl_p}")
            ax.set_xlabel(r"$(E_X - E_{truth}) / E_{truth}$")
            ax.legend(fontsize=6)
            if L == "all":
                summary["res_event/pred_rel_mean"], summary["res_event/pred_rel_std"], summary["res_event/pred_rel_iqr"] = stats
        fig.tight_layout()
        if dir:
            fig.savefig(f"{dir}/residual_event.png")
        return fig, summary

    def plot_residual_cell(self, dir=None, pred=None):
        """Per-cell residuals per ECAL layer (plot_summaries.py:123-227)."""
        import matplotlib.pyplot as plt

        pred = pred if pred is not None else self.high_e_pred
        fig, axes = plt.subplots(2, 4, figsize=(16, 8), dpi=120)
        for col, L in enumerate(["all", 0, 1, 2]):
            res, rel = [], []
            for i in range(self.n_events):
                sel = slice(None) if L == "all" else (self.high_layer[i] == L)
                t = self.high_e_truth[i][sel]
                p = np.asarray(pred[i])[sel]
                res.append(p - t)
                with np.errstate(divide="ignore", invalid="ignore"):
                    r = (p - t) / t
                rel.append(r[np.isfinite(r)])
            res = np.hstack(res) if res else np.zeros(0)
            rel = np.hstack(rel) if rel else np.zeros(0)
            title = "All layers" if L == "all" else f"ECAL{L + 1}"

            ax = axes[0, col]
            bins = robust_bins(res)
            lbl, _ = mean_std_iqr_label(res, 1)
            ax.hist(res, bins=bins, histtype="stepfilled", color="cornflowerblue", label=lbl)
            ax.set_xlabel(r"$E_{pred} - E_{truth}$ [MeV] (cell)")
            ax.set_title(title)
            ax.legend(fontsize=6)

            ax = axes[1, col]
            bins = robust_bins(rel)
            lbl, _ = mean_std_iqr_label(rel)
            ax.hist(rel, bins=bins, histtype="stepfilled", color="cornflowerblue", label=lbl)
            ax.set_xlabel(r"$(E_{pred} - E_{truth}) / E_{truth}$ (cell)")
            ax.legend(fontsize=6)
        fig.tight_layout()
        if dir:
            fig.savefig(f"{dir}/residual_cell.png")
        return fig

    def plot_residual_cell_for_one_event(self, ev_i: int = 0, dir=None, pred=None):
        """Per-cell residuals of a single event (plot_summaries.py variant)."""
        import matplotlib.pyplot as plt

        pred = pred if pred is not None else self.high_e_pred
        t = self.high_e_truth[ev_i]
        p = np.asarray(pred[ev_i])
        fig, axes = plt.subplots(1, 2, figsize=(9, 4), dpi=110)
        res = p - t
        from .util import mean_std_iqr_label

        lbl, _ = mean_std_iqr_label(res, 1)
        axes[0].hist(res, bins=robust_bins(res), histtype="stepfilled", color="cornflowerblue", label=lbl)
        axes[0].set_xlabel(r"$E_{pred} - E_{truth}$ [MeV]")
        axes[0].legend(fontsize=7)
        with np.errstate(divide="ignore", invalid="ignore"):
            rel = res / t
        rel = rel[np.isfinite(rel)]
        lbl, _ = mean_std_iqr_label(rel)
        axes[1].hist(rel, bins=robust_bins(rel), histtype="stepfilled", color="cornflowerblue", label=lbl)
        axes[1].set_xlabel(r"$(E_{pred} - E_{truth}) / E_{truth}$")
        axes[1].legend(fontsize=7)
        fig.tight_layout()
        if dir:
            fig.savefig(f"{dir}/residual_cell_ev{ev_i}.png")
        return fig

    def plot_evolution_raw_nn_dist(self, dir=None, max_events: int = 200):
        """Distribution of the NN-space prediction at each stored ODE time
        across events (plot_event_displays.py NN-space evolution variant)."""
        import matplotlib.pyplot as plt

        step_keys = sorted(self.high_raw_nn_pred_step)
        series = [("cond", self.high_raw_nn_cond), ("target", self.high_raw_nn_target)]
        series += [(k, self.high_raw_nn_pred_step[k]) for k in step_keys]
        series.append(("pred", self.high_raw_nn_pred))
        fig, ax = plt.subplots(figsize=(8, 5), dpi=110)
        for name, rows in series:
            flat = np.hstack([np.asarray(r) for r in rows[:max_events]])
            ax.hist(flat, bins=60, histtype="step", density=True, label=name)
        ax.legend(fontsize=7)
        ax.set_xlabel("NN-space value")
        if dir:
            fig.savefig(f"{dir}/evolution_nn_dist.png")
        return fig

    # ------------------------------------------------------------------
    def _bin_image(self, eta, phi, layer, values, L, high=True):
        """eta-phi 2D histogram for one layer at that layer's granularity;
        also usable as the binning self-check (plot_event_displays.py:143-156)."""
        gran = (self.high_gran if high else self.low_gran)[L]
        eta_edges = np.linspace(-3, 3, gran + 1)
        phi_edges = np.linspace(-np.pi, np.pi, gran + 1)
        sel = layer == L
        img, _, _ = np.histogram2d(
            eta[sel], phi[sel], bins=[eta_edges, phi_edges], weights=values[sel]
        )
        counts, _, _ = np.histogram2d(eta[sel], phi[sel], bins=[eta_edges, phi_edges])
        return img, counts

    def check_binning(self, ev_i: int) -> bool:
        """True iff no eta-phi bin receives more than one cell — i.e. the
        granularity constants match the data (plot_evolution check,
        plot_event_displays.py:143-156)."""
        for L in range(3):
            _, counts = self._bin_image(
                self.high_eta[ev_i], self.high_phi[ev_i], self.high_layer[ev_i],
                self.high_e_truth[ev_i], L,
            )
            if counts.max(initial=0) > 1:
                return False
        return True

    def plot_evolution(self, ev_i: int = 0, dir=None, check_binning: bool = False):
        """Event display: LR measured / HR truth / HR pred plus the stored
        ODE-time snapshots, per ECAL layer (plot_event_displays.py:10-161)."""
        import matplotlib.pyplot as plt

        if check_binning and not self.check_binning(ev_i):
            raise AssertionError("granularity constants do not match the data")

        step_keys = sorted(self.high_e_pred_step)
        cols = 3 + len(step_keys)
        fig, axes = plt.subplots(3, cols, figsize=(3 * cols, 9), dpi=100)
        for L in range(3):
            panels = [
                ("LR meas", self.low_eta[ev_i], self.low_phi[ev_i], self.low_layer[ev_i], self.low_e_measured[ev_i], False),
                ("HR truth", self.high_eta[ev_i], self.high_phi[ev_i], self.high_layer[ev_i], self.high_e_truth[ev_i], True),
            ]
            for k in step_keys:
                panels.append((k, self.high_eta[ev_i], self.high_phi[ev_i], self.high_layer[ev_i], np.asarray(self.high_e_pred_step[k][ev_i]), True))
            panels.append(("HR pred", self.high_eta[ev_i], self.high_phi[ev_i], self.high_layer[ev_i], np.asarray(self.high_e_pred[ev_i]), True))
            for c, (name, eta, phi, layer, vals, high) in enumerate(panels):
                img, _ = self._bin_image(eta, phi, layer, vals, L, high)
                ax = axes[L, c]
                nz = np.nonzero(img)
                if nz[0].size:
                    e0, e1 = nz[0].min(), nz[0].max() + 1
                    p0, p1 = nz[1].min(), nz[1].max() + 1
                    ax.imshow(img[e0:e1, p0:p1].T, origin="lower", cmap=self.cmap, aspect="auto")
                ax.set_title(f"L{L} {name}", fontsize=7)
                ax.set_xticks([])
                ax.set_yticks([])
        fig.tight_layout()
        if dir:
            fig.savefig(f"{dir}/evolution_ev{ev_i}.png")
        return fig

    def plot_evolution_raw_nn(self, ev_i: int = 0, dir=None):
        """NN-space evolution panels (plot_event_displays.py:164+)."""
        import matplotlib.pyplot as plt

        step_keys = sorted(self.high_raw_nn_pred_step)
        series = [("cond", self.high_raw_nn_cond[ev_i]), ("target", self.high_raw_nn_target[ev_i])]
        series += [(k, self.high_raw_nn_pred_step[k][ev_i]) for k in step_keys]
        series.append(("pred", self.high_raw_nn_pred[ev_i]))
        fig, axes = plt.subplots(1, len(series), figsize=(3 * len(series), 3), dpi=100)
        for ax, (name, vals) in zip(np.atleast_1d(axes), series):
            ax.hist(np.asarray(vals), bins=40, histtype="stepfilled", color="cornflowerblue")
            ax.set_title(name, fontsize=8)
        fig.tight_layout()
        if dir:
            fig.savefig(f"{dir}/evolution_nn_ev{ev_i}.png")
        return fig

    # ------------------------------------------------------------------
    def plot_residual_event_ens(self, dir=None):
        """Per-component overlays of the event-sum relative residual
        (plot_ensembles.py:12+)."""
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 5), dpi=120)
        truth = np.array([t.sum() for t in self.high_e_truth])
        bins = None
        for k in sorted(self.high_e_pred_raw_comp):
            p = np.array([np.asarray(x).sum() for x in self.high_e_pred_raw_comp[k]])
            with np.errstate(divide="ignore", invalid="ignore"):
                r = (p - truth) / truth
            r = r[np.isfinite(r)]
            if bins is None:
                bins = robust_bins(r)
            ax.hist(r, bins=bins, histtype="step", alpha=0.5)
        p = np.array([np.asarray(x).sum() for x in self.high_e_pred])
        with np.errstate(divide="ignore", invalid="ignore"):
            r = (p - truth) / truth
        r = r[np.isfinite(r)]
        lbl, _ = mean_std_iqr_label(r)
        ax.hist(r, bins=bins if bins is not None else 30, histtype="step", ec="k", lw=2, label=f"ensemble avg {lbl}")
        ax.set_xlabel(r"$(E_{pred} - E_{truth}) / E_{truth}$")
        ax.legend(fontsize=7)
        if dir:
            fig.savefig(f"{dir}/residual_event_ens.png")
        return fig

    def plot_ensemble_size_comparison(self, sizes=(2, 5, 10), dir=None):
        """Residual width vs ensemble size (plot_ensembles.py ensemble-size
        sweep; notebook cell 8 uses n in {2,5,10,25,50,100})."""
        import matplotlib.pyplot as plt

        truth = np.array([t.sum() for t in self.high_e_truth])
        widths, means = [], []
        usable = [n for n in sizes if n <= len(self.high_e_pred_raw_comp)]
        for n in usable:
            avg = self.compute_ensemble_average(n)
            p = np.array([np.asarray(x).sum() for x in avg])
            with np.errstate(divide="ignore", invalid="ignore"):
                r = (p - truth) / truth
            r = r[np.isfinite(r)]
            _, (mean, std, iqr) = mean_std_iqr_label(r)
            widths.append(iqr)
            means.append(mean)
        fig, ax = plt.subplots(figsize=(6, 4), dpi=120)
        ax.plot(usable, widths, "o-", label="IQR")
        ax.plot(usable, means, "s--", label="mean")
        ax.set_xlabel("ensemble size")
        ax.set_ylabel("relative residual")
        ax.legend()
        if dir:
            fig.savefig(f"{dir}/ensemble_size.png")
        return fig, dict(zip(usable, widths))


class PFPerformanceCOCOA(PerformanceCOCOA):
    """Joins the SR inference file with LR-PF and HR-PF outputs by the
    ``idx`` branch (performance.py:97-217)."""

    PF_COLORS = np.array(
        [(201, 58, 64), (242, 207, 1), (0, 152, 75), (101, 172, 228), (56, 34, 132), (160, 194, 56)]
    ) / 255.0

    def __init__(self, inference_path, lr_pf_path, hr_pf_path, res_factor, cmap="viridis"):
        super().__init__(inference_path, res_factor, cmap)

        def load_pf(path):
            tree = root_io.read_tree(path, "Particle_Tree")
            inc_keys = [k for k in tree if "pred_inc_wt_" in k]
            idx = np.asarray(tree["idx"])
            remap = np.argsort(idx)  # row order -> event order
            out = {"max_part": len(inc_keys)}
            for k in ["truth_pt_raw", "truth_eta_raw", "truth_phi", "truth_e_raw", "truth_dep_e_raw",
                      "pred_pt_raw", "pred_eta_raw", "pred_phi", "pred_e_raw"]:
                rows = _jag_list(tree[k])
                out[k] = [rows[i] for i in remap]
            for k in inc_keys:
                rows = _jag_list(tree[k])
                pi = int(k.split("_")[-1])
                out.setdefault("inc_wt", {})[pi] = [rows[i] for i in remap]
            out["pred_card"] = np.asarray(tree["pred_card"])[remap]
            out["truth_card"] = np.asarray(tree["truth_card"])[remap]
            return out

        lr, hr = load_pf(lr_pf_path), load_pf(hr_pf_path)
        self.max_part = lr["max_part"]

        # truth consistency between the LR-PF and HR-PF files (performance.py:182-186)
        for k in ["truth_pt_raw", "truth_eta_raw", "truth_phi", "truth_e_raw", "truth_dep_e_raw"]:
            assert np.allclose(np.hstack(lr[k]), np.hstack(hr[k])), f"LR/HR truth mismatch in {k}"

        self.truth_part_pt = lr["truth_pt_raw"]
        self.truth_part_eta = lr["truth_eta_raw"]
        self.truth_part_phi = lr["truth_phi"]
        self.truth_part_e = lr["truth_e_raw"]
        self.truth_part_dep_e = lr["truth_dep_e_raw"]

        self.low_part_pt, self.low_part_eta = lr["pred_pt_raw"], lr["pred_eta_raw"]
        self.low_part_phi, self.low_part_e = lr["pred_phi"], lr["pred_e_raw"]
        self.high_part_pt, self.high_part_eta = hr["pred_pt_raw"], hr["pred_eta_raw"]
        self.high_part_phi, self.high_part_e = hr["pred_phi"], hr["pred_e_raw"]
        self.inc_wt_lr_pf = lr.get("inc_wt", {})
        self.inc_wt_hr_pf = hr.get("inc_wt", {})

        self.pf_colors = self.PF_COLORS[: max(self.max_part, 1)]
        self.truth_cardinality = np.array([len(x) for x in self.truth_part_pt])
        self.low_cardinality = lr["pred_card"]
        self.high_cardinality = hr["pred_card"]

    # ------------------------------------------------------------------
    def get_rgb(self, inc_wt, ev_i, n_cells):
        """Per-cell RGB color as the incidence-weight mixture over particle
        colors (plot_event_displays_pf.py:12-28)."""
        rgb = np.zeros((n_cells, 3))
        total = np.zeros((n_cells, 1))
        for pi in range(self.max_part):
            if pi not in inc_wt:
                continue
            w = np.asarray(inc_wt[pi][ev_i])
            if len(w) != n_cells:
                # PF files are threshold-cut subsets of the SR cells; when the
                # counts disagree the alignment is unknown — skip coloring
                # (the reference skips such events, plot_event_displays_pf.py:59-66)
                return np.full((n_cells, 3), 0.6)
            rgb += w[:, None] * self.pf_colors[pi][None, :]
            total += w[:, None]
        total[total == 0] = 1.0
        return np.clip(rgb / total, 0, 1)

    def plot_pf_event_display(self, ev_i: int = 0, dir=None):
        """Cells colored by particle assignment, LR vs HR, per ECAL layer,
        with truth particle positions overlaid (plot_event_displays_pf.py)."""
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 3, figsize=(12, 8), dpi=110)
        for row, (eta, phi, layer, inc) in enumerate(
            [
                (self.low_eta[ev_i], self.low_phi[ev_i], self.low_layer[ev_i], self.inc_wt_lr_pf),
                (self.high_eta[ev_i], self.high_phi[ev_i], self.high_layer[ev_i], self.inc_wt_hr_pf),
            ]
        ):
            rgb = self.get_rgb(inc, ev_i, len(eta)) if inc else np.zeros((len(eta), 3))
            for L in range(3):
                ax = axes[row, L]
                sel = layer == L
                if sel.sum():
                    ax.scatter(eta[sel], phi[sel], c=rgb[sel], s=8, marker="s")
                for pi in range(len(self.truth_part_eta[ev_i])):
                    ax.plot(
                        self.truth_part_eta[ev_i][pi],
                        self.truth_part_phi[ev_i][pi],
                        "x",
                        color=self.pf_colors[pi % len(self.pf_colors)],
                        markersize=10,
                    )
                ax.set_title(f"{'LR' if row == 0 else 'HR'} L{L}", fontsize=8)
        fig.tight_layout()
        if dir:
            fig.savefig(f"{dir}/pf_event_display_ev{ev_i}.png")
        return fig

    def cardinality_confusion(self):
        """(LR, HR) confusion matrices pred x truth."""
        n = self.max_part + 1
        out = []
        for pred in [self.low_cardinality, self.high_cardinality]:
            cm = np.zeros((n, n), int)
            for t, p in zip(self.truth_cardinality, pred):
                cm[min(p, n - 1), min(t, n - 1)] += 1
            out.append(cm)
        return tuple(out)

    def kinematic_residuals(self):
        """Matched truth-pred residuals for pt/eta/phi/e, LR and HR."""
        res = {}
        for tag, (pt, eta, phi, e) in {
            "lr": (self.low_part_pt, self.low_part_eta, self.low_part_phi, self.low_part_e),
            "hr": (self.high_part_pt, self.high_part_eta, self.high_part_phi, self.high_part_e),
        }.items():
            for name, pred, truth in [
                ("pt", pt, self.truth_part_pt),
                ("eta", eta, self.truth_part_eta),
                ("phi", phi, self.truth_part_phi),
                ("e", e, self.truth_part_e),
            ]:
                diffs = []
                for i in range(len(truth)):
                    k = min(len(truth[i]), len(pred[i]))
                    d = np.asarray(truth[i][:k]) - np.asarray(pred[i][:k])
                    if name == "phi":
                        d = (d + np.pi) % (2 * np.pi) - np.pi
                    diffs.append(d)
                res[f"{tag}_{name}"] = np.hstack(diffs) if diffs else np.zeros(0)
        return res
