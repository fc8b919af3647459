"""Metrics / observability sink.

The reference logs scalars and matplotlib images to Comet ML with a local
``plot_dump/`` fallback (train.py:87-104, lightning.py:271-286).  Here the
default sink is a local JSONL stream (machine-greppable, survives headless
runs) plus a plot directory; a Comet adapter slots in when the library is
available.  jax.profiler hooks are exposed because events/sec/chip is the
north-star metric (SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax


class MetricsLogger:
    def __init__(self, run_dir: str, use_comet: bool = False, comet_kwargs: Optional[dict] = None):
        self.run_dir = os.path.abspath(run_dir)
        os.makedirs(self.run_dir, exist_ok=True)
        self.plot_dir = os.path.join(self.run_dir, "plot_dump")
        os.makedirs(self.plot_dir, exist_ok=True)
        self._fp = open(os.path.join(self.run_dir, "metrics.jsonl"), "a", buffering=1)
        self._t0 = time.time()
        self._write_run_metadata()

        self.comet = None
        if use_comet:
            try:  # pragma: no cover - optional dependency
                import comet_ml  # type: ignore

                self.comet = comet_ml.Experiment(**(comet_kwargs or {}))
            except Exception:
                self.comet = None

    def _write_run_metadata(self):
        """Provenance snapshot — the analog of the reference uploading its
        configs and full source tree to Comet (train.py:96-104): record the
        command line, git revision and device topology."""
        import subprocess
        import sys

        meta = {"argv": sys.argv, "t": time.time()}
        try:
            meta["git_rev"] = (
                subprocess.check_output(
                    ["git", "rev-parse", "HEAD"], cwd=os.path.dirname(os.path.abspath(__file__)),
                    stderr=subprocess.DEVNULL,
                ).decode().strip()
            )
        except Exception:
            pass
        try:
            meta["devices"] = [str(d) for d in jax.devices()]
            meta["backend"] = jax.default_backend()
        except Exception:
            pass
        with open(os.path.join(self.run_dir, "run_metadata.json"), "w") as fp:
            json.dump(meta, fp, indent=2)

    def snapshot_source(self, configs: Optional[dict] = None):
        """Zip the framework source + resolved configs into the run dir and
        attach it to Comet when available — full parity with the reference
        uploading its configs and source tree as experiment assets
        (train.py:96-104).  A training run's exact code is then recoverable
        from the run dir alone, independent of git state."""
        import zipfile

        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        repo_root = os.path.dirname(pkg_root)
        zip_path = os.path.join(self.run_dir, "source_snapshot.zip")
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for base, _, files in os.walk(pkg_root):
                for f in sorted(files):
                    if f.endswith(".py"):
                        p = os.path.join(base, f)
                        zf.write(p, os.path.relpath(p, repo_root))
            for f in ("train.py", "inference.py", "train_pf.py", "inference_pf.py"):
                p = os.path.join(repo_root, f)
                if os.path.exists(p):
                    zf.write(p, f)
            if configs:
                import yaml

                for name, cfg in configs.items():
                    zf.writestr(f"configs_resolved/{name}.yml", yaml.safe_dump(cfg))
        if self.comet is not None:  # pragma: no cover
            self.comet.log_asset(zip_path, file_name="source_snapshot.zip")
        return zip_path

    def log_scalars(self, scalars: dict, step: int, prefix: str = ""):
        rec = {"step": step, "t": round(time.time() - self._t0, 3)}
        for k, v in scalars.items():
            key = f"{prefix}{k}"
            try:
                rec[key] = float(v)
            except (TypeError, ValueError):
                continue
        self._fp.write(json.dumps(rec) + "\n")
        if self.comet is not None:  # pragma: no cover
            self.comet.log_metrics({k: v for k, v in rec.items() if k not in ("step", "t")}, step=step)

    def log_figure(self, fig, name: str):
        path = os.path.join(self.plot_dir, f"{name}.png")
        fig.savefig(path)
        if self.comet is not None:  # pragma: no cover
            self.comet.log_image(path, name=name)
        return path

    def start_profile(self):
        jax.profiler.start_trace(os.path.join(self.run_dir, "profile"))

    def stop_profile(self):
        jax.profiler.stop_trace()

    def close(self):
        self._fp.close()
