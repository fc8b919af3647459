"""Online SR serving: a persistent compiled sampler behind an HTTP endpoint.

The reference deploys stage 1 as offline PBS batch jobs only; for online
use (trigger-adjacent reconstruction, monitoring) the same pipeline is
wrapped here as a long-lived process that:

  * loads a checkpoint once and jit-compiles the ensemble sampler per
    bucket shape at startup (warmup), so requests never pay compile time;
  * accepts one event per request (LR cells + HR geometry + reorder map,
    the same schema as the file-based pipeline, minus any truth energies);
  * pads the event to the nearest precompiled bucket and returns predicted
    HR ECAL energies (MeV) with per-request device latency.

No external dependencies: stdlib http.server; requests serialize through a
device lock (one chip, one stream).  Throughput scaling is horizontal —
run one server per chip and shard upstream, exactly like the chunked
batch fan-out.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..config import load_yaml
from ..data import root_io
from ..data.jagged import Jagged2Array, JaggedArray
from ..data.sr_dataset import SupResEvents, collate
from .sr import SRInference

LOW_KEYS = ("cell_eta", "cell_phi", "cell_layer", "cell_e", "cell_x", "cell_y", "cell_z")

# default buckets cover the full multipart range (bench events run to ~5k HR
# cells); single_e-only deployments can pass a smaller set to cut warmup time
DEFAULT_BUCKETS = (256, 512, 1024, 2048, 3072, 4096, 5120)


class EventTooLargeError(ValueError):
    """Request event exceeds the largest precompiled bucket (HTTP 413)."""

    def __init__(self, n: int, max_cells: int):
        super().__init__(
            f"event with {n} HR cells exceeds the largest serving bucket "
            f"{max_cells}; start the server with a larger --buckets set"
        )
        self.n = n
        self.max_cells = max_cells


def _event_to_file(event: dict, path: str):
    """Write a single request event into the standard two-tree container the
    preprocessing pipeline reads (truth-energy branches zero-filled)."""
    low = {k: JaggedArray.from_list([np.asarray(event["low"][k])]) for k in LOW_KEYS}
    low["high_cell_to_low_cell_edge"] = JaggedArray.from_list(
        [np.asarray(event["low"]["high_cell_to_low_cell_edge"], np.int64)]
    )
    n_high = len(event["high"]["cell_eta"])
    high = {}
    for k in LOW_KEYS:
        vals = event["high"].get(k)
        if vals is None and k == "cell_e":
            vals = np.zeros(n_high, np.float32)  # truth unknown at serving time
        high[k] = JaggedArray.from_list([np.asarray(vals)])
    # particle branches are not needed for prediction; keep the schema valid
    for k in ("particle_pt", "particle_eta", "particle_phi", "particle_e",
              "particle_pdgid", "particle_dep_energy"):
        low[k] = JaggedArray.from_list([np.zeros(0, np.float32)])
    high["particle_to_node_idx"] = Jagged2Array.from_list([[]])
    high["particle_to_node_weight"] = Jagged2Array.from_list([[]])
    root_io.write_trees(path, {"Low_Tree": low, "High_Tree": high})


class SRServer:
    def __init__(self, inf_cfg: dict, buckets=DEFAULT_BUCKETS, params=None):
        self.inf = SRInference(inf_cfg, params=params)
        self.n_ensemble = int(inf_cfg.get("n_ensemble", 10))
        self.method = inf_cfg.get("ode_method", "ab2e")
        self.buckets = sorted(buckets)
        self._lock = threading.Lock()
        self._key_counter = 0

    # ------------------------------------------------------------------
    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise EventTooLargeError(n, self.buckets[-1])

    def predict_event(self, event: dict) -> dict:
        import jax
        import jax.numpy as jnp

        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "event.h5")
            _event_to_file(event, path)
            ds = SupResEvents(path, self.inf.config_mv, make_low=False, make_particles=False)
            ev = ds.get_event(0)
        n = len(ev.high["e_proxy"])
        pad = self._bucket(n)
        hb = collate([ev], pad)
        # EXACTLY the model key set — a superset would change the traced
        # pytree structure and silently recompile per request
        from ..data.sr_dataset import MODEL_BATCH_KEYS

        batch = {k: jnp.asarray(hb[k]) for k in MODEL_BATCH_KEYS}
        with self._lock:
            self._key_counter += 1
            key = jax.random.PRNGKey(self._key_counter)
            if self.inf.fast_softmax and not self.inf._nomax_validated:
                # cold start without warmup(): gate the no-max kernel here
                self.inf.fast_softmax = self.inf._validate_nomax(batch)
                self.inf._nomax_validated = True
            t0 = time.time()
            out = self.inf._jitted(
                batch, key, n_ensemble=self.n_ensemble, n_steps=self.inf.n_steps,
                method=self.method, fast=self.inf.fast_softmax,
            )
            out = np.asarray(out[:, -1])  # (E, B, N, 1) final state
            device_ms = (time.time() - t0) * 1e3
        proxy_raw = np.asarray(ev.high["e_proxy_raw"])
        avg = out[:, 0, :n, 0]
        e_pred = np.asarray(
            self.inf.target_transform.inverse(avg, proxy_raw[None, :])
        ).mean(0) * 1e3  # unscale-then-avg, GeV -> MeV
        return {
            "n_cells": int(n),
            "bucket": int(pad),
            "e_pred_raw": e_pred.astype(float).tolist(),
            "eta": np.asarray(ev.high["eta_raw"]).astype(float).tolist(),
            "phi": np.asarray(ev.high["phi"]).astype(float).tolist(),
            "layer": np.asarray(ev.high["layer"]).astype(int).tolist(),
            "device_ms": round(device_ms, 2),
        }

    def warmup(self):
        """Compile every bucket shape once with a dummy event."""
        import jax
        import jax.numpy as jnp

        from ..data.sr_dataset import MODEL_BATCH_KEYS

        for b in self.buckets:
            full = {
                "eta": jnp.zeros((1, b, 1)), "cosphi": jnp.ones((1, b, 1)),
                "sinphi": jnp.zeros((1, b, 1)), "layer": jnp.zeros((1, b, 1), jnp.int32),
                "e_proxy": jnp.zeros((1, b, 1)), "q_mask": jnp.ones((1, b), bool),
                "target": jnp.zeros((1, b, 1)),
            }
            batch = {k: full[k] for k in MODEL_BATCH_KEYS}
            # NOTE: warmup only compiles — the no-max saturation gate must
            # run on REAL shower data (an all-zeros dummy has trivially
            # in-bound logits and would rubber-stamp the fast kernel), so
            # _nomax_validated is left unset for the first real request
            t0 = time.time()
            out = self.inf._jitted(
                batch, jax.random.PRNGKey(0), n_ensemble=self.n_ensemble,
                n_steps=self.inf.n_steps, method=self.method,
                fast=self.inf.fast_softmax,
            )
            float(np.asarray(out).sum())
            print(f"[serve] warmed bucket {b}: {time.time() - t0:.1f}s", flush=True)

    # ------------------------------------------------------------------
    def serve(self, host="127.0.0.1", port=8310):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path == "/health":
                    body = json.dumps({"ok": True, "buckets": server.buckets}).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_response(404)
                    self.end_headers()

            def do_POST(self):
                if self.path != "/predict":
                    self.send_response(404)
                    self.end_headers()
                    return
                try:
                    length = int(self.headers["Content-Length"])
                    event = json.loads(self.rfile.read(length))
                    t0 = time.time()
                    result = server.predict_event(event)
                    result["total_ms"] = round((time.time() - t0) * 1e3, 2)
                    body = json.dumps(result).encode()
                    code = 200
                except EventTooLargeError as e:  # graceful oversize handling
                    body = json.dumps(
                        {"error": str(e), "n_cells": e.n, "max_cells": e.max_cells}
                    ).encode()
                    code = 413
                except Exception as e:  # surface errors to the client
                    body = json.dumps({"error": f"{type(e).__name__}: {e}"}).encode()
                    code = 400
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        httpd = ThreadingHTTPServer((host, port), Handler)
        print(f"[serve] listening on {host}:{port}", flush=True)
        httpd.serve_forever()
