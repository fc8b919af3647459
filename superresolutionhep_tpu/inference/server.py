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

Cross-request batching (round 5): concurrent requests that land in the same
bucket within a short window are collated into ONE ensemble-sampler call —
the online analog of the reference's batch-500 offline amortization
(/root/reference/configs/single_e/inference.yml:5).  A single device worker
drains a queue; a request entering alone runs immediately at B=1 (no added
single-stream latency — the window is only waited out when other requests
are actually in flight), while N concurrent clients share one program at
the exact group row count (one compile per row count up to max_batch,
precompiled at warmup; filler rows would be pure wasted flops on a
compute-saturated chip).  Measured round 4 (pre-batching): 4 clients
serialized at ~1x single-stream throughput with ~4x per-request p50.
Where batching wins is the small-event regime (bucket <=512), where a
single request underfills the chip; at L>=2048 x 10 ensembles a lone
request already saturates it and batching only amortizes dispatch.
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


def _event_to_trees(event: dict):
    """Build in-memory Low/High tree dicts for ``SupResEvents.from_trees``
    (same schema as ``_event_to_file`` minus the HDF5 round-trip; truth
    energies zero-filled — unknown at serving time)."""
    low = {k: [np.asarray(event["low"][k])] for k in LOW_KEYS}
    low["high_cell_to_low_cell_edge"] = [
        np.asarray(event["low"]["high_cell_to_low_cell_edge"], np.int64)
    ]
    n_high = len(event["high"]["cell_eta"])
    high = {}
    for k in LOW_KEYS:
        vals = event["high"].get(k)
        if vals is None and k == "cell_e":
            vals = np.zeros(n_high, np.float32)
        high[k] = [np.asarray(vals)]
    return low, high


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


class _WorkItem:
    """One queued request: preprocessed event + a completion signal."""

    __slots__ = ("ev", "n", "bucket", "done", "result", "error")

    def __init__(self, ev, n: int, bucket: int):
        self.ev = ev
        self.n = n
        self.bucket = bucket
        self.done = threading.Event()
        self.result = None
        self.error = None


class SRServer:
    def __init__(self, inf_cfg: dict, buckets=DEFAULT_BUCKETS, params=None,
                 max_batch: int | None = None, batch_window_ms: float | None = None):
        self.inf = SRInference(inf_cfg, params=params)
        self.n_ensemble = int(inf_cfg.get("n_ensemble", 10))
        self.method = inf_cfg.get("ode_method", "ab2e")
        self.buckets = sorted(buckets)
        self._lock = threading.Lock()
        self._key_counter = 0
        # cross-request batching: requests in the same bucket arriving within
        # the window share one compiled program at the EXACT group row count.
        # Exact (not pow2) rows matter: at production ensemble width the chip
        # is already compute-saturated per request at L>=2048, so any filler
        # row is pure wasted flops (a 3-request group padded to B=4 executes
        # 33% extra work — measured as a net concurrency LOSS, BASELINE.md
        # round-5 serving).  max_batch is small, so one compile per row count
        # is cheap.
        self.max_batch = int(
            inf_cfg.get("max_batch", 4) if max_batch is None else max_batch
        )
        self.batch_window_ms = float(
            inf_cfg.get("batch_window_ms", 10.0)
            if batch_window_ms is None
            else batch_window_ms
        )
        self.row_sizes = list(range(1, self.max_batch + 1))
        # adaptive policy: batch only buckets where a single request
        # underfills the chip.  At bucket>batch_max_bucket a lone request is
        # already compute-saturated (ens x L work), so grouping adds window
        # waits + lockstep completion for zero device win — measured 5.05
        # ev/s batched vs 6.05 FIFO at 1900 cells (BASELINE.md round-5
        # serving); below it the sampler is dispatch-latency-bound through
        # the tunnel and rows ride along nearly free.
        self.batch_max_bucket = int(inf_cfg.get("batch_max_bucket", 1024))
        self._cond = threading.Condition()
        self._queue: list[_WorkItem] = []
        self._preprocessing = 0  # requests past entry, not yet enqueued
        self._worker = threading.Thread(target=self._worker_loop, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------------
    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise EventTooLargeError(n, self.buckets[-1])

    def _row_size(self, n_rows: int) -> int:
        return min(n_rows, self.max_batch)

    def predict_event(self, event: dict) -> dict:
        """Synchronous request path: preprocess in the caller's thread
        (overlaps across concurrent clients), enqueue, wait for the device
        worker to run it — alone or batched with concurrent requests."""
        with self._cond:
            self._preprocessing += 1
        try:
            low, high = _event_to_trees(event)
            ds = SupResEvents.from_trees(
                low, high, self.inf.config_mv, make_low=False, make_particles=False
            )
            ev = ds.get_event(0)
            n = len(ev.high["e_proxy"])
            item = _WorkItem(ev, n, self._bucket(n))
        finally:
            with self._cond:
                self._preprocessing -= 1
        with self._cond:
            self._queue.append(item)
            self._cond.notify_all()
        item.done.wait()
        if item.error is not None:
            raise item.error
        return item.result

    # ------------------------------------------------------------------
    def _worker_loop(self):
        while True:
            with self._cond:
                while not self._queue:
                    self._cond.wait()
                bucket = self._queue[0].bucket
                if bucket > self.batch_max_bucket:
                    # saturated regime: plain FIFO at B=1, no window
                    group = [self._queue.pop(0)]
                else:
                    deadline = time.time() + self.batch_window_ms / 1e3
                    while True:
                        group = [it for it in self._queue if it.bucket == bucket]
                        group = group[: self.max_batch]
                        if len(group) >= self.max_batch:
                            break
                        # wait out the window ONLY while other requests are
                        # still preprocessing (they will enqueue within
                        # ~window) — a lone request runs immediately at B=1
                        if self._preprocessing <= 0 and len(group) == len(self._queue):
                            break
                        remaining = deadline - time.time()
                        if remaining <= 0:
                            break
                        self._cond.wait(timeout=min(remaining, 0.002))
                    group = [
                        it for it in self._queue if it.bucket == bucket
                    ][: self.max_batch]
                    for it in group:
                        self._queue.remove(it)
            try:
                self._run_group(group)
            except Exception as e:  # surface to every waiting caller
                for it in group:
                    it.error = e
                    it.done.set()

    def _run_group(self, group: list[_WorkItem]):
        import jax
        import jax.numpy as jnp

        from ..data.sr_dataset import MODEL_BATCH_KEYS

        pad = group[0].bucket
        b_exec = self._row_size(len(group))
        # filler rows (duplicates of the first event) bring the row count to
        # a precompiled size; their outputs are discarded
        evs = [it.ev for it in group] + [group[0].ev] * (b_exec - len(group))
        hb = collate(evs, pad)
        # EXACTLY the model key set — a superset would change the traced
        # pytree structure and silently recompile per request
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
        for i, it in enumerate(group):
            ev, n = it.ev, it.n
            proxy_raw = np.asarray(ev.high["e_proxy_raw"])
            avg = out[:, i, :n, 0]
            e_pred = np.asarray(
                self.inf.target_transform.inverse(avg, proxy_raw[None, :])
            ).mean(0) * 1e3  # unscale-then-avg, GeV -> MeV
            it.result = {
                "n_cells": int(n),
                "bucket": int(pad),
                "e_pred_raw": e_pred.astype(float).tolist(),
                "eta": np.asarray(ev.high["eta_raw"]).astype(float).tolist(),
                "phi": np.asarray(ev.high["phi"]).astype(float).tolist(),
                "layer": np.asarray(ev.high["layer"]).astype(int).tolist(),
                "device_ms": round(device_ms, 2),
                "batched_with": len(group),
            }
            it.done.set()

    def warmup(self, batch_sizes=None, buckets=None):
        """Compile every (bucket, row-count) shape once with a dummy event.

        ``batch_sizes`` defaults to the full pow2 ladder up to ``max_batch``;
        pass ``(1,)`` to restore the round-4 single-row warmup cost.
        ``buckets`` restricts the warmed set (e.g. warm the multi-row shapes
        only for the bucket a concurrent deployment actually serves)."""
        import jax
        import jax.numpy as jnp

        from ..data.sr_dataset import MODEL_BATCH_KEYS

        sizes = list(batch_sizes) if batch_sizes is not None else list(self.row_sizes)
        for b in (self.buckets if buckets is None else sorted(buckets)):
            # multi-row programs are only ever dispatched for buckets the
            # adaptive policy actually batches
            b_sizes = sizes if b <= self.batch_max_bucket else [r for r in sizes if r == 1]
            for rows in b_sizes:
                full = {
                    "eta": jnp.zeros((rows, b, 1)), "cosphi": jnp.ones((rows, b, 1)),
                    "sinphi": jnp.zeros((rows, b, 1)),
                    "layer": jnp.zeros((rows, b, 1), jnp.int32),
                    "e_proxy": jnp.zeros((rows, b, 1)), "q_mask": jnp.ones((rows, b), bool),
                    "target": jnp.zeros((rows, b, 1)),
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
                print(
                    f"[serve] warmed bucket {b} x {rows} rows: {time.time() - t0:.1f}s",
                    flush=True,
                )

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
