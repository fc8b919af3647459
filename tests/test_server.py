"""Online serving endpoint: event-in, prediction-out through the persistent
compiled sampler (inference/server.py), core path + HTTP round trip."""

import json
import os
import sys
import threading
import urllib.request

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from test_pf_pipeline import make_configs
    from superresolutionhep_tpu.data.synthetic import GeneratorConfig, write_synthetic_file
    from superresolutionhep_tpu.inference.server import SRServer
    from superresolutionhep_tpu.train.sr_trainer import SRTrainer

    d = tmp_path_factory.mktemp("serve")
    truth = write_synthetic_file(
        str(d / "ev.h5"), n_events=2, seed=9,
        config=GeneratorConfig(single_electron=True, window_lr_cells=1),
    )
    config_mv, config_t = make_configs(truth, truth, str(d / "run"))
    mv_path, t_path = str(d / "mv.yml"), str(d / "t.yml")
    yaml.safe_dump(config_mv, open(mv_path, "w"))
    yaml.safe_dump(config_t, open(t_path, "w"))
    trainer = SRTrainer(config_mv, config_t, run_dir=str(d / "run"), seed=0)

    srv = SRServer(
        {
            "model": {"config_path_mv": mv_path, "config_path_t": t_path,
                      "checkpoint_path": None, "n_steps": 3, "n_steps_to_store": 1},
            "n_ensemble": 2,
            "ode_method": "midpoint",
        },
        buckets=(256,),
        params=trainer.state.params,
    )
    return srv, truth


def _event_from_file(truth, idx=0):
    from superresolutionhep_tpu.data import root_io
    from superresolutionhep_tpu.inference.server import LOW_KEYS

    low = root_io.read_tree(truth, "Low_Tree", list(LOW_KEYS) + ["high_cell_to_low_cell_edge"], idx, idx + 1)
    high = root_io.read_tree(truth, "High_Tree", list(LOW_KEYS), idx, idx + 1)
    ev = {
        "low": {k: np.asarray(low[k][0]).tolist() for k in LOW_KEYS},
        "high": {k: np.asarray(high[k][0]).tolist() for k in LOW_KEYS if k != "cell_e"},
    }
    ev["low"]["high_cell_to_low_cell_edge"] = np.asarray(low["high_cell_to_low_cell_edge"][0]).tolist()
    return ev


def test_predict_event_core(server):
    srv, truth = server
    ev = _event_from_file(truth, 0)
    out = srv.predict_event(ev)
    n = out["n_cells"]
    assert n > 0 and out["bucket"] == 256
    assert len(out["e_pred_raw"]) == n == len(out["eta"]) == len(out["layer"])
    assert np.isfinite(out["e_pred_raw"]).all()
    assert all(l in (0, 1, 2) for l in out["layer"])  # ECAL cut applied
    # energy conservation within the transform's saturation bounds: each
    # prediction is a share of its parent LR energy (x f headroom)
    assert min(out["e_pred_raw"]) >= 0.0


def test_http_round_trip(server):
    srv, truth = server
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    t = threading.Thread(target=srv.serve, kwargs={"port": port}, daemon=True)
    t.start()
    import time

    deadline = time.time() + 20
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=2) as r:
                assert json.load(r)["ok"]
            break
        except Exception:
            time.sleep(0.3)
    else:
        pytest.fail("server did not come up")

    ev = _event_from_file(truth, 1)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict",
        data=json.dumps(ev).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        out = json.load(r)
    assert "e_pred_raw" in out and out["n_cells"] == len(out["e_pred_raw"])
    assert out["total_ms"] > 0

    # malformed request -> clean 400 with an error payload
    bad = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict", data=b"{}",
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(bad, timeout=60)
        pytest.fail("expected HTTPError")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.load(e)

    # oversize event -> 413 with a structured payload, server stays healthy.
    # Replicate BOTH trees so the schema stays valid (n_high == n_low * rf^2,
    # reorder map offset per replica block)
    big = _event_from_file(truth, 0)
    n_high0 = len(big["high"]["cell_eta"])
    factor = 300 // n_high0 + 2
    edge0 = big["low"]["high_cell_to_low_cell_edge"]
    for k in big["high"]:
        big["high"][k] = big["high"][k] * factor
    for k in big["low"]:
        if k != "high_cell_to_low_cell_edge":
            big["low"][k] = big["low"][k] * factor
    big["low"]["high_cell_to_low_cell_edge"] = [
        e + r * n_high0 for r in range(factor) for e in edge0
    ]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict", data=json.dumps(big).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(req, timeout=60)
        pytest.fail("expected HTTP 413")
    except urllib.error.HTTPError as e:
        assert e.code == 413
        payload = json.load(e)
        assert payload["max_cells"] == 256 and payload["n_cells"] > 256

    # concurrent requests: the device lock serialises, every client gets a
    # complete, correct response (no cross-talk, no 5xx)
    results = []
    errors = []

    def fire(idx):
        ev_i = _event_from_file(truth, idx % 2)
        r = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=json.dumps(ev_i).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(r, timeout=300) as resp:
                results.append(json.load(resp))
        except Exception as exc:  # pragma: no cover - failure detail
            errors.append(exc)

    threads = [threading.Thread(target=fire, args=(i,)) for i in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert len(results) == 6
    for out_i in results:
        assert out_i["n_cells"] == len(out_i["e_pred_raw"])
        assert np.isfinite(out_i["e_pred_raw"]).all()


def test_latency_script_event_contract(server):
    """The measure_serving_latency.py synth_event must satisfy the SRServer
    request contract (r3 queue burned ~55 min retrying a KeyError: the script
    built a flat dict where the server requires {"low": ..., "high": ...} —
    VERDICT r3 weak #4). Drives the real predict_event with the script's own
    event builder."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "measure_serving_latency",
        os.path.join(HERE, "..", "scripts", "measure_serving_latency.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    srv, _ = server
    ev = mod.synth_event(150, seed=3, res_factor=2)  # fixture config rf=2
    # contract shape: low/high trees with the full LOW_KEYS geometry + edge map
    from superresolutionhep_tpu.inference.server import LOW_KEYS

    assert set(LOW_KEYS) <= set(ev["low"])
    assert set(k for k in LOW_KEYS if k != "cell_e") <= set(ev["high"])
    n_hr = len(ev["high"]["cell_eta"])
    assert sorted(ev["low"]["high_cell_to_low_cell_edge"]) == list(range(n_hr))
    assert n_hr == len(ev["low"]["cell_eta"]) * 4  # rf^2 children per LR cell

    out = srv.predict_event(ev)
    assert out["n_cells"] == n_hr  # ECAL-only event: nothing cut
    assert out["bucket"] == 256
    assert len(out["e_pred_raw"]) == n_hr
    assert np.isfinite(out["e_pred_raw"]).all()


def test_concurrent_requests_batch_together(server):
    """4 threads issuing same-bucket requests share one compiled program:
    every result is well-formed, per-row outputs are split correctly (each
    row's n_cells matches its own event), and at least one response reports
    batched_with > 1.  Single-stream requests keep batched_with == 1."""
    srv, truth = server
    evs = [_event_from_file(truth, i % 2) for i in range(4)]

    solo = srv.predict_event(evs[0])
    assert solo["batched_with"] == 1

    results = [None] * 4
    errors = []

    def client(i):
        try:
            results[i] = srv.predict_event(evs[i])
        except Exception as e:  # pragma: no cover
            errors.append(e)

    import threading as th
    threads = [th.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors
    assert all(r is not None for r in results)
    for i, r in enumerate(results):
        n_expected = len(evs[i]["high"]["cell_eta"])
        # ECAL cut may drop cells; n_cells must match THIS event's own solo
        # prediction, proving rows were not swapped between requests
        solo_i = srv.predict_event(evs[i])
        assert r["n_cells"] == solo_i["n_cells"]
        assert len(r["e_pred_raw"]) == r["n_cells"] <= n_expected
        np.testing.assert_allclose(r["eta"], solo_i["eta"])
    assert max(r["batched_with"] for r in results) > 1


def test_adaptive_policy_fifo_above_threshold(server):
    """Buckets above batch_max_bucket must run FIFO at B=1 even under
    concurrency (the adaptive policy: at production ensemble width a lone
    large request already saturates the chip, so grouping only adds window
    waits — BASELINE.md round-5 serving). Force the fixture's one bucket
    (256) above the threshold and check no request reports batched_with>1;
    outputs must still match solo predictions."""
    srv, truth = server
    evs = [_event_from_file(truth, i % 2) for i in range(4)]
    solos = [srv.predict_event(ev) for ev in evs]

    old = srv.batch_max_bucket
    srv.batch_max_bucket = 0  # every bucket now "large"
    try:
        results = [None] * 4
        errors = []

        def client(i):
            try:
                results[i] = srv.predict_event(evs[i])
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
    finally:
        srv.batch_max_bucket = old

    assert not errors
    assert all(r is not None for r in results)
    for r, s in zip(results, solos):
        assert r["batched_with"] == 1
        assert r["n_cells"] == s["n_cells"]
        np.testing.assert_allclose(r["eta"], s["eta"])
