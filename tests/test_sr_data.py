import numpy as np
import pytest

from superresolutionhep_tpu.data.bucketing import BucketBatcher
from superresolutionhep_tpu.data.sr_dataset import SupResEvents, collate, model_batch
from superresolutionhep_tpu.data.synthetic import GeneratorConfig, write_synthetic_file


@pytest.fixture(scope="module")
def sr_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "train.h5"
    write_synthetic_file(
        str(path), n_events=12, seed=7, config=GeneratorConfig(max_particles=3)
    )
    return str(path)


@pytest.fixture(scope="module")
def config_mv():
    return {
        "graph_building": "all2all",
        "res_factor": 2,
        "var_transform": {
            "eta": {"transformation": None, "scale_mode": "min_max", "min": -2.988, "max": 2.988, "range": [-1, 1]},
            "e": {"transformation": "pow(x,m)", "m": 0.2, "scale_mode": "standard"},
        },
        "target_transform": {
            "transformation": "logit_ratio",
            "f": 1.2,
            "alpha": 1.0e-6,
            "scale_mode": "standard",
            "mean": -1.1424768,
            "std": 3.616942,
        },
    }


def test_event_preprocessing_invariants(sr_file, config_mv):
    ds = SupResEvents(sr_file, config_mv, make_low=True, make_particles=True)
    assert len(ds) == 12
    ev = ds.get_event(0)

    rf2 = 4
    n_low, n_high = len(ev.low["e_meas_raw"]), len(ev.high["e_truth_raw"])
    assert n_high == rf2 * n_low

    # proxy of HR cell k == LR cell k//rf2 (reorder semantics, dataset.py:120-127,222-226)
    np.testing.assert_allclose(
        ev.high["e_proxy_raw"], np.repeat(ev.low["e_meas_raw"], rf2), rtol=1e-6
    )

    # ECAL-only after the cut
    assert ev.high["layer"].max() < 3
    assert ev.low["layer"].max() < 3

    # per-event conditional scaling: transformed LR energies ~ N(0,1)
    t = ev.low["e_meas_raw"] ** 0.2
    # low was cut to ECAL but stats were fitted pre-cut; recompute manually
    assert "mean" in ev.cond_params and "std" in ev.cond_params

    # target inverse recovers truth (up to the ratio clamp at proxy*f)
    from superresolutionhep_tpu.transforms import TargetTransform

    tt = TargetTransform.from_config(config_mv["target_transform"])
    rec = np.asarray(tt.inverse(ev.high["target"], ev.high["e_proxy_raw"]))
    clipped_truth = np.minimum(ev.high["e_truth_raw"], ev.high["e_proxy_raw"] * 1.2)
    np.testing.assert_allclose(rec, clipped_truth, rtol=1e-4, atol=1e-6)

    # incidence: HR energy matrix sums over ECAL cells to particle dep_e
    np.testing.assert_allclose(
        ev.high_e_part.sum(axis=0), ev.particles["dep_e"], rtol=1e-4
    )
    # LR incidence is the rf2-fold sum of HR children
    np.testing.assert_allclose(
        ev.low_e_part, ev.high_e_part.reshape(n_low, rf2, -1).sum(1), rtol=1e-5
    )


def test_collate_and_model_batch(sr_file, config_mv):
    ds = SupResEvents(sr_file, config_mv, make_low=True, make_particles=True)
    events = [ds.get_event(i) for i in range(4)] + [None]  # one filler slot
    pad_n = max(len(e.high["eta"]) for e in events[:4])
    pad_n = int(np.ceil(pad_n / 128)) * 128
    batch = collate(events, pad_n, with_low=True, pad_n_low=pad_n // 4 + 32)

    assert batch["eta"].shape == (5, pad_n, 1)
    assert batch["q_mask"].shape == (5, pad_n)
    assert batch["q_mask"][4].sum() == 0  # filler fully masked
    for i in range(4):
        assert batch["q_mask"][i].sum() == len(events[i].high["eta"])
    # values preserved under padding
    np.testing.assert_allclose(
        batch["target"][0, : len(events[0].high["target"]), 0], events[0].high["target"]
    )
    mb = model_batch(batch)
    assert set(mb) == {"eta", "cosphi", "sinphi", "layer", "e_proxy", "q_mask", "target"}

    assert len(batch["particle_pt"]) == 5
    assert batch["particle_pt"][4].shape == (0,)


def test_bucket_batcher_covers_all_events_once():
    rng = np.random.default_rng(0)
    counts = rng.integers(10, 700, size=223)
    bb = BucketBatcher(counts, quantum=128, cost_budget=512 * 512 * 8, shuffle=True, seed=1)
    seen = []
    for idxs, bucket in bb:
        assert bucket.pad_n % 128 == 0
        real = idxs[idxs >= 0]
        assert np.all(counts[real] <= bucket.pad_n)
        # memory-control semantics: batch * pad^2 bounded (single-event floor)
        assert bucket.batch_size * bucket.pad_n**2 <= 512 * 512 * 8 or bucket.batch_size == 1
        seen.extend(real.tolist())
    assert sorted(seen) == list(range(223))
    assert len(bb) == sum(1 for _ in bb)


def test_bucket_batcher_tail_shrink():
    """Underfilled tail batches shrink their batch dim to the smallest
    power-of-two fraction that still fits (padded slots cost real compute);
    coverage and batch count are unchanged."""
    rng = np.random.default_rng(3)
    counts = rng.integers(10, 700, size=67)
    bb = BucketBatcher(
        counts, quantum=128, cost_budget=512 * 512 * 8, shuffle=False,
        tail_shrink=True, batch_multiple_of=2,
    )
    seen = []
    for idxs, bucket in bb:
        real = idxs[idxs >= 0]
        assert np.all(counts[real] <= bucket.pad_n)
        # shrunk tails: at most a 2x batch-dim overhead, mesh multiple kept
        assert len(idxs) < 2 * max(len(real), 1) or len(idxs) == 2
        assert len(idxs) % 2 == 0
        seen.extend(real.tolist())
    assert sorted(seen) == list(range(67))
    assert len(bb) == sum(1 for _ in bb)

    # non-power-of-two bucket batch size (14 at pad 384 under this budget):
    # halving must STOP at a non-multiple (14 -> 7 would break 2-device
    # sharding) rather than emit an odd batch
    counts3 = np.full(3, 300)  # one tail batch of 3 events in a bs=14 bucket
    bb3 = BucketBatcher(
        counts3, quantum=128, cost_budget=384 * 384 * 14, max_batch_size=14,
        shuffle=False, tail_shrink=True, batch_multiple_of=2,
    )
    (idxs3, b3), = list(bb3)
    assert b3.batch_size % 2 == 0
    assert (idxs3 >= 0).sum() == 3


def test_bucket_batcher_tail_exact():
    """tail_shrink='exact' sizes the tail batch to ceil(n_real / mesh) * mesh:
    zero filler rows beyond mesh rounding (an 18-event tail in a 64-batch
    bucket runs B=18, not the pow2 mode's B=32), coverage unchanged."""
    counts = np.full(18, 300)  # one underfilled tail in a 64-batch bucket
    bb = BucketBatcher(
        counts, quantum=128, cost_budget=384 * 384 * 64, max_batch_size=64,
        shuffle=False, tail_shrink="exact",
    )
    (idxs, bucket), = list(bb)
    assert bucket.batch_size == 18 and (idxs >= 0).all()

    # mesh multiple respected: 18 events on a 4-device data mesh -> B=20
    bb4 = BucketBatcher(
        counts, quantum=128, cost_budget=384 * 384 * 64, max_batch_size=64,
        shuffle=False, tail_shrink="exact", batch_multiple_of=4,
    )
    (idxs4, b4), = list(bb4)
    assert b4.batch_size == 20 and (idxs4 >= 0).sum() == 18

    # full batches keep the bucket's nominal size; coverage is exact
    rng = np.random.default_rng(5)
    counts2 = rng.integers(10, 700, size=137)
    bb2 = BucketBatcher(
        counts2, quantum=128, cost_budget=512 * 512 * 8, shuffle=True, seed=2,
        tail_shrink="exact",
    )
    seen = []
    for idxs2, b2 in bb2:
        real = idxs2[idxs2 >= 0]
        assert np.all(counts2[real] <= b2.pad_n)
        # exact tails: never more than batch_multiple_of-1 filler rows
        assert len(idxs2) - len(real) == 0 or len(idxs2) == b2.batch_size
        seen.extend(real.tolist())
    assert sorted(seen) == list(range(137))
    assert len(bb2) == sum(1 for _ in bb2)


def test_bucket_batcher_option_validation():
    """String knobs (env vars, YAML) are normalized: 'off'/'0'/'false' disable
    tail shrink instead of silently enabling pow2 mode; unknown strings and
    non-128-multiple fine quanta raise."""
    import pytest

    counts = np.full(18, 300)
    for off in ("off", "0", "false", False, "none"):
        bb = BucketBatcher(counts, quantum=128, max_batch_size=64,
                           shuffle=False, tail_shrink=off)
        (idxs, bucket), = list(bb)
        assert bucket.batch_size == 64  # no shrink: full filler batch
    for pow2 in (True, "true", "1", "pow2"):
        bb = BucketBatcher(counts, quantum=128, max_batch_size=64,
                           shuffle=False, tail_shrink=pow2)
        (idxs, bucket), = list(bb)
        assert bucket.batch_size == 32  # pow2 halving
    with pytest.raises(ValueError):
        BucketBatcher(counts, quantum=128, tail_shrink="exactly")
    with pytest.raises(ValueError):
        BucketBatcher(counts, quantum=512, fine_quantum=200, fine_above=0)


def test_bucket_batcher_hybrid_quantum():
    """fine_quantum/fine_above pad long events at the finer quantum while
    short events keep the coarse one; every event still lands in the
    smallest bucket that fits it and coverage is exact."""
    counts = np.array([100, 600, 3050, 3100, 4700, 5000])
    bb = BucketBatcher(
        counts, quantum=512, fine_quantum=256, fine_above=3072,
        cost_budget=4096 * 4096 * 16, max_batch_size=64,
        shuffle=False, tail_shrink="exact",
    )
    pads = {b.pad_n for b in bb.buckets}
    # 100,600,3050 coarse -> 512,1024,3072; 3100,4700,5000 fine -> 3328,4864,5120
    assert pads == {512, 1024, 3072, 3328, 4864, 5120}
    seen = []
    for idxs, bucket in bb:
        real = idxs[idxs >= 0]
        assert np.all(counts[real] <= bucket.pad_n)
        seen.extend(real.tolist())
    assert sorted(seen) == list(range(len(counts)))


def test_collate_edge_mask_all2all_and_predefined():
    from superresolutionhep_tpu.data.sr_dataset import SupResEvent, collate

    high = {k: np.zeros(3, np.float32) for k in
            ["eta", "phi", "cosphi", "sinphi", "e_truth", "e_proxy",
             "eta_raw", "e_truth_raw", "e_proxy_raw", "target"]}
    high["layer"] = np.zeros(3, np.int32)
    ev_all = SupResEvent(high, {"eta_raw": np.zeros(1)}, None, None, None, {}, 0)
    ev_pre = SupResEvent(high, {"eta_raw": np.zeros(1)}, None, None, None, {}, 1,
                         edges=(np.array([0, 1, 2]), np.array([1, 2, 0])))
    b = collate([ev_all, ev_pre], pad_n=8, with_edge_mask=True)
    em = b["edge_mask"]
    assert em.shape == (2, 8, 8)
    assert em[0, :3, :3].all() and not em[0, 3:, :].any()
    expect = np.zeros((8, 8), bool)
    expect[[0, 1, 2], [1, 2, 0]] = True
    np.testing.assert_array_equal(em[1], expect)


def test_generator_conflicting_regimes_rejected(tmp_path):
    """collimate + localized-axis are mutually exclusive generator regimes:
    composing them silently replaced the collimated draw with independent
    jitter, so the generator must reject the combination."""
    import pytest as _pytest

    from superresolutionhep_tpu.data.synthetic import GeneratorConfig, write_synthetic_file

    with _pytest.raises(ValueError, match="mutually exclusive"):
        write_synthetic_file(
            str(tmp_path / "x.h5"), n_events=1, seed=0,
            config=GeneratorConfig(
                max_particles=3, collimate_delta_r_lr_cells=1.5, axis_eta=0.35
            ),
        )


def test_bucket_batcher_merge_tail_up():
    """merge_tail_up=k moves <=k-event bucket tails into the next-larger
    bucket: coverage stays exact, every event still fits its batch's pad,
    and the tiny tail batches disappear."""
    # bucket pads 128/256/384; 128-bucket has a 2-event tail, 256 a 1-event
    counts = np.array([100] * 10 + [200] * 9 + [300] * 4)
    kw = dict(quantum=128, cost_budget=512 * 512 * 8, max_batch_size=8,
              shuffle=False, tail_shrink="exact")
    bb0 = BucketBatcher(counts, **kw)
    bb = BucketBatcher(counts, merge_tail_up=2, **kw)
    assert len(bb) < len(bb0)
    seen, sizes = [], []
    for idxs, bucket in bb:
        real = idxs[idxs >= 0]
        assert np.all(counts[real] <= bucket.pad_n)
        seen.extend(real.tolist())
        sizes.append(len(real))
    assert sorted(seen) == list(range(len(counts)))
    assert len(bb) == sum(1 for _ in bb)
    # no batch smaller than the merge threshold except possibly the LAST
    # bucket's tail (nowhere to merge up)
    assert all(s > 2 for s in sizes[:-1])
