import jax.numpy as jnp
import numpy as np
import pytest

from superresolutionhep_tpu.transforms import TargetTransform, VarTransform

RNG = np.random.default_rng(0)


@pytest.mark.parametrize(
    "cfg",
    [
        {"transformation": None, "scale_mode": "standard", "mean": 2.155, "std": 1225.709},
        {"transformation": None, "scale_mode": "min_max", "min": -2.988, "max": 2.988, "range": [-1, 1]},
        {"transformation": "pow(x,m)", "m": 0.2, "scale_mode": "standard", "mean": 1.3, "std": 0.7},
        {"transformation": "pow(x,m)_signed", "m": 0.5, "scale_mode": "min_max", "min": -3.0, "max": 3.0, "range": [-2, 2]},
        {"transformation": "pow(x,m)", "m": 0.5, "scale_mode": None},
    ],
)
def test_var_transform_roundtrip(cfg):
    tr = VarTransform.from_config(cfg)
    x = np.abs(RNG.normal(1.0, 0.5, size=1000)).astype(np.float64) + 0.01
    if cfg["transformation"] == "pow(x,m)_signed":
        x = RNG.normal(0, 1.0, size=1000)
    y = tr.forward(x)
    x_rec = tr.inverse(y)
    np.testing.assert_allclose(x_rec, x, rtol=1e-9, atol=1e-10)


def test_var_transform_matches_manual_math():
    # pow(x,m) + standard: y = (x^m - mean)/std  (transformation.py:19-48)
    tr = VarTransform.from_config(
        {"transformation": "pow(x,m)", "m": 0.2, "scale_mode": "standard", "mean": 0.4, "std": 0.25}
    )
    x = np.array([0.5, 1.0, 8.0])
    np.testing.assert_allclose(tr.forward(x), (x**0.2 - 0.4) / 0.25, rtol=1e-12)


def test_fit_per_event_stats_use_unbiased_std():
    tr = VarTransform.from_config({"transformation": "pow(x,m)", "m": 0.2, "scale_mode": "standard"})
    x = np.abs(RNG.normal(1.0, 0.5, size=64)) + 0.01
    fitted = tr.fit(x)
    t = x**0.2
    assert fitted.mean == pytest.approx(t.mean())
    assert fitted.std == pytest.approx(t.std(ddof=1))  # torch.std default is unbiased
    y = fitted.forward(x)
    assert abs(y.mean()) < 1e-9
    assert y.std(ddof=1) == pytest.approx(1.0)


def test_fit_masked_matches_fit_on_valid_subset():
    tr = VarTransform.from_config({"transformation": None, "scale_mode": "standard"})
    x = RNG.normal(0, 1, size=(3, 32)).astype(np.float32)
    mask = np.zeros((3, 32), bool)
    lengths = [10, 32, 7]
    for i, n in enumerate(lengths):
        mask[i, :n] = True
    fm = tr.fit_masked(jnp.asarray(x), jnp.asarray(mask))
    for i, n in enumerate(lengths):
        ref = tr.fit(x[i, :n])
        np.testing.assert_allclose(np.asarray(fm.mean)[i, 0], ref.mean, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(fm.std)[i, 0], ref.std, rtol=1e-4)


def test_fit_masked_minmax():
    tr = VarTransform.from_config(
        {"transformation": None, "scale_mode": "min_max", "range": [-1, 1]}
    )
    x = RNG.normal(0, 1, size=(2, 16)).astype(np.float32)
    mask = np.zeros((2, 16), bool)
    mask[0, :5] = True
    mask[1, :16] = True
    fm = tr.fit_masked(jnp.asarray(x), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(fm.min)[0, 0], x[0, :5].min(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fm.max)[0, 0], x[0, :5].max(), rtol=1e-6)


def test_target_transform_roundtrip_and_values():
    cfg = {
        "transformation": "logit_ratio",
        "f": 1.2,
        "alpha": 1.0e-6,
        "scale_mode": "standard",
        "mean": -1.1424768,
        "std": 3.616942,
    }
    tt = TargetTransform.from_config(cfg)
    proxy = np.abs(RNG.normal(1.0, 0.3, size=200)) + 0.05
    truth = proxy * RNG.uniform(0.0, 1.19, size=200)

    y = tt.forward(truth, proxy)
    rec = tt.inverse(y, proxy)
    np.testing.assert_allclose(rec, truth, rtol=1e-5, atol=1e-7)

    # manual math (target_transformation.py:8-15)
    ratio = np.clip(truth / (proxy * 1.2), 0, 1)
    ratio = 1e-6 + (1 - 2e-6) * ratio
    logit = np.log(ratio / (1 - ratio))
    np.testing.assert_allclose(y, (logit - cfg["mean"]) / cfg["std"], rtol=1e-9)


def test_target_transform_clamps_ratio_above_one():
    cfg = {
        "transformation": "logit_ratio",
        "f": 1.2,
        "alpha": 1.0e-6,
        "scale_mode": "standard",
        "mean": 0.0,
        "std": 1.0,
    }
    tt = TargetTransform.from_config(cfg)
    proxy = np.array([1.0])
    truth = np.array([5.0])  # ratio would be > 1 -> clamped
    y = tt.forward(truth, proxy)
    rec = tt.inverse(y, proxy)
    np.testing.assert_allclose(rec, proxy * 1.2, rtol=1e-4)


def test_transform_works_under_jit():
    import jax

    tr = VarTransform.from_config(
        {"transformation": "pow(x,m)", "m": 0.5, "scale_mode": "standard", "mean": 1.0, "std": 2.0}
    )

    @jax.jit
    def go(t, x):
        return t.forward(x)

    x = jnp.abs(jnp.arange(8.0)) + 0.1
    np.testing.assert_allclose(np.asarray(go(tr, x)), (np.asarray(x) ** 0.5 - 1.0) / 2.0, rtol=1e-6)
