"""Utility tests: normalizer semantics, outlier removal, RNG streams, io."""

import numpy as np
import pandas as pd
import pytest

from multi_modal_gnn_tpu.utils.io import load_json, save_json
from multi_modal_gnn_tpu.utils.normalizer import (
    LabNormalizer,
    remove_outliers,
    remove_outliers_grouped,
)
from multi_modal_gnn_tpu.utils.rng import RngSequence
from multi_modal_gnn_tpu.utils.timing import format_time


class TestLabNormalizer:
    def test_zscore_roundtrip(self, rng):
        vals = pd.Series(rng.normal(50, 10, 200))
        n = LabNormalizer("zscore")
        z = n.fit_transform(vals, "glucose")
        assert z.mean() == pytest.approx(0, abs=1e-9)
        assert z.std() == pytest.approx(1, rel=1e-9)
        back = n.inverse_transform(z, "glucose")
        np.testing.assert_allclose(back, vals, rtol=1e-9)

    def test_minmax(self, rng):
        vals = pd.Series(rng.uniform(5, 25, 100))
        n = LabNormalizer("minmax")
        z = n.fit_transform(vals, "x")
        assert z.min() == pytest.approx(0) and z.max() == pytest.approx(1)
        np.testing.assert_allclose(n.inverse_transform(z, "x"), vals, rtol=1e-9)

    def test_robust(self, rng):
        vals = pd.Series(rng.standard_normal(100))
        n = LabNormalizer("robust")
        z = n.fit_transform(vals, "x")
        assert z.median() == pytest.approx(0, abs=1e-9)
        np.testing.assert_allclose(n.inverse_transform(z, "x"), vals, rtol=1e-8)

    def test_degenerate_zero_spread(self):
        vals = pd.Series([5.0, 5.0, 5.0])
        nz = LabNormalizer("zscore")
        assert (nz.fit_transform(vals, "x") == 0).all()
        nm = LabNormalizer("minmax")
        assert (nm.fit_transform(vals, "x") == 0).all()

    def test_unknown_lab_passthrough(self):
        n = LabNormalizer("zscore")
        vals = pd.Series([1.0, 2.0])
        pd.testing.assert_series_equal(n.transform(vals, "never_fit"), vals)

    def test_vectorized_matches_scalar(self, rng):
        df = pd.DataFrame(
            {
                "ITEMID": np.repeat([10, 20, 30], 50),
                "VALUE": np.concatenate(
                    [rng.normal(5, 1, 50), rng.normal(100, 20, 50), rng.normal(0, 3, 50)]
                ),
            }
        )
        vec = LabNormalizer("zscore").fit_transform_frame(df, "VALUE", "ITEMID")
        scalar = LabNormalizer("zscore")
        expected = df["VALUE"].copy()
        for item in [10, 20, 30]:
            m = df["ITEMID"] == item
            expected[m] = scalar.fit_transform(df.loc[m, "VALUE"], item)
        np.testing.assert_allclose(vec, expected, rtol=1e-9)

    def test_frame_serialization(self, rng):
        df = pd.DataFrame({"ITEMID": np.repeat([1, 2], 20), "VALUE": rng.normal(0, 1, 40)})
        n = LabNormalizer("zscore").fit_frame(df, "VALUE", "ITEMID")
        n2 = LabNormalizer.from_frame(n.to_frame())
        assert n2.stats[1]["center"] == pytest.approx(n.stats[1]["center"])


class TestOutliers:
    def test_std_method(self):
        vals = pd.Series([1.0] * 20 + [1000.0])
        out = remove_outliers(vals, "std", threshold=3.0)
        assert np.isnan(out.iloc[-1])
        assert out.iloc[:20].notna().all()

    def test_iqr_method(self, rng):
        vals = pd.Series(np.concatenate([rng.standard_normal(100), [50.0]]))
        out = remove_outliers(vals, "iqr", threshold=1.5)
        assert np.isnan(out.iloc[-1])

    def test_grouped_matches_per_group(self, rng):
        df = pd.DataFrame(
            {
                "ITEMID": np.repeat([1, 2], 51),
                "VALUE": np.concatenate(
                    [np.append(rng.standard_normal(50), 100.0),
                     np.append(rng.normal(0, 100, 50), 1.0)]
                ),
            }
        )
        got = remove_outliers_grouped(df, "VALUE", "ITEMID", threshold=5.0)
        for item in [1, 2]:
            m = df["ITEMID"] == item
            want = remove_outliers(df.loc[m, "VALUE"], "std", 5.0)
            np.testing.assert_array_equal(got[m].isna(), want.isna())


class TestRng:
    def test_streams_independent_and_deterministic(self):
        import jax

        a = RngSequence(42)
        b = RngSequence(42)
        k1, k2 = a.next("init"), b.next("init")
        assert jax.random.uniform(k1) == jax.random.uniform(k2)
        assert jax.random.uniform(a.next("init")) != jax.random.uniform(k1)
        assert jax.random.uniform(a.key_for("mask", 5)) == jax.random.uniform(
            b.key_for("mask", 5)
        )
        assert jax.random.uniform(a.key_for("mask", 5)) != jax.random.uniform(
            a.key_for("dropout", 5)
        )


def test_json_numpy_roundtrip(tmp_path):
    obj = {"a": np.float32(1.5), "b": np.arange(3), "c": np.bool_(True)}
    p = save_json(obj, tmp_path / "x.json")
    back = load_json(p)
    assert back == {"a": 1.5, "b": [0, 1, 2], "c": True}


def test_format_time():
    assert format_time(42.0) == "42.0s"
    assert format_time(195) == "3m 15s"
    assert format_time(3720) == "1h 02m"


def test_get_device_cpu():
    from multi_modal_gnn_tpu.utils.platform import get_device

    d = get_device("auto")
    assert d is not None
    d2 = get_device("cpu")
    assert d2.platform == "cpu"


def test_compute_regression_loss_api():
    import jax.numpy as jnp

    from multi_modal_gnn_tpu.models.losses import compute_regression_loss

    p = jnp.array([1.0, 2.0]); t = jnp.array([0.0, 4.0])
    assert float(compute_regression_loss(p, t, "mae")) == pytest.approx(1.5)
    assert float(compute_regression_loss(p, t, "mse")) == pytest.approx(2.5)
