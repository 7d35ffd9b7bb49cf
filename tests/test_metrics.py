"""Evaluation metric tests vs sklearn and naive oracles."""

import numpy as np
import pytest
from sklearn.metrics import mean_absolute_error, mean_squared_error, r2_score

from multi_modal_gnn_tpu.evaluation.baselines import (
    GlobalMeanBaseline,
    PerLabMeanBaseline,
    evaluate_baselines,
)
from multi_modal_gnn_tpu.evaluation.metrics import (
    compute_per_lab_metrics,
    compute_regression_metrics,
    stratify_by_lab_frequency,
    stratify_by_patient_degree,
    winsorize_residuals,
)


def test_metrics_match_sklearn(rng):
    y = rng.standard_normal(500)
    p = y + 0.3 * rng.standard_normal(500)
    m = compute_regression_metrics(p, y)
    assert m["mae"] == pytest.approx(mean_absolute_error(y, p), rel=1e-9)
    assert m["rmse"] == pytest.approx(np.sqrt(mean_squared_error(y, p)), rel=1e-9)
    assert m["r2"] == pytest.approx(r2_score(y, p), rel=1e-9)
    nz = y != 0
    mape = np.mean(np.abs((y[nz] - p[nz]) / y[nz])) * 100
    assert m["mape"] == pytest.approx(mape, rel=1e-9)


def test_winsorize_matches_naive(rng):
    n = 300
    labs = rng.integers(0, 5, n)
    y = rng.standard_normal(n)
    p = y + rng.standard_normal(n)
    p[::37] += 25.0  # inject outliers
    got, capped = winsorize_residuals(p, y, labs, sigma=3.0)
    assert capped > 0
    for lab in range(5):
        m = labs == lab
        r = (p - y)[m]
        lo, hi = r.mean() - 3 * r.std(), r.mean() + 3 * r.std()
        np.testing.assert_allclose(got[m], y[m] + np.clip(r, lo, hi), rtol=1e-9)
    # winsorized metrics can only improve or tie MAE
    assert compute_regression_metrics(got, y)["mae"] <= compute_regression_metrics(p, y)["mae"]


def test_per_lab_metrics_table(rng):
    labs = np.repeat(np.arange(4), 25)
    y = rng.standard_normal(100)
    p = y + 0.1
    df = compute_per_lab_metrics(p, y, labs, lab_names={0: "glucose"}, min_samples=2)
    assert len(df) == 4
    assert set(df.columns) >= {"mae", "rmse", "r2", "mape", "lab_index", "lab_name", "num_samples"}
    assert df.iloc[0]["mae"] <= df.iloc[-1]["mae"]  # sorted
    assert "glucose" in set(df["lab_name"])
    # single-sample lab excluded
    df2 = compute_per_lab_metrics(
        np.array([1.0, 1.0, 2.0]), np.array([1.0, 1.0, 2.0]), np.array([0, 0, 1])
    )
    assert set(df2["lab_index"]) == {0}


def test_baselines(rng):
    train_v = rng.standard_normal(1000) + 2.0
    train_l = rng.integers(0, 10, 1000)
    test_v = rng.standard_normal(200) + 2.0
    test_l = rng.integers(0, 10, 200)
    res = evaluate_baselines(train_v, train_l, test_v, test_l, num_labs=10)
    assert res["global_mean"]["mae"] > 0
    gm = GlobalMeanBaseline().fit(train_v)
    np.testing.assert_allclose(gm.predict(3), train_v.mean())
    plm = PerLabMeanBaseline(10).fit(train_v, train_l)
    for lab in range(10):
        np.testing.assert_allclose(plm.lab_means[lab], train_v[train_l == lab].mean())


def test_evaluate_baselines_sideinfo(rng):
    """With memberships provided, evaluate_baselines also scores the
    side-information baseline under the 'sideinfo_als' key."""
    num_p, num_l = 60, 10
    train_p = rng.integers(0, num_p, 1000)
    train_l = rng.integers(0, num_l, 1000)
    train_v = rng.standard_normal(1000)
    test_p = rng.integers(0, num_p, 200)
    test_l = rng.integers(0, num_l, 200)
    test_v = rng.standard_normal(200)
    m = (rng.random((num_p, 7)) < 0.3).astype(np.float32)
    res = evaluate_baselines(
        train_v, train_l, test_v, test_l, num_l,
        train_patient_indices=train_p, test_patient_indices=test_p,
        num_patients=num_p, include_nn=False, include_als=True,
        als_rank=4, memberships=m,
    )
    assert "sideinfo_als" in res and "als_matrix_factorization" in res
    assert np.isfinite(res["sideinfo_als"]["mae"])


def test_stratifications(rng):
    n = 200
    p_idx = rng.integers(0, 50, n)
    l_idx = rng.integers(0, 8, n)
    deg = rng.integers(0, 30, 50)
    lab_counts = rng.integers(1, 100, 8).astype(float)
    y = rng.standard_normal(n)
    pr = y + 0.2
    by_deg = stratify_by_patient_degree(pr, y, p_idx, deg)
    assert sum(v["num_samples"] for v in by_deg.values()) <= n
    for v in by_deg.values():
        assert v["mae"] == pytest.approx(0.2, abs=1e-9)
    by_freq = stratify_by_lab_frequency(pr, y, l_idx, lab_counts)
    assert sum(v["num_samples"] for v in by_freq.values()) == n


def test_nearest_neighbor_baseline(rng):
    from multi_modal_gnn_tpu.evaluation.baselines import NearestNeighborBaseline

    # two exact twin patients: the NN prediction for a held-out lab must be
    # the twin's value
    num_patients, num_labs = 4, 5
    nn = NearestNeighborBaseline(num_patients, num_labs)
    p = np.array([0, 0, 0, 1, 1, 1, 2, 3])
    l = np.array([0, 1, 2, 0, 1, 2, 0, 4])
    v = np.array([1.0, 2.0, 3.0, 1.0, 2.0, 2.9, -5.0, 7.0])
    nn.fit(v, p, l)
    # patient 0's lab 2 held out -> nearest donor should be twin patient 1
    pred = nn.predict(np.array([0]), np.array([2]))
    assert pred[0] == pytest.approx(2.9)
    # lab nobody observed -> fallback 0
    pred2 = nn.predict(np.array([0]), np.array([3]))
    assert pred2[0] == 0.0
    # never predicts from yourself even if you observed the lab
    pred3 = nn.predict(np.array([3]), np.array([4]))
    assert pred3[0] == 0.0  # no other donor has lab 4


def test_class_weights():
    from multi_modal_gnn_tpu.utils.rng import compute_class_weights

    w = compute_class_weights(np.array([0, 0, 0, 1]), num_classes=2)
    assert w[1] > w[0]
    assert w.mean() == pytest.approx(1.0, rel=1e-6)


def test_sideinfo_cold_start_formula(rng):
    """fold_in/predict_cold_start: zero-obs predictions are exactly
    bias + H @ (m @ mem_proj); with observations the u-solve uses the
    membership-adjusted residuals."""
    from multi_modal_gnn_tpu.evaluation.baselines import SideInfoALSBaseline

    num_p, num_l = 80, 12
    p = rng.integers(0, num_p, 1500)
    l = rng.integers(0, num_l, 1500)
    v = rng.standard_normal(1500)
    m = (rng.random((num_p, 9)) < 0.3).astype(np.float32)
    si = SideInfoALSBaseline(num_p, num_l, rank=3, mem_rank=2, iters=5).fit(v, p, l, m)

    row = m[5]
    # zero observations
    pred0 = si.predict_cold_start(np.zeros(0, int), np.zeros(0), np.arange(num_l), row)
    g = row.astype(np.float64) @ si.mem_proj
    np.testing.assert_allclose(pred0, si.lab_bias + si.H @ g, rtol=1e-10)

    # with observations: manual ridge reproduction
    obs_l = np.array([0, 3, 7])
    obs_v = np.array([0.5, -1.0, 2.0])
    c = si.C[obs_l]
    resid = obs_v - si.lab_bias[obs_l] - si.H[obs_l] @ g
    u = np.linalg.solve(si.reg * np.eye(3) + c.T @ c, c.T @ resid)
    want = si.lab_bias + si.C @ u + si.H @ g
    got = si.predict_cold_start(obs_l, obs_v, np.arange(num_l), row)
    np.testing.assert_allclose(got, want, rtol=1e-10)

    # wrong membership width refuses
    import pytest as _pytest
    with _pytest.raises(ValueError, match="membership width"):
        si.fold_in(obs_l, obs_v, row[:4])
