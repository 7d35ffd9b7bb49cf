"""Bayes-optimal conditional performance ceiling for the synthetic generator.

The synthetic cohort (data/synthetic.py) draws normalized lab values from a
jointly-Gaussian low-rank model:

    z_p ~ N(0, I_k)
    v(p, l) = s * <w_l, z_p> + sigma * eps,     sigma^2 = 1 - s^2

The *unconditional* ceiling s^2 (variance explainable with oracle z) is the
wrong yardstick for mask-and-recover training: the model only observes a
patient's TRAIN-split lab values, so the right ceiling is the Bayes-optimal
predictor of a held-out value given those observations.  For this generator
that predictor has a closed form — the Gaussian posterior over z_p given the
observed values:

    A_p   = I_k + (s^2 / sigma^2) * W_O^T W_O          (posterior precision)
    mu_p  = A_p^{-1} (s / sigma^2) W_O^T v_O           (posterior mean)
    yhat  = s * <w_l, mu_p>
    E[(y - yhat)^2] = s^2 * w_l^T A_p^{-1} w_l + sigma^2

Because Var(v) = 1 by construction, the expected ceiling R^2 is simply
1 - mean_q(residual variance).  This module computes both the *expected*
ceiling (exact, averaged over noise draws) and the *realized* metrics of the
oracle predictor on the actual sampled test values.

No analogue exists in the reference (its quality number is measured on real
eICU data); this is the yardstick VERDICT r1 required for interpreting
synthetic-cohort R^2.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from multi_modal_gnn_tpu.evaluation.metrics import compute_regression_metrics


def gaussian_posterior_means(
    w_lab: np.ndarray,
    signal: float,
    obs_patient: np.ndarray,
    obs_lab: np.ndarray,
    obs_values: np.ndarray,
    num_patients: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-patient posterior (mean, covariance) of z given observed values.

    Returns (mu [P, k], cov [P, k, k]).  Patients with no observations get
    the prior (mu = 0, cov = I).
    """
    w_lab = np.asarray(w_lab, dtype=np.float64)
    k = w_lab.shape[1]
    s = float(signal)
    sigma2 = max(1.0 - s * s, 1e-12)
    c = (s * s) / sigma2

    w_obs = w_lab[obs_lab]  # [E, k]
    precision = np.tile(np.eye(k), (num_patients, 1, 1))
    outer = w_obs[:, :, None] * w_obs[:, None, :]  # [E, k, k]
    np.add.at(precision, obs_patient, c * outer)

    rhs = np.zeros((num_patients, k))
    np.add.at(rhs, obs_patient, (s / sigma2) * w_obs * obs_values[:, None])

    cov = np.linalg.inv(precision)
    mu = np.einsum("pij,pj->pi", cov, rhs)
    return mu, cov


def gaussian_conditional_ceiling(
    w_lab: np.ndarray,
    signal: float,
    obs_patient: np.ndarray,
    obs_lab: np.ndarray,
    obs_values: np.ndarray,
    query_patient: np.ndarray,
    query_lab: np.ndarray,
    query_values: Optional[np.ndarray] = None,
    num_patients: Optional[int] = None,
) -> Dict:
    """Bayes-optimal prediction of query edges given observed edges.

    ``obs_*`` are the (patient, lab, normalized value) triples the model is
    allowed to see (the train split); ``query_*`` are the held-out edges.
    Returns expected (exact) and realized (sampled) ceiling metrics.
    """
    if num_patients is None:
        num_patients = int(max(obs_patient.max(), query_patient.max())) + 1
    s = float(signal)
    sigma2 = max(1.0 - s * s, 1e-12)

    mu, cov = gaussian_posterior_means(
        w_lab, s, obs_patient, obs_lab, obs_values, num_patients
    )

    w_q = np.asarray(w_lab, dtype=np.float64)[query_lab]  # [Q, k]
    predictions = s * np.einsum("qk,qk->q", w_q, mu[query_patient])

    # exact residual variance per query: s^2 w^T cov w + sigma^2
    cov_q = cov[query_patient]  # [Q, k, k]
    resid_var = s * s * np.einsum("qi,qij,qj->q", w_q, cov_q, w_q) + sigma2
    expected_r2 = float(1.0 - resid_var.mean())  # Var(v) == 1 by construction
    # residuals are Gaussian, so E|resid| = sqrt(2/pi) * std
    expected_mae = float(np.sqrt(2.0 / np.pi) * np.sqrt(resid_var).mean())
    expected_rmse = float(np.sqrt(resid_var.mean()))

    out: Dict = {
        "expected": {"r2": expected_r2, "mae": expected_mae, "rmse": expected_rmse},
        "unconditional_r2": s * s,
        "predictions": predictions,
        "mean_posterior_var": float(
            np.trace(cov.sum(axis=0)) / (num_patients * cov.shape[1])
        ),
    }
    if query_values is not None:
        out["realized"] = compute_regression_metrics(predictions, np.asarray(query_values))
    return out


def crossfit_oracle_ceiling(
    w_lab: np.ndarray,
    signal: float,
    z: np.ndarray,
    features: np.ndarray,
    query_patient: np.ndarray,
    query_lab: np.ndarray,
    query_values: np.ndarray,
    regs: tuple = (1.0, 10.0, 30.0, 100.0, 300.0),
    folds: int = 5,
    seed: int = 7,
) -> Dict:
    """Empirical oracle ceiling for NON-Gaussian conditioning information.

    The closed-form ceiling above conditions only on observed lab VALUES.
    Membership side information (dx/rx relations — data/synthetic.py tilts
    their sampling by the same latent z) breaks the Gaussian conjugacy, so
    the combined ceiling is estimated empirically: ridge-fit the oracle map
    ``z ~ features`` CROSS-FITTED over patients (a patient's own realized z
    never enters its fit — removing the memorization leak), predict
    ``s * <w_l, zhat_p>`` on the query edges, and take the best regularizer
    by query R^2 (optimism is fine in a ceiling).  ``features`` is anything
    a model could condition on: labs-only posterior means, membership
    one-hots, or their concatenation.
    """
    w_lab = np.asarray(w_lab, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    num_patients, k = z.shape
    s = float(signal)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(num_patients)
    feats = np.hstack([np.asarray(features, dtype=np.float64),
                       np.ones((num_patients, 1))])
    d = feats.shape[1]

    best: Dict = {}
    for reg in regs:
        zhat = np.zeros((num_patients, k))
        for f in range(folds):
            hold = perm[f::folds]
            mask = np.ones(num_patients, bool)
            mask[hold] = False
            a = feats[mask].T @ feats[mask] + reg * np.eye(d)
            b = np.linalg.solve(a, feats[mask].T @ z[mask])
            zhat[hold] = feats[hold] @ b
        pred = s * np.einsum("qk,qk->q", w_lab[query_lab], zhat[query_patient])
        m = compute_regression_metrics(pred, np.asarray(query_values))
        if not best or m["r2"] > best["realized"]["r2"]:
            best = {"realized": m, "reg": reg}
    best["folds"] = folds
    return best


def lmmse_conditional_ceiling(
    w_eff: np.ndarray,
    noise_var: np.ndarray,
    z_cov: np.ndarray,
    obs_patient: np.ndarray,
    obs_lab: np.ndarray,
    obs_values: np.ndarray,
    query_patient: np.ndarray,
    query_lab: np.ndarray,
    query_values: np.ndarray,
    mean_shift: Optional[np.ndarray] = None,
    num_patients: Optional[int] = None,
) -> Dict:
    """Heteroscedastic LMMSE ceiling for the eicu-phenomenology generator.

    Generalizes :func:`gaussian_conditional_ceiling` to the effective linear
    model the eicu mode emits (data/synthetic.py SyntheticLatents):

        value_norm ~= <w_eff[l], z> - mean_shift[l] + noise,
        Var(noise | l) = noise_var[l],

    with per-lab loading magnitudes and per-lab noise variances instead of
    unit rows and one scalar.  The per-patient GLS posterior is

        z_hat_p = (C^-1 + sum_l W_l W_l^T / s2_l)^-1 sum_l W_l y_l / s2_l

    with C the empirical latent covariance.  Because the eicu latents are
    NOT jointly Gaussian (skewed severity, scale-mixture noise, selection-
    biased observation), this is the optimal *linear* predictor, an
    approximate — not exact — Bayes ceiling; treat it as a strong yardstick,
    not an upper bound certificate.  Returns realized query metrics.
    """
    w_eff = np.asarray(w_eff, dtype=np.float64)
    noise_var = np.asarray(noise_var, dtype=np.float64)
    shift = (
        np.zeros(w_eff.shape[0])
        if mean_shift is None
        else np.asarray(mean_shift, dtype=np.float64)
    )
    if num_patients is None:
        num_patients = int(max(obs_patient.max(), query_patient.max())) + 1
    k = w_eff.shape[1]

    w_obs = w_eff[obs_lab]  # [E, k]
    inv_s2 = 1.0 / np.maximum(noise_var[obs_lab], 1e-8)  # [E]
    precision = np.tile(np.linalg.inv(z_cov + 1e-9 * np.eye(k)), (num_patients, 1, 1))
    outer = w_obs[:, :, None] * w_obs[:, None, :] * inv_s2[:, None, None]
    np.add.at(precision, obs_patient, outer)

    y = np.asarray(obs_values, dtype=np.float64) + shift[obs_lab]
    rhs = np.zeros((num_patients, k))
    np.add.at(rhs, obs_patient, w_obs * (y * inv_s2)[:, None])

    z_hat = np.einsum("pij,pj->pi", np.linalg.inv(precision), rhs)
    w_q = w_eff[query_lab]
    predictions = np.einsum("qk,qk->q", w_q, z_hat[query_patient]) - shift[query_lab]
    return {
        "realized": compute_regression_metrics(
            predictions, np.asarray(query_values, dtype=np.float64)
        ),
        "predictions": predictions,
    }
