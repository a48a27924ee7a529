"""Relaxed (debiased) fits — glmnet `relax=TRUE` semantics, an extension
beyond the reference surface: each lambda's active set gets an
UNPENALIZED refit (closed-form OLS on the Gram for gaussian, cached
restricted IRLS for binomial/poisson), and coef()/predict() blend the
two paths with gamma (1 = penalized, 0 = fully relaxed).

Oracles: direct OLS / restricted-MLE refits computed independently on
the same data.
"""

import numpy as np
import pandas as pd
import pytest

from sgdnet_spark.glm import sgdnet

FEATS = ["x0", "x1", "x2", "x3", "x4"]


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(3)
    n = 1200
    X = rng.normal(size=(n, 5))
    y = 2.0 * X[:, 0] - 1.0 * X[:, 1] + 0.3 * X[:, 2] + rng.normal(scale=0.6, size=n)
    eta = 1.2 * X[:, 0] - 0.8 * X[:, 1]
    yb = (rng.random(n) < 1 / (1 + np.exp(-eta))).astype(float)
    yp = rng.poisson(np.exp(0.2 + 0.5 * X[:, 0] - 0.4 * X[:, 1])).astype(float)
    pdf = pd.DataFrame(X, columns=FEATS)
    pdf["y"] = y
    pdf["yb"] = yb.astype(str)
    pdf["yp"] = yp
    return spark.createDataFrame(pdf), pdf


def test_gaussian_relaxed_is_ols_on_support(data):
    df, pdf = data
    fit = sgdnet(df, FEATS, "y", family="gaussian", alpha=1.0, nlambda=8,
                 lambda_min_ratio=1e-3, relax=True)
    n = len(pdf)
    for i in range(1, fit.nlambda):
        A = np.nonzero(fit.beta[:, i])[0]
        XA = np.column_stack([np.ones(n), pdf[FEATS].values[:, A]])
        ols = np.linalg.lstsq(XA, pdf.y.values, rcond=None)[0]
        assert np.allclose(fit.beta_relaxed[A, i], ols[1:], atol=1e-8), i
        assert abs(fit.a0_relaxed[i] - ols[0]) < 1e-8
        # off-support coordinates stay exactly zero in the relaxed path
        mask = np.ones(5, bool)
        mask[A] = False
        assert np.all(fit.beta_relaxed[mask, i] == 0.0)


def test_binomial_relaxed_is_restricted_mle(data):
    df, pdf = data
    fit = sgdnet(df, FEATS, "yb", family="binomial", alpha=1.0, nlambda=6,
                 lambda_min_ratio=1e-2, relax=True, thresh=1e-8)
    i = fit.nlambda - 1
    A = np.nonzero(fit.beta[:, i])[0]
    sub = [FEATS[j] for j in A]
    mle = sgdnet(df, sub, "yb", family="binomial", alpha=0.0, lambdas=[0.0],
                 thresh=1e-10)
    assert np.allclose(fit.beta_relaxed[A, i], mle.beta[:, 0], atol=1e-4)
    assert abs(fit.a0_relaxed[i] - mle.a0[0]) < 1e-4
    # the unpenalized refit can only improve deviance on the same support
    assert np.all(fit.dev_ratio_relaxed[1:] >= fit.dev_ratio[1:] - 1e-8)


def test_poisson_relaxed_is_restricted_mle(data):
    df, _ = data
    fit = sgdnet(df, FEATS, "yp", family="poisson", alpha=1.0, nlambda=6,
                 lambda_min_ratio=1e-2, relax=True, thresh=1e-8)
    i = fit.nlambda - 1
    A = np.nonzero(fit.beta[:, i])[0]
    sub = [FEATS[j] for j in A]
    mle = sgdnet(df, sub, "yp", family="poisson", alpha=0.0, lambdas=[0.0],
                 thresh=1e-10)
    assert np.allclose(fit.beta_relaxed[A, i], mle.beta[:, 0], atol=1e-4)
    assert np.all(fit.dev_ratio_relaxed[1:] >= fit.dev_ratio[1:] - 1e-8)


def test_gamma_blending(data):
    df, _ = data
    fit = sgdnet(df, FEATS, "y", family="gaussian", alpha=1.0, nlambda=6,
                 relax=True)
    full = fit.coef()
    relaxed = fit.coef(gamma=0.0)
    mid = fit.coef(gamma=0.25)
    assert np.allclose(fit.coef(gamma=1.0), full)
    assert np.allclose(mid, 0.25 * full + 0.75 * relaxed)
    with pytest.raises(ValueError, match="gamma"):
        fit.coef(gamma=1.5)


def test_gamma_requires_relax(data):
    df, _ = data
    fit = sgdnet(df, FEATS, "y", family="gaussian", nlambda=4)
    with pytest.raises(ValueError, match="relax=True"):
        fit.coef(gamma=0.5)


def test_relax_respects_exclude(data):
    df, pdf = data
    fit = sgdnet(df, FEATS, "y", family="gaussian", alpha=1.0, nlambda=6,
                 lambda_min_ratio=1e-3, exclude=[2], relax=True)
    # excluded features can never enter the support, hence never the refit
    assert np.all(fit.beta[2, :] == 0.0)
    assert np.all(fit.beta_relaxed[2, :] == 0.0)


def test_relax_predict_gamma(data):
    df, _ = data
    fit = sgdnet(df, FEATS, "y", family="gaussian", alpha=1.0, nlambda=6,
                 relax=True)
    s = float(fit.lambdas[-1])
    p1 = fit.predict(df, s=s).select("pred").first()[0]
    p0 = fit.predict(df, s=s, gamma=0.0).select("pred").first()[0]
    cf = fit.coef(s=s, gamma=0.0)[:, 0]
    row = df.first()
    want = cf[0] + sum(cf[1 + j] * row[FEATS[j]] for j in range(5))
    assert abs(p0 - want) < 1e-8
    assert p0 != p1  # the relaxed path differs from the penalized one here


def test_relax_unsupported_families(data):
    df, _ = data
    with pytest.raises(NotImplementedError):
        sgdnet(df, FEATS, ["y", "yp"], family="mgaussian", relax=True)
    with pytest.raises(NotImplementedError):
        sgdnet(df, FEATS, "y", family="gaussian", solver="fista", relax=True)


def test_cv_relax_selects_gamma(data):
    from sgdnet_spark.glm.cv import cv_sgdnet

    df, _ = data
    cv = cv_sgdnet(df, FEATS, "y", family="gaussian", alpha=1.0, nfolds=5,
                   nlambda=8, lambda_min_ratio=1e-3, relax=True,
                   gammas=[0.0, 0.5, 1.0])
    assert cv.gamma_min in (0.0, 0.5, 1.0)
    assert len(cv.cv_gamma) == 3
    # the winning (gamma, lambda) minimum must be the smallest curve min
    best = min(r["mean"] for r in cv.cv_gamma)
    chosen = [r for r in cv.cv_gamma if r["gamma"] == cv.gamma_min][0]
    assert abs(chosen["mean"] - best) < 1e-12
    # prediction applies the chosen blend automatically, and can be overridden
    p_auto = cv.predict(df, s="lambda_min").select("pred").first()[0]
    p_pen = cv.predict(df, s="lambda_min", gamma=1.0).select("pred").first()[0]
    cf = cv.fit.coef(s=cv.lambda_min, gamma=cv.gamma_min)[:, 0]
    row = df.first()
    want = cf[0] + sum(cf[1 + j] * row[FEATS[j]] for j in range(5))
    assert abs(p_auto - want) < 1e-8
    assert isinstance(p_pen, float)


def test_cv_without_relax_unchanged(data):
    from sgdnet_spark.glm.cv import cv_sgdnet

    df, _ = data
    cv = cv_sgdnet(df, FEATS, "y", family="gaussian", alpha=1.0, nfolds=5,
                   nlambda=6, use_fold_moments=False)
    assert cv.gamma_min is None and cv.cv_gamma is None


def test_weighted_relax_is_weighted_ols_on_support(data, spark):
    import pyspark.sql.functions as sf

    df, pdf = data
    d = df.withColumn("w", sf.lit(1.0) + sf.abs(sf.col("x0")))
    fit = sgdnet(d, FEATS, "y", family="gaussian", alpha=1.0, nlambda=6,
                 lambda_min_ratio=1e-3, weights_col="w", relax=True)
    i = fit.nlambda - 2
    A = np.nonzero(fit.beta[:, i])[0]
    w = (1.0 + np.abs(pdf.x0.values))
    X = np.column_stack([np.ones(len(pdf)), pdf[FEATS].values[:, A]])
    beta = np.linalg.solve(X.T @ (X * w[:, None]), X.T @ (w * pdf.y.values))
    assert abs(fit.a0_relaxed[i] - beta[0]) < 1e-8
    assert np.allclose(fit.beta_relaxed[A, i], beta[1:], atol=1e-8)


def test_relax_refit_honors_box_limits(data):
    """The relaxed refit is a lambda=0 fit under the SAME constraints
    (glmnet semantics): blending can never step outside the user's box."""
    df, pdf = data
    cap = 0.3
    fit = sgdnet(df, FEATS, "y", family="gaussian", alpha=1.0, nlambda=6,
                 lambda_min_ratio=1e-3, lower_limits=-cap, upper_limits=cap,
                 relax=True, thresh=1e-10)
    assert np.all(fit.beta <= cap + 1e-10) and np.all(fit.beta >= -cap - 1e-10)
    assert np.all(fit.beta_relaxed <= cap + 1e-8)
    assert np.all(fit.beta_relaxed >= -cap - 1e-8)
    # x0's unconstrained OLS coefficient (~2.0) saturates the refit bound
    assert abs(fit.beta_relaxed[0, -1] - cap) < 1e-6
    fb = sgdnet(df, FEATS, "yb", family="binomial", alpha=1.0, nlambda=5,
                lambda_min_ratio=1e-2, lower_limits=0.0, relax=True)
    assert np.all(fb.beta_relaxed >= -1e-10)


def test_cv_relax_single_gamma_records_selection(data):
    from sgdnet_spark.glm.cv import cv_sgdnet

    df, _ = data
    cv = cv_sgdnet(df, FEATS, "y", family="gaussian", alpha=1.0, nfolds=5,
                   nlambda=6, relax=True, gammas=[0.0])
    assert cv.gamma_min == 0.0  # the only blend the CV ever evaluated
    p = cv.predict(df, s="lambda_min").select("pred").first()[0]
    cf = cv.fit.coef(s=cv.lambda_min, gamma=0.0)[:, 0]
    row = df.first()
    want = cf[0] + sum(cf[1 + j] * row[FEATS[j]] for j in range(5))
    assert abs(p - want) < 1e-8


def test_cv_relax_coef_matches_predict(data):
    from sgdnet_spark.glm.cv import cv_sgdnet

    df, _ = data
    cv = cv_sgdnet(df, FEATS, "y", family="gaussian", alpha=1.0, nfolds=5,
                   nlambda=6, lambda_min_ratio=1e-3, relax=True,
                   gammas=[0.0, 1.0])
    cf = cv.coef("lambda_min")[:, 0]  # applies gamma_min by default
    row = df.first()
    want = cf[0] + sum(cf[1 + j] * row[FEATS[j]] for j in range(5))
    p = cv.predict(df, s="lambda_min").select("pred").first()[0]
    assert abs(p - want) < 1e-8
    # explicit override recovers the penalized coefficients
    assert np.allclose(cv.coef("lambda_min", gamma=1.0), cv.fit.coef(cv.lambda_min, gamma=1.0))


def test_gamma_mse_one_pass_matches_blend_scoring(data):
    """The affine-in-gamma mse expansion (one aggregation for every
    gamma) must equal per-gamma scoring of the blended fits."""
    from sgdnet_spark.glm.cv import _blend_fit, _gamma_mse_fold
    from sgdnet_spark.glm.score import score

    df, _ = data
    fit = sgdnet(df, FEATS, "y", family="gaussian", alpha=1.0, nlambda=6,
                 lambda_min_ratio=1e-3, relax=True)
    gammas = [0.0, 0.25, 1.0]
    per_g = _gamma_mse_fold(fit, df, FEATS, fit.lambdas, gammas, "y")
    for g in gammas:
        direct = score(_blend_fit(fit, g), df, FEATS, "y", "mse", s=fit.lambdas)
        assert np.allclose(per_g[g], direct, rtol=1e-9), g
