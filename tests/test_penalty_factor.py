"""Differential penalties and box constraints — glmnet-compat options
beyond the reference surface (the reference fixes a uniform penalty;
glmnet — its declared compatibility target, R/sgdnet.R 'Relationship
with glmnet' — exposes penalty.factor / exclude / lower.limits /
upper.limits, and this module pins our implementation of the same
semantics).

Oracles: structural equivalences (exclude == drop the column; factor
rescaling invariance), the projected-KKT optimality conditions of the
box-constrained weighted elastic net (exact stationarity checks on the
standardized-scale gram), and Spark MLlib LogisticRegression's
bound-constrained optimizer (lowerBoundsOnCoefficients) as an
independent solver for the nonnegative ridge logistic case.
"""

import numpy as np
import pandas as pd
import pytest

from sgdnet_spark.glm import sgdnet


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(23)
    n = 800
    X = rng.normal(size=(n, 4))
    y = 1.5 * X[:, 0] - 2.0 * X[:, 1] + 0.5 * X[:, 2] + rng.normal(scale=0.5, size=n)
    eta = 0.8 * X[:, 0] - 0.9 * X[:, 1] + 0.3 * X[:, 2]
    yb = (rng.random(n) < 1 / (1 + np.exp(-eta))).astype(float)
    ypois = rng.poisson(np.exp(0.3 + 0.4 * X[:, 0] - 0.5 * X[:, 1])).astype(float)
    pdf = pd.DataFrame(X, columns=["x0", "x1", "x2", "x3"])
    pdf["y"] = y
    pdf["yb"] = yb.astype(str)
    pdf["yp"] = ypois
    pdf["ym"] = pd.cut(eta + rng.normal(scale=0.3, size=n), 3,
                       labels=["lo", "mid", "hi"]).astype(str)
    return spark.createDataFrame(pdf), pdf


FEATS = ["x0", "x1", "x2", "x3"]


# ---- exclude == drop the column ------------------------------------------


def test_exclude_equals_dropped_column_gaussian(data):
    df, _ = data
    f1 = sgdnet(df, FEATS, "y", family="gaussian", alpha=1.0, nlambda=10,
                lambda_min_ratio=1e-3, exclude=[3])
    f2 = sgdnet(df, FEATS[:3], "y", family="gaussian", alpha=1.0, nlambda=10,
                lambda_min_ratio=1e-3)
    assert np.all(f1.beta[3, :] == 0.0)
    assert np.allclose(f1.lambdas, f2.lambdas)
    assert np.allclose(f1.beta[:3, :], f2.beta, atol=1e-8)
    assert np.allclose(f1.a0, f2.a0, atol=1e-8)


def test_exclude_equals_dropped_column_binomial(data):
    df, _ = data
    f1 = sgdnet(df, FEATS, "yb", family="binomial", alpha=0.5, nlambda=6,
                lambda_min_ratio=1e-2, exclude=[2])
    f2 = sgdnet(df, ["x0", "x1", "x3"], "yb", family="binomial", alpha=0.5,
                nlambda=6, lambda_min_ratio=1e-2)
    assert np.all(f1.beta[2, :] == 0.0)
    assert np.allclose(f1.lambdas, f2.lambdas)
    kept = [0, 1, 3]
    assert np.allclose(f1.beta[kept, :], f2.beta, atol=1e-6)


def test_exclude_equals_dropped_column_poisson(data):
    df, _ = data
    f1 = sgdnet(df, FEATS, "yp", family="poisson", alpha=1.0, nlambda=6,
                lambda_min_ratio=1e-2, exclude=[3])
    f2 = sgdnet(df, FEATS[:3], "yp", family="poisson", alpha=1.0, nlambda=6,
                lambda_min_ratio=1e-2)
    assert np.all(f1.beta[3, :] == 0.0)
    assert np.allclose(f1.beta[:3, :], f2.beta, atol=1e-6)


def test_exclude_multinomial_zeroes_every_class(data):
    df, _ = data
    f = sgdnet(df, FEATS, "ym", family="multinomial", alpha=1.0, nlambda=5,
               lambda_min_ratio=1e-2, exclude=[1])
    # excluded feature must be zero in every class slice of (k, p, nl)
    assert np.all(f.beta[:, 1, :] == 0.0)


# ---- penalty factor semantics --------------------------------------------


def test_factor_rescaling_invariance(data):
    df, _ = data
    a = sgdnet(df, FEATS, "y", family="gaussian", alpha=1.0, nlambda=8)
    b = sgdnet(df, FEATS, "y", family="gaussian", alpha=1.0, nlambda=8,
               penalty_factor=[3.0, 3.0, 3.0, 3.0])
    assert np.allclose(a.lambdas, b.lambdas)
    assert np.allclose(a.beta, b.beta, atol=1e-10)


def test_zero_factor_feature_is_never_penalized(data):
    df, pdf = data
    f = sgdnet(df, FEATS, "y", family="gaussian", alpha=1.0, nlambda=6,
               penalty_factor=[0.0, 1.0, 1.0, 1.0])
    # at lambda_max the unpenalized feature is the ONLY nonzero one, and
    # it equals the simple regression of y on x0 (standardized KKT with
    # pf_0 = 0 -> exact stationarity of the unpenalized coordinate)
    assert abs(f.beta[0, 0]) > 0.1
    assert np.all(f.beta[1:, 0] == 0.0)
    b_simple = np.polyfit(pdf.x0, pdf.y, 1)[0]
    # single-coordinate fit: beta0 = cov(x0,y)/var(x0) on the sub-model
    assert abs(f.beta[0, 0] - b_simple) < 5e-2


def test_penalty_factor_kkt_along_path(data):
    """KKT with per-coordinate thresholds: |grad_j| <= lam*alpha*pf_j at
    zeros, grad_j + lam*(1-alpha)*pf_j*b_j + lam*alpha*pf_j*sign(b_j) = 0
    on the active set (standardized scale)."""
    df, pdf = data
    pf_raw = np.array([0.5, 2.0, 1.0, 1.0])
    alpha = 0.7
    fit = sgdnet(df, FEATS, "y", family="gaussian", alpha=alpha, nlambda=8,
                 lambda_min_ratio=1e-3, penalty_factor=pf_raw, thresh=1e-10)
    X = pdf[FEATS].values
    yv = pdf["y"].values
    mu, sd = X.mean(0), X.std(0)
    Xs = (X - mu) / sd
    ys = yv - yv.mean()
    n = len(yv)
    C = Xs.T @ Xs / n
    b = Xs.T @ ys / n
    pf = pf_raw * len(pf_raw) / pf_raw.sum()
    for i, lam in enumerate(fit.lambdas):
        bs = fit.beta[:, i] * sd  # back to the standardized scale
        grad = C @ bs - b + lam * (1 - alpha) * pf * bs
        for j in range(4):
            if bs[j] == 0.0:
                assert abs(grad[j]) <= lam * alpha * pf[j] + 1e-6, (i, j)
            else:
                assert abs(grad[j] + lam * alpha * pf[j] * np.sign(bs[j])) <= 1e-6, (i, j)


# ---- box constraints ------------------------------------------------------


def test_nonnegative_lasso_projected_kkt(data):
    """Nonnegative elastic net: b >= 0 with stationarity grad_j + lam*alpha
    = 0 on the interior active set and grad_j + lam*alpha >= 0 at pinned
    zeros (the KKT multiplier of the bound)."""
    df, pdf = data
    alpha = 1.0
    fit = sgdnet(df, FEATS, "y", family="gaussian", alpha=alpha, nlambda=8,
                 lambda_min_ratio=1e-3, lower_limits=0.0, thresh=1e-10)
    assert np.all(fit.beta >= 0.0)
    # x1's unconstrained coefficient is strongly negative -> must be pinned
    assert np.all(fit.beta[1, :] == 0.0)
    X = pdf[FEATS].values
    yv = pdf["y"].values
    mu, sd = X.mean(0), X.std(0)
    Xs = (X - mu) / sd
    ys = yv - yv.mean()
    n = len(yv)
    C = Xs.T @ Xs / n
    b = Xs.T @ ys / n
    for i, lam in enumerate(fit.lambdas[1:], start=1):
        bs = fit.beta[:, i] * sd
        grad = C @ bs - b
        for j in range(4):
            if bs[j] > 0:
                assert abs(grad[j] + lam * alpha) <= 1e-6, (i, j)
            else:
                # either the plain zero condition or the bound multiplier
                assert grad[j] + lam * alpha >= -1e-6, (i, j)


def test_upper_limits_cap_the_coefficients(data):
    df, _ = data
    cap = 0.25
    fit = sgdnet(df, FEATS, "y", family="gaussian", alpha=0.5, nlambda=6,
                 upper_limits=cap, lower_limits=-cap)
    assert np.all(fit.beta <= cap + 1e-12)
    assert np.all(fit.beta >= -cap - 1e-12)
    # the true coefficients (1.5, -2.0) exceed the cap -> bound is active
    assert abs(fit.beta[0, -1] - cap) < 1e-8
    assert abs(fit.beta[1, -1] + cap) < 1e-8


def test_nonneg_ridge_logistic_matches_mllib_bounds(data):
    """Independent solver cross-check: MLlib LogisticRegression's
    bound-constrained L-BFGS-B (lowerBoundsOnCoefficients) solves the
    same nonnegative ridge logistic objective — elasticNetParam=0,
    standardization off on both sides, lam == regParam (both objectives
    are mean-logloss + lam/2 ||b||^2)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.linalg import Matrices

    df, _ = data
    lam = 0.05
    fit = sgdnet(df, FEATS, "yb", family="binomial", alpha=0.0, lambdas=[lam],
                 standardize=False, lower_limits=0.0, thresh=1e-12)
    dv = VectorAssembler(inputCols=FEATS, outputCol="fv").transform(
        df.withColumn("ybn", df.yb.cast("double"))
    )
    lr = LogisticRegression(
        featuresCol="fv", labelCol="ybn", regParam=lam, elasticNetParam=0.0,
        standardization=False, tol=1e-12, maxIter=500,
        lowerBoundsOnCoefficients=Matrices.dense(1, 4, [0.0] * 4),
    ).fit(dv)
    ours = fit.beta[:, 0]
    theirs = np.array(lr.coefficients)
    assert np.all(ours >= 0)
    assert np.allclose(ours, theirs, atol=2e-4), (ours, theirs)
    assert abs(fit.a0[0] - lr.intercept) < 2e-4


def test_bounds_with_binomial_path_pin_sign(data):
    df, _ = data
    fit = sgdnet(df, FEATS, "yb", family="binomial", alpha=1.0, nlambda=6,
                 lambda_min_ratio=1e-2, lower_limits=0.0)
    assert np.all(fit.beta >= -1e-12)
    # x1 drives yb negatively -> pinned at zero everywhere
    assert np.all(fit.beta[1, :] == 0.0)


# ---- FISTA (wide-p) parity ------------------------------------------------


def test_fista_matches_cd_with_options(data):
    df, _ = data
    lams = [0.3, 0.1, 0.03]
    kw = dict(family="gaussian", alpha=1.0, lambdas=lams,
              penalty_factor=[0.5, 2.0, 1.0, np.inf], lower_limits=0.0)
    cd = sgdnet(df, FEATS, "y", **kw)
    fista = sgdnet(df, FEATS, "y", solver="fista", thresh=1e-9, **kw)
    assert np.all(fista.beta[3, :] == 0.0)
    assert np.allclose(cd.beta, fista.beta, atol=1e-4)


def test_grouped_multinomial_penalty_factor_excludes_group(data):
    df, _ = data
    fit = sgdnet(df, FEATS, "ym", family="multinomial",
                 type_multinomial="grouped", alpha=1.0, nlambda=5,
                 lambda_min_ratio=1e-2, penalty_factor=[1.0, 1.0, np.inf, 1.0])
    assert np.all(fit.beta[:, 2, :] == 0.0)
    # other features still enter jointly across classes at the path end
    assert np.count_nonzero(fit.beta[:, :, -1]) > 0


# ---- validation -----------------------------------------------------------


def test_option_validation_errors(data):
    df, _ = data
    with pytest.raises(ValueError, match="penalty_factor"):
        sgdnet(df, FEATS, "y", penalty_factor=[1.0, -1.0, 1.0, 1.0])
    with pytest.raises(ValueError, match="length"):
        sgdnet(df, FEATS, "y", penalty_factor=[1.0, 1.0])
    with pytest.raises(ValueError, match="exclude"):
        sgdnet(df, FEATS, "y", exclude=[7])
    with pytest.raises(ValueError, match="lower_limits"):
        sgdnet(df, FEATS, "y", lower_limits=0.5)
    with pytest.raises(ValueError, match="upper_limits"):
        sgdnet(df, FEATS, "y", upper_limits=-0.5)
    with pytest.raises(NotImplementedError):
        sgdnet(df, FEATS, "yb", family="multinomial", lower_limits=0.0)
    with pytest.raises(ValueError, match="finite penalty_factor"):
        sgdnet(df, FEATS, "y", penalty_factor=[0.0, 0.0, np.inf, np.inf])


def test_cv_gram_fast_path_with_options_matches_generic(data):
    from sgdnet_spark.glm.cv import cv_sgdnet

    df, _ = data
    kw = dict(family="gaussian", alpha=1.0, nfolds=5, nlambda=6,
              lambda_min_ratio=1e-3, penalty_factor=[0.5, 2.0, 1.0, 1.0],
              exclude=[3], lower_limits=0.0)
    fast = cv_sgdnet(df, FEATS, "y", use_fold_moments=True, **kw)
    slow = cv_sgdnet(df, FEATS, "y", use_fold_moments=False, **kw)
    assert np.allclose(fast.lambdas[0], slow.lambdas[0])
    assert abs(fast.lambda_min - slow.lambda_min) < 1e-12
    m_fast = [r["mean"] for r in fast.cv_summary]
    m_slow = [r["mean"] for r in slow.cv_summary]
    assert np.allclose(m_fast, m_slow, rtol=1e-6)
    assert np.all(fast.fit.beta[3, :] == 0.0)
    assert np.all(fast.fit.beta >= 0.0)
