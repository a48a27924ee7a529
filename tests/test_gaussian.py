"""Gaussian family — mirrors reference tests/testthat/test-gaussian.R &
test-lambda-path.R, with closed-form numpy references instead of glmnet."""

import numpy as np
import pytest

from sgdnet_spark.glm import path as P
from sgdnet_spark.glm.providers import LocalXY
from sgdnet_spark.glm.sgdnet import sgdnet


@pytest.fixture(scope="module")
def xy():
    rng = np.random.default_rng(0)
    n, p = 500, 6
    x = rng.normal(size=(n, p)) * np.array([1, 2, 0.5, 1, 1, 3])
    beta = np.array([2.0, -1.0, 0.0, 0.5, 0.0, 0.25])
    y = 1.5 + x @ beta + rng.normal(scale=0.3, size=n)
    return x, y


def test_ols_limit(xy):
    x, y = xy
    res = P.gaussian_path(LocalXY(x, y), alpha=1.0, lambdas=[1e-12])
    ols = np.linalg.lstsq(np.hstack([np.ones((len(x), 1)), x]), y, rcond=None)[0]
    assert np.allclose(res.beta[:, 0], ols[1:], atol=1e-7)
    assert np.isclose(res.a0[0], ols[0], atol=1e-7)


def test_ridge_closed_form(xy):
    x, y = xy
    n = len(x)
    lam = 0.9
    res = P.gaussian_path(LocalXY(x, y), alpha=0.0, lambdas=[lam], standardize=False)
    xc = x - x.mean(0)
    yc = y - y.mean()
    bridge = np.linalg.solve(xc.T @ xc / n + lam * np.eye(x.shape[1]), xc.T @ yc / n)
    assert np.allclose(res.beta[:, 0], bridge, atol=1e-9)


def test_lambda_max_kills_all(xy):
    x, y = xy
    res = P.gaussian_path(LocalXY(x, y), alpha=1.0, nlambda=20)
    assert res.df[0] == 0
    assert res.df[-1] > 0
    # log-spaced path, descending
    ratios = res.lambdas[:-1] / res.lambdas[1:]
    assert np.allclose(ratios, ratios[0])


def test_dev_ratio_monotone(xy):
    x, y = xy
    res = P.gaussian_path(LocalXY(x, y), alpha=0.5, nlambda=20)
    assert np.all(np.diff(res.dev_ratio) >= -1e-12)
    assert 0.9 < res.dev_ratio[-1] <= 1.0


def test_spark_matches_local(spark, xy):
    x, y = xy
    rows = [(list(map(float, xi)), float(yi)) for xi, yi in zip(x, y)]
    df = spark.createDataFrame(rows, "feat array<double>, y double").select(
        *[
            __import__("pyspark.sql.functions", fromlist=["col"]).col("feat")[i].alias(f"x{i}")
            for i in range(x.shape[1])
        ],
        "y",
    )
    cols = [f"x{i}" for i in range(x.shape[1])]
    fit_spark = sgdnet(df, cols, "y", family="gaussian", alpha=0.5, nlambda=10, solver="spark")
    fit_local = sgdnet(df, cols, "y", family="gaussian", alpha=0.5, nlambda=10, solver="local")
    assert np.allclose(fit_spark.lambdas, fit_local.lambdas, rtol=1e-12)
    assert np.allclose(fit_spark.beta, fit_local.beta, rtol=1e-8, atol=1e-10)
    assert np.allclose(fit_spark.a0, fit_local.a0, rtol=1e-8, atol=1e-10)


def test_assertions(spark):
    df = spark.range(10).selectExpr("cast(id as double) x", "cast(id*2 as double) y")
    with pytest.raises(ValueError):
        sgdnet(df, ["x"], "y", alpha=1.5)
    with pytest.raises(ValueError):
        sgdnet(df, ["x"], "y", lambdas=[-1.0])
    with pytest.raises(ValueError):
        sgdnet(df, ["x"], "y", thresh=-1)
    with pytest.raises(ValueError):
        sgdnet(df, ["x"], "y", maxit=0)
