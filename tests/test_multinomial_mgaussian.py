"""Multinomial & mgaussian — mirrors test-multinomial.R / test-mgaussian.R."""

import numpy as np
import pytest

from sgdnet_spark.glm import path as P
from sgdnet_spark.glm.providers import LocalXY
from sgdnet_spark.glm.sgdnet import sgdnet


@pytest.fixture(scope="module")
def multi_xy():
    rng = np.random.default_rng(7)
    n, p, k = 900, 5, 3
    x = rng.normal(size=(n, p))
    B = np.array([[1.5, -1.0, 0, 0, 0], [0, 1.0, -1.5, 0, 0], [-1.0, 0, 1.0, 0, 0]])
    eta = x @ B.T
    pr = np.exp(eta - eta.max(1, keepdims=True))
    pr /= pr.sum(1, keepdims=True)
    yi = np.array([rng.choice(k, p=pi) for pi in pr])
    return x, yi


def test_multinomial_path(multi_xy):
    x, yi = multi_xy
    Y = np.eye(3)[yi]
    res = P.multinomial_path(LocalXY(x, Y), alpha=1.0, nlambda=15, lambda_min_ratio=1e-3)
    assert res.df[0] == 0
    assert res.dev_ratio[-1] > 0.2
    # intercepts sum to zero at each lambda (reference R/sgdnet.R:409)
    assert np.allclose(res.a0.sum(axis=0), 0.0, atol=1e-10)
    assert res.dfmat is not None and res.dfmat.shape == (3, 15)


def test_multinomial_spark_api(spark, multi_xy):
    x, yi = multi_xy
    names = np.array(["alpha", "beta", "gamma"])
    cols = [f"x{i}" for i in range(x.shape[1])]
    rows = [(*map(float, xi), str(names[c])) for xi, c in zip(x, yi)]
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols) + ", y string")
    fit = sgdnet(df, cols, "y", family="multinomial", alpha=1.0, nlambda=8, solver="local")
    assert fit.classnames == ["alpha", "beta", "gamma"]
    pred = fit.predict(df, s=float(fit.lambdas[-1]), type="class", prefix="cls")
    acc = pred.selectExpr("avg(cast(cls = y as double)) acc").first()["acc"]
    assert acc > 0.6
    # response probabilities sum to 1
    resp = fit.predict(df, s=float(fit.lambdas[-1]), type="response", prefix="p")
    tot = resp.selectExpr("avg(p_alpha + p_beta + p_gamma) t").first()["t"]
    assert abs(tot - 1.0) < 1e-9

    # two classes -> error, as reference
    df2 = spark.range(40).selectExpr("cast(id as double) x", "cast(id % 2 as string) y")
    with pytest.raises(ValueError, match="binomial"):
        sgdnet(df2, ["x"], "y", family="multinomial")


def test_mgaussian_path():
    rng = np.random.default_rng(11)
    n, p, k = 600, 6, 2
    x = rng.normal(size=(n, p))
    B = np.array([[2.0, 0.5], [-1.0, 1.0], [0, 0], [0.7, -0.3], [0, 0], [0, 0]])
    y = np.array([1.0, -2.0]) + x @ B + rng.normal(scale=0.3, size=(n, k))
    res = P.mgaussian_path(LocalXY(x, y), alpha=1.0, nlambda=20)
    assert res.df[0] == 0
    # group penalty: a feature is zero across ALL responses simultaneously
    mid = res.beta[:, :, 8]  # (k, p)
    nz_by_resp = [set(np.nonzero(mid[c])[0]) for c in range(k)]
    assert nz_by_resp[0] == nz_by_resp[1]
    # OLS limit
    res0 = P.mgaussian_path(LocalXY(x, y), alpha=1.0, lambdas=[1e-12])
    ols = np.linalg.lstsq(np.hstack([np.ones((n, 1)), x]), y, rcond=None)[0]
    assert np.allclose(res0.beta[:, :, 0].T, ols[1:], atol=1e-7)
    assert np.allclose(res0.a0[:, 0], ols[0], atol=1e-7)


def test_mgaussian_spark_api(spark):
    rng = np.random.default_rng(13)
    n, p = 300, 4
    x = rng.normal(size=(n, p))
    y = x @ np.array([[1.0, -1.0], [0.5, 0.5], [0, 0], [0, 1.0]]) + rng.normal(scale=0.2, size=(n, 2))
    cols = [f"x{i}" for i in range(p)]
    rows = [(*map(float, xi), float(a), float(b)) for xi, (a, b) in zip(x, y)]
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols) + ", y1 double, y2 double")
    fit = sgdnet(df, cols, ["y1", "y2"], family="mgaussian", nlambda=8, solver="spark")
    assert fit.beta.shape == (2, p, 8)
    with pytest.raises(ValueError, match="one-dimensional"):
        sgdnet(df, cols, ["y1"], family="mgaussian")
