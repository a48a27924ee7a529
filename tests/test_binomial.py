"""Binomial family — mirrors reference tests/testthat/test-binomial.R."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sgdnet_spark.glm import path as P
from sgdnet_spark.glm.providers import LocalXY
from sgdnet_spark.glm.score import score_np
from sgdnet_spark.glm.sgdnet import sgdnet


@pytest.fixture(scope="module")
def xy():
    rng = np.random.default_rng(3)
    n, p = 800, 5
    x = rng.normal(size=(n, p))
    beta = np.array([1.2, -0.8, 0.0, 0.6, 0.0])
    eta = 0.4 + x @ beta
    y = (rng.random(n) < 1 / (1 + np.exp(-eta))).astype(float)
    return x, y


def test_mle_limit(xy):
    x, y = xy
    n, p = x.shape
    res = P.binomial_path(LocalXY(x, y.reshape(-1, 1)), alpha=1.0, lambdas=[1e-10], thresh=1e-9)
    xi = np.hstack([np.ones((n, 1)), x])
    b = np.zeros(p + 1)
    for _ in range(60):
        mu = 1 / (1 + np.exp(-(xi @ b)))
        step = np.linalg.solve((xi * (mu * (1 - mu))[:, None]).T @ xi, xi.T @ (y - mu))
        b += step
        if np.max(np.abs(step)) < 1e-13:
            break
    assert np.allclose(res.beta[:, 0], b[1:], atol=1e-6)
    assert np.isclose(res.a0[0], b[0], atol=1e-6)


def test_path_structure(xy):
    x, y = xy
    res = P.binomial_path(LocalXY(x, y.reshape(-1, 1)), alpha=1.0, nlambda=20)
    assert res.df[0] == 0
    assert np.all(np.diff(res.dev_ratio) >= -1e-9)
    assert res.nulldev > 0


def test_spark_parity_and_classnames(spark, xy):
    x, y = xy
    rows = [
        (*map(float, xi), "pos" if yi > 0 else "neg")
        for xi, yi in zip(x, y)
    ]
    cols = [f"x{i}" for i in range(x.shape[1])]
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols) + ", y string")
    fs = sgdnet(df, cols, "y", family="binomial", alpha=1.0, nlambda=8, solver="spark")
    fl = sgdnet(df, cols, "y", family="binomial", alpha=1.0, nlambda=8, solver="local")
    assert fs.classnames == ["neg", "pos"]
    assert np.allclose(fs.beta, fl.beta, rtol=1e-6, atol=1e-9)
    assert np.allclose(fs.a0, fl.a0, rtol=1e-6, atol=1e-9)

    # predict types (reference test-predictions.R)
    pred = fs.predict(df, s=float(fs.lambdas[-1]), type="class", prefix="cls")
    vals = {r["cls"] for r in pred.select("cls").distinct().collect()}
    assert vals <= {"neg", "pos"}
    prob = fs.predict(df, s=float(fs.lambdas[-1]), type="response", prefix="pr")
    mn, mx = prob.agg(F.min("pr"), F.max("pr")).first()
    assert 0.0 <= mn <= mx <= 1.0

    # numpy scorer sanity: accuracy beats the null rate at the end of the path
    missclass = score_np(fl, x, np.where(y > 0, "pos", "neg").astype(object), "class")
    base = min(y.mean(), 1 - y.mean())
    assert missclass[-1] < base
    auc = score_np(fl, x, y, "auc")
    assert auc[-1] > 0.75


def test_binomial_errors(spark):
    df = spark.range(30).selectExpr("cast(id as double) x", "cast(id % 3 as string) y")
    with pytest.raises(ValueError, match="multinomial"):
        sgdnet(df, ["x"], "y", family="binomial")
    df1 = spark.range(30).selectExpr("cast(id as double) x", "'a' as y")
    with pytest.raises(ValueError, match="one class"):
        sgdnet(df1, ["x"], "y", family="binomial")
