"""SparkXY (distributed passes) vs LocalXY (numpy) parity for the
iterative families — proves the 100 TB path computes the same model."""

import numpy as np
import pytest

from sgdnet_spark.glm.sgdnet import sgdnet


@pytest.fixture(scope="module")
def multi_df(spark):
    rng = np.random.default_rng(23)
    n, p = 600, 4
    x = rng.normal(size=(n, p))
    eta = np.stack([x @ np.array([1.0, 0, -0.5, 0]), x @ np.array([-0.5, 0.5, 0, 0]),
                    x @ np.array([0, -0.3, 0.4, 0])], axis=1)
    pr = np.exp(eta - eta.max(1, keepdims=True))
    pr /= pr.sum(1, keepdims=True)
    yi = np.array([rng.choice(3, p=pi) for pi in pr])
    cols = [f"x{i}" for i in range(p)]
    rows = [(*map(float, xi), f"c{int(c)}") for xi, c in zip(x, yi)]
    return spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols) + ", y string"), cols


def test_multinomial_spark_vs_local(multi_df):
    df, cols = multi_df
    fs = sgdnet(df, cols, "y", family="multinomial", alpha=0.5, nlambda=6,
                lambda_min_ratio=1e-2, solver="spark")
    fl = sgdnet(df, cols, "y", family="multinomial", alpha=0.5, nlambda=6,
                lambda_min_ratio=1e-2, solver="local")
    assert np.allclose(fs.lambdas, fl.lambdas, rtol=1e-12)
    assert np.allclose(fs.beta, fl.beta, rtol=1e-6, atol=1e-9)
    assert np.allclose(fs.a0, fl.a0, rtol=1e-6, atol=1e-9)
    assert np.allclose(fs.dev_ratio, fl.dev_ratio, rtol=1e-8)


def test_mgaussian_spark_vs_local(spark):
    rng = np.random.default_rng(29)
    n, p = 500, 3
    x = rng.normal(size=(n, p))
    y = x @ np.array([[1.0, -1.0], [0.0, 0.5], [0.3, 0.0]]) + rng.normal(scale=0.2, size=(n, 2))
    cols = [f"x{i}" for i in range(p)]
    rows = [(*map(float, xi), float(a), float(b)) for xi, (a, b) in zip(x, y)]
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols) + ", y1 double, y2 double")
    fs = sgdnet(df, cols, ["y1", "y2"], family="mgaussian", nlambda=6, solver="spark")
    fl = sgdnet(df, cols, ["y1", "y2"], family="mgaussian", nlambda=6, solver="local")
    assert np.allclose(fs.beta, fl.beta, rtol=1e-7, atol=1e-10)
    assert np.allclose(fs.a0, fl.a0, rtol=1e-7, atol=1e-10)
