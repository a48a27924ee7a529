"""Wide-p FISTA path == Gram-CD path (same convex objective), and the
wide auto-switch engages without building a p² Gram."""

import numpy as np

from sgdnet_spark.glm import path as P
from sgdnet_spark.glm.sgdnet import sgdnet as fit_glm
from sgdnet_spark.glm.providers import LocalXY


def test_fista_matches_gram_cd():
    rng = np.random.default_rng(73)
    n, p = 600, 40
    x = rng.normal(size=(n, p))
    beta_true = np.zeros(p)
    beta_true[:6] = rng.normal(size=6) * 2
    y = 1.0 + x @ beta_true + rng.normal(scale=0.4, size=n)
    for alpha in (1.0, 0.5):
        gram = P.gaussian_path(LocalXY(x, y), alpha=alpha, nlambda=8, lambda_min_ratio=1e-2,
                               thresh=1e-9)
        fista = P.gaussian_path_fista(LocalXY(x, y), alpha=alpha, nlambda=8,
                                      lambda_min_ratio=1e-2, thresh=1e-8, maxit=2000)
        assert np.allclose(gram.lambdas, fista.lambdas, rtol=1e-10)
        assert np.allclose(gram.beta, fista.beta, atol=2e-4)
        assert np.allclose(gram.a0, fista.a0, atol=2e-4)
        assert np.array_equal(gram.df, fista.df) or np.max(np.abs(gram.df - fista.df)) <= 1


def test_fista_spark_solver(spark):
    rng = np.random.default_rng(79)
    n, p = 400, 12
    x = rng.normal(size=(n, p))
    y = x @ (rng.normal(size=p) * (rng.random(p) < 0.4)) + rng.normal(scale=0.3, size=n)
    cols = [f"x{i}" for i in range(p)]
    rows = [(*map(float, xi), float(yi)) for xi, yi in zip(x, y)]
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols) + ", y double")
    ffit = fit_glm(df, cols, "y", solver="fista", nlambda=6, lambda_min_ratio=1e-2)
    gfit = fit_glm(df, cols, "y", solver="spark", nlambda=6, lambda_min_ratio=1e-2)
    assert np.allclose(ffit.beta, gfit.beta, atol=5e-4)
    assert np.allclose(ffit.a0, gfit.a0, atol=5e-4)
