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


def test_binomial_fista_matches_irls():
    """Proximal-gradient logistic path == IRLS+CD path (same convex
    objective, same optimum)."""
    rng = np.random.default_rng(17)
    n, p = 500, 25
    x = rng.normal(size=(n, p))
    beta_true = np.zeros(p)
    beta_true[:4] = [1.5, -1.0, 0.8, 0.5]
    eta = -0.3 + x @ beta_true
    y = (rng.random(n) < 1 / (1 + np.exp(-eta))).astype(float)
    lams = [0.05, 0.02, 0.005]
    irls = P.binomial_path(LocalXY(x, y), alpha=1.0, lambdas=lams, thresh=1e-10)
    fista = P.binomial_path_fista(LocalXY(x, y), alpha=1.0, lambdas=lams,
                                  thresh=1e-9, maxit=5000)
    assert np.allclose(irls.beta, fista.beta, atol=5e-4)
    assert np.allclose(irls.a0, fista.a0, atol=5e-4)
    assert np.allclose(irls.dev_ratio, fista.dev_ratio, atol=1e-5)


def test_multinomial_fista_matches_irls():
    rng = np.random.default_rng(23)
    n, p, k = 400, 15, 3
    x = rng.normal(size=(n, p))
    W = np.zeros((p, k))
    W[:3] = rng.normal(size=(3, k)) * 1.5
    eta = x @ W
    pr = np.exp(eta - eta.max(1, keepdims=True))
    pr /= pr.sum(1, keepdims=True)
    yi = np.array([rng.choice(k, p=pi) for pi in pr])
    Y = np.eye(k)[yi]
    lams = [0.04, 0.01]
    irls = P.multinomial_path(LocalXY(x, Y), alpha=1.0, lambdas=lams, thresh=1e-10)
    fista = P.multinomial_path_fista(LocalXY(x, Y), alpha=1.0, lambdas=lams,
                                     thresh=1e-9, maxit=8000)
    assert np.allclose(irls.dev_ratio, fista.dev_ratio, atol=1e-4)
    assert np.allclose(irls.beta, fista.beta, atol=2e-3)


def test_binomial_fista_spark_solver(spark):
    """solver='fista' end-to-end through sgdnet() for binomial (the
    wide-p dense path: O(p) passes, no p² quadratic)."""
    rng = np.random.default_rng(37)
    n, p = 300, 12
    x = rng.normal(size=(n, p))
    eta = x @ np.concatenate([[1.2, -0.9], np.zeros(p - 2)])
    y = (rng.random(n) < 1 / (1 + np.exp(-eta))).astype(int)
    rows = [(*map(float, xi), int(yi)) for xi, yi in zip(x, y)]
    cols = [f"x{i}" for i in range(p)]
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols) + ", y int")
    ref = fit_glm(df, cols, "y", family="binomial", nlambda=5, lambda_min_ratio=0.05)
    fista = fit_glm(df, cols, "y", family="binomial", nlambda=5, lambda_min_ratio=0.05,
                    solver="fista", thresh=1e-8, maxit=4000)
    assert fista.classnames == ref.classnames
    assert np.allclose(ref.lambdas, fista.lambdas, rtol=1e-9)
    assert np.allclose(ref.beta, fista.beta, atol=2e-3)
