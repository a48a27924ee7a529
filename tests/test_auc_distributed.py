"""Histogram AUC == exact Mann-Whitney AUC (up to binning error)."""

import numpy as np

from sgdnet_spark.glm.score import _auc, auc_distributed


def test_binned_auc_matches_exact(spark):
    rng = np.random.default_rng(51)
    n = 4000
    y = (rng.random(n) < 0.4).astype(float)
    # informative but noisy scores
    prob = np.clip(0.3 * y + 0.35 + rng.normal(scale=0.15, size=n), 0.0, 0.999999)
    exact = _auc(y, prob)
    df = spark.createDataFrame(
        [(float(p), float(t)) for p, t in zip(prob, y)], "prob double, y double"
    )
    approx = auc_distributed(df, "prob", "y")
    assert abs(approx - exact) < 1e-3
    assert 0.7 < approx < 1.0


def test_binned_auc_degenerate(spark):
    df = spark.createDataFrame([(0.5, 1.0), (0.7, 1.0)], "prob double, y double")
    assert np.isnan(auc_distributed(df, "prob", "y"))


def test_path_auc_matches_numpy(spark):
    """auc_path_distributed (one histogram pass, all lambdas) ==
    score_np's per-lambda exact AUC, up to binning error."""
    from sgdnet_spark.glm import sgdnet
    from sgdnet_spark.glm.score import score, score_np

    rng = np.random.default_rng(7)
    n = 600
    x = rng.normal(size=(n, 3))
    eta = x @ np.array([1.2, -0.8, 0.3])
    yb = (rng.random(n) < 1 / (1 + np.exp(-eta))).astype(int)
    rows = [(*map(float, xi), int(yi)) for xi, yi in zip(x, yb)]
    df = spark.createDataFrame(rows, "x0 double, x1 double, x2 double, y int")
    fit = sgdnet(df, ["x0", "x1", "x2"], "y", family="binomial", nlambda=6,
                 lambda_min_ratio=1e-2)
    dist = score(fit, df, ["x0", "x1", "x2"], "y", "auc")
    loc = score_np(fit, x, yb.astype(float), "auc")
    assert dist.shape == loc.shape
    assert np.all(np.abs(dist - loc) < 2e-3)


def test_mgaussian_score_distributed_matches_numpy(spark):
    from sgdnet_spark.glm import sgdnet
    from sgdnet_spark.glm.score import score, score_np

    rng = np.random.default_rng(13)
    n, p = 400, 3
    x = rng.normal(size=(n, p))
    B = rng.normal(size=(p, 2))
    y = x @ B + rng.normal(scale=0.1, size=(n, 2))
    rows = [(*map(float, xi), float(yi[0]), float(yi[1])) for xi, yi in zip(x, y)]
    df = spark.createDataFrame(rows, "x0 double, x1 double, x2 double, ya double, yb double")
    fit = sgdnet(df, ["x0", "x1", "x2"], ["ya", "yb"], family="mgaussian", nlambda=6)
    for measure in ("deviance", "mse", "mae"):
        dist = score(fit, df, ["x0", "x1", "x2"], ["ya", "yb"], measure)
        loc = score_np(fit, x, y, measure)
        assert np.allclose(dist, loc, rtol=1e-9), measure


def test_multinomial_mse_mae_distributed_matches_numpy(spark):
    from sgdnet_spark.glm import sgdnet
    from sgdnet_spark.glm.score import score, score_np

    rng = np.random.default_rng(29)
    n, p, k = 300, 3, 3
    x = rng.normal(size=(n, p))
    eta = x @ rng.normal(size=(p, k))
    pr = np.exp(eta - eta.max(1, keepdims=True))
    pr /= pr.sum(1, keepdims=True)
    yi = np.array([rng.choice(k, p=pi) for pi in pr])
    names = np.array(["a", "b", "c"])
    cols = [f"x{i}" for i in range(p)]
    rows = [(*map(float, xi), str(names[c])) for xi, c in zip(x, yi)]
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols) + ", y string")
    fit = sgdnet(df, cols, "y", family="multinomial", nlambda=5, lambda_min_ratio=1e-2)
    for measure in ("mse", "mae"):
        dist = score(fit, df, cols, "y", measure)
        loc = score_np(fit, x, names[yi].astype(object), measure)
        assert np.allclose(dist, loc, rtol=1e-9), measure
