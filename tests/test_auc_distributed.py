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
