"""Model-based quality filter (operators/qprobe.py).

Certifies: the closed-form ridge fit against an independent numpy
matrix-solve replay, feature agreement with text.quality_score,
end-to-end selection semantics (top-frac via grid cutoff; pure-map
threshold mode), degenerate-input guards, and the streaming scoring
twin (a fitted probe is 4 literals — the score is a per-row map).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sgdnet_spark.operators import qprobe


def _rand_feats(spark, n=200, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.uniform(0.0, 1.0, size=(n, 3))
    y = (0.2 + 1.5 * X[:, 0] - 0.7 * X[:, 1] + 0.3 * X[:, 2]
         + rng.normal(scale=0.05, size=n))
    rows = [(int(i), float(a), float(b), float(c), float(t))
            for i, (a, b, c), t in zip(range(n), X, y)]
    return (
        spark.createDataFrame(rows, "id bigint, f0 double, f1 double, f2 double, y double"),
        X, y,
    )


def test_fit_matches_numpy_ridge_closed_form(spark):
    """Cramer-rule fit == an INDEPENDENT numpy linalg solve of the same
    standardized ridge system (different algorithm, same math)."""
    feats, X, y = _rand_feats(spark)
    lam = 0.05
    probe = qprobe.fit_quality_probe(feats, lam=lam)
    mu, sd = X.mean(axis=0), X.std(axis=0)
    Xs = (X - mu) / sd
    R = (Xs.T @ Xs) / len(y)
    b = Xs.T @ (y - y.mean()) / len(y)
    beta_std = np.linalg.solve(R + lam * np.eye(3), b)
    beta = beta_std / sd
    a0 = y.mean() - beta @ mu
    assert probe["n"] == len(y)
    np.testing.assert_allclose(probe["b"], beta, rtol=1e-9)
    np.testing.assert_allclose(probe["a0"], a0, rtol=1e-9)
    # lam=0 must give the OLS solution (recovers the planted line)
    ols = qprobe.fit_quality_probe(feats, lam=0.0)
    np.testing.assert_allclose(ols["b"], [1.5, -0.7, 0.3], atol=0.05)


def test_probe_features_agree_with_quality_score(spark, sf_dir):
    """f0/f2 are quality_score's stopword_ratio / mean_len-based score
    before rounding; f1 is its clamped length term."""
    from sgdnet_spark.operators import text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    f = {r["id"]: r for r in qprobe.probe_features(docs).collect()}
    q = {r["doc_id"]: r for r in text.quality_score(docs).collect()}
    assert set(f) == set(q)
    for i, fr in f.items():
        assert abs(fr["f0"] - q[i]["stopword_ratio"]) < 1e-4
        assert abs(fr["f1"] - min(q[i]["n_tokens"] / 100.0, 1.0)) < 1e-12
        assert abs(fr["f2"] - min(q[i]["mean_token_len"] / 8.0, 1.0)) < 1.01e-4


def test_degenerate_inputs_raise(spark):
    const = spark.createDataFrame(
        [(i, 0.5, float(i % 2), float(i % 3) / 2, float(i % 2)) for i in range(10)],
        "id bigint, f0 double, f1 double, f2 double, y double",
    )
    with pytest.raises(ValueError, match="degenerate"):
        qprobe.fit_quality_probe(const)  # f0 constant -> sd 0
    with pytest.raises(ValueError, match="empty"):
        qprobe.fit_quality_probe(const.filter(F.col("id") < 0))
    docs = spark.createDataFrame([(1, "some text here")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="label"):
        qprobe.quality_probe(docs)  # no lang column, no label
    with pytest.raises(ValueError, match="select_frac"):
        qprobe.quality_probe(docs, label=F.lit(True), select_frac=1.5)


def test_selection_semantics_and_threshold_mode(spark, sf_dir):
    """Top-frac mode keeps exactly the docs strictly above the grid
    cutoff (ties AT the cutoff drop); threshold mode is the same scores
    through a fixed pure-map cutoff."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = qprobe.quality_probe(docs, select_frac=0.3).collect()
    n = len(out)
    scores = sorted((r["qscore"] for r in out), reverse=True)
    kept = [r for r in out if r["selected"] == 1]
    # the cutoff is the 70th-percentile score on the 1e-4 grid: at most
    # 30% strictly above it, and every kept doc beats every dropped one
    assert 0 < len(kept) <= int(0.3 * n) + 1
    min_kept = min(r["qscore"] for r in kept)
    assert all(r["qscore"] < min_kept or r["selected"] == 1 for r in out
               if r["qscore"] != min_kept)
    assert scores[0] == max(r["qscore"] for r in kept)
    thr = qprobe.quality_probe(docs, threshold=0.45).collect()
    for r in thr:
        assert r["selected"] == (1 if r["qscore"] > 0.45 else 0)


def test_streaming_scoring_twin_matches_batch(spark, sf_dir, tmp_path):
    """Fit on the static corpus, then score a STREAM of the same docs
    with the fitted probe + fixed threshold — per-row expressions only,
    so the gate runs unchanged under Structured Streaming. Streamed
    (id, qscore, selected) must equal the batch threshold mode."""
    static = spark.read.parquet(f"{sf_dir}/documents.parquet")
    probe = qprobe.fit_quality_probe(
        qprobe.probe_features(static, F.col("lang") == "en")
    )
    thr = 0.45
    want = {
        (r["doc_id"], r["qscore"], r["selected"])
        for r in qprobe.quality_probe(static, threshold=thr).collect()
    }
    import shutil

    stage = tmp_path / "docs_stream"
    stage.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", stage / "documents.parquet")
    stream = (
        spark.readStream.schema(static.schema)
        .format("parquet")
        .load(str(stage))
    )
    feats = qprobe.probe_features(stream)
    scored = feats.select(
        F.col("id").alias("doc_id"),
        qprobe.score_quality_probe(feats, probe).alias("qscore"),
    ).withColumn("selected", (F.col("qscore") > F.lit(thr)).cast("bigint"))
    q = (
        scored.writeStream.outputMode("append")
        .format("memory")
        .queryName("qprobe_s")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM qprobe_s").collect()}
    assert got == want and len(got) > 0
