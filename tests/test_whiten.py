"""PCA whitening (operators/whiten.py): exact numpy replay of the
distributed moments fit, identity post-whitening covariance, descending
component order, sign determinism, partitioning independence, streaming
twin, truncation, and degenerate-input guards."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sgdnet_spark.operators import whiten as W


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _np_corpus(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.asarray([r["vec_id"] for r in rows])
    V = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    return ids, V


def test_fit_matches_numpy_replay(emb):
    """Distributed moments == driver numpy moments; same eigh, same
    sign rule, same W (to float tolerance — partials sum in a different
    order than one flat numpy pass)."""
    ids, V = _np_corpus(emb)
    mu, Wm, lam = W.fit_whitener(emb)
    mu2 = V.mean(0)
    cov2 = V.T @ V / len(V) - np.outer(mu2, mu2)
    lam2, vec2 = np.linalg.eigh(cov2)
    order = np.argsort(lam2)[::-1]
    lam2, vec2 = lam2[order], vec2[:, order]
    for j in range(vec2.shape[1]):
        i = int(np.argmax(np.abs(vec2[:, j])))
        if vec2[i, j] < 0:
            vec2[:, j] = -vec2[:, j]
    W2 = vec2.T / np.sqrt(np.maximum(lam2, 0) + 1e-6)[:, None]
    assert np.allclose(mu, mu2, atol=1e-9)
    assert np.allclose(lam, lam2, atol=1e-7)
    assert np.allclose(Wm, W2, atol=1e-6)


def test_whitened_covariance_is_identity(emb):
    ids, V = _np_corpus(emb)
    mu, Wm, lam = W.fit_whitener(emb)
    got = {r["id"]: np.asarray(r["w"]) for r in W.whiten(emb, mu, Wm).collect()}
    Y = np.stack([got[int(i)] for i in ids])
    cov = Y.T @ Y / len(Y) - np.outer(Y.mean(0), Y.mean(0))
    # eps-regularized: diagonal is lam/(lam+eps) ~ 1, off-diagonal ~ 0
    assert np.allclose(np.diag(cov), 1.0, atol=1e-3)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 1e-6
    # descending variance order in the ORIGINAL basis
    assert all(lam[i] >= lam[i + 1] - 1e-12 for i in range(len(lam) - 1))


def test_transform_matches_numpy_and_truncates(emb):
    ids, V = _np_corpus(emb)
    mu, Wm, _ = W.fit_whitener(emb)
    expect = W.whiten_np(V, mu, Wm, k=4)
    got = {r["id"]: r["w"] for r in W.whiten(emb, mu, Wm, k=4).collect()}
    for i, vid in enumerate(ids):
        assert len(got[int(vid)]) == 4
        assert np.allclose(got[int(vid)], expect[i], atol=1e-9)


def test_partitioning_independent(emb):
    mu_a, W_a, _ = W.fit_whitener(emb)
    mu_b, W_b, _ = W.fit_whitener(emb.repartition(7))
    assert np.allclose(mu_a, mu_b, atol=1e-9)
    assert np.allclose(W_a, W_b, atol=1e-6)


def test_streaming_twin(spark, sf_dir, tmp_path, emb):
    """whiten() is a stateless Arrow map over broadcast (mu, W) — runs
    unchanged on a stream; streamed == batch."""
    import shutil

    mu, Wm, _ = W.fit_whitener(emb)
    want = {(r["id"], tuple(np.round(r["w"], 9))) for r in W.whiten(emb, mu, Wm, k=4).collect()}
    stage = tmp_path / "emb_stream"
    stage.mkdir()
    shutil.copy(f"{sf_dir}/embeddings.parquet", stage / "embeddings.parquet")
    stream = spark.readStream.schema(emb.schema).format("parquet").load(str(stage))
    q = (
        W.whiten(stream, mu, Wm, k=4)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("whiten_s")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["id"], tuple(np.round(np.asarray(r["w"]), 9)))
        for r in spark.sql("SELECT * FROM whiten_s").collect()
    }
    assert got == want and len(got) > 0


def test_null_vectors_skipped_and_empty_raises(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    mu, Wm, _ = W.fit_whitener(df)
    assert sorted(r["id"] for r in W.whiten(df, mu, Wm).collect()) == [0, 2, 3]
    with pytest.raises(ValueError, match="empty input"):
        W.fit_whitener(df.filter(F.lit(False)))


def test_rank_deficient_is_finite(spark):
    """A constant dimension (zero variance) must not produce inf/nan —
    eps regularizes the scale."""
    df = spark.createDataFrame(
        [(i, [float(i), 5.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    mu, Wm, lam = W.fit_whitener(df)
    out = np.stack([np.asarray(r["w"]) for r in W.whiten(df, mu, Wm).collect()])
    assert np.isfinite(Wm).all() and np.isfinite(out).all()


def test_whiten_preserves_string_ids(spark, emb):
    """whiten() on a string-keyed corpus (round-11 advice): the id
    column's type is derived from the input schema, values equal the
    long-keyed run."""
    from pyspark.sql import functions as F

    from sgdnet_spark.operators.whiten import fit_whitener, whiten

    mu, W, _ = fit_whitener(emb)
    base = {r["id"]: list(r["w"]) for r in whiten(emb, mu, W, k=3).collect()}
    s = emb.select(F.concat(F.lit("v"), F.col("vec_id")).alias("vec_id"), "embedding")
    out = whiten(s, mu, W, k=3)
    assert dict(out.dtypes)["id"] == "string"
    got = {r["id"]: list(r["w"]) for r in out.collect()}
    assert got == {f"v{k}": v for k, v in base.items()}


def test_maha_is_basis_invariant_and_gaps_wide(spark, emb):
    """The maha column (full whitened norm) is invariant to every
    LAPACK-arbitrary eigendecomposition choice: flipping all
    eigenvector signs, or rotating within a (synthetic) degenerate
    eigenspace, leaves it unchanged — the round-11 golden-gate
    hardening. The pc columns are certified platform-stable for this
    corpus by wide top eigengaps relative to 4 dp rounding."""
    import numpy as np

    from sgdnet_spark.operators.whiten import fit_whitener, whiten_np

    mu, W, lam = fit_whitener(emb)
    rows = emb.select("embedding").limit(50).collect()
    V = np.asarray([r[0] for r in rows], dtype=np.float64)
    maha = np.linalg.norm(whiten_np(V, mu, W), axis=1)
    # sign flips (the eigh-arbitrary choice) do not move maha
    assert np.allclose(np.linalg.norm(whiten_np(V, mu, -W), axis=1), maha)
    # a rotation applied across two components with EQUAL scale leaves
    # the norm unchanged (the degenerate-eigenspace case): equalize the
    # last two rows' scales first, then rotate within that plane
    W2 = W.copy()
    W2[-1] = W[-2] / np.linalg.norm(W[-2]) * np.linalg.norm(W[-1])
    th = 0.7
    R = np.eye(len(W))
    R[-2:, -2:] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    # ||R @ W2 @ x|| == ||W2 @ x|| for any x (R orthogonal)
    Y = whiten_np(V, mu, W2)
    Yr = whiten_np(V, mu, R @ W2)
    assert np.allclose(np.linalg.norm(Yr, axis=1), np.linalg.norm(Y, axis=1))
    # top-5 eigengaps wide vs rounding: the pc1..pc4 goldens cannot be
    # moved by cross-LAPACK rotation of near-degenerate pairs
    top = lam[:6]
    assert (np.abs(np.diff(top)) / np.maximum(top[:-1], 1e-30) > 1e-3).all()
