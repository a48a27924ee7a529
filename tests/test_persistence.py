"""Model save/load round-trip."""

import numpy as np

from sgdnet_spark.glm import sgdnet
from sgdnet_spark.glm.sgdnet import SgdnetFit


def test_save_load_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(61)
    x = rng.normal(size=(200, 3))
    y = x @ np.array([1.0, 0.0, -0.5]) + rng.normal(scale=0.2, size=200)
    rows = [(*map(float, xi), float(yi)) for xi, yi in zip(x, y)]
    df = spark.createDataFrame(rows, "x0 double, x1 double, x2 double, y double")
    fit = sgdnet(df, ["x0", "x1", "x2"], "y", nlambda=8)
    path = str(tmp_path / "model")
    fit.save(path)
    back = SgdnetFit.load(path)
    assert back.family == fit.family
    assert np.allclose(back.beta, fit.beta)
    assert np.allclose(back.lambdas, fit.lambdas)
    assert back.feature_names == fit.feature_names
    # loaded model predicts identically (no Spark state needed)
    assert np.allclose(back.predict_np(x), fit.predict_np(x))
    # and drives JVM-side predict on a DataFrame
    out = back.predict(df, s=float(back.lambdas[-1]), prefix="p")
    assert "p" in out.columns


def test_multinomial_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(67)
    x = rng.normal(size=(300, 3))
    yi = (x[:, 0] + 0.5 * rng.normal(size=300) > 0).astype(int) + (x[:, 1] > 1).astype(int)
    rows = [(*map(float, xi), f"k{int(c)}") for xi, c in zip(x, yi)]
    df = spark.createDataFrame(rows, "x0 double, x1 double, x2 double, y string")
    fit = sgdnet(df, ["x0", "x1", "x2"], "y", family="multinomial", nlambda=5, lambda_min_ratio=1e-2)
    path = str(tmp_path / "m")
    fit.save(path)
    back = SgdnetFit.load(path)
    assert back.classnames == fit.classnames
    assert back.dfmat is not None
    assert np.allclose(back.a0, fit.a0)


def test_offset_fit_roundtrip_keeps_guard(spark, tmp_path):
    """The offset flag must survive persistence: a reloaded offset fit
    that silently predicted without newoffset would produce wrong
    linear predictors with no error (reference predict.sgdnet.R:381)."""
    import pytest

    rng = np.random.default_rng(11)
    x = rng.normal(size=(200, 2))
    o = 0.5 * rng.normal(size=200)
    y = 1.0 + x @ np.array([1.0, -0.5]) + o + 0.1 * rng.normal(size=200)
    rows = [(*map(float, xi), float(oi), float(yi)) for xi, oi, yi in zip(x, o, y)]
    df = spark.createDataFrame(rows, "x0 double, x1 double, o double, y double")
    fit = sgdnet(df, ["x0", "x1"], "y", family="gaussian", nlambda=5,
                 lambda_min_ratio=1e-2, offset_col="o")
    path = str(tmp_path / "ofit")
    fit.save(path)
    back = SgdnetFit.load(path)
    assert back.offset is True
    with pytest.raises(ValueError, match="newoffset"):
        back.predict(df, s=float(back.lambdas[-1]))
    out = back.predict(df, s=float(back.lambdas[-1]), newoffset="o", prefix="p")
    assert "p" in out.columns


def test_relaxed_path_survives_persistence(spark, tmp_path):
    import numpy as np
    import pandas as pd

    from sgdnet_spark.glm import sgdnet
    from sgdnet_spark.glm.sgdnet import SgdnetFit

    rng = np.random.default_rng(12)
    X = rng.normal(size=(300, 3))
    y = X @ [1.0, -0.5, 0.0] + 0.2 * rng.normal(size=300)
    pdf = pd.DataFrame(X, columns=["x0", "x1", "x2"])
    pdf["y"] = y
    df = spark.createDataFrame(pdf)
    fit = sgdnet(df, ["x0", "x1", "x2"], "y", alpha=1.0, nlambda=5, relax=True)
    path = str(tmp_path / "relaxfit")
    fit.save(path)
    back = SgdnetFit.load(path)
    assert np.allclose(back.beta_relaxed, fit.beta_relaxed)
    assert np.allclose(back.coef(gamma=0.3), fit.coef(gamma=0.3))


def test_index_info_snapshots(spark, tmp_path):
    """Round 13: bm25_index_info / pq_index_info — the operational
    dashboard reads (layout health, pending tombstones, capability
    flags) without scanning index rows."""
    from pyspark.sql import functions as F

    from sgdnet_spark.operators import bm25, pq

    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i}", "en") for i in range(6)],
        "doc_id long, text string, lang string",
    )
    bidx = str(tmp_path / "info_bm25")
    bm25.write_bm25_index(docs, bidx, positions=True, meta_cols=["lang"])
    bm25.delete_from_bm25_index(spark, bidx, [3])
    info = bm25.bm25_index_info(spark, bidx)
    assert info["n_docs"] == 5.0 and info["pending_tombstones"] == 1
    assert info["positional"] and info["has_doc_catalog"]
    assert info["meta_cols"] == ["lang"] and info["n_posting_files"] >= 1
    bm25.compact_bm25_index(spark, bidx)
    assert bm25.bm25_index_info(spark, bidx)["pending_tombstones"] == 0

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pidx = str(tmp_path / "info_pq")
    pq.write_pq_index(emb, pidx, n_lists=8, kmeans_iters=2, opq=True)
    pq.delete_from_pq_index(spark, pidx, [1, 2])
    pinfo = pq.pq_index_info(spark, pidx)
    assert pinfo["n_lists"] == 8 and pinfo["m"] == 8 and pinfo["dim"] == 64
    assert pinfo["opq"] is True and pinfo["residual"] is False
    assert pinfo["pending_tombstones"] == 2
    assert pinfo["n_code_files"] >= 1 and pinfo["n_vector_files"] >= 1
