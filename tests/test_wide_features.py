"""Wide-p GLM fit over hashed text features — exercises the
numpy-outer-product gram pass (moments_and_gram) used when p is too
large for the JVM aggregation path."""

import numpy as np

from sgdnet_spark.glm import sgdnet
from sgdnet_spark.operators.features import hashed_token_features


def test_wide_p_gaussian_fit(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = 64
    feats = hashed_token_features(docs, n_features=p, keep_cols=["doc_id", "n_chars"])
    cols = [f"x{i}" for i in range(p)]
    # total token count predicts n_chars almost exactly -> high dev_ratio
    fit = sgdnet(feats, cols, "n_chars", family="gaussian", alpha=0.5, nlambda=10,
                 solver="spark")
    assert fit.beta.shape == (p, 10)
    assert fit.dev_ratio[-1] > 0.8
    assert fit.df[0] == 0


def test_wide_p_uses_pandas_gram(spark, sf_dir):
    from sgdnet_spark.glm.providers import SparkXY
    from sgdnet_spark.glm import suffstats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = 64
    feats = hashed_token_features(docs, n_features=p, keep_cols=["n_chars"])
    xy = suffstats.assemble(feats, [f"x{i}" for i in range(p)], ["n_chars"])
    prov = SparkXY(xy, p, 1)
    mom = prov.moments()  # p*(p+1)/2 = 2080 > 600 -> numpy partials path
    assert mom.n == docs.count()
    # cross-check against a driver-side computation
    pdf = xy.toPandas()
    x = pdf[[f"x{i}" for i in range(p)]].to_numpy(float)
    assert np.allclose(mom.sum_xx, x.T @ x, rtol=1e-10)
