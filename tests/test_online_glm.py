"""Streaming incremental GLM == batch GLM (moments are additive)."""

import numpy as np
from pyspark.sql import functions as F

from sgdnet_spark.glm import path as P
from sgdnet_spark.glm.providers import LocalXY
from sgdnet_spark.streaming.online_glm import OnlineGaussianPath


def _mkdf(spark, x, y, cols):
    rows = [(*map(float, xi), float(yi)) for xi, yi in zip(x, y)]
    return spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols) + ", y double")


def test_incremental_equals_batch(spark):
    rng = np.random.default_rng(71)
    n, p = 900, 4
    x = rng.normal(size=(n, p))
    y = 0.5 + x @ np.array([1.0, -0.7, 0.0, 0.3]) + rng.normal(scale=0.3, size=n)
    cols = [f"x{i}" for i in range(p)]

    online = OnlineGaussianPath(cols, "y", alpha=0.5, nlambda=10)
    for lo, hi in [(0, 300), (300, 650), (650, 900)]:
        online.update(_mkdf(spark, x[lo:hi], y[lo:hi], cols))
    inc = online.fit()

    full = P.gaussian_path(LocalXY(x, y), alpha=0.5, nlambda=10, lambda_min_ratio=1e-3)
    assert np.allclose(inc.lambdas, full.lambdas, rtol=1e-9)
    assert np.allclose(inc.beta, full.beta, rtol=1e-7, atol=1e-10)
    assert np.allclose(inc.a0, full.a0, rtol=1e-7, atol=1e-10)


def test_online_binomial_approaches_mle(spark):
    from sgdnet_spark.streaming.online_glm import OnlineBinomial

    rng = np.random.default_rng(89)
    n, p = 2400, 3
    x = rng.normal(size=(n, p))
    beta_true = np.array([1.2, -0.8, 0.4])
    y = (rng.random(n) < 1 / (1 + np.exp(-(0.3 + x @ beta_true)))).astype(float)
    cols = [f"x{i}" for i in range(p)]

    online = OnlineBinomial(cols, "y", lam=0.0, step=0.8)
    # three epochs of 4 micro-batches, decaying step (SGD-style schedule)
    for _ in range(3):
        for lo in range(0, n, 600):
            online.update(_mkdf(spark, x[lo : lo + 600], y[lo : lo + 600], cols))
        online.step *= 0.5
    a0, b = online.coefficients()

    full = P.binomial_path(LocalXY(x, y.reshape(-1, 1)), alpha=1.0, lambdas=[1e-9], thresh=1e-9)
    assert np.allclose(b, full.beta[:, 0], atol=0.1)
    assert abs(a0 - full.a0[0]) < 0.1


def test_online_poisson_approaches_mle(spark):
    from sgdnet_spark.streaming.online_glm import OnlinePoisson

    rng = np.random.default_rng(97)
    n, p = 2400, 3
    x = rng.normal(size=(n, p))
    beta_true = np.array([0.5, -0.3, 0.2])
    y = rng.poisson(np.exp(0.4 + x @ beta_true)).astype(float)
    cols = [f"x{i}" for i in range(p)]

    online = OnlinePoisson(cols, "y", lam=0.0, step=0.8)
    for _ in range(3):
        for lo in range(0, n, 600):
            online.update(_mkdf(spark, x[lo : lo + 600], y[lo : lo + 600], cols))
        online.step *= 0.5
    a0, b = online.coefficients()

    full = P.poisson_path(LocalXY(x, y.reshape(-1, 1)), alpha=1.0, lambdas=[1e-9], thresh=1e-9)
    assert np.allclose(b, full.beta[:, 0], atol=0.1)
    assert abs(a0 - full.a0[0]) < 0.1


def test_online_via_streaming_sink(spark, sf_dir, tmp_path):
    # drive the accumulator from an actual structured-streaming query
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_quantity").cast("double").alias("q"),
        F.col("l_discount").cast("double").alias("d"),
        F.col("l_extendedprice").alias("y"),
    )
    stage = str(tmp_path / "stream_in")
    li.repartition(3).write.mode("overwrite").parquet(stage)
    stream = spark.readStream.schema("q double, d double, y double").option(
        "maxFilesPerTrigger", "1"
    ).parquet(stage)
    online = OnlineGaussianPath(["q", "d"], "y", alpha=1.0, nlambda=8)
    q = stream.writeStream.foreachBatch(online.foreach_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert online.n_batches >= 2  # maxFilesPerTrigger drip-feeds batches
    inc = online.fit()
    assert online.moments.n == li.count()
    full = P.gaussian_path(
        LocalXY(
            li.toPandas()[["q", "d"]].to_numpy(float), li.toPandas()["y"].to_numpy(float)
        ),
        alpha=1.0, nlambda=8, lambda_min_ratio=1e-3,
    )
    assert np.allclose(inc.beta, full.beta, rtol=1e-6, atol=1e-9)


def test_online_multinomial_converges_to_batch(spark):
    """Damped block-Newton micro-batch updates approach the batch
    multinomial MLE on a stationary stream."""
    import numpy as np

    from sgdnet_spark.glm import sgdnet
    from sgdnet_spark.streaming.online_glm import OnlineMultinomial

    rng = np.random.default_rng(59)
    n, p, k = 1200, 3, 3
    x = rng.normal(size=(n, p))
    W = np.array([[1.5, -1.0, 0.0], [-0.5, 1.0, -0.5], [0.0, 0.5, 1.0]])
    eta = x @ W
    pr = np.exp(eta - eta.max(1, keepdims=True))
    pr /= pr.sum(1, keepdims=True)
    yi = np.array([rng.choice(k, p=pi) for pi in pr])
    names = np.array(["a", "b", "c"])
    cols = [f"x{i}" for i in range(p)]
    rows = [(*map(float, xi), str(names[c])) for xi, c in zip(x, yi)]
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols) + ", y string")

    online = OnlineMultinomial(cols, "y", classes=["a", "b", "c"], lam=0.01, alpha=0.0)
    # before any batch: identity standardization, zero model, no raise
    a0_0, B_0 = online.coefficients()
    assert np.allclose(a0_0, 0.0) and np.allclose(B_0, 0.0)
    # simulate 6 micro-batches, two passes over the stream
    batches = [df.filter(F.pmod(F.xxhash64("x0"), F.lit(3)) == i) for i in range(3)]
    for _ in range(2):
        for b in batches:
            online.update(b)
    assert online.n_batches == 6

    batch_fit = sgdnet(df, cols, "y", family="multinomial", alpha=0.0, lambdas=[0.01],
                       thresh=1e-8)
    a0_o, B_o = online.coefficients()
    a0_b = batch_fit.a0[:, 0]
    B_b = batch_fit.beta[:, :, 0]
    # within the MLE neighborhood (damped online steps, not exact)
    assert np.max(np.abs(B_o - B_b)) < 0.25
    # and predictions agree on the vast majority of points
    pred_o = np.array(online.predict_class_np(x))
    pred_b = np.asarray(batch_fit.predict_np(x, s=0.01, type="class")).reshape(-1)
    agree = (pred_o == pred_b).mean()
    assert agree > 0.95


def test_online_gaussian_npasses_counts_batches(spark):
    """The refit PathResult reports one statistics pass per batch seen —
    a dead provider stub previously pinned npasses to 0."""
    import numpy as np

    from sgdnet_spark.streaming.online_glm import OnlineGaussianPath

    rng = np.random.default_rng(3)
    est = OnlineGaussianPath(["x0", "x1"], "y", nlambda=5)
    for _ in range(3):
        x = rng.normal(size=(50, 2))
        y = x @ [1.0, -1.0] + rng.normal(scale=0.1, size=50)
        rows = [(float(a), float(b), float(c)) for (a, b), c in zip(x, y)]
        est.update(spark.createDataFrame(rows, "x0 double, x1 double, y double"))
    assert est.fit().npasses == 3
