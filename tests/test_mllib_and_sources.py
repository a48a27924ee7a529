"""Cross-check native solver vs Spark MLlib; source round-trips."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sgdnet_spark.glm import sgdnet
from sgdnet_spark.glm.mllib_backend import mllib_path
from sgdnet_spark.sources import readers


@pytest.fixture(scope="module")
def df_and_data(spark):
    rng = np.random.default_rng(17)
    n, p = 500, 4
    x = rng.normal(size=(n, p))
    y = 1.0 + x @ np.array([1.5, -0.5, 0.0, 0.8]) + rng.normal(scale=0.3, size=n)
    cols = [f"x{i}" for i in range(p)]
    rows = [(*map(float, xi), float(yi)) for xi, yi in zip(x, y)]
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols) + ", y double")
    return df, cols, x, y


def test_native_matches_mllib_gaussian(df_and_data):
    df, cols, x, y = df_and_data
    lams = [0.5, 0.1, 0.01]
    fit = sgdnet(df, cols, "y", family="gaussian", alpha=0.5, lambdas=lams, thresh=1e-7)
    a0, beta = mllib_path(df, cols, "y", "gaussian", alpha=0.5, lambdas=lams)
    # independent optimizers, same convex objective -> same optimum
    assert np.allclose(fit.beta, beta, atol=2e-3)
    assert np.allclose(fit.a0, a0, atol=2e-3)


def test_native_matches_mllib_binomial(spark, df_and_data):
    df, cols, x, y = df_and_data
    dfb = df.withColumn("yb", (F.col("y") > F.lit(float(np.median(y)))).cast("int"))
    lams = [0.05, 0.01]
    fit = sgdnet(dfb, cols, "yb", family="binomial", alpha=0.5, lambdas=lams, thresh=1e-6)
    a0, beta = mllib_path(dfb, cols, "yb", "binomial", alpha=0.5, lambdas=lams)
    assert np.allclose(fit.beta, beta, atol=5e-3)
    assert np.allclose(fit.a0, a0, atol=5e-3)


def test_binomial_mle_lambda0_matches_mllib_on_testdata(spark, sf_dir):
    """Reference tests/testthat/test-binomial.R pins the unregularized
    (lambda=0) MLE coefficients against glmnet; here the same fixed
    feature set the registered queries use is fit at lambda=0 by BOTH
    the native IRLS solver and Spark MLlib — two independent optimizers
    of the same convex likelihood must land on the same optimum. This
    value-pins the iterative solver on the driver's own testdata (the
    path queries' drift pins check determinism; this checks truth)."""
    from sgdnet_spark.queries import FEATURE_NAMES, feature_frame

    f = feature_frame(spark, sf_dir).withColumn(
        "yb", (F.col("l_returnflag") == "R").cast("int")
    )
    fit = sgdnet(f, FEATURE_NAMES, "yb", family="binomial", alpha=0.5,
                 lambdas=[0.0], thresh=1e-8)
    a0, beta = mllib_path(f, FEATURE_NAMES, "yb", "binomial", alpha=0.5,
                          lambdas=[0.0])
    assert np.allclose(fit.beta[:, 0], beta[:, 0], atol=1e-3)
    assert np.allclose(fit.a0, a0, atol=1e-3)


def test_csv_json_roundtrip(spark, tmp_path, df_and_data):
    df, cols, *_ = df_and_data
    csv_path = str(tmp_path / "csv")
    df.limit(50).write.mode("overwrite").option("header", "true").csv(csv_path)
    schema = ", ".join(f"{c} double" for c in cols) + ", y double"
    back = readers.read_csv(spark, csv_path, schema)
    assert back.count() == 50
    assert back.schema == df.schema

    json_path = str(tmp_path / "json")
    df.limit(20).write.mode("overwrite").json(json_path)
    back_j = readers.read_json(spark, json_path, schema)
    assert back_j.count() == 20


def test_partitioned_write_prunes(spark, tmp_path, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    out = str(tmp_path / "part")
    readers.write_partitioned(li, out, ["ship_year"])
    back = spark.read.parquet(out).filter(F.col("ship_year") == 1997)
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the 1997 filter must reach the scan as a partition filter
    assert "PartitionFilters" in plan
    assert back.count() > 0


def test_orc_roundtrip_and_pushdown(spark, tmp_path, sf_dir):
    """ORC is the second natively-shipped columnar format: partitioned
    round-trip must preserve rows, and a selective predicate must reach
    the ORC scan as a pushed filter (same pushdown story as parquet)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    out = str(tmp_path / "orc")
    readers.write_partitioned(li, out, ["ship_year"], format="orc")
    back = readers.read_orc(spark, out)
    assert back.count() == li.count()
    sel = back.filter((F.col("ship_year") == 1997) & (F.col("l_quantity") > 45.0))
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan  # partition pruning on ship_year
    assert "PushedFilters: [" in plan and "l_quantity" in plan  # ORC pushdown
    assert sel.count() > 0
    with pytest.raises(ValueError):
        readers.write_partitioned(li, out, ["ship_year"], format="xml")


def test_avro_reader_gated(spark, tmp_path):
    """spark-avro is an external jar absent from this image: the reader
    must fail with the actionable gating error, not a raw classpath
    stack."""
    with pytest.raises(NotImplementedError, match="spark-avro"):
        readers.read_avro(spark, str(tmp_path / "nope.avro"))


def test_reader_gate_discriminates_errors():
    """The delta/avro gating must fire ONLY on the-format-is-absent
    errors; a wrong path or corrupt table must surface as-is, not be
    relabeled as a classpath problem (sending the user chasing jars
    that are already installed)."""
    from sgdnet_spark.sources.readers import _is_missing_format

    assert _is_missing_format(Exception(
        "[DATA_SOURCE_NOT_FOUND] Failed to find the data source: delta."))
    assert _is_missing_format(Exception(
        "java.lang.ClassNotFoundException: delta.DefaultSource"))
    assert not _is_missing_format(Exception(
        "[PATH_NOT_FOUND] Path does not exist: file:/nope.avro"))
    assert not _is_missing_format(Exception(
        "Parquet file footer is corrupt"))
