"""Runnable analogs of the reference's bundled datasets (R/data.R:
abalone, heart, wine, student), built from the driver testdata so every
example in docs/EXAMPLES.md runs verbatim.

Each loader returns ``(df, feature_cols, label)`` shaped like the
reference dataset it mirrors:

- abalone  — gaussian regression (abalone$x 8 features -> rings)
- heart    — binomial classification (heart disease yes/no)
- wine     — multinomial, 3 cultivars
- student  — mgaussian, two response columns (math/portuguese grades)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_discount").cast("double").alias("discount"),
        F.col("l_tax").cast("double").alias("tax"),
        F.month("l_shipdate").cast("double").alias("ship_month"),
        (F.col("l_quantity") * F.col("l_discount")).alias("qty_disc"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_returnflag").alias("returnflag"),
    )


def abalone(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001"):
    """Gaussian regression analog (reference data/abalone.rda):
    continuous response, numeric features."""
    df = _features(spark, sf_dir)
    feats = ["quantity", "discount", "tax", "ship_month", "qty_disc"]
    return df, feats, "price"


def heart(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001"):
    """Binomial analog (reference data/heart.rda): binary label."""
    df = _features(spark, sf_dir).withColumn(
        "returned", (F.col("returnflag") == "R").cast("string")
    )
    feats = ["quantity", "discount", "tax", "ship_month", "qty_disc"]
    return df, feats, "returned"


def wine(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001"):
    """Multinomial analog (reference data/wine.rda): 3-class label."""
    df = _features(spark, sf_dir)
    feats = ["quantity", "discount", "tax", "ship_month", "qty_disc"]
    return df, feats, "returnflag"


def student(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001"):
    """mgaussian analog (reference data/student.rda): two responses."""
    df = _features(spark, sf_dir)
    feats = ["discount", "tax", "ship_month", "qty_disc"]
    return df, feats, ["price", "quantity"]


def user_events(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001"):
    """Poisson analog (no reference twin — family='poisson' is a
    round-5 extension): per-user event counts with a log-exposure
    offset, the canonical rate-model shape. Returns
    ``(df, feature_cols, label)`` plus ``offset_col='log_hours'`` ready
    for ``sgdnet(..., family='poisson', offset_col='log_hours')``."""
    from sgdnet_spark.queries import _t

    ev = _t(spark, sf_dir, "events")  # ts normalized across encodings
    df = ev.groupBy("user_id").agg(
        F.count("*").cast("double").alias("n_events"),
        F.avg("value").alias("avg_value"),
        F.countDistinct("event_type").cast("double").alias("n_types"),
        # observation window per user as exposure: hours between first
        # and last event (floored at 1h so the log offset is finite)
        F.log(
            F.greatest(
                (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
                / F.lit(3600.0),
                F.lit(1.0),
            )
        ).alias("log_hours"),
    )
    return df, ["avg_value", "n_types"], "n_events"
