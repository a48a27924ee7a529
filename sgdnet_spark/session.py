"""SparkSession factory tuned for this engine.

Local testing runs on local[N]; the same settings (AQE, Arrow, UTC,
shuffle-partition sizing) are what we'd ship to a real cluster, where
only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "sgdnet_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # the UI is off for tests (port churn); bench.py turns it on to
        # read per-query executorRunTime from the REST API
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.ui.port", "0")
        # 1g code cache: a many-query session generates thousands of
        # Janino/whole-stage-codegen classes; at the JDK default (240m)
        # the JIT shuts off mid-session ("CodeCache is full") and
        # expression-heavy operators degrade 5-10x to interpreted speed
        .config(
            "spark.driver.extraJavaOptions",
            "-Djava.net.preferIPv4Stack=true -XX:ReservedCodeCacheSize=1g",
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def spread_small_input(df):
    """Repartition a batch frame up to the session's parallelism IF the
    source read produced fewer partitions than cores.

    Small single-file parquet inputs (the local testdata) arrive as 1-3
    partitions, which serializes CPU-heavy per-row work (shingling,
    minhash signatures, feature assembly) onto as many cores. At real
    scale a 100 TB table has thousands of splits and this is a no-op —
    the condition only fires on the small-file artifact, so no shuffle
    is ever added to a well-partitioned scan. Streaming frames are
    returned untouched (getNumPartitions is undefined for them)."""
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Load every testdata table as a DataFrame and register temp views."""
    out = {}
    for name in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
