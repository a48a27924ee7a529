"""Source/sink helpers: schema-explicit readers + format round-trips.

Parquet is the native format (columnar, predicate pushdown, the driver's
testdata). CSV/JSON readers are schema-explicit (no inferSchema scans in
production paths). Lakehouse formats (delta/iceberg/hudi) need jars not
present in this image — gated behind import-try with a clear error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType | str, header: bool = True) -> DataFrame:
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_jsonl_events(spark: SparkSession, path: str) -> DataFrame:
    """Events-shaped JSONL with ISO timestamps."""
    schema = "event_id bigint, ts string, user_id bigint, event_type string, value double, props string"
    return spark.read.schema(schema).json(path).withColumn("ts", F.to_timestamp("ts"))


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC: the other columnar format Spark ships natively — same
    predicate-pushdown / column-pruning story as parquet (PushedFilters
    reach the OrcScan; plan-asserted in tests)."""
    return spark.read.orc(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Partition-pruned layout for downstream scans (dt-style
    partitioning); format: parquet (default) or orc — both columnar,
    both pushdown-capable, no extra jars."""
    if format not in ("parquet", "orc"):
        raise ValueError(f"unsupported partitioned-write format: {format!r}")
    df.write.mode(mode).partitionBy(*partition_cols).format(format).save(path)


def _is_missing_format(e: Exception) -> bool:
    """True only when the error is the format being absent from the
    classpath — a blanket except would relabel genuine errors (wrong
    path, corrupt table) as a classpath problem and send the user
    chasing jars that are already installed."""
    s = str(e)
    return (
        "DATA_SOURCE_NOT_FOUND" in s
        or "ClassNotFoundException" in s
        or "Failed to find data source" in s
        or "Failed to find the data source" in s
    )


def read_delta(spark: SparkSession, path: str) -> DataFrame:  # pragma: no cover
    try:
        return spark.read.format("delta").load(path)
    except Exception as e:  # noqa: BLE001
        if _is_missing_format(e):
            raise NotImplementedError(
                "delta-lake jars are not on the classpath in this environment; "
                "add io.delta:delta-spark to spark.jars.packages"
            ) from e
        raise


def read_avro(spark: SparkSession, path: str) -> DataFrame:  # pragma: no cover
    """Avro (row-oriented interchange): the spark-avro module is an
    EXTERNAL jar not bundled with the pyspark distribution — gated like
    delta with a clear error."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:  # noqa: BLE001
        if _is_missing_format(e):
            raise NotImplementedError(
                "spark-avro is an external module not on the classpath in this "
                "environment; add org.apache.spark:spark-avro to "
                "spark.jars.packages"
            ) from e
        raise
