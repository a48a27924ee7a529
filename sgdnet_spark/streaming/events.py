"""Structured Streaming over the events table.

The batch twin of the windowed aggregation is ``queries.events_windowed``
(oracle-checked); these builders produce the same results through
``readStream`` so the operator works in both modes. Local tests drive
parquet files through the stream with ``processAllAvailable()``.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (ts normalized → timestamp).

    The file source wants a directory (it tails new files as they land —
    the local stand-in for a kafka topic), so the single test file is
    staged into a temp dir. The ts column has shipped as both
    TIMESTAMP(NANOS)-read-as-long and native micros (TIMESTAMP_NTZ); the
    schema is sniffed from a batch read so both generations stream.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stage = tempfile.mkdtemp(prefix="events_stream_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{stage}/events.parquet")
    schema = spark.read.parquet(f"{stage}/events.parquet").schema
    raw = spark.readStream.schema(schema).format("parquet").load(stage)
    if schema["ts"].dataType.simpleString() == "bigint":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window count/sum with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sessionize_stateful(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows with the native session_window operator."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            F.unix_timestamp(F.col("w.end")).alias("session_end"),
            "n_events",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    """Drive a streaming query to completion against the static files
    (complete mode memory sink), return the result as a DataFrame."""
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")
