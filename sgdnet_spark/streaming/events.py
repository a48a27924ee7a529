"""Structured Streaming over the events table.

The batch twin of the windowed aggregation is ``queries.events_windowed``
(oracle-checked); these builders produce the same results through
``readStream`` so the operator works in both modes. Local tests drive
parquet files through the stream with ``processAllAvailable()``.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgdnet_spark.session import normalize_events_ts

# one staging dir per source path, removed at interpreter exit — a fresh
# mkdtemp per call would leak a full events.parquet copy per call
_STAGED: dict[str, str] = {}


def _stage_dir(src: str) -> str:
    stage = _STAGED.get(src)
    if stage is None:
        stage = tempfile.mkdtemp(prefix="events_stream_")
        shutil.copy(src, f"{stage}/events.parquet")
        _STAGED[src] = stage
        atexit.register(shutil.rmtree, stage, ignore_errors=True)
    return stage


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (ts normalized → timestamp).

    The file source wants a directory (it tails new files as they land —
    the local stand-in for a kafka topic), so the single test file is
    staged into a (cached, exit-cleaned) temp dir. ts normalization is
    session.normalize_events_ts — the SAME recipe as the batch reader,
    so the two modes can never disagree on a timestamp.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stage = _stage_dir(f"{sf_dir}/events.parquet")
    schema = spark.read.parquet(f"{stage}/events.parquet").schema
    raw = spark.readStream.schema(schema).format("parquet").load(stage)
    return normalize_events_ts(raw)


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
