"""Bucketed-table layout: pre-shuffled storage so repeated fact-fact
joins and aggregations on the bucket key run with NO exchange.

At 100 TB this is the difference between shuffling the fact table every
query and shuffling it once at write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two tables bucketed on `key` — bucket-local, exchange-free."""
    return spark.table(left_table).join(spark.table(right_table), key)
