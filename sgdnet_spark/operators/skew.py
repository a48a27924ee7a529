"""Skew mitigation helpers (SURVEY.md §4): salting for hot keys.

AQE's skew-join handling covers sort-merge joins automatically; these
helpers cover the cases it doesn't — skewed aggregations and broadcast-
ineligible hot-key joins — with explicit two-stage salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation: partial agg on (key, salt), final on key.

    aggs: {col: 'sum'|'count'|'min'|'max'} — the decomposable aggregates.
    A hot key's rows split across `salt_buckets` reducers in stage one, so
    no single task owns the whole heavy hitter.
    """
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets)))
    first = []
    for c, how in aggs.items():
        fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[how]
        first.append(fn(c).alias(f"__p_{c}"))
    partial = salted.groupBy(key, "__salt").agg(*first)
    final = []
    for c, how in aggs.items():
        refn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}[how]
        final.append(refn(f"__p_{c}").alias(f"{c}_{how}"))
    return partial.groupBy(key).agg(*final)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Replicated-salt join: big side gets a random salt, small side is
    exploded `salt_buckets` times, join on (key, salt). Use when the
    small side is too big to broadcast and the key distribution is
    skewed."""
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    small_s = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(salt_buckets - 1).cast("long"))),
    )
    return big_s.join(small_s, [key, "__salt"]).drop("__salt")
