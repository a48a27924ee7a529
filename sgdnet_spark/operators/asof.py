"""As-of join — an operator Spark lacks natively (DuckDB: ASOF JOIN,
pandas: merge_asof).

Implemented as the union+window composition (guide: "Common OLAP
patterns"): tag both sides, union, sort within each `by` partition on
the time key, and carry the most recent right-side row forward with
last_value(ignore nulls). One shuffle on `by`, sort within partitions —
the same cost profile as a co-partitioned merge join at 100 TB; no
Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the latest right row with
    right.on <= left.on within the same `by` group (backward as-of).

    right_cols are the right-side payload columns to carry; they appear
    with `suffix`. Left rows with no prior right row get NULLs.
    """
    lt = left.withColumn("__side", F.lit(1))
    # a NULL time key never matches under ASOF semantics (NULL compares
    # to nothing) — but Spark sorts NULL FIRST under asc, so an
    # unfiltered NULL-ts right row would be carried into every left row
    # that lacks a real prior match
    rt = right.filter(F.col(on).isNotNull()).select(
        by, on, *[F.col(c).alias(c + suffix) for c in right_cols]
    ).withColumn("__side", F.lit(0))
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None))
    allrows = lt.select(*rt.columns).unionByName(rt)
    # right rows sort before left rows at the same timestamp → a right row
    # with equal `on` is visible to the left row (<= semantics, as duckdb)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # carry ONE struct of all payload columns: the struct is non-null for
    # every right row, so the LATEST matching row wins atomically even
    # when individual payload fields are legitimately NULL (matching
    # DuckDB ASOF JOIN semantics for nullable payloads). Carrying each
    # column with its own last(ignorenulls) would leak an older row's
    # value into a NULL field of the matched row.
    pay = F.when(
        F.col("__side") == 0,
        F.struct(*[F.col(c + suffix).alias(c) for c in right_cols]),
    )
    carried = allrows.withColumn("__pay", F.last(pay, ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1)
    for c in right_cols:
        out = out.withColumn(c + suffix, F.col("__pay")[c])
    return out.drop("__pay", "__side")
