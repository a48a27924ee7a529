"""Physical-plan introspection: the guardrails that keep operators
scale-shaped (pushdown reached the scan, small dims broadcast, codegen on).

Used by tests/test_plans.py so a regression that silently turns a
broadcast join into a sort-merge join, or drops a parquet filter, fails CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Spark truncates scan metadata (PushedFilters/ReadSchema/Location) in
# explain output at this many chars; the default 100 hides filters and
# columns past the cutoff, making pushdown/pruning checks silently pass
# or fail on rendering rather than on the plan.
_METADATA_LEN = "32768"


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key)
    try:
        if old != _METADATA_LEN:
            spark.conf.set(key, _METADATA_LEN)
        return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    finally:
        if old != _METADATA_LEN:
            spark.conf.set(key, old)


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if `fragment` appears in the parquet scan's PushedFilters."""
    plan = formatted_plan(df)
    for block in plan.split("\n\n"):
        if "PushedFilters" in block and fragment in block:
            return True
    return False


def _split_top_level(s: str) -> list[str]:
    """Split a struct body on commas at bracket depth 0 only — a plain
    split would report nested struct fields as top-level columns."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p for p in parts if p]


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names that actually reach the parquet scan (pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(
                part.split(":")[0].strip()
                for part in _split_top_level(inner)
                if ":" in part
            )
    return cols


def broadcast_join_count(df: DataFrame) -> int:
    plan = physical_plan(df)
    return plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")


def shuffle_count(df: DataFrame) -> int:
    """Count SHUFFLE exchanges only. A bare ``.count("Exchange")`` also
    matches BroadcastExchange — under which the exact regression this
    module guards against (a broadcast join degrading to sort-merge)
    swaps BroadcastExchange for a shuffle 1:1 and the count NEVER moves.
    Spark prints shuffles as ``Exchange hashpartitioning(...)`` /
    ``Exchange rangepartitioning(...)`` / ``Exchange SinglePartition``
    and broadcasts as ``BroadcastExchange``; ReusedExchange refers to an
    already-counted node. SinglePartition coalesces count as shuffles
    too (they move data), so only the Broadcast/Reused forms are
    excluded."""
    plan = physical_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        for m in [line.lstrip(" +-*:")]
        if m.startswith("Exchange ")
    )


def wholestage_codegen(df: DataFrame) -> bool:
    """Codegen spans only appear in the AQE *final* plan — run the query
    first, then inspect the executed plan."""
    df.collect()
    plan = physical_plan(df)
    return "WholeStageCodegen" in plan or "*(" in plan
