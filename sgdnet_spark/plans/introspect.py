"""Physical-plan introspection: the guardrails that keep operators
scale-shaped (pushdown reached the scan, small dims broadcast, codegen on).

Used by tests/test_plans.py so a regression that silently turns a
broadcast join into a sort-merge join, or drops a parquet filter, fails CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if `fragment` appears in the parquet scan's PushedFilters."""
    plan = formatted_plan(df)
    for block in plan.split("\n\n"):
        if "PushedFilters" in block and fragment in block:
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names that actually reach the parquet scan (pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(part.split(":")[0].strip() for part in inner.split(",") if ":" in part)
    return cols


def broadcast_join_count(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastHashJoin")


def shuffle_count(df: DataFrame) -> int:
    return physical_plan(df).count("Exchange")


def wholestage_codegen(df: DataFrame) -> bool:
    """Codegen spans only appear in the AQE *final* plan — run the query
    first, then inspect the executed plan."""
    df.collect()
    plan = physical_plan(df)
    return "WholeStageCodegen" in plan or "*(" in plan
