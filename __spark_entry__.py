"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: gaussian elastic-net path fit on sf0.001.
queries()    — SURVEY.md §2 inventory (sgdnet_spark/queries.py).
oracle_sql() — DuckDB equivalents for the SQL-expressible subset.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make sgdnet_spark importable regardless of the caller's cwd
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: elastic-net gaussian path on lineitem features (sf0.001)."""
    from sgdnet_spark.queries import glm_gaussian_path

    return glm_gaussian_path(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sgdnet_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sgdnet_spark.queries import ORACLES

    return dict(ORACLES)
