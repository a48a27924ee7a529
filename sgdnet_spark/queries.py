"""Query inventory (SURVEY.md §2) + DuckDB oracle SQL.

Each ``QUERIES[name]`` is ``(spark, sf_dir) -> DataFrame``; where the
semantics are ANSI-SQL-expressible, ``ORACLES[name]`` holds the DuckDB
equivalent run by the driver's correctness gate. Float outputs are
ROUNDed identically on both sides (grid ≥ 1e6 × the expected
cross-engine FP summation error) so value hashes compare stably;
integer/string outputs are exact.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sgdnet_spark.operators import dedup, multimodal, similarity, text

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # oracle comparisons assume UTC timestamp semantics (duckdb is tz-naive);
    # only touch session conf when it actually differs (conf writes
    # invalidate cached session state)
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS) which Spark has no native
        # type for: read nanos as long, truncate to micros (= duckdb's view)
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# GLM feature set: 5 engineered features + gaussian label on lineitem
# --------------------------------------------------------------------------

FEATURE_NAMES = ["l_quantity", "l_discount", "l_tax", "x_month", "x_qty_disc"]
GAUSS_LABEL = "l_extendedprice"

FEATURES_SQL = """
    SELECT l_quantity AS l_quantity,
           l_discount AS l_discount,
           l_tax AS l_tax,
           CAST(month(l_shipdate) AS DOUBLE) AS x_month,
           l_quantity * l_discount AS x_qty_disc,
           l_extendedprice AS y,
           l_returnflag,
           l_orderkey, l_linenumber
    FROM lineitem
"""


def feature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_quantity").cast("double").alias("l_quantity"),
        F.col("l_discount").cast("double").alias("l_discount"),
        F.col("l_tax").cast("double").alias("l_tax"),
        F.month("l_shipdate").cast("double").alias("x_month"),
        (F.col("l_quantity") * F.col("l_discount")).alias("x_qty_disc"),
        F.col("l_extendedprice").alias("y"),
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
    )


# --- 1. feature_stats ------------------------------------------------------

_FEATURE_STATS_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS feature, ROUND(AVG({c}),4) AS mean, ROUND(STDDEV_POP({c}),4) AS std,"
    f" ROUND(MIN({c}),4) AS vmin, ROUND(MAX({c}),4) AS vmax FROM ({FEATURES_SQL})"
    for c in FEATURE_NAMES
)


@register("feature_stats", _FEATURE_STATS_ORACLE)
def feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardization statistics (reference src/utils.h:Standardize).

    ONE wide aggregation over ONE scan of lineitem (all 5×4 statistics
    in a single agg row, stacked to long form) — never one scan branch
    per feature."""
    f = feature_frame(spark, sf_dir)
    aggs = []
    for i, c in enumerate(FEATURE_NAMES):
        aggs += [
            F.round(F.avg(c), 4).alias(f"mean_{i}"),
            F.round(F.stddev_pop(c), 4).alias(f"std_{i}"),
            F.round(F.min(c), 4).alias(f"min_{i}"),
            F.round(F.max(c), 4).alias(f"max_{i}"),
        ]
    row = f.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', mean_{i}, std_{i}, min_{i}, max_{i}" for i, c in enumerate(FEATURE_NAMES)
    )
    return row.selectExpr(
        f"stack({len(FEATURE_NAMES)}, {stack_expr}) AS (feature, mean, std, vmin, vmax)"
    )


# --- 2. gram_corr_matrix ---------------------------------------------------

_PAIRS = [(a, b) for i, a in enumerate(FEATURE_NAMES) for b in FEATURE_NAMES[i:]]

_GRAM_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{a}' AS f1, '{b}' AS f2, ROUND(SUM({a}*{b})/COUNT(*),4) AS gram,"
    f" ROUND(CORR({a}, {b}),6) AS corr FROM ({FEATURES_SQL})"
    for a, b in _PAIRS
)


@register("gram_corr_matrix", _GRAM_ORACLE)
def gram_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw second-moment matrix X'X/n (the single-pass sufficient
    statistic behind the gaussian path solver, SURVEY.md §3) plus the
    pairwise Pearson correlation of the same pairs — ONE wide aggregation
    over one scan, stacked to long form."""
    f = feature_frame(spark, sf_dir)
    aggs = [
        F.round(F.sum(F.col(a) * F.col(b)) / F.count("*"), 4).alias(f"g_{i}")
        for i, (a, b) in enumerate(_PAIRS)
    ] + [F.round(F.corr(a, b), 6).alias(f"c_{i}") for i, (a, b) in enumerate(_PAIRS)]
    row = f.agg(*aggs)
    stack_expr = ", ".join(f"'{a}', '{b}', g_{i}, c_{i}" for i, (a, b) in enumerate(_PAIRS))
    return row.selectExpr(f"stack({len(_PAIRS)}, {stack_expr}) AS (f1, f2, gram, corr)")


# --- 3. lambda_path (row s=0 is lambda_max) --------------------------------

_LMAX_EXPR = "GREATEST(" + ", ".join(
    f"ABS(COVAR_POP({c}, y)) / STDDEV_POP({c})" for c in FEATURE_NAMES
) + ")"


def _lambda_max_col(f: DataFrame) -> F.Column:
    return F.greatest(
        *[F.abs(F.covar_pop(c, "y")) / F.stddev_pop(c) for c in FEATURE_NAMES]
    )


_NLAMBDA, _LMR = 100, 1e-4

_LPATH_ORACLE = f"""
WITH lm AS (SELECT {_LMAX_EXPR} AS lambda_max FROM ({FEATURES_SQL}))
SELECT CAST(i AS BIGINT) AS s,
       ROUND(lambda_max * POW({_LMR}, i / ({_NLAMBDA} - 1.0)), 4) AS lambda
FROM lm, generate_series(0, {_NLAMBDA - 1}) t(i)
"""


@register("lambda_path", _LPATH_ORACLE)
def lambda_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nlambda log-spaced penalties (reference src/utils.h:144).

    The s=0 row IS lambda_max = max_j |<x~_j, y - ybar>| / n (reference
    src/families.h:121 LambdaMax) — one entry covers both operators."""
    f = feature_frame(spark, sf_dir)
    lm = f.agg(_lambda_max_col(f).alias("lambda_max"))
    return (
        lm.select("lambda_max", F.explode(F.sequence(F.lit(0), F.lit(_NLAMBDA - 1))).alias("i"))
        .select(
            F.col("i").cast("bigint").alias("s"),
            F.round(
                F.col("lambda_max") * F.pow(F.lit(_LMR), F.col("i") / F.lit(_NLAMBDA - 1.0)), 4
            ).alias("lambda"),
        )
    )


# --- 5. regr_univariate ----------------------------------------------------

_REGR_ORACLE = """
SELECT l_returnflag,
       ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope,
       ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4) AS icept,
       ROUND(REGR_R2(l_extendedprice, l_quantity), 6) AS r2
FROM lineitem GROUP BY l_returnflag
"""


@register("regr_univariate", _REGR_ORACLE)
def regr_univariate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("icept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
    )


# --------------------------------------------------------------------------
# Analytics queries
# --------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '2000-12-01'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", _Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_Q3_ORACLE = """
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderpriority
FROM customer, orders, lineitem
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1998-01-01' AND l_shipdate > DATE '1998-01-01'
GROUP BY l_orderkey, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


@register("q3_shipping_priority", _Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("date"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)  # AQE broadcasts while small
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q5_ORACLE = """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
GROUP BY n_name
"""


@register("q5_local_supplier", _Q5_ORACLE)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, (orders.o_custkey == cust.c_custkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


_Q6_ORACLE = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
"""


@register("q6_forecast_revenue", _Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


_Q10_ORACLE = """
SELECT c_custkey, c_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_returnflag = 'R'
  AND o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-07-01'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


@register("q10_returned_items", _Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("date"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_TOPN_ORACLE = """
SELECT p_brand, p_partkey, p_retailprice FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part) t
WHERE rn <= 3
"""


@register("top_n_per_group", _TOPN_ORACLE)
def top_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice")
    )


_SESSION_ORACLE = """
WITH g AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM g GROUP BY user_id
"""


@register("events_sessionize", _SESSION_ORACLE)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_s = F.when(F.lag("ts").over(w).isNull() | (gap > 1800), 1).otherwise(0)
    return (
        ev.withColumn("new_s", new_s)
        .groupBy("user_id")
        .agg(F.sum("new_s").cast("bigint").alias("n_sessions"), F.count("*").alias("n_events"))
    )


_WINDOWED_ORACLE = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
       COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


@register("events_windowed", _WINDOWED_ORACLE)
def events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming tumbling-window aggregation
    (sgdnet_spark/streaming); identical grouping semantics."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


_Q2_ORACLE = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
j AS (
  SELECT p_partkey, p_brand, l_suppkey, s_acctbal,
         ROW_NUMBER() OVER (PARTITION BY p_partkey ORDER BY s_acctbal, l_suppkey) AS rn
  FROM part, ps, supplier
  WHERE p_partkey = l_partkey AND l_suppkey = s_suppkey AND p_size < 10)
SELECT p_partkey, p_brand, l_suppkey AS best_suppkey, ROUND(s_acctbal, 2) AS acctbal
FROM j WHERE rn = 1
"""


@register("q2_min_cost_supplier", _Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 pattern: correlated min-per-group subquery as a window."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    ps = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    supp = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("p_partkey").orderBy("s_acctbal", "l_suppkey")
    return (
        ps.join(part, ps.l_partkey == part.p_partkey)
        .join(supp, ps.l_suppkey == supp.s_suppkey)  # AQE broadcasts while small
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey", "p_brand",
            F.col("l_suppkey").alias("best_suppkey"),
            F.round("s_acctbal", 2).alias("acctbal"),
        )
    )


# --- tpch_deep: 10 more TPC-H query patterns, one long-format entry --------
#
# q7/q8/q9/q11/q12/q13/q15/q17/q20/q21 adapted to the testdata star schema
# (no partsupp / commitdate / receiptdate / shipmode — supplycost is proxied
# by 0.55*p_retailprice, shipmode classes by ship-delay buckets). Uniform
# output (q, grp, metric, v) so ONE driver row hash-checks all ten; every
# sub-query is an independent DataFrame plan unioned at the end, so Catalyst
# optimizes each join tree separately (AQE broadcasts the small sides).

_TPCH_DEEP_ORACLE = """
SELECT 'q7' AS q, supp_nation || '|' || cust_nation || '|' || CAST(l_year AS VARCHAR) AS grp,
       'revenue' AS metric, ROUND(SUM(volume), 2) AS v
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year, l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
        AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND year(l_shipdate) IN (1997, 1998))
GROUP BY supp_nation, cust_nation, l_year
UNION ALL
SELECT 'q8', CAST(o_year AS VARCHAR), 'mkt_share',
       FLOOR(SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END) / SUM(volume) * 1e6 + 0.5) / 1e6
FROM (SELECT year(o_orderdate) AS o_year, l_extendedprice * (1 - l_discount) AS volume,
             n1.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
        AND o_custkey = c_custkey AND c_nationkey = n2.n_nationkey
        AND n2.n_regionkey = r_regionkey AND r_name = 'ASIA'
        AND s_nationkey = n1.n_nationkey AND p_type = 'PROMO')
GROUP BY o_year
UNION ALL
SELECT 'q9', n_name || '|' || CAST(o_year AS VARCHAR), 'sum_profit', ROUND(SUM(amount), -1)
FROM (SELECT n_name, year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) - 0.55 * p_retailprice * l_quantity AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey AND o_orderkey = l_orderkey
        AND s_nationkey = n_nationkey AND p_type = 'ECONOMY')
GROUP BY n_name, o_year
UNION ALL
SELECT 'q11', CAST(l_partkey AS VARCHAR), 'value', ROUND(v, 2)
FROM (SELECT l_partkey, SUM(l_extendedprice) AS v
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
      GROUP BY l_partkey) val
WHERE v > 0.0005 * (SELECT SUM(v) FROM (SELECT SUM(l_extendedprice) AS v
                                        FROM lineitem, supplier, nation
                                        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
                                          AND n_name = 'NATION_3'
                                        GROUP BY l_partkey))
UNION ALL
SELECT 'q12', bucket, metric, CAST(COUNT(*) AS DOUBLE)
FROM (SELECT CASE WHEN d <= 30 THEN 'fast' WHEN d <= 90 THEN 'medium' ELSE 'slow' END AS bucket,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'high_line_count' ELSE 'low_line_count' END AS metric
      FROM (SELECT date_diff('day', o_orderdate, l_shipdate) AS d, o_orderpriority
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE year(l_shipdate) = 1998))
GROUP BY bucket, metric
UNION ALL
SELECT 'q13', CAST(c_count AS VARCHAR), 'custdist', CAST(COUNT(*) AS DOUBLE)
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey)
GROUP BY c_count
UNION ALL
SELECT 'q15', s_name, 'total_revenue', ROUND(r, 2)
FROM (SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS r
      FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
      GROUP BY l_suppkey) rev
JOIN supplier ON s_suppkey = l_suppkey
WHERE r = (SELECT MAX(r) FROM (SELECT SUM(l_extendedprice * (1 - l_discount)) AS r
                               FROM lineitem
                               WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
                               GROUP BY l_suppkey))
UNION ALL
SELECT 'q17', 'all', 'avg_yearly', ROUND(SUM(l_extendedprice) / 7.0, 2)
FROM lineitem JOIN part ON p_partkey = l_partkey
JOIN (SELECT l_partkey AS pq_partkey, 0.5 * AVG(l_quantity) AS t
      FROM lineitem GROUP BY l_partkey) pq ON pq_partkey = l_partkey
WHERE p_brand = 'Brand#1' AND l_quantity < t
UNION ALL
SELECT 'q20', n_name, 'n_suppliers', CAST(COUNT(*) AS DOUBLE)
FROM (SELECT l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO' AND year(l_shipdate) = 1997
      GROUP BY l_suppkey) shipped
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE qty > 80
GROUP BY n_name
UNION ALL
SELECT 'q21', n_name, 'numwait', CAST(COUNT(*) AS DOUBLE)
FROM (SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM (SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F') l
      JOIN (SELECT l_orderkey, MAX(l_shipdate) AS mx, COUNT(DISTINCT l_suppkey) AS ns
            FROM (SELECT l_orderkey, l_suppkey, l_shipdate
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  WHERE o_orderstatus = 'F')
            GROUP BY l_orderkey) m ON l.l_orderkey = m.l_orderkey
      WHERE m.ns >= 2 AND l.l_shipdate = m.mx
        AND date_diff('day', o_orderdate, l_shipdate) > 120) w
JOIN supplier ON w.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


@register("tpch_deep", _TPCH_DEEP_ORACLE)
def tpch_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten TPC-H query patterns (Q7/8/9/11/12/13/15/17/20/21, schema-
    adapted) in one long-format frame: (q, grp, metric, v)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    out = lambda df, q, grp, metric, v: df.select(  # noqa: E731
        F.lit(q).alias("q"), grp.alias("grp"), F.lit(metric).alias("metric"), v.alias("v")
    )

    # q7 — volume shipping between two nations, by year
    n1 = F.broadcast(nat.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nat.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")))
    q7 = (
        li.filter(F.year("l_shipdate").isin(1997, 1998))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, supp.s_nationkey == F.col("sn_key"))
        .join(n2, cust.c_nationkey == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(rev), 2).alias("v"))
    )
    q7 = out(q7, "q7", F.concat_ws("|", "supp_nation", "cust_nation", F.col("l_year").cast("string")), "revenue", F.col("v"))

    # q8 — national market share within ASIA-customer PROMO-part revenue
    n2r = F.broadcast(
        nat.join(reg.filter(F.col("r_name") == "ASIA"), nat.n_regionkey == reg.r_regionkey)
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    q8 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(part.filter(F.col("p_type") == "PROMO"), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, supp.s_nationkey == F.col("sn_key"))
        .join(n2r, cust.c_nationkey == F.col("cn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            text.rpos(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                6,
            ).alias("v")
        )
    )
    q8 = out(q8, "q8", F.col("o_year").cast("string"), "mkt_share", F.col("v"))

    # q9 — product profit by supplier nation and order year
    amount = rev - 0.55 * F.col("p_retailprice") * F.col("l_quantity")
    q9 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part.filter(F.col("p_type") == "ECONOMY"), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        # tens grid: the profit expression subtracts two like-sized products,
        # so cross-engine summation error reaches cents at nation-year scale
        .agg(F.round(F.sum(amount), -1).alias("v"))
    )
    q9 = out(q9, "q9", F.concat_ws("|", "n_name", F.col("o_year").cast("string")), "sum_profit", F.col("v"))

    # q11 — important parts by shipped value share from one nation's suppliers
    val = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat.filter(F.col("n_name") == "NATION_3")), supp.s_nationkey == nat.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("val"))
    )
    tot = val.agg(F.sum("val").alias("tot"))
    q11 = (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("val") > 0.0005 * F.col("tot"))
        .select(F.col("l_partkey"), F.round("val", 2).alias("v"))
    )
    q11 = out(q11, "q11", F.col("l_partkey").cast("string"), "value", F.col("v"))

    # q12 — ship-delay buckets × priority class line counts
    q12 = (
        li.filter(F.year("l_shipdate") == 1998)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.when(F.datediff("l_shipdate", "o_orderdate") <= 30, "fast")
            .when(F.datediff("l_shipdate", "o_orderdate") <= 90, "medium")
            .otherwise("slow")
            .alias("bucket"),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high_line_count"
            ).otherwise("low_line_count").alias("metric"),
        )
        .groupBy("bucket", "metric")
        .agg(F.count("*").cast("double").alias("v"))
    )
    q12 = q12.select(F.lit("q12").alias("q"), F.col("bucket").alias("grp"), "metric", "v")

    # q13 — customer order-count distribution
    q13 = (
        cust.join(
            orders.filter(F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            cust.c_custkey == orders.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").cast("double").alias("v"))
    )
    q13 = out(q13, "q13", F.col("c_count").cast("string"), "custdist", F.col("v"))

    # q15 — top supplier(s) by revenue in a quarter
    rev_q = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("date"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev).alias("r"))
    )
    mx = rev_q.agg(F.max("r").alias("mx"))
    q15 = (
        rev_q.crossJoin(F.broadcast(mx))
        .filter(F.col("r") == F.col("mx"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(F.col("s_name"), F.round("r", 2).alias("v"))
    )
    q15 = out(q15, "q15", F.col("s_name"), "total_revenue", F.col("v"))

    # q17 — small-quantity order revenue for one brand (avg_yearly)
    pq = li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("t")
    )
    q17 = (
        li.join(part.filter(F.col("p_brand") == "Brand#1"), li.l_partkey == part.p_partkey)
        .join(pq, F.col("pq_partkey") == li.l_partkey)
        .filter(F.col("l_quantity") < F.col("t"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("v"))
    )
    q17 = out(q17, "q17", F.lit("all"), "avg_yearly", F.col("v"))

    # q20 — suppliers with heavy 1997 PROMO shipments, per nation
    shipped = (
        li.filter(F.year("l_shipdate") == 1997)
        .join(part.filter(F.col("p_type") == "PROMO"), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 80)
    )
    q20 = (
        shipped.join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").cast("double").alias("v"))
    )
    q20 = out(q20, "q20", F.col("n_name"), "n_suppliers", F.col("v"))

    # q21 — suppliers who kept multi-supplier 'F' orders waiting
    lf = (
        li.join(orders.filter(F.col("o_orderstatus") == "F"), li.l_orderkey == orders.o_orderkey)
        .select("l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate")
    )
    m = lf.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("mx"), F.countDistinct("l_suppkey").alias("ns")
    )
    w = (
        lf.join(m, "l_orderkey")
        .filter(
            (F.col("ns") >= 2)
            & (F.col("l_shipdate") == F.col("mx"))
            & (F.datediff("l_shipdate", "o_orderdate") > 120)
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    q21 = (
        w.join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").cast("double").alias("v"))
    )
    q21 = out(q21, "q21", F.col("n_name"), "numwait", F.col("v"))

    frames = [q7, q8, q9, q11, q12, q13, q15, q17, q20, q21]
    res = frames[0]
    for f in frames[1:]:
        res = res.unionByName(f)
    return res


_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


@register("q4_order_priority", _Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


_Q14_ORACLE = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-07-01'
"""


@register("q14_promo_revenue", _Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("date"))
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)) / F.sum(rev), 6
            ).alias("promo_revenue_pct")
        )
    )


_Q16_ORACLE = """
SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem, part
WHERE l_partkey = p_partkey AND p_size IN (1, 5, 9, 14, 23)
GROUP BY p_brand, p_type
"""


@register("q16_parts_supplier", _Q16_ORACLE)
def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size").isin(1, 5, 9, 14, 23))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q18_ORACLE = """
SELECT o_orderkey, o_totalprice, ROUND(SUM(l_quantity), 2) AS total_qty
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
GROUP BY o_orderkey, o_totalprice
HAVING SUM(l_quantity) > 150
ORDER BY total_qty DESC, o_orderkey LIMIT 20
"""


@register("q18_large_orders", _Q18_ORACLE)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


_Q19_ORACLE = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue, COUNT(*) AS n
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND ((p_type = 'PROMO'    AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
    OR (p_type = 'STANDARD' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 25)
    OR (p_type = 'LARGE'    AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 15 AND 40))
"""


@register("q19_discounted_revenue", _Q19_ORACLE)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_type") == "PROMO") & sz.between(1, 15) & q.between(1, 15))
        | ((F.col("p_type") == "STANDARD") & sz.between(10, 30) & q.between(10, 25))
        | ((F.col("p_type") == "LARGE") & sz.between(20, 50) & q.between(15, 40))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


_Q22_ORACLE = """
SELECT c_nationkey, COUNT(*) AS numcust, ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01')
GROUP BY c_nationkey
"""


@register("q22_global_sales", _Q22_ORACLE)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery + NOT EXISTS → anti join (idle high-balance
    customers in the quarter)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("date"))
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal")).first()[0]
    return (
        cust.filter(F.col("c_acctbal") > float(avg_bal))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"), F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
    )


_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


@register("rollup_revenue", _ROLLUP_ORACLE)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count("*").alias("n"),
    )


_PIVOT_ORACLE = """
SELECT l_returnflag,
       ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F,
       ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O
FROM lineitem GROUP BY l_returnflag
"""


@register("pivot_linestatus", _PIVOT_ORACLE)
def pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return out.select(
        "l_returnflag", F.col("F").alias("qty_F"), F.col("O").alias("qty_O")
    )


_ASOF_ORACLE = """
SELECT p.event_id, p.user_id, c.event_id AS prior_click_id,
       CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS gap_s
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@register("asof_purchase_click", _ASOF_ORACLE)
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (operators/asof.py): latest click at or before
    each purchase, per user."""
    from sgdnet_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    joined = asof_join(purchases, clicks, on="ts", by="user_id", right_cols=["event_id", "ts"])
    return joined.select(
        "event_id",
        "user_id",
        F.col("event_id_r").alias("prior_click_id"),
        (F.unix_timestamp("ts") - F.unix_timestamp("ts_r")).cast("bigint").alias("gap_s"),
    )


_JSON_ORACLE = """
SELECT event_type,
       CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       COUNT(*) AS n,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
"""


@register("events_json_props", _JSON_ORACLE)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: JSON props column → typed buckets."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.groupBy("event_type", (k % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


_QUANTILE_ORACLE = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
       ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
FROM lineitem GROUP BY l_returnflag
"""


@register("quantile_prices", _QUANTILE_ORACLE)
def quantile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles (matches duckdb quantile_cont)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99"),
    )


_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING), 2) AS running_total,
       ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
"""


@register("running_customer_total", _RUNNING_ORACLE)
def running_customer_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative windows with deterministic tie-break."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias(
            "running_total"
        ),
        F.row_number().over(w).alias("order_seq"),
    )


# --------------------------------------------------------------------------
# LLM-pipeline operators (24-35)
# --------------------------------------------------------------------------

_NORM_SQL = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_TOKENS_SQL = f"string_split({_NORM_SQL}, ' ')"

_DEDUP_EXACT_ORACLE = f"""
WITH h AS (SELECT md5({_NORM_SQL}) AS h FROM documents)
SELECT COUNT(*) AS n_docs, COUNT(DISTINCT h) AS n_unique,
       COUNT(*) - COUNT(DISTINCT h) AS n_dup_rows
FROM h
"""


@register("dedup_exact", _DEDUP_EXACT_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_stats(_t(spark, sf_dir, "documents"))


_JACCARD_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents),
idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks),
sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle FROM idx),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b, FLOOR(c * 1.0 / (sa.sz + sb.sz - c) * 10000 + 0.5) / 10000 AS jaccard
FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.5
"""


@register("dedup_ngram_jaccard", _JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.5)


@register("dedup_minhash_lsh")  # MinHash recall is tested vs #25 in tests/
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(_t(spark, sf_dir, "documents"), threshold=0.5)


@register("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_pairs(_t(spark, sf_dir, "documents"), max_hamming=8)


_COS_NORM_SQL = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v)
"""

_EMB_COS_ORACLE = f"""
{_COS_NORM_SQL}
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) AS cos
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.45
"""


@register("dedup_embedding_cosine", _EMB_COS_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.cosine_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.45)


_ANN_ORACLE = f"""
{_COS_NORM_SQL},
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
         list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos
  FROM n q JOIN n c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < 10),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rn FROM s)
SELECT query_id, nbr_id, ROUND(cos, 4) AS cos FROM r WHERE rn <= 5
"""


@register("ann_topk_bruteforce", _ANN_ORACLE)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register("ann_approx")
def ann_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both approximate-ANN scale paths in one long-format result:
    method='lsh' (random-hyperplane buckets) and method='ivf'
    (distributed k-means coarse quantizer + nprobe inverted lists).
    Recall@k floors vs ann_topk_bruteforce are asserted in
    tests/test_operators.py and tests/test_ivf.py."""
    from sgdnet_spark.operators.ivf import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    lsh = similarity.lsh_topk(emb, q, k=5).withColumn("method", F.lit("lsh"))
    ivf = ivf_topk(emb, q, k_neighbors=5, n_lists=8, nprobe=3).withColumn("method", F.lit("ivf"))
    return lsh.unionByName(ivf).select("method", "query_id", "nbr_id", "cos")


_TOKCOUNT_ORACLE = f"""
SELECT doc_id, 'ws' AS tokenizer,
       CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tokens,
       CAST(length({_NORM_SQL}) AS BIGINT) AS n_aux
FROM documents
UNION ALL
SELECT doc_id, 'bpe' AS tokenizer,
       CAST(len(regexp_extract_all({_NORM_SQL}, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(regexp_extract_all({_NORM_SQL}, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS n_aux
FROM documents
"""


@register("text_token_count", _TOKCOUNT_ORACLE)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish tokenization counts, long format: one row
    per (doc, tokenizer). n_aux = normalized char count for 'ws',
    distinct sub-token count for 'bpe'. (Merged driver entry — the two
    tokenizers were separate registry keys through round 2.)"""
    docs = _t(spark, sf_dir, "documents")
    ws = text.token_count(docs).select(
        "doc_id",
        F.lit("ws").alias("tokenizer"),
        F.col("n_tokens"),
        F.col("n_chars_norm").alias("n_aux"),
    )
    bpe = text.token_count_bpe(docs).select(
        "doc_id",
        F.lit("bpe").alias("tokenizer"),
        F.col("n_bpe_tokens").alias("n_tokens"),
        F.col("n_bpe_unique").alias("n_aux"),
    )
    return ws.unionByName(bpe)


_STOP_SQL = "['" + "', '".join(text.STOPWORDS) + "']"

_QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOKENS_SQL} AS tk, CAST(length({_NORM_SQL}) AS DOUBLE) AS nc
  FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(tk) AS DOUBLE) AS n,
         CAST(len(list_filter(tk, x -> list_contains({_STOP_SQL}, x))) AS DOUBLE) AS n_stop,
         nc
  FROM t)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       FLOOR(n_stop / n * 10000 + 0.5) / 10000 AS stopword_ratio,
       FLOOR((nc - (n - 1)) / n * 10000 + 0.5) / 10000 AS mean_token_len,
       FLOOR((n_stop / n * 0.4
             + LEAST(n / 100.0, 1.0) * 0.4
             + LEAST(((nc - (n - 1)) / n) / 8.0, 1.0)* 0.2) * 10000 + 0.5) / 10000 AS quality
FROM m
"""


@register("text_quality", _QUALITY_ORACLE)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_score(_t(spark, sf_dir, "documents"))


def _langid_oracle() -> str:
    langs = sorted(text.LANG_PROFILES)
    score_cols = ",\n         ".join(
        f"FLOOR(len(list_filter(tk, x -> list_contains(['"
        + "', '".join(text.LANG_PROFILES[lang])
        + f"'], x))) * 1.0 / len(tk) * 1000000 + 0.5) / 1000000 AS s_{lang}"
        for lang in langs
    )
    # argmax with lexicographic tie-break: first lang that is >= all later ones
    cases = []
    for i, lang in enumerate(langs):
        conds = " AND ".join(f"s_{lang} >= s_{other}" for other in langs[i + 1:])
        cases.append(f"WHEN {conds} THEN '{lang}'" if conds else f"ELSE '{lang}'")
    case_sql = "CASE " + " ".join(cases) + " END"
    greatest = "GREATEST(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    return f"""
WITH t AS (SELECT doc_id, lang, {_TOKENS_SQL} AS tk FROM documents),
s AS (SELECT doc_id, lang,
         {score_cols}
      FROM t)
SELECT doc_id, {case_sql} AS pred_lang, {greatest} AS pred_score,
       CAST(lang = ({case_sql}) AS BIGINT) AS matches_label
FROM s
"""


@register("text_langid", _langid_oracle())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.lang_id(_t(spark, sf_dir, "documents"))


_FP_ORACLE = f"""
SELECT doc_id, 'md5' AS method, md5({_NORM_SQL}) AS fp FROM documents
UNION ALL
SELECT doc_id, 'winnow' AS method, fp FROM (
  WITH n AS (SELECT doc_id, {_NORM_SQL} AS s FROM documents),
  h AS (SELECT doc_id,
          list_transform(generate_series(1, greatest(length(s) - 7, 0)),
                         i -> md5(substring(s, i, 8))) AS hs
        FROM n),
  w AS (SELECT doc_id,
          CASE WHEN len(hs) >= 16
                 THEN list_transform(generate_series(1, len(hs) - 15),
                                     i -> list_min(hs[i:i+15]))
               WHEN len(hs) > 0 THEN [list_min(hs)]
               ELSE [] END AS fps
        FROM h)
  SELECT DISTINCT doc_id, unnest(fps) AS fp FROM w)
"""


@register("text_fingerprint", _FP_ORACLE)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document md5 + winnowing (Schleimer et al.) rolling local
    fingerprints, long format: (doc, method, fp). (Merged driver entry —
    'text_winnow' was a separate registry key through round 2.)"""
    docs = _t(spark, sf_dir, "documents")
    md5 = text.fingerprint(docs).select("doc_id", F.lit("md5").alias("method"), "fp")
    win = text.winnow_fingerprints(docs).select(
        "doc_id", F.lit("winnow").alias("method"), "fp"
    )
    return md5.unionByName(win)


# --- text_mining: corpus n-gram statistics + per-doc TF-IDF ----------------

_TEXT_MINING_ORACLE = f"""
WITH t AS (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents)
SELECT 'bigram_topk' AS q, b AS grp, 'count' AS metric, CAST(n AS DOUBLE) AS v
FROM (SELECT b, COUNT(*) AS n
      FROM (SELECT t[i] || ' ' || t[i+1] AS b
            FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM t))
      GROUP BY b ORDER BY n DESC, b LIMIT 20)
UNION ALL
SELECT 'unigram_topk', w, 'count', CAST(n AS DOUBLE)
FROM (SELECT w, COUNT(*) AS n
      FROM (SELECT unnest(t) AS w FROM t)
      GROUP BY w ORDER BY n DESC, w LIMIT 30)
UNION ALL
SELECT 'tfidf_top', CAST(doc_id AS VARCHAR) || '|' || term, 'tfidf', score
FROM (
  SELECT doc_id, term, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
  FROM (SELECT tfc.doc_id, tfc.term,
               FLOOR(tf * ln(nd * 1.0 / df) * 1e6 + 0.5) / 1e6 AS score
        FROM (SELECT doc_id, term, COUNT(*) AS tf
              FROM (SELECT doc_id, unnest(t) AS term FROM t WHERE doc_id < 50)
              GROUP BY doc_id, term) tfc
        JOIN (SELECT term, COUNT(DISTINCT doc_id) AS df
              FROM (SELECT doc_id, unnest(t) AS term FROM t)
              GROUP BY term) dfc ON tfc.term = dfc.term
        CROSS JOIN (SELECT COUNT(*) AS nd FROM documents)))
WHERE rn = 1
"""


@register("text_mining", _TEXT_MINING_ORACLE)
def text_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mining trio in one long-format frame (q, grp, metric, v):
    global top-20 bigrams, top-30 unigrams (Zipf head), and each
    document's top TF-IDF term (docs 0-49; idf over the whole corpus).

    All counting is explode + groupBy (two shuffles each, map-side
    combined); ranking ties break on the ROUNDED score then term so
    both engines agree at the 1e-6 grid."""
    from sgdnet_spark.session import spread_small_input

    docs = _t(spark, sf_dir, "documents")
    toks = spread_small_input(docs).select("doc_id", text.tokens("text").alias("t"))
    t = F.col("t")
    uni = toks.select("doc_id", F.explode("t").alias("w"))
    idx = F.when(F.size(t) >= 2, F.sequence(F.lit(0), F.size(t) - 2)).otherwise(
        F.array().cast("array<int>")
    )
    bg = toks.select(
        F.explode(
            F.transform(idx, lambda i: F.concat_ws(" ", F.element_at(t, i + 1), F.element_at(t, i + 2)))
        ).alias("b")
    )
    top_bg = bg.groupBy("b").agg(F.count("*").alias("n")).orderBy(F.desc("n"), F.asc("b")).limit(20)
    top_uni = uni.groupBy("w").agg(F.count("*").alias("n")).orderBy(F.desc("n"), F.asc("w")).limit(30)

    nd = float(docs.count())  # scalar aggregate (metadata-only on parquet)
    tfc = uni.filter(F.col("doc_id") < 50).groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    dfc = uni.select("doc_id", "w").distinct().groupBy("w").agg(F.count("*").alias("df"))
    rn_w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("w"))
    tfidf = (
        tfc.join(dfc, "w")
        .withColumn("score", text.rpos(F.col("tf") * F.log(F.lit(nd) / F.col("df")), 6))
        .withColumn("rn", F.row_number().over(rn_w))
        .filter(F.col("rn") == 1)
    )

    def shape(df, q, grp, v):
        return df.select(
            F.lit(q).alias("q"), grp.alias("grp"),
            F.lit("count" if q != "tfidf_top" else "tfidf").alias("metric"),
            v.cast("double").alias("v"),
        )

    return (
        shape(top_bg, "bigram_topk", F.col("b"), F.col("n"))
        .unionByName(shape(top_uni, "unigram_topk", F.col("w"), F.col("n")))
        .unionByName(
            shape(
                tfidf, "tfidf_top",
                F.concat_ws("|", F.col("doc_id").cast("string"), F.col("w")),
                F.col("score"),
            )
        )
    )


_COMPONENTS_ORACLE = f"""
WITH RECURSIVE toks AS (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents),
idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks),
sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle FROM idx),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.5),
sym AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE r.a <> s.b
)
SELECT a AS doc_id, LEAST(a, MIN(b)) AS canonical FROM reach GROUP BY a
"""


@register("dedup_components", _COMPONENTS_ORACLE)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: iterative min-label propagation (checked
    against a recursive-CTE transitive closure in duckdb).

    Pairs come from the MinHash+LSH scale path (bucketed candidates,
    exact-Jaccard verification — never the all-pairs shingle self-join),
    while the oracle derives them exhaustively: the hash match doubles
    as an LSH recall check."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    return dedup.duplicate_components(pairs)


_CLEAN_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents),
idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks),
sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle FROM idx),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
dups AS (
  SELECT DISTINCT id_b AS doc_id FROM inter
  JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.5),
quality AS (
  SELECT doc_id, len({_TOKENS_SQL}) AS n_tokens FROM documents)
SELECT d.doc_id, q.n_tokens
FROM documents d JOIN quality q ON d.doc_id = q.doc_id
WHERE d.doc_id NOT IN (SELECT doc_id FROM dups) AND q.n_tokens >= 20
"""


@register("corpus_clean", _CLEAN_ORACLE)
def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end cleaning pipeline: drop near-duplicates (keep the
    lower doc_id of each pair) and too-short documents — the composition
    a training-data pipeline actually runs.

    Near-dup pairs come from MinHash+LSH (the 100 TB path: bucketed
    candidates + exact verification), hash-checked against the
    exhaustive all-pairs oracle."""
    docs = _t(spark, sf_dir, "documents")
    dups = dedup.minhash_lsh_pairs(docs, threshold=0.5).select(
        F.col("id_b").alias("doc_id")
    ).distinct()
    kept = docs.join(dups, "doc_id", "left_anti")
    tok = text.token_count(kept).select("doc_id", "n_tokens")
    return (
        kept.join(tok, "doc_id")
        .filter(F.col("n_tokens") >= 20)
        .select("doc_id", "n_tokens")
    )


# The oracle recomputes every dimension from the deterministic
# generation rule (sha256(text) digest bytes), WITHOUT decoding — while
# the Spark side parses them out of the real BMP/WAV payload bytes. A
# hash match therefore certifies the whole encode → decode → extract →
# frame-sample chain. hexbyte(i) = i-th byte of the sha256 hex digest.
_MM_HEXBYTE = (
    "(16 * (strpos('0123456789abcdef', substr(h, {p}, 1)) - 1)"
    " + strpos('0123456789abcdef', substr(h, {p} + 1, 1)) - 1)"
)
_MM_ORACLE = f"""
WITH b AS (
    SELECT doc_id,
           {_MM_HEXBYTE.format(p=1)} AS b0,
           {_MM_HEXBYTE.format(p=3)} AS b1,
           {_MM_HEXBYTE.format(p=5)} AS b2
    FROM (SELECT doc_id, sha256(text) AS h FROM documents)
), dims AS (
    SELECT doc_id,
           doc_id % 2 = 0 AS is_img,
           16 + b0 % 48 AS iw, 16 + b1 % 48 AS ih,
           256 + b2 * 8 AS n_samples
    FROM b
)
SELECT doc_id,
       CASE WHEN is_img THEN 'image' ELSE 'audio' END AS media_type,
       CAST(CASE WHEN is_img
                 THEN 54 + ih * (3 * iw + (4 - (3 * iw) % 4) % 4)
                 ELSE 44 + 2 * n_samples END AS BIGINT) AS n_bytes,
       CAST(CASE WHEN is_img THEN iw ELSE 0 END AS BIGINT) AS width,
       CAST(CASE WHEN is_img THEN ih ELSE 0 END AS BIGINT) AS height,
       CAST(CASE WHEN is_img THEN 1
                 ELSE CAST(CEIL(n_samples / 400.0) AS BIGINT) END AS BIGINT) AS n_frames,
       CAST(CASE WHEN is_img THEN 0 ELSE 8000 END AS BIGINT) AS sample_rate,
       CAST(CASE WHEN is_img THEN 1
                 ELSE LEAST(4, CAST(CEIL(n_samples / 400.0) AS BIGINT)) END AS BIGINT)
           AS n_sampled_frames
FROM dims
"""


@register("multimodal_meta", _MM_ORACLE)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal chain on REAL bytes: encode each document
    into a genuine BMP image / PCM WAV clip (pure-numpy codecs,
    operators/media_codec.py) → batch decode + feature-extract →
    frame sampling, joined per doc. Every output value is parsed from
    the actual payload headers/samples; the DuckDB oracle recomputes
    the expectation from the generation rule independently."""
    media = multimodal.attach_media(_t(spark, sf_dir, "documents"))
    feats = multimodal.extract_features(media).drop("content_mean")
    frames = (
        multimodal.sample_frames(media, max_frames=4)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_sampled_frames"))
    )
    return feats.join(frames, "doc_id")


# --------------------------------------------------------------------------
# GLM fits — the reference's core surface (R/sgdnet.R, predict, score, cv).
#
# The gaussian entries run RIDGE (alpha=0) on 3 features with an explicit
# lambda grid so that DuckDB can verify the full pipeline — standardize,
# per-lambda solve, unstandardize, dev_ratio, interpolation, scoring, CV —
# in closed form ((R + lam I)^-1 b via Cramer's rule on the correlation
# matrix; reference tests/testthat/test-gaussian.R:33 cross-checks ridge
# the same way). The iterative families (binomial/multinomial/elastic-net)
# are not SQL-expressible: those stay rows-only here and are verified by
# tests/test_kkt_property.py, test_distributed_solver.py, and the MLlib
# cross-check backend.
# --------------------------------------------------------------------------

_R3 = ["l_quantity", "l_discount", "x_month"]
_RIDGE_LAMBDAS = [0.5, 0.1, 0.01, 0.001, 0.0]  # descending; last = OLS


def _det3(M) -> str:
    """SQL for det of a 3x3 matrix of SQL expressions (cofactor row 0)."""

    def d2(a, b, c, d):
        return f"(({a})*({d}) - ({b})*({c}))"

    return (
        f"(({M[0][0]})*{d2(M[1][1], M[1][2], M[2][1], M[2][2])}"
        f" - ({M[0][1]})*{d2(M[1][0], M[1][2], M[2][0], M[2][2])}"
        f" + ({M[0][2]})*{d2(M[1][0], M[1][1], M[2][0], M[2][1])})"
    )


def _ridge_stats_sql(filter_sql: str = "") -> str:
    """Aggregate list for the ridge closed form: means/stds of the 3
    features, their correlations, covariances with y, and y stats."""
    filt = f" FILTER (WHERE {filter_sql})" if filter_sql else ""
    parts = [f"COUNT(*){filt} AS n", f"AVG(y){filt} AS ym", f"VAR_POP(y){filt} AS vy"]
    for i, c in enumerate(_R3):
        parts.append(f"AVG({c}){filt} AS mu{i}")
        parts.append(f"STDDEV_POP({c}){filt} AS sd{i}")
        parts.append(f"COVAR_POP({c}, y){filt} AS c{i}y")
    for i in range(3):
        for j in range(i + 1, 3):
            parts.append(f"CORR({_R3[i]}, {_R3[j]}){filt} AS r{i}{j}")
    return ",\n       ".join(parts)


def _ridge_solve_exprs() -> dict[str, str]:
    """Closed-form ridge solution as SQL expressions over the stats
    aliases of _ridge_stats_sql plus a `lambda` column.

    beta_std = (R + lam I)^-1 b with R the feature correlation matrix and
    b_i = cov(x_i, y)/sd_i; then unstandardized beta_i = beta_std_i/sd_i,
    a0 = ym - sum beta_i mu_i, dev_ratio = 1 - rss/n/var(y) with
    rss/n = vy - 2 b.beta_std + beta_std' R beta_std.
    """
    d = '(1.0 + "lambda")'
    R = [[d if i == j else f"r{min(i, j)}{max(i, j)}" for j in range(3)] for i in range(3)]
    b = [f"(c{i}y/sd{i})" for i in range(3)]
    det = _det3(R)
    bs = []
    for i in range(3):
        Mi = [[(b[r] if c == i else R[r][c]) for c in range(3)] for r in range(3)]
        bs.append(f"({_det3(Mi)} / {det})")
    beta = [f"({bs[i]} / sd{i})" for i in range(3)]
    a0 = "(ym - (" + " + ".join(f"{beta[i]}*mu{i}" for i in range(3)) + "))"
    quad = " + ".join(f"{bs[i]}*{bs[i]}" for i in range(3)) + " + 2*(" + " + ".join(
        f"{bs[i]}*{bs[j]}*r{i}{j}" for i in range(3) for j in range(i + 1, 3)
    ) + ")"
    rss_n = f"(vy - 2*({' + '.join(f'{b[i]}*{bs[i]}' for i in range(3))}) + ({quad}))"
    out = {"a0": a0, "dev_ratio": f"(1.0 - {rss_n}/vy)", "rss_n": rss_n}
    for i in range(3):
        out[f"b{i}"] = beta[i]
    return out


_LAM_VALUES_SQL = "(VALUES " + ", ".join(
    f"({i}, {lam!r})" for i, lam in enumerate(_RIDGE_LAMBDAS)
) + ') t(s, "lambda")'

_SOL = _ridge_solve_exprs()

_RIDGE_SOL_CTE = f"""
f AS ({FEATURES_SQL}),
rm AS (SELECT {_ridge_stats_sql()} FROM f),
lam AS (SELECT CAST(s AS INTEGER) AS s, CAST("lambda" AS DOUBLE) AS "lambda" FROM {_LAM_VALUES_SQL}),
sol AS (SELECT s, "lambda",
               {_SOL['a0']} AS a0,
               {_SOL['b0']} AS b0, {_SOL['b1']} AS b1, {_SOL['b2']} AS b2,
               {_SOL['dev_ratio']} AS devr, {_SOL['rss_n']} AS rss_n, n
        FROM rm CROSS JOIN lam)
"""

_GLM_PATH_ORACLE = f"""
WITH {_RIDGE_SOL_CTE}
SELECT s, ROUND("lambda", 6) AS lambda, ROUND(a0, 2) AS a0,
       ROUND(b0, 2) AS b_quantity, ROUND(b1, 2) AS b_discount, ROUND(b2, 2) AS b_month,
       CAST(3 AS INTEGER) AS df, ROUND(devr, 6) AS dev_ratio
FROM sol
"""


def _ridge_fit(spark, sf_dir, lambdas=None):
    from sgdnet_spark.glm import sgdnet

    f = feature_frame(spark, sf_dir)
    return sgdnet(f, _R3, "y", family="gaussian", alpha=0.0,
                  lambdas=lambdas or _RIDGE_LAMBDAS)


@register("glm_gaussian_path", _GLM_PATH_ORACLE)
def glm_gaussian_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaussian path fit with per-(s, feature) coefficient values,
    hash-checked against the DuckDB closed form (ridge via Cramer on the
    correlation matrix). Exercises standardize -> path solve ->
    unstandardize -> dev_ratio end-to-end."""
    fit = _ridge_fit(spark, sf_dir)
    rows = [
        {
            "s": int(i),
            "lambda": round(float(fit.lambdas[i]), 6),
            "a0": round(float(fit.a0[i]), 2),
            "b_quantity": round(float(fit.beta[0, i]), 2),
            "b_discount": round(float(fit.beta[1, i]), 2),
            "b_month": round(float(fit.beta[2, i]), 2),
            "df": int(fit.df[i]),
            "dev_ratio": round(float(fit.dev_ratio[i]), 6),
        }
        for i in range(fit.nlambda)
    ]
    return spark.createDataFrame(
        rows,
        schema="s int, lambda double, a0 double, b_quantity double, "
               "b_discount double, b_month double, df int, dev_ratio double",
    )


@register("glm_binomial_path")
def glm_binomial_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sgdnet_spark.glm import sgdnet

    f = feature_frame(spark, sf_dir).withColumn("is_return", (F.col("l_returnflag") == "R").cast("string"))
    fit = sgdnet(f, FEATURE_NAMES, "is_return", family="binomial", alpha=0.5, nlambda=30,
                 lambda_min_ratio=1e-2)
    return fit.path_frame(spark)


@register("glm_multinomial_path")
def glm_multinomial_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sgdnet_spark.glm import sgdnet

    f = feature_frame(spark, sf_dir)
    fit = sgdnet(f, FEATURE_NAMES, "l_returnflag", family="multinomial", alpha=1.0, nlambda=20,
                 lambda_min_ratio=1e-2)
    return fit.path_frame(spark)


@register("glm_mgaussian_path")
def glm_mgaussian_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sgdnet_spark.glm import sgdnet

    f = feature_frame(spark, sf_dir)
    fit = sgdnet(f, ["l_discount", "l_tax", "x_month", "x_qty_disc"], ["y", "l_quantity"],
                 family="mgaussian", alpha=1.0, nlambda=20)
    return fit.path_frame(spark)


# off-path prediction point: midway between lambdas[1] and lambdas[2]
# -> interpolation weight exactly 0.5 on each side
_PRED_S = (_RIDGE_LAMBDAS[1] + _RIDGE_LAMBDAS[2]) / 2.0

_GLM_PREDICT_ORACLE = f"""
WITH {_RIDGE_SOL_CTE},
w AS (SELECT (a.a0 + b.a0)/2 AS a0, (a.b0 + b.b0)/2 AS b0,
             (a.b1 + b.b1)/2 AS b1, (a.b2 + b.b2)/2 AS b2
      FROM sol a, sol b WHERE a.s = 1 AND b.s = 2)
SELECT l_orderkey, l_linenumber,
       ROUND(w.a0 + w.b0*{_R3[0]} + w.b1*{_R3[1]} + w.b2*{_R3[2]}, 2) AS pred
FROM f, w
"""


@register("glm_predict_gaussian", _GLM_PREDICT_ORACLE)
def glm_predict_gaussian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """predict(type='link') at an OFF-path s — exercises the reference's
    lambda interpolation (predict.sgdnet.R:144) with a per-row DuckDB
    value check against the interpolated closed-form coefficients."""
    fit = _ridge_fit(spark, sf_dir)
    f = feature_frame(spark, sf_dir)
    return fit.predict(f, s=_PRED_S, prefix="pred").select(
        "l_orderkey", "l_linenumber", F.round("pred", 2).alias("pred")
    )


@register("glm_predict_class")
def glm_predict_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """predict(type='class') confusion summary at THREE path points
    including lambda_max (reference test-predictions.R checks class
    output against known labels). Grouping by (s, actual, predicted)
    forces both true classes into the output at every s — at s=0
    (lambda_max) the intercept-only model must predict the majority
    class for every row, a known, pinned outcome; deeper in the path
    both predicted classes appear. One row per (s, actual, predicted)
    with count and rounded mean P(class=1)."""
    from sgdnet_spark.glm import sgdnet

    f = feature_frame(spark, sf_dir).withColumn("is_return", (F.col("l_returnflag") == "R").cast("string"))
    fit = sgdnet(f, FEATURE_NAMES, "is_return", family="binomial", alpha=0.5, nlambda=20,
                 lambda_min_ratio=1e-2)
    parts = []
    for s_idx in (0, fit.nlambda // 2, fit.nlambda - 1):
        s = float(fit.lambdas[s_idx])
        pred = fit.predict(f, s=s, type="class", prefix="cls")
        pred = fit.predict(pred, s=s, type="response", prefix="prob")
        parts.append(
            pred.groupBy(
                F.lit(int(s_idx)).alias("s"),
                F.col("is_return").alias("actual"),
                F.col("cls").alias("predicted"),
            ).agg(F.count("*").alias("n"), F.round(F.avg("prob"), 4).alias("avg_prob"))
        )
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out.orderBy("s", "actual", "predicted")


_GLM_SCORE_ORACLE = f"""
WITH {_RIDGE_SOL_CTE},
per AS (SELECT sol.s, sol."lambda", sol.devr,
               AVG(POW(f.y - (sol.a0 + sol.b0*{_R3[0]} + sol.b1*{_R3[1]} + sol.b2*{_R3[2]}), 2)) AS mse,
               AVG(ABS(f.y - (sol.a0 + sol.b0*{_R3[0]} + sol.b1*{_R3[1]} + sol.b2*{_R3[2]}))) AS mae
        FROM f CROSS JOIN sol GROUP BY 1, 2, 3)
SELECT s, ROUND("lambda", 6) AS lambda, ROUND(mse, 2) AS mse, ROUND(mae, 3) AS mae,
       ROUND(devr, 6) AS dev_ratio
FROM per
"""


@register("glm_score", _GLM_SCORE_ORACLE)
def glm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """score(fit, x, y) along the path (reference R/score.R) — mse and
    mae via ONE distributed aggregation pass each, plus dev_ratio, which
    pins the reference deviance() = (1-dev.ratio)*nulldev semantics
    (deviance.sgdnet.R; for gaussian the deviance measure IS mse)."""
    from sgdnet_spark.glm import score

    fit = _ridge_fit(spark, sf_dir)
    f = feature_frame(spark, sf_dir)
    mse = score(fit, f, _R3, "y", "mse")
    mae = score(fit, f, _R3, "y", "mae")
    rows = [
        {
            "s": int(i),
            "lambda": round(float(fit.lambdas[i]), 6),
            "mse": round(float(m), 2),
            "mae": round(float(a), 3),
            "dev_ratio": round(float(fit.dev_ratio[i]), 6),
        }
        for i, (m, a) in enumerate(zip(mse, mae))
    ]
    return spark.createDataFrame(
        rows, schema="s int, lambda double, mse double, mae double, dev_ratio double"
    )


@register("glm_embedding_multinomial")
def glm_embedding_multinomial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Softmax regression straight on an array<float> embedding column
    (10 classes, p=64) — the vector-native fit path."""
    from sgdnet_spark.glm import sgdnet

    emb = _t(spark, sf_dir, "embeddings").withColumn("label_s", F.col("label").cast("string"))
    fit = sgdnet(emb, "embedding", "label_s", family="multinomial", alpha=1.0,
                 nlambda=8, lambda_min_ratio=0.05)
    return fit.path_frame(spark)


_FOLD_SQL = "(l_orderkey*31 + l_linenumber) % 3"


def _cv_oracle() -> str:
    """k-fold ridge CV entirely in SQL: per-fold training stats via
    FILTER complements, Cramer solve per (fold, lambda), held-out mse,
    then mean/sd/ci per lambda — the DuckDB twin of cv_sgdnet."""
    sol = _ridge_solve_exprs()
    ctes = [f'ff AS (SELECT *, {_FOLD_SQL} AS fold FROM ({FEATURES_SQL}))',
            f'lam AS (SELECT CAST(s AS INTEGER) AS s, CAST("lambda" AS DOUBLE) AS "lambda" FROM {_LAM_VALUES_SQL})']
    fold_sels = []
    for g in range(3):
        ctes.append(f"rm{g} AS (SELECT {_ridge_stats_sql(f'fold <> {g}')} FROM ff)")
        ctes.append(
            f'sol{g} AS (SELECT s, "lambda", {sol["a0"]} AS a0, {sol["b0"]} AS b0, '
            f'{sol["b1"]} AS b1, {sol["b2"]} AS b2 FROM rm{g} CROSS JOIN lam)'
        )
        fold_sels.append(
            f'SELECT {g} AS fold, sol{g}.s, sol{g}."lambda", '
            f"AVG(POW(ff.y - (a0 + b0*{_R3[0]} + b1*{_R3[1]} + b2*{_R3[2]}), 2)) AS mse "
            f"FROM ff CROSS JOIN sol{g} WHERE ff.fold = {g} GROUP BY 1, 2, 3"
        )
    ctes.append("fm AS (" + "\nUNION ALL\n".join(fold_sels) + ")")
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        'SELECT CAST(0.0 AS DOUBLE) AS alpha, ROUND("lambda", 6) AS lambda, ROUND(AVG(mse), 2) AS mean,\n'
        "       ROUND(STDDEV_SAMP(mse), 2) AS sd,\n"
        "       ROUND(AVG(mse) - STDDEV_SAMP(mse), 2) AS ci_lo,\n"
        "       ROUND(AVG(mse) + STDDEV_SAMP(mse), 2) AS ci_up\n"
        'FROM fm GROUP BY "lambda"'
    )


@register("glm_cv", _cv_oracle())
def glm_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cv_sgdnet (reference R/cv_sgdnet.R): deterministic 3-fold split,
    per-fold ridge path fits, held-out mse, cv_summary(mean/sd/ci) —
    every number re-derived independently by the DuckDB oracle."""
    from sgdnet_spark.glm import cv_sgdnet

    f = feature_frame(spark, sf_dir).withColumn(
        "fold", F.pmod(F.col("l_orderkey") * 31 + F.col("l_linenumber"), F.lit(3)).cast("int")
    )
    cv = cv_sgdnet(f, _R3, "y", family="gaussian", alpha=[0.0], lambdas=_RIDGE_LAMBDAS,
                   nfolds=3, foldid_col="fold", type_measure="mse")
    return cv.summary_frame(spark).select(
        F.round("alpha", 1).alias("alpha"),
        F.round("lambda", 6).alias("lambda"),
        F.round("mean", 2).alias("mean"),
        F.round("sd", 2).alias("sd"),
        F.round("ci_lo", 2).alias("ci_lo"),
        F.round("ci_up", 2).alias("ci_up"),
    )
