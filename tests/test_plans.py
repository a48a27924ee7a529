"""Plan-shape assertions: pushdown, pruning, broadcast, codegen.

These are the 100-TB guardrails (SURVEY.md §4): each marked query must
keep its scale-critical physical properties as the code evolves.
"""

from pyspark.sql import functions as F

from sgdnet_spark.plans import introspect as I
from sgdnet_spark.queries import (
    q1_pricing_summary,
    q3_shipping_priority,
    q5_local_supplier,
    q6_forecast_revenue,
    feature_frame,
)


def test_q6_filter_pushdown(spark, sf_dir):
    df = q6_forecast_revenue(spark, sf_dir)
    # selective predicates reach the parquet scan
    assert I.has_pushed_filter(df, "l_quantity")
    assert I.has_pushed_filter(df, "l_discount")
    cols = I.scan_read_schema(df)
    # column pruning: only the 4 referenced columns are read
    assert set(cols) == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_q1_column_pruning_and_codegen(spark, sf_dir):
    df = q1_pricing_summary(spark, sf_dir)
    cols = I.scan_read_schema(df)
    assert "l_partkey" not in cols and "l_suppkey" not in cols
    assert I.wholestage_codegen(df)


def test_q3_q5_broadcast_dims(spark, sf_dir):
    # with no hand-placed hints on SF-scaling tables, AQE must still pick
    # broadcast joins at this scale (region/nation keep explicit hints)
    q3 = q3_shipping_priority(spark, sf_dir)
    q3.collect()
    assert I.broadcast_join_count(q3) >= 1
    q5 = q5_local_supplier(spark, sf_dir)
    q5.collect()
    assert I.broadcast_join_count(q5) >= 4


def test_glm_scan_prunes_to_features(spark, sf_dir):
    from sgdnet_spark.glm import suffstats
    from sgdnet_spark.queries import FEATURE_NAMES

    f = feature_frame(spark, sf_dir)
    xy = suffstats.assemble(f, FEATURE_NAMES, ["y"])
    cols = set(I.scan_read_schema(xy))
    # the fit's scan reads only what the features/label need
    assert cols <= {"l_quantity", "l_discount", "l_tax", "l_shipdate", "l_extendedprice"}
    assert "l_orderkey" not in cols


def test_events_windowed_single_shuffle(spark, sf_dir):
    from sgdnet_spark.queries import events_windowed

    df = events_windowed(spark, sf_dir)
    # one partial+final aggregation: exactly one exchange
    assert I.shuffle_count(df) == 1


def test_feature_stats_single_scan(spark, sf_dir):
    """All 5x4 standardization statistics come from ONE scan of
    lineitem (a scan branch per feature is a 5x read amplification at
    100 TB)."""
    from sgdnet_spark.queries import feature_stats

    df = feature_stats(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_single_shuffle_aggregations(spark, sf_dir):
    """Scale guardrail: these queries are one-exchange shapes — a
    refactor that adds a shuffle is a 100 TB regression even when
    results stay correct."""
    from sgdnet_spark.queries import (
        events_sessionize,
        q1_pricing_summary,
        quantile_prices,
        running_customer_total,
    )

    for fn in (q1_pricing_summary, events_sessionize, quantile_prices, running_customer_total):
        assert I.shuffle_count(fn(spark, sf_dir)) <= 1, fn.__name__


def test_text_ops_spread_only_shuffles(spark, sf_dir):
    """Per-document text operators stay narrow scans EXCEPT the
    small-input spread (round 9: quality/langid/token-count spread like
    the winnow arm always has — the repartition parallelizes per-row
    compute when the local single-split file would serialize it, and is
    a no-op on well-partitioned scans). Allowed exchanges: one per scan
    arm — anything beyond that is a real shuffle regression."""
    from sgdnet_spark.queries import text_quality, text_fingerprint, text_token_count

    assert I.shuffle_count(text_quality(spark, sf_dir)) <= 1
    # token_count unions the ws and bpe arms — one spread each
    assert I.shuffle_count(text_token_count(spark, sf_dir)) <= 2
    assert I.shuffle_count(text_fingerprint(spark, sf_dir)) <= 1
    # and none of them aggregates or joins: no exchange may be anything
    # other than the RoundRobin spread
    for fn in (text_quality, text_token_count, text_fingerprint):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        import re

        for m in re.finditer(r"Exchange (\w+)", plan):
            assert m.group(1) == "RoundRobinPartitioning", (fn.__name__, m.group(0))


def test_spread_small_input_size_gates(spark, sf_dir, monkeypatch):
    """Round-10 hardening: the spread decision comes from plan-stats
    bytes (no `.rdd` plan-to-RDD conversion) and carries a byte-size
    cap, so a many-core cluster never blindly repartitions a
    large-but-few-files table. Four gates: tiny input spreads to
    defaultParallelism; above SPARK_GRAFT_SPREAD_MAX_BYTES it is
    returned UNTOUCHED (identity, not just same partitioning); a scan
    whose estimated byte-splits already reach core count is untouched;
    streaming frames are untouched."""
    from sgdnet_spark.session import spread_small_input

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = spark.sparkContext.defaultParallelism
    spread = spread_small_input(docs)
    assert spread is not docs
    assert "RoundRobinPartitioning" in spread._jdf.queryExecution().executedPlan().toString()

    monkeypatch.setenv("SPARK_GRAFT_SPREAD_MAX_BYTES", "10")
    assert spread_small_input(docs) is docs  # over the cap: identity
    monkeypatch.delenv("SPARK_GRAFT_SPREAD_MAX_BYTES")

    spark.conf.set("spark.sql.files.maxPartitionBytes", "64")
    try:
        # est splits = bytes/64 >> cores: well-partitioned, identity
        assert spread_small_input(docs) is docs
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")

    stream = spark.readStream.format("rate").load()
    assert spread_small_input(stream) is stream

    # and the hot path must never touch .rdd again (the flagged cost)
    import inspect

    import sgdnet_spark.session as S

    assert ".rdd" not in inspect.getsource(S.spread_small_input)


def test_shuffle_count_excludes_broadcast_exchange(spark):
    """The regression this module guards against — a broadcast join
    degrading to sort-merge — swaps BroadcastExchange for a shuffle
    exchange 1:1; counting the bare 'Exchange' substring could NEVER
    catch it."""
    a = spark.range(1000).withColumnRenamed("id", "k")
    b = spark.range(10).withColumnRenamed("id", "k")
    bcast = a.join(F.broadcast(b), "k")
    assert I.shuffle_count(bcast) == 0
    assert I.broadcast_join_count(bcast) == 1
    merged = a.join(b.hint("merge"), "k")
    assert I.shuffle_count(merged) >= 2  # both sides shuffle


def test_scan_read_schema_nested_and_wide(spark, tmp_path):
    """Nested struct fields must not be reported as top-level scanned
    columns, and a wide schema must not be silently truncated at
    Spark's 100-char metadata default."""
    wide = spark.range(5).select(
        "id",
        F.struct(F.lit(1).alias("x"), F.lit(2).alias("y")).alias("s"),
        *[F.lit(i).alias(f"very_long_column_name_number_{i}") for i in range(8)],
    )
    p = str(tmp_path / "wide")
    wide.write.parquet(p)
    back = spark.read.parquet(p)
    cols = I.scan_read_schema(back)
    assert "y" not in cols and "s" in cols
    assert f"very_long_column_name_number_7" in cols  # past 100-char cutoff


def test_ann_approx_unforced_plan_pinned(spark, sf_dir):
    """Round 13 (review): ann_approx's returned frame is a union of
    eagerly-checkpointed rows (the probe-phase overlap), so its
    snapshot in plan_snapshots.json reads 0/0 and pins nothing. This
    pins the REAL pipelines instead: force=False returns the same
    composition uncheckpointed, exposing every lsh/ivf/ivfpq/mmr/
    hybrid/opq join and shuffle to introspection. A broadcast
    degrading to sort-merge or an extra exchange appearing moves
    these counts."""
    from sgdnet_spark.plans import introspect
    from sgdnet_spark.queries import ann_approx

    df = ann_approx(spark, sf_dir, force=False)
    assert introspect.shuffle_count(df) == 15
    assert introspect.broadcast_join_count(df) == 20
