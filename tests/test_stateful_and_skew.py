"""applyInPandasWithState operator + skew-mitigation helpers."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sgdnet_spark.operators.skew import salted_agg, salted_join
from sgdnet_spark.streaming import events as se
from sgdnet_spark.streaming.stateful import running_user_totals


def test_stateful_running_totals(spark, sf_dir):
    stream = se.read_events_stream(spark, sf_dir)
    out = running_user_totals(stream)
    q = out.writeStream.outputMode("update").format("memory").queryName("state_tot").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["user_id"]: (r["n_events"], r["total_value"])
           for r in spark.sql("SELECT * FROM state_tot").collect()}
    want = {
        r["user_id"]: (r["n"], round(r["t"], 4))
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id").agg(F.count("*").alias("n"), F.sum("value").alias("t")).collect()
    }
    # final state per user equals the batch aggregate
    for uid, (n, t) in want.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - t) < 1e-6


def test_salted_agg_matches_plain(spark):
    rows = [("hot", float(i % 7)) for i in range(5000)] + [
        (f"k{i % 50}", float(i)) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "key string, v double")
    got = {
        r["key"]: (r["v_sum"], r["v_count"])
        for r in salted_agg(df, "key", {"v": "sum"} | {"key": "count"}, salt_buckets=8)
        .withColumnRenamed("key_count", "v_count")
        .collect()
    }
    want = {
        r["key"]: (r["s"], r["c"])
        for r in df.groupBy("key").agg(F.sum("v").alias("s"), F.count("*").alias("c")).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]
        assert abs(got[k][0] - want[k][0]) < 1e-6


def test_salted_join_matches_plain(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(3000)] + [(f"k{i % 20}", i) for i in range(1000)],
        "key string, payload long",
    )
    small = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{i}", float(i)) for i in range(20)], "key string, w double"
    )
    got = salted_join(big, small, "key", salt_buckets=4)
    plain = big.join(small, "key")
    assert got.count() == plain.count()
    gs = got.agg(F.sum(F.col("payload") * F.col("w"))).first()[0]
    ps = plain.agg(F.sum(F.col("payload") * F.col("w"))).first()[0]
    assert abs(gs - ps) < 1e-6
