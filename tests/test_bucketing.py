"""Bucketed joins run without a shuffle on the join key."""

from pyspark.sql import functions as F

from sgdnet_spark.plans import introspect as I
from sgdnet_spark.sources.bucketing import bucketed_join, write_bucketed


def test_bucketed_join_no_exchange(spark, sf_dir, tmp_path_factory):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumnRenamed(
            "o_orderkey", "l_orderkey"
        )
        write_bucketed(li.select("l_orderkey", "l_quantity"), "li_b", "l_orderkey", 8)
        write_bucketed(orders.select("l_orderkey", "o_totalprice"), "ord_b", "l_orderkey", 8)

        joined = bucketed_join(spark, "li_b", "ord_b", "l_orderkey")
        n_shuffles_bucketed = I.shuffle_count(joined)

        plain = li.select("l_orderkey", "l_quantity").join(
            orders.select("l_orderkey", "o_totalprice"), "l_orderkey"
        )
        n_shuffles_plain = I.shuffle_count(plain)

        assert n_shuffles_bucketed == 0  # bucket-local join
        assert n_shuffles_plain >= 2  # both sides shuffle without bucketing
        assert joined.count() == plain.count()

        # bucketed aggregation on the bucket key also skips the exchange
        agg = spark.table("li_b").groupBy("l_orderkey").agg(F.sum("l_quantity"))
        assert I.shuffle_count(agg) == 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
