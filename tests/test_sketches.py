"""Sketches vs exact answers (tolerance-based — sketch encodings differ
across engines, so these live in tests rather than the duckdb gate)."""

from pyspark.sql import functions as F

from sgdnet_spark.operators import sketch


def test_approx_distinct(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    approx = sketch.approx_distinct(li, ["l_orderkey", "l_partkey"]).first()
    exact_ok = li.select(F.countDistinct("l_orderkey"), F.countDistinct("l_partkey")).first()
    for a, e in zip(approx, exact_ok):
        assert abs(a - e) / e < 0.05


def test_approx_quantiles(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    qs = sketch.approx_quantiles(li, "l_extendedprice", [0.5, 0.9])
    exact = li.agg(F.expr("percentile(l_extendedprice, array(0.5, 0.9))")).first()[0]
    for a, e in zip(qs, exact):
        assert abs(a - e) / e < 0.02


def test_bloom_filter_join_prefilter(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = orders.filter(F.col("o_totalprice") > 400000).select("o_orderkey")
    n_keys = keys.count()
    bf = sketch.bloom_filter(keys, "o_orderkey", expected=max(n_keys, 1))
    # prefilter keeps every true match (no false negatives) and drops most others
    true_matches = li.join(keys, li.l_orderkey == keys.o_orderkey, "left_semi").count()
    kept_df = li.filter(bf.might_contain_col(F.col("l_orderkey")))
    kept = kept_df.count()
    assert kept >= true_matches
    total = li.count()
    if n_keys < total / 10:
        assert kept < total  # it actually filters
    # everything the prefilter kept that was real survives the true join
    assert kept_df.join(keys, kept_df.l_orderkey == keys.o_orderkey, "left_semi").count() == true_matches


def test_count_min_heavy_hitter(spark):
    rows = [("hot",)] * 3000 + [(f"k{i % 100}",) for i in range(1000)]
    df = spark.createDataFrame(rows, "key string")
    cms = sketch.count_min(df, "key")
    est = cms.estimate_count("hot")
    assert 3000 <= est <= 3000 * 1.05
    assert cms.estimate_count("absent-key") <= 4000 * 0.01  # eps * total bound


def test_count_min_estimate_col_screen(spark):
    """estimate_col must never underestimate (no lost heavy hitters),
    and screening + exact recount must equal the plain exact answer."""
    rows = [(f"h{i}",) for i in range(5) for _ in range(200)] + [
        (f"k{i % 400}",) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "key string")
    cms = sketch.count_min(df, "key", eps=0.005)
    T = 100
    exact = {
        r["key"]: r["c"]
        for r in df.groupBy("key").agg(F.count("*").alias("c")).filter(F.col("c") >= T).collect()
    }
    cand = sketch.cms_screen(df.select("key").distinct(), "key", cms, T)
    cand_keys = {r["key"] for r in cand.collect()}
    assert set(exact) <= cand_keys  # CMS superset guarantee
    # the literal-array point estimator must agree with the join screen
    lit_keys = {
        r["key"]
        for r in df.select("key").distinct()
        .filter(cms.estimate_col(F.col("key")) >= T)
        .collect()
    }
    assert lit_keys == cand_keys
    verified = {
        r["key"]: r["c"]
        for r in df.join(cand, "key", "left_semi")
        .groupBy("key")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= T)
        .collect()
    }
    assert verified == exact


def test_bloom_build_partitioning_independent(spark):
    """The tree-merged Bloom build (fanout-64 executor-side OR-reduce)
    must produce the SAME bitset regardless of input partitioning —
    including with enough partitions to engage the extra tree level —
    and never false-negative."""
    import numpy as np

    from sgdnet_spark.operators import sketch

    vals = spark.range(0, 3000).selectExpr("id * 7 AS k")
    a = sketch.bloom_filter(vals.coalesce(1), "k", expected=3000)
    b = sketch.bloom_filter(vals.repartition(130), "k", expected=3000)
    assert a.m == b.m and a.k == b.k
    assert np.array_equal(np.asarray(a.words), np.asarray(b.words))
    # no false negatives
    missed = vals.filter(~a.might_contain_col(F.col("k"))).count()
    assert missed == 0


def test_bloom_probe_type_canonicalization(spark):
    """xxhash64 is type-sensitive (hash(5 as int) != hash(5 as bigint)):
    a filter built on an INT column probed with a BIGINT column must
    still find every build key — the build and probe sides canonicalize
    to the same hash type, or the Bloom 'no false negatives' contract
    silently breaks."""
    build = spark.createDataFrame([(i,) for i in range(50)], "k int")
    bf = sketch.bloom_filter(build, "k", expected=50)
    probe = spark.createDataFrame([(i,) for i in range(100)], "k bigint")
    kept = {r["k"] for r in probe.filter(bf.might_contain_col(F.col("k"))).collect()}
    assert set(range(50)) <= kept  # every true member survives


def test_bloom_broadcast_probe_matches_literal(spark, monkeypatch):
    """Above LITERAL_WORDS_MAX the probe switches from a plan-literal
    bitset to an Arrow-batched test against a broadcast numpy array —
    the two paths must accept/reject identically."""
    build = spark.createDataFrame([(i * 3,) for i in range(200)], "k long")
    bf = sketch.bloom_filter(build, "k", expected=200)
    probe = spark.createDataFrame([(i,) for i in range(600)], "k long")
    lit = {r["k"] for r in probe.filter(bf.might_contain_col(F.col("k"))).collect()}
    monkeypatch.setattr(sketch.BloomFilter, "LITERAL_WORDS_MAX", 0)
    bcast = {r["k"] for r in
             probe.filter(bf.might_contain_col(F.col("k"), spark)).collect()}
    assert lit == bcast
    assert {i * 3 for i in range(200)} <= lit  # no false negatives


def test_cms_estimate_count_int_build(spark):
    """estimate_count hashes its literal at the BUILD key type: an int
    build probed with a bare Python int literal (which Spark types as
    INT or BIGINT depending on magnitude) must return the true count."""
    rows = [(7,)] * 40 + [(i,) for i in range(100, 120)]
    df = spark.createDataFrame(rows, "k int")
    cms = sketch.count_min(df, "k", eps=0.01)
    assert cms.estimate_count(7) >= 40
    assert cms.estimate_count(999999) <= 2  # absent key, small collision noise


def test_datasketches_distinct_and_quantiles(spark, sf_dir):
    """The Spark-native Datasketches tier (round 8):
    - theta estimates are PARTITIONING-INDEPENDENT (the property that
      lets the driver pin them as golden constants) and close to exact;
    - HLL sketches are mergeable — hll_union_agg of per-group sketches
      estimates the global cardinality like a direct global sketch —
      and close to exact within the lgk=12 rsd band;
    - KLL quantiles land within rank tolerance of the exact percentile."""
    from pyspark.sql import functions as F

    from sgdnet_spark.operators import sketch as SK

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    exact = li.agg(F.countDistinct("l_orderkey")).collect()[0][0]

    ests = {
        rep: SK.theta_distinct(li.repartition(rep) if rep > 1 else li, "l_orderkey")
        .collect()[0]["n_distinct_est"]
        for rep in (1, 7, 32)
    }
    assert len(set(ests.values())) == 1, f"theta not partition-independent: {ests}"
    assert abs(next(iter(ests.values())) - exact) / exact < 0.05

    hll = SK.hll_distinct(li, "l_orderkey").collect()[0]["n_distinct_est"]
    assert abs(hll - exact) / exact < 0.05  # ~3x the lgk=12 rsd (1.6%)
    # mergeability: union of per-group sketches vs direct global
    grouped = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey").alias("sk")
    )
    merged = grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).collect()[0]["e"]
    assert abs(merged - exact) / exact < 0.05

    # theta set ops: below sketch-k the sketch holds every hash, so
    # union/intersection/difference estimates are EXACT — assert against
    # the true set algebra on the flag-sliced orderkey sets
    A = li.filter(F.col("l_returnflag") == "A")
    R = li.filter(F.col("l_returnflag") == "R")
    ov = SK.theta_overlap(A, "l_orderkey", R).collect()[0]
    sa = {r[0] for r in A.select("l_orderkey").distinct().collect()}
    sr = {r[0] for r in R.select("l_orderkey").distinct().collect()}
    if max(len(sa), len(sr), len(sa | sr)) <= 4096:  # default theta k
        assert (ov["n_a"], ov["n_b"]) == (len(sa), len(sr))
        assert ov["n_union"] == len(sa | sr)
        assert ov["n_intersection"] == len(sa & sr)
        assert ov["n_a_not_b"] == len(sa - sr)
    else:  # above k: within the theta error band
        for got, want in [
            (ov["n_union"], len(sa | sr)),
            (ov["n_intersection"], len(sa & sr)),
        ]:
            assert abs(got - want) / max(want, 1) < 0.1
    # partition independence (the golden-pinnability property)
    ov2 = SK.theta_overlap(A.repartition(13), "l_orderkey", R.repartition(3))
    assert tuple(ov2.collect()[0]) == tuple(ov)
    # the one-pass conditional form (single scan, no 1x1 join) retains
    # exactly the same hash sets as two filtered scans -> identical row
    ov3 = SK.theta_overlap_cond(
        li,
        "l_orderkey",
        F.col("l_returnflag") == "A",
        F.col("l_returnflag") == "R",
    )
    assert tuple(ov3.collect()[0]) == tuple(ov)

    q = SK.kll_quantiles(li, "l_quantity", [0.5, 0.9]).collect()[0]
    p50, p90 = (
        li.agg(F.percentile("l_quantity", F.lit(0.5)),
               F.percentile("l_quantity", F.lit(0.9))).collect()[0]
    )
    # rank tolerance: quantities are small ints, so value tolerance of
    # one step covers the KLL rank-error band at this n
    assert abs(q["q_0_5"] - p50) <= 1.0 and abs(q["q_0_9"] - p90) <= 1.0
