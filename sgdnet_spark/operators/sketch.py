"""Approximate sketches — the sublinear answers a 100 TB engine leads
with before exact computation is even considered.

All JVM-side: HyperLogLog++ (approx_count_distinct), Greenwald-Khanna
(percentile_approx), Bloom filter and Count-Min Sketch from
DataFrameStatFunctions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parquet_row_count(path: str) -> int | None:
    """Row count from parquet footer metadata only — zero data read, no
    Spark job. Sketch SIZING needs a row-count estimate (CMS width
    w ≈ 8N/T, Bloom m from expected inserts) but sketch CORRECTNESS
    never depends on it, so a stats-grade number must not cost a full
    scan: at 100 TB a ``df.count()`` solely for sizing is a complete
    pass over the table, while every parquet writer already committed
    the exact count to the footers (the same place a lakehouse
    table-statistics catalog reads it from). Returns None when the path
    isn't a readable parquet file/directory — callers fall back to
    ``df.count()``."""
    try:
        import pyarrow.dataset as ds

        return int(ds.dataset(path, format="parquet").count_rows())
    except Exception:  # noqa: BLE001 — sizing fallback, never correctness
        return None


def approx_distinct(df: DataFrame, cols: list[str], rsd: float = 0.02) -> DataFrame:
    return df.agg(
        *[F.approx_count_distinct(c, rsd=rsd).alias(f"{c}_approx_distinct") for c in cols]
    )


def approx_quantiles(
    df: DataFrame, col: str, probs: list[float], accuracy: int = 10000
) -> list[float]:
    return df.approxQuantile(col, probs, 1.0 / accuracy)


# bit masks 1<<b as signed-64 literals (bit 63 wraps to the sign bit)
_POW2 = [(1 << b) if b < 63 else (1 << 63) - (1 << 64) for b in range(64)]

_INTEGRALS = {"tinyint", "smallint", "int", "bigint", "long", "integer", "short", "byte"}


def _hash_key_type(df: DataFrame, col: str) -> str:
    """Canonical type a sketch hashes its keys as. xxhash64 is
    TYPE-sensitive: hash64(5 as int) != hash64(5 as bigint), so a filter
    built on an INT column probed with a BIGINT column would silently
    drop matching rows — a false NEGATIVE, the one failure mode a Bloom
    filter promises away. Integral builds canonicalize to bigint (an
    exact widening for every probe value that could possibly match);
    other types keep the build column's own type and the probe side is
    cast to it."""
    t = df.schema[col].dataType.simpleString()
    return "bigint" if t in _INTEGRALS else t


class BloomFilter:
    """Packed-word bitset built by a distributed pass (pyspark 4 exposes
    no Python binding for the JVM bloom filter; this mirrors its design:
    per-task packed bitsets, OR-merged — the driver only ever holds
    sketch-sized state, never per-row state. No false negatives.)"""

    #: widest bitset still embedded as a codegen literal (words; 4096
    #: words = 32 KiB per plan). Beyond it the probe switches to an
    #: Arrow-batched bit test against a SparkContext broadcast of the
    #: numpy bitset — one torrent-broadcast copy per executor instead of
    #: a multi-megabyte literal serialized into every task's plan.
    LITERAL_WORDS_MAX = 4096

    def __init__(self, words, m: int, k: int, seeds: list[int], key_type: str = "bigint"):
        self.words = words  # np.int64 array of m/64 packed words
        self.m = m
        self.k = k
        self.seeds = seeds
        self.key_type = key_type  # canonical hash type (see _hash_key_type)
        self._bc = None  # lazy SparkContext broadcast of the bitset

    def _positions(self, col: Column) -> list[Column]:
        c = col.cast(self.key_type)
        return [F.pmod(F.xxhash64(c, F.lit(s)), F.lit(self.m)) for s in self.seeds]

    def might_contain_col(self, col: Column, spark=None) -> Column:
        """Membership test; the probe column is cast to the BUILD key
        type first (xxhash64 is type-sensitive — an uncast int-vs-bigint
        probe would produce false negatives, breaking the Bloom
        contract).

        Small bitsets (<= LITERAL_WORDS_MAX words) stay a pure-codegen
        element_at + bitmask lookup. Larger ones hash JVM-side but test
        bits in an Arrow-batched pandas_udf against a broadcast numpy
        bitset — the billion-key build (m ~ 1.2 GB) ships once per
        executor, never once per plan. ``spark`` is only needed for the
        broadcast path."""
        if len(self.words) <= self.LITERAL_WORDS_MAX:
            words = F.lit([int(w) for w in self.words])
            masks = F.lit(_POW2)
            cond = None
            for pos in self._positions(col):
                word = F.element_at(words, (pos / 64).cast("int") + 1)
                mask = F.element_at(masks, F.pmod(pos, 64).cast("int") + 1)
                c = word.bitwiseAND(mask) != 0
                cond = c if cond is None else cond & c
            return cond
        return self._might_contain_broadcast(col, spark)

    def _might_contain_broadcast(self, col: Column, spark=None) -> Column:
        import numpy as np
        from pyspark.sql import SparkSession
        from pyspark.sql.functions import pandas_udf

        if self._bc is None:
            sc = (spark or SparkSession.getActiveSession()).sparkContext
            self._bc = sc.broadcast(np.asarray(self.words, dtype=np.int64).view(np.uint64))
        bc = self._bc

        @pandas_udf("boolean")
        def probe(pos_lists):
            import pandas as pd

            w = bc.value
            if len(pos_lists) == 0:
                return pd.Series([], dtype=bool)
            P = np.stack(pos_lists.to_numpy()).astype(np.uint64)  # (n, k)
            hit = (w[P // np.uint64(64)] >> (P % np.uint64(64))) & np.uint64(1)
            return pd.Series(hit.all(axis=1))

        return probe(F.array(*self._positions(col)))


def bloom_filter(df: DataFrame, col: str, expected: int, fpp: float = 0.01) -> BloomFilter:
    """Build a Bloom pre-filter with one distributed pass (e.g. ship to
    the probe side of a join to drop non-matching rows pre-shuffle).

    Each partition packs its hash positions into an m-bit numpy word
    array; partials are OR-merged executor-side in a fanout-64 tree
    with as many levels as the partition count needs (log64 n_parts),
    down to a single bitset row: the driver transfer is O(m/8) — NOT
    O(#partitions × m/8) — and NO merge task ever streams more than 64
    partials through its in-place OR (the partial→final shape of
    Spark's own BloomFilterAggregate). A billion-key build (m ≈ 1.2 GB)
    therefore costs the driver one bitset, not one per partition, and a
    100k-partition scan costs three merge levels, each bounded."""
    import math

    from typing import Iterator

    import numpy as np
    import pandas as pd

    m = max(64, int(-expected * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / max(expected, 1) * math.log(2)))
    seeds = list(range(k))
    n_words = m // 64
    key_type = _hash_key_type(df, col)
    key = F.col(col).cast(key_type)
    pos_arr = F.array(*[F.pmod(F.xxhash64(key, F.lit(s)), F.lit(m)) for s in seeds])
    positions = df.select(F.explode(pos_arr).alias("pos"))

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros(n_words, dtype=np.uint64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            p = pdf["pos"].to_numpy(dtype=np.uint64)
            np.bitwise_or.at(acc, p // np.uint64(64), np.uint64(1) << (p % np.uint64(64)))
        if seen:
            yield pd.DataFrame({"words": [acc.view(np.int64).tolist()]})

    def or_merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros(n_words, dtype=np.int64)
        seen = False
        for pdf in batches:
            for lst in pdf["words"]:
                acc |= np.asarray(lst, dtype=np.int64)
                seen = True
        if seen:
            yield pd.DataFrame({"words": [acc.tolist()]})

    partials = positions.mapInPandas(pack, schema="words array<long>")
    fanout = 64
    n_parts = positions.rdd.getNumPartitions()
    # true tree: add levels until one task's fan-in is within the bound
    # (a single conditional level would hand the final task n_parts/64
    # bitsets for very wide scans)
    while n_parts > fanout:
        n_parts = -(-n_parts // fanout)
        partials = partials.repartition(n_parts).mapInPandas(
            or_merge, schema="words array<long>"
        )
    merged = partials.repartition(1).mapInPandas(
        or_merge, schema="words array<long>"
    ).collect()
    acc = (
        np.asarray(merged[0]["words"], dtype=np.int64)
        if merged
        else np.zeros(n_words, dtype=np.int64)
    )
    return BloomFilter(acc, m, k, seeds, key_type=key_type)


class CountMinSketch:
    def __init__(self, spark, table, w: int, seeds: list[int], rel=None,
                 key_type: str = "bigint"):
        self.spark = spark
        self.table = table  # dict[(seed, pos)] -> count (None in relation mode)
        self.w = w
        self.seeds = seeds
        self.key_type = key_type  # canonical hash type (see _hash_key_type)
        # relation mode: the touched (s, p, c) cells stay a DataFrame —
        # never collected to the driver, never re-uploaded; ``cms_screen``
        # broadcasts it straight into the probe join. This is the scale
        # shape: a d×w sketch with millions of touched cells would
        # otherwise round-trip through Python row objects twice.
        self.rel = rel

    def estimate_col(self, col: Column) -> Column:
        """JVM-side point estimate: min over the d seed rows of the
        counter ``col`` hashes into (broadcast literal counter arrays;
        0 for untouched cells). CMS never underestimates, so
        ``estimate_col(c) >= T`` is a no-false-negative heavy-hitter
        pre-filter. Literal-array lookup is right for SMALL w (a few
        thousand counters); for threshold-sized sketches use
        ``cms_screen`` — a broadcast join against the sketch-sized
        counter relation — instead of materializing w literals per seed
        in the plan."""
        if self.table is None:
            raise ValueError(
                "estimate_col needs a dict-mode sketch (count_min(..., "
                "as_relation=False)); relation-mode sketches screen via "
                "cms_screen's broadcast join"
            )
        est = None
        for s in self.seeds:
            dense = [self.table.get((s, p), 0) for p in range(self.w)]
            pos = F.pmod(F.xxhash64(col.cast(self.key_type), F.lit(s)), F.lit(self.w))
            v = F.element_at(F.lit(dense), pos.cast("int") + 1)
            est = v if est is None else F.least(est, v)
        return est

    def estimate_count(self, value) -> int:
        key = F.lit(value).cast(self.key_type)
        row = self.spark.range(1).select(
            *[F.pmod(F.xxhash64(key, F.lit(s)), F.lit(self.w)).alias(f"p{i}")
              for i, s in enumerate(self.seeds)]
        ).first()
        probes = {(s, int(row[f"p{i}"])) for i, s in enumerate(self.seeds)}
        if self.table is not None:
            return min(self.table.get(sp, 0) for sp in probes)
        # point lookups re-evaluate the build plan; persist on first use
        # so repeated estimate_count calls cost one build, not one each
        if not self.rel.is_cached:
            self.rel = self.rel.persist()
        cond = None
        for s, p in probes:
            c = (F.col("s") == s) & (F.col("p") == p)
            cond = c if cond is None else cond | c
        hits = {(r["s"], r["p"]): r["c"] for r in self.rel.filter(cond).collect()}
        return min(hits.get(sp, 0) for sp in probes)


def cms_screen(
    keys: DataFrame, col: str, cms: CountMinSketch, threshold: int
) -> DataFrame:
    """Keys whose CMS estimate >= threshold — a SUPERSET of the true
    heavy hitters (CMS never underestimates), so an exact recount on
    the survivors yields the exact answer.

    The sketch travels as a broadcast (seed, pos, count) relation —
    d×w rows, independent of data size — and each key's estimate is
    MIN over its d probed counters (missing cells count 0). This is
    the scale shape: one keys-side shuffle, sketch-sized broadcast,
    no plan-sized literals (estimate_col's literal arrays make codegen
    quadratic in w)."""
    spark = keys.sparkSession
    tbl = cms.rel
    if tbl is None:
        tbl = spark.createDataFrame(
            [(s, p, c) for (s, p), c in cms.table.items()] or [],
            "s int, p int, c bigint",
        )
    probes = keys.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.pmod(
                            F.xxhash64(F.col(col).cast(cms.key_type), F.lit(s)),
                            F.lit(cms.w),
                        )
                        .cast("int")
                        .alias("p"),
                    )
                    for s in cms.seeds
                ]
            )
        ).alias("sp"),
    ).select(col, "sp.s", "sp.p")
    est = (
        probes.join(F.broadcast(tbl), ["s", "p"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )
    return est.filter(F.col("est") >= F.lit(int(threshold))).select(col)


def count_min(
    df: DataFrame, col: str, eps: float = 0.001, confidence: float = 0.99,
    as_relation: bool = False,
) -> CountMinSketch:
    """Heavy-hitter frequency sketch, built with one distributed pass
    (d×w counters; w=ceil(e/eps), d=ceil(ln(1/(1-confidence)))).

    ``as_relation=True`` keeps the touched cells as a lazy DataFrame
    instead of a driver-side dict — the right mode for screen-sized
    sketches (hundreds of thousands of touched cells), whose dict mode
    would collect every cell into Python rows and re-upload them in
    ``cms_screen``."""
    import math

    w = int(math.ceil(math.e / eps))
    d = max(1, int(math.ceil(math.log(1.0 / max(1.0 - confidence, 1e-12)))))
    seeds = list(range(d))
    key_type = _hash_key_type(df, col)
    key = F.col(col).cast(key_type)
    cells = F.array(
        *[
            F.struct(F.lit(s).alias("s"), F.pmod(F.xxhash64(key, F.lit(s)), F.lit(w)).alias("p"))
            for s in seeds
        ]
    )
    counted = (
        df.select(F.explode(cells).alias("c"))
        .groupBy("c.s", "c.p")
        .count()
        .select(
            F.col("s").cast("int").alias("s"),
            F.col("p").cast("int").alias("p"),
            F.col("count").cast("bigint").alias("c"),
        )
    )
    if as_relation:
        # touched cells stay a lazy DataFrame: no driver collect, no
        # Python re-upload — cms_screen broadcasts it into the probe
        # join, so the build pass runs exactly when (and once per time)
        # the screen is evaluated. Callers screening repeatedly should
        # persist() cms.rel themselves.
        return CountMinSketch(df.sparkSession, None, w, seeds, rel=counted,
                              key_type=key_type)
    rows = counted.collect()
    table = {(int(r["s"]), int(r["p"])): int(r["c"]) for r in rows}
    return CountMinSketch(df.sparkSession, table, w, seeds, key_type=key_type)


def theta_distinct(df, key_col: str, by: str | None = None):
    """Approximate distinct counts via Datasketches Theta sketches
    (Spark-native theta_sketch_agg): mergeable across partitions and
    groups, and — unlike the HLL twin below — the estimate is
    PARTITIONING-INDEPENDENT (measured: identical at 1/7/32 input
    partitions; HLL's estimate shifts a few parts in 10^4 with the
    merge structure because union promotes between sparse/dense
    register modes). That determinism is what lets a theta estimate be
    pinned by the driver's golden gate. Returns (by?, n_distinct_est).

    At 100 TB: one narrow scan, k-bounded sketch state per group
    partial, no exact shuffle of the key universe — the screening
    companion to an exact countDistinct, with ~1.6% typical error at
    the default k."""
    est = F.theta_sketch_estimate(F.theta_sketch_agg(key_col)).cast("bigint").alias(
        "n_distinct_est"
    )
    return df.groupBy(by).agg(est) if by else df.agg(est)


def hll_distinct(df, key_col: str, by: str | None = None, lgk: int = 12):
    """Approximate distinct counts via HLL sketches (hll_sketch_agg,
    lgConfigK=lgk → rsd ≈ 1.04/sqrt(2^lgk)). Mergeable (hll_union_agg
    of per-group sketches == a direct global sketch — asserted in
    tests), but the ESTIMATE is merge-structure sensitive at the
    margin, so tests bound it against the exact count rather than
    pinning values. Returns (by?, n_distinct_est)."""
    est = F.hll_sketch_estimate(
        F.hll_sketch_agg(key_col, F.lit(lgk))
    ).cast("bigint").alias("n_distinct_est")
    return df.groupBy(by).agg(est) if by else df.agg(est)


def theta_overlap(df_a, col_a: str, df_b, col_b: str | None = None):
    """Set-relationship estimates between two key sets via theta-sketch
    set operations (theta_union / theta_intersection / theta_difference)
    — the one sketch family with a NATIVE intersection. Returns ONE row
    (n_a, n_b, n_union, n_intersection, n_a_not_b).

    This is the sketch-tier screen for decontaminate-style corpus
    overlap: estimate |train-grams ∩ benchmark-grams| WITHOUT any join —
    each side is one narrow scan folding to a k-bounded sketch, and the
    set algebra runs on two sketch values joined 1×1 (the scalar
    cross-join pattern). At 100 TB you run this first; only if the
    estimate is material do you pay the exact broadcast gram join.
    Like theta_distinct, every estimate here is partitioning-independent
    (the retained set of k smallest hashes is order-free), so the values
    are golden-pinnable; exactness below k and partition independence
    are asserted in tests/test_sketches.py."""
    col_b = col_b or col_a
    a = df_a.agg(F.theta_sketch_agg(col_a).alias("sk_a"))
    b = df_b.agg(F.theta_sketch_agg(col_b).alias("sk_b"))
    return _theta_setops(a.crossJoin(b))


def theta_overlap_cond(df, key_col: str, cond_a, cond_b):
    """One-pass same-relation variant of ``theta_overlap``: when both
    key sets are slices of the SAME relation (e.g. lineitem orderkeys
    under two return flags), sketch them in a SINGLE scan via
    conditional aggregation — theta_sketch_agg ignores NULLs, so
    ``CASE WHEN cond THEN key END`` feeds each sketch only its slice.
    At 100 TB this halves the scan work of the two-frame form and drops
    its 1×1 join entirely; the estimates are IDENTICAL (each side
    retains exactly the same k smallest hashes as a filtered scan
    would — asserted in tests/test_sketches.py)."""
    row = df.agg(
        F.theta_sketch_agg(F.when(cond_a, F.col(key_col))).alias("sk_a"),
        F.theta_sketch_agg(F.when(cond_b, F.col(key_col))).alias("sk_b"),
    )
    return _theta_setops(row)


def _theta_setops(row):
    """(sk_a, sk_b) 1-row frame -> the five set-relationship estimates."""
    est = F.theta_sketch_estimate
    return row.select(
        est("sk_a").cast("bigint").alias("n_a"),
        est("sk_b").cast("bigint").alias("n_b"),
        est(F.theta_union("sk_a", "sk_b")).cast("bigint").alias("n_union"),
        est(F.theta_intersection("sk_a", "sk_b")).cast("bigint").alias(
            "n_intersection"
        ),
        est(F.theta_difference("sk_a", "sk_b")).cast("bigint").alias("n_a_not_b"),
    )


def kll_quantiles(df, col: str, qs: list[float], by: str | None = None):
    """Approximate quantiles via KLL sketches (kll_sketch_agg_double):
    mergeable rank sketches with guaranteed rank error (vs the exact
    but sort-heavy F.percentile). KLL compaction is randomized by
    design, so outputs are tested within rank tolerance, never pinned.
    Returns (by?, q_<q> ...)."""
    sk = F.kll_sketch_agg_double(F.col(col).cast("double"))
    aggs = [
        F.kll_sketch_get_quantile_double(sk, F.lit(float(q))).alias(
            f"q_{str(q).replace('.', '_')}"
        )
        for q in qs
    ]
    return df.groupBy(by).agg(*aggs) if by else df.agg(*aggs)
