"""Approximate sketches — the sublinear answers a 100 TB engine leads
with before exact computation is even considered.

All JVM-side: HyperLogLog++ (approx_count_distinct), Greenwald-Khanna
(percentile_approx), Bloom filter and Count-Min Sketch from
DataFrameStatFunctions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(df: DataFrame, cols: list[str], rsd: float = 0.02) -> DataFrame:
    return df.agg(
        *[F.approx_count_distinct(c, rsd=rsd).alias(f"{c}_approx_distinct") for c in cols]
    )


def approx_quantiles(
    df: DataFrame, col: str, probs: list[float], accuracy: int = 10000
) -> list[float]:
    return df.approxQuantile(col, probs, 1.0 / accuracy)


class BloomFilter:
    """Driver-held bitset built by a distributed pass (pyspark 4 has no
    Python binding for the JVM bloom filter, so this builds one from
    xxhash64 positions — same guarantees: no false negatives)."""

    def __init__(self, bits, m: int, k: int, seeds: list[int]):
        self.bits = bits
        self.m = m
        self.k = k
        self.seeds = seeds

    def might_contain_col(self, col: Column) -> Column:
        """JVM-side membership test against the (broadcast) literal bitset
        packed as sorted array — via array_contains on each position."""
        import pyspark.sql.functions as Fn

        arr = Fn.lit(sorted(self.bits))
        cond = None
        for s in self.seeds:
            pos = Fn.pmod(Fn.xxhash64(col, Fn.lit(s)), Fn.lit(self.m))
            c = Fn.array_contains(arr, pos)
            cond = c if cond is None else cond & c
        return cond


def bloom_filter(df: DataFrame, col: str, expected: int, fpp: float = 0.01) -> BloomFilter:
    """Build a Bloom pre-filter with one distributed pass (e.g. ship to
    the probe side of a join to drop non-matching rows pre-shuffle)."""
    import math

    m = max(64, int(-expected * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / max(expected, 1) * math.log(2)))
    seeds = list(range(k))
    pos_arr = F.array(*[F.pmod(F.xxhash64(F.col(col), F.lit(s)), F.lit(m)) for s in seeds])
    rows = df.select(F.explode(pos_arr).alias("pos")).distinct().collect()
    return BloomFilter({int(r["pos"]) for r in rows}, m, k, seeds)


class CountMinSketch:
    def __init__(self, spark, table, w: int, seeds: list[int]):
        self.spark = spark
        self.table = table  # dict[(seed, pos)] -> count
        self.w = w
        self.seeds = seeds

    def estimate_count(self, value) -> int:
        row = self.spark.range(1).select(
            *[F.pmod(F.xxhash64(F.lit(value), F.lit(s)), F.lit(self.w)).alias(f"p{i}")
              for i, s in enumerate(self.seeds)]
        ).first()
        return min(
            self.table.get((s, int(row[f"p{i}"])), 0) for i, s in enumerate(self.seeds)
        )


def count_min(
    df: DataFrame, col: str, eps: float = 0.001, confidence: float = 0.99
) -> CountMinSketch:
    """Heavy-hitter frequency sketch, built with one distributed pass
    (d×w counters; w=ceil(e/eps), d=ceil(ln(1/(1-confidence))))."""
    import math

    w = int(math.ceil(math.e / eps))
    d = max(1, int(math.ceil(math.log(1.0 / max(1.0 - confidence, 1e-12)))))
    seeds = list(range(d))
    cells = F.array(
        *[
            F.struct(F.lit(s).alias("s"), F.pmod(F.xxhash64(F.col(col), F.lit(s)), F.lit(w)).alias("p"))
            for s in seeds
        ]
    )
    rows = (
        df.select(F.explode(cells).alias("c"))
        .groupBy("c.s", "c.p")
        .count()
        .collect()
    )
    table = {(int(r["s"]), int(r["p"])): int(r["count"]) for r in rows}
    return CountMinSketch(df.sparkSession, table, w, seeds)
