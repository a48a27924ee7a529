"""Fuzzy string join (operators/fuzzy.py).

Certifies: deletion-variant generation against a python replay, the
SymSpell completeness property (blocking == exhaustive all-pairs at
k=1 AND k=2, including the substitution / insertion / transposition
shapes), min_len block-width floor, the asymmetric lookup join, and
the streaming probe twin (stream-static variant join + stateful
dedup == batch).
"""

import itertools

import pytest
from pyspark.sql import functions as F

from sgdnet_spark.operators import fuzzy


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _dels(s: str, k: int) -> set[str]:
    out = {s}
    frontier = {s}
    for _ in range(k):
        frontier = {t[:i] + t[i + 1:] for t in frontier for i in range(len(t))}
        out |= frontier
    return out


WORDS = [
    "gear", "bear", "gearx", "gea", "ger", "rage",      # subst/ins/del/anagram
    "plate", "late", "plte", "pate", "slate",
    "ab", "ba", "ring", "rng", "ringo", "wring",
    "anvil", "anvill", "navil",                          # transposition at 0
    "widget", "widgte", "wigdet",                        # transpositions
]


def test_deletion_variants_match_python_replay(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "s string")
    for k in (1, 2):
        got = {
            r["s"]: set(r["v"])
            for r in df.select(
                "s", fuzzy.deletion_variants(F.col("s"), k).alias("v")
            ).collect()
        }
        for w in WORDS:
            assert got[w] == _dels(w, k), (w, k)
    with pytest.raises(ValueError, match="k must be"):
        fuzzy.deletion_variants(F.col("s"), 3)


@pytest.mark.parametrize("k", [1, 2])
def test_self_join_equals_exhaustive_all_pairs(spark, k):
    """Blocking recall AND precision 1.0: the variant join + verify
    returns exactly the brute-force pair set at both k."""
    df = spark.createDataFrame([(w,) for w in WORDS], "s string")
    got = {
        (r["s_a"], r["s_b"], r["dist"])
        for r in fuzzy.fuzzy_self_join(df, "s", max_dist=k, min_len=1).collect()
    }
    want = {
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(sorted(set(WORDS)), 2)
        if _lev(a, b) <= k
    }
    assert got == want and len(want) > 5
    # the k=2 set must include a transposition pair (lev 2, shares a
    # 1-deletion variant — the case that forces the verify step at k=1)
    if k == 2:
        assert ("ab", "ba", 2) in got


def test_min_len_floor_drops_degenerate_blocks(spark):
    df = spark.createDataFrame([("a",), ("b",), ("ab",), ("abc",), ("abd",)], "s string")
    got = fuzzy.fuzzy_self_join(df, "s", max_dist=1, min_len=3).collect()
    assert {(r["s_a"], r["s_b"]) for r in got} == {("abc", "abd")}


def test_lookup_join_matches_per_probe_scan(spark):
    dic = spark.createDataFrame([(w,) for w in ["gear", "plate", "ring"]], "s string")
    probe = spark.createDataFrame([(w,) for w in WORDS], "s string")
    got = {
        (r["s_probe"], r["s_dict"], r["dist"])
        for r in fuzzy.fuzzy_lookup_join(probe, dic, "s", "s", max_dist=1).collect()
    }
    want = {
        (p, d, _lev(p, d))
        for p in set(WORDS) for d in ["gear", "plate", "ring"]
        if len(p) >= 3 and _lev(p, d) <= 1
    }
    assert got == want and ("bear", "gear", 1) in got


def test_streaming_probe_twin_matches_batch(spark, tmp_path):
    """The lookup join on a STREAMING probe side: stream-static variant
    join + stateful dropDuplicates, streamed matches == batch."""
    dic = spark.createDataFrame([(w,) for w in ["gear", "plate", "ring"]], "s string")
    batch_probe = spark.createDataFrame([(w,) for w in WORDS], "s string")
    want = {
        (r["s_probe"], r["s_dict"], r["dist"])
        for r in fuzzy.fuzzy_lookup_join(batch_probe, dic, "s", "s").collect()
    }
    src = tmp_path / "probe_stream"
    src.mkdir()
    batch_probe.coalesce(1).write.parquet(str(src / "batch0"))
    stream = (
        spark.readStream.schema("s string").format("parquet").load(str(src / "*"))
    )
    out = fuzzy.fuzzy_lookup_join(stream, dic, "s", "s")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("fuzzy_s")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM fuzzy_s").collect()}
    assert got == want and len(got) > 0


def test_registered_entry_plants_detectable_typos(spark, sf_dir):
    """The driver sub-entry: every synthesized typo whose string
    survives min_len pairs with its origin name (ed<=1 by
    construction), plus natural cross-name pairs may appear."""
    from sgdnet_spark.queries import SUBQUERIES

    rows = SUBQUERIES["fuzzy_part_names"](spark, sf_dir).collect()
    assert all(r["dist"] <= 1 for r in rows)
    names = {
        r["s"]
        for r in spark.read.parquet(f"{sf_dir}/part.parquet")
        .select(F.col("p_name").alias("s")).distinct().collect()
    }
    paired = {r["s_a"] for r in rows} | {r["s_b"] for r in rows}
    # at least one original name appears in a pair (its typo was found)
    assert names & paired
