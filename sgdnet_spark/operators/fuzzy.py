"""Fuzzy string-similarity self-join via SymSpell deletion-neighborhood
blocking — the entity-resolution / metadata-dedup stage of a curation
pipeline (merging near-identical titles, author strings, product names
before corpus-level grouping).

Algorithm (Garbe's SymSpell, public domain): if lev(s, t) <= k then the
<=k-deletion neighborhoods of s and t intersect — a substitution at
position i is covered by deleting position i from BOTH strings, an
insertion/deletion by deleting the extra character from the longer
side, and compositions of <=k edits by stacking those deletions. So

    explode <=k-deletion variants  ->  self-join on variant
    ->  distinct candidate pairs   ->  exact Levenshtein verify

finds EVERY pair within edit distance k (recall 1.0 — certified by the
DuckDB all-pairs oracle hashing equal), while doing n * C(L, <=k) work
instead of n^2: the candidates-then-exact-verify shape shared with
sketch_prefilter and dedup_minhash_lsh.

Scale at 100 TB: the variant explode is a zero-shuffle in-row
transform; the only shuffle is the variant self-join, keyed by variant
string — entity vocabularies (names/titles) are Zipf-small relative to
the corpus, and candidate volume tracks the true near-dup rate, not
n^2. A popular variant (short strings sharing a 1-char core) can skew
one key; the `min_len` floor drops degenerate blocks the same way the
LSH tiers bound band width, and AQE handles residual skew.

No reference analog (jolars/sgdnet is a GLM library); this extends the
dedup tier (SURVEY §2 rows 21-25) to typo-level metadata strings where
shingle/MinHash similarity is meaningless (a 1-char typo in a 10-char
name is Jaccard-distant but Levenshtein-adjacent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(s: Column, k: int = 1) -> Column:
    """Array of every string obtainable from ``s`` by deleting at most
    ``k`` characters (including ``s`` itself), distinct. Pure in-row
    expression — codegen, no UDF, runs unchanged on streams."""
    if k not in (1, 2):
        raise ValueError(f"deletion_variants: k must be 1 or 2, got {k}")

    def del_one(x: Column) -> Column:
        # delete the 0-based position i: first i chars + chars from i+2
        return F.transform(
            F.sequence(F.lit(0), F.length(x) - 1),
            lambda i: F.concat(
                x.substr(F.lit(1), i), x.substr(i + F.lit(2), F.length(x))
            ),
        )

    out = F.array_union(F.array(s), del_one(s))
    if k == 2:
        two = F.flatten(F.transform(del_one(s), del_one))
        out = F.array_union(out, two)
    return F.array_distinct(out)


def fuzzy_self_join(
    df: DataFrame,
    str_col: str,
    max_dist: int = 1,
    min_len: int = 3,
) -> DataFrame:
    """All DISTINCT string pairs within Levenshtein distance
    ``max_dist`` (1 or 2): returns (s_a, s_b, dist) with s_a < s_b.

    Strings shorter than ``min_len`` are excluded — their deletion
    neighborhoods degenerate toward the empty string (every 1-char
    string pairs with every other), the block-width bound that keeps
    the variant join's biggest key honest at scale."""
    uni = (
        df.select(F.col(str_col).alias("s"))
        .where(F.length("s") >= min_len)
        .distinct()
    )
    variants = uni.select(
        "s", F.explode(deletion_variants(F.col("s"), max_dist)).alias("v")
    )
    cand = (
        variants.alias("a")
        .join(variants.alias("b"), "v")
        .where(F.col("a.s") < F.col("b.s"))
        .select(F.col("a.s").alias("s_a"), F.col("b.s").alias("s_b"))
        .distinct()
    )
    return cand.select(
        "s_a", "s_b", F.levenshtein("s_a", "s_b").alias("dist")
    ).where(F.col("dist") <= max_dist)


def fuzzy_lookup_join(
    probe: DataFrame,
    dictionary: DataFrame,
    probe_col: str,
    dict_col: str,
    max_dist: int = 1,
    min_len: int = 3,
) -> DataFrame:
    """Asymmetric variant: match each probe string to every dictionary
    string within ``max_dist`` — (s_probe, s_dict, dist). The same
    variant blocking, but the dictionary side is fit-once (a static
    relation), so the probe side can be a STREAM: stream-static joins
    on the variant key are append-legal, the fit-on-batch/score-stream
    shape of the lm/boilerplate twins."""
    d = (
        dictionary.select(F.col(dict_col).alias("s_dict"))
        .where(F.length("s_dict") >= min_len)
        .distinct()
        .select(
            "s_dict",
            F.explode(deletion_variants(F.col("s_dict"), max_dist)).alias("v"),
        )
    )
    p = probe.select(F.col(probe_col).alias("s_probe")).where(
        F.length("s_probe") >= min_len
    ).select(
        "s_probe",
        F.explode(deletion_variants(F.col("s_probe"), max_dist)).alias("v"),
    )
    return (
        p.join(d, "v")
        .select("s_probe", "s_dict")
        .distinct()
        .select(
            "s_probe", "s_dict",
            F.levenshtein("s_probe", "s_dict").alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
    )
