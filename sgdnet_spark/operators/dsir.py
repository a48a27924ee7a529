"""DSIR: Data Selection via Importance Resampling (Xie et al. 2023,
NeurIPS — arXiv:2302.03169), the public method for selecting raw-corpus
documents that look like a target corpus (e.g. "select web pages that
look like Wikipedia") by importance weighting on hashed n-gram features.

Pipeline shape (all three stages are the right shape for 100 TB):

1. ``fit_dsir`` — per-corpus hashed-token bucket counts: one
   map-side-combined count shuffle per corpus whose output is
   B-sized (B = n_buckets, default 4096), NOT corpus-sized. The add-α
   smoothed log-ratio vector lr_j = ln p_target(j) - ln p_raw(j) is
   computed driver-side from the two B-sized count relations (the
   sketch-collect precedent: driver state bounded by B, never by n).
2. ``dsir_score`` — per-document log importance weight
   log w(doc) = Σ_tokens lr_{hash(token)}: the vector rides into the
   plan as ONE broadcast literal array and the sum folds per token
   exactly like text.hash_score — zero shuffle, O(tokens) codegen,
   embarrassingly parallel.
3. ``dsir_resample`` — sample k docs WITHOUT replacement with
   probability ∝ exp(log w) via Gumbel-top-k: key = log w + g where
   g = -ln(-ln(u)) and u is the deterministic md5-fraction of the doc
   id (sampling.hash_fraction), so the draw is reproducible across
   runs/partitionings and exactly replayable in ANSI SQL — the same
   determinism contract as the whole sampling tier. Top-k runs as
   Spark's distributed TakeOrderedAndProject (per-partition top-k,
   driver merges k rows); for budget-sized k at 100 TB pass
   ``threshold=`` instead and selection becomes a pure map filter.

Tokenization and bucketing reuse text.tokens / text.hash_bucket (the
one md5-u32 recipe), so the DuckDB oracle replays bucket counts,
log-ratios, scores, Gumbel keys, and the top-k rank identically;
scores/keys are rounded to 4 dp on both sides (the lm_score precedent:
sum-order float drift is ~1e-14 against a 5e-5 rounding quantum).

Reference scope: jolars/sgdnet has no data-selection tier; this extends
the training-pipeline surface the same way dedup/sampling/scrub do.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sgdnet_spark.operators.sampling import hash_u32
from sgdnet_spark.operators.text import hash_bucket, tokens

_U32 = float(1 << 32)


def _features(text_col: str, bigrams: bool):
    """array<string> of hashed-feature inputs per doc: the tokens, plus
    (paper-faithful option) the adjacent bigrams rendered as 'w1_w2' —
    built by zipping two shifted slices of the token array (the
    repetition_stats zip-shift precedent), still one in-row pass."""
    t = tokens(text_col)
    if not bigrams:
        return t
    bg = F.zip_with(
        F.slice(t, 1, F.size(t) - 1),
        F.slice(t, 2, F.size(t) - 1),
        lambda a, b: F.concat(a, F.lit("_"), b),
    )
    return F.concat(t, F.when(F.size(t) >= 2, bg).otherwise(F.array()))


def _bucket_counts(
    df: DataFrame, n_buckets: int, salt: str, text_col: str, bigrams: bool
):
    """(j, c) hashed-feature bucket counts: explode + map-side-combined
    count, output B-sized. The input spreads across cores first — a
    small single-file scan otherwise serializes the whole tokenize+hash
    pipeline onto 1-2 tasks (no-op on well-partitioned scans)."""
    from sgdnet_spark.session import spread_small_input

    df = spread_small_input(df)
    return (
        df.select(F.explode(_features(text_col, bigrams)).alias("w"))
        .select(hash_bucket(F.col("w"), n_buckets, salt).alias("j"))
        .groupBy("j")
        .count()
    )


def fit_dsir(
    target: DataFrame,
    raw: DataFrame,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    salt: str = "ds",
    text_col: str = "text",
    bigrams: bool = False,
) -> list[float]:
    """Fit the bucket log-importance-ratio vector lr (length n_buckets):

        lr_j = ln((c_target_j + α) / (N_target + αB))
             - ln((c_raw_j + α) / (N_raw + αB))

    i.e. the log ratio of add-α smoothed hashed-feature probabilities.
    Two B-sized count aggregations; the vector itself is driver-sized
    (B doubles) and broadcasts into scoring as a literal array.
    ``bigrams=True`` hashes adjacent word pairs alongside the unigrams
    (the paper's hashed n-gram feature set); fit and scoring must use
    the same setting.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    lr = [0.0] * n_buckets
    consts = []
    for df, sign in ((target, 1.0), (raw, -1.0)):
        counts = dict(
            _bucket_counts(df, n_buckets, salt, text_col, bigrams).collect()
        )
        n_total = sum(counts.values())
        consts.append((counts, sign, math.log(n_total + alpha * n_buckets)))
    for counts, sign, log_denom in consts:
        for j in range(n_buckets):
            lr[j] += sign * (math.log(counts.get(j, 0) + alpha) - log_denom)
    return lr


def fit_dsir_modes(
    target: DataFrame,
    raw: DataFrame,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    salt: str = "ds",
    text_col: str = "text",
) -> dict[str, list[float]]:
    """Fit BOTH feature modes — {'uni': lr, 'bi': lr} — from ONE tagged
    count pass per corpus instead of two independent fits (which would
    scan each corpus twice and re-hash the unigrams inside the bigram
    fit): every feature explodes once carrying an is-bigram tag, the
    count shuffle is keyed (tag, bucket) (2B-sized, still map-side
    combined), and the driver derives uni counts from the tag-0 slice
    and uni+bi counts from both slices. Identical vectors to
    fit_dsir(bigrams=False) / fit_dsir(bigrams=True) — asserted in
    tests/test_dsir.py. Measured 9.0 -> ~5 s wall on the registered
    corpus_dsir entry at sf0.1 (docs/BENCH_NOTES.md).

    Round 13 (optimization): BOTH corpora ride ONE tagged union pass —
    each side carries a corpus tag through the same explode, the count
    shuffle is keyed (corpus, tag, bucket) (4B-sized), and the driver
    slices per corpus. One collect round trip instead of two serial
    ones; per-(bucket, tag) counts — and therefore the lr vectors — are
    unchanged (guide §1.2/§2.6)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")

    from sgdnet_spark.session import spread_small_input

    def tagged_feats(df: DataFrame, corpus: int) -> DataFrame:
        df = spread_small_input(df)
        t = tokens(text_col)
        bg = F.zip_with(
            F.slice(t, 1, F.size(t) - 1),
            F.slice(t, 2, F.size(t) - 1),
            lambda a, b: F.concat(a, F.lit("_"), b),
        )
        feats = F.concat(
            F.transform(t, lambda w: F.struct(w.alias("w"), F.lit(0).alias("bi"))),
            F.transform(
                F.when(F.size(t) >= 2, bg).otherwise(
                    F.array().cast("array<string>")
                ),
                lambda w: F.struct(w.alias("w"), F.lit(1).alias("bi")),
            ),
        )
        return df.select(F.lit(corpus).alias("c"), F.explode(feats).alias("f"))

    rows = (
        tagged_feats(target, 0)
        .unionByName(tagged_feats(raw, 1))
        .select(
            "c",
            F.col("f.bi").alias("bi"),
            hash_bucket(F.col("f.w"), n_buckets, salt).alias("j"),
        )
        .groupBy("c", "bi", "j")
        .count()
        .collect()
    )
    tc = {(r["bi"], r["j"]): r["count"] for r in rows if r["c"] == 0}
    rc = {(r["bi"], r["j"]): r["count"] for r in rows if r["c"] == 1}
    out: dict[str, list[float]] = {}
    for mode, tags in (("uni", (0,)), ("bi", (0, 1))):
        lr = [0.0] * n_buckets
        for counts, sign in ((tc, 1.0), (rc, -1.0)):
            c = [
                sum(counts.get((b, j), 0) for b in tags)
                for j in range(n_buckets)
            ]
            log_denom = math.log(sum(c) + alpha * n_buckets)
            for j in range(n_buckets):
                lr[j] += sign * (math.log(c[j] + alpha) - log_denom)
        out[mode] = lr
    return out


def dsir_score(
    df: DataFrame,
    logratios: list[float],
    salt: str = "ds",
    text_col: str = "text",
    id_col: str = "doc_id",
    rpos: int = 4,
    bigrams: bool = False,
) -> DataFrame:
    """Per-document log importance weight: Σ_tokens lr_{hash(token)} —
    one zero-shuffle codegen fold (the hash_score shape). Returns
    (id, n_tokens, logw) with logw rounded to ``rpos`` dp.

    The vector rides as a 1-row broadcast relation (array column), NOT
    as a literal inside the expression tree: a B-sized literal array is
    inlined into the generated code, and every fresh plan over it pays
    ~2 s of driver-side codegen at B=4096 (measured — the fold itself
    is 0.3 s at sf0.1). As DATA in a broadcast row the generated source
    is small and stable; fold order and values are bit-identical.
    Streaming frames keep the literal form (stream⨯static cross join is
    not universally supported; a streaming query compiles its plan once,
    so the codegen cost is not per-call there)."""
    if not logratios:
        raise ValueError("logratios must be non-empty (fit_dsir output)")
    n_buckets = len(logratios)
    t = _features(text_col, bigrams)

    # NULL-text docs are dropped (the lm_score/repetition_stats precedent,
    # and what the corpus_dsir oracle does): without this, F.size(NULL)
    # yields n_tokens=-1 and logw NULL for direct consumers.
    from sgdnet_spark.session import spread_small_input

    df = spread_small_input(df.filter(F.col(text_col).isNotNull()))
    if df.isStreaming:
        arr = F.lit([float(v) for v in logratios])
    else:
        # dunder-reserved name (the hash_score '__wv' convention): a
        # caller frame with its own 'lrv' column would otherwise make
        # the reference ambiguous at analysis
        rel = df.sparkSession.createDataFrame(
            [([float(v) for v in logratios],)], "__lrv array<double>"
        )
        df = df.crossJoin(F.broadcast(rel))  # 1-row scalar join
        arr = rel["__lrv"]

    def lr(tok: Column) -> Column:
        return F.element_at(arr, hash_bucket(tok, n_buckets, salt).cast("int") + 1)

    return df.select(
        F.col(id_col),
        F.size(t).cast("bigint").alias("n_tokens"),
        F.round(
            F.aggregate(F.transform(t, lr), F.lit(0.0), lambda a, x: a + x), rpos
        ).alias("logw"),
    )


def gumbel_key(logw: Column, id_col: Column | str, salt: str = "dg") -> Column:
    """Deterministic Gumbel-perturbed key: logw + (-ln(-ln(u))) with
    u = (hash_u32(id) + 0.5) / 2^32 ∈ (0, 1) — the +0.5 keeps u off both
    endpoints so the double log never hits ±inf. Taking the top-k keys
    samples k items without replacement ∝ exp(logw) (the Gumbel-top-k
    identity), but reproducibly: u is a pure md5 function of the id."""
    u = (hash_u32(id_col, salt) + F.lit(0.5)) / F.lit(_U32)
    return logw + (-F.log(-F.log(u)))


def dsir_resample(
    df: DataFrame,
    logratios: list[float],
    k: int | None = None,
    threshold: float | None = None,
    salt: str = "ds",
    gumbel_salt: str = "dg",
    text_col: str = "text",
    id_col: str = "doc_id",
    rpos: int = 4,
    bigrams: bool = False,
) -> DataFrame:
    """DSIR selection: score, Gumbel-perturb, keep the top ``k`` (or,
    for budget-sized selections at scale, every row with key >=
    ``threshold`` — a pure map filter, no ordering anywhere). Returns
    (id, n_tokens, logw, key) with key rounded to ``rpos`` dp; ties on
    the rounded key break by id so the selection is total-order
    deterministic cross-engine. ``bigrams`` must match the fit_dsir
    setting the logratios came from (fit/score feature sets must agree)."""
    if (k is None) == (threshold is None):
        raise ValueError("exactly one of k / threshold must be given")
    scored = dsir_score(df, logratios, salt, text_col, id_col, rpos, bigrams)
    key = F.round(gumbel_key(F.col("logw"), id_col, gumbel_salt), rpos)
    scored = scored.withColumn("key", key)
    if threshold is not None:
        return scored.filter(F.col("key") >= threshold)
    return scored.orderBy(F.desc("key"), F.col(id_col)).limit(k)
