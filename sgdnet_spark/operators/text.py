"""Text-analysis operators for LLM-data pipelines.

All hot-path logic is built from `pyspark.sql.functions` column
expressions — whole-stage codegen, zero Python UDFs — so a 100 TB
documents table runs these as a single narrow scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword profiles for the langid heuristic
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "is", "in"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un"],
    "es": ["el", "la", "los", "y", "es", "un"],
    "zh": ["de", "shi", "le", "he", "zai"],
}

STOPWORDS = LANG_PROFILES["en"]


def rpos(col: Column, digits: int) -> Column:
    """Engine-portable rounding for non-negative ratios of integers.

    Ratios of small ints land exactly on half-way grid points, where
    Spark (HALF_UP) and DuckDB disagree; floor(x*10^d + 0.5) is
    deterministic and identical in both engines.
    """
    scale = float(10**digits)
    return F.floor(col * scale + F.lit(0.5)) / scale


def norm_text(col: Column | str) -> Column:
    """Canonical normalization: lower, collapse whitespace, trim.

    Trim runs AFTER the collapse: trim() strips only ASCII spaces, so a
    trailing tab/newline (most real documents end with one) would
    survive trim, collapse to a residual trailing space, and split()
    would emit a phantom empty token — skewing token counts, shingles,
    simhash bits, and md5 exact-dedup corpus-wide. The DuckDB twin
    (queries._NORM_SQL) applies the same order; keep them in lockstep."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    return F.split(norm_text(col), " ")


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """tokens + normalized char count per document. The input spreads
    across cores first (small single-file scans otherwise serialize the
    tokenize pipeline onto 1-2 tasks; no-op on well-partitioned scans —
    the shingle_array precedent)."""
    from sgdnet_spark.session import spread_small_input

    df = spread_small_input(df)
    t = tokens(text_col)
    return df.select(
        F.col(id_col),
        F.size(t).cast("bigint").alias("n_tokens"),
        F.length(norm_text(text_col)).cast("bigint").alias("n_chars_norm"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / stopword-ratio / mean-token-length quality heuristic.

    score = stopword_ratio * 0.4 + clamp(n_tokens/100) * 0.4 + clamp(mean_len/8) * 0.2
    (a deterministic stand-in for a trained quality model).
    Spreads small single-file scans across cores (shingle_array
    precedent; no-op at scale).
    """
    from sgdnet_spark.session import spread_small_input

    df = spread_small_input(df)
    t = tokens(text_col)
    n = F.size(t).cast("double")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(t, lambda w: F.array_contains(stop_arr, w))).cast("double")
    mean_len = (F.length(norm_text(text_col)).cast("double") - (n - 1)) / n  # chars sans spaces / tokens
    stop_ratio = n_stop / n
    score = (
        stop_ratio * F.lit(0.4)
        + F.least(n / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + F.least(mean_len / F.lit(8.0), F.lit(1.0)) * F.lit(0.2)
    )
    return df.select(
        F.col(id_col),
        F.size(t).cast("bigint").alias("n_tokens"),
        rpos(stop_ratio, 4).alias("stopword_ratio"),
        rpos(mean_len, 4).alias("mean_token_len"),
        rpos(score, 4).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            label_col: str | None = "lang") -> DataFrame:
    """Stopword-overlap language ID: argmax over per-language profiles.

    Deterministic tie-break: higher score wins, then lexicographic lang.
    ``matches_label`` compares against ``label_col`` when that column
    exists (pass label_col=None, or a corpus without it, to skip — the
    operator is not coupled to the benchmark table's schema).
    Spreads small single-file scans across cores (shingle_array
    precedent; no-op at scale).
    """
    from sgdnet_spark.session import spread_small_input

    df = spread_small_input(df)
    t = tokens(text_col)
    n = F.size(t).cast("double")
    scores = []
    for lang in sorted(LANG_PROFILES):
        arr = F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])
        sc = F.size(F.filter(t, lambda w: F.array_contains(arr, w))).cast("double") / n
        scores.append(F.struct(rpos(sc, 6).alias("score"), F.lit(lang).alias("lang")))
    # argmax: max over (score, lang) structs, then flip: prefer LOWER lang on ties
    best = F.sort_array(
        F.array(*[F.struct((-s["score"]).alias("neg"), s["lang"].alias("lang")) for s in scores])
    )[0]
    cols = [
        F.col(id_col),
        best["lang"].alias("pred_lang"),
        (-best["neg"]).alias("pred_score"),
    ]
    if label_col is not None and label_col in df.columns:
        cols.append(
            (F.col(label_col) == best["lang"]).cast("bigint").alias("matches_label")
        )
    return df.select(*cols)


BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def token_count_bpe(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BPE-ish sub-word segmentation: letter runs / digit runs /
    single punctuation (a portable stand-in for a GPT-style pre-tokenizer
    regex; identical semantics in Java regex and RE2). Spreads small
    single-file scans across cores (shingle_array precedent)."""
    from sgdnet_spark.session import spread_small_input

    df = spread_small_input(df)
    toks = F.regexp_extract_all(norm_text(text_col), F.lit(BPE_PATTERN), 0)
    return df.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_bpe_unique"),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 16,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al.): hash every
    char k-gram (md5 — engine-portable), keep each sliding window's
    minimum, emit the distinct fingerprint set. The standard local-
    fingerprint scheme behind plagiarism/near-dup detection at scale.

    The sliding minimum never allocates per-window arrays (the naive
    array_min(slice(h, i, w)) copies a w-element array per position —
    profiled as the dominant cost, 12.4s CPU at sf0.1). For typical
    windows (w <= 32) each window min is ONE lambda evaluation doing w
    element_at reads on the materialized hash array plus a varargs
    least() — O(L*w) comparisons but zero allocations, and measured
    ~2x faster than an O(L log w) doubling cascade because per-element
    lambda dispatch, not the comparisons, is the hot cost in Spark's
    interpreted higher-order functions. Large windows switch to the
    doubling cascade (width-d running mins combined pairwise — min is
    associative and idempotent, so overlapping halves are exact). Both
    paths produce identical values to the naive formulation. The hash
    array (and each cascade level) sits behind an evaluate-once barrier
    so Catalyst cannot inline it into its many element_at references.
    """
    from sgdnet_spark.operators.dedup import _once
    from sgdnet_spark.session import spread_small_input

    # ~1k md5 k-grams + a sliding-min pass per document: CPU-heavy
    # per-row work that a single-split local file would serialize onto
    # one or two cores (no-op on well-partitioned scans)
    staged = spread_small_input(df).select(F.col(id_col), norm_text(text_col).alias("__norm"))
    norm = F.col("__norm")
    nhash = F.length(norm) - (k - 1)
    idx = F.when(nhash >= 1, F.sequence(F.lit(1), nhash)).otherwise(F.array().cast("array<int>"))
    streaming = df.isStreaming
    frame = staged.select(
        F.col(id_col),
        _once(
            F.transform(idx, lambda i: F.md5(norm.substr(i, F.lit(k)).cast("binary"))),
            streaming,
        ).alias("__w_1"),
    )

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if window <= 32:
        h = F.col("__w_1")
        nwin = F.size(h) - (window - 1)
        widx = F.when(nwin >= 1, F.sequence(F.lit(1), nwin)).otherwise(
            F.array().cast("array<int>")
        )
        if window == 1:  # every k-gram is its own window (least() needs >= 2 args)
            win = F.transform(widx, lambda i: F.element_at(h, i))
        else:
            win = F.transform(
                widx, lambda i: F.least(*[F.element_at(h, i + j) for j in range(window)])
            )
        fps = F.when(nwin >= 1, win).otherwise(
            F.when(F.size(h) > 0, F.array(F.array_min(h))).otherwise(
                F.array().cast("array<string>")
            )
        )
        return frame.select(F.col(id_col), F.explode(F.array_distinct(fps)).alias("fp"))

    def level_up(frame, src_width: int, dst_width: int):
        """Width-dst mins from width-src mins: out[i] = least(src[i],
        src[i+delta]) with delta = dst-src — valid for any overlap
        (src_width >= delta), used with delta=src for the doubling and
        delta=window-src for a final non-power-of-two combine. Keeps
        __w_1 alongside for the short-document fallback."""
        c = F.col(f"__w_{src_width}")
        delta = dst_width - src_width
        n = F.size(c) - delta
        arr = F.when(
            n >= 1,
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.least(F.element_at(c, i), F.element_at(c, i + delta)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        keep = [F.col(id_col), F.col("__w_1")] if src_width > 1 else [F.col(id_col), c.alias("__w_1")]
        return frame.select(*keep, _once(arr, streaming).alias(f"__w_{dst_width}"))

    width = 1
    while width * 2 <= window:
        frame = level_up(frame, width, width * 2)
        width *= 2
    if width < window:
        frame = level_up(frame, width, window)
    h1 = F.col("__w_1")
    win = F.col(f"__w_{window}")
    nwin = F.size(h1) - (window - 1)
    fps = F.when(nwin >= 1, win).otherwise(
        F.when(F.size(h1) > 0, F.array(F.array_min(h1))).otherwise(
            F.array().cast("array<string>")
        )
    )
    return frame.select(F.col(id_col), F.explode(F.array_distinct(fps)).alias("fp"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """md5 fingerprint of normalized text (engine-portable, deterministic)."""
    return df.select(
        F.col(id_col),
        F.md5(norm_text(text_col).cast("binary")).alias("fp"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021, the
    repetition tier of its quality filters; complements quality_score's
    length/punctuation/stopword tier): per document with >= 2 tokens,

    - ``top_token_frac``  — occurrences of the most frequent token over
      all token occurrences,
    - ``top_bigram_frac`` — occurrences of the most frequent word bigram
      over all bigram occurrences,
    - ``dup_bigram_frac`` — fraction of bigram occurrences that are
      repeats (1 - distinct/total).

    High values mark boilerplate/looping text that near-dup passes miss
    because nothing repeats ACROSS documents. Shuffle pattern: two
    id-keyed groupBys (token counts, bigram counts) joined on id —
    counts only, document text never shuffles.
    """
    toks = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("t")).filter(
        F.size("t") >= 2
    )
    tok = (
        toks.select("id", F.explode("t").alias("w"))
        .groupBy("id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_tok"),
            F.max("c").alias("top_tok"),
        )
    )
    big = (
        # zip two shifted slices instead of per-position element_at in a
        # transform: identical bigrams, ~3.3x less CPU (the measured
        # shingle_array recipe — element_at pays a bounds-checked access
        # per token per offset; slices copy once and zip linearly)
        toks.select(
            "id",
            F.explode(
                F.zip_with(
                    F.slice("t", 1, F.size("t") - 1),
                    F.slice("t", 2, F.size("t") - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("g"),
        )
        .groupBy("id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_big"),
            F.max("c").alias("top_big"),
            F.count("*").alias("uniq_big"),
        )
    )
    return tok.join(big, "id").select(
        F.col("id").alias(id_col),
        F.col("n_tok").cast("bigint").alias("n_tokens"),
        rpos(F.col("top_tok") / F.col("n_tok"), 4).alias("top_token_frac"),
        rpos(F.col("top_big") / F.col("n_big"), 4).alias("top_bigram_frac"),
        rpos(F.lit(1.0) - F.col("uniq_big") / F.col("n_big"), 4).alias("dup_bigram_frac"),
    )


def hash_bucket(tok: Column, n_buckets: int, salt: str = "qs") -> Column:
    """Feature-hashing bucket for a token: sampling.hash_u32 (the one
    md5-u32 recipe shared with the sampling tier) mod n_buckets — md5,
    not xxhash64, so the mapping replays exactly in ANSI SQL."""
    from sgdnet_spark.operators.sampling import hash_u32

    return hash_u32(tok, salt + "b") % n_buckets


def hash_score(
    df: DataFrame,
    n_buckets: int = 4096,
    weights: list[float] | None = None,
    salt: str = "qs",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Linear quality scoring over hashed bag-of-words features — the
    fastText-style model-based filter stage of a training-data pipeline
    (after the rule tiers: text_quality lengths/ratios, text_repetition
    boilerplate): score(doc) = sum_j tf_j * w_j with j = hash(token).

    Because the model is linear, the score folds to a PER-TOKEN weight
    sum — no tf materialization, no shuffle, no state: one codegen pass
    whose cost is O(tokens), embarrassingly parallel at 100 TB (model
    scoring is a map). ``weights`` is the learned coefficient vector
    (length n_buckets, e.g. from a sparse binomial sgdnet fit on hashed
    features); it rides into the plan as one broadcast literal array.
    With ``weights=None`` the weights are themselves md5-derived
    (w_j = u32(md5(j||salt))/2^32 - 1/2 ∈ [-0.5, 0.5)) so the whole
    operator — bucketing AND scoring — replays exactly in DuckDB for
    the driver's value gate. Every weight is a dyadic rational k/2^32
    and document sums stay far below 2^53 numerator bits, so the
    aggregation is EXACT in IEEE double regardless of summation order —
    the score needs no rounding to hash-match across engines.

    Returns (id, n_tokens, score).
    """
    t = tokens(text_col)

    if weights is not None:
        if len(weights) != n_buckets:
            raise ValueError(f"weights must have length n_buckets={n_buckets}")
        # learned weights ride as a 1-row broadcast relation, not a
        # literal: a B-sized array literal is inlined into the generated
        # code and every fresh plan pays ~2 s of driver-side codegen at
        # B=4096 (the dsir_score measurement) — as broadcast DATA the
        # source stays small; fold order/values are bit-identical.
        # Streaming keeps the literal (its plan compiles once).
        if df.isStreaming:
            warr = F.lit([float(w) for w in weights])
        else:
            rel = df.sparkSession.createDataFrame(
                [([float(w) for w in weights],)], "__wv array<double>"
            )
            df = df.crossJoin(F.broadcast(rel))  # 1-row scalar join
            # via the relation handle, not F.col: unambiguous even if
            # the caller's frame ever carries a same-named column
            warr = rel["__wv"]

        def wexpr(tok: Column) -> Column:
            return F.element_at(warr, hash_bucket(tok, n_buckets, salt).cast("int") + 1)
    else:

        from sgdnet_spark.operators.sampling import hash_fraction

        def wexpr(tok: Column) -> Column:
            j = hash_bucket(tok, n_buckets, salt)
            return hash_fraction(j, salt + "w") - 0.5

    return df.select(
        F.col(id_col),
        F.size(t).cast("bigint").alias("n_tokens"),
        F.aggregate(F.transform(t, wexpr), F.lit(0.0), lambda a, x: a + x).alias("score"),
    )


def _bigram_pairs(t: Column) -> Column:
    """array<struct<w1,w2>> of adjacent token pairs via zip-shift — two
    slices of the already-split token array, no posexplode self-join
    (the repetition_stats precedent: 3.3x less CPU than explode+lead)."""
    return F.zip_with(
        F.slice(t, 1, F.size(t) - 1),
        F.slice(t, 2, F.size(t) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def fit_lm(
    df: DataFrame,
    k_smooth: float = 0.1,
    min_count: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Fit an add-k smoothed bigram LM; return it as a per-context model
    relation ready for single-join scoring (lm_score ``model=``).

    Schema: (w1 string, succ map<string,double>, lp_floor double).
      - w1 NOT NULL rows: ``succ`` maps each kept successor w2 to
        lp = ln((c(w1,w2)+k) / (c(w1.)+k*V)); ``lp_floor`` =
        ln(k / (c(w1.)+k*V)) is the smoothed mass for unseen or
        min_count-pruned successors of w1.
      - ONE sentinel row with w1 NULL: ``lp_floor`` = ln(1/V) = -ln(V),
        the floor for contexts absent from the training corpus entirely
        (c(w1.)=0). lm_score peels it off; it never joins (NULL keys
        don't match).

    Why maps-per-context instead of a flat (w1,w2,lp) relation: scoring
    then needs ONE equi-join on w1 (broadcastable) instead of a join on
    (w1,w2) followed by a second on w1 — the flat shape exchanges the
    full O(tokens) bigram stream twice; this shape exchanges it zero
    times when the model broadcasts. The model is vocab-rows /
    distinct-bigram-cells sized (Zipf: far below the stream), and
    ``min_count`` pruning shrinks ``succ`` without changing scores'
    plan — pruned pairs fall to lp_floor.

    Train cost: one map-side-combined count shuffle over the bigram
    stream (distinct bigrams per partition, not raw pairs), one
    model-sized regroup to per-w1 maps, one global distinct-count for V.
    c(w1.) sums over ALL of w1's bigrams BEFORE pruning — the true
    denominator.
    """
    rows, voc = _lm_model_rows(df, k_smooth, min_count, text_col)
    sentinel = voc.select(
        F.lit(None).cast("string").alias("w1"),
        F.lit(None).cast("map<string,double>").alias("succ"),
        (-F.log(F.col("v").cast("double"))).alias("lp_floor"),
    )
    return rows.unionByName(sentinel)


def _lm_model_rows(
    df: DataFrame, k_smooth: float, min_count: int, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """(model rows sans sentinel, one-row vocab-size relation)."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    k = float(k_smooth)
    if not (k > 0.0):
        raise ValueError(f"k_smooth must be > 0 (unseen bigrams need mass), got {k_smooth}")
    t = tokens(text_col)
    toks = df.select(t.alias("t")).filter(F.size("t") >= 2)
    pairs = toks.select(F.explode(_bigram_pairs(F.col("t"))).alias("p")).select("p.w1", "p.w2")
    bgc = pairs.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    entry = F.struct(F.col("w2"), F.col("cb"))
    if min_count > 1:
        # collect_list drops NULLs, so pruned successors simply vanish
        # from the map while still counting toward cw below
        entry = F.when(F.col("cb") >= min_count, entry)
    per_ctx = bgc.groupBy("w1").agg(
        F.sum("cb").alias("cw"),
        F.map_from_entries(F.collect_list(entry)).alias("cbm"),
    )
    voc = toks.select(F.explode("t").alias("w")).agg(F.count_distinct("w").alias("v"))
    kk = F.lit(k)
    denom = F.col("cw") + kk * F.col("v")
    rows = per_ctx.crossJoin(F.broadcast(voc)).select(
        "w1",
        F.transform_values("cbm", lambda _w2, cb: F.log((cb + kk) / denom)).alias("succ"),
        F.log(kk / denom).alias("lp_floor"),
    )
    return rows, voc


def lm_score(
    df: DataFrame,
    k_smooth: float = 0.1,
    min_count: int = 1,
    model: DataFrame | None = None,
    broadcast_model: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bigram language-model fluency scoring — the KenLM-style
    perplexity filter stage of a training-data pipeline (CCNet / Gopher
    / RefinedWeb all gate documents on LM log-probability; this is the
    n-gram analog).

    With ``model=None`` the LM is fit on ``df`` itself (fit_lm with
    ``k_smooth``/``min_count``); pass a fit_lm() relation to train once
    and score many corpora — the 100 TB shape, mirroring hash_score's
    ``weights=``. When ``model`` is given, ``k_smooth``/``min_count``
    are ignored (they are baked into the model's log-probs).

    A document's score is its mean lp over bigram instances (higher =
    more fluent under the corpus distribution); docs with < 2 tokens
    have no bigrams and are dropped, like repetition_stats. Per bigram:
    lp = succ[w2] if kept, else the context's smoothed lp_floor, else
    (context unseen in training) the model's global -ln(V) sentinel.

    Scale shape: scoring is ONE left equi-join of the bigram stream
    against the per-context model — broadcast by default
    (``broadcast_model=True``; post-pruning the model is Zipf-small),
    making scoring a zero-shuffle codegen map like hash_score. Set
    ``broadcast_model=False`` when a giant unpruned model exceeds
    executor memory and AQE picks the strategy from its runtime size.
    The final per-doc mean partial-aggregates map-side, so the only
    stream-sized exchange carries O(docs) partials, not O(bigrams).

    Returns (id, n_bigrams, avg_logp) — avg_logp rounded to 4 via rpos
    (F.log at fixed rounding hash-matches DuckDB's ln; the tfidf entry
    set the precedent).
    """
    if model is None:
        # self-scoring: every context in the stream is in the model by
        # construction, so the unseen-context sentinel can never fire —
        # skip it entirely. (Deriving it from the model DataFrame would
        # reference the model subtree twice with different column sets,
        # defeating ReuseExchange and re-counting the corpus.)
        mrel, _voc = _lm_model_rows(df, k_smooth, min_count, text_col)
        unseen = None
    else:
        # two references to `model` below — persist/write the fitted
        # relation (it is model-sized) or a lazy chain recomputes it
        mrel = model.where(F.col("w1").isNotNull()).select("w1", "succ", "lp_floor")
        # the unseen-context floor rides in as a one-row broadcast;
        # aggregate (not filter) so a sentinel-less model yields NULL,
        # never 0 rows
        unseen = model.agg(
            F.min(F.when(F.col("w1").isNull(), F.col("lp_floor"))).alias("lp_unseen")
        )
    if broadcast_model:
        mrel = F.broadcast(mrel)
    t = tokens(text_col)
    toks = df.select(F.col(id_col).alias("id"), t.alias("t")).filter(F.size("t") >= 2)
    pairs = toks.select(
        "id", F.explode(_bigram_pairs(F.col("t"))).alias("p")
    ).select("id", "p.w1", "p.w2")
    joined = pairs.join(mrel, "w1", "left")
    lp_fallbacks = [F.element_at("succ", F.col("w2")), F.col("lp_floor")]
    if unseen is not None:
        joined = joined.crossJoin(F.broadcast(unseen))
        lp_fallbacks.append(F.col("lp_unseen"))
    lp = F.coalesce(*lp_fallbacks)
    if unseen is not None:
        # a hand-built model missing the sentinel would leave lp NULL for
        # unseen contexts; F.avg would silently SKIP those bigrams while
        # n_bigrams counts them — an inflated score, not an error. Fail
        # loudly instead (assert_true returns NULL, so the when() is an
        # identity the optimizer cannot prune away from the result).
        lp = F.when(
            F.assert_true(
                lp.isNotNull(),
                F.lit("lm_score: model has no unseen-context sentinel row "
                      "(w1 NULL) — build it with fit_lm()"),
            ).isNull(),
            lp,
        )
    scored = joined.select("id", lp.alias("lp"))
    return scored.groupBy("id").agg(
        F.count("*").alias("n_bigrams"),
        rpos(F.avg("lp"), 4).alias("avg_logp"),
    ).select(
        F.col("id").alias(id_col),
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        "avg_logp",
    )


def lm_buckets(
    df: DataFrame,
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    k_smooth: float = 0.1,
    min_count: int = 1,
    model: DataFrame | None = None,
    broadcast_model: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    documents with the bigram LM, compute the corpus quantile cutoffs
    of avg_logp, and bucket each document — 0 = head (most fluent,
    highest log-prob), 1 = middle, 2 = tail. CCNet trains only on the
    head/middle of each language; this is the gate that follows
    lm_score in the pipeline.

    Returns (id, n_bigrams, avg_logp, bucket).

    Scale shape: one extra exact-interpolated percentile aggregation
    over the PER-DOCUMENT scores (F.percentile == DuckDB quantile_cont,
    the quantile_prices precedent) and a broadcast of the two cutoffs;
    bucketing is a codegen comparison. Because avg_logp is floor-rounded
    to the 1e-4 grid, the percentile's internal value map is bounded by
    the grid size (~1e5 distinct values over the useful ln range), not
    by document count — the aggregation stays executor-sized at 100 TB.
    Cutoffs are rounded to the same grid before comparing, so grid-
    valued scores never straddle an unrounded cutoff differently across
    engines. Bucket boundaries use strict '>': a doc exactly AT a
    cutoff falls into the lower bucket in both engines.
    """
    lo, hi = cuts
    if not (0.0 < lo < hi < 1.0):
        raise ValueError(f"cuts must satisfy 0 < lo < hi < 1, got {cuts}")
    # persisted: the scored frame feeds BOTH the cutoff aggregation and
    # the final comparison — without the cache the second reference
    # re-runs the whole LM pipeline over the corpus (column pruning
    # makes the two subtrees non-identical, so ReuseExchange cannot
    # help). The cache is per-DOCUMENT sized (id, n_bigrams, avg_logp),
    # not corpus-sized.
    scored = lm_score(
        df, k_smooth=k_smooth, min_count=min_count, model=model,
        broadcast_model=broadcast_model, text_col=text_col, id_col=id_col,
    ).persist()
    cut = scored.agg(
        rpos(F.percentile("avg_logp", F.lit(lo)), 4).alias("c_lo"),
        rpos(F.percentile("avg_logp", F.lit(hi)), 4).alias("c_hi"),
    )
    return (
        scored.crossJoin(F.broadcast(cut))
        .select(
            id_col,
            "n_bigrams",
            "avg_logp",
            F.when(F.col("avg_logp") > F.col("c_hi"), 0)
            .when(F.col("avg_logp") > F.col("c_lo"), 1)
            .otherwise(2)
            .cast("int")
            .alias("bucket"),
        )
    )
