"""BM25 sparse lexical retrieval (Okapi BM25; Robertson & Zaragoza 2009).

The lexical complement of the dense ANN tier: retrieval-based dedup and
curation stacks (e.g. benchmark-similarity mining, query-based corpus
auditing) rank documents for a query set by term-frequency/inverse-
document-frequency evidence rather than embedding cosine. The scoring
function per (query q, document d):

    score(q, d) = Σ_{t ∈ q}  idf(t) · tf(t,d)·(k1+1)
                             ───────────────────────────────
                             tf(t,d) + k1·(1 − b + b·|d|/avgdl)

with the Lucene/ATIRE idf variant idf(t) = ln(1 + (N − df + 0.5)/(df +
0.5)) — always positive, so adding a matching term never lowers a score.

Spark shape — an inverted-index probe expressed relationally, all
JVM-side (zero Python, zero UDF):

- ONE corpus scan total (round 12): the corpus tokenizes once, global
  stats (N, Σ|d|) ride that same scan as ``observe()`` metrics, and the
  vocabulary-restricted tf relation is eagerly localCheckpoint-ed so
  its two consumers (the df(term) count and the score join) reuse the
  materialized postings instead of re-tokenizing the corpus. The
  cached relation is the AGGREGATED matched postings — four numeric
  columns, no text — far smaller than the corpus bytes it replaces.
- query handling is TWO-PATH (the ANN tier's bounded-collect design):
  a ``limit(max_inline_queries+1)`` probe decides the branch. Small
  query sets collect their (query, term) relation driver-side — the
  vocabulary restriction becomes a literal IN-set filter (no join on
  the corpus side at all) and the score join broadcasts a local
  relation. Larger sets keep (query, term) executor-side (one tokenize
  pass, lazily localCheckpoint-ed so the vocabulary projection and the
  score join share it) with join strategies left to Catalyst/AQE — no
  query-sized driver collect anywhere.
- document frequencies come from the restricted tf relation (only
  query terms need df) — a Zipf-small (term, df) frame.
- final score = groupBy(query, doc) sum + a per-query top-k window
  (:func:`bm25_topk`) or a pure relevance-floor filter with NO window
  (:func:`bm25_filter` — the corpus-audit sweep shape at 100 TB).

Every arithmetic step is expressible in ANSI SQL, so the DuckDB twin
replays the formula exactly (scores grid-rounded at 4 dp on both sides
— the text_lm_score summed-ln precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from sgdnet_spark.operators import text

N_TERM_BUCKETS = 64
# the small-query branch inlines the query vocabulary as a literal
# IN-set; max_inline_queries bounds query COUNT, so a handful of
# document-length "more-like-this" queries could still inline tens of
# thousands of literals into the plan (driver plan bloat, slow
# analysis). Beyond this many DISTINCT TERMS the small branch reroutes
# to the distributed path even when the query count is tiny.
MAX_INLINE_TERMS = 4096


def _check_params(k1: float, b: float) -> None:
    if k1 <= 0 or not 0.0 <= b <= 1.0:
        raise ValueError(f"need k1 > 0 and 0 <= b <= 1, got k1={k1}, b={b}")


def _q_terms(queries: DataFrame, q_text_col: str, q_id_col: str) -> DataFrame:
    """(query_id, term) — distinct per query (classic BM25 ignores
    query-side term multiplicity)."""
    return (
        queries.select(
            F.col(q_id_col).alias("query_id"),
            F.explode(text.tokens(q_text_col)).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )


def _with_score(
    tf: DataFrame,
    dft: DataFrame,
    q_terms_rel: DataFrame,
    n_docs: float,
    avgdl: float,
    k1: float,
    b: float,
    hint_broadcast: bool,
) -> DataFrame:
    """(query_id, doc_id, score) from the matched-postings relation.
    Global stats enter as LITERALS (they are known driver-side in every
    path — observed metrics or the stored index stats), so no scalar
    cross join is needed. ``hint_broadcast`` marks the small-query
    branch; without it Catalyst/AQE picks the join strategies (a
    corpus-scale query relation must not be forced onto every
    executor)."""
    bcast = F.broadcast if hint_broadcast else (lambda x: x)
    return (
        tf.join(bcast(dft), "term")
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("dft") + 0.5) / (F.col("dft") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))),
        )
        .join(bcast(q_terms_rel), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
    )


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "doc_id", text.rpos(F.col("score"), 4).alias("score"), "rn")
    )


def _floor(scored: DataFrame, threshold: float) -> DataFrame:
    """Relevance-floor mode: a pure filter on the RAW score — no
    per-query window, no rank. The 100 TB corpus-audit shape (every
    doc scoring ≥ threshold for any query), where a global per-query
    regroup would be the bottleneck."""
    return scored.filter(F.col("score") >= float(threshold)).select(
        "query_id", "doc_id", text.rpos(F.col("score"), 4).alias("score")
    )


def _empty_result(spark, qid_type: str, did_type: str, with_rn: bool) -> DataFrame:
    cols = f"query_id {qid_type}, doc_id {did_type}, score double"
    if with_rn:
        cols += ", rn int"
    return spark.createDataFrame([], cols)


def _scored_inmemory(
    df: DataFrame,
    queries: DataFrame,
    k1: float,
    b: float,
    text_col: str,
    id_col: str,
    q_text_col: str,
    q_id_col: str,
    max_inline_queries: int,
) -> DataFrame | None:
    """The shared scoring pipeline over an in-memory corpus; returns
    None when the query vocabulary (or the corpus) is empty — the
    callers emit a typed empty frame. ONE corpus scan: stats are
    observe() metrics on the tokenize pass that feeds the tf
    aggregation, and tf is eagerly localCheckpoint-ed for its two
    consumers."""
    spark = df.sparkSession
    # ONE bounded job over the query source decides the branch AND
    # (small sets) feeds the driver-side term relation — tokenization
    # re-runs the SAME SQL expression over the collected rows as a
    # LocalRelation job, so term semantics cannot drift between paths
    q_raw = queries.select(q_id_col, q_text_col).limit(max_inline_queries + 1).collect()
    large = len(q_raw) > max_inline_queries
    qt_rows: list = []
    if not large:
        local_q = spark.createDataFrame(
            q_raw, queries.select(q_id_col, q_text_col).schema
        )
        qt_rows = [
            (r["query_id"], r["term"])
            for r in _q_terms(local_q, q_text_col, q_id_col).collect()
        ]
        if not qt_rows:
            return None
        # few queries but a huge combined vocabulary (document-length
        # more-like-this queries): inlining would bloat the plan with
        # thousands of literals — reroute to the distributed branch
        large = len({t for _, t in qt_rows}) > MAX_INLINE_TERMS
    if large:
        q_terms = _q_terms(queries, q_text_col, q_id_col)
        # emptiness guard, first-row-short-circuit cheap: an empty
        # build side under AQE would prune the corpus subtree INCLUDING
        # the observe node, and the metrics row would never materialize
        if not qt_rows and q_terms.limit(1).count() == 0:
            return None
        q_rel = q_terms.localCheckpoint(eager=False)
        vocab = q_rel.select("term").distinct()
        vocab_join = lambda t: t.join(vocab, "term")  # noqa: E731 — AQE picks
    else:
        qid_t = queries.schema[q_id_col].dataType.simpleString()
        q_rel = spark.createDataFrame(qt_rows, f"query_id {qid_t}, term string")
        terms = sorted({t for _, t in qt_rows})
        # literal IN-set restriction: no join on the corpus side at all
        vocab_join = lambda t: t.filter(F.col("term").isin(terms))  # noqa: E731

    obs = Observation()
    doc_base = df.select(
        F.col(id_col).alias("doc_id"), text.tokens(text_col).alias("t")
    ).observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("t")).alias("sum_dl"),
        F.count(F.size("t")).alias("n_dl"),
    )
    toks = doc_base.select(
        "doc_id", F.size("t").cast("double").alias("dl"), F.explode("t").alias("term")
    )
    tf = (
        vocab_join(toks)
        .groupBy("doc_id", "term", "dl")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    # eager: THE one corpus scan happens here; obs is filled by the same
    # job, and both downstream consumers (dft, score join) read the
    # checkpointed matched postings
    tf = tf.localCheckpoint(eager=True)
    try:
        st = obs.get
    except Exception:
        # when the optimizer can PROVE emptiness (LocalRelation corpus
        # + no vocabulary hit, or an empty corpus), empty-relation
        # propagation prunes the CollectMetrics node and the metrics
        # row never materializes — obs.get surfaces that as a
        # schema-less-row error. Pruning only fires on provably-empty
        # subtrees, so verify and emit the empty result; anything else
        # is a real failure
        if tf.isEmpty():
            return None
        raise
    if not st or not st.get("n_dl"):
        return None  # no tokenizable docs -> no postings -> empty
    # N counts every doc (BM25's idf denominator is corpus-wide);
    # avgdl averages over docs that HAVE a token list — a NULL text row
    # has no length, exactly what F.avg(size(tokens)) used to skip
    n_docs = float(st["n_docs"])
    avgdl = float(st["sum_dl"]) / float(st["n_dl"])
    dft = tf.groupBy("term").agg(F.count("*").cast("double").alias("dft"))
    return _with_score(tf, dft, q_rel, n_docs, avgdl, k1, b, hint_broadcast=not large)


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    q_text_col: str = "q_text",
    q_id_col: str = "query_id",
    max_inline_queries: int = 64,
) -> DataFrame:
    """Per-query BM25 top-k: (query_id, doc_id, score, rn).

    ``queries`` is a (query_id, q_text) relation. Ties break by doc_id
    ascending. Scores are grid-rounded to 4 dp (ranking happens on the
    unrounded value). Query handling is two-path — beyond
    ``max_inline_queries`` nothing query-sized touches the driver.
    """
    _check_params(k1, b)
    scored = _scored_inmemory(
        df, queries, k1, b, text_col, id_col, q_text_col, q_id_col, max_inline_queries
    )
    if scored is None:
        return _empty_result(
            df.sparkSession,
            queries.schema[q_id_col].dataType.simpleString(),
            df.schema[id_col].dataType.simpleString(),
            with_rn=True,
        )
    return _topk(scored, k)


def bm25_filter(
    df: DataFrame,
    queries: DataFrame,
    threshold: float,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    q_text_col: str = "q_text",
    q_id_col: str = "query_id",
    max_inline_queries: int = 64,
) -> DataFrame:
    """Relevance-floor BM25: every (query_id, doc_id, score) with RAW
    score ≥ ``threshold`` — a pure filter, NO per-query window (plan-
    asserted in tests). The corpus-audit sweep shape: at 100 TB a
    per-query top-k regroup is the bottleneck when the consumer only
    needs "everything above the floor". Equivalent to
    ``bm25_topk(k=∞).filter(score ≥ threshold)`` minus the rank column
    (asserted in tests)."""
    _check_params(k1, b)
    scored = _scored_inmemory(
        df, queries, k1, b, text_col, id_col, q_text_col, q_id_col, max_inline_queries
    )
    if scored is None:
        return _empty_result(
            df.sparkSession,
            queries.schema[q_id_col].dataType.simpleString(),
            df.schema[id_col].dataType.simpleString(),
            with_rn=False,
        )
    return _floor(scored, threshold)


def write_bm25_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_TERM_BUCKETS,
    meta_cols: list[str] | None = None,
    positions: bool = False,
) -> None:
    """Materialize the inverted index: ``path/postings/bucket=<b>/``
    holds (term, doc_id, dl, tf) partitioned by a stable term-hash
    bucket, ``path/stats`` the 1-row (n_docs, sum_dl, n_dl, n_buckets)
    relation. A probe maps its query terms to buckets and
    partition-prunes the postings scan to those directories — the
    write_pq_index list-pruning design applied to the lexical tier
    (PartitionFilters plan-asserted in tests). df(term) is derived
    from the pruned postings at probe time and is EXACT despite the
    pruning: a term's posting list lives entirely inside its own hash
    bucket, so pruning to the query terms' buckets keeps every posting
    of every query term — the index needs no separate df relation kept
    in sync across appends.

    Build cost: ONE corpus tokenize/explode pass + the (doc, term)
    count shuffle — the same work one query batch pays, paid once.
    Stats are stored as RAW SUMS so :func:`append_bm25_index` can fold
    a new batch in without rescanning the corpus; avgdl is derived at
    probe time as sum_dl/n_dl, where n_dl counts only docs WITH a token
    list — the same rows ``F.avg(size(tokens))`` aggregates in the
    in-memory path, so indexed and in-memory scores agree on corpora
    with NULL-text rows (n_docs = COUNT(*) keeps counting every doc:
    BM25's idf denominator is corpus-wide).

    ``meta_cols`` write attribute columns into the postings rows (the
    write_pq_index design) so probes can push a ``where=`` predicate
    into the pruned parquet scan — metadata-FILTERED lexical retrieval
    (e.g. ``lang = 'en'``). Meta rides the doc's rows in-row through
    the one build pass: zero extra shuffle. Meta columns MUST be
    functionally dependent on ``id_col`` (one meta tuple per doc) —
    validated at write time with a doc-level distinct, raising rather
    than silently splitting posting rows and inflating df(term).

    ``path/docs`` (round 13) is the doc-level catalog — one (doc_id,
    dl) row per indexed document, dl NULL for NULL-text rows. It is
    what makes :func:`delete_from_bm25_index` EXACT: the corpus-wide
    stats after a delete recompute from the surviving catalog rows, so
    a deleted index scores identically to one rebuilt without those
    rows (docs with no postings — NULL or empty text — are invisible
    in the postings relation but still carry n_docs/n_dl weight; only
    the catalog knows them). The stored stats aggregate FROM the
    catalog, so the two can never disagree.

    ``positions=True`` (round 13) writes POSITIONAL postings — each
    (doc, term) row carries its sorted occurrence offsets — enabling
    :func:`phrase_match_indexed` (exact-phrase contamination audits,
    the GPT-3 appendix-C scrub at phrase granularity). BM25 scoring is
    unchanged (tf is still the count); the postings rows grow by the
    offsets array, the price of phrase queries."""
    from sgdnet_spark.operators.maintenance import drop_dir

    # a REBUILD over a previously-deleted-from index must not inherit
    # its tombstones: they would silently mask re-indexed docs from
    # every probe and exclude them from the freshly derived stats
    drop_dir(df.sparkSession, f"{path}/tombstones")
    _write_postings(df, path, text_col, id_col, n_buckets, mode="overwrite",
                    meta_cols=meta_cols, positions=positions)
    docs = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(text.tokens(text_col)).cast("double").alias("dl"),
    )
    docs.write.mode("overwrite").parquet(f"{path}/docs")
    _write_stats_from_docs(df.sparkSession, path, n_buckets)


def _write_stats_from_docs(spark, path: str, n_buckets: int, minus=None) -> None:
    """(Re)derive the corpus-wide stats from the doc catalog minus any
    tombstones — the single source of truth, so build/append/delete all
    agree bit-for-bit with a from-scratch build over the same surviving
    docs (count/sum of integer-valued doubles: exact). ``minus``
    additionally excludes an explicit (doc_id) relation — the
    about-to-be-tombstoned set when a delete derives its stats BEFORE
    the tombstones land (crash-heal ordering)."""
    live = _live_docs(spark, path)
    if minus is not None:
        live = live.join(F.broadcast(minus), "doc_id", "left_anti")
    stats = (
        live
        .select(
            F.count("*").cast("double").alias("n_docs"),
            # coalesce: an all-deleted catalog sums dl over zero rows
            # (NULL) — stats must stay readable, probes answer empty
            F.coalesce(F.sum("dl"), F.lit(0.0)).cast("double").alias("sum_dl"),
            F.count("dl").cast("double").alias("n_dl"),
            F.lit(n_buckets).cast("bigint").alias("n_buckets"),
        )
    )
    stats.coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")


def _dir_exists(spark, path: str) -> bool:
    from sgdnet_spark.operators.maintenance import dir_exists

    return dir_exists(spark, path)


def _live_docs(spark, path: str) -> DataFrame:
    """The doc catalog with tombstoned rows masked out."""
    docs = spark.read.parquet(f"{path}/docs")
    tomb = _read_tombstones(spark, path)
    if tomb is not None:
        docs = docs.join(F.broadcast(tomb), "doc_id", "left_anti")
    return docs


def _read_tombstones(spark, path: str) -> DataFrame | None:
    """(doc_id) pending-deletes relation or None — the shared
    maintenance.read_tombstones on this tier's id column."""
    from sgdnet_spark.operators.maintenance import read_tombstones

    return read_tombstones(spark, path, "doc_id")


def _ids_frame(spark, ids, dtype: str) -> DataFrame:
    """Normalize a deletion id set (python list or single-column
    DataFrame) to a distinct (doc_id <dtype>) relation."""
    if isinstance(ids, DataFrame):
        return ids.select(
            F.col(ids.columns[0]).cast(dtype).alias("doc_id")
        ).distinct()
    return spark.createDataFrame(
        [(i,) for i in ids], f"doc_id {dtype}"
    ).distinct()


def delete_from_bm25_index(spark, path: str, ids) -> int:
    """Delete documents from a written BM25 index WITHOUT rebuilding —
    takedown support for the curation pipeline (the one operation a
    write/append/compact index tier was missing). ``ids`` is a python
    list or a single-column DataFrame of doc ids.

    Tombstone design: deleted ids append to ``path/tombstones``; every
    probe anti-joins them out of the pruned postings BEFORE df(term)
    is counted, and the corpus-wide stats recompute from the doc
    catalog minus tombstones — so a deleted index scores IDENTICALLY
    (bit-for-bit) to one rebuilt without those rows (asserted in
    tests). Deletes are idempotent (already-deleted and never-indexed
    ids are no-ops) and physical space is reclaimed by
    :func:`compact_bm25_index`, which drops tombstoned rows during its
    rewrite and clears the tombstone set.

    Crash ordering (round-13 review fix): the stats rewrite lands
    FIRST — derived from the catalog minus the explicit matched set —
    and the tombstones append second. Every crash point then heals by
    RE-RUNNING the same delete: a crash inside or just after the stats
    rewrite leaves the matched ids un-tombstoned, so the re-run still
    sees them as new, rewrites the stats, and appends the tombstones
    (the reverse order could strand broken stats behind the
    ``n == 0`` idempotency short-circuit forever). Between the two
    writes the matched docs are still probe-visible while the stats
    already exclude them — a bounded score perturbation, the append
    contract's mirror image. Streaming servers pick up the masked docs
    on their next probe (tombstones are read per probe) but serve the
    pre-delete stats until ``refresh()`` — the same staleness contract
    as append. Returns the number of newly deleted documents.

    ``ids`` may also be a SQL string / Column predicate over the
    index's meta columns (e.g. ``"lang = 'ru'"``): the matching doc
    ids are derived from one pass over the stored postings — policy
    takedowns ("delete everything from source X") without the caller
    materializing an id list.

    Requires an index with the round-13 doc catalog (``path/docs``);
    older indexes must be rebuilt once with :func:`write_bm25_index`
    to enable deletion."""
    from pyspark.sql import Column

    if isinstance(ids, (str, Column)):
        ids = (
            spark.read.parquet(f"{path}/postings")
            .filter(ids)
            .select("doc_id")
            .distinct()
        )
    if not _dir_exists(spark, f"{path}/docs"):
        raise ValueError(
            f"delete_from_bm25_index: index at {path} predates the doc "
            "catalog (round 13); rebuild it with write_bm25_index to "
            "enable deletion"
        )
    docs = spark.read.parquet(f"{path}/docs")
    dtype = docs.schema["doc_id"].dataType.simpleString()
    want = _ids_frame(spark, ids, dtype)
    tomb = _read_tombstones(spark, path)
    if tomb is not None:
        want = want.join(F.broadcast(tomb), "doc_id", "left_anti")
    # only ids actually present in the catalog become tombstones —
    # keeps the tombstone set bounded by real deletions (idempotent:
    # re-deleting or deleting unknown ids adds nothing)
    matched = docs.join(F.broadcast(want), "doc_id").select("doc_id").distinct()
    matched = matched.localCheckpoint(eager=True)
    n = matched.count()
    if n == 0:
        return 0
    _, _, _, n_buckets = _read_stats(spark, path)
    # stats FIRST (catalog minus the explicit matched set), tombstones
    # second — see the crash-ordering note in the docstring
    _write_stats_from_docs(spark, path, n_buckets, minus=matched)
    matched.write.mode("append").parquet(f"{path}/tombstones")
    return n


def _write_postings(
    df: DataFrame,
    path: str,
    text_col: str,
    id_col: str,
    n_buckets: int,
    mode: str,
    meta_cols: list[str] | None = None,
    positions: bool = False,
) -> None:
    meta = list(meta_cols or [])
    if meta:
        # the postings groupBy below RELIES on meta being functionally
        # dependent on doc_id (one meta tuple per doc) — a meta column
        # that varies within a doc would silently split (doc_id, term)
        # rows, inflating df(term) and fragmenting tf. Validate the
        # contract at write time: one doc-level distinct, far smaller
        # than the postings explode the write pays anyway.
        dup = (
            df.select(F.col(id_col).alias("doc_id"), *meta)
            .distinct()
            .groupBy("doc_id")
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"write_bm25_index: meta columns {meta} must be functionally "
                f"dependent on {id_col} (one meta tuple per doc); doc_id "
                f"{dup[0]['doc_id']!r} carries more than one"
            )
    base = df.select(
        F.col(id_col).alias("doc_id"), text.tokens(text_col).alias("t"), *meta
    )
    if positions:
        # positional postings (round 13): each (doc, term) row carries
        # the sorted token offsets of its occurrences — what
        # :func:`phrase_match_indexed` intersects. Offsets are RAW
        # token-array indexes (pre-empty-filter), matching the
        # in-memory posexplode and the DuckDB twin's enumeration.
        exploded = base.select(
            "doc_id", F.size("t").cast("double").alias("dl"),
            F.posexplode("t").alias("pos", "term"), *meta,
        )
        agg = [
            F.count("*").cast("double").alias("tf"),
            F.sort_array(F.collect_list(F.col("pos").cast("bigint"))).alias("pos"),
        ]
    else:
        exploded = base.select(
            "doc_id", F.size("t").cast("double").alias("dl"),
            F.explode("t").alias("term"), *meta,
        )
        agg = [F.count("*").cast("double").alias("tf")]
    postings = (
        exploded.filter(F.col("term") != "")
        # meta is functionally dependent on doc_id (validated above) —
        # grouping by it adds no groups, just carries the columns
        # through the one shuffle
        .groupBy("doc_id", "term", "dl", *meta)
        .agg(*agg)
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
    )
    postings.write.mode(mode).partitionBy("bucket").parquet(f"{path}/postings")


def _read_stats(spark, path: str):
    """(n_docs, sum_dl, n_dl, n_buckets) floats from the stored stats;
    indexes written before round 12 lack n_dl — fall back to n_docs
    (their original avgdl denominator) so old indexes keep serving."""
    row = spark.read.parquet(f"{path}/stats").collect()[0]
    n_dl = float(row["n_dl"]) if "n_dl" in row.__fields__ else float(row["n_docs"])
    return float(row["n_docs"]), float(row["sum_dl"]), n_dl, int(row["n_buckets"])


def append_bm25_index(
    spark,
    path: str,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Incrementally add documents to a written BM25 index — the
    append_pq_index daily-ingest shape on the lexical tier: the batch's
    postings append into the existing bucket partitions (bucket count
    read from the stored stats, so batches can never fragment the
    layout), and the corpus-wide (n_docs, sum_dl, n_dl) sums fold the
    batch in WITHOUT rescanning the corpus. Postings append BEFORE the
    stats rewrite: a failure in between leaves slightly-stale global
    stats — a bounded score perturbation every BM25 serving stack
    tolerates — never missing postings (the vectors-before-codes
    ordering rationale). df(term) is recounted per probe, so it needs
    no maintenance at all. Appends accumulate one parquet file per
    batch per touched bucket; :func:`compact_bm25_index` rewrites the
    layout when the file count degrades the probe scan. The index's
    meta columns are INFERRED from the stored postings schema (the
    append_pq_index rule): an append missing them would write rows
    that silently vanish from every ``where=``-filtered probe."""
    n_docs0, sum_dl0, n_dl0, n_buckets = _read_stats(spark, path)
    p_schema = spark.read.parquet(f"{path}/postings").schema
    positional = "pos" in p_schema.fieldNames()
    meta = [
        f.name
        for f in p_schema.fields
        if f.name not in ("doc_id", "term", "dl", "tf", "bucket", "pos")
    ]
    missing = [c for c in meta if c not in df.columns]
    if missing:
        raise ValueError(
            f"append_bm25_index: index at {path} carries meta columns {meta}; "
            f"batch is missing {missing}"
        )
    has_catalog = _dir_exists(spark, f"{path}/docs")
    tomb = _read_tombstones(spark, path) if has_catalog else None
    if tomb is not None:
        # re-adding a tombstoned id would RESURRECT its old postings
        # alongside the new ones (the mask is id-level, not row-level)
        # — and compaction would then physically drop both. Refuse;
        # compact first to clear the tombstones, then append.
        clash = (
            df.select(F.col(id_col).alias("doc_id"))
            .join(F.broadcast(tomb), "doc_id")
            .limit(1)
            .collect()
        )
        if clash:
            raise ValueError(
                f"append_bm25_index: batch re-adds deleted doc_id "
                f"{clash[0]['doc_id']!r}; run compact_bm25_index first to "
                "clear tombstones, then append"
            )
    _write_postings(df, path, text_col, id_col, n_buckets, mode="append",
                    meta_cols=meta, positions=positional)
    if has_catalog:
        df.select(
            F.col(id_col).alias("doc_id"),
            F.size(text.tokens(text_col)).cast("double").alias("dl"),
        ).write.mode("append").parquet(f"{path}/docs")
        _write_stats_from_docs(spark, path, n_buckets)
        return
    # pre-round-13 index (no doc catalog): fold the batch sums in
    batch = df.select(
        F.count("*").cast("double").alias("n_docs"),
        F.sum(F.size(text.tokens(text_col))).cast("double").alias("sum_dl"),
        F.count(F.size(text.tokens(text_col))).cast("double").alias("n_dl"),
    ).collect()[0]
    stats = spark.createDataFrame(
        [
            (
                n_docs0 + float(batch["n_docs"]),
                sum_dl0 + float(batch["sum_dl"] or 0.0),
                n_dl0 + float(batch["n_dl"]),
                n_buckets,
            )
        ],
        "n_docs double, sum_dl double, n_dl double, n_buckets bigint",
    )
    stats.coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")


def compact_bm25_index(spark, path: str) -> int:
    """Rewrite the postings layout so each bucket partition holds ONE
    file again (daily appends accumulate a file per batch per bucket;
    at ingest cadence the probe scan's file-listing and tiny-file
    overhead degrade), physically dropping any tombstoned rows — the
    anti-join folds into the rewrite's one shuffle, so deletion
    reclamation is FREE at compaction cadence. Stats are untouched
    (they were re-derived from the surviving catalog at delete time)
    and probe results are bit-identical — compaction changes file
    layout, never values (asserted in tests). Returns the postings
    parquet file count before compaction.

    Crash ordering: postings rewrite, then doc catalog rewrite, then
    the tombstone clear LAST — every prefix leaves probes correct
    (dropping already-masked rows, or masking already-dropped ids, are
    both no-ops), and re-running finishes the job. Swap semantics +
    recovery: see
    :func:`sgdnet_spark.operators.maintenance.compact_partitioned`."""
    from sgdnet_spark.operators.maintenance import compact_partitioned, drop_dir

    tomb = _read_tombstones(spark, path)
    drop = (
        None
        if tomb is None
        else (lambda rel: rel.join(F.broadcast(tomb), "doc_id", "left_anti"))
    )
    before = compact_partitioned(spark, f"{path}/postings", "bucket", transform=drop)
    if _dir_exists(spark, f"{path}/docs"):
        # the doc catalog accumulates a file per append too — compact
        # it to one file every run (tombstoned rows dropped with it)
        compact_partitioned(spark, f"{path}/docs", None, transform=drop)
    if tomb is not None:
        drop_dir(spark, f"{path}/tombstones")
    return before


def bm25_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    q_text_col: str = "q_text",
    q_id_col: str = "query_id",
    max_inline_queries: int = 64,
    where=None,
    stats: tuple[float, float, float, int] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Probe a written BM25 index; returns (result, pruned_postings).

    The touched-bucket set is collected to drive partition pruning —
    bounded by n_buckets regardless of query count (the pq probed-list
    collect's analog); df(term) counts over the pruned relation, and
    scoring/top-k mirror :func:`bm25_topk`. Query handling is two-path
    (round 12): beyond ``max_inline_queries`` the (query, term)
    relation stays executor-side — one tokenize pass, lazily
    localCheckpoint-ed for its consumers — and join strategies are left
    to Catalyst/AQE; results equal the collected path bit-for-bit
    (asserted in tests). Results equal the in-memory path on the same
    corpus (asserted in tests).

    ``where`` (a SQL string or Column over the index's ``meta_cols``,
    e.g. ``"lang = 'en'"``) is metadata-FILTERED retrieval with the
    Lucene filtered-query semantics: the predicate restricts the
    CANDIDATE postings (pushed into the pruned parquet scan,
    PushedFilters plan-asserted in tests) while the scoring statistics
    — N, avgdl, df(term) — stay corpus-wide, so a document's score is
    identical filtered or not and the filtered top-k equals the
    unfiltered ranking with non-matching docs removed (asserted in
    tests)."""
    _check_params(k1, b)
    scored, postings = _scored_indexed(
        spark, path, queries, k1, b, q_text_col, q_id_col, max_inline_queries,
        where, stats,
    )
    if scored is None:
        return (
            _empty_result(
                spark,
                queries.schema[q_id_col].dataType.simpleString(),
                _postings_doc_id_type(spark, path),
                with_rn=True,
            ),
            spark.read.parquet(f"{path}/postings").limit(0),
        )
    return _topk(scored, k), postings


def bm25_filter_indexed(
    spark,
    path: str,
    queries: DataFrame,
    threshold: float,
    k1: float = 1.2,
    b: float = 0.75,
    q_text_col: str = "q_text",
    q_id_col: str = "query_id",
    max_inline_queries: int = 64,
    where=None,
    stats: tuple[float, float, float, int] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Relevance-floor probe of a written index: every doc with RAW
    score ≥ ``threshold`` per query — a pure filter over the pruned
    postings scan, no per-query window (see :func:`bm25_filter`).
    ``where`` filters candidates on the index's meta columns with
    corpus-wide scoring stats (see :func:`bm25_topk_indexed`)."""
    _check_params(k1, b)
    scored, postings = _scored_indexed(
        spark, path, queries, k1, b, q_text_col, q_id_col, max_inline_queries,
        where, stats,
    )
    if scored is None:
        return (
            _empty_result(
                spark,
                queries.schema[q_id_col].dataType.simpleString(),
                _postings_doc_id_type(spark, path),
                with_rn=False,
            ),
            spark.read.parquet(f"{path}/postings").limit(0),
        )
    return _floor(scored, threshold), postings


def _postings_doc_id_type(spark, path: str) -> str:
    sch = spark.read.parquet(f"{path}/postings").schema
    return sch["doc_id"].dataType.simpleString()


def _scored_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k1: float,
    b: float,
    q_text_col: str,
    q_id_col: str,
    max_inline_queries: int,
    where=None,
    stats: tuple[float, float, float, int] | None = None,
) -> tuple[DataFrame | None, DataFrame | None]:
    """Shared indexed scoring pipeline; (None, None) when the query
    vocabulary is empty. ``where`` restricts the candidate postings
    AFTER df(term) is counted, so scoring statistics stay corpus-wide
    (the Lucene filtered-query convention) and the predicate pushes
    into the candidate branch's parquet scan. ``stats`` passes a
    preloaded (n_docs, sum_dl, n_dl, n_buckets) tuple — the streaming
    server's load-once path (Bm25StreamServer) — skipping the per-probe
    stats read."""
    n_docs, sum_dl, n_dl, n_buckets = (
        stats if stats is not None else _read_stats(spark, path)
    )
    if n_dl <= 0:
        return None, None  # index over an untokenizable corpus
    avgdl = sum_dl / n_dl
    # ONE bounded job over the query source decides the branch AND
    # (small sets) feeds the driver-side term+bucket relation
    q_raw = queries.select(q_id_col, q_text_col).limit(max_inline_queries + 1).collect()
    large = len(q_raw) > max_inline_queries
    qt: list = []
    if not large:
        local_q = spark.createDataFrame(
            q_raw, queries.select(q_id_col, q_text_col).schema
        )
        # one LocalRelation job yields terms AND their buckets (the
        # same xxhash64 the postings writer used — never replicated
        # driver-side); the query source is never rescanned
        qt = _q_terms(local_q, q_text_col, q_id_col).select(
            "query_id",
            "term",
            F.pmod(F.xxhash64("term"), F.lit(int(n_buckets))).alias("bk"),
        ).collect()
        if not qt:
            return None, None
        # few queries but a huge combined vocabulary: inlining the
        # IN-set would bloat the plan — keep the (query, term) relation
        # executor-side instead (bucket pruning still applies: the
        # collected rows already carry the bucket set)
        large = len({r["term"] for r in qt}) > MAX_INLINE_TERMS
    if large:
        q_rel = _q_terms(queries, q_text_col, q_id_col).localCheckpoint(eager=False)
        if qt:
            # term-count reroute: the bucket set is already driver-side
            buckets = sorted({r["bk"] for r in qt})
        else:
            # bounded by n_buckets regardless of query count
            buckets = sorted(
                {
                    r["bk"]
                    for r in q_rel.select(
                        F.pmod(F.xxhash64("term"), F.lit(int(n_buckets))).alias("bk")
                    )
                    .distinct()
                    .collect()
                }
            )
            if not buckets:
                return None, None
        vocab = q_rel.select("term").distinct()
        vocab_join = lambda t: t.join(vocab, "term")  # noqa: E731 — AQE picks
    else:
        qid_t = queries.schema[q_id_col].dataType.simpleString()
        q_rel = spark.createDataFrame(
            [(r["query_id"], r["term"]) for r in qt], f"query_id {qid_t}, term string"
        )
        terms = sorted({r["term"] for r in qt})
        buckets = sorted({r["bk"] for r in qt})
        # term IN-set pushes into the pruned parquet scan next to the
        # partition filter — posting lists of other same-bucket terms
        # are skipped at the source
        vocab_join = lambda t: t.filter(F.col("term").isin(terms))  # noqa: E731
    postings = spark.read.parquet(f"{path}/postings").filter(
        F.col("bucket").isin(*[int(x) for x in buckets])
    )
    # deletions mask out BEFORE df(term) is counted, so document
    # frequencies (and therefore idf) equal a rebuild without the
    # deleted rows; the stored stats were already re-derived from the
    # surviving doc catalog at delete time
    tomb = _read_tombstones(spark, path)
    if tomb is not None:
        postings = postings.join(F.broadcast(tomb), "doc_id", "left_anti")
    tf = vocab_join(postings)
    # df(term) BEFORE the meta filter: scoring stats are corpus-level,
    # the filter only restricts which docs may appear as candidates
    dft = tf.groupBy("term").agg(F.count("*").cast("double").alias("dft"))
    cand = tf.filter(where) if where is not None else tf
    scored = _with_score(
        cand, dft, q_rel, n_docs, avgdl, k1, b, hint_broadcast=not large
    )
    return scored, postings


# --- phrase queries over positional postings (round 13) -------------
#
# The exact-phrase contamination audit: GPT-3's appendix-C scrub drops
# training documents sharing 13-gram overlap with benchmarks; at phrase
# granularity the same question is "which documents contain THIS exact
# token sequence". Relational shape — the classic positional-index
# intersection expressed as one anchor aggregation, zero UDFs:
#
#   phrase terms   (query_id, off, term)     off = 0..k-1
#   doc positions  (doc_id, pos, term)       posexplode / stored offsets
#   join on term, anchor = pos - off: a phrase occurrence at anchor a
#   is exactly an anchor covering ALL k distinct offsets — one groupBy
#   counting distinct offsets per (query, doc, anchor), then per-doc
#   occurrence counts. Duplicate phrase terms ("the cat the") work
#   because cover is counted over OFFSETS, not terms.
#
# Every step is ANSI-expressible; the DuckDB twin replays token
# positions with the same enumeration (raw token-array indexes).


def _phrase_terms(phrases: DataFrame, q_text_col: str, q_id_col: str) -> DataFrame:
    """(query_id, off, term) — one row per phrase token, offset-kept
    (NOT distinct: position matching needs every occurrence)."""
    return (
        phrases.select(
            F.col(q_id_col).alias("query_id"),
            F.posexplode(text.tokens(q_text_col)).alias("off", "term"),
        )
        .filter(F.col("term") != "")
        .select("query_id", F.col("off").cast("bigint").alias("off"), "term")
    )


def _phrase_hits(
    dt: DataFrame, qt: DataFrame, bcast
) -> DataFrame:
    """(query_id, doc_id, n_occurrences) from (doc_id, pos, term)
    document positions and (query_id, off, term) phrase terms."""
    k_rel = qt.groupBy("query_id").agg(F.count_distinct("off").alias("k"))
    j = dt.join(bcast(qt), "term").filter(F.col("pos") >= F.col("off"))
    cov = (
        j.groupBy("query_id", "doc_id", (F.col("pos") - F.col("off")).alias("anchor"))
        .agg(F.count_distinct("off").alias("c"))
    )
    return (
        cov.join(bcast(k_rel), "query_id")
        .filter(F.col("c") == F.col("k"))
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").cast("bigint").alias("n_occurrences"))
    )


def _phrase_empty(spark, qid_type: str, did_type: str) -> DataFrame:
    return spark.createDataFrame(
        [], f"query_id {qid_type}, doc_id {did_type}, n_occurrences bigint"
    )


def phrase_match(
    df: DataFrame,
    phrases: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    q_text_col: str = "phrase",
    q_id_col: str = "query_id",
    max_inline_queries: int = 64,
    positions: DataFrame | None = None,
) -> DataFrame:
    """Exact-phrase scan over an in-memory corpus: (query_id, doc_id,
    n_occurrences) for every document containing each phrase as a
    CONSECUTIVE token sequence (the tokenizer's normalization applies
    to both sides). Query handling is the bm25 two-path design — small
    phrase sets restrict the corpus explode with a literal IN-set and
    broadcast the phrase relation; beyond ``max_inline_queries`` (or
    ``MAX_INLINE_TERMS`` combined vocabulary) everything stays
    executor-side.

    ``positions`` (optional) replaces the corpus tokenize+posexplode
    with a prebuilt (doc_id, pos bigint, term string) relation — the
    caller-shared one-corpus-pass pattern (a pipeline running phrase
    AND proximity scans tokenizes once and passes the union-vocabulary
    positions to both). It must cover at least every position of every
    phrase term; the per-call vocabulary restriction is still applied,
    so a superset relation returns identical results."""
    spark = df.sparkSession
    q_raw = phrases.select(q_id_col, q_text_col).limit(max_inline_queries + 1).collect()
    large = len(q_raw) > max_inline_queries
    qt_rows: list = []
    if not large:
        local_q = spark.createDataFrame(
            q_raw, phrases.select(q_id_col, q_text_col).schema
        )
        qt_rows = [
            (r["query_id"], r["off"], r["term"])
            for r in _phrase_terms(local_q, q_text_col, q_id_col).collect()
        ]
        if not qt_rows:
            return _phrase_empty(
                spark,
                phrases.schema[q_id_col].dataType.simpleString(),
                df.schema[id_col].dataType.simpleString(),
            )
        large = len({t for _, _, t in qt_rows}) > MAX_INLINE_TERMS
    if large:
        qt = _phrase_terms(phrases, q_text_col, q_id_col).localCheckpoint(eager=False)
        vocab = qt.select("term").distinct()
        vocab_join = lambda t: t.join(vocab, "term")  # noqa: E731 — AQE picks
        bcast = lambda x: x  # noqa: E731
    else:
        qid_t = phrases.schema[q_id_col].dataType.simpleString()
        qt = spark.createDataFrame(
            qt_rows, f"query_id {qid_t}, off bigint, term string"
        )
        terms = sorted({t for _, _, t in qt_rows})
        vocab_join = lambda t: t.filter(F.col("term").isin(terms))  # noqa: E731
        bcast = F.broadcast
    dt = positions if positions is not None else _corpus_positions(
        df, text_col, id_col
    )
    return _phrase_hits(vocab_join(dt), qt, bcast)


def _corpus_positions(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, pos bigint, term string) — every token position of the
    corpus: THE positional relation both match scans consume. Offsets
    are raw token-array indexes (pre-empty-filter), matching the
    positional index write and the DuckDB twins' enumeration."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(text.tokens(text_col)).alias("pos", "term"),
        )
        .filter(F.col("term") != "")
        .select("doc_id", F.col("pos").cast("bigint").alias("pos"), "term")
    )


def phrase_match_indexed(
    spark,
    path: str,
    phrases: DataFrame,
    q_text_col: str = "phrase",
    q_id_col: str = "query_id",
    max_inline_queries: int = 64,
    where=None,
    stats: tuple[float, float, float, int] | None = None,
) -> DataFrame:
    """Exact-phrase scan over a POSITIONAL index (``write_bm25_index(
    positions=True)``): the phrase vocabulary's term-hash buckets prune
    the postings scan exactly as BM25 probes do — at corpus scale the
    audit touches |phrase vocabulary| buckets of postings, never the
    text. Tombstoned (deleted) docs are masked; ``where`` filters
    candidates on the index's meta columns; ``stats`` passes the
    preloaded stats tuple (only n_buckets is used) — the stream
    server's load-once path. Results equal :func:`phrase_match` over
    the same corpus (asserted in tests)."""
    p_schema = spark.read.parquet(f"{path}/postings").schema
    if "pos" not in p_schema.fieldNames():
        raise ValueError(
            f"phrase_match_indexed: index at {path} was written without "
            "positions=True; rebuild with write_bm25_index(positions=True)"
        )
    _, _, _, n_buckets = stats if stats is not None else _read_stats(spark, path)
    q_raw = phrases.select(q_id_col, q_text_col).limit(max_inline_queries + 1).collect()
    large = len(q_raw) > max_inline_queries
    qt_rows: list = []
    if not large:
        local_q = spark.createDataFrame(
            q_raw, phrases.select(q_id_col, q_text_col).schema
        )
        qt_rows = [
            (r["query_id"], r["off"], r["term"], r["bk"])
            for r in _phrase_terms(local_q, q_text_col, q_id_col)
            .withColumn("bk", F.pmod(F.xxhash64("term"), F.lit(int(n_buckets))))
            .collect()
        ]
        if not qt_rows:
            return _phrase_empty(
                spark,
                phrases.schema[q_id_col].dataType.simpleString(),
                p_schema["doc_id"].dataType.simpleString(),
            )
        large = len({t for _, _, t, _ in qt_rows}) > MAX_INLINE_TERMS
    if large:
        qt = _phrase_terms(phrases, q_text_col, q_id_col).localCheckpoint(eager=False)
        if qt_rows:
            buckets = sorted({bk for _, _, _, bk in qt_rows})
        else:
            buckets = sorted(
                {
                    r["bk"]
                    for r in qt.select(
                        F.pmod(F.xxhash64("term"), F.lit(int(n_buckets))).alias("bk")
                    )
                    .distinct()
                    .collect()
                }
            )
            if not buckets:
                return _phrase_empty(
                    spark,
                    phrases.schema[q_id_col].dataType.simpleString(),
                    p_schema["doc_id"].dataType.simpleString(),
                )
        vocab = qt.select("term").distinct()
        vocab_join = lambda t: t.join(vocab, "term")  # noqa: E731 — AQE picks
        bcast = lambda x: x  # noqa: E731
    else:
        qid_t = phrases.schema[q_id_col].dataType.simpleString()
        qt = spark.createDataFrame(
            [(q, o, t) for q, o, t, _ in qt_rows],
            f"query_id {qid_t}, off bigint, term string",
        )
        terms = sorted({t for _, _, t, _ in qt_rows})
        buckets = sorted({bk for _, _, _, bk in qt_rows})
        vocab_join = lambda t: t.filter(F.col("term").isin(terms))  # noqa: E731
        bcast = F.broadcast
    postings = spark.read.parquet(f"{path}/postings").filter(
        F.col("bucket").isin(*[int(x) for x in buckets])
    )
    tomb = _read_tombstones(spark, path)
    if tomb is not None:
        postings = postings.join(F.broadcast(tomb), "doc_id", "left_anti")
    if where is not None:
        postings = postings.filter(where)
    dt = vocab_join(postings).select(
        "doc_id", "term", F.explode("pos").alias("pos")
    )
    return _phrase_hits(dt, qt, bcast)


def bm25_index_info(spark, path: str) -> dict:
    """Operational snapshot of a written BM25 index — the maintenance
    dashboard read: corpus stats, layout health (parquet file count —
    the compact-when-degraded signal), pending tombstones, and the
    capability flags (positional? doc catalog? meta columns?). One
    stats read + one schema read + a file listing + a tombstone count;
    never scans postings rows."""
    n_docs, sum_dl, n_dl, n_buckets = _read_stats(spark, path)
    schema = spark.read.parquet(f"{path}/postings").schema
    meta = [
        f.name
        for f in schema.fields
        if f.name not in ("doc_id", "term", "dl", "tf", "bucket", "pos")
    ]
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(f"{path}/postings")
    it = hpath.getFileSystem(conf).listFiles(hpath, True)
    n_files = 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            n_files += 1
    tomb = _read_tombstones(spark, path)
    return {
        "n_docs": n_docs,
        "avgdl": (sum_dl / n_dl) if n_dl else None,
        "n_buckets": n_buckets,
        "n_posting_files": n_files,
        "pending_tombstones": int(tomb.count()) if tomb is not None else 0,
        "positional": "pos" in schema.fieldNames(),
        "has_doc_catalog": _dir_exists(spark, f"{path}/docs"),
        "meta_cols": meta,
    }


# --- proximity (windowed co-occurrence) queries (round 13) ----------
#
# The unordered complement of phrase_match: "all of this query's terms
# within a W-token window", Lucene's sloppy-span shape — the
# contamination/citation audit for near-verbatim text that reorders or
# interleaves a few words (an exact-phrase scan misses it, a bag-of-
# words BM25 floor is too loose). Relational shape: restrict token
# positions to the query vocabulary, then one match-sized self-join
# per (query, doc) — every matched position anchors a window
# [pos, pos+W) and a hit is an anchor whose window covers ALL k
# distinct query terms. Work is quadratic only in each doc's MATCHED
# positions (query-vocabulary occurrences, not the doc length); a
# stopword-heavy query inflates that the same way it inflates any
# posting-list probe — curate the query terms, not the operator.


def _proximity_hits(dt: DataFrame, qt: DataFrame, window: int, bcast) -> DataFrame:
    """(query_id, doc_id, n_spans) from (doc_id, pos, term) positions
    and a DISTINCT (query_id, term) vocabulary."""
    k_rel = qt.groupBy("query_id").agg(F.count_distinct("term").alias("k"))
    m = dt.join(bcast(qt), "term").select("query_id", "doc_id", "pos", "term")
    a = m.select(
        F.col("query_id").alias("qa"), F.col("doc_id").alias("da"),
        F.col("pos").alias("apos"),
    )
    j = a.join(
        m,
        (a.qa == m.query_id) & (a.da == m.doc_id)
        & (m.pos >= a.apos) & (m.pos < a.apos + F.lit(int(window))),
    )
    cov = j.groupBy("qa", "da", "apos").agg(F.count_distinct("term").alias("c"))
    return (
        cov.join(bcast(k_rel), cov.qa == k_rel.query_id)
        .filter(F.col("c") == F.col("k"))
        .groupBy(F.col("qa").alias("query_id"), F.col("da").alias("doc_id"))
        .agg(F.count("*").cast("bigint").alias("n_spans"))
    )


def proximity_match(
    df: DataFrame,
    queries: DataFrame,
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    q_text_col: str = "q_text",
    q_id_col: str = "query_id",
    max_inline_queries: int = 64,
    positions: DataFrame | None = None,
) -> DataFrame:
    """Windowed co-occurrence scan: (query_id, doc_id, n_spans) where
    n_spans counts the anchor positions whose [pos, pos+window) span
    contains ALL of the query's distinct terms. Order and multiplicity
    inside the window are ignored (the unordered sloppy-span
    semantics). Two-path query handling as :func:`phrase_match`, and
    the same optional caller-shared ``positions`` relation (superset
    vocabularies are fine — the per-call restriction still applies)."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    spark = df.sparkSession
    q_raw = queries.select(q_id_col, q_text_col).limit(max_inline_queries + 1).collect()
    large = len(q_raw) > max_inline_queries
    qt_rows: list = []
    if not large:
        local_q = spark.createDataFrame(
            q_raw, queries.select(q_id_col, q_text_col).schema
        )
        qt_rows = [
            (r["query_id"], r["term"])
            for r in _q_terms(local_q, q_text_col, q_id_col).collect()
        ]
        if not qt_rows:
            return spark.createDataFrame(
                [],
                f"query_id {queries.schema[q_id_col].dataType.simpleString()}, "
                f"doc_id {df.schema[id_col].dataType.simpleString()}, n_spans bigint",
            )
        large = len({t for _, t in qt_rows}) > MAX_INLINE_TERMS
    if large:
        qt = _q_terms(queries, q_text_col, q_id_col).localCheckpoint(eager=False)
        vocab = qt.select("term").distinct()
        vocab_join = lambda t: t.join(vocab, "term")  # noqa: E731 — AQE picks
        bcast = lambda x: x  # noqa: E731
    else:
        qid_t = queries.schema[q_id_col].dataType.simpleString()
        qt = spark.createDataFrame(qt_rows, f"query_id {qid_t}, term string")
        terms = sorted({t for _, t in qt_rows})
        vocab_join = lambda t: t.filter(F.col("term").isin(terms))  # noqa: E731
        bcast = F.broadcast
    dt = positions if positions is not None else _corpus_positions(
        df, text_col, id_col
    )
    return _proximity_hits(vocab_join(dt), qt, window, bcast)


def proximity_match_indexed(
    spark,
    path: str,
    queries: DataFrame,
    window: int = 8,
    q_text_col: str = "q_text",
    q_id_col: str = "query_id",
    max_inline_queries: int = 64,
    where=None,
    stats: tuple[float, float, float, int] | None = None,
) -> DataFrame:
    """Windowed co-occurrence over a POSITIONAL index — the
    :func:`phrase_match_indexed` pruning (phrase-vocabulary term-hash
    buckets, tombstone mask, ``where`` meta filter, preloaded
    ``stats``) with the sloppy-span aggregation."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    p_schema = spark.read.parquet(f"{path}/postings").schema
    if "pos" not in p_schema.fieldNames():
        raise ValueError(
            f"proximity_match_indexed: index at {path} was written without "
            "positions=True; rebuild with write_bm25_index(positions=True)"
        )
    _, _, _, n_buckets = stats if stats is not None else _read_stats(spark, path)
    q_raw = queries.select(q_id_col, q_text_col).limit(max_inline_queries + 1).collect()
    large = len(q_raw) > max_inline_queries
    qt_rows: list = []
    if not large:
        local_q = spark.createDataFrame(
            q_raw, queries.select(q_id_col, q_text_col).schema
        )
        qt_rows = [
            (r["query_id"], r["term"], r["bk"])
            for r in _q_terms(local_q, q_text_col, q_id_col)
            .withColumn("bk", F.pmod(F.xxhash64("term"), F.lit(int(n_buckets))))
            .collect()
        ]
        if not qt_rows:
            return spark.createDataFrame(
                [],
                f"query_id {queries.schema[q_id_col].dataType.simpleString()}, "
                f"doc_id {p_schema['doc_id'].dataType.simpleString()}, n_spans bigint",
            )
        large = len({t for _, t, _ in qt_rows}) > MAX_INLINE_TERMS
    if large:
        qt = _q_terms(queries, q_text_col, q_id_col).localCheckpoint(eager=False)
        if qt_rows:
            buckets = sorted({bk for _, _, bk in qt_rows})
        else:
            buckets = sorted(
                {
                    r["bk"]
                    for r in qt.select(
                        F.pmod(F.xxhash64("term"), F.lit(int(n_buckets))).alias("bk")
                    )
                    .distinct()
                    .collect()
                }
            )
            if not buckets:
                return spark.createDataFrame(
                    [],
                    f"query_id {queries.schema[q_id_col].dataType.simpleString()}, "
                    f"doc_id {p_schema['doc_id'].dataType.simpleString()}, "
                    "n_spans bigint",
                )
        vocab = qt.select("term").distinct()
        vocab_join = lambda t: t.join(vocab, "term")  # noqa: E731 — AQE picks
        bcast = lambda x: x  # noqa: E731
    else:
        qid_t = queries.schema[q_id_col].dataType.simpleString()
        qt = spark.createDataFrame(
            [(q, t) for q, t, _ in qt_rows], f"query_id {qid_t}, term string"
        )
        terms = sorted({t for _, t, _ in qt_rows})
        buckets = sorted({bk for _, _, bk in qt_rows})
        vocab_join = lambda t: t.filter(F.col("term").isin(terms))  # noqa: E731
        bcast = F.broadcast
    postings = spark.read.parquet(f"{path}/postings").filter(
        F.col("bucket").isin(*[int(x) for x in buckets])
    )
    tomb = _read_tombstones(spark, path)
    if tomb is not None:
        postings = postings.join(F.broadcast(tomb), "doc_id", "left_anti")
    if where is not None:
        postings = postings.filter(where)
    dt = vocab_join(postings).select("doc_id", "term", F.explode("pos").alias("pos"))
    return _proximity_hits(dt, qt, window, bcast)
