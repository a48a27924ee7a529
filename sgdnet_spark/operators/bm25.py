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

- the QUERY term relation (distinct terms per query) is tiny and
  broadcasts; the corpus explodes to (doc, term, doclen) and is
  immediately semi-joined against the broadcast query vocabulary, so
  the one corpus-sized shuffle (the (doc, term) tf count) carries only
  matching terms — work scales with the posting lists the queries
  actually touch, the inverted-index access pattern.
- document frequencies come from THAT restricted relation (only query
  terms need df) — a Zipf-small (term, df) frame joined back broadcast.
- N and avgdl are ONE global aggregate (a 1-row scalar cross join, the
  sketch_prefilter scalar pattern).
- final score = groupBy(query, doc) sum + a per-query top-k window.

Every arithmetic step is expressible in ANSI SQL, so the DuckDB twin
replays the formula exactly (scores grid-rounded at 4 dp on both sides
— the text_lm_score summed-ln precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sgdnet_spark.operators import text


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
) -> DataFrame:
    """Per-query BM25 top-k: (query_id, doc_id, score, rn).

    ``queries`` is a (query_id, q_text) relation; each query's DISTINCT
    normalized tokens are its terms (classic BM25 ignores query-side
    term multiplicity). Ties break by doc_id ascending. Scores are
    grid-rounded to 4 dp (ranking happens on the unrounded value).
    """
    if k1 <= 0 or not 0.0 <= b <= 1.0:
        raise ValueError(f"need k1 > 0 and 0 <= b <= 1, got k1={k1}, b={b}")
    # (query_id, term) — distinct per query, broadcast-sized by contract
    q_terms = (
        queries.select(
            F.col(q_id_col).alias("query_id"),
            F.explode(text.tokens(q_text_col)).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    vocab = q_terms.select("term").distinct()

    toks = df.select(
        F.col(id_col).alias("doc_id"), text.tokens(text_col).alias("t")
    ).select("doc_id", F.size("t").cast("double").alias("dl"), F.explode("t").alias("term"))
    # restrict to the query vocabulary BEFORE the tf shuffle: the one
    # corpus-sized aggregation carries only the touched posting lists
    tf = (
        toks.join(F.broadcast(vocab), "term")
        .groupBy("doc_id", "term", "dl")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    # global stats: ONE 1-row aggregate (N over ALL docs, avgdl over
    # ALL docs — BM25's normalizer is corpus-wide, not match-wide)
    stats = df.select(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.size(text.tokens(text_col))).alias("avgdl"),
    )
    # df(term) from the restricted relation (tf rows are distinct per
    # (doc, term) already) — Zipf-small, broadcast back
    dft = tf.groupBy("term").agg(F.count("*").cast("double").alias("dft"))
    scored = (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("dft") + 0.5) / (F.col("dft") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .join(F.broadcast(q_terms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "doc_id", text.rpos(F.col("score"), 4).alias("score"), "rn")
    )


N_TERM_BUCKETS = 64


def write_bm25_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_TERM_BUCKETS,
) -> None:
    """Materialize the inverted index: ``path/postings/bucket=<b>/``
    holds (term, doc_id, dl, tf) partitioned by a stable term-hash
    bucket, ``path/stats`` the 1-row (n_docs, avgdl, n_buckets)
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
    Stats are stored as RAW SUMS (n_docs, sum_dl) so
    :func:`append_bm25_index` can fold a new batch in without
    rescanning the corpus; avgdl is derived at probe time.
    """
    _write_postings(df, path, text_col, id_col, n_buckets, mode="overwrite")
    stats = df.select(
        F.count("*").cast("double").alias("n_docs"),
        F.sum(F.size(text.tokens(text_col))).cast("double").alias("sum_dl"),
        F.lit(n_buckets).cast("bigint").alias("n_buckets"),
    )
    stats.coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")


def _write_postings(
    df: DataFrame, path: str, text_col: str, id_col: str, n_buckets: int, mode: str
) -> None:
    postings = (
        df.select(F.col(id_col).alias("doc_id"), text.tokens(text_col).alias("t"))
        .select(
            "doc_id", F.size("t").cast("double").alias("dl"), F.explode("t").alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term", "dl")
        .agg(F.count("*").cast("double").alias("tf"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
    )
    postings.write.mode(mode).partitionBy("bucket").parquet(f"{path}/postings")


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
    layout), and the corpus-wide (n_docs, sum_dl) sums fold the batch
    in WITHOUT rescanning the corpus. Postings append BEFORE the stats
    rewrite: a failure in between leaves slightly-stale global stats —
    a bounded score perturbation every BM25 serving stack tolerates —
    never missing postings (the vectors-before-codes ordering
    rationale). df(term) is recounted per probe, so it needs no
    maintenance at all."""
    old = spark.read.parquet(f"{path}/stats").collect()[0]
    _write_postings(df, path, text_col, id_col, int(old["n_buckets"]), mode="append")
    batch = df.select(
        F.count("*").cast("double").alias("n_docs"),
        F.sum(F.size(text.tokens(text_col))).cast("double").alias("sum_dl"),
    ).collect()[0]
    stats = spark.createDataFrame(
        [
            (
                float(old["n_docs"]) + float(batch["n_docs"]),
                float(old["sum_dl"]) + float(batch["sum_dl"]),
                int(old["n_buckets"]),
            )
        ],
        "n_docs double, sum_dl double, n_buckets bigint",
    )
    stats.coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")


def bm25_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    q_text_col: str = "q_text",
    q_id_col: str = "query_id",
) -> tuple[DataFrame, DataFrame]:
    """Probe a written BM25 index; returns (result, pruned_postings).

    The query vocabulary (tiny by contract — it is typed by a human or
    a seed benchmark) is collected once to derive the touched bucket
    set; the postings scan prunes to those partitions, df(term) counts
    over the pruned relation, and scoring/top-k mirror
    :func:`bm25_topk`. Results equal the in-memory path on the same
    corpus (asserted in tests)."""
    if k1 <= 0 or not 0.0 <= b <= 1.0:
        raise ValueError(f"need k1 > 0 and 0 <= b <= 1, got k1={k1}, b={b}")
    # avgdl derives from the stored raw sums (append-friendly); the
    # integer-valued double sums divide to the exact same double the
    # in-memory F.avg produces
    stats = spark.read.parquet(f"{path}/stats").select(
        "n_docs", (F.col("sum_dl") / F.col("n_docs")).alias("avgdl"), "n_buckets"
    )
    n_buckets = stats.select("n_buckets").first()["n_buckets"]
    q_terms = (
        queries.select(
            F.col(q_id_col).alias("query_id"),
            F.explode(text.tokens(q_text_col)).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    # bounded by the query vocabulary (human/benchmark sized), never
    # the corpus — the pq probed-list collect's analog
    buckets = sorted(
        {
            r["b"]
            for r in q_terms.select(
                F.pmod(F.xxhash64("term"), F.lit(int(n_buckets))).alias("b")
            )
            .distinct()
            .collect()
        }
    )
    empty = spark.createDataFrame(
        [], "query_id string, doc_id long, score double, rn int"
    )
    if not buckets:
        return empty, spark.read.parquet(f"{path}/postings").limit(0)
    postings = spark.read.parquet(f"{path}/postings").filter(
        F.col("bucket").isin(*[int(x) for x in buckets])
    )
    tf = postings.join(F.broadcast(q_terms.select("term").distinct()), "term")
    dft = tf.groupBy("term").agg(F.count("*").cast("double").alias("dft"))
    scored = (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats.select("n_docs", "avgdl")))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("dft") + 0.5) / (F.col("dft") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .join(F.broadcast(q_terms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    out = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "doc_id", text.rpos(F.col("score"), 4).alias("score"), "rn")
    )
    return out, postings
