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
