"""Hybrid retrieval: reciprocal-rank fusion (RRF) of ranked lists.

The standard way production search stacks combine a LEXICAL ranking
(BM25) with a DENSE one (embedding cosine) — Cormack, Clarke &
Büttcher, SIGIR 2009: fused_score(q, d) = Σ_lists 1/(k0 + rank_l(q,d)),
summed over the lists that returned d. Rank fusion beats score fusion
because BM25 scores and cosines live on incomparable scales; ranks
need no calibration. k0=60 is the paper's (and every engine's)
default damping.

Spark shape: each input is an already-ranked per-query candidate list
(any of this repo's retrieval tiers — bm25_topk, brute_force_topk,
ivf/ivfpq/lsh top-k). Fusion is ONE full-outer join on (query, doc)
per extra list plus a per-query top-k window — candidate-list-sized
work, never corpus-sized; the expensive part already happened inside
the tiers being fused. Everything is exact integer-rank arithmetic on
a fixed k0, so the DuckDB twin replays the fused scores bit-for-bit
(ranks are ints; 1/(k0+r) sums are short and identical both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sgdnet_spark.operators import text


def rrf_fuse(
    lists: list[DataFrame],
    k: int = 10,
    k0: int = 60,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rn",
    weights: list[float] | None = None,
) -> DataFrame:
    """Fuse ≥2 ranked lists into (query_id, doc_id, fused, rn).

    Each input must carry (query_col, doc_col, rank_col) with rank 1 =
    best; a document absent from a list simply contributes nothing for
    it (the RRF convention). Ties in the fused score break by doc id
    ascending. ``fused`` is grid-rounded to 6 dp (ranking happens on
    the exact value; the sums are exact-enough rationals that both
    engines agree far below the grid).

    ``weights`` (one positive float per list, default all 1.0) is
    weighted RRF — fused = Σ_l w_l/(k0 + rank_l) — the standard
    production knob for biasing the lexical or dense tier without
    score calibration (rank arithmetic stays exact either way).
    """
    if len(lists) < 2:
        raise ValueError(f"rrf_fuse needs at least 2 lists, got {len(lists)}")
    if k0 <= 0:
        raise ValueError(f"k0 must be positive, got {k0}")
    if weights is None:
        weights = [1.0] * len(lists)
    if len(weights) != len(lists) or any(w <= 0 for w in weights):
        raise ValueError(
            f"weights must be {len(lists)} positive floats, got {weights}"
        )
    # union + one groupBy instead of a chain of full-outer joins: the
    # same (query, doc) key fold, one shuffle total, no null-handling
    # ladder as the list count grows
    unioned = None
    for df, w_l in zip(lists, weights):
        p = df.select(
            F.col(query_col).alias("query_id"),
            F.col(doc_col).alias("doc_id"),
            (F.lit(float(w_l)) / (F.lit(float(k0)) + F.col(rank_col))).alias("c"),
        )
        unioned = p if unioned is None else unioned.unionByName(p)
    fused = unioned.groupBy("query_id", "doc_id").agg(F.sum("c").alias("fused"))
    w = Window.partitionBy("query_id").orderBy(F.desc("fused"), F.asc("doc_id"))
    return (
        fused.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "doc_id", text.rpos(F.col("fused"), 6).alias("fused"), "rn")
    )


def hybrid_topk(
    docs: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    pool: int = 20,
    k0: int = 60,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
    exclude_self: bool = True,
    lex: DataFrame | None = None,
) -> DataFrame:
    """Hybrid lexical+dense retrieval over a corpus whose documents
    carry both a text row (``docs``) and an embedding row (``emb``,
    same id space): per query, BM25 top-``pool`` on the query TEXT and
    exact-cosine top-``pool`` on the query VECTOR, fused by RRF.

    ``queries`` carries (query_id, q_text, q_vec): the
    "more-like-this" shape where a query is itself a document (or any
    dual-encoded query). Each side is the existing tier — swap the
    dense side for ivfpq candidates at scale (rrf_fuse takes any
    ranked lists; :func:`hybrid_topk_approx` is that composition).

    ``exclude_self`` (default True, the more-like-this convention)
    forwards to the dense tier's self-exclusion; pass False when the
    query ids live in a namespace unrelated to the corpus ids, so an
    incidental id collision is not dropped from the dense list while
    BM25 keeps it (which would skew the fused score).

    ``lex`` (optional) replaces the internal bm25_topk call with a
    caller-prebuilt (query_id, doc_id, score, rn) lexical top-``pool``
    list — the shared-corpus-pass pattern: a pipeline that already
    tokenized the corpus for other consumers derives the lexical arm
    from that one pass and injects it here (same contract as
    bm25_topk's output; values must match it for the fusion to be
    equivalent)."""
    from sgdnet_spark.operators import bm25 as _bm25
    from sgdnet_spark.operators import similarity as _sim

    if lex is None:
        lex = _bm25.bm25_topk(
            docs, queries.select("query_id", "q_text"), k=pool,
            text_col=text_col, id_col=doc_id_col,
        )
    dense = _sim.brute_force_topk(
        emb,
        queries.select(F.col("query_id").alias(vec_id_col), F.col("q_vec").alias(vec_col)),
        k=pool,
        vec_col=vec_col,
        id_col=vec_id_col,
        with_rank=True,  # rank of the unrounded cut, not a 4dp re-rank
        exclude_self=exclude_self,
    )
    dense_ranked = dense.select("query_id", F.col("nbr_id").alias("doc_id"), "rn")
    return rrf_fuse([lex, dense_ranked], k=k, k0=k0)


def hybrid_topk_approx(
    docs: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    pool: int = 20,
    k0: int = 60,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
    n_lists: int = 8,
    nprobe: int = 3,
    m: int = 8,
    ksub: int = 16,
    refine: int = 10,
    kmeans_iters: int = 5,
    train_frac: float | None = None,
) -> DataFrame:
    """:func:`hybrid_topk` with the dense arm served by IVF-PQ instead
    of exact brute force — the actual 100 TB composition: the lexical
    candidates come from the vocabulary-restricted inverted-index probe
    and the dense candidates from the compressed-code ADC scan over
    nprobe inverted lists (exact re-ranked), so NEITHER arm ever scans
    the full corpus per query. rrf_fuse consumes the ivfpq ranks
    decided on the unrounded re-rank cosine (``with_rank=True`` — the
    same contract as the brute-force arm), so fused scores follow the
    identical integer-rank arithmetic.

    The pq tier is long-keyed throughout; query ids must be integral
    (the more-like-this shape). ivfpq's recall<1 means a dense
    candidate the exact arm would return can be absent — the fusion
    then scores it from the lexical rank alone, which is the standard
    production trade (tune n_lists/nprobe/refine for the recall
    floor)."""
    from sgdnet_spark.operators import bm25 as _bm25
    from sgdnet_spark.operators import pq as _pq

    lex = _bm25.bm25_topk(
        docs, queries.select("query_id", "q_text"), k=pool,
        text_col=text_col, id_col=doc_id_col,
    )
    dense = _pq.ivfpq_topk(
        emb,
        queries.select(
            F.col("query_id").alias(vec_id_col), F.col("q_vec").alias(vec_col)
        ),
        k_neighbors=pool,
        n_lists=n_lists,
        nprobe=nprobe,
        m=m,
        ksub=ksub,
        refine=refine,
        kmeans_iters=kmeans_iters,
        train_frac=train_frac,
        vec_col=vec_col,
        id_col=vec_id_col,
        with_rank=True,
    )
    dense_ranked = dense.select("query_id", F.col("nbr_id").alias("doc_id"), "rn")
    return rrf_fuse([lex, dense_ranked], k=k, k0=k0)
