"""Maximal-marginal-relevance (MMR) diverse top-k re-ranking.

The diverse-selection stage of a retrieval stack (Carbonell &
Goldstein, SIGIR 1998) — used in training-data pipelines to pick
examples that are RELEVANT to a query/seed but not redundant with each
other (near-identical neighbors add little signal; SemDeDup removes
global dups, MMR removes within-result-set redundancy):

    pick argmax_d  λ·cos(q, d) − (1−λ)·max_{s ∈ selected} cos(d, s)

greedily k times. λ=1 is plain cosine top-k (asserted); λ<1 trades
relevance for diversity.

Spark shape: MMR is quadratic in the CANDIDATE POOL, never the corpus —
any ANN path (brute force, IVF, IVF-PQ) supplies a per-query pool of
``pool`` candidates, their vectors join in by id (candidate-sized
broadcast), and the greedy sweep runs per query as one Arrow
``applyInPandas`` group of ≤ pool rows. At 100 TB the pools are the
only thing that moves. Ties break by (score desc, id asc) — replayed
exactly by the python oracle in tests/test_mmr.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sgdnet_spark.operators.ivf import _vec_frame


def mmr_select_np(
    qv: np.ndarray, cand_ids: np.ndarray, cand_vs: np.ndarray, k: int, lam: float
) -> list:
    """Greedy MMR over one candidate pool; returns selected ids in
    selection order. Deterministic: ties by smallest id. Ids are
    returned as-is (any orderable type)."""
    n = len(cand_ids)
    if n == 0:
        return []
    Vn = cand_vs / np.maximum(np.linalg.norm(cand_vs, axis=1, keepdims=True), 1e-300)
    qn = qv / max(np.linalg.norm(qv), 1e-300)
    rel = Vn @ qn
    sim = Vn @ Vn.T
    # stable processing order so argmax tie-breaks resolve to the
    # smallest id regardless of input row order
    order = np.lexsort((cand_ids,))
    rel, sim, ids = rel[order], sim[np.ix_(order, order)], cand_ids[order]
    selected: list[int] = []
    remaining = list(range(len(ids)))
    # red[j] = max_{s in selected} sim[j, s], maintained incrementally
    # (one vectorized np.maximum per pick) — O(k·pool) total instead of
    # the naive O(k²·pool) per-candidate max. red is None (≡ 0.0, the
    # empty-max convention) until the first pick, then ASSIGNED before
    # being max-merged: seeding with zeros would silently clamp
    # negative cosines at 0 and change selections. The candidate scan
    # keeps the exact sequential >best+1e-15 tie-break chain the
    # python oracle replays.
    red = None
    for _ in range(min(k, len(ids))):
        score = lam * rel if red is None else lam * rel - (1.0 - lam) * red
        best_j, best_score = None, None
        for j in remaining:
            if best_score is None or score[j] > best_score + 1e-15:
                best_j, best_score = j, score[j]
        selected.append(ids[best_j])
        remaining.remove(best_j)
        red = sim[:, best_j].copy() if red is None else np.maximum(red, sim[:, best_j])
    return selected


def mmr_rerank(
    cands: DataFrame,
    df: DataFrame,
    queries: DataFrame,
    k_neighbors: int = 5,
    lam: float = 0.7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Diversify per-query candidates: (query_id, nbr_id, cos) in →
    the MMR-selected k out, with ``sel`` the 1-based selection order.

    ``cands`` is any ANN result (brute_force_topk / ivf_topk /
    ivfpq_topk output with a larger k as the pool); duplicate
    (query_id, nbr_id) rows — e.g. a pool unioned from two candidate
    sources — are deduplicated, so a neighbor can be selected at most
    once. Candidate and query vectors join in from ``df``/``queries``
    — candidate-pool-sized joins, one Arrow group per query for the
    greedy sweep. Ids may be any orderable type (the id column's type
    is preserved)."""
    from sgdnet_spark.operators.pq import _pool_join

    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    cands = cands.dropDuplicates(["query_id", "nbr_id"])
    base = _vec_frame(df, vec_col, id_col)
    qdf = _vec_frame(queries, vec_col, id_col).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv")
    )
    pool = _pool_join(base, cands, qdf, ["query_id", "nbr_id", "cos", "v", "qv"])
    # query ids and corpus ids may be DIFFERENT types (e.g. string query
    # keys probing a long-keyed corpus) — derive each output column's
    # type from its own source relation
    qid_type = queries.schema[id_col].dataType.simpleString()
    id_type = df.schema[id_col].dataType.simpleString()

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {"query_id": [], "nbr_id": [], "cos": [], "sel": []}
            )
        qv = np.asarray(pdf["qv"].iloc[0], dtype=np.float64)
        ids = pdf["nbr_id"].to_numpy()
        V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        chosen = mmr_select_np(qv, ids, V, k_neighbors, lam)
        cos_by_id = dict(zip(pdf["nbr_id"], pdf["cos"]))
        return pd.DataFrame(
            {
                "query_id": [pdf["query_id"].iloc[0]] * len(chosen),
                "nbr_id": chosen,
                "cos": [cos_by_id[c] for c in chosen],
                "sel": list(range(1, len(chosen) + 1)),
            }
        )

    return pool.groupBy("query_id").applyInPandas(
        run, schema=f"query_id {qid_type}, nbr_id {id_type}, cos double, sel int"
    )


def mmr_topk(
    df: DataFrame,
    queries: DataFrame,
    k_neighbors: int = 5,
    lam: float = 0.7,
    pool: int = 25,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Diverse cosine top-k: exact top-``pool`` candidates (the
    brute-force path; swap in ivf/ivfpq results via ``mmr_rerank`` for
    the approximate scale paths), then the greedy MMR sweep."""
    from sgdnet_spark.operators.similarity import brute_force_topk

    if not 0.0 <= lam <= 1.0:  # validate BEFORE launching any job
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    cands = brute_force_topk(df, queries, k=pool, vec_col=vec_col, id_col=id_col)
    return mmr_rerank(
        cands, df, queries, k_neighbors=k_neighbors, lam=lam,
        vec_col=vec_col, id_col=id_col,
    )
