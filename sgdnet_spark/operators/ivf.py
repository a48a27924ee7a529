"""IVF (inverted-file) approximate nearest neighbor search.

A distributed Lloyd's k-means builds the coarse quantizer: each
iteration is ONE mapInPandas pass emitting per-cluster (count, vec-sum)
partials — O(k·dim) per partition, independent of n (same
sufficient-statistic discipline as the GLM solver). Search assigns each
corpus vector to its nearest centroid (the inverted lists) and probes
only the ``nprobe`` nearest lists per query.

At 100 TB the corpus would be written partitioned by list id so a probe
touches nprobe partitions instead of the whole table.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _collect_vec(df: DataFrame, id_col: str, vec_col: str, n: int) -> np.ndarray:
    rows = (df.filter(F.col(vec_col).isNotNull())
            .orderBy(id_col).limit(n).select(vec_col).collect())
    return np.asarray([r[0] for r in rows], dtype=np.float64)


def _vec_frame(df: DataFrame, vec_col: str, id_col: str | None = None) -> DataFrame:
    """Project (id?, v) with NULL embeddings dropped: one NULL row would
    otherwise np.stack-crash EVERY task that sees it (a NULL vector has
    no nearest centroid — skipping is the only coherent semantic)."""
    cols = ([F.col(id_col).alias("id")] if id_col else []) + [
        F.col(vec_col).cast("array<double>").alias("v")
    ]
    return df.filter(F.col(vec_col).isNotNull()).select(*cols)


def _nearest_lists_np(Q: np.ndarray, cents: np.ndarray, nprobe: int) -> np.ndarray:
    """(nq, nprobe) nearest-centroid ids per query, chunked so the
    (chunk, n_lists, dim) distance intermediate stays ~256 MB. The
    subtract-square-sum reduction order matches :func:`_build_probes`'s
    per-query form exactly, so driver-side and executor-side probe
    construction pick identical lists (float-parity — the two-path
    equality contract of the ANN tier)."""
    if len(Q) == 0:
        return np.empty((0, nprobe), dtype=np.int64)
    chunk = max(1, (1 << 25) // max(1, cents.shape[0] * cents.shape[1]))
    parts = []
    for lo in range(0, len(Q), chunk):
        d2 = ((Q[lo : lo + chunk, None, :] - cents[None, :, :]) ** 2).sum(2)
        parts.append(np.argsort(d2, axis=1)[:, :nprobe])
    return np.concatenate(parts, axis=0).astype(np.int64)


def _collect_queries_bounded(
    queries: DataFrame, vec_col: str, id_col: str, limit: int | None = None
) -> tuple[list, bool]:
    """(non-NULL (qid, qv) rows, truncated?) — the bounded collect that
    decides between the driver-side and distributed probe paths.
    ``truncated`` is True when the collect hit ``limit`` RAW rows (more
    queries may exist beyond it; NULL-vector rows count against the
    limit, so only the raw count proves every query was seen)."""
    sel = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    if limit is not None:
        sel = sel.limit(limit)
    rows = sel.collect()
    truncated = limit is not None and len(rows) >= limit
    return [r for r in rows if r["qv"] is not None], truncated


def _probe_relations_ivf(
    queries: DataFrame,
    cents: np.ndarray,
    nprobe: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Executor-side probe construction for the IVF path — one Arrow
    pass over the query frame (centroids ride the closure) emitting
    one row per query with its probed-list array next to its vector
    (stored once per query). Callers derive the per-list relation via
    a fused in-row explode — no self-join of the query frame. No
    query row reaches the driver; results are bit-identical to the
    driver path (same reduction order — see _nearest_lists_np)."""
    id_type = queries.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            lists = _nearest_lists_np(Q, cents, nprobe)
            yield pd.DataFrame(
                {"query_id": pdf["id"], "lists": list(lists), "qv": pdf["v"]}
            )

    return _vec_frame(queries, vec_col, id_col).mapInPandas(
        run, schema=f"query_id {id_type}, lists array<bigint>, qv array<double>"
    )


def _build_probes(cents: np.ndarray, q_rows, nprobe: int) -> tuple[list, set[int]]:
    """(query_id, list_id, qv) probe rows for the nprobe nearest lists
    of each query; NULL query vectors are skipped (no meaningful probe)."""
    probe_rows, probed = [], set()
    for r in q_rows:
        if r["qv"] is None:
            continue
        qv = np.asarray(r["qv"], dtype=np.float64)
        d2 = ((cents - qv) ** 2).sum(1)
        for lid in np.argsort(d2)[:nprobe]:
            probe_rows.append((int(r["qid"]), int(lid), [float(x) for x in qv]))
            probed.add(int(lid))
    return probe_rows, probed


def _cosine_topk(joined: DataFrame, k_neighbors: int) -> DataFrame:
    """Arrow-batched cosine over (v, qv) pairs, then per-query top-k
    with deterministic (cos desc, nbr_id asc) tie-breaks."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["v"].to_numpy())
            Q = np.stack(pdf["qv"].to_numpy())
            cos = (V * Q).sum(1) / (
                np.maximum(np.linalg.norm(V, axis=1), 1e-300)
                * np.maximum(np.linalg.norm(Q, axis=1), 1e-300)
            )
            yield pd.DataFrame({"query_id": pdf["query_id"], "nbr_id": pdf["id"], "cos": cos})

    scored = joined.mapInPandas(run, schema="query_id long, nbr_id long, cos double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k_neighbors)
        .select("query_id", "nbr_id", F.round("cos", 4).alias("cos"))
    )


def _norm_rows(V: np.ndarray) -> np.ndarray:
    return V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)


def kmeans_fit(
    df: DataFrame,
    k: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    normalize: bool = False,
) -> np.ndarray:
    """Distributed Lloyd's iterations; deterministic init (first k by id).

    Returns (k, dim) centroids. Each iteration = one narrow pass; the
    driver reduces #partitions × (k, dim+1) partials. ``normalize``
    L2-normalizes every vector before init/assignment (the residual
    IVF-PQ coarse quantizer lives in the normalized space the cosine
    search operates on); default False keeps the historical raw-space
    behavior bit-for-bit.
    """
    cents = _collect_vec(df, id_col, vec_col, k)
    if len(cents) == 0:
        raise ValueError("kmeans_fit: empty input")
    if normalize:
        cents = _norm_rows(cents)
    # fewer rows than requested centroids: clamp k to n (the accumulator
    # below is sized (k, dim+1) — a mismatch would crash with an obscure
    # numpy broadcast error instead of training on what exists)
    k = min(k, len(cents))
    cents = cents[:k]
    dim = cents.shape[1]
    vecs = _vec_frame(df, vec_col)

    for _ in range(iters):
        c_bc = cents  # captured by closure, shipped with the task

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            acc = np.zeros((k, dim + 1))
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.stack(pdf["v"].to_numpy())
                if normalize:
                    V = _norm_rows(V)
                d2 = ((V**2).sum(1)[:, None] - 2 * V @ c_bc.T + (c_bc**2).sum(1)[None, :])
                a = d2.argmin(1)
                for c in range(k):
                    sel = V[a == c]
                    if len(sel):
                        acc[c, 0] += len(sel)
                        acc[c, 1:] += sel.sum(0)
            yield pd.DataFrame({"part": [acc.ravel().tolist()]})

        parts = vecs.mapInPandas(run, schema="part array<double>").collect()
        tot = np.sum([np.asarray(r["part"]).reshape(k, dim + 1) for r in parts], axis=0)
        counts = tot[:, 0]
        new = np.where(counts[:, None] > 0, tot[:, 1:] / np.maximum(counts[:, None], 1), cents)
        if np.allclose(new, cents, atol=1e-12):
            break
        cents = new
    return cents


def assign_lists(
    df: DataFrame,
    cents: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    meta_cols: list[str] | None = None,
) -> DataFrame:
    """(id, list_id, v[, *meta]) — the inverted lists. ``meta_cols``
    pass attribute columns through in-row (zero extra shuffle) so a
    written index can serve metadata-filtered probes (the pq.py
    meta_cols design)."""
    meta_cols = meta_cols or []

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["v"].to_numpy())
            d2 = (V**2).sum(1)[:, None] - 2 * V @ cents.T + (cents**2).sum(1)[None, :]
            out = {"id": pdf["id"], "list_id": d2.argmin(1).astype(np.int64), "v": pdf["v"]}
            for c in meta_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    schema = "id long, list_id long, v array<double>"
    for c in meta_cols:
        schema += f", {c} {df.schema[c].dataType.simpleString()}"
    if meta_cols:
        base = df.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
            *meta_cols,
        )
    else:
        base = _vec_frame(df, vec_col, id_col)
    return base.mapInPandas(run, schema=schema)


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    k_neighbors: int = 5,
    n_lists: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_inline_queries: int = 64,
    cents: np.ndarray | None = None,
) -> DataFrame:
    """Approximate cosine top-k probing only nprobe inverted lists.

    Query handling is TWO-PATH (round 11, the pq.py/brute_force_topk
    design): a bounded ``limit(max_inline_queries+1)`` collect decides
    the branch; larger query sets build the probe relations
    executor-side (``_probe_relations_ivf``) with join strategy left
    to AQE — no unbounded driver collect. Both paths bit-identical
    (asserted in tests/test_ivf.py). ``cents`` passes a pretrained
    coarse quantizer (e.g. the shared kmeans_pq_fit model), skipping
    the k-means fit."""
    spark = df.sparkSession
    # branch-decide BEFORE training (an empty query set must not pay a
    # quantizer fit for an empty answer)
    q_rows, truncated = _collect_queries_bounded(
        queries, vec_col, id_col, limit=max_inline_queries + 1
    )
    if not q_rows and not truncated:
        return spark.createDataFrame([], "query_id long, nbr_id long, cos double")
    if cents is None:
        cents = kmeans_fit(
            df, k=n_lists, iters=kmeans_iters, vec_col=vec_col, id_col=id_col
        )
    lists = assign_lists(df, cents, vec_col, id_col)
    if not truncated:
        probe_rows, _ = _build_probes(cents, q_rows, nprobe)
        probes = spark.createDataFrame(
            probe_rows, "query_id long, list_id long, qv array<double>"
        )
        joined = lists.join(F.broadcast(probes), "list_id").filter(
            F.col("id") != F.col("query_id")
        )
        return _cosine_topk(joined, k_neighbors)
    base = _probe_relations_ivf(queries, cents, nprobe, vec_col, id_col)
    probes = base.select("query_id", F.explode("lists").alias("list_id"), "qv")
    joined = lists.join(probes, "list_id").filter(F.col("id") != F.col("query_id"))
    return _cosine_topk(joined, k_neighbors)


def write_ivf_index(
    df: DataFrame,
    path: str,
    n_lists: int = 16,
    kmeans_iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    meta_cols: list[str] | None = None,
) -> np.ndarray:
    """Materialize the IVF index as a LIST-PARTITIONED parquet layout:
    vectors land under ``path/vectors/list_id=<l>/`` and the centroids
    under ``path/centroids``. A probe then reads only its nprobe
    directories via partition pruning — at 100 TB the scan cost is
    nprobe/n_lists of the corpus, enforced by the plan, not by code.
    ``meta_cols`` store attribute columns alongside the vectors so
    probes can push a ``where=`` predicate into the scan next to the
    partition pruning (the write_pq_index design).
    """
    cents = kmeans_fit(df, k=n_lists, iters=kmeans_iters, vec_col=vec_col, id_col=id_col)
    lists = assign_lists(df, cents, vec_col, id_col, meta_cols=meta_cols)
    lists.write.mode("overwrite").partitionBy("list_id").parquet(f"{path}/vectors")
    spark = df.sparkSession
    cent_rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)]
    spark.createDataFrame(cent_rows, "list_id long, centroid array<double>").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/centroids")
    return cents


def load_centroids(spark, path: str) -> np.ndarray:
    rows = spark.read.parquet(f"{path}/centroids").orderBy("list_id").collect()
    return np.asarray([r["centroid"] for r in rows], dtype=np.float64)


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k_neighbors: int = 5,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_inline_queries: int = 64,
    where=None,
) -> tuple[DataFrame, DataFrame]:
    """Probe a written IVF index; returns (result, pruned_scan).

    The vectors frame is filtered on the PARTITION column list_id with
    an IN-list of every probed list, so the parquet source prunes to
    those directories (PartitionFilters in the plan — asserted in
    tests). ``pruned_scan`` is returned so callers/tests can inspect
    the plan of the pruned read itself. Two-path query handling as in
    :func:`ivf_topk`; in the distributed branch only the probed-list-id
    set (bounded by n_lists) is collected for partition pruning.
    ``where`` (over the index's ``meta_cols``) is metadata-filtered
    retrieval: the predicate pushes into the parquet scan next to the
    partition pruning, and with nprobe=n_lists results equal brute
    force over the post-filtered corpus.
    """
    cents = load_centroids(spark, path)
    q_rows, truncated = _collect_queries_bounded(
        queries, vec_col, id_col, limit=max_inline_queries + 1
    )
    if not truncated:
        probe_rows, probed = _build_probes(cents, q_rows, nprobe)
        if not probe_rows:  # empty queries frame: zero-arg isin() would raise
            empty = spark.createDataFrame([], "query_id long, nbr_id long, cos double")
            return empty, spark.read.parquet(f"{path}/vectors").limit(0)
        probes = spark.createDataFrame(
            probe_rows, "query_id long, list_id long, qv array<double>"
        )
        hint = True
    else:
        # lazy localCheckpoint (the pq.py _topk_indexed_with_model
        # pattern): the probed-list collect materializes the probe frame
        # once; the vectors join reuses it instead of re-running the
        # query scan + nearest-centroid Arrow pass
        base = _probe_relations_ivf(
            queries, cents, nprobe, vec_col, id_col
        ).localCheckpoint(eager=False)
        probed = {
            r["l"]
            for r in base.select(F.explode("lists").alias("l")).distinct().collect()
        }
        if not probed:  # every query row carried a NULL vector
            empty = spark.createDataFrame([], "query_id long, nbr_id long, cos double")
            return empty, spark.read.parquet(f"{path}/vectors").limit(0)
        probes = base.select("query_id", F.explode("lists").alias("list_id"), "qv")
        hint = False

    vectors = spark.read.parquet(f"{path}/vectors").filter(
        F.col("list_id").isin(*[int(x) for x in sorted(probed)])
    )
    if where is not None:
        vectors = vectors.filter(where)
    p = F.broadcast(probes) if hint else probes
    joined = vectors.select("id", "list_id", "v").join(p, "list_id").filter(
        F.col("id") != F.col("query_id")
    )
    return _cosine_topk(joined, k_neighbors), vectors
