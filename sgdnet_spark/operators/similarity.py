"""Similarity search over embedding columns (array<float>).

- cosine/dot built from F.zip_with + F.aggregate (JVM-side, codegen).
- brute-force top-k: broadcast the query set, narrow scan, window top-k.
- LSH (random hyperplanes): bucketed candidates for the 100 TB path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(col: str) -> Column:
    return F.col(col).cast("array<double>")


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All-pairs cosine ≥ threshold (exact). O(n²) — the correctness
    baseline; use lsh_topk for scale."""
    v = df.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"),
                  norm(_as_double(vec_col)).alias("nrm"))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos"))
    )


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_inline_queries: int = 64,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × narrow scan of the corpus,
    per-query window top-k. Ties broken by neighbor id (deterministic).

    Small query sets are inlined as literal expressions (one fused
    mult-add chain per query, whole-stage codegen, zero array allocs —
    the broadcast-join idea taken down to expression level). Larger sets
    fall back to a broadcast join over array columns.
    """
    q_rows = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")).collect()
    if len(q_rows) <= max_inline_queries:
        # Arrow-batched BLAS path: broadcast the query block to every
        # partition, one (batch x dim) @ (dim x q) matmul per batch, keep
        # only each batch's per-query top-k — the shuffle carries
        # q*k*partitions candidate rows, never the corpus.
        import pandas as pd

        q_ids = [int(r["query_id"]) for r in q_rows]
        Q = np.asarray([r["qv"] for r in q_rows], dtype=np.float64)
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        corpus = df.select(F.col(id_col).alias("nbr_id"), _as_double(vec_col).alias("cv"))

        def run(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.stack(pdf["cv"].to_numpy())
                Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
                S = Vn @ Qn.T  # (m, q)
                ids = pdf["nbr_id"].to_numpy()
                out_q, out_n, out_c = [], [], []
                kk = min(k + 1, len(ids))  # +1 in case the query itself is here
                for j, qid in enumerate(q_ids):
                    top = np.argpartition(-S[:, j], kk - 1)[:kk]
                    for t in top:
                        if ids[t] != qid:
                            out_q.append(qid)
                            out_n.append(int(ids[t]))
                            out_c.append(float(S[t, j]))
                yield pd.DataFrame({"query_id": out_q, "nbr_id": out_n, "cos": out_c})

        scored = corpus.mapInPandas(run, schema="query_id long, nbr_id long, cos double")
    else:
        corpus = df.select(F.col(id_col).alias("nbr_id"), _as_double(vec_col).alias("cv"),
                           norm(_as_double(vec_col)).alias("cn"))
        q = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"),
                           norm(_as_double(vec_col)).alias("qn"))
        scored = (
            corpus.join(F.broadcast(q), F.col("nbr_id") != F.col("query_id"))
            .select(
                "query_id",
                "nbr_id",
                (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos"),
            )
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "nbr_id", F.round("cos", 4).alias("cos"))
    )


def random_hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n_planes, dim))


def lsh_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id from fixed random hyperplanes (deterministic)."""
    bits = []
    for i, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in plane]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("bigint"))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket with the query.

    At scale the corpus is hash-partitioned by bucket so each query probes
    one partition instead of scanning n vectors.
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    corpus = df.select(
        F.col(id_col).alias("nbr_id"),
        _as_double(vec_col).alias("cv"),
        norm(_as_double(vec_col)).alias("cn"),
        lsh_bucket(_as_double(vec_col), planes).alias("bk"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(vec_col).alias("qv"),
        norm(_as_double(vec_col)).alias("qn"),
        lsh_bucket(_as_double(vec_col), planes).alias("bk"),
    )
    scored = (
        corpus.alias("c")
        .join(F.broadcast(q).alias("q"), (F.col("c.bk") == F.col("q.bk")) & (F.col("c.nbr_id") != F.col("q.query_id")))
        .select(
            "q.query_id",
            "c.nbr_id",
            (dot(F.col("q.qv"), F.col("c.cv")) / (F.col("q.qn") * F.col("c.cn"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "nbr_id", F.round("cos", 4).alias("cos"))
    )
