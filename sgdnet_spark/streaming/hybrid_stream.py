"""Streaming HYBRID (lexical + dense) query serving against persisted
indexes — the PqStreamServer pattern composed with the BM25 indexed
probe and RRF fusion.

Queries arrive as a stream carrying BOTH representations
(query_id, q_text, q_vec); every micro-batch probes the persisted
term-bucketed BM25 index and the list-partitioned IVF-PQ index with the
identical batch paths (partition-pruned scans, ADC + exact re-rank) and
fuses the two ranked lists in-batch with reciprocal-rank fusion. Every
answer depends only on the STATIC indexes, so streamed results equal
batch results by construction — asserted in tests/test_streaming.py.

State is the tiny (centroids, codebooks) pair, loaded ONCE at server
construction (the fit-once convention); the BM25 side needs no driver
state at all beyond the stored stats read per probe. The pq tier is
long-keyed throughout, so query ids must be integral (the
hybrid_topk_approx contract).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class HybridStreamServer:
    """foreachBatch responder fusing a written BM25 index with a
    written IVF-PQ index.

    >>> server = HybridStreamServer(spark, bm25_path, pq_path, k=10)
    >>> q = (query_stream.writeStream.foreachBatch(server.respond)
    ...      .outputMode("append").start())

    ``sink(result_df, batch_id)`` receives each micro-batch's fused
    answers (collected rows append to ``server.results`` if no sink is
    given — test/demo mode)."""

    def __init__(
        self,
        spark,
        bm25_path: str,
        pq_path: str,
        k: int = 10,
        pool: int = 20,
        k0: int = 60,
        nprobe: int = 3,
        refine: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
        sink: Callable[[DataFrame, int], None] | None = None,
        max_inline_queries: int = 64,
    ) -> None:
        from sgdnet_spark.operators.ivf import load_centroids
        from sgdnet_spark.operators.pq import (
            _load_residual_flag,
            _load_rotation,
            load_codebooks,
        )

        self.spark = spark
        self.bm25_path = bm25_path
        self.pq_path = pq_path
        self.k = k
        self.pool = pool
        self.k0 = k0
        self.nprobe = nprobe
        self.refine = refine
        self.k1 = k1
        self.b = b
        self.sink = sink
        self.max_inline_queries = max_inline_queries
        self.results: list = []
        # quantizers (and the encoding variant) + the lexical stats
        # load ONCE; every batch reuses them
        from sgdnet_spark.operators.bm25 import _read_stats

        self._cents = load_centroids(spark, pq_path)
        self._books = load_codebooks(spark, pq_path)
        self._residual = _load_residual_flag(spark, pq_path)
        self._rot = _load_rotation(spark, pq_path)
        self._bm25_stats = _read_stats(spark, bm25_path)

    def probe(self, queries: DataFrame) -> DataFrame:
        """Static fused probe (the per-batch body; also usable directly
        for batch queries): BM25 top-``pool`` from the bucket-pruned
        postings, IVF-PQ top-``pool`` from the list-pruned codes, RRF
        top-``k``."""
        from sgdnet_spark.operators import bm25 as _bm25
        from sgdnet_spark.operators import fusion as _fusion
        from sgdnet_spark.operators.pq import _topk_indexed_with_model

        lex, _ = _bm25.bm25_topk_indexed(
            self.spark, self.bm25_path,
            queries.select("query_id", "q_text"),
            k=self.pool, k1=self.k1, b=self.b,
            max_inline_queries=self.max_inline_queries,
            stats=self._bm25_stats,
        )
        dense, _ = _topk_indexed_with_model(
            self.spark, self.pq_path,
            queries.select(
                F.col("query_id").alias("vec_id"), F.col("q_vec").alias("embedding")
            ),
            self._cents, self._books,
            self.pool, self.nprobe, self.refine,
            "embedding", "vec_id",
            self.max_inline_queries, None, True,
            residual=self._residual, rot=self._rot,
        )
        dense_ranked = dense.select(
            "query_id", F.col("nbr_id").alias("doc_id"), "rn"
        )
        return _fusion.rrf_fuse([lex, dense_ranked], k=self.k, k0=self.k0)

    def respond(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch target. Bound-retries on missing-path errors so
        a probe racing either index's compaction swap recovers instead
        of failing the batch (see streaming/_retry.py)."""
        from sgdnet_spark.streaming._retry import run_with_maintenance_retry

        def body() -> None:
            out = self.probe(batch_df)
            if self.sink is not None:
                self.sink(out, batch_id)
            else:
                self.results.extend(out.collect())

        run_with_maintenance_retry(
            self.spark,
            body,
            [
                f"{self.bm25_path}/postings",
                f"{self.pq_path}/vectors",
                f"{self.pq_path}/codes",
            ],
        )
