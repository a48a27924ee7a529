"""Streaming ANN query serving against a persisted IVF-PQ index.

The online half of the similarity-search story: queries ARRIVE as a
stream; the corpus lives as the list-partitioned compressed index
``write_pq_index`` wrote. Per-query top-k needs a global-per-query
regroup, which append-mode streaming can't express without watermark
tricks — but every query row is self-contained (all of its candidates
come from the STATIC index), so the honest Spark shape is foreachBatch:
each micro-batch of queries is a static frame probed with the identical
batch path (``pq_topk_indexed``'s partition-pruned scan, ADC, exact
re-rank). Streamed answers are therefore EQUAL to batch answers by
construction — asserted in tests/test_streaming.py — and the quantizers
load ONCE at server construction, not per batch (the fit-once model=
convention of fit_lm/fit_boilerplate/cluster_balance).

This is the online_glm.py foreachBatch-sink pattern applied to serving
instead of fitting; state here is the tiny (centroids, codebooks) pair.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


class PqStreamServer:
    """foreachBatch responder over a written IVF-PQ index.

    >>> server = PqStreamServer(spark, path, k_neighbors=5, nprobe=3)
    >>> q = (query_stream.writeStream.foreachBatch(server.respond)
    ...      .outputMode("append").start())

    ``sink(result_df, batch_id)`` receives each micro-batch's answers
    (collected rows are appended to ``server.results`` if no sink is
    given — test/demo mode; give a real sink in production).
    """

    def __init__(
        self,
        spark,
        path: str,
        k_neighbors: int = 5,
        nprobe: int = 3,
        refine: int = 10,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        sink: Callable[[DataFrame, int], None] | None = None,
        max_inline_queries: int = 64,
        where=None,
    ) -> None:
        self.spark = spark
        self.path = path
        self.k_neighbors = k_neighbors
        self.nprobe = nprobe
        self.refine = refine
        self.vec_col = vec_col
        self.id_col = id_col
        self.sink = sink
        # a large micro-batch automatically takes the distributed query
        # path (pq.py's two-path design); ``where`` serves
        # metadata-filtered retrieval per batch
        self.max_inline_queries = max_inline_queries
        self.where = where
        self.results: list = []
        self.refresh()

    def refresh(self) -> None:
        """(Re)load the quantizers, encoding variant, and OPQ rotation
        — call after an index rebuild (appends/deletes need no refresh:
        codes/vectors re-scan per probe and the quantizers are
        membership-independent; only a retrain changes this state)."""
        from sgdnet_spark.operators.ivf import load_centroids
        from sgdnet_spark.operators.pq import (
            _load_residual_flag,
            _load_rotation,
            load_codebooks,
        )

        self._cents = load_centroids(self.spark, self.path)
        self._books = load_codebooks(self.spark, self.path)
        self._residual = _load_residual_flag(self.spark, self.path)
        self._rot = _load_rotation(self.spark, self.path)

    def probe(self, queries: DataFrame) -> DataFrame:
        """Static probe with the preloaded quantizers (the per-batch
        body; also usable directly for batch queries)."""
        from sgdnet_spark.operators.pq import _topk_indexed_with_model

        out, _ = _topk_indexed_with_model(
            self.spark, self.path, queries, self._cents, self._books,
            self.k_neighbors, self.nprobe, self.refine,
            self.vec_col, self.id_col,
            self.max_inline_queries, self.where,
            residual=self._residual, rot=self._rot,
        )
        return out

    def respond(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch target. Bound-retries on missing-path errors so
        a probe racing ``compact_pq_index``'s directory swaps (or
        landing after a crashed swap, which it repairs via
        ``recover_partitioned``) recovers instead of failing the batch;
        sinks must be idempotent on batch_id — the foreachBatch
        contract the engine itself already imposes."""
        from sgdnet_spark.streaming._retry import run_with_maintenance_retry

        def body() -> None:
            out = self.probe(batch_df)
            if self.sink is not None:
                self.sink(out, batch_id)
            else:
                self.results.extend(out.collect())

        run_with_maintenance_retry(
            self.spark, body, [f"{self.path}/vectors", f"{self.path}/codes"]
        )
