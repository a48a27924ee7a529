"""Streaming BM25 query serving against a persisted term-bucketed
index — the PqStreamServer pattern on the lexical tier, made a proper
server class (round 12): the corpus-wide stats (n_docs, sum_dl, n_dl,
n_buckets) load ONCE at construction instead of a parquet read per
micro-batch, the same load-once discipline the dense server applies to
its quantizers.

Every answer depends only on the static index, so streamed results
equal batch results by construction — asserted in tests/test_bm25.py.
Supports both serving modes: per-query top-k and the windowless
relevance floor (``threshold=`` — the corpus-audit sweep).

Staleness note: a server constructed BEFORE an ``append_bm25_index``
keeps serving the pre-append global stats until rebuilt (postings are
re-scanned per probe, so appended DOCUMENTS appear immediately; only
N/avgdl lag) — the bounded score perturbation every BM25 serving stack
tolerates, and the same contract as the dense server's fixed
quantizers. Call ``refresh()`` after maintenance to reload.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


class Bm25StreamServer:
    """foreachBatch responder over a written BM25 index.

    >>> server = Bm25StreamServer(spark, path, k=10)
    >>> q = (query_stream.writeStream.foreachBatch(server.respond)
    ...      .outputMode("append").start())

    ``threshold`` switches to relevance-floor mode (no per-query
    window; results carry no rank column). ``phrase=True`` (round 13)
    switches to exact-phrase serving over a POSITIONAL index
    (``write_bm25_index(positions=True)``): each micro-batch is a
    (query_id, phrase) relation answered by
    :func:`~sgdnet_spark.operators.bm25.phrase_match_indexed` — the
    streaming shape of a continuous contamination audit (benchmark
    phrases arrive, matching documents stream out);
    ``proximity_window=W`` serves the unordered sloppy-span variant
    (:func:`~sgdnet_spark.operators.bm25.proximity_match_indexed`) the
    same way. ``sink(result_df,
    batch_id)`` receives each micro-batch's answers (collected rows
    append to ``server.results`` if no sink is given — test/demo
    mode)."""

    def __init__(
        self,
        spark,
        path: str,
        k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
        threshold: float | None = None,
        where=None,
        sink: Callable[[DataFrame, int], None] | None = None,
        max_inline_queries: int = 64,
        phrase: bool = False,
        proximity_window: int | None = None,
    ) -> None:
        if (phrase or proximity_window is not None) and threshold is not None:
            raise ValueError("phrase/proximity modes have no relevance threshold")
        if phrase and proximity_window is not None:
            raise ValueError("choose phrase OR proximity serving, not both")
        self.spark = spark
        self.path = path
        self.k = k
        self.k1 = k1
        self.b = b
        self.threshold = threshold
        self.where = where
        self.sink = sink
        self.max_inline_queries = max_inline_queries
        self.phrase = phrase
        self.proximity_window = proximity_window
        self.results: list = []
        self.refresh()

    def refresh(self) -> None:
        """(Re)load the corpus-wide stats — call after
        append_bm25_index / compact_bm25_index maintenance."""
        from sgdnet_spark.operators.bm25 import _read_stats

        self._stats = _read_stats(self.spark, self.path)

    def probe(self, queries: DataFrame) -> DataFrame:
        """Static probe with the preloaded stats (the per-batch body;
        also usable directly for batch queries)."""
        from sgdnet_spark.operators import bm25 as _bm25

        if self.phrase:
            return _bm25.phrase_match_indexed(
                self.spark, self.path, queries, where=self.where,
                max_inline_queries=self.max_inline_queries,
                stats=self._stats,
            )
        if self.proximity_window is not None:
            return _bm25.proximity_match_indexed(
                self.spark, self.path, queries,
                window=self.proximity_window, where=self.where,
                max_inline_queries=self.max_inline_queries,
                stats=self._stats,
            )
        if self.threshold is not None:
            out, _ = _bm25.bm25_filter_indexed(
                self.spark, self.path, queries, self.threshold,
                k1=self.k1, b=self.b, where=self.where,
                max_inline_queries=self.max_inline_queries, stats=self._stats,
            )
        else:
            out, _ = _bm25.bm25_topk_indexed(
                self.spark, self.path, queries, k=self.k,
                k1=self.k1, b=self.b, where=self.where,
                max_inline_queries=self.max_inline_queries, stats=self._stats,
            )
        return out

    def respond(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch target. Bound-retries on missing-path errors so
        a probe racing ``compact_bm25_index``'s directory swap (or
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
            self.spark, body, [f"{self.path}/postings"]
        )
