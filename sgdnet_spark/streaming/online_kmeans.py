"""Online (mini-batch) k-means over a vector stream.

Completes the online-estimator family (online_glm.py) for the cluster
tier: the coarse quantizer behind IVF/IVF-PQ/semdedup/cluster_balance
can be MAINTAINED as vectors arrive instead of refit from scratch —
Sculley 2010 ("Web-scale k-means clustering"), the per-center running
mean:

    assign batch points to the nearest current centroid,
    n_c += batch_count_c
    c   += (batch_sum_c − batch_count_c · c) / n_c

so each centroid is the running mean of every point ever assigned to
it (under the centroids current at that point's batch). One Arrow
partials pass per micro-batch — the kmeans_fit accumulation shape,
(k, dim+1) per partition, flat in batch size; state is the tiny
(centroids, counts) pair on the driver.

First-batch init is deterministic (first k vectors by id — the
kmeans_fit convention), so a SINGLE batch reproduces
``kmeans_fit(batch, k, iters=1)`` exactly (asserted), and the
two-batch update replays exactly in numpy (tests/test_streaming.py).
Downstream consumers refresh by passing ``model.centroids`` to
assign_lists / cluster_balance(cents=) / semdedup — fit-online,
score-anywhere.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


class OnlineKMeans:
    """foreachBatch accumulator maintaining k centroids over a stream.

    >>> model = OnlineKMeans(k=16)
    >>> q = (vec_stream.writeStream.foreachBatch(model.update)
    ...      .outputMode("append").start())
    ... # any time later: cluster_balance(df, cents=model.centroids)
    """

    def __init__(self, k: int, vec_col: str = "embedding", id_col: str = "vec_id"):
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col
        self.centroids: np.ndarray | None = None
        self.counts: np.ndarray | None = None
        self.n_batches = 0

    def _batch_stats(self, batch_df: DataFrame) -> np.ndarray:
        """(k, dim+1) [count | vector-sum] partials of the batch under
        the CURRENT centroids — kmeans_fit's accumulation kernel."""
        from sgdnet_spark.operators.ivf import _vec_frame

        cents = self.centroids
        k, dim = cents.shape

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            acc = np.zeros((k, dim + 1))
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.stack(pdf["v"].to_numpy())
                d2 = (V**2).sum(1)[:, None] - 2 * V @ cents.T + (cents**2).sum(1)[None, :]
                a = d2.argmin(1)
                for c in range(k):
                    sel = V[a == c]
                    if len(sel):
                        acc[c, 0] += len(sel)
                        acc[c, 1:] += sel.sum(0)
            yield pd.DataFrame({"part": [acc.ravel().tolist()]})

        parts = (
            _vec_frame(batch_df, self.vec_col)
            .mapInPandas(run, schema="part array<double>")
            .collect()
        )
        if not parts:
            return np.zeros((k, dim + 1))
        return np.sum([np.asarray(r["part"]).reshape(k, dim + 1) for r in parts], axis=0)

    def update(self, batch_df: DataFrame, batch_id: int = 0) -> None:
        """foreachBatch target: fold one micro-batch into the model."""
        from sgdnet_spark.operators.ivf import _collect_vec

        if self.centroids is None:
            init = _collect_vec(batch_df, self.id_col, self.vec_col, self.k)
            if len(init) == 0:
                return  # nothing usable in this batch; wait for data
            # clamp like kmeans_fit: train on what exists
            self.k = min(self.k, len(init))
            self.centroids = init[: self.k].copy()
            self.counts = np.zeros(self.k)
        tot = self._batch_stats(batch_df)
        cnt, s = tot[:, 0], tot[:, 1:]
        new_n = self.counts + cnt
        upd = np.where(cnt[:, None] > 0, (s - cnt[:, None] * self.centroids)
                       / np.maximum(new_n[:, None], 1), 0.0)
        self.centroids = self.centroids + upd
        self.counts = new_n
        self.n_batches += 1

    def assign(self, df: DataFrame) -> DataFrame:
        """(id, list_id, v) under the current centroids."""
        from sgdnet_spark.operators.ivf import assign_lists

        if self.centroids is None:
            raise ValueError("OnlineKMeans.assign: no batches folded yet")
        return assign_lists(df, self.centroids, self.vec_col, self.id_col)
