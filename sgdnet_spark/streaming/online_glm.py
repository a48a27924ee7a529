"""Online GLM fitting over a stream — the Spark-native analog of the
reference's incremental (SAGA) learning.

The gaussian family's sufficient statistics (suffstats.Moments) are
additive across micro-batches, so a foreachBatch sink can maintain the
EXACT full-data Gram and refit the entire lambda path after every batch:
model-after-N-batches == batch fit on the union of those batches, to
solver tolerance (asserted in tests). State is O(p²), independent of
stream length.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from sgdnet_spark.glm import path as path_mod
from sgdnet_spark.glm import suffstats
from sgdnet_spark.glm.providers import SparkXY
from sgdnet_spark.glm.suffstats import Moments


class OnlineGaussianPath:
    """Accumulates moments batch-by-batch; refit() is driver-side only."""

    def __init__(self, feature_cols: Sequence[str], label_col: str, alpha: float = 1.0,
                 nlambda: int = 20, lambda_min_ratio: float = 1e-3):
        self.feature_cols = list(feature_cols)
        self.label_col = label_col
        self.alpha = alpha
        self.nlambda = nlambda
        self.lambda_min_ratio = lambda_min_ratio
        self.moments: Moments | None = None
        self.n_batches = 0

    def update(self, batch_df: DataFrame) -> None:
        xy = suffstats.assemble(batch_df, self.feature_cols, [self.label_col])
        p, k = len(self.feature_cols), 1
        try:
            mom = SparkXY(xy, p, k).moments()
        except ValueError:  # empty batch
            return
        if self.moments is None:
            self.moments = mom
        else:
            a, b = self.moments, mom
            self.moments = Moments(
                n=a.n + b.n,
                sum_x=a.sum_x + b.sum_x,
                sum_y=a.sum_y + b.sum_y,
                sum_xx=a.sum_xx + b.sum_xx,
                sum_xy=a.sum_xy + b.sum_xy,
                sum_yy=a.sum_yy + b.sum_yy,
            )
        self.n_batches += 1

    def foreach_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.update(batch_df)

    def fit(self) -> path_mod.PathResult:
        if self.moments is None:
            raise ValueError("no data seen yet")

        class _MomOnly:
            passes = 0

            @staticmethod
            def moments():
                return self.moments

        return path_mod.gaussian_path(
            _MomOnly, self.alpha, nlambda=self.nlambda,
            lambda_min_ratio=self.lambda_min_ratio, mom=self.moments,
        )
