"""Sparse feature encoding for the wide-p path — reference saga-sparse.h
territory, Spark-first.

Rows carry (indices array<int>, values array<double>) instead of p dense
columns; batch kernels reconstruct per-batch CSR-style views with
numpy (bincount scatter-adds), so pass cost scales with nnz, not n·p.
Standardization uses the sparse trick the reference uses (scale only,
centering folded algebraically via the mean vector — the data is never
densified).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sgdnet_spark.glm.suffstats import Moments

IDX_COL = "__sp_idx"
VAL_COL = "__sp_val"
LBL_COL = "__sp_y"


def assemble_sparse(df: DataFrame, idx_col: str, val_col: str, label_col) -> DataFrame:
    lbl = F.col(label_col) if isinstance(label_col, str) else label_col
    return df.select(
        F.col(idx_col).cast("array<int>").alias(IDX_COL),
        F.col(val_col).cast("array<double>").alias(VAL_COL),
        lbl.cast("double").alias(LBL_COL),
    )


def _batch_csr(pdf: pd.DataFrame):
    idx_lists = pdf[IDX_COL].to_numpy()
    val_lists = pdf[VAL_COL].to_numpy()
    lens = np.fromiter((len(a) for a in idx_lists), dtype=np.int64, count=len(idx_lists))
    indptr = np.concatenate([[0], np.cumsum(lens)])
    idx = np.concatenate(idx_lists.tolist()) if len(idx_lists) else np.zeros(0, dtype=np.int64)
    val = np.concatenate(val_lists.tolist()) if len(val_lists) else np.zeros(0)
    y = pdf[LBL_COL].to_numpy(dtype=np.float64)
    rows = np.repeat(np.arange(len(lens)), lens)
    return idx.astype(np.int64), val, rows, indptr, y


def _sum_partials(df: DataFrame, fn) -> np.ndarray:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            part = fn(*_batch_csr(pdf))
            acc = part if acc is None else acc + part
        if acc is not None:
            yield pd.DataFrame({"partial": [acc.tolist()]})

    rows = df.mapInPandas(run, schema="partial array<double>").collect()
    if not rows:
        raise ValueError("empty input")
    return np.sum([np.asarray(r["partial"]) for r in rows], axis=0)


def moments_diag_sparse(xy: DataFrame, p: int) -> Moments:
    """n, Σx, Σx² (diag), Σy, Σxy, Σy² — all via nnz-cost scatter adds."""

    def fn(idx, val, rows, indptr, y):
        sum_x = np.bincount(idx, weights=val, minlength=p)
        sum_xsq = np.bincount(idx, weights=val * val, minlength=p)
        sum_xy = np.bincount(idx, weights=val * y[rows], minlength=p)
        return np.concatenate(
            [[float(len(y))], sum_x, sum_xsq, [y.sum()], sum_xy, [(y * y).sum()]]
        )

    out = _sum_partials(xy, fn)
    i = 0
    n = int(round(out[0])); i += 1
    sum_x = out[i : i + p]; i += p
    sum_xsq = out[i : i + p]; i += p
    sum_y = out[i : i + 1]; i += 1
    sum_xy = out[i : i + p].reshape(p, 1); i += p
    sum_yy = out[i : i + 1]
    return Moments(n, sum_x, sum_y, np.diag(sum_xsq), sum_xy, sum_yy)


def sgdnet_sparse(
    df: DataFrame,
    idx_col: str,
    val_col: str,
    label_col: str,
    p: int,
    alpha: float = 1.0,
    nlambda: int = 20,
    lambda_min_ratio: float = 1e-2,
    lambdas=None,
    standardize: bool = True,
    intercept: bool = True,
    thresh: float = 1e-6,
    maxit: int = 500,
    collect_max_cells: float = 3e8,
):
    """Elastic-net gaussian path on sparse (indices, values) rows.

    The sparse twin of sgdnet(family='gaussian') for very wide feature
    spaces (hashed text features, n-gram spaces): nnz-cost passes, O(p)
    driver state.
    """
    from sgdnet_spark.glm import path as path_mod
    from sgdnet_spark.glm.sgdnet import SgdnetFit

    xy = assemble_sparse(df, idx_col, val_col, label_col)
    spark_prov = prov = SparseSparkXY(xy, p)
    prov.cache()
    try:
        mom = prov.moments_diag()
        if mom.n * p <= collect_max_cells:
            # small data: densify to the numpy provider so each FISTA
            # iteration is a numpy call, not a Spark job
            from sgdnet_spark.glm.providers import LocalXY

            pdf = prov.xy.toPandas()
            x = np.zeros((len(pdf), p))
            for r, (ii, vv) in enumerate(zip(pdf[IDX_COL], pdf[VAL_COL])):
                x[r, np.asarray(ii, dtype=int)] = np.asarray(vv, dtype=float)
            local = LocalXY(x, pdf[LBL_COL].to_numpy(dtype=float))
            local.passes = prov.passes
            prov.unpersist()
            prov = local
        res = path_mod.gaussian_path_fista(
            prov, alpha=alpha, nlambda=nlambda, lambda_min_ratio=lambda_min_ratio,
            lambdas=lambdas, standardize=standardize, intercept=intercept,
            thresh=thresh, maxit=maxit, mom=mom,
        )
    finally:
        spark_prov.unpersist()
    return SgdnetFit(
        family="gaussian", alpha=alpha, lambdas=res.lambdas, a0=res.a0, beta=res.beta,
        df=res.df, dev_ratio=res.dev_ratio, nulldev=res.nulldev, npasses=res.npasses,
        nobs=mom.n, feature_names=[f"f{i}" for i in range(p)],
        intercept=intercept, standardize=standardize,
    )


class SparseSparkXY:
    """Provider for (indices, values) sparse rows; wide-p FISTA only.

    Centering trick: with x~ = (x - m)/s, X~'r = diag(1/s)(X'r - m * Σr)
    and eta = X(beta/s) - <m, beta/s> + b0 — only nnz work per pass.
    """

    def __init__(self, xy: DataFrame, p: int):
        self.xy = xy
        self.p = p
        self.k = 1
        self.n: int | None = None
        self.passes = 0
        self._cached = False

    def cache(self):
        if not self._cached:
            self.xy = self.xy.persist()
            self._cached = True

    def unpersist(self):
        if self._cached:
            self.xy.unpersist()
            self._cached = False

    def moments_diag(self) -> Moments:
        self.passes += 1
        mom = moments_diag_sparse(self.xy, self.p)
        self.n = mom.n
        return mom

    def moments(self) -> Moments:
        return self.moments_diag()

    def set_standardization(self, x_mean, x_inv_std):
        self.x_mean = x_mean
        self.x_inv_std = x_inv_std

    def gradient_gaussian(self, coef: np.ndarray, intercept: float):
        self.passes += 1
        p = self.p
        scaled = coef * self.x_inv_std
        off = intercept - float(self.x_mean @ scaled)
        m = self.x_mean
        inv = self.x_inv_std

        def fn(idx, val, rows, indptr, y):
            eta = np.full(len(y), off)
            np.add.at(eta, rows, val * scaled[idx])
            r = eta - y
            xr = np.bincount(idx, weights=val * r[rows], minlength=p)
            sum_r = r.sum()
            g = (xr - m * sum_r) * inv
            return np.concatenate([g, [sum_r], [r @ r], [float(len(y))]])

        out = _sum_partials(self.xy, fn)
        n = out[-1]
        return out[:p] / n, out[p] / n, out[p + 1] / n
