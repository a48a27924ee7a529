"""Distributed sufficient statistics for GLM fitting.

This is the scale-critical layer (SURVEY.md §3). The reference
(src/saga-dense.h) iterates sample-by-sample on one machine; here every
solver consumes *aggregates* whose size depends only on p (features) and
k (responses), never on n:

- ``moments_and_gram``  : one pass -> n, Σx, Σy, ΣxxT, Σxy, Σyy
- ``weighted_quadratic``: one pass per IRLS step -> Σw, Σw·x, Σw·x xT, Σw·x·z, ...

Each pass is a ``mapInPandas`` over flat double feature columns
(x0..x{p-1}, y0..y{k-1}): Arrow-batched numpy matmuls per partition
(map-side combine), one packed partial row per partition, summed on the
driver. At 100 TB this is a single narrow scan + a ~p² byte combine —
no shuffle of row data at all.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURES_COL = "__features"  # legacy name, kept for callers
LABEL_COL = "__label"


def xcols(p: int) -> list[str]:
    return [f"x{i}" for i in range(p)]


def ycols(k: int) -> list[str]:
    return [f"y{i}" for i in range(k)]


def assemble(
    df: DataFrame, feature_exprs, label_exprs=None, weight_expr=None, offset_expr=None
) -> DataFrame:
    """Project to flat double columns x0..x{p-1}, y0..y{k-1} [, w, o].

    Flat columns (not array<double>) keep the Arrow transfer columnar:
    pandas sees a (n, p) float block, no per-row list objects — a ~10x
    difference on wide collects. Column pruning reaches the parquet scan.

    ``weight_expr`` (if given) should already be rescaled by the caller
    so the weights average 1 over the data (glmnet's convention: weights
    sum to n) — every downstream /n then yields the correct weighted
    mean with no kernel-side renormalization. ``offset_expr`` is the
    per-row linear-predictor offset for binomial/poisson fits; a LIST of
    k expressions is the n×k multinomial offset (one column per class,
    sorted-class order), materialized as o0..o{k-1}.
    """
    # NULL x/y values coalesce to NaN so EVERY execution strategy sees
    # the same poison: F.sum skips NULL (the JVM-agg path would silently
    # return biased moments over fewer rows than n counts) but
    # propagates NaN, matching what the Arrow/pandas paths produce when
    # they convert NULL to NaN — a fit on NULL-bearing features now
    # visibly NaNs out everywhere instead of differing by strategy.
    nan = F.lit(float("nan"))
    cols = []
    for i, e in enumerate(feature_exprs):
        c = F.col(e) if isinstance(e, str) else e
        cols.append(F.coalesce(c.cast("double"), nan).alias(f"x{i}"))
    if label_exprs is not None:
        for i, e in enumerate(label_exprs):
            c = F.col(e) if isinstance(e, str) else e
            cols.append(F.coalesce(c.cast("double"), nan).alias(f"y{i}"))
    if weight_expr is not None:
        c = F.col(weight_expr) if isinstance(weight_expr, str) else weight_expr
        cols.append(c.cast("double").alias("w"))
    if offset_expr is not None:
        if isinstance(offset_expr, (list, tuple)):
            for i, e in enumerate(offset_expr):
                c = F.col(e) if isinstance(e, str) else e
                cols.append(c.cast("double").alias(f"o{i}"))
        else:
            c = F.col(offset_expr) if isinstance(offset_expr, str) else offset_expr
            cols.append(c.cast("double").alias("o"))
    return df.select(*cols)


def _batch_xy(pdf: pd.DataFrame, p: int, k: int) -> tuple[np.ndarray, np.ndarray | None]:
    x = pdf[xcols(p)].to_numpy(dtype=np.float64, copy=False)
    y = pdf[ycols(k)].to_numpy(dtype=np.float64, copy=False) if k else None
    return x, y


def _offset_array(pdf: pd.DataFrame) -> np.ndarray | None:
    """The offset column(s) assemble() materialized, as a numpy array:
    'o' for a single per-row offset, o0..o{k-1} for the n×k multivariate
    form, None if the fit has no offset. The ONE place that mirrors
    assemble()'s offset naming — shared by the Arrow batch path and the
    driver collect path so they cannot drift."""
    if "o" in pdf.columns:
        return pdf["o"].to_numpy(dtype=np.float64, copy=False)
    if "o0" in pdf.columns:
        ko = 0
        while f"o{ko}" in pdf.columns:
            ko += 1
        return pdf[[f"o{i}" for i in range(ko)]].to_numpy(dtype=np.float64, copy=False)
    return None


def _batch_wo(pdf: pd.DataFrame) -> tuple[np.ndarray | None, np.ndarray | None]:
    w = pdf["w"].to_numpy(dtype=np.float64, copy=False) if "w" in pdf.columns else None
    return w, _offset_array(pdf)


def _sum_partials(df: DataFrame, fn, p: int, k: int) -> np.ndarray:
    """Run ``fn(x, y, w, o) -> 1-d partial vector`` per Arrow batch and
    sum (w/o are None when the columns are absent — every kernel takes
    all four).

    One packed partial row per partition; the combine on the driver sums
    #partitions vectors of O(p^2) floats — independent of n.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x, y = _batch_xy(pdf, p, k)
            w, o = _batch_wo(pdf)
            part = fn(x, y, w, o)
            acc = part if acc is None else acc + part
        if acc is not None:
            yield pd.DataFrame({"partial": [acc.tolist()]})

    rows = df.mapInPandas(run, schema="partial array<double>").collect()
    if not rows:
        raise ValueError("empty input: no rows to aggregate")
    return np.sum([np.asarray(r["partial"]) for r in rows], axis=0)


@dataclass
class Moments:
    """First/second raw moments of (X, Y) — everything a gaussian path needs."""

    n: int
    sum_x: np.ndarray  # (p,)
    sum_y: np.ndarray  # (k,)
    sum_xx: np.ndarray  # (p, p)
    sum_xy: np.ndarray  # (p, k)
    sum_yy: np.ndarray  # (k,)

    @property
    def x_mean(self) -> np.ndarray:
        return self.sum_x / self.n

    @property
    def y_mean(self) -> np.ndarray:
        return self.sum_y / self.n

    def xx_diag(self) -> np.ndarray:
        # diag-only moments (wide-p path) store sum_xx as the 1-D
        # diagonal itself — a dense np.diag(p×p) would be 80 GB at
        # p=100k on the exact path that exists to avoid p²
        return self.sum_xx if self.sum_xx.ndim == 1 else self.sum_xx.diagonal()

    def x_std(self) -> np.ndarray:
        # population (1/n) std, as reference utils.h:Mean/StandardDeviation
        var = self.xx_diag() / self.n - self.x_mean**2
        return np.sqrt(np.maximum(var, 0.0))

    def y_std(self) -> np.ndarray:
        var = self.sum_yy / self.n - self.y_mean**2
        return np.sqrt(np.maximum(var, 0.0))


def moments_jvm(xy: DataFrame, p: int, k: int) -> Moments:
    """Moments via pure JVM aggregation (whole-stage codegen, no Python
    workers). Preferred for small/medium p; the agg list is
    O(p^2 / 2 + p*k) expressions. A ``w`` column (mean-1 sample weights,
    see ``assemble``) turns every sum into its weighted twin while ``n``
    stays the row count — the glmnet weights-sum-to-n convention."""
    w = F.col("w") if "w" in xy.columns else F.lit(1.0)
    aggs = [F.count("*").alias("n")]
    aggs += [F.sum(w * F.col(f"x{i}")).alias(f"sx{i}") for i in range(p)]
    aggs += [F.sum(w * F.col(f"y{i}")).alias(f"sy{i}") for i in range(k)]
    for i in range(p):
        for j in range(i, p):
            aggs.append(F.sum(w * F.col(f"x{i}") * F.col(f"x{j}")).alias(f"sxx{i}_{j}"))
    for i in range(p):
        for j in range(k):
            aggs.append(F.sum(w * F.col(f"x{i}") * F.col(f"y{j}")).alias(f"sxy{i}_{j}"))
    aggs += [F.sum(w * F.col(f"y{i}") * F.col(f"y{i}")).alias(f"syy{i}") for i in range(k)]
    row = xy.agg(*aggs).first()
    n = int(row["n"])
    if n == 0:
        raise ValueError("empty input: no rows to aggregate")
    sum_x = np.array([row[f"sx{i}"] for i in range(p)], dtype=np.float64)
    sum_y = np.array([row[f"sy{i}"] for i in range(k)], dtype=np.float64)
    sum_xx = np.zeros((p, p))
    for i in range(p):
        for j in range(i, p):
            sum_xx[i, j] = sum_xx[j, i] = row[f"sxx{i}_{j}"]
    sum_xy = np.array([[row[f"sxy{i}_{j}"] for j in range(k)] for i in range(p)], dtype=np.float64)
    sum_yy = np.array([row[f"syy{i}"] for i in range(k)], dtype=np.float64)
    return Moments(n, sum_x, sum_y, sum_xx, sum_xy, sum_yy)


def moments_and_gram(xy: DataFrame, p: int, k: int) -> Moments:
    """One distributed pass -> raw moments (n, Σx, Σy, ΣxxT, Σxy, Σyy);
    weighted when a ``w`` column is present (mean-1 weights, n = count)."""

    def fn(x: np.ndarray, y: np.ndarray | None, w, o) -> np.ndarray:
        if y is None:
            y = np.zeros((x.shape[0], k))
        xw = x if w is None else x * w[:, None]
        yw = y if w is None else y * w[:, None]
        return np.concatenate(
            [
                [float(x.shape[0])],
                xw.sum(axis=0),
                yw.sum(axis=0),
                (xw.T @ x).ravel(),
                (xw.T @ y).ravel(),
                (yw * y).sum(axis=0),
            ]
        )

    out = _sum_partials(xy, fn, p, k)
    i = 0
    n = int(round(out[0])); i += 1
    sum_x = out[i : i + p]; i += p
    sum_y = out[i : i + k]; i += k
    sum_xx = out[i : i + p * p].reshape(p, p); i += p * p
    sum_xy = out[i : i + p * k].reshape(p, k); i += p * k
    sum_yy = out[i : i + k]
    return Moments(n, sum_x, sum_y, sum_xx, sum_xy, sum_yy)


def moments_diag(xy: DataFrame, p: int, k: int) -> Moments:
    """O(p) moments (no p×p Gram): n, Σx, Σx² (diag only), Σy, Σxy, Σy².

    The wide-p path needs means/stds/X'y but must never materialize p².
    Returned as a Moments whose sum_xx is DIAGONAL-only (off-diagonals
    zero) — callers on this path use x_std()/x_mean/sum_xy exclusively.
    """

    def fn(x: np.ndarray, y: np.ndarray | None, w, o) -> np.ndarray:
        xw = x if w is None else x * w[:, None]
        yw = y if w is None else y * w[:, None]
        return np.concatenate(
            [
                [float(x.shape[0])],
                xw.sum(axis=0),
                (xw * x).sum(axis=0),
                yw.sum(axis=0),
                (xw.T @ y).ravel(),
                (yw * y).sum(axis=0),
            ]
        )

    out = _sum_partials(xy, fn, p, k)
    i = 0
    n = int(round(out[0])); i += 1
    sum_x = out[i : i + p]; i += p
    sum_xsq = out[i : i + p]; i += p
    sum_y = out[i : i + k]; i += k
    sum_xy = out[i : i + p * k].reshape(p, k); i += p * k
    sum_yy = out[i : i + k]
    # 1-D diagonal, NOT np.diag(...): the dense matrix is p² bytes
    return Moments(n, sum_x, sum_y, sum_xsq, sum_xy, sum_yy)


def gradient_gaussian(
    xy: DataFrame,
    p: int,
    coef: np.ndarray,
    intercept: float,
    x_mean: np.ndarray,
    x_inv_std: np.ndarray,
) -> tuple[np.ndarray, float, float]:
    """One pass -> (X~'r/n, sum_r/n, rss/n) with r = X~ coef + b0 - y.

    The wide-p gaussian path (FISTA) uses this instead of the p² Gram:
    memory O(p), passes O(iterations). Standardization folds in
    algebraically as in the IRLS passes.
    """
    scaled = coef * x_inv_std
    off = intercept - float(x_mean @ scaled)

    def fn(x: np.ndarray, y: np.ndarray | None, w, o) -> np.ndarray:
        r = x @ scaled + off - y[:, 0]
        rw = r if w is None else r * w
        xs = (x - x_mean) * x_inv_std
        return np.concatenate([xs.T @ rw, [rw.sum()], [rw @ r], [float(len(r))]])

    out = _sum_partials(xy, fn, p, 1)
    n = out[-1]
    return out[:p] / n, out[p] / n, out[p + 1] / n


def cov_vec(
    xy: DataFrame,
    p: int,
    v: np.ndarray,
    x_mean: np.ndarray,
    x_inv_std: np.ndarray,
) -> np.ndarray:
    """One pass -> standardized Gram-vector product Cv (power iteration
    for Lipschitz estimates on the wide-p paths — O(p), never p²)."""
    scaled = v * x_inv_std
    off = -float(x_mean @ scaled)

    def fn(x: np.ndarray, y: np.ndarray | None, w, o) -> np.ndarray:
        u = x @ scaled + off
        if w is not None:
            u = u * w
        return np.concatenate([(x.T @ u - x_mean * u.sum()) * x_inv_std, [float(len(u))]])

    out = _sum_partials(xy, fn, p, 0)
    return out[:p] / out[-1]


def gradient_binomial(
    xy: DataFrame,
    p: int,
    coef: np.ndarray,
    b0: float,
    x_mean: np.ndarray,
    x_inv_std: np.ndarray,
) -> tuple[np.ndarray, float, float]:
    """One pass -> (X~'(mu-y)/n, mean(mu-y), loglik): the O(p) logistic
    gradient for the wide-p proximal path (no p² quadratic)."""
    scaled = coef * x_inv_std
    off = b0 - float(x_mean @ scaled)

    def fn(x: np.ndarray, y: np.ndarray | None, w, o) -> np.ndarray:
        yb = y[:, 0]
        eta = x @ scaled + off
        if o is not None:
            eta = eta + o
        mu = 1.0 / (1.0 + np.exp(-eta))
        r = mu - yb
        ll_terms = yb * eta - np.logaddexp(0.0, eta)
        if w is not None:
            r = r * w
            ll_terms = ll_terms * w
        ll = np.sum(ll_terms)
        return np.concatenate(
            [(x.T @ r - x_mean * r.sum()) * x_inv_std, [r.sum()], [ll], [float(len(yb))]]
        )

    out = _sum_partials(xy, fn, p, 1)
    n = out[-1]
    return out[:p] / n, out[p] / n, out[p + 1]


def gradient_poisson(
    xy: DataFrame,
    p: int,
    coef: np.ndarray,
    b0: float,
    x_mean: np.ndarray,
    x_inv_std: np.ndarray,
) -> tuple[np.ndarray, float, float]:
    """One pass -> (X~'w̃(mu-y)/n, mean resid, deviance) for the poisson
    log link — the O(p) gradient used by strong-rule screening."""
    scaled = coef * x_inv_std
    off = b0 - float(x_mean @ scaled)

    def fn(x: np.ndarray, y: np.ndarray | None, w, o) -> np.ndarray:
        yb = y[:, 0]
        eta = x @ scaled + off
        if o is not None:
            eta = eta + o
        mu = np.exp(eta)
        r = mu - yb
        with np.errstate(divide="ignore", invalid="ignore"):
            ylogy = np.where(yb > 0, yb * np.log(yb / np.maximum(mu, 1e-300)), 0.0)
        dev_terms = 2.0 * (ylogy - (yb - mu))
        if w is not None:
            r = r * w
            dev_terms = dev_terms * w
        return np.concatenate(
            [(x.T @ r - x_mean * r.sum()) * x_inv_std, [r.sum()], [dev_terms.sum()],
             [float(len(yb))]]
        )

    out = _sum_partials(xy, fn, p, 1)
    n = out[-1]
    return out[:p] / n, out[p] / n, out[p + 1]


def gradient_multinomial(
    xy: DataFrame,
    p: int,
    coefs: np.ndarray,  # (k, p) standardized scale
    b0s: np.ndarray,
    x_mean: np.ndarray,
    x_inv_std: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, float]:
    """One pass -> (X~'(P-Y)/n as (k,p), colmeans(P-Y), loglik); y
    arrives one-hot (n, k)."""
    k = coefs.shape[0]
    scaled = coefs * x_inv_std[None, :]
    offs = b0s - scaled @ x_mean

    def fn(x: np.ndarray, y: np.ndarray | None, w, o) -> np.ndarray:
        eta = x @ scaled.T + offs
        if o is not None:
            eta = eta + o  # (n, k) fixed multinomial offset
        mx = eta.max(axis=1, keepdims=True)
        e = np.exp(eta - mx)
        P = e / e.sum(axis=1, keepdims=True)
        R = P - y
        ll_terms = np.sum(y * np.log(np.maximum(P, 1e-300)), axis=1)
        if w is not None:
            R = R * w[:, None]
            ll_terms = ll_terms * w
        G = (x.T @ R - np.outer(x_mean, R.sum(axis=0))) * x_inv_std[:, None]
        ll = float(ll_terms.sum())
        return np.concatenate([G.T.ravel(), R.sum(axis=0), [ll], [float(len(eta))]])

    out = _sum_partials(xy, fn, p, k)
    n = out[-1]
    return out[: k * p].reshape(k, p) / n, out[k * p : k * p + k] / n, out[k * p + k]


def weighted_quadratic(
    xy: DataFrame,
    p: int,
    coef: np.ndarray,
    intercept: float,
    x_mean: np.ndarray,
    x_inv_std: np.ndarray,
    kind: str = "binomial",
    cols=None,
) -> tuple[float, np.ndarray, np.ndarray, np.ndarray, float, float]:
    """One IRLS pass for binomial or poisson: stats of the local
    quadratic model.

    Given current (coef, intercept) on the *standardized* scale, with
    IRLS weight ``wirls`` and working response ``z`` defined against the
    linear predictor EXCLUDING the fixed per-row offset (so the WLS
    solve targets coef/intercept only):

      binomial: mu = sigmoid(eta), wirls = mu(1-mu), z = eta-o + (y-mu)/wirls
      poisson:  mu = exp(eta),     wirls = mu,       z = eta-o + (y-mu)/mu

      returns (sum_w, sum_wx, sum_wxx, sum_wxz, sum_wz, fit_stat)

    fit_stat is the loglik for binomial and the (positive) deviance
    2 Σ w̃ [y log(y/mu) - (y-mu)] for poisson. Sample weights (mean-1
    ``w`` column) multiply both the IRLS weights and the fit statistic.
    All shaping is done with raw x batches; standardization folds in
    algebraically so no second materialized copy of the data is needed.

    ``cols`` (strong-rule screening) restricts the quadratic to a
    feature subset: coef is then |cols|-sized, the partial carries
    O(|S|²) floats instead of O(p²), and each batch slices its x block
    to the screened columns before any matmul.
    """
    p_full = p  # batch extraction always reads x0..x{p_full-1}
    if cols is not None:
        cols = np.asarray(cols, dtype=np.intp)
        x_mean = x_mean[cols]
        x_inv_std = x_inv_std[cols]
        p = len(cols)
    scaled = coef * x_inv_std  # apply to raw x
    off = intercept - float(x_mean @ scaled)

    def fn(x: np.ndarray, y: np.ndarray | None, sw, o) -> np.ndarray:
        if cols is not None:
            x = x[:, cols]
        yb = y[:, 0]
        eta_lin = x @ scaled + off
        eta = eta_lin if o is None else eta_lin + o
        if kind == "poisson":
            mu = np.exp(eta)
            w = np.maximum(mu, 1e-10)
            with np.errstate(divide="ignore", invalid="ignore"):
                ylogy = np.where(yb > 0, yb * np.log(yb / np.maximum(mu, 1e-300)), 0.0)
            stat_terms = 2.0 * (ylogy - (yb - mu))
        else:
            mu = 1.0 / (1.0 + np.exp(-eta))
            w = np.maximum(mu * (1.0 - mu), 1e-10)
            stat_terms = yb * eta - np.logaddexp(0.0, eta)
        z = eta_lin + (yb - mu) / w
        if sw is not None:
            w = w * sw
            stat_terms = stat_terms * sw
        xs = (x - x_mean) * x_inv_std
        xw = xs * w[:, None]
        return np.concatenate(
            [
                [w.sum()],
                xw.sum(axis=0),
                (xw.T @ xs).ravel(),
                xw.T @ z,
                [(w * z).sum()],
                [stat_terms.sum()],
            ]
        )

    out = _sum_partials(xy, fn, p_full, 1)
    i = 0
    sum_w = out[0]; i += 1
    sum_wx = out[i : i + p]; i += p
    sum_wxx = out[i : i + p * p].reshape(p, p); i += p * p
    sum_wxz = out[i : i + p]; i += p
    sum_wz = out[i]; i += 1
    loglik = out[i]
    return sum_w, sum_wx, sum_wxx, sum_wxz, sum_wz, loglik


def multinomial_class_stats(x, y, coefs, intercepts, x_mean, x_inv_std, sw=None, o=None):
    """Per-batch numpy kernel: IRLS quadratic stats for ALL classes at the
    current coefficients (block-diagonal Newton — one data pass serves
    every class update). Returns a packed 1-d partial. ``sw`` (mean-1
    sample weights) multiplies the IRLS weights and the loglik terms.
    ``o`` is the optional n×k fixed offset: it enters every eta, and the
    working response targets eta MINUS the offset so the WLS solve fits
    coef/intercept only (same convention as weighted_quadratic)."""
    scaled = coefs * x_inv_std[None, :]
    offs = intercepts - scaled @ x_mean
    eta = x @ scaled.T + offs  # (n, k)
    if o is not None:
        eta = eta + o
    m = eta.max(axis=1, keepdims=True)
    e = np.exp(eta - m)
    prob = e / e.sum(axis=1, keepdims=True)
    xs = (x - x_mean) * x_inv_std
    k = coefs.shape[0]
    ll_terms = np.sum(y * np.log(np.maximum(prob, 1e-300)), axis=1)
    if sw is not None:
        ll_terms = ll_terms * sw
    parts = [np.array([ll_terms.sum()])]
    for cls in range(k):
        yk = y[:, cls]
        pk = prob[:, cls]
        w = np.maximum(pk * (1.0 - pk), 1e-10)
        z = (eta[:, cls] if o is None else eta[:, cls] - o[:, cls]) + (yk - pk) / w
        if sw is not None:
            w = w * sw
        xw = xs * w[:, None]
        parts.append(
            np.concatenate(
                [[w.sum()], xw.sum(axis=0), (xw.T @ xs).ravel(), xw.T @ z, [(w * z).sum()]]
            )
        )
    return np.concatenate(parts)


def _unpack_class_stats(out: np.ndarray, p: int, k: int):
    ll = out[0]
    stats = []
    stride = 1 + p + p * p + p + 1
    i = 1
    for _ in range(k):
        j = i
        sum_w = out[j]; j += 1
        sum_wx = out[j : j + p]; j += p
        sum_wxx = out[j : j + p * p].reshape(p, p); j += p * p
        sum_wxz = out[j : j + p]; j += p
        sum_wz = out[j]
        stats.append((sum_w, sum_wx, sum_wxx, sum_wxz, sum_wz))
        i += stride
    return stats, ll


def weighted_quadratic_multinomial_all(
    xy: DataFrame,
    p: int,
    coefs: np.ndarray,  # (k, p) standardized scale
    intercepts: np.ndarray,  # (k,)
    x_mean: np.ndarray,
    x_inv_std: np.ndarray,
):
    """ONE distributed pass -> IRLS stats for every class + loglik."""
    k = coefs.shape[0]

    def fn(x: np.ndarray, y: np.ndarray | None, w, o) -> np.ndarray:
        return multinomial_class_stats(x, y, coefs, intercepts, x_mean, x_inv_std, sw=w, o=o)

    out = _sum_partials(xy, fn, p, k)
    return _unpack_class_stats(out, p, k)


def collect_xy(
    xy: DataFrame, p: int, k: int, max_cells: float = 3e8
) -> tuple[np.ndarray, np.ndarray | None, np.ndarray | None, np.ndarray | None] | None:
    """Driver fast path: pull (X, Y[, w, o]) as numpy when n*(p+k) is
    small enough.

    Returns None when the data is too big — callers then stay on the
    distributed pass-per-iteration path. (The equivalent of Spark MLlib
    deciding between normal-equation and L-BFGS solvers.)
    """
    if np.isfinite(max_cells):
        n = xy.count()
        if n == 0:
            raise ValueError("empty input")
        if n * (p + k) > max_cells:
            return None
    pdf = xy.toPandas()
    if len(pdf) == 0:
        raise ValueError("empty input")
    x = pdf[xcols(p)].to_numpy(dtype=np.float64)
    y = pdf[ycols(k)].to_numpy(dtype=np.float64) if k else None
    w = pdf["w"].to_numpy(dtype=np.float64) if "w" in pdf.columns else None
    return x, y, w, _offset_array(pdf)


def validate_weights_offsets(df, weights_col=None, offset_names=()):
    """ONE aggregation validating weights and offsets for fit input.

    F.sum/F.min silently skip NULLs, so an unchecked NULL weight/offset
    would reach the Arrow batches as NaN and poison every moment/IRLS
    aggregate into all-NaN coefficients with no error — this pass
    rejects NULL/NaN up front, enforces non-negative, not-all-zero
    weights, and returns the glmnet sum-to-n rescaled weight expression
    (None when no weights). Shared by the dense (sgdnet) and sparse
    (sgdnet_sparse) entry points so their input contracts cannot drift.
    """
    if weights_col is None and not offset_names:
        return None
    wc = F.col(weights_col).cast("double") if weights_col is not None else None
    aggs = [F.count("*").alias("n")]
    if wc is not None:
        aggs += [F.count(wc).alias("wn"), F.sum(wc).alias("W"),
                 F.min(wc).alias("wmin"), F.max(F.isnan(wc).cast("int")).alias("wnan"),
                 F.max(wc).alias("wmax")]
    for i, name in enumerate(offset_names):
        oc = F.col(name).cast("double")
        aggs += [F.count(oc).alias(f"on{i}"),
                 F.max(F.isnan(oc).cast("int")).alias(f"onan{i}"),
                 F.max(F.abs(oc)).alias(f"oabs{i}")]
    vrow = df.agg(*aggs).first()
    if vrow["n"] == 0:
        raise ValueError("the predictor matrix (x) is empty.")
    weight_expr = None
    if wc is not None:
        if vrow["wn"] != vrow["n"] or vrow["wnan"]:
            raise ValueError(
                f"weights_col '{weights_col}' contains NULL/NaN values; "
                "filter or impute them before fitting"
            )
        if float(vrow["wmin"]) < 0:
            raise ValueError("sample weights must be non-negative")
        if not np.isfinite(float(vrow["wmax"])):
            # an inf weight makes W=inf, so the sum-to-n rescale factor
            # n/W is 0.0 — every finite weight silently becomes zero and
            # the fit goes all-NaN with no error (the local fast path
            # already rejects non-finite weights; keep the strategies in
            # lockstep)
            raise ValueError(
                f"weights_col '{weights_col}' contains infinite values; "
                "filter or cap them before fitting"
            )
        if float(vrow["W"]) <= 0:
            raise ValueError("sample weights must not all be zero")
        weight_expr = wc * F.lit(float(vrow["n"]) / float(vrow["W"]))
    for i, name in enumerate(offset_names):
        if vrow[f"on{i}"] != vrow["n"] or vrow[f"onan{i}"]:
            raise ValueError(
                f"offset_col '{name}' contains NULL/NaN values; "
                "filter or impute them before fitting"
            )
        if not np.isfinite(float(vrow[f"oabs{i}"])):
            raise ValueError(
                f"offset_col '{name}' contains infinite values; "
                "filter or cap them before fitting"
            )
    return weight_expr
