"""Model scoring along the lambda path — reference R/score.R.

Measures per family (reference cv_sgdnet.R "Measures" table):
  gaussian    : deviance(=mse), mse, mae
  binomial    : deviance, mse, mae, class, auc
  multinomial : deviance, mse, mae, class
  mgaussian   : deviance(=mse), mse, mae

``score`` works on a Spark DataFrame and is distributed for EVERY
(family, measure) combination: gaussian/binomial/multivariate measures
evaluate all nl lambdas in ONE aggregation pass over JVM prediction
expressions (no Python in the loop, no per-lambda scan); path AUC runs
as one histogram pass (explode to (lambda, prob-bin) keys, map-side
combined to nl×bins cells — n never reaches the driver).
``score_np`` remains as the numpy twin used by tests.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROB_MIN = 1e-05  # reference score.R:86
PROB_MAX = 1 - PROB_MIN


def eta_expr(weights: np.ndarray, cols: Sequence[str], offset_col: str | None = None):
    """Intercept-first weight vector -> JVM linear-predictor Column
    (zero coefficients skipped; optional offset column added). The ONE
    expression builder shared by score(), the per-class multivariate
    scorers, the path-AUC pass, and the CV gamma fast path — so
    offset/zero-coefficient handling cannot drift between them."""
    from sgdnet_spark.glm.sgdnet import colref

    e = F.lit(float(weights[0]))
    for w, c in zip(weights[1:], cols):
        if w != 0.0:
            e = e + F.lit(float(w)) * colref(c).cast("double")
    if offset_col is not None:
        e = e + colref(offset_col).cast("double")
    return e


def _auc(y: np.ndarray, prob: np.ndarray) -> float:
    """Mann-Whitney AUC (ties get midranks)."""
    order = np.argsort(prob, kind="mergesort")
    ranks = np.empty(len(prob), dtype=float)
    sorted_p = prob[order]
    i = 0
    r = 1.0
    while i < len(sorted_p):
        j = i
        while j + 1 < len(sorted_p) and sorted_p[j + 1] == sorted_p[i]:
            j += 1
        ranks[order[i : j + 1]] = (r + r + (j - i)) / 2.0
        r += j - i + 1
        i = j + 1
    npos = float(y.sum())
    nneg = float(len(y) - npos)
    if npos == 0 or nneg == 0:
        return float("nan")
    return (ranks[y == 1].sum() - npos * (npos + 1) / 2.0) / (npos * nneg)


def _hist_auc(pos: np.ndarray, n: np.ndarray) -> float:
    """Mann-Whitney AUC from a (bin-sorted) histogram with midranks."""
    neg = n - pos
    npos, nneg = pos.sum(), neg.sum()
    if npos == 0 or nneg == 0:
        return float("nan")
    below = np.concatenate([[0.0], np.cumsum(n)[:-1]])
    midrank = below + (n + 1) / 2.0
    rank_sum = float((midrank * pos).sum())
    return (rank_sum - npos * (npos + 1) / 2.0) / (npos * nneg)


def auc_distributed(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    bins: int = 1 << 16,
) -> float:
    """Histogram AUC: no global sort, one groupBy on the bin id.

    Probabilities are quantized to `bins` buckets; the Mann-Whitney
    statistic is computed exactly on the binned distribution (midranks
    within a bucket), so the approximation error is bounded by the mass
    of heterogeneous buckets — ≤ 1/bins in rank units. The aggregate is
    `bins`-sized regardless of n: the scale path for 100 TB scoring.
    """
    b = F.least(F.floor(F.col(prob_col) * bins), F.lit(bins - 1)).cast("long")
    y = F.col(label_col).cast("double")
    hist = (
        df.select(b.alias("b"), y.alias("y"))
        .groupBy("b")
        .agg(F.sum("y").alias("pos"), F.count("*").alias("n"))
        .orderBy("b")
        .collect()
    )
    pos = np.array([r["pos"] for r in hist], dtype=float)
    n = np.array([r["n"] for r in hist], dtype=float)
    return _hist_auc(pos, n)


def _binomial_y(label_col: str, cls) -> F.Column:
    """0/1 response from the label column, NaN-poisoned for NULL or
    out-of-class values — a bare otherwise(0.0) would silently score
    such rows as genuine negatives while training raises on them."""
    lbl = F.col(label_col)
    return (
        F.when(lbl == F.lit(cls[1]), 1.0)
        .when(lbl == F.lit(cls[0]), 0.0)
        .otherwise(F.lit(float("nan")))
    )


def auc_path_distributed(
    fit,
    df: DataFrame,
    cols,
    label_col: str,
    s=None,
    bins: int = 1 << 13,
    offset_col: str | None = None,
) -> np.ndarray:
    """AUC at EVERY lambda in one data pass (reference score.R
    type.measure='auc' along the path).

    Each row explodes to nl (lambda, score-bin) keys; the groupBy's
    map-side combine collapses them to ≤ nl×bins cells per task, so the
    shuffle and the driver see histogram cells, never rows — the
    100 TB-safe replacement for collecting the scoring fold. Scores are
    min-max-normalized per path point before binning (rank-preserving,
    so AUC is unchanged) to keep full bucket resolution even when a
    regularized point's probabilities cluster in a narrow range; the
    residual error is the within-bucket midrank approximation,
    ≤ 1/bins in rank units.
    """
    s_arr = fit.lambdas if s is None else np.atleast_1d(s)
    cf = fit.coef(s_arr)
    nl = cf.shape[-1]
    cls = fit.classnames
    y = _binomial_y(label_col, cls)

    def _eta(i: int) -> F.Column:
        return eta_expr(cf[:, i], cols, offset_col)

    # AUC is rank-based, so any strictly increasing transform of the
    # score preserves it — bin the min-max-normalized LINK per path
    # point rather than raw probabilities. A heavily regularized point
    # whose probabilities cluster in a sliver of [0,1] would otherwise
    # collapse into a handful of fixed-width buckets and the midrank
    # tie handling would bias the estimate. One extra tiny aggregation
    # (2·nl cells) buys full bucket resolution at every path point.
    rng = df.agg(*[m for i in range(nl) for m in
                   (F.min(_eta(i)).alias(f"lo{i}"), F.max(_eta(i)).alias(f"hi{i}"))]).first()
    if rng["lo0"] is None:
        # empty frame or all-NULL predictors: AUC is undefined — return
        # NaN like score_np/_auc rather than TypeError on float(None)
        return np.full(nl, np.nan)
    entries = []
    for i in range(nl):
        lo, hi = float(rng[f"lo{i}"]), float(rng[f"hi{i}"])
        span = (hi - lo) if hi > lo else 1.0
        b = F.least(F.floor((_eta(i) - F.lit(lo)) / F.lit(span) * bins), F.lit(bins - 1)).cast("long")
        b = F.greatest(b, F.lit(0))
        entries.append(F.struct(F.lit(i).alias("li"), b.alias("b")))
    hist = (
        df.select(F.explode(F.array(*entries)).alias("e"), y.alias("y"))
        .groupBy(F.col("e.li").alias("li"), F.col("e.b").alias("b"))
        .agg(F.sum("y").alias("pos"), F.count("*").alias("n"))
        .collect()
    )
    out = np.full(nl, np.nan)
    by_l: dict[int, list] = {}
    for r in hist:
        by_l.setdefault(int(r["li"]), []).append((int(r["b"]), float(r["pos"]), float(r["n"])))
    for li, cells in by_l.items():
        cells.sort()
        pos = np.array([c[1] for c in cells])
        n = np.array([c[2] for c in cells])
        out[li] = _hist_auc(pos, n)
    return out


def score_np(fit, x: np.ndarray, y: np.ndarray, type_measure: str = "deviance", s=None,
             offset: np.ndarray | None = None) -> np.ndarray:
    """Numpy scoring, mirrors score.R per family. ``offset`` is required
    when the fit was trained with offset_col (a fit's deviance/mse is
    meaningless without the training offset in the linear predictor)."""
    fam = fit.family
    if fit.offset and offset is None:
        raise ValueError("need 'offset' since offset was used in fit")
    s_arr = fit.lambdas if s is None else np.atleast_1d(s)
    nl = len(s_arr)

    if fam in ("gaussian",):
        yv = np.asarray(y, dtype=float).reshape(-1)
        eta = fit.predict_np(x, s=s_arr, offset=offset)  # (n, nl)
        diff = eta - yv[:, None]
        if type_measure in ("deviance", "mse"):
            return (diff**2).mean(axis=0)
        if type_measure == "mae":
            return np.abs(diff).mean(axis=0)
    elif fam == "poisson":
        yv = np.asarray(y, dtype=float).reshape(-1)
        mu = fit.predict_np(x, s=s_arr, type="response", offset=offset)  # (n, nl)
        if type_measure == "deviance":
            with np.errstate(divide="ignore", invalid="ignore"):
                ylogy = np.where(
                    yv[:, None] > 0,
                    yv[:, None] * np.log(yv[:, None] / np.maximum(mu, 1e-300)),
                    0.0,
                )
            return (2.0 * (ylogy - (yv[:, None] - mu))).mean(axis=0)
        if type_measure == "mse":
            return ((mu - yv[:, None]) ** 2).mean(axis=0)
        if type_measure == "mae":
            return np.abs(mu - yv[:, None]).mean(axis=0)
    elif fam == "mgaussian":
        yv = np.asarray(y, dtype=float)
        out = np.zeros(nl)
        for i, si in enumerate(s_arr):
            eta = fit.predict_np(x, s=si, offset=offset)[:, :, 0]  # (n, k)
            d = eta - yv
            out[i] = (d**2).sum(axis=1).mean() if type_measure in ("deviance", "mse") else np.abs(d).sum(axis=1).mean()
        return out
    elif fam == "binomial":
        cls = np.asarray(fit.classnames)
        yb = (np.asarray(y).reshape(-1) == cls[1]).astype(float) if y.dtype.kind in "OUS" else np.asarray(y, float).reshape(-1)
        prob = fit.predict_np(x, s=s_arr, type="response", offset=offset)  # (n, nl)
        if type_measure == "auc":
            return np.array([_auc(yb, prob[:, i]) for i in range(nl)])
        if type_measure == "mse":
            # reference score.R:101 two-column form == 2*(p - y)^2 pointwise
            return (((prob - yb[:, None]) ** 2) * 2).mean(axis=0)
        if type_measure == "mae":
            return (np.abs(prob - yb[:, None]) * 2).mean(axis=0)
        if type_measure == "deviance":
            pc = np.clip(prob, PROB_MIN, PROB_MAX)
            lp = yb[:, None] * np.log(pc) + (1 - yb[:, None]) * np.log(1 - pc)
            return (-2 * lp).mean(axis=0)
        if type_measure == "class":
            return ((prob > 0.5) != (yb[:, None] > 0.5)).mean(axis=0)
    elif fam == "multinomial":
        cls = np.asarray(fit.classnames)
        yi = np.searchsorted(cls, np.asarray(y).reshape(-1)) if y.dtype.kind in "OUS" else np.asarray(y, int).reshape(-1)
        onehot = np.eye(len(cls))[yi]
        out = np.zeros(nl)
        for i, si in enumerate(s_arr):
            prob = fit.predict_np(x, s=si, type="response", offset=offset)[:, :, 0]  # (n, k)
            if type_measure == "deviance":
                pc = np.clip(prob, PROB_MIN, PROB_MAX)
                out[i] = (-2 * (onehot * np.log(pc)).sum(axis=1)).mean()
            elif type_measure == "mse":
                out[i] = (((prob - onehot) ** 2).sum(axis=1) * 2).mean() / 2
            elif type_measure == "mae":
                out[i] = (np.abs(prob - onehot).sum(axis=1)).mean()
            elif type_measure == "class":
                out[i] = (prob.argmax(axis=1) != yi).mean()
        return out
    raise ValueError(f"unsupported (family={fam}, type.measure={type_measure})")


def _score_multinomial_distributed(fit, df, cols, label_col, type_measure, s,
                                   offset_cols=None):
    """Multinomial deviance/class/mse/mae in ONE aggregation pass:
    per-lambda per-class eta expressions -> softmax -> measure (all
    JVM-side; mirrors score_np's multinomial branch). ``offset_cols``
    is the n×k offset — one column per class, added to its eta."""
    s_arr = fit.lambdas if s is None else np.atleast_1d(s)
    cf = fit.coef(s_arr)  # (k, p+1, nl)
    k, _, nl = cf.shape
    classes = fit.classnames
    aggs = []
    for i in range(nl):
        etas = [
            eta_expr(cf[c, :, i], cols,
                     offset_cols[c] if offset_cols is not None else None)
            for c in range(k)
        ]
        mx = F.greatest(*etas) if k > 1 else etas[0]
        exps = [F.exp(e - mx) for e in etas]
        tot = exps[0]
        for e in exps[1:]:
            tot = tot + e
        if type_measure == "deviance":
            # -2 log p_trueclass, clamped as score.R
            ptrue = None
            for c, cls in enumerate(classes):
                pc = exps[c] / tot
                ptrue = F.when(F.col(label_col) == F.lit(cls), pc) if ptrue is None else ptrue.when(
                    F.col(label_col) == F.lit(cls), pc
                )
            # a label outside fit.classnames (or NULL) leaves the when
            # ladder NULL; greatest/least SKIP nulls, so the clamp would
            # silently turn it into PROB_MIN and charge the row the
            # maximum deviance. Poison to NaN AFTER the clamp (least()
            # would un-poison a NaN fed into it) so bad labels are
            # visible in the result instead of silently scored.
            pclamp = F.least(F.greatest(ptrue, F.lit(PROB_MIN)), F.lit(PROB_MAX))
            pclamp = F.when(ptrue.isNull(), F.lit(float("nan"))).otherwise(pclamp)
            aggs.append(F.avg(F.lit(-2.0) * F.log(pclamp)).alias(f"m{i}"))
        elif type_measure in ("mse", "mae"):
            # sum over classes of (p_c - onehot_c)^2 (resp. |.|), row-avg
            row_sum = None
            for c, cls in enumerate(classes):
                oh = F.when(F.col(label_col) == F.lit(cls), 1.0).otherwise(0.0)
                d = exps[c] / tot - oh
                term = d * d if type_measure == "mse" else F.abs(d)
                row_sum = term if row_sum is None else row_sum + term
            aggs.append(F.avg(row_sum).alias(f"m{i}"))
        else:  # class: misclassification rate via argmax over (eta, -class_idx)
            # the tie-break field must be the NEGATED index, compared
            # BEFORE the class string: struct ordering on (eta, cls)
            # would break eta ties toward the lexicographically LAST
            # class, diverging from score_np's argmax-first convention
            best = F.array(
                *[F.struct(e.alias("eta"), F.lit(-c).alias("ni"), F.lit(str(cl)).alias("cls"))
                  for c, (e, cl) in enumerate(zip(etas, classes))]
            )
            pred = F.array_max(best)["cls"]
            aggs.append(F.avg((pred != F.col(label_col).cast("string")).cast("double")).alias(f"m{i}"))
    row = df.agg(*aggs).first()
    return np.array([row[f"m{i}"] for i in range(nl)])


def _score_mgaussian_distributed(fit, df, cols, label_cols, type_measure, s,
                                 offset_cols=None):
    """mgaussian deviance(=mse)/mse/mae in ONE aggregation pass —
    per-response eta expressions, per-row sum over responses, avg.
    ``offset_cols`` is the n×k offset: one column per response, added to
    its eta (required for offset fits)."""
    from sgdnet_spark.glm.sgdnet import colref

    s_arr = fit.lambdas if s is None else np.atleast_1d(s)
    cf = fit.coef(s_arr)  # (k, p+1, nl)
    k, _, nl = cf.shape
    names = list(label_cols)
    aggs = []
    for i in range(nl):
        row_sum = None
        for c in range(k):
            e = eta_expr(cf[c, :, i], cols,
                         offset_cols[c] if offset_cols is not None else None)
            d = e - colref(names[c]).cast("double")
            term = d * d if type_measure in ("deviance", "mse") else F.abs(d)
            row_sum = term if row_sum is None else row_sum + term
        aggs.append(F.avg(row_sum).alias(f"m{i}"))
    row = df.agg(*aggs).first()
    return np.array([row[f"m{i}"] for i in range(nl)])


def score(
    fit,
    df: DataFrame,
    feature_cols: Sequence[str] | None = None,
    label_col: str | Sequence[str] | None = None,
    type_measure: str = "deviance",
    s=None,
    weights_col: str | None = None,
    offset_col: str | None = None,
) -> np.ndarray:
    """Score on a Spark DataFrame — every supported (family, measure)
    runs as distributed aggregation; nothing is collected to the driver
    beyond p- or histogram-sized results (reference score.R measures).

    ``weights_col`` (round-5 extension, glmnet semantics) turns every
    mean into the weighted mean Σw·term/Σw — supported for the
    gaussian/binomial/poisson single-aggregation measures; the
    multinomial/mgaussian distributed scorers and path AUC reject it.

    ``offset_col`` mirrors predict()'s ``newoffset``: REQUIRED when the
    fit was trained with offset_col (scoring an offset fit without the
    offset would silently return wrong deviance/mse/mae), added to
    every linear predictor before the link inversion."""
    # a STRING feature_cols names a single array<numeric> column (the
    # same convention as sgdnet()): expand to element references at the
    # fit's width — list(str) would split the name into characters
    if isinstance(feature_cols, str):
        cols = [f"{feature_cols}[{i}]" for i in range(len(fit.feature_names))]
    else:
        cols = list(feature_cols) if feature_cols else fit.feature_names
    fam = fit.family
    from sgdnet_spark.glm.sgdnet import colref

    if getattr(fit, "offset", False) and offset_col is None:
        raise ValueError("need 'offset_col' since offset was used in fit")
    if weights_col is not None and (
        fam in ("multinomial", "mgaussian") or (fam == "binomial" and type_measure == "auc")
    ):
        raise ValueError(
            f"weighted scoring is not supported for (family={fam}, "
            f"type.measure={type_measure})"
        )
    if fam == "multinomial":
        if type_measure not in ("deviance", "class", "mse", "mae"):
            raise ValueError(f"unsupported (family={fam}, type.measure={type_measure})")
        if offset_col is not None and (
            isinstance(offset_col, str)
            or len(offset_col) != len(fit.classnames or [])
        ):
            raise ValueError(
                "multinomial offset_col must be a sequence of one column per "
                f"class {fit.classnames}"
            )
        return _score_multinomial_distributed(fit, df, cols, label_col, type_measure, s,
                                              offset_cols=offset_col)
    if fam == "mgaussian":
        if type_measure not in ("deviance", "mse", "mae"):
            raise ValueError(f"unsupported (family={fam}, type.measure={type_measure})")
        if offset_col is not None and (
            isinstance(offset_col, str)
            or len(offset_col) != len(fit.response_names or [])
        ):
            raise ValueError(
                "mgaussian offset_col must be a sequence of one column per "
                f"response {fit.response_names}"
            )
        if isinstance(label_col, str):
            raise ValueError(
                "mgaussian label_col must be a sequence of one column per "
                f"response {fit.response_names} (a bare string would be "
                "split into characters)"
            )
        labels = fit.response_names if label_col is None else list(label_col)
        return _score_mgaussian_distributed(fit, df, cols, labels, type_measure, s,
                                            offset_cols=offset_col)
    if fam == "binomial" and type_measure == "auc":
        return auc_path_distributed(fit, df, cols, label_col, s=s, offset_col=offset_col)
    if type_measure not in ("deviance", "mse", "mae", "class") or (
        fam in ("gaussian", "poisson") and type_measure == "class"
    ):
        raise ValueError(f"unsupported (family={fam}, type.measure={type_measure})")

    s_arr = fit.lambdas if s is None else np.atleast_1d(s)
    cf = fit.coef(s_arr)
    nl = cf.shape[-1]
    cls = fit.classnames
    if fam == "binomial":
        ycol = _binomial_y(label_col, cls)
    else:
        ycol = F.col(label_col).cast("double")

    if weights_col is None:
        _mean = F.avg
    else:
        wcol = F.col(weights_col).cast("double")

        def _mean(t):
            # denominator counts only rows whose term is non-NULL: F.sum
            # skips NULL terms in the numerator, so including their
            # weights below would silently bias every weighted score low
            return F.sum(wcol * t) / F.sum(F.when(t.isNotNull(), wcol))

    aggs = []
    for i in range(nl):
        eta = eta_expr(cf[:, i], cols, offset_col)
        if fam == "gaussian":
            d = eta - ycol
            expr = _mean(d * d) if type_measure in ("deviance", "mse") else _mean(F.abs(d))
        elif fam == "poisson":
            mu = F.exp(eta)
            if type_measure == "deviance":
                ylogy = F.when(ycol > 0, ycol * F.log(ycol / mu)).otherwise(F.lit(0.0))
                expr = _mean(F.lit(2.0) * (ylogy - (ycol - mu)))
            elif type_measure == "mse":
                expr = _mean((mu - ycol) * (mu - ycol))
            else:
                expr = _mean(F.abs(mu - ycol))
        else:
            prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
            if type_measure == "deviance":
                pc = F.least(F.greatest(prob, F.lit(PROB_MIN)), F.lit(PROB_MAX))
                expr = _mean(F.lit(-2.0) * (ycol * F.log(pc) + (F.lit(1.0) - ycol) * F.log(F.lit(1.0) - pc)))
            elif type_measure == "mse":
                expr = _mean((prob - ycol) * (prob - ycol) * F.lit(2.0))
            elif type_measure == "mae":
                expr = _mean(F.abs(prob - ycol) * F.lit(2.0))
            else:  # class
                expr = _mean(((prob > 0.5).cast("double") - ycol) * ((prob > 0.5).cast("double") - ycol))
        aggs.append(expr.alias(f"m{i}"))
    row = df.agg(*aggs).first()
    return np.array([row[f"m{i}"] for i in range(nl)])
