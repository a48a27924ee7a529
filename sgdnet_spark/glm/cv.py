"""k-fold cross-validation — reference R/cv_sgdnet.R.

Folds are assigned with a deterministic content hash (xxhash64 of the
row, mod k) so results are reproducible and independent of partitioning
— the distributed stand-in for the reference's ``sample()`` foldid.
Each (alpha, fold) cell is a full path fit on the fold's complement;
at scale every fit is the usual aggregate-pass solver over a filtered
DataFrame, so folds never materialize.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sgdnet_spark.glm.score import score
from sgdnet_spark.glm.sgdnet import SgdnetFit, sgdnet

FOLD_COL = "__fold"


@dataclass
class CvSgdnetFit:
    """Reference cv_sgdnet return: alpha, lambda (per alpha), cv_summary
    (alpha, lambda, mean, sd, ci_lo, ci_up), cv_raw, name, fit (best-alpha
    full-data fit), alpha_min, lambda_min, lambda_1se."""

    alphas: list[float]
    lambdas: list[np.ndarray]
    cv_summary: list[dict]
    cv_raw: list[np.ndarray]
    name: str
    fit: SgdnetFit
    alpha_min: float
    lambda_min: float
    lambda_1se: float

    def summary_frame(self, spark) -> DataFrame:
        return spark.createDataFrame(
            self.cv_summary,
            schema="alpha double, lambda double, mean double, sd double, ci_lo double, ci_up double",
        )

    def _resolve_s(self, s):
        if s == "lambda_min" or s is None:
            return self.lambda_min
        if s == "lambda_1se":
            return self.lambda_1se
        return s

    def predict(self, newx: DataFrame, s="lambda_min", **kw) -> DataFrame:
        """reference predict.cv_sgdnet.R: s may be 'lambda_min'/'lambda_1se'."""
        return self.fit.predict(newx, s=self._resolve_s(s), **kw)

    def coef(self, s="lambda_min"):
        return self.fit.coef(self._resolve_s(s))

    def __repr__(self) -> str:
        return (
            f"cv_sgdnet: measure={self.name} alphas={self.alphas} "
            f"alpha_min={self.alpha_min} lambda_min={self.lambda_min:.6g} "
            f"lambda_1se={self.lambda_1se:.6g}"
        )


MEASURE_NAMES = {
    "deviance": "Deviance",
    "mse": "Mean-Squared Error",
    "mae": "Mean Absolute Error",
    "class": "Misclassification Error",
    "auc": "AUC",
}


def cv_sgdnet(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str | Sequence[str],
    family: str = "gaussian",
    alpha: float | Sequence[float] = 1.0,
    lambdas=None,
    nfolds: int = 10,
    foldid_col: str | None = None,
    type_measure: str = "deviance",
    seed: int = 42,
    **fit_kwargs,
) -> CvSgdnetFit:
    if nfolds <= 2:
        raise ValueError("nfolds must be greater than 2")
    alphas = [float(a) for a in (alpha if isinstance(alpha, (list, tuple, np.ndarray)) else [alpha])]

    if foldid_col is None:
        fold_expr = F.pmod(
            F.xxhash64(F.struct(*[F.col(c) for c in df.columns]), F.lit(seed)), F.lit(nfolds)
        ).cast("int")
        df = df.withColumn(FOLD_COL, fold_expr)
        foldid_col = FOLD_COL
    df = df.persist()
    try:
        folds = [r[0] for r in df.select(foldid_col).distinct().collect()]
        nfolds = len(folds)

        # full-data fit per alpha defines each path's lambdas
        full_fits = [
            sgdnet(df, feature_cols, label_col, family=family, alpha=a, lambdas=lambdas, **fit_kwargs)
            for a in alphas
        ]
        lam_lists = [f.lambdas for f in full_fits]

        cv_raw: list[np.ndarray] = []
        for a, lams in zip(alphas, lam_lists):
            raw = np.full((nfolds, len(lams)), np.nan)
            for j, fold in enumerate(sorted(folds)):
                train = df.filter(F.col(foldid_col) != fold)
                test = df.filter(F.col(foldid_col) == fold)
                fit_j = sgdnet(
                    train, feature_cols, label_col, family=family, alpha=a,
                    lambdas=lams, **fit_kwargs,
                )
                raw[j, :] = score(fit_j, test, feature_cols, label_col, type_measure, s=lams)
            cv_raw.append(raw)
    finally:
        df.unpersist()

    cv_summary: list[dict] = []
    optima = []
    for a, lams, raw in zip(alphas, lam_lists, cv_raw):
        mean = np.nanmean(raw, axis=0)
        sd = np.nanstd(raw, axis=0, ddof=1)
        for i, lam in enumerate(lams):
            cv_summary.append(
                dict(alpha=a, **{"lambda": float(lam)}, mean=float(mean[i]), sd=float(sd[i]),
                     ci_lo=float(mean[i] - sd[i]), ci_up=float(mean[i] + sd[i]))
            )
        crit = -mean if type_measure == "auc" else mean
        imin = int(np.argmin(crit))
        within = crit <= crit[imin] + sd[imin]
        optima.append(
            dict(alpha=a, lambda_min=float(lams[imin]), lambda_1se=float(np.max(lams[within])),
                 error=float(crit[imin]))
        )

    best = int(np.argmin([o["error"] for o in optima]))
    name = MEASURE_NAMES[type_measure]
    if type_measure == "deviance":
        name = {
            "gaussian": "Mean-Squared Error",
            "mgaussian": "Mean-Squared Error",
            "binomial": "Binomial Deviance",
            "multinomial": "Multinomial Deviance",
        }[family]

    return CvSgdnetFit(
        alphas=alphas,
        lambdas=list(lam_lists),
        cv_summary=cv_summary,
        cv_raw=cv_raw,
        name=name,
        fit=full_fits[best],
        alpha_min=optima[best]["alpha"],
        lambda_min=optima[best]["lambda_min"],
        lambda_1se=optima[best]["lambda_1se"],
    )
