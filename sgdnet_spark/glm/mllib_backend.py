"""Spark MLlib elastic-net backend (cross-check / alternative engine).

MLlib's LinearRegression & LogisticRegression minimize the same
glmnet-parameterized objective our native solver does
(1/(2n)·RSS resp. -1/n·loglik + lam*(alpha*L1 + (1-alpha)/2*L2)),
so coefficients at matching (lambda, alpha) agree to solver tolerance.
Used in tests as an independent implementation — call ``mllib_path()``
directly for JVM-side optimization of a fixed lambda grid (it is not a
``sgdnet(solver=...)`` option: it returns bare (a0, beta) arrays, not a
full path fit).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import LinearRegression
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mllib_path(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    family: str,
    alpha: float,
    lambdas: Sequence[float],
    standardize: bool = True,
    intercept: bool = True,
    tol: float = 1e-8,
    maxit: int = 200,
) -> tuple[np.ndarray, np.ndarray]:
    """Fit one model per lambda; returns (a0 (nl,), beta (p, nl)).

    MLlib has no warm-started path API, so this is nl independent fits —
    fine for cross-checking, wasteful vs the native path solver.
    """
    if family not in ("gaussian", "binomial"):
        raise ValueError("mllib backend supports gaussian and binomial")
    asm = VectorAssembler(inputCols=list(feature_cols), outputCol="__mllib_feat")
    dfv = asm.transform(df.select(*feature_cols, F.col(label_col).cast("double").alias("__y")))
    dfv = dfv.select("__mllib_feat", "__y").persist()
    try:
        p = len(feature_cols)
        nl = len(lambdas)
        a0 = np.zeros(nl)
        beta = np.zeros((p, nl))
        # glmnet->MLlib penalty conversion (empirically verified in tests):
        # MLlib's L1 axis equals glmnet's lambda, but its L2 axis is scaled
        # by sigma_y (the internal label standardization divides only the
        # quadratic term's effective penalty). Encode both via per-lambda
        # (regParam, elasticNetParam).
        sy = 1.0
        if family == "gaussian":
            sy = float(dfv.agg(F.stddev_pop("__y")).first()[0])
        for i, lam in enumerate(lambdas):
            l1 = float(lam) * alpha
            l2 = float(lam) * (1.0 - alpha) * sy
            reg = l1 + l2
            enp = l1 / reg if reg > 0 else 0.0
            cls = LinearRegression if family == "gaussian" else LogisticRegression
            est = cls(
                featuresCol="__mllib_feat", labelCol="__y",
                elasticNetParam=enp, regParam=reg,
                standardization=standardize, fitIntercept=intercept,
                tol=tol, maxIter=maxit,
            )
            model = est.fit(dfv)
            a0[i] = float(model.intercept)
            beta[:, i] = np.asarray(model.coefficients.toArray())
        return a0, beta
    finally:
        dfv.unpersist()
