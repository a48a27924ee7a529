"""Sample weights, offsets, and the poisson family — extensions beyond
the reference surface (R/sgdnet.R:341 leaves offset as a TODO and has no
weights parameter; families stop at gaussian/binomial/multinomial/
mgaussian). glmnet semantics throughout: weights rescale to sum n,
offset is a fixed linear-predictor term, predict() with an offset fit
requires newoffset (reference predict.sgdnet.R:380-387 documents the
intended behavior).

Independent cross-checks: numpy weighted OLS closed form, Spark MLlib
GeneralizedLinearRegression (weightCol/offsetCol, poisson family), and
structural invariances (uniform weights == unweighted; weight 2 ==
duplicated row; gaussian offset == shifted label).
"""

import numpy as np
import pandas as pd
import pytest

from sgdnet_spark.glm import sgdnet


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(11)
    n = 500
    x1 = rng.normal(size=n)
    x2 = rng.normal(size=n)
    w = rng.uniform(0.5, 2.0, size=n)
    o = rng.normal(scale=0.2, size=n)
    eta = 0.4 + 0.6 * x1 - 0.3 * x2 + o
    y = 1.5 + 2.0 * x1 - 0.7 * x2 + rng.normal(scale=0.5, size=n)
    ypois = rng.poisson(np.exp(eta)).astype(float)
    yb = (rng.random(n) < 1 / (1 + np.exp(-eta))).astype(float)
    pdf = pd.DataFrame(
        {"x1": x1, "x2": x2, "y": y, "ypois": ypois, "yb": yb, "w": w, "o": o}
    )
    return spark.createDataFrame(pdf), pdf


def _glr(df, label, family, link, **kw):
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GeneralizedLinearRegression

    dv = VectorAssembler(inputCols=["x1", "x2"], outputCol="fv").transform(df)
    m = GeneralizedLinearRegression(
        family=family, link=link, featuresCol="fv", labelCol=label,
        regParam=0.0, tol=1e-12, maxIter=200, **kw,
    ).fit(dv)
    return np.array([m.intercept] + list(m.coefficients))


def test_weighted_gaussian_matches_weighted_ols(data):
    df, pdf = data
    fit = sgdnet(df, ["x1", "x2"], "y", family="gaussian", lambdas=[0.0], weights_col="w")
    X = np.column_stack([np.ones(len(pdf)), pdf.x1, pdf.x2])
    beta = np.linalg.solve(X.T @ (X * pdf.w.values[:, None]), X.T @ (pdf.w.values * pdf.y.values))
    assert np.allclose(fit.coef()[:, 0], beta, atol=1e-8)


def test_uniform_weights_equal_unweighted(data):
    df, _ = data
    df2 = df.withColumn("wc", df.w * 0 + 2.5)
    a = sgdnet(df, ["x1", "x2"], "y", family="gaussian", nlambda=5, alpha=0.5)
    b = sgdnet(df2, ["x1", "x2"], "y", family="gaussian", nlambda=5, alpha=0.5, weights_col="wc")
    assert np.allclose(a.lambdas, b.lambdas)
    assert np.allclose(a.coef(), b.coef(), atol=1e-10)


def test_weight_two_equals_duplicated_rows_binomial(data):
    df, pdf = data
    n = len(pdf)
    dup = pd.concat([pdf, pdf.iloc[:100]], ignore_index=True)
    w2 = np.ones(n)
    w2[:100] = 2.0
    spark = df.sparkSession
    fit_dup = sgdnet(
        spark.createDataFrame(dup), ["x1", "x2"], "yb", family="binomial", nlambda=4, alpha=0.5
    )
    fit_w = sgdnet(
        spark.createDataFrame(pdf.assign(w2=w2)), ["x1", "x2"], "yb",
        family="binomial", nlambda=4, alpha=0.5, weights_col="w2",
    )
    # the weights-sum-to-n normalization makes lambda grid AND coefficients
    # identical between a weight-2 row and a physically duplicated row
    assert np.allclose(fit_dup.lambdas, fit_w.lambdas)
    assert np.allclose(fit_dup.coef(), fit_w.coef(), atol=1e-6)


def test_gaussian_offset_equals_shifted_label_and_predict_roundtrip(data):
    df, pdf = data
    fit = sgdnet(df, ["x1", "x2"], "y", family="gaussian", lambdas=[0.0], offset_col="o")
    shifted = df.withColumn("ys", df.y - df.o)
    fit2 = sgdnet(shifted, ["x1", "x2"], "ys", family="gaussian", lambdas=[0.0])
    assert fit.offset and not fit2.offset
    assert np.allclose(fit.coef(), fit2.coef(), atol=1e-9)
    with pytest.raises(ValueError, match="newoffset"):
        fit.predict(df)
    pred = fit.predict(df, newoffset="o").select("pred").toPandas()["pred"].to_numpy()
    cf = fit.coef()[:, 0]
    expect = cf[0] + cf[1] * pdf.x1.values + cf[2] * pdf.x2.values + pdf.o.values
    assert np.allclose(pred, expect, atol=1e-9)


def test_binomial_weights_offset_match_mllib(data):
    df, _ = data
    fit = sgdnet(df, ["x1", "x2"], "yb", family="binomial", lambdas=[0.0],
                 weights_col="w", offset_col="o")
    ref = _glr(df, "yb", "binomial", "logit", weightCol="w", offsetCol="o")
    assert np.allclose(fit.coef()[:, 0], ref, atol=1e-5)


def test_poisson_mle_matches_mllib(data):
    df, _ = data
    fit = sgdnet(df, ["x1", "x2"], "ypois", family="poisson", lambdas=[0.0])
    ref = _glr(df, "ypois", "poisson", "log")
    assert np.allclose(fit.coef()[:, 0], ref, atol=1e-5)
    assert fit.family == "poisson"
    assert fit.dev_ratio[0] > 0.1  # the covariates explain real deviance


def test_poisson_weights_offset_match_mllib(data):
    df, pdf = data
    fit = sgdnet(df, ["x1", "x2"], "ypois", family="poisson", lambdas=[0.0],
                 weights_col="w", offset_col="o")
    ref = _glr(df, "ypois", "poisson", "log", weightCol="w", offsetCol="o")
    assert np.allclose(fit.coef()[:, 0], ref, atol=1e-4)
    # response predict = exp(link + offset)
    pr = fit.predict(df, type="response", newoffset="o").select("pred").toPandas()["pred"].to_numpy()
    cf = fit.coef()[:, 0]
    expect = np.exp(cf[0] + cf[1] * pdf.x1.values + cf[2] * pdf.x2.values + pdf.o.values)
    assert np.allclose(pr, expect, atol=1e-8)


def test_poisson_local_equals_distributed(data):
    df, _ = data
    loc = sgdnet(df, ["x1", "x2"], "ypois", family="poisson", nlambda=5, alpha=0.5,
                 weights_col="w", offset_col="o")
    spk = sgdnet(df, ["x1", "x2"], "ypois", family="poisson", nlambda=5, alpha=0.5,
                 weights_col="w", offset_col="o", solver="spark", collect_max_cells=1)
    assert np.allclose(loc.coef(), spk.coef(), atol=1e-9)
    assert np.allclose(loc.dev_ratio, spk.dev_ratio, atol=1e-9)


def test_binomial_offset_fista_matches_quadratic(data):
    """The wide-p FISTA solver handles offsets too (empty-column IRLS
    Newton for the null intercept + offset-aware gradients): same
    optimum as the quadratic IRLS path."""
    df, _ = data
    quad = sgdnet(df, ["x1", "x2"], "yb", family="binomial", nlambda=5, alpha=0.5,
                  weights_col="w", offset_col="o", thresh=1e-9)
    fista = sgdnet(df, ["x1", "x2"], "yb", family="binomial", nlambda=5, alpha=0.5,
                   weights_col="w", offset_col="o", solver="fista", thresh=1e-9)
    assert np.allclose(quad.lambdas, fista.lambdas, rtol=1e-6)
    assert np.abs(quad.coef() - fista.coef()).max() < 1e-4


def test_binomial_weights_offset_local_equals_distributed(data):
    df, _ = data
    loc = sgdnet(df, ["x1", "x2"], "yb", family="binomial", nlambda=5, alpha=0.5,
                 weights_col="w", offset_col="o", solver="local")
    spk = sgdnet(df, ["x1", "x2"], "yb", family="binomial", nlambda=5, alpha=0.5,
                 weights_col="w", offset_col="o", solver="spark")
    assert np.allclose(loc.coef(), spk.coef(), atol=1e-9)


def test_multinomial_weighted_local_equals_distributed(data):
    df, pdf = data
    eta = 0.4 + 0.6 * pdf.x1.values - 0.3 * pdf.x2.values
    y3 = np.where(eta > 0.6, "a", np.where(eta > 0.2, "b", "c"))
    spark = df.sparkSession
    df3 = spark.createDataFrame(pdf.assign(y3=y3))
    loc = sgdnet(df3, ["x1", "x2"], "y3", family="multinomial", nlambda=4, alpha=1.0,
                 weights_col="w")
    spk = sgdnet(df3, ["x1", "x2"], "y3", family="multinomial", nlambda=4, alpha=1.0,
                 weights_col="w", solver="spark")
    assert np.allclose(loc.coef(), spk.coef(), atol=1e-8)


def test_poisson_path_kkt(data):
    """KKT at an interior path point: |x̃ᵀ w̃(y-mu)/n| <= lam*alpha for
    zero coefs, == lam*alpha + lam*(1-alpha)*beta for active ones."""
    df, pdf = data
    alpha = 0.5
    fit = sgdnet(df, ["x1", "x2"], "ypois", family="poisson", nlambda=8, alpha=alpha,
                 weights_col="w")
    n = len(pdf)
    w = pdf.w.values * (n / pdf.w.values.sum())
    X = np.column_stack([pdf.x1, pdf.x2])
    xm = (X * w[:, None]).sum(axis=0) / n
    xv = (X * X * w[:, None]).sum(axis=0) / n - xm**2
    xs = (X - xm) / np.sqrt(xv)
    for i in (3, 6):
        lam = fit.lambdas[i]
        cf = fit.coef()[:, i]
        eta = cf[0] + X @ cf[1:]
        mu = np.exp(eta)
        grad = xs.T @ (w * (mu - pdf.ypois.values)) / n  # standardized-scale gradient
        beta_std = cf[1:] * np.sqrt(xv)  # back to the standardized scale
        for j in range(2):
            if beta_std[j] == 0.0:
                assert abs(grad[j]) <= lam * alpha * 1.02 + 1e-8
            else:
                kkt = grad[j] + lam * alpha * np.sign(beta_std[j]) + lam * (1 - alpha) * beta_std[j]
                assert abs(kkt) <= 2e-4 * max(lam, 1.0)


def test_poisson_negative_y_rejected(data):
    df, _ = data
    bad = df.withColumn("yneg", df.ypois - 100.0)
    with pytest.raises(ValueError, match="negative"):
        sgdnet(bad, ["x1", "x2"], "yneg", family="poisson", lambdas=[0.0])


def test_offset_rejected_for_str_multivariate(data):
    df, _ = data
    # multivariate offsets (round 6) must be the n×k form (one column
    # per class/response) — a single column is an error
    with pytest.raises(ValueError, match="sequence"):
        sgdnet(df, ["x1", "x2"], "yb", family="multinomial", offset_col="o")
    with pytest.raises(ValueError, match="sequence"):
        sgdnet(df, ["x1", "x2"], ["y", "ypois"], family="mgaussian", offset_col="o")


def test_poisson_score_distributed_matches_numpy(data):
    from sgdnet_spark.glm.score import score, score_np

    df, pdf = data
    fit = sgdnet(df, ["x1", "x2"], "ypois", family="poisson", nlambda=5, alpha=0.5)
    X = np.column_stack([pdf.x1, pdf.x2])
    for m in ("deviance", "mse", "mae"):
        a = score(fit, df, label_col="ypois", type_measure=m)
        b = score_np(fit, X, pdf.ypois.values, type_measure=m)
        assert np.allclose(a, b, atol=1e-9), m
    # deviance improves along the path vs the null point
    dev = score(fit, df, label_col="ypois", type_measure="deviance")
    assert dev[-1] < dev[0]


def test_poisson_cv(data):
    from sgdnet_spark.glm.cv import cv_sgdnet

    df, _ = data
    cv = cv_sgdnet(df, ["x1", "x2"], "ypois", family="poisson", nfolds=3, nlambda=5, alpha=1.0)
    assert cv.name == "Poisson Deviance"
    assert cv.lambda_min <= cv.lambda_1se
    assert len(cv.cv_summary) == 5


def test_weighted_score_and_cv(data):
    from sgdnet_spark.glm.cv import cv_sgdnet
    from sgdnet_spark.glm.score import score

    df, pdf = data
    fit = sgdnet(df, ["x1", "x2"], "y", family="gaussian", nlambda=4, alpha=0.5,
                 weights_col="w")
    got = score(fit, df, label_col="y", type_measure="mse", weights_col="w")
    X = np.column_stack([pdf.x1, pdf.x2])
    w = pdf.w.values
    cf = fit.coef()
    expect = np.array([
        (w * (cf[0, i] + X @ cf[1:, i] - pdf.y.values) ** 2).sum() / w.sum()
        for i in range(cf.shape[-1])
    ])
    assert np.allclose(got, expect, atol=1e-9)
    # weighted CV runs end-to-end: weights reach the fold fits AND the measure
    cv = cv_sgdnet(df, ["x1", "x2"], "y", family="gaussian", nfolds=3, nlambda=4,
                   alpha=0.5, weights_col="w")
    assert len(cv.cv_summary) == 4
    assert cv.fit.family == "gaussian"
    # weighted-AUC combo warns and computes the measure unweighted
    with pytest.warns(UserWarning, match="unweighted"):
        cv_sgdnet(df, ["x1", "x2"], "yb", family="binomial", nfolds=3, nlambda=3,
                  alpha=1.0, type_measure="auc", weights_col="w")


def test_sparse_weighted_matches_dense_weighted(data):
    """sgdnet_sparse(weights_col=) == dense sgdnet(weights_col=) on the
    same (densified) data — weights fold into the nnz-cost kernels."""
    from sgdnet_spark.glm.sparse import sgdnet_sparse

    df, pdf = data
    spark = df.sparkSession
    rng = np.random.default_rng(23)
    n, p = 400, 12
    X = np.where(rng.random((n, p)) < 0.3, rng.normal(size=(n, p)), 0.0)
    beta = np.zeros(p)
    beta[:3] = [1.0, -0.6, 0.4]
    y = 0.5 + X @ beta + rng.normal(scale=0.4, size=n)
    w = rng.uniform(0.5, 2.0, size=n)
    rows = [
        (
            [int(j) for j in np.nonzero(X[i])[0]],
            [float(v) for v in X[i, np.nonzero(X[i])[0]]],
            float(y[i]),
            float(w[i]),
        )
        for i in range(n)
    ]
    sdf = spark.createDataFrame(
        rows, "indices array<int>, vals array<double>, y double, w double"
    )
    sp = sgdnet_sparse(sdf, "indices", "vals", "y", p=p, family="gaussian",
                       nlambda=6, alpha=0.5, weights_col="w")
    cols = [f"c{i}" for i in range(p)]
    ddf = spark.createDataFrame(
        pd.DataFrame(X, columns=cols).assign(y=y, w=w)
    )
    dn = sgdnet(ddf, cols, "y", family="gaussian", nlambda=6, alpha=0.5,
                weights_col="w", solver="fista", lambda_min_ratio=1e-2)
    assert np.allclose(sp.lambdas, dn.lambdas, rtol=1e-9)
    assert np.abs(sp.coef() - dn.coef()).max() < 1e-5


def test_negative_weights_rejected(data):
    df, _ = data
    bad = df.withColumn("wneg", df.w - 10.0)
    with pytest.raises(ValueError, match="non-negative"):
        sgdnet(bad, ["x1", "x2"], "y", family="gaussian", lambdas=[0.0],
               weights_col="wneg")


def test_null_or_nan_weights_and_offset_rejected(data):
    """F.sum/F.min skip nulls, so without an explicit count check a NULL
    weight/offset row would silently become NaN in the Arrow batches and
    poison every aggregate into all-NaN coefficients."""
    import pyspark.sql.functions as F

    df, _ = data
    wnull = df.withColumn("wbad", F.when(df.x1 > 1.0, None).otherwise(df.w))
    with pytest.raises(ValueError, match="NULL"):
        sgdnet(wnull, ["x1", "x2"], "y", family="gaussian", lambdas=[0.0],
               weights_col="wbad")
    wnan = df.withColumn("wbad", F.when(df.x1 > 1.0, float("nan")).otherwise(df.w))
    with pytest.raises(ValueError, match="NULL/NaN"):
        sgdnet(wnan, ["x1", "x2"], "y", family="gaussian", lambdas=[0.0],
               weights_col="wbad")
    onull = df.withColumn("obad", F.when(df.x1 > 1.0, None).otherwise(df.o))
    with pytest.raises(ValueError, match="NULL"):
        sgdnet(onull, ["x1", "x2"], "ypois", family="poisson", lambdas=[0.0],
               offset_col="obad")
    # sparse path has the same guard
    from sgdnet_spark.glm.sparse import sgdnet_sparse

    sdf = df.sparkSession.createDataFrame(
        [([0], [1.0], 1.0, None), ([1], [2.0], 2.0, 1.0), ([0], [0.5], 0.0, 1.0)],
        "indices array<int>, vals array<double>, y double, w double",
    )
    with pytest.raises(ValueError, match="NULL"):
        sgdnet_sparse(sdf, "indices", "vals", "y", p=2, family="gaussian",
                      lambdas=[0.0], weights_col="w")
    # and the numpy provider catches raw NaN arrays directly
    from sgdnet_spark.glm.providers import LocalXY

    with pytest.raises(ValueError, match="NaN"):
        LocalXY(np.ones((3, 1)), np.ones(3), w=np.array([1.0, np.nan, 1.0]))
    with pytest.raises(ValueError, match="NaN"):
        LocalXY(np.ones((3, 1)), np.ones(3), o=np.array([0.0, np.nan, 0.0]))


def test_score_offset_fit_requires_offset(data):
    """ADVICE r5 (medium): score() on an offset fit without the offset
    silently returned wrong deviance/mse/mae. It must now raise, exactly
    as predict() does, and compute correctly when the offset is given."""
    from sgdnet_spark.glm.score import score, score_np

    df, pdf = data
    fit = sgdnet(df, ["x1", "x2"], "ypois", family="poisson", nlambda=4,
                 alpha=0.5, offset_col="o")
    with pytest.raises(ValueError, match="offset"):
        score(fit, df, label_col="ypois", type_measure="deviance")
    with pytest.raises(ValueError, match="offset"):
        score_np(fit, np.column_stack([pdf.x1, pdf.x2]), pdf.ypois.values)
    with pytest.raises(ValueError, match="offset"):
        fit.predict_np(np.column_stack([pdf.x1, pdf.x2]))
    got = score(fit, df, label_col="ypois", type_measure="deviance", offset_col="o")
    X = np.column_stack([pdf.x1, pdf.x2])
    want = score_np(fit, X, pdf.ypois.values, type_measure="deviance",
                    offset=pdf.o.values)
    assert np.allclose(got, want, atol=1e-9)
    # manual cross-check at the densest path point: mu = exp(a0 + Xb + o)
    cf = fit.coef()
    mu = np.exp(cf[0, -1] + X @ cf[1:, -1] + pdf.o.values)
    y = pdf.ypois.values
    with np.errstate(divide="ignore", invalid="ignore"):
        ylogy = np.where(y > 0, y * np.log(y / mu), 0.0)
    assert np.isclose(got[-1], (2.0 * (ylogy - (y - mu))).mean(), atol=1e-9)


def test_score_offset_binomial_all_measures(data):
    from sgdnet_spark.glm.score import score, score_np

    df, pdf = data
    fit = sgdnet(df, ["x1", "x2"], "yb", family="binomial", nlambda=4,
                 alpha=0.5, offset_col="o")
    X = np.column_stack([pdf.x1, pdf.x2])
    for m in ("deviance", "mse", "mae", "class"):
        a = score(fit, df, label_col="yb", type_measure=m, offset_col="o")
        b = score_np(fit, X, pdf.yb.values, type_measure=m, offset=pdf.o.values)
        assert np.allclose(a, b, atol=1e-9), m
    # the histogram path-AUC gets the offset too (rank-preserving check
    # vs the exact numpy Mann-Whitney on offset-adjusted scores)
    a = score(fit, df, label_col="yb", type_measure="auc", offset_col="o")
    b = score_np(fit, X, pdf.yb.values, type_measure="auc", offset=pdf.o.values)
    assert np.abs(a - b).max() < 5e-3


def test_cv_offset_threads_through_fold_scoring(data):
    """cv_sgdnet(offset_col=) must apply the offset to BOTH the fold
    fits and the held-out measure. Gaussian equivalence makes this
    exactly checkable: an offset fit is the plain fit on (y - o), so CV
    with identical explicit folds must produce identical summaries."""
    import pyspark.sql.functions as F

    from sgdnet_spark.glm.cv import cv_sgdnet

    df, _ = data
    df = df.withColumn("foldid", (F.abs(F.xxhash64("x1")) % 3).cast("int"))
    df = df.withColumn("y_shift", df.y - df.o)
    cv_off = cv_sgdnet(df, ["x1", "x2"], "y", family="gaussian", nlambda=4,
                       alpha=0.5, foldid_col="foldid", type_measure="mse",
                       offset_col="o", use_fold_moments=False)
    cv_ref = cv_sgdnet(df, ["x1", "x2"], "y_shift", family="gaussian", nlambda=4,
                       alpha=0.5, foldid_col="foldid", type_measure="mse",
                       use_fold_moments=False)
    assert np.allclose(
        [r["mean"] for r in cv_off.cv_summary],
        [r["mean"] for r in cv_ref.cv_summary], atol=1e-9,
    )
    assert np.isclose(cv_off.lambda_min, cv_ref.lambda_min)
    # poisson offset CV end-to-end (the rate-model use case)
    cv = cv_sgdnet(df, ["x1", "x2"], "ypois", family="poisson", nfolds=3,
                   nlambda=4, alpha=1.0, offset_col="o")
    assert cv.name == "Poisson Deviance"
    assert len(cv.cv_summary) == 4


@pytest.fixture(scope="module")
def multi_offset_data(spark):
    rng = np.random.default_rng(29)
    n, p, k = 600, 4, 3
    x = rng.normal(size=(n, p))
    O = rng.normal(scale=0.5, size=(n, k))
    B = np.array([[1.0, -0.5, 0, 0], [0, 0.8, -1.0, 0], [-1.0, 0, 0.6, 0]])
    eta = x @ B.T + O
    pr = np.exp(eta - eta.max(1, keepdims=True))
    pr /= pr.sum(1, keepdims=True)
    yi = np.array([rng.choice(k, p=pi) for pi in pr])
    pdf = pd.DataFrame(x, columns=[f"x{i}" for i in range(p)])
    for c in range(k):
        pdf[f"o{c}"] = O[:, c]
    pdf["y"] = yi.astype(str)
    return spark.createDataFrame(pdf), pdf, x, O, yi


def test_multinomial_offset_zero_equals_plain(multi_offset_data):
    """n×k offsets (glmnet offset matrix; reference predict.sgdnet.R
    handles offsets family-generically): all-zero offsets must reproduce
    the unoffset fit exactly."""
    df, pdf, x, O, yi = multi_offset_data
    cols = [f"x{i}" for i in range(4)]
    ocols = [f"o{c}" for c in range(3)]
    df0 = df
    for c in ocols:
        df0 = df0.withColumn(c, df0[c] * 0.0)
    a = sgdnet(df0, cols, "y", family="multinomial", alpha=1.0, nlambda=6,
               lambda_min_ratio=1e-2, offset_col=ocols)
    b = sgdnet(df, cols, "y", family="multinomial", alpha=1.0, nlambda=6,
               lambda_min_ratio=1e-2)
    assert a.offset is True
    assert np.allclose(a.lambdas, b.lambdas, rtol=1e-12)
    assert np.abs(a.coef() - b.coef()).max() < 1e-10


def test_multinomial_offset_constant_equals_intercept_shift(multi_offset_data):
    """Constant per-class offsets c_k are absorbed entirely by the
    intercepts: coefficients identical, centered intercepts shifted by
    -(c_k - mean(c))."""
    import pyspark.sql.functions as F

    df, *_ = multi_offset_data
    cols = [f"x{i}" for i in range(4)]
    shift = [0.7, -0.2, 0.4]
    dfc = df
    for c, v in zip(range(3), shift):
        dfc = dfc.withColumn(f"oc{c}", F.lit(float(v)))
    a = sgdnet(dfc, cols, "y", family="multinomial", alpha=0.5, nlambda=5,
               lambda_min_ratio=1e-2, offset_col=[f"oc{c}" for c in range(3)],
               thresh=1e-10)
    b = sgdnet(df, cols, "y", family="multinomial", alpha=0.5, nlambda=5,
               lambda_min_ratio=1e-2, thresh=1e-10)
    assert np.allclose(a.lambdas, b.lambdas, rtol=1e-9)
    assert np.abs(a.beta - b.beta).max() < 2e-6
    sh = np.asarray(shift) - np.mean(shift)
    assert np.abs((a.a0 + sh[:, None]) - b.a0).max() < 2e-6


def test_multinomial_offset_kkt_and_null(multi_offset_data):
    """Every path point of an offset fit satisfies softmax elastic-net
    KKT with the offset in the linear predictor; s=0 is exactly the
    all-zero point of the offset null model."""
    df, pdf, x, O, yi = multi_offset_data
    cols = [f"x{i}" for i in range(4)]
    ocols = [f"o{c}" for c in range(3)]
    alpha = 1.0
    fit = sgdnet(df, cols, "y", family="multinomial", alpha=alpha, nlambda=8,
                 lambda_min_ratio=1e-2, offset_col=ocols, thresh=1e-10)
    assert np.all(fit.beta[:, :, 0] == 0.0)
    Y = np.eye(3)[yi]
    mu, sd = x.mean(axis=0), x.std(axis=0)
    xs = (x - mu) / sd
    for s_idx in (0, 4, 7):
        lam = float(fit.lambdas[s_idx])
        beta = fit.beta[:, :, s_idx]
        a0 = fit.a0[:, s_idx]
        coef_std = beta * sd[None, :]
        b0_std = a0 + beta @ mu
        eta = xs @ coef_std.T + b0_std + O
        P = np.exp(eta - eta.max(1, keepdims=True))
        P /= P.sum(1, keepdims=True)
        G = xs.T @ (P - Y) / len(x)  # (p, k)
        for j in range(4):
            for c in range(3):
                g, bj = G[j, c], coef_std[c, j]
                if bj == 0.0:
                    assert abs(g) <= alpha * lam + 5e-4, (s_idx, j, c)
                else:
                    assert abs(g + lam * alpha * np.sign(bj)) < 5e-4, (s_idx, j, c)


def test_multinomial_offset_score_predict_cv(multi_offset_data):
    from sgdnet_spark.glm.cv import cv_sgdnet
    from sgdnet_spark.glm.score import score, score_np

    df, pdf, x, O, yi = multi_offset_data
    cols = [f"x{i}" for i in range(4)]
    ocols = [f"o{c}" for c in range(3)]
    fit = sgdnet(df, cols, "y", family="multinomial", alpha=0.5, nlambda=5,
                 lambda_min_ratio=1e-2, offset_col=ocols)
    # score requires and uses the offset
    with pytest.raises(ValueError, match="offset"):
        score(fit, df, label_col="y", type_measure="deviance")
    for m in ("deviance", "class", "mse", "mae"):
        a = score(fit, df, label_col="y", type_measure=m, offset_col=ocols)
        b = score_np(fit, x, yi.astype(str), type_measure=m, offset=O)
        assert np.allclose(a, b, atol=1e-9), m
    # predict guards
    with pytest.raises(ValueError, match="newoffset"):
        fit.predict(df, s=float(fit.lambdas[-1]), type="class")
    with pytest.raises(ValueError, match="one column per"):
        fit.predict(df, s=float(fit.lambdas[-1]), type="class", newoffset="o0")
    with pytest.raises(ValueError, match="one column per"):
        score(fit, df, label_col="y", type_measure="class", offset_col=ocols[:2])
    # CV threads the offset to fold fits and held-out scoring
    cv = cv_sgdnet(df, cols, "y", family="multinomial", nfolds=3, nlambda=4,
                   lambda_min_ratio=1e-2, alpha=0.5, offset_col=ocols)
    assert len(cv.cv_summary) == 4
    assert cv.fit.offset is True


def test_multinomial_offset_grouped_combination(multi_offset_data):
    """grouped penalty + n×k offset ride the same FISTA driver."""
    df, *_ = multi_offset_data
    cols = [f"x{i}" for i in range(4)]
    ocols = [f"o{c}" for c in range(3)]
    fit = sgdnet(df, cols, "y", family="multinomial", alpha=1.0, nlambda=6,
                 lambda_min_ratio=1e-2, offset_col=ocols,
                 type_multinomial="grouped")
    assert fit.grouped is True and fit.offset is True
    assert np.all(fit.beta[:, :, 0] == 0.0)
    for i in range(fit.nlambda):
        sup = [set(np.nonzero(fit.beta[c, :, i])[0]) for c in range(3)]
        assert sup[0] == sup[1] == sup[2]


def test_multinomial_offset_validation(multi_offset_data):
    df, *_ = multi_offset_data
    cols = [f"x{i}" for i in range(4)]
    with pytest.raises(ValueError, match="sequence"):
        sgdnet(df, cols, "y", family="multinomial", offset_col="o0")
    with pytest.raises(ValueError, match="one column per class"):
        sgdnet(df, cols, "y", family="multinomial", offset_col=["o0", "o1"])
    with pytest.raises(ValueError, match="single column"):
        sgdnet(df, cols, "x1", family="gaussian", offset_col=["o0", "o1"])


# ---- mgaussian n×k offsets (round 6: completes offsets for every family) --


def test_mgaussian_offset_equals_shifted_labels(data):
    df, pdf = data
    import pyspark.sql.functions as sf

    d = df.withColumn("o2", sf.col("o") * -0.5)
    fit = sgdnet(d, ["x1", "x2"], ["y", "ypois"], family="mgaussian",
                 alpha=0.5, nlambda=5, offset_col=["o", "o2"])
    d2 = d.withColumn("z1", sf.col("y") - sf.col("o")).withColumn(
        "z2", sf.col("ypois") - sf.col("o2"))
    ref = sgdnet(d2, ["x1", "x2"], ["z1", "z2"], family="mgaussian",
                 alpha=0.5, nlambda=5)
    assert np.allclose(fit.lambdas, ref.lambdas)
    assert np.allclose(fit.beta, ref.beta, atol=1e-10)
    assert np.allclose(fit.a0, ref.a0, atol=1e-10)
    assert fit.offset


def test_mgaussian_offset_predict_and_score(data):
    df, _ = data
    import pyspark.sql.functions as sf
    from sgdnet_spark.glm.score import score

    d = df.withColumn("o2", sf.col("o") * -0.5)
    fit = sgdnet(d, ["x1", "x2"], ["y", "ypois"], family="mgaussian",
                 alpha=0.0, lambdas=[0.1], offset_col=["o", "o2"])
    with pytest.raises(ValueError, match="newoffset"):
        fit.predict(d, s=0.1)
    out = fit.predict(d, s=0.1, newoffset=["o", "o2"]).first()
    cf = fit.coef(s=0.1)
    want = cf[0, 0, 0] + cf[0, 1, 0] * out["x1"] + cf[0, 2, 0] * out["x2"] + out["o"]
    assert abs(out["pred_y"] - want) < 1e-8
    with pytest.raises(ValueError, match="offset"):
        score(fit, d, ["x1", "x2"], ["y", "ypois"], "mse", s=0.1)
    m = score(fit, d, ["x1", "x2"], ["y", "ypois"], "mse", s=0.1,
              offset_col=["o", "o2"])
    # same measure, computed on the shifted-label equivalent fit
    d2 = d.withColumn("z1", sf.col("y") - sf.col("o")).withColumn(
        "z2", sf.col("ypois") - sf.col("o2"))
    ref = sgdnet(d2, ["x1", "x2"], ["z1", "z2"], family="mgaussian",
                 alpha=0.0, lambdas=[0.1])
    m_ref = score(ref, d2, ["x1", "x2"], ["z1", "z2"], "mse", s=0.1)
    assert np.allclose(m, m_ref, atol=1e-10)


def test_mgaussian_offset_requires_sequence(data):
    df, _ = data
    with pytest.raises(ValueError, match="sequence"):
        sgdnet(df, ["x1", "x2"], ["y", "ypois"], family="mgaussian",
               offset_col="o")
