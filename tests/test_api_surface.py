"""API-surface parity: nonzero, exact refit, cv predict, reprs
(reference test-predictions.R exact=TRUE, print.sgdnet.R)."""

import numpy as np
import pytest

from sgdnet_spark.glm import cv_sgdnet, sgdnet


@pytest.fixture(scope="module")
def fit_and_df(spark):
    rng = np.random.default_rng(41)
    n, p = 300, 4
    x = rng.normal(size=(n, p))
    y = 1.0 + x @ np.array([1.0, 0.0, -0.5, 0.0]) + rng.normal(scale=0.3, size=n)
    cols = [f"x{i}" for i in range(p)]
    rows = [(*map(float, xi), float(yi)) for xi, yi in zip(x, y)]
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols) + ", y double")
    return sgdnet(df, cols, "y", nlambda=10), df, cols


def test_nonzero(fit_and_df):
    fit, df, cols = fit_and_df
    nz = fit.nonzero()
    assert nz[0] == []  # lambda_max: all zero
    assert set(nz[-1]) >= {0, 2}  # true signal variables present at path end


def test_exact_refit(fit_and_df):
    fit, df, cols = fit_and_df
    s = float((fit.lambdas[2] + fit.lambdas[3]) / 2)
    refit = fit.update(sorted(set(fit.lambdas) | {s}, reverse=True))
    assert s in refit.lambdas
    # the lasso path is piecewise-linear in lambda, so interpolation is
    # near-exact between knots; the refit must agree closely
    interp = fit.coef(s)[:, 0]
    exact = refit.coef(s)[:, 0]
    assert np.allclose(interp, exact, atol=0.05)
    pred = fit.predict(df, s=s, exact=True, prefix="p")
    assert "p" in pred.columns


def test_diagnostics_loss_trace(fit_and_df, spark):
    """Mirrors reference test-options.R: per-lambda losses exist, are
    positive and finite, and IRLS traces are non-increasing-ish."""
    import numpy as np
    from sgdnet_spark.glm import sgdnet as _sgdnet

    fit, df, cols = fit_and_df
    loss = fit.diagnostics["loss"]
    assert len(loss) == fit.nlambda
    flat = [v for lam in loss for v in lam]
    assert all(np.isfinite(v) and v > 0 for v in flat)
    # binomial trace shows IRLS progress per lambda
    dfb = df.withColumn("yb", (df.y > 1.0).cast("int"))
    fb = _sgdnet(dfb, cols, "yb", family="binomial", nlambda=6, lambda_min_ratio=1e-2)
    tr = fb.diagnostics["loss"]
    assert len(tr) == 6
    assert all(len(t) >= 1 for t in tr)


def test_cv_predict_and_repr(fit_and_df, spark):
    fit, df, cols = fit_and_df
    cv = cv_sgdnet(df, cols, "y", nfolds=3, nlambda=8)
    for s in ("lambda_min", "lambda_1se"):
        out = cv.predict(df, s=s, prefix="p")
        assert "p" in out.columns
    cf = cv.coef("lambda_min")
    assert cf.shape == (len(cols) + 1, 1)
    assert "lambda_min" in repr(cv)
    assert "sgdnet fit" in repr(fit)
    assert "dev_ratio" in repr(fit)


def test_dataset_analogs_fit_every_family(spark):
    """The reference's bundled-dataset examples (man/sgdnet.Rd) run
    verbatim on the dataset analogs (R/data.R -> sgdnet_spark.datasets)."""
    from sgdnet_spark import datasets
    from sgdnet_spark.glm import sgdnet

    df, feats, y = datasets.abalone(spark)
    fit = sgdnet(df, feats, y, alpha=0.0, lambdas=[1.0, 0.1])
    assert fit.family == "gaussian" and fit.beta.shape == (5, 2)

    df, feats, y = datasets.heart(spark)
    fit = sgdnet(df, feats, y, family="binomial", alpha=0.5, nlambda=4, lambda_min_ratio=0.1)
    assert fit.classnames == ["false", "true"]

    df, feats, y = datasets.wine(spark)
    fit = sgdnet(df, feats, y, family="multinomial", nlambda=4, lambda_min_ratio=0.1)
    assert len(fit.classnames) == 3

    df, feats, ys = datasets.student(spark)
    fit = sgdnet(df, feats, ys, family="mgaussian", nlambda=4)
    assert fit.beta.shape[0] == 2

    df, feats, y = datasets.user_events(spark)
    fit = sgdnet(df, feats, y, family="poisson", offset_col="log_hours",
                 nlambda=4, lambda_min_ratio=0.1)
    assert fit.family == "poisson" and fit.offset
    # response predictions need the exposure back (glmnet newoffset rule)
    assert "pred" in fit.predict(
        df, type="response", newoffset="log_hours", s=float(fit.lambdas[-1])
    ).columns


def test_null_labels_raise_on_both_paths(spark):
    """NULL classification labels must raise on BOTH execution paths:
    the distributed path previously grew a phantom NULL class and the
    driver fast path silently mapped NULLs to class 0 — the same data
    must never fit silently on one path and error on the other."""
    import pytest

    from sgdnet_spark.glm import sgdnet

    rows = [(1.0, 2.0, "a"), (2.0, 1.0, "b"), (3.0, 0.5, None), (0.5, 3.0, "a")] * 10
    df = spark.createDataFrame(rows, "x0 double, x1 double, y string")
    with pytest.raises(ValueError, match="NULL"):
        sgdnet(df, ["x0", "x1"], "y", family="binomial", nlambda=3)  # fast path
    with pytest.raises(ValueError, match="NULL"):
        sgdnet(df, ["x0", "x1"], "y", family="binomial", nlambda=3,
               solver="spark")


def test_predict_unknown_type_raises(fit_and_df):
    """match.arg semantics: a typo'd predict type must error, not fall
    through to link predictions (previously silent on univariate)."""
    import pytest

    fit, df, cols = fit_and_df
    with pytest.raises(ValueError, match="unknown predict type"):
        fit.predict(df, type="clas")
    with pytest.raises(ValueError, match="classification"):
        fit.predict(df, type="class")  # gaussian fit


def test_score_np_mgaussian_forwards_offset(spark):
    """score_np on an offset-trained mgaussian fit must pass the
    caller's offset through to predict_np (previously dropped ->
    ValueError even with offset supplied)."""
    import numpy as np

    from sgdnet_spark.glm import score_np, sgdnet

    rng = np.random.default_rng(3)
    n = 200
    x = rng.normal(size=(n, 3))
    o = rng.normal(scale=0.1, size=(n, 2))
    y = x @ rng.normal(size=(3, 2)) + o + rng.normal(scale=0.1, size=(n, 2))
    rows = [(*map(float, xi), float(y1), float(y2), float(o1), float(o2))
            for xi, (y1, y2), (o1, o2) in zip(x, y, o)]
    df = spark.createDataFrame(
        rows, "x0 double, x1 double, x2 double, y0 double, y1 double, o0 double, o1 double")
    fit = sgdnet(df, ["x0", "x1", "x2"], ["y0", "y1"], family="mgaussian",
                 alpha=0.0, nlambda=1, lambdas=[0.1], offset_col=["o0", "o1"])
    out = score_np(fit, x, y, type_measure="mse", offset=o)
    assert np.isfinite(out).all()
