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
