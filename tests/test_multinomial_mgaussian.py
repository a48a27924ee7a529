"""Multinomial & mgaussian — mirrors test-multinomial.R / test-mgaussian.R."""

import numpy as np
import pytest

from sgdnet_spark.glm import path as P
from sgdnet_spark.glm.providers import LocalXY
from sgdnet_spark.glm.sgdnet import sgdnet


@pytest.fixture(scope="module")
def multi_xy():
    rng = np.random.default_rng(7)
    n, p, k = 900, 5, 3
    x = rng.normal(size=(n, p))
    B = np.array([[1.5, -1.0, 0, 0, 0], [0, 1.0, -1.5, 0, 0], [-1.0, 0, 1.0, 0, 0]])
    eta = x @ B.T
    pr = np.exp(eta - eta.max(1, keepdims=True))
    pr /= pr.sum(1, keepdims=True)
    yi = np.array([rng.choice(k, p=pi) for pi in pr])
    return x, yi


def test_multinomial_path(multi_xy):
    x, yi = multi_xy
    Y = np.eye(3)[yi]
    res = P.multinomial_path(LocalXY(x, Y), alpha=1.0, nlambda=15, lambda_min_ratio=1e-3)
    assert res.df[0] == 0
    assert res.dev_ratio[-1] > 0.2
    # intercepts sum to zero at each lambda (reference R/sgdnet.R:409)
    assert np.allclose(res.a0.sum(axis=0), 0.0, atol=1e-10)
    assert res.dfmat is not None and res.dfmat.shape == (3, 15)


def test_multinomial_spark_api(spark, multi_xy):
    x, yi = multi_xy
    names = np.array(["alpha", "beta", "gamma"])
    cols = [f"x{i}" for i in range(x.shape[1])]
    rows = [(*map(float, xi), str(names[c])) for xi, c in zip(x, yi)]
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols) + ", y string")
    fit = sgdnet(df, cols, "y", family="multinomial", alpha=1.0, nlambda=8, solver="local")
    assert fit.classnames == ["alpha", "beta", "gamma"]
    pred = fit.predict(df, s=float(fit.lambdas[-1]), type="class", prefix="cls")
    acc = pred.selectExpr("avg(cast(cls = y as double)) acc").first()["acc"]
    assert acc > 0.6
    # response probabilities sum to 1
    resp = fit.predict(df, s=float(fit.lambdas[-1]), type="response", prefix="p")
    tot = resp.selectExpr("avg(p_alpha + p_beta + p_gamma) t").first()["t"]
    assert abs(tot - 1.0) < 1e-9

    # two classes -> error, as reference
    df2 = spark.range(40).selectExpr("cast(id as double) x", "cast(id % 2 as string) y")
    with pytest.raises(ValueError, match="binomial"):
        sgdnet(df2, ["x"], "y", family="multinomial")


def test_mgaussian_path():
    rng = np.random.default_rng(11)
    n, p, k = 600, 6, 2
    x = rng.normal(size=(n, p))
    B = np.array([[2.0, 0.5], [-1.0, 1.0], [0, 0], [0.7, -0.3], [0, 0], [0, 0]])
    y = np.array([1.0, -2.0]) + x @ B + rng.normal(scale=0.3, size=(n, k))
    res = P.mgaussian_path(LocalXY(x, y), alpha=1.0, nlambda=20)
    assert res.df[0] == 0
    # group penalty: a feature is zero across ALL responses simultaneously
    mid = res.beta[:, :, 8]  # (k, p)
    nz_by_resp = [set(np.nonzero(mid[c])[0]) for c in range(k)]
    assert nz_by_resp[0] == nz_by_resp[1]
    # OLS limit
    res0 = P.mgaussian_path(LocalXY(x, y), alpha=1.0, lambdas=[1e-12])
    ols = np.linalg.lstsq(np.hstack([np.ones((n, 1)), x]), y, rcond=None)[0]
    assert np.allclose(res0.beta[:, :, 0].T, ols[1:], atol=1e-7)
    assert np.allclose(res0.a0[:, 0], ols[0], atol=1e-7)


def test_mgaussian_spark_api(spark):
    rng = np.random.default_rng(13)
    n, p = 300, 4
    x = rng.normal(size=(n, p))
    y = x @ np.array([[1.0, -1.0], [0.5, 0.5], [0, 0], [0, 1.0]]) + rng.normal(scale=0.2, size=(n, 2))
    cols = [f"x{i}" for i in range(p)]
    rows = [(*map(float, xi), float(a), float(b)) for xi, (a, b) in zip(x, y)]
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols) + ", y1 double, y2 double")
    fit = sgdnet(df, cols, ["y1", "y2"], family="mgaussian", nlambda=8, solver="spark")
    assert fit.beta.shape == (2, p, 8)
    with pytest.raises(ValueError, match="one-dimensional"):
        sgdnet(df, cols, ["y1"], family="mgaussian")


def _std_grad_multinomial(x, Y, fit, s_idx):
    """Softmax gradient on the STANDARDIZED scale at path point s_idx:
    G = x_std^T (P - Y) / n, (p, k), reconstructed from the
    unstandardized fitted coefficients."""
    mu, sd = x.mean(axis=0), x.std(axis=0)
    xs = (x - mu) / sd
    beta = fit.beta[:, :, s_idx]          # (k, p) unstandardized
    a0 = fit.a0[:, s_idx]                 # (k,)
    coef_std = beta * sd[None, :]         # (k, p)
    b0_std = a0 + beta @ mu               # (k,)
    eta = xs @ coef_std.T + b0_std
    Pm = np.exp(eta - eta.max(1, keepdims=True))
    Pm /= Pm.sum(1, keepdims=True)
    return xs.T @ (Pm - Y) / len(x), coef_std


def test_multinomial_grouped_joint_sparsity_and_kkt(spark, multi_xy):
    """type_multinomial='grouped' (reference R/sgdnet.R:265 TODO —
    glmnet group-lasso semantics): features enter/leave for ALL classes
    together, and every path point satisfies the group-KKT conditions
    ||G_j.||_2 <= lam*alpha for zero rows / stationarity for active rows."""
    x, yi = multi_xy
    Y = np.eye(3)[yi]
    cols = [f"x{i}" for i in range(x.shape[1])]
    rows = [(*map(float, xi), str(c)) for xi, c in zip(x, yi)]
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols) + ", y string")
    fit = sgdnet(df, cols, "y", family="multinomial", alpha=1.0, nlambda=10,
                 lambda_min_ratio=1e-2, type_multinomial="grouped", thresh=1e-10)
    assert fit.grouped is True
    # joint sparsity: a feature's coefficient row is zero for all classes
    # or nonzero for at least one — per-class supports are identical
    for i in range(fit.nlambda):
        supports = [set(np.nonzero(fit.beta[c, :, i])[0]) for c in range(3)]
        assert supports[0] == supports[1] == supports[2], f"s={i}"
    # s=0 is the all-zero point (grouped lambda_max)
    assert np.all(fit.beta[:, :, 0] == 0.0)
    assert 0 < fit.df[3] < x.shape[1] or fit.df[-1] == x.shape[1]
    # group KKT at a mid point and the densest point
    for s_idx in (fit.nlambda // 2, fit.nlambda - 1):
        lam = float(fit.lambdas[s_idx])
        G, coef_std = _std_grad_multinomial(x, Y, fit, s_idx)
        for j in range(x.shape[1]):
            bj = coef_std[:, j]
            if np.all(bj == 0.0):
                assert np.linalg.norm(G[j]) <= lam * 1.0 + 5e-4, (s_idx, j)
            else:
                stat = G[j] + lam * bj / np.linalg.norm(bj)
                assert np.max(np.abs(stat)) < 5e-4, (s_idx, j)


def test_multinomial_grouped_ridge_equals_ungrouped(spark, multi_xy):
    """At alpha=0 the group-L1 term vanishes, so grouped and ungrouped
    must solve the identical ridge objective."""
    x, yi = multi_xy
    cols = [f"x{i}" for i in range(x.shape[1])]
    rows = [(*map(float, xi), str(c)) for xi, c in zip(x, yi)]
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols) + ", y string")
    lams = [0.1, 0.01]
    a = sgdnet(df, cols, "y", family="multinomial", alpha=0.0, lambdas=lams,
               type_multinomial="grouped", thresh=1e-10)
    b = sgdnet(df, cols, "y", family="multinomial", alpha=0.0, lambdas=lams,
               solver="fista", thresh=1e-10)
    assert np.abs(a.coef() - b.coef()).max() < 1e-4
    # round-trips through persistence with the grouped flag
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        a.save(td)
        back = a.load(td)
        assert back.grouped is True


def test_type_multinomial_validation(spark, multi_xy):
    x, yi = multi_xy
    cols = [f"x{i}" for i in range(x.shape[1])]
    rows = [(*map(float, xi), str(c)) for xi, c in zip(x, yi)]
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols) + ", y string")
    with pytest.raises(ValueError, match="type_multinomial"):
        sgdnet(df, cols, "y", family="multinomial", type_multinomial="banana")
