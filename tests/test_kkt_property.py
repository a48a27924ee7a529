"""Property-based optimality: solver outputs satisfy the elastic-net KKT
conditions on random problems (hypothesis). This is solver-agnostic
ground truth — any convex-optimal method must pass."""

import numpy as np
from hypothesis import given, settings, strategies as st

from sgdnet_spark.glm import path as P
from sgdnet_spark.glm.providers import LocalXY


def kkt_violation_gaussian(C, b, beta, lam, alpha):
    """max violation of: grad_j + lam2*b_j + lam1*sign = 0 (active),
    |grad_j| <= lam1 (inactive); grad = C beta - b."""
    grad = C @ beta - b + lam * (1 - alpha) * beta
    l1 = lam * alpha
    viol = 0.0
    for j in range(len(beta)):
        if beta[j] != 0.0:
            viol = max(viol, abs(grad[j] + l1 * np.sign(beta[j])))
        else:
            viol = max(viol, max(abs(grad[j]) - l1, 0.0))
    return viol


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    alpha=st.floats(0.0, 1.0),
    lam_frac=st.floats(0.01, 0.9),
    p=st.integers(1, 8),
)
def test_gaussian_kkt(seed, alpha, lam_frac, p):
    rng = np.random.default_rng(seed)
    n = 120
    x = rng.normal(size=(n, p)) * rng.uniform(0.5, 3.0, size=p)
    beta_true = rng.normal(size=p) * (rng.random(p) < 0.6)
    y = rng.normal() + x @ beta_true + rng.normal(scale=0.5, size=n)
    prov = LocalXY(x, y)
    mom = prov.moments()
    x_mean, x_std = P._standardization(mom, True, True)
    C, B = P._gram(mom, x_mean, x_std, True)
    b = C[:, 0] * 0 + B[:, 0]
    lam_max = float(np.max(np.abs(b))) / max(alpha, 1e-3)
    lam = lam_frac * lam_max
    res = P.gaussian_path(LocalXY(x, y), alpha=alpha, lambdas=[lam], thresh=1e-10)
    beta_std = res.beta[:, 0] * x_std  # back to standardized scale
    assert kkt_violation_gaussian(C, b, beta_std, lam, alpha) < 1e-6


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 10_000), alpha=st.floats(0.1, 1.0))
def test_binomial_kkt(seed, alpha):
    rng = np.random.default_rng(seed)
    n, p = 300, 4
    x = rng.normal(size=(n, p))
    eta = x @ rng.normal(size=p)
    y = (rng.random(n) < 1 / (1 + np.exp(-eta))).astype(float)
    if y.sum() < 5 or y.sum() > n - 5:
        return
    prov = LocalXY(x, y.reshape(-1, 1))
    mom = prov.moments()
    x_mean, x_std = P._standardization(mom, True, True)
    B = P._gram(mom, x_mean, x_std, True)[1]
    lam = 0.3 * float(np.max(np.abs(B[:, 0]))) / alpha
    res = P.binomial_path(prov, alpha=alpha, lambdas=[lam], thresh=1e-10, outer_maxit=60)
    # KKT on the exact logistic gradient at the solution (standardized scale)
    beta_std = res.beta[:, 0] * x_std
    b0 = res.a0[0] + float(x_mean @ res.beta[:, 0])
    xs = (x - x_mean) / x_std
    mu = 1 / (1 + np.exp(-(xs @ beta_std + b0)))
    grad = xs.T @ (mu - y) / n + lam * (1 - alpha) * beta_std
    l1 = lam * alpha
    for j in range(p):
        if beta_std[j] != 0.0:
            assert abs(grad[j] + l1 * np.sign(beta_std[j])) < 1e-4
        else:
            assert abs(grad[j]) <= l1 + 1e-4
    # intercept is unpenalized: its gradient vanishes
    assert abs(float(np.mean(mu - y))) < 1e-6


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 10_000), alpha=st.floats(0.1, 1.0))
def test_poisson_kkt(seed, alpha):
    """Round-5 family: poisson (log link) path points satisfy the
    elastic-net KKT conditions on the exact poisson gradient."""
    rng = np.random.default_rng(seed)
    n, p = 300, 4
    x = rng.normal(size=(n, p))
    eta = 0.3 + x @ (rng.normal(size=p) * 0.4)
    y = rng.poisson(np.exp(eta)).astype(float)
    if y.sum() == 0:
        return
    prov = LocalXY(x, y.reshape(-1, 1))
    mom = prov.moments()
    x_mean, x_std = P._standardization(mom, True, True)
    B = P._gram(mom, x_mean, x_std, True)[1]
    lam = 0.3 * float(np.max(np.abs(B[:, 0]))) / alpha
    res = P.poisson_path(prov, alpha=alpha, lambdas=[lam], thresh=1e-10, outer_maxit=60)
    beta_std = res.beta[:, 0] * x_std
    b0 = res.a0[0] + float(x_mean @ res.beta[:, 0])
    xs = (x - x_mean) / x_std
    mu = np.exp(xs @ beta_std + b0)
    grad = xs.T @ (mu - y) / n + lam * (1 - alpha) * beta_std
    l1 = lam * alpha
    for j in range(p):
        if beta_std[j] != 0.0:
            assert abs(grad[j] + l1 * np.sign(beta_std[j])) < 1e-4
        else:
            assert abs(grad[j]) <= l1 + 1e-4
    assert abs(float(np.mean(mu - y))) < 1e-6
