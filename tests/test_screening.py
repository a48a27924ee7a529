"""Sequential strong-rule screening (Tibshirani et al., JRSS-B 2012)
for the binomial/poisson IRLS quadratic paths.

The rule is a heuristic filter; exactness comes from the KKT re-check
over the full gradient — so a screened path must converge to the SAME
optimum as the unscreened one (difference bounded by the inner solver
tolerance, support identical), while the per-lambda quadratic cost
drops from O(n·p²) to O(n·|S|²) + one O(n·p) gradient pass. Auto-on
only for p > 100 so the small-p golden-constant entries are untouched.
"""

import numpy as np
import pytest

from sgdnet_spark.glm import path as P
from sgdnet_spark.glm.providers import LocalXY


def _sparse_problem(seed, n=3000, p=200, s_true=6):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, p))
    beta = np.zeros(p)
    beta[rng.choice(p, s_true, replace=False)] = rng.normal(size=s_true)
    eta = 0.3 + X @ beta
    yb = (rng.random(n) < 1 / (1 + np.exp(-eta))).astype(float).reshape(-1, 1)
    scale = 3.0 / np.abs(eta).max()
    yp = rng.poisson(np.exp(0.2 + eta * scale)).astype(float).reshape(-1, 1)
    return X, yb, yp


@pytest.mark.parametrize("fam", ["binomial", "poisson"])
def test_screened_path_matches_unscreened(fam):
    X, yb, yp = _sparse_problem(5)
    y = yb if fam == "binomial" else yp
    fn = P.binomial_path if fam == "binomial" else P.poisson_path
    kw = dict(alpha=1.0, nlambda=20, lambda_min_ratio=1e-2, thresh=1e-8)
    off = fn(LocalXY(X, y), screen=False, **kw)
    on = fn(LocalXY(X, y), screen=True, **kw)
    assert np.array_equal(off.beta != 0, on.beta != 0), "support must be identical"
    # both iterate paths converge to the same optimum; the gap is bounded
    # by the inner tolerance (verified to scale linearly with thresh)
    assert np.abs(off.beta - on.beta).max() < 1e-6
    assert np.abs(off.a0 - on.a0).max() < 1e-6
    assert np.allclose(off.dev_ratio, on.dev_ratio, atol=1e-7)


def test_screening_auto_threshold():
    """auto => off at small p (golden-constant stability), on above 100."""
    X, yb, _ = _sparse_problem(7, n=500, p=20)
    pv_auto, pv_off = LocalXY(X, yb), LocalXY(X, yb)
    a = P.binomial_path(pv_auto, alpha=1.0, nlambda=8, lambda_min_ratio=1e-2, screen="auto")
    b = P.binomial_path(pv_off, alpha=1.0, nlambda=8, lambda_min_ratio=1e-2, screen=False)
    # at p=20 auto means OFF: identical call sequence => bit-identical output
    assert pv_auto.passes == pv_off.passes
    assert np.array_equal(a.beta, b.beta)


def test_screened_elastic_net_and_weights():
    """Screening composes with alpha<1 and sample weights."""
    X, yb, yp = _sparse_problem(11)
    rng = np.random.default_rng(3)
    w = rng.uniform(0.5, 2.0, size=len(X))
    kw = dict(alpha=0.5, nlambda=12, lambda_min_ratio=1e-2, thresh=1e-8)
    off = P.poisson_path(LocalXY(X, yp, w=w), screen=False, **kw)
    on = P.poisson_path(LocalXY(X, yp, w=w), screen=True, **kw)
    assert np.array_equal(off.beta != 0, on.beta != 0)
    assert np.abs(off.beta - on.beta).max() < 1e-6


def test_screened_restricted_quadratic_is_cheaper():
    """The restricted quadratics must actually be restricted: total
    quadratic cells processed shrink by >3x on a sparse problem (the
    path's dense tail — df grows toward p at small lambda — is what
    keeps the measured ratio below the early-path ~50x)."""
    X, yb, _ = _sparse_problem(13, n=2000, p=300)

    class CountingXY(LocalXY):
        quad_cells = 0

        def irls_binomial(self, coef, intercept, cols=None):
            k = len(cols) if cols is not None else self.p
            CountingXY.quad_cells += k * k
            return super().irls_binomial(coef, intercept, cols=cols)

    CountingXY.quad_cells = 0
    P.binomial_path(CountingXY(X, yb), alpha=1.0, nlambda=12, lambda_min_ratio=1e-2,
                    screen=False)
    full = CountingXY.quad_cells
    CountingXY.quad_cells = 0
    P.binomial_path(CountingXY(X, yb), alpha=1.0, nlambda=12, lambda_min_ratio=1e-2,
                    screen=True)
    screened = CountingXY.quad_cells
    assert screened * 3 < full, (screened, full)
