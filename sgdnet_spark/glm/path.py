"""Regularization-path drivers, one per family.

Mirrors the reference semantics (src/utils.h:144 RegularizationPath,
src/families.h LambdaMax): lambda_max is the smallest penalty that zeroes
every coefficient, the path is ``nlambda`` log-spaced values down to
``lambda_max * lambda_min_ratio``, fits warm-start from the previous
lambda, and coefficients are returned unstandardized (original x scale).

All drivers consume a provider (providers.py) — they never see row data,
only p-sized aggregates, so the same code runs on numpy or on a cluster.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from sgdnet_spark.glm.solvers import (
    enet_cd_gram,
    group_cd_gram,
    log_space,
    soft_threshold,
    wls_enet_cd,
)

ALPHA_FLOOR = 1e-3  # reference utils.h:159 divides by max(elasticnet_mix, 0.001)


@dataclass
class PathResult:
    family: str
    lambdas: np.ndarray          # (nl,)
    a0: np.ndarray               # (nl,) or (k, nl)
    beta: np.ndarray             # (p, nl) or (k, p, nl)
    df: np.ndarray               # (nl,) nonzero count
    dev_ratio: np.ndarray        # (nl,)
    nulldev: float
    npasses: int
    x_mean: np.ndarray = field(default=None)
    x_std: np.ndarray = field(default=None)
    dfmat: np.ndarray | None = None  # (k, nl) for multivariate families
    # diagnostics (reference options(sgdnet.debug): attr(fit,'diagnostics')$loss):
    # one list of objective values per lambda (iterative families record one
    # entry per outer IRLS step; gram families record the final objective)
    loss: list | None = None
    # relaxed (debiased) fit: unpenalized refit on each lambda's active
    # set (glmnet relax=TRUE); None unless requested
    a0_relaxed: np.ndarray | None = None
    beta_relaxed: np.ndarray | None = None
    dev_ratio_relaxed: np.ndarray | None = None


def _standardization(mom, standardize: bool, center: bool):
    x_mean = mom.x_mean if center else np.zeros_like(mom.x_mean)
    if standardize:
        # the scale is the MEAN-CENTERED population std regardless of
        # center/intercept: reference utils.h:105 computes
        # StandardDeviation(x, x_center) unconditionally (the sparse
        # path too applies scale-only but derives the scale around the
        # mean)
        std = np.where(mom.x_std() > 0, mom.x_std(), 1.0)
    else:
        std = np.ones_like(x_mean)
    return x_mean, std


def _gram(mom, x_mean, x_std, center: bool):
    """Standardized C = X~'X~/n and B = X~'Y/n from raw moments."""
    n = mom.n
    inv = 1.0 / x_std
    if center:
        cov = mom.sum_xx / n - np.outer(mom.x_mean, mom.x_mean)
        bxy = mom.sum_xy / n - np.outer(mom.x_mean, mom.y_mean)
    else:
        cov = mom.sum_xx / n
        bxy = mom.sum_xy / n
    C = cov * np.outer(inv, inv)
    B = bxy * inv[:, None]
    return C, B


def _lambda_path(lambda_max, nlambda, lambda_min_ratio, lambdas):
    if lambdas is not None and len(lambdas) > 0:
        return np.sort(np.asarray(lambdas, dtype=float))[::-1].copy()
    if lambda_max <= 0:
        return np.zeros(nlambda)
    return log_space(lambda_max, lambda_max * lambda_min_ratio, nlambda)


def _unstandardize(beta_std: np.ndarray, x_mean, x_std, y_off: float, intercept: bool):
    """beta on original x scale + intercept (reference utils.h:Unstandardize)."""
    b = beta_std / x_std
    a0 = (y_off - float(x_mean @ b)) if intercept else 0.0
    return b, a0


def _penalty_options(
    p: int,
    x_std: np.ndarray,
    penalty_factor=None,
    exclude=None,
    lower_limits=None,
    upper_limits=None,
):
    """Normalize glmnet-style differential-penalty options to solver vectors.

    Returns ``(pf, lo, hi)``: ``pf`` is the rescaled penalty-factor vector
    (None if uniform and nothing excluded), ``lo``/``hi`` are box limits on
    the STANDARDIZED coefficient scale (None if unbounded). Semantics match
    glmnet (the reference's declared compatibility target, R/sgdnet.R
    'Relationship with glmnet'): ``penalty.factor`` is rescaled so the
    finite factors sum to their count, ``exclude`` indices get an infinite
    factor, and limits are per-feature on the ORIGINAL x scale and must
    bracket zero (lower <= 0 <= upper).
    """
    pf = None
    if penalty_factor is not None:
        pf = np.asarray(penalty_factor, dtype=float).copy()
        if pf.shape != (p,):
            raise ValueError(f"penalty_factor must have length {p}, got {pf.shape}")
        if np.any(np.isnan(pf)) or np.any(pf < 0):
            raise ValueError("penalty_factor entries must be >= 0 (inf allowed = exclude)")
    if exclude is not None and len(exclude):
        idx = np.asarray(exclude, dtype=int)
        if idx.min() < 0 or idx.max() >= p:
            raise ValueError(f"exclude indices must be in [0, {p})")
        if pf is None:
            pf = np.ones(p)
        pf[idx] = np.inf
    if pf is not None:
        finite = np.isfinite(pf)
        tot = float(pf[finite].sum())
        if finite.any():
            if tot <= 0:
                raise ValueError("at least one finite penalty_factor must be > 0")
            pf[finite] *= finite.sum() / tot

    def _limits(v, name):
        if v is None:
            return None
        a = np.asarray(v, dtype=float)
        if a.ndim == 0:
            a = np.full(p, float(a))
        if a.shape != (p,):
            raise ValueError(f"{name} must be a scalar or length-{p}")
        return a

    lo = _limits(lower_limits, "lower_limits")
    hi = _limits(upper_limits, "upper_limits")
    if lo is not None and np.any(lo > 0):
        raise ValueError("lower_limits must be <= 0 (beta = 0 must stay feasible)")
    if hi is not None and np.any(hi < 0):
        raise ValueError("upper_limits must be >= 0 (beta = 0 must stay feasible)")
    if lo is not None and hi is not None and np.any(lo > hi):
        raise ValueError("lower_limits must be <= upper_limits")
    # bounds act on the standardized coefficients: b_std = b_orig * x_std
    if lo is not None:
        lo = lo * x_std
    if hi is not None:
        hi = hi * x_std
    return pf, lo, hi


def _lambda_max_scaled(score: np.ndarray, alpha: float, pf) -> float:
    """lambda_max under differential penalties: the smallest lam zeroing
    every PENALIZED coordinate — max_j score_j/pf_j over finite pf_j > 0
    (families.h:121 LambdaMax generalized per glmnet's vp scaling)."""
    a = max(alpha, ALPHA_FLOOR)
    if pf is None:
        return float(np.max(score)) / a
    mask = np.isfinite(pf) & (pf > 0)
    if not mask.any():
        return float(np.max(score)) / a
    return float(np.max(score[mask] / pf[mask])) / a


def _fista_terms(lam: float, alpha: float, pf):
    """Per-coordinate FISTA penalty terms: (l1_vec, l2_vec, l2_max).

    l1_j = lam*alpha*pf_j rides through the soft-threshold (an infinite
    factor pins the coordinate at exactly 0); the ridge term masks
    infinities to 0 so the smooth gradient stays finite. Scalars when
    the penalty is uniform (pf None)."""
    if pf is None:
        return lam * alpha, lam * (1.0 - alpha), lam * (1.0 - alpha)
    fin = np.isfinite(pf)
    pfm = np.where(fin, pf, 0.0)
    l1 = np.where(fin, lam * alpha * pfm, np.inf)
    l2 = lam * (1.0 - alpha) * pfm
    return l1, l2, float(np.max(l2)) if l2.size else 0.0


def _penalty_value(beta: np.ndarray, lam: float, alpha: float, pf) -> float:
    """Objective penalty term with per-coordinate factors (excluded
    coordinates contribute 0: their coefficient is identically 0)."""
    w = np.ones(beta.shape[0]) if pf is None else np.where(np.isfinite(pf), pf, 0.0)
    if beta.ndim == 1:
        l1 = float(w @ np.abs(beta))
        l2 = float(w @ (beta * beta))
    else:
        l1 = float(w @ np.linalg.norm(beta, axis=1))
        l2 = float(w @ (beta * beta).sum(axis=1))
    return lam * (alpha * l1 + (1.0 - alpha) / 2.0 * l2)


def gaussian_path(
    provider,
    alpha: float,
    nlambda: int = 100,
    lambda_min_ratio: float = 1e-4,
    lambdas=None,
    standardize: bool = True,
    intercept: bool = True,
    thresh: float = 1e-7,
    maxit: int = 1000,
    mom=None,
    penalty_factor=None,
    exclude=None,
    lower_limits=None,
    upper_limits=None,
    relax: bool = False,
) -> PathResult:
    mom = mom or provider.moments()
    n = mom.n
    x_mean, x_std = _standardization(mom, standardize, intercept)
    C, B = _gram(mom, x_mean, x_std, intercept)
    b = B[:, 0]
    y_mean = float(mom.y_mean[0]) if intercept else 0.0
    # variance of y around the null model
    if intercept:
        y_var = float(mom.sum_yy[0] / n - y_mean**2)
    else:
        y_var = float(mom.sum_yy[0] / n)
    nulldev = y_var * n
    p = len(b)
    pf, lo, hi = _penalty_options(p, x_std, penalty_factor, exclude, lower_limits, upper_limits)

    lambda_max = _lambda_max_scaled(np.abs(b), alpha, pf)
    lam_path = _lambda_path(lambda_max, nlambda, lambda_min_ratio, lambdas)
    nl = len(lam_path)

    # the ridge closed form covers every unconstrained case: finite
    # factors scale the diagonal, infinite (excluded) coordinates drop
    # out of the system exactly; only box limits go through CD
    ridge_closed = alpha == 0.0 and lo is None and hi is None
    beta = np.zeros(p)
    out_beta = np.zeros((p, nl))
    out_a0 = np.zeros(nl)
    out_df = np.zeros(nl, dtype=int)
    out_dr = np.zeros(nl)
    out_beta_r = np.zeros((p, nl)) if relax else None
    out_a0_r = np.zeros(nl) if relax else None
    out_dr_r = np.zeros(nl) if relax else None
    relax_cache: dict = {}
    losses: list = []
    npasses = 0
    for i, lam in enumerate(lam_path):
        if ridge_closed:
            # ridge: (C + lam diag(pf)) beta = b has a closed form — solve
            # it directly (exact, and the basis of the DuckDB-checkable
            # oracle queries; reference tests/testthat/test-gaussian.R:33
            # does the same cross-check against glmnet's ridge).
            if pf is None:
                beta = np.linalg.solve(C + lam * np.eye(p), b)
            else:
                fin = np.isfinite(pf)
                beta = np.zeros(p)
                beta[fin] = np.linalg.solve(
                    C[np.ix_(fin, fin)] + lam * np.diag(pf[fin]), b[fin]
                )
            its = 1
        else:
            beta, its = enet_cd_gram(C, b, lam, alpha, beta, tol=thresh, maxit=maxit,
                                     pf=pf, lo=lo, hi=hi)
        npasses += its
        rss_n = y_var - 2.0 * float(b @ beta) + float(beta @ C @ beta)
        pen = _penalty_value(beta, lam, alpha, pf)
        losses.append([0.5 * rss_n + pen])
        out_dr[i] = 1.0 - rss_n * n / nulldev if nulldev > 0 else 0.0
        ob, oa0 = _unstandardize(beta, x_mean, x_std, y_mean, intercept)
        out_beta[:, i] = ob
        out_a0[i] = oa0
        out_df[i] = int(np.count_nonzero(beta))
        if relax:
            # relaxed (debiased) fit, glmnet relax=TRUE: unpenalized OLS on
            # this lambda's active set — closed form from the SAME Gram, no
            # extra data pass; supports repeat along the path, so cache.
            # Box limits stay binding on the refit (glmnet semantics: the
            # relaxed fit is a lambda=0 fit under the SAME constraints), so
            # the bounded case runs projected CD instead of lstsq.
            A = tuple(np.nonzero(beta)[0])
            rb = relax_cache.get(A)
            if rb is None:
                rb = np.zeros(p)
                if A:
                    idx = np.asarray(A, dtype=np.intp)
                    if lo is not None or hi is not None:
                        rb[idx], _ = enet_cd_gram(
                            C[np.ix_(idx, idx)], b[idx], 0.0, 0.0,
                            beta[idx].copy(), tol=min(thresh, 1e-9), maxit=maxit,
                            lo=None if lo is None else lo[idx],
                            hi=None if hi is None else hi[idx],
                        )
                    else:
                        rb[idx] = np.linalg.lstsq(
                            C[np.ix_(idx, idx)], b[idx], rcond=None
                        )[0]
                relax_cache[A] = rb
            rssr = y_var - 2.0 * float(b @ rb) + float(rb @ C @ rb)
            out_dr_r[i] = 1.0 - rssr * n / nulldev if nulldev > 0 else 0.0
            orb, ora0 = _unstandardize(rb, x_mean, x_std, y_mean, intercept)
            out_beta_r[:, i] = orb
            out_a0_r[i] = ora0
    return PathResult(
        "gaussian", lam_path, out_a0, out_beta, out_df, out_dr, nulldev,
        getattr(provider, "passes", 1), x_mean, x_std, loss=losses,
        a0_relaxed=out_a0_r, beta_relaxed=out_beta_r, dev_ratio_relaxed=out_dr_r,
    )


def mgaussian_path(
    provider,
    alpha: float,
    nlambda: int = 100,
    lambda_min_ratio: float = 1e-4,
    lambdas=None,
    standardize: bool = True,
    intercept: bool = True,
    standardize_response: bool = False,
    thresh: float = 1e-7,
    maxit: int = 1000,
    mom=None,
    penalty_factor=None,
    exclude=None,
) -> PathResult:
    mom = mom or provider.moments()
    n = mom.n
    k = len(mom.sum_y)
    x_mean, x_std = _standardization(mom, standardize, intercept)
    C, B = _gram(mom, x_mean, x_std, intercept)
    y_mean = mom.y_mean if intercept else np.zeros(k)
    y_var = mom.sum_yy / n - y_mean**2 if intercept else mom.sum_yy / n
    nulldev = float(y_var.sum()) * n

    y_scale = np.ones(k)
    if standardize_response:
        y_scale = np.where(mom.y_std() > 0, mom.y_std(), 1.0)
    Bs = B / y_scale[None, :]
    p = Bs.shape[0]
    pf, _, _ = _penalty_options(p, x_std, penalty_factor, exclude)

    # group lambda_max: smallest lam with all PENALIZED row-groups zero
    lambda_max = _lambda_max_scaled(np.linalg.norm(Bs, axis=1), alpha, pf)
    lam_path = _lambda_path(lambda_max, nlambda, lambda_min_ratio, lambdas)
    nl = len(lam_path)

    beta = np.zeros((p, k))
    out_beta = np.zeros((k, p, nl))
    out_a0 = np.zeros((k, nl))
    out_df = np.zeros(nl, dtype=int)
    out_dfmat = np.zeros((k, nl), dtype=int)
    out_dr = np.zeros(nl)
    npasses = 0
    yv_scaled = y_var / (y_scale**2)
    for i, lam in enumerate(lam_path):
        beta, its = group_cd_gram(C, Bs, lam, alpha, beta, tol=thresh, maxit=maxit, pf=pf)
        npasses += its
        # per-response RSS/n on the scaled problem, unscaled back to y units
        rss_c = yv_scaled - 2.0 * np.einsum("pc,pc->c", Bs, beta) + np.einsum("pc,pq,qc->c", beta, C, beta)
        dev = float(np.sum(rss_c * y_scale**2)) * n
        out_dr[i] = 1.0 - dev / nulldev if nulldev > 0 else 0.0
        for c in range(k):
            ob, oa0 = _unstandardize(beta[:, c] * y_scale[c], x_mean, x_std, float(y_mean[c]), intercept)
            out_beta[c, :, i] = ob
            out_a0[c, i] = oa0
            out_dfmat[c, i] = int(np.count_nonzero(beta[:, c]))
        out_df[i] = int(np.count_nonzero(np.any(beta != 0.0, axis=1)))
    return PathResult(
        "mgaussian", lam_path, out_a0, out_beta, out_df, out_dr, nulldev,
        getattr(provider, "passes", 1), x_mean, x_std, out_dfmat,
    )


def gaussian_path_fista(
    provider,
    alpha: float,
    nlambda: int = 20,
    lambda_min_ratio: float = 1e-2,
    lambdas=None,
    standardize: bool = True,
    intercept: bool = True,
    thresh: float = 1e-6,
    maxit: int = 200,
    mom=None,
    penalty_factor=None,
    exclude=None,
    lower_limits=None,
    upper_limits=None,
) -> PathResult:
    """Wide-p gaussian path: accelerated proximal gradient (FISTA) with
    one distributed gradient pass per iteration — O(p) memory, never a
    p×p Gram. Lipschitz constant from distributed power iteration
    (Cv = grad(v) + b, one pass per step).

    The n-scalable complement to gaussian_path: use when p² no longer
    fits the driver (SURVEY §7 known-gaps closure).
    """
    mom = mom or provider.moments()
    n = mom.n
    x_mean, x_std = _standardization(mom, standardize, intercept)
    provider.set_standardization(x_mean, 1.0 / x_std)
    y_mean = float(mom.y_mean[0]) if intercept else 0.0
    y_var = float(mom.sum_yy[0] / n - y_mean**2) if intercept else float(mom.sum_yy[0] / n)
    nulldev = y_var * n
    inv = 1.0 / x_std
    if intercept:
        b = (mom.sum_xy[:, 0] / n - mom.x_mean * y_mean) * inv
    else:
        b = (mom.sum_xy[:, 0] / n) * inv
    p = len(b)

    def grad_at(v: np.ndarray) -> tuple[np.ndarray, float]:
        g, _, rssn = provider.gradient_gaussian(v, y_mean)
        return g, rssn

    # power iteration for L = lambda_max(C): Cv = grad(v) + b
    rng = np.random.default_rng(0)
    v = rng.normal(size=p)
    v /= np.linalg.norm(v)
    L = 1.0
    for _ in range(6):
        cv = grad_at(v)[0] + b
        nrm = float(np.linalg.norm(cv))
        if nrm == 0:
            break
        L = nrm
        v = cv / nrm
    L *= 1.05  # safety margin over the power-iteration estimate
    pf, lo, hi = _penalty_options(p, x_std, penalty_factor, exclude, lower_limits, upper_limits)
    boxed = lo is not None or hi is not None

    lambda_max = _lambda_max_scaled(np.abs(b), alpha, pf)
    lam_path = _lambda_path(lambda_max, nlambda, lambda_min_ratio, lambdas)
    nl = len(lam_path)

    beta = np.zeros(p)
    out_beta = np.zeros((p, nl))
    out_a0 = np.zeros(nl)
    out_df = np.zeros(nl, dtype=int)
    out_dr = np.zeros(nl)
    pf_zero = pf is not None and bool(np.any(pf == 0))
    auto_path = (lambdas is None or len(lambdas) == 0) and alpha > 0 and not pf_zero
    rssn_last = y_var
    for i, lam in enumerate(lam_path):
        if auto_path and i == 0:
            out_a0[i] = y_mean
            continue
        l1v, l2v, l2max = _fista_terms(lam, alpha, pf)
        step = 1.0 / (L + l2max)
        z = beta.copy()
        t = 1.0
        prev = beta.copy()
        for _ in range(maxit):
            g, rssn_last = grad_at(z)
            cand = z - step * (g + l2v * z)
            new = soft_threshold(cand, step * l1v)
            if boxed:
                new = np.clip(new, lo if lo is not None else -np.inf,
                              hi if hi is not None else np.inf)
            t_new = (1.0 + np.sqrt(1.0 + 4.0 * t * t)) / 2.0
            z = new + (t - 1.0) / t_new * (new - prev)
            delta = float(np.max(np.abs(new - prev)))
            scale = max(float(np.max(np.abs(new))), 1e-12)
            prev = new
            t = t_new
            if delta <= thresh * scale:
                break
        beta = prev
        g, rssn_last = grad_at(beta)
        out_dr[i] = 1.0 - rssn_last * n / nulldev if nulldev > 0 else 0.0
        ob, oa0 = _unstandardize(beta, x_mean, x_std, y_mean, intercept)
        out_beta[:, i] = ob
        out_a0[i] = oa0
        out_df[i] = int(np.count_nonzero(beta))
    return PathResult(
        "gaussian", lam_path, out_a0, out_beta, out_df, out_dr, nulldev,
        getattr(provider, "passes", 1), x_mean, x_std,
    )


def _power_iter_L(provider, p: int, iters: int = 6) -> float:
    """lambda_max of the standardized Gram via distributed power
    iteration (one cov_vec pass per step) — never materializes p²."""
    rng = np.random.default_rng(0)
    v = rng.normal(size=p)
    v /= np.linalg.norm(v)
    L = 1.0
    for _ in range(iters):
        cv = provider.cov_vec(v)
        nrm = float(np.linalg.norm(cv))
        if nrm == 0:
            break
        L = nrm
        v = cv / nrm
    return L * 1.05


def binomial_path_fista(
    provider,
    alpha: float,
    nlambda: int = 20,
    lambda_min_ratio: float = 1e-2,
    lambdas=None,
    standardize: bool = True,
    intercept: bool = True,
    thresh: float = 1e-7,
    maxit: int = 500,
    mom=None,
    penalty_factor=None,
    exclude=None,
    lower_limits=None,
    upper_limits=None,
) -> PathResult:
    """Wide-p / sparse logistic elastic-net path: accelerated proximal
    gradient with one distributed gradient pass per iteration — O(p)
    driver state, never a p×p quadratic (the saga-sparse.h capability,
    Spark-shaped). Lipschitz bound: max(1, lambda_max(C))/4 for the
    centered extended design [1, X~]."""
    mom = mom or provider.moments_diag()
    n = mom.n
    x_mean, x_std = _standardization(mom, standardize, intercept)
    provider.set_standardization(x_mean, 1.0 / x_std)
    inv = 1.0 / x_std
    pbar = float(mom.y_mean[0])
    p = len(x_mean)
    has_off = getattr(provider, "has_offset", False)
    if not has_off:
        ll_null = n * (pbar * np.log(max(pbar, 1e-300)) + (1 - pbar) * np.log(max(1 - pbar, 1e-300)))
        if intercept:
            b = (mom.sum_xy[:, 0] / n - mom.x_mean * pbar) * inv
        else:
            b = (mom.sum_xy[:, 0] / n) * inv
        b0 = float(np.log(pbar / (1 - pbar))) if intercept else 0.0
    else:
        # offset: intercept-only Newton via empty-column IRLS passes
        # (O(n) each), then lambda_max off the null gradient
        b0 = 0.0
        ecols = np.zeros(0, dtype=np.intp)
        for _ in range(10):
            sw, _, _, _, swz, ll = provider.irls_binomial(np.zeros(0), b0, cols=ecols)
            if not intercept:
                break
            b0_new = swz / sw
            if abs(b0_new - b0) <= 1e-10 * max(1.0, abs(b0_new)):
                b0 = b0_new
                break
            b0 = b0_new
        ll_null = ll
        g0, _, _ = provider.grad_binomial(np.zeros(p), b0)
        b = -g0
    nulldev = -2.0 * ll_null
    L = max(1.0, _power_iter_L(provider, p)) / 4.0
    pf, lo, hi = _penalty_options(p, x_std, penalty_factor, exclude, lower_limits, upper_limits)
    boxed = lo is not None or hi is not None

    # binomial lambda_max: gradient of the NULL model (families.h:198)
    lambda_max = _lambda_max_scaled(np.abs(b), alpha, pf)
    lam_path = _lambda_path(lambda_max, nlambda, lambda_min_ratio, lambdas)
    nl = len(lam_path)

    coef = np.zeros(p)
    out_beta = np.zeros((p, nl))
    out_a0 = np.zeros(nl)
    out_df = np.zeros(nl, dtype=int)
    out_dr = np.zeros(nl)
    pf_zero = pf is not None and bool(np.any(pf == 0))
    auto_path = (lambdas is None or len(lambdas) == 0) and alpha > 0 and not pf_zero
    ll = ll_null
    for i, lam in enumerate(lam_path):
        if auto_path and i == 0:
            out_a0[i] = b0 if intercept else 0.0
            continue
        l1v, l2v, l2max = _fista_terms(lam, alpha, pf)
        step = 1.0 / (L + l2max)
        z, zb = coef.copy(), b0
        t = 1.0
        prev, prevb = coef.copy(), b0
        for _ in range(maxit):
            g, gb, ll = provider.grad_binomial(z, zb)
            cand = z - step * (g + l2v * z)
            new = soft_threshold(cand, step * l1v)
            if boxed:
                new = np.clip(new, lo if lo is not None else -np.inf,
                              hi if hi is not None else np.inf)
            newb = zb - step * gb if intercept else 0.0
            t_new = (1.0 + np.sqrt(1.0 + 4.0 * t * t)) / 2.0
            z = new + (t - 1.0) / t_new * (new - prev)
            zb = newb + (t - 1.0) / t_new * (newb - prevb)
            delta = max(float(np.max(np.abs(new - prev))), abs(newb - prevb))
            scale = max(float(np.max(np.abs(new))) if p else 0.0, abs(newb), 1e-12)
            prev, prevb = new, newb
            t = t_new
            if delta <= max(thresh, 1e-7) * scale:
                break
        coef, b0 = prev, prevb
        _, _, ll = provider.grad_binomial(coef, b0)
        out_dr[i] = 1.0 - (-2.0 * ll) / nulldev if nulldev > 0 else 0.0
        ob, _ = _unstandardize(coef, x_mean, x_std, 0.0, intercept)
        out_beta[:, i] = ob
        out_a0[i] = b0 - float(x_mean @ ob) if intercept else 0.0
        out_df[i] = int(np.count_nonzero(coef))
    return PathResult(
        "binomial", lam_path, out_a0, out_beta, out_df, out_dr, nulldev,
        getattr(provider, "passes", 1), x_mean, x_std,
    )


def multinomial_path_fista(
    provider,
    alpha: float,
    nlambda: int = 20,
    lambda_min_ratio: float = 1e-2,
    lambdas=None,
    standardize: bool = True,
    intercept: bool = True,
    thresh: float = 1e-7,
    maxit: int = 500,
    mom=None,
    grouped: bool = False,
    penalty_factor=None,
    exclude=None,
) -> PathResult:
    """Wide-p / sparse softmax elastic-net path — k×p proximal-gradient
    twin of binomial_path_fista (elementwise soft-threshold per class,
    glmnet's ungrouped multinomial penalty).

    ``grouped=True`` swaps the elementwise prox for the row-wise group
    soft-threshold (glmnet type.multinomial='grouped': the L1 part
    becomes lam*alpha*sum_j ||beta_j.||_2 over each feature's k-vector
    of class coefficients, so a feature enters or leaves the model for
    ALL classes together). This closes the reference's own TODO at
    R/sgdnet.R:265 ("implement group lasso penalty for multinomial
    model" — it forces type.multinomial='ungrouped'); the group prox is
    the same operator the mgaussian family uses (solvers.group_cd_gram),
    applied here on the isotropic FISTA step where it has a closed form
    even though per-class IRLS curvatures differ."""
    mom = mom or provider.moments_diag()
    n = mom.n
    k = len(mom.sum_y)
    x_mean, x_std = _standardization(mom, standardize, intercept)
    provider.set_standardization(x_mean, 1.0 / x_std)
    inv = 1.0 / x_std
    pri = mom.y_mean
    p = len(x_mean)
    has_off = getattr(provider, "has_offset", False)
    if not has_off:
        ll_null = float(n * np.sum(pri * np.log(np.maximum(pri, 1e-300))))
        if intercept:
            B = (mom.sum_xy / n - np.outer(mom.x_mean, pri)) * inv[:, None]
        else:
            B = (mom.sum_xy / n) * inv[:, None]
        b0s = np.log(np.maximum(pri, 1e-300)) if intercept else np.zeros(k)
        b0s = b0s - b0s.mean() if intercept else b0s
    else:
        # n×k offset: null intercepts/gradient have no moment closed form
        b0s, ll_null, g0 = _multinomial_null_offset(provider, pri, k, p, intercept)
        B = -g0.T  # (p, k) null gradient flips sign: B = <x~, y - P0>/n
    nulldev = -2.0 * ll_null
    # softmax hessian <= (1/2) I ⊗ C  (tighter 1/4 holds per class;
    # 1/2 is the safe multiclass bound)
    L = max(1.0, _power_iter_L(provider, p)) / 2.0

    pf, _, _ = _penalty_options(p, x_std, penalty_factor, exclude)
    # grouped: all-zero iff every row's null-gradient 2-norm is within
    # the group threshold, so lambda_max = max_j ||B_j.||_2 / (alpha pf_j)
    if grouped:
        lambda_max = _lambda_max_scaled(np.sqrt((B * B).sum(axis=1)), alpha, pf)
    else:
        lambda_max = _lambda_max_scaled(np.max(np.abs(B), axis=1), alpha, pf)
    lam_path = _lambda_path(lambda_max, nlambda, lambda_min_ratio, lambdas)
    nl = len(lam_path)

    coefs = np.zeros((k, p))
    out_beta = np.zeros((k, p, nl))
    out_a0 = np.zeros((k, nl))
    out_df = np.zeros(nl, dtype=int)
    out_dfmat = np.zeros((k, nl), dtype=int)
    out_dr = np.zeros(nl)
    pf_zero = pf is not None and bool(np.any(pf == 0))
    auto_path = (lambdas is None or len(lambdas) == 0) and alpha > 0 and not pf_zero
    for i, lam in enumerate(lam_path):
        if auto_path and i == 0:
            out_a0[:, i] = b0s - b0s.mean() if intercept else 0.0
            continue
        l1v, l2v, l2max = _fista_terms(lam, alpha, pf)
        step = 1.0 / (L + l2max)
        z, zb = coefs.copy(), b0s.copy()
        t = 1.0
        prev, prevb = coefs.copy(), b0s.copy()
        ll = ll_null
        for _ in range(maxit):
            G, gb, ll = provider.grad_multinomial(z, zb)
            # z is (k, p); per-feature penalty vectors broadcast over rows
            l2row = l2v if np.isscalar(l2v) else l2v[None, :]
            cand = z - step * (G + l2row * z)
            if grouped:
                # row-wise group soft-threshold over the k classes of
                # each feature (cand is (k, p); groups are columns);
                # an infinite factor drives scl to 0 = excluded
                nrm = np.sqrt((cand * cand).sum(axis=0))
                scl = np.maximum(0.0, 1.0 - step * l1v / np.maximum(nrm, 1e-300))
                new = cand * scl
            else:
                new = soft_threshold(cand, step * (l1v if np.isscalar(l1v) else l1v[None, :]))
            newb = zb - step * gb if intercept else np.zeros(k)
            t_new = (1.0 + np.sqrt(1.0 + 4.0 * t * t)) / 2.0
            z = new + (t - 1.0) / t_new * (new - prev)
            zb = newb + (t - 1.0) / t_new * (newb - prevb)
            delta = max(float(np.max(np.abs(new - prev))), float(np.max(np.abs(newb - prevb))))
            scale = max(float(np.max(np.abs(new))), float(np.max(np.abs(newb))), 1e-12)
            prev, prevb = new, newb
            t = t_new
            if delta <= max(thresh, 1e-7) * scale:
                break
        coefs, b0s = prev, prevb
        _, _, ll = provider.grad_multinomial(coefs, b0s)
        out_dr[i] = 1.0 - (-2.0 * ll) / nulldev if nulldev > 0 else 0.0
        for c in range(k):
            ob, _ = _unstandardize(coefs[c], x_mean, x_std, 0.0, intercept)
            out_beta[c, :, i] = ob
            out_a0[c, i] = b0s[c] - float(x_mean @ ob) if intercept else 0.0
            out_dfmat[c, i] = int(np.count_nonzero(coefs[c]))
        out_df[i] = int(np.count_nonzero(np.any(coefs != 0.0, axis=0)))
        if intercept:
            out_a0[:, i] -= out_a0[:, i].mean()
    return PathResult(
        "multinomial", lam_path, out_a0, out_beta, out_df, out_dr, nulldev,
        getattr(provider, "passes", 1), x_mean, x_std, out_dfmat,
    )


def _relax_refit_cached(
    cache: dict,
    irls,
    coef_pen: np.ndarray,
    b0_pen: float,
    *,
    p: int,
    n: int,
    intercept: bool,
    thresh: float,
    maxit: int,
    outer_maxit: int,
    lo,
    hi,
    stat0: float,
):
    """Shared relaxed-refit kernel for the IRLS families (glmnet
    relax=TRUE): unpenalized IRLS restricted to the active set,
    warm-started from the penalized solution, box limits kept binding
    (a lambda=0 fit under the SAME constraints). ``irls`` is the
    provider's family pass; its 6th return (log-likelihood or deviance)
    is passed through. Supports repeat along a path, so refits cache by
    support tuple."""
    A = tuple(np.nonzero(coef_pen)[0])
    hit = cache.get(A)
    if hit is None:
        idx = np.asarray(A, dtype=np.intp)
        cs = coef_pen[idx]
        rb0 = b0_pen
        stat = stat0
        for _ in range(outer_maxit):
            sw_, swx_, swxx_, swxz_, swz_, stat = irls(cs, rb0, cols=idx)
            new_cs, new_b0, _ = wls_enet_cd(
                sw_, swx_, swxx_, swxz_, swz_, n, 0.0, 0.0, cs, rb0, intercept,
                tol=thresh, maxit=maxit,
                lo=None if lo is None else lo[idx],
                hi=None if hi is None else hi[idx],
            )
            delta = max(float(np.max(np.abs(new_cs - cs))) if len(idx) else 0.0,
                        abs(new_b0 - rb0))
            scale = max(float(np.max(np.abs(new_cs))) if len(idx) else 0.0,
                        abs(new_b0), 1e-12)
            cs, rb0 = new_cs, new_b0
            if delta <= max(thresh, 1e-6) * scale:
                break
        full = np.zeros(p)
        full[idx] = cs
        hit = (full, float(rb0), float(stat))
        cache[A] = hit
    return hit


def _strong_set(g: np.ndarray, coef: np.ndarray, lam: float, lam_prev: float, alpha: float,
                pf=None):
    """Sequential strong rule (Tibshirani et al. 2012): keep j with
    |grad_j| >= pf_j*alpha*(2*lam - lam_prev), plus the current support
    (pf_j = 1 uniform; 0 = always kept, inf = excluded). The rule is a
    heuristic — callers MUST re-check KKT on the full gradient and
    re-solve with any violators added (exactness is restored there)."""
    thr = alpha * (2.0 * lam - lam_prev)
    if pf is not None:
        fin = np.isfinite(pf)
        # inf factor -> inf threshold -> never enters (masked multiply so
        # a non-positive thr can't produce nan/-inf against an inf factor)
        thr = np.where(fin, thr * np.where(fin, pf, 0.0), np.inf)
    S = np.union1d(np.where(np.abs(g) >= thr)[0], np.nonzero(coef)[0]).astype(np.intp)
    if len(S) == 0:
        # degenerate guard: keep the steepest coordinate so the restricted
        # solve is well-formed (it will simply solve to zero)
        S = np.array([int(np.argmax(np.abs(g)))], dtype=np.intp)
    return S


def _irls_path_loop(
    family: str,
    irls_fn,
    grad_fn,
    loss_of,
    devr_of,
    *,
    p: int,
    n: int,
    lam_path,
    lambda_max: float,
    alpha: float,
    pf,
    lo,
    hi,
    intercept: bool,
    thresh: float,
    maxit: int,
    outer_maxit: int,
    do_screen: bool,
    auto_path: bool,
    b0_null: float,
    stat_null: float,
    nulldev: float,
    first_point_loss: float,
    prev_stats,
    x_mean,
    x_std,
    relax: bool,
    relax_refit,
    provider=None,
) -> PathResult:
    """The shared screened/unscreened IRLS path loop behind
    binomial_path and poisson_path (previously two ~90-line verbatim
    copies that had to be edited in lockstep). Family-specific pieces
    enter as callables: ``irls_fn(coef, b0, cols=None)`` returns the
    weighted-quadratic stats + the family's fit statistic (binomial:
    log-likelihood; poisson: deviance), ``grad_fn(coef, b0)`` the full
    penalized-scale gradient, ``loss_of(stat)`` the per-pass objective
    WITHOUT the penalty term, ``devr_of(stat)`` the dev_ratio.
    Everything else — secant warm starts, sequential strong-rule
    screening with the KKT repair loop and its unscreened fallback, the
    prox-Newton stale-quadratic warm solve, unstandardization, relax
    refits — is family-independent and lives here exactly once."""
    coef = np.zeros(p)
    b0 = b0_null
    nl = len(lam_path)
    out_beta = np.zeros((p, nl))
    out_a0 = np.zeros(nl)
    out_df = np.zeros(nl, dtype=int)
    out_dr = np.zeros(nl)
    out_beta_r = np.zeros((p, nl)) if relax else None
    out_a0_r = np.zeros(nl) if relax else None
    out_dr_r = np.zeros(nl) if relax else None

    losses: list = []
    prev_sol: list[tuple[float, np.ndarray, float]] = []  # (lam, coef, b0)
    stat = stat_null
    for i, lam in enumerate(lam_path):
        if auto_path and i == 0:
            # at lambda_max every coefficient is zero by construction
            # (KKT with equality) — emit the null model directly
            out_a0[i] = b0_null
            if relax:
                out_a0_r[i] = b0_null  # empty support: relaxed == null model
            losses.append([first_point_loss])
            continue
        # secant warm-start: extrapolate the solution curve from the two
        # previous lambdas — most path points then converge in ONE IRLS
        # pass instead of two+ (the passes are the entire fit cost)
        if len(prev_sol) >= 2:
            (l1, c1, i1), (l2, c2, i2) = prev_sol[-2], prev_sol[-1]
            if l1 != l2:
                r = (lam - l2) / (l2 - l1)
                coef = c2 + r * (c2 - c1)
                b0 = i2 + r * (i2 - i1)
        stat = stat_null
        lam_losses: list = []
        if do_screen:
            g, _, _ = grad_fn(coef, b0)
            lam_prev = lam_path[i - 1] if i > 0 else lambda_max
            S = _strong_set(g, coef, lam, lam_prev, alpha, pf=pf)
            _kkt = 0
            while True:
                pf_S = pf[S] if pf is not None else None
                cs = coef[S]
                for _ in range(outer_maxit):
                    sw, swx, swxx, swxz, swz, stat = irls_fn(cs, b0, cols=S)
                    lam_losses.append(loss_of(stat) + _penalty_value(cs, lam, alpha, pf_S))
                    new_cs, new_b0, _ = wls_enet_cd(
                        sw, swx, swxx, swxz, swz, n, lam, alpha, cs, b0, intercept,
                        tol=thresh, maxit=maxit, pf=pf_S,
                    )
                    delta = max(float(np.max(np.abs(new_cs - cs))) if len(cs) else 0.0,
                                abs(new_b0 - b0))
                    scale = max(float(np.max(np.abs(new_cs))) if len(cs) else 0.0,
                                abs(new_b0), 1e-12)
                    cs, b0 = new_cs, new_b0
                    if delta <= max(thresh, 1e-6) * scale:
                        break
                coef = np.zeros(p)
                coef[S] = cs
                # exactness: KKT over the FULL gradient; violators join S
                # (per-coordinate threshold alpha*lam*pf_j; an infinite
                # factor means the coordinate can never violate)
                g, _, _ = grad_fn(coef, b0)
                kkt_thr = alpha * lam * (pf if pf is not None else 1.0) + 1e-7
                viol = np.setdiff1d(np.where(np.abs(g) > kkt_thr)[0], S)
                if len(viol) == 0:
                    break
                _kkt += 1
                if _kkt >= 8:
                    # repair didn't converge by growing S incrementally:
                    # drop screening for this path point — one solve on
                    # the full feature set restores exactness by
                    # construction (viol ⊆ S is then empty), so a
                    # screened point can never ship with a wrong support
                    S = np.arange(p, dtype=np.intp)
                else:
                    S = np.union1d(S, viol).astype(np.intp)
            prev_stats = None  # restricted stats don't replay across lambdas
        else:
            # prox-Newton warm start: re-solve the NEW lambda on the stale
            # quadratic from the previous one (driver-side only, no data
            # pass) — the refresh pass below then usually confirms in one go
            if prev_stats is not None:
                coef, b0, _ = wls_enet_cd(
                    *prev_stats, n, lam, alpha, coef, b0, intercept,
                    tol=thresh, maxit=maxit, pf=pf, lo=lo, hi=hi,
                )
            for _ in range(outer_maxit):
                sw, swx, swxx, swxz, swz, stat = irls_fn(coef, b0)
                prev_stats = (sw, swx, swxx, swxz, swz)
                lam_losses.append(loss_of(stat) + _penalty_value(coef, lam, alpha, pf))
                new_coef, new_b0, _ = wls_enet_cd(
                    sw, swx, swxx, swxz, swz, n, lam, alpha, coef, b0, intercept,
                    tol=thresh, maxit=maxit, pf=pf, lo=lo, hi=hi,
                )
                delta = max(float(np.max(np.abs(new_coef - coef))) if p else 0.0,
                            abs(new_b0 - b0))
                scale = max(float(np.max(np.abs(new_coef))) if p else 0.0,
                            abs(new_b0), 1e-12)
                coef, b0 = new_coef, new_b0
                if delta <= max(thresh, 1e-6) * scale:
                    break
        prev_sol.append((float(lam), coef.copy(), float(b0)))
        if len(prev_sol) > 2:
            prev_sol.pop(0)
        losses.append(lam_losses)
        out_dr[i] = devr_of(stat) if nulldev > 0 else 0.0
        ob, _ = _unstandardize(coef, x_mean, x_std, 0.0, intercept)
        out_beta[:, i] = ob
        out_a0[i] = b0 - float(x_mean @ ob) if intercept else 0.0
        out_df[i] = int(np.count_nonzero(coef))
        if relax:
            rfull, rb0, stat_r = relax_refit(coef, b0)
            out_dr_r[i] = devr_of(stat_r) if nulldev > 0 else 0.0
            orb, _ = _unstandardize(rfull, x_mean, x_std, 0.0, intercept)
            out_beta_r[:, i] = orb
            out_a0_r[i] = rb0 - float(x_mean @ orb) if intercept else 0.0
    return PathResult(
        family, lam_path, out_a0, out_beta, out_df, out_dr, nulldev,
        # read AFTER the loop: the provider increments passes per scan
        getattr(provider, "passes", 1), x_mean, x_std, loss=losses,
        a0_relaxed=out_a0_r, beta_relaxed=out_beta_r, dev_ratio_relaxed=out_dr_r,
    )


def binomial_path(
    provider,
    alpha: float,
    nlambda: int = 100,
    lambda_min_ratio: float = 1e-4,
    lambdas=None,
    standardize: bool = True,
    intercept: bool = True,
    thresh: float = 1e-7,
    maxit: int = 1000,
    outer_maxit: int = 30,
    mom=None,
    screen: bool | str = "auto",
    penalty_factor=None,
    exclude=None,
    lower_limits=None,
    upper_limits=None,
    relax: bool = False,
) -> PathResult:
    mom = mom or provider.moments()
    n = mom.n
    x_mean, x_std = _standardization(mom, standardize, intercept)
    C, B = _gram(mom, x_mean, x_std, intercept)
    b = B[:, 0]
    provider.set_standardization(x_mean, 1.0 / x_std)
    p = len(b)
    pf, lo, hi = _penalty_options(p, x_std, penalty_factor, exclude, lower_limits, upper_limits)

    has_off = getattr(provider, "has_offset", False)
    prev_stats = None  # last IRLS quadratic, anchored at the previous solution
    if not has_off:
        # closed forms: the weighted moments already fold sample weights
        # into pbar and the Gram, so lambda_max = max|x̃ᵀ w̃(y-ȳ)|/n holds
        # weighted or not
        pbar = float(mom.y_mean[0])
        ll_null = n * (pbar * np.log(max(pbar, 1e-300)) + (1 - pbar) * np.log(max(1 - pbar, 1e-300)))
        b0 = float(np.log(pbar / (1 - pbar))) if intercept else 0.0
    else:
        # with a per-row offset the null model has no closed form: Newton
        # on the intercept (each step is one IRLS pass; the WLS solve of
        # the intercept-only quadratic IS the Newton step), then read
        # lambda_max off the null gradient x̃ᵀ w̃ (y-mu0)/n = (swxz-b0·swx)/n
        b0 = 0.0
        sw = swx = swxz = None
        for _ in range(10):
            sw, swx, swxx, swxz, swz, ll = provider.irls_binomial(np.zeros(p), b0)
            prev_stats = (sw, swx, swxx, swxz, swz)
            if not intercept:
                break
            b0_new = swz / sw
            if abs(b0_new - b0) <= 1e-10 * max(1.0, abs(b0_new)):
                b0 = b0_new
                break
            b0 = b0_new
        ll_null = ll
        b = (swxz - b0 * swx) / n

    nulldev = -2.0 * ll_null

    lambda_max = _lambda_max_scaled(np.abs(b), alpha, pf)
    lam_path = _lambda_path(lambda_max, nlambda, lambda_min_ratio, lambdas)

    relax_cache: dict = {}

    def _relax_refit(coef_pen: np.ndarray, b0_pen: float):
        return _relax_refit_cached(
            relax_cache, provider.irls_binomial, coef_pen, b0_pen,
            p=p, n=n, intercept=intercept, thresh=thresh, maxit=maxit,
            outer_maxit=outer_maxit, lo=lo, hi=hi, stat0=ll_null,
        )

    # lambda_max shortcut applies on auto paths with every feature
    # penalized (see _irls_path_loop); ridge (alpha=0) and zero
    # penalty factors fit the first point for real
    pf_zero = pf is not None and bool(np.any(pf == 0))
    auto_path = (lambdas is None or len(lambdas) == 0) and alpha > 0 and not pf_zero
    # sequential strong-rule screening: pays once p is large enough that
    # the O(n·p²) quadratic dominates the extra O(n·p) gradient pass; the
    # KKT re-check restores exactness, so the rule being heuristic costs
    # nothing but an occasional re-solve. Off for ridge (alpha=0: nothing
    # is ever discarded), for small p (goldens stay at p<=64), and under
    # box limits (a bound-active coordinate fails the plain |grad| KKT
    # test by design — the rule would loop on it).
    do_screen = (
        ((screen is True) or (screen == "auto" and p > 100))
        and alpha > 0
        and lo is None and hi is None
    )
    return _irls_path_loop(
        "binomial", provider.irls_binomial, provider.grad_binomial,
        loss_of=lambda ll: -ll / n,
        devr_of=lambda ll: 1.0 - (-2.0 * ll) / nulldev,
        p=p, n=n, lam_path=lam_path, lambda_max=lambda_max, alpha=alpha,
        pf=pf, lo=lo, hi=hi, intercept=intercept, thresh=thresh,
        maxit=maxit, outer_maxit=outer_maxit, do_screen=do_screen,
        auto_path=auto_path, b0_null=b0, stat_null=ll_null,
        nulldev=nulldev, first_point_loss=-ll_null / n,
        prev_stats=prev_stats, x_mean=x_mean, x_std=x_std,
        relax=relax, relax_refit=_relax_refit, provider=provider,
    )


def poisson_path(
    provider,
    alpha: float,
    nlambda: int = 100,
    lambda_min_ratio: float = 1e-4,
    lambdas=None,
    standardize: bool = True,
    intercept: bool = True,
    thresh: float = 1e-7,
    maxit: int = 1000,
    outer_maxit: int = 30,
    mom=None,
    screen: bool | str = "auto",
    penalty_factor=None,
    exclude=None,
    lower_limits=None,
    upper_limits=None,
    relax: bool = False,
) -> PathResult:
    """Poisson (log link) elastic-net path — an EXTENSION of the
    reference surface (R/sgdnet.R supports gaussian/binomial/
    multinomial/mgaussian only; R/sgdnet.R:341 likewise leaves offset
    as a TODO). glmnet-style semantics: IRLS with mu = exp(eta),
    wirls = mu, working response z = eta + (y-mu)/mu, inner penalized
    WLS coordinate descent; deviance = 2 Σ w̃ [y log(y/mu) - (y-mu)].
    Sample weights and offsets ride through the provider. Cross-checked
    at lambda=0 against MLlib GeneralizedLinearRegression
    (family='poisson') in tests/test_weights_offset.py.
    """
    mom = mom or provider.moments()
    n = mom.n
    x_mean, x_std = _standardization(mom, standardize, intercept)
    provider.set_standardization(x_mean, 1.0 / x_std)
    p = len(x_mean)

    has_off = getattr(provider, "has_offset", False)
    if not intercept:
        b0_null = 0.0
    elif has_off:
        b0_null = provider.poisson_null_intercept()
    else:
        b0_null = float(np.log(max(float(mom.y_mean[0]), 1e-300)))
    # ONE pass at the null model yields nulldev, the null gradient for
    # lambda_max (x̃ᵀ w̃(y-mu0)/n = (swxz - b0·swx)/n), and a warm
    # prox-Newton quadratic for the first real path point
    sw, swx, swxx, swxz, swz, dev0 = provider.irls_poisson(np.zeros(p), b0_null)
    nulldev = float(dev0)
    grad_null = (swxz - b0_null * swx) / n
    pf, lo, hi = _penalty_options(p, x_std, penalty_factor, exclude, lower_limits, upper_limits)
    lambda_max = _lambda_max_scaled(np.abs(grad_null), alpha, pf)
    lam_path = _lambda_path(lambda_max, nlambda, lambda_min_ratio, lambdas)

    relax_cache: dict = {}

    def _relax_refit(coef_pen: np.ndarray, b0_pen: float):
        # as in binomial_path, with the deviance passed through as stat
        return _relax_refit_cached(
            relax_cache, provider.irls_poisson, coef_pen, b0_pen,
            p=p, n=n, intercept=intercept, thresh=thresh, maxit=maxit,
            outer_maxit=outer_maxit, lo=lo, hi=hi, stat0=nulldev,
        )

    pf_zero = pf is not None and bool(np.any(pf == 0))
    auto_path = (lambdas is None or len(lambdas) == 0) and alpha > 0 and not pf_zero
    do_screen = (
        ((screen is True) or (screen == "auto" and p > 100))
        and alpha > 0
        and lo is None and hi is None
    )
    return _irls_path_loop(
        "poisson", provider.irls_poisson, provider.grad_poisson,
        loss_of=lambda dev: dev / (2.0 * n),
        devr_of=lambda dev: 1.0 - dev / nulldev,
        p=p, n=n, lam_path=lam_path, lambda_max=lambda_max, alpha=alpha,
        pf=pf, lo=lo, hi=hi, intercept=intercept, thresh=thresh,
        maxit=maxit, outer_maxit=outer_maxit, do_screen=do_screen,
        auto_path=auto_path, b0_null=b0_null, stat_null=nulldev,
        nulldev=nulldev, first_point_loss=nulldev / (2.0 * n),
        prev_stats=(sw, swx, swxx, swxz, swz), x_mean=x_mean, x_std=x_std,
        relax=relax, relax_refit=_relax_refit, provider=provider,
    )


def _multinomial_null_offset(provider, pri, k: int, p: int, intercept: bool):
    """Intercept-only softmax MLE under a fixed n×k offset, by the
    balancing fixed point b0_c <- b0_c + log(ȳ_c / P̄_c) (each iteration
    is one gradient pass; the score of the intercept-only likelihood is
    exactly P̄_c - ȳ_c, so the update has the MLE as its only fixed
    point). Returns (b0s, ll_null, null_gradient (k,p))."""
    zeros = np.zeros((k, p))
    if not intercept:
        g, _, ll = provider.grad_multinomial(zeros, np.zeros(k))
        return np.zeros(k), ll, g
    b0s = np.log(np.maximum(pri, 1e-300))
    b0s = b0s - b0s.mean()
    g = None
    ll = 0.0
    for _ in range(50):
        g, gb, ll = provider.grad_multinomial(zeros, b0s)
        pbar = gb + pri  # colmeans(P) = colmeans(P-Y) + colmeans(Y)
        step = np.log(np.maximum(pri, 1e-300) / np.maximum(pbar, 1e-300))
        b0s = b0s + step
        b0s = b0s - b0s.mean()
        if float(np.max(np.abs(step))) <= 1e-12:
            break
    g, _, ll = provider.grad_multinomial(zeros, b0s)
    return b0s, ll, g


def multinomial_path(
    provider,
    alpha: float,
    nlambda: int = 100,
    lambda_min_ratio: float = 1e-4,
    lambdas=None,
    standardize: bool = True,
    intercept: bool = True,
    thresh: float = 1e-7,
    maxit: int = 1000,
    outer_maxit: int = 20,
    mom=None,
    penalty_factor=None,
    exclude=None,
) -> PathResult:
    """Softmax regression path; y arrives one-hot (n, k)."""
    mom = mom or provider.moments()
    n = mom.n
    k = len(mom.sum_y)
    x_mean, x_std = _standardization(mom, standardize, intercept)
    C, B = _gram(mom, x_mean, x_std, intercept)  # B[:, c] = <x~, y_c - pbar_c>/n
    provider.set_standardization(x_mean, 1.0 / x_std)

    pri = mom.y_mean  # class priors
    p = B.shape[0]
    pf, _, _ = _penalty_options(p, x_std, penalty_factor, exclude)
    has_off = getattr(provider, "has_offset", False)
    if not has_off:
        ll_null = float(n * np.sum(pri * np.log(np.maximum(pri, 1e-300))))
        lambda_max = _lambda_max_scaled(np.max(np.abs(B), axis=1), alpha, pf)
        b0s = np.log(np.maximum(pri, 1e-300)) if intercept else np.zeros(k)
        b0s = b0s - b0s.mean() if intercept else b0s
    else:
        # n×k offset: the null intercepts have no closed form. The
        # balancing fixed point b0_c += log(ȳ_c / P̄_c) (each step is one
        # gradient pass; P̄ comes back as colmeans(P-Y)+ȳ) drives the
        # intercept-only score ΣP_c - Σy_c to zero; lambda_max and
        # nulldev then read off the SAME final gradient pass.
        b0s, ll_null, g0 = _multinomial_null_offset(provider, pri, k, p, intercept)
        lambda_max = _lambda_max_scaled(np.max(np.abs(g0), axis=0), alpha, pf)
    nulldev = -2.0 * ll_null
    lam_path = _lambda_path(lambda_max, nlambda, lambda_min_ratio, lambdas)
    nl = len(lam_path)

    coefs = np.zeros((k, p))
    out_beta = np.zeros((k, p, nl))
    out_a0 = np.zeros((k, nl))
    out_df = np.zeros(nl, dtype=int)
    out_dfmat = np.zeros((k, nl), dtype=int)
    out_dr = np.zeros(nl)
    pf_zero = pf is not None and bool(np.any(pf == 0))
    auto_path = (lambdas is None or len(lambdas) == 0) and alpha > 0 and not pf_zero
    prev_sol: list[tuple[float, np.ndarray, np.ndarray]] = []
    for i, lam in enumerate(lam_path):
        if auto_path and i == 0:
            out_a0[:, i] = b0s - b0s.mean() if intercept else 0.0
            continue
        # secant warm-start along the path (see binomial_path)
        if len(prev_sol) >= 2:
            (l1, c1, i1), (l2, c2, i2) = prev_sol[-2], prev_sol[-1]
            if l1 != l2:
                r = (lam - l2) / (l2 - l1)
                coefs = c2 + r * (c2 - c1)
                b0s = i2 + r * (i2 - i1)
        # NOTE: the binomial-style prox-Newton warm start on stale
        # quadratics measurably HURTS here (block-diagonal class
        # quadratics overshoot when cross-class terms are frozen), so
        # multinomial keeps the secant start only.
        ll = ll_null
        for _ in range(outer_maxit):
            # ONE data pass yields every class's quadratic (block-diagonal
            # Newton) — k times fewer passes than per-class cycling, same
            # fixed point.
            stats, ll = provider.irls_multinomial_all(coefs, b0s)
            max_delta = 0.0
            max_scale = 1e-12
            for c in range(k):
                sw, swx, swxx, swxz, swz = stats[c]
                new_coef, new_b0, _ = wls_enet_cd(
                    sw, swx, swxx, swxz, swz, n, lam, alpha, coefs[c], float(b0s[c]),
                    intercept, tol=thresh, maxit=maxit, pf=pf,
                )
                max_delta = max(max_delta, float(np.max(np.abs(new_coef - coefs[c]))), abs(new_b0 - b0s[c]))
                max_scale = max(max_scale, float(np.max(np.abs(new_coef))), abs(new_b0))
                coefs[c] = new_coef
                b0s[c] = new_b0
            if max_delta <= max(thresh, 1e-6) * max_scale:
                break
        prev_sol.append((float(lam), coefs.copy(), b0s.copy()))
        if len(prev_sol) > 2:
            prev_sol.pop(0)
        out_dr[i] = 1.0 - (-2.0 * ll) / nulldev if nulldev > 0 else 0.0
        for c in range(k):
            ob, _ = _unstandardize(coefs[c], x_mean, x_std, 0.0, intercept)
            out_beta[c, :, i] = ob
            out_a0[c, i] = b0s[c] - float(x_mean @ ob) if intercept else 0.0
            out_dfmat[c, i] = int(np.count_nonzero(coefs[c]))
        out_df[i] = int(np.count_nonzero(np.any(coefs != 0.0, axis=0)))
        # reference R/sgdnet.R:409 recenters multinomial intercepts to sum to 0
        if intercept:
            out_a0[:, i] -= out_a0[:, i].mean()
    return PathResult(
        "multinomial", lam_path, out_a0, out_beta, out_df, out_dr, nulldev,
        getattr(provider, "passes", 1), x_mean, x_std, out_dfmat,
    )
