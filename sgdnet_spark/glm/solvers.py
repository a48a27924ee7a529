"""Driver-side optimizers over p-dimensional sufficient statistics.

The reference minimizes the elastic-net GLM objective with sequential
SAGA (src/saga-dense.h). We minimize the *same convex objective* with
deterministic solvers that only touch p×p aggregates, so the data-sized
work stays distributed (SURVEY.md §3):

- ``enet_cd_gram``      : covariance-update coordinate descent (gaussian)
- ``group_cd_gram``     : block CD with group-L2 prox (mgaussian)
- ``wls_enet_cd``       : penalized weighted least squares (IRLS inner loop
                          for binomial / multinomial)

Objective (gaussian, standardized scale, per reference R/sgdnet.R docs):
    1/(2n) ||y - b0 - X b||^2 + lam * ((1-alpha)/2 ||b||_2^2 + alpha ||b||_1)
"""

from __future__ import annotations

import numpy as np


def soft_threshold(z: np.ndarray, t: float) -> np.ndarray:
    # relative slack on the threshold test, for the same reason as the
    # group prox below: at lambda_max |z| == t up to rounding, and the
    # plain max(|z|-t, 0) emits 1e-16 dust instead of an exact zero
    return np.where(np.abs(z) > t * (1.0 + 1e-12), np.sign(z) * (np.abs(z) - t), 0.0)


def _per_coord_penalty(p: int, lam: float, alpha: float, pf):
    """Per-coordinate (l1_j, l2_j) vectors; ``pf`` is the rescaled
    penalty-factor vector (glmnet `penalty.factor`), or None for the
    uniform penalty. Infinite factors mark excluded coordinates."""
    if pf is None:
        l1 = np.full(p, lam * alpha)
        l2 = np.full(p, lam * (1.0 - alpha))
        skip = None
    else:
        skip = ~np.isfinite(pf)
        pfm = np.where(skip, 0.0, pf)  # skipped coords never touch l1/l2
        l1 = lam * alpha * pfm
        l2 = lam * (1.0 - alpha) * pfm
    return l1, l2, skip


def _clamp(v: float, j: int, lo, hi) -> float:
    """Box-constrain one coordinate (glmnet `lower.limits`/`upper.limits`
    semantics: the coordinate update is the exact prox of the separable
    box, so clamping inside CD preserves convergence)."""
    if lo is not None and v < lo[j]:
        v = lo[j]
    if hi is not None and v > hi[j]:
        v = hi[j]
    return v


def enet_cd_gram(
    C: np.ndarray,
    b: np.ndarray,
    lam: float,
    alpha: float,
    beta: np.ndarray,
    tol: float = 1e-7,
    maxit: int = 1000,
    pf: np.ndarray | None = None,
    lo: np.ndarray | None = None,
    hi: np.ndarray | None = None,
) -> tuple[np.ndarray, int]:
    """Minimize 1/2 b'Cb - g'b + penalty via coordinate descent.

    C = X'X/n (standardized), b = X'y/n. Uses residual-gradient updates
    (glmnet's "covariance updates"): each sweep is O(p^2), no data access.
    ``pf`` scales the penalty per coordinate (inf = excluded), ``lo``/
    ``hi`` box-constrain coordinates on the solver's (standardized) scale.
    """
    p = C.shape[0]
    beta = beta.copy()
    l1, l2, skip = _per_coord_penalty(p, lam, alpha, pf)
    grad = C @ beta - b  # gradient of smooth part
    diag = C.diagonal()
    boxed = lo is not None or hi is not None
    for it in range(maxit):
        max_delta = 0.0
        max_beta = 0.0
        for j in range(p):
            if skip is not None and skip[j]:
                continue
            bj = beta[j]
            zj = bj * diag[j] - grad[j]  # partial residual correlation
            den = diag[j] + l2[j]
            new = float(soft_threshold(zj, l1[j]) / den) if den > 0 else 0.0
            if boxed:
                new = _clamp(new, j, lo, hi)
            d = new - bj
            if d != 0.0:
                beta[j] = new
                grad += C[:, j] * d
                max_delta = max(max_delta, abs(d))
            max_beta = max(max_beta, abs(beta[j]))
        if max_delta <= tol * max(max_beta, 1e-12):
            return beta, it + 1
    return beta, maxit


def group_cd_gram(
    C: np.ndarray,
    B: np.ndarray,
    lam: float,
    alpha: float,
    beta: np.ndarray,
    tol: float = 1e-7,
    maxit: int = 1000,
    pf: np.ndarray | None = None,
) -> tuple[np.ndarray, int]:
    """Block coordinate descent for the multi-response gaussian.

    beta is (p, k); the penalty is the mixed L1/2 norm over rows
    (reference R/sgdnet.R mgaussian objective): group soft-threshold
        row_j <- z_j * max(0, 1 - lam*alpha/||z_j||) / (C_jj + lam(1-alpha))
    ``pf`` scales both penalty terms of row-group j (inf = excluded).
    """
    p, k = beta.shape
    beta = beta.copy()
    l1v, l2v, skip = _per_coord_penalty(p, lam, alpha, pf)
    grad = C @ beta - B  # (p, k)
    diag = C.diagonal()
    for it in range(maxit):
        max_delta = 0.0
        max_beta = 0.0
        for j in range(p):
            if skip is not None and skip[j]:
                continue
            l1 = l1v[j]
            l2 = l2v[j]
            bj = beta[j].copy()
            zj = bj * diag[j] - grad[j]
            nrm = float(np.linalg.norm(zj))
            # the 1e-12 relative slack snaps the exact-boundary case to
            # a TRUE zero: at lambda_max, nrm equals l1 up to float
            # rounding, and "nrm a hair above l1" would otherwise emit
            # 1e-16-magnitude coefficient dust that df counts as a
            # nonzero group (flaky df[0]==0 at lambda_max)
            if nrm <= l1 * (1.0 + 1e-12) or diag[j] + l2 <= 0:
                new = np.zeros(k)
            else:
                new = zj * (1.0 - l1 / nrm) / (diag[j] + l2)
            d = new - bj
            dmax = float(np.max(np.abs(d)))
            if dmax > 0:
                beta[j] = new
                grad += np.outer(C[:, j], d)
                max_delta = max(max_delta, dmax)
            max_beta = max(max_beta, float(np.max(np.abs(beta[j]))))
        if max_delta <= tol * max(max_beta, 1e-12):
            return beta, it + 1
    return beta, maxit


def wls_enet_cd(
    sum_w: float,
    sum_wx: np.ndarray,
    sum_wxx: np.ndarray,
    sum_wxz: np.ndarray,
    sum_wz: float,
    n: int,
    lam: float,
    alpha: float,
    beta: np.ndarray,
    intercept: float,
    fit_intercept: bool,
    tol: float = 1e-7,
    maxit: int = 200,
    pf: np.ndarray | None = None,
    lo: np.ndarray | None = None,
    hi: np.ndarray | None = None,
) -> tuple[np.ndarray, float, int]:
    """Solve the IRLS quadratic: min 1/(2n) Σ w (z - b0 - x'b)^2 + penalty.

    All inputs are weighted sums over the data (one distributed pass);
    the solve itself is O(p^2) per sweep on the driver. ``pf``/``lo``/
    ``hi`` as in :func:`enet_cd_gram`.
    """
    p = len(beta)
    beta = beta.copy()
    l1, l2, skip = _per_coord_penalty(p, lam, alpha, pf)
    Cw = sum_wxx / n
    diag = Cw.diagonal()
    bw = sum_wxz / n
    boxed = lo is not None or hi is not None
    # gradient of smooth part wrt beta at current (beta, b0):
    grad = Cw @ beta + intercept * (sum_wx / n) - bw
    for it in range(maxit):
        if fit_intercept:
            new_b0 = (sum_wz - sum_wx @ beta) / sum_w if sum_w > 0 else 0.0
            d0 = new_b0 - intercept
            if d0 != 0.0:
                intercept = new_b0
                grad += d0 * (sum_wx / n)
        max_delta = 0.0
        max_beta = 0.0
        for j in range(p):
            if skip is not None and skip[j]:
                continue
            bj = beta[j]
            zj = bj * diag[j] - grad[j]
            den = diag[j] + l2[j]
            new = float(soft_threshold(zj, l1[j]) / den) if den > 0 else 0.0
            if boxed:
                new = _clamp(new, j, lo, hi)
            d = new - bj
            if d != 0.0:
                beta[j] = new
                grad += Cw[:, j] * d
                max_delta = max(max_delta, abs(d))
            max_beta = max(max_beta, abs(beta[j]))
        if max_delta <= tol * max(max_beta, 1e-12):
            return beta, intercept, it + 1
    return beta, intercept, maxit


def log_space(hi: float, lo: float, num: int) -> np.ndarray:
    """Log-spaced descending path, as reference utils.h:LogSpace.

    Endpoints are pinned exactly: 10**log10(hi) can land 1 ulp below hi,
    which would let a ~1e-16 coefficient slip past the lambda_max
    soft-threshold (KKT holds with equality there).
    """
    if num == 1:
        # a 1-point path is lambda_max (the null model the auto path
        # emits at index 0) — out[-1] = lo would mislabel it as
        # lambda_min
        return np.array([hi], dtype=float)
    out = np.logspace(np.log10(hi), np.log10(lo), num)
    out[0] = hi
    out[-1] = lo
    return out
