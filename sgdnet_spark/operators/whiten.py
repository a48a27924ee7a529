"""PCA whitening / dimensionality reduction for embedding columns.

The embedding-preprocessing stage retrieval and dedup pipelines run
before similarity search (whitened cosine ≈ Mahalanobis similarity;
dropping trailing components compacts the ANN index): y =
Λ^{-1/2}·Vᵀ·(x − μ) where (V, Λ) eigendecompose the corpus covariance.

Spark shape (the GLM sufficient-statistic discipline, §3): the fit is
ONE mapInPandas pass emitting per-partition (count, sum, outer-product
sum) partials — (dim² + dim + 1)-sized, independent of n — reduced
driver-side to μ and Σ, then a dim×dim ``numpy.linalg.eigh`` (64×64
here; micro-seconds). The transform is a pure Arrow map over the
broadcast (μ, W) matrices: zero shuffle, streaming-legal, the
hash_score/cluster_balance scoring shape.

Determinism: eigh on a fixed symmetric matrix is deterministic, and
each eigenvector's GLOBAL sign (the one genuinely arbitrary choice) is
fixed by making its largest-|entry| coordinate positive — so outputs
are reproducible across runs, partitionings, and platforms running the
same LAPACK. Components come out in DESCENDING eigenvalue order (PCA
convention; eigh returns ascending).

No SQL twin for the eigendecomposition — the registered sub-entry
(queries.py::embedding_whiten) uses golden constants cross-validated by
an exact numpy replay, an identity-covariance property, and
partitioning-independence tests (tests/test_whiten.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sgdnet_spark.operators.ivf import _vec_frame


def fit_whitener(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    eps: float = 1e-6,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit (μ, W, eigenvalues) from ONE distributed moments pass.

    W's rows are Λ^{-1/2}-scaled eigenvectors in DESCENDING eigenvalue
    order; ``eps`` regularizes near-zero eigenvalues (a rank-deficient
    corpus otherwise divides by ~0). NULL vectors are skipped (they
    have no moments), matching the ANN tier's semantics.
    """
    vecs = _vec_frame(df, vec_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, ss = 0, None, None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["v"].to_numpy())
            n += len(V)
            s = V.sum(0) if s is None else s + V.sum(0)
            ss = V.T @ V if ss is None else ss + V.T @ V
        if n == 0:
            return
        yield pd.DataFrame({"part": [np.concatenate(([float(n)], s, ss.ravel())).tolist()]})

    parts = vecs.mapInPandas(run, schema="part array<double>").collect()
    if not parts:
        raise ValueError("fit_whitener: empty input")
    tot = np.sum([np.asarray(r["part"]) for r in parts], axis=0)
    n = tot[0]
    dim = int(round((-1 + np.sqrt(1 + 4 * (len(tot) - 1))) / 2))
    mu = tot[1 : 1 + dim] / n
    cov = tot[1 + dim :].reshape(dim, dim) / n - np.outer(mu, mu)
    lam, vec = np.linalg.eigh(cov)
    order = np.argsort(lam)[::-1]  # descending eigenvalue (PCA convention)
    lam, vec = lam[order], vec[:, order]
    # fix each eigenvector's arbitrary global sign: largest-|entry|
    # coordinate positive (ties broken by the first such index)
    for j in range(dim):
        i = int(np.argmax(np.abs(vec[:, j])))
        if vec[i, j] < 0:
            vec[:, j] = -vec[:, j]
    W = vec.T / np.sqrt(np.maximum(lam, 0) + eps)[:, None]
    return mu, W, lam


def whiten_np(V: np.ndarray, mu: np.ndarray, W: np.ndarray, k: int | None = None) -> np.ndarray:
    """(n, k) whitened components for raw (n, dim) vectors."""
    Y = (V - mu) @ W.T
    return Y if k is None else Y[:, :k]


def whiten(
    df: DataFrame,
    mu: np.ndarray,
    W: np.ndarray,
    k: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, w array<double>) — whitened (optionally truncated to the
    top-k components) vectors. Pure Arrow map over the broadcast
    (μ, W): zero shuffle, runs unchanged under Structured Streaming.
    The id column's type is preserved (string-keyed corpora included —
    the mmr_rerank convention)."""
    id_type = df.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["v"].to_numpy())
            Y = whiten_np(V, mu, W, k)
            yield pd.DataFrame({"id": pdf["id"], "w": list(Y)})

    return _vec_frame(df, vec_col, id_col).mapInPandas(
        run, schema=f"id {id_type}, w array<double>"
    )
