"""Property tests for the round-10 embedding-tier operators: random
vector frames vs pure-python/numpy replays (the test_text_properties
pattern applied to whiten / cluster_balance / PQ encoding).

hypothesis generates the VECTORS ONLY; each property round-trips them
through one Spark frame — deadline=None and small example counts keep
the JVM round-trips bounded (the established settings of the text
property file).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from sgdnet_spark.operators import pq, sampling, whiten

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_finite = st.floats(
    min_value=-8.0, max_value=8.0, allow_nan=False, allow_infinity=False, width=32
)


def _vec_frame_strategy(dim: int, min_rows: int, max_rows: int):
    return st.lists(
        st.lists(_finite, min_size=dim, max_size=dim),
        min_size=min_rows,
        max_size=max_rows,
    )


@given(vecs=_vec_frame_strategy(4, 4, 12))
@settings(**_SETTINGS)
def test_whiten_identity_covariance_property(spark, vecs):
    """For ANY non-degenerate random frame: whitened covariance has
    ~unit diagonal (eps-shrunk on tiny eigenvalues) and ~zero
    off-diagonal; degenerate (constant / rank-deficient) frames stay
    finite."""
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    mu, W, lam = whiten.fit_whitener(df)
    assert np.isfinite(W).all()
    got = np.stack(
        [np.asarray(r["w"]) for r in whiten.whiten(df, mu, W).collect()]
    )
    assert np.isfinite(got).all()
    cov = got.T @ got / len(got) - np.outer(got.mean(0), got.mean(0))
    # eps-regularized target: diag is lam/(lam+eps), 0 for dead directions
    want_diag = lam / (lam + 1e-6)
    assert np.allclose(np.diag(cov), np.maximum(want_diag, 0), atol=1e-3)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 1e-3


@given(vecs=_vec_frame_strategy(4, 3, 10), k=st.integers(min_value=1, max_value=4))
@settings(**_SETTINGS)
def test_cluster_balance_replay_property(spark, vecs, k):
    """For ANY random frame and cluster count: the python replay of
    assignment -> counts -> scarcest-cluster rates -> md5 decisions
    equals cluster_balance exactly."""
    from sgdnet_spark.operators.ivf import kmeans_fit

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cents = kmeans_fit(df, k=k, iters=2)
    out, rates = sampling.cluster_balance(df, cents=cents)
    V = np.asarray(vecs, dtype=np.float64)
    a = (
        (V**2).sum(1)[:, None] - 2 * V @ cents.T + (cents**2).sum(1)[None, :]
    ).argmin(1)
    counts = {int(c): int((a == c).sum()) for c in np.unique(a)}
    kk = len(counts)
    T = min(n * kk for n in counts.values())
    want_rates = {c: T / (kk * n) for c, n in counts.items()}
    for c in want_rates:
        assert rates[c] == pytest.approx(want_rates[c], abs=1e-12)
    want = set()
    for i, c in enumerate(a):
        h = hashlib.md5((str(i) + "cbal").encode()).hexdigest()
        u = int(h[:8], 16) / float(1 << 32)
        want.add((i, int(c), int(u < want_rates[int(c)])))
    got = {(r["id"], r["cluster"], r["kept"]) for r in out.collect()}
    assert got == want


@given(vecs=_vec_frame_strategy(4, 2, 10))
@settings(**_SETTINGS)
def test_pq_encode_replay_property(spark, vecs):
    """For ANY random frame: distributed PQ encoding equals the numpy
    replay, and every code addresses a real codebook row."""
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    books = pq.pq_fit(df, m=2, ksub=2, iters=2)
    V = np.asarray(vecs, dtype=np.float64)
    want = pq.encode_np(pq._normalize(V), books)
    got = {r["id"]: list(r["code"]) for r in pq.pq_encode(df, books).collect()}
    for i in range(len(vecs)):
        assert got[i] == list(want[i])
        assert all(0 <= c < 2 for c in got[i])
