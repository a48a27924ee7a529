"""MMR diverse re-ranking (operators/mmr.py): exact python replay,
λ=1 ≡ plain top-k, diversity actually increases, selection-order
column, composition with IVF-PQ candidates, and validation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sgdnet_spark.operators import mmr, pq, similarity


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def q(emb):
    return emb.filter(F.col("vec_id") < 6)


def _np_corpus(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.asarray([r["vec_id"] for r in rows])
    V = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    return ids, V


def test_mmr_matches_python_replay(spark, emb, q):
    """Distributed MMR == driver replay over the same brute-force
    pools, selection order included."""
    ids, V = _np_corpus(emb)
    by_id = {int(i): V[j] for j, i in enumerate(ids)}
    pools = {}
    for r in similarity.brute_force_topk(emb, q, k=25).collect():
        pools.setdefault(r["query_id"], []).append(r["nbr_id"])
    want = set()
    for r in sorted(q.collect(), key=lambda r: r["vec_id"]):
        qid = r["vec_id"]
        cand = np.asarray(pools[qid])
        chosen = mmr.mmr_select_np(
            np.asarray(r["embedding"], dtype=np.float64),
            cand,
            np.stack([by_id[int(c)] for c in cand]),
            5,
            0.7,
        )
        for s, c in enumerate(chosen, 1):
            want.add((qid, c, s))
    got = {
        (r["query_id"], r["nbr_id"], r["sel"])
        for r in mmr.mmr_topk(emb, q, k_neighbors=5, lam=0.7, pool=25).collect()
    }
    assert got == want


def test_lambda_one_is_plain_topk(spark, emb, q):
    """λ=1 removes the redundancy term: MMR order == cosine top-k
    order (ties by id on both sides)."""
    plain = {
        (r["query_id"], r["nbr_id"])
        for r in similarity.brute_force_topk(emb, q, k=5).collect()
    }
    diverse = {
        (r["query_id"], r["nbr_id"])
        for r in mmr.mmr_topk(emb, q, k_neighbors=5, lam=1.0, pool=25).collect()
    }
    assert diverse == plain


def test_diversity_increases(spark, emb, q):
    """λ<1 lowers the mean pairwise similarity of each result set vs
    plain top-k (averaged across queries — the property MMR exists
    for)."""
    ids, V = _np_corpus(emb)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    by_id = {int(i): Vn[j] for j, i in enumerate(ids)}

    def mean_pairwise(result):
        sims = []
        groups = {}
        for r in result:
            groups.setdefault(r["query_id"], []).append(r["nbr_id"])
        for g in groups.values():
            M = np.stack([by_id[int(i)] for i in g])
            S = M @ M.T
            iu = np.triu_indices(len(g), 1)
            sims.append(S[iu].mean())
        return float(np.mean(sims))

    plain = similarity.brute_force_topk(emb, q, k=5).collect()
    diverse = mmr.mmr_topk(emb, q, k_neighbors=5, lam=0.3, pool=25).collect()
    assert mean_pairwise(diverse) < mean_pairwise(plain)


def test_compose_with_ivfpq_pool(spark, emb, q):
    """MMR re-ranks ANY candidate source: an IVF-PQ pool flows through
    mmr_rerank — selected ids stay within the pool, one rank per row."""
    cands = pq.ivfpq_topk(emb, q, k_neighbors=25, n_lists=8, nprobe=3)
    out = mmr.mmr_rerank(cands, emb, q, k_neighbors=5, lam=0.5).collect()
    pool_ids = {(r["query_id"], r["nbr_id"]) for r in cands.collect()}
    assert {(r["query_id"], r["nbr_id"]) for r in out} <= pool_ids
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r["sel"])
    for sels in per_q.values():
        assert sorted(sels) == list(range(1, len(sels) + 1))


def test_validation_and_empty(spark, emb, q):
    with pytest.raises(ValueError, match="lam"):
        mmr.mmr_topk(emb, q, lam=1.5)
    empty = emb.filter(F.lit(False))
    assert mmr.mmr_topk(emb, empty, k_neighbors=3).count() == 0


def test_duplicate_candidates_deduped(spark, emb, q):
    """A pool unioned from two sources sharing neighbors must not
    select the same neighbor twice."""
    c1 = similarity.brute_force_topk(emb, q, k=10)
    out = mmr.mmr_rerank(c1.unionByName(c1), emb, q, k_neighbors=5, lam=1.0).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r["nbr_id"])
    for nbrs in per_q.values():
        assert len(nbrs) == len(set(nbrs))


def test_string_ids_supported(spark):
    """Non-integral id columns flow through: the output id type follows
    the input (brute_force_topk's join branch + a string-typed Arrow
    schema)."""
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [(f"doc{i:02d}", [float(x) for x in rng.normal(size=4)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    q = df.limit(2)
    out = mmr.mmr_topk(df, q, k_neighbors=3, lam=0.5, pool=8).collect()
    assert len(out) == 6
    assert all(isinstance(r["nbr_id"], str) for r in out)


def test_mmr_rerank_mixed_id_types(spark, emb):
    """String-keyed QUERIES over a long-keyed corpus (round-11 advice):
    each output id column takes its type from its own source relation."""
    from pyspark.sql import functions as F

    from sgdnet_spark.operators.mmr import mmr_rerank
    from sgdnet_spark.operators.similarity import brute_force_topk

    q_str = emb.filter(F.col("vec_id") < 3).select(
        F.concat(F.lit("q"), F.col("vec_id")).alias("vec_id"), "embedding"
    )
    cands = brute_force_topk(emb, q_str, k=10)
    out = mmr_rerank(cands, emb, q_str, k_neighbors=4, lam=0.7)
    assert dict(out.dtypes)["query_id"] == "string"
    assert dict(out.dtypes)["nbr_id"] == "bigint"
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {"q0", "q1", "q2"}
    assert all(len(g) == 4 for g in
               [[r for r in rows if r["query_id"] == q] for q in ("q0", "q1", "q2")])


def test_select_matches_independent_naive_loop():
    """mmr_select_np vs a from-scratch naive O(k²·pool) implementation
    of the Carbonell–Goldstein sweep (identical epsilon tie-break
    chain): guards the vectorized redundancy bookkeeping — the round-11
    rewrite initially clamped negative cosines at 0 via a zeros-seeded
    np.maximum, which this replay (and the driver golden) catches."""

    def naive(qv, cand_ids, cand_vs, k, lam):
        Vn = cand_vs / np.maximum(
            np.linalg.norm(cand_vs, axis=1, keepdims=True), 1e-300
        )
        qn = qv / max(np.linalg.norm(qv), 1e-300)
        rel, sim = Vn @ qn, Vn @ Vn.T
        order = np.lexsort((cand_ids,))
        rel, sim, ids = rel[order], sim[np.ix_(order, order)], cand_ids[order]
        selected, sel_idx = [], []
        remaining = list(range(len(ids)))
        for _ in range(min(k, len(ids))):
            best_j, best_score = None, None
            for j in remaining:
                red = max((sim[j, s] for s in sel_idx), default=0.0)
                score = lam * rel[j] - (1.0 - lam) * red
                if best_score is None or score > best_score + 1e-15:
                    best_j, best_score = j, score
            selected.append(ids[best_j])
            sel_idx.append(best_j)
            remaining.remove(best_j)
        return selected

    rng = np.random.default_rng(7)
    for _ in range(100):
        n = int(rng.integers(2, 40))
        V = rng.normal(size=(n, 8))
        qv = rng.normal(size=8)
        ids = np.arange(n)
        rng.shuffle(ids)
        for lam in (0.0, 0.3, 0.7, 1.0):
            assert mmr.mmr_select_np(qv, ids.copy(), V.copy(), 5, lam) == naive(
                qv, ids.copy(), V.copy(), 5, lam
            )
