"""RRF rank fusion (operators/fusion.py): exact python replay on hand
lists, hybrid composition membership, validation, and plan shape."""

import pytest
from pyspark.sql import functions as F

from sgdnet_spark.operators import fusion


def _mk(spark, rows):
    return spark.createDataFrame(rows, "query_id string, doc_id long, rn int")


def test_rrf_matches_hand_computation(spark):
    a = _mk(spark, [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)])
    b = _mk(spark, [("q", 3, 1), ("q", 1, 2), ("q", 9, 3)])
    got = {r["doc_id"]: (r["fused"], r["rn"]) for r in
           fusion.rrf_fuse([a, b], k=10, k0=60).collect()}
    import math

    want = {
        1: 1 / 61 + 1 / 62,
        2: 1 / 62,
        3: 1 / 63 + 1 / 61,
        9: 1 / 63,
    }
    assert set(got) == set(want)
    for d, s in want.items():
        assert math.isclose(got[d][0], round(s, 6), abs_tol=1e-9)
    # fused order: docs 1 and 3 (two lists) above 2 and 9 (one list)
    order = [d for d, _ in sorted(got.items(), key=lambda kv: kv[1][1])]
    assert set(order[:2]) == {1, 3} and order[0] == 1  # 1/61+1/62 > 1/61+1/63


def test_rrf_three_lists_and_validation(spark):
    a = _mk(spark, [("q", 1, 1)])
    b = _mk(spark, [("q", 1, 1)])
    c = _mk(spark, [("q", 2, 1)])
    got = {r["doc_id"]: r["fused"] for r in fusion.rrf_fuse([a, b, c], k=5).collect()}
    assert got[1] == round(2 / 61, 6) and got[2] == round(1 / 61, 6)
    with pytest.raises(ValueError, match="at least 2"):
        fusion.rrf_fuse([a])
    with pytest.raises(ValueError, match="k0"):
        fusion.rrf_fuse([a, b], k0=0)


def test_hybrid_membership_and_shape(spark, sf_dir):
    """Every fused result came from one of the two tier pools; per-query
    ranks are contiguous from 1; no Python stage in the fusion plan."""
    from sgdnet_spark.operators import bm25, similarity

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qd = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("q_text")
    )
    qv = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    q = qd.join(qv, "query_id")
    out = fusion.hybrid_topk(docs, emb, q, k=10, pool=20)
    rows = out.collect()
    lex = {(r["query_id"], r["doc_id"]) for r in
           bm25.bm25_topk(docs, q.select("query_id", "q_text"), k=20).collect()}
    dense = {(r["query_id"], r["nbr_id"]) for r in similarity.brute_force_topk(
        emb, q.select(F.col("query_id").alias("vec_id"),
                      F.col("q_vec").alias("embedding")), k=20).collect()}
    assert {(r["query_id"], r["doc_id"]) for r in rows} <= (lex | dense)
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rn"])
    for rns in per_q.values():
        assert sorted(rns) == list(range(1, len(rns) + 1))


def test_hybrid_null_vector_query_lexical_only(spark):
    """A query whose q_vec is NULL still gets its LEXICAL results (the
    dense tier drops NULL vectors; fusion degrades gracefully to the
    single surviving list for that query)."""
    import pandas as pd

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["spark table scan", "table join slow", "window agg group"],
    }))
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame(
        [("qa", "table scan", [1.0, 0.05]), ("qb", "window agg", None)],
        "query_id string, q_text string, q_vec array<double>",
    )
    rows = fusion.hybrid_topk(docs, emb, q, k=5, pool=3).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    # qa fuses both tiers; qb (NULL vector) still answers lexically
    assert {1, 2} <= by_q["qa"]
    assert by_q["qb"] == {3}


def test_hybrid_exclude_self_forwarding(spark):
    """Round 12 (ADVICE): a corpus doc whose id merely COLLIDES with a
    query id from an unrelated namespace must not be dropped from the
    dense list — exclude_self=False keeps it in both tiers, so the
    fused score is not skewed. Default (True) keeps the more-like-this
    convention."""
    import pandas as pd

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["spark table scan", "table join slow", "window agg group"],
    }))
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    # query id 1 collides with corpus doc 1 but is NOT doc 1
    q = spark.createDataFrame(
        [(1, "window agg", [0.95, 0.05])],
        "query_id long, q_text string, q_vec array<double>",
    )
    dflt = fusion.hybrid_topk(docs, emb, q, k=5, pool=3)
    kept = fusion.hybrid_topk(docs, emb, q, k=5, pool=3, exclude_self=False)
    from sgdnet_spark.operators import similarity

    dd = {r["doc_id"] for r in dflt.collect()}
    dk = {r["doc_id"] for r in kept.collect()}
    # doc 1 is the best DENSE hit; with exclusion it only enters via
    # bm25 (here: no lexical overlap -> absent), without it it leads
    assert 1 not in dd and 1 in dk
    # and the raw dense tier agrees: self kept iff exclude_self=False
    qe = q.select(F.col("query_id").alias("vec_id"), F.col("q_vec").alias("embedding"))
    d0 = {r["nbr_id"] for r in similarity.brute_force_topk(emb, qe, k=3).collect()}
    d1 = {r["nbr_id"] for r in similarity.brute_force_topk(
        emb, qe, k=3, exclude_self=False).collect()}
    assert 1 not in d0 and 1 in d1


def test_brute_force_exclude_self_join_branch(spark):
    """exclude_self=False on the join branch (non-integral ids force
    it): the query's own row ranks first with cosine 1.0."""
    emb = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.6, 0.8]), ("c", [0.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    from sgdnet_spark.operators import similarity

    q = emb.filter(F.col("vec_id") == "a")
    out = similarity.brute_force_topk(emb, q, k=2, exclude_self=False,
                                      with_rank=True).collect()
    best = min(out, key=lambda r: r["rn"])
    assert best["nbr_id"] == "a" and best["cos"] == 1.0
    dflt = similarity.brute_force_topk(emb, q, k=2).collect()
    assert all(r["nbr_id"] != "a" for r in dflt)


def test_hybrid_approx_matches_python_replay(spark, sf_dir):
    """Round 12: the 100 TB hybrid composition — dense arm from IVF-PQ
    candidates (with_rank) instead of exact brute force. The fused
    output is replayed exactly in python from the two tier lists
    (integer-rank RRF arithmetic, 6 dp grid)."""
    import math

    from sgdnet_spark.operators import bm25, pq

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qd = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("q_text")
    )
    qv = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    q = qd.join(qv, "query_id")
    kw = dict(n_lists=8, nprobe=3, m=8, ksub=16, refine=2, kmeans_iters=5)
    got = {
        (r["query_id"], r["doc_id"]): (r["fused"], r["rn"])
        for r in fusion.hybrid_topk_approx(docs, emb, q, k=10, pool=20, **kw).collect()
    }
    # replay: the SAME deterministic tiers, fused in python
    lex = bm25.bm25_topk(docs, q.select("query_id", "q_text"), k=20).collect()
    dense = pq.ivfpq_topk(
        emb,
        q.select(F.col("query_id").alias("vec_id"), F.col("q_vec").alias("embedding")),
        k_neighbors=20, with_rank=True, **kw,
    ).collect()
    acc = {}
    for r in lex:
        acc[(r["query_id"], r["doc_id"])] = acc.get((r["query_id"], r["doc_id"]), 0.0) + 1.0 / (60 + r["rn"])
    for r in dense:
        acc[(r["query_id"], r["nbr_id"])] = acc.get((r["query_id"], r["nbr_id"]), 0.0) + 1.0 / (60 + r["rn"])
    want = {}
    per_q = {}
    for (qid, did), f in acc.items():
        per_q.setdefault(qid, []).append((did, f))
    for qid, lst in per_q.items():
        lst.sort(key=lambda t: (-t[1], t[0]))
        for rn, (did, f) in enumerate(lst[:10], start=1):
            want[(qid, did)] = (math.floor(f * 1e6 + 0.5) / 1e6, rn)
    assert got == want and len(got) == 30


def test_rrf_weighted(spark):
    """Round 12: weighted RRF — fused = Σ w_l/(k0+rank); python replay
    and validation."""
    a = _mk(spark, [("q", 1, 1), ("q", 2, 2)])
    b = _mk(spark, [("q", 2, 1), ("q", 3, 2)])
    got = {r["doc_id"]: r["fused"] for r in
           fusion.rrf_fuse([a, b], k=5, weights=[2.0, 0.5]).collect()}
    want = {
        1: 2.0 / 61,
        2: 2.0 / 62 + 0.5 / 61,
        3: 0.5 / 62,
    }
    import math

    assert set(got) == set(want)
    for d, s in want.items():
        assert math.isclose(got[d], math.floor(s * 1e6 + 0.5) / 1e6, abs_tol=1e-12)
    with pytest.raises(ValueError, match="weights"):
        fusion.rrf_fuse([a, b], weights=[1.0])
    with pytest.raises(ValueError, match="weights"):
        fusion.rrf_fuse([a, b], weights=[1.0, -1.0])


def test_ann_approx_hybrid_rows_python_replay(spark, sf_dir):
    """Round 12: the ann_approx entry's method='hybrid' rows (BM25
    top-20 RRF-fused with the shared pq25 re-rank's unrounded-rank
    top-20) replay exactly in python from the two tier lists."""
    import math

    from pyspark.sql import functions as F

    from sgdnet_spark.operators import bm25, pq
    from sgdnet_spark.queries import QUERIES, _t

    out = QUERIES["ann_approx"](spark, sf_dir)
    got = {
        (r["query_id"], r["nbr_id"]): r["cos"]
        for r in out.filter(F.col("method") == "hybrid").collect()
    }
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    qd = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("q_text")
    )
    lex = bm25.bm25_topk(docs, qd, k=20).collect()
    cents, books = pq.kmeans_pq_fit(emb, k=8, m=8, ksub=16, iters=5)
    dense = pq.ivfpq_topk(
        emb, emb.filter(F.col("vec_id") < 10), k_neighbors=25, nprobe=3,
        refine=2, model=(cents, books), with_rank=True,
    ).filter(F.col("query_id") < 3).filter(F.col("rn") <= 20).collect()
    acc = {}
    for r in lex:
        k = (r["query_id"], r["doc_id"])
        acc[k] = acc.get(k, 0.0) + 1.0 / (60 + r["rn"])
    for r in dense:
        k = (r["query_id"], r["nbr_id"])
        acc[k] = acc.get(k, 0.0) + 1.0 / (60 + r["rn"])
    per_q = {}
    for (qid, did), f in acc.items():
        per_q.setdefault(qid, []).append((did, f))
    want = {}
    for qid, lst in per_q.items():
        lst.sort(key=lambda t: (-t[1], t[0]))
        for did, f in lst[:10]:
            want[(qid, did)] = math.floor(f * 1e6 + 0.5) / 1e6
    assert got == want and len(got) == 30
