"""BM25 sparse retrieval: exact python replay of the formula on a hand
corpus, ranking sanity, query-side multiplicity semantics, and
validation guards."""

import math

import pytest
from pyspark.sql import functions as F

from sgdnet_spark.operators import bm25


@pytest.fixture(scope="module")
def corpus(spark):
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "spark table scan fast fast",
            "table join join join slow",
            "window agg group by window",
            "unrelated words entirely here now",
        ],
    }))


def _py_bm25(docs: dict, qterms: list, k1=1.2, b=0.75):
    """Reference implementation straight from Robertson & Zaragoza."""
    N = len(docs)
    toks = {d: t.split() for d, t in docs.items()}
    avgdl = sum(len(t) for t in toks.values()) / N
    out = {}
    for d, t in toks.items():
        s = 0.0
        for term in set(qterms):
            tf = t.count(term)
            if tf == 0:
                continue
            df = sum(1 for tt in toks.values() if term in tt)
            idf = math.log(1.0 + (N - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(t) / avgdl))
        if s > 0:
            out[d] = s
    return out


def test_bm25_matches_python_replay(spark, corpus):
    docs = {r["doc_id"]: r["text"] for r in corpus.collect()}
    q = spark.createDataFrame(
        [("qa", "table fast"), ("qb", "join window")],
        "query_id string, q_text string",
    )
    got = bm25.bm25_topk(corpus, q, k=10).collect()
    for qid, qtext in (("qa", "table fast"), ("qb", "join window")):
        want = _py_bm25(docs, qtext.split())
        mine = {r["doc_id"]: r["score"] for r in got if r["query_id"] == qid}
        assert set(mine) == set(want)
        for d, s in want.items():
            assert abs(mine[d] - s) < 1e-3
        # rank order follows (score desc, doc_id asc)
        ranked = sorted(
            [r for r in got if r["query_id"] == qid], key=lambda r: r["rn"]
        )
        resorted = sorted(ranked, key=lambda r: (-r["score"], r["doc_id"]))
        assert [r["doc_id"] for r in ranked] == [r["doc_id"] for r in resorted]


def test_bm25_query_term_multiplicity_ignored(spark, corpus):
    """Classic BM25: repeating a term in the query does not change the
    score (distinct query terms)."""
    q1 = spark.createDataFrame([("q", "table fast")], "query_id string, q_text string")
    q2 = spark.createDataFrame(
        [("q", "table table fast fast fast")], "query_id string, q_text string"
    )
    a = {(r["doc_id"], r["score"]) for r in bm25.bm25_topk(corpus, q1).collect()}
    b = {(r["doc_id"], r["score"]) for r in bm25.bm25_topk(corpus, q2).collect()}
    assert a == b


def test_bm25_k_truncates_and_validates(spark, corpus):
    q = spark.createDataFrame([("q", "table")], "query_id string, q_text string")
    assert bm25.bm25_topk(corpus, q, k=1).count() == 1
    with pytest.raises(ValueError, match="k1"):
        bm25.bm25_topk(corpus, q, k1=0)
    with pytest.raises(ValueError, match="k1"):
        bm25.bm25_topk(corpus, q, b=1.5)


def test_bm25_plan_is_jvm_side(spark, corpus):
    """No Python stage anywhere: the whole pipeline is codegen/exchange
    (the inverted-index probe is a broadcast semi-join)."""
    q = spark.createDataFrame([("q", "table fast")], "query_id string, q_text string")
    plan = bm25.bm25_topk(corpus, q)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
