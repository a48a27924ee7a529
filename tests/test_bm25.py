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


def test_bm25_index_prunes_and_matches_inmemory(spark, corpus, tmp_path):
    """write_bm25_index → term-bucket-partitioned postings; the probe
    scan carries PartitionFilters on bucket and results equal the
    in-memory bm25_topk on the same corpus."""
    path = str(tmp_path / "bm25_idx")
    bm25.write_bm25_index(corpus, path)
    q = spark.createDataFrame(
        [("qa", "table fast"), ("qb", "join window")],
        "query_id string, q_text string",
    )
    got, pruned = bm25.bm25_topk_indexed(spark, path, q, k=10)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in bm25.bm25_topk(corpus, q, k=10).collect()}
    assert a == b and len(a) > 0
    # empty / degenerate query sets yield a typed empty result
    empty_q = q.filter(F.lit(False))
    out, _ = bm25.bm25_topk_indexed(spark, path, empty_q)
    assert out.count() == 0
    with pytest.raises(ValueError, match="k1"):
        bm25.bm25_topk_indexed(spark, path, q, k1=-1)


def test_bm25_streaming_probe_matches_batch(spark, corpus, tmp_path):
    """Streaming query serving over the persisted index (the
    PqStreamServer pattern applied to the lexical tier): the union of
    per-micro-batch probes equals one batch probe — every answer
    depends only on the static index."""
    import glob
    import shutil

    path = str(tmp_path / "bm25_sidx")
    bm25.write_bm25_index(corpus, path)
    q = spark.createDataFrame(
        [("qa", "table fast"), ("qb", "join window"), ("qc", "spark slow")],
        "query_id string, q_text string",
    )
    want_df, _ = bm25.bm25_topk_indexed(spark, path, q, k=10)
    want = {tuple(r) for r in want_df.collect()}

    stage = tmp_path / "bm25_qstream"
    stage.mkdir()
    for name, cond in (("a", "query_id < 'qc'"), ("b", "query_id >= 'qc'")):
        scratch = str(tmp_path / f"bm25_scratch_{name}")
        q.filter(cond).coalesce(1).write.parquet(scratch)
        part = glob.glob(f"{scratch}/part-*.parquet")[0]
        shutil.move(part, str(stage / f"{name}.parquet"))
    stream = (
        spark.readStream.schema(q.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(stage))
    )
    results = []

    def respond(batch_df, batch_id):
        out, _ = bm25.bm25_topk_indexed(spark, path, batch_df, k=10)
        results.extend(out.collect())

    sq = stream.writeStream.foreachBatch(respond).outputMode("append").start()
    try:
        sq.processAllAvailable()
    finally:
        sq.stop()
    assert {tuple(r) for r in results} == want


def test_bm25_append_matches_full_rebuild(spark, corpus, tmp_path):
    """append_bm25_index: build from half the corpus, append the rest —
    probes equal a full single-shot build (postings land in the same
    bucket layout; n_docs/sum_dl fold exactly, so idf and length
    normalization match to the bit)."""
    lo = corpus.filter(F.col("doc_id") <= 2)
    hi = corpus.filter(F.col("doc_id") > 2)
    inc = str(tmp_path / "bm25_inc")
    full = str(tmp_path / "bm25_full")
    bm25.write_bm25_index(lo, inc)
    bm25.append_bm25_index(spark, inc, hi)
    bm25.write_bm25_index(corpus, full)
    q = spark.createDataFrame(
        [("qa", "table fast"), ("qb", "join window")],
        "query_id string, q_text string",
    )
    a, _ = bm25.bm25_topk_indexed(spark, inc, q, k=10)
    b, _ = bm25.bm25_topk_indexed(spark, full, q, k=10)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
    # appended docs are actually retrievable
    assert any(r["doc_id"] > 2 for r in a.collect())


def test_bm25_null_and_empty_text_rows(spark):
    """NULL-text and empty-text documents cannot crash or pollute:
    they produce no postings (consistent in both the in-memory and
    indexed paths — engines agree because size(NULL)=NULL is skipped
    by AVG on both sides), and never appear as results."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["spark table scan", None, ""],
        })
    )
    q = spark.createDataFrame([("q", "table")], "query_id string, q_text string")
    got = bm25.bm25_topk(df, q, k=5).collect()
    assert {r["doc_id"] for r in got} == {1}


def test_bm25_out_of_vocabulary_queries(spark, corpus, tmp_path):
    """Query terms absent from the corpus: typed empty results on both
    the in-memory and indexed paths (no crash from empty dft/stats
    joins or empty bucket pruning)."""
    q = spark.createDataFrame(
        [("q", "zzz qqq xyzzy")], "query_id string, q_text string"
    )
    assert bm25.bm25_topk(corpus, q).count() == 0
    path = str(tmp_path / "bm25_oov")
    bm25.write_bm25_index(corpus, path)
    out, _ = bm25.bm25_topk_indexed(spark, path, q)
    assert out.count() == 0
