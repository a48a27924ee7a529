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


def test_bm25_indexed_null_text_avgdl_parity(spark, tmp_path):
    """Round 12 (ADVICE): on a corpus WITH NULL-text rows, the indexed
    path's stored-stats avgdl (sum_dl/n_dl) must equal the in-memory
    path's F.avg(size(tokens)) — n_docs keeps counting every doc, but
    the length normalizer averages only docs that have a token list."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": ["spark table scan", None, "table join slow", None],
        })
    )
    path = str(tmp_path / "bm25_nulls")
    bm25.write_bm25_index(df, path)
    q = spark.createDataFrame(
        [("qa", "table"), ("qb", "scan join")], "query_id string, q_text string"
    )
    a = {tuple(r) for r in bm25.bm25_topk(df, q, k=10).collect()}
    got, _ = bm25.bm25_topk_indexed(spark, path, q, k=10)
    assert {tuple(r) for r in got.collect()} == a and len(a) > 0


def test_bm25_distributed_queries_match_inline(spark, corpus, tmp_path):
    """Round 12: the two-path design — a 10k-query set takes the
    executor-side branch (no query-sized driver collect) and returns
    exactly what the inline branch returns, on BOTH the in-memory and
    indexed paths."""
    texts = ["table fast", "join window", "spark slow", "window table"]
    big_q = (
        spark.range(10_000)
        .select(
            F.col("id").cast("string").alias("query_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in texts]),
                (F.col("id") % 4 + 1).cast("int"),
            ).alias("q_text"),
        )
    )
    # distributed branch (default max_inline_queries=64 is exceeded)
    dist = bm25.bm25_topk(corpus, big_q, k=3)
    # forced inline branch sees the identical query set
    inline = bm25.bm25_topk(corpus, big_q, k=3, max_inline_queries=20_000)
    a = {tuple(r) for r in dist.collect()}
    b = {tuple(r) for r in inline.collect()}
    assert a == b and len({qid for qid, _, _, _ in a}) == 10_000

    path = str(tmp_path / "bm25_bigq")
    bm25.write_bm25_index(corpus, path)
    di, _ = bm25.bm25_topk_indexed(spark, path, big_q, k=3)
    ii, _ = bm25.bm25_topk_indexed(spark, path, big_q, k=3, max_inline_queries=20_000)
    ai = {tuple(r) for r in di.collect()}
    bi = {tuple(r) for r in ii.collect()}
    assert ai == bi == a


def test_bm25_filter_threshold_mode(spark, corpus, tmp_path):
    """Round 12: the relevance-floor variant ≡ top-k-above-threshold
    (minus the rank column), and its plan has NO per-query window —
    the corpus-audit sweep shape."""
    q = spark.createDataFrame(
        [("qa", "table fast"), ("qb", "join window")],
        "query_id string, q_text string",
    )
    ref = {
        (r["query_id"], r["doc_id"], r["score"])
        for r in bm25.bm25_topk(corpus, q, k=1000).collect()
        if r["score"] >= 0.4
    }
    flt = bm25.bm25_filter(corpus, q, threshold=0.4)
    assert {tuple(r) for r in flt.collect()} == ref and len(ref) > 0
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan

    path = str(tmp_path / "bm25_thr")
    bm25.write_bm25_index(corpus, path)
    fi, _ = bm25.bm25_filter_indexed(spark, path, q, threshold=0.4)
    assert {tuple(r) for r in fi.collect()} == ref
    plan_i = fi._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan_i


def test_bm25_empty_result_schemas_typed(spark, tmp_path):
    """Round 12 (ADVICE): empty results carry the CALLER's id types —
    query_id from the queries frame, doc_id from the corpus/postings —
    on every path, including a long-keyed query frame over a
    string-keyed corpus."""
    import pandas as pd

    sdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a", "b"], "text": ["spark table", "join window"]})
    )
    path = str(tmp_path / "bm25_typed")
    bm25.write_bm25_index(sdf, path)
    lq = spark.createDataFrame([], "query_id bigint, q_text string")
    out_mem = bm25.bm25_topk(sdf, lq)
    out_idx, _ = bm25.bm25_topk_indexed(spark, path, lq)
    for out in (out_mem, out_idx):
        assert out.schema["query_id"].dataType.simpleString() == "bigint"
        assert out.schema["doc_id"].dataType.simpleString() == "string"
        assert out.count() == 0
    # non-empty long-keyed queries against the string corpus round-trip
    lq2 = spark.createDataFrame([(7, "table")], "query_id bigint, q_text string")
    got, _ = bm25.bm25_topk_indexed(spark, path, lq2, k=5)
    rows = got.collect()
    assert rows and all(isinstance(r["doc_id"], str) for r in rows)
    assert got.schema["query_id"].dataType.simpleString() == "bigint"


def test_bm25_compact_index_preserves_results(spark, corpus, tmp_path):
    """Round 12: compaction rewrites each bucket partition down to one
    file (appends accumulate a file per batch per bucket) and changes
    NOTHING about probe results."""
    path = str(tmp_path / "bm25_cmp")
    parts = [corpus.filter(F.col("doc_id") == i) for i in (1, 2, 3, 4)]
    bm25.write_bm25_index(parts[0], path)
    for p in parts[1:]:
        bm25.append_bm25_index(spark, path, p)
    q = spark.createDataFrame(
        [("qa", "table fast"), ("qb", "join window")],
        "query_id string, q_text string",
    )
    before_df, _ = bm25.bm25_topk_indexed(spark, path, q, k=10)
    before = {tuple(r) for r in before_df.collect()}
    n_before = bm25.compact_bm25_index(spark, path)
    after_df, pruned = bm25.bm25_topk_indexed(spark, path, q, k=10)
    assert {tuple(r) for r in after_df.collect()} == before and len(before) > 0
    # partition pruning still applies to the compacted layout
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    # file count actually went down (4 single-doc batches -> 1 file per bucket)
    import glob

    n_after = len(glob.glob(f"{path}/postings/**/*.parquet", recursive=True))
    assert n_after < n_before


def test_bm25_one_corpus_scan(spark, tmp_path):
    """Round 12: the in-memory path tokenizes the corpus ONCE — global
    stats ride the tf scan as observe() metrics and tf is checkpointed
    for its two consumers, so the RESULT plan contains no parquet scan
    of the corpus at all (previously: three — stats, df(term), score)."""
    src = str(tmp_path / "docs_pq")
    spark.createDataFrame(
        [(1, "spark table scan fast"), (2, "table join slow")],
        "doc_id long, text string",
    ).write.parquet(src)
    docs = spark.read.parquet(src)
    q = spark.createDataFrame([("q", "table fast")], "query_id string, q_text string")
    out = bm25.bm25_topk(docs, q, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan  # only the checkpointed RDD remains
    assert out.count() > 0


def test_bm25_meta_filtered_retrieval(spark, tmp_path):
    """Round 12: meta_cols/where= parity with the pq tier — the
    predicate restricts CANDIDATES (pushed into the pruned postings
    scan) while scoring stats stay corpus-wide, so the filtered top-k
    equals the unfiltered ranking minus non-matching docs (Lucene
    filtered-query semantics). Appends must carry the meta columns."""
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["spark table scan fast fast", "table join join join slow",
                 "window agg group by window", "table fast fast window"],
        "lang": ["en", "de", "en", "de"],
    }))
    path = str(tmp_path / "bm25_meta")
    bm25.write_bm25_index(df, path, meta_cols=["lang"])
    q = spark.createDataFrame(
        [("qa", "table fast"), ("qb", "join window")],
        "query_id string, q_text string",
    )
    full, _ = bm25.bm25_topk_indexed(spark, path, q, k=10)
    filt, _ = bm25.bm25_topk_indexed(spark, path, q, k=10, where="lang = 'en'")
    en_docs = {1, 3}
    frows = filt.collect()
    assert {r["doc_id"] for r in frows} <= en_docs and len(frows) > 0
    # scores are IDENTICAL to the unfiltered ranking (corpus-wide stats);
    # ranks are the filtered re-numbering of the surviving order
    fscore = {(r["query_id"], r["doc_id"]): r["score"] for r in frows}
    uscore = {(r["query_id"], r["doc_id"]): r["score"] for r in full.collect()}
    for key, s in fscore.items():
        assert uscore[key] == s
    # predicate reached the parquet source next to the partition pruning
    plan = filt._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "lang" in plan
    # filter variant agrees with topk-then-filter
    fthr, _ = bm25.bm25_filter_indexed(spark, path, q, threshold=0.1, where="lang = 'en'")
    assert {(r["query_id"], r["doc_id"]) for r in fthr.collect()} == {
        k for k, s in fscore.items() if s >= 0.1
    }
    # append without the meta column is refused loudly
    import pytest as _pytest

    extra = spark.createDataFrame(
        pd.DataFrame({"doc_id": [9], "text": ["table window"]})
    )
    with _pytest.raises(ValueError, match="meta columns"):
        bm25.append_bm25_index(spark, path, extra)
    # append WITH it lands in filtered probes
    extra2 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [9], "text": ["table fast window"], "lang": ["en"]})
    )
    bm25.append_bm25_index(spark, path, extra2)
    filt2, _ = bm25.bm25_topk_indexed(spark, path, q, k=10, where="lang = 'en'")
    assert 9 in {r["doc_id"] for r in filt2.collect()}


def test_bm25_pre_round12_stats_compat(spark, corpus, tmp_path):
    """An index written BEFORE round 12 (stats without n_dl) keeps
    serving: _read_stats falls back to the old avgdl denominator
    (n_docs), reproducing that index's original scores."""
    path = str(tmp_path / "bm25_old")
    bm25.write_bm25_index(corpus, path)
    # rewrite stats in the r11 layout (no n_dl column)
    old = spark.read.parquet(f"{path}/stats").collect()[0]
    spark.createDataFrame(
        [(float(old["n_docs"]), float(old["sum_dl"]), int(old["n_buckets"]))],
        "n_docs double, sum_dl double, n_buckets bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")
    q = spark.createDataFrame(
        [("qa", "table fast"), ("qb", "join window")],
        "query_id string, q_text string",
    )
    got, _ = bm25.bm25_topk_indexed(spark, path, q, k=10)
    rows = got.collect()
    # full-text corpus: n_dl == n_docs, so old and new stats agree and
    # the fallback must equal the in-memory path exactly
    want = {tuple(r) for r in bm25.bm25_topk(corpus, q, k=10).collect()}
    assert {tuple(r) for r in rows} == want and len(rows) > 0
    # appends onto the old layout upgrade it in place (n_dl appears)
    extra = spark.createDataFrame(
        [(9, "table fast window")], "doc_id long, text string"
    )
    bm25.append_bm25_index(spark, path, extra)
    st = spark.read.parquet(f"{path}/stats").collect()[0]
    assert "n_dl" in st.__fields__ and st["n_dl"] == 5.0
    got2, _ = bm25.bm25_topk_indexed(spark, path, q, k=10)
    assert 9 in {r["doc_id"] for r in got2.collect()}


def test_bm25_stream_server_matches_batch(spark, corpus, tmp_path):
    """Round 12: Bm25StreamServer — stats load once at construction,
    per-micro-batch probes equal batch probes, refresh() picks up
    appends, and threshold mode serves windowless."""
    import glob
    import shutil

    from sgdnet_spark.streaming.bm25_stream import Bm25StreamServer

    path = str(tmp_path / "bm25_srv")
    bm25.write_bm25_index(corpus, path)
    q = spark.createDataFrame(
        [("qa", "table fast"), ("qb", "join window"), ("qc", "spark slow")],
        "query_id string, q_text string",
    )
    server = Bm25StreamServer(spark, path, k=10)
    want_df, _ = bm25.bm25_topk_indexed(spark, path, q, k=10)
    want = {tuple(r) for r in want_df.collect()}
    assert {tuple(r) for r in server.probe(q).collect()} == want

    stage = tmp_path / "srv_qstream"
    stage.mkdir()
    for name, cond in (("a", "query_id < 'qc'"), ("b", "query_id >= 'qc'")):
        scratch = str(tmp_path / f"srv_scratch_{name}")
        q.filter(cond).coalesce(1).write.parquet(scratch)
        part = glob.glob(f"{scratch}/part-*.parquet")[0]
        shutil.move(part, str(stage / f"{name}.parquet"))
    stream = (
        spark.readStream.schema(q.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(stage))
    )
    sq = stream.writeStream.foreachBatch(server.respond).outputMode("append").start()
    try:
        sq.processAllAvailable()
    finally:
        sq.stop()
    assert {tuple(r) for r in server.results} == want

    # appended docs appear immediately (postings re-scan); refresh()
    # realigns the global stats with a fresh probe
    extra = spark.createDataFrame([(9, "table fast fast")], "doc_id long, text string")
    bm25.append_bm25_index(spark, path, extra)
    assert 9 in {r["doc_id"] for r in server.probe(q).collect()}
    server.refresh()
    aligned, _ = bm25.bm25_topk_indexed(spark, path, q, k=10)
    assert {tuple(r) for r in server.probe(q).collect()} == {
        tuple(r) for r in aligned.collect()
    }

    # threshold mode: windowless floor, equal to the batch floor probe
    fsrv = Bm25StreamServer(spark, path, threshold=0.4)
    fwant, _ = bm25.bm25_filter_indexed(spark, path, q, threshold=0.4)
    assert {tuple(r) for r in fsrv.probe(q).collect()} == {
        tuple(r) for r in fwant.collect()
    }


def test_bm25_inline_term_cap_reroutes(spark, corpus, tmp_path, monkeypatch):
    """Round 13 (ADVICE): max_inline_queries bounds query COUNT, not
    term count — a few document-length queries must not inline a huge
    literal IN-set into the plan. With the cap forced tiny, the small
    branch reroutes to the distributed path and results are identical
    on BOTH the in-memory and indexed paths."""
    q = spark.createDataFrame(
        [("qa", "table fast join window spark slow"), ("qb", "join window")],
        "query_id string, q_text string",
    )
    want = {tuple(r) for r in bm25.bm25_topk(corpus, q, k=3).collect()}
    path = str(tmp_path / "bm25_termcap")
    bm25.write_bm25_index(corpus, path)
    ref_i, _ = bm25.bm25_topk_indexed(spark, path, q, k=3)
    want_i = {tuple(r) for r in ref_i.collect()}

    monkeypatch.setattr(bm25, "MAX_INLINE_TERMS", 3)
    rerouted = bm25.bm25_topk(corpus, q, k=3)
    assert {tuple(r) for r in rerouted.collect()} == want
    # the plan carries no giant IN-list: term restriction is a join
    plan = rerouted._jdf.queryExecution().executedPlan().toString()
    assert "window IN" not in plan and " IN (table" not in plan
    ri, _ = bm25.bm25_topk_indexed(spark, path, q, k=3)
    assert {tuple(r) for r in ri.collect()} == want_i == want


def test_bm25_meta_functional_dependence_validated(spark, tmp_path):
    """Round 13 (ADVICE): a meta column that varies within a doc_id
    would silently split posting rows and inflate df(term) — the write
    validates one meta tuple per doc and raises."""
    bad = spark.createDataFrame(
        [(1, "alpha beta", "en"), (1, "alpha beta", "fr"), (2, "beta", "en")],
        "doc_id long, text string, lang string",
    )
    with pytest.raises(ValueError, match="functionally dependent"):
        bm25.write_bm25_index(bad, str(tmp_path / "bm25_badmeta"), meta_cols=["lang"])
    good = spark.createDataFrame(
        [(1, "alpha beta", "en"), (2, "beta", "fr")],
        "doc_id long, text string, lang string",
    )
    bm25.write_bm25_index(good, str(tmp_path / "bm25_goodmeta"), meta_cols=["lang"])


def test_bm25_delete_matches_rebuild_without_rows(spark, corpus, tmp_path):
    """Round 13: delete_from_bm25_index == write_bm25_index over the
    corpus minus those rows, bit-for-bit — df(term) recounts over the
    masked postings and the stats re-derive from the surviving doc
    catalog, so idf, avgdl and every score agree exactly. Idempotent
    (re-delete / unknown ids are no-ops); compaction physically drops
    the tombstoned rows with results unchanged."""
    full = str(tmp_path / "bm25_del")
    ref = str(tmp_path / "bm25_del_ref")
    bm25.write_bm25_index(corpus, full)
    bm25.write_bm25_index(corpus.filter(~F.col("doc_id").isin(2, 3)), ref)
    q = spark.createDataFrame(
        [("qa", "table fast"), ("qb", "join window")],
        "query_id string, q_text string",
    )
    assert bm25.delete_from_bm25_index(spark, full, [2, 3]) == 2
    got, _ = bm25.bm25_topk_indexed(spark, full, q, k=10)
    want, _ = bm25.bm25_topk_indexed(spark, ref, q, k=10)
    want = {tuple(r) for r in want.collect()}
    assert {tuple(r) for r in got.collect()} == want
    # floor mode masks deletions too
    gf, _ = bm25.bm25_filter_indexed(spark, full, q, threshold=0.1)
    wf, _ = bm25.bm25_filter_indexed(spark, ref, q, threshold=0.1)
    assert {tuple(r) for r in gf.collect()} == {tuple(r) for r in wf.collect()}
    # idempotent: re-deleting and deleting unknown ids change nothing
    assert bm25.delete_from_bm25_index(spark, full, [2, 99]) == 0
    got2, _ = bm25.bm25_topk_indexed(spark, full, q, k=10)
    assert {tuple(r) for r in got2.collect()} == want
    # compaction physically drops the rows and clears the tombstones
    bm25.compact_bm25_index(spark, full)
    import os
    assert not os.path.exists(f"{full}/tombstones")
    posted = {r["doc_id"] for r in spark.read.parquet(f"{full}/postings").collect()}
    assert posted.isdisjoint({2, 3})
    got3, _ = bm25.bm25_topk_indexed(spark, full, q, k=10)
    assert {tuple(r) for r in got3.collect()} == want


def test_bm25_delete_null_text_doc_exact_stats(spark, tmp_path):
    """A NULL-text doc has no postings — only the doc catalog knows it
    exists (n_docs weight, no n_dl weight). Deleting it must still
    yield rebuild-exact stats, the case a postings-derived decrement
    could never get right."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None), (3, "alpha alpha")],
        "doc_id long, text string",
    )
    full = str(tmp_path / "bm25_delnull")
    ref = str(tmp_path / "bm25_delnull_ref")
    bm25.write_bm25_index(docs, full)
    bm25.write_bm25_index(docs.filter("doc_id <> 2"), ref)
    assert bm25.delete_from_bm25_index(spark, full, [2]) == 1
    assert bm25._read_stats(spark, full) == bm25._read_stats(spark, ref)
    q = spark.createDataFrame([("q", "alpha")], "query_id string, q_text string")
    a, _ = bm25.bm25_topk_indexed(spark, full, q, k=10)
    b, _ = bm25.bm25_topk_indexed(spark, ref, q, k=10)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_bm25_delete_then_append_guard(spark, corpus, tmp_path):
    """Re-adding a tombstoned id would resurrect its OLD postings next
    to the new ones — the append refuses until a compaction clears the
    tombstones, after which the re-add works."""
    path = str(tmp_path / "bm25_readd")
    bm25.write_bm25_index(corpus.filter("doc_id <= 3"), path)
    bm25.delete_from_bm25_index(spark, path, [2])
    with pytest.raises(ValueError, match="re-adds deleted"):
        bm25.append_bm25_index(spark, path, corpus.filter("doc_id = 2"))
    bm25.compact_bm25_index(spark, path)
    bm25.append_bm25_index(spark, path, corpus.filter("doc_id = 2"))
    q = spark.createDataFrame([("q", "join")], "query_id string, q_text string")
    got, _ = bm25.bm25_topk_indexed(spark, path, q, k=10)
    assert any(r["doc_id"] == 2 for r in got.collect())


def test_bm25_delete_requires_doc_catalog(spark, corpus, tmp_path):
    """Pre-round-13 indexes (no docs/ sidecar) get a clear error, not a
    silent wrong-stats delete."""
    path = str(tmp_path / "bm25_nocat")
    bm25.write_bm25_index(corpus, path)
    import shutil
    shutil.rmtree(f"{path}/docs")
    with pytest.raises(ValueError, match="doc catalog"):
        bm25.delete_from_bm25_index(spark, path, [1])


def test_phrase_match_hand_corpus(spark):
    """Round 13: exact-phrase semantics on a hand corpus — consecutive
    positions only, duplicate phrase terms handled (cover is counted
    over offsets), overlapping occurrences each counted, no substring
    false positives."""
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the cat mat"),
            (2, "cat the cat the cat"),
            (3, "the dog"),
            (4, "cat mat the"),
        ],
        "doc_id long, text string",
    )
    phr = spark.createDataFrame(
        [("a", "the cat"), ("b", "cat the cat"), ("c", "cat mat")],
        "query_id string, phrase string",
    )
    got = {
        (r["query_id"], r["doc_id"]): r["n_occurrences"]
        for r in bm25.phrase_match(docs, phr).collect()
    }
    assert got == {
        ("a", 1): 2,   # "the cat" at 0 and 4
        ("a", 2): 2,   # at 1 and 3
        ("b", 2): 2,   # "cat the cat" at 0 and 2 (overlapping)
        ("c", 1): 1,   # "cat mat" at 5
        ("c", 4): 1,
    }


def test_phrase_match_indexed_matches_inmemory(spark, corpus, tmp_path):
    """The positional-index path equals the in-memory scan, prunes to
    the phrase vocabulary's buckets, masks deletions, and a
    non-positional index raises the actionable error. BM25 scoring on
    a positional index is unchanged."""
    phr = spark.createDataFrame(
        [("a", "join join"), ("b", "fast fast"), ("c", "window agg")],
        "query_id string, phrase string",
    )
    want = {tuple(r) for r in bm25.phrase_match(corpus, phr).collect()}
    assert len(want) >= 3

    path = str(tmp_path / "bm25_pos")
    bm25.write_bm25_index(corpus, path, positions=True)
    got_df = bm25.phrase_match_indexed(spark, path, phr)
    assert {tuple(r) for r in got_df.collect()} == want
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan

    # scoring parity: positional postings change nothing about BM25
    q = spark.createDataFrame(
        [("qa", "table fast"), ("qb", "join window")],
        "query_id string, q_text string",
    )
    plain = str(tmp_path / "bm25_plain13")
    bm25.write_bm25_index(corpus, plain)
    a, _ = bm25.bm25_topk_indexed(spark, path, q, k=10)
    b, _ = bm25.bm25_topk_indexed(spark, plain, q, k=10)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}

    # deletions mask phrase hits too
    hit_doc = next(iter({d for _, d, _ in want}))
    bm25.delete_from_bm25_index(spark, path, [hit_doc])
    after = {tuple(r) for r in bm25.phrase_match_indexed(spark, path, phr).collect()}
    assert after == {t for t in want if t[1] != hit_doc}

    # appends keep the positional layout (pos inferred, not meta)
    bm25.compact_bm25_index(spark, path)
    bm25.append_bm25_index(
        spark, path,
        spark.createDataFrame([(99, "join join forever")], "doc_id long, text string"),
    )
    re = {
        (r["query_id"], r["doc_id"])
        for r in bm25.phrase_match_indexed(spark, path, phr).collect()
    }
    assert ("a", 99) in re

    with pytest.raises(ValueError, match="positions=True"):
        bm25.phrase_match_indexed(spark, plain, phr)


def test_phrase_match_empty_and_oov(spark, corpus):
    """Empty phrase sets and out-of-vocabulary phrases yield typed
    empty results."""
    empty = spark.createDataFrame([], "query_id string, phrase string")
    out = bm25.phrase_match(corpus, empty)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["query_id", "doc_id", "n_occurrences"]
    oov = spark.createDataFrame([("x", "zzz qqq")], "query_id string, phrase string")
    assert bm25.phrase_match(corpus, oov).count() == 0


def test_phrase_stream_server_matches_batch(spark, corpus, tmp_path):
    """Round 13: Bm25StreamServer(phrase=True) serves exact-phrase
    matching over a positional index per micro-batch — the continuous
    contamination-audit shape; streamed == batch asserted through a
    real readStream, and a non-positional index fails actionably."""
    import glob
    import shutil

    from sgdnet_spark.streaming.bm25_stream import Bm25StreamServer

    path = str(tmp_path / "bm25_psrv")
    bm25.write_bm25_index(corpus, path, positions=True)
    phr = spark.createDataFrame(
        [("a", "join join"), ("b", "fast fast"), ("c", "window agg")],
        "query_id string, phrase string",
    )
    server = Bm25StreamServer(spark, path, phrase=True)
    want = {tuple(r) for r in bm25.phrase_match_indexed(spark, path, phr).collect()}
    assert want and {tuple(r) for r in server.probe(phr).collect()} == want

    stage = tmp_path / "psrv_qstream"
    stage.mkdir()
    for name, cond in (("a", "query_id < 'c'"), ("b", "query_id >= 'c'")):
        scratch = str(tmp_path / f"psrv_scratch_{name}")
        phr.filter(cond).coalesce(1).write.parquet(scratch)
        part = glob.glob(f"{scratch}/part-*.parquet")[0]
        shutil.move(part, str(stage / f"{name}.parquet"))
    stream = (
        spark.readStream.schema(phr.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(stage))
    )
    sq = stream.writeStream.foreachBatch(server.respond).outputMode("append").start()
    try:
        sq.processAllAvailable()
    finally:
        sq.stop()
    assert {tuple(r) for r in server.results} == want

    with pytest.raises(ValueError, match="no relevance threshold"):
        Bm25StreamServer(spark, path, phrase=True, threshold=1.0)
    with pytest.raises(ValueError, match="not both"):
        Bm25StreamServer(spark, path, phrase=True, proximity_window=4)

    # proximity serving over the same positional index
    pq_srv = Bm25StreamServer(spark, path, proximity_window=4)
    qprox = spark.createDataFrame(
        [("a", "join slow"), ("b", "table fast")],
        "query_id string, q_text string",
    )
    want_p = {
        tuple(r)
        for r in bm25.proximity_match_indexed(spark, path, qprox, window=4).collect()
    }
    pq_srv.respond(qprox, batch_id=0)
    assert want_p and {tuple(r) for r in pq_srv.results} == want_p


def test_bm25_rebuild_clears_stale_tombstones(spark, corpus, tmp_path):
    """Round 13 (review): a rebuild over a previously-deleted-from path
    must not inherit tombstones — they would silently mask re-indexed
    docs and corrupt the fresh stats."""
    path = str(tmp_path / "bm25_rebuild")
    bm25.write_bm25_index(corpus, path)
    bm25.delete_from_bm25_index(spark, path, [2])
    bm25.write_bm25_index(corpus, path)  # full rebuild, doc 2 included
    q = spark.createDataFrame([("q", "join")], "query_id string, q_text string")
    got, _ = bm25.bm25_topk_indexed(spark, path, q, k=10)
    assert any(r["doc_id"] == 2 for r in got.collect())
    ref = str(tmp_path / "bm25_rebuild_ref")
    bm25.write_bm25_index(corpus, ref)
    assert bm25._read_stats(spark, path) == bm25._read_stats(spark, ref)


def test_bm25_compact_fully_deleted_index(spark, corpus, tmp_path):
    """Round 13 (review): compacting an index whose EVERY doc is
    tombstoned must succeed (empty relations write unpartitioned but
    schema-ful), clear the tombstones, and keep probes answering
    typed-empty."""
    import os

    path = str(tmp_path / "bm25_alldel")
    bm25.write_bm25_index(corpus, path)
    assert bm25.delete_from_bm25_index(spark, path, [1, 2, 3, 4]) == 4
    bm25.compact_bm25_index(spark, path)
    assert not os.path.exists(f"{path}/tombstones")
    assert spark.read.parquet(f"{path}/postings").count() == 0
    q = spark.createDataFrame([("q", "join")], "query_id string, q_text string")
    got, _ = bm25.bm25_topk_indexed(spark, path, q, k=10)
    assert got.count() == 0


def test_proximity_match_hand_corpus(spark):
    """Round 13: sloppy-span semantics — all distinct query terms
    inside one [pos, pos+W) window, order/multiplicity ignored;
    n_spans counts covering anchors; W=1 degenerates to single-term
    matching only for one-term queries."""
    docs = spark.createDataFrame(
        [
            (1, "alpha x beta"),          # alpha..beta within 3
            (2, "beta y y y alpha"),      # within 5, reversed order
            (3, "alpha x x x x x beta"),  # gap 6 — outside W=3/W=5
            (4, "alpha beta alpha"),      # multiple covering anchors
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [("a", "alpha beta"), ("b", "beta beta alpha")],
        "query_id string, q_text string",
    )
    got3 = {
        (r["query_id"], r["doc_id"]): r["n_spans"]
        for r in bm25.proximity_match(docs, q, window=3).collect()
    }
    # doc1: anchor@0 covers {alpha, beta}; doc4: anchors 0,1 cover
    assert got3[("a", 1)] == 1 and got3[("a", 4)] == 2
    assert ("a", 2) not in got3 and ("a", 3) not in got3
    # duplicate query terms collapse: query b == query a
    assert {k[1]: v for k, v in got3.items() if k[0] == "b"} == {
        k[1]: v for k, v in got3.items() if k[0] == "a"
    }
    got5 = {
        (r["query_id"], r["doc_id"])
        for r in bm25.proximity_match(docs, q, window=5).collect()
    }
    assert ("a", 2) in got5 and ("a", 3) not in got5
    with pytest.raises(ValueError, match="window"):
        bm25.proximity_match(docs, q, window=0)


def test_proximity_indexed_matches_inmemory_and_phrase_subset(spark, corpus, tmp_path):
    """The positional-index path equals the in-memory scan; every
    exact-phrase hit is also a proximity hit at window = phrase
    length (unordered is a relaxation of ordered-consecutive)."""
    q = spark.createDataFrame(
        [("a", "table fast"), ("b", "join slow")],
        "query_id string, q_text string",
    )
    want = {tuple(r) for r in bm25.proximity_match(corpus, q, window=4).collect()}
    assert want
    path = str(tmp_path / "bm25_prox")
    bm25.write_bm25_index(corpus, path, positions=True)
    got = {
        tuple(r)
        for r in bm25.proximity_match_indexed(spark, path, q, window=4).collect()
    }
    assert got == want

    phr = q.withColumnRenamed("q_text", "phrase")
    ph = {
        (r["query_id"], r["doc_id"])
        for r in bm25.phrase_match(corpus, phr).collect()
    }
    prox2 = {
        (r["query_id"], r["doc_id"])
        for r in bm25.proximity_match(corpus, q, window=2).collect()
    }
    assert ph <= prox2


def test_delete_by_meta_predicate(spark, tmp_path):
    """Round 13: deleting by a meta predicate ("everything from source
    X") derives the id set from the stored postings/codes — equals the
    explicit-ids delete."""
    docs = spark.createDataFrame(
        [(1, "alpha beta", "en"), (2, "beta gamma", "ru"),
         (3, "alpha gamma", "ru"), (4, "beta beta", "en")],
        "doc_id long, text string, lang string",
    )
    a = str(tmp_path / "delpred_a")
    b = str(tmp_path / "delpred_b")
    bm25.write_bm25_index(docs, a, meta_cols=["lang"])
    bm25.write_bm25_index(docs, b, meta_cols=["lang"])
    assert bm25.delete_from_bm25_index(spark, a, "lang = 'ru'") == 2
    assert bm25.delete_from_bm25_index(spark, b, [2, 3]) == 2
    q = spark.createDataFrame([("q", "beta gamma")], "query_id string, q_text string")
    ra, _ = bm25.bm25_topk_indexed(spark, a, q, k=10)
    rb, _ = bm25.bm25_topk_indexed(spark, b, q, k=10)
    assert {tuple(r) for r in ra.collect()} == {tuple(r) for r in rb.collect()}
    assert bm25._read_stats(spark, a) == bm25._read_stats(spark, b)


def test_shared_positions_relation_matches_per_scan_explode(spark):
    """Round 13 (optimization): phrase_match/proximity_match consuming a
    caller-shared union-vocabulary positions relation return exactly
    what their own corpus explode returns — the corpus_prep one-
    tokenize-for-both pattern. A superset vocabulary must change no
    values (each scan re-applies its own restriction)."""
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the cat mat"),
            (2, "cat the cat the cat"),
            (3, "mat dog cat x y z dog"),
            (4, "cat mat the dog"),
        ],
        "doc_id long, text string",
    )
    phr = spark.createDataFrame(
        [("a", "the cat"), ("c", "cat mat")], "query_id string, phrase string"
    )
    prox_q = spark.createDataFrame(
        [("x", "dog cat"), ("y", "mat dog")], "query_id string, q_text string"
    )
    union_terms = ["cat", "dog", "mat", "the"]
    positions = bm25._corpus_positions(docs, "text", "doc_id").filter(
        F.col("term").isin(union_terms)
    )
    base_p = {tuple(r) for r in bm25.phrase_match(docs, phr).collect()}
    base_x = {tuple(r) for r in bm25.proximity_match(docs, prox_q, window=3).collect()}
    got_p = {
        tuple(r)
        for r in bm25.phrase_match(docs, phr, positions=positions).collect()
    }
    got_x = {
        tuple(r)
        for r in bm25.proximity_match(
            docs, prox_q, window=3, positions=positions
        ).collect()
    }
    assert got_p == base_p and len(base_p) > 0
    assert got_x == base_x and len(base_x) > 0


def test_match_positions_shared_vocab_covers(spark):
    """The umbrella's Python-split union vocabulary covers the engine
    tokenization of every fixed phrase/prox query — the precondition
    that makes _match_positions_shared a safe superset relation."""
    from sgdnet_spark.operators import text as _text
    from sgdnet_spark.queries import _PHRASE_QUERIES, _PROX_QUERIES

    fixed = _PHRASE_QUERIES + _PROX_QUERIES
    split_vocab = {t for _, txt in fixed for t in txt.split()}
    qdf = spark.createDataFrame(fixed, "query_id string, q_text string")
    engine_vocab = {
        r["term"]
        for r in qdf.select(F.explode(_text.tokens("q_text")).alias("term")).collect()
        if r["term"]
    }
    assert engine_vocab <= split_vocab


def test_corpus_match_shared_equals_standalone_paths(spark, tmp_path):
    """Round 13 (optimization): the corpus_prep ONE-corpus-pass builder
    (_corpus_match_shared) must reproduce the standalone paths exactly —
    the bm25 scored relation == _bm25_scored_shared's, the hybrid
    lexical arm == bm25_topk's top-20, and the positions relation a
    safe superset that leaves phrase/prox values unchanged."""
    import shutil

    import sgdnet_spark.queries as Q

    sf = "/root/testdata/sf0.001"
    scored, lex, positions = Q._corpus_match_shared(spark, sf)
    # scored: same (query_id, doc_id, score) rows as the standalone shared relation
    base_scored = Q._bm25_scored_shared(spark, sf)
    a = {tuple(r) for r in scored.select("query_id", "doc_id", F.round("score", 9)).collect()}
    b = {tuple(r) for r in base_scored.select("query_id", "doc_id", F.round("score", 9)).collect()}
    assert a == b and len(a) > 0
    # lex: identical to the hybrid arm bm25_topk would have built
    docs = Q._t(spark, sf, "documents")
    qd = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("q_text")
    )
    base_lex = bm25.bm25_topk(docs, qd, 20)
    assert {tuple(r) for r in lex.collect()} == {tuple(r) for r in base_lex.collect()}
    # positions: phrase/prox values unchanged under the superset relation
    phr = spark.createDataFrame(Q._PHRASE_QUERIES, "query_id string, phrase string")
    got = {tuple(r) for r in bm25.phrase_match(docs, phr, positions=positions).collect()}
    want = {tuple(r) for r in bm25.phrase_match(docs, phr).collect()}
    assert got == want
