"""Streaming windowed agg == batch twin (events_windowed oracle query)."""

import pytest

from sgdnet_spark.queries import events_windowed
from sgdnet_spark.streaming import events as se


def test_stream_matches_batch(spark, sf_dir):
    stream = se.read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    result = se.run_to_memory(se.windowed_counts(stream), "win_counts")
    got = {tuple(r) for r in result.collect()}
    want = {tuple(r) for r in events_windowed(spark, sf_dir).collect()}
    assert got == want


def test_stream_sessionize(spark, sf_dir):
    stream = se.read_events_stream(spark, sf_dir)
    result = se.run_to_memory(se.sessionize_stateful(stream), "sess")
    rows = result.collect()
    assert len(rows) > 0
    # every session respects start <= end and positive counts
    for r in rows:
        assert r["session_start"] <= r["session_end"]
        assert r["n_events"] >= 1
    # per-user session counts match the batch lag/gap sessionizer
    from sgdnet_spark.queries import events_sessionize

    batch = {r["user_id"]: r["n_sessions"] for r in events_sessionize(spark, sf_dir).collect()}
    stream_counts = {}
    for r in rows:
        stream_counts[r["user_id"]] = stream_counts.get(r["user_id"], 0) + 1
    assert stream_counts == batch


def test_streaming_near_dup_candidates_match_batch(spark, sf_dir):
    """Stateful MinHash LSH over a document stream: the union of pairs
    emitted across the stream == the batch candidate set
    (dedup.minhash_lsh_pairs(verify=False)) on the same corpus."""
    import shutil
    import tempfile

    from sgdnet_spark.operators import dedup
    from sgdnet_spark.streaming.dedup_stream import near_dup_candidates

    stage = tempfile.mkdtemp(prefix="docs_stream_")
    shutil.copy(f"{sf_dir}/documents.parquet", f"{stage}/documents.parquet")
    docs_static = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stream = spark.readStream.schema(docs_static.schema).format("parquet").load(stage)
    assert stream.isStreaming

    out = near_dup_candidates(stream)
    q = out.writeStream.outputMode("update").format("memory").queryName("nd_cand").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["id_a"], r["id_b"])
        for r in spark.sql("SELECT DISTINCT id_a, id_b FROM nd_cand").collect()
    }
    want = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(docs_static, verify=False).collect()
    }
    assert got == want
    assert len(got) > 0


def test_streaming_simhash_candidates_match_batch(spark, sf_dir):
    """Stateful SimHash over a document stream: distinct emitted pairs
    == the batch simhash_pairs output (hamming verified IN the bucket
    state at arrival time — no downstream join)."""
    import shutil
    import tempfile

    from sgdnet_spark.operators import dedup
    from sgdnet_spark.streaming.dedup_stream import simhash_near_dup_candidates

    stage = tempfile.mkdtemp(prefix="docs_stream_sh_")
    shutil.copy(f"{sf_dir}/documents.parquet", f"{stage}/documents.parquet")
    docs_static = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stream = spark.readStream.schema(docs_static.schema).format("parquet").load(stage)

    out = simhash_near_dup_candidates(stream, max_hamming=8)
    q = out.writeStream.outputMode("update").format("memory").queryName("sh_cand").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in spark.sql("SELECT DISTINCT id_a, id_b, hamming FROM sh_cand").collect()
    }
    want = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.simhash_pairs(docs_static, max_hamming=8).collect()
    }
    assert got == want
    assert len(got) > 0


def test_streaming_sampling_matches_batch(spark, sf_dir):
    """Deterministic sampling/splitting are pure per-row functions of
    the id, so they run UNCHANGED on a stream and make the exact same
    decisions as batch — split labels and stratified keeps both match
    row-for-row."""
    import shutil
    import tempfile

    from sgdnet_spark.operators import sampling as S

    stage = tempfile.mkdtemp(prefix="docs_sample_stream_")
    shutil.copy(f"{sf_dir}/documents.parquet", f"{stage}/documents.parquet")
    docs_static = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stream = spark.readStream.schema(docs_static.schema).format("parquet").load(stage)

    out = S.stratified_sample(
        S.split_assign(stream, {"train": 0.8, "val": 0.1, "test": 0.1}),
        "lang", {"en": 0.5, "de": 1.0, "zh": 0.25},
    ).select("doc_id", "split")
    q = out.writeStream.outputMode("append").format("memory").queryName("samp").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["doc_id"], r["split"]) for r in spark.sql("SELECT * FROM samp").collect()}
    want = {
        (r["doc_id"], r["split"])
        for r in S.stratified_sample(
            S.split_assign(docs_static, {"train": 0.8, "val": 0.1, "test": 0.1}),
            "lang", {"en": 0.5, "de": 1.0, "zh": 0.25},
        ).select("doc_id", "split").collect()
    }
    assert got == want
    assert len(got) > 0


def test_streaming_scrub_matches_batch(spark, sf_dir):
    """The scrub tier runs on a document stream: model-based hash
    scoring is a stateless per-row map (append mode), and
    decontamination is a stream-static join against the benchmark's
    gram set plus a per-doc count that completes within the batch —
    both must make exactly the batch decisions."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from sgdnet_spark.operators import dedup
    from sgdnet_spark.operators import text as T

    stage = tempfile.mkdtemp(prefix="docs_scrub_stream_")
    shutil.copy(f"{sf_dir}/documents.parquet", f"{stage}/documents.parquet")
    docs_static = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stream = spark.readStream.schema(docs_static.schema).format("parquet").load(stage)

    # hash_score: stateless map, append mode
    hs = T.hash_score(stream, n_buckets=512, salt="st")
    q = hs.writeStream.outputMode("append").format("memory").queryName("hs").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["doc_id"], r["n_tokens"], r["score"])
           for r in spark.sql("SELECT * FROM hs").collect()}
    want = {(r["doc_id"], r["n_tokens"], r["score"])
            for r in T.hash_score(docs_static, n_buckets=512, salt="st").collect()}
    assert got == want and len(got) > 0

    # decontamination: corpus stream x static benchmark gram set
    corpus_stream = stream.filter(F.col("doc_id") % 20 != 0)
    bench_static = docs_static.filter(F.col("doc_id") % 20 == 0)
    flags = dedup.contamination_flags(corpus_stream, bench_static, k=4)
    q2 = (flags.writeStream.outputMode("complete").format("memory")
          .queryName("decon_s").start())
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got2 = {(r["id"], r["n_overlap"])
            for r in spark.sql("SELECT * FROM decon_s").collect()}
    want2 = {(r["id"], r["n_overlap"])
             for r in dedup.contamination_flags(
                 docs_static.filter(F.col("doc_id") % 20 != 0), bench_static, k=4
             ).collect()}
    assert got2 == want2 and len(got2) > 0


def test_streaming_pii_and_lm_score_match_batch(spark, sf_dir):
    """The two remaining scrub stages on a document stream: PII
    count+redact is a stateless per-row regex map (append mode), and
    LM fluency scoring is a stream-static join against a fit_lm() model
    relation plus a per-doc mean that completes within the batch (all
    of a doc's bigrams arrive in its one row) — both must make exactly
    the batch decisions."""
    import shutil
    import tempfile

    from sgdnet_spark.operators import pii
    from sgdnet_spark.operators import text as T

    # PII: plant adversarial strings (synthetic docs carry no digits)
    planted = [
        (1, "mail a.b@c.org or 555-867-5309 from 10.0.0.1"),
        (2, "ssn 123-45-6789; backup ssn 987-65-4321"),
        (3, "nothing sensitive here at all"),
        (4, None),
    ]
    pdir = tempfile.mkdtemp(prefix="pii_stream_")
    pii_static = spark.createDataFrame(planted, "doc_id long, text string")
    pii_static.write.mode("overwrite").parquet(f"{pdir}/docs.parquet")
    pii_static = spark.read.parquet(f"{pdir}/docs.parquet")
    pstream = (spark.readStream.schema(pii_static.schema)
               .format("parquet").load(f"{pdir}/docs.parquet"))
    out = pii.redact(pii.pii_counts(pstream), "text", out_col="red")
    q = out.writeStream.outputMode("append").format("memory").queryName("pii_s").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM pii_s").collect()}
    want = {tuple(r) for r in
            pii.redact(pii.pii_counts(pii_static), "text", out_col="red").collect()}
    assert got == want and len(got) == 4

    # LM scoring: fit ONCE on the static corpus, score the stream with
    # model= (stream-static left join + within-batch per-doc mean)
    stage = tempfile.mkdtemp(prefix="docs_lm_stream_")
    shutil.copy(f"{sf_dir}/documents.parquet", f"{stage}/documents.parquet")
    docs_static = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stream = spark.readStream.schema(docs_static.schema).format("parquet").load(stage)
    model = T.fit_lm(docs_static, k_smooth=0.1)
    scored = T.lm_score(stream, model=model)
    q2 = (scored.writeStream.outputMode("complete").format("memory")
          .queryName("lm_s").start())
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got2 = {tuple(r) for r in spark.sql("SELECT * FROM lm_s").collect()}
    want2 = {tuple(r) for r in T.lm_score(docs_static, k_smooth=0.1).collect()}
    assert got2 == want2 and len(got2) > 0


def test_streaming_line_scrub_matches_batch(spark, sf_dir):
    """Line-level boilerplate removal on a document stream: the flagged
    set is fit ONCE on the static corpus (fit_boilerplate) and the
    stream scrubs against it via a stream-static broadcast join plus a
    within-batch per-doc regroup (all of a doc's lines arrive in its
    one row) — exactly the batch decisions."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from sgdnet_spark.operators import dedup

    stage = tempfile.mkdtemp(prefix="docs_line_stream_")
    # synthesize lines: every 5th token becomes a newline so cross-doc
    # duplicate lines exist (shared small vocabulary)
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = F.split(F.lower(F.col("text")), " ")
    lined = docs0.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.greatest((F.size(t) / 5).cast("int"), F.lit(1)) - 1),
                lambda i: F.array_join(F.slice(t, i * 5 + 1, 5), " "),
            ),
            "\n",
        ).alias("text"),
    )
    lined.write.mode("overwrite").parquet(f"{stage}/lined.parquet")
    static = spark.read.parquet(f"{stage}/lined.parquet")
    stream = spark.readStream.schema(static.schema).format("parquet").load(f"{stage}/lined.parquet")

    fset = dedup.fit_boilerplate(static, min_docs=2)
    out = dedup.line_scrub(stream, flagged=fset)
    q = out.writeStream.outputMode("complete").format("memory").queryName("line_s").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM line_s").collect()}
    want = {tuple(r) for r in dedup.line_scrub(static, flagged=fset).collect()}
    assert got == want and len(got) > 0
    # sanity: the synthetic corpus actually contains removed boilerplate
    assert any(r[2] > 0 for r in got)


def test_streaming_dsir_and_repeated_spans_match_batch(spark, sf_dir):
    """Round-8 scrub/selection stages on a document stream: DSIR
    scoring is a stateless per-row fold over a broadcast literal
    log-ratio vector (append mode, zero state), and repeated-span
    stats run against a fit_repeated_hashes() static relation via a
    stream-static join plus a complete-mode per-doc agg whose island
    merge is an IN-ROW fold (no window functions) — both must make
    exactly the batch decisions."""
    from pyspark.sql import functions as F

    from sgdnet_spark.operators import dsir as D
    from sgdnet_spark.operators.dedup import (
        fit_repeated_hashes,
        repeated_span_stats,
    )

    import tempfile

    stage = tempfile.mkdtemp(prefix="docs_dsir_stream_")
    spark.read.parquet(f"{sf_dir}/documents.parquet").write.mode(
        "overwrite"
    ).parquet(f"{stage}/docs.parquet")
    static = spark.read.parquet(f"{stage}/docs.parquet")
    stream = (
        spark.readStream.schema(static.schema)
        .format("parquet")
        .load(f"{stage}/docs.parquet")
    )

    # DSIR scoring: fit on the static corpus, score the stream
    lr = D.fit_dsir(static.filter(F.col("lang") == "en"), static,
                    n_buckets=256)
    q = (
        D.dsir_score(stream, lr)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dsir_s")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM dsir_s").collect()}
    want = {tuple(r) for r in D.dsir_score(static, lr).collect()}
    assert got == want and len(got) > 0

    # repeated-span stats: flagged hashes fit once on the static corpus
    fl = fit_repeated_hashes(static, k=32, mod_p=4)
    q2 = (
        repeated_span_stats(stream, k=32, mod_p=4, flagged=fl)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("xs_s")
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got2 = {tuple(r) for r in spark.sql("SELECT * FROM xs_s").collect()}
    want2 = {
        tuple(r)
        for r in repeated_span_stats(static, k=32, mod_p=4, flagged=fl).collect()
    }
    assert got2 == want2 and len(got2) > 0


def test_streaming_scrub_spans_matches_batch(spark, sf_dir):
    """Round-10: the ExactSubstr REMOVAL half on a document stream —
    scrub against a fit_repeated_hashes() static relation via the
    dual-carry union (doc rows carry text, hit rows carry positions)
    into ONE complete-mode agg with in-row island-merge + splice folds.
    Streamed clean text must equal batch scrub_spans exactly,
    including zero-hit documents."""
    import tempfile

    from sgdnet_spark.operators.dedup import (
        fit_repeated_hashes,
        scrub_spans,
        scrub_spans_streaming,
    )

    stage = tempfile.mkdtemp(prefix="docs_xscrub_stream_")
    spark.read.parquet(f"{sf_dir}/documents.parquet").write.mode(
        "overwrite"
    ).parquet(f"{stage}/docs.parquet")
    static = spark.read.parquet(f"{stage}/docs.parquet")
    stream = (
        spark.readStream.schema(static.schema)
        .format("parquet")
        .load(f"{stage}/docs.parquet")
    )
    fl = fit_repeated_hashes(static, k=32, mod_p=4)
    q = (
        scrub_spans_streaming(stream, fl, k=32, mod_p=4)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("xscrub_s")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM xscrub_s").collect()}
    want = {tuple(r) for r in scrub_spans(static, k=32, mod_p=4).collect()}
    assert got == want and len(got) > 0
    assert any(r[2] > 0 for r in got)  # real cuts happened in-stream


def test_streaming_phash_neardup_matches_batch(spark, sf_dir):
    """Round-10: perceptual-hash image near-dup on a media stream — the
    decode+hash mapInPandas is stateless, the pigeonhole block keys and
    the stateful bucket operator are the SimHash stream's, so pairs
    emit at arrival. Distinct streamed pairs must equal the batch
    blocked join (planted perturbed images guarantee a non-empty set)."""
    import hashlib
    import tempfile

    import numpy as np

    from sgdnet_spark.operators import media_codec as mc
    from sgdnet_spark.operators import phash as P
    from sgdnet_spark.streaming.dedup_stream import phash_near_dup_candidates

    def img(seed):
        d = hashlib.sha256(seed.encode()).digest()
        w, h = 16 + d[0] % 48, 16 + d[1] % 48
        return np.resize(np.frombuffer(d, dtype=np.uint8), (h, w, 3))

    rows = []
    for i in range(12):
        px = img(f"s{i}")
        rows.append((2 * i, bytearray(mc.encode_bmp(px))))
        if i < 3:  # plant a perturbed near-dup of the first three
            dup = px.copy()
            dup[0:2, 0:3, :] = 200
            rows.append((2 * i + 1, bytearray(mc.encode_bmp(dup))))
    stage = tempfile.mkdtemp(prefix="phash_stream_")
    static = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    static.write.mode("overwrite").parquet(f"{stage}/media.parquet")
    static = spark.read.parquet(f"{stage}/media.parquet")
    stream = (
        spark.readStream.schema(static.schema)
        .format("parquet")
        .load(f"{stage}/media.parquet")
    )
    q = (
        phash_near_dup_candidates(stream, max_hamming=6)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("phash_s")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT DISTINCT * FROM phash_s").collect()}
    want = {tuple(r) for r in P.image_neardup_pairs(static, max_hamming=6).collect()}
    assert got == want and len(got) >= 3


def test_streaming_audiofp_neardup_matches_batch(spark):
    """Round-10: acoustic-fingerprint audio near-dup on a media stream —
    the decode+fingerprint mapInPandas is stateless, the pigeonhole
    block keys and the stateful bucket operator are the SimHash
    stream's, so pairs emit at arrival. Distinct streamed pairs must
    equal the batch blocked join (planted perturbed clips guarantee a
    non-empty set). Completes the image+audio streaming near-dup
    family."""
    import hashlib
    import tempfile

    import numpy as np

    from sgdnet_spark.operators import audiofp as A
    from sgdnet_spark.operators import media_codec as mc
    from sgdnet_spark.streaming.dedup_stream import audiofp_near_dup_candidates

    def clip(seed):
        d = hashlib.sha256(seed.encode()).digest()
        n = 256 + d[2] * 8
        return (
            np.resize(np.frombuffer(d, dtype=np.uint8), n).astype(np.int16) * 64
            - 8192
        ).astype(np.int16)

    rng = np.random.RandomState(3)
    rows = []
    for i in range(12):
        s = clip(f"s{i}")
        rows.append((2 * i, bytearray(mc.encode_wav(s, 8000))))
        if i < 3:  # plant a lightly-noised near-dup of the first three
            dup = s.copy()
            idx = rng.choice(s.size, 6, replace=False)
            dup[idx] = dup[idx] + 16
            rows.append((2 * i + 1, bytearray(mc.encode_wav(dup, 8000))))
    stage = tempfile.mkdtemp(prefix="audiofp_stream_")
    static = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    static.write.mode("overwrite").parquet(f"{stage}/media.parquet")
    static = spark.read.parquet(f"{stage}/media.parquet")
    stream = (
        spark.readStream.schema(static.schema)
        .format("parquet")
        .load(f"{stage}/media.parquet")
    )
    q = (
        audiofp_near_dup_candidates(stream, max_hamming=6)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("audiofp_s")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT DISTINCT * FROM audiofp_s").collect()}
    want = {tuple(r) for r in A.audio_neardup_pairs(static, max_hamming=6).collect()}
    assert got == want and len(got) >= 3


def test_pq_stream_serving_matches_batch(spark, sf_dir, tmp_path):
    """ANN query serving on a stream: queries arrive as TWO parquet
    files; PqStreamServer probes the persisted IVF-PQ index per
    micro-batch via foreachBatch (quantizers loaded once). The union of
    streamed answers equals one batch probe of all queries — each
    query's answer depends only on the static index, so batching is
    invisible."""
    from pyspark.sql import functions as F

    from sgdnet_spark.operators import pq
    from sgdnet_spark.streaming.ann_stream import PqStreamServer

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "pq_idx")
    pq.write_pq_index(emb, idx, n_lists=8, kmeans_iters=5)

    queries = emb.filter(F.col("vec_id") < 10)
    want_df, _ = pq.pq_topk_indexed(spark, idx, queries, k_neighbors=5, nprobe=3)
    want = {tuple(r) for r in want_df.collect()}

    # the file-stream source wants FLAT files: write each split to a
    # scratch dir, move its part-file into the watched dir
    import glob
    import shutil

    stage = tmp_path / "qstream"
    stage.mkdir()
    for name, cond in (("a", "vec_id < 5"), ("b", "vec_id >= 5")):
        scratch = str(tmp_path / f"scratch_{name}")
        queries.filter(cond).coalesce(1).write.parquet(scratch)
        part = glob.glob(f"{scratch}/part-*.parquet")[0]
        shutil.move(part, str(stage / f"{name}.parquet"))
    stream = (
        spark.readStream.schema(emb.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)  # force >= 2 micro-batches
        .load(str(stage))
    )
    server = PqStreamServer(spark, idx, k_neighbors=5, nprobe=3)
    q = stream.writeStream.foreachBatch(server.respond).outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in server.results}
    assert got == want and len(got) == 50


def test_online_kmeans_single_batch_equals_one_lloyd_iteration(spark, sf_dir):
    """Deterministic init + one running-mean fold over a single batch
    == kmeans_fit(iters=1) on the same frame (counts start at zero, so
    the running mean IS the batch mean of each centroid's assignees)."""
    import numpy as np

    from sgdnet_spark.operators.ivf import kmeans_fit
    from sgdnet_spark.streaming.online_kmeans import OnlineKMeans

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = OnlineKMeans(k=8)
    model.update(emb)
    want = kmeans_fit(emb, k=8, iters=1)
    assert np.allclose(model.centroids, want, atol=1e-12)


def test_online_kmeans_two_batch_numpy_replay(spark):
    """Two sequential updates replay exactly in numpy (assignment under
    the centroids current at each batch, running-mean fold)."""
    import numpy as np

    from sgdnet_spark.streaming.online_kmeans import OnlineKMeans

    rng = np.random.default_rng(11)
    b1 = rng.normal(size=(30, 4))
    b2 = rng.normal(size=(25, 4)) + 2.0
    df1 = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(b1)],
        "vec_id long, embedding array<float>",
    )
    df2 = spark.createDataFrame(
        [(100 + i, [float(x) for x in v]) for i, v in enumerate(b2)],
        "vec_id long, embedding array<float>",
    )
    model = OnlineKMeans(k=4)
    model.update(df1, 0)
    model.update(df2, 1)

    # replay: float32 storage round-trip first (array<float> column)
    B1 = b1.astype(np.float32).astype(np.float64)
    B2 = b2.astype(np.float32).astype(np.float64)
    cents = B1[:4].copy()
    counts = np.zeros(4)
    for B in (B1, B2):
        d2 = (B**2).sum(1)[:, None] - 2 * B @ cents.T + (cents**2).sum(1)[None, :]
        a = d2.argmin(1)
        cnt = np.array([(a == c).sum() for c in range(4)], dtype=float)
        s = np.stack([B[a == c].sum(0) if (a == c).any() else np.zeros(4) for c in range(4)])
        new_n = counts + cnt
        cents = cents + np.where(
            cnt[:, None] > 0, (s - cnt[:, None] * cents) / np.maximum(new_n[:, None], 1), 0.0
        )
        counts = new_n
    assert np.allclose(model.centroids, cents, atol=1e-9)
    assert np.allclose(model.counts, counts)


def test_online_kmeans_stream_and_downstream(spark, sf_dir, tmp_path):
    """foreachBatch wiring: a single-file stream folds once; the
    resulting centroids drive cluster_balance(cents=) identically to a
    batch model.update on the same data. Empty batches are no-ops."""
    import shutil

    import numpy as np

    from sgdnet_spark.operators import sampling
    from sgdnet_spark.streaming.online_kmeans import OnlineKMeans

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    stage = tmp_path / "vstream"
    stage.mkdir()
    shutil.copy(f"{sf_dir}/embeddings.parquet", stage / "v.parquet")
    stream = spark.readStream.schema(emb.schema).format("parquet").load(str(stage))
    streamed = OnlineKMeans(k=8)
    q = stream.writeStream.foreachBatch(streamed.update).outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    batch = OnlineKMeans(k=8)
    batch.update(emb)
    assert np.allclose(streamed.centroids, batch.centroids, atol=1e-12)
    a, _ = sampling.cluster_balance(emb, cents=streamed.centroids)
    b, _ = sampling.cluster_balance(emb, cents=batch.centroids)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
    # empty update is a no-op
    before = streamed.centroids.copy()
    streamed.update(emb.filter("vec_id < 0"))
    assert np.allclose(streamed.centroids, before)


def test_streaming_fuzzy_decontamination_matches_batch(spark, sf_dir, tmp_path):
    """Fuzzy (MinHash-level) decontamination on a corpus STREAM: each
    micro-batch is scrubbed against the static benchmark with the batch
    operator (foreachBatch — the PqStreamServer pattern; the verify
    stage's candidate joins and pair materialization are not
    append-mode-expressible, and each document's flag depends only on
    itself + the static benchmark, so batching is invisible). Union of
    streamed flags == one batch pass."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from sgdnet_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    near = bench.select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" plantedleak")).alias("text"),
    )
    corpus = docs.filter(~(F.col("doc_id") % 20).isin(0, 1)).unionByName(near)
    want = {
        (r["id"], r["bench_id"], r["jaccard"])
        for r in dedup.fuzzy_contamination_flags(corpus, bench, threshold=0.8).collect()
    }

    stage = tmp_path / "fz_stream"
    stage.mkdir()
    for name, cond in (("a", "doc_id < 250"), ("b", "doc_id >= 250")):
        scratch = str(tmp_path / f"fz_scratch_{name}")
        corpus.filter(cond).coalesce(1).write.parquet(scratch)
        part = glob.glob(f"{scratch}/part-*.parquet")[0]
        shutil.move(part, str(stage / f"{name}.parquet"))
    stream = (
        spark.readStream.schema(corpus.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(stage))
    )
    got = []

    def respond(batch_df, batch_id):
        got.extend(
            dedup.fuzzy_contamination_flags(batch_df, bench, threshold=0.8).collect()
        )

    q = stream.writeStream.foreachBatch(respond).outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert {(r["id"], r["bench_id"], r["jaccard"]) for r in got} == want
    assert len(want) > 0


def test_hybrid_stream_server_matches_batch(spark, sf_dir, tmp_path):
    """Round 12: streaming HYBRID serving — queries stream in as
    (query_id, q_text, q_vec); each micro-batch probes the persisted
    BM25 and IVF-PQ indexes and fuses in-batch with RRF
    (streaming/hybrid_stream.py). The union of streamed fused answers
    equals one batch probe of all queries — every answer depends only
    on the two static indexes."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from sgdnet_spark.operators import bm25, pq
    from sgdnet_spark.streaming.hybrid_stream import HybridStreamServer

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bidx = str(tmp_path / "hyb_bm25")
    pidx = str(tmp_path / "hyb_pq")
    bm25.write_bm25_index(docs, bidx)
    pq.write_pq_index(emb, pidx, n_lists=8, kmeans_iters=5)

    queries = (
        docs.filter(F.col("doc_id") < 4)
        .select(F.col("doc_id").alias("query_id"), F.col("text").alias("q_text"))
        .join(
            emb.filter(F.col("vec_id") < 4).select(
                F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
            ),
            "query_id",
        )
    )
    server = HybridStreamServer(spark, bidx, pidx, k=5, pool=10, nprobe=3, refine=2)
    want = {tuple(r) for r in server.probe(queries).collect()}

    stage = tmp_path / "hyb_qstream"
    stage.mkdir()
    for name, cond in (("a", "query_id < 2"), ("b", "query_id >= 2")):
        scratch = str(tmp_path / f"hyb_scratch_{name}")
        queries.filter(cond).coalesce(1).write.parquet(scratch)
        part = glob.glob(f"{scratch}/part-*.parquet")[0]
        shutil.move(part, str(stage / f"{name}.parquet"))
    stream = (
        spark.readStream.schema(queries.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)  # force >= 2 micro-batches
        .load(str(stage))
    )
    sq = stream.writeStream.foreachBatch(server.respond).outputMode("append").start()
    try:
        sq.processAllAvailable()
    finally:
        sq.stop()
    got = {tuple(r) for r in server.results}
    assert got == want and len(got) == 4 * 5


def test_hybrid_stream_server_opq_and_deletes(spark, sf_dir, tmp_path):
    """Round 13: the hybrid server composes correctly with the new
    index variants — it loads the OPQ rotation once at construction
    (an unrotated probe of a rotated index would silently degrade
    candidate recall), and deletions in EITHER index mask from the
    fused answers on the very next probe."""
    from pyspark.sql import functions as F

    from sgdnet_spark.operators import bm25, pq
    from sgdnet_spark.streaming.hybrid_stream import HybridStreamServer

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bidx = str(tmp_path / "hyb13_bm25")
    pidx = str(tmp_path / "hyb13_pq")
    bm25.write_bm25_index(docs, bidx)
    pq.write_pq_index(emb, pidx, n_lists=8, kmeans_iters=5, opq=True)

    queries = (
        docs.filter(F.col("doc_id") < 4)
        .select(F.col("doc_id").alias("query_id"), F.col("text").alias("q_text"))
        .join(
            emb.filter(F.col("vec_id") < 4).select(
                F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
            ),
            "query_id",
        )
    )
    server = HybridStreamServer(spark, bidx, pidx, k=5, pool=10, nprobe=3, refine=2)
    assert server._rot is not None
    got = server.probe(queries)
    # batch twin through the public indexed probes (pq_topk_indexed
    # loads the rotation itself) — the server must equal it
    from sgdnet_spark.operators import fusion

    lex, _ = bm25.bm25_topk_indexed(
        spark, bidx, queries.select("query_id", "q_text"), k=10
    )
    dense, _ = pq.pq_topk_indexed(
        spark, pidx,
        queries.select(F.col("query_id").alias("vec_id"),
                       F.col("q_vec").alias("embedding")),
        k_neighbors=10, nprobe=3, refine=2, with_rank=True,
    )
    want_df = fusion.rrf_fuse(
        [lex, dense.select("query_id", F.col("nbr_id").alias("doc_id"), "rn")], k=5
    )
    want = {tuple(r) for r in want_df.collect()}
    assert {tuple(r) for r in got.collect()} == want and len(want) == 20

    # deletions in either tier mask immediately (tombstones read per
    # probe; fused ranks re-close over the survivors)
    fused_docs = {r["doc_id"] for r in got.collect()}
    dead = sorted(fused_docs)[:2]
    bm25.delete_from_bm25_index(spark, bidx, dead)
    pq.delete_from_pq_index(spark, pidx, dead)
    after = server.probe(queries).collect()
    assert after and not any(r["doc_id"] in dead for r in after)
