"""Pipeline-operator tests: dedup / similarity / text / multimodal.

Oracle-equivalence runs in tools/check_oracles.py (the driver's gate);
these tests cover semantics the oracle can't: minhash recall, simhash
behavior on planted dupes, LSH vs brute-force agreement, decode plumbing.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sgdnet_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog and runs far away today",
        "a completely different document about spark query engines and shuffles",
        "numbers one two three four five six seven eight nine ten eleven twelve",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((i * 10, t))
        rows.append((i * 10 + 1, t))  # exact duplicate
    # near duplicate of doc 0: one word changed
    rows.append((90, base[0].replace("lazy", "sleepy")))
    # whitespace/case variant of doc 1 (exact after normalization)
    rows.append((91, "  A   Completely DIFFERENT document about spark query engines and shuffles "))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    stats = dedup.exact_stats(docs).first()
    assert stats["n_docs"] == 8
    assert stats["n_unique"] == 4  # 3 bases + near-dup of 0
    kept = dedup.exact_dedup(docs).select("doc_id").rdd.map(lambda r: r[0]).collect()
    assert sorted(kept) == [0, 10, 20, 90]  # min doc_id survives each group


def test_ngram_jaccard_and_minhash_agree(docs):
    exact = {(r["id_a"], r["id_b"]): r["jaccard"] for r in dedup.ngram_jaccard_pairs(docs, 0.5).collect()}
    # exact dupes have jaccard 1.0; near-dup pair is found
    assert exact[(0, 1)] == 1.0
    assert any((a in (0, 1) and b == 90) or a == 90 for (a, b) in exact)
    mh = {(r["id_a"], r["id_b"]): r["jaccard"] for r in dedup.minhash_lsh_pairs(docs, 0.5).collect()}
    # minhash is a recall-oriented filter on the same measure: every pair it
    # reports carries the exact jaccard, and exact duplicates can't be missed
    assert set(mh) <= set(exact)
    for pair, j in mh.items():
        assert exact[pair] == j
    assert (0, 1) in mh and (10, 11) in mh and (20, 21) in mh


def test_simhash_finds_exact_and_near(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in dedup.simhash_pairs(docs, max_hamming=8).collect()}
    assert pairs[(0, 1)] == 0  # identical docs, identical simhash
    assert pairs[(10, 11)] == 0
    near = [h for (a, b), h in pairs.items() if 90 in (a, b) and (a in (0, 1) or b == 90)]
    assert near and min(near) <= 8  # near-dup within radius


def test_brute_force_vs_lsh_topk(spark):
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(80, 16))
    vecs[1] = vecs[0] + 0.01 * rng.normal(size=16)  # planted neighbor
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0)
    bf = dedup_rows = similarity.brute_force_topk(df, q, k=3).collect()
    assert bf[0]["nbr_id"] == 1  # planted neighbor is rank 1
    lsh = similarity.lsh_topk(df, q, k=3, n_planes=6, dim=16).collect()
    # the planted near-identical vector lands in the same bucket
    assert any(r["nbr_id"] == 1 for r in lsh)
    # numpy ground truth
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn @ vn[0]
    sims[0] = -2
    top = set(np.argsort(-sims)[:3])
    assert {r["nbr_id"] for r in bf} == top


def test_lsh_data_driven_buckets_bit_parity(spark):
    """The data-driven multi-table key builder (_planes_lit +
    _lsh_tables_data — planes as one nested-array literal) must produce
    BIT-IDENTICAL (tbl, bk) keys to the literal-array lsh_bucket form it
    replaced: same zip_with element order, same left-fold accumulation,
    so every per-plane dot (and therefore every sign bit) agrees."""
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 16))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planes = similarity.random_hyperplanes(16, 3 * 5, 42).reshape(5, 3, 16)

    def old_tables_col(vec, pl):
        entries = []
        for t in range(pl.shape[0]):
            entries.append(
                F.struct(
                    F.lit(t).alias("tbl"),
                    similarity.lsh_bucket(vec, pl[t]).alias("bk"),
                )
            )
        return F.array(*entries)

    vec = similarity._as_double("embedding")
    old = df.select(
        "vec_id", F.explode(old_tables_col(vec, planes)).alias("tb")
    ).select("vec_id", "tb.tbl", "tb.bk")
    new = df.select(
        "vec_id",
        F.explode(
            similarity._lsh_tables_data(vec, similarity._planes_lit(planes), 5, 3)
        ).alias("tb"),
    ).select("vec_id", "tb.tbl", "tb.bk")
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0


def test_text_ops(docs):
    tc = {r["doc_id"]: r["n_tokens"] for r in text.token_count(docs).collect()}
    assert tc[0] == 14
    assert tc[91] == 10  # normalized whitespace
    q = {r["doc_id"]: r for r in text.quality_score(docs).collect()}
    assert 0 < q[0]["stopword_ratio"] < 1
    assert q[0]["quality"] > q[20]["quality"]  # stopword-free number doc scores lower
    li = {r["doc_id"]: r for r in text.lang_id(docs.withColumn("lang", F.lit("en"))).collect()}
    assert li[0]["pred_lang"] == "en"
    assert li[0]["matches_label"] == 1
    fp = {r["doc_id"]: r["fp"] for r in text.fingerprint(docs).collect()}
    assert fp[10] == fp[11]  # normalized-identical docs share fingerprints
    assert fp[10] == fp[90 + 1]  # whitespace/case variant normalizes equal
    assert fp[0] != fp[90]


def test_media_codec_roundtrip():
    from sgdnet_spark.operators import media_codec as mc

    px = (np.arange(37 * 21 * 3) % 251).astype(np.uint8).reshape(21, 37, 3)
    assert (mc.decode_bmp(mc.encode_bmp(px)) == px).all()
    assert mc.resize_nearest(px, 8, 5).shape == (5, 8, 3)
    s = (np.arange(1234) % 4001 - 2000).astype(np.int16)
    rate, s2 = mc.decode_wav(mc.encode_wav(s, 8000))
    assert rate == 8000 and (s2 == s).all()


def test_multimodal_plumbing(docs):
    import hashlib

    media = multimodal.attach_media(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    feats = multimodal.extract_features(media)
    rows = {r["doc_id"]: r for r in feats.collect()}
    assert len(rows) == 8
    # even doc_id -> real BMP: dims parsed from the actual header must
    # equal the generation rule's digest-derived dims
    d0 = hashlib.sha256(
        b"the quick brown fox jumps over the lazy dog and runs far away today"
    ).digest()
    r0 = rows[0]
    assert r0["media_type"] == "image"
    assert (r0["width"], r0["height"]) == (16 + d0[0] % 48, 16 + d0[1] % 48)
    assert r0["n_frames"] == 1 and r0["sample_rate"] == 0
    assert 0 < r0["content_mean"] < 255  # real pixel statistics
    # odd doc_id -> real WAV: PCM sample count ties to the digest
    r1 = rows[1]
    assert r1["media_type"] == "audio"
    assert r1["sample_rate"] == 8000
    assert r1["n_frames"] == -(-(256 + d0[2] * 8) // 400)
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"no such container")


def test_asof_null_payload_latest_row_wins(spark):
    """A matched right row whose payload field is NULL must yield NULL,
    not an older row's value (DuckDB ASOF JOIN semantics)."""
    from sgdnet_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10, "L1")], "u int, ts int, tag string")
    right = spark.createDataFrame(
        [(1, 5, 100), (1, 8, None)], "u int, ts int, v int"
    )
    out = asof_join(left, right, on="ts", by="u", right_cols=["v", "ts"]).collect()
    assert len(out) == 1
    # the ts=8 row is the as-of match; its v is legitimately NULL
    assert out[0]["ts_r"] == 8
    assert out[0]["v_r"] is None


def test_ngram_jaccard_stop_shingle_cap(spark):
    """max_doc_freq drops corpus-wide boilerplate shingles (the skew
    valve) while near-identical pairs are still found."""
    boiler = "terms of service apply to all content on this site"
    rows = [(i, f"{boiler} unique filler text number {i} again {i}") for i in range(20)]
    # docs 100/101 are true near-dups beyond the boilerplate
    dup = "the quick brown fox jumps over the lazy dog every single day"
    rows += [(100, f"{boiler} {dup}"), (101, f"{boiler} {dup} extra")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dedup.ngram_jaccard_pairs(df, threshold=0.5, max_doc_freq=0.5)
    pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in pairs
    # boilerplate-only overlap must NOT pair the filler docs
    assert not any(a < 100 and b < 100 for a, b in pairs)


def test_multimodal_resize_and_frame_sampling(docs):
    from sgdnet_spark.operators import media_codec as mc

    media = multimodal.attach_media(docs)
    n_docs = media.count()
    resized = multimodal.resize(media, 32, 32)
    rows = resized.collect()
    assert len(rows) == n_docs
    assert {r["media_type"] for r in rows} == {"image", "audio"}
    for r in rows:
        assert r["meta"]["n_bytes"] == len(r["payload"])  # meta tracks new payload
        if r["media_type"] == "image":
            # a REAL resize: the re-encoded BMP decodes to 32x32 pixels
            assert mc.decode_bmp(bytes(r["payload"])).shape == (32, 32, 3)
    # deterministic: same input -> same resized payload
    again = {r["doc_id"]: bytes(r["payload"]) for r in multimodal.resize(media, 32, 32).collect()}
    assert all(bytes(r["payload"]) == again[r["doc_id"]] for r in rows)

    frames = multimodal.sample_frames(media, max_frames=3)
    fr = frames.collect()
    per_doc = {}
    for r in fr:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert set(per_doc) == {r["doc_id"] for r in rows}
    for idxs in per_doc.values():
        assert 1 <= len(idxs) <= 3
        assert idxs == sorted(idxs)  # evenly spaced ascending
    # image frames are the decoded pixel block; audio frames are real
    # 400-sample PCM windows (800 bytes except a shorter tail)
    by_doc = {r["doc_id"]: r for r in media.collect()}
    for r in fr:
        src = by_doc[r["doc_id"]]
        if src["media_type"] == "image":
            assert bytes(r["frame"]) == mc.decode_bmp(bytes(src["payload"])).tobytes()
        else:
            assert len(bytes(r["frame"])) <= 800


def test_contamination_flags_planted(spark):
    import pandas as pd

    from sgdnet_spark.operators import dedup

    bench = spark.createDataFrame(pd.DataFrame({
        "doc_id": [100],
        "text": ["the quick brown fox jumps over the lazy dog"],
    }))
    corpus = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "totally unrelated text about spark and parquet files here",
            "he said the quick brown fox jumps high today",  # shares 4-grams
            "quick brown dog sleeps",  # too short an overlap for k=4
        ],
    }))
    flags = {r["id"]: r["n_overlap"] for r in dedup.contamination_flags(corpus, bench, k=4).collect()}
    assert set(flags) == {2}
    assert flags[2] == 2  # 'the quick brown fox', 'quick brown fox jumps'
    clean = dedup.decontaminate(corpus, bench, k=4)
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 3]


def test_repetition_stats_planted(spark):
    import pandas as pd

    from sgdnet_spark.operators import text as T

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2],
        "text": [
            "spam spam spam spam",          # one token 4x; bigram 'spam spam' 3x
            "all words here are different",
        ],
    }))
    out = {r["doc_id"]: r.asDict() for r in T.repetition_stats(df).collect()}
    r1 = out[1]
    assert r1["n_tokens"] == 4
    assert abs(r1["top_token_frac"] - 1.0) < 1e-9
    assert abs(r1["top_bigram_frac"] - 1.0) < 1e-9
    assert abs(r1["dup_bigram_frac"] - (1 - 1 / 3)) < 1e-3
    r2 = out[2]
    assert abs(r2["top_token_frac"] - 0.2) < 1e-9
    assert abs(r2["dup_bigram_frac"]) < 1e-9


def test_events_funnel_hand_case(spark):
    """events_funnel on a hand-built log: stage times must be the
    earliest qualifying event STRICTLY after the previous stage."""
    import datetime as dt

    from sgdnet_spark.queries import events_funnel

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # user 1: view@1 -> click@5 (click@0 precedes the view: ignored)
        #         -> purchase@9   => full funnel, 4s + 4s
        (1, "click", t(0)), (1, "view", t(1)), (1, "click", t(5)),
        (1, "purchase", t(9)),
        # user 2: view@2, click@2 (tie NOT after) -> no click stage
        (2, "view", t(2)), (2, "click", t(2)),
        # user 3: purchase precedes click: view@0 -> click@8; purchase@4 ignored
        (3, "view", t(0)), (3, "purchase", t(4)), (3, "click", t(8)),
        # user 4: clicks only -> no view stage
        (4, "click", t(3)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    import sgdnet_spark.queries as Q

    orig = Q._t
    Q._t = lambda _s, _d, name: ev  # noqa: E731
    try:
        out = {r["stage"]: r.asDict() for r in events_funnel(spark, "unused").collect()}
    finally:
        Q._t = orig
    assert out["1_view"]["n_users"] == 3 and out["1_view"]["lat_us_total"] is None
    assert out["2_click"]["n_users"] == 2  # users 1 and 3
    assert out["2_click"]["lat_us_total"] == (4 + 8) * 1_000_000
    assert out["3_purchase"]["n_users"] == 1  # user 1 only
    assert out["3_purchase"]["lat_us_total"] == 4 * 1_000_000


def test_events_retention_hand_case(spark):
    import datetime as dt

    import sgdnet_spark.queries as Q

    d = lambda day: dt.datetime(2024, 1, 1 + day)  # noqa: E731
    rows = [
        (1, "view", d(0)),   # u1 cohort wk0
        (1, "view", d(1)),   # same week, dedups
        (1, "view", d(8)),   # wk1 -> offset 1
        (2, "view", d(7)),   # u2 cohort wk1
        (2, "view", d(20)),  # wk2 -> offset 1
        (3, "view", d(0)),   # u3 cohort wk0, never returns
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    orig = Q._t
    Q._t = lambda _s, _d, name: ev  # noqa: E731
    try:
        out = {
            (r["cohort_week"], r["week_offset"]): r["n_users"]
            for r in Q.events_retention(spark, "unused").collect()
        }
    finally:
        Q._t = orig
    assert out == {(0, 0): 2, (0, 1): 1, (1, 0): 1, (1, 1): 1}


def test_hash_score_exact_python_replay(spark):
    """hash_score with md5-derived weights must equal a pure-python
    replay EXACTLY (zero tolerance): every weight is a dyadic rational
    k/2^32, so the document sum is exact in IEEE double in any
    summation order — the property that lets the DuckDB oracle
    hash-match without rounding."""
    import hashlib

    from sgdnet_spark.operators import text as T

    docs = [(1, "the cat sat on the mat"), (2, "a b c a b a"), (3, "solo")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in T.hash_score(df, n_buckets=64, salt="t").collect()}

    def u32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    for doc_id, txt in docs:
        toks = txt.split(" ")
        want = 0.0
        for w in toks:
            j = u32(w + "tb") % 64
            want += u32(str(j) + "tw") / 4294967296.0 - 0.5
        assert out[doc_id]["n_tokens"] == len(toks)
        assert out[doc_id]["score"] == want  # exact, no tolerance


def test_hash_score_learned_weights_mode(spark):
    """weights= mode: a one-hot weight vector turns the score into the
    count of tokens hashing into that bucket."""
    import hashlib

    from sgdnet_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, "x x y"), (2, "y y y y")], "doc_id long, text string"
    )
    B = 32
    jx = int(hashlib.md5(b"xtb").hexdigest()[:8], 16) % B
    weights = [0.0] * B
    weights[jx] = 1.0
    out = {r["doc_id"]: r["score"] for r in
           T.hash_score(df, n_buckets=B, weights=weights, salt="t").collect()}
    jy = int(hashlib.md5(b"ytb").hexdigest()[:8], 16) % B
    assert out[1] == (2.0 if jy != jx else 3.0)
    assert out[2] == (0.0 if jy != jx else 4.0)
    with pytest.raises(ValueError):
        T.hash_score(df, n_buckets=B, weights=[1.0])


def test_hash_score_trains_quality_model(spark):
    """The train->score loop: hashed-TF features feed a binomial sgdnet
    fit, and scoring with the LEARNED weight vector separates the
    classes — the model-based quality-filter stage of a training
    pipeline, end to end. (Corpus is constructed: the driver testdata's
    languages share one vocabulary with near-identical frequencies, so
    nothing is learnable from its tokens by design.)"""
    import numpy as np
    from pyspark.sql import functions as F

    from sgdnet_spark.glm import sgdnet
    from sgdnet_spark.operators import text as T
    from sgdnet_spark.operators.text import hash_bucket, tokens

    B = 128
    rng = np.random.default_rng(7)
    good_vocab = [f"g{i}" for i in range(40)]
    bad_vocab = [f"b{i}" for i in range(40)]
    common = [f"c{i}" for i in range(60)]
    rows = []
    for i in range(400):
        is_good = i % 2
        marked = good_vocab if is_good else bad_vocab
        n = int(rng.integers(20, 60))
        words = [
            str(rng.choice(marked)) if rng.random() < 0.3 else str(rng.choice(common))
            for _ in range(n)
        ]
        rows.append((i, " ".join(words), is_good))
    docs = spark.createDataFrame(rows, "doc_id long, text string, is_en int")
    # hashed-TF dense feature array per doc (test-sized B; one pass)
    tf = docs.select(
        "doc_id", "is_en",
        F.aggregate(
            F.transform(tokens("text"), lambda t: hash_bucket(t, B, "t")),
            F.array_repeat(F.lit(0.0), B),
            lambda acc, j: F.transform(
                acc, lambda v, i: F.when(i == j.cast("int"), v + 1.0).otherwise(v)
            ),
        ).alias("features"),
    )
    fit = sgdnet(tf, "features", "is_en", family="binomial", alpha=0.0,
                 nlambda=1, lambdas=[0.01])
    w = fit.beta[:, 0]
    # score with the learned vector via the literal-array fast path;
    # adding the intercept turns it into the model's linear predictor
    scored = (
        T.hash_score(docs, n_buckets=B, weights=[float(x) for x in w], salt="t")
        .join(docs.select("doc_id", "is_en"), "doc_id")
        .select("is_en", (F.col("score") + float(fit.a0[0])).alias("eta"))
        .collect()
    )
    eta = np.array([r["eta"] for r in scored])
    y = np.array([r["is_en"] for r in scored])
    acc = float((((eta > 0).astype(int)) == y).mean())
    base = max(y.mean(), 1 - y.mean())
    assert acc > base + 0.05, (acc, base)


def test_zero_vector_excluded_from_cosine(spark):
    """An all-zero embedding has no direction: its cosine must be 0
    (clamped norm), never NaN — Spark orders NaN above every number, so
    a NaN cosine would pass every threshold filter and outrank every
    real neighbor."""
    from sgdnet_spark.operators import similarity as sim

    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = sim.cosine_pairs(df, threshold=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 1)}
    topk = sim.brute_force_topk(df, df.filter(F.col("vec_id") == 0), k=2).collect()
    order = [r["nbr_id"] for r in topk]
    assert order[0] == 1  # the zero vector never outranks a real neighbor
    assert all(r["cos"] == r["cos"] for r in topk)  # no NaN emitted


def test_exact_dedup_null_text_not_grouped(spark):
    """NULL-text documents (failed extractions) are nobody's duplicates:
    exact_dedup must keep every one, and exact_stats must count each as
    unique — previously md5(NULL)=NULL grouped them into ONE dup group
    and silently dropped all but one."""
    rows = [(1, "same text"), (2, "same text"), (3, None), (4, None), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in dedup.exact_dedup(df).collect())
    assert kept == [1, 3, 4, 5]
    st = dedup.exact_stats(df).first()
    assert (st["n_docs"], st["n_unique"], st["n_dup_rows"]) == (5, 4, 1)


def test_kmeans_fewer_rows_than_centroids(spark):
    """n < k clamps k to n instead of a numpy broadcast crash."""
    from sgdnet_spark.operators import ivf

    rows = [(i, [float(i), 1.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = ivf.kmeans_fit(df, k=16, iters=2)
    assert cents.shape == (5, 2)


def test_band_keys_reject_nondivisible_bands(spark):
    """bands must divide num_hashes — silent truncation of trailing
    signature rows would shift the banding S-curve unnoticed."""
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    with pytest.raises(ValueError, match="must divide"):
        dedup.band_keys(df, num_hashes=32, bands=5)


def test_hashed_features_null_text(spark):
    """NULL text featurizes as the empty document, not an
    AttributeError inside the Arrow worker."""
    from sgdnet_spark.operators import features as FT

    df = spark.createDataFrame([(1, "a b a"), (2, None)], "doc_id long, text string")
    out = FT.hashed_token_features(df, n_features=8, keep_cols=["doc_id"]).collect()
    assert len(out) == 2
    row2 = [r for r in out if r["doc_id"] == 2][0]
    assert sum(row2[f"x{j}"] for j in range(8)) == 0.0
    sp = FT.hashed_token_features_sparse(df, n_features=8, keep_cols=["doc_id"]).collect()
    assert [r for r in sp if r["doc_id"] == 2][0]["indices"] == []


def test_asof_null_time_key_never_matches(spark):
    """A right row with a NULL time key must match NOTHING (ASOF
    compares times; NULL compares to nothing). Spark sorts NULL FIRST
    ascending, so an unfiltered NULL-ts row would become the carried
    'prior' value for every left row without a real match."""
    from sgdnet_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 3, "a"), (1, 10, "b")],
                                 "u int, ts int, tag string")
    right = spark.createDataFrame([(1, None, 999), (1, 5, 100)],
                                  "u int, ts int, v int")
    out = {r["ts"]: r for r in
           asof_join(left, right, on="ts", by="u", right_cols=["v"]).collect()}
    assert len(out) == 2
    assert out[3]["v_r"] is None      # no prior real row — NOT the NULL-ts 999
    assert out[10]["v_r"] == 100


def test_wav_decode_walks_riff_chunks():
    """Real-world writers (ffmpeg, Windows) insert LIST/fact chunks
    between ``fmt `` and ``data``; the decoder must walk the chunk list
    (honouring RIFF word-alignment for odd sizes) instead of
    reinterpreting chunk metadata at byte 36 as PCM samples."""
    import struct

    from sgdnet_spark.operators import media_codec as mc

    s = (np.arange(321) % 1997 - 998).astype(np.int16)
    raw = mc.encode_wav(s, 8000)
    for payload in (b"INFOhello!", b"INFOhello"):  # even and odd sizes
        chunk = b"LIST" + struct.pack("<I", len(payload)) + payload
        chunk += b"\x00" * (len(payload) & 1)  # RIFF pad byte
        spliced = (raw[:4] + struct.pack("<I", len(raw) - 8 + len(chunk))
                   + raw[8:36] + chunk + raw[36:])
        rate, s2 = mc.decode_wav(spliced)
        assert rate == 8000 and (s2 == s).all()
    with pytest.raises(ValueError, match="no data chunk"):
        # well-formed fmt, then a chunk whose size runs past the payload
        mc.decode_wav(raw[:36] + b"LIST" + struct.pack("<I", 100) + b"xxxx")


def test_pii_detect_redact_and_engine_parity(spark):
    """PII counts/redaction behave per spec AND agree exactly between
    Spark (Java regex) and DuckDB (RE2) on boundary-adversarial
    strings — the parity the text_pii oracle depends on."""
    import duckdb

    from sgdnet_spark.operators import pii

    cases = [
        "write a.b+x%y@c-d.co today",      # 1 email
        "x@y.z",                           # tld too short: no email
        "555-123-4567, 555 123 4567, 555.123.4567",  # 3 phones
        "1.2.3.4 999.999.999.999",         # 2 syntactic ipv4
        "ssn 123-45-6789 ok",              # 1 ssn
        "pre555-123-4567post",             # no \b: no phone
        "1.2.3.4.5",                       # leftmost quad only
        "mail me@example.com or 10.0.0.1 x 123-45-678901",
        "",                                # empty string
    ]
    sdf = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                                "i int, t string")
    out = pii.redact(pii.pii_counts(sdf, "t"), "t", out_col="red")
    got = {r["i"]: r for r in out.collect()}
    assert [got[i][f"n_{k}"] for i, k in
            [(0, "email"), (1, "email"), (2, "phone"), (3, "ipv4"),
             (4, "ssn"), (5, "phone"), (6, "ipv4")]] == [1, 0, 3, 2, 1, 0, 1]
    assert got[0]["red"] == "write <pii> today"
    assert got[4]["red"] == "ssn <pii> ok"
    assert got[8]["red"] == ""
    # engine parity: identical counts AND identical redacted strings
    con = duckdb.connect()
    con.execute("CREATE TABLE c(i INT, t VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)", list(enumerate(cases)))
    sql = ("SELECT i, "
           + ", ".join(f"{pii.count_sql('t', k)} AS n_{k}" for k in pii.PII_PATTERNS)
           + f", {pii.redact_sql('t')} AS red FROM c")
    for row in con.execute(sql).fetchall():
        i, *vals = row
        cols = [f"n_{k}" for k in pii.PII_PATTERNS] + ["red"]
        assert vals == [got[i][c] for c in cols], f"engine mismatch on row {i}"


def test_pii_null_text_and_token_escaping(spark):
    """NULL text yields 0 counts (not NULL — which would escape
    `n_x == 0` clean filters) and stays NULL under redaction; a '$'
    or backslash token must neither throw (Java group-reference
    semantics) nor diverge from the DuckDB twin."""
    import duckdb

    from sgdnet_spark.operators import pii

    sdf = spark.createDataFrame([(0, None), (1, "pay a@b.co now")], "i int, t string")
    out = pii.redact(pii.pii_counts(sdf, "t"), "t", out_col="red", token="$1\\x")
    got = {r["i"]: r for r in out.collect()}
    assert got[0]["n_email"] == 0 and got[0]["red"] is None
    assert got[1]["n_email"] == 1 and got[1]["red"] == "pay $1\\x now"
    con = duckdb.connect()
    con.execute("CREATE TABLE c(i INT, t VARCHAR)")
    con.execute("INSERT INTO c VALUES (0, NULL), (1, 'pay a@b.co now')")
    sql = (f"SELECT i, {pii.count_sql('t', 'email')} AS n_email, "
           + pii.redact_sql("t", token="$1\\x") + " AS red FROM c")
    for i, n, red in con.execute(sql).fetchall():
        assert n == got[i]["n_email"]
        assert red == got[i]["red"]


def test_multimodal_zero_sample_wav_consistent():
    """A zero-sample WAV clip reports 0 frames and 0.0 content mean —
    consistent with sample_frames, which emits no rows for it (the old
    max(1, ...) reported 1 phantom frame with NaN content)."""
    from sgdnet_spark.operators import media_codec as mc
    from sgdnet_spark.operators.multimodal import decode_media

    empty = mc.encode_wav(np.array([], dtype=np.int16), 8000)
    meta = decode_media(empty)
    assert meta["n_frames"] == 0
    assert meta["content_mean"] == 0.0


def _lm_replay(docs, k=0.1, min_count=1):
    """Pure-python add-k bigram LM self-scoring replay (text.lm_score):
    per-doc (n_bigrams, avg_logp at the rpos-4 grid)."""
    import math
    from collections import Counter

    toks = {i: t.split(" ") for i, t in docs}
    toks = {i: t for i, t in toks.items() if len(t) >= 2}
    bgc, cw = Counter(), Counter()
    for t in toks.values():
        for a, b in zip(t, t[1:]):
            bgc[(a, b)] += 1
    for (a, _b), c in bgc.items():
        cw[a] += c
    v = len({w for t in toks.values() for w in t})
    out = {}
    for i, t in toks.items():
        lps = []
        for a, b in zip(t, t[1:]):
            cb = bgc[(a, b)] if bgc[(a, b)] >= min_count else 0
            lps.append(math.log((cb + k) / (cw[a] + k * v)))
        avg = sum(lps) / len(lps)
        out[i] = (len(lps), math.floor(avg * 1e4 + 0.5) / 1e4)
    return out


def test_lm_score_python_replay(spark):
    """lm_score self-scoring equals the pure-python add-k bigram LM:
    repeated bigrams score higher than hapax ones, <2-token docs drop."""
    docs = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat again and again"),
        (3, "a totally different sentence here"),
        (4, "solo"),          # 1 token -> no bigrams -> dropped
        (5, "the cat"),       # exactly one bigram
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
           for r in text.lm_score(df).collect()}
    assert got == _lm_replay(docs)
    assert 4 not in got
    # ("the","cat") appears 3x in the corpus: doc 5's single-bigram score
    # must beat doc 3's all-hapax average
    assert got[5][1] > got[3][1]


def test_lm_score_min_count_pruning_floor(spark):
    """min_count=2 prunes hapax bigrams from the model; pruned pairs
    fall to the smoothed floor ln(k/(cw+kV)) with cw still counting the
    pruned mass (denominator is pre-pruning by design)."""
    docs = [
        (1, "x y x y x y"),   # (x,y) 3x, (y,x) 2x -- both kept
        (2, "x z q z"),       # (x,z) (z,q) (q,z) hapax -> pruned
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for mc in (1, 2):
        got = {r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
               for r in text.lm_score(df, min_count=mc).collect()}
        assert got == _lm_replay(docs, min_count=mc)
    with pytest.raises(ValueError):
        text.lm_score(df, min_count=0)
    with pytest.raises(ValueError):
        text.lm_score(df, k_smooth=0.0)


def test_lm_score_single_doc_corpus(spark):
    df = spark.createDataFrame([(7, "a b a b")], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
           for r in text.lm_score(df).collect()}
    assert got == _lm_replay([(7, "a b a b")])


def test_lm_fit_once_score_twice(spark):
    """fit_lm + lm_score(model=) equals the self-scoring path on the
    training corpus, and scoring a DIFFERENT corpus routes unseen
    contexts to the -ln(V) sentinel — the train-once/score-many 100 TB
    shape (hash_score's weights= analog)."""
    import math

    train = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat again"),
        (3, "a mat on the floor"),
    ]
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    model = fit = text.fit_lm(tdf, k_smooth=0.5, min_count=1)
    self_scored = {r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
                   for r in text.lm_score(tdf, k_smooth=0.5).collect()}
    with_model = {r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
                  for r in text.lm_score(tdf, model=model).collect()}
    assert with_model == self_scored
    # broadcast off: AQE picks the strategy, values identical
    no_bcast = {r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
                for r in text.lm_score(tdf, model=fit, broadcast_model=False).collect()}
    assert no_bcast == self_scored

    # cross-corpus: "zz qq" has a context never seen in training
    score = [(10, "the cat sat"), (11, "zz qq")]
    sdf = spark.createDataFrame(score, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
          for r in text.lm_score(sdf, model=model).collect()}
    # python replay against the TRAINED model
    from collections import Counter
    k = 0.5
    toks = [t.split(" ") for _, t in train]
    bgc, cw = Counter(), Counter()
    for t in toks:
        for a, b in zip(t, t[1:]):
            bgc[(a, b)] += 1
    for (a, _b), c in bgc.items():
        cw[a] += c
    v = len({w for t in toks for w in t})
    for did, txt in score:
        t = txt.split(" ")
        lps = []
        for a, b in zip(t, t[1:]):
            if a not in cw:
                lps.append(-math.log(v))
            elif (a, b) in bgc:
                lps.append(math.log((bgc[(a, b)] + k) / (cw[a] + k * v)))
            else:
                lps.append(math.log(k / (cw[a] + k * v)))
        want = (len(lps), math.floor(sum(lps) / len(lps) * 1e4 + 0.5) / 1e4)
        assert got[did] == want


def test_shingle_prehash_tokens_identity_consumers_match(spark):
    """prehash_tokens changes gram VALUES (xxhash64 of token-hashes)
    but not gram IDENTITY: membership/intersection consumers —
    contamination counts here — produce identical output either way.
    (A/B'd and rejected for the registered decontaminate at k=4:
    docs/BENCH_NOTES.md round 8; the option stays for larger-k
    identity-only consumers.)"""
    docs = [
        (1, "a b c d e f g h"),
        (2, "a b c d x y z w"),      # shares the 4-gram "a b c d" with 1
        (3, "totally disjoint words here now"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bench = df.filter(F.col("doc_id") == 1)
    corpus = df.filter(F.col("doc_id") != 1)

    def flags(prehash):
        d = dedup.shingle_sets(corpus, k=4, prehash_tokens=prehash)
        b = dedup.shingle_sets(bench, k=4, prehash_tokens=prehash).select("shingle").distinct()
        return {(r["id"], r["n_overlap"])
                for r in d.join(F.broadcast(b), "shingle")
                          .groupBy("id").agg(F.count("*").alias("n_overlap")).collect()}

    assert flags(True) == flags(False) == {(2, 1)}


def test_line_scrub_boilerplate_removal(spark):
    """Corpus-level line dedup: a line in >= min_docs DISTINCT docs is
    removed everywhere, order preserved; within-doc repeats survive;
    blank lines drop from counts; all-boilerplate docs clean to ''."""
    hdr = "standard cookie banner"
    docs = [
        (1, f"{hdr}\nunique alpha one\nunique alpha two"),
        (2, f"{hdr}\n\n  \nunique beta"),               # blank lines dropped
        (3, f"{hdr}"),                                   # all boilerplate
        (4, "solo line\nsolo line\nother text"),         # within-doc repeat kept
        (5, None),                                       # NULL text dropped
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_lines"], r["n_dup_lines"], r["text_clean"])
           for r in dedup.line_scrub(df, min_docs=2).collect()}
    assert got[1] == (3, 1, "unique alpha one\nunique alpha two")
    assert got[2] == (2, 1, "unique beta")
    assert got[3] == (1, 1, "")
    assert got[4] == (3, 0, "solo line\nsolo line\nother text")
    assert 5 not in got
    # raising min_docs above the dup count keeps everything
    got4 = {r["doc_id"]: r["n_dup_lines"]
            for r in dedup.line_scrub(df, min_docs=4).collect()}
    assert set(got4.values()) == {0}
    with pytest.raises(ValueError):
        dedup.line_scrub(df, min_docs=1)
    # normalization drives matching: case/whitespace variants of the
    # banner still count as the same line
    df2 = spark.createDataFrame(
        [(1, "Standard   Cookie Banner\nkeep a"), (2, "standard cookie banner\nkeep b")],
        "doc_id long, text string",
    )
    got2 = {r["doc_id"]: (r["n_dup_lines"], r["text_clean"])
            for r in dedup.line_scrub(df2, min_docs=2).collect()}
    assert got2 == {1: (1, "keep a"), 2: (1, "keep b")}


def test_line_scrub_fit_once_flagged_reuse(spark):
    """fit_boilerplate + line_scrub(flagged=) equals the self-fit path
    on the training corpus, and scrubs an UNSEEN corpus against the
    fitted set (lines flagged on train are removed from new docs; new
    cross-doc dups in the scored corpus alone are NOT — the model, not
    the target, defines boilerplate)."""
    hdr = "standard cookie banner"
    train = [(1, f"{hdr}\nalpha"), (2, f"{hdr}\nbeta"), (3, "gamma\ndelta")]
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    fset = dedup.fit_boilerplate(tdf, min_docs=2)
    self_fit = {tuple(r) for r in dedup.line_scrub(tdf, min_docs=2).collect()}
    with_fit = {tuple(r) for r in dedup.line_scrub(tdf, flagged=fset).collect()}
    assert with_fit == self_fit

    score = [(10, f"{hdr}\nnovel text"), (11, "same new line\nx"),
             (12, "same new line\ny")]
    sdf = spark.createDataFrame(score, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_dup_lines"], r["text_clean"])
           for r in dedup.line_scrub(sdf, flagged=fset).collect()}
    assert got[10] == (1, "novel text")          # trained boilerplate removed
    assert got[11] == (0, "same new line\nx")    # new dup NOT in the model: kept
    assert got[12] == (0, "same new line\ny")


def test_lm_score_sentinelless_model_raises(spark):
    """A hand-built model missing the w1-NULL sentinel must FAIL LOUDLY
    on unseen contexts, not silently average only the seen bigrams
    (F.avg skips NULL while n_bigrams counts every bigram)."""
    train = [(1, "the cat sat"), (2, "the cat ran")]
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    broken = text.fit_lm(tdf).where(F.col("w1").isNotNull())  # sentinel stripped
    sdf = spark.createDataFrame([(9, "zz qq")], "doc_id long, text string")
    with pytest.raises(Exception, match="sentinel"):
        text.lm_score(sdf, model=broken).collect()
    # seen-context docs still score fine against the same broken model
    ok = text.lm_score(spark.createDataFrame([(8, "the cat")], "doc_id long, text string"),
                       model=broken).collect()
    assert len(ok) == 1


def test_lm_buckets_python_replay(spark):
    """lm_buckets == python replay: numpy 'linear' percentile matches
    F.percentile/quantile_cont; cutoffs round to the score grid; strict
    '>' puts an at-cutoff doc in the lower bucket."""
    import math

    import numpy as np

    docs = [(i, " ".join(["the cat"] * (i + 1)) + f" tail{i}") for i in range(9)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["avg_logp"], r["bucket"])
           for r in text.lm_buckets(df).collect()}
    scores = _lm_replay(docs)
    vals = np.array([scores[i][1] for i in sorted(scores)])
    c_lo = math.floor(np.percentile(vals, 100.0 / 3.0) * 1e4 + 0.5) / 1e4
    c_hi = math.floor(np.percentile(vals, 200.0 / 3.0) * 1e4 + 0.5) / 1e4
    for i, (_n, lp) in scores.items():
        want = 0 if lp > c_hi else (1 if lp > c_lo else 2)
        assert got[i] == (lp, want), f"doc {i}"
    assert {b for _, b in got.values()} == {0, 1, 2}
    with pytest.raises(ValueError):
        text.lm_buckets(df, cuts=(0.7, 0.3))


def _bpe_replay(freqs, n_merges, min_freq=2):
    """Classic BPE merge loop in python: zip-adjacent pair counts
    weighted by word freq, (count DESC, left ASC, right ASC) argmax,
    greedy-left merge apply."""
    from collections import Counter

    reps = {w: list(w) for w in freqs}
    merges = []

    def apply_one(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b); i += 2
            else:
                out.append(syms[i]); i += 1
        return out

    for rank in range(n_merges):
        pc = Counter()
        for w, f in freqs.items():
            s = reps[w]
            for x, y in zip(s, s[1:]):
                pc[(x, y)] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), c = best
        if c < min_freq:
            break
        merges.append((rank, a, b, c))
        reps = {w: apply_one(s, a, b) for w, s in reps.items()}
    return merges, reps


def test_bpe_learn_and_apply_python_replay(spark):
    """bpe_learn == the classic python merge loop (exact counts, exact
    tie-breaks, greedy-left overlap semantics: 'aaaa' + (a,a) -> 2
    tokens), and apply_bpe re-encodes text to the replay's symbols."""
    from collections import Counter

    from sgdnet_spark.operators import bpe

    docs = [
        (1, "lower lower lowest low low low"),
        (2, "newer newest new new lower"),
        (3, "aaaa aa"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    freqs = Counter(w for _, t in docs for w in t.split(" "))
    got = [(r["rank"], r["left"], r["right"], r["pair_count"])
           for r in bpe.bpe_learn(df, n_merges=8, min_freq=2).orderBy("rank").collect()]
    want, reps = _bpe_replay(freqs, 8, 2)
    assert got == want and len(got) > 0
    # the distributed per-merge path produces the IDENTICAL table (the
    # auto path collected the vocab and ran the incremental driver loop)
    dist = [(r["rank"], r["left"], r["right"], r["pair_count"])
            for r in bpe.bpe_learn(df, n_merges=8, min_freq=2,
                                   solver="distributed").orderBy("rank").collect()]
    assert dist == want
    # apply: every word re-encodes to the replay's final symbols
    # (apply_bpe accepts the already-verified merge list directly)
    enc = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe.apply_bpe(df, want).collect()}
    for did, txt in docs:
        expect = [s for w in txt.split(" ") for s in reps[w]]
        assert enc[did] == expect, f"doc {did}"
    # non-long id columns keep their type through the Arrow pass
    sdf = spark.createDataFrame([("u1", "lower low")], "url string, text string")
    srow = bpe.apply_bpe(sdf, want, id_col="url").collect()[0]
    assert srow["url"] == "u1" and srow["n_bpe"] == len(reps["lower"]) + len(reps["low"])
    with pytest.raises(ValueError):
        bpe.bpe_learn(df, n_merges=0)
    with pytest.raises(ValueError):
        bpe.bpe_learn(df, solver="magic")


def test_fuzzy_contamination_planted(spark):
    """Round 11: near-duplicate (paraphrase-level) benchmark leak is
    flagged by the LSH+exact-verify path while exact k-gram overlap at
    decontamination k misses it; unrelated docs stay clean; the fuzzy
    output equals the exhaustive corpus×bench Jaccard (recall 1.0 at
    this threshold)."""
    import pandas as pd

    from sgdnet_spark.operators import dedup

    bench_text = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the tall fence near the old red barn door"
    )
    # near-dup: one word changed mid-sentence — every 8-gram is broken,
    # but word-3-gram Jaccard stays high
    leaked = bench_text.replace("cat", "bird")
    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": [bench_text]})
    )
    corpus = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2],
        "text": [leaked, "totally unrelated text about spark and parquet files"],
    }))
    # exact decontamination at GPT-3's 13-gram setting misses the
    # paraphrase (the mid-sentence edit breaks every 13-gram window)
    assert dedup.contamination_flags(corpus, bench, k=13).count() == 0
    pairs = dedup.fuzzy_contamination_flags(
        corpus, bench, threshold=0.5, num_hashes=32, bands=8
    ).collect()
    assert {(r["id"], r["bench_id"]) for r in pairs} == {(1, 100)}
    assert all(0.5 <= r["jaccard"] <= 1.0 for r in pairs)
    # exhaustive twin: same pair set from the all-pairs exact Jaccard
    sa_c = dedup.shingle_array(corpus, "text", "doc_id", 3)
    sa_b = dedup.shingle_array(bench, "text", "doc_id", 3)
    want = set()
    bsh = {r["id"]: set(r["shingles"]) for r in sa_b.collect()}
    for r in sa_c.collect():
        for bid, bs in bsh.items():
            s = set(r["shingles"])
            j = len(s & bs) / len(s | bs) if s | bs else 0.0
            if j >= 0.5:
                want.add((r["id"], bid))
    assert {(r["id"], r["bench_id"]) for r in pairs} == want
    clean = dedup.decontaminate_fuzzy(corpus, bench, threshold=0.5)
    assert sorted(r["doc_id"] for r in clean.collect()) == [2]
    import pytest as _pt

    with _pt.raises(ValueError, match="threshold"):
        dedup.fuzzy_contamination_flags(corpus, bench, threshold=0.0)


def test_pii_cc_luhn_validation_and_parity(spark):
    """Round 11: 16-digit card shapes detect; Luhn separates valid from
    near-miss numbers (classic test vectors); redaction removes the
    shape; DuckDB replays the same extract→strip→checksum chain."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from sgdnet_spark.operators import pii

    rows = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "pay 4111-1111-1111-1111 today",        # Visa test number: valid
            "pay 4111-1111-1111-1112 today",        # last digit off: invalid
            "pay 5500 0000 0000 0004 now",          # MC test number: valid
            "digits 4111111111111111 run-on",       # no separators: valid
            "no card here 123-45-6789 only ssn",
        ],
    })
    df = spark.createDataFrame(rows)
    out = pii.cc_valid_count(pii.pii_counts(df, "text"), "text")
    got = {r["doc_id"]: (r["n_cc"], r["n_cc_valid"]) for r in out.collect()}
    assert got == {1: (1, 1), 2: (1, 0), 3: (1, 1), 4: (1, 1), 5: (0, 0)}
    # redaction removes the card shape entirely
    red = {r["doc_id"]: r["text"] for r in pii.redact(df, "text").collect()}
    for d in (1, 2, 3, 4):
        assert "4111" not in red[d] and "5500" not in red[d]
    # engine parity on the same strings
    con = duckdb.connect()
    con.register("t", rows)
    q = (f"SELECT doc_id, {pii.count_sql('text', 'cc')} AS n_cc, "
         f"{pii.cc_valid_sql('text')} AS n_cc_valid FROM t")
    want = {r[0]: (r[1], r[2]) for r in con.execute(q).fetchall()}
    assert got == want


def test_fuzzy_contamination_exploded_branch_matches(spark, monkeypatch):
    """Forcing the huge-candidate exploded-join verify (cap=0) yields
    the identical pair set/values as the broadcast-array verify — the
    minhash cap-design parity check for the fuzzy decon path."""
    import pandas as pd

    from sgdnet_spark.operators import dedup

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    bench = spark.createDataFrame(pd.DataFrame({
        "doc_id": [100, 200],
        "text": [base, base.replace("gamma", "chi").replace("tau", "psi")],
    }))
    corpus = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            base.replace("iota", "omega"),
            base.replace("alpha", "omega").replace("sigma", "phi"),
            "entirely unrelated words with nothing shared at all here",
        ],
    }))
    want = {
        (r["id"], r["bench_id"], r["jaccard"])
        for r in dedup.fuzzy_contamination_flags(corpus, bench, threshold=0.5).collect()
    }
    assert want  # the planted near-dups are found at all
    monkeypatch.setattr(dedup, "_BROADCAST_VERIFY_CAP", 0)
    got = {
        (r["id"], r["bench_id"], r["jaccard"])
        for r in dedup.fuzzy_contamination_flags(corpus, bench, threshold=0.5).collect()
    }
    assert got == want


def test_luhn_random_cross_validation(spark):
    """pii.luhn_ok vs an independent python Luhn on 200 random digit
    strings of varying length (the checksum is length-generic even
    though the card pattern pins 16)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from sgdnet_spark.operators import pii

    def py_luhn(s: str) -> bool:
        total = 0
        for i, ch in enumerate(reversed(s), start=1):
            d = ord(ch) - 48
            if i % 2 == 0:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    rng = np.random.default_rng(11)
    strs = ["".join(str(d) for d in rng.integers(0, 10, size=int(n)))
            for n in rng.integers(12, 20, size=200)]
    df = spark.createDataFrame(pd.DataFrame({"s": strs}))
    got = {r["s"]: r["ok"] for r in
           df.select("s", pii.luhn_ok(F.col("s")).alias("ok")).collect()}
    for s in strs:
        assert got[s] == py_luhn(s), s
    # both classes occur in the sample (the test discriminates)
    assert any(got.values()) and not all(got.values())


def test_fuzzy_contamination_empty_sides(spark):
    """Empty corpus or empty benchmark: typed empty flag relations, no
    crashes from empty shingle caches or zero-candidate verifies."""
    import pandas as pd

    from sgdnet_spark.operators import dedup

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1], "text": ["alpha beta gamma delta epsilon"],
    }))
    empty = docs.filter(F.lit(False))
    assert dedup.fuzzy_contamination_flags(empty, docs, threshold=0.5).count() == 0
    assert dedup.fuzzy_contamination_flags(docs, empty, threshold=0.5).count() == 0
    assert dedup.decontaminate_fuzzy(docs, empty, threshold=0.5).count() == 1


def test_containment_asymmetric_vs_jaccard(spark):
    """Round 13: a short doc quoted verbatim inside a much longer one
    scores containment 1.0 while its symmetric jaccard stays near
    |A|/|B| — the quote/subset case jaccard structurally misses. The
    skew valve composes like ngram_jaccard_pairs'."""
    from sgdnet_spark.operators import dedup

    quote = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (1, quote),                      # the short original
            (2, filler + " " + quote),       # quotes it inside 90+ tokens
            (3, "totally different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    cont = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in dedup.containment_pairs(docs, threshold=0.9).collect()
    }
    assert cont == {(1, 2): 1.0}
    jac = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert (1, 2) not in jac  # symmetric jaccard misses the inclusion
    # threshold excludes sub-threshold pairs; valve arg accepted
    few = dedup.containment_pairs(docs, threshold=0.9, max_doc_freq=0.9).collect()
    assert {(r["id_a"], r["id_b"]) for r in few} == {(1, 2)}
