"""Product quantization (IVF-PQ): code validity, exact numpy replay of
fit/encode/ADC/re-rank, recall floors vs brute force, re-rank exactness,
and degenerate-input guards."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sgdnet_spark.operators import pq, similarity
from sgdnet_spark.operators.ivf import assign_lists, kmeans_fit


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def q(emb):
    return emb.filter(F.col("vec_id") < 10)


@pytest.fixture(scope="module")
def books(emb):
    return pq.pq_fit(emb, m=8, ksub=16, iters=5)


def _np_corpus(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.asarray([r["vec_id"] for r in rows])
    V = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    return ids, V


def test_codes_bounded_and_shaped(emb, books):
    m, ksub, dsub = books.shape
    assert (m, ksub, dsub) == (8, 16, 8)
    codes = pq.pq_encode(emb, books).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r["code"]) == m
        assert all(0 <= c < ksub for c in r["code"])


def test_encode_matches_numpy_replay(emb, books):
    """Distributed encode == encode_np on the driver, row for row."""
    ids, V = _np_corpus(emb)
    expect = pq.encode_np(pq._normalize(V), books)
    got = {r["id"]: list(r["code"]) for r in pq.pq_encode(emb, books).collect()}
    for i, vid in enumerate(ids):
        assert got[int(vid)] == list(expect[i])


def test_ivfpq_full_numpy_replay(emb, q, books):
    """Given the SAME deterministic centroids + codebooks, a pure-numpy
    replay of list probing, ADC scoring, candidate top-(k·refine), and
    exact re-rank reproduces ivfpq_topk exactly — the embedding_semdedup
    replay pattern, certifying the distributed path end to end."""
    k, n_lists, nprobe, refine = 5, 8, 3, 3
    cents = kmeans_fit(emb, k=n_lists, iters=5)
    ids, V = _np_corpus(emb)
    Vn = pq._normalize(V)
    codes = pq.encode_np(Vn, books)
    lid = ((V**2).sum(1)[:, None] - 2 * V @ cents.T + (cents**2).sum(1)[None, :]).argmin(1)
    qrows = sorted(q.collect(), key=lambda r: r["vec_id"])
    expect = set()
    for r in qrows:
        qv = np.asarray(r["embedding"], dtype=np.float64)
        tab = pq.adc_tables(qv[None, :], books)[0]
        probed = np.argsort(((cents - qv) ** 2).sum(1))[:nprobe]
        mask = np.isin(lid, probed) & (ids != r["vec_id"])
        cand_ids = ids[mask]
        m = books.shape[0]
        approx = tab[codes[mask] + 16 * np.arange(m)[None, :]].sum(1)
        order = np.lexsort((cand_ids, -approx))[: k * refine]
        keep = cand_ids[order]
        sel = np.isin(ids, keep)
        cos = (V[sel] @ qv) / (
            np.linalg.norm(V[sel], axis=1) * max(np.linalg.norm(qv), 1e-300)
        )
        final = np.lexsort((ids[sel], -cos))[:k]
        for j in final:
            expect.add(
                (int(r["vec_id"]), int(ids[sel][j]), round(float(cos[j]), 4))
            )
    got = {
        (r["query_id"], r["nbr_id"], r["cos"])
        for r in pq.ivfpq_topk(
            emb, q, k_neighbors=k, n_lists=n_lists, nprobe=nprobe, refine=refine
        ).collect()
    }
    assert got == expect


def test_ivfpq_recall_floor(emb, q):
    bf = {
        (r["query_id"], r["nbr_id"])
        for r in similarity.brute_force_topk(emb, q, k=5).collect()
    }
    got = {
        (r["query_id"], r["nbr_id"])
        for r in pq.ivfpq_topk(emb, q, k_neighbors=5, n_lists=8, nprobe=3).collect()
    }
    recall = len(got & bf) / len(bf)
    assert recall >= 0.7, f"ivfpq recall@5 {recall:.3f} < 0.7"


def test_ivfpq_recall_tracks_ivf_ceiling(emb, q):
    """nprobe caps recall for BOTH ivf and ivfpq (same coarse stage);
    with the default re-rank pool the PQ ranking loses at most ~10% of
    the pairs ivf finds — quantization error stays in the candidate
    stage, never in the returned cosines."""
    from sgdnet_spark.operators.ivf import ivf_topk

    ivf_pairs = {
        (r["query_id"], r["nbr_id"])
        for r in ivf_topk(emb, q, k_neighbors=5, n_lists=8, nprobe=3).collect()
    }
    pqp = {
        (r["query_id"], r["nbr_id"])
        for r in pq.ivfpq_topk(emb, q, k_neighbors=5, n_lists=8, nprobe=3).collect()
    }
    assert len(pqp & ivf_pairs) / len(ivf_pairs) >= 0.8


def test_rerank_cos_is_exact(emb, q):
    """Returned cos values are TRUE cosines (the re-rank touches real
    vectors), so any pair also found by brute force carries the
    identical rounded value."""
    bf = {
        (r["query_id"], r["nbr_id"]): r["cos"]
        for r in similarity.brute_force_topk(emb, q, k=5).collect()
    }
    for r in pq.ivfpq_topk(emb, q, k_neighbors=5, n_lists=8, nprobe=3).collect():
        key = (r["query_id"], r["nbr_id"])
        if key in bf:
            assert r["cos"] == bf[key]


def test_dim_not_divisible_raises(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_fit(emb, m=7, ksub=16, iters=1)


def test_null_vectors_skipped(spark):
    df = spark.createDataFrame(
        [(0, [1.0] * 8), (1, None), (2, [0.5] * 8), (3, [-1.0] * 8)],
        "vec_id long, embedding array<float>",
    )
    books = pq.pq_fit(df, m=2, ksub=2, iters=2)
    codes = pq.pq_encode(df, books).collect()
    assert sorted(r["id"] for r in codes) == [0, 2, 3]


def test_empty_queries(emb, books):
    empty = emb.filter(F.col("vec_id") < 0)
    out = pq.ivfpq_topk(emb, empty, k_neighbors=5)
    assert out.count() == 0


def test_pq_index_prunes_partitions_and_matches_inmemory(spark, emb, q, tmp_path):
    """write_pq_index → list-partitioned codes; the probe's ADC scan
    carries PartitionFilters on list_id (pruning enforced by the plan,
    on the COMPRESSED relation) and results match the in-memory
    ivfpq_topk at the same settings (both paths are deterministic)."""
    path = str(tmp_path / "pq_index")
    pq.write_pq_index(emb, path, n_lists=8, m=8, ksub=16, kmeans_iters=5)
    got, pruned = pq.pq_topk_indexed(spark, path, q, k_neighbors=5, nprobe=3)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan
    mem = pq.ivfpq_topk(emb, q, k_neighbors=5, n_lists=8, nprobe=3, kmeans_iters=5)
    a = {(r["query_id"], r["nbr_id"], r["cos"]) for r in got.collect()}
    b = {(r["query_id"], r["nbr_id"], r["cos"]) for r in mem.collect()}
    assert a == b


def test_pq_index_roundtrips_codebooks(spark, emb, books, tmp_path):
    path = str(tmp_path / "pq_rt")
    cents, wrote = pq.write_pq_index(emb, path, n_lists=4, m=8, ksub=16, kmeans_iters=2)
    loaded = pq.load_codebooks(spark, path)
    assert np.allclose(wrote, loaded)


def test_pq_indexed_empty_queries(spark, emb, tmp_path):
    path = str(tmp_path / "pq_empty")
    pq.write_pq_index(emb, path, n_lists=4, kmeans_iters=2)
    got, pruned = pq.pq_topk_indexed(spark, path, emb.filter(F.lit(False)), k_neighbors=3)
    assert got.count() == 0
    assert pruned.count() == 0


def test_train_frac_subsample_recall_and_validation(spark, emb, q):
    """Quantizers trained on a deterministic half-sample still clear
    the recall floor (training is statistics estimation — the 100 TB
    knob); the sample is md5-deterministic so results are reproducible;
    out-of-range fractions are rejected."""
    bf = {
        (r["query_id"], r["nbr_id"])
        for r in similarity.brute_force_topk(emb, q, k=5).collect()
    }
    a = pq.ivfpq_topk(emb, q, k_neighbors=5, n_lists=8, nprobe=3, train_frac=0.5)
    got = {(r["query_id"], r["nbr_id"]) for r in a.collect()}
    assert len(got & bf) / len(bf) >= 0.6
    b = pq.ivfpq_topk(emb, q, k_neighbors=5, n_lists=8, nprobe=3, train_frac=0.5)
    assert {tuple(r) for r in b.collect()} == {
        tuple(r) for r in a.collect()
    }
    with pytest.raises(ValueError, match="train_frac"):
        pq.ivfpq_topk(emb, q, train_frac=0.0)
    # > 1 is an error, not silent full-corpus training; exactly 1.0 is
    # the explicit full-corpus form
    with pytest.raises(ValueError, match="train_frac"):
        pq.ivfpq_topk(emb, q, train_frac=5)
    assert pq._train_frame(emb, 1.0, "vec_id") is emb


def test_append_pq_index_matches_rebuild(spark, emb, q, tmp_path):
    """Build the index from half the corpus, append the other half:
    searches over the appended index equal a full build that used the
    SAME quantizers (train on the first half in both cases) — append
    changes WHERE rows land, never how they are encoded."""
    lo = emb.filter(F.col("vec_id") < 250)
    hi = emb.filter(F.col("vec_id") >= 250)
    p_inc = str(tmp_path / "pq_inc")
    pq.write_pq_index(lo, p_inc, n_lists=8, kmeans_iters=5)
    pq.append_pq_index(spark, p_inc, hi)
    got, _ = pq.pq_topk_indexed(spark, p_inc, q, k_neighbors=5, nprobe=3)

    # full rebuild with quantizers trained on the SAME subset (lo):
    from sgdnet_spark.operators.ivf import kmeans_fit

    cents = kmeans_fit(lo, k=8, iters=5)
    books = pq.pq_fit(lo, m=8, ksub=16, iters=5)
    coded = pq._assign_encode(emb, cents, books, "embedding", "vec_id")
    probes, _ = pq._probe_frame(
        spark, pq._collect_queries(q, "embedding", "vec_id"), cents, books, 3
    )
    cands = pq._adc_candidates(coded, probes, 8, 16, 50)
    from sgdnet_spark.operators.ivf import _vec_frame

    want = pq._exact_rerank(
        _vec_frame(emb, "embedding", "vec_id"),
        cands,
        pq._collect_queries(q, "embedding", "vec_id"),
        5,
    )
    a = {(r["query_id"], r["nbr_id"], r["cos"]) for r in got.collect()}
    b = {(r["query_id"], r["nbr_id"], r["cos"]) for r in want.collect()}
    assert a == b
    # appended vectors are actually searchable
    assert any(n >= 250 for _, n, _ in a)


# --- round 11: distributed query path + metadata-filtered probing ---


def _wide_queries(emb, n_rep: int):
    """n_rep replicas of the embeddings table with offset ids — a large
    query relation (replica 0 keeps real ids, so self-exclusion is
    exercised too)."""
    parts = [
        emb.select(
            (F.col("vec_id") + F.lit(500 * i)).alias("vec_id"), "embedding"
        )
        for i in range(n_rep)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def test_distributed_query_path_matches_driver(emb, monkeypatch):
    """>=10k queries: the distributed branch (executor-side probe
    relations, no full query collect) returns rows BIT-IDENTICAL to the
    driver branch, and the driver probe builder is never invoked."""
    big_q = _wide_queries(emb, 20)  # 10,000 queries
    assert big_q.count() == 10_000
    kw = dict(k_neighbors=5, n_lists=8, nprobe=3, refine=2, kmeans_iters=2)
    want = pq.ivfpq_topk(emb, big_q, max_inline_queries=20_000, **kw)
    a = {(r["query_id"], r["nbr_id"], r["cos"]) for r in want.collect()}

    calls = {"driver_probe": 0}
    real = pq._probe_frame

    def spy(*args, **kwargs):
        calls["driver_probe"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(pq, "_probe_frame", spy)
    got = pq.ivfpq_topk(emb, big_q, max_inline_queries=64, **kw)
    b = {(r["query_id"], r["nbr_id"], r["cos"]) for r in got.collect()}
    assert calls["driver_probe"] == 0  # large branch never probes driver-side
    assert a == b
    assert len({qid for qid, _, _ in b}) == 10_000  # every query answered


def test_indexed_distributed_branch_matches_and_prunes(spark, emb, tmp_path):
    """The written-index probe's distributed branch: same rows as the
    driver branch, and the codes scan still partition-prunes on
    list_id (the probed-list collect is bounded by n_lists, never by
    query count)."""
    path = str(tmp_path / "pq_dist")
    pq.write_pq_index(emb, path, n_lists=8, kmeans_iters=2)
    q_all = emb  # 500 queries > max_inline default
    want, _ = pq.pq_topk_indexed(
        spark, path, q_all, k_neighbors=5, nprobe=3, max_inline_queries=1000
    )
    got, pruned = pq.pq_topk_indexed(
        spark, path, q_all, k_neighbors=5, nprobe=3, max_inline_queries=64
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan
    a = {(r["query_id"], r["nbr_id"], r["cos"]) for r in want.collect()}
    b = {(r["query_id"], r["nbr_id"], r["cos"]) for r in got.collect()}
    assert a == b


def test_filtered_probe_pushdown_matches_bruteforce(spark, emb, q, tmp_path):
    """Metadata-filtered retrieval: where= pushes into the codes AND
    vectors parquet scans (PushedFilters next to the list_id partition
    pruning) and — with nprobe=n_lists and a pool wider than the
    survivor set — results EQUAL brute force over the post-filtered
    corpus."""
    path = str(tmp_path / "pq_meta")
    pq.write_pq_index(emb, path, n_lists=4, kmeans_iters=2, meta_cols=["label"])
    got, codes = pq.pq_topk_indexed(
        spark, path, q, k_neighbors=5, nprobe=4, refine=120, where="label = 1"
    )
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan
    assert "PushedFilters" in plan and "label" in plan
    surv = emb.filter(F.col("label") == 1)
    want = similarity.brute_force_topk(surv, q, k=5)
    a = {(r["query_id"], r["nbr_id"], r["cos"]) for r in got.collect()}
    b = {(r["query_id"], r["nbr_id"], r["cos"]) for r in want.collect()}
    assert a == b
    # every returned neighbor actually satisfies the predicate
    lab1 = {r["vec_id"] for r in surv.select("vec_id").collect()}
    assert all(n in lab1 for _, n, _ in a)


def test_append_meta_schema_enforced(spark, emb, tmp_path):
    """Appending to a meta-carrying index without the meta column is an
    error (silent omission would make appended rows vanish from every
    filtered probe); with the column present, filtered probes see the
    appended rows."""
    lo = emb.filter(F.col("vec_id") < 250)
    hi = emb.filter(F.col("vec_id") >= 250)
    path = str(tmp_path / "pq_meta_app")
    pq.write_pq_index(lo, path, n_lists=4, kmeans_iters=2, meta_cols=["label"])
    with pytest.raises(ValueError, match="meta columns"):
        pq.append_pq_index(spark, path, hi.drop("label"))
    pq.append_pq_index(spark, path, hi)
    q = emb.filter(F.col("vec_id") < 5)
    got, _ = pq.pq_topk_indexed(
        spark, path, q, k_neighbors=5, nprobe=4, refine=120, where="label = 1"
    )
    assert any(r["nbr_id"] >= 250 for r in got.collect())


def test_truncated_collect_with_nulls_takes_distributed_path(spark, emb):
    """Branch decision uses the RAW bounded-collect count: a query set
    just over the inline cap whose first rows carry NULL vectors must
    NOT be silently truncated onto the driver path — the distributed
    branch answers every non-NULL query; an all-NULL set yields a
    well-typed empty result (indexed path included)."""
    n = emb.count()
    nulls = emb.select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.lit(None).cast("array<float>").alias("embedding"),
    ).limit(60)
    real = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding")
    mixed = nulls.unionByName(real)  # 70 rows > max_inline=64, 10 usable
    got = pq.ivfpq_topk(
        emb, mixed, k_neighbors=3, n_lists=4, kmeans_iters=2, max_inline_queries=64
    )
    rows = got.collect()
    assert {r["query_id"] for r in rows} == set(range(10))
    all_null = nulls.unionByName(nulls).limit(70)
    assert pq.ivfpq_topk(
        emb, all_null, k_neighbors=3, n_lists=4, kmeans_iters=2, max_inline_queries=64
    ).count() == 0


def test_indexed_all_null_truncated_queries_empty(spark, emb, tmp_path):
    path = str(tmp_path / "pq_nulls")
    pq.write_pq_index(emb, path, n_lists=4, kmeans_iters=2)
    nulls = emb.select(
        "vec_id", F.lit(None).cast("array<float>").alias("embedding")
    ).limit(70)
    got, pruned = pq.pq_topk_indexed(
        spark, path, nulls, k_neighbors=3, max_inline_queries=64
    )
    assert got.count() == 0 and pruned.count() == 0


def test_compact_pq_index_preserves_results(spark, sf_dir, tmp_path):
    """Round 12: compaction rewrites codes/vectors to one file per list
    partition and changes NOTHING about probe results; partition
    pruning still applies to the compacted layout."""
    import glob

    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "pq_cmp")
    lo = emb.filter(F.col("vec_id") % 2 == 0)
    hi = emb.filter(F.col("vec_id") % 2 == 1)
    pq.write_pq_index(lo, idx, n_lists=8, kmeans_iters=3)
    pq.append_pq_index(spark, idx, hi)
    queries = emb.filter(F.col("vec_id") < 5)
    before_df, _ = pq.pq_topk_indexed(spark, idx, queries, k_neighbors=5, nprobe=3)
    before = {tuple(r) for r in before_df.collect()}
    c_before, v_before = pq.compact_pq_index(spark, idx)
    after_df, pruned = pq.pq_topk_indexed(spark, idx, queries, k_neighbors=5, nprobe=3)
    assert {tuple(r) for r in after_df.collect()} == before and len(before) == 25
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan
    c_after = len(glob.glob(f"{idx}/codes/**/*.parquet", recursive=True))
    v_after = len(glob.glob(f"{idx}/vectors/**/*.parquet", recursive=True))
    assert c_after < c_before and v_after < v_before


def test_kmeans_pq_fit_bit_identical_to_standalone(spark, sf_dir):
    """Round 12: the fused trainer (one pass per Lloyd iteration for
    BOTH quantizers) returns BIT-identical models to the standalone
    kmeans_fit + pq_fit pair — the golden-constant contract."""
    import numpy as np

    from sgdnet_spark.operators.ivf import kmeans_fit

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents_f, books_f = pq.kmeans_pq_fit(emb, k=8, m=8, ksub=16, iters=5)
    cents_s = kmeans_fit(emb, k=8, iters=5)
    books_s = pq.pq_fit(emb, m=8, ksub=16, iters=5)
    assert np.array_equal(cents_f, cents_s)
    assert np.array_equal(books_f, books_s)
    # asymmetric iteration counts exercise the per-quantizer freeze:
    # k=1 converges immediately (single mean), PQ keeps training
    cents_f1, books_f1 = pq.kmeans_pq_fit(emb, k=1, m=8, ksub=16, iters=4)
    assert np.array_equal(cents_f1, kmeans_fit(emb, k=1, iters=4))
    assert np.array_equal(books_f1, pq.pq_fit(emb, m=8, ksub=16, iters=4))


def test_ivfpq_topk_model_reuse_matches_training(spark, sf_dir):
    """ivfpq_topk(model=...) with the fused trainer's pair returns
    exactly what the self-training call returns; ivf_topk(cents=...)
    likewise."""
    from pyspark.sql import functions as F

    from sgdnet_spark.operators.ivf import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    cents, books = pq.kmeans_pq_fit(emb, k=8, m=8, ksub=16, iters=5)
    a = {tuple(r) for r in pq.ivfpq_topk(
        emb, q, k_neighbors=5, n_lists=8, nprobe=3, refine=2).collect()}
    b = {tuple(r) for r in pq.ivfpq_topk(
        emb, q, k_neighbors=5, nprobe=3, refine=2, model=(cents, books)).collect()}
    assert a == b and len(a) == 25
    c = {tuple(r) for r in ivf_topk(emb, q, k_neighbors=5, n_lists=8, nprobe=3).collect()}
    d = {tuple(r) for r in ivf_topk(emb, q, k_neighbors=5, nprobe=3, cents=cents).collect()}
    assert c == d and len(c) == 25


def test_residual_ivfpq_numpy_replay(spark):
    """Round 12: the residual (FAISS by_residual) chain — normalized
    coarse fit, residual codebooks, residual encode, biased ADC, exact
    re-rank — is reproduced EXACTLY by a pure-numpy replay."""
    import numpy as np
    from pyspark.sql import functions as F

    from sgdnet_spark.operators.ivf import kmeans_fit

    rng = np.random.default_rng(7)
    V = rng.normal(size=(80, 16))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") < 4)
    k, m, ksub, nprobe, kn, refine = 4, 4, 8, 2, 3, 2
    got = {
        (r["query_id"], r["nbr_id"]): r["cos"]
        for r in pq.ivfpq_topk(
            emb, q, k_neighbors=kn, n_lists=k, nprobe=nprobe, m=m, ksub=ksub,
            refine=refine, residual=True,
        ).collect()
    }
    # --- numpy replay ---
    cents = kmeans_fit(emb, k=k, iters=5, normalize=True)
    books = pq.pq_fit_residual(emb, cents, m=m, ksub=ksub, iters=5)
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
    d2 = (Vn**2).sum(1)[:, None] - 2 * Vn @ cents.T + (cents**2).sum(1)[None, :]
    lists = d2.argmin(1)
    codes = pq.encode_np(Vn - cents[lists], books)
    Q = V[:4]
    tabs = pq.adc_tables(Q, books)
    Qn = Vn[:4]
    want = {}
    for qi in range(4):
        dq = ((cents - Qn[qi]) ** 2).sum(1)
        probed = set(np.argsort(dq)[:nprobe])
        bias_vec = Qn[qi] @ cents.T
        cand = []
        for j in range(80):
            if lists[j] in probed and j != qi:
                approx = bias_vec[lists[j]] + sum(
                    tabs[qi][s * ksub + codes[j, s]] for s in range(m)
                )
                cand.append((j, approx))
        cand.sort(key=lambda t: (-t[1], t[0]))
        pool = [j for j, _ in cand[: kn * refine]]
        exact = sorted(
            (
                (
                    j,
                    float(
                        V[j] @ Q[qi]
                        / (
                            max(np.linalg.norm(V[j]), 1e-300)
                            * max(np.linalg.norm(Q[qi]), 1e-300)
                        )
                    ),
                )
                for j in pool
            ),
            key=lambda t: (-t[1], t[0]),
        )[:kn]
        for j, c in exact:
            want[(qi, j)] = round(c, 4)
    assert got == want and len(got) == 4 * kn


def test_residual_two_path_and_indexed_roundtrip(spark, sf_dir, tmp_path):
    """Residual mode: the distributed query branch equals the inline
    branch bit-for-bit; a residual-written index probes identically to
    the in-memory call, the meta flag round-trips, appends keep the
    residual encoding, and PqStreamServer serves it."""
    from pyspark.sql import functions as F

    from sgdnet_spark.streaming.ann_stream import PqStreamServer

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 100)  # > max_inline_queries=64
    kw = dict(k_neighbors=5, n_lists=8, nprobe=3, refine=2)
    dist = pq.ivfpq_topk(emb, q, residual=True, **kw)
    inline = pq.ivfpq_topk(emb, q, residual=True, max_inline_queries=200, **kw)
    a = {tuple(r) for r in dist.collect()}
    assert a == {tuple(r) for r in inline.collect()} and len(a) == 500

    idx = str(tmp_path / "pq_res")
    lo = emb.filter(F.col("vec_id") % 2 == 0)
    hi = emb.filter(F.col("vec_id") % 2 == 1)
    pq.write_pq_index(lo, idx, n_lists=8, kmeans_iters=5, residual=True)
    assert pq._load_residual_flag(spark, idx) is True
    pq.append_pq_index(spark, idx, hi)
    full = str(tmp_path / "pq_res_full")
    pq.write_pq_index(emb, full, n_lists=8, kmeans_iters=5, residual=True)
    q5 = emb.filter(F.col("vec_id") < 5)
    gi, pruned = pq.pq_topk_indexed(spark, idx, q5, k_neighbors=5, nprobe=3)
    # append half trained on HALF the corpus - compare against a probe
    # of the same index, not the full rebuild (quantizers differ); the
    # invariant is the appended rows are served with residual encoding
    got = gi.collect()
    assert len(got) == 25 and any(r["nbr_id"] % 2 == 1 for r in got)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # streaming server picks the flag up once and matches the batch probe
    srv = PqStreamServer(spark, idx, k_neighbors=5, nprobe=3)
    assert srv._residual is True
    assert {tuple(r) for r in srv.probe(q5).collect()} == {tuple(r) for r in got}


def test_residual_recall_floors(spark, sf_dir):
    """Residual encoding buys candidate recall at the same code budget
    (deterministic data + seeds -> pinned floors; plain's floor pinned
    alongside so a regression in either shows up)."""
    from pyspark.sql import functions as F

    from sgdnet_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    exact = {(r["query_id"], r["nbr_id"])
             for r in similarity.brute_force_topk(emb, q, k=5).collect()}
    rec = {}
    for res in (False, True):
        got = {(r["query_id"], r["nbr_id"]) for r in pq.ivfpq_topk(
            emb, q, k_neighbors=5, n_lists=8, nprobe=3, refine=2, residual=res
        ).collect()}
        rec[res] = len(got & exact) / len(exact)
    assert rec[False] >= 0.40 and rec[True] >= 0.42
    assert rec[True] >= rec[False]


def test_delete_from_pq_index_matches_rebuild(spark, emb, q, tmp_path):
    """Round 13: delete == an index holding only the surviving rows
    under the SAME quantizers (both indexes train on the identical lo
    subset — training is deterministic — so the comparison isolates
    membership). Idempotent; compaction physically drops the rows from
    both relations and clears the tombstones with results unchanged."""
    import glob
    import os

    lo = emb.filter(F.col("vec_id") < 250)
    hi = emb.filter(F.col("vec_id") >= 250)
    p_del = str(tmp_path / "pq_del")
    p_ref = str(tmp_path / "pq_del_ref")
    pq.write_pq_index(lo, p_del, n_lists=8, kmeans_iters=5)
    pq.append_pq_index(spark, p_del, hi)
    # delete ids that actually APPEAR in pre-delete results, so the
    # comparison exercises candidate masking, not a vacuous no-op
    pre, _ = pq.pq_topk_indexed(spark, p_del, q, k_neighbors=5, nprobe=8)
    dead = sorted({r["nbr_id"] for r in pre.collect() if r["nbr_id"] >= 250})[:3]
    assert len(dead) == 3
    pq.write_pq_index(lo, p_ref, n_lists=8, kmeans_iters=5)
    pq.append_pq_index(spark, p_ref, hi.filter(~F.col("vec_id").isin(dead)))
    assert pq.delete_from_pq_index(spark, p_del, dead) == 3
    got, _ = pq.pq_topk_indexed(spark, p_del, q, k_neighbors=5, nprobe=8)
    want, _ = pq.pq_topk_indexed(spark, p_ref, q, k_neighbors=5, nprobe=8)
    want = {tuple(r) for r in want.collect()}
    assert {tuple(r) for r in got.collect()} == want
    assert not any(r[1] in dead for r in want)

    # idempotent: re-delete and unknown ids are no-ops
    assert pq.delete_from_pq_index(spark, p_del, [dead[0], 10**9]) == 0
    # compaction drops rows physically and clears the tombstone set
    pq.compact_pq_index(spark, p_del)
    assert not os.path.exists(f"{p_del}/tombstones")
    left = {r["id"] for r in spark.read.parquet(f"{p_del}/codes").collect()}
    leftv = {r["id"] for r in spark.read.parquet(f"{p_del}/vectors").collect()}
    assert left.isdisjoint(dead) and leftv.isdisjoint(dead)
    got2, _ = pq.pq_topk_indexed(spark, p_del, q, k_neighbors=5, nprobe=8)
    assert {tuple(r) for r in got2.collect()} == want
    assert len(glob.glob(f"{p_del}/codes/**/*.parquet", recursive=True)) <= 8


def test_pq_delete_then_append_guard(spark, emb, tmp_path):
    """Re-adding a tombstoned id would resurrect its old rows — append
    refuses until compaction clears the tombstones, then works."""
    path = str(tmp_path / "pq_readd")
    pq.write_pq_index(emb.filter("vec_id < 300"), path, n_lists=8, kmeans_iters=3)
    pq.delete_from_pq_index(spark, path, [100])
    with pytest.raises(ValueError, match="re-adds deleted"):
        pq.append_pq_index(spark, path, emb.filter("vec_id = 100"))
    pq.compact_pq_index(spark, path)
    pq.append_pq_index(spark, path, emb.filter("vec_id = 100"))
    # probe with a FRESH query id carrying vector 100's embedding (the
    # candidate stage excludes id == query_id): the re-added row wins
    q1 = emb.filter("vec_id = 100").select(
        F.lit(999_999).alias("vec_id"), "embedding"
    )
    got, _ = pq.pq_topk_indexed(spark, path, q1, k_neighbors=1, nprobe=8)
    rows = got.collect()
    assert rows and rows[0]["nbr_id"] == 100 and rows[0]["cos"] > 0.999


def test_pq_streaming_server_sees_deletes_immediately(spark, emb, q, tmp_path):
    """PqStreamServer reads tombstones per probe, so deletions mask
    immediately without a refresh (quantizers are unaffected by
    membership edits)."""
    from sgdnet_spark.streaming.ann_stream import PqStreamServer

    path = str(tmp_path / "pq_del_stream")
    pq.write_pq_index(emb, path, n_lists=8, kmeans_iters=3)
    server = PqStreamServer(spark, path, k_neighbors=5, nprobe=8)
    dead = [3, 4]
    pq.delete_from_pq_index(spark, path, dead)
    server.respond(q, batch_id=0)
    assert server.results and not any(r["nbr_id"] in dead for r in server.results)
    batch, _ = pq.pq_topk_indexed(spark, path, q, k_neighbors=5, nprobe=8)
    assert {tuple(r) for r in server.results} == {tuple(r) for r in batch.collect()}


def test_opq_rotation_properties(emb):
    """Round 13: the OPQ rotation is orthogonal (pure rotation — dot
    products, hence cosines, preserved exactly), deterministic across
    partitionings, and allocates dim/m eigen-directions per subspace."""
    rot = pq.opq_fit_rotation(emb, m=8)
    assert rot.shape == (64, 64)
    assert np.allclose(rot @ rot.T, np.eye(64), atol=1e-10)
    rot2 = pq.opq_fit_rotation(emb.repartition(7), m=8)
    assert np.allclose(rot, rot2, atol=1e-8)
    with pytest.raises(ValueError, match="not divisible"):
        pq.opq_fit_rotation(emb, m=5)


def test_opq_ivfpq_numpy_replay(spark):
    """Round 13: the OPQ chain — moments-pass rotation fit (eigenvalue
    allocation), rotated coarse + PQ fits, rotated assignment/encode,
    rotated-query ADC, ORIGINAL-space exact re-rank — is reproduced
    exactly by a pure-numpy replay (the residual replay's pattern with
    the rotation stage prepended)."""
    import numpy as np
    from pyspark.sql import functions as F

    from sgdnet_spark.operators.ivf import kmeans_fit

    rng = np.random.default_rng(11)
    V = rng.normal(size=(80, 16))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") < 4)
    k, m, ksub, nprobe, kn, refine = 4, 4, 8, 2, 3, 2

    # --- rotation fit replay: uncentered second moment of the
    # normalized vectors, eigh, sign fix, greedy eigenvalue allocation
    rot = pq.opq_fit_rotation(emb, m=m)
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
    lam, vec = np.linalg.eigh(Vn.T @ Vn / len(Vn))
    order = np.argsort(lam)[::-1]
    lam, vec = lam[order], vec[:, order]
    for j in range(16):
        i = int(np.argmax(np.abs(vec[:, j])))
        if vec[i, j] < 0:
            vec[:, j] = -vec[:, j]
    alloc = pq._alloc_eigendims(lam, m)
    want_rot = vec[:, np.concatenate(alloc)].T
    assert np.allclose(rot, want_rot, atol=1e-8)
    assert np.allclose(rot @ rot.T, np.eye(16), atol=1e-10)

    got = {
        (r["query_id"], r["nbr_id"]): r["cos"]
        for r in pq.ivfpq_topk(
            emb, q, k_neighbors=kn, n_lists=k, nprobe=nprobe, m=m, ksub=ksub,
            refine=refine, opq=True, rotation=rot,
        ).collect()
    }
    # --- downstream replay in the rotated space (models from the same
    # distributed fits ivfpq_topk(opq=True) runs)
    emb_rot = pq._rotated_frame(emb, rot, "embedding", "vec_id")
    cents, books = pq.kmeans_pq_fit(emb_rot, k=k, m=m, ksub=ksub, iters=5,
                                    vec_col="v", id_col="id")
    R = V @ rot.T  # corpus rotation (gemm — matches _assign_encode)
    d2 = (R**2).sum(1)[:, None] - 2 * R @ cents.T + (cents**2).sum(1)[None, :]
    lists = d2.argmin(1)
    Rn = R / np.maximum(np.linalg.norm(R, axis=1, keepdims=True), 1e-300)
    codes = pq.encode_np(Rn, books)
    Q = np.stack([rot @ V[i] for i in range(4)])  # per-row gemv — _rotate_rows
    tabs = pq.adc_tables(Q, books)
    want = {}
    for qi in range(4):
        dq = ((cents - Q[qi]) ** 2).sum(1)
        probed = set(np.argsort(dq)[:nprobe])
        cand = []
        for j in range(80):
            if lists[j] in probed and j != qi:
                approx = sum(tabs[qi][s * ksub + codes[j, s]] for s in range(m))
                cand.append((j, approx))
        cand.sort(key=lambda t: (-t[1], t[0]))
        pool = [j for j, _ in cand[: kn * refine]]
        # exact re-rank in the ORIGINAL space — rotation never touches
        # the returned cosines
        exact = sorted(
            (
                (
                    j,
                    float(
                        V[j] @ V[qi]
                        / (
                            max(np.linalg.norm(V[j]), 1e-300)
                            * max(np.linalg.norm(V[qi]), 1e-300)
                        )
                    ),
                )
                for j in pool
            ),
            key=lambda t: (-t[1], t[0]),
        )[:kn]
        for j, c in exact:
            want[(qi, j)] = round(c, 4)
    assert got == want and len(got) == 4 * kn


def test_opq_two_path_and_indexed_roundtrip(spark, sf_dir, tmp_path):
    """OPQ mode: distributed query branch equals the inline branch
    bit-for-bit; an opq-written index probes identically to the
    in-memory call, the rotation round-trips, appends encode with the
    stored rotation, and PqStreamServer serves it (loading the
    rotation once)."""
    from pyspark.sql import functions as F

    from sgdnet_spark.streaming.ann_stream import PqStreamServer

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 100)  # > max_inline_queries=64
    kw = dict(k_neighbors=5, n_lists=8, nprobe=3, refine=2)
    rot = pq.opq_fit_rotation(emb, m=8)
    dist = pq.ivfpq_topk(emb, q, opq=True, rotation=rot, **kw)
    inline = pq.ivfpq_topk(emb, q, opq=True, rotation=rot,
                           max_inline_queries=200, **kw)
    a = {tuple(r) for r in dist.collect()}
    assert a == {tuple(r) for r in inline.collect()} and len(a) == 500

    idx = str(tmp_path / "pq_opq")
    lo = emb.filter(F.col("vec_id") % 2 == 0)
    hi = emb.filter(F.col("vec_id") % 2 == 1)
    pq.write_pq_index(lo, idx, n_lists=8, kmeans_iters=5, opq=True)
    stored = pq._load_rotation(spark, idx)
    assert stored is not None and np.allclose(stored @ stored.T, np.eye(64), atol=1e-10)
    pq.append_pq_index(spark, idx, hi)
    qs = emb.filter(F.col("vec_id") < 10)
    got, _ = pq.pq_topk_indexed(spark, idx, qs, k_neighbors=5, nprobe=3)
    # rebuild-with-same-quantizers twin: train on lo (deterministic),
    # encode everything — the append==rebuild precedent under OPQ
    full = str(tmp_path / "pq_opq_full")
    pq.write_pq_index(lo, full, n_lists=8, kmeans_iters=5, opq=True)
    pq.append_pq_index(spark, full, hi)
    server = PqStreamServer(spark, idx, k_neighbors=5, nprobe=3)
    server.respond(qs, batch_id=0)
    assert {tuple(r) for r in server.results} == {tuple(r) for r in got.collect()}
    # plain (non-opq) index has no rotation relation
    plain = str(tmp_path / "pq_plain13")
    pq.write_pq_index(lo, plain, n_lists=8, kmeans_iters=3)
    assert pq._load_rotation(spark, plain) is None


def test_pq_rebuild_clears_stale_sidecars(spark, emb, q, tmp_path):
    """Round 13 (review): rebuilding an index at the same path must not
    inherit the previous build's rotation or tombstones — a stale
    rotation would rotate queries against unrotated quantizers (silent
    recall collapse), stale tombstones would mask re-indexed ids."""
    path = str(tmp_path / "pq_rebuild")
    pq.write_pq_index(emb, path, n_lists=8, kmeans_iters=3, opq=True)
    pq.delete_from_pq_index(spark, path, [0, 1])
    assert pq._load_rotation(spark, path) is not None
    # rebuild PLAIN: rotation and tombstones must both be gone
    pq.write_pq_index(emb, path, n_lists=8, kmeans_iters=3)
    assert pq._load_rotation(spark, path) is None
    assert pq._read_tombstones(spark, path) is None
    got, _ = pq.pq_topk_indexed(spark, path, q, k_neighbors=5, nprobe=3)
    mem = pq.ivfpq_topk(emb, q, k_neighbors=5, n_lists=8, nprobe=3, kmeans_iters=3)
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in mem.collect()}


def test_ivfpq_rotation_without_opq_rejected(emb, q):
    """Round 13 (review): rotation= with neither model= nor opq=True
    would train unrotated quantizers and probe rotated — refuse."""
    import numpy as np

    with pytest.raises(ValueError, match="requires opq=True"):
        pq.ivfpq_topk(emb, q, k_neighbors=5, rotation=np.eye(64))


def test_pq_delete_by_meta_predicate(spark, emb, q, tmp_path):
    """Round 13: predicate deletion on the PQ tier == explicit ids."""
    labeled = emb.withColumn("odd", (F.col("vec_id") % 2 == 1).cast("boolean"))
    a = str(tmp_path / "pq_delpred_a")
    b = str(tmp_path / "pq_delpred_b")
    pq.write_pq_index(labeled, a, n_lists=8, kmeans_iters=3, meta_cols=["odd"])
    pq.write_pq_index(labeled, b, n_lists=8, kmeans_iters=3, meta_cols=["odd"])
    dead = [r["vec_id"] for r in labeled.filter("odd AND vec_id < 50").collect()]
    assert pq.delete_from_pq_index(spark, a, "odd AND id < 50") == len(dead)
    assert pq.delete_from_pq_index(spark, b, dead) == len(dead)
    ra, _ = pq.pq_topk_indexed(spark, a, q, k_neighbors=5, nprobe=8)
    rb, _ = pq.pq_topk_indexed(spark, b, q, k_neighbors=5, nprobe=8)
    assert {tuple(r) for r in ra.collect()} == {tuple(r) for r in rb.collect()}
