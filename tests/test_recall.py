"""Quantified recall floors for every approximate operator, measured
against its exact twin on the driver testdata (VERDICT r1 item 9:
'the three approximate operators carry no driver-verifiable
correctness signal' — these floors are that signal).

Empirical values at the defaults (sf0.001/sf0.01 embeddings, top-5
cosine ≈ 0.26-0.49 — a deliberately hard mid-similarity regime):
lsh ≈ 0.88-0.92, ivf ≈ 0.86-0.88, minhash = 1.0 (exact), simhash r=8
catches ≈ 0.96 of jaccard ≥ 0.7 pairs. Floors leave margin for seed
drift but would catch any structural regression (e.g. the r1
single-table LSH scored 0.0 here)."""

import pytest
from pyspark.sql import functions as F

from sgdnet_spark.operators import dedup, similarity
from sgdnet_spark.operators.ivf import ivf_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def bf_pairs(emb):
    q = emb.filter(F.col("vec_id") < 10)
    return {
        (r["query_id"], r["nbr_id"])
        for r in similarity.brute_force_topk(emb, q, k=5).collect()
    }


def test_ann_lsh_recall_floor(emb, bf_pairs):
    q = emb.filter(F.col("vec_id") < 10)
    got = {
        (r["query_id"], r["nbr_id"])
        for r in similarity.lsh_topk(emb, q, k=5).collect()
    }
    recall = len(got & bf_pairs) / len(bf_pairs)
    assert recall >= 0.7, f"lsh recall@5 {recall:.3f} < 0.7"


def test_ann_ivf_recall_floor(emb, bf_pairs):
    q = emb.filter(F.col("vec_id") < 10)
    got = {
        (r["query_id"], r["nbr_id"])
        for r in ivf_topk(emb, q, k_neighbors=5, n_lists=8, nprobe=3).collect()
    }
    recall = len(got & bf_pairs) / len(bf_pairs)
    assert recall >= 0.7, f"ivf recall@5 {recall:.3f} < 0.7"


def test_minhash_recall_exact(spark, sf_dir):
    """At tau=0.5 with the default signature/banding, MinHash+LSH
    returns EXACTLY the exhaustive jaccard pairs (candidates are
    verified, so precision is 1 by construction; this pins recall=1 —
    the property the corpus_clean/dedup_components oracles rely on)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    jac = {(r["id_a"], r["id_b"]) for r in dedup.ngram_jaccard_pairs(docs, 0.5).collect()}
    mh = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_pairs(docs, 0.5).collect()}
    assert mh == jac


def test_simhash_pair_recall_floor(spark, sf_dir):
    """simhash(r=8) must catch nearly all strongly-similar pairs
    (jaccard >= 0.7); with (r+1)-block pigeonhole blocking the radius
    guarantee is exact, so misses can only come from the simhash
    measure itself."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    jac7 = {(r["id_a"], r["id_b"]) for r in dedup.ngram_jaccard_pairs(docs, 0.7).collect()}
    sh = {(r["id_a"], r["id_b"]) for r in dedup.simhash_pairs(docs, max_hamming=8).collect()}
    recall = len(sh & jac7) / max(len(jac7), 1)
    assert recall >= 0.85, f"simhash pair recall {recall:.3f} < 0.85"


def test_simhash_blocking_radius_guarantee(spark, sf_dir):
    """Blocking must not lose ANY pair within the radius: compare the
    blocked result against an explicit all-pairs hamming filter."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    blocked = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.simhash_pairs(docs, max_hamming=8).collect()
    }
    # exhaustive twin: same simhash, no blocking
    from sgdnet_spark.operators.text import tokens

    t = tokens("text")
    th = F.transform(t, lambda w: F.xxhash64(w))
    ntok = F.size(t)
    bits = []
    for b in range(64):
        ones = F.aggregate(
            th, F.lit(0), lambda acc, h: acc + F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("int")
        )
        bits.append(F.when(ones * 2 >= ntok, F.lit(1)).otherwise(F.lit(0)).cast("bigint"))
    sim = bits[0]
    for b in range(1, 64):
        sim = sim + F.shiftleft(bits[b], b)
    sh = docs.select(F.col("doc_id").alias("id"), sim.alias("h"))
    allp = (
        sh.alias("a").join(sh.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.h").bitwiseXOR(F.col("b.h"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 8)
    )
    exact = {(r["id_a"], r["id_b"], r["hamming"]) for r in allp.collect()}
    assert blocked == exact


def test_embedding_lsh_pairs_recall_exact(spark, sf_dir):
    """The bucketed embedding near-dup path must find EXACTLY the pairs
    the all-pairs cosine join finds at this threshold (exact rerank =>
    precision 1.0; this asserts recall 1.0 at the test scale)."""
    from sgdnet_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {(r["id_a"], r["id_b"]) for r in similarity.cosine_pairs(emb, 0.45).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in similarity.cosine_pairs_lsh(emb, 0.45).collect()}
    assert lsh == exact
    assert len(exact) > 0


def test_lsh_topk_two_path_identical(spark, sf_dir):
    """Round 12: lsh_topk's large-query branch (no broadcast hints,
    AQE-chosen joins) returns exactly what the small/broadcast branch
    returns — the same plan modulo hints."""
    from pyspark.sql import functions as F

    from sgdnet_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 100)  # > default max_inline_queries
    a = {tuple(r) for r in similarity.lsh_topk(emb, q, k=5).collect()}
    b = {tuple(r) for r in similarity.lsh_topk(
        emb, q, k=5, max_inline_queries=500).collect()}
    assert a == b and len(a) > 0


def test_opq_residual_recall_floor_above_residual(emb, bf_pairs):
    """Round 13: at EQUAL bits (same m, ksub) and an intentionally
    tight candidate pool (refine=3, where selection quality shows), the
    OPQ-rotated residual variant recalls strictly more of the exact
    top-5 than plain residual — the rotation balances per-subspace
    variance so the same code bytes quantize tighter (Ge et al. 2013).
    Every fit here is deterministic, so these are pins, not statistics.
    The floor (≥ 0.55 vs residual's measured 0.48) leaves margin while
    still catching a structural regression in the rotation chain."""
    from sgdnet_spark.operators import pq

    q = emb.filter(F.col("vec_id") < 10)
    kw = dict(k_neighbors=5, n_lists=8, nprobe=3, refine=3)
    res = {
        (r["query_id"], r["nbr_id"])
        for r in pq.ivfpq_topk(emb, q, residual=True, **kw).collect()
    }
    opq = {
        (r["query_id"], r["nbr_id"])
        for r in pq.ivfpq_topk(emb, q, residual=True, opq=True, **kw).collect()
    }
    r_res = len(res & bf_pairs) / len(bf_pairs)
    r_opq = len(opq & bf_pairs) / len(bf_pairs)
    assert r_opq > r_res, f"opq+residual {r_opq:.3f} <= residual {r_res:.3f}"
    assert r_opq >= 0.55, f"opq+residual recall@5 {r_opq:.3f} < 0.55"
