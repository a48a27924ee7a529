"""End-to-end training-data pipeline: every tier composes.

One chain over the real documents table — exact dedup -> near-dup
removal -> benchmark decontamination -> Gopher repetition filter ->
model-based quality scoring -> stratified sampling -> train/val/test
split -> sharded sequence packing -> a GLM fit on the surviving
corpus's hashed features. Each stage is DataFrame-in/DataFrame-out, so
the whole pipeline is ONE lazy plan per action; this test pins that
the stages agree on schemas/ids and that each tier actually removes or
labels what it should.
"""

import pytest
from pyspark.sql import functions as F

from sgdnet_spark.operators import bpe, dedup, qprobe, sampling, text


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_full_training_data_pipeline(spark, corpus):
    n0 = corpus.count()

    # 1. exact dedup (md5-canonical, min-id representative)
    stage1 = dedup.exact_dedup(corpus)
    n1 = stage1.count()
    assert n1 <= n0

    # 2. near-dup removal on the MinHash+LSH scale path: drop the
    # higher id of every verified pair
    pairs = dedup.minhash_lsh_pairs(stage1, threshold=0.6)
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    stage2 = stage1.join(drop, "doc_id", "left_anti")
    n2 = stage2.count()
    assert n2 <= n1

    # 3. decontamination against a held-out benchmark split
    bench = corpus.filter(F.col("doc_id") % 17 == 0)
    stage3 = dedup.decontaminate(stage2.filter(F.col("doc_id") % 17 != 0), bench, k=5)
    n3 = stage3.count()
    assert n3 <= n2

    # 4. repetition filter (Gopher-style): drop boilerplate/looping docs
    rep = text.repetition_stats(stage3)
    ok_ids = rep.filter(
        (F.col("top_token_frac") < 0.2) & (F.col("dup_bigram_frac") < 0.5)
    ).select("doc_id")
    stage4 = stage3.join(ok_ids, "doc_id", "left_semi")
    n4 = stage4.count()
    assert 0 < n4 <= n3

    # 5. model-based quality scoring joins on cleanly
    scored = text.hash_score(stage4, n_buckets=512).select("doc_id", "score")
    stage5 = stage4.join(scored, "doc_id")
    assert stage5.count() == n4

    # 6-7. stratified sample + split assignment (deterministic, id-keyed)
    fr = {lang: 0.8 for lang in ("en", "de", "fr", "es", "zh")}
    sampled = sampling.stratified_sample(stage5, "lang", fr)
    split = sampling.split_assign(sampled, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"]

    # 8. sharded sequence packing of the train split
    train = split.filter(F.col("split") == "train").withColumn(
        "n_tok", F.size(text.tokens("text")).cast("bigint")
    )
    packed = sampling.pack_sequences(train, budget=256, tokens_col="n_tok",
                                     n_shards=4)
    # every surviving doc is placed exactly once, offsets within budget
    assert packed.count() == train.count()
    assert packed.filter((F.col("chunk_offset") < 0) | (F.col("chunk_offset") >= 256)).count() == 0

    # 9. the cleaned corpus feeds the GLM engine (hashed features)
    from sgdnet_spark.glm import sgdnet
    from sgdnet_spark.operators.features import hashed_token_features_sparse

    feats = hashed_token_features_sparse(
        train.limit(200), n_features=64, keep_cols=["doc_id", "n_tok"]
    ).withColumn("y", (F.col("n_tok") > 50).cast("double"))
    from sgdnet_spark.glm.sparse import sgdnet_sparse

    fit = sgdnet_sparse(feats, "indices", "values", "y", p=64,
                        family="gaussian", nlambda=3)
    assert fit.nlambda == 3


def test_scrub_tier_composition(spark, sf_dir, corpus):
    """Round-8/9/10 scrub tier composed as ONE flow (what a real
    pipeline runs): line_scrub -> scrub_spans -> lm_buckets head/middle
    gate -> trained quality-probe gate -> DSIR selection -> BPE ->
    pack_sequences. Asserts the cross-stage
    invariants: ids only ever shrink (no row loss outside intended
    drops), the composition is deterministic, and the selection is
    partitioning-independent."""
    from sgdnet_spark.operators import dsir
    from sgdnet_spark.queries import _lined_documents

    meta = corpus.select("doc_id", "lang", "source")

    def run_chain(lined):
        # 1. boilerplate line removal (CCNet stage)
        s1 = dedup.line_scrub(lined, min_docs=2).select(
            "doc_id", F.col("text_clean").alias("text")
        )
        # 2. repeated-span removal (ExactSubstr stage)
        s2 = dedup.scrub_spans(s1, k=24, mod_p=1).select(
            "doc_id", F.col("text_clean").alias("text"), "n_cut_chars"
        )
        # 3. perplexity gate: keep CCNet head/middle buckets
        buckets = text.lm_buckets(s2)
        gate = buckets.filter(F.col("bucket") <= 1).select("doc_id")
        s3 = s2.join(gate, "doc_id", "left_semi")
        # 3b. TRAINED quality gate (round-10 qprobe): fit the ridge
        # linear probe on the perplexity-gated corpus against the
        # in-target-language weak label, keep the top 70% by grid
        # score — the GPT-3/CCNet classifier stage between the LM
        # filter and data selection
        qsel = qprobe.quality_probe(
            s3.join(meta.select("doc_id", "lang"), "doc_id"),
            select_frac=0.7,
        )
        s3q = s3.join(
            qsel.filter(F.col("selected") == 1).select("doc_id"),
            "doc_id", "left_semi",
        )
        # 4. DSIR selection toward the English slice
        tgt = s3q.join(meta.filter(F.col("lang") == "en"), "doc_id", "left_semi")
        lr = dsir.fit_dsir(tgt, s3q, n_buckets=256)
        sel = dsir.dsir_resample(s3q, lr, k=100)
        # 5. subword tokenization (round-10: the last unexercised
        # cross-tier handoff): learn BPE merges on the gated corpus,
        # apply them to the selected docs, and pack on the TRAINED
        # subword counts instead of whitespace token counts
        merges = bpe.bpe_learn(s3q, n_merges=30)
        toks = bpe.apply_bpe(sel.join(s3q, "doc_id"), merges).select(
            "doc_id", F.col("n_bpe").cast("bigint").alias("n_tok")
        )
        # 6. pack the selected docs into sharded token streams
        packed = sampling.pack_sequences(
            sel.join(s3q, "doc_id").join(meta, "doc_id").join(toks, "doc_id"),
            budget=256, tokens_col="n_tok", n_shards=2,
        )
        return s1, s2, s3, s3q, sel, merges, packed

    lined = _lined_documents(spark, sf_dir)
    s1, s2, s3, s3q, sel, merges, packed = run_chain(lined)

    # the merge table is real (found repeated pairs) and apply_bpe's
    # counts drive the packing: token totals must be positive for every
    # packed doc (a doc with text always has >= 1 subword)
    assert merges.count() > 0
    assert packed.filter(F.col("n_tokens") <= 0).count() == 0

    ids0 = {r[0] for r in lined.select("doc_id").collect()}
    ids1 = {r[0] for r in s1.select("doc_id").collect()}
    ids2 = {r[0] for r in s2.select("doc_id").collect()}
    ids3 = {r[0] for r in s3.select("doc_id").collect()}
    ids3q = {r[0] for r in s3q.select("doc_id").collect()}
    sel_ids = {r[0] for r in sel.select("doc_id").collect()}
    # ids only shrink, and each stage's drop is the intended one
    assert ids1 <= ids0          # line_scrub drops only all-boilerplate docs
    assert ids2 == ids1          # span removal never drops a document
    assert ids3 <= ids2          # the bucket gate drops tail-bucket docs
    assert len(ids3) > 0 and len(ids3) < len(ids2)  # gate actually gates
    assert ids3q <= ids3         # the quality probe keeps a subset
    assert 0 < len(ids3q) < len(ids3)  # ~top 70% by grid cutoff
    assert sel_ids <= ids3q and len(sel_ids) == 100
    # scrubbing only removes characters
    assert s2.filter(F.col("n_cut_chars") < 0).count() == 0
    # packing places every selected doc exactly once, offsets in budget
    assert packed.count() == 100
    assert packed.filter(
        (F.col("chunk_offset") < 0) | (F.col("chunk_offset") >= 256)
    ).count() == 0

    # determinism + partitioning-independence: the same chain over a
    # differently-partitioned input selects the same docs with the same
    # keys and packs them identically
    _, _, _, _, sel_b, _, packed_b = run_chain(lined.repartition(7))
    a = {tuple(r) for r in sel.collect()}
    b = {tuple(r) for r in sel_b.collect()}
    assert a == b
    pa = {tuple(r) for r in packed.select(
        "doc_id", "chunk_first", "chunk_offset", "chunk_last").collect()}
    pb = {tuple(r) for r in packed_b.select(
        "doc_id", "chunk_first", "chunk_offset", "chunk_last").collect()}
    assert pa == pb


def test_embedding_tier_composition(spark, sf_dir):
    """The EMBEDDING tier composes end to end: PCA-whiten the vectors
    (fit once), cluster-balance IN WHITENED SPACE (k-means on whitened
    vectors is Mahalanobis clustering of the originals), run SemDeDup
    inside the balanced subset, and ANN-search the survivors with
    IVF-PQ. Pins schema/id agreement across stages, that each stage
    only shrinks the id universe, and that the chain is deterministic
    under repartitioning."""
    import numpy as np

    from sgdnet_spark.operators import pq, similarity, whiten
    from sgdnet_spark.operators import sampling as S
    from sgdnet_spark.operators.ivf import kmeans_fit

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n0 = emb.count()

    # 1. whiten (fit once; decorrelated, unit-variance components)
    mu, Wm, lam = whiten.fit_whitener(emb)
    white = whiten.whiten(emb, mu, Wm).select(
        F.col("id").alias("vec_id"), F.col("w").alias("embedding")
    )
    assert white.count() == n0

    # 2. cluster-balance in whitened space
    cents = kmeans_fit(white, k=8, iters=3)
    decisions, rates = S.cluster_balance(white, cents=cents)
    kept_ids = {r["id"] for r in decisions.filter(F.col("kept") == 1).collect()}
    assert 0 < len(kept_ids) <= n0

    # 3. SemDeDup within the balanced subset (original vectors — the
    #    dedup criterion is raw cosine; the subset join is id-keyed)
    subset = emb.join(
        decisions.filter(F.col("kept") == 1).select(F.col("id").alias("vec_id")),
        "vec_id",
    )
    sd = similarity.semdedup(subset, eps=0.55, k_clusters=4, iters=2)
    survivors = {r["vec_id"] for r in sd.filter(F.col("kept") == 1).collect()}
    assert survivors <= kept_ids and len(survivors) > 0

    # 4. IVF-PQ ANN over the surviving corpus
    surv = emb.join(
        sd.filter(F.col("kept") == 1).select("vec_id"), "vec_id"
    )
    q = surv.limit(5)
    nn = pq.ivfpq_topk(surv, q, k_neighbors=3, n_lists=4, nprobe=2, kmeans_iters=2)
    rows = nn.collect()
    assert len(rows) > 0
    ids_in = {r["nbr_id"] for r in rows} | {r["query_id"] for r in rows}
    assert ids_in <= survivors

    # 5. determinism: the keep set is partitioning-independent
    d2, _ = S.cluster_balance(
        whiten.whiten(emb.repartition(7), mu, Wm).select(
            F.col("id").alias("vec_id"), F.col("w").alias("embedding")
        ),
        cents=cents,
    )
    kept2 = {r["id"] for r in d2.filter(F.col("kept") == 1).collect()}
    assert kept2 == kept_ids
