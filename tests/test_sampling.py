"""Deterministic sampling / splitting / corpus mixing
(operators/sampling.py) — the training-data-pipeline tier.

Checked properties: determinism and partitioning-independence (the
keep/split decision is a pure function of the id), statistical
closeness of realized rates to the requested ones, disjointness /
exhaustiveness of splits, budget attainment, and the corpus-mixing
share rule (one source saturates at rate 1, shares match targets).
"""

import numpy as np
import pandas as pd
import pytest

from sgdnet_spark.operators import sampling as S


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(77)
    n = 6000
    pdf = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": rng.choice(["en", "de", "fr"], size=n, p=[0.6, 0.25, 0.15]),
        "n_chars": rng.integers(50, 500, size=n).astype(np.int64),
    })
    return spark.createDataFrame(pdf), pdf


def test_stratified_fractions_and_determinism(docs):
    df, _ = docs
    fr = {"en": 0.5, "de": 0.2}  # fr absent -> dropped
    out = S.stratified_sample(df, "lang", fr)
    counts = {r["lang"]: r["c"] for r in out.groupBy("lang").count().withColumnRenamed("count", "c").collect()}
    tot = {r["lang"]: r["c"] for r in df.groupBy("lang").count().withColumnRenamed("count", "c").collect()}
    assert "fr" not in counts
    for k, f in fr.items():
        assert abs(counts[k] / tot[k] - f) < 0.05, (k, counts[k] / tot[k])
    # same ids selected regardless of partitioning
    ids1 = sorted(r[0] for r in out.select("doc_id").collect())
    ids2 = sorted(r[0] for r in S.stratified_sample(df.repartition(17), "lang", fr).select("doc_id").collect())
    assert ids1 == ids2


def test_split_assign_partition_and_exhaustive(docs):
    df, pdf = docs
    out = S.split_assign(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["c"] for r in out.groupBy("split").count().withColumnRenamed("count", "c").collect()}
    n = len(pdf)
    assert sum(counts.values()) == n  # exhaustive (every row gets a split)
    assert abs(counts["train"] / n - 0.8) < 0.03
    assert abs(counts["val"] / n - 0.1) < 0.02
    assert abs(counts["test"] / n - 0.1) < 0.02
    # independent draw from stratified sampling (different salt)
    both = S.stratified_sample(out, "lang", {"en": 0.5})
    sub = {r["split"]: r["c"] for r in both.groupBy("split").count().withColumnRenamed("count", "c").collect()}
    assert abs(sub["train"] / sum(sub.values()) - 0.8) < 0.05


def test_sample_to_budget(docs):
    df, pdf = docs
    total = int(pdf.n_chars.sum())
    budget = total / 4
    out, rate = S.sample_to_budget(df, budget)
    assert abs(rate - 0.25) < 1e-12
    got = out.agg({"n_chars": "sum"}).first()[0]
    assert abs(got - budget) / budget < 0.07
    # budget above total: everything kept
    all_out, r1 = S.sample_to_budget(df, total * 2)
    assert r1 == 1.0
    assert all_out.count() == len(pdf)


def test_mix_corpora_shares(docs):
    df, pdf = docs
    w = {"en": 0.3, "de": 0.35, "fr": 0.35}
    out, rates = S.mix_corpora(df, "lang", w)
    # the scarcest source relative to its target saturates at rate 1
    assert max(rates.values()) <= 1.0 + 1e-12
    assert any(abs(r - 1.0) < 1e-12 for r in rates.values())
    got = {r["lang"]: r["s"] for r in out.groupBy("lang").agg({"n_chars": "sum"}).withColumnRenamed("sum(n_chars)", "s").collect()}
    tot = sum(got.values())
    for k, ww in w.items():
        assert abs(got[k] / tot - ww) < 0.05, (k, got[k] / tot)


def test_hash_fraction_uniformity(docs):
    df, _ = docs
    import pyspark.sql.functions as F

    m = df.select(S.hash_fraction("doc_id", "u").alias("u")).agg(
        F.avg("u").alias("m"), F.min("u").alias("lo"), F.max("u").alias("hi")
    ).first()
    assert abs(m["m"] - 0.5) < 0.02
    assert m["lo"] >= 0.0 and m["hi"] < 1.0


def test_mix_corpora_null_and_zero_weight_sources(docs):
    import pyspark.sql.functions as F

    df, _ = docs
    # 'fr' rows exist but every weight is NULL -> source treated as absent
    d = df.withColumn(
        "n_chars", F.when(F.col("lang") == "fr", F.lit(None)).otherwise(F.col("n_chars"))
    )
    # default: an infeasible mixture (positively-weighted source with no
    # usable rows) raises rather than silently returning 100% 'en'
    with pytest.raises(ValueError, match="positive mixture weight"):
        S.mix_corpora(d, "lang", {"en": 0.5, "fr": 0.5})
    # explicit opt-in to mixing over the present sources only
    out, rates = S.mix_corpora(d, "lang", {"en": 0.5, "fr": 0.5}, on_missing="skip")
    assert "fr" not in rates
    assert out.filter(F.col("lang") == "fr").count() == 0
    assert out.count() > 0


def test_pack_sequences_stream_invariants(spark):
    # 3 sources x uneven token counts; replay the concat-and-chunk rule
    # in plain python and require exact agreement, plus the structural
    # invariants any packing must satisfy.
    rng = np.random.default_rng(5)
    n = 400
    pdf = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": rng.choice(["a", "b", "c"], size=n),
        "n_tok": rng.integers(1, 90, size=n).astype(np.int64),
    })
    B = 64
    out = (
        S.pack_sequences(spark.createDataFrame(pdf).repartition(7), B, "n_tok")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # python replay
    for src, grp in pdf.groupby("source"):
        grp = grp.sort_values("doc_id")
        start = 0
        for _, row in grp.iterrows():
            got = out[out.doc_id == row.doc_id].iloc[0]
            assert got.chunk_first == start // B
            assert got.chunk_offset == start % B
            assert got.chunk_last == (start + row.n_tok - 1) // B
            assert got.chunks_spanned == got.chunk_last - got.chunk_first + 1
            start += row.n_tok
    # invariants: offsets in [0, B); docs tile the stream with no gaps
    assert ((out.chunk_offset >= 0) & (out.chunk_offset < B)).all()
    for src, grp in out.groupby("source"):
        g = grp.sort_values("doc_id")
        pos = (g.chunk_first * B + g.chunk_offset).to_numpy()
        assert (pos[1:] == pos[:-1] + g.n_tokens.to_numpy()[:-1]).all()


def test_pack_sequences_partitioning_independent(spark):
    pdf = pd.DataFrame({
        "doc_id": np.arange(100, dtype=np.int64),
        "source": ["s"] * 100,
        "n_tok": np.full(100, 10, dtype=np.int64),
    })
    a = S.pack_sequences(spark.createDataFrame(pdf).coalesce(1), 32, "n_tok").toPandas()
    b = S.pack_sequences(spark.createDataFrame(pdf).repartition(13), 32, "n_tok").toPandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # constant 10-token docs into 32-token chunks: doc k starts at 10k
    assert (a.chunk_first == (a.doc_id * 10) // 32).all()
    assert (a.chunks_spanned <= 2).all()


def test_pack_sequences_sharded(spark):
    """n_shards parallelizes packing WITHIN a source: shard assignment is
    a deterministic hash of the id, every (source, shard) stream packs on
    its own running sum, and packing one shard's rows alone reproduces
    the identical placement (shards are independent token streams)."""
    import pyspark.sql.functions as F

    rng = np.random.default_rng(11)
    n = 600
    pdf = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": rng.choice(["a", "b"], size=n),
        "n_tok": rng.integers(1, 50, size=n).astype(np.int64),
    })
    B, K = 64, 4
    out = (
        S.pack_sequences(spark.createDataFrame(pdf).repartition(9), B, "n_tok",
                         n_shards=K)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    # shard column present, in range, and covers >1 shard per source
    assert set(out.columns) >= {"shard", "chunk_first", "chunk_offset"}
    assert out.shard.between(0, K - 1).all()
    assert out.groupby("source").shard.nunique().min() > 1
    # physical-partitioning independence (same rows, different layout)
    out2 = (
        S.pack_sequences(spark.createDataFrame(pdf).coalesce(1), B, "n_tok",
                         n_shards=K)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)
    # per-(source, shard) streams tile with no gaps from offset 0
    for (_, _), grp in out.groupby(["source", "shard"]):
        g = grp.sort_values("doc_id")
        pos = (g.chunk_first * B + g.chunk_offset).to_numpy()
        assert pos[0] == 0
        assert (pos[1:] == pos[:-1] + g.n_tokens.to_numpy()[:-1]).all()
    # shard independence: packing shard 0's subset alone is identical
    sub_ids = out[out.shard == 0].doc_id.to_numpy()
    sub_pdf = pdf[pdf.doc_id.isin(sub_ids)]
    sub = (
        S.pack_sequences(spark.createDataFrame(sub_pdf), B, "n_tok", n_shards=K)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = out[out.shard == 0].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(sub, want)


def test_split_assign_empty_weights_raises(docs):
    df, _ = docs
    with pytest.raises(ValueError, match="at least one split"):
        S.split_assign(df, {})


def test_pack_sequences_zero_token_doc_invariants(spark):
    """A zero-token document sitting EXACTLY on a chunk boundary must
    still satisfy chunk_last >= chunk_first (spanning its start chunk),
    like a zero-token doc anywhere else — the bare (start + n - 1) DIV b
    formula lands one chunk early there and yields chunks_spanned 0."""
    rows = [(0, "s", 128), (1, "s", 0), (2, "s", 10), (3, "s", 0)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n long")
    out = {r["doc_id"]: r for r in
           S.pack_sequences(df, budget=128, tokens_col="n").collect()}
    b = {d: (r["chunk_first"], r["chunk_last"], r["chunks_spanned"])
         for d, r in out.items()}
    assert b[1] == (1, 1, 1)   # boundary empty doc: pinned to chunk 1
    assert b[3] == (1, 1, 1)   # mid-chunk empty doc: same invariant
    for d, (first, last, span) in b.items():
        assert last >= first and span == last - first + 1 and span >= 1


# --- cluster_balance: mix_corpora's rule keyed on k-means clusters ---


def _md5_fraction(v, salt: str) -> float:
    import hashlib

    h = hashlib.md5((str(v) + salt).encode()).hexdigest()
    return int(h[:8], 16) / float(1 << 32)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_cluster_balance_python_replay(emb):
    """Given the SAME deterministic centroids (kmeans_fit), a pure
    python replay of assignment -> counts -> scarcest-cluster rates ->
    md5-fraction keep decisions reproduces cluster_balance exactly."""
    from sgdnet_spark.operators.ivf import kmeans_fit

    cents = kmeans_fit(emb, k=8, iters=3)
    out, rates = S.cluster_balance(emb, cents=cents)
    rows = emb.orderBy("vec_id").collect()
    ids = np.asarray([r["vec_id"] for r in rows])
    V = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    a = ((V**2).sum(1)[:, None] - 2 * V @ cents.T + (cents**2).sum(1)[None, :]).argmin(1)
    counts = {int(c): int((a == c).sum()) for c in np.unique(a)}
    k = len(counts)
    T = min(n / (1.0 / k) for n in counts.values())
    want_rates = {c: (1.0 / k) * T / n for c, n in counts.items()}
    assert set(rates) == set(want_rates)
    for c in rates:
        assert abs(rates[c] - want_rates[c]) < 1e-12
    want = {
        (int(i), int(c), int(_md5_fraction(i, "cbal") < want_rates[int(c)]))
        for i, c in zip(ids, a)
    }
    got = {(r["id"], r["cluster"], r["kept"]) for r in out.collect()}
    assert got == want


def test_cluster_balance_shares_and_decision_form(emb):
    """Every input vector gets a decision row; kept counts are roughly
    equal across clusters (uniform target), and the scarcest cluster
    keeps everything (rate 1)."""
    out, rates = S.cluster_balance(emb, k_clusters=8, iters=3)
    rows = out.collect()
    assert len(rows) == emb.count()
    assert any(abs(r - 1.0) < 1e-12 for r in rates.values())
    kept = {}
    for r in rows:
        kept[r["cluster"]] = kept.get(r["cluster"], 0) + r["kept"]
    lo, hi = min(kept.values()), max(kept.values())
    # binomial noise around a common expected count; generous bound
    assert hi <= 2.5 * max(lo, 1), kept


def test_cluster_balance_partitioning_independent(emb):
    from sgdnet_spark.operators.ivf import kmeans_fit

    cents = kmeans_fit(emb, k=8, iters=3)
    a, _ = S.cluster_balance(emb, cents=cents)
    b, _ = S.cluster_balance(emb.repartition(7), cents=cents)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_cluster_balance_explicit_shares_infeasible(emb):
    """An explicit share on a cluster id that does not exist follows
    mix_corpora's on_missing='error' contract."""
    from sgdnet_spark.operators.ivf import kmeans_fit

    cents = kmeans_fit(emb, k=4, iters=2)
    with pytest.raises(ValueError, match="positive mixture weight"):
        S.cluster_balance(emb, cents=cents, shares={0: 0.5, 99: 0.5})


def test_cluster_balance_fit_once_reuse(emb):
    """cents= reuses a fitted quantizer: same centroids -> identical
    decisions (fit-once / balance-many)."""
    from sgdnet_spark.operators.ivf import kmeans_fit

    cents = kmeans_fit(emb, k=8, iters=3)
    a, ra = S.cluster_balance(emb, cents=cents)
    b, rb = S.cluster_balance(emb, cents=cents)
    assert ra == rb
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_cluster_balance_streaming_twin(spark, sf_dir, tmp_path, emb):
    """Fit batch-side (cents + rates are tiny), balance a STREAM of the
    same vectors: with cents= and rates= given the call is assignment
    (a stateless Arrow map) + a pure keep expression, so it runs
    unchanged under Structured Streaming. Streamed decisions == batch."""
    import shutil

    from sgdnet_spark.operators.ivf import kmeans_fit

    cents = kmeans_fit(emb, k=8, iters=3)
    batch, rates = S.cluster_balance(emb, cents=cents)
    want = {tuple(r) for r in batch.collect()}

    stage = tmp_path / "emb_stream"
    stage.mkdir()
    shutil.copy(f"{sf_dir}/embeddings.parquet", stage / "embeddings.parquet")
    stream = spark.readStream.schema(emb.schema).format("parquet").load(str(stage))
    scored, _ = S.cluster_balance(stream, cents=cents, rates=rates)
    q = (
        scored.writeStream.outputMode("append")
        .format("memory")
        .queryName("cbal_s")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM cbal_s").collect()}
    assert got == want and len(got) > 0


def test_cluster_balance_rates_without_cents_raises(emb):
    with pytest.raises(ValueError, match="requires cents"):
        S.cluster_balance(emb, rates={0: 1.0})


def test_temperature_mix_flattens_shares(spark, docs):
    """alpha<1 upsamples the tail relative to the head: the kept
    corpus' share RATIO head/tail shrinks vs natural; alpha=1
    reproduces natural shares (every rate equal); rates replay in
    python; out-of-range alpha rejected."""
    from pyspark.sql import functions as F

    from sgdnet_spark.operators import sampling as S

    df, _ = docs
    d = df.select("doc_id", "lang", "n_chars")
    nat = {r["lang"]: r["t"] for r in
           d.groupBy("lang").agg(F.sum("n_chars").alias("t")).collect()}
    tot = sum(nat.values())
    mixed, rates = S.temperature_mix(d, "lang", alpha=0.3)
    # python replay of the rate algebra
    w = {s: (t / tot) ** 0.3 for s, t in nat.items()}
    T = min(nat[s] / w[s] for s in w)
    want = {s: w[s] * T / nat[s] for s in w}
    assert rates == want
    kept = {r["lang"]: r["t"] for r in
            mixed.groupBy("lang").agg(F.sum("n_chars").alias("t")).collect()}
    head = max(nat, key=nat.get)
    tail = min(nat, key=nat.get)
    if nat[head] > nat[tail]:  # guard: degenerate equal-share corpora
        assert kept[head] / kept[tail] < nat[head] / nat[tail]
    # alpha=1: natural shares -> every rate identical (=T/tot)
    _, r1 = S.temperature_mix(d, "lang", alpha=1.0)
    vals = list(r1.values())
    assert max(vals) - min(vals) < 1e-12
    import pytest as _pt

    with _pt.raises(ValueError, match="alpha"):
        S.temperature_mix(d, "lang", alpha=0.0)
    with _pt.raises(ValueError, match="alpha"):
        S.temperature_mix(d, "lang", alpha=1.5)
