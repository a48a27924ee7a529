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
    out, rates = S.mix_corpora(d, "lang", {"en": 0.5, "fr": 0.5})
    assert "fr" not in rates
    assert out.filter(F.col("lang") == "fr").count() == 0
    assert out.count() > 0
