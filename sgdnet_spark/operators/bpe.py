"""BPE tokenizer training on a corpus — the subword-vocabulary stage of
a training-data pipeline (Sennrich et al. 2016; GPT-2/SentencePiece run
the same merge loop).

Scale shape at 100 TB: the corpus is touched ONCE to build the
(word, count) frequency relation — Zipf-small (distinct words, not
tokens) — and every merge iteration runs on that relation only: one
map-side-combined pair-count aggregation + a 1-row argmax collect + one
codegen rewrite pass. n_merges iterations cost n_merges vocab passes,
never a second corpus pass. Applying a learned merge table to text is a
per-row loop over merges — genuinely iterative per token — so apply_bpe
is an Arrow-batched mapInPandas pass (the multimodal-decode precedent),
with the merge table collected driver-side (it is n_merges-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sgdnet_spark.operators.text import tokens


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) corpus word-frequency relation — ONE narrow corpus
    pass, map-side combined to distinct-words-per-partition."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _merge_adjacent(sym_col, a: str, b: str):
    """Rewrite a symbol array replacing adjacent (a, b) with a||b,
    greedy-left non-overlapping (standard BPE semantics: 'aaa' with
    merge (a,a) -> [aa, a]) — one F.aggregate scan with a
    (rebuilt-array, pending-symbol) accumulator, pure codegen."""
    ab = a + b
    zero = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc, s):
        merged = (acc["prev"] == a) & (s == F.lit(b))
        return F.struct(
            F.when(merged, F.concat(acc["out"], F.array(F.lit(ab))))
            .when(acc["prev"].isNull(), acc["out"])
            .otherwise(F.concat(acc["out"], F.array(acc["prev"])))
            .alias("out"),
            F.when(merged, F.lit(None).cast("string")).otherwise(s).alias("prev"),
        )

    def finish(acc):
        return F.when(
            acc["prev"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["prev"])))

    return F.aggregate(sym_col, zero, step, finish)


def bpe_learn(
    df: DataFrame,
    n_merges: int = 50,
    min_freq: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Learn a BPE merge table from the corpus.

    Returns (rank, left, right, pair_count): merge `rank` joins symbols
    `left`+`right` (rank 0 first). Deterministic: the next merge is the
    max-count symbol pair with (count DESC, left ASC, right ASC)
    tie-break, exact integer counts. Stops early when the best pair's
    count drops below ``min_freq``. Words start as character symbols
    (no end-of-word marker; apply_bpe is consistent with that choice).

    Each iteration: pair-count agg over the materialized vocab relation
    (weighted by word frequency), collect the single argmax row, apply
    the merge with a codegen array rewrite, then localCheckpoint — the
    eager checkpoint both materializes the rewrite AND truncates the
    logical plan to the stored partitions. Plain persist() is NOT
    enough here: the cached plan still nests every prior iteration's
    aggregate lambda, and Catalyst analysis over that growing tree
    turns superlinear (measured: persist-based loop 8 s at 12 merges,
    125 s at 16; checkpointed, constant per-iteration cost).
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if min_freq < 1:
        raise ValueError(f"min_freq must be >= 1, got {min_freq}")
    spark = df.sparkSession
    rep = word_freqs(df, text_col).select(
        F.split("word", "").alias("syms"), "cnt"
    ).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = rep.select(
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, F.size("syms") - 1),
                    F.slice("syms", 2, F.size("syms") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
            "cnt",
        ).groupBy("p.a", "p.b").agg(F.sum("cnt").alias("c"))
        best = pairs.orderBy(F.col("c").desc(), F.col("a"), F.col("b")).limit(1).collect()
        if not best or best[0]["c"] < min_freq:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        merges.append((rank, a, b, c))
        rep = rep.select(_merge_adjacent(F.col("syms"), a, b).alias("syms"), "cnt").localCheckpoint()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    )


def apply_bpe(
    df: DataFrame,
    merges: DataFrame | list[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a learned merge table: per document, each word is
    split to characters and the merges replay in rank order (greedy-left
    per merge, the bpe_learn semantics). Returns (id, bpe_tokens
    array<string>, n_bpe). Merge application is inherently a per-token
    loop over ranked merges, so it runs as ONE Arrow-batched
    mapInPandas pass; the merge table collects driver-side and ships in
    the closure (it is n_merges-sized)."""
    import pandas as pd  # noqa: F401

    if isinstance(merges, DataFrame):
        mrows = [(r["rank"], r["left"], r["right"]) for r in merges.collect()]
    else:
        mrows = [(r[0], r[1], r[2]) for r in merges]
    ranked = [(a, b) for _, a, b in sorted(mrows)]

    def encode_word(w: str) -> list[str]:
        syms = list(w)
        for a, b in ranked:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    from sgdnet_spark.operators.text import norm_text

    base = df.select(F.col(id_col).alias("id"), norm_text(text_col).alias("t"))

    def run(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            for t in pdf["t"]:
                if t is None or t == "":
                    toks.append([])
                    continue
                doc: list[str] = []
                for w in t.split(" "):
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = encode_word(w)
                    doc.extend(got)
                toks.append(doc)
            pdf = pdf.assign(bpe_tokens=toks)
            yield pdf[["id", "bpe_tokens"]]

    out = base.mapInPandas(run, schema="id long, bpe_tokens array<string>")
    return out.select(
        F.col("id").alias(id_col),
        "bpe_tokens",
        F.size("bpe_tokens").cast("bigint").alias("n_bpe"),
    )
