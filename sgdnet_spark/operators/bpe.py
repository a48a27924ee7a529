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


def _learn_local(
    freqs: list[tuple[str, int]], n_merges: int, min_freq: int
) -> list[tuple[int, str, str, int]]:
    """Driver-local merge loop over a collected (word, count) relation —
    the classic incremental algorithm (Sennrich reference impl / HF
    tokenizers): pair counts maintained incrementally (only words
    CONTAINING the merged pair are rewritten per iteration) and the
    argmax served by a lazy-invalidation heap keyed (-count, left,
    right), which reproduces the (count DESC, left ASC, right ASC)
    tie-break exactly. 32k merges finish in seconds where a per-merge
    Spark job loop would take hours of driver round-trips."""
    import heapq
    from collections import Counter, defaultdict

    words = [list(w) for w, _ in freqs]
    cnts = [c for _, c in freqs]
    pair_counts: Counter = Counter()
    pair_words: dict = defaultdict(set)
    for wi, syms in enumerate(words):
        c = cnts[wi]
        for p in zip(syms, syms[1:]):
            pair_counts[p] += c
            pair_words[p].add(wi)
    heap = [(-c, a, b) for (a, b), c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[int, str, str, int]] = []

    def bump(p, delta, wi=None):
        nc = pair_counts.get(p, 0) + delta
        if nc <= 0:
            pair_counts.pop(p, None)
        else:
            pair_counts[p] = nc
            heapq.heappush(heap, (-nc, p[0], p[1]))
        if wi is not None:
            pair_words[p].add(wi)

    for rank in range(n_merges):
        # pop stale heap entries (lazy invalidation)
        while heap:
            negc, a, b = heap[0]
            if pair_counts.get((a, b), 0) == -negc:
                break
            heapq.heappop(heap)
        if not heap:
            break
        negc, a, b = heap[0]
        c = -negc
        if c < min_freq:
            break
        merges.append((rank, a, b, int(c)))
        # rewrite only the words that (may) contain the pair; membership
        # sets are append-only, so recompute each word's contribution
        # from its CURRENT symbols (stale members contribute no change)
        for wi in list(pair_words.get((a, b), ())):
            syms = words[wi]
            cw = cnts[wi]
            has = any(x == a and y == b for x, y in zip(syms, syms[1:]))
            if not has:
                continue
            for p in zip(syms, syms[1:]):
                bump(p, -cw)
            new = _apply_one(syms, a, b)
            words[wi] = new
            for p in zip(new, new[1:]):
                bump(p, cw, wi)
        pair_counts.pop((a, b), None)
    return merges


def _apply_one(syms: list[str], a: str, b: str) -> list[str]:
    """Greedy-left non-overlapping single-merge rewrite (python twin of
    _merge_adjacent; 'aaa' + (a,a) -> [aa, a])."""
    out, i = [], 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_learn(
    df: DataFrame,
    n_merges: int = 50,
    min_freq: int = 2,
    text_col: str = "text",
    solver: str = "auto",
    local_budget: int = 5_000_000,
) -> DataFrame:
    """Learn a BPE merge table from the corpus.

    Returns (rank, left, right, pair_count): merge `rank` joins symbols
    `left`+`right` (rank 0 first). Deterministic: the next merge is the
    max-count symbol pair with (count DESC, left ASC, right ASC)
    tie-break, exact integer counts. Stops early when the best pair's
    count drops below ``min_freq``. Words start as character symbols
    (no end-of-word marker; apply_bpe is consistent with that choice).

    The corpus is touched ONCE either way — the merge loop runs on the
    Zipf-small (word, count) relation. ``solver``:

    - ``"local"`` (and ``"auto"`` when the vocabulary fits
      ``local_budget`` rows): collect the relation and run the classic
      incremental driver loop — pair counts updated only for words
      containing the merged pair, argmax from a lazy-invalidation heap.
      This is the real-vocabulary path: 32k merges in seconds, where a
      per-merge Spark job loop costs a driver round-trip each (~0.25 s
      -> hours). The GLM ``solver="auto"`` collect-budget precedent.
    - ``"distributed"``: per merge, one map-side-combined pair-count
      aggregation over the vocab relation + a 1-row argmax + a codegen
      greedy-left rewrite, localCheckpoint-ed per iteration — the eager
      checkpoint both materializes the rewrite AND truncates the
      logical plan. Plain persist() is NOT enough: the cached plan
      still nests every prior iteration's aggregate lambda and Catalyst
      analysis turns superlinear (measured: 8 s at 12 merges, 125 s at
      16; checkpointed, constant). Use when the vocabulary itself
      exceeds driver memory.

    Both paths produce IDENTICAL merge tables (asserted in tests).
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if min_freq < 1:
        raise ValueError(f"min_freq must be >= 1, got {min_freq}")
    if solver not in ("auto", "local", "distributed"):
        raise ValueError(f"solver must be auto|local|distributed, got {solver!r}")
    spark = df.sparkSession
    wf = word_freqs(df, text_col)
    schema = "rank int, left string, right string, pair_count bigint"
    if solver != "distributed":
        if solver == "auto":
            # checkpoint BEFORE the budget count so the corpus
            # aggregation runs once — count() then collect() (or the
            # rep checkpoint below) would otherwise each re-execute the
            # full corpus scan + groupBy (the pagerank precedent).
            # Forced-local skips it: no count runs there, so the
            # checkpoint would be a pure extra materialization
            wf = wf.localCheckpoint(eager=True)
        if solver == "local" or wf.count() <= local_budget:
            rows = [(r["word"], int(r["cnt"])) for r in wf.collect()]
            return spark.createDataFrame(
                _learn_local(rows, n_merges, min_freq), schema
            )
    from sgdnet_spark.operators.text import _bigram_pairs

    rep = wf.select(F.split("word", "").alias("syms"), "cnt").localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = rep.select(
            F.explode(_bigram_pairs(F.col("syms"))).alias("p"), "cnt"
        ).groupBy("p.w1", "p.w2").agg(F.sum("cnt").alias("c"))
        best = pairs.orderBy(F.col("c").desc(), F.col("w1"), F.col("w2")).limit(1).collect()
        if not best or best[0]["c"] < min_freq:
            break
        a, b, c = best[0]["w1"], best[0]["w2"], int(best[0]["c"])
        merges.append((rank, a, b, c))
        rep = rep.select(_merge_adjacent(F.col("syms"), a, b).alias("syms"), "cnt").localCheckpoint()
    return spark.createDataFrame(merges, schema)


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
    if isinstance(merges, DataFrame):
        mrows = [(r["rank"], r["left"], r["right"]) for r in merges.collect()]
    else:
        mrows = [(r[0], r[1], r[2]) for r in merges]
    ranked = [(a, b) for _, a, b in sorted(mrows)]

    def encode_word(w: str) -> list[str]:
        syms = list(w)
        for a, b in ranked:
            syms = _apply_one(syms, a, b)
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

    id_type = df.schema[id_col].dataType.simpleString()
    out = base.mapInPandas(run, schema=f"id {id_type}, bpe_tokens array<string>")
    return out.select(
        F.col("id").alias(id_col),
        "bpe_tokens",
        F.size("bpe_tokens").cast("bigint").alias("n_bpe"),
    )
