"""Deterministic sampling / splitting for training-data pipelines.

Every operator keys off ``hash_fraction`` — a uniform [0, 1) value
derived from md5(id || salt) — so results are (a) reproducible across
runs and cluster layouts, (b) narrow (no shuffle, no state: each row
decides its own fate from its id), and (c) exactly replayable in ANSI
SQL (md5 + hex-prefix-to-int exists everywhere), which is what the
driver's DuckDB oracle does for the ``corpus_sample`` registry entry.

At 100 TB this is the only sampling shape that works: a row's
keep/split decision is a pure function of its id, so sampling
composes with any partitioning, restarts, and incremental reruns —
no global sort, no reservoir state, no seed-per-partition drift.

Operators:
- ``stratified_sample`` — per-stratum keep fractions.
- ``split_assign`` — train/val/test assignment from weight fractions.
- ``sample_to_budget`` — downsample to a global weight budget (e.g.
  chars or tokens) with one aggregation for the rate.
- ``mix_corpora`` — downsample sources to target mixture proportions
  (the corpus-mixing rule: the largest feasible total is limited by
  the scarcest source relative to its target share).
- ``cluster_balance`` — mix_corpora's rule keyed on embedding
  CLUSTERS instead of a source column: k-means topics replace
  provenance as the stratification key (the DataComp/SemDeDup-family
  diversity-balancing stage), emitting per-vector keep DECISIONS.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U32 = float(1 << 32)


def hash_u32(col: Column | str, salt: str = "") -> Column:
    """Deterministic uint32 from md5 of the value (+ salt): the first 8
    hex chars of md5(CAST(col AS STRING) || salt) as an integer. THE
    one md5-derivation recipe every replayable operator builds on
    (hash_fraction, text.hash_bucket/hash_score) — its DuckDB twin is
    ``CAST(('0x' || substr(md5(CAST(col AS VARCHAR) || salt), 1, 8)) AS
    BIGINT)``; keep the two in lockstep."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat(c.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def hash_fraction(col: Column | str, salt: str = "") -> Column:
    """Deterministic uniform [0, 1) from md5 of the value (+ salt):
    ``hash_u32`` over 2^32 — cheap, uniform, and expressible identically
    in any SQL dialect (the DuckDB twin divides the hash_u32 twin by
    4294967296.0). Distinct salts give independent draws for composed
    operators."""
    return hash_u32(col, salt) / F.lit(_U32)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Keep each row with its stratum's probability (deterministically).

    Strata absent from ``fractions`` are dropped (fraction 0), matching
    an inner join against the fraction table in the SQL twin.
    """
    u = hash_fraction(id_col, salt)
    frac = None
    for k, v in fractions.items():
        cond = F.col(strata_col) == F.lit(k)
        frac = F.when(cond, F.lit(float(v))) if frac is None else frac.when(cond, F.lit(float(v)))
    frac = frac.otherwise(F.lit(0.0)) if frac is not None else F.lit(0.0)
    return df.filter(u < frac)


def split_assign(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Append a deterministic split label (train/val/test style).

    Rows land in the split whose cumulative-weight interval contains
    their hash fraction; weights must sum to ~1 (the last split absorbs
    any rounding remainder).
    """
    if not weights:
        raise ValueError("split_assign needs at least one split weight")
    names = list(weights)
    # the ONE cumulative-threshold derivation (shared with SQL twins):
    # recomputing the float sum here would risk a drifted boundary
    cum = split_thresholds(weights)
    u = hash_fraction(id_col, salt)
    expr = None
    for k, hi in zip(names[:-1], cum):
        expr = F.when(u < F.lit(hi), F.lit(k)) if expr is None else expr.when(u < F.lit(hi), F.lit(k))
    expr = expr.otherwise(F.lit(names[-1])) if expr is not None else F.lit(names[-1])
    return df.withColumn(out_col, expr)


def split_thresholds(weights: dict[str, float]) -> list[float]:
    """The cumulative upper bounds split_assign uses for all but the
    last split — exposed so a SQL twin can embed the EXACT same floats
    (0.8 + 0.1 is 0.9000000000000001 in IEEE; recomputing the sum in
    another engine risks a different boundary)."""
    out = []
    tot = 0.0
    for k in list(weights)[:-1]:
        tot = tot + float(weights[k])
        out.append(tot)
    return out


def sample_to_budget(
    df: DataFrame,
    budget: float,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: str = "budget",
) -> tuple[DataFrame, float]:
    """Downsample so the expected ``weight_col`` total meets ``budget``.

    ONE aggregation computes the global total; every row then keeps
    itself with rate = min(1, budget/total). Returns (sampled, rate).
    """
    total = df.agg(F.sum(F.col(weight_col)).alias("t")).first()["t"]
    if total is None or total <= 0:
        return df, 1.0
    rate = min(1.0, float(budget) / total)
    return df.filter(hash_fraction(id_col, salt) < F.lit(rate)), rate


def mix_corpora(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: str = "mix",
    on_missing: str = "error",
) -> tuple[DataFrame, dict[str, float]]:
    """Downsample sources to target mixture proportions.

    The largest feasible mixed total is T = min_s available_s / w_s
    (the scarcest source relative to its target share saturates first);
    each source then samples at rate_s = w_s * T / available_s, so the
    expected post-sample weight shares equal ``weights``. Sources
    absent from ``weights`` are dropped. ONE aggregation for the
    per-source totals; rates are a driver-side dict (k entries).

    A positively-weighted source with no usable rows makes the target
    mixture infeasible: ``on_missing='error'`` (default) raises —
    silently returning a corpus whose shares do NOT match ``weights``
    is the worst failure mode a mixing step can have. Pass
    ``on_missing='skip'`` to knowingly mix over the present sources
    only (T and rates computed as if the missing sources had weight 0;
    their keys are absent from the returned rates dict).
    """
    rates = mix_rates(df, source_col, weights, weight_col, on_missing)
    u = hash_fraction(id_col, salt)
    rate = _rate_column(source_col, rates)
    return df.filter(u < rate), rates


def _avail_totals(df: DataFrame, source_col: str, weight_col: str) -> dict:
    """Per-source positive weight totals: ONE map-side-combined
    aggregation to a k-entry driver dict."""
    return {
        r[source_col]: r["t"]
        for r in df.groupBy(source_col).agg(F.sum(F.col(weight_col)).alias("t")).collect()
        # SUM over an all-NULL group is NULL; a NULL/zero total means the
        # source has no usable weight — treat it as absent
        if r["t"] is not None and r["t"] > 0
    }


def mix_rates(
    df: DataFrame,
    source_col: str,
    weights: dict,
    weight_col: str = "n_chars",
    on_missing: str = "error",
    avail: dict | None = None,
) -> dict:
    """Per-source keep rates for ``mix_corpora``'s scarcest-source rule
    (T = min_s available_s / w_s; rate_s = w_s · T / available_s) —
    factored out so cluster_balance can reuse the identical algebra
    keyed on a cluster column. ONE aggregation (skipped when the caller
    already holds the ``avail`` totals); k-entry driver dict."""
    if avail is None:
        avail = _avail_totals(df, source_col, weight_col)
    if on_missing not in ("error", "skip"):
        raise ValueError(f"on_missing must be 'error' or 'skip', got {on_missing!r}")
    missing = sorted(s for s, w in weights.items() if w > 0 and s not in avail)
    if missing and on_missing == "error":
        # a positively-weighted source with no usable rows makes the
        # target mixture infeasible — silently renormalizing over the
        # present sources would return a corpus whose shares do NOT
        # match ``weights`` while claiming they do
        # (str() the keys: a NULL source_col groups under key None,
        # which would make sorted() raise and mask this diagnostic)
        raise ValueError(
            f"sources {missing} have positive mixture weight but no "
            f"positive {weight_col} in the data (usable sources: "
            f"{sorted(str(k) for k in avail)}); drop them from weights "
            "or fix the corpus"
        )
    if not any(s in avail and w > 0 for s, w in weights.items()):
        # nothing usable at all (every positively-weighted source is
        # missing and on_missing='skip', or no weight is positive)
        raise ValueError(
            f"no source in weights {sorted(weights)} has positive "
            f"{weight_col} in the data (usable sources: "
            f"{sorted(str(k) for k in avail)})"
        )
    T = min(avail[s] / w for s, w in weights.items() if s in avail and w > 0)
    return {s: w * T / avail[s] for s, w in weights.items() if s in avail}


def temperature_weights(avail: dict, alpha: float) -> dict:
    """Temperature-smoothed target shares: w_s ∝ (share_s)^alpha (the
    XLM-R / mT5 multilingual sampling rule, Conneau et al. 2020 §3.1 /
    Xue et al. 2021 — alpha < 1 flattens the source distribution so
    low-resource sources are upsampled RELATIVE to their natural share;
    alpha=1 keeps natural shares, alpha→0 approaches uniform). Driver
    arithmetic on the k-entry totals dict; the shares are exact
    (integer-valued double sums), so both engines derive identical
    weights from the same pow()."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    tot = sum(avail.values())
    return {s: (t / tot) ** alpha for s, t in avail.items()}


def temperature_mix(
    df: DataFrame,
    source_col: str,
    alpha: float = 0.3,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: str = "tmix",
) -> tuple[DataFrame, dict]:
    """Downsample sources to temperature-smoothed shares: the
    feasibility-capped realization of the (share)^alpha mixture —
    :func:`temperature_weights` composed with the scarcest-source rule,
    every keep decision a pure md5(id‖salt) fraction (the corpus_sample
    discipline: one totals aggregation, zero shuffles in the decisions,
    partitioning-independent, restart-stable)."""
    avail = _avail_totals(df, source_col, weight_col)
    if not avail:
        raise ValueError(
            f"no source has positive {weight_col} — nothing to mix"
        )
    rates = mix_rates(df, source_col, temperature_weights(avail, alpha),
                      weight_col, avail=avail)
    u = hash_fraction(id_col, salt)
    return df.filter(u < _rate_column(source_col, rates)), rates


def _rate_column(source_col: str, rates: dict) -> Column:
    rate = None
    for s, r in rates.items():
        cond = F.col(source_col) == F.lit(s)
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    return rate.otherwise(F.lit(0.0)) if rate is not None else F.lit(0.0)


def cluster_balance(
    df: DataFrame,
    k_clusters: int = 8,
    iters: int = 3,
    shares: dict | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt: str = "cbal",
    cents=None,
    rates: dict | None = None,
) -> tuple[DataFrame, dict]:
    """Cluster-balanced corpus selection: mix_corpora's scarcest-source
    rule with k-means embedding clusters as the stratification key —
    the diversity-balancing stage (DataComp/SemDeDup-family pipelines
    rebalance over semantic clusters so no topic dominates training).

    Returns (decisions, rates): ``decisions`` carries EVERY input
    vector as (id, cluster, kept) — the consumable form a pipeline
    audits and joins (embedding_semdedup's shape) — and ``rates`` the
    per-cluster keep rates. ``shares=None`` targets UNIFORM shares over
    the non-empty clusters; an explicit dict follows mix_corpora's
    semantics exactly, including the infeasible-share error when a
    positively-weighted cluster is empty.

    Scale shape: the k-means fit is iteration-bounded with
    (k, dim+1)-sized partials (ivf.kmeans_fit), assignment is one
    zero-shuffle Arrow map, the rate fit is ONE map-side-combined
    count aggregation to a k-entry driver dict, and every keep
    decision is a pure function of md5(id || salt) — no shuffle,
    partitioning-independent, identical under restarts (the
    corpus_sample discipline). Pass ``cents`` to reuse a fitted
    quantizer (fit-once / balance-many, the model= convention); pass
    BOTH ``cents`` and ``rates`` and the whole call is a pure per-row
    map with no aggregation — the stream-legal scoring half (fit on a
    static corpus, balance the stream; asserted equal to batch in
    tests/test_sampling.py).
    """
    from sgdnet_spark.operators.ivf import assign_lists, kmeans_fit

    if rates is not None and cents is None:
        raise ValueError("cluster_balance: rates= requires cents= (the same fit)")
    if cents is None:
        cents = kmeans_fit(df, k=k_clusters, iters=iters, vec_col=vec_col, id_col=id_col)
    assigned = assign_lists(df, cents, vec_col, id_col).select(
        "id", F.col("list_id").cast("int").alias("cluster")
    )
    if rates is None:
        counted = assigned.withColumn("__one", F.lit(1.0))
        # ONE count aggregation serves both the uniform-share universe
        # and the rate fit (a separate distinct() would re-run the
        # assignment map over the corpus just to list cluster ids)
        avail = _avail_totals(counted, "cluster", "__one")
        if shares is None:
            shares = {int(c): 1.0 / len(avail) for c in avail}
        rates = mix_rates(counted, "cluster", shares, weight_col="__one", avail=avail)
    kept = (hash_fraction("id", salt) < _rate_column("cluster", rates)).cast("int")
    return assigned.withColumn("kept", kept), rates


def pack_sequences(
    df: DataFrame,
    budget: int,
    tokens_col: Column | str,
    group_col: str = "source",
    id_col: str = "doc_id",
    n_shards: int | None = None,
    shard_salt: str = "pack_shard",
) -> DataFrame:
    """Concat-and-chunk sequence packing (GPT-style training prep).

    Within each ``group_col`` partition, documents are concatenated in
    ``id_col`` order into one token stream that is cut every ``budget``
    tokens; documents may span chunk boundaries. Each document's
    placement is a pure function of the running token count before it:

    - ``chunk_first``  = floor(start / budget)
    - ``chunk_offset`` = start % budget (position inside chunk_first)
    - ``chunk_last``  = floor((start + max(n_tokens, 1) - 1) / budget)
      (the max keeps a zero-token document pinned to its start chunk)
    - ``chunks_spanned`` = chunk_last - chunk_first + 1

    One window (running sum per group) is the only state. With a handful
    of sources, one source = one window partition = one task, so at
    scale the window must parallelize WITHIN a source: pass ``n_shards``
    and each document is deterministically assigned a shard
    (floor(hash_fraction(id, shard_salt) * n_shards) — reproducible,
    partitioning-independent) and packing runs per (group, shard). That
    matches real training prep — shards are independent token streams
    fed to different workers, each packed on its own running sum — and
    caps window-partition size at |group|/n_shards. The output then
    carries a ``shard`` column; packing a shard's rows alone yields the
    identical placement (shards are independent by construction).

    The mapping replays exactly in ANSI SQL (the driver's
    ``pack_sequences`` oracle), and is independent of physical
    partitioning because the order key is the id, not arrival order.
    """
    from pyspark.sql import Window

    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    b = int(budget)
    group_cols = [group_col]
    if n_shards is not None:
        if "shard" in df.columns:
            raise ValueError(
                "pack_sequences(n_shards=...) derives its own 'shard' column "
                "but the input already has one — rename the existing column "
                "(withColumnRenamed) or pass it as group_col instead"
            )
        shard = F.floor(
            hash_fraction(id_col, shard_salt) * F.lit(int(n_shards))
        ).cast("int")
        df = df.withColumn("shard", shard)
        group_cols.append("shard")
    w = Window.partitionBy(*group_cols).orderBy(id_col)
    # all arithmetic stays in bigint (DIV, %): double division would
    # silently misplace docs once a group's running count passes 2^53;
    # start >= 0 so truncating DIV == floor
    start = F.coalesce(
        F.sum(toks).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    ).cast("bigint")
    staged = df.select(
        F.col(id_col),
        *[F.col(c) for c in group_cols],
        toks.cast("bigint").alias("n_tokens"),
        start.alias("_start"),
    )
    placed = staged.select(
        id_col,
        *group_cols,
        "n_tokens",
        F.expr(f"_start DIV {b}").cast("bigint").alias("chunk_first"),
        (F.col("_start") % b).cast("bigint").alias("chunk_offset"),
        # greatest(n, 1): a ZERO-token doc occupies no tokens but still
        # has a position — treat it as spanning its start chunk, so
        # chunk_last >= chunk_first always holds (bare n_tokens - 1 at
        # an exact chunk boundary gives _start - 1, whose truncating
        # DIV lands one chunk EARLY and makes chunks_spanned 0)
        F.expr(f"(_start + greatest(n_tokens, 1) - 1) DIV {b}")
        .cast("bigint").alias("chunk_last"),
    )
    return placed.withColumn(
        "chunks_spanned",
        (F.col("chunk_last") - F.col("chunk_first") + F.lit(1)).cast("bigint"),
    )
