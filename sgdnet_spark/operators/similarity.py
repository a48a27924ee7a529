"""Similarity search over embedding columns (array<float>).

- cosine/dot built from F.zip_with + F.aggregate (JVM-side, codegen).
- brute-force top-k: broadcast the query set, narrow scan, window top-k.
- LSH (random hyperplanes): bucketed candidates for the 100 TB path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    # clamped away from zero: an all-zero embedding would otherwise make
    # cosine 0/0 = NaN, and Spark orders NaN ABOVE every number — the
    # zero vector would pass every `cos >= threshold` filter and outrank
    # every real neighbor in desc sorts. Clamped, its cosine is 0 and it
    # is excluded/ranked last, which is the only sensible semantics for
    # a vector with no direction.
    # 1e-150, not 1e-300: cosine divides by a PRODUCT of two norms, and
    # 1e-300 * 1e-300 underflows to exactly 0.0 — an ANSI-mode
    # DIVIDE_BY_ZERO error (or NaN with ANSI off)
    return F.greatest(
        F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)),
        F.lit(1e-150),
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(col: str) -> Column:
    return F.col(col).cast("array<double>")


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All-pairs cosine ≥ threshold (exact). O(n²) — the correctness
    baseline; use lsh_topk for scale."""
    v = df.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"),
                  norm(_as_double(vec_col)).alias("nrm"))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos"))
    )


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_inline_queries: int = 64,
    with_rank: bool = False,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × narrow scan of the corpus,
    per-query window top-k. Ties broken by neighbor id (deterministic).
    ``with_rank`` appends the 1-based rank column ``rn`` (rank fusion
    consumers). ``exclude_self`` (default True — the more-like-this
    convention) drops a corpus row whose id equals the query's id; pass
    False when the query id space is unrelated to the corpus id space,
    so an incidental id collision is not silently filtered.

    Small query sets are inlined as literal expressions (one fused
    mult-add chain per query, whole-stage codegen, zero array allocs —
    the broadcast-join idea taken down to expression level). Larger sets
    fall back to a broadcast join over array columns.
    """
    # bounded collect for the path decision: limit(max+1) tells us which
    # branch to take without ever materializing a large query set on the
    # driver (the distributed branch below never needs the rows)
    q_raw = (
        queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"))
        .limit(max_inline_queries + 1)
        .collect()
    )
    # NULL query vectors have no neighbors — drop them HERE so the
    # inline branch can't np.asarray-crash and the join branch can't
    # rank every corpus row under a NULL cosine (desc puts NULLs last,
    # so they'd silently fill the top-k); the branch decision stays on
    # the RAW count (truncation must route to the join branch, which
    # sees the whole frame)
    q_rows = [r for r in q_raw if r["qv"] is not None]
    id_type = queries.schema[id_col].dataType.simpleString()
    if not q_rows and len(q_raw) <= max_inline_queries:
        # empty usable query set: a well-typed empty result, not a numpy
        # AxisError from norm() over a zero-row array (nbr_id takes the
        # CORPUS id type — it may differ from the query id type)
        nbr_type = df.schema[id_col].dataType.simpleString()
        return df.sparkSession.createDataFrame(
            [], f"query_id {id_type}, nbr_id {nbr_type}, cos double"
        )
    integral = ("tinyint", "smallint", "int", "bigint")
    integral_ids = (
        id_type in integral
        and df.schema[id_col].dataType.simpleString() in integral
    )
    if len(q_raw) <= max_inline_queries and integral_ids:
        # (non-integral id columns use the join branch below at ANY
        # query count — the Arrow batch schema here is typed long)
        # Arrow-batched BLAS path: broadcast the query block to every
        # partition, one (batch x dim) @ (dim x q) matmul per batch, keep
        # only each batch's per-query top-k — the shuffle carries
        # q*k*partitions candidate rows, never the corpus.
        import pandas as pd

        q_ids = [int(r["query_id"]) for r in q_rows]
        Q = np.asarray([r["qv"] for r in q_rows], dtype=np.float64)
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
        corpus = df.select(F.col(id_col).alias("nbr_id"), _as_double(vec_col).alias("cv"))

        def run(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.stack(pdf["cv"].to_numpy())
                Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
                S = Vn @ Qn.T  # (m, q)
                ids = pdf["nbr_id"].to_numpy()
                out_q, out_n, out_c = [], [], []
                # +1 headroom only when the query's own row may be cut
                kk = min(k + 1, len(ids)) if exclude_self else min(k, len(ids))
                for j, qid in enumerate(q_ids):
                    # lexsort, not argpartition: ties at the kk boundary
                    # must keep the smallest nbr_id so the batch-local
                    # truncation agrees with the final window's
                    # (desc cos, asc nbr_id) tie-break — argpartition
                    # keeps an arbitrary subset of tied candidates and
                    # the output would depend on batch layout
                    top = np.lexsort((ids, -S[:, j]))[:kk]
                    for t in top:
                        if not exclude_self or ids[t] != qid:
                            out_q.append(qid)
                            out_n.append(int(ids[t]))
                            out_c.append(float(S[t, j]))
                yield pd.DataFrame({"query_id": out_q, "nbr_id": out_n, "cos": out_c})

        scored = corpus.mapInPandas(run, schema="query_id long, nbr_id long, cos double")
    else:
        corpus = df.select(F.col(id_col).alias("nbr_id"), _as_double(vec_col).alias("cv"),
                           norm(_as_double(vec_col)).alias("cn"))
        q = queries.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"),
            norm(_as_double(vec_col)).alias("qn"))
        # self-exclusion only when the id types can actually collide: a
        # string-keyed query set probing a long-keyed corpus would
        # otherwise force a CAST that throws on non-numeric ids
        same_type = queries.schema[id_col].dataType == df.schema[id_col].dataType
        cond = (
            F.col("nbr_id") != F.col("query_id")
            if same_type and exclude_self
            else F.lit(True)
        )
        scored = (
            corpus.join(F.broadcast(q), cond)
            .select(
                "query_id",
                "nbr_id",
                (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos"),
            )
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    out_cols = ["query_id", "nbr_id", F.round("cos", 4).alias("cos")]
    if with_rank:
        # the UNROUNDED internal ordering (rank fusion consumers need
        # the rank the cut was actually decided on, not a re-rank of
        # the 4dp-rounded output, which can permute near-ties)
        out_cols.append("rn")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(*out_cols)
    )


def _check_dim(df: DataFrame, vec_col: str, dim: int) -> None:
    """Fail loudly when the embedding width differs from the planes'
    ``dim``: zip_with NULL-pads a mismatched product, the dot aggregate
    goes NULL, every sign bit falls to otherwise(0), and EVERY vector
    lands in bucket 0 — the candidate join silently degrades to a full
    O(n²) cross product. One limit(1) probe per call is cheap insurance
    against a scale path that quietly stops being one."""
    row = df.select(F.size(_as_double(vec_col)).alias("d")).filter(
        F.col("d") >= 0
    ).limit(1).collect()
    if row and row[0]["d"] != dim:
        raise ValueError(
            f"{vec_col} has dimension {row[0]['d']} but the hyperplanes "
            f"were drawn for dim={dim}; pass dim={row[0]['d']}"
        )


def random_hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n_planes, dim))


def lsh_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id from fixed random hyperplanes (deterministic).

    Literal-array form — each plane is inlined into the expression tree.
    Fine for a handful of planes; the multi-table key builders below use
    the data-driven twin (:func:`_planes_rel` + :func:`_lsh_tables_data`)
    because L·b·dim literals hit the round-9 literal-array codegen trap:
    thousands of py4j ``F.lit`` calls per fresh plan (measured 6.7 s of
    driver-side construction per lsh_topk call at L=16, b=4, dim=64) and
    a generated source too large for the JIT."""
    bits = []
    for i, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in plane]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("bigint"))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def _planes_lit(planes: np.ndarray) -> Column:
    """The (L, b, dim) hyperplanes as ONE nested-array literal
    (array<array<double>>, element t*b+i+1 = plane i of table t) — the
    round-9 ship-the-model-as-data idea taken to its cheapest form:
    ConstantFolding collapses it to a single Literal (one codegen
    reference object) instead of L·b·dim individual ``F.lit`` calls, so
    plan construction and the generated source are O(1)-small in the
    plane count. Unlike a crossJoin'ed 1-row relation this adds NO
    join, so Catalyst's size-in-bytes estimates (which multiply across
    joins) are untouched and downstream join strategies cannot silently
    flip (the dedup_embedding_lsh snapshot pin caught exactly that).

    Built via ONE ``F.expr`` string, not nested ``F.lit`` (which walks
    the python list element-by-element — measured ~2.5 s at 64×64) —
    and each element carries the ``D`` suffix so it parses as DOUBLE
    (bare SQL decimals parse as DECIMAL and would quantize); ``repr``
    emits the shortest round-trip decimal and ``Double.parseDouble``
    restores the exact bits."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{float(x)!r}D" for x in plane) + ")"
            for tbl in planes
            for plane in tbl
        )
        + ")"
    )


def _lsh_tables_data(vec: Column, pl: Column, n_tables: int, n_planes: int) -> Column:
    """array<struct<tbl,bk>> of per-table sign-bit buckets, data-driven:
    planes come from the ``pl`` column (:func:`_planes_lit`), the table
    loop is ``transform(sequence(...))`` and the bit loop an
    ``aggregate(sequence(...))`` — O(1) py4j calls and a plan whose size
    is independent of L, b and dim.

    BIT-PARITY with the literal form is part of the contract (the
    ann_approx lsh golden rows): the per-plane dot is the SAME
    zip_with element order and left-fold accumulation, so every double
    is bit-identical and every sign bit agrees; the bucket id is a sum
    of exact small ints (order-insensitive). Asserted against
    :func:`lsh_bucket` in tests/test_operators.py."""
    # bit weights as a tiny b-sized literal array (shiftleft needs a
    # Python-int bit count; b is 3-4, so this never bloats the plan)
    weights = F.array(*[F.lit(1 << i).cast("bigint") for i in range(n_planes)])

    def bucket(t: Column) -> Column:
        def add_bit(acc: Column, i: Column) -> Column:
            plane = F.element_at(pl, (t * n_planes + i + F.lit(1)).cast("int"))
            d = F.aggregate(
                F.zip_with(vec, plane, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc2, v: acc2 + v,
            )
            return acc + F.when(d >= 0, F.element_at(weights, i.cast("int") + F.lit(1))).otherwise(
                F.lit(0).cast("bigint")
            )

        return F.aggregate(
            F.sequence(F.lit(0), F.lit(n_planes - 1)),
            F.lit(0).cast("bigint"),
            add_bit,
        )

    return F.transform(
        F.sequence(F.lit(0), F.lit(n_tables - 1)),
        lambda t: F.struct(t.cast("int").alias("tbl"), bucket(t).alias("bk")),
    )


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    max_inline_queries: int = 64,
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE random-hyperplane LSH:
    candidates share a bucket with the query in ANY of ``n_tables``
    independent tables (union-of-candidates, then exact cosine rerank).

    Query handling is TWO-PATH (round 12, completing the ANN tier's
    bounded-collect design): a ``limit(max_inline_queries+1)`` probe
    decides; small query sets broadcast their (table, bucket) keys and
    vectors, larger sets leave the join strategies to Catalyst/AQE so
    a corpus-scale query relation is never forced onto the driver or
    every executor. Both branches are the same plan modulo hints —
    results identical (asserted in tests).

    A single table's recall collapses as n_planes grows (P[all sign
    bits agree] decays exponentially with the angle); L independent
    tables drive the miss probability to (1-p^b)^L — the standard
    recall/cost dial (Indyk-Motwani; same banding idea as MinHash LSH).
    One shuffle on (table, bucket); at scale the corpus is
    hash-partitioned by bucket so each query probes L partitions, never
    the full corpus.

    Defaults (b=4, L=16) target the mid-similarity regime (top-k cosine
    ~0.3, p_agree ~0.6): measured recall@5 ≈ 0.88-0.92 on the test
    embeddings, floors asserted in tests/test_recall.py. For corpora
    whose neighbors are close (cos ≥ 0.8), raise n_planes to sharpen
    selectivity at the same recall.
    """
    planes = random_hyperplanes(dim, n_planes * n_tables, seed).reshape(
        n_tables, n_planes, dim
    )
    _check_dim(df, vec_col, dim)
    # bounded branch probe: small query sets broadcast, larger ones
    # leave join strategy to AQE (no query-sized broadcast/collect)
    n_q = len(queries.select(id_col).limit(max_inline_queries + 1).collect())
    bcast = F.broadcast if n_q <= max_inline_queries else (lambda x: x)
    # planes ride as ONE nested-array literal, NOT L·b·dim inlined
    # F.lit calls (the round-9 literal-array trap: measured 6.7 s of
    # fresh-plan construction + analysis per call; values bit-identical,
    # asserted in tests)
    pl = _planes_lit(planes)
    # candidates carry IDS ONLY through the bucket join (the
    # cosine_pairs_lsh discipline): exploding (tbl, bk) keys next to the
    # full vector would shuffle every embedding n_tables times and drag
    # L-duplicated vectors through the dedup groupBy
    ckeys = df.select(
        F.col(id_col).alias("nbr_id"),
        F.explode(
            _lsh_tables_data(_as_double(vec_col), pl, n_tables, n_planes)
        ).alias("tb"),
    ).select("nbr_id", F.col("tb.tbl").alias("tbl"), F.col("tb.bk").alias("bk"))
    qkeys = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(
            _lsh_tables_data(_as_double(vec_col), pl, n_tables, n_planes)
        ).alias("tb"),
    ).select("query_id", F.col("tb.tbl").alias("tbl"), F.col("tb.bk").alias("bk"))
    cand = (
        ckeys.alias("c")
        .join(
            bcast(qkeys).alias("q"),
            (F.col("c.tbl") == F.col("q.tbl"))
            & (F.col("c.bk") == F.col("q.bk"))
            & (F.col("c.nbr_id") != F.col("q.query_id")),
        )
        # union of candidates across tables: dedup BEFORE the exact rerank
        .select("query_id", "nbr_id")
        .distinct()
    )
    cv = df.select(F.col(id_col).alias("nbr_id"), _as_double(vec_col).alias("cv"),
                   norm(_as_double(vec_col)).alias("cn"))
    qv = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"),
                        norm(_as_double(vec_col)).alias("qn"))
    scored = (
        cand.join(cv, "nbr_id")
        .join(bcast(qv), "query_id")
        .select(
            "query_id",
            "nbr_id",
            (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "nbr_id", F.round("cos", 4).alias("cos"))
    )


def cosine_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.45,
    n_planes: int = 3,
    n_tables: int = 24,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs by cosine >= threshold — the BUCKETED scale path
    for cosine_pairs (which is an all-pairs self-join, the exact-oracle
    tier). Multi-table random-hyperplane LSH: a pair is a candidate if
    it shares a bucket in ANY of L tables; candidates carry IDS ONLY
    through the self-join, vectors join back once for the exact cosine
    rerank — so work scales with bucket collisions (the near-dup rate),
    not n², and nothing vector-sized shuffles twice.

    Parameter rule: a pair at cosine c agrees on one sign bit with
    p = 1 - arccos(c)/pi, survives a b-bit table with p^b, and is
    missed by all L tables with (1-p^b)^L. The low-threshold near-dup
    regime needs SHALLOW tables (small b) and many of them — the
    defaults (b=3, L=24) put the per-pair miss probability at ~5e-4
    at c = 0.45 (p ~ 0.65). Deduplicate at c >= 0.8 with b=8, L=8 for
    the same miss rate at far better selectivity.
    """
    planes = random_hyperplanes(dim, n_planes * n_tables, seed).reshape(
        n_tables, n_planes, dim
    )
    _check_dim(df, vec_col, dim)
    v0 = df.select(
        F.col(id_col).alias("id"),
        _as_double(vec_col).alias("v"),
        norm(_as_double(vec_col)).alias("nrm"),
    )
    # data-driven planes (see lsh_topk): same bucket values, small plan
    keys = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            _lsh_tables_data(
                _as_double(vec_col), _planes_lit(planes), n_tables, n_planes
            )
        ).alias("tb"),
    ).select("id", F.col("tb.tbl").alias("tbl"), F.col("tb.bk").alias("bk"))
    cand = (
        keys.alias("a")
        .join(
            keys.alias("b"),
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()  # union of candidates across tables, BEFORE the rerank
    )
    av = v0.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    bv = v0.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    return (
        cand.join(av, "id_a")
        .join(bv, "id_b")
        .select(
            "id_a", "id_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos"))
    )


def semdedup(
    df: DataFrame,
    eps: float = 0.05,
    k_clusters: int = 16,
    iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rule: str = "domination",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic
    deduplication for web-scale training data: k-means cluster the
    embeddings, then within each cluster treat points with pairwise
    cosine >= 1-eps as semantic duplicates and keep one representative.
    Unlike the near-dup pair operators (cosine_pairs/_lsh), this is a
    KEEP/DROP decision per document, the form a pipeline consumes.

    Representative rule: with ``rule='domination'`` (default — one
    parallel pass) a point is DROPPED iff some SMALLER-id point in its
    cluster is >= 1-eps similar — the keep-min-id domination rule,
    exact_dedup's analog. (The paper keeps a random or
    low-centroid-similarity member per duplicate group; its greedy
    sequential sweep is order-dependent and unparallelizable across a
    cluster, while domination is a pure pairwise predicate. On chains
    a-b-c where sim(a,c) < 1-eps this drops c too — slightly more
    aggressive than greedy, never less.) ``rule='greedy'`` runs the
    paper's sweep in deterministic id order: a point is dropped iff an
    already-KEPT smaller-id point is >= 1-eps similar. Clusters are
    executor-sized by construction (k ~ n/32), so the sweep is one
    per-cluster Arrow block; greedy keeps a superset of domination's
    keeps (asserted in tests/test_ivf.py).

    Returns (id, cluster, kept 0/1, nn_sim): nn_sim is the max cosine
    to any OTHER point of the same cluster (rounded 4; NULL for
    singleton clusters).

    Scale shape at 100 TB: k-means is the IVF coarse quantizer
    (operators/ivf.py — deterministic first-k-by-id init, one narrow
    Arrow pass per Lloyd iteration, driver state k×(dim+1) partials);
    assignment is one mapInPandas pass; the quadratic is CONFINED to
    clusters by the (list_id, id!=id) self-join — k_clusters must scale
    like n/target_cluster_size (the paper uses ~0.1% of n) so each
    cluster's pair block stays executor-sized; AQE splits skewed
    clusters. Work scales with sum of cluster sizes squared, not n².
    """
    if not (0.0 < eps < 1.0):
        raise ValueError(f"eps must be in (0, 1), got {eps}")
    if rule not in ("domination", "greedy"):
        raise ValueError(f"unknown rule {rule!r}")
    from sgdnet_spark.operators.ivf import assign_lists, kmeans_fit

    cents = kmeans_fit(df, k=k_clusters, iters=iters, vec_col=vec_col, id_col=id_col)
    x = assign_lists(df, cents, vec_col, id_col).select(
        "id", "list_id", F.col("v").cast("array<double>").alias("v")
    )
    if rule == "greedy":
        # greedy consumes the assignment frame exactly once — nothing to
        # cache (a persist here previously leaked a pinned relation per
        # call: cacheManager entries survive until explicit unpersist)
        return _semdedup_greedy(x, eps, id_col)
    # domination references x as both sides of the self-join; a LAZY
    # localCheckpoint (the text_scrub shared-detection pattern) runs the
    # Arrow assignment pass once and — unlike persist — its blocks are
    # released by the ContextCleaner when the result is GC'd, so no
    # cache entry outlives the call (asserted in tests/test_ivf.py)
    x = x.localCheckpoint(eager=False)
    # LEFT join keeps singleton clusters inline (null oid/sim row) so no
    # third reference back to x is needed to re-attach them afterwards
    p = (
        x.alias("l")
        .join(
            x.alias("r"),
            (F.col("l.list_id") == F.col("r.list_id")) & (F.col("l.id") != F.col("r.id")),
            "left",
        )
        .select(
            F.col("l.id").alias("id"),
            F.col("l.list_id").alias("list_id"),
            F.col("r.id").alias("oid"),
            cosine(F.col("l.v"), F.col("r.v")).alias("sim"),
        )
    )
    agg = p.groupBy("id", "list_id").agg(
        F.max("sim").alias("sim_raw"),
        # null oid (singleton) falls through to otherwise(0) → kept
        F.max(
            F.when((F.col("oid") < F.col("id")) & (F.col("sim") >= 1.0 - eps), 1).otherwise(0)
        ).alias("dom"),
    )
    from sgdnet_spark.operators.text import rpos

    return agg.select(
        F.col("id").alias(id_col),
        F.col("list_id").cast("int").alias("cluster"),
        (1 - F.col("dom")).cast("int").alias("kept"),
        rpos(F.col("sim_raw"), 4).alias("nn_sim"),
    )


def _semdedup_greedy(x: DataFrame, eps: float, id_col: str) -> DataFrame:
    """The paper's sequential sweep, one Arrow block per cluster: in
    ascending id order, drop a point iff an already-KEPT smaller-id
    point is >= 1-eps similar. Output schema matches the domination
    path: (id, cluster, kept, nn_sim). The per-cluster pairwise cosine
    matrix is the same quadratic the domination self-join confines —
    executor-sized because k_clusters scales with n."""
    import numpy as np
    import pandas as pd

    from sgdnet_spark.operators.text import rpos

    tau = 1.0 - eps
    id_type = dict(x.dtypes)["id"]

    def sweep(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        n = len(pdf)
        V = np.stack(pdf["v"].to_numpy())
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0] = 1.0
        U = V / norms[:, None]
        S = U @ U.T
        np.fill_diagonal(S, -np.inf)
        nn = S.max(axis=1) if n > 1 else np.full(n, np.nan)
        kept = np.ones(n, dtype=np.int32)
        kept_idx: list[int] = []
        for i in range(n):
            if kept_idx and S[i, kept_idx].max() >= tau:
                kept[i] = 0
            else:
                kept_idx.append(i)
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "list_id": pdf["list_id"],
                "kept": kept,
                "nn_raw": np.where(np.isfinite(nn), nn, np.nan),
            }
        )

    out = x.groupBy("list_id").applyInPandas(
        sweep, schema=f"id {id_type}, list_id bigint, kept int, nn_raw double"
    )
    # NaN marks singleton clusters inside the Arrow block; surface it as
    # SQL NULL to match the domination path's left-join miss
    nn = F.when(~F.isnan(F.col("nn_raw")), F.col("nn_raw"))
    return out.select(
        F.col("id").alias(id_col),
        F.col("list_id").cast("int").alias("cluster"),
        F.col("kept"),
        rpos(nn, 4).alias("nn_sim"),
    )
