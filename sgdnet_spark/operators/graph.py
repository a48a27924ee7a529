"""Distributed graph centrality over Zipf-small entity graphs.

PageRank as a corpus quality prior: web-scale training-data pipelines
(Common Crawl curation) rank HOSTS by link centrality and use the rank
as a per-source quality signal for downstream sampling/mixing (the
operators/sampling.py tier consumes it as a weight). The scale shape:
the host graph is Zipf-SMALL relative to the corpus (n_hosts << n_docs),
so ONE corpus pass builds the weighted (src, dst, w) edge relation and
every iteration after that runs on the edge relation only — the classic
Spark iterative-join PageRank, never touching the corpus again.

Each iteration is one edge⋈rank join + one groupBy(dst) shuffle; the
rank relation is node-sized. Iterations localCheckpoint (the BPE-loop
precedent: plain persist leaves Catalyst re-analyzing a k-deep plan
tree, superlinear in the iteration count). PageRank's update is a
damping-contraction (factor d < 1), so cross-engine float-ordering
drift SHRINKS across iterations instead of amplifying — which is what
lets a fixed-iteration run be value-checked against an engine twin.

Reference scope: jolars/sgdnet has no graph tier; this extends the
training-pipeline surface the same way dedup/sampling/scrub do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: float = 0.85,
    n_iter: int = 15,
    nodes: DataFrame | None = None,
    solver: str = "auto",
    local_budget_edges: int = 2_000_000,
    teleport: DataFrame | None = None,
) -> DataFrame:
    """Weighted PageRank with uniform dangling-mass redistribution,
    plus the PERSONALIZED variant via ``teleport``.

    ``edges`` is a directed multigraph relation; parallel edges are
    aggregated (summing ``weight`` if given, else counting). ``nodes``
    (single-column) widens the universe beyond edge endpoints — e.g.
    hosts with no links still receive teleport mass. Returns
    (node, rank) with sum(rank) == 1.

    rank_{t+1}(v) = (1-d)·t(v) + d * (Σ_u w(u,v)/W(u) · rank_t(u)
                                      + dangling_mass_t · t(v))

    where t is the teleport distribution: uniform 1/N by default, or —
    the domain-weighted curation variant a Common-Crawl pipeline runs
    (rank hosts RELATIVE to a trusted seed set) — the ``teleport``
    relation normalized over the node universe. ``teleport`` is a
    1-column frame (seed nodes, uniform over the set) or a 2-column
    (node, weight) frame; its nodes widen the universe like ``nodes``,
    and non-seed nodes get teleport mass 0 (they can still earn rank
    through in-links from the seed neighborhood — that is the point).
    Dangling mass redistributes by t as well (the standard PPR choice),
    and the iteration starts from t, so uniform-teleport output is
    IDENTICAL to the classic form.

    ``solver``: 'auto' (the BPE/GLM collect-budget precedent) counts the
    AGGREGATED edge relation once — when it fits ``local_budget_edges``
    the power iteration runs driver-side in numpy (a 20-host graph costs
    microseconds per iteration; the distributed loop's fixed ~0.5 s
    checkpoint cost per iteration is pure overhead there), otherwise the
    distributed edge⋈rank loop runs. 'local'/'distributed' force a path.
    Both solvers apply the identical update; equality is asserted in
    tests/test_graph.py.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if solver not in ("auto", "local", "distributed"):
        raise ValueError(f"unknown solver {solver!r}")
    tdf = None
    if teleport is not None:
        tc = teleport.columns
        if len(tc) == 1:
            tdf = teleport.select(
                F.col(tc[0]).alias("node"), F.lit(1.0).alias("tw")
            )
        elif len(tc) == 2:
            tdf = teleport.select(
                F.col(tc[0]).alias("node"),
                F.col(tc[1]).cast("double").alias("tw"),
            )
        else:
            raise ValueError(
                "teleport must have 1 (seed set) or 2 (node, weight) columns"
            )
        # seed-set-sized: aggregate dup nodes, drop non-positive weights
        tdf = (
            tdf.groupBy("node").agg(F.sum("tw").alias("tw"))
            .filter(F.col("tw") > 0)
            .localCheckpoint(eager=True)
        )
        # one job validates AND fetches the normalizer (previously two)
        n_tw, tw_sum = tdf.agg(F.count("*"), F.sum("tw")).collect()[0]
        if n_tw == 0:
            raise ValueError("teleport has no positive-weight nodes")
        tw_sum = float(tw_sum)
    cols = [F.col(src).alias("src"), F.col(dst).alias("dst")]
    if weight:
        cols.append(F.col(weight).cast("double").alias("w"))
        agg = F.sum("w")
    else:
        agg = F.count("*").cast("double")
    ew = edges.select(*cols).groupBy("src", "dst").agg(agg.alias("w"))
    # checkpoint BEFORE deriving node_df / counting, so the upstream
    # corpus pass runs exactly once on EVERY path: node_df (endpoints
    # union), the budget count, outw/trans, and inw all re-derive from
    # this node-graph-sized relation instead of re-running the raw plan
    ew = ew.localCheckpoint(eager=True)
    # nodes= WIDENS the universe (docstring contract): union with edge
    # endpoints rather than replacing them — a nodes frame that omitted
    # an endpoint would otherwise crash the local solver (missing index)
    # and silently leak rank mass out of the distributed one
    endpoints = (
        ew.select(F.col("src").alias("node"))
        .unionByName(ew.select(F.col("dst").alias("node")))
    )
    if nodes is not None:
        endpoints = endpoints.unionByName(nodes.toDF("node"))
    if tdf is not None:
        endpoints = endpoints.unionByName(tdf.select("node"))
    node_df = endpoints.distinct()
    if solver != "distributed":
        n_edges = ew.count()
        if solver == "local" or n_edges <= local_budget_edges:
            return _pagerank_local(
                edges.sparkSession, ew, node_df, damping, n_iter, tdf
            )

    node_df = node_df.localCheckpoint(eager=True)
    n = node_df.count()
    # normalized transition weights: one small self-join, reused by
    # every iteration (node-graph-sized, persisted once)
    outw = ew.groupBy("src").agg(F.sum("w").alias("ow"))
    trans = (
        ew.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("p"))
        .localCheckpoint(eager=True)
    )
    # dangling nodes (no out-edges) redistribute their mass uniformly;
    # precomputed once, node-sized
    dangling = node_df.join(
        trans.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
    ).localCheckpoint(eager=True)

    # per-node teleport mass t(v): the uniform literal for classic
    # PageRank (identical plan/values to the pre-teleport form), or the
    # normalized seed-set relation joined over the universe — node-sized,
    # checkpointed once, reused by every iteration
    if tdf is None:
        node_t = node_df.select("node", F.lit(1.0 / n).alias("t"))
    else:
        node_t = node_df.join(tdf, "node", "left").select(
            "node",
            (F.coalesce(F.col("tw"), F.lit(0.0)) / F.lit(tw_sum)).alias("t"),
        )
    node_t = node_t.localCheckpoint(eager=True)

    ranks = node_t.select("node", F.col("t").alias("rank"))
    for _ in range(n_iter):
        dang = dangling.join(ranks, "node").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        contrib = (
            trans.join(ranks, trans.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("rank")).alias("c"))
        )
        ranks = (
            node_t.join(contrib, node_t.node == contrib.dst, "left")
            .crossJoin(dang)  # 1-row scalar aggregate join
            .select(
                "node",
                (
                    F.lit(1.0 - damping) * F.col("t")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("dm") * F.col("t")
                    )
                ).alias("rank"),
            )
            # constant-cost loop: without this, iteration k re-analyzes a
            # k-deep join tree (the measured superlinear BPE failure mode)
            .localCheckpoint(eager=True)
        )
    return ranks


def _pagerank_local(spark, ew: DataFrame, node_df: DataFrame, damping: float,
                    n_iter: int, tdf: DataFrame | None = None) -> DataFrame:
    """Driver-side numpy power iteration on a collected (src, dst, w)
    edge relation — the exact same fixed-iteration update as the
    distributed loop (asserted equal in tests). Used when the AGGREGATED
    edge relation fits the collect budget: iterations on a Zipf-small
    entity graph are vocabulary-sized, so per-iteration JVM job overhead
    dominates the distributed loop at any corpus scale. ``tdf`` is the
    pre-aggregated positive-weight (node, tw) teleport relation
    (seed-set-sized, collected alongside the edges)."""
    import numpy as np

    edges = ew.collect()
    node_rows = [r[0] for r in node_df.collect()]
    idx = {v: i for i, v in enumerate(sorted(node_rows, key=str))}
    n = len(idx)
    if n == 0:
        return node_df.select("node", F.lit(0.0).alias("rank"))
    # sparse matvec over edge arrays — O(edges) memory and per-iteration
    # work (a dense n x n matrix would be quadratic in nodes, which the
    # edge budget does NOT bound)
    si = np.array([idx[r_["src"]] for r_ in edges], dtype=np.int64)
    ti = np.array([idx[r_["dst"]] for r_ in edges], dtype=np.int64)
    w = np.array([r_["w"] for r_ in edges], dtype=np.float64)
    outw = np.zeros(n)
    np.add.at(outw, si, w)
    dangling = outw == 0
    p = w / outw[si]
    if tdf is None:
        t = np.full(n, 1.0 / n)
    else:
        t = np.zeros(n)
        for r_ in tdf.collect():  # seed-set-sized
            t[idx[r_["node"]]] = r_["tw"]
        t /= t.sum()
    r = t.copy()
    for _ in range(n_iter):
        contrib = np.zeros(n)
        np.add.at(contrib, ti, p * r[si])
        r = (1.0 - damping) * t + damping * (contrib + r[dangling].sum() * t)
    rows = [(v, float(r[i])) for v, i in idx.items()]
    out_df = spark.createDataFrame(rows, ["node", "rank"])
    # preserve the distributed path's node column type (createDataFrame
    # would otherwise infer e.g. string for ids that were int upstream)
    return out_df.select(
        F.col("node").cast(dict(node_df.dtypes)["node"]).alias("node"), "rank"
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    n_iter: int = 15,
    nodes: DataFrame | None = None,
    solver: str = "auto",
    local_budget_edges: int = 2_000_000,
) -> DataFrame:
    """Weighted HITS hubs/authorities (Kleinberg 1999) — the OTHER
    classic link-centrality prior a curation pipeline consumes: an
    AUTHORITY is a source many good hubs cite (quality-by-citation);
    a HUB cites many good authorities (a curator/aggregator signal).
    Returns (node, hub, auth), each vector L2-normalized.

    Per iteration (the standard mutually-recursive update, weighted):

        auth(v) = Σ_{u→v} w(u,v)·hub(u)   then  auth /= ||auth||₂
        hub(u)  = Σ_{u→v} w(u,v)·auth(v)  then  hub  /= ||hub||₂

    starting from hub = 1/√n over the node universe. Like pagerank,
    the fixed-iteration power update is value-checkable cross-engine:
    normalization keeps scale pinned and the non-principal components
    decay geometrically, so drift contracts. Edge aggregation, the
    nodes= universe-widening contract, the collect-budget solver='auto'
    split, the per-iteration localCheckpoint, and the both-solvers-
    equal assertion all follow pagerank above.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if solver not in ("auto", "local", "distributed"):
        raise ValueError(f"unknown solver {solver!r}")
    cols = [F.col(src).alias("src"), F.col(dst).alias("dst")]
    if weight:
        cols.append(F.col(weight).cast("double").alias("w"))
        agg = F.sum("w")
    else:
        agg = F.count("*").cast("double")
    ew = edges.select(*cols).groupBy("src", "dst").agg(agg.alias("w"))
    ew = ew.localCheckpoint(eager=True)
    endpoints = (
        ew.select(F.col("src").alias("node"))
        .unionByName(ew.select(F.col("dst").alias("node")))
    )
    if nodes is not None:
        endpoints = endpoints.unionByName(nodes.toDF("node"))
    node_df = endpoints.distinct()
    if solver != "distributed":
        n_edges = ew.count()
        if solver == "local" or n_edges <= local_budget_edges:
            return _hits_local(edges.sparkSession, ew, node_df, n_iter)

    node_df = node_df.localCheckpoint(eager=True)
    n = node_df.count()
    if n == 0:  # empty universe: match _hits_local's graceful empty
        return node_df.select(
            "node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("auth")
        )
    hub = node_df.select("node", F.lit(1.0 / n**0.5).alias("s"))

    def _half(vec: DataFrame, edge_from: str, edge_to: str) -> DataFrame:
        """One weighted-sum + L2-normalize half-step: score flows from
        ``edge_from`` endpoints to ``edge_to`` endpoints."""
        raw = (
            ew.join(vec, ew[edge_from] == vec.node)
            .groupBy(edge_to)
            .agg(F.sum(F.col("w") * F.col("s")).alias("r"))
        )
        out = node_df.join(
            raw, node_df.node == raw[edge_to], "left"
        ).select("node", F.coalesce(F.col("r"), F.lit(0.0)).alias("r"))
        # 1-row scalar normalizer join (the pagerank dangling-mass shape);
        # NULLIF-style guard: an edgeless graph keeps all-zero scores
        nrm = out.agg(F.sqrt(F.sum(F.col("r") * F.col("r"))).alias("z"))
        return (
            out.crossJoin(nrm)
            .select(
                "node",
                F.when(F.col("z") > 0, F.col("r") / F.col("z"))
                .otherwise(F.lit(0.0))
                .alias("s"),
            )
            # constant-cost loop (the pagerank/BPE precedent)
            .localCheckpoint(eager=True)
        )

    auth = None
    for _ in range(n_iter):
        auth = _half(hub, "src", "dst")
        hub = _half(auth, "dst", "src")
    return (
        hub.select("node", F.col("s").alias("hub"))
        .join(auth.select("node", F.col("s").alias("auth")), "node")
    )


def _hits_local(spark, ew: DataFrame, node_df: DataFrame, n_iter: int) -> DataFrame:
    """Driver-side numpy HITS on the collected edge relation — the
    identical update as the distributed loop (asserted equal in
    tests); used under the pagerank collect budget."""
    import numpy as np

    edges = ew.collect()
    node_rows = [r[0] for r in node_df.collect()]
    idx = {v: i for i, v in enumerate(sorted(node_rows, key=str))}
    n = len(idx)
    if n == 0:
        return node_df.select(
            "node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("auth")
        )
    si = np.array([idx[r_["src"]] for r_ in edges], dtype=np.int64)
    ti = np.array([idx[r_["dst"]] for r_ in edges], dtype=np.int64)
    w = np.array([r_["w"] for r_ in edges], dtype=np.float64)
    hub = np.full(n, 1.0 / np.sqrt(n))
    auth = np.zeros(n)
    for _ in range(n_iter):
        auth = np.zeros(n)
        np.add.at(auth, ti, w * hub[si])
        z = np.sqrt((auth**2).sum())
        auth = auth / z if z > 0 else auth
        hub = np.zeros(n)
        np.add.at(hub, si, w * auth[ti])
        z = np.sqrt((hub**2).sum())
        hub = hub / z if z > 0 else hub
    rows = [(v, float(hub[i]), float(auth[i])) for v, i in idx.items()]
    out_df = spark.createDataFrame(rows, ["node", "hub", "auth"])
    return out_df.select(
        F.col("node").cast(dict(node_df.dtypes)["node"]).alias("node"),
        "hub",
        "auth",
    )
