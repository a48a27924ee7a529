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
) -> DataFrame:
    """Weighted PageRank with uniform dangling-mass redistribution.

    ``edges`` is a directed multigraph relation; parallel edges are
    aggregated (summing ``weight`` if given, else counting). ``nodes``
    (single-column) widens the universe beyond edge endpoints — e.g.
    hosts with no links still receive teleport mass. Returns
    (node, rank) with sum(rank) == 1.

    rank_{t+1}(v) = (1-d)/N + d * (Σ_u w(u,v)/W(u) · rank_t(u)
                                   + dangling_mass_t / N)
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    cols = [F.col(src).alias("src"), F.col(dst).alias("dst")]
    if weight:
        cols.append(F.col(weight).cast("double").alias("w"))
        agg = F.sum("w")
    else:
        agg = F.count("*").cast("double")
    ew = edges.select(*cols).groupBy("src", "dst").agg(agg.alias("w"))
    node_df = (
        nodes.toDF("node").distinct()
        if nodes is not None
        else ew.select(F.col("src").alias("node"))
        .unionByName(ew.select(F.col("dst").alias("node")))
        .distinct()
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

    ranks = node_df.select("node", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
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
            node_df.join(contrib, node_df.node == contrib.dst, "left")
            .crossJoin(dang)  # 1-row scalar aggregate join
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") / n)
                ).alias("rank"),
            )
            # constant-cost loop: without this, iteration k re-analyzes a
            # k-deep join tree (the measured superlinear BPE failure mode)
            .localCheckpoint(eager=True)
        )
    return ranks
