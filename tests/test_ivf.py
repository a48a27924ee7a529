"""IVF ANN: k-means quantizer sanity + recall vs brute force on
cluster-structured data."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sgdnet_spark.operators import ivf, similarity


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(43)
    centers = rng.normal(scale=5.0, size=(4, 8))
    rows = []
    for i in range(200):
        c = i % 4
        v = centers[c] + rng.normal(scale=0.3, size=8)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_recovers_clusters(clustered):
    cents = ivf.kmeans_fit(clustered, k=4, iters=8)
    assert cents.shape == (4, 8)
    lists = ivf.assign_lists(clustered, cents)
    # points of the same true cluster land in the same list
    rows = lists.select("id", "list_id").collect()
    by_true = {}
    for r in rows:
        by_true.setdefault(r["id"] % 4, set()).add(r["list_id"])
    assert all(len(s) == 1 for s in by_true.values())
    # and the 4 lists are distinct
    assert len({next(iter(s)) for s in by_true.values()}) == 4


def test_ivf_recall_vs_brute_force(clustered):
    q = clustered.filter(F.col("vec_id") < 4)
    bf = similarity.brute_force_topk(clustered, q, k=5)
    got_ivf = ivf.ivf_topk(clustered, q, k_neighbors=5, n_lists=4, nprobe=1, kmeans_iters=8)
    bf_pairs = {(r["query_id"], r["nbr_id"]) for r in bf.collect()}
    ivf_pairs = {(r["query_id"], r["nbr_id"]) for r in got_ivf.collect()}
    # with well-separated clusters, nprobe=1 already achieves full recall
    assert ivf_pairs == bf_pairs


def test_ivf_indexed_empty_queries(spark, sf_dir, tmp_path):
    """An empty queries frame returns an empty result instead of raising
    from a zero-argument isin() on the partition filter."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf_empty")
    ivf.write_ivf_index(emb, path, n_lists=4, kmeans_iters=2)
    got, pruned = ivf.ivf_topk_indexed(spark, path, emb.filter(F.lit(False)), k_neighbors=3)
    assert got.count() == 0
    assert pruned.count() == 0


def test_ivf_indexed_layout_prunes_partitions(spark, sf_dir, tmp_path):
    """write_ivf_index -> list-partitioned parquet; the probe's scan
    carries PartitionFilters on list_id (pruning enforced by the plan)
    and results match the in-memory ivf_topk at the same settings."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    path = str(tmp_path / "ivf_index")
    ivf.write_ivf_index(emb, path, n_lists=8, kmeans_iters=5)
    got, pruned = ivf.ivf_topk_indexed(spark, path, q, k_neighbors=5, nprobe=3)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan
    mem = ivf.ivf_topk(emb, q, k_neighbors=5, n_lists=8, nprobe=3, kmeans_iters=5)
    a = {(r["query_id"], r["nbr_id"]) for r in got.collect()}
    b = {(r["query_id"], r["nbr_id"]) for r in mem.collect()}
    assert a == b
    # the pruned read touches only the probed lists
    lists_read = {r["list_id"] for r in pruned.select("list_id").distinct().collect()}
    assert len(lists_read) <= 8


def test_ivf_null_embedding_rows_skipped(spark, clustered):
    """A NULL embedding row must not crash the Arrow kernels (np.stack
    over a batch containing None raises in every task that sees it) —
    NULL vectors have no nearest centroid and are skipped; NULL query
    vectors generate no probes."""
    withnull = clustered.union(
        spark.createDataFrame([(999, None)], "vec_id long, embedding array<float>")
    )
    cents = ivf.kmeans_fit(withnull, k=4, iters=2)
    assert cents.shape == (4, 8)
    lists = ivf.assign_lists(withnull, cents)
    assert lists.filter(F.col("id") == 999).count() == 0
    q = withnull.filter(F.col("vec_id").isin(0, 999))
    out = ivf.ivf_topk(withnull, q, k_neighbors=3, n_lists=4, kmeans_iters=2)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0}  # NULL query skipped
    assert len([r for r in rows if r["query_id"] == 0]) == 3


def test_semdedup_numpy_replay_and_planted_dup(spark):
    """semdedup == an exact numpy replay given the SAME centroids
    (kmeans_fit is deterministic): assignment by argmin distance,
    within-cluster cosines, the keep-min-id domination rule, nn_sim at
    the 1e-4 grid. A planted exact duplicate (same vector, higher id)
    must land in the same cluster and be dropped."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from sgdnet_spark.operators import similarity
    from sgdnet_spark.operators.ivf import kmeans_fit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dup_src = emb.filter(F.col("vec_id") == 3).select(
        F.lit(100000).cast("long").alias("vec_id"), "embedding", "label"
    )
    df = emb.unionByName(dup_src)
    EPS, K = 0.2, 8
    got = {r["vec_id"]: (r["cluster"], r["kept"], r["nn_sim"])
           for r in similarity.semdedup(df, eps=EPS, k_clusters=K, iters=3).collect()}

    cents = kmeans_fit(df, k=K, iters=3)
    rows = df.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.stack([np.asarray(r["embedding"], dtype=np.float32) for r in rows])
    d2 = (V.astype(np.float64)**2).sum(1)[:, None] - 2 * V.astype(np.float64) @ cents.T + (cents**2).sum(1)[None, :]
    assign = d2.argmin(1)
    Vd = V.astype(np.float64)
    norms = np.maximum(np.sqrt((Vd**2).sum(1)), 1e-150)
    for i, vid in enumerate(ids):
        same = [j for j in range(len(ids)) if assign[j] == assign[i] and j != i]
        if same:
            sims = [float(Vd[i] @ Vd[j] / (norms[i] * norms[j])) for j in same]
            nn = math.floor(max(sims) * 1e4 + 0.5) / 1e4
            dom = any(ids[j] < vid and s >= 1.0 - EPS for j, s in zip(same, sims))
        else:
            nn, dom = None, False
        assert got[int(vid)] == (int(assign[i]), 0 if dom else 1, nn), f"vec {vid}"
    # the planted duplicate: same cluster as its source, dropped, sim 1.0
    c3, k3, _ = got[3]
    cd, kd, sd = got[100000]
    assert cd == c3 and k3 == 1 and kd == 0 and sd == 1.0
    with pytest.raises(ValueError):
        similarity.semdedup(df, eps=0.0)


def test_semdedup_greedy_rule(spark):
    """rule='greedy' (the paper's sequential per-cluster sweep): exact
    python replay of the id-order sweep; greedy keeps a SUPERSET of
    domination's keeps (domination is never less aggressive); singleton
    clusters carry NULL nn_sim; and a planted chain a-b-c (sim(a,b) and
    sim(b,c) >= 1-eps but sim(a,c) < 1-eps) shows the divergence:
    greedy keeps c (b, its only similar predecessor, was dropped) while
    domination drops it."""
    import numpy as np
    from pyspark.sql import functions as F

    from sgdnet_spark.operators import similarity
    from sgdnet_spark.operators.ivf import kmeans_fit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dup_src = emb.filter(F.col("vec_id") == 3).select(
        F.lit(100000).cast("long").alias("vec_id"), "embedding", "label"
    )
    df = emb.unionByName(dup_src)
    EPS, K = 0.2, 8
    greedy = {r["vec_id"]: (r["cluster"], r["kept"], r["nn_sim"])
              for r in similarity.semdedup(
                  df, eps=EPS, k_clusters=K, iters=3, rule="greedy").collect()}
    dom = {r["vec_id"]: (r["cluster"], r["kept"], r["nn_sim"])
           for r in similarity.semdedup(
               df, eps=EPS, k_clusters=K, iters=3).collect()}

    # same universe, same clusters, same nn_sim; greedy keeps >= dom keeps
    assert set(greedy) == set(dom)
    for vid in dom:
        assert greedy[vid][0] == dom[vid][0], vid
        assert greedy[vid][2] == dom[vid][2], vid
        if dom[vid][1] == 1:
            assert greedy[vid][1] == 1, vid  # dom keeps => greedy keeps

    # exact python replay of the sweep on the same assignment
    cents = kmeans_fit(df, k=K, iters=3)
    rows = df.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.stack([np.asarray(r["embedding"], dtype=np.float32) for r in rows])
    d2 = ((V.astype(np.float64) ** 2).sum(1)[:, None]
          - 2 * V.astype(np.float64) @ cents.T + (cents ** 2).sum(1)[None, :])
    assign = d2.argmin(1)
    Vd = V.astype(np.float64)
    norms = np.maximum(np.sqrt((Vd ** 2).sum(1)), 1e-150)
    U = Vd / norms[:, None]
    for c in set(assign):
        members = sorted(
            [i for i in range(len(ids)) if assign[i] == c],
            key=lambda i: ids[i],
        )
        kept_idx = []
        for i in members:
            if kept_idx and max(float(U[i] @ U[j]) for j in kept_idx) >= 1 - EPS:
                assert greedy[int(ids[i])][1] == 0, ids[i]
            else:
                kept_idx.append(i)
                assert greedy[int(ids[i])][1] == 1, ids[i]

    # planted chain in one tight cluster: b dup-of-a, c dup-of-b, a-c far
    base = np.zeros(8); base[0] = 1.0
    mid = np.array([np.cos(0.45), np.sin(0.45), 0, 0, 0, 0, 0, 0])
    far = np.array([np.cos(0.9), np.sin(0.9), 0, 0, 0, 0, 0, 0])
    chain = spark.createDataFrame(
        [(1, [float(x) for x in base]),
         (2, [float(x) for x in mid]),
         (3, [float(x) for x in far])],
        ["vec_id", "embedding"],
    )
    eps = 1 - np.cos(0.5)  # tau ~ cos(0.5): a-b and b-c similar, a-c not
    g = {r["vec_id"]: r["kept"] for r in similarity.semdedup(
        chain, eps=float(eps), k_clusters=1, iters=1, rule="greedy").collect()}
    d = {r["vec_id"]: r["kept"] for r in similarity.semdedup(
        chain, eps=float(eps), k_clusters=1, iters=1).collect()}
    assert g == {1: 1, 2: 0, 3: 1}      # greedy: c survives (b was dropped)
    assert d == {1: 1, 2: 0, 3: 0}      # domination: c dropped too
    with pytest.raises(ValueError, match="rule"):
        similarity.semdedup(chain, rule="nope")


def test_semdedup_leaves_no_cached_relation(spark):
    """Round-9 advice: semdedup used to persist its assignment frame and
    never unpersist — a pinned cacheManager entry per call. Both rules
    must now leave the cacheManager exactly as they found it (the
    domination path's shared scan uses a lazy localCheckpoint, whose
    blocks the ContextCleaner releases on GC instead)."""
    import numpy as np

    rng = np.random.default_rng(7)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(40)],
        ["vec_id", "embedding"],
    )
    # start from a clean cacheManager: earlier tests in a shared session
    # may legitimately hold cache entries (caches are performance-only,
    # so dropping them never affects their correctness)
    spark.catalog.clearCache()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty()
    for rule in ("domination", "greedy"):
        similarity.semdedup(df, eps=0.3, k_clusters=2, iters=2, rule=rule).count()
    assert cm.isEmpty()


def test_ivf_distributed_query_path_matches_driver(spark, sf_dir):
    """Round 11: ivf_topk's two-path query handling — a query set over
    the inline cap builds probe relations executor-side and returns
    rows identical to the driver path (shared float-parity helper)."""
    from pyspark.sql import functions as F

    from sgdnet_spark.operators.ivf import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q_all = emb  # 500 queries > the 64 default
    kw = dict(k_neighbors=5, n_lists=8, nprobe=3, kmeans_iters=2)
    a = {
        tuple(r)
        for r in ivf_topk(emb, q_all, max_inline_queries=1000, **kw).collect()
    }
    b = {
        tuple(r)
        for r in ivf_topk(emb, q_all, max_inline_queries=64, **kw).collect()
    }
    assert a == b
    assert len({q for q, _, _ in b}) == emb.count()


def test_ivf_indexed_distributed_matches_and_prunes(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from sgdnet_spark.operators.ivf import ivf_topk_indexed, write_ivf_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf_dist")
    write_ivf_index(emb, path, n_lists=8, kmeans_iters=2)
    want, _ = ivf_topk_indexed(
        spark, path, emb, k_neighbors=5, nprobe=3, max_inline_queries=1000
    )
    got, pruned = ivf_topk_indexed(
        spark, path, emb, k_neighbors=5, nprobe=3, max_inline_queries=64
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan
    assert {tuple(r) for r in want.collect()} == {tuple(r) for r in got.collect()}
    # all-NULL truncated query set: typed empty result, no isin() crash
    nulls = emb.select(
        "vec_id", F.lit(None).cast("array<float>").alias("embedding")
    ).limit(70)
    out, pr = ivf_topk_indexed(spark, path, nulls, k_neighbors=3, max_inline_queries=64)
    assert out.count() == 0 and pr.count() == 0


def test_ivf_filtered_probe_pushdown_matches_bruteforce(spark, sf_dir, tmp_path):
    """where= on the IVF index (round-11 symmetry with pq): predicate
    pushes into the vectors scan next to the list pruning; with
    nprobe=n_lists results equal brute force over the survivors."""
    from sgdnet_spark.operators.ivf import ivf_topk_indexed, write_ivf_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf_meta")
    write_ivf_index(emb, path, n_lists=4, kmeans_iters=2, meta_cols=["label"])
    q = emb.filter(F.col("vec_id") < 10)
    got, pruned = ivf_topk_indexed(
        spark, path, q, k_neighbors=5, nprobe=4, where="label = 1"
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan
    assert "PushedFilters" in plan and "label" in plan
    surv = emb.filter(F.col("label") == 1)
    want = similarity.brute_force_topk(surv, q, k=5)
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in want.collect()}
    assert a == b and len(a) > 0
