"""Round-13: ann_approx phase profiler — times each producer/consumer
phase SEQUENTIALLY (no thread overlap) so the per-phase cost is visible,
then the full entry (overlapped) for reference. min-of-N each, bench
methodology (count forcing, process-tree CPU twin).

Usage: python tools/profile_ann.py [sf_dir] [n_passes]
"""

from __future__ import annotations

import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "4")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_delta, _tree_cpu_sample  # noqa: E402
from sgdnet_spark.session import get_spark  # noqa: E402


def timed(label, thunk, n=3):
    best, best_cpu, out = float("inf"), -1.0, None
    for _ in range(n):
        c0 = _tree_cpu_sample()
        t0 = time.perf_counter()
        out = thunk()
        wall = time.perf_counter() - t0
        c1 = _tree_cpu_sample()
        if wall < best:
            best = wall
            if c0 and c1:
                best_cpu = _cpu_delta(c0, c1)
    print(f"{label:28s} {best:8.3f}s wall {best_cpu:9.2f}s cpu", flush=True)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("profile_ann")
    from pyspark.sql import functions as F

    import sgdnet_spark.queries as Q
    from sgdnet_spark.operators import bm25 as _bm25
    from sgdnet_spark.operators import similarity
    from sgdnet_spark.operators.ivf import ivf_topk
    from sgdnet_spark.operators.mmr import mmr_rerank
    from sgdnet_spark.operators.pq import ivfpq_topk, kmeans_pq_fit

    # warmup at sf0.001
    Q.ann_approx(spark, "/root/testdata/sf0.001").count()

    emb = Q._t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    docs = Q._t(spark, sf_dir, "documents")
    qd = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("q_text")
    )

    model = timed("kmeans_pq_fit (train)", lambda: kmeans_pq_fit(emb, k=8, m=8, ksub=16, iters=5), n)
    timed("lsh_topk", lambda: similarity.lsh_topk(emb, q, k=5).count(), n)
    timed("bm25_topk lex arm", lambda: _bm25.bm25_topk(docs, qd, 20).count(), n)
    timed(
        "opq row (train+probe)",
        lambda: ivfpq_topk(
            emb, q, k_neighbors=5, n_lists=8, nprobe=3, refine=2,
            kmeans_iters=5, train_frac=0.25, opq=True,
        ).count(),
        n,
    )
    timed(
        "ivf_topk (probe only)",
        lambda: ivf_topk(emb, q, k_neighbors=5, n_lists=8, nprobe=3, cents=model[0]).count(),
        n,
    )
    pq25 = timed(
        "pq25 re-rank (probe only)",
        lambda: ivfpq_topk(
            emb, q, k_neighbors=25, nprobe=3, refine=2, model=model, with_rank=True
        ).localCheckpoint(eager=True),
        n,
    )
    timed("mmr consumer", lambda: mmr_rerank(pq25.drop("drn", "rn"), emb, q, k_neighbors=5, lam=0.7).count(), n)
    timed("full ann_approx entry", lambda: Q.ann_approx(spark, sf_dir).count(), n)


if __name__ == "__main__":
    main()
