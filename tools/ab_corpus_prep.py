"""Interleaved A/B: round-12 corpus_prep construction (eager scored
before a 4-pool, per-stage corpus explodes) vs the round-13 optimized
one (scored inside the overlap, shared positions relation). Both
variants run in ONE session, alternating passes, min-of-N each — the
repo's same-window measurement policy.

Usage: python tools/ab_corpus_prep.py [sf_dir] [n_passes]
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


def old_corpus_prep(spark, sf_dir):
    """The round-12 construction, verbatim semantics: eager scored
    BEFORE the pool, 4 workers, no shared positions."""
    from concurrent.futures import ThreadPoolExecutor

    import sgdnet_spark.queries as Q

    scored = Q._bm25_scored_shared(spark, sf_dir)
    shared = {"bm25": Q.bm25_retrieval, "bm25_floor": Q.bm25_floor}

    def build(entry):
        tag, sub, keys, vals = entry
        if tag in shared:
            df = shared[tag](spark, sf_dir, scored=scored)
        else:
            df = Q.SUBQUERIES[sub](spark, sf_dir)
        return Q._melt_df(df, tag, keys, vals, Q._UMBRELLA_COLS)

    with ThreadPoolExecutor(max_workers=4) as pool:
        parts = list(pool.map(build, Q._CORPUS_PREP_FOLD))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab_corpus_prep")
    import sgdnet_spark.queries as Q

    variants = [("old", old_corpus_prep), ("new", Q.corpus_prep)]
    # warmup both at sf0.001
    for _, fn in variants:
        fn(spark, "/root/testdata/sf0.001").count()
    best = {k: (float("inf"), -1.0) for k, _ in variants}
    for i in range(n):
        for name, fn in variants:
            c0 = _tree_cpu_sample()
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).count()
            w = time.perf_counter() - t0
            c1 = _tree_cpu_sample()
            cpu = _cpu_delta(c0, c1) if c0 and c1 else -1.0
            print(f"pass{i} {name}: {w:7.3f}s wall {cpu:8.2f}s cpu ({rows} rows)",
                  flush=True)
            if w < best[name][0]:
                best[name] = (w, cpu)
    for name, (w, cpu) in best.items():
        print(f"BEST {name}: {w:.3f}s wall / {cpu:.2f}s cpu", flush=True)


if __name__ == "__main__":
    main()
