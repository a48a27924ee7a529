"""Round-13 optimization profiler: per-entry and per-stage wall+CPU.

Usage:
  python tools/profile_r13.py entries [sf_dir] [name ...]   # bench entries
  python tools/profile_r13.py stages  [sf_dir]              # umbrella sub-stages
  python tools/profile_r13.py plans   [sf_dir] [name ...]   # dump explain() to plans/r13

Timing methodology matches bench.py (min-of-3 wall + process-tree CPU
delta of the best pass; .count() forcing), so numbers here are directly
comparable to the artifact of record.
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


def timed(label: str, thunk, n: int = 3) -> tuple[float, float]:
    best, best_cpu = float("inf"), -1.0
    for _ in range(n):
        c0 = _tree_cpu_sample()
        t0 = time.perf_counter()
        thunk()
        wall = time.perf_counter() - t0
        c1 = _tree_cpu_sample()
        if wall < best:
            best = wall
            if c0 and c1:
                best_cpu = _cpu_delta(c0, c1)
    print(f"{label:36s} {best:8.3f}s wall {best_cpu:9.3f}s cpu", flush=True)
    return best, best_cpu


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "stages"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = sys.argv[3:]
    spark = get_spark("profile_r13")

    from sgdnet_spark.queries import QUERIES, SUBQUERIES

    def resolve(name):
        return QUERIES.get(name) or SUBQUERIES[name]

    # one warmup pass at the smallest sf (plan/janino compile, like bench)
    warm_dir = "/root/testdata/sf0.001"

    if mode == "plans":
        os.makedirs("plans/r13", exist_ok=True)
        for name in only:
            df = resolve(name)(spark, sf_dir)
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = f"plans/r13/{name}.txt"
            with open(path, "w") as fh:
                fh.write(p)
            print(f"wrote {path} ({len(p)} bytes)")
        return

    if mode == "entries":
        names = only or [
            "ann_approx", "corpus_prep", "text_scrub", "tpch_deep",
            "glm_eval", "sketch_prefilter", "dedup_minhash_lsh",
            "decontaminate", "glm_binomial_path", "text_fingerprint",
        ]
        for name in names:
            fn = resolve(name)
            try:
                fn(spark, warm_dir).count()
            except Exception as exc:
                print(f"# warmup {name} failed: {exc}")
            timed(name, lambda fn=fn: fn(spark, sf_dir).count())
        return

    # stages: every umbrella sub-entry, individually forced
    from sgdnet_spark.queries import _CORPUS_PREP_FOLD, _TEXT_SCRUB_FOLD, _GLM_EVAL_FOLD

    for fold_name, fold in [
        ("corpus_prep", _CORPUS_PREP_FOLD),
        ("text_scrub", _TEXT_SCRUB_FOLD),
        ("glm_eval", _GLM_EVAL_FOLD),
    ]:
        print(f"== {fold_name} stages ==", flush=True)
        for entry in fold:
            tag, sub = entry[0], entry[1]
            fn = SUBQUERIES[sub]
            try:
                fn(spark, warm_dir).count()
            except Exception as exc:
                print(f"# warmup {sub} failed: {exc}")
            timed(f"{fold_name}/{tag} ({sub})", lambda fn=fn: fn(spark, sf_dir).count())


if __name__ == "__main__":
    main()
