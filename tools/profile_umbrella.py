"""Round-13: umbrella build-vs-action split profiler.

For each umbrella (corpus_prep, text_scrub, glm_eval, ann_approx) time
(a) plan CONSTRUCTION (eager fits/collects/checkpoints inside the
builder) and (b) the forcing ACTION (.count()), min-of-3, after one
sf0.001 warmup — so we can see whether driver-side build latency or
the final union job dominates the bench entry.

Usage: python tools/profile_umbrella.py [sf_dir] [name ...]
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or ["corpus_prep", "text_scrub", "glm_eval", "ann_approx"]
    spark = get_spark("profile_umbrella")
    from sgdnet_spark.queries import QUERIES

    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        fn = QUERIES[name]
        try:
            fn(spark, warm_dir).count()
        except Exception as exc:
            print(f"# warmup {name} failed: {exc}")
        best = (float("inf"),) * 3
        best_cpu = -1.0
        for _ in range(3):
            c0 = _tree_cpu_sample()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            c1 = _tree_cpu_sample()
            if t2 - t0 < best[0]:
                best = (t2 - t0, t1 - t0, t2 - t1)
                if c0 and c1:
                    best_cpu = _cpu_delta(c0, c1)
        print(
            f"{name:14s} total {best[0]:7.3f}s = build {best[1]:7.3f}s "
            f"+ action {best[2]:7.3f}s   ({best_cpu:.1f}s cpu)",
            flush=True,
        )


if __name__ == "__main__":
    main()
