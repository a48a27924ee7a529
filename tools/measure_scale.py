"""Measure registry entries with the all-column hash-agg forcing.

Usage: python tools/measure_scale.py <sf_dir> [name ...]   (default: all)
       python tools/measure_scale.py <sf_dir> --passes 3 name ...

The SCALE.md measurement methodology (round-8 trap note, made a
committed tool in round 9 so re-audits are reproducible):

- `.count()` is NOT a valid forcing action for operator cost: Catalyst
  prunes every computed column a count never reads, and eliminates a
  left join against a grouped aggregate outright when the join keys are
  unique — earlier count()-forced SCALE rows understated per-stage
  compute by up to 20x.
- `.collect()` conflates driver transfer with operator cost (the old
  glm_eval row downloaded 6M rows to the driver).
- The honest forcing computes EVERY output column but moves one row:
  SUM(xxhash64(all columns) % p) -> 1 row. xxhash64 consumes each
  column's value, so nothing prunes; the aggregate is map-side combined,
  so the measurement adds one narrow exchange, not a transfer.

Reports min-of-N wall plus the process-tree CPU twin of the min pass
(bench.py's sampler: robust to hypervisor steal / noisy neighbors), and
ends with one JSON line for the audit record.
"""

from __future__ import annotations

import json
import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_delta, _steal_pct, _steal_sample, _tree_cpu_sample  # noqa: E402
from sgdnet_spark.session import get_spark  # noqa: E402


def force(df) -> int:
    """Compute every column, move one row: SUM(xxhash64(cols) % p)."""
    from pyspark.sql import functions as F

    cols = []
    for name, dtype in df.dtypes:
        c = F.col(name)
        # xxhash64 handles atomic/array/struct types; maps are unordered
        # and unsupported — serialize those (and anything else exotic)
        cols.append(F.to_json(c) if dtype.startswith("map<") else c)
    n = df.select(
        (F.xxhash64(*cols) % F.lit(1_000_003)).alias("h")
    ).agg({"h": "sum"}).collect()
    return 1 if n else 0


def main() -> None:
    args = [a for a in sys.argv[1:]]
    passes = 3
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i : i + 2]
    # --warmup: run one UNRECORDED forcing pass per entry before the
    # measured passes. At 10x+ gate scale the first heavy pass in a
    # fresh JVM reads 6-18x CPU-inflated (round-10 measurement:
    # corpus_dsir sf10 pass0 9147s cpu vs pass1 851s; -Xms at full heap
    # made it WORSE and THP direct compaction is off on this host, so
    # it is JVM collector/JIT warmup, not heap growth) — min-of-N only
    # absorbs that if N is large enough that later passes dominate.
    warmup = "--warmup" in args
    if warmup:
        args.remove("--warmup")
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:]

    spark = get_spark("measure_scale")
    from sgdnet_spark.queries import QUERIES, SUBQUERIES

    registry = dict(SUBQUERIES)
    registry.update(QUERIES)  # driver keys win on collisions
    if not names:
        names = sorted(registry)
    missing = [n for n in names if n not in registry]
    if missing:
        raise SystemExit(f"unknown entries: {missing}")

    # session warmup (JVM, parquet footers, Arrow workers) — one-time
    # costs, not operator costs
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    warm = spark.range(64).repartition(32)
    warm.mapInPandas(lambda it: it, schema="id long").count()

    out = {}
    s0 = _steal_sample()
    for name in names:
        fn = registry[name]
        best, best_cpu = float("inf"), -1.0
        if warmup:
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            print(f"{name:32s} warmup {time.perf_counter() - t0:7.2f}s "
                  "(unrecorded)", flush=True)
        for _ in range(passes):
            c0 = _tree_cpu_sample()
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            wall = time.perf_counter() - t0
            c1 = _tree_cpu_sample()
            if wall < best:
                best = wall
                if c0 is not None and c1 is not None:
                    best_cpu = _cpu_delta(c0, c1)
        out[name] = {
            "wall": round(best, 2),
            "cpu": round(best_cpu, 1) if best_cpu >= 0 else None,
        }
        print(f"{name:32s} {best:7.2f}s wall  {best_cpu:8.1f}s cpu", flush=True)
    steal = _steal_pct(s0, _steal_sample())
    print(json.dumps({"sf_dir": sf_dir, "passes": passes, "warmup": warmup,
                      "forcing": "hash-agg", "steal_pct": steal,
                      "results": out}))


if __name__ == "__main__":
    main()
