"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

# cap driver-side BLAS to ONE thread before numpy loads (round 14; see
# session.cap_blas_threads): the GLM solver kernels are small-matrix ops
# where even the 2-thread OpenBLAS path spin-waits 2.3x the CPU for more
# wall — on a loaded 32-core driver that spin is what the round-13
# artifact recorded as the glm_binomial_path wall regression. Python
# UDF workers pin their own OMP_NUM_THREADS (verified =1), so executor
# parallelism is untouched. Not a measurement change: the timed queries,
# their order, and the forcing action are identical.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sgdnet_spark.session import get_spark  # noqa: E402

def _glm_gaussian_bench(spark, sf_dir):
    """The round-1 benchmark workload, kept stable for cross-round
    comparability: full 50-lambda elastic-net gaussian path on 5
    features. (The registry's glm_gaussian_path is the lighter
    oracle-verified ridge variant; this measures engine throughput on
    the heavier fit.)"""
    from sgdnet_spark.glm import sgdnet
    from sgdnet_spark.queries import FEATURE_NAMES, feature_frame

    fit = sgdnet(feature_frame(spark, sf_dir), FEATURE_NAMES, "y",
                 family="gaussian", alpha=0.5, nlambda=50)
    return fit.path_frame(spark)


def _glm_mgaussian_bench(spark, sf_dir):
    """The rounds-1/2 mgaussian benchmark workload (20-lambda group
    lasso on 4 features x 2 targets), kept stable for cross-round
    comparability after the registry entry switched to the
    oracle-verified ridge variant in round 3."""
    from sgdnet_spark.glm import sgdnet
    from sgdnet_spark.queries import feature_frame

    fit = sgdnet(feature_frame(spark, sf_dir),
                 ["l_discount", "l_tax", "x_month", "x_qty_disc"],
                 ["y", "l_quantity"], family="mgaussian", alpha=1.0, nlambda=20)
    return fit.path_frame(spark)


# names resolve in QUERIES (then SUBQUERIES) unless an explicit callable
# is given
HEADLINERS: list[str | tuple[str, object]] = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "top_n_per_group",
    "events_windowed",
    "asof_purchase_click",
    "rollup_revenue",
    "feature_stats",
    "lambda_path",
    ("glm_gaussian_path", _glm_gaussian_bench),
    "glm_binomial_path",
    ("glm_mgaussian_path", _glm_mgaussian_bench),
    "dedup_minhash_lsh",
    "ann_topk_bruteforce",
    "text_quality",
    "text_fingerprint",
]

# round-7 additions: the most expensive registered workloads that were
# previously unmetered in the artifact of record. Kept OUT of the
# r1-comparable set (they did not exist in round 1); the JSON reports
# both the full total and the r1-comparable subtotal.
HEADLINERS_R7: list[str] = [
    "sketch_prefilter",  # bloom prefilter + CMS heavy hitters, exact-verified
    "decontaminate",     # benchmark k-gram scrub (sub-entry of text_scrub)
]

# round-8 additions: the most expensive registered umbrellas, previously
# absent from the artifact of record. Also outside the r1-comparable set.
HEADLINERS_R8: list[str] = [
    "tpch_deep",   # 17 TPC-H join trees melted to one long-format frame
    "glm_eval",    # predict/class/score/cv GLM evaluation surface
]

# round-10 additions: the two remaining heavyweight umbrellas, the
# LLM-pipeline workloads the artifact of record never metered. Outside
# the r1-comparable set, and in their own round-robin after the r8 one
# (same cache/JIT-pollution rationale).
HEADLINERS_R10: list[str] = [
    "corpus_prep",  # sample/pack/semdedup/bpe/rank/dsir/qfilter/fuzzy/cbal/whiten
    "text_scrub",   # 8-stage scrub tier sharing one ExactSubstr detection
    "ann_approx",   # lsh + ivf + ivfpq ANN paths (ivfpq new mid-round-10)
]


def _tree_cpu_sample() -> dict[int, float] | None:
    """Per-PID CPU seconds (utime+stime) of this process and every live
    descendant — the python driver, the single local-mode JVM, and any
    pyspark.daemon workers. Per-query deltas of these samples are the
    contention-robust twin of wall time: hypervisor steal and noisy
    neighbors inflate wall clock but not CPU actually consumed. Costs
    one /proc walk (no Spark UI listener, whose event bus measurably
    slows CPU-heavy stages). Returns None on non-/proc platforms."""
    try:
        me = os.getpid()
        children: dict[int, list[int]] = {}
        stats: dict[int, float] = {}
        tick = os.sysconf("SC_CLK_TCK")
        for pid_s in os.listdir("/proc"):
            if not pid_s.isdigit():
                continue
            try:
                with open(f"/proc/{pid_s}/stat") as fh:
                    parts = fh.read().rsplit(") ", 1)[1].split()
                ppid = int(parts[1])
                utime, stime = int(parts[11]), int(parts[12])
            except (OSError, IndexError, ValueError):
                continue
            pid = int(pid_s)
            children.setdefault(ppid, []).append(pid)
            stats[pid] = (utime + stime) / tick
        out: dict[int, float] = {}
        frontier = [me]
        while frontier:
            pid = frontier.pop()
            out[pid] = stats.get(pid, 0.0)
            frontier.extend(children.get(pid, []))
        return out
    except Exception:
        return None


def _cpu_delta(c0: dict[int, float], c1: dict[int, float]) -> float:
    """CPU seconds consumed between two _tree_cpu_sample() snapshots,
    summed per-PID and clamped at zero. A whole-tree total can go
    NEGATIVE when Spark reaps idle Python UDF workers between samples
    (their accumulated CPU vanishes from the second sum); per-PID
    max(0, delta) over the union of PIDs retains every surviving
    process's consumption and only undercounts by what a reaped worker
    burned after the first sample — it can never report less work than
    a surviving process actually did."""
    total = 0.0
    for pid, v1 in c1.items():
        total += max(0.0, v1 - c0.get(pid, 0.0))
    return total


# Fixed-workload calibration probe (round 9). BENCH_NOTES.md records
# same-code r1-comparable subtotals spreading 9.90 -> 11.12 s at ~0%
# steal: neighbor cache pollution inflates wall clock in a way the
# steal gauge cannot see. The probe is a constant CPU-bound workload —
# a hash-aggregate over generated data, no I/O, no sf dependence —
# metered before and after the suite; its ratio against the pinned
# clean-window reference gives every artifact an internal noise
# yardstick: probe ~1.0 = trust the walls; probe >> 1.0 = the window
# was dirty even if steal_pct reads clean.
_PROBE_N = 500_000_000
# Code fallback only — the reference of record lives per-host in
# BASELINE.json["probe_ref_sec_by_host"] (round-10: a code-pinned
# constant silently misreads on any other hardware, and the round-9 pin
# already had to be corrected once, 0.32 -> 0.23, after a polluted
# window). Current pin: the round-9 re-baseline window (steal 0.16%,
# probes 0.227/0.230 before/after the full suite) — the cleanest
# observed steady state. Dirty windows during round 9 read 0.32-0.38.
_PROBE_REF_FALLBACK_SEC = 0.23


def _probe_ref() -> tuple[float, str]:
    """(reference seconds, provenance) for the calibration ratio:
    BASELINE.json's per-host pin when this host has one, else the code
    fallback — so a hardware change shows up as provenance in the
    artifact instead of a silently wrong ratio."""
    import platform

    host = platform.node()
    try:
        with open(os.path.join(os.path.dirname(__file__), "BASELINE.json")) as fh:
            by_host = json.load(fh).get("probe_ref_sec_by_host", {})
        if host in by_host:
            return float(by_host[host]), f"BASELINE.json[{host}]"
    except (OSError, ValueError, TypeError):
        pass
    return _PROBE_REF_FALLBACK_SEC, f"code-fallback (host {host} unpinned)"


def _calibration_probe(spark, n_iter: int = 3) -> float:
    """Min-of-n wall of the fixed hash-agg workload (seconds)."""
    from pyspark.sql import functions as F

    best = float("inf")
    for _ in range(n_iter):
        t0 = time.perf_counter()
        spark.range(0, _PROBE_N, 1, 32).select(
            (F.xxhash64("id") % 1_000_003).alias("h")
        ).agg(F.sum("h")).collect()
        best = min(best, time.perf_counter() - t0)
    return best


def _steal_sample() -> tuple[int, int] | None:
    """(steal_ticks, total_ticks) from /proc/stat's aggregate cpu line.
    Deltas of two samples give the hypervisor-steal share of the window —
    the signal that distinguishes a slow query from a noisy host.
    Returns None on non-/proc platforms or kernels without the field."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        if parts[0] != "cpu" or len(parts) < 9:
            return None
        vals = [int(x) for x in parts[1:]]
        return vals[7], sum(vals)
    except (OSError, ValueError, IndexError):
        return None


def _steal_pct(s0, s1) -> float | None:
    if s0 is None or s1 is None or s1[1] <= s0[1]:
        return None
    return round(100.0 * (s1[0] - s0[0]) / (s1[1] - s0[1]), 2)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # parse (and validate) the scale factor BEFORE the multi-minute run:
    # a path without an 'sfN' suffix must not throw at report time and
    # discard the completed benchmark's one JSON output line
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        print(f"# warning: no sfN suffix in {sf_dir}; reporting sf=-1", file=sys.stderr)
        sf = -1.0
    # Task-time capture needs the Spark UI, whose listener bus measurably
    # inflates CPU-heavy 32-task stages (~1.6x total at sf0.1 measured) —
    # so it is OPT-IN for diagnostics, never the default bench config:
    #   SPARK_GRAFT_UI=true python bench.py
    spark = get_spark("sgdnet_spark_bench")

    from sgdnet_spark.queries import QUERIES, SUBQUERIES

    def _resolve(name: str):
        return QUERIES.get(name) or SUBQUERIES[name]

    # warm the JVM + parquet footers + Python UDF workers + local-relation
    # conversion (all one-time session costs, not per-query work)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    warm = spark.range(64).repartition(32)
    warm.mapInPandas(lambda it: it, schema="id long").count()
    spark.createDataFrame([{"a": 1}], schema="a long").count()
    # warm whole-stage-codegen/Janino for every headliner against the
    # smallest scale factor: the generated source depends on the plan
    # shape, not the input path, so the compiled classes are cache hits
    # when the timed iterations run — first-call compiles of the big
    # expression trees (32-hash minhash signatures, winnow windows)
    # otherwise stall all 32 tasks for seconds and leak into min-of-N
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for item in HEADLINERS + HEADLINERS_R7 + HEADLINERS_R8 + HEADLINERS_R10:
            name, fn = item if isinstance(item, tuple) else (item, _resolve(item))
            try:
                fn(spark, warm_dir).count()
            except Exception as exc:  # warmup must never kill the bench
                print(f"# warmup {name} skipped: {exc}", file=sys.stderr)

    # four ROUND-ROBIN passes over the whole suite, report each query's
    # min (steady-state engine cost; the first pass carries one-time plan
    # compilation / page-cache warmup). Round-robin rather than
    # consecutive per-query samples because this host shows multi-second
    # hypervisor-steal bursts (/proc/stat steal jumps under load): with
    # back-to-back samples one burst poisons EVERY sample of the query it
    # lands on, while round-robin separates a query's samples by a full
    # suite pass (~10s+), so the min is taken across well-separated quiet
    # windows; the cpu_time_sec twin is the contention-robust cross-check
    resolved = [
        (item if isinstance(item, tuple) else (item, _resolve(item)))
        for item in HEADLINERS + HEADLINERS_R7
    ]
    # the round-8 umbrellas (~10 s/pass of join trees and CV fits) are
    # metered in their OWN round-robin AFTER the comparable set: folding
    # them into the same loop measurably inflated the original entries'
    # min-of-4 (r1-comparable 9.84 s vs 8.9-9.4 quiet, CPU twins up
    # 15-20% on a 0.04%-steal window — cache/JIT pollution between
    # samples), which would have broken cross-round comparability
    resolved_r8 = [(n, _resolve(n)) for n in HEADLINERS_R8]
    resolved_r10 = [(n, _resolve(n)) for n in HEADLINERS_R10]
    r1_names = {item if isinstance(item, str) else item[0] for item in HEADLINERS}
    late = resolved_r8 + resolved_r10
    best: dict[str, float] = {n: float("inf") for n, _ in resolved + late}
    best_cpu: dict[str, float] = {n: -1.0 for n, _ in resolved + late}
    rows: dict[str, int] = {}

    def run_passes(n: int, entries) -> None:
        for _pass in range(n):
            for name, fn in entries:
                c0 = _tree_cpu_sample()
                t0 = time.perf_counter()
                rows[name] = fn(spark, sf_dir).count()
                wall = time.perf_counter() - t0
                c1 = _tree_cpu_sample()
                if wall < best[name]:
                    best[name] = wall
                    if c0 is not None and c1 is not None:
                        best_cpu[name] = _cpu_delta(c0, c1)

    # steal-aware measurement: BASELINE.md documents multi-round windows
    # where 5-8% hypervisor steal inflated the committed artifact ~15%
    # while the quiet-run twin sat at the previous round's level. Sample
    # /proc/stat around the timed section; if the window was dirty
    # (>1% steal), run two more round-robin passes — min-merging means
    # extra passes only ever improve — and record both windows' steal so
    # the artifact of record carries its own weather report.
    s0 = _steal_sample()
    probe_ref, probe_ref_source = _probe_ref()
    probe_before = _calibration_probe(spark)
    run_passes(4, resolved)
    run_passes(4, resolved_r8)
    run_passes(4, resolved_r10)
    probe_after = _calibration_probe(spark)
    steal = _steal_pct(s0, _steal_sample())
    steal_retry = None
    if steal is not None and steal > 1.0:
        print(f"# dirty window ({steal}% steal): 2 extra passes", file=sys.stderr)
        s2 = _steal_sample()
        run_passes(2, resolved)
        run_passes(2, resolved_r8)
        run_passes(2, resolved_r10)
        steal_retry = _steal_pct(s2, _steal_sample())
    # calibration-drift retry (round 11): the round-10 artifact recorded
    # a window whose probe read 0.811 — a uniform ~9% wall inflation the
    # steal gauge was blind to (memory-bandwidth contention). The steal
    # retry above fires on >1% steal only; here the retry ALSO fires
    # when the probe reads SLOW — >10% over the pinned reference — up to
    # 2 extra rounds, so the artifact of record is the code's real
    # speed. Min-merging means extra passes only ever improve the
    # recorded walls; `calibration` reports the cleanest observed probe
    # (the window the min-merged walls actually came from), every
    # observation is kept in probe_all_sec, and the exhausted flag marks
    # a window that never came clean. The FAST side (< 0.9) is NOT
    # retried: min-merging can only lower the probe further, so a loop
    # there never exits — a fast probe means the host outruns the
    # per-host pin (provenance in probe_ref_source), which inflates no
    # wall and needs no retry.
    probe_all = [probe_before, probe_after]
    cal_retries = 0
    while min(probe_all) / probe_ref > 1.1 and cal_retries < 2:
        cal_retries += 1
        print(
            f"# calibration drift ({min(probe_all) / probe_ref:.3f}): "
            f"retry {cal_retries} (2 extra passes)",
            file=sys.stderr,
        )
        run_passes(2, resolved)
        run_passes(2, resolved_r8)
        run_passes(2, resolved_r10)
        probe_all.append(_calibration_probe(spark))
    cal_exhausted = min(probe_all) / probe_ref > 1.1
    resolved = resolved + resolved_r8 + resolved_r10
    times = {name: round(best[name], 3) for name, _ in resolved}
    # -1.0 is the never-sampled sentinel (non-/proc platform): report
    # those as null rather than summing garbage negatives into the
    # artifact of record
    cpu_times = {
        name: (round(best_cpu[name], 3) if best_cpu[name] >= 0 else None)
        for name, _ in resolved
    }
    for name, _ in resolved:
        cpu_s = f"{cpu_times[name]:.3f}s" if cpu_times[name] is not None else "n/a"
        print(
            f"# {name}: {times[name]:.3f}s wall / "
            f"{cpu_s} cpu ({rows[name]} rows)",
            file=sys.stderr,
        )

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "cpu_time_sec": cpu_times,
                "cpu_time_total": round(
                    sum(v for v in cpu_times.values() if v is not None), 3
                ),
                # the r1 baseline total (BASELINE.md) covers only the
                # original 17 workloads; this subtotal is the
                # like-for-like comparison after the round-7 additions
                "value_r1_comparable": round(
                    sum(v for k, v in times.items() if k in r1_names), 3
                ),
                # hypervisor steal%% over the timed window(s); >1 marks a
                # noisy-neighbor window (see BASELINE.md environment notes)
                "steal_pct": steal,
                "steal_pct_retry": steal_retry,
                # fixed-workload calibration (round 9): min-of-3 wall of a
                # constant hash-agg probe before/after the suite, ratioed
                # against the pinned clean-window reference — the
                # cache-pollution yardstick steal_pct misses. Round 11:
                # when the ratio deviates >10% from 1.0 the suite reruns
                # (up to 2 extra rounds, min-merged) and `calibration`
                # reports the CLEANEST observed probe — the window the
                # min-merged walls actually came from; every reading is
                # kept in probe_all_sec and calibration_retry_exhausted
                # marks a window that never came clean (walls then are
                # weather — read the CPU twins).
                "probe_before_sec": round(probe_before, 3),
                "probe_after_sec": round(probe_after, 3),
                "probe_all_sec": [round(p, 3) for p in probe_all],
                "probe_ref_sec": probe_ref,
                "probe_ref_source": probe_ref_source,
                "calibration": round(min(probe_all) / probe_ref, 3),
                "calibration_retries": cal_retries,
                "calibration_retry_exhausted": cal_exhausted,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
