"""Plan-shape regression snapshots for every registered query.

Exchange (shuffle) and broadcast-join counts per query at sf0.001 are
committed in plan_snapshots.json: a change that silently degrades a
broadcast join to sort-merge or adds a shuffle to a one-exchange query
fails here with a readable diff. Regenerate intentionally with
`python tools/snapshot_plans.py`.
"""

import json
import os

import __spark_entry__ as E
from sgdnet_spark.plans import introspect

SNAP_FILE = os.path.join(os.path.dirname(__file__), "plan_snapshots.json")
SNAP_SF_DIR = "/root/testdata/sf0.001"


def test_query_plan_shapes_match_snapshots(spark):
    with open(SNAP_FILE) as fh:
        want = json.load(fh)
    from sgdnet_spark.queries import SUBQUERIES

    got = {}
    for name, fn in {**SUBQUERIES, **E.queries()}.items():
        df = fn(spark, SNAP_SF_DIR)
        got[name] = {
            "shuffles": introspect.shuffle_count(df),
            "broadcast_joins": introspect.broadcast_join_count(df),
        }
    drift = {k: {"got": got.get(k), "want": want.get(k)}
             for k in set(got) | set(want) if got.get(k) != want.get(k)}
    assert not drift, (
        "plan shape drifted; if intentional rerun tools/snapshot_plans.py: "
        + json.dumps(drift, indent=2)
    )


def test_components_loop_growth_is_linear(spark):
    """dedup_components' snapshot reads 0 shuffles since the round-9
    per-iteration localCheckpoint truncates lineage — the final plan no
    longer shows the loop's real exchanges (the round-9 review's noted
    blind spot). Guard the loop's EXECUTION instead: jobs and stages
    counted via the status tracker must grow linearly in iteration
    count. A regression that re-analyzes a deepening join tree or adds
    a shuffle per round multiplies the per-iteration stage delta
    (measured ~15 jobs / ~21 stages per round at 32 cores) and trips
    the 2x-margin bounds."""
    from sgdnet_spark.operators.dedup import duplicate_components

    sc = spark.sparkContext
    measured = {}
    for n in (5, 9):  # chains: label travels 1 hop/round -> n-1 rounds
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
        )
        sc.setJobGroup(f"ccg{n}", "cc growth guard")
        try:
            out = duplicate_components(pairs).collect()
        finally:
            sc.setJobGroup(None, None)
        assert {r["canonical"] for r in out} == {0}
        tracker = sc.statusTracker()
        jobs = tracker.getJobIdsForGroup(f"ccg{n}")
        infos = [tracker.getJobInfo(j) for j in jobs]
        stages = sum(len(i.stageIds) for i in infos if i is not None)
        measured[n] = (len(jobs), stages)
    d_rounds = 4  # chain 5 -> 9
    assert (measured[9][0] - measured[5][0]) / d_rounds <= 30, measured
    assert (measured[9][1] - measured[5][1]) / d_rounds <= 45, measured
