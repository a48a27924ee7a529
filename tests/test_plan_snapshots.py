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
