"""Regenerate tests/plan_snapshots.json: physical-plan shape (exchange
count + broadcast-join count) for every queries() entry at sf0.001.

A silent plan regression — a broadcast join degrading to sort-merge, an
extra shuffle appearing in a one-exchange query — changes these counts;
the committed snapshot turns that into a readable CI diff. Regenerate
ONLY after confirming a plan change is intentional:

    python tools/snapshot_plans.py            # rewrite the snapshot
    python tools/snapshot_plans.py --check    # recompute and diff
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import queries  # noqa: E402
from sgdnet_spark.plans import introspect  # noqa: E402
from sgdnet_spark.session import get_spark  # noqa: E402

SNAP_SF_DIR = "/root/testdata/sf0.001"
SNAP_FILE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "tests", "plan_snapshots.json")


def compute() -> dict:
    from sgdnet_spark.queries import SUBQUERIES

    spark = get_spark("snapshot_plans", shuffle_partitions=8)
    snaps = {}
    # sub-entries first so plan drift localizes to the operator, then the
    # driver-facing umbrellas/registry
    for name, fn in {**SUBQUERIES, **queries()}.items():
        df = fn(spark, SNAP_SF_DIR)
        snaps[name] = {
            "shuffles": introspect.shuffle_count(df),
            "broadcast_joins": introspect.broadcast_join_count(df),
        }
        print(f"# {name}: {snaps[name]}", file=sys.stderr)
    return snaps


def main() -> int:
    snaps = compute()
    if "--check" in sys.argv:
        with open(SNAP_FILE) as fh:
            want = json.load(fh)
        bad = {k: {"got": snaps.get(k), "want": want.get(k)}
               for k in set(snaps) | set(want) if snaps.get(k) != want.get(k)}
        if bad:
            print(f"PLAN DRIFT: {json.dumps(bad, indent=2)}")
            return 1
        print("ok: all query plans match their snapshots")
        return 0
    with open(SNAP_FILE, "w") as fh:
        json.dump(snaps, fh, indent=2, sort_keys=True)
        fh.write("\n")
    print(f"wrote {SNAP_FILE} ({len(snaps)} snapshots)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
