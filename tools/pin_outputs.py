"""Regenerate tests/output_pins.json: row count + canonical value hash
for every rows-only (no-oracle) queries() entry at the driver's
correctness scale (sf0.01).

These queries have NO external oracle — without a committed pin, their
output can drift silently between rounds (dedup_simhash once went
363 -> 928 rows with nothing to notice). Run this ONLY after verifying
a behavior change is intentional:

    python tools/pin_outputs.py            # rewrite the pin file
    python tools/pin_outputs.py --check    # recompute and diff (CI mode)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from sgdnet_spark.session import get_spark  # noqa: E402
from sgdnet_spark.testing import canonical_hash  # noqa: E402

PIN_SF_DIR = "/root/testdata/sf0.01"
PIN_FILE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "output_pins.json")


def compute() -> dict:
    spark = get_spark("pin_outputs")
    qs, os_ = queries(), oracle_sql()
    pins = {}
    for name, fn in qs.items():
        if name in os_:
            continue  # oracle-checked by the driver; no pin needed
        rows, h = canonical_hash(fn(spark, PIN_SF_DIR))
        pins[name] = {"rows": rows, "hash": h}
        print(f"# {name}: rows={rows} hash={h}", file=sys.stderr)
    return pins


def main() -> int:
    pins = compute()
    if "--check" in sys.argv:
        with open(PIN_FILE) as fh:
            want = json.load(fh)
        bad = {k: (pins.get(k), want.get(k)) for k in set(pins) | set(want)
               if pins.get(k) != want.get(k)}
        if bad:
            print(f"DRIFT: {json.dumps(bad, indent=2)}")
            return 1
        print("ok: all rows-only outputs match their pins")
        return 0
    with open(PIN_FILE, "w") as fh:
        json.dump(pins, fh, indent=2, sort_keys=True)
        fh.write("\n")
    print(f"wrote {PIN_FILE} ({len(pins)} pins)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
