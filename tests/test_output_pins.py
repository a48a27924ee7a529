"""Drift pins for the rows-only queries() entries.

The external correctness gate has no oracle for these, so a behavior
change would go unnoticed (dedup_simhash once drifted 363 -> 928 rows
between rounds silently). Each entry's row count AND canonical value
hash at the driver's correctness scale (sf0.01) are committed in
output_pins.json; any drift fails here even though the driver can't see
it. Regenerate intentionally with `python tools/pin_outputs.py`.
"""

import json
import os

import pytest

import __spark_entry__ as E
from sgdnet_spark.testing import canonical_hash

PIN_SF_DIR = "/root/testdata/sf0.01"
PIN_FILE = os.path.join(os.path.dirname(__file__), "output_pins.json")

with open(PIN_FILE) as fh:
    PINS = json.load(fh)


def test_every_rows_only_query_is_pinned():
    rows_only = set(E.queries()) - set(E.oracle_sql())
    assert rows_only == set(PINS), (
        "rows-only inventory changed; regenerate tools/pin_outputs.py"
    )


@pytest.mark.parametrize("name", sorted(PINS))
def test_rows_only_output_matches_pin(spark, name):
    rows, h = canonical_hash(E.queries()[name](spark, PIN_SF_DIR))
    want = PINS[name]
    assert (rows, h) == (want["rows"], want["hash"]), (
        f"{name} output drifted from its committed pin "
        f"(got rows={rows} hash={h}, pinned {want}); if intentional, "
        "rerun tools/pin_outputs.py"
    )
