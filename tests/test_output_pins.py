"""Drift pins for queries() entries without a data-derived SQL oracle.

As of round 3 every registry entry has a driver oracle: the
non-SQL-expressible ones (iterative GLM solvers, hash-dependent
candidate sets) check against golden constants committed in
sgdnet_spark/_golden.py (see tools/gen_constant_oracles.py for what
cross-validates each table). These tests make the same drift signal
fire in plain pytest, without DuckDB: each golden entry's CURRENT
output at the driver scale (sf0.01) must equal its committed constants
row-for-row. output_pins.json remains the fallback pin store for any
future entry that is rows-only AND has no golden table.
"""

import json
import os

import pytest

import __spark_entry__ as E
from sgdnet_spark._golden import GOLDEN
from sgdnet_spark.queries import QUERIES, SUBQUERIES

# golden-pinned entries may live in the driver registry or (since the
# round-7 gate packing) in the sub-entry registry under an umbrella
ALL_QUERIES = {**SUBQUERIES, **QUERIES}
from sgdnet_spark.testing import canonical_hash

PIN_SF_DIR = "/root/testdata/sf0.01"
PIN_FILE = os.path.join(os.path.dirname(__file__), "output_pins.json")

with open(PIN_FILE) as fh:
    PINS = json.load(fh)


def test_every_rows_only_query_is_pinned():
    """No registry entry may be invisible to drift detection: each is
    either oracle-checked by the driver or pinned in output_pins.json."""
    rows_only = set(E.queries()) - set(E.oracle_sql())
    assert rows_only == set(PINS), (
        "rows-only inventory changed; regenerate tools/pin_outputs.py"
    )


def test_rows_only_output_matches_pin(spark):
    """A loop, not a parametrize: the pin store is EMPTY by design
    (every current entry has a driver oracle or golden table), and an
    empty parameter set would report as a skipped test — this is the
    fallback mechanism for future rows-only entries, passing trivially
    until one exists."""
    for name in sorted(PINS):
        rows, h = canonical_hash(E.queries()[name](spark, PIN_SF_DIR))
        want = PINS[name]
        assert (rows, h) == (want["rows"], want["hash"]), (
            f"{name} output drifted from its committed pin "
            f"(got rows={rows} hash={h}, pinned {want}); if intentional, "
            "rerun tools/pin_outputs.py"
        )


# entries whose golden tables cover only part of the output (the rest is
# derived in SQL by the driver oracle): filter current rows the same way
# the generator does — import its map so the two can never drift apart
import sys  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from gen_constant_oracles import GOLDEN_ENTRIES as _GOLDEN_ROW_FILTERS  # noqa: E402


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_constants_match_current_output(spark, name):
    df = ALL_QUERIES[name](spark, PIN_SF_DIR)
    entry = GOLDEN[name]
    assert df.columns == entry["columns"], f"{name} schema drifted"
    rows = [r.asDict() for r in df.collect()]
    filt = _GOLDEN_ROW_FILTERS.get(name)
    if filt is not None:
        rows = [r for r in rows if filt(r)]
    got = sorted(tuple(r[c] for c in entry["columns"]) for r in rows)
    want = sorted(tuple(r) for r in entry["rows"])
    assert got == want, (
        f"{name} output drifted from its golden constants; if the change "
        "is intentional, rerun tools/gen_constant_oracles.py"
    )
