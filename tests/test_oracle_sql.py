"""Every registered oracle must be valid DuckDB SQL against the
testdata views — a parse/bind failure here means the driver's
correctness gate would record an err row for that entry. Runs in
milliseconds (EXPLAIN only, sf0.001 views, no Spark session)."""

import duckdb
import pytest

from sgdnet_spark.queries import ORACLES, QUERIES, SUBORACLES, SUBQUERIES
from sgdnet_spark.session import TABLES

SF_DIR = "/root/testdata/sf0.001"

ALL_ORACLES = {**SUBORACLES, **ORACLES}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_every_query_has_an_oracle():
    """Round-3 invariant: the registry carries no rows-only entries —
    driver-facing AND folded sub-entries alike."""
    assert set(QUERIES) == set(ORACLES)
    assert set(SUBQUERIES) == set(SUBORACLES)


def test_driver_gate_capacity():
    """The driver's correctness artifact records at most 50 rows per
    round (CORRECTNESS_r01..r06: exactly 50 each). Round 6 registered 63
    keys and silently dropped 13 from the gate; keep the registry at or
    under the gate's capacity so every key gets a row."""
    assert len(QUERIES) <= 50


@pytest.mark.parametrize("name", sorted(ALL_ORACLES))
def test_oracle_sql_parses_and_binds(con, name):
    con.execute(f"EXPLAIN {ALL_ORACLES[name]}")
