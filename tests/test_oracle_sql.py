"""Every registered oracle must be valid DuckDB SQL against the
testdata views — a parse/bind failure here means the driver's
correctness gate would record an err row for that entry. Runs in
milliseconds (EXPLAIN only, sf0.001 views, no Spark session)."""

import duckdb
import pytest

from sgdnet_spark.queries import ORACLES, QUERIES
from sgdnet_spark.session import TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_every_query_has_an_oracle():
    """Round-3 invariant: the registry carries no rows-only entries."""
    assert set(QUERIES) == set(ORACLES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_sql_parses_and_binds(con, name):
    con.execute(f"EXPLAIN {ORACLES[name]}")
