"""Pin the driver-generated testdata schemas.

The driver regenerates /root/testdata between rounds; round 4 changed
events.ts from TIMESTAMP(NANOS) to plain micros and silently broke four
registered queries until the next builder session ran. This test makes
any future regeneration fail pytest IMMEDIATELY with a message naming
the exact table/column/type that moved, instead of surfacing as driver
err rows.

Columns with known-good alternative encodings are pinned to the SET of
encodings the code handles (queries._t and streaming.events adapt to
both events.ts variants).
"""

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"

# column -> accepted pyarrow type strings (a set where the readers are
# deliberately polymorphic)
EXPECTED: dict[str, list[tuple[str, set[str]]]] = {
    "region": [("r_regionkey", {"int32"}), ("r_name", {"string", "large_string"})],
    "nation": [
        ("n_nationkey", {"int32"}),
        ("n_name", {"string", "large_string"}),
        ("n_regionkey", {"int32"}),
    ],
    "customer": [
        ("c_custkey", {"int64"}),
        ("c_name", {"string", "large_string"}),
        ("c_nationkey", {"int32"}),
        ("c_acctbal", {"double"}),
        ("c_mktsegment", {"string", "large_string"}),
    ],
    "supplier": [
        ("s_suppkey", {"int64"}),
        ("s_name", {"string", "large_string"}),
        ("s_nationkey", {"int32"}),
        ("s_acctbal", {"double"}),
    ],
    "part": [
        ("p_partkey", {"int64"}),
        ("p_name", {"string", "large_string"}),
        ("p_brand", {"string", "large_string"}),
        ("p_type", {"string", "large_string"}),
        ("p_size", {"int32"}),
        ("p_retailprice", {"double"}),
    ],
    "orders": [
        ("o_orderkey", {"int64"}),
        ("o_custkey", {"int64"}),
        ("o_orderstatus", {"string", "large_string"}),
        ("o_totalprice", {"double"}),
        ("o_orderdate", {"timestamp[us]", "timestamp[ns]", "date32[day]"}),
        ("o_orderpriority", {"string", "large_string"}),
    ],
    "lineitem": [
        ("l_orderkey", {"int64"}),
        ("l_partkey", {"int64"}),
        ("l_suppkey", {"int64"}),
        ("l_linenumber", {"int32"}),
        ("l_quantity", {"double"}),
        ("l_extendedprice", {"double"}),
        ("l_discount", {"double"}),
        ("l_tax", {"double"}),
        ("l_returnflag", {"string", "large_string"}),
        ("l_linestatus", {"string", "large_string"}),
        ("l_shipdate", {"timestamp[us]", "timestamp[ns]", "date32[day]"}),
    ],
    "events": [
        ("event_id", {"int64"}),
        # round 3 shipped timestamp[ns]; round 4 ships timestamp[us] —
        # queries._t and streaming.events handle BOTH (and only both)
        ("ts", {"timestamp[us]", "timestamp[ns]"}),
        ("user_id", {"int64"}),
        ("event_type", {"string", "large_string"}),
        ("value", {"double"}),
        ("props", {"string", "large_string"}),
    ],
    "documents": [
        ("doc_id", {"int64"}),
        ("text", {"string", "large_string"}),
        ("lang", {"string", "large_string"}),
        ("source", {"string", "large_string"}),
        ("n_chars", {"int64"}),
    ],
    "embeddings": [
        ("vec_id", {"int64"}),
        ("embedding", {"list<element: float>", "list<item: float>"}),
        ("label", {"int32"}),
    ],
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_testdata_schema_pinned(table):
    schema = pq.read_schema(f"{SF_DIR}/{table}.parquet")
    got = [(f.name, str(f.type)) for f in schema]
    want = EXPECTED[table]
    assert [n for n, _ in got] == [n for n, _ in want], (
        f"{table}: column set/order changed: {got}"
    )
    for (name, typ), (_, accepted) in zip(got, want):
        assert typ in accepted, (
            f"{table}.{name} is now {typ}; the readers handle {sorted(accepted)}. "
            "If the driver regenerated testdata with a new encoding, teach the "
            "reader (queries._t / sources) about it and add the type here."
        )
