"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle on DuckDB, compare row count, column
names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from sgdnet_spark.session import TABLES, get_spark  # noqa: E402


def normalize(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r))
        vals = []
        for c in sorted(cols):
            v = d[c]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = queries()
    os_ = oracle_sql()
    # sub-entries (folded into umbrella registry keys) keep their own
    # oracles — check them too for granular failure localization
    from sgdnet_spark.queries import SUBORACLES, SUBQUERIES  # noqa: E402

    qs.update(SUBQUERIES)
    os_.update(SUBORACLES)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in os_:
            print(f"ok   {name}: rows-only ({len(rows)} rows, cols={cols})")
            continue
        try:
            res = con.execute(os_[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            continue
        problems = []
        if sorted(cols) != sorted(ocols):
            problems.append(f"cols spark={sorted(cols)} duckdb={sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rowcount spark={len(rows)} duckdb={len(orows)}")
        if not problems:
            a = normalize(rows, cols)
            b = normalize(orows, ocols)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, e.g. {diff}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(rows)} rows hash-match")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
