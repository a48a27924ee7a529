"""Canonical result hashing shared by the oracle-check replica, the
output drift pins, and the plan snapshots.

The normalization mirrors the external correctness gate: columns sorted
by name, floats rounded to 9 digits, rows sorted — an order-insensitive
value fingerprint of a DataFrame.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame


def canonical_rows(cols, rows) -> list[str]:
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


def canonical_hash(df: DataFrame) -> tuple[int, str]:
    """(row_count, 16-hex value fingerprint) of a DataFrame's result."""
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    lines = canonical_rows(cols, rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(lines), h
