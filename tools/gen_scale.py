"""Scale up a testdata directory by deterministic replication.

Usage: python tools/gen_scale.py [--src /root/testdata/sf0.1]
                                 [--out /tmp/testdata/sf1] [--copies 10]

Produces a larger scale factor from an existing one WITHOUT touching the
read-only driver testdata: each table is replicated `copies` times with
per-copy key offsets so foreign keys stay consistent (copy c's lineitem
rows reference copy c's orders/part/supplier rows), mirroring how TPC-H
row counts scale linearly in sf while region/nation stay fixed.

Two tables get a per-copy perturbation so the scale-up doesn't fabricate
a quadratic blowup of cross-copy duplicates:

- documents: copies > 0 insert a copy-specific marker token every 5th
  word. That breaks most 3-gram shingles, pushing cross-copy Jaccard
  far below dedup thresholds (~0.35 vs the 0.5 default) while leaving
  each copy's INTERNAL duplicate structure identical to the source —
  so near-dup pair counts scale linearly with sf, which is the property
  a dedup bench must preserve.
- embeddings: copy c rotates each vector by c positions (np.roll).
  Norms and within-copy distances are exactly preserved; cross-copy
  cosines decorrelate, so ANN neighbor-list sizes scale like real data
  instead of every vector acquiring 9 exact clones.

Everything is seed-free and deterministic: rerunning produces
byte-identical tables.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# column -> key-space it offsets in (offset = copy * (max key + 1) of that space)
OFFSET_COLS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
KEY_SOURCE = {  # key space -> (table, column) that defines its extent
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}


def _perturb_documents(tab: pa.Table, copy: int) -> pa.Table:
    if copy == 0:
        return tab
    texts = tab.column("text").to_pylist()
    out = []
    for i, t in enumerate(texts):
        if t is None:
            out.append(t)
            continue
        words = t.split(" ")
        marked = []
        for j, w in enumerate(words):
            marked.append(w)
            if j % 5 == 4:
                marked.append(f"zc{copy}m{(i + j) % 7}")
        out.append(" ".join(marked))
    cols = {name: tab.column(name) for name in tab.column_names}
    cols["text"] = pa.array(out, type=pa.string())
    if "n_chars" in cols:
        cols["n_chars"] = pc.cast(pc.utf8_length(cols["text"]), pa.int64())
    return pa.table(cols)


def _perturb_embeddings(tab: pa.Table, copy: int) -> pa.Table:
    if copy == 0:
        return tab
    col = tab.column("embedding").combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    mat = np.asarray(col.to_pylist(), dtype=np.float32)
    rolled = np.roll(mat, copy, axis=1)
    emb = pa.array(list(rolled), type=pa.list_(pa.float32()))
    cols = {name: tab.column(name) for name in tab.column_names}
    cols["embedding"] = emb
    return pa.table(cols)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/testdata/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    src = {name: pq.read_table(os.path.join(args.src, name + ".parquet")) for name in TABLES}
    extent = {
        space: int(pc.max(src[tbl].column(col)).as_py()) + 1
        for space, (tbl, col) in KEY_SOURCE.items()
    }

    for name in TABLES:
        tab = src[name]
        if name in ("region", "nation"):
            pq.write_table(tab, os.path.join(args.out, name + ".parquet"))
            print(f"{name}: {tab.num_rows} rows (fixed)")
            continue
        parts = []
        for c in range(args.copies):
            t = tab
            if name == "documents":
                t = _perturb_documents(t, c)
            elif name == "embeddings":
                t = _perturb_embeddings(t, c)
            cols = {cn: t.column(cn) for cn in t.column_names}
            for col, space in OFFSET_COLS.get(name, {}).items():
                off = c * extent[space]
                if off:
                    cols[col] = pc.add(cols[col], pa.scalar(off, type=cols[col].type))
            parts.append(pa.table(cols))
        big = pa.concat_tables(parts)
        # row groups sized so a parquet scan splits across many tasks
        rg = max(10_000, big.num_rows // 64)
        pq.write_table(big, os.path.join(args.out, name + ".parquet"), row_group_size=rg)
        print(f"{name}: {big.num_rows} rows")


if __name__ == "__main__":
    main()
