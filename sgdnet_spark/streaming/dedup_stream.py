"""Streaming near-duplicate detection: stateful MinHash+LSH over a
document stream.

As documents arrive, each computes its MinHash signature statelessly
(the same expressions as the batch operator — dedup.band_keys_from_
shingles), explodes to (band, bucket) keys, and a stateful operator
keyed by bucket emits a candidate pair the moment a new document lands
in a bucket that already holds members. State per bucket is the member
id list — bounded by the near-dup rate at sane banding, exactly the
batch operator's bucket-size story. Candidates then flow to a batch
verification join (exact Jaccard) downstream, as in the batch path.

The streaming analog of dedup.minhash_lsh_pairs(verify=False): the
union of emitted pairs over the whole stream equals the batch
candidates on the same corpus (asserted in tests/test_streaming.py).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sgdnet_spark.operators import dedup

OUTPUT_SCHEMA = "id_a long, id_b long"
STATE_SCHEMA = "ids array<long>"


def _bucket_update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    seen: list[int] = list(state.get[0]) if state.exists else []
    known = set(seen)
    out_a: list[int] = []
    out_b: list[int] = []
    for pdf in pdfs:
        for doc in pdf["id"]:
            d = int(doc)
            if d in known:  # re-delivery / duplicate band rows
                continue
            for s in seen:
                out_a.append(min(s, d))
                out_b.append(max(s, d))
            seen.append(d)
            known.add(d)
    state.update((seen,))
    if out_a:
        yield pd.DataFrame({"id_a": out_a, "id_b": out_b})


def near_dup_candidates(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs, emitted as the stream flows.

    One shuffle on (band, bucket); state lives with the bucket key, so
    at cluster scale each bucket's membership list stays on one
    executor and new arrivals only touch their own buckets. The
    signature stage is pure per-row expressions (dedup.band_keys), so
    this is a SINGLE stateful operator — no streaming aggregation
    precedes it (a Structured Streaming requirement for
    applyInPandasWithState).
    """
    banded = dedup.band_keys(docs, num_hashes, bands, text_col, id_col, k)
    return banded.groupBy("band", "bk").applyInPandasWithState(
        _bucket_update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
