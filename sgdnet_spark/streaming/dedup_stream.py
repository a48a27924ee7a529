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


SIMHASH_OUTPUT_SCHEMA = "id_a long, id_b long, hamming int"
SIMHASH_STATE_SCHEMA = "ids array<long>, sims array<long>"


def _make_simhash_bucket_update(max_hamming: int, hash_col: str = "simhash"):
    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            ids, sims = list(state.get[0]), list(state.get[1])
        else:
            ids, sims = [], []
        known = set(ids)
        out_a: list[int] = []
        out_b: list[int] = []
        out_h: list[int] = []
        for pdf in pdfs:
            for doc, sim in zip(pdf["id"], pdf[hash_col]):
                d, sm = int(doc), int(sim)
                if d in known:
                    continue
                for od, osm in zip(ids, sims):
                    h = bin((sm ^ osm) & ((1 << 64) - 1)).count("1")
                    if h <= max_hamming:
                        out_a.append(min(od, d))
                        out_b.append(max(od, d))
                        out_h.append(h)
                ids.append(d)
                sims.append(sm)
                known.add(d)
        state.update((ids, sims))
        if out_a:
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_h})

    return update


def simhash_near_dup_candidates(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming SimHash near-dup pairs: the stateless per-row block
    stage (dedup.simhash_blocked — same expressions as the batch
    operator) feeds ONE stateful operator keyed by (block, chunk-key).
    State carries each bucket's (id, simhash) members, so the hamming
    check runs inside the bucket at arrival time and verified pairs are
    emitted the moment the second member lands — no downstream join.
    The distinct union of emitted pairs over the stream equals the
    batch simhash_pairs output (asserted in tests/test_streaming.py);
    the same pair may surface from several blocks, exactly like the
    batch path before its distinct()."""
    x = dedup.simhash_blocked(docs, max_hamming, text_col, id_col)
    return x.groupBy("blk", "ck").applyInPandasWithState(
        _make_simhash_bucket_update(max_hamming),
        outputStructType=SIMHASH_OUTPUT_SCHEMA,
        stateStructType=SIMHASH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def phash_near_dup_candidates(
    media: DataFrame,
    max_hamming: int = 6,
    method: str = "dhash",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming perceptual-hash IMAGE near-dup pairs (round 10): the
    stateless decode+hash stage (phash.image_phash — an Arrow
    mapInPandas, streaming-legal) feeds the SAME pigeonhole block keys
    and the SAME stateful bucket operator as the SimHash stream, with
    the bucket state carrying (id, <method> hash) members — new images
    hamming-verify against their bucket at arrival and pairs emit the
    moment the second member lands. Distinct union of emitted pairs ==
    batch phash.image_neardup_pairs (asserted in
    tests/test_streaming.py)."""
    from sgdnet_spark.operators import phash as P

    if method not in ("dhash", "ahash"):
        raise ValueError(f"unknown method {method!r}")
    hashes = P.image_phash(media, id_col)
    x = dedup.hamming_block_keys(hashes.select("id", method), max_hamming, method)
    return x.groupBy("blk", "ck").applyInPandasWithState(
        _make_simhash_bucket_update(max_hamming, hash_col=method),
        outputStructType=SIMHASH_OUTPUT_SCHEMA,
        stateStructType=SIMHASH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def audiofp_near_dup_candidates(
    media: DataFrame,
    max_hamming: int = 6,
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming acoustic-fingerprint AUDIO near-dup pairs (round 10):
    the stateless decode+fingerprint stage (audiofp.audio_fingerprint —
    an Arrow mapInPandas, streaming-legal) feeds the SAME pigeonhole
    block keys and the SAME stateful bucket operator as the SimHash and
    image-phash streams, with the bucket state carrying (id, afp)
    members — new clips hamming-verify against their bucket at arrival
    and pairs emit the moment the second member lands. Distinct union
    of emitted pairs == batch audiofp.audio_neardup_pairs (asserted in
    tests/test_streaming.py). Completes the image+audio streaming
    near-dup family."""
    from sgdnet_spark.operators import audiofp as A

    fp = A.audio_fingerprint(media, id_col)
    x = dedup.hamming_block_keys(fp, max_hamming, "afp")
    return x.groupBy("blk", "ck").applyInPandasWithState(
        _make_simhash_bucket_update(max_hamming, hash_col="afp"),
        outputStructType=SIMHASH_OUTPUT_SCHEMA,
        stateStructType=SIMHASH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


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
