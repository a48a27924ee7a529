"""Perceptual-hash image near-duplicate detection — the LAION-style
multimodal dedup stage of a training-data pipeline.

Two classic 64-bit perceptual hashes over the decoded image grid
(Krawetz's aHash/dHash family, widely published; e.g. the
"Kind of Like That" / pHash literature):

- **dHash** (difference hash): grayscale, nearest-resample to a 9x8
  grid, bit(y, x) = gray[y][x] > gray[y][x+1] — robust to global
  brightness/contrast shifts because only horizontal gradients matter.
- **aHash** (average hash): 8x8 grid, bit = pixel > grid mean.

Every arithmetic step is INTEGER-exact and engine-neutral so the
driver's DuckDB oracle can replay the hash from the deterministic
payload generation rule without decoding a single byte
(queries.py::multimodal_phash):

- gray = r + g + b  (0..765 — a channel SUM, no /3, no float weights),
- resample indices yi = (y*h) // grid_h, xi = (x*w) // grid_w
  (integer floor division — NOT media_codec.resize_nearest's
  float-multiply indices, whose rounding can differ from the exact
  rational floor when y*h is a multiple of the grid),
- aHash compares 64*gray > sum(gray) to stay integer,
- the signed-64 hash packs bit k = y*8 + x (bit 63 wraps negative,
  matching two's-complement BIGINT on both engines).

Decode runs as an Arrow-batched ``mapInPandas`` kernel over the real
BMP payload bytes (operators/media_codec.py); non-image payloads are
skipped inside the batch. Pairing reuses the text tier's pigeonhole
hamming blocking verbatim (dedup.hamming_block_keys /
blocked_hamming_join — Manku et al., WWW'07): recall 1.0 within the
radius, cost = sum of squared bucket sizes, never n².

Scale shape at 100 TB: hashing is one embarrassingly-parallel decode
pass (64-bit output per image — the corpus' bytes never shuffle);
blocking shuffles only (id, hash, block-key) rows. Radius/bucket
trade-off is simhash_pairs': wider radius → fewer, bigger buckets.

The reference (jolars/sgdnet) has no multimodal surface — this tier
extends the engine for LLM-pipeline parity (VERDICT r9 next-1).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sgdnet_spark.operators import media_codec as mc
from sgdnet_spark.operators.dedup import blocked_hamming_join, hamming_block_keys

_GRID = 8  # 8 rows; dHash samples 9 columns, aHash 8


def _pack_bits(bits: np.ndarray) -> int:
    """64 bools (bit k first) -> signed-64 int (two's complement)."""
    v = 0
    for k in range(64):
        if bits[k]:
            v |= 1 << k
    return v - (1 << 64) if v >= (1 << 63) else v


def dhash_bits(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> 64 dHash bits, bit k = y*8 + x."""
    h, w = px.shape[:2]
    g = px.astype(np.int64).sum(axis=2)  # gray = r+g+b
    yi = (np.arange(_GRID) * h) // _GRID
    xi = (np.arange(_GRID + 1) * w) // (_GRID + 1)
    grid = g[yi][:, xi]  # 8 x 9
    return (grid[:, :-1] > grid[:, 1:]).reshape(64)


def ahash_bits(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> 64 aHash bits, bit k = y*8 + x."""
    h, w = px.shape[:2]
    g = px.astype(np.int64).sum(axis=2)
    yi = (np.arange(_GRID) * h) // _GRID
    xi = (np.arange(_GRID) * w) // _GRID
    grid = g[yi][:, xi]  # 8 x 8
    return (64 * grid > grid.sum()).reshape(64)


def image_phash(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, dhash, ahash) for every BMP payload in a media relation
    (the attach_media / MEDIA_SCHEMA shape: id + binary ``payload``).
    Non-image payloads are dropped inside the Arrow batch — one decode
    pass, no shuffle."""
    cols = media.select(F.col(id_col).alias("id"), "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, dh, ah = [], [], []
            for i, p in zip(pdf["id"], pdf["payload"]):
                payload = bytes(p)
                if mc.sniff(payload) != "bmp":
                    continue
                px = mc.decode_bmp(payload)
                ids.append(i)
                dh.append(_pack_bits(dhash_bits(px)))
                ah.append(_pack_bits(ahash_bits(px)))
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "dhash": pd.Series(dh, dtype="int64"),
                    "ahash": pd.Series(ah, dtype="int64"),
                }
            )

    return cols.mapInPandas(run, schema="id bigint, dhash bigint, ahash bigint")


def image_neardup_pairs(
    media: DataFrame,
    max_hamming: int = 6,
    method: str = "dhash",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate image pairs within a hamming radius:
    (id_a, id_b, hamming), recall 1.0 via pigeonhole blocking.

    ``method``: 'dhash' (default — gradient-based, the robust choice)
    or 'ahash'. Radius 6 is a conventional near-dup operating point
    for 64-bit perceptual hashes; radius <= 10 keeps >= ~6-bit blocks
    (worst case 5x12+... with 7 blocks still >= 9 bits = 512+ buckets
    per block)."""
    if method not in ("dhash", "ahash"):
        raise ValueError(f"unknown method {method!r}")
    hashes = image_phash(media, id_col).select("id", method)
    x = hamming_block_keys(hashes, max_hamming, method)
    return blocked_hamming_join(x, max_hamming, method)


def image_neardup_degree(
    media: DataFrame,
    max_hamming: int = 6,
    method: str = "dhash",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-image hash report + near-dup degree: (id, dhash, ahash,
    n_neardups) where n_neardups counts OTHER images within the radius
    of ``method``'s hash — the keep/drop signal a pipeline thresholds
    on (degree 0 = unique). One decode pass shared by the hash report
    and the pair join via a lazy localCheckpoint (blocks GC-released;
    the relation is 3 longs per image, cheap at any scale)."""
    if method not in ("dhash", "ahash"):
        raise ValueError(f"unknown method {method!r}")
    hashes = image_phash(media, id_col).localCheckpoint(eager=False)
    x = hamming_block_keys(hashes.select("id", method), max_hamming, method)
    pairs = blocked_hamming_join(x, max_hamming, method)
    deg = (
        pairs.select(F.explode(F.array("id_a", "id_b")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("nd"))
    )
    return hashes.join(deg, "id", "left").select(
        "id", "dhash", "ahash",
        F.coalesce(F.col("nd"), F.lit(0)).cast("bigint").alias("n_neardups"),
    )
