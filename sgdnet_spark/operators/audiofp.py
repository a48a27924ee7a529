"""Acoustic-fingerprint audio near-duplicate detection — the audio half
of the multimodal dedup stage (images: operators/phash.py).

A 64-bit energy-delta sign fingerprint in the Haitsma & Kalker (ISMIR
2002) family, reduced to a single band so every step is INTEGER-exact
and engine-neutral: split the clip into 65 equal time windows, sum the
absolute sample amplitudes per window, and set bit k when window k is
louder than window k+1 (k = 0..63). Like dHash, only the *sign of the
gradient* matters, so global gain changes cannot flip a bit.

Engine-neutral recipe (the DuckDB oracle replays it from the
deterministic WAV generation rule without touching a byte —
queries.py::multimodal_audiofp):

- window index of sample i is ``(i * 65) // n`` (integer floor
  division — an equal partition, every window non-empty for n >= 65),
- window energy = SUM(ABS(sample)) as 64-bit integers (|int16| <= 32768
  and clips are bounded, so no overflow anywhere near),
- bit k = e[k] > e[k+1]; the signed-64 pack puts bit 63 in the sign
  position (two's-complement BIGINT on both engines, phash._pack_bits).

Decode runs as an Arrow-batched ``mapInPandas`` kernel over the real
PCM WAV payload bytes (operators/media_codec.py); non-audio payloads
are skipped inside the batch. Pairing reuses the text tier's pigeonhole
hamming blocking verbatim (dedup.hamming_block_keys /
blocked_hamming_join — Manku et al., WWW'07): recall 1.0 within the
radius, cost = sum of squared bucket sizes, never n².

Scale shape at 100 TB: fingerprinting is one embarrassingly-parallel
decode pass (a 64-bit output per clip — the corpus' audio bytes never
shuffle); blocking shuffles only (id, hash, block-key) rows, exactly
the image-phash story (docs/SCALE.md).

The reference (jolars/sgdnet) has no multimodal surface — this tier
extends the engine for LLM-pipeline parity (VERDICT r9 next-1; images
landed first, this completes the family).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sgdnet_spark.operators import media_codec as mc
from sgdnet_spark.operators.dedup import blocked_hamming_join, hamming_block_keys
from sgdnet_spark.operators.phash import _pack_bits

_N_WINDOWS = 65  # 65 energies -> 64 delta-sign bits


def afp_bits(samples: np.ndarray) -> np.ndarray:
    """1-D int16 samples -> 64 energy-delta bits, bit k = window k."""
    n = samples.size
    if n < _N_WINDOWS:
        raise ValueError(f"clip too short for a 64-bit fingerprint: {n} samples")
    wi = (np.arange(n, dtype=np.int64) * _N_WINDOWS) // n
    e = np.zeros(_N_WINDOWS, dtype=np.int64)
    np.add.at(e, wi, np.abs(samples.astype(np.int64)))
    return e[:-1] > e[1:]


def audio_fingerprint(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, afp) for every WAV payload in a media relation (the
    attach_media / MEDIA_SCHEMA shape: id + binary ``payload``).
    Non-audio payloads are dropped inside the Arrow batch — one decode
    pass, no shuffle."""
    cols = media.select(F.col(id_col).alias("id"), "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for i, p in zip(pdf["id"], pdf["payload"]):
                payload = bytes(p)
                if mc.sniff(payload) != "wav":
                    continue
                _, samples = mc.decode_wav(payload)
                ids.append(i)
                fps.append(_pack_bits(afp_bits(samples)))
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "afp": pd.Series(fps, dtype="int64"),
                }
            )

    return cols.mapInPandas(run, schema="id bigint, afp bigint")


def audio_neardup_pairs(
    media: DataFrame, max_hamming: int = 6, id_col: str = "doc_id"
) -> DataFrame:
    """Near-duplicate audio pairs within a hamming radius:
    (id_a, id_b, hamming), recall 1.0 via pigeonhole blocking (the
    image-phash operating point: radius 6 -> 7 blocks x >= 9 bits)."""
    fp = audio_fingerprint(media, id_col)
    x = hamming_block_keys(fp, max_hamming, "afp")
    return blocked_hamming_join(x, max_hamming, "afp")


def audio_neardup_degree(
    media: DataFrame, max_hamming: int = 6, id_col: str = "doc_id"
) -> DataFrame:
    """Per-clip fingerprint report + near-dup degree: (id, afp,
    n_neardups) where n_neardups counts OTHER clips within the radius —
    the keep/drop signal a pipeline thresholds on (degree 0 = unique).
    One decode pass shared by the report and the pair join via a lazy
    localCheckpoint (the image_neardup_degree pattern; the relation is
    2 longs per clip, cheap at any scale)."""
    fp = audio_fingerprint(media, id_col).localCheckpoint(eager=False)
    x = hamming_block_keys(fp, max_hamming, "afp")
    pairs = blocked_hamming_join(x, max_hamming, "afp")
    deg = (
        pairs.select(F.explode(F.array("id_a", "id_b")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("nd"))
    )
    return fp.join(deg, "id", "left").select(
        "id", "afp",
        F.coalesce(F.col("nd"), F.lit(0)).cast("bigint").alias("n_neardups"),
    )
