"""Multimodal (image/audio/video) column plumbing.

Binary payloads travel as opaque ``binary`` columns with a typed metadata
struct; decode / feature-extraction run as Arrow-batched ``mapInPandas``
stages. The decode itself is STUBBED (no image/audio libs in this
container) with a deterministic fake so the Spark-side plumbing —
schema, batching, partitioning — is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "doc_id bigint, media_type string, payload binary, meta struct<mime:string, n_bytes:bigint>"


def attach_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap each document's bytes as an opaque media payload + metadata.

    Stands in for reading real image/audio bytes from parquet/blob store.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decoder.

    A real deployment would call PIL/torchaudio here; raise if someone
    expects real pixels.
    """
    h = hashlib.sha256(payload).digest()
    return {
        "width": 64 + h[0] % 64,
        "height": 64 + h[1] % 64,
        "n_frames": 1 + h[2] % 8,
    }


def decode_real(payload: bytes) -> dict:  # pragma: no cover - gate for real libs
    raise NotImplementedError(
        "real media decode requires PIL/torchaudio, not present in this environment; "
        "use decode_stub for plumbing tests"
    )


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: a real deployment returns re-encoded
    pixels; the stub returns a content-derived payload of the right
    conceptual identity (same input -> same output)."""
    h = hashlib.sha256(payload + f"{width}x{height}".encode()).digest()
    return h * (1 + len(payload) // (4 * len(h)))


def resize(media: DataFrame, width: int, height: int, batch_resize=resize_stub) -> DataFrame:
    """Batch resize over mapInPandas: payload -> payload at (width,
    height), metadata updated. The Spark-side shape — binary in/out per
    Arrow batch, meta struct rebuilt — is exactly what a PIL/ffmpeg
    kernel drops into."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [batch_resize(bytes(p), width, height) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": out,
                    "meta": [
                        {"mime": m["mime"], "n_bytes": len(b)}
                        for m, b in zip(pdf["meta"], out)
                    ],
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, max_frames: int = 4, batch_decode=decode_stub) -> DataFrame:
    """Frame sampling for video-like payloads: one output row per
    sampled frame (doc_id, frame_idx, frame payload), evenly spaced
    over the decoded frame count. The explode happens INSIDE the Arrow
    batch (pure pandas), so the only Spark cost is the widened output —
    the shape a real ffmpeg frame extractor needs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(p)
                n = batch_decode(payload)["n_frames"]
                take = min(max_frames, n)
                # evenly spaced, deterministic frame indices
                step = n / take
                for j in range(take):
                    fi = int(j * step)
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(hashlib.sha256(payload + bytes([fi])).digest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, schema="doc_id bigint, frame_idx bigint, frame binary")


def extract_features(media: DataFrame, batch_decode=decode_stub) -> DataFrame:
    """mapInPandas decode + feature extraction over Arrow batches.

    Output schema is the contract a downstream trainer consumes; the
    batch shape (one pandas frame per Arrow batch, ~10k rows) is the
    real thing even though pixels are fake.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [batch_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_frames": [f["n_frames"] for f in feats],
                }
            )

    return media.mapInPandas(
        run, schema="doc_id bigint, n_bytes bigint, width bigint, height bigint, n_frames bigint"
    )
