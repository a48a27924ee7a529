"""Multimodal (image/audio/video) columns with REAL binary codecs.

Binary payloads travel as opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction / resize / frame-sampling
run as Arrow-batched ``mapInPandas`` stages.

As of round 3 the decode is REAL: payloads are genuine 24-bit BMP
images and 16-bit PCM WAV clips (encoded/decoded with the pure
numpy/struct codecs in operators/media_codec.py — no image/audio
libraries needed), and every downstream feature (width, height,
n_frames, sample rate, content mean) is parsed out of the actual
bytes. Containers beyond BMP/WAV raise a clear error at the decode
gate — that is where a PIL/ffmpeg kernel drops in.

Payload generation is deterministic from ``sha256(text)`` so the
driver's DuckDB oracle can independently recompute the expected
dimensions from the same rule (see queries.py::multimodal_meta).
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from sgdnet_spark.operators import media_codec as mc

MEDIA_SCHEMA = "doc_id bigint, media_type string, payload binary, meta struct<mime:string, n_bytes:bigint>"

_WAV_RATE = 8000
_WAV_FRAME = 400  # samples per logical "frame" (50 ms @ 8 kHz)


def _gen_payload(doc_id: int, text: str) -> tuple[str, str, bytes]:
    """Deterministic real payload for a document: even doc_id -> BMP
    image, odd -> WAV clip. All dimensions derive from sha256(text) so
    an oracle can recompute them without decoding."""
    d = hashlib.sha256(text.encode("utf-8")).digest()
    if doc_id % 2 == 0:
        w, h = 16 + d[0] % 48, 16 + d[1] % 48
        px = np.resize(np.frombuffer(d, dtype=np.uint8), (h, w, 3))
        return "image", "image/bmp", mc.encode_bmp(px)
    n = 256 + d[2] * 8
    samples = (np.resize(np.frombuffer(d, dtype=np.uint8), n).astype(np.int16) * 64 - 8192).astype(
        np.int16
    )
    return "audio", "audio/wav", mc.encode_wav(samples, _WAV_RATE)


def attach_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Encode each document into a real media payload (BMP / WAV) +
    typed metadata struct, batch-wise over Arrow.

    Stands in for reading real image/audio bytes from parquet/blob
    store — but the bytes ARE valid files a stock viewer would open.
    """
    cols = df.select(id_col, text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            types, mimes, payloads = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                t, m, p = _gen_payload(int(doc_id), str(text))
                types.append(t)
                mimes.append(m)
                payloads.append(p)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": types,
                    "payload": payloads,
                    "meta": [
                        {"mime": m, "n_bytes": len(p)} for m, p in zip(mimes, payloads)
                    ],
                }
            )

    return cols.mapInPandas(run, schema=MEDIA_SCHEMA)


# back-compat alias (pre-round-3 name; payloads were fake then, real now)
attach_fake_media = attach_media


def decode_media(payload: bytes) -> dict:
    """REAL decode: sniff the container magic and parse the actual
    bytes. Returns a uniform feature dict across modalities:

    - bmp: width/height from the header, pixels decoded, n_frames=1,
      content_mean = mean pixel value.
    - wav: PCM samples decoded, n_frames = ceil(n_samples/400),
      content_mean = mean |amplitude|.
    """
    kind = mc.sniff(payload)
    if kind == "bmp":
        px = mc.decode_bmp(payload)
        return {
            "width": px.shape[1],
            "height": px.shape[0],
            "n_frames": 1,
            "sample_rate": 0,
            "content_mean": float(px.mean()),
        }
    if kind == "wav":
        rate, samples = mc.decode_wav(payload)
        # a zero-sample clip has ZERO frames (consistent with
        # sample_frames, which emits no rows for it) and a 0.0 mean —
        # max(1, ...) plus mean-of-empty would report 1 phantom frame
        # with NaN content and desync the two surfaces
        return {
            "width": 0,
            "height": 0,
            "n_frames": math.ceil(len(samples) / _WAV_FRAME),
            "sample_rate": rate,
            "content_mean": (
                float(np.abs(samples.astype(np.int64)).mean()) if len(samples) else 0.0
            ),
        }
    raise NotImplementedError(
        "unsupported media container (only BMP/WAV have built-in pure-numpy "
        "codecs); drop a PIL/ffmpeg kernel into this gate for other formats"
    )


# pre-round-3 names kept so external callers keep working
decode_real = decode_media


def extract_features(media: DataFrame, batch_decode=decode_media) -> DataFrame:
    """mapInPandas decode + feature extraction over Arrow batches.

    Output schema is the contract a downstream trainer consumes; every
    value is parsed from the real payload bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [batch_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_frames": [f["n_frames"] for f in feats],
                    "sample_rate": [f["sample_rate"] for f in feats],
                    "content_mean": [f["content_mean"] for f in feats],
                }
            )

    return media.mapInPandas(
        run,
        schema=(
            "doc_id bigint, media_type string, n_bytes bigint, width bigint, "
            "height bigint, n_frames bigint, sample_rate bigint, content_mean double"
        ),
    )


def resize(media: DataFrame, width: int, height: int) -> DataFrame:
    """Batch resize over mapInPandas: BMP payloads are decoded,
    nearest-neighbor resampled to (width, height), and re-encoded as
    real BMPs; audio payloads pass through unchanged (resize has no
    audio meaning). Metadata tracks the new byte length."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                payload = bytes(p)
                if mc.sniff(payload) == "bmp":
                    out.append(mc.encode_bmp(mc.resize_nearest(mc.decode_bmp(payload), width, height)))
                else:
                    out.append(payload)
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


def sample_frames(media: DataFrame, max_frames: int = 4) -> DataFrame:
    """Frame sampling with real byte extraction: one output row per
    sampled frame, evenly spaced over the payload's decoded frame
    count. For WAV the frame is the actual 400-sample PCM window; for
    BMP (single-frame) the frame is the decoded pixel block. The
    explode happens INSIDE the Arrow batch (pure pandas), so the only
    Spark cost is the widened output — the shape a real ffmpeg frame
    extractor needs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(p)
                kind = mc.sniff(payload)
                if kind == "bmp":
                    blocks = [mc.decode_bmp(payload).tobytes()]
                else:
                    _, samples = mc.decode_wav(payload)
                    blocks = [
                        samples[i : i + _WAV_FRAME].tobytes()
                        for i in range(0, len(samples), _WAV_FRAME)
                    ]
                n = len(blocks)
                if n == 0:  # zero-sample clip: no frames, not a ZeroDivisionError
                    continue
                take = min(max_frames, n)
                step = n / take
                for j in range(take):
                    fi = int(j * step)
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(blocks[fi])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, schema="doc_id bigint, frame_idx bigint, frame binary")
