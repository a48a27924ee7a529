"""Pure-numpy/stdlib codecs for real media formats.

No image/audio libraries exist in this environment, but two widespread
formats are simple enough to encode/decode with ``struct`` + numpy
alone — which makes the multimodal pipeline's decode step REAL, not a
stub:

- **BMP** (Windows bitmap, uncompressed 24-bit BGR, bottom-up rows,
  4-byte row padding) — the format spec is public (BITMAPFILEHEADER +
  BITMAPINFOHEADER, 54-byte header total).
- **WAV** (RIFF PCM, 16-bit mono) — 44-byte canonical header.

These run inside Arrow-batched ``mapInPandas`` kernels
(operators/multimodal.py); a PIL/ffmpeg kernel drops into the same
slots for formats beyond these two.
"""

from __future__ import annotations

import struct

import numpy as np

# --- BMP ------------------------------------------------------------------

_BMP_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, pixel offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")  # 40-byte BITMAPINFOHEADER


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit BMP."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # BMP stores rows bottom-up in BGR order
    bgr = pixels[::-1, :, ::-1]
    if pad:
        body = np.zeros((h, row_bytes + pad), dtype=np.uint8)
        body[:, :row_bytes] = bgr.reshape(h, row_bytes)
    else:
        body = bgr.reshape(h, row_bytes)
    data = body.tobytes()
    header = _BMP_HEADER.pack(b"BM", 54 + len(data), 0, 0, 54)
    info = _BMP_INFO.pack(40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP into an (h, w, 3) uint8 RGB array."""
    magic, _, _, _, offset = _BMP_HEADER.unpack_from(data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _, w, h, _, bpp, compression = _BMP_INFO.unpack_from(data, 14)[:6]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} compression={compression}")
    top_down = h < 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    body = np.frombuffer(data, dtype=np.uint8, count=h * stride, offset=offset)
    rows = body.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an (h, w, 3) array to (height, width, 3)."""
    h, w = pixels.shape[:2]
    yi = (np.arange(height) * (h / height)).astype(np.int64).clip(0, h - 1)
    xi = (np.arange(width) * (w / width)).astype(np.int64).clip(0, w - 1)
    return pixels[yi][:, xi]


# --- WAV ------------------------------------------------------------------

_WAV_FMT = struct.Struct("<4sI4s4sIHHIIHH4sI")  # canonical 44-byte PCM header


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode a 1-D int16 array as 16-bit mono PCM WAV."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError("encode_wav expects 1-D int16")
    data = samples.tobytes()
    header = _WAV_FMT.pack(
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", len(data),
    )
    return header + data


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode 16-bit mono PCM WAV -> (sample_rate, int16 samples).

    Walks the RIFF chunk list to the ``data`` chunk rather than assuming
    it sits at byte 36: real-world writers (ffmpeg, Windows recorders)
    insert LIST/fact chunks after ``fmt ``, and blindly reading byte 36
    would reinterpret such a chunk's bytes as PCM samples."""
    riff, _, wave_, fmt, fmt_len, audio_fmt, n_ch, rate, _, _, bits, tag0, n0 = (
        _WAV_FMT.unpack_from(data, 0)
    )
    if riff != b"RIFF" or wave_ != b"WAVE" or fmt != b"fmt ":
        raise ValueError("not a WAV payload")
    if audio_fmt != 1 or n_ch != 1 or bits != 16 or fmt_len != 16:
        raise ValueError(f"unsupported WAV variant: fmt={audio_fmt} ch={n_ch} bits={bits}")
    off, tag, size = 36, tag0, n0
    while tag != b"data":
        off += 8 + size + (size & 1)  # RIFF chunks are word-aligned
        if off + 8 > len(data):
            raise ValueError("WAV payload has no data chunk")
        tag, size = struct.unpack_from("<4sI", data, off)
    samples = np.frombuffer(data, dtype="<i2", count=size // 2, offset=off + 8)
    return rate, samples


def sniff(data: bytes) -> str:
    """Identify a payload's container by magic bytes."""
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return "unknown"
