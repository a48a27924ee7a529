"""Acoustic-fingerprint audio near-dup tier (operators/audiofp.py).

Certifies: the mapInPandas fingerprint kernel against a pure-python
generation-rule replay, gain invariance (the Haitsma-Kalker sign
property), planted near-duplicate detection, recall 1.0 of the
pigeonhole blocking vs an exhaustive numpy all-pairs check, and the
per-clip degree report consumed by the driver entry.
"""

import hashlib

import numpy as np
import pytest

from sgdnet_spark.operators import audiofp as A
from sgdnet_spark.operators import media_codec as mc
from sgdnet_spark.operators.phash import _pack_bits


def _clip(seed: str) -> np.ndarray:
    """The multimodal generation rule's WAV samples for sha256(seed)."""
    d = hashlib.sha256(seed.encode()).digest()
    n = 256 + d[2] * 8
    return (
        np.resize(np.frombuffer(d, dtype=np.uint8), n).astype(np.int16) * 64 - 8192
    ).astype(np.int16)


def _media(spark, clips):
    return spark.createDataFrame(
        [(i, bytearray(mc.encode_wav(s, 8000))) for i, s in clips],
        "doc_id bigint, payload binary",
    )


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def test_fingerprint_kernel_matches_generation_rule_replay(spark):
    """afp parsed from REAL encoded WAV bytes == the integer window
    replay straight off the samples (the DuckDB oracle's recipe)."""
    clips = [(i, _clip(f"doc {i}")) for i in range(12)]
    got = {r["id"]: r["afp"] for r in A.audio_fingerprint(_media(spark, clips)).collect()}
    for i, s in clips:
        assert got[i] == _pack_bits(A.afp_bits(s)), i


def test_gain_invariance_and_short_clip_rejected():
    """Energy-delta SIGNS survive a global gain change (the fingerprint
    family's defining robustness property); clips shorter than the
    window count are rejected loudly."""
    s = _clip("gain test")
    assert np.array_equal(A.afp_bits(s), A.afp_bits((s.astype(np.int32) * 2).astype(np.int16)))
    half = (s.astype(np.int32) // 2).astype(np.int16)
    base, scaled = A.afp_bits(s), A.afp_bits(half)
    # halving truncates toward zero — ties can flip only where energies
    # are near-equal; allow a tiny slack but demand near-identity
    assert int((base != scaled).sum()) <= 2
    with pytest.raises(ValueError, match="too short"):
        A.afp_bits(np.zeros(64, dtype=np.int16))


def test_planted_neardups_detected_and_images_skipped(spark):
    """A lightly-noised clip must land within the radius; unrelated
    clips must not pair; BMP payloads are skipped inside the batch."""
    rng = np.random.RandomState(7)
    base = _clip("base clip")
    near = base.copy()
    # nudge a handful of samples: window energies barely move, so at
    # most a couple of delta signs flip
    idx = rng.choice(base.size, 8, replace=False)
    near[idx] = near[idx] + 16
    rows = [(0, base), (2, near)] + [(2 * k, _clip(f"far {k}")) for k in range(2, 12)]
    d = hashlib.sha256(b"img").digest()
    px = np.resize(np.frombuffer(d, dtype=np.uint8), (16, 16, 3))
    media = _media(spark, rows).unionByName(
        spark.createDataFrame(
            [(99, bytearray(mc.encode_bmp(px)))], "doc_id bigint, payload binary"
        )
    )
    assert A.audio_fingerprint(media).count() == len(rows)  # image row dropped
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in A.audio_neardup_pairs(media, max_hamming=6).collect()}
    assert set(pairs) == {(0, 2)}
    assert pairs[(0, 2)] <= 6
    deg = {r["id"]: r["n_neardups"]
           for r in A.audio_neardup_degree(media, max_hamming=6).collect()}
    assert deg[0] == 1 and deg[2] == 1
    assert all(v == 0 for i, v in deg.items() if i not in (0, 2))


def test_blocked_recall_equals_exhaustive_all_pairs(spark, sf_dir):
    """Pigeonhole blocking finds EXACTLY the exhaustive numpy all-pairs
    set — on the sf0.001 corpus audio clips PLUS planted perturbed
    variants (so the expected set is non-empty at both radii)."""
    from sgdnet_spark.operators import multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    media = multimodal.attach_media(docs).select("doc_id", "payload")
    planted = []
    rng = np.random.RandomState(11)
    for i, seed in [(10_001, "p one"), (10_003, "p two")]:
        s = _clip(seed)
        planted.append((i, s))
        dup = s.copy()
        idx = rng.choice(s.size, 6, replace=False)
        dup[idx] = dup[idx] - 24
        planted.append((i + 10, dup))
    media = media.unionByName(_media(spark, planted))
    fps = {r["id"]: r["afp"]
           for r in A.audio_fingerprint(media, id_col="doc_id").collect()}
    ids = sorted(fps)
    for radius in (6, 12):
        want = {
            (a, b): _ham(fps[a], fps[b])
            for ai, a in enumerate(ids)
            for b in ids[ai + 1:]
            if _ham(fps[a], fps[b]) <= radius
        }
        got = {(r["id_a"], r["id_b"]): r["hamming"]
               for r in A.audio_neardup_pairs(media, max_hamming=radius).collect()}
        assert got == want, radius
        if radius == 12:
            assert {(10_001, 10_011), (10_003, 10_013)} <= set(want)
