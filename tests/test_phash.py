"""Perceptual-hash image near-dup tier (operators/phash.py).

Certifies: the mapInPandas hash kernel against a pure-python
generation-rule replay, planted near-duplicate detection, recall 1.0
of the pigeonhole blocking vs an exhaustive numpy all-pairs check, and
the per-image degree report consumed by the driver entry.
"""

import hashlib

import numpy as np
import pytest

from sgdnet_spark.operators import media_codec as mc
from sgdnet_spark.operators import phash as P


def _img(seed: str) -> np.ndarray:
    d = hashlib.sha256(seed.encode()).digest()
    w, h = 16 + d[0] % 48, 16 + d[1] % 48
    return np.resize(np.frombuffer(d, dtype=np.uint8), (h, w, 3))


def _media(spark, imgs):
    return spark.createDataFrame(
        [(i, bytearray(mc.encode_bmp(px))) for i, px in imgs],
        "doc_id bigint, payload binary",
    )


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def test_hash_kernel_matches_generation_rule_replay(spark):
    """dhash/ahash parsed from REAL encoded BMP bytes == the integer
    index replay straight off the digest (the DuckDB oracle's recipe) —
    same check the driver's hash gate runs, kept local for speed."""
    imgs = [(i, _img(f"doc {i}")) for i in range(12)]
    got = {r["id"]: (r["dhash"], r["ahash"])
           for r in P.image_phash(_media(spark, imgs)).collect()}
    for i, px in imgs:
        want = (P._pack_bits(P.dhash_bits(px)), P._pack_bits(P.ahash_bits(px)))
        assert got[i] == want, i


def test_planted_neardups_detected_and_audio_skipped(spark):
    """A few perturbed pixels must land within the radius; unrelated
    images must not pair; WAV payloads are skipped inside the batch."""
    base = _img("base image")
    near = base.copy()
    near[0:2, 0:2, :] = 255  # tiny corner stamp
    rows = [(0, base), (2, near)] + [(2 * k, _img(f"far {k}")) for k in range(2, 12)]
    media = _media(spark, rows).unionByName(
        spark.createDataFrame(
            [(99, bytearray(mc.encode_wav(np.zeros(400, dtype=np.int16), 8000)))],
            "doc_id bigint, payload binary",
        )
    )
    assert P.image_phash(media).count() == len(rows)  # audio row dropped
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in P.image_neardup_pairs(media, max_hamming=6).collect()}
    assert set(pairs) == {(0, 2)}
    assert pairs[(0, 2)] <= 6
    deg = {r["id"]: r["n_neardups"]
           for r in P.image_neardup_degree(media, max_hamming=6).collect()}
    assert deg[0] == 1 and deg[2] == 1
    assert all(v == 0 for i, v in deg.items() if i not in (0, 2))
    with pytest.raises(ValueError, match="method"):
        P.image_neardup_pairs(media, method="md5")


def test_blocked_recall_equals_exhaustive_all_pairs(spark, sf_dir):
    """Pigeonhole blocking finds EXACTLY the exhaustive numpy all-pairs
    set — on the sf0.001 corpus images PLUS planted perturbed variants
    (so the expected set is non-empty at both radii), for both hash
    methods."""
    from sgdnet_spark.operators import multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    media = multimodal.attach_media(docs).select("doc_id", "payload")
    planted = []
    for j, (i, seed) in enumerate([(10_000, "p one"), (10_002, "p two")]):
        px = _img(seed)
        planted.append((i, px))
        dup = px.copy()
        dup[3:5, 3:7, :] = j * 90  # a few cells: near, not exact
        planted.append((i + 10, dup))
    media = media.unionByName(_media(spark, planted))
    hashes = {r["id"]: (r["dhash"], r["ahash"])
              for r in P.image_phash(media, id_col="doc_id").collect()}
    ids = sorted(hashes)
    for radius in (6, 12):
        for m, mi in (("dhash", 0), ("ahash", 1)):
            want = {
                (a, b): _ham(hashes[a][mi], hashes[b][mi])
                for ai, a in enumerate(ids)
                for b in ids[ai + 1:]
                if _ham(hashes[a][mi], hashes[b][mi]) <= radius
            }
            got = {(r["id_a"], r["id_b"]): r["hamming"]
                   for r in P.image_neardup_pairs(
                       media, max_hamming=radius, method=m).collect()}
            assert got == want, (radius, m)
            if radius == 12 and m == "dhash":
                assert {(10_000, 10_010), (10_002, 10_012)} <= set(want)
