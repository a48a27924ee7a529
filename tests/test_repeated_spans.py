"""ExactSubstr repeated-span detection (dedup.repeated_spans): planted
duplicates at different offsets (phase independence of content-defined
selection), exhaustive-mode exactness, island merging, and validation."""

import hashlib

import pytest
from pyspark.sql import functions as F

from sgdnet_spark.operators.dedup import repeated_spans


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _py_spans(rows, k, mod_p, salt="xs"):
    """Pure-python replay of the same algorithm on normalized text."""
    import re
    from collections import Counter

    norm = {i: re.sub(r"\s+", " ", t.lower()).strip() for i, t in rows}
    sel = {}
    cnt = Counter()
    for i, t in norm.items():
        ps = []
        for p in range(len(t) - k + 1):
            h = hashlib.md5((t[p : p + k] + salt).encode()).hexdigest()
            if int(h[:8], 16) % mod_p == 0:
                ps.append((p + 1, h))
                cnt[h] += 1
        sel[i] = ps
    spans = {}
    for i, ps in sel.items():
        hits = sorted(p for p, h in ps if cnt[h] >= 2)
        out, cur = [], None
        for p in hits:
            if cur and p <= cur[1] + 1:
                cur[1] = max(cur[1], p + k - 1)
            else:
                cur = [p, p + k - 1]
                out.append(cur)
        spans[i] = [tuple(s) for s in out]
    return spans


def test_planted_duplicate_found_at_any_offset(spark):
    # the same 60-char passage planted at DIFFERENT offsets in two
    # otherwise-distinct docs: content-defined selection has no phase,
    # so the span is flagged in both docs (mod_p=1 exhaustive mode)
    dup = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, "alpha beta gamma " + dup + " delta epsilon zeta eta theta"),
        (2, "one two " + dup + " three four five six seven eight nine ten"),
        (3, "totally unrelated filler content with no repeats anywhere at all"),
    ]
    sp = repeated_spans(_mk(spark, rows), k=24, mod_p=1).collect()
    by_doc = {}
    for r in sp:
        by_doc.setdefault(r["doc_id"], []).append((r["s_start"], r["s_end"]))
    assert 1 in by_doc and 2 in by_doc and 3 not in by_doc
    # in exhaustive mode the merged span COVERS the planted passage
    # (it may extend by the flanking spaces both docs share, which are
    # genuinely part of the maximal repeated substring)
    for doc_rows, (i, raw) in zip((by_doc[1], by_doc[2]), rows[:2]):
        start = raw.index(dup) + 1
        (s, e), = doc_rows
        assert s <= start and e >= start + len(dup) - 1
        assert s >= start - 1 and e <= start + len(dup)  # at most the spaces


def test_matches_pure_python_replay_with_sampling(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    got = {}
    for r in repeated_spans(_mk(spark, rows), k=32, mod_p=4).collect():
        got.setdefault(r["doc_id"], []).append((r["s_start"], r["s_end"]))
    want = {i: sp for i, sp in _py_spans(rows, 32, 4).items() if sp}
    assert {k: sorted(v) for k, v in got.items()} == want


def test_within_doc_repetition_counts(spark):
    # min_count occurrences may live in ONE doc (Lee et al. count all
    # occurrences corpus-wide, including self-repeats)
    seg = "repeat me repeat me repeat me xyz"
    rows = [(1, seg + " filler words here " + seg)]
    sp = repeated_spans(_mk(spark, rows), k=16, mod_p=1).collect()
    assert len(sp) >= 1


def test_short_docs_and_validation(spark):
    rows = [(1, "tiny"), (2, "tiny")]
    assert repeated_spans(_mk(spark, rows), k=32, mod_p=1).count() == 0
    with pytest.raises(ValueError, match="k must"):
        repeated_spans(_mk(spark, rows), k=1)
    with pytest.raises(ValueError, match="mod_p"):
        repeated_spans(_mk(spark, rows), mod_p=0)


def test_span_stats_fold_equals_window_merge(spark, sf_dir):
    # the in-row gaps-and-islands fold (streaming-safe) must equal
    # aggregating the window-merge spans, and flagged= must reuse a
    # pre-fit hash relation without changing anything
    from sgdnet_spark.operators.dedup import (
        fit_repeated_hashes,
        repeated_span_stats,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fl = fit_repeated_hashes(docs, k=32, mod_p=4)
    sp = repeated_spans(docs, k=32, mod_p=4, flagged=fl)
    want = {
        (r["doc_id"], r["n"], r["dup"], r["lg"])
        for r in sp.groupBy("doc_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("s_end") - F.col("s_start") + 1).alias("dup"),
            F.max(F.col("s_end") - F.col("s_start") + 1).alias("lg"),
        )
        .collect()
    }
    got = {
        tuple(r)
        for r in repeated_span_stats(docs, k=32, mod_p=4, flagged=fl).collect()
    }
    assert got == want and len(got) > 0


def test_scrub_spans_removes_planted_duplicates(spark):
    from sgdnet_spark.operators.dedup import repeated_spans, scrub_spans

    dup = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, "alpha beta gamma " + dup + " delta epsilon zeta eta theta"),
        (2, "one two " + dup + " three four five six seven eight nine ten"),
        (3, "totally unrelated filler content with no repeats anywhere at all"),
    ]
    df = _mk(spark, rows)
    sp = repeated_spans(df, k=24, mod_p=1)
    out = {r["doc_id"]: r for r in scrub_spans(df, spans=sp, k=24, mod_p=1).collect()}
    # python replay of the splice on the same spans
    spans_by_doc = {}
    for r in sp.collect():
        spans_by_doc.setdefault(r["doc_id"], []).append((r["s_start"], r["s_end"]))
    for i, raw in rows:
        want, pos = "", 1
        for s, e in sorted(spans_by_doc.get(i, [])):
            want += raw[pos - 1 : s - 1]
            pos = e + 1
        want += raw[pos - 1 :]
        assert out[i]["text_clean"] == want, i
        assert out[i]["n_cut_chars"] == len(raw) - len(want)
    # every occurrence of the duplicated passage is gone
    assert dup not in out[1]["text_clean"] and dup not in out[2]["text_clean"]
    # the untouched doc passes through whole
    assert out[3]["text_clean"] == rows[2][1] and out[3]["n_cut_chars"] == 0
    # and re-detection on the scrubbed corpus finds nothing at this k
    clean = spark.createDataFrame(
        [(i, r["text_clean"]) for i, r in out.items()], ["doc_id", "text"]
    )
    assert repeated_spans(clean, k=24, mod_p=1).count() == 0


def test_scrub_spans_accepts_int_typed_spans(spark):
    # caller-supplied spans relations may carry int offsets (hand-built
    # frames, numpy int32 via createDataFrame); the splice fold casts to
    # long so the accumulator unifies
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    from sgdnet_spark.operators.dedup import scrub_spans

    df = _mk(spark, [(1, "abcdefghij")])
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("s_start", IntegerType()),
        StructField("s_end", IntegerType()),
    ])
    sp = spark.createDataFrame([(1, 3, 5)], schema)
    out = scrub_spans(df, spans=sp).collect()[0]
    assert out["text_clean"] == "abfghij" and out["n_cut_chars"] == 3


def test_scrub_spans_clamps_overlapping_spans(spark):
    # caller-supplied spans may overlap or nest; the fold clamps the cut
    # window so the result equals splicing the MERGED spans (no negative
    # substring lengths silently dropping inter-span text)
    from sgdnet_spark.operators.dedup import scrub_spans

    raw = "abcdefghijklmnopqrstuvwxyz"
    df = _mk(spark, [(1, raw)])
    cases = [
        # (spans, merged)
        ([(3, 8), (5, 10)], [(3, 10)]),          # overlap
        ([(3, 10), (5, 7)], [(3, 10)]),          # contained
        ([(3, 5), (3, 5)], [(3, 5)]),            # duplicate
        ([(2, 6), (4, 9), (15, 18), (16, 17)], [(2, 9), (15, 18)]),
    ]
    for spans, merged in cases:
        sp = spark.createDataFrame(
            [(1, s, e) for s, e in spans], ["doc_id", "s_start", "s_end"]
        )
        out = scrub_spans(df, spans=sp).collect()[0]
        want, pos = "", 1
        for s, e in merged:
            want += raw[pos - 1 : s - 1]
            pos = e + 1
        want += raw[pos - 1 :]
        assert out["text_clean"] == want, spans
        assert out["n_cut_chars"] == len(raw) - len(want), spans
