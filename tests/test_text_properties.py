"""Property tests for the round-8 text/scrub operators: random corpora
vs pure-python replays.

The corpus alphabet is printable ASCII with {space, tab, newline}
whitespace only — the subset where Java's \\s (norm_text) and python's
str.split() agree, so the replay is exact by construction. Unicode
whitespace classes differ between the engines and are out of the
operators' normalization contract (documents normalize through
norm_text on BOTH the Spark side and the DuckDB oracle, which agree;
the python replay here is a third implementation kept deliberately in
the common subset).
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings, strategies as st

from sgdnet_spark.operators import dedup, text

_WORD = st.text(alphabet="abcXY", min_size=1, max_size=3)
_WS = st.sampled_from([" ", "  ", "\t", " \t "])


@st.composite
def _doc(draw):
    words = draw(st.lists(_WORD, min_size=0, max_size=8))
    seps = [draw(_WS) for _ in words]
    return "".join(w + s for w, s in zip(words, seps))


def _norm(t: str) -> str:
    return " ".join(t.lower().split())


@settings(max_examples=10, deadline=None)
@given(docs=st.lists(_doc(), min_size=1, max_size=12), k=st.sampled_from([0.1, 0.7]))
def test_lm_score_random_corpora_match_replay(spark, docs, k):
    rows = [(i, d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
           for r in text.lm_score(df, k_smooth=k).collect()}

    toks = {i: _norm(d).split(" ") for i, d in rows}
    toks = {i: t for i, t in toks.items() if t != [""] and len(t) >= 2}
    bgc, cw = Counter(), Counter()
    for t in toks.values():
        for a, b in zip(t, t[1:]):
            bgc[(a, b)] += 1
    for (a, _b), c in bgc.items():
        cw[a] += c
    v = len({w for t in toks.values() for w in t})
    want = {}
    for i, t in toks.items():
        lps = [math.log((bgc[(a, b)] + k) / (cw[a] + k * v)) for a, b in zip(t, t[1:])]
        want[i] = (len(lps), math.floor(sum(lps) / len(lps) * 1e4 + 0.5) / 1e4)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(st.lists(_doc(), min_size=0, max_size=4), min_size=1, max_size=8),
    min_docs=st.sampled_from([2, 3]),
)
def test_line_scrub_random_corpora_match_replay(spark, docs, min_docs):
    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_lines"], r["n_dup_lines"], r["text_clean"])
           for r in dedup.line_scrub(df, min_docs=min_docs).collect()}

    norm_lines = {i: [(ln, _norm(ln)) for ln in t.split("\n") if _norm(ln) != ""]
                  for i, t in rows}
    freq = Counter()
    for ls in norm_lines.values():
        for n in {n for _, n in ls}:
            freq[n] += 1
    flagged = {n for n, c in freq.items() if c >= min_docs}
    want = {}
    for i, ls in norm_lines.items():
        if not ls:
            continue
        kept = [raw for raw, n in ls if n not in flagged]
        want[i] = (len(ls), sum(1 for _, n in ls if n in flagged), "\n".join(kept))
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(_doc(), min_size=1, max_size=10),
    k=st.sampled_from([3, 5]),
    mod_p=st.sampled_from([1, 2]),
)
def test_repeated_spans_random_corpora_match_replay(spark, docs, k, mod_p):
    """repeated_spans + scrub_spans on random corpora == the pure-python
    replay of window selection, global counting, island merge, and the
    splice (small k so short random docs actually produce windows)."""
    import hashlib

    rows = [(i, d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sp = dedup.repeated_spans(df, k=k, mod_p=mod_p)
    got = {}
    for r in sp.collect():
        got.setdefault(r["doc_id"], []).append((r["s_start"], r["s_end"]))
    got = {i: sorted(v) for i, v in got.items()}

    norm = {i: _norm(d) for i, d in rows}
    sel, cnt = {}, Counter()
    for i, t in norm.items():
        ps = []
        for p in range(len(t) - k + 1):
            h = hashlib.md5((t[p : p + k] + "xs").encode()).hexdigest()
            if int(h[:8], 16) % mod_p == 0:
                ps.append((p + 1, h))
                cnt[h] += 1
        sel[i] = ps
    want = {}
    for i, ps in sel.items():
        hits = sorted(p for p, h in ps if cnt[h] >= 2)
        out, cur = [], None
        for p in hits:
            if cur and p <= cur[1] + 1:
                cur[1] = max(cur[1], p + k - 1)
            else:
                cur = [p, p + k - 1]
                out.append(cur)
        if out:
            want[i] = [tuple(s) for s in out]
    assert got == want

    # splice replay
    clean = {r["doc_id"]: r["text_clean"]
             for r in dedup.scrub_spans(df, spans=sp, k=k, mod_p=mod_p).collect()}
    for i, t in norm.items():
        pos, out = 1, ""
        for s, e in want.get(i, []):
            out += t[pos - 1 : s - 1]
            pos = e + 1
        out += t[pos - 1 :]
        assert clean[i] == out, i


@settings(max_examples=10, deadline=None)
@given(
    length=st.integers(min_value=1, max_value=40),
    spans=st.lists(
        st.tuples(st.integers(1, 40), st.integers(0, 12)).map(
            lambda t: (t[0], min(t[0] + t[1], 45))
        ),
        min_size=0,
        max_size=6,
    ),
)
def test_scrub_spans_arbitrary_overlapping_spans_match_merge_replay(
    spark, length, spans
):
    """scrub_spans on ARBITRARY caller-supplied spans (overlapping,
    nested, duplicated, out of range) == python merge-overlaps-then-
    splice. The round-9 clamp makes the fold algebraically identical to
    merging first; this pins it over the whole input space, not just
    the hand cases."""
    raw = "abcdefghijklmnopqrstuvwxyz0123456789abcd"[:length]
    df = spark.createDataFrame([(1, raw)], "doc_id long, text string")
    sp_rows = [(1, s, e) for s, e in spans]
    sp = (
        spark.createDataFrame(sp_rows, "doc_id long, s_start long, s_end long")
        if sp_rows
        else spark.createDataFrame([], "doc_id long, s_start long, s_end long")
    )
    out = dedup.scrub_spans(df, spans=sp).collect()[0]

    # python replay: merge overlapping/adjacent-contained spans, splice
    merged = []
    for s, e in sorted(spans):
        if merged and s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    want, pos = "", 1
    for s, e in merged:
        want += raw[pos - 1 : max(s - 1, pos - 1)]
        pos = max(e + 1, pos)
    want += raw[pos - 1 :]
    assert out["text_clean"] == want
    assert out["n_cut_chars"] == len(raw) - len(want)
