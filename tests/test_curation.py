"""Curation operators (operators/curation.py) vs independent scalar
referees — repetition quality, exact-substring spans, deterministic
mixture sampling, sequence packing."""

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from yomitoku_spark.operators import curation as CUR

DOCS = [
    # (doc_id, text, lang)
    (0, "the cat sat on the mat and the cat sat on the mat again", "en"),
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"),
    (2, "The Cat SAT on the mat and the cat sat on the MAT again", "zh"),
    (3, "one two three one two three one two three one two three", "es"),
    (4, "unique words only appear here once in this short doc", "de"),
    (5, "x", "fr"),
    (6, "alpha beta gamma delta epsilon zeta eta theta iota kappa last", "fr"),
    (7, "pad pad " + "alpha beta gamma delta epsilon zeta eta theta", "en"),
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t, lang) for i, t, lang in DOCS], "doc_id long, text string, lang string"
    )


def _toks(text):
    return [w for w in text.lower().split() if w]


# ---------------------------------------------------------------- repetition


def _scalar_repetition(text):
    t = _toks(text)
    n = len(t)
    out = {"n_tokens": n}
    for gn, name in ((2, "top2_permille"), (3, "top3_permille")):
        grams = [" ".join(t[i : i + gn]) for i in range(n - gn + 1)]
        if not grams:
            out[name] = 0
            continue
        cnt = Counter(grams)
        # tie-break: highest count, then lexicographically smallest gram
        maxc = max(cnt.values())
        top = min(g for g, c in cnt.items() if c == maxc)
        out[name] = min(1000, 1000 * gn * cnt[top] // n)
    g5 = [" ".join(t[i : i + 5]) for i in range(n - 4)]
    c5 = Counter(g5)
    covered = set()
    for i, g in enumerate(g5):
        if c5[g] >= 2:
            covered.update(range(i + 1, i + 6))
    out["dup5_cover_permille"] = int(1000 * len(covered) // n) if n else 0
    return out


def test_repetition_matches_scalar_referee(spark):
    got = {
        r["doc_id"]: r.asDict()
        for r in CUR.repetition_quality(_df(spark)).collect()
    }
    assert set(got) == {d[0] for d in DOCS}
    for doc_id, text, _ in DOCS:
        want = _scalar_repetition(text)
        row = got[doc_id]
        for k, v in want.items():
            assert row[k] == v, (doc_id, k, row[k], v)


def test_repetition_known_values(spark):
    got = {r["doc_id"]: r.asDict() for r in CUR.repetition_quality(_df(spark)).collect()}
    # doc 3: "one two three" x4 plus trailing "one two" — 12 tokens,
    # top 2-gram "one two" count 4 -> min(1000, 2*4*1000/12) = 666
    assert got[3]["top2_permille"] == 666
    # every 5-gram in doc 3 repeats -> full coverage
    assert got[3]["dup5_cover_permille"] == 1000
    # doc 4: all-unique words -> no repeated 5-gram
    assert got[4]["dup5_cover_permille"] == 0
    # single-token doc: no grams at all
    assert got[5]["top2_permille"] == 0 and got[5]["dup5_cover_permille"] == 0
    # case-folding: docs 0 and 2 are identical after lower(), so every
    # score matches
    assert got[0] == {**got[2], "doc_id": 0}


# ---------------------------------------------------------------- substring spans


def _scalar_spans(docs, k):
    occ = {}  # gram -> set(doc)
    pos = []  # (doc, pos, gram)
    for doc_id, text, _ in docs:
        t = _toks(text)
        for i in range(len(t) - k + 1):
            g = " ".join(t[i : i + k])
            occ.setdefault(g, set()).add(doc_id)
            pos.append((doc_id, i + 1, g))
    dup = {g for g, d in occ.items() if len(d) >= 2}
    spans = {}
    for doc_id, _, _ in docs:
        hits = sorted(p for d, p, g in pos if d == doc_id and g in dup)
        cur = None
        for p in hits:
            if cur and p <= cur[1] + 1:
                cur[1] = max(cur[1], p + k - 1)
            else:
                if cur:
                    spans.setdefault(doc_id, []).append(tuple(cur))
                cur = [p, p + k - 1]
        if cur:
            spans.setdefault(doc_id, []).append(tuple(cur))
    return {
        (d, s, e, e - s + 1) for d, sp in spans.items() for (s, e) in sp
    }


@pytest.mark.parametrize("k", [3, 8])
def test_substring_spans_match_scalar_referee(spark, k):
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in CUR.exact_substring_spans(_df(spark), k=k).collect()
    }
    assert got == _scalar_spans(DOCS, k)


def test_substring_spans_merge_maximal(spark):
    # docs 1 and 6 share the 10-token prefix; k=8 gives duplicated
    # grams at positions 1..3 of doc 6 -> ONE maximal span [1, 10]
    got = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in CUR.exact_substring_spans(_df(spark), k=8).collect()
        if r["doc_id"] in (1, 6)
    }
    assert got[1] == (1, 10)
    assert got[6] == (1, 10)
    # doc 7 shares only the 8-token run starting after its 2-token pad
    spans7 = [
        (r["span_start"], r["span_end"])
        for r in CUR.exact_substring_spans(_df(spark), k=8).collect()
        if r["doc_id"] == 7
    ]
    assert spans7 == [(3, 10)]


# ---------------------------------------------------------------- mixture sample


def test_mixture_sample_membership_rule(spark):
    rates = {"en": 500, "zh": 1000, "es": 800, "de": 250}
    rows = CUR.mixture_sample(_df(spark), rates, default_permille=125).collect()
    for r in rows:
        b = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:15], 16) % 1000
        assert r["bucket_permille"] == b
        assert r["rate_permille"] == rates.get(r["lang"], 125)
        assert b < r["rate_permille"]
    # zh rate 1000 selects everything
    zh_all = {d[0] for d in DOCS if d[2] == "zh"}
    assert {r["doc_id"] for r in rows if r["lang"] == "zh"} == zh_all


def test_mixture_sample_deterministic_and_nested(spark):
    df = _df(spark)
    a = {r["doc_id"] for r in CUR.mixture_sample(df, {"en": 500}, 500).collect()}
    b = {
        r["doc_id"]
        for r in CUR.mixture_sample(df.repartition(7), {"en": 500}, 500).collect()
    }
    assert a == b  # partitioning-independent
    # rate monotonicity: permille-250 sample is a subset of permille-500
    lo = {r["doc_id"] for r in CUR.mixture_sample(df, {}, 250).collect()}
    hi = {r["doc_id"] for r in CUR.mixture_sample(df, {}, 500).collect()}
    assert lo <= hi


# ---------------------------------------------------------------- packing


def test_pack_chunks_offsets_contiguous(spark):
    rows = CUR.pack_chunks(_df(spark), chunk_tokens=10).collect()
    by_stream = {}
    for r in sorted(rows, key=lambda r: (r["lang"], r["doc_id"])):
        by_stream.setdefault(r["lang"], []).append(r)
    for lang, rs in by_stream.items():
        off = 0
        for r in rs:
            assert r["start_offset"] == off
            assert r["first_chunk"] == off // 10
            assert r["last_chunk"] == (off + r["n_tokens"] - 1) // 10
            off += r["n_tokens"]


def test_pack_chunks_straddles_and_zero_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g", "en"), (2, "h i j k l", "en"), (3, "", "en")],
        "doc_id long, text string, lang string",
    )
    rows = {r["doc_id"]: r for r in CUR.pack_chunks(df, chunk_tokens=4).collect()}
    assert 3 not in rows  # zero-token docs drop
    assert (rows[1]["first_chunk"], rows[1]["last_chunk"]) == (0, 1)  # 7 toks: 0..6
    assert (rows[2]["first_chunk"], rows[2]["last_chunk"]) == (1, 2)  # 7..11
