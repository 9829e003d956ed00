"""BM25 retrieval (operators/retrieval.py) and sliding-window chunking
(operators/curation.py) vs independent scalar referees."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from yomitoku_spark.operators import curation as CUR
from yomitoku_spark.operators import retrieval as RET

DOCS = [
    (0, "the cat sat on the mat and the cat sat on the mat again"),
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "cat cat cat cat cat cat cat cat cat cat cat cat"),
    (4, "unique words only appear here once in this short doc"),
    (5, "x"),
    (6, ""),
    (7, "brown dog and brown cat share the brown mat"),
]

QUERIES = [(100, "brown cat"), (101, "alpha kappa"), (102, "zzz absent"), (103, "")]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _toks(text):
    return [w for w in text.lower().split() if w]


# ------------------------------------------------------------------ plog2


def _scalar_plog2(x):
    assert x >= 1
    e = x.bit_length() - 1
    p = 1 << e
    return 1000 * e + (1000 * (x - p)) // p


def test_plog2_constant():
    assert _scalar_plog2(10**6) == RET.PLOG2_1M


@given(st.integers(min_value=1, max_value=2**53 - 1))
@settings(max_examples=300, deadline=None)
def test_plog2_bounds_and_monotone(x):
    v = _scalar_plog2(x)
    # exact at powers of two; within ~86 milli-bits of true log2
    # between them, plus up to 1 milli of floor quantization at each of
    # the two integer divisions
    assert abs(v - 1000 * math.log2(x)) <= 88
    if x > 1:
        assert _scalar_plog2(x - 1) <= v


def test_plog2_fragments_agree(spark):
    """The Spark-dialect fragment, the DuckDB-dialect fragment, and the
    Python scalar all agree on a value sweep."""
    import duckdb

    xs = [1, 2, 3, 7, 8, 1023, 1024, 10**6, 524288, 2**52, 2**53 - 1]
    sdf = spark.createDataFrame([(x,) for x in xs], "x long").select(
        F.expr(RET.plog2_frag("x", "spark")).alias("v")
    )
    got_spark = [r.v for r in sdf.collect()]
    frag = RET.plog2_frag("x", "duckdb")
    got_duck = [
        duckdb.sql(f"SELECT {frag} AS v FROM (VALUES ({x}),) t(x)").fetchone()[0]
        for x in xs
    ]
    want = [_scalar_plog2(x) for x in xs]
    assert got_spark == want
    assert got_duck == want


# ------------------------------------------------------------------ bm25


def _scalar_bm25(docs, queries, k=3, k1=1200, b=750):
    toks = {i: _toks(t) for i, t in docs}
    n_docs = len(docs)
    tot = sum(len(t) for t in toks.values())
    avgdl_milli = max((1000 * tot) // max(n_docs, 1), 1)
    tf = {}
    for i, t in toks.items():
        for w in t:
            tf[(i, w)] = tf.get((i, w), 0) + 1
    df = {}
    for (i, w), _ in tf.items():
        df[w] = df.get(w, 0) + 1
    out = []
    for qid, qtext in queries:
        scores = {}
        for w in sorted(set(_toks(qtext))):
            if w not in df:
                continue
            ratio = (10**6 * (2 * n_docs - 2 * df[w] + 1)) // (2 * df[w] + 1) + 10**6
            idf = _scalar_plog2(ratio) - RET.PLOG2_1M
            for i, t in toks.items():
                f = tf.get((i, w))
                if not f:
                    continue
                dl = len(t)
                inner = 1000 - b + (b * ((10**6 * dl) // avgdl_milli)) // 1000
                denom = (1000 * f + (k1 * inner) // 1000) * 1000
                tfn = (10**6 * f * (1000 + k1)) // denom
                scores[i] = scores.get(i, 0) + idf * tfn
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out.extend(
            (qid, r + 1, i, s) for r, (i, s) in enumerate(ranked)
        )
    return sorted(out)


def test_bm25_matches_scalar_referee(spark):
    d = _docs_df(spark)
    q = spark.createDataFrame(QUERIES, "query_id long, query_text string")
    got = sorted(
        tuple(r) for r in RET.bm25_topk(d, q, k=3).collect()
    )
    assert got == _scalar_bm25(DOCS, QUERIES, k=3)


def test_bm25_ranking_sanity(spark):
    """The doc that repeats a query term most (with saturation) and the
    rare-term doc rank first; absent terms return nothing."""
    d = _docs_df(spark)
    q = spark.createDataFrame(QUERIES, "query_id long, query_text string")
    rows = RET.bm25_topk(d, q, k=3).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id))
    # "brown cat": doc 7 has brown x3 + cat x1 and is short -> top
    assert sorted(by_q[100])[0][1] == 7
    # "alpha kappa": only doc 1 (and no other) contains both rare terms
    assert sorted(by_q[101])[0][1] == 1
    # absent-vocabulary and empty queries produce no rows
    assert 102 not in by_q and 103 not in by_q


# ------------------------------------------------------------------ chunks


def _scalar_chunks(docs, chunk, overlap):
    stride = chunk - overlap
    out = []
    for i, text in docs:
        t = _toks(text)
        n = len(t)
        if n == 0:
            continue
        n_chunks = 1 + (max(n - chunk, 0) + stride - 1) // stride
        for c in range(n_chunks):
            s = c * stride
            out.append((i, c, s, min(chunk, n - s), " ".join(t[s : s + chunk])))
    return sorted(out)


@pytest.mark.parametrize("chunk,overlap", [(4, 0), (4, 1), (5, 2), (16, 4)])
def test_sliding_chunks_matches_scalar(spark, chunk, overlap):
    d = _docs_df(spark).withColumn("text", F.lower("text"))
    got = sorted(tuple(r) for r in CUR.sliding_chunks(d, chunk, overlap).collect())
    assert got == _scalar_chunks(DOCS, chunk, overlap)


def test_sliding_chunks_invariants(spark):
    """Every token is covered exactly once by the non-overlap prefix
    partition; consecutive chunks overlap by `overlap` tokens; only the
    last chunk may be short."""
    d = _docs_df(spark)
    rows = sorted(
        (r.doc_id, r.chunk_idx, r.start_token, r.chunk_tokens, r.chunk_text)
        for r in CUR.sliding_chunks(d, 5, 2).collect()
    )
    by_doc = {}
    for doc, idx, start, ntok, text in rows:
        by_doc.setdefault(doc, []).append((idx, start, ntok, text))
    for doc, text in DOCS:
        t = _toks(text)
        if not t:
            assert doc not in by_doc
            continue
        chunks = by_doc[doc]
        assert [c[0] for c in chunks] == list(range(len(chunks)))
        # stride positions, full coverage, reconstruction
        for idx, start, ntok, ctext in chunks:
            assert start == idx * 3
            assert ctext.split() == t[start : start + 5]
            assert ntok == len(t[start : start + 5])
        last = chunks[-1]
        assert last[1] + last[2] == len(t)  # covers through the last token
        assert all(c[2] == 5 for c in chunks[:-1])  # only last may be short


def test_sliding_chunks_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        CUR.sliding_chunks(_docs_df(spark), 4, 4)
