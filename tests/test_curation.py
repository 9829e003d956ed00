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


# ------------------------------------------------------------ decontamination


def _b1000(doc_id):
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 1000


def _scalar_decontaminate(docs, k, eval_permille):
    toks = {i: _toks(t) for i, t, _ in docs}
    is_eval = {i: _b1000(i) < eval_permille for i in toks}
    eval_grams = set()
    for i, t in toks.items():
        if is_eval[i]:
            for p in range(len(t) - k + 1):
                eval_grams.add(" ".join(t[p : p + k]))
    out = {}
    for i, t in toks.items():
        if is_eval[i]:
            continue
        hit_pos = [
            p + 1
            for p in range(len(t) - k + 1)
            if " ".join(t[p : p + k]) in eval_grams
        ]
        cov = set()
        for p in hit_pos:
            cov.update(range(p, p + k))
        n = len(t)
        out[i] = {
            "n_tokens": n,
            "eval_gram_hits": len(hit_pos),
            "contam_cover_permille": (1000 * len(cov)) // n if n else 0,
            "contaminated": 1 if hit_pos else 0,
        }
    return out


@pytest.mark.parametrize("k,perm", [(2, 500), (3, 500), (8, 500)])
def test_decontaminate_matches_scalar_referee(spark, k, perm):
    got = {
        r["doc_id"]: r.asDict()
        for r in CUR.decontaminate(_df(spark), k=k, eval_permille=perm).collect()
    }
    want = _scalar_decontaminate(DOCS, k, perm)
    assert set(got) == set(want)
    for i, w in want.items():
        for col, v in w.items():
            assert got[i][col] == v, (i, col, got[i][col], v)


def test_decontaminate_flags_known_overlap(spark):
    # doc 10 is eval at permille 1000 minus nothing — force the split
    # by choosing ids whose md5 bucket lands on the right side of 500
    docs = [(i, t, "en") for i, t, _ in DOCS]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    rows = {r["doc_id"]: r for r in CUR.decontaminate(df, k=3, eval_permille=500).collect()}
    want = _scalar_decontaminate(docs, 3, 500)
    # docs 0 and 2 are case-fold identical: whichever side of the split
    # each lands on, a cross-membership means contamination
    ev = {i for i, *_ in docs if _b1000(i) < 500}
    if 0 in ev and 2 not in ev:
        assert rows[2]["contaminated"] == 1
    if 2 in ev and 0 not in ev:
        assert rows[0]["contaminated"] == 1
    # and the referee agrees on every value regardless
    assert {i: r.asDict() for i, r in rows.items()} == {
        i: {"doc_id": i, **w} for i, w in want.items()
    }


# ---------------------------------------------------------------- PII redact


PII_DOCS = [
    (0, "mail me at alice.smith+work@corp.example.org or bob@x.io today"),
    (1, "server 192.168.0.1 and 10.255.255.254 but not 1234.5.6.7"),
    (2, "call 03-1234-5678 or 090-12-345, office 0120-444-444"),
    (3, "mixed: eve@a.bc 172.16.0.9 06-6123-4567 end"),
    (4, "no pii here at all"),
    (5, "edge 999.999.999.999 still matches the shape filter"),
    (6, "a@b.c too-short tld does not match"),
]


def test_pii_redact_counts_and_placeholders(spark):
    df = spark.createDataFrame(PII_DOCS, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in CUR.pii_redact(df).collect()}
    assert rows[0]["n_emails"] == 2 and rows[0]["n_ipv4"] == 0
    assert "<EMAIL>" in rows[0]["redacted"] and "alice" not in rows[0]["redacted"]
    assert rows[1]["n_ipv4"] == 2  # 1234.5.6.7 fails the \b\d{1,3} shape
    assert "1234.5.6.7" in rows[1]["redacted"]
    assert rows[2]["n_phones"] == 3  # 090-12-345 fits the 2-4/2-4/3-4 shape
    assert rows[3].asDict() | {} == {
        "doc_id": 3,
        "n_emails": 1,
        "n_ipv4": 1,
        "n_phones": 1,
        "redacted": "mixed: <EMAIL> <IP> <PHONE> end",
    }
    assert rows[4]["redacted"] == "no pii here at all"
    assert rows[5]["n_ipv4"] == 1  # shape filter, not octet-range validation
    assert rows[6]["n_emails"] == 0  # single-letter TLD rejected


def test_pii_redact_placeholders_not_rematched(spark):
    # the sequential stages must not re-match earlier placeholders
    df = spark.createDataFrame(
        [(1, "x 1.2.3.4-5.6.7.8 y u@v.wx 12-34-567 and 1-23-456")],
        "doc_id long, text string",
    )
    r = CUR.pii_redact(df).collect()[0]
    # the dash between the two IPs must not produce a phone hit after
    # IP redaction (<IP>-<IP> has no digits left)
    assert r["n_ipv4"] == 2 and r["n_phones"] == 1
    # 1-23-456 fails the 2-digit-minimum first group and survives
    assert r["redacted"] == "x <IP>-<IP> y <EMAIL> <PHONE> and 1-23-456"


# ------------------------------------------------------- importance weights


def _scalar_importance(docs, target_permille, n_buckets, scale=1_000_000):
    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    feats = {}
    for i, t, _ in docs:
        tk = _toks(t)
        grams = tk + [" ".join(tk[p : p + 2]) for p in range(len(tk) - 1)]
        feats[i] = [h(g) % n_buckets for g in grams]
    is_t = {i: _b1000(i) < target_permille for i in feats}
    tcnt, bcnt = Counter(), Counter()
    for i, bs in feats.items():
        (tcnt if is_t[i] else bcnt).update(bs)
    T, B = sum(tcnt.values()), sum(bcnt.values())
    out = {}
    for i, bs in feats.items():
        w = sum(
            scale * (tcnt[b] + 1) // (T + n_buckets)
            - scale * (bcnt[b] + 1) // (B + n_buckets)
            for b in bs
        )
        out[i] = {
            "is_target": int(is_t[i]),
            "n_feats": len(bs),
            "weight": w,
        }
    return out


@pytest.mark.parametrize("perm,nb", [(500, 64), (250, 1024)])
def test_importance_weights_match_scalar_referee(spark, perm, nb):
    got = {
        r["doc_id"]: r.asDict()
        for r in CUR.importance_weights(
            _df(spark), target_permille=perm, n_buckets=nb
        ).collect()
    }
    want = _scalar_importance(DOCS, perm, nb)
    assert set(got) == set(want)
    for i, w in want.items():
        for col, v in w.items():
            assert got[i][col] == v, (i, col, got[i][col], v)


def test_importance_weights_empty_doc_scores_zero(spark):
    df = spark.createDataFrame(
        [(1, "common words here", ""), (2, "", ""), (3, "   ", "")],
        "doc_id long, text string, lang string",
    )
    got = {r["doc_id"]: r for r in CUR.importance_weights(df, 500, 64).collect()}
    assert set(got) == {1, 2, 3}
    assert got[2]["n_feats"] == 0 and got[2]["weight"] == 0
    assert got[3]["n_feats"] == 0 and got[3]["weight"] == 0


# ---------------------------------------------------------- lm perplexity


def _scalar_lm_perplexity(docs, train_permille, n_buckets, max_bits_milli=9000):
    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def flog2(x):
        return max(x, 1).bit_length() - 1

    bigrams = {}
    for i, t, _ in docs:
        tk = _toks(t)
        bigrams[i] = [
            (h(tk[p]) % n_buckets, h(" ".join(tk[p : p + 2])) % n_buckets)
            for p in range(len(tk) - 1)
        ]
    is_train = {
        i: h(str(i) + ":lm") % 1000 < train_permille for i in bigrams
    }
    c_ctx, c_bg = Counter(), Counter()
    for i, bs in bigrams.items():
        if is_train[i]:
            for bc, bg in bs:
                c_ctx[bc] += 1
                c_bg[bg] += 1
    out = {}
    for i, bs in bigrams.items():
        total = sum(
            max(flog2((c_ctx[bc] + n_buckets) * 1024 // (c_bg[bg] + 1)) - 10, 0)
            for bc, bg in bs
        )
        milli = 1000 * total // max(len(bs), 1)
        out[i] = {
            "is_train": int(is_train[i]),
            "n_bigrams": len(bs),
            "total_bits": total,
            "bits_milli": milli,
            "keep": int(milli <= max_bits_milli),
        }
    return out


@pytest.mark.parametrize("perm,nb", [(500, 64), (300, 4096)])
def test_lm_perplexity_matches_scalar_referee(spark, perm, nb):
    got = {
        r["doc_id"]: r.asDict()
        for r in CUR.lm_perplexity(
            _df(spark), train_permille=perm, n_buckets=nb
        ).collect()
    }
    want = _scalar_lm_perplexity(DOCS, perm, nb)
    assert set(got) == set(want)
    for i, w in want.items():
        for col, v in w.items():
            assert got[i][col] == v, (i, col, got[i][col], v)


def test_lm_perplexity_repeated_text_scores_lower(spark):
    # a document made of bigrams the training split saw many times must
    # cost fewer bits per token than one of unseen-vocabulary bigrams
    docs = [(i, "the cat sat on the mat", "en") for i in range(20)] + [
        (100, "zyx wvu tsr qpo nml kji", "en")
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: r for r in CUR.lm_perplexity(df, 1000, 4096).collect()
    }
    common = got[0]["bits_milli"]
    rare = got[100]["bits_milli"]
    assert common < rare, (common, rare)
    assert got[0]["n_bigrams"] == 5 and got[100]["n_bigrams"] == 5


def test_lm_perplexity_short_docs_zero(spark):
    df = spark.createDataFrame(
        [(1, "", ""), (2, "single", ""), (3, "two tokens", "")],
        "doc_id long, text string, lang string",
    )
    got = {r["doc_id"]: r for r in CUR.lm_perplexity(df, 1000, 64).collect()}
    assert got[1]["n_bigrams"] == 0 and got[1]["total_bits"] == 0
    assert got[2]["n_bigrams"] == 0 and got[2]["bits_milli"] == 0
    assert got[3]["n_bigrams"] == 1
    assert got[1]["keep"] == 1  # empty docs pass the threshold trivially


# ------------------------------------------------------- bloom decontaminate


def _scalar_decontaminate_bloom(docs, k, eval_permille, m_bits, n_hashes):
    """Stdlib referee for CUR.decontaminate_bloom: replay the Bloom
    bits with the portable 60-bit md5 hash and the exact counts."""

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    toks = {i: _toks(t) for i, t, _ in docs}
    grams = {
        i: [" ".join(t[p : p + k]) for p in range(len(t) - k + 1)]
        for i, t in toks.items()
    }
    is_eval = {i: _b1000(i) < eval_permille for i in toks}
    mem = {g for i, gs in grams.items() if is_eval[i] for g in gs}
    bits = {
        h60(f"{j}:{g}") % m_bits for g in mem for j in range(n_hashes)
    }
    out = {}
    for i, gs in grams.items():
        if is_eval[i]:
            continue
        bloom = sum(
            1
            for g in gs
            if all(h60(f"{j}:{g}") % m_bits in bits for j in range(n_hashes))
        )
        exact = sum(1 for g in gs if g in mem)
        out[i] = {
            "n_tokens": len(toks[i]),
            "bloom_gram_hits": bloom,
            "eval_gram_hits": exact,
            "contaminated_bloom": 1 if bloom else 0,
            "contaminated": 1 if exact else 0,
        }
    return out


@pytest.mark.parametrize("m_bits,n_hashes", [(64, 2), (65536, 3)])
def test_decontaminate_bloom_matches_scalar_referee(spark, m_bits, n_hashes):
    got = {
        r["doc_id"]: r.asDict()
        for r in CUR.decontaminate_bloom(
            _df(spark), k=3, eval_permille=500, m_bits=m_bits, n_hashes=n_hashes
        ).collect()
    }
    want = _scalar_decontaminate_bloom(DOCS, 3, 500, m_bits, n_hashes)
    assert got == {i: {"doc_id": i, **w} for i, w in want.items()}
    # Bloom law: never a false negative, at any width
    for i in got:
        assert got[i]["bloom_gram_hits"] >= got[i]["eval_gram_hits"]
        assert got[i]["contaminated_bloom"] >= got[i]["contaminated"]


def test_decontaminate_bloom_narrow_width_overflags(spark):
    # 64 bits for ~25 eval 2-grams saturates the filter: false
    # positives MUST appear (over-flagging, the conservative failure
    # mode), while exact columns stay identical to the exact variant
    rows = {
        r["doc_id"]: r.asDict()
        for r in CUR.decontaminate_bloom(
            _df(spark), k=2, eval_permille=500, m_bits=64, n_hashes=2
        ).collect()
    }
    exact = {
        r["doc_id"]: r.asDict()
        for r in CUR.decontaminate(_df(spark), k=2, eval_permille=500).collect()
    }
    assert set(rows) == set(exact)
    for i in rows:
        assert rows[i]["eval_gram_hits"] == exact[i]["eval_gram_hits"]
        assert rows[i]["contaminated"] == exact[i]["contaminated"]
    assert any(
        rows[i]["bloom_gram_hits"] > rows[i]["eval_gram_hits"] for i in rows
    ), "narrow filter should produce false positives"


def test_pack_chunks_sharded_equals_unsharded(spark):
    """The hot-stream two-pass prefix sum (contiguous id-range shards,
    per-shard local cumsum + broadcast re-base) is byte-equal to the
    single-partition-per-stream path — forced through MANY shards with
    a tiny range_size so the re-base actually exercises."""
    from pyspark.sql import functions as F

    from yomitoku_spark.operators import curation as CUR

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plain = {
        tuple(r)
        for r in CUR.pack_chunks(docs, chunk_tokens=256).collect()
    }
    sharded = {
        tuple(r)
        for r in CUR.pack_chunks_sharded(
            docs, chunk_tokens=256, range_size=16
        ).collect()
    }
    assert sharded == plain
    # degenerate single-shard config also equal
    one = {
        tuple(r)
        for r in CUR.pack_chunks_sharded(
            docs, chunk_tokens=256, range_size=1 << 40
        ).collect()
    }
    assert one == plain


def test_scrub_keeper_protection_and_empty_docs(spark):
    """Review findings pinned: (a) a removable span overlapping a
    KEEPER copy of another gram must not cut it — every duplicated
    gram keeps one intact occurrence; (b) zero-token docs ride
    through with n_tokens=0 instead of vanishing."""
    from pyspark.sql import functions as F

    from yomitoku_spark.operators import curation as CUR

    g = " ".join(f"g{j}" for j in range(8))       # gram G: docs 5 & 9
    h = " ".join(f"h{j}" for j in range(8))       # gram H: docs 9 & 12
    rows = [
        (5, "a b c " + g),
        # doc 9: G (non-keeper, removable) directly before H (keeper):
        # without position protection, G's 8-token cut would stop right
        # at H, but craft overlap by sharing a token: G's last token
        # region adjacent — use G then H with G's span covering the
        # doc prefix and H starting inside a removable window
        (9, g + " " + h),
        (12, "x y " + h + " z"),
        (77, ""),                                  # zero-token doc
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in CUR.scrub_duplicate_spans(df, k=8).collect()}
    # (b) the empty doc is present
    assert out[77].n_tokens == 0 and out[77].n_removed == 0
    assert out[77].cleaned_text == ""
    # (a) doc 9 is keeper for H (9 < 12): H must survive intact in doc
    # 9 even though doc 9's copy of G (keeper 5) is scrubbed
    assert h in out[9].cleaned_text, out[9].cleaned_text
    assert not out[9].cleaned_text.startswith("g0"), out[9].cleaned_text
    # G's keeper copy (doc 5) intact; doc 12's H copy scrubbed
    assert g in out[5].cleaned_text
    assert h not in out[12].cleaned_text
    # every duplicated gram retains at least one intact copy corpus-wide
    joined = " | ".join(r.cleaned_text for r in out.values())
    assert g in joined and h in joined


def test_pack_chunks_sharded_huge_and_stringy_numeric_ids(spark):
    """Review finding pinned: shard derivation is integer DIV, so ids
    beyond double precision (> 2^53) shard exactly and stay byte-equal
    to the unsharded path."""
    from pyspark.sql import functions as F

    from yomitoku_spark.operators import curation as CUR

    base = 1 << 55
    rows = [(base + i * 3, "lang0", "tok " * (i % 7 + 1)) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    plain = {tuple(r) for r in CUR.pack_chunks(df, chunk_tokens=8).collect()}
    sharded = {
        tuple(r)
        for r in CUR.pack_chunks_sharded(df, chunk_tokens=8, range_size=16).collect()
    }
    assert sharded == plain and len(plain) == 40


def test_bpe_sql_referee_survives_merge_exhaustion(spark):
    """Review finding pinned: when the pair table dries up before
    round 8 (Spark's bpe_train breaks early), the DuckDB referee's
    COALESCE sentinel turns the dead rounds into identity instead of
    NULLing the corpus — train and apply stay engine==referee."""
    import duckdb
    import pandas as pd

    from yomitoku_spark.operators import bpe as BPE
    from yomitoku_spark.queries import SQL_BPE_APPLY, SQL_BPE_TRAIN

    # every word is "ab"/"cd"-like: one merge each, then silence by
    # round ~3 of the referee's fixed 8
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["ab ab cd", "ab cd cd", "e e e"]}
    )
    sdf = spark.createDataFrame(pdf)

    merges = BPE.bpe_train(sdf, n_merges=8)
    got_train = [(r.round, r.x, r.y, r.pair_count) for r in merges.orderBy("round").collect()]
    assert 0 < len(got_train) < 8  # genuinely exhausted early

    con = duckdb.connect()
    con.register("documents", pdf)
    want_train = [tuple(r) for r in con.sql(
        SQL_BPE_TRAIN + " ORDER BY round").fetchall()]
    assert [tuple(g) for g in got_train] == want_train

    pairs = [(r.x, r.y) for r in merges.orderBy("round").collect()]
    got_apply = {
        (r.doc_id, r.n_words, r.n_subwords)
        for r in BPE.bpe_apply(sdf, pairs).collect()
    }
    want_apply = {tuple(r) for r in con.sql(SQL_BPE_APPLY).fetchall()}
    assert got_apply == want_apply
