"""Randomized parity: the Spark scalar-field cascade vs an independent
scalar referee on arbitrary layouts (seeded random, 30 documents in one
DataFrame → one Spark round trip).

The referee below re-implements rule_pipeline.py:141-262 directly from
the reference semantics (dict-free, loop-based) and shares nothing with
yomitoku_spark.semantic except the spec constants — the same
two-implementations discipline as oracle.py vs the pipeline."""

from __future__ import annotations

import random
import re

import pytest

from yomitoku_spark.operators.kv_graph import parse_kv_doc, parse_kv_items
from yomitoku_spark.semantic import ScalarField, extract_scalar_fields

FIELDS = [
    ScalarField("by_id", cell_id="c1"),
    ScalarField("by_bbox", bbox=(0, 0, 120, 120)),
    ScalarField("by_desc", description="KEY"),
    ScalarField("by_desc_merge", description="K", merge_values=True, separator="|"),
    ScalarField("by_rx", regex="Z[0-9]+"),
    ScalarField("nothing", description="@@@", regex="QQQX[0-9]"),
]


def _norm(s: str) -> str:
    return s.replace(" ", "").replace("　", "")


def _contains_box(outer, inner, permille: int) -> bool:
    ov = max(min(outer[2], inner[2]) - max(outer[0], inner[0]), 0) * max(
        min(outer[3], inner[3]) - max(outer[1], inner[1]), 0
    )
    area = (inner[2] - inner[0]) * (inner[3] - inner[1])
    return 1000 * ov > permille * area


def referee(cells, kv_rows, paragraphs, words, f: ScalarField):
    """Scalar cascade, written against the reference directly."""

    def ordered(rows):
        return sorted(rows, key=lambda r: (r["box"][1], r["box"][0], r["id"]))

    noncells = [c for c in cells if c["role"] != "group"]
    if f.cell_id:
        hits = [c for c in noncells if c["id"] == f.cell_id]
        if hits:
            c = ordered(hits)[0]
            return c["contents"], "cell_id", "high"
    if f.bbox:
        hits = [c for c in noncells if _contains_box(f.bbox, c["box"], 500)]
        if hits:
            return ordered(hits)[0]["contents"], "bbox", "high"
    if f.description:
        q = _norm(f.description)
        boxes = {c["id"]: c["box"] for c in noncells}
        kmatch = [r for r in kv_rows if q in _norm(r["key_text"])]
        if kmatch:
            vals = [
                {"id": r["value_cell"], "box": boxes[r["value_cell"]],
                 "contents": r["value_text"]}
                for r in kmatch
            ]
            if f.merge_values:
                ys = [v["box"][1] for v in vals]
                xs = [v["box"][0] for v in vals]
                by_y = max(ys) - min(ys) >= max(xs) - min(xs)
                key = (lambda v: (v["box"][1], v["box"][0], v["id"], v["contents"])) if by_y else (
                    lambda v: (v["box"][0], v["box"][1], v["id"], v["contents"]))
                return f.separator.join(v["contents"] for v in sorted(vals, key=key)), "kv", "high"
            return ordered(vals)[0]["contents"], "kv", "high"
        hits = [c for c in noncells if c["contents"] and q in _norm(c["contents"])]
        if hits:
            return ordered(hits)[0]["contents"], "cell_query", "medium"
        hits = [p for p in paragraphs if p["contents"] and q in _norm(p["contents"])]
        if hits:
            return ordered(hits)[0]["contents"], "paragraph", "medium"
    if f.regex:
        pat = re.compile(f.regex)
        for pool in (noncells, paragraphs, words):
            hits = [
                (r, pat.search(r["contents"]))
                for r in pool
                if r["contents"] and pat.search(r["contents"])
            ]
            if hits:
                hits.sort(key=lambda t: (t[0]["box"][1], t[0]["box"][0], t[0]["id"]))
                return hits[0][1].group(0), "regex", "high"
    return "", "not_found", "low"


def _rand_doc(rng: random.Random, doc: int):
    texts = ["KEY one", "foo KEY", "Z42 tail", "plain", "", "K", "zz Z7",
             "ＫＥＹ wide", "sp ace"]
    cells, paragraphs, words = [], [], []
    n_groups = rng.randint(0, 2)
    for g in range(n_groups):
        x, y = rng.randint(0, 100), rng.randint(0, 100)
        cells.append({"id": f"g{g}", "role": "group",
                      "box": (x, y, x + rng.randint(100, 400), y + rng.randint(100, 400)),
                      "contents": ""})
    for i in range(rng.randint(1, 8)):
        x, y = rng.randint(0, 300), rng.randint(0, 300)
        cells.append({
            "id": f"{'h' if rng.random() < 0.4 else 'c'}{i}",
            "role": "header" if rng.random() < 0.4 else rng.choice(["cell", "empty"]),
            "box": (x, y, x + rng.randint(10, 120), y + rng.randint(10, 40)),
            "contents": rng.choice(texts),
        })
    for i in range(rng.randint(0, 3)):
        x, y = rng.randint(0, 400), rng.randint(400, 700)
        paragraphs.append({"id": f"p{i}", "box": (x, y, x + 200, y + 20),
                           "contents": rng.choice(texts)})
    for i in range(rng.randint(0, 3)):
        x, y = rng.randint(400, 600), rng.randint(0, 600)
        words.append({"id": f"w{i}", "box": (x, y, x + 50, y + 16),
                      "contents": rng.choice(texts)})
    return cells, paragraphs, words


@pytest.mark.parametrize("seed", [11, 29])
def test_cascade_matches_scalar_referee_on_random_layouts(spark, seed):
    rng = random.Random(seed)
    docs = {d: _rand_doc(rng, d) for d in range(30)}

    cell_rows, par_rows, word_rows = [], [], []
    for d, (cells, paragraphs, words) in docs.items():
        cell_rows += [(d, c["id"], c["role"], *c["box"], c["contents"]) for c in cells]
        par_rows += [(d, p["id"], *p["box"], p["contents"]) for p in paragraphs]
        word_rows += [(d, w["id"], *w["box"], w["contents"]) for w in words]
    box_cols = "x1 int, y1 int, x2 int, y2 int"
    cdf = spark.createDataFrame(
        cell_rows, f"doc_id long, cell_id string, role string, {box_cols}, contents string"
    )
    pdf_ = spark.createDataFrame(
        par_rows or [(0, "px", 0, 0, 1, 1, "")],
        f"doc_id long, par_id string, {box_cols}, contents string",
    )
    wdf = spark.createDataFrame(
        word_rows or [(0, "wx", 0, 0, 1, 1, "")],
        f"doc_id long, word_id string, {box_cols}, content string",
    )
    if not par_rows:
        pdf_ = pdf_.filter("par_id <> 'px'")
    if not word_rows:
        wdf = wdf.filter("word_id <> 'wx'")

    got = {
        (r.doc_id, r.field): (r.value, r.source, r.confidence)
        for r in extract_scalar_fields(
            cdf, parse_kv_items(cdf), pdf_, wdf, FIELDS
        ).collect()
    }
    for d, (cells, paragraphs, words) in docs.items():
        kv_rows = parse_kv_doc(cells)
        for f in FIELDS:
            want = referee(cells, kv_rows, paragraphs, words, f)
            assert got[(d, f.name)] == want, (d, f.name, got[(d, f.name)], want)
