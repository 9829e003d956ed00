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


# ---------------------------------------------------------------- KV graph


def kv_referee(cells):
    """Independent re-derivation of kv_parser.py:14-345 (BFS-flavored
    path enumeration instead of the engine's recursive DFS; separate
    group matching)."""
    from yomitoku_spark.operators.adjacency import (
        bottom_adjacent_scalar,
        right_adjacent_scalar,
    )

    def okey(c):
        return (c["box"][1], c["box"][0], c["id"])

    groups = sorted((c for c in cells if c["role"] == "group"), key=lambda g: g["id"])
    nodes = sorted((c for c in cells if c["role"] != "group"), key=okey)
    by_id = {c["id"]: c for c in nodes}

    def ov(a, b):
        return max(min(a[2], b[2]) - max(a[0], b[0]), 0) * max(
            min(a[3], b[3]) - max(a[1], b[1]), 0
        )

    def area(b):
        return (b[2] - b[0]) * (b[3] - b[1])

    grp = {}
    for n in nodes:
        if not groups:
            grp[n["id"]] = None
            continue
        best, bo, bga = None, 0, 1
        for g in groups:
            o = ov(g["box"], n["box"])
            if o * 5 <= area(n["box"]):
                continue
            ga = area(g["box"])
            if o * bga > bo * ga:
                best, bo, bga = g["id"], o, ga
        grp[n["id"]] = best if best is not None else "__unmatched__"

    def linked(a, b):
        ga, gb = grp[a["id"]], grp[b["id"]]
        if ga is None or gb is None:
            return False
        ra, rb = a["role"], b["role"]
        if ra == "header" and rb in ("cell", "empty"):
            return ga == gb
        if ra == "header" and rb == "header":
            return ga == gb or "__unmatched__" in (ga, gb)
        if ra == "cell" and rb == "cell":
            return ga == gb
        return False

    succ = {n["id"]: [] for n in nodes}
    for a in nodes:
        for b in nodes:
            if a["id"] == b["id"]:
                continue
            fwd = linked(a, b)
            rev = linked(b, a)
            if right_adjacent_scalar(a["box"], b["box"]):
                if fwd:
                    succ[a["id"]].append((b["id"], "R"))
                if rev:
                    succ[b["id"]].append((a["id"], "L"))
            if bottom_adjacent_scalar(a["box"], b["box"]):
                if fwd:
                    succ[a["id"]].append((b["id"], "D"))
                if rev:
                    succ[b["id"]].append((a["id"], "U"))
    for k in succ:
        succ[k].sort(key=lambda vd: (*okey(by_id[vd[0]]), vd[1]))

    # components via repeated neighborhood expansion
    neigh = {n["id"]: {v for v, _ in succ[n["id"]]} for n in nodes}
    for u, vs in succ.items():
        for v, _ in vs:
            neigh[v].add(u)
    seen, comps = set(), []
    for n in nodes:
        if n["id"] in seen:
            continue
        comp, frontier = {n["id"]}, [n["id"]]
        while frontier:
            nxt = [v for f in frontier for v in neigh[f] if v not in comp]
            comp.update(nxt)
            frontier = nxt
        seen |= comp
        comps.append(comp)
    comps.sort(key=min)

    def walk(direction, comp):
        roots = [
            h for h in sorted((i for i in comp if by_id[i]["role"] == "header"),
                              key=lambda i: okey(by_id[i]))
            if not any(
                d == direction and by_id[u]["role"] == "header"
                for u in comp for v, d in succ[u] if v == h
            )
        ]
        items, budget = [], [50_000]

        # path accumulates header ids INCLUDING the current header
        def rec2(nid, path):
            if budget[0] <= 0:
                return
            budget[0] -= 1
            node = by_id[nid]
            if node["role"] in ("cell", "empty"):
                items.append((tuple(path), nid))
                return
            for v, d in succ[nid]:
                if d == direction and v not in path + [nid]:
                    rec2(v, path + [nid])

        for r in roots:
            rec2(r, [])
        return items

    adopted = []
    for comp in comps:
        h_items = walk("R", comp)
        v_items = walk("D", comp)
        if len({v for _, v in v_items}) > len({v for _, v in h_items}):
            adopted += [(k, v, "V") for k, v in v_items]
        else:
            adopted += [(k, v, "H") for k, v in h_items]
    got_values = {v for _, v, _ in adopted}
    keyless = [
        ((), c["id"], "")
        for c in sorted(
            (c for c in nodes if c["role"] in ("cell", "empty")), key=okey
        )
        if c["id"] not in got_values
    ]
    return [
        {
            "key_cells": "/".join(k),
            "key_text": "".join(by_id[i]["contents"] or "" for i in k),
            "value_cell": v,
            "value_text": by_id[v]["contents"] or "",
            "dir": d,
        }
        for k, v, d in adopted + keyless
    ]


@pytest.mark.parametrize("seed", [5, 17])
def test_kv_parser_matches_independent_referee(seed):
    rng = random.Random(seed)
    for _ in range(40):
        cells = []
        for g in range(rng.randint(0, 2)):
            x, y = rng.randint(0, 60), rng.randint(0, 60)
            cells.append({"id": f"g{g}", "role": "group",
                          "box": (x, y, x + rng.randint(80, 300), y + rng.randint(80, 300)),
                          "contents": ""})
        for i in range(rng.randint(1, 9)):
            x, y = rng.randint(0, 250), rng.randint(0, 250)
            w, h = rng.randint(20, 100), rng.randint(10, 30)
            cells.append({
                "id": f"n{i}",
                "role": rng.choice(["header", "header", "cell", "cell", "empty"]),
                "box": (x, y, x + w, y + h),
                "contents": rng.choice(["k", "v", "", "t1"]),
            })
        want = kv_referee(cells)
        got = parse_kv_doc(cells)
        assert sorted(map(repr, got)) == sorted(map(repr, want)), cells
