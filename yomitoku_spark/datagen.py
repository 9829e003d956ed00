"""Deterministic synthetic transcripts generator (FIXTURES.md §1).

Produces the exact input shape mandated by ``BASELINE.json → input_hint``::

    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

Payload mix per FIXTURES.md: plain prose (CJK + NFKC-tricky chars),
boilerplate-wrapped HTML-ish docs, markdown tables with merged-cell
markers, shuffled layout-span JSON blocks, key-value forms, and noise.
One conversation gets ~skew× the median turn count to exercise salting
(the long-conversation skew case from the north rule).

Generation is keyed on the GLOBAL turn index (md5 of (seed, turn id)),
so output is identical regardless of partitioning, executor count, or
batch boundaries — the property that lets the scaling benchmark run the
same logical input at local[8] and local[32].

Scales: generation runs distributed via ``spark.range(n).mapInPandas``
— no driver-side materialization, embarrassingly parallel, O(rows/task)
memory. At 10^12 turns this is the same plan, just more tasks.
"""

from __future__ import annotations

import hashlib
import json
import random

import numpy as np
import pandas as pd

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_WORDS = (
    "spark data table join filter merge query stream batch vector window order "
    "group value column row key hash scan agg fast slow small big line part "
    "customer pipeline shuffle broadcast partition skew salt codegen arrow"
).split()
_CJK = ["データ", "解析", "変換", "結合", "集計", "処理", "高速", "分散", "表", "列"]
_TRICKY = ["ﬁlter", "Ｆｕｌｌｗｉｄｔｈ", "①", "Ⅳ", "ｶﾀｶﾅ", "ﬂow", "№５"]
_NOISE = ["", " ", "ok", "x", "***", "https://example.com/a?b=c", "！", "short one", "   \n  \n "]
_ROLES = ["user", "assistant", "tool"]


def _h(*parts) -> int:
    key = ":".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.md5(key).digest()[:8], "big")


def _words(rng: random.Random, n: int, tricky: bool = False) -> str:
    pool = _WORDS + (_CJK + _TRICKY if tricky else [])
    return " ".join(rng.choice(pool) for _ in range(n))


def _gen_prose(rng: random.Random) -> str:
    parts = []
    if rng.random() < 0.4:
        parts.append(f"{'#' * rng.randint(1, 3)} {_words(rng, rng.randint(2, 5))}")
    if rng.random() < 0.3:
        # fenced code with internal blank lines (fence-aware split test)
        body = "\n".join(
            f"x{i} = {_words(rng, 2)}" + ("\n" if rng.random() < 0.3 else "")
            for i in range(rng.randint(1, 4))
        )
        parts.append(f"```py\n{body}\n```")
    for _ in range(rng.randint(1, 4)):
        n_lines = rng.randint(1, 3)
        parts.append("\n".join(_words(rng, rng.randint(6, 18), tricky=True) for _ in range(n_lines)))
    if rng.random() < 0.35:
        parts.append("\n".join(f"- {_words(rng, rng.randint(2, 6))}" for _ in range(rng.randint(2, 5))))
    if rng.random() < 0.25:
        parts.append(_words(rng, rng.randint(0, 2)))  # short → dropped as noise
    rng.shuffle(parts)
    return "\n\n".join(parts)


def _gen_md_table(rng: random.Random) -> str:
    ncol = rng.randint(2, 5)
    nrow = rng.randint(2, 6)
    header = "| " + " | ".join(_words(rng, 1) for _ in range(ncol)) + " |"
    sep = "|" + "|".join(["---"] * ncol) + "|"
    rows = []
    for r in range(nrow):
        cells = []
        for c in range(ncol):
            roll = rng.random()
            if r > 0 and roll < 0.1:
                cells.append("^^")
            elif c > 0 and roll < 0.18:
                cells.append("<<")
            else:
                cells.append(_words(rng, rng.randint(1, 2)))
        rows.append("| " + " | ".join(cells) + " |")
    table = "\n".join([header, sep] + rows)
    pre = _words(rng, rng.randint(8, 16), tricky=True)
    return f"{pre}\n\n{table}" if rng.random() < 0.7 else table


def _gen_kv(rng: random.Random) -> str:
    keys = ["Invoice No", "Date", "Customer Name", "Total Amount", "Status",
            "Order Id", "Phone", "Address", "Item Count", "Due Date"]
    rng.shuffle(keys)
    n = rng.randint(2, 6)
    lines = [f"{k}: {_words(rng, rng.randint(1, 4), tricky=True)}" for k in keys[:n]]
    body = "\n".join(lines)
    if rng.random() < 0.5:
        return f"{_words(rng, rng.randint(8, 14))}\n\n{body}"
    return body


def _gen_html(rng: random.Random) -> str:
    def links(n):
        return " ".join(f'<a href="/p{i}">{_words(rng, 1)}</a>' for i in range(n))

    parts = ['<header>' + links(rng.randint(3, 6)) + "</header>"]
    parts.append(f'<nav class="nav menu">{links(rng.randint(3, 7))}</nav>')
    if rng.random() < 0.6:
        lvl = rng.randint(1, 3)
        parts.append(f"<h{lvl}>{_words(rng, rng.randint(2, 5))}</h{lvl}>")
    for _ in range(rng.randint(1, 4)):
        body = _words(rng, rng.randint(10, 25), tricky=True)
        if rng.random() < 0.4:
            body += f' see <a href="/x">{_words(rng, 2)}</a> and <b>{_words(rng, 1)}</b>'
        tag = "p" if rng.random() < 0.7 else "div"
        cls = ' class="content main"' if tag == "div" else ""
        parts.append(f"<{tag}{cls}>{body}</{tag}>")
    if rng.random() < 0.35:
        items = "".join(f"<li>{_words(rng, rng.randint(2, 5))}</li>" for _ in range(rng.randint(2, 4)))
        parts.append(f"<ul>{items}</ul>")
    if rng.random() < 0.3:
        rows = "".join(
            "<tr>" + "".join(f"<td>{_words(rng, 1)}</td>" for _ in range(3)) + "</tr>"
            for _ in range(rng.randint(2, 4))
        )
        parts.append(f"<table>{rows}</table>")
    if rng.random() < 0.5:
        parts.append(f'<div class="sidebar">{_words(rng, rng.randint(4, 10))}</div>')
    if rng.random() < 0.4:
        parts.append(f"<p>{_words(rng, rng.randint(0, 2))}</p>")  # too short → dropped
    parts.append("<footer>" + links(rng.randint(2, 5)) + " copyright</footer>")
    return "\n".join(parts)


def _gen_layout(rng: random.Random, uniq: int) -> str:
    items = []
    bid = 0

    def add(box, role, nw, direction=None):
        nonlocal bid
        it = {
            "id": bid,
            "box": [int(v) for v in box],
            "role": role,
            "text": f"blk{uniq}x{bid} " + _words(rng, nw),
        }
        if direction:
            it["direction"] = direction
        items.append(it)
        bid += 1

    if rng.random() < 0.2:
        # vertical page: right-to-left columns of vertical text blocks
        # (the page-direction vote flips the reading order to right2left)
        if rng.random() < 0.5:
            add([0, 0, 600, 30], "page_header", 2)
        for c in range(rng.randint(2, 5)):
            x2 = 600 - c * 70
            yy = 40
            for _ in range(rng.randint(1, 3)):
                h = rng.randint(80, 200)
                add([x2 - 50, yy, x2, yy + h], "paragraph", rng.randint(4, 10),
                    direction="vertical")
                yy += h + 20
        if rng.random() < 0.5:
            add([0, 900, 600, 930], "page_footer", 2)
        rng.shuffle(items)
        return json.dumps({"blocks": items}, ensure_ascii=False)

    if rng.random() < 0.6:
        add([0, 0, 600, 40], "page_header", 3)
    y = 60
    if rng.random() < 0.5:
        add([0, y, 600, y + 50], "section_headings", 3)
        y += 70
    two_col = rng.random() < 0.5
    if two_col:
        for x1, x2 in ((0, 280), (320, 600)):
            yy = y
            for _ in range(rng.randint(2, 4)):
                h = rng.randint(40, 120)
                role = "figure" if rng.random() < 0.15 else "paragraph"
                add([x1, yy, x2, yy + h], role, rng.randint(4, 12))
                yy += h + 20
    else:
        yy = y
        for _ in range(rng.randint(2, 5)):
            h = rng.randint(40, 120)
            role = "figure" if rng.random() < 0.15 else "paragraph"
            add([0, yy, 600, yy + h], role, rng.randint(4, 12))
            yy += h + 20
    if rng.random() < 0.3:
        # a figure that absorbs its contained paragraphs (inner l2r order)
        add([50, 1000, 550, 1300], "figure", 3)
        for k in range(rng.randint(1, 3)):
            add([60 + k * 160, 1040, 200 + k * 160, 1090], "paragraph",
                rng.randint(2, 5))
    if rng.random() < 0.6:
        add([0, 2000, 600, 2040], "page_footer", 2)
    rng.shuffle(items)
    return json.dumps({"blocks": items}, ensure_ascii=False)


_CLASS_CUM = [(0.35, "prose"), (0.55, "html"), (0.67, "mdtable"),
              (0.80, "layout"), (0.92, "kv"), (1.01, "noise")]


def render_turn(seed: int, gid: int, conv: int, turn: int) -> tuple[str, str, str]:
    """(role, text, tool) for one global turn id. Pure + deterministic."""
    rng = random.Random(_h(seed, "turn", gid))
    roll = rng.random()
    cls = next(name for cum, name in _CLASS_CUM if roll < cum)
    if cls == "prose":
        payload = _gen_prose(rng)
    elif cls == "html":
        payload = _gen_html(rng)
    elif cls == "mdtable":
        payload = _gen_md_table(rng)
    elif cls == "layout":
        payload = _gen_layout(rng, gid)
    elif cls == "kv":
        payload = _gen_kv(rng)
    else:
        payload = rng.choice(_NOISE)
    role = _ROLES[turn % 3]
    if role == "tool":
        return role, "", payload
    return role, payload, ""


def conv_sizes(n_convs: int, seed: int, skew: int = 12) -> list[int]:
    sizes = [3 + _h(seed, "size", i) % 28 for i in range(n_convs)]
    if n_convs > 0:
        sizes[0] = max(sizes[0], int(np.median(sizes))) * skew  # hot conversation
    return sizes


def render_batch(ids: np.ndarray, offsets: np.ndarray, seed: int, base_ts: int) -> pd.DataFrame:
    conv = np.searchsorted(offsets, ids, side="right") - 1
    turn = ids - offsets[conv]
    roles, texts, tools = [], [], []
    for g, c, t in zip(ids.tolist(), conv.tolist(), turn.tolist()):
        r, tx, tl = render_turn(seed, g, c, t)
        roles.append(r)
        texts.append(tx)
        tools.append(tl)
    ts = pd.to_datetime(base_ts + conv * 86_400 + turn * 37, unit="s")
    return pd.DataFrame(
        {
            "conv_id": [f"conv{c:08d}" for c in conv.tolist()],
            "turn_idx": turn.astype("int32"),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )


def transcripts_df(spark, n_convs: int = 50, seed: int = 42, skew: int = 12):
    """Distributed deterministic transcripts DataFrame.

    ``spark.range`` → ``mapInPandas`` render: scales linearly with cores,
    no shuffle, no driver materialization.
    """
    sizes = conv_sizes(n_convs, seed, skew)
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    total = int(offsets[-1])
    base_ts = 1_700_000_000

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield render_batch(ids, offsets, seed, base_ts)

    # size partitions so each task renders a bounded slice
    n_parts = max(8, min(512, total // 2000 + 1))
    return spark.range(0, total, numPartitions=n_parts).mapInPandas(
        gen, schema=TRANSCRIPTS_SCHEMA
    )


def transcripts_pdf(n_convs: int = 10, seed: int = 42, skew: int = 12) -> pd.DataFrame:
    """Driver-local variant for unit tests (same bytes as the Spark path)."""
    sizes = conv_sizes(n_convs, seed, skew)
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    ids = np.arange(int(offsets[-1]))
    return render_batch(ids, offsets, seed, 1_700_000_000)
