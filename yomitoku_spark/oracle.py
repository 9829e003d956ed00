"""Pure-Python reference extractor (the golden oracle).

This is the answers-before-engine seam (SURVEY.md §5/§7.1): a scalar,
readable, obviously-correct implementation of the per-turn extraction
spec. The Spark engine must match it byte-for-byte per
``(conv_id, turn_idx)``. It deliberately shares only constants
(:mod:`yomitoku_spark.spec`) with the engine, never code, so the
equality tests compare two independent implementations — mirroring how
the reference validates its relational core against golden JSON with
the neural models monkeypatched out
(reference: tests/test_table_semantic_from_json.py:116-148).

No Spark, no pandas — stdlib only.
"""

from __future__ import annotations

import heapq
import json
import unicodedata
from dataclasses import dataclass

from yomitoku_spark import spec


@dataclass
class Block:
    start: int
    end: int
    kind: str
    rendered: str
    keep: bool


def nfkc(s: str) -> str:
    # reference: text_recognizer.py:155
    return unicodedata.normalize("NFKC", s)


def collapse_ws(s: str) -> str:
    return spec.WS_COLLAPSE_RE.sub(" ", s).strip()


# ---------------------------------------------------------------- payloads


def classify_payload(payload: str) -> str:
    if payload.lstrip().startswith(spec.LAYOUT_PREFIX):
        return "layout"
    if spec.HTML_BLOCK_TAG_RE.search(payload):
        return "html"
    return "textual"


# ---------------------------------------------------------------- textual


def _render_table(lines: list[str]) -> str:
    """Markdown pipe-table normalization with span expansion.

    Grid recovery semantics (reference: table_structure_recognizer.py:49-85
    span folding; utils/misc.py:137-154 anchor-only content): merged-cell
    continuation markers render as empty cells.
    """
    rows = []
    for ln in lines:
        if spec.MD_TABLE_SEP_RE.match(ln.strip()):
            continue
        raw = ln.strip().strip("|")
        cells = [c.strip() for c in raw.split("|")]
        cells = [
            "" if c in (spec.ROWSPAN_MARK, spec.COLSPAN_MARK) else nfkc(c)
            for c in cells
        ]
        rows.append(cells)
    if not rows:
        return ""
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    out = ["| " + " | ".join(rows[0]) + " |"]
    out.append("| " + " | ".join(["---"] * width) + " |")
    for r in rows[1:]:
        out.append("| " + " | ".join(r) + " |")
    return "\n".join(out)


def _textual_blocks(payload: str) -> list[Block]:
    blocks: list[Block] = []
    # 1) carve out fenced code regions (verbatim, may span blank lines)
    code_regions = [(m.start(), m.end()) for m in spec.FENCE_RE.finditer(payload)]
    for cs, ce in code_regions:
        rendered = payload[cs:ce].strip()
        blocks.append(Block(cs, ce, spec.KIND_CODE, rendered, True))
    # 2) blank-line split the gaps between code regions
    gaps = []
    last = 0
    for cs, ce in code_regions:
        gaps.append((last, cs))
        last = ce
    gaps.append((last, len(payload)))
    segments = []
    for gs, ge in gaps:
        gap = payload[gs:ge]
        pos = 0
        for seg in spec.BLANK_LINE_SPLIT_RE.split(gap):
            idx = gap.index(seg, pos)
            segments.append((gs + idx, gs + idx + len(seg), seg))
            pos = idx + len(seg)
    for start, end, seg in segments:
        if not seg.strip():
            continue
        lines = [ln for ln in seg.split("\n") if ln.strip()]
        stripped = [ln.strip() for ln in lines]
        if (
            len(stripped) >= 2
            and all(spec.MD_TABLE_LINE_RE.match(ln) for ln in stripped)
            and spec.MD_TABLE_SEP_RE.match(stripped[1])
        ):
            rendered = _render_table(stripped)
            blocks.append(Block(start, end, spec.KIND_TABLE, rendered, bool(rendered)))
            continue
        m = spec.MD_HEADING_RE.match(stripped[0])
        if m and len(stripped) == 1:
            title = nfkc(m.group(2)).strip()
            keep = len(title) >= spec.MIN_HEADING_CHARS
            blocks.append(
                Block(start, end, spec.KIND_HEADING, f"{m.group(1)} {title}", keep)
            )
            continue
        if all(spec.MD_LIST_LINE_RE.match(ln) for ln in stripped):
            items = [spec.MD_LIST_LINE_RE.match(ln).group(1) for ln in stripped]
            rendered = "\n".join("- " + nfkc(i).strip() for i in items)
            blocks.append(Block(start, end, spec.KIND_LIST, rendered, True))
            continue
        if len(stripped) >= 2 and all(spec.KV_LINE_RE.match(ln) for ln in stripped):
            parts = []
            for ln in stripped:
                k, v = spec.KV_LINE_RE.match(ln).groups()
                parts.append(f"- **{collapse_ws(k)}**: {nfkc(v).strip()}")
            blocks.append(Block(start, end, spec.KIND_KV, "\n".join(parts), True))
            continue
        text = nfkc(seg).strip()
        keep = len(text) >= spec.MIN_PARA_CHARS
        blocks.append(Block(start, end, spec.KIND_PARAGRAPH, text, keep))
    blocks.sort(key=lambda b: b.start)  # document order (code carved first)
    return blocks


# ---------------------------------------------------------------- html


def _strip_inline(s: str) -> str:
    s = spec.HTML_A_RE.sub(lambda m: m.group(1), s)
    return spec.HTML_INLINE_STRIP_RE.sub("", s)


def _render_html_table(inner: str) -> str:
    rows = []
    for tr in spec.HTML_TR_RE.findall(inner):
        cells = [collapse_ws(nfkc(_strip_inline(c))) for c in spec.HTML_TD_RE.findall(tr)]
        rows.append(cells)
    rows = [r for r in rows if r]
    if not rows:
        return ""
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    out = ["| " + " | ".join(rows[0]) + " |"]
    out.append("| " + " | ".join(["---"] * width) + " |")
    for r in rows[1:]:
        out.append("| " + " | ".join(r) + " |")
    return "\n".join(out)


def _html_blocks(payload: str) -> list[Block]:
    blocks: list[Block] = []
    # pending run of consecutive <li> elements (merged into ONE list block;
    # spec: adjacent li elements form a single list)
    li_run: list[tuple[int, int, str, int, int]] = []  # start,end,item,link,vis

    def flush_li():
        if not li_run:
            return
        start, end = li_run[0][0], li_run[-1][1]
        rendered = "\n".join("- " + item for _, _, item, _, _ in li_run)
        link = sum(r[3] for r in li_run)
        vis = sum(r[4] for r in li_run)
        density = link / max(vis, 1)
        content_len = sum(len(item) for _, _, item, _, _ in li_run)
        keep = content_len > 0 and density <= spec.MAX_LINK_DENSITY
        blocks.append(Block(start, end, spec.KIND_LIST, rendered, keep))
        li_run.clear()

    for m in spec.HTML_ELEMENT_RE.finditer(payload):
        tag, attrs, inner = m.group("tag"), m.group("attrs"), m.group("inner")
        if tag == "li":
            visible = _strip_inline(inner).strip()
            link_chars = sum(len(t) for t in spec.HTML_A_RE.findall(inner))
            li_run.append(
                (m.start(), m.end(), collapse_ws(nfkc(visible)), link_chars, len(visible))
            )
            continue
        flush_li()
        cm = spec.HTML_CLASS_RE.search(attrs)
        cls = cm.group(1) if cm else ""
        visible = _strip_inline(inner).strip()
        link_chars = sum(len(t) for t in spec.HTML_A_RE.findall(inner))
        text_len = len(visible)
        link_density = link_chars / max(text_len, 1)
        boiler = tag in spec.BOILER_TAGS or bool(spec.BOILER_CLASS_RE.search(cls))
        if tag == "table":
            rendered = _render_html_table(inner)
            keep = (not boiler) and bool(rendered)
            blocks.append(Block(m.start(), m.end(), spec.KIND_TABLE, rendered, keep))
        elif tag.startswith("h") and tag[1:].isdigit():
            title = collapse_ws(nfkc(visible))
            keep = (
                not boiler
                and len(title) >= spec.MIN_HEADING_CHARS
                and link_density <= spec.MAX_LINK_DENSITY
            )
            rendered = "#" * int(tag[1:]) + " " + title
            blocks.append(Block(m.start(), m.end(), spec.KIND_HEADING, rendered, keep))
        else:  # p, div, header, footer, nav, aside
            text = collapse_ws(nfkc(visible))
            keep = (
                not boiler
                and text_len >= spec.MIN_PARA_CHARS
                and link_density <= spec.MAX_LINK_DENSITY
            )
            blocks.append(Block(m.start(), m.end(), spec.KIND_PARAGRAPH, text, keep))
    flush_li()
    return blocks


# ---------------------------------------------------------------- layout


def reading_order(
    boxes: list[tuple[int, int, int, int]], direction: str = "top2bottom"
) -> list[int]:
    """Deterministic reading-order over layout boxes.

    Semantics modeled on the reference's direction graphs + priority
    traversal (reading_order.py:123-198, 14-82): an edge i→j when the
    two boxes overlap on the perpendicular axis, i precedes j along the
    reading axis, and no third overlapping box lies between them; then
    a topological sort that always emits the ready node with the
    smallest priority. top2bottom: priority (x1, y1) — walks a left
    column to its end before starting the right one. right2left
    (vertical pages): edge from greater x2 to lesser, priority
    ((max_x − x2) + y1, y1, x1). left2right (header/footer rows):
    edge from lesser x2 to greater, priority (x1 + 5·y1, y1, x1).
    Returns the permutation order (position list of indices).
    """
    n = len(boxes)

    def x_overlap(a, b) -> bool:
        return min(a[2], b[2]) - max(a[0], b[0]) > 0

    def y_overlap(a, b) -> bool:
        return min(a[3], b[3]) - max(a[1], b[1]) > 0

    if direction == "top2bottom":
        cand = lambda a, b: x_overlap(a, b) and a[3] <= b[1]  # noqa: E731
        prio = [(boxes[i][0], boxes[i][1], i) for i in range(n)]
    elif direction == "right2left":
        cand = lambda a, b: y_overlap(a, b) and a[2] > b[2]  # noqa: E731
        mx = max((b[2] for b in boxes), default=0)
        prio = [((mx - boxes[i][2]) + boxes[i][1], boxes[i][1], boxes[i][0], i) for i in range(n)]
    elif direction == "left2right":
        cand = lambda a, b: y_overlap(a, b) and a[2] < b[2]  # noqa: E731
        prio = [(boxes[i][0] + 5 * boxes[i][1], boxes[i][1], boxes[i][0], i) for i in range(n)]
    else:
        raise ValueError(f"unknown reading-order direction {direction!r}")

    adj = [[] for _ in range(n)]
    indeg = [0] * n
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            a, b = boxes[i], boxes[j]
            if not cand(a, b):
                continue
            occluded = any(
                k != i and k != j and cand(a, boxes[k]) and cand(boxes[k], b)
                for k in range(n)
            )
            if not occluded:
                adj[i].append(j)
                indeg[j] += 1
    heap = [prio[i] for i in range(n) if indeg[i] == 0]
    heapq.heapify(heap)
    order = []
    while heap:
        i = heapq.heappop(heap)[-1]
        order.append(i)
        for j in adj[i]:
            indeg[j] -= 1
            if indeg[j] == 0:
                heapq.heappush(heap, prio[j])
    # cycles cannot happen (edges strictly order the axis), but stay total:
    if len(order) < n:
        order += sorted(set(range(n)) - set(order))
    return order


def _area(b) -> int:
    return (b[2] - b[0]) * (b[3] - b[1])


def _vote_vertical(items, idxs) -> bool:
    """Area-weighted direction vote (reference judge_page_direction,
    document_analyzer.py:20-40): vertical wins on strictly greater
    summed area."""
    v = h = 0
    for i in idxs:
        a = _area(items[i]["box"])
        if items[i].get("direction") == "vertical":
            v += a
        else:
            h += a
    return v > h


def _layout_blocks(payload: str) -> list[Block]:
    doc = json.loads(payload)
    items = doc.get("blocks", [])
    kept_idx = [i for i, it in enumerate(items) if it.get("role") not in spec.META_ROLES]
    dropped = [i for i in range(len(items)) if i not in kept_idx]
    vertical_page = _vote_vertical(items, kept_idx)
    # figure absorption (reference extract_paragraph_within_figure,
    # document_analyzer.py:43-66): paragraph/heading blocks >0.7 inside
    # a figure box belong to their FIRST containing figure and emit
    # right after it, inner-ordered l2r (or r2l on a vertical vote)
    fig_loc = [k for k, i in enumerate(kept_idx)
               if items[i].get("role") == spec.ROLE_FIGURE]
    owner = {}
    for k, i in enumerate(kept_idx):
        role = items[i].get("role", spec.ROLE_PARAGRAPH)
        if role not in (spec.ROLE_PARAGRAPH, spec.ROLE_HEADING):
            continue
        pb = items[i]["box"]
        for fk in fig_loc:
            fb = items[kept_idx[fk]]["box"]
            ov = max(min(fb[2], pb[2]) - max(fb[0], pb[0]), 0) * max(
                min(fb[3], pb[3]) - max(fb[1], pb[1]), 0
            )
            if 10 * ov > 7 * _area(pb):
                owner[k] = fk
                break
    top = [k for k in range(len(kept_idx)) if k not in owner]
    boxes = [tuple(items[kept_idx[k]]["box"]) for k in top]
    tperm = reading_order(boxes, "right2left" if vertical_page else "top2bottom")
    perm = []
    for t in tperm:
        k = top[t]
        perm.append(k)
        if k in fig_loc:
            kids = [p for p, f in owner.items() if f == k]
            if kids:
                inner = (
                    "right2left"
                    if _vote_vertical(items, [kept_idx[p] for p in kids])
                    else "left2right"
                )
                kperm = reading_order(
                    [tuple(items[kept_idx[p]]["box"]) for p in kids], inner
                )
                perm.extend(kids[q] for q in kperm)
    blocks: list[Block] = []
    for i in dropped:
        it = items[i]
        idx = payload.find(it["text"])
        blocks.append(
            Block(idx, idx + len(it["text"]), spec.KIND_PARAGRAPH, "", False)
        )
    for p in perm:
        it = items[kept_idx[p]]
        text = nfkc(it["text"]).strip()
        role = it.get("role", spec.ROLE_PARAGRAPH)
        if role == spec.ROLE_HEADING:
            kind, rendered = spec.KIND_HEADING, "# " + text
        elif role == spec.ROLE_FIGURE:
            kind, rendered = spec.KIND_FIGURE, text
        else:
            kind, rendered = spec.KIND_PARAGRAPH, text
        idx = payload.find(it["text"])
        blocks.append(Block(idx, idx + len(it["text"]), kind, rendered, bool(text)))
    return blocks


# ---------------------------------------------------------------- entry


def extract_payload(text: str | None, tool: str | None) -> dict:
    """Extract one turn. Returns extracted_text, spans, metrics."""
    payload = text if (text is not None and text != "") else (tool or "")
    if payload.strip() == "":
        return {
            "extracted_text": "",
            "spans": [],
            "blocks_kept": 0,
            "blocks_dropped": 0,
            "chars_emitted": 0,
        }
    cls = classify_payload(payload)
    if cls == "layout":
        # bad-row tolerance: unparseable layout JSON degrades to textual
        # (the reference skips unreadable inputs per file, cli/main.py:538-549;
        # at 10^12 turns one bad payload must never kill the job)
        try:
            blocks = _layout_blocks(payload)
        except Exception:
            blocks = _textual_blocks(payload)
    elif cls == "html":
        blocks = _html_blocks(payload)
    else:
        blocks = _textual_blocks(payload)
    kept = [b for b in blocks if b.keep]
    extracted = spec.BLOCK_JOINER.join(b.rendered for b in kept)
    return {
        "extracted_text": extracted,
        "spans": [(b.start, b.end, b.kind) for b in kept],
        "blocks_kept": len(kept),
        "blocks_dropped": len(blocks) - len(kept),
        "chars_emitted": len(extracted),
    }
