"""Property-based equality fuzzing (no Spark session — the fused batch
function runs on plain pandas, so hypothesis can hammer it).

1. arbitrary payload text → engine batch output == oracle output
2. random box sets → numpy reading order == oracle's scalar reading order
3. random pipe tables / kv runs → parser round-trip sanity
"""

import json

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from yomitoku_spark import oracle
from yomitoku_spark.operators.reading_order import reading_order_numpy
from yomitoku_spark.plans.pipeline import _extract_batches

ALPHABET = list(
    "abcdefgh xyz\n\t|#<>-*:.,01289一二ﬁＡＢ{}\"'[]()~`&/=高速データ　"
) + ["\n\n", "| ", " |", "---", "<p>", "</p>", "<ul>", "<li>", "</li>", "<header>",
     "</header>", '{"blocks"', "**", "- ", "## ", "Key: ", "^^", "<<", "```\n", "```py\n", "\n```\n",
     '<a href="/x">', "</a>", '<div class="nav">', "</div>"]


def _engine_one(text, tool=""):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"],
            "turn_idx": np.array([0], dtype="int32"),
            "text": [text],
            "tool": [tool],
            "ts": pd.to_datetime([0], unit="s"),
        }
    )
    out = next(_extract_batches(iter([pdf])))
    r = out.iloc[0]
    return {
        "extracted_text": r["extracted_text"],
        "spans": [(s["start"], s["end"], s["kind"]) for s in r["spans"]],
        "blocks_kept": int(r["blocks_kept"]),
        "blocks_dropped": int(r["blocks_dropped"]),
        "chars_emitted": int(r["chars_emitted"]),
    }


@given(st.lists(st.sampled_from(ALPHABET), max_size=120).map("".join))
@settings(max_examples=400, deadline=None)
def test_engine_equals_oracle_on_arbitrary_payloads(payload):
    want = oracle.extract_payload(payload, "")
    got = _engine_one(payload)
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(0, 500), st.integers(0, 500),
            st.integers(1, 300), st.integers(1, 300),
        ),
        min_size=0,
        max_size=12,
    )
)
@settings(max_examples=300, deadline=None)
def test_reading_order_numpy_equals_oracle(raw):
    boxes = [(x, y, x + w, y + h) for x, y, w, h in raw]
    for direction in ("top2bottom", "right2left", "left2right"):
        want = oracle.reading_order(boxes, direction)
        got = reading_order_numpy(
            np.asarray(boxes).reshape(-1, 4), direction
        ).tolist()
        assert got == want, direction


def test_vertical_page_reads_right_to_left():
    # 3 vertical columns: right column first (document_analyzer.py:575-581)
    blocks = [
        {"id": i, "box": [x, 0, x + 50, 300], "text": t, "direction": "vertical",
         "role": "paragraph"}
        for i, (x, t) in enumerate([(0, "left"), (200, "mid"), (400, "right")])
    ]
    payload = json.dumps({"blocks": blocks})
    got = _engine_one(payload)
    assert got["extracted_text"].split("\n\n") == ["right", "mid", "left"]
    assert got == oracle.extract_payload(payload, "")


def test_figure_absorbs_contained_paragraphs():
    # paragraphs ≥0.7 inside a figure emit right after it, inner l2r,
    # regardless of page-level geometry (document_analyzer.py:43-66)
    blocks = [
        {"id": 0, "box": [0, 0, 600, 40], "text": "intro", "role": "paragraph"},
        {"id": 1, "box": [50, 100, 550, 400], "text": "FIG", "role": "figure"},
        # inside the figure, right one listed first
        {"id": 2, "box": [320, 150, 480, 200], "text": "right cap", "role": "paragraph"},
        {"id": 3, "box": [60, 150, 220, 200], "text": "left cap", "role": "paragraph"},
        {"id": 4, "box": [0, 500, 600, 540], "text": "outro", "role": "paragraph"},
    ]
    payload = json.dumps({"blocks": blocks})
    got = _engine_one(payload)
    assert got["extracted_text"].split("\n\n") == [
        "intro", "FIG", "left cap", "right cap", "outro"
    ]
    assert got == oracle.extract_payload(payload, "")


def test_header_footer_order_offsets():
    # headers get orders before main content, footers after
    # (document_analyzer.py:572-588); both stay dropped from the text
    from yomitoku_spark.plans.pipeline import _layout_order
    from yomitoku_spark.plans.segment import BLOCK_FIELDS, segment_turn

    blocks = [
        {"id": 0, "box": [0, 500, 600, 540], "text": "foot", "role": "page_footer"},
        {"id": 1, "box": [0, 100, 600, 140], "text": "body1", "role": "paragraph"},
        {"id": 2, "box": [0, 0, 600, 40], "text": "head", "role": "page_header"},
        {"id": 3, "box": [0, 200, 600, 240], "text": "body2", "role": "paragraph"},
    ]
    payload = json.dumps({"blocks": blocks})
    blks = segment_turn(payload, "")
    order = _layout_order(blks).tolist()
    rid = BLOCK_FIELDS.index("role")
    by_role = {blks[i][rid]: order[i] for i in range(4) if blks[i][rid]}
    assert by_role["page_header"] == 0
    assert by_role["page_footer"] == 3
    assert sorted(order) == [0, 1, 2, 3]
    got = _engine_one(payload)
    assert got["extracted_text"] == "body1\n\nbody2"
    assert got == oracle.extract_payload(payload, "")


@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "box": st.tuples(
                    st.integers(0, 400), st.integers(0, 400),
                    st.integers(1, 200), st.integers(1, 200),
                ).map(lambda t: [t[0], t[1], t[0] + t[2], t[1] + t[3]]),
                "role": st.sampled_from(
                    ["paragraph", "section_headings", "page_header", "page_footer", "figure"]
                ),
                "text": st.text(alphabet="abcde fgh", min_size=0, max_size=20),
                "direction": st.sampled_from(["horizontal", "vertical"]),
            }
        ),
        max_size=8,
    )
)
@settings(max_examples=200, deadline=None)
def test_layout_payload_fuzz(blocks):
    for i, b in enumerate(blocks):
        b["id"] = i
    payload = json.dumps({"blocks": blocks})
    want = oracle.extract_payload(payload, "")
    got = _engine_one(payload)
    assert got == want
