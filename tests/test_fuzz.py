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
    want = oracle.reading_order(boxes)
    got = reading_order_numpy(np.asarray(boxes).reshape(-1, 4)).tolist()
    assert got == want


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
