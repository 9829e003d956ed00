"""Unit tests for the pure-Python oracle (the spec's reference impl)."""

from yomitoku_spark import datagen, oracle


def test_empty_payload():
    r = oracle.extract_payload("", "")
    assert r["extracted_text"] == ""
    assert r["spans"] == []
    assert r["blocks_kept"] == 0 and r["blocks_dropped"] == 0


def test_none_payload():
    r = oracle.extract_payload(None, None)
    assert r["extracted_text"] == ""


def test_tool_payload_used_when_text_empty():
    r = oracle.extract_payload("", "plain enough text for one paragraph")
    assert r["extracted_text"] == "plain enough text for one paragraph"
    assert r["spans"] == [(0, 35, "paragraph")]


def test_prose_short_dropped():
    r = oracle.extract_payload("tiny\n\nthis paragraph is long enough to keep", "")
    assert r["extracted_text"] == "this paragraph is long enough to keep"
    assert r["blocks_dropped"] == 1 and r["blocks_kept"] == 1


def test_nfkc_normalization():
    r = oracle.extract_payload("Ｆｕｌｌｗｉｄｔｈ ﬁlter text here", "")
    assert r["extracted_text"] == "Fullwidth filter text here"


def test_heading_and_list():
    payload = "## Title Here\n\n- alpha one\n- beta two"
    r = oracle.extract_payload(payload, "")
    assert r["extracted_text"] == "## Title Here\n\n- alpha one\n- beta two"
    kinds = [s[2] for s in r["spans"]]
    assert kinds == ["heading", "list"]


def test_kv_block():
    payload = "Invoice No: 12345\nDate: ２０２４年"
    r = oracle.extract_payload(payload, "")
    assert r["extracted_text"] == "- **Invoice No**: 12345\n- **Date**: 2024年"
    assert r["spans"][0][2] == "kv"


def test_md_table_span_expansion():
    payload = "| a | b |\n|---|---|\n| x | << |\n| ^^ | y |"
    r = oracle.extract_payload(payload, "")
    assert r["extracted_text"] == (
        "| a | b |\n| --- | --- |\n| x |  |\n|  | y |"
    )


def test_html_boilerplate_stripped():
    payload = (
        '<header><a href="/">home</a> <a href="/x">about</a></header>\n'
        '<nav class="nav"><a href="/a">aa</a></nav>\n'
        "<h2>Section Title</h2>\n"
        "<p>the real main content of this page lives here</p>\n"
        '<div class="sidebar">promo promo promo promo</div>\n'
        "<footer>copyright</footer>"
    )
    r = oracle.extract_payload(payload, "")
    assert r["extracted_text"] == (
        "## Section Title\n\nthe real main content of this page lives here"
    )
    assert r["blocks_dropped"] == 4


def test_html_link_density_drop():
    payload = (
        '<p><a href="/1">lots</a> <a href="/2">of</a> <a href="/3">linky</a> '
        '<a href="/4">words</a> here</p>'
        "<p>normal long paragraph without any links in it at all</p>"
    )
    r = oracle.extract_payload(payload, "")
    assert r["extracted_text"] == "normal long paragraph without any links in it at all"


def test_html_list_and_table():
    payload = (
        "<ul><li>first item</li><li>second item</li></ul>"
        "<table><tr><td>h1</td><td>h2</td></tr><tr><td>a</td><td>b</td></tr></table>"
    )
    r = oracle.extract_payload(payload, "")
    assert r["extracted_text"] == (
        "- first item\n- second item\n\n"
        "| h1 | h2 |\n| --- | --- |\n| a | b |"
    )
    # merged li run spans the whole <li>...</li> range
    assert r["spans"][0][:2] == (4, 43)


def test_layout_reading_order_two_columns():
    import json

    blocks = [
        {"id": 0, "box": [0, 0, 600, 40], "role": "page_header", "text": "hdr"},
        {"id": 1, "box": [320, 60, 600, 120], "role": "paragraph", "text": "right top"},
        {"id": 2, "box": [0, 60, 280, 120], "role": "paragraph", "text": "left top"},
        {"id": 3, "box": [0, 140, 280, 200], "role": "paragraph", "text": "left bottom"},
        {"id": 4, "box": [320, 140, 600, 200], "role": "paragraph", "text": "right bottom"},
        {"id": 5, "box": [0, 2000, 600, 2040], "role": "page_footer", "text": "ftr"},
    ]
    payload = json.dumps({"blocks": blocks})
    r = oracle.extract_payload(payload, "")
    assert r["extracted_text"] == "left top\n\nleft bottom\n\nright top\n\nright bottom"
    assert r["blocks_dropped"] == 2  # header + footer meta roles


def test_layout_heading_prefix_and_figure():
    import json

    blocks = [
        {"id": 0, "box": [0, 0, 600, 50], "role": "section_headings", "text": "The Title"},
        {"id": 1, "box": [0, 60, 600, 120], "role": "figure", "text": "figure caption"},
    ]
    r = oracle.extract_payload(json.dumps({"blocks": blocks}), "")
    assert r["extracted_text"] == "# The Title\n\nfigure caption"
    assert [s[2] for s in r["spans"]] == ["heading", "figure"]


def test_generator_deterministic():
    a = datagen.transcripts_pdf(n_convs=5, seed=7)
    b = datagen.transcripts_pdf(n_convs=5, seed=7)
    assert a.equals(b)
    c = datagen.transcripts_pdf(n_convs=5, seed=8)
    assert not a["text"].equals(c["text"])


def test_generator_skew():
    pdf = datagen.transcripts_pdf(n_convs=20, seed=42, skew=12)
    counts = pdf.groupby("conv_id").size()
    assert counts.iloc[0] > 5 * counts.iloc[1:].median()


def test_oracle_runs_on_all_generated_payloads():
    pdf = datagen.transcripts_pdf(n_convs=30, seed=42)
    for _, row in pdf.iterrows():
        r = oracle.extract_payload(row["text"], row["tool"])
        assert r["chars_emitted"] == len(r["extracted_text"])
        for s, e, _k in r["spans"]:
            payload = row["text"] or row["tool"]
            assert 0 <= s <= e <= len(payload)


def test_fenced_code_block():
    payload = "intro paragraph long enough\n\n```py\nx = 1\n\n| not | a table |\n```\n\ntail paragraph long enough"
    r = oracle.extract_payload(payload, "")
    kinds = [s[2] for s in r["spans"]]
    assert kinds == ["paragraph", "code", "paragraph"]
    assert "```py\nx = 1\n\n| not | a table |\n```" in r["extracted_text"]


def test_unbalanced_fence_degrades_to_text():
    payload = "```py\nonly an opening fence here with enough chars"
    r = oracle.extract_payload(payload, "")
    assert r["spans"][0][2] == "paragraph"
