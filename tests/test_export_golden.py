"""Reference export-function parity — the reference's OWN test vectors
(tests/test_export.py) run through our column-level exporters.

Covers convert_text_to_html (incl. the quote escapes html.escape adds),
escape_markdown_special_chars, paragraph_to_md/html (both newline
policies), and table_to_md/html with a 2-rowspan cell (anchor-only md
placement, td rowspan/colspan attributes). Expected strings are copied
VERBATIM from the reference test (tests/test_export.py:37-270)."""

from pyspark.sql import functions as F

from yomitoku_spark.plans import export as EX

# the reference's table fixtures: 3 cells, one spanning 2 rows; the
# md test's third cell carries contents, the html test's is empty
_TABLE_CELLS_MD = [
    (1, 1, 2, 1, "dummy\n"),
    (1, 2, 1, 1, "dummy\n"),
    (2, 2, 1, 1, "dummy\n"),
]
_TABLE_CELLS_HTML = [
    (1, 1, 2, 1, "dummy\n"),
    (1, 2, 1, 1, "dummy\n"),
    (2, 2, 1, 1, ""),
]


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_convert_text_to_html_vectors(spark):
    vectors = [
        (
            "これはテストです。<p>がんばりましょう。</p>",
            "これはテストです。&lt;p&gt;がんばりましょう。&lt;/p&gt;",
        ),
        (
            "これはテストです。https://www.google.com",
            "これはテストです。https://www.google.com",
        ),
        (
            "これはテストです。<a href='https://www.google.com'>Google</a>",
            "これはテストです。&lt;a href=&#x27;https://www.google.com&#x27;&gt;"
            "Google&lt;/a&gt;",
        ),
        # the URL re-escape pass is NOT a no-op when the char right after
        # :// is HTML-special: the reference double-escapes the entity's
        # ampersand (ADVICE r4; verified against convert_text_to_html)
        ("http://&x", "http://&amp;amp;x"),
        ('see http://"q end', "see http://&amp;quot;q end"),
        ("https://'a and http://<b", "https://&amp;#x27;a and http://&amp;lt;b"),
    ]
    for text, expected in vectors:
        assert _one(spark, EX.html_escape(F.lit(text))) == expected


def test_escape_markdown_special_chars_vectors(spark):
    vectors = [
        ("![image](https://www.google.com)", "\\!\\[image\\]\\(https://www.google.com\\)"),
        ("**これはテストです**", "\\*\\*これはテストです\\*\\*"),
        ("- これはテストです", "\\- これはテストです"),
        ("1. これはテストです", "1. これはテストです"),
        ("| これはテストです", "\\| これはテストです"),
        (
            "```python\nprint('Hello, World!')\n```",
            "\\`\\`\\`python\nprint\\('Hello, World\\!'\\)\n\\`\\`\\`",
        ),
    ]
    for text, expected in vectors:
        assert _one(spark, EX.md_escape(F.lit(text))) == expected


def test_paragraph_md_vectors(spark):
    contents = "print('Hello, World!')\n"
    assert (
        _one(spark, EX.paragraph_md(F.lit(contents), ignore_line_break=False))
        == "print\\('Hello, World\\!'\\)<br>\n"
    )
    assert (
        _one(spark, EX.paragraph_md(F.lit(contents), ignore_line_break=True))
        == "print\\('Hello, World\\!'\\)\n"
    )


def test_paragraph_html_vectors(spark):
    contents = "これはテストです。<a href='https://www.google.com'>Google</a>\n"
    esc = (
        "これはテストです。&lt;a href=&#x27;https://www.google.com&#x27;&gt;"
        "Google&lt;/a&gt;"
    )
    assert (
        _one(spark, EX.paragraph_html(F.lit(contents), ignore_line_break=False))
        == f"<p>{esc}<br></p>"
    )
    assert (
        _one(spark, EX.paragraph_html(F.lit(contents), ignore_line_break=True))
        == f"<p>{esc}</p>"
    )


def _cells_df(spark, cells):
    return spark.createDataFrame(
        [(0, *c) for c in cells],
        "tid bigint, row int, col int, row_span int, col_span int, contents string",
    )


def test_table_md_vectors(spark):
    df = _cells_df(spark, _TABLE_CELLS_MD)
    got = EX.table_cells_md(df, ["tid"], ignore_line_break=False)
    assert got.collect()[0].md == "|dummy<br>|dummy<br>|\n|-|-|\n||dummy<br>|\n"
    got = EX.table_cells_md(df, ["tid"], ignore_line_break=True)
    assert got.collect()[0].md == "|dummy|dummy|\n|-|-|\n||dummy|\n"


def test_table_html_vectors(spark):
    got = EX.table_cells_html(
        _cells_df(spark, _TABLE_CELLS_HTML), ["tid"], ignore_line_break=False
    )
    assert got.collect()[0].html == (
        '<table border="1" style="border-collapse: collapse">'
        '<tr><td rowspan="2" colspan="1">dummy<br></td>'
        '<td rowspan="1" colspan="1">dummy<br></td></tr>'
        '<tr><td rowspan="1" colspan="1"></td></tr></table>'
    )
    got = EX.table_cells_html(
        _cells_df(spark, _TABLE_CELLS_HTML), ["tid"], ignore_line_break=True
    )
    assert got.collect()[0].html == (
        '<table border="1" style="border-collapse: collapse">'
        '<tr><td rowspan="2" colspan="1">dummy</td>'
        '<td rowspan="1" colspan="1">dummy</td></tr>'
        '<tr><td rowspan="1" colspan="1"></td></tr></table>'
    )


# ---------------------------------------------- quad validation vectors


def test_validate_quads_vectors(spark):
    """Reference test_validate_quads (tests/test_data.py:141-166) on a
    100x100 image: malformed point counts and out-of-bounds quads are
    invalid; the in-bounds quads validate and convert to xyxy."""
    from yomitoku_spark.operators import spatial as SP

    bad = [
        [[0, 0], [0, 10], [10, 10]],                 # 3 points
        [[0], [0, 10], [10, 10], [10, 0]],           # 1-coord point
        [[0, 0], [0, 150], [10, 150], [10, 0]],      # y > h
        [[150, 0], [150, 10], [10, 10], [10, 0]],    # x > w
        [[-1, 0], [-1, 10], [10, 10], [10, 0]],      # x < 0
        [[0, -1], [0, 10], [10, 10], [10, -1]],      # y < 0
    ]
    good = [
        [[0, 0], [0, 10], [10, 10], [10, 0]],
        [[0, 0], [0, 20], [10, 20], [10, 0]],
        [[10, 0], [10, 30], [80, 30], [80, 0]],
    ]
    df = spark.createDataFrame(
        [(i, q, False) for i, q in enumerate(bad)]
        + [(100 + i, q, True) for i, q in enumerate(good)],
        "id int, quad array<array<int>>, expected boolean",
    )
    rows = df.select(
        "id", "expected",
        SP.quad_valid(F.col("quad"), F.lit(100), F.lit(100)).alias("ok"),
        SP.quad_to_xyxy(F.col("quad")).alias("bb"),
    ).collect()
    for r in rows:
        assert bool(r.ok) == r.expected, (r.id, r.ok)
    bb = {r.id: (r.bb.x1, r.bb.y1, r.bb.x2, r.bb.y2) for r in rows}
    assert bb[100] == (0, 0, 10, 10)
    assert bb[102] == (10, 0, 80, 30)
