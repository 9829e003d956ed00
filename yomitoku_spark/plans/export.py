"""Export sinks (§2.1): markdown / JSON / HTML / CSV renderings.

Mirrors the reference's export formats (export_markdown.py,
export_json.py:61-97, export_html.py:149-227, export_csv.py:120-158)
as COLUMN EXPRESSIONS over the result/blocks tables:

* markdown — the pipeline's native ``extracted_text``;
* json     — canonical ``to_json`` of the result struct (stable field
  order → byte-stable, like the reference's sorted-keys json.dump);
* html     — block-kind dispatch: heading→<hN>, list→<ul><li>,
  pipe-table→<table><tr><td>, paragraph→<p>, with HTML escaping
  (export_html.py:9-20 analog);
* csv      — tables as comma rows, prose as one quoted cell per block,
  blank-line separated (export_csv.py:120-158 analog).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def html_escape(col: Column) -> Column:
    """Python ``html.escape`` parity (the reference's escaper,
    export_html.py:3,20): & < > AND the two quote characters, plus the
    reference's URL re-escape pass (export_html.py:14-20). That pass
    runs AFTER the full escape and its regex matches ``https?://`` + one
    non-space/</> character — a no-op unless the character right after
    ``://`` was one of &<>\"' , in which case the first escape turned it
    into an entity starting with ``&`` and the re-escape doubles that
    ampersand (``http://&x`` → ``http://&amp;amp;x``). Since a raw ``&``
    never survives the first pass, the whole behavior reduces to one
    rule on the escaped text: ``https?://&`` → ``https?://&amp;``."""
    out = F.regexp_replace(col, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    out = F.regexp_replace(out, ">", "&gt;")
    out = F.regexp_replace(out, '"', "&quot;")
    out = F.regexp_replace(out, "'", "&#x27;")
    return F.regexp_replace(out, r"(https?://)&", "$1&amp;")


def md_escape(col: Column) -> Column:
    """The reference's escape_markdown_special_chars
    (export_markdown.py:7-9): backslash-prefix every char in
    [`*{}[]()#+!~|-]."""
    return F.regexp_replace(col, r"([`*{}\[\]()#+!~|-])", r"\\$1")


def _block_body(col: Column, ignore_line_break: bool) -> Column:
    return F.regexp_replace(col, "\n", "" if ignore_line_break else "<br>")


def paragraph_md(contents: Column, ignore_line_break: bool = False) -> Column:
    """paragraph_to_md parity (export_markdown.py:12-27): escape,
    newline policy, trailing newline (role prefix handled upstream)."""
    return F.concat(_block_body(md_escape(contents), ignore_line_break), F.lit("\n"))


def paragraph_html(contents: Column, ignore_line_break: bool = False) -> Column:
    """paragraph_to_html parity (export_html.py:84-101)."""
    return F.concat(
        F.lit("<p>"), _block_body(html_escape(contents), ignore_line_break), F.lit("</p>")
    )


def table_cells_md(cells: DataFrame, group_cols: list[str],
                   ignore_line_break: bool = False) -> DataFrame:
    """table_to_md parity (export_markdown.py:30-67) from a cells table
    (group_cols..., row, col, row_span, col_span, contents) with the
    reference's 1-based anchors: an n_row x n_col pipe grid holding
    each cell's (escaped, newline-replaced) contents at its ANCHOR
    position only, other spanned positions empty, separator row after
    row 1, one trailing newline per row. n_row/n_col derive from the
    span extents (the reference receives them precomputed from the same
    cells). Higher-order exprs over O(10^2)-cell tables — export leaf,
    not a hot path."""
    body = _block_body(md_escape(F.coalesce(F.col("contents"), F.lit(""))),
                       ignore_line_break)
    agg = cells.groupBy(*group_cols).agg(
        F.collect_list(
            F.struct(F.col("row"), F.col("col"), body.alias("v"))
        ).alias("cs"),
        F.max(F.col("row") + F.col("row_span") - 1).alias("n_row"),
        F.max(F.col("col") + F.col("col_span") - 1).alias("n_col"),
    )
    sep = F.concat(
        F.lit("|"),
        F.array_join(F.transform(F.sequence(F.lit(1), F.col("n_col")),
                                 lambda c: F.lit("-")), "|"),
        F.lit("|\n"),
    )
    row_md = lambda r: F.concat(
        F.lit("|"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.col("n_col")),
                lambda c: F.coalesce(
                    # F.get (not element_at): null on no-anchor positions
                    # instead of an ANSI out-of-bounds error
                    F.get(
                        F.filter("cs", lambda s: (s["row"] == r) & (s["col"] == c)),
                        0,
                    )["v"],
                    F.lit(""),
                ),
            ),
            "|",
        ),
        F.lit("|\n"),
    )
    md = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.col("n_row")),
            lambda r: F.when(r == 1, F.concat(row_md(r), sep)).otherwise(row_md(r)),
        ),
        "",
    )
    return agg.select(*group_cols, md.alias("md"))


def table_cells_html(cells: DataFrame, group_cols: list[str],
                     ignore_line_break: bool = False) -> DataFrame:
    """table_to_html parity (export_html.py:47-81): one <td> per cell
    carrying rowspan/colspan attributes, cells grouped into <tr> by
    row, the reference's table tag. Deviation (documented): the
    reference opens a new <tr> at every row-VALUE change in raw cell
    list order (an unsorted list would split a row into several <tr>);
    we group by row value, identical on the row-major cell lists the
    reference actually produces. Rows with no anchor cells emit no
    <tr>, like the reference."""
    body = _block_body(html_escape(F.coalesce(F.col("contents"), F.lit(""))),
                       ignore_line_break)
    td = F.concat(
        F.lit('<td rowspan="'), F.col("row_span").cast("string"),
        F.lit('" colspan="'), F.col("col_span").cast("string"),
        F.lit('">'), body, F.lit("</td>"),
    )
    agg = cells.groupBy(*group_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("row"), F.col("col"), td.alias("td")))
        ).alias("cs")
    )
    rows = F.transform(
        F.array_distinct(F.transform("cs", lambda s: s["row"])),
        lambda r: F.concat(
            F.lit("<tr>"),
            F.array_join(
                F.transform(
                    F.filter("cs", lambda s: s["row"] == r), lambda s: s["td"]
                ),
                "",
            ),
            F.lit("</tr>"),
        ),
    )
    html = F.concat(
        F.lit('<table border="1" style="border-collapse: collapse">'),
        F.array_join(rows, ""),
        F.lit("</table>"),
    )
    return agg.select(*group_cols, html.alias("html"))


def csv_quote(col: Column) -> Column:
    """QUOTE_MINIMAL: quote only when the cell contains , " or newline."""
    quoted = F.concat(F.lit('"'), F.regexp_replace(col, '"', '""'), F.lit('"'))
    return F.when(col.rlike('[,"\n]'), quoted).otherwise(col)


def _table_lines(rendered: Column) -> Column:
    """Pipe-table rendered lines minus the separator row."""
    return F.filter(
        F.split(rendered, "\n"), lambda ln: ~ln.rlike(r"^\|[\s\-|]+\|$")
    )


def _cells_of_line(ln: Column) -> Column:
    raw = F.split(ln, r"\|")
    # NOTE: must wrap in a 1-arg lambda — F.trim's optional second
    # parameter would make transform() feed it the element INDEX
    return F.transform(
        F.slice(raw, 2, F.greatest(F.size(raw) - 2, F.lit(0))), lambda c: F.trim(c)
    )


def block_html(kind: Column, rendered: Column) -> Column:
    """One block → HTML fragment (dispatch on kind)."""
    esc = html_escape(rendered)
    level = F.length(F.regexp_extract(rendered, r"^(#{1,6}) ", 1))
    heading = F.concat(
        F.lit("<h"), level.cast("string"), F.lit(">"),
        html_escape(F.regexp_replace(rendered, r"^#{1,6} ", "")),
        F.lit("</h"), level.cast("string"), F.lit(">"),
    )
    items = F.transform(
        F.split(rendered, "\n"),
        lambda ln: F.concat(
            F.lit("<li>"), html_escape(F.regexp_replace(ln, r"^- ", "")), F.lit("</li>")
        ),
    )
    ul = F.concat(F.lit("<ul>"), F.array_join(items, ""), F.lit("</ul>"))
    trs = F.transform(
        _table_lines(rendered),
        lambda ln: F.concat(
            F.lit("<tr>"),
            F.array_join(
                F.transform(
                    _cells_of_line(ln),
                    lambda c: F.concat(F.lit("<td>"), html_escape(c), F.lit("</td>")),
                ),
                "",
            ),
            F.lit("</tr>"),
        ),
    )
    table = F.concat(F.lit("<table>"), F.array_join(trs, ""), F.lit("</table>"))
    return (
        F.when(kind == "heading", heading)
        .when(kind == "code", F.concat(F.lit("<pre>"), esc, F.lit("</pre>")))
        .when(kind == "list", ul)
        .when(kind == "kv", ul)
        .when(kind == "table", table)
        .otherwise(F.concat(F.lit("<p>"), esc, F.lit("</p>")))
    )


def block_csv(kind: Column, rendered: Column) -> Column:
    """One block → CSV lines (tables become comma rows)."""
    rows = F.transform(
        _table_lines(rendered),
        lambda ln: F.array_join(F.transform(_cells_of_line(ln), csv_quote), ","),
    )
    return F.when(kind == "table", F.array_join(rows, "\n")).otherwise(
        csv_quote(F.regexp_replace(rendered, "\n", " "))
    )


def export_blocks(blocks: DataFrame, ignore_line_break: bool = False) -> DataFrame:
    """Per-turn markdown/html/csv/json export columns from classified,
    ordered blocks (same single-aggregation shape as pipeline.emit).

    ``ignore_line_break`` mirrors the reference CLI flag (cli/main.py
    ``--ignore_line_break`` → paragraph_to_md/html ``contents.replace
    ("\n", "")``, export_markdown.py:15-17): when True, PARAGRAPH
    bodies lose their interior newlines in every format. Structural
    blocks (list/table/code/kv) keep theirs — the reference's flag
    never touches structure either (tables apply it per-CELL, which the
    cells-grain sinks table_cells_md/html honor). Default False is the
    oracle-checked rendering, which keeps raw newlines where the
    reference's default inserts <br> — a documented deviation."""
    body = (
        F.when(
            F.col("kind") == "paragraph",
            F.regexp_replace("rendered", "\n", ""),
        ).otherwise(F.col("rendered"))
        if ignore_line_break
        else F.col("rendered")
    )
    kept = F.when(
        F.col("keep"),
        F.struct(
            F.col("order"),
            body.alias("rendered"),
            block_html(F.col("kind"), body).alias("html"),
            block_csv(F.col("kind"), body).alias("csv"),
        ),
    )
    agg = blocks.groupBy("conv_id", "turn_idx").agg(
        F.array_sort(F.collect_list(kept)).alias("bs")
    )
    md = F.array_join(F.transform("bs", lambda b: b["rendered"]), "\n\n")
    html = F.concat(
        F.lit("<html><body>"),
        F.array_join(F.transform("bs", lambda b: b["html"]), "\n"),
        F.lit("</body></html>"),
    )
    csv = F.array_join(F.transform("bs", lambda b: b["csv"]), "\n\n")
    out = agg.select(
        "conv_id",
        "turn_idx",
        md.alias("markdown"),
        html.alias("html"),
        csv.alias("csv"),
    )
    return out.withColumn(
        "json",
        F.to_json(F.struct("conv_id", "turn_idx", F.col("markdown").alias("extracted_text"))),
    )
