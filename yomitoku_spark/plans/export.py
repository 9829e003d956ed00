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
    out = F.regexp_replace(col, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    return F.regexp_replace(out, ">", "&gt;")


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


def export_blocks(blocks: DataFrame) -> DataFrame:
    """Per-turn markdown/html/csv/json export columns from classified,
    ordered blocks (same single-aggregation shape as pipeline.emit)."""
    kept = F.when(
        F.col("keep"),
        F.struct(
            F.col("order"),
            F.col("rendered"),
            block_html(F.col("kind"), F.col("rendered")).alias("html"),
            block_csv(F.col("kind"), F.col("rendered")).alias("csv"),
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
