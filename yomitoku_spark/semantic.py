"""Semantic field extraction over layout tables (the full rule cascade).

Re-expression of the reference's rule extractor
(/root/reference/src/yomitoku/extractor/rule_pipeline.py) as set-based
DataFrame plans. The reference resolves one document at a time through
a priority cascade; here every tier is evaluated corpus-wide as a join
or filter, and the cascade itself is an ordered pick (min tier, then
the tier's own deterministic order) — one window per field, all
documents in parallel.

Scalar-field cascade (rule_pipeline.py:141-262), tier order:

1. ``cell_id`` equi lookup                     (:23-42,  high)
2. ``bbox`` containment, ratio > 0.5           (:45-65,  high)
3. KV-item key substring; ``merge_values``     (:152-206, high)
   joins multiple values ordered by the wider axis spread
   (table_semantic_parser.py:462-514)
4. cell-content substring                      (:208-227, medium)
5. paragraph substring                         (:229-248, medium)
6. regex over cells → paragraphs → words       (:68-138, high)
7. not_found fallback                          (:255-262, low)

Text matching normalizes by stripping half/full-width spaces only
(schemas/table_semantic_parser.py:43-45). The reference resolves
first-match by dict-insertion order; Spark needs a total order, so
every tier picks by (y1, x1, id) — documented deviation, identical on
layouts where insertion order is reading order.

Table-field extraction (rule_pipeline.py:265-361): grid columns are
matched to schema columns by cell_id / bbox-overlap>0.5 / normalized
substring of the concatenated column-header text; a grid column maps to
the FIRST matching schema column; a schema column may collect several
grid columns (values concatenated in column order). Header-only rows
are skipped.

Template application (schemas/table_semantic_parser.py:748-794):
template tables are matched to document tables (groups here) by
position argmax (overlap/table_area > 0.5), then template cells
override role/contents by cell_id (or bbox containment fallback).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from yomitoku_spark.operators import spatial as SP


def norm_text(col) -> F.Column:
    """Strip half/full-width spaces (reference normalize,
    schemas/table_semantic_parser.py:43-45)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "[ 　]", "")


def _lit_box(b) -> F.Column:
    return F.struct(
        F.lit(int(b[0])).alias("x1"),
        F.lit(int(b[1])).alias("y1"),
        F.lit(int(b[2])).alias("x2"),
        F.lit(int(b[3])).alias("y2"),
    )


def _boxed(df: DataFrame) -> DataFrame:
    return df.withColumn("box", F.struct("x1", "y1", "x2", "y2"))


@dataclass
class ScalarField:
    name: str
    cell_id: str | None = None
    bbox: tuple | None = None
    description: str | None = None
    merge_values: bool = False
    separator: str = "\n"
    regex: str | None = None


CAND_COLS = ["doc_id", "tier", "o1", "o2", "o3", "value", "source", "confidence"]


def _cand(df: DataFrame, tier: int, o1, o2, o3, value, source: str, conf: str) -> DataFrame:
    return df.select(
        "doc_id",
        F.lit(tier).alias("tier"),
        o1.cast("bigint").alias("o1"),
        o2.cast("bigint").alias("o2"),
        F.lit(o3).alias("o3") if isinstance(o3, str) else o3.alias("o3"),
        value.alias("value"),
        F.lit(source).alias("source"),
        F.lit(conf).alias("confidence"),
    )


def extract_scalar_fields(
    cells: DataFrame,
    kv_items: DataFrame,
    paragraphs: DataFrame,
    words: DataFrame,
    fields: list[ScalarField],
) -> DataFrame:
    """Resolve every field for every document: returns
    (doc_id, field, value, source, confidence)."""
    noncells = _boxed(cells.filter(F.col("role") != "group"))
    paras = _boxed(paragraphs)
    wrds = _boxed(words)
    kv_boxed = kv_items.join(
        noncells.select("doc_id", F.col("cell_id").alias("value_cell"), "x1", "y1"),
        ["doc_id", "value_cell"],
        "left",
    )
    docs = cells.select("doc_id").distinct()

    outs = []
    for f in fields:
        cands = []
        if f.cell_id:
            t1 = noncells.filter(F.col("cell_id") == f.cell_id)
            cands.append(
                _cand(t1, 1, F.col("y1"), F.col("x1"), F.col("cell_id"),
                      F.col("contents"), "cell_id", "high")
            )
        if f.bbox:
            # is_contained(bbox, cell, 0.5): overlap/cell_area > 0.5, strict
            ov = SP.overlap_area("q", "box")
            t2 = noncells.withColumn("q", _lit_box(f.bbox)).filter(
                ov * 2 > SP.box_area("box")
            )
            cands.append(
                _cand(t2, 2, F.col("y1"), F.col("x1"), F.col("cell_id"),
                      F.col("contents"), "bbox", "high")
            )
        if f.description:
            q = norm_text(F.lit(f.description))
            kvm = kv_boxed.filter(norm_text(F.col("key_text")).contains(q))
            if f.merge_values:
                # axis-spread-ordered separator join
                # (table_semantic_parser.py:462-514): sort by y when the
                # value boxes spread at least as far vertically, else by x
                agg = kvm.groupBy("doc_id").agg(
                    (F.max("y1") - F.min("y1") >= F.max("x1") - F.min("x1")).alias("by_y"),
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("y1", "x1", "value_cell", "value_text"))
                            ),
                            lambda s: s["value_text"],
                        ),
                        f.separator,
                    ).alias("vy"),
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("x1", "y1", "value_cell", "value_text"))
                            ),
                            lambda s: s["value_text"],
                        ),
                        f.separator,
                    ).alias("vx"),
                )
                t3 = agg.select(
                    "doc_id",
                    F.when(F.col("by_y"), F.col("vy")).otherwise(F.col("vx")).alias("v"),
                )
                cands.append(
                    _cand(t3, 3, F.lit(0), F.lit(0), F.lit(""), F.col("v"), "kv", "high")
                )
            else:
                cands.append(
                    _cand(kvm, 3, F.col("y1"), F.col("x1"), F.col("value_cell"),
                          F.col("value_text"), "kv", "high")
                )
            t4 = noncells.filter(
                (F.col("contents") != "") & norm_text(F.col("contents")).contains(q)
            )
            cands.append(
                _cand(t4, 4, F.col("y1"), F.col("x1"), F.col("cell_id"),
                      F.col("contents"), "cell_query", "medium")
            )
            t5 = paras.filter(
                (F.col("contents") != "") & norm_text(F.col("contents")).contains(q)
            )
            cands.append(
                _cand(t5, 5, F.col("y1"), F.col("x1"), F.col("par_id"),
                      F.col("contents"), "paragraph", "medium")
            )
        if f.regex:
            m6 = F.regexp_extract("contents", f.regex, 0)
            t6 = noncells.filter((F.col("contents") != "") & (m6 != ""))
            cands.append(
                _cand(t6, 6, F.col("y1"), F.col("x1"), F.col("cell_id"),
                      m6, "regex", "high")
            )
            m7 = F.regexp_extract("contents", f.regex, 0)
            t7 = paras.filter((F.col("contents") != "") & (m7 != ""))
            cands.append(
                _cand(t7, 7, F.col("y1"), F.col("x1"), F.col("par_id"),
                      m7, "regex", "high")
            )
            m8 = F.regexp_extract("content", f.regex, 0)
            t8 = wrds.filter((F.col("content") != "") & (m8 != ""))
            cands.append(
                _cand(t8, 8, F.col("y1"), F.col("x1"), F.col("word_id"),
                      m8, "regex", "high")
            )
        if cands:
            allc = cands[0]
            for c in cands[1:]:
                allc = allc.unionByName(c)
            w = W.partitionBy("doc_id").orderBy("tier", "o1", "o2", "o3")
            best = allc.withColumn("__rk", F.row_number().over(w)).filter(
                F.col("__rk") == 1
            )
            resolved = docs.join(best, "doc_id", "left")
        else:
            resolved = docs.select(
                "doc_id",
                F.lit(None).cast("string").alias("value"),
                F.lit(None).cast("string").alias("source"),
                F.lit(None).cast("string").alias("confidence"),
            )
        outs.append(
            resolved.select(
                "doc_id",
                F.lit(f.name).alias("field"),
                F.coalesce(F.col("value"), F.lit("")).alias("value"),
                F.coalesce(F.col("source"), F.lit("not_found")).alias("source"),
                F.coalesce(F.col("confidence"), F.lit("low")).alias("confidence"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ------------------------------------------------------------- table field


@dataclass
class TableColumn:
    name: str
    cell_id: str | None = None
    bbox: tuple | None = None
    description: str | None = None


def extract_table_field(
    cells: DataFrame,
    grid_headers: DataFrame,
    grid_data: DataFrame,
    columns: list[TableColumn],
) -> DataFrame:
    """Match schema columns to grid columns, then emit one record per
    (document, grid, data row, schema column):
    (doc_id, grid_id, row, col_name, value, cell_ids).

    rule_pipeline.py:265-361 — a grid column goes to the FIRST schema
    column that matches (cell_id equi, else bbox overlap > 0.5, else
    normalized match-key substring of the concatenated header text);
    one schema column may collect several grid columns, concatenated in
    column order; rows made only of header cells are skipped."""
    hdr = grid_headers.join(
        _boxed(cells).select(
            "doc_id", "cell_id", "box", F.col("contents").alias("h_contents")
        ),
        ["doc_id", "cell_id"],
        "left",
    )
    # concatenated header text per grid column (in hdr_pos order)
    col_text = (
        hdr.groupBy("doc_id", "grid_id", "col")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("hdr_pos", "h_contents"))),
                    lambda s: s["h_contents"],
                ),
                "",
            ).alias("header_text")
        )
    )

    matches = []
    for prio, c in enumerate(columns):
        if c.cell_id:
            m = hdr.filter(F.col("cell_id") == c.cell_id)
        elif c.bbox:
            ov = SP.overlap_area("q", "box")
            m = hdr.withColumn("q", _lit_box(c.bbox)).filter(
                ov * 2 > SP.box_area("box")
            )
        else:
            key = c.description if c.description else c.name
            m = col_text.filter(
                norm_text(F.col("header_text")).contains(norm_text(F.lit(key)))
            )
        matches.append(
            m.select(
                "doc_id", "grid_id", "col",
                F.lit(prio).alias("prio"), F.lit(c.name).alias("col_name"),
            )
        )
    allm = matches[0]
    for m in matches[1:]:
        allm = allm.unionByName(m)
    w = W.partitionBy("doc_id", "grid_id", "col").orderBy("prio")
    col_map = (
        allm.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("doc_id", "grid_id", "col", "col_name")
    )

    header_ids = grid_headers.select("doc_id", "grid_id", "cell_id").distinct()
    # skip rows whose non-null ids are all header cells
    data_flagged = grid_data.join(
        header_ids.withColumn("__is_hdr", F.lit(True)),
        ["doc_id", "grid_id", "cell_id"],
        "left",
    )
    row_kind = data_flagged.groupBy("doc_id", "grid_id", "row").agg(
        (F.count(F.lit(1)) > 0).alias("has_cells"),
        F.max(F.when(F.col("__is_hdr").isNull(), 1).otherwise(0)).alias("has_non_hdr"),
    )
    value_rows = row_kind.filter(
        ~F.col("has_cells") | (F.col("has_non_hdr") == 1)
    ).select("doc_id", "grid_id", "row")

    joined = (
        grid_data.join(value_rows, ["doc_id", "grid_id", "row"])
        .join(col_map, ["doc_id", "grid_id", "col"])
        .join(
            cells.select("doc_id", "cell_id", F.col("contents").alias("v")),
            ["doc_id", "cell_id"],
            "left",
        )
    )
    return joined.groupBy("doc_id", "grid_id", "row", "col_name").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("col"), F.coalesce(F.col("v"), F.lit("")).alias("v"))
                    )
                ),
                lambda s: s["v"],
            ),
            "",
        ).alias("value"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("col", "cell_id"))),
                lambda s: s["cell_id"],
            ),
            "/",
        ).alias("cell_ids"),
    )


# --------------------------------------------------------------- template


def apply_template(
    cells: DataFrame,
    template: DataFrame,
    policy: str = "cell_id",
) -> DataFrame:
    """Apply a semantic template: override role/contents of matched
    cells (schemas/table_semantic_parser.py:748-794).

    ``template`` rows: (tbl_x1..tbl_y2 — the template table's box,
    matched to a document 'table' = group cell by position argmax with
    overlap/table_area > 0.5, find_table_by_position :680-692;
    tcell_id / tc_x1..tc_y2 — cell matcher per ``policy``;
    role_override, contents_override — nullable overrides).

    The template is broadcast (it is tiny by construction); matching is
    an equi join on cell_id or a containment pick on bbox — never a
    per-document loop."""
    groups = _boxed(cells.filter(F.col("role") == "group")).select(
        "doc_id", F.col("cell_id").alias("table_id"), F.col("box").alias("tbox")
    )
    noncells = cells.filter(F.col("role") != "group")

    tmpl = template.withColumn(
        "qbox",
        F.struct(
            F.col("tbl_x1").alias("x1"), F.col("tbl_y1").alias("y1"),
            F.col("tbl_x2").alias("x2"), F.col("tbl_y2").alias("y2"),
        ),
    )
    # template table → document table: argmax overlap/table_area, > 0.5
    j = groups.join(F.broadcast(tmpl), SP.overlap_area("qbox", "tbox") * 2 > SP.box_area("tbox"))
    wt = W.partitionBy("doc_id", "tcell_id", "tbl_x1", "tbl_y1").orderBy(
        F.desc(SP.overlap_area("qbox", "tbox").cast("double") / SP.box_area("tbox")),
        F.asc("table_id"),
    )
    placed = (
        j.withColumn("__rk", F.row_number().over(wt))
        .filter(F.col("__rk") == 1)
        .select(
            "doc_id", "table_id", "tcell_id",
            "tc_x1", "tc_y1", "tc_x2", "tc_y2",
            "role_override", "contents_override",
        )
    )

    # cells belong to the group (table) that contains them — same
    # argmax as the KV parser's group matching
    cell_tbl = _boxed(noncells).alias("c").join(
        groups.alias("g"),
        (F.col("c.doc_id") == F.col("g.doc_id"))
        & (SP.overlap_area("g.tbox", "c.box") * 5 > SP.box_area("c.box")),
        "left",
    )
    wg = W.partitionBy("c.doc_id", "c.cell_id").orderBy(
        F.desc(SP.overlap_area("g.tbox", "c.box").cast("double") / SP.box_area("g.tbox")),
        F.asc("g.table_id"),
    )
    cell_tbl = (
        cell_tbl.withColumn("__rk", F.row_number().over(wg))
        .filter(F.col("__rk") == 1)
        .select(
            F.col("c.doc_id").alias("doc_id"),
            F.col("c.cell_id").alias("cell_id"),
            F.col("c.role").alias("role"),
            F.col("c.x1").alias("x1"), F.col("c.y1").alias("y1"),
            F.col("c.x2").alias("x2"), F.col("c.y2").alias("y2"),
            F.col("c.contents").alias("contents"),
            F.col("g.table_id").alias("table_id"),
        )
    )

    if policy == "cell_id":
        on = (
            (F.col("t.tcell_id") == F.col("cell_id"))
            & (F.col("t.doc_id") == F.col("doc_id2"))
            & (F.col("t.table_id") == F.col("table_id2"))
        )
        left = cell_tbl.withColumnRenamed("doc_id", "doc_id2").withColumnRenamed(
            "table_id", "table_id2"
        )
        merged = left.join(F.broadcast(placed.alias("t")), on, "left")
    elif policy == "bbox":
        # containment pick: cell with >0.5 of its area inside the
        # template cell box, first by (y1, x1, cell_id)
        left = cell_tbl.withColumnRenamed("doc_id", "doc_id2").withColumnRenamed(
            "table_id", "table_id2"
        ).withColumn("box", F.struct("x1", "y1", "x2", "y2"))
        tb = placed.withColumn(
            "tcbox",
            F.struct(
                F.col("tc_x1").alias("x1"), F.col("tc_y1").alias("y1"),
                F.col("tc_x2").alias("x2"), F.col("tc_y2").alias("y2"),
            ),
        ).alias("t")
        on = (
            (F.col("t.doc_id") == F.col("doc_id2"))
            & (F.col("t.table_id") == F.col("table_id2"))
            & (SP.overlap_area("t.tcbox", "box") * 2 > SP.box_area("box"))
        )
        j2 = left.join(F.broadcast(tb), on, "left")
        # each template cell claims its FIRST matching cell only
        wb = W.partitionBy("doc_id2", "t.tcell_id", "t.tc_x1", "t.tc_y1").orderBy(
            "y1", "x1", "cell_id"
        )
        j2 = j2.withColumn(
            "__rk",
            F.when(F.col("t.tcell_id").isNull(), F.lit(1)).otherwise(
                F.row_number().over(wb)
            ),
        )
        merged = j2.withColumn(
            "role_override",
            F.when(F.col("__rk") == 1, F.col("t.role_override")),
        ).withColumn(
            "contents_override",
            F.when(F.col("__rk") == 1, F.col("t.contents_override")),
        )
        # a cell matched by several template cells keeps one row
        wdedup = W.partitionBy("doc_id2", "cell_id").orderBy(
            F.col("role_override").isNull() & F.col("contents_override").isNull(),
            "t.tcell_id",
        )
        merged = (
            merged.withColumn("__rk2", F.row_number().over(wdedup))
            .filter(F.col("__rk2") == 1)
        )
    else:
        raise ValueError(f"unknown template policy {policy!r}")

    return merged.select(
        F.col("doc_id2").alias("doc_id"),
        "cell_id",
        F.coalesce(F.col("role_override"), F.col("role")).alias("role"),
        "x1", "y1", "x2", "y2",
        F.coalesce(F.col("contents_override"), F.col("contents")).alias("contents"),
    )
