"""Reference kv_items_to_dict parity — the reference's OWN merge test
vectors (tests/test_table_semantic_parser.py:258-366) run through our
DataFrame view (semantic.kv_items_to_dict)."""

from pyspark.sql import functions as F  # noqa: F401

from yomitoku_spark import semantic as SEM

CELLS_SCHEMA = (
    "doc_id bigint, cell_id string, role string, "
    "x1 int, y1 int, x2 int, y2 int, contents string"
)
KV_SCHEMA = "doc_id bigint, key_cells array<string>, value_cell string"


def _run(spark, cells, kv, **kw):
    cdf = spark.createDataFrame([(0, *c) for c in cells], CELLS_SCHEMA)
    kdf = spark.createDataFrame([(0, list(k), v) for k, v in kv], KV_SCHEMA)
    return {
        r.key: r.value for r in SEM.kv_items_to_dict(cdf, kdf, **kw).collect()
    }


def test_merges_keys_and_makes_unique(spark):
    cells = [
        ("k", "header", 0, 0, 10, 10, "契約 番号"),
        ("v", "cell", 10, 0, 20, 10, " 123 "),
        ("k2", "header", 0, 10, 10, 20, "契約番号"),
        ("v2", "cell", 10, 10, 20, 20, "456"),
    ]
    d = _run(spark, cells, [(["k"], "v"), (["k2"], "v2")])
    assert len(d) == 2
    assert all("契約番号" in k for k in d)
    assert set(d.values()) == {"123", "456"}  # safe_contents strips spaces


def test_merge_vertical(spark):
    cells = [
        ("k", "header", 0, 0, 100, 30, "住所"),
        ("v1", "cell", 100, 0, 300, 30, "東京都"),
        ("v2", "cell", 100, 30, 300, 60, "新宿区"),
        ("v3", "cell", 100, 60, 300, 90, "1-2-3"),
    ]
    kv = [(["k"], "v1"), (["k"], "v3"), (["k"], "v2")]
    assert len(_run(spark, cells, kv, merge_values=False)) == 3
    d = _run(spark, cells, kv, merge_values=True)
    assert d == {"住所": "東京都\n新宿区\n1-2-3"}


def test_merge_horizontal_with_separator(spark):
    cells = [
        ("k", "header", 0, 0, 100, 50, "電話番号"),
        ("v1", "cell", 100, 0, 200, 50, "03"),
        ("v2", "cell", 200, 0, 300, 50, "1234"),
        ("v3", "cell", 300, 0, 400, 50, "5678"),
    ]
    kv = [(["k"], "v3"), (["k"], "v1"), (["k"], "v2")]
    d = _run(spark, cells, kv, merge_values=True, separator="-")
    assert d == {"電話番号": "03-1234-5678"}


def test_merge_single_value(spark):
    cells = [
        ("k", "header", 0, 0, 100, 30, "名前"),
        ("v", "cell", 100, 0, 300, 30, "太郎"),
    ]
    assert _run(spark, cells, [(["k"], "v")], merge_values=True) == {"名前": "太郎"}


def test_merge_mixed_keys(spark):
    cells = [
        ("k1", "header", 0, 0, 100, 30, "名前"),
        ("k2", "header", 0, 30, 100, 60, "住所"),
        ("v1", "cell", 100, 0, 300, 30, "太郎"),
        ("v2", "cell", 100, 30, 300, 60, "東京都"),
        ("v3", "cell", 100, 60, 300, 90, "新宿区"),
    ]
    kv = [(["k1"], "v1"), (["k2"], "v2"), (["k2"], "v3")]
    d = _run(spark, cells, kv, merge_values=True)
    assert d == {"名前": "太郎", "住所": "東京都\n新宿区"}


# ------------------------------------------------- grids_to_dict view


def _grid_frames(spark, cells, col_headers, data):
    cdf = spark.createDataFrame(
        [(0, cid, role, 0, 0, 10, 10, c) for cid, role, c in cells],
        CELLS_SCHEMA,
    )
    hdf = spark.createDataFrame(
        [
            (0, "g0", col, pos, cid)
            for col, stack in enumerate(col_headers)
            for pos, cid in enumerate(stack)
        ],
        "doc_id bigint, grid_id string, col int, hdr_pos int, cell_id string",
    )
    ddf = spark.createDataFrame(
        [
            (0, "g0", r, c, cid)
            for r, rowlist in enumerate(data)
            for c, cid in enumerate(rowlist)
        ],
        "doc_id bigint, grid_id string, row int, col int, cell_id string",
    )
    return cdf, hdf, ddf


def test_grids_to_dict_skips_header_cells(spark):
    """Reference test_view_grids_to_dicts_builds_row_dicts_and_skips_
    header_cells (test_table_semantic_parser.py:368-397)."""
    cdf, hdf, ddf = _grid_frames(
        spark,
        cells=[("h1", "header", "項目"), ("h2", "header", "値"),
               ("a", "cell", "AA"), ("b", "cell", "BB")],
        col_headers=[["h1"], ["h2"]],
        data=[["h1", "h2"], ["a", "b"]],
    )
    rows = SEM.grids_to_dict(cdf, hdf, ddf).collect()
    by_row = {}
    for r in rows:
        by_row.setdefault(r.row, {})[r.key] = r.value
    assert by_row == {1: {"項目": "AA", "値": "BB"}}


def test_grids_to_dict_duplicate_cell_in_row(spark):
    """Reference test_view_grids_to_dicts_avoids_duplicate_cell_id_in_
    same_row (:400-424): a cell spanning two columns appears once."""
    cdf, hdf, ddf = _grid_frames(
        spark,
        cells=[("h1", "header", "A"), ("h2", "header", "B"),
               ("x", "cell", "X")],
        col_headers=[["h1"], ["h2"]],
        data=[["x", "x"]],
    )
    rows = SEM.grids_to_dict(cdf, hdf, ddf).collect()
    assert len(rows) == 1
    assert rows[0].value == "X"
