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


# ---------------------------------------------------- property fuzz


from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st


def _kv_dict_scalar(cells, kv, merge_values, separator):
    """Independent scalar referee: direct port of the reference view
    semantics (kv_items_to_dict :462-514 + make_unique_all :26-40),
    with the documented deterministic occurrence order (y1, x1,
    value_cell)."""
    safe = {c[0]: (c[6] or "").replace(" ", "").replace("　", "") for c in cells}
    pos = {c[0]: (c[3], c[2]) for c in cells}  # (y1, x1) — cells rows are (id, role, x1, y1, ...)
    items = []
    for keys, v in kv:
        key_str = "_".join(safe.get(k, "") for k in keys)
        y, x = pos.get(v, (0, 0))
        items.append((key_str, safe.get(v, ""), y, x, v))
    out = {}
    if not merge_values:
        by_key = defaultdict(list)
        for it in sorted(items, key=lambda t: (t[2], t[3], t[4])):
            by_key[it[0]].append(it)
        for k, lst in by_key.items():
            if len(lst) == 1:
                out[k] = lst[0][1]
            else:
                for i, it in enumerate(lst):
                    out[f"{k}_{i}"] = it[1]
        return out
    by_key = defaultdict(list)
    for it in items:
        by_key[it[0]].append(it)
    for k, lst in by_key.items():
        if len(lst) == 1:
            out[k] = lst[0][1]
        else:
            ys = [t[2] for t in lst]
            xs = [t[3] for t in lst]
            if max(ys) - min(ys) >= max(xs) - min(xs):
                lst.sort(key=lambda t: (t[2], t[3], t[4]))
            else:
                lst.sort(key=lambda t: (t[3], t[2], t[4]))
            out[k] = separator.join(t[1] for t in lst)
    return out


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_kv_dict_view_fuzz(spark, data):
    """kv_items_to_dict == the scalar referee on random geometry,
    contents (with spaces), duplicate keys, and shared key texts."""
    n_cells = data.draw(st.integers(2, 8))
    texts = st.text(alphabet="ab 契", min_size=0, max_size=4)
    cells = []
    for i in range(n_cells):
        x1 = data.draw(st.integers(0, 300))
        y1 = data.draw(st.integers(0, 300))
        cells.append(
            (f"c{i}", "cell", x1, y1, x1 + 40, y1 + 20, data.draw(texts))
        )
    ids = [c[0] for c in cells]
    n_items = data.draw(st.integers(1, 6))
    used_values = set()
    kv = []
    for _ in range(n_items):
        v = data.draw(st.sampled_from(ids))
        if v in used_values:  # parser invariant: one item per value cell
            continue
        used_values.add(v)
        keys = data.draw(st.lists(st.sampled_from(ids), min_size=1, max_size=2))
        kv.append((keys, v))
    if not kv:
        return
    merge = data.draw(st.booleans())
    sep = data.draw(st.sampled_from(["\n", "-", ""]))
    got = _run(spark, cells, kv, merge_values=merge, separator=sep)
    exp = _kv_dict_scalar(
        [(c[0], c[1], c[2], c[3], c[4], c[5], c[6]) for c in cells],
        kv, merge, sep,
    )
    assert got == exp, (got, exp, cells, kv, merge, sep)


def _grids_dict_scalar(cells, col_headers, data):
    """Scalar referee for grids_to_dict (reference :516-549): skip
    own-column header cells, join header-stack contents per column,
    first-column occurrence per duplicate cell id, duplicate-key
    occurrence suffixes in column order."""
    safe = {cid: (c or "").replace(" ", "").replace("　", "") for cid, _, c in cells}
    out = []
    for r, rowlist in enumerate(data):
        picked = []
        seen = set()
        for c, cid in enumerate(rowlist):
            stack = col_headers[c] if c < len(col_headers) else []
            if cid in stack or cid in seen:
                continue
            seen.add(cid)
            key = "_".join(safe.get(h, "") for h in stack)
            picked.append((c, key, safe.get(cid, "")))
        counts = defaultdict(int)
        for _, k, _v in picked:
            counts[k] += 1
        idx = defaultdict(int)
        for c, k, v in picked:
            kk = f"{k}_{idx[k]}" if counts[k] > 1 else k
            idx[k] += 1
            out.append((r, kk, v))
    return sorted(out)


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_grids_to_dict_fuzz(spark, data):
    """grids_to_dict == the scalar referee on random header stacks,
    spanning (repeated) cells, and stray headers inside data rows."""
    n_cols = data.draw(st.integers(1, 4))
    n_rows = data.draw(st.integers(1, 4))
    texts = st.text(alphabet="xy 値", min_size=0, max_size=3)
    hdr_ids = [f"h{c}{p}" for c in range(n_cols) for p in range(2)]
    cell_ids = [f"d{i}" for i in range(n_rows * n_cols)]
    cells = [(cid, "header", data.draw(texts)) for cid in hdr_ids] + [
        (cid, "cell", data.draw(texts)) for cid in cell_ids
    ]
    col_headers = []
    for c in range(n_cols):
        k = data.draw(st.integers(0, 2))
        col_headers.append([f"h{c}{p}" for p in range(k)])
    grid = []
    for r in range(n_rows):
        row = []
        for c in range(n_cols):
            # mix: own data cell, a repeat of the previous column's cell
            # (span), or a header id planted in a data row
            pick = data.draw(st.integers(0, 5))
            if pick == 0 and row:
                row.append(row[-1])
            elif pick == 1:
                row.append(data.draw(st.sampled_from(hdr_ids)))
            else:
                row.append(f"d{r * n_cols + c}")
        grid.append(row)
    cdf, hdf, ddf = _grid_frames(
        spark,
        cells=cells,
        col_headers=col_headers,
        data=grid,
    )
    got = sorted((r.row, r.key, r.value) for r in SEM.grids_to_dict(cdf, hdf, ddf).collect())
    exp = _grids_dict_scalar(cells, col_headers, grid)
    assert got == exp, (got, exp, cells, col_headers, grid)


# ------------------------------------------------- semantic file sinks
# Reference TableSemanticContentsExport golden vectors
# (test_table_semantic_parser.py:425-510)


def test_export_to_json_writes_kv_and_grids(spark, tmp_path):
    """Reference test_export_to_json_writes_kv_and_grids (:425-445)."""
    import json

    cdf = spark.createDataFrame(
        [(0, "k", "header", 0, 0, 10, 10, "Key"),
         (0, "v", "cell", 10, 0, 20, 10, "Val"),
         (0, "h", "header", 0, 0, 10, 10, "H"),
         (0, "c", "cell", 0, 10, 10, 20, "C")],
        CELLS_SCHEMA,
    )
    kdf = spark.createDataFrame([(0, ["k"], "v")], KV_SCHEMA)
    _, hdf, ddf = _grid_frames(
        spark, cells=[("h", "header", "H"), ("c", "cell", "C")],
        col_headers=[["h"]], data=[["c"]],
    )
    out = tmp_path / "out" / "table.json"
    obj = SEM.semantic_to_json(cdf, kdf, hdf, ddf, str(out))
    data = json.loads(out.read_text(encoding="utf-8"))
    assert data == obj
    assert isinstance(data["kv_items"], dict)
    assert isinstance(data["grids"], list)
    assert data["kv_items"] == {"Key": "Val"}
    assert data["grids"] == [{"id": "g0", "rows": [{"H": "C"}]}]


def test_export_kv_items_to_json_writes_dict(spark, tmp_path):
    """Reference test_export_kv_items_to_json_writes_dict (:446-461)."""
    import json

    cdf = spark.createDataFrame(
        [(0, "k", "header", 0, 0, 10, 10, "Key"),
         (0, "v", "cell", 10, 0, 20, 10, "Val")],
        CELLS_SCHEMA,
    )
    kdf = spark.createDataFrame([(0, ["k"], "v")], KV_SCHEMA)
    out = tmp_path / "kv" / "kv.json"
    obj = SEM.kv_items_to_json(cdf, kdf, str(out))
    assert obj == {"Key": "Val"}
    assert json.loads(out.read_text(encoding="utf-8")) == {"Key": "Val"}


def test_export_grids_to_json_writes_list(spark, tmp_path):
    """Reference test_export_grids_to_json_writes_list (:464-480)."""
    import json

    cdf, hdf, ddf = _grid_frames(
        spark, cells=[("h", "header", "H"), ("c", "cell", "C")],
        col_headers=[["h"]], data=[["c"]],
    )
    out = tmp_path / "grids" / "grids.json"
    obj = SEM.grids_to_json(cdf, hdf, ddf, str(out))
    data = json.loads(out.read_text(encoding="utf-8"))
    assert isinstance(data, list)
    assert data[0]["id"] == "g0"
    assert data == obj


def test_export_grids_to_csv_writes_csv_files(spark, tmp_path):
    """Reference test_export_grids_to_csv_writes_csv_files (:483-510):
    cell text space-stripped ('1 2' -> '12'), one file per grid."""
    cdf, hdf, ddf = _grid_frames(
        spark,
        cells=[("h1", "header", "A"), ("h2", "header", "B"),
               ("a", "cell", "1 2"), ("b", "cell", "3")],
        col_headers=[["h1"], ["h2"]],
        data=[["a", "b"]],
    )
    out = tmp_path / "csv" / "out.csv"
    csvs = SEM.grids_to_csv(cdf, ddf, str(out), ignore_space=True)
    assert csvs == [[["12", "3"]]]
    f = tmp_path / "csv" / "out_g0.csv"
    assert f.exists()
    assert f.read_text(encoding="utf-8").strip() == "12,3"


def test_filter_grid_columns_by_header_substring(spark, tmp_path):
    """Reference filter_columns_ignore_space via grids_to_csv(columns=)
    (table_semantic_parser.py:319-377): keep only columns whose
    space-stripped header text contains a space-stripped query."""
    cdf, hdf, ddf = _grid_frames(
        spark,
        cells=[("h1", "header", "品 名"), ("h2", "header", "金 額"),
               ("a", "cell", "apple"), ("b", "cell", "100")],
        col_headers=[["h1"], ["h2"]],
        data=[["a", "b"]],
    )
    hk, dk = SEM.filter_grid_columns(cdf, hdf, ddf, ["金額"])
    assert [r.col for r in hk.collect()] == [1]
    assert [(r.col, r.cell_id) for r in dk.collect()] == [(1, "b")]
    csvs = SEM.grids_to_csv(cdf, ddf, str(tmp_path / "f.csv"),
                            headers=hdf, columns=["金額"])
    assert csvs == [[["100"]]]
    # no match -> no columns, no files
    hk2, dk2 = SEM.filter_grid_columns(cdf, hdf, ddf, ["zzz"])
    assert hk2.count() == 0 and dk2.count() == 0


def test_export_grids_to_json_header_only_grid_listed(spark, tmp_path):
    """A grid whose cells are ALL headers (no data rows) must still
    appear as {"id", "rows": []} — the reference appends every grid
    (r5 advice: the grid universe unions headers AND data)."""
    import json

    cdf = spark.createDataFrame(
        [(0, "h1", "header", 0, 0, 10, 10, "A"),
         (0, "h2", "header", 10, 0, 20, 10, "B")],
        CELLS_SCHEMA,
    )
    hdf = spark.createDataFrame(
        [(0, "gH", 0, 0, "h1"), (0, "gH", 1, 0, "h2")],
        "doc_id bigint, grid_id string, col int, hdr_pos int, cell_id string",
    )
    ddf = spark.createDataFrame(
        [], "doc_id bigint, grid_id string, row int, col int, cell_id string"
    )
    out = tmp_path / "hdr_only.json"
    obj = SEM.grids_to_json(cdf, hdf, ddf, str(out))
    assert obj == [{"id": "gH", "rows": []}]
    assert json.loads(out.read_text(encoding="utf-8")) == obj


def test_export_grids_to_json_empty_is_list(spark, tmp_path):
    """Zero grids must still write the documented [] list shape (r5
    code-review finding: _per_doc of an empty map returned {})."""
    import json

    cdf = spark.createDataFrame([], CELLS_SCHEMA)
    hdf = spark.createDataFrame(
        [], "doc_id bigint, grid_id string, col int, hdr_pos int, cell_id string"
    )
    ddf = spark.createDataFrame(
        [], "doc_id bigint, grid_id string, row int, col int, cell_id string"
    )
    out = tmp_path / "empty.json"
    obj = SEM.grids_to_json(cdf, hdf, ddf, str(out))
    assert obj == []
    assert json.loads(out.read_text(encoding="utf-8")) == []


def test_search_cells_by_bbox(spark):
    """Reference test_search_cells_by_bbox_* vectors
    (test_table_semantic_parser.py:122-155), with real geometry instead
    of the reference's monkeypatched is_contained: groups are skipped
    even when fully contained, and only >=50%-contained cells match."""
    cdf = spark.createDataFrame(
        [(0, "g", "group", 0, 0, 100, 100, ""),
         (0, "c", "cell", 0, 0, 100, 100, ""),
         (0, "c1", "cell", 0, 0, 10, 10, ""),
         (0, "c2", "cell", 10, 0, 20, 10, ""),
         (0, "half", "cell", 15, 0, 25, 10, "")],
        CELLS_SCHEMA,
    )
    got = sorted(r.cell_id for r in SEM.search_cells_by_bbox(cdf, [0, 0, 100, 100]).collect())
    assert got == ["c", "c1", "c2", "half"]  # group skipped
    got = sorted(r.cell_id for r in SEM.search_cells_by_bbox(cdf, [10, 0, 20, 10]).collect())
    assert got == ["c2", "half"]  # 'half' is exactly 50% contained -> kept
    got = sorted(r.cell_id for r in SEM.search_cells_by_bbox(cdf, [16, 0, 20, 10]).collect())
    assert got == []  # 'half' now only 40% contained


def test_search_cells_by_query_vectors(spark):
    """Reference test_search_cells_by_query_matches_ignore_spaces_and_
    skips_group (test_table_semantic_parser.py:157-168): space-stripped
    substring match, groups and null-content cells excluded."""
    cdf = spark.createDataFrame(
        [(0, "g", "group", 0, 0, 10, 10, "契約番号"),
         (0, "c1", "cell", 0, 0, 10, 10, "契約 番号"),
         (0, "c2", "cell", 0, 0, 10, 10, "担当者"),
         (0, "c3", "cell", 0, 0, 10, 10, None)],
        CELLS_SCHEMA,
    )
    got = [r.cell_id for r in SEM.search_cells_by_query(cdf, "契約番号").collect()]
    assert got == ["c1"]
