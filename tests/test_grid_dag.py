"""Reference-mode grid parser (operators/grid_dag.py ↔ the
reference's grid_parser.py DAG unit expansion).

The full-strength evidence is tests/test_golden_parity.py (10/10
reference fixtures exact in dag mode); these are the mechanism-level
cases: span splitting into ``__dup`` units, the duplicate-stacked-box
head inflation that separates dag mode from the geometric engine
mode, and distributed == scalar for the applyInPandas wrapper.
"""

from __future__ import annotations

from yomitoku_spark.operators.grid_dag import (
    grid_from_cluster,
    parse_grid_dag,
)


def _c(cid, role, x1, y1, x2, y2):
    return {"id": cid, "role": role, "box": (x1, y1, x2, y2), "contents": cid}


def _grid_2x2(prefix=""):
    # 2 columns x 2 rows of clean unit cells
    return [
        _c(f"{prefix}a", "cell", 0, 20, 50, 40),
        _c(f"{prefix}b", "cell", 50, 20, 100, 40),
        _c(f"{prefix}c", "cell", 0, 40, 50, 60),
        _c(f"{prefix}d", "cell", 50, 40, 100, 60),
    ]


def test_clean_grid_no_expansion():
    g = grid_from_cluster(_grid_2x2())
    assert (g["n_row"], g["n_col"]) == (2, 2)
    assert g["data"] == [["a", "b"], ["c", "d"]]


def test_spanning_header_splits_into_units():
    """A header spanning both columns gets __dup-split per unit column
    (grid_parser.py:316-439) and reappears under BOTH columns of the
    stripped matrix, exactly like the reference's data view."""
    cells = [_c("H", "header", 0, 0, 100, 20)] + _grid_2x2()
    g = grid_from_cluster(cells)
    assert (g["n_row"], g["n_col"]) == (3, 2)
    assert g["data"][0] == ["H", "H"]  # dup suffix stripped
    assert g["data"][1:] == [["a", "b"], ["c", "d"]]
    # both columns carry H as their header stack
    assert g["col_headers"] == [["H"], ["H"]]
    # span assignment (grid_parser.py:527-563): H anchors at (0,0)
    # spanning both unit columns; plain cells are 1x1
    assert g["positions"]["H"] == {"row": 0, "col": 0, "row_span": 1,
                                   "col_span": 2}
    assert g["positions"]["d"] == {"row": 2, "col": 1, "row_span": 1,
                                   "col_span": 1}


def test_duplicate_stacked_boxes_inflate_heads():
    """The fixture-7 mechanism in miniature: a DUPLICATE box (same
    coordinates, second role) is its own DAG node with in-degree 0 in
    neither direction... but a duplicate that no in-edge reaches mints
    an extra head, so the dag-mode shape exceeds the physical line
    count — while the geometric engine mode folds duplicates into one
    unit."""
    cells = _grid_2x2()
    # duplicate of "a": same box, different id/role — mutually NON
    # right/bottom-adjacent with "a" at distance 0? A perfectly
    # stacked duplicate IS adjacent to the same neighbors as "a", and
    # sits in the same R-component; with identical geometry neither
    # duplicate is right-adjacent to the other (x1 equal → both fail
    # the strict ordering), so BOTH are in-degree-0 line heads.
    cells.append(_c("a2", "empty", 0, 20, 50, 40))
    g = grid_from_cluster(cells)
    assert g["n_row"] == 3  # 2 physical rows + 1 duplicate-minted head
    from yomitoku_spark.operators.grid import recover_grid_numpy
    import numpy as np

    phys = recover_grid_numpy(np.asarray([c["box"] for c in cells],
                                         dtype=np.int64))
    assert int((phys[:, 0] + phys[:, 2]).max()) == 2  # geometric: 2 rows


def test_grid_dag_fuzz_invariants():
    """Robustness on arbitrary geometry (hypothesis): the parse must
    terminate (the sweep budget guards degenerate mutual adjacency),
    never emit ids outside the input, and keep positions consistent
    with the matrix. Stacked duplicates may legitimately shadow each
    other in the matrix (set-intersection pick), so ids are checked as
    a subset, not equality."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    coord = st.integers(min_value=0, max_value=120)

    @st.composite
    def boxes(draw):
        n = draw(st.integers(min_value=1, max_value=7))
        out = []
        for i in range(n):
            x1, y1 = draw(coord), draw(coord)
            w = draw(st.integers(min_value=1, max_value=60))
            h = draw(st.integers(min_value=1, max_value=40))
            role = draw(st.sampled_from(["cell", "header", "empty"]))
            out.append(_c(f"n{i}", role, x1, y1, x1 + w, y1 + h))
        return out

    @settings(max_examples=80, deadline=None)
    @given(boxes())
    def run(cells):
        g = grid_from_cluster(cells)
        ids = {c["id"] for c in cells}
        got = {c for row in g["data"] for c in row if c is not None}
        assert got <= ids
        assert g["n_row"] >= 1 and g["n_col"] >= 1
        assert len(g["data"]) == g["n_row"]
        assert all(len(r) == g["n_col"] for r in g["data"])
        for cid, p in g["positions"].items():
            assert g["data"][p["row"]][p["col"]] == cid

    run()


def test_dag_headers_and_data_bridge(spark):
    """dag_headers_and_data emits derive_grid_headers-shaped frames:
    col_headers stacks equal the scalar parse's, and the data frame
    carries the full unit matrix, so semantic.grids_to_dict runs
    unchanged on DAG-mode grids."""
    from yomitoku_spark.operators.grid_dag import dag_headers_and_data
    from yomitoku_spark.semantic import grids_to_dict

    cs = [_c("H", "header", 0, 0, 100, 20)] + _grid_2x2()
    cells = spark.createDataFrame(
        [(3, c["id"], c["role"], *c["box"], c["id"]) for c in cs],
        "doc_id long, cell_id string, role string, x1 int, y1 int, "
        "x2 int, y2 int, contents string")
    headers, data = dag_headers_and_data(cells, lambda recs: [recs])
    want = grid_from_cluster(cs)
    got_stacks: dict = {}
    for r in headers.collect():
        assert r.grid_id == "g0"
        got_stacks.setdefault(r.col, []).append((r.hdr_pos, r.cell_id))
    stacks = [
        [cid for _, cid in sorted(got_stacks.get(ci, []))]
        for ci in range(want["n_col"])
    ]
    assert stacks == want["col_headers"]
    mat = {(r.row, r.col): r.cell_id for r in data.collect()}
    for ri, row in enumerate(want["data"]):
        for ci, cid in enumerate(row):
            if cid is not None:
                assert mat[(ri, ci)] == cid
    # the semantic consumer runs unchanged: one dict row per data
    # position under the H-stack keys
    rows = grids_to_dict(cells, headers, data).collect()
    # both columns share key "H" → make_unique occurrence suffixes
    assert {(r.row, r.key, r.value) for r in rows} == {
        (1, "H_0", "a"), (1, "H_1", "b"), (2, "H_0", "c"), (2, "H_1", "d")}


def test_parse_grid_dag_distributed_equals_scalar(spark):
    docs = {0: _grid_2x2(), 1: [_c("H", "header", 0, 0, 100, 20)] + _grid_2x2("x")}
    rows = [(d, c["id"], c["role"], *c["box"], c["contents"])
            for d, cs in docs.items() for c in cs]
    cells = spark.createDataFrame(
        rows, "doc_id long, cell_id string, role string, x1 int, y1 int, "
              "x2 int, y2 int, contents string")
    out = parse_grid_dag(cells, lambda recs: [recs]).collect()
    for d, cs in docs.items():
        want = grid_from_cluster(cs)
        got = [r for r in out if r.doc_id == d]
        assert {(r.n_row, r.n_col) for r in got} == {
            (want["n_row"], want["n_col"])}
        mat = {(r.row, r.col): r.cell_id for r in got}
        for ri, row in enumerate(want["data"]):
            for ci, cid in enumerate(row):
                if cid is not None:
                    assert mat[(ri, ci)] == cid
