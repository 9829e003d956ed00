"""Geometric table-grid recovery from cell boxes.

Re-expression of the reference's table-structure recognizer
(/root/reference/src/yomitoku/table_structure_recognizer.py):

* row/col line construction from box extents — the row×col cross that
  yields unit cells (`extract_cells` :27-46);
* span folding — a box that covers several lines becomes one spanning
  cell with row/col = first line, span = line count (:49-85);
* grid matrix + per-cell extents (grid_parser.py:526-608).

Cells of one table are O(10²), so recovery runs per-table inside a
grouped pandas UDF (SURVEY §2/§4 disposition); across tables it is
embarrassingly parallel. Line clustering is 1-D interval merging over
the sorted extents (the reference clusters detector line boxes; our
input is cell boxes directly, same recovered structure).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

GRID_SCHEMA = (
    "conv_id string, turn_idx int, table_id int, cell_id int, "
    "row int, col int, row_span int, col_span int"
)


def _cluster_lines(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Merge overlapping 1-D intervals into lines; return (k, 2) array of
    line [start, end) boundaries, sorted."""
    order = np.argsort(starts, kind="stable")
    lines = []
    cur_s, cur_e = None, None
    for i in order:
        s, e = starts[i], ends[i]
        if cur_s is None or s >= cur_e:  # no overlap → new line
            if cur_s is not None:
                lines.append((cur_s, cur_e))
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_s is not None:
        lines.append((cur_s, cur_e))
    return np.asarray(lines, dtype=np.int64).reshape(-1, 2)


def recover_grid_numpy(boxes: np.ndarray) -> np.ndarray:
    """(n,4) [x1,y1,x2,y2] cell boxes → (n,4) [row, col, row_span,
    col_span]. A cell spans every row/col line its box overlaps by more
    than half the line's thickness (reference span absorption:
    row = min overlapped line, span = count)."""
    n = len(boxes)
    if n == 0:
        return np.empty((0, 4), dtype=np.int64)
    x1, y1, x2, y2 = (boxes[:, i].astype(np.int64) for i in range(4))
    # row lines from y-extents of cells that are "unit height" seeds:
    # cluster ALL y intervals; spanning cells merge lines, so instead
    # cluster by midlines of the smallest cells: use interval clustering
    # over [y1, y2) of cells with minimal height per overlap chain.
    rows = _cluster_lines_from_units(y1, y2)
    cols = _cluster_lines_from_units(x1, x2)

    def assign(starts, ends, lines):
        r0 = np.empty(n, dtype=np.int64)
        span = np.empty(n, dtype=np.int64)
        for i in range(n):
            ls, le = lines[:, 0], lines[:, 1]
            ov = np.minimum(ends[i], le) - np.maximum(starts[i], ls)
            hit = ov > (le - ls) * 0.5
            idx = np.nonzero(hit)[0]
            if len(idx) == 0:  # degenerate: nearest line
                idx = np.array([np.argmin(np.abs(ls - starts[i]))])
            r0[i] = idx[0]
            span[i] = idx[-1] - idx[0] + 1
        return r0, span

    row, row_span = assign(y1, y2, rows)
    col, col_span = assign(x1, x2, cols)
    return np.stack([row, col, row_span, col_span], axis=1)


def _cluster_lines_from_units(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Grid lines = interval clusters of the SMALLEST cells along the
    axis: a spanning cell's interval would merge several lines, so seed
    clustering with cells of (near-)minimal extent and only then place
    the rest."""
    extent = ends - starts
    unit = extent <= extent.min() * 1.5
    lines = _cluster_lines(starts[unit], ends[unit])
    # any cell wholly outside every line (e.g. all cells span) adds its own
    for s, e in zip(starts[~unit], ends[~unit]):
        ov = np.minimum(e, lines[:, 1]) - np.maximum(s, lines[:, 0])
        if not (ov > 0).any():
            lines = np.vstack([lines, [s, e]])
    order = np.argsort(lines[:, 0], kind="stable")
    return lines[order]


def recover_grids(cells: DataFrame) -> DataFrame:
    """cells(conv_id, turn_idx, table_id, cell_id, x1, y1, x2, y2) →
    grid assignment per cell (grouped per table)."""

    def per_table(pdf: pd.DataFrame) -> pd.DataFrame:
        boxes = pdf[["x1", "y1", "x2", "y2"]].to_numpy()
        g = recover_grid_numpy(boxes)
        return pd.DataFrame(
            {
                "conv_id": pdf["conv_id"],
                "turn_idx": pdf["turn_idx"],
                "table_id": pdf["table_id"],
                "cell_id": pdf["cell_id"],
                "row": g[:, 0].astype("int32"),
                "col": g[:, 1].astype("int32"),
                "row_span": g[:, 2].astype("int32"),
                "col_span": g[:, 3].astype("int32"),
            }
        )

    return cells.groupBy("conv_id", "turn_idx", "table_id").applyInPandas(
        per_table, schema=GRID_SCHEMA
    )
