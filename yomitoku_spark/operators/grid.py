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
    # Intervals join the current line only when they MAJORITY-overlap
    # it (> half the smaller extent): real detector boxes bleed a few
    # pixels into their neighbors, and any-overlap merging collapses
    # adjacent rows of a dense table into one line (observed on the
    # reference's own golden fixtures: 42 true rows -> 31). Clean
    # synthetic grids have gutters, so their behavior is unchanged.
    order = np.argsort(starts, kind="stable")
    lines = []
    cur_s, cur_e = None, None
    for i in order:
        s, e = starts[i], ends[i]
        ov = (cur_e - s) if cur_s is not None else -1
        if cur_s is None or 2 * ov <= min(cur_e - cur_s, e - s):
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
    # row/col lines from alignment-group clustering of the 1-D extents
    # (spanning alignments excluded, merged-only regions synthesized —
    # see _cluster_lines_from_units)
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
    """Grid lines from 1-D alignment groups: intervals that
    near-coincide form a group; a group that majority-covers two or
    more other groups is a SPANNING alignment and is excluded from
    seeding (its uncovered extent, if any, becomes a synthesized
    line). O(n²) over one table's cells — O(10²) per grouped-UDF
    call."""
    n = len(starts)
    # 1. ALIGNMENT GROUPS: union intervals that near-coincide (mutual
    #    overlap ≥ 0.8 of the LARGER extent). Cells of one line share
    #    both endpoints up to detector noise; no global extent statistic
    #    is assumed — genuine unit lines of very different sizes (a
    #    70 px column next to 305 px columns, reference fixture 9)
    #    group correctly, which min/median/percentile thresholds on the
    #    extent distribution cannot do (each fails on some real corpus
    #    or fuzz case).
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        for j in range(i + 1, n):
            ov = min(ends[i], ends[j]) - max(starts[i], starts[j])
            if ov * 5 >= 4 * max(ends[i] - starts[i], ends[j] - starts[j]):
                parent[find(i)] = find(j)
    members: dict[int, list[int]] = {}
    for i in range(n):
        members.setdefault(find(i), []).append(i)
    groups = [
        (int(starts[m].min()), int(ends[m].max()))
        for m in (np.asarray(v) for v in members.values())
    ]
    # 2. SPAN GROUPS: a group that majority-covers (≥ half their
    #    extent) at least TWO other groups is a spanning alignment —
    #    exclude it from line seeding.
    spans, lines = [], []
    for gi, (gs_, ge_) in enumerate(groups):
        covered = 0
        for hj, (hs, he) in enumerate(groups):
            if hj == gi:
                continue
            ov = min(ge_, he) - max(gs_, hs)
            if ov * 2 >= (he - hs):
                covered += 1
        (spans if covered >= 2 else lines).append((gs_, ge_))
    if not lines:  # degenerate: everything spans everything
        lines = groups
        spans = []
    lines.sort()
    lines = np.asarray(lines, dtype=np.int64).reshape(-1, 2)
    med = float(np.median(lines[:, 1] - lines[:, 0]))
    # 3. a span extent NOT covered by any line becomes a line of its
    #    own (a region whose every cell is merged has no unit witness —
    #    the reference's DAG splitting still yields that column);
    #    gutters between covered lines are far below the half-median
    #    floor and never qualify
    gs, ge = [], []
    for s, e in spans:
        cur = s
        for ls, le in lines:  # sorted by start
            if le <= cur or ls >= e:
                continue
            if ls > cur:
                gs.append(cur)
                ge.append(min(ls, e))
            cur = max(cur, le)
        if cur < e:
            gs.append(cur)
            ge.append(e)
    if gs:
        ga, gb = np.asarray(gs, dtype=np.int64), np.asarray(ge, dtype=np.int64)
        keep = (gb - ga) * 2 > med
        if keep.any():
            extra = _cluster_lines(ga[keep], gb[keep])
            lines = np.vstack([lines, extra]) if lines.size else extra
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
