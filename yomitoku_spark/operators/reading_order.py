"""Vectorized reading-order estimation (engine side).

Semantics modeled on the reference's reading-order module
(/root/reference/src/yomitoku/reading_order.py:123-145 graph build,
:14-82 priority traversal): a "reads-before" DAG over layout boxes —
edge i→j when the boxes overlap horizontally, i lies entirely above j,
and no third x-overlapping box lies between them — then a deterministic
topological sort that always emits the ready node with the smallest
(x1, y1), which walks a left column to its end before starting the
right column.

Unlike the reference's O(n³) Python triple loop, the adjacency and
occlusion tests here are numpy matrix ops: the occlusion condition
"∃k: i→k candidate ∧ k→j candidate" is exactly a boolean matrix product
of the candidate matrix with itself. Per-turn n is O(10²), so this runs
inside a grouped pandas UDF — parallelism is across turns, never within
one (SURVEY.md §1.2).
"""

from __future__ import annotations

import heapq

import numpy as np


def reading_order_numpy(boxes: np.ndarray, direction: str = "top2bottom") -> np.ndarray:
    """Return emit positions: perm[i] gives the index of the block emitted
    i-th, for an (n,4) int array of [x1,y1,x2,y2] boxes.

    Directions (reference reading_order.py:123-198):

    * ``top2bottom`` — edge i→j when the boxes x-overlap and i lies
      entirely above j; ready-node priority (x1, y1).
    * ``right2left`` — vertical-page order: edge from the box with the
      GREATER x2 (read first) to the lesser among y-overlapping boxes;
      priority distance (max_x − x2) + y1 (reference :147-170).
    * ``left2right`` — header/footer rows: edge from lesser x2 to
      greater; priority distance x1 + 5·y1 (reference :173-198).
    """
    n = len(boxes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    x1, y1, x2, y2 = (boxes[:, i].astype(np.int64) for i in range(4))
    if direction == "top2bottom":
        overlap = (np.minimum.outer(x2, x2) - np.maximum.outer(x1, x1)) > 0
        before = y2[:, None] <= y1[None, :]
        prio = [(int(x1[i]), int(y1[i]), i) for i in range(n)]
    elif direction in ("right2left", "left2right"):
        overlap = (np.minimum.outer(y2, y2) - np.maximum.outer(y1, y1)) > 0
        if direction == "right2left":
            before = x2[:, None] > x2[None, :]
            dist = (int(x2.max()) - x2) + y1
        else:
            before = x2[:, None] < x2[None, :]
            dist = x1 + 5 * y1
        prio = [(int(dist[i]), int(y1[i]), int(x1[i]), i) for i in range(n)]
    else:
        raise ValueError(f"unknown reading-order direction {direction!r}")
    cand = overlap & before
    np.fill_diagonal(cand, False)
    # occlusion: drop edge i→j when some k is a candidate-successor of i
    # and candidate-predecessor of j (boolean matrix product)
    occluded = (cand.astype(np.int32) @ cand.astype(np.int32)) > 0
    edges = cand & ~occluded
    indeg = edges.sum(axis=0)
    heap = [prio[i] for i in range(n) if indeg[i] == 0]
    heapq.heapify(heap)
    out: list[int] = []
    indeg = indeg.copy()
    while heap:
        i = heapq.heappop(heap)[-1]
        out.append(i)
        for j in np.nonzero(edges[i])[0]:
            indeg[j] -= 1
            if indeg[j] == 0:
                heapq.heappush(heap, prio[int(j)])
    if len(out) < n:  # cycles impossible (edges strictly order the axis); stay total
        out += sorted(set(range(n)) - set(out))
    return np.asarray(out, dtype=np.int64)
