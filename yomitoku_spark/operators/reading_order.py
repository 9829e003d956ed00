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


def reading_order_numpy(boxes: np.ndarray) -> np.ndarray:
    """Return emit positions: perm[i] gives the index of the block emitted
    i-th, for an (n,4) int array of [x1,y1,x2,y2] boxes."""
    n = len(boxes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    x1, y1, x2, y2 = (boxes[:, i].astype(np.int64) for i in range(4))
    x_overlap = (np.minimum.outer(x2, x2) - np.maximum.outer(x1, x1)) > 0
    above = y2[:, None] <= y1[None, :]
    cand = x_overlap & above
    np.fill_diagonal(cand, False)
    # occlusion: drop edge i→j when some k is a candidate-successor of i
    # and candidate-predecessor of j (boolean matrix product)
    occluded = (cand.astype(np.int32) @ cand.astype(np.int32)) > 0
    edges = cand & ~occluded
    indeg = edges.sum(axis=0)
    heap = [(int(x1[i]), int(y1[i]), i) for i in range(n) if indeg[i] == 0]
    heapq.heapify(heap)
    out: list[int] = []
    indeg = indeg.copy()
    while heap:
        _, _, i = heapq.heappop(heap)
        out.append(i)
        for j in np.nonzero(edges[i])[0]:
            indeg[j] -= 1
            if indeg[j] == 0:
                heapq.heappush(heap, (int(x1[j]), int(y1[j]), int(j)))
    if len(out) < n:  # cycles impossible (edges strictly increase y); stay total
        out += sorted(set(range(n)) - set(out))
    return np.asarray(out, dtype=np.int64)
