"""Connected components / union-find (§2.6).

The reference clusters cells into grid vs KV regions with
networkx weakly_connected_components (table_semantic_parser.py:187,
kv_parser.py:305) and merges header columns with a UnionFind
(utils/union_find.py:1-49) — always WITHIN one page. The Spark
disposition (SURVEY §2.6): per-group union-find inside a grouped
pandas UDF, because components never span turns; a cross-row global
algorithm (GraphFrames / iterative hash-min) is deliberately not
needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


class UnionFind:
    """Path-compressed union-find over arbitrary hashable ids."""

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        if p != x:
            p = self.parent[x] = self.find(p)
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic root: keep the smaller id
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def connected_components(
    edges: DataFrame, group_cols: list[str], src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-group weakly-connected components over an edges DataFrame.
    Returns (group_cols..., node, component) where component is the
    smallest node id in the component (deterministic labeling)."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        uf = UnionFind()
        for a, b in zip(pdf[src], pdf[dst]):
            uf.union(a, b)
        nodes = sorted(set(pdf[src]) | set(pdf[dst]))
        comp = [uf.find(n) for n in nodes]
        base = {c: pdf.iloc[0][c] for c in group_cols}
        out = pd.DataFrame({**base, "node": nodes, "component": comp})
        return out

    by_name = {f.name: f.dataType.simpleString() for f in edges.schema.fields}
    gtypes = ", ".join(f"{c} {by_name[c]}" for c in group_cols)
    return edges.groupBy(*group_cols).applyInPandas(
        per_group, schema=f"{gtypes}, node bigint, component bigint"
    )
