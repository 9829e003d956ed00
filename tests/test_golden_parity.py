"""Parity against the REFERENCE'S OWN golden test corpus.

The reference proves its relational core with 10 real detector-output
fixtures compared to goldens on order-insensitive metrics (n_tables,
per-table n_grids / n_kv_items / grid-shape Counter) —
tests/test_table_semantic_from_json.py:55-148. tools/golden_parity.py
re-creates that seam against OUR operators (scalar adjacency twins for
the cluster edge family, is_grid_cluster dispatch, geometric grid
recovery, KV-graph parser).

Pinned result: in REFERENCE (dag) mode — operators/grid_dag.py, the
reference's own adjacency-DAG unit expansion — **10/10 fixtures match
the goldens exactly**. In the engine's default geometric mode, 9/10
match and fixture 7 carries the pinned head-count delta below (the
two modes differ only on degenerate duplicate-box input). Fixture 7
matches on table count, cluster decomposition, grid/KV dispatch, and
the two smaller grid shapes; its largest (noisiest) grid differs in
shape — ours (26,8) vs the reference's (30,10). ROOT CAUSE (pinned by
test_fixture7_divergence_root_cause below): the detector emitted
DUPLICATE stacked boxes — an `empty` and a `header` both at
[164,490,221,523] and again at [221,490,294,523]. The reference sizes
the grid by counting DAG line heads (grid_parser.py:470-491
_cluster_heads_by_in_degree; rows/cols = heads of the unit-expanded
DAG, :570-608), and each duplicate box is a separate node with
in-degree 0, so each mints an extra head: simulating the reference's
head count on this cluster's raw DAG yields EXACTLY its golden
n_col=10 (8 physical columns + the 2 duplicate-box heads); the row
inflation 26→30 is the same mechanism after `__dup` unit expansion.
Our geometric recovery clusters the physical lines, so the duplicate
boxes land in the same unit — (26,8) is the deduplicated physical
grid. Documented input-degeneracy difference, not a regression — this
test fails if parity drops below the pinned level or the delta moves.

Fixtures are read from /root/reference IN PLACE; skipped when absent.
"""

import os

import pytest

REF = "/root/reference/tests/data/table_semantic_inputs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available"
)


def test_reference_golden_fixtures_dag_mode_all_ten():
    """REFERENCE MODE (since r6): grid shapes from the adjacency-DAG
    unit expansion + head count (operators/grid_dag.py — the
    reference's own algorithm, grid_parser.py:442-608) match the
    goldens on ALL TEN fixtures exactly, INCLUDING fixture 7's
    duplicate-box head inflation. The goldens were produced by this
    algorithm, so full parity is the acceptance bar."""
    from tools.golden_parity import compare_fixture

    results = [compare_fixture(i, mode="dag") for i in range(10)]
    assert all(r["n_tables_match"] for r in results)
    assert [r["fixture"] for r in results if r["full_match"]] == list(range(10))


def test_reference_golden_grid_data_cell_exact():
    """Beyond shapes: every golden grid's FULL unit data matrix and
    per-column header stacks match the dag-mode parse cell for cell
    (keyed by (box, contents) — the goldens renumber ids). 9 golden
    grids exist across the 10 fixtures; all 9 must match on both."""
    from tools.golden_parity import grid_data_parity

    gp = grid_data_parity()
    assert gp["total"] == 9
    assert gp["data_ok"] == 9, gp
    assert gp["headers_ok"] == 9, gp


def test_reference_golden_kv_counts_per_table():
    """Every table's kv_items COUNT matches its golden (tables matched
    by cell-box multiset). Counts, not structures, are the bar: the
    goldens' key chains predate the current kv_parser's group-gated
    header→header edges (evidence + citations in
    tools/golden_parity.kv_count_parity), and the reference's own
    harness compares counts only."""
    from tools.golden_parity import kv_count_parity

    kp = kv_count_parity()
    assert kp["total"] == 14
    assert kp["ok"] == 14, kp


def test_reference_golden_fixtures():
    from tools.golden_parity import compare_fixture

    results = [compare_fixture(i) for i in range(10)]
    assert all(r["n_tables_match"] for r in results)
    full = [r["fixture"] for r in results if r["full_match"]]
    assert set(full) >= {0, 1, 2, 3, 4, 5, 6, 8, 9}, full

    # fixture 7: everything but the largest grid's shape must match
    r7 = next(r for r in results if r["fixture"] == 7)
    got, exp = r7["got"], r7["exp"]
    assert len(got) == len(exp)  # same cluster decomposition
    assert [g[:2] for g in got] == [e[:2] for e in exp]  # grid/kv dispatch
    assert got[:2] == exp[:2]  # the two clean grids match exactly
    # the exact pinned delta: physical 26x8 vs head-inflated 30x10
    assert got[2][2] == (((26, 8), 1),)
    assert exp[2][2] == (((30, 10), 1),)


def test_fixture7_divergence_root_cause():
    """Evidence for the pinned fixture-7 delta: (a) the divergent
    cluster contains duplicate stacked boxes (same coordinates, two
    roles); (b) simulating the reference's head-count column sizing
    (_cluster_heads_by_in_degree over the soft-adjacency DAG,
    grid_parser.py:470-491) on that cluster yields exactly the golden
    n_col = 10, where the physical distinct column count is 8."""
    import json
    from collections import Counter

    from tools.golden_parity import REF_IN, _split_roles, cluster_table, is_grid_cluster, grid_shape
    from yomitoku_spark.operators.adjacency import (
        bottom_adjacent_scalar,
        right_adjacent_scalar,
    )

    tables = json.load(open(f"{REF_IN}/debug_table_raw_7.json"))
    target = None
    for t in tables:
        cells = [
            {"id": c["id"], "role": c["role"],
             "box": tuple(int(v) for v in c["box"]),
             "contents": c.get("contents") or ""}
            for c in t["cells"]
        ]
        for cl in cluster_table(_split_roles(cells)):
            if is_grid_cluster(cl) and grid_shape(cl) == (26, 8):
                target = cl["cell"] + cl["empty"] + cl["header"]
    assert target is not None
    # (a) duplicate stacked boxes with different roles
    by_box = Counter(c["box"] for c in target)
    dups = {b for b, n in by_box.items() if n > 1}
    assert (164, 490, 221, 523) in dups and (221, 490, 294, 523) in dups
    # (b) reference-style column heads == golden n_col == 10
    ids = [c["id"] for c in target]
    down = {}
    indeg = {i: 0 for i in ids}
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in target:
        for b in target:
            if a["id"] != b["id"] and bottom_adjacent_scalar(
                a["box"], b["box"], rule="soft"
            ):
                parent[find(a["id"])] = find(b["id"])
                indeg[b["id"]] += 1
    comps: dict = {}
    for i in ids:
        comps.setdefault(find(i), []).append(i)
    heads = 0
    for comp in comps.values():
        cand = [n for n in comp if indeg[n] == 0]
        heads += len(cand) if cand else 1
    assert heads == 10
