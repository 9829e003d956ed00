"""Driver-contract registry integrity."""

import __spark_entry__ as entrymod


def test_every_oracle_has_a_query():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert set(osql) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())


def test_rows_only_queries_documented():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    rows_only = set(qs) - set(osql)
    # the ONLY rows-only entry left: the datagen full mix (layout
    # reading-order is graph-valued; correctness comes from the pytest
    # engine==oracle byte-equality gate + scaling checksum).
    # multimodal_features graduated in r6: the stdlib BMP/WAV decode
    # path carries a closed-form DuckDB referee. Everything else has a
    # DuckDB SQL referee over the parquet tables.
    assert rows_only == {"extract_transcripts_mix"}


def test_driver_window_boundary_matches_rotation_comment():
    """The driver snapshots the FIRST 50 registry entries. The QUERIES
    dict's section comments claim exactly which rows sit inside that
    window — pin the boundary so adding a query without re-running the
    rotation can't silently push a flagship row out of the artifact
    (the r5 code-review finding)."""
    names = list(entrymod.queries())
    window, tail = names[:50], names[50:]
    # every tail row must be oracle-backed or one of the two pinned
    # rows-only entries (the tail gate can't check a rows-only entry's
    # values) — and the two rows-only entries must sit IN the window
    assert "extract_transcripts_mix" in window
    assert "multimodal_features" in window
    # flagship/composed rows never rotate out
    for must in ("extract_transcripts", "extract_transcripts_staged",
                 "segment_features", "extract_fields_kv",
                 "corpus_build", "corpus_build_full",
                 "training_set_selection", "export_formats"):
        assert must in window, must
    # r6 FINAL rotation: the 15 very-late never-driver-checked rows
    # lead the window, the 19 earlier-r6 rows follow, multimodal_plan
    # anchors the boundary, and the first tail rows are the evicted
    # r4+r5-green pair
    assert window[0] == "cmsketch_token_counts"
    assert window[14] == "doc_scrub_spans"
    assert window[15] == "containment_near_pairs"
    assert window[16] == "bm25_retrieval_topk"
    assert window[34] == "pack_chunks"
    assert window[-1] == "multimodal_plan", window[-1]
    assert tail[0] == "ann_multiprobe_topk", tail[0]
    assert tail[1] == "argmax_join", tail[1]
    # out their SECOND consecutive round — the policy cap; the r7
    # rotation MUST return these four to the window
    for capped in ("asof_join", "rollup_revenue", "content_concat",
                   "argmax_join"):
        assert capped in tail, capped
    # at-limit rows that returned after one tail round
    for returned in ("ivf_lloyd_topk", "containment_join",
                     "dedup_contained_boxes", "connected_components_labels"):
        assert returned in window, returned
