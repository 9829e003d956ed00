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
    for must in ("extract_transcripts", "corpus_build", "corpus_build_full",
                 "training_set_selection", "export_formats"):
        assert must in window, must
    # the dict comment documents the boundary: last in-window row and
    # first tail rows (r6 rotation; the curation quartet displaced the
    # 4 r2/r3+r5-green generics — all oracle-backed — into the
    # hard-gated tail ahead of ivf_flat/ivf_scaled, and the second
    # curation wave displaced doc_token_stats/doc_quality/
    # doc_fingerprint — driver-green every round r1–r5 — behind them;
    # the late-r6 rows doc_lm_perplexity + semdedup_embeddings took the
    # slots of embedding_topk + ann_lsh_topk, driver-green r4+r5, which
    # now lead the tail so multimodal_features/_plan stay in-window)
    assert window[-1] == "multimodal_plan", window[-1]
    assert tail[0] == "embedding_topk", tail[0]
    assert tail[1] == "ann_lsh_topk", tail[1]
    assert tail[2] == "ivf_flat_topk", tail[2]
    assert tail[3] == "ivf_scaled_topk", tail[3]
    # the bm25/chunking/sketch trio (late r6) took the slots of
    # minhash_lsh_pairs + simhash_pairs + doc_lang_id (driver-green
    # r1-r5), which join the tail right behind the ivf pair
    assert tail[4] == "minhash_lsh_pairs", tail[4]
    assert tail[5] == "simhash_pairs", tail[5]
    assert tail[6] == "doc_lang_id", tail[6]
    assert tail[7] == "doc_token_stats", tail[7]
    assert tail[8] == "doc_quality", tail[8]
    assert tail[9] == "doc_fingerprint", tail[9]
    assert tail[10] == "jaccard_near_pairs", tail[10]
    assert tail[13] == "sessionize", tail[13]
    # r6 additions lead the window
    assert window[0] == "bm25_retrieval_topk"
    assert window[1] == "doc_sliding_chunks"
    assert window[2] == "hll_distinct_tokens"
    assert window[3] == "decontaminate_ngram"
    assert window[4] == "pii_redaction"
    assert window[5] == "doc_importance_weights"
    assert window[6] == "doc_lm_perplexity"
    assert window[7] == "semdedup_embeddings"
    assert window[8] == "llm_extract_kv"
    assert window[9] == "grid_dag_units"
    assert window[10] == "corpus_index_build"
    assert window[11] == "ann_ivf_pq_topk"
    assert window[12] == "search_cells_lookup"
    assert window[13] == "ann_ivf_clustered_topk"
    assert window[14] == "embedding_clustered_topk"
    assert window[15] == "doc_repetition_quality"
    assert window[16] == "exact_substring_spans"
    assert window[17] == "corpus_mixture_sample"
    assert window[18] == "pack_chunks"
    # the r5 tail returned to the window in full (no row sits out of
    # the driver window more than one consecutive round)
    for returned in ("ivf_lloyd_topk", "argmax_join", "content_concat",
                     "containment_join", "dedup_contained_boxes",
                     "asof_join", "rollup_revenue",
                     "connected_components_labels"):
        assert returned in window, returned
