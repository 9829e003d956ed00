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
    # every rows-only entry is a pipeline/UDF op that SQL can't express
    assert rows_only == {
        "export_formats",
        "extract_transcripts",
        "extract_transcripts_staged",
        "segment_features",
        "extract_fields_kv",
        "simhash_pairs",
        "ann_lsh_topk",
        "multimodal_features",
    }
