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
    # every rows-only entry runs the extraction pipeline over the
    # synthetic transcripts corpus (datagen), which the DuckDB views
    # cannot see — correctness comes from the pytest engine==oracle
    # byte-equality gate instead
    assert rows_only == {
        "export_formats",
        "extract_transcripts",
        "extract_transcripts_staged",
        "segment_features",
        "extract_fields_kv",
        "multimodal_features",
    }
