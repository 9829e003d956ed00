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
    # the ONLY two rows-only entries: the datagen full mix (layout
    # reading-order is graph-valued; correctness comes from the pytest
    # engine==oracle byte-equality gate + scaling checksum) and the
    # multimodal stub boundary. Everything else carries a DuckDB SQL
    # referee over the parquet tables.
    assert rows_only == {
        "extract_transcripts_mix",
        "multimodal_features",
    }
