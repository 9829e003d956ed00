"""Reference-parity CLI surface (cli/main.py analog) — page grammar,
encoding validation, per-file vs dataset sinks, --combine merge."""

import pytest

from yomitoku_spark import cli


def test_parse_pages_grammar():
    """Reference parse_pages (cli/main.py:94-102)."""
    assert cli.parse_pages("1,2,5-7") == [1, 2, 5, 6, 7]
    assert cli.parse_pages("3") == [3]
    assert cli.parse_pages("2-4,2") == [2, 3, 4]


def test_validate_encoding_vectors():
    """Reference test_validate_encoding (tests/test_cli.py:233-241)."""
    with pytest.raises(ValueError):
        cli.validate_encoding("utf-9")
    for enc in ("utf-8", "utf-8-sig", "shift-jis", "euc-jp", "cp932"):
        assert cli.validate_encoding(enc)


@pytest.fixture(scope="module")
def transcripts_path(spark, tmp_path_factory):
    from yomitoku_spark.datagen import transcripts_df

    p = tmp_path_factory.mktemp("cli") / "in"
    transcripts_df(spark, n_convs=3, seed=5).write.parquet(str(p))
    return str(p)


def test_cli_per_file_md_with_pages(spark, tmp_path, transcripts_path):
    out = tmp_path / "md"
    cli.main([transcripts_path, "-o", str(out), "-f", "md", "--per-file",
              "--pages", "0-1"])
    files = sorted(out.glob("*.md"))
    assert files  # every kept turn got a file
    # page filter: only turn_idx 0 and 1 appear
    assert {f.stem.rsplit("_", 1)[1] for f in files} <= {"0", "1"}
    # content parity with the export pipeline for the same turn
    conv, turn = files[0].stem.rsplit("_", 1)
    expect = (
        cli.render(spark, transcripts_path, "md", [0, 1], combine=False)
        .filter(f"conv_id = '{conv}' and turn_idx = {turn}")
        .first()["content"]
    )
    assert files[0].read_text(encoding="utf-8") == expect + "\n"


def test_cli_combine_html_one_file_per_conv(spark, tmp_path, transcripts_path):
    out = tmp_path / "html"
    cli.main([transcripts_path, "-o", str(out), "-f", "html", "--combine",
              "--per-file"])
    files = sorted(out.glob("*.html"))
    assert len(files) == 3  # one per conversation
    txt = files[0].read_text(encoding="utf-8").rstrip()
    assert txt.startswith("<html><body>") and txt.endswith("</body></html>")
    # exactly ONE wrapper pair in the combined doc
    assert txt.count("<html><body>") == 1 and txt.count("</body></html>") == 1


def test_cli_combine_json_is_one_document(spark, tmp_path, transcripts_path):
    """Reference merge_all_pages builds a JSON LIST for -f json
    (cli/main.py:30-33): the combined output must parse as ONE JSON
    array with one element per kept turn, in turn order."""
    import json

    out = tmp_path / "json"
    cli.main([transcripts_path, "-o", str(out), "-f", "json", "--combine",
              "--per-file"])
    files = sorted(out.glob("*.json"))
    assert len(files) == 3
    for f in files:
        pages = json.loads(f.read_text(encoding="utf-8"))
        assert isinstance(pages, list) and pages
        idxs = [p["turn_idx"] for p in pages]
        assert idxs == sorted(idxs)
        assert all({"conv_id", "extracted_text"} <= set(p) for p in pages)


def test_cli_combine_md_joins_with_single_newline(spark, transcripts_path):
    """Reference md merge joins pages with '\\n' (cli/main.py:47-51)."""
    per_turn = cli.render(spark, transcripts_path, "md", None, combine=False)
    one = per_turn.orderBy("conv_id", "turn_idx").collect()
    combined = {
        r["conv_id"]: r["content"]
        for r in cli.render(spark, transcripts_path, "md", None, combine=True).collect()
    }
    by_conv: dict[str, list[str]] = {}
    for r in one:
        by_conv.setdefault(r["conv_id"], []).append(r["content"])
    for conv, parts in by_conv.items():
        assert combined[conv] == "\n".join(parts)


def test_cli_ignore_line_break_strips_paragraph_newlines(spark, transcripts_path):
    """Reference --ignore_line_break (cli/main.py → convert_* →
    paragraph contents.replace('\\n','')): paragraph bodies lose
    interior newlines; structural blocks (lists/tables/code) keep
    theirs; default rendering is unchanged."""
    base = {
        (r.conv_id, r.turn_idx): r.content
        for r in cli.render(spark, transcripts_path, "md", None, False).collect()
    }
    stripped = {
        (r.conv_id, r.turn_idx): r.content
        for r in cli.render(
            spark, transcripts_path, "md", None, False, ignore_line_break=True
        ).collect()
    }
    assert base.keys() == stripped.keys()
    assert base != stripped  # the corpus has multi-line paragraphs
    for k, v in stripped.items():
        blocks_b = base[k].split("\n\n")
        blocks_s = v.split("\n\n")
        assert len(blocks_b) == len(blocks_s)
        for bb, bs in zip(blocks_b, blocks_s):
            if "\n" not in bb:
                assert bb == bs
            elif bb.startswith(("|", "- ", "```", "# ")):
                assert bb == bs  # structural blocks untouched
            elif ":" in bb.split("\n")[0] and all(":" in ln for ln in bb.split("\n") if ln):
                assert bb == bs  # kv blocks untouched
            else:
                assert bs == bb.replace("\n", "") or bb == bs


def test_cli_dataset_sink(spark, tmp_path, transcripts_path):
    out = tmp_path / "ds"
    cli.main([transcripts_path, "-o", str(out), "-f", "json"])
    ds = spark.read.parquet(str(out))
    assert ds.count() > 0
    assert set(ds.columns) == {"conv_id", "turn_idx", "content"}
    # the json content is parseable and carries the markdown text
    import json

    rec = json.loads(ds.first()["content"])
    assert {"conv_id", "turn_idx", "extracted_text"} <= set(rec)
