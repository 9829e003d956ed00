"""LLM-assisted extraction surface vs the REFERENCE'S OWN unit vectors.

Every expected value in this file is lifted from the reference's
tests/test_extractor.py (the class/line markers are cited per test):
schema parsing, the scalar normalizer registry, resolver semantics,
the normalize/output passes, and the prompt builder's structure. On
top of the mirrored vectors: scalar↔column normalizer parity fuzz and
the deterministic full-loop (prompt → stub model → parse → resolve →
normalize → output) that queries.llm_extract_kv runs distributed.
"""

from __future__ import annotations

import json

import pytest

from yomitoku_spark.extractor_llm import (
    KeyMatchStubClient,
    LLMSchema,
    OpenAICompatClient,
    ResolvedElement,
    ResolvedField,
    _build_schema_section,
    _build_tables_section,
    _resolve_element,
    build_lookup,
    build_messages,
    build_output,
    build_simple_output,
    normalize_resolved_fields,
    parse_json_response,
    resolve_fields,
    run_extraction_doc,
)
from yomitoku_spark.functions import normalize_scalar as NS


def _cell(cid, box, contents, role="cell"):
    return {"id": cid, "box": box, "contents": contents, "role": role}


def _table(cells, kv_items=None, grids=None, tid="t0", style="border"):
    return {
        "id": tid, "style": style,
        "cells": {c["id"]: c for c in cells},
        "kv_items": kv_items or [], "grids": grids or [],
    }


def _info(tables=None, paragraphs=None, words=None):
    return {"tables": tables or [], "paragraphs": paragraphs or [],
            "words": words or []}


# ===================================================================
# schema (reference TestExtractionSchema, test_extractor.py:21-139)
# ===================================================================


def test_schema_from_yaml_scalar_fields(tmp_path):
    p = tmp_path / "schema.yaml"
    p.write_text(
        "fields:\n"
        "  - name: phone\n    description: 電話番号\n    type: string\n"
        "    normalize: phone_jp\n"
        "  - name: amount\n    description: 合計金額\n    type: number\n"
        "    normalize: numeric\n",
        encoding="utf-8",
    )
    schema = LLMSchema.from_yaml(str(p))
    assert len(schema.fields) == 2
    f0 = schema.fields[0]
    assert (f0.name, f0.description, f0.type, f0.normalize, f0.structure) == (
        "phone", "電話番号", "string", "phone_jp", "scalar")
    assert schema.fields[1].type == "number"


def test_schema_from_yaml_table_field(tmp_path):
    p = tmp_path / "schema.yaml"
    p.write_text(
        "fields:\n"
        "  - name: items\n    structure: table\n    columns:\n"
        "      - name: product\n        description: 商品名\n        type: string\n"
        "      - name: price\n        description: 金額\n        type: number\n"
        "        normalize: numeric\n",
        encoding="utf-8",
    )
    schema = LLMSchema.from_yaml(str(p))
    f = schema.fields[0]
    assert f.structure == "table" and len(f.columns) == 2
    assert f.columns[0].name == "product"
    assert f.columns[1].normalize == "numeric"


def test_schema_cell_id_bbox_regex():
    schema = LLMSchema.from_dict(
        {"fields": [
            {"name": "f1", "cell_id": "c12"},
            {"name": "f2", "bbox": [100, 200, 300, 400]},
            {"name": "f3", "regex": r"T\d{13}"},
            {"name": "f4", "structure": "kv"},
        ]}
    )
    assert schema.fields[0].cell_id == "c12"
    assert schema.fields[1].bbox == [100, 200, 300, 400]
    assert schema.fields[2].regex == r"T\d{13}"
    assert schema.fields[3].structure == "kv"


# ===================================================================
# scalar normalizers (reference TestNormalizer :142-268 +
# TestParseDate :1571-1605)
# ===================================================================

NORMALIZER_VECTORS = [
    ("strip_spaces", "a b　c\td", "abcd"),
    ("numeric", "１，２００円", "1200"),
    ("numeric", "-1,234.5", "-1234.5"),
    ("phone_jp", "０９０１２３４５６７８", "090-1234-5678"),
    ("phone_jp", "03-1234-5678", "031-234-5678"),  # 10 digits re-split 3-3-4
    ("postal_code_jp", "〒１２３−４５６７", "123-4567"),
    ("date_jp", "令和6年3月15日", "2024-03-15"),
    ("date_jp", "平成31年4月30日", "2019-04-30"),
    ("date_jp", "明治45年7月30日", "1912-07-30"),
    ("date_jp", "大正15年12月25日", "1926-12-25"),
    ("date_jp", "T15/12/25", "1926-12-25"),
    ("date_jp", "M45.7.30", "1912-07-30"),
    ("date_jp", "R6年3月15日", "2024-03-15"),
    ("date_jp", "令和６年３月１５日", "2024-03-15"),
    ("date_jp", "2024-03-15", "2024-03-15"),
    ("date_jp", "2024/3/5", "2024-03-05"),
    ("date_jp", "not a date", "not a date"),
    ("date_yyyymmdd", "2024年3月15日", "20240315"),
    ("time_jp", "１４：３０", "14時30分"),
    ("time_jp", "9時5分30秒", "9時05分30秒"),
    ("time_hms", "１４時３０分", "14:30:00"),
    ("time_hms", "9:5:7", "09:05:07"),
    ("alphanumeric", "ＡＢＣ１２３あ", "ABC123"),
    ("hiragana", "テスト123abc", "てすと"),
    ("katakana", "ひらがな", "ヒラガナ"),
    ("katakana", "カタカナ", "カタカナ"),
    ("katakana", "テスト123abc", "テスト"),
    ("katakana", "ひらがなとカタカナ混在", "ヒラガナトカタカナ"),
]


@pytest.mark.parametrize("rule,text,expected", NORMALIZER_VECTORS)
def test_scalar_normalizer_vectors(rule, text, expected):
    assert NS.apply_normalize(text, rule) == expected


def test_apply_normalize_edge_rules():
    # reference :225-246
    assert NS.apply_normalize("  x  ", None) == "  x  "
    assert NS.apply_normalize(42, None) == "42"
    assert NS.apply_normalize("abc", "unknown_rule") == "abc"
    assert NS.apply_normalize(1200, "numeric") == "1200"


def test_scalar_column_parity(spark):
    """The scalar registry must agree with the COLUMN registry for the
    rules both carry (column names differ: phone/postal/date_iso)."""
    from pyspark.sql import functions as F

    from yomitoku_spark.functions.normalize import NORMALIZERS

    pairs = [("numeric", "numeric"), ("alphanumeric", "alphanumeric"),
             ("hiragana", "hiragana"), ("katakana", "katakana"),
             ("phone_jp", "phone"), ("postal_code_jp", "postal"),
             ("date_jp", "date_iso"), ("time_hms", "time_hms"),
             ("time_jp", "time_jp"), ("date_yyyymmdd", "date_yyyymmdd")]
    samples = ["１，２００円", "０９０１２３４５６７８", "〒1234567",
               "令和6年3月15日", "H31.4.30", "2024/3/5", "14:30",
               "１４時３０分５秒", "ＡＢＣ１２３あ", "テストtest",
               "ひらがな", "", "no match here", "9時5分"]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    cols = [NORMALIZERS[cn](F.col("t")).alias(f"c{i}")
            for i, (_, cn) in enumerate(pairs)]
    rows = df.select("t", *cols).collect()
    for r in rows:
        for i, (sn, cn) in enumerate(pairs):
            assert NS.apply_normalize(r["t"], sn) == r[f"c{i}"], (
                sn, cn, r["t"])


# ===================================================================
# resolver (reference TestBuildLookup/TestResolveElement/
# TestResolveFields :371-536)
# ===================================================================


def test_build_lookup_cells_paragraphs_words():
    info = _info(
        tables=[_table([_cell("c0", [0, 0, 10, 10], "hello")])],
        paragraphs=[{"id": "p0", "box": [20, 20, 30, 30], "contents": "world"}],
        words=[{"content": "foo", "points": [[0, 0], [10, 0], [10, 10], [0, 10]]}],
    )
    lookup = build_lookup(info)
    assert {"c0", "p0", "w0"} <= set(lookup)


def test_build_lookup_paragraph_without_id():
    info = _info(paragraphs=[{"id": None, "box": [0, 0, 10, 10], "contents": "t"}])
    assert "p0" in build_lookup(info)


def test_resolve_element_cell_word_missing():
    cell = _cell("c0", [10, 20, 30, 40], "text")
    word = {"content": "abc", "points": [[100, 200], [300, 200], [300, 250], [100, 250]]}
    elem = _resolve_element("c0", {"c0": cell})
    assert (elem.id, elem.box, elem.contents) == ("c0", [10, 20, 30, 40], "text")
    elem = _resolve_element("w0", {"w0": word})
    assert (elem.contents, list(elem.box)) == ("abc", [100, 200, 300, 250])
    assert _resolve_element("missing", {}) is None


def test_resolve_scalar_field():
    lookup = {"c0": _cell("c0", [0, 0, 10, 10], "hello")}
    resolved = resolve_fields(
        [{"name": "field1", "value": "hello", "raw_text": "hello",
          "confidence": "high", "source": "kv", "cell_ids": ["c0"]}], lookup)
    assert len(resolved) == 1
    assert resolved[0].name == "field1" and resolved[0].value == "hello"
    assert [e.id for e in resolved[0].elements] == ["c0"]


def test_resolve_table_field_labels():
    lookup = {"c0": _cell("c0", [0, 0, 10, 10], "ProductA"),
              "c1": _cell("c1", [10, 0, 20, 10], "100")}
    resolved = resolve_fields(
        [{"name": "items",
          "value": [{"product": {"value": "ProductA", "cell_ids": ["c0"]},
                     "price": {"value": "100", "cell_ids": ["c1"]}}],
          "raw_text": "", "confidence": "high", "source": "grid",
          "cell_ids": []}], lookup)
    assert {e.label for e in resolved[0].elements} == {"product", "price"}


def test_resolve_dict_value_extracts_nested_cell_ids():
    lookup = {"c6": _cell("c6", [100, 200, 300, 250], "100031582200")}
    resolved = resolve_fields(
        [{"name": "model_code",
          "value": {"value": "100031582200", "cell_ids": ["c6"]},
          "raw_text": "100031582200", "confidence": "high", "source": "kv",
          "cell_ids": []}], lookup)
    assert resolved[0].value == "100031582200"
    assert resolved[0].elements[0].id == "c6"
    assert resolved[0].elements[0].box == [100, 200, 300, 250]


def test_resolve_skips_non_dict_items():
    resolved = resolve_fields(
        ["unexpected string",
         {"name": "field1", "value": "hello", "raw_text": "hello",
          "confidence": "high", "source": "kv", "cell_ids": []},
         42], {})
    assert len(resolved) == 1 and resolved[0].name == "field1"


# ===================================================================
# normalize pass + outputs (reference TestNormalizeResolvedFields /
# TestBuildOutput / TestBuildSimpleOutput :990-1255)
# ===================================================================


def test_normalize_scalar_and_kv_and_skip():
    schema = LLMSchema.from_dict(
        {"fields": [{"name": "phone", "normalize": "phone_jp"}]})
    fields = [ResolvedField(name="phone", value="09012345678",
                            raw_text="09012345678")]
    assert normalize_resolved_fields(fields, schema)[0].value == "090-1234-5678"

    schema_kv = LLMSchema.from_dict(
        {"fields": [{"name": "phone", "structure": "kv",
                     "normalize": "phone_jp"}]})
    fields = [ResolvedField(name="phone", value="09012345678", raw_text="")]
    assert normalize_resolved_fields(fields, schema_kv)[0].value == "090-1234-5678"

    fields = [ResolvedField(name="phone", value="09012345678", raw_text="")]
    assert normalize_resolved_fields(
        fields, schema, skip_normalize=True)[0].value == "09012345678"


def test_normalize_table_column():
    schema = LLMSchema.from_dict(
        {"fields": [{"name": "items", "structure": "table",
                     "columns": [{"name": "price", "type": "number",
                                  "normalize": "numeric"}]}]})
    fields = [ResolvedField(
        name="items",
        value=[{"price": {"value": "１，２００円", "cell_ids": ["c1"]}}],
        raw_text="")]
    out = normalize_resolved_fields(fields, schema)
    assert out[0].value[0]["price"]["value"] == "1200"


def test_build_output_scalar_and_table():
    fields = [ResolvedField(
        name="phone", value="03-1234-5678", raw_text="0312345678",
        elements=[ResolvedElement("c1", [10, 20, 30, 40], "0312345678")],
        confidence="high", source="kv")]
    out = build_output(fields)
    pf = out["fields"]["phone"]
    assert (pf["structure"], pf["value"], pf["raw_text"]) == (
        "kv", "03-1234-5678", "0312345678")
    assert pf["cell_ids"] == ["c1"] and pf["bboxes"] == [[10, 20, 30, 40]]
    assert out["metadata"]["schema_version"] == "1.0"

    fields = [ResolvedField(
        name="items",
        value=[{"product": {"value": "apple", "cell_ids": ["c1"]},
                "price": {"value": "100", "cell_ids": ["c2"]}}],
        raw_text="",
        elements=[ResolvedElement("c1", [0, 0, 50, 30], "apple"),
                  ResolvedElement("c2", [50, 0, 100, 30], "100")],
        confidence="high", source="grid")]
    items = build_output(fields)["fields"]["items"]
    assert items["structure"] == "table" and len(items["records"]) == 1
    row = items["records"][0]
    assert row["product"]["value"] == "apple"
    assert row["product"]["bboxes"] == [[0, 0, 50, 30]]
    assert row["price"]["value"] == "100"


def test_build_simple_output():
    fields = [ResolvedField(
        name="phone", value="03-1234-5678", raw_text="0312345678",
        elements=[ResolvedElement("c1", [10, 20, 30, 40], "0312345678")],
        confidence="high", source="kv")]
    assert build_simple_output(fields) == {"phone": "03-1234-5678"}

    fields = [ResolvedField(
        name="items",
        value=[{"product": {"value": "apple", "cell_ids": ["c1"]},
                "price": {"value": "100", "cell_ids": ["c2"]}},
               {"product": {"value": "banana", "cell_ids": ["c3"]},
                "price": {"value": "200", "cell_ids": ["c4"]}}],
        raw_text="")]
    assert build_simple_output(fields) == {
        "items": [{"product": "apple", "price": "100"},
                  {"product": "banana", "price": "200"}]}

    # mixed + dict flattening (:1214-1255)
    fields = [
        ResolvedField(name="title", value="Invoice", raw_text="Invoice"),
        ResolvedField(name="model_code",
                      value={"name": "機種コード", "value": "100031582200",
                             "cell_ids": ["c6"], "confidence": "high"},
                      raw_text=""),
    ]
    out = build_simple_output(fields)
    assert out["title"] == "Invoice"
    assert out["model_code"] == "100031582200"


# ===================================================================
# prompt (reference TestBuildMessages/TestBuildSchemaSection
# :1256-1568)
# ===================================================================


def _minimal_info():
    return _info(
        tables=[_table([_cell("c0", [0, 0, 100, 50], "test_value")])],
        paragraphs=[{"id": "p0", "box": [0, 50, 100, 80],
                     "contents": "paragraph text", "role": None}],
        words=[{"content": "word_text",
                "points": [[0, 0], [50, 0], [50, 20], [0, 20]]}],
    )


def test_build_messages_structure_and_content():
    schema = LLMSchema.from_dict(
        {"fields": [{"name": "test_field", "description": "テスト"}]})
    messages = build_messages(_minimal_info(), schema)
    assert [m["role"] for m in messages] == ["system", "user"]
    system = messages[0]["content"]
    for token in ("document data extraction", "cell_ids", "structure=kv",
                  "structure=table"):
        assert token in system
    user = messages[1]["content"]
    for section in ("## Paragraphs", "## Tables", "## Extraction Schema",
                    "## Response Format"):
        assert section in user
    for datum in ("test_value", "paragraph text", "test_field"):
        assert datum in user


def test_response_format_uses_actual_field_names():
    schema = LLMSchema.from_dict(
        {"fields": [
            {"name": "company_name", "description": "会社名"},
            {"name": "phone", "description": "電話番号"},
            {"name": "items", "structure": "table",
             "columns": [{"name": "product"}, {"name": "price",
                                               "type": "number"}]},
        ]})
    user = build_messages(_minimal_info(), schema)[1]["content"]
    for name in ('"company_name"', '"phone"', '"items"', '"product"',
                 '"price"'):
        assert name in user
    assert "<field_name>" not in user


def test_tables_section_table_id_filter():
    t0 = _table([_cell("c0", [0, 0, 10, 10], "t0_text")], tid="t0")
    t1 = _table([_cell("c1", [0, 0, 10, 10], "t1_text")], tid="t1")
    section = _build_tables_section([t0, t1], table_id_filter="t0")
    assert "t0_text" in section and "t1_text" not in section


def test_kv_items_contain_cell_ids():
    table = _table(
        [_cell("c0", [0, 0, 50, 30], "会社名", role="header"),
         _cell("c1", [50, 0, 150, 30], "ABC Corp")],
        kv_items=[{"key": ["c0"], "value": "c1"}])
    assert "会社名: ABC Corp [c0,c1]" in _build_tables_section([table])


def test_grid_rows_contain_cell_ids():
    table = _table(
        [_cell("h0", [0, 0, 50, 30], "商品名", role="header"),
         _cell("h1", [50, 0, 100, 30], "数量", role="header"),
         _cell("c0", [0, 30, 50, 60], "Product A"),
         _cell("c1", [50, 30, 100, 60], "10")],
        grids=[{"id": "g0", "col_headers": [["h0"], ["h1"]],
                "data": [["c0", "c1"]]}])
    section = _build_tables_section([table])
    assert "Grid g0:" in section
    assert "商品名: Product A [c0]" in section
    assert "数量: 10 [c1]" in section


def test_grid_duplicate_headers_merged_in_prompt():
    table = _table(
        [_cell("h0", [0, 0, 50, 30], "氏名", role="header"),
         _cell("h1", [50, 0, 100, 30], "生年月日", role="header"),
         _cell("h2", [100, 0, 150, 30], "生年月日", role="header"),
         _cell("c0", [0, 30, 50, 60], "太郎"),
         _cell("c1", [50, 30, 100, 60], "令和"),
         _cell("c2", [100, 30, 150, 60], "5年1月1日")],
        grids=[{"id": "g0", "col_headers": [["h0"], ["h1"], ["h2"]],
                "data": [["c0", "c1", "c2"]]}])
    section = _build_tables_section([table])
    assert "氏名: 太郎 [c0]" in section
    assert "生年月日: 令和5年1月1日 [c1,c2]" in section
    assert section.count("生年月日") == 1


def test_only_unassigned_cells_listed():
    table = _table(
        [_cell("c0", [0, 0, 50, 30], "会社名", role="header"),
         _cell("c1", [50, 0, 150, 30], "ABC Corp"),
         _cell("c2", [0, 30, 150, 60], "orphan text"),
         _cell("c3", [0, 60, 150, 90], "group text", role="group")],
        kv_items=[{"key": ["c0"], "value": "c1"}])
    section = _build_tables_section([table])
    assert "Unassigned Cells:" in section
    assert "orphan text" in section
    assert "group text" not in section
    unassigned = section.split("Unassigned Cells:")[1]
    assert "c0:" not in unassigned and "c1:" not in unassigned
    assert "c2:" in unassigned


def test_schema_section():
    schema = LLMSchema.from_dict(
        {"fields": [{"name": "phone", "description": "電話番号"}]})
    section = _build_schema_section(schema)
    assert "phone" in section and "電話番号" in section
    assert "structure=kv" in section and "type=string" in section
    assert "structure=table" not in section

    schema = LLMSchema.from_dict(
        {"fields": [{"name": "items", "structure": "table",
                     "columns": [{"name": "product"},
                                 {"name": "price", "type": "number"}]}]})
    section = _build_schema_section(schema)
    assert "structure=table" in section
    assert "product" in section and "price" in section


# ===================================================================
# client plumbing + the deterministic full loop
# ===================================================================


def test_parse_json_response_fences():
    # reference llm_client.py:11-16
    assert parse_json_response('{"a": 1}') == {"a": 1}
    assert parse_json_response('```json\n{"a": 1}\n```') == {"a": 1}
    assert parse_json_response('```\n{"a": 1}\n```') == {"a": 1}
    with pytest.raises(json.JSONDecodeError):
        parse_json_response("not json")


def test_openai_compat_request_construction():
    client = OpenAICompatClient(model="m1", api_base="http://h:1/v1/",
                                api_key="k", temperature=0.5, max_tokens=7)
    url, headers, body = client.build_request([{"role": "user", "content": "x"}])
    assert url == "http://h:1/v1/chat/completions"
    assert headers["Authorization"] == "Bearer k"
    assert body["response_format"] == {"type": "json_object"}
    assert (body["model"], body["temperature"], body["max_tokens"]) == ("m1", 0.5, 7)
    _, _, body = client.build_request([], json_mode=False)
    assert "response_format" not in body


def test_stub_client_full_loop_kv_and_table():
    info = _info(
        tables=[_table(
            [_cell("h0", [0, 0, 50, 30], "請求番号", role="header"),
             _cell("v0", [50, 0, 150, 30], "INV-001"),
             _cell("h1", [0, 30, 50, 60], "電話", role="header"),
             _cell("v1", [50, 30, 150, 60], "０９０１２３４５６７８"),
             _cell("g0h0", [0, 100, 50, 130], "品名", role="header"),
             _cell("g0h1", [50, 100, 100, 130], "金額", role="header"),
             _cell("d0", [0, 130, 50, 160], "pen"),
             _cell("d1", [50, 130, 100, 160], "１，２００円")],
            kv_items=[{"key": ["h0"], "value": "v0"},
                      {"key": ["h1"], "value": "v1"}],
            grids=[{"id": "g0", "col_headers": [["g0h0"], ["g0h1"]],
                    "data": [["d0", "d1"]]}])])
    schema = LLMSchema.from_dict(
        {"fields": [
            {"name": "invoice_no", "description": "請求番号"},
            {"name": "tel", "description": "電話", "normalize": "phone_jp"},
            {"name": "missing", "description": "zzz"},
            {"name": "items", "structure": "table",
             "columns": [{"name": "品名"},
                         {"name": "金額", "normalize": "numeric"}]},
        ]})
    out = run_extraction_doc(info, schema, KeyMatchStubClient(), simple=True)
    assert out["invoice_no"] == "INV-001"
    assert out["tel"] == "090-1234-5678"  # normalized in the loop
    assert out["missing"] == ""
    assert out["items"] == [{"品名": "pen", "金額": "1200"}]

    rich = run_extraction_doc(info, schema, KeyMatchStubClient())
    _STUB_LOOP_CASE["info"] = info
    _STUB_LOOP_CASE["schema"] = schema
    inv = rich["fields"]["invoice_no"]
    assert inv["cell_ids"] == ["v0"]          # value cell, not the key cell
    assert inv["bboxes"] == [[50, 0, 150, 30]]
    assert inv["source"] == "kv" and inv["confidence"] == "high"
    assert rich["fields"]["missing"]["source"] == "not_found"
    items = rich["fields"]["items"]
    assert items["structure"] == "table"
    assert items["records"][0]["金額"]["raw_text"] == "１，２００円"
    assert items["records"][0]["金額"]["bboxes"] == [[50, 130, 100, 160]]


_STUB_LOOP_CASE: dict = {}


def test_llm_extract_distributed_equals_scalar(spark):
    """The distributed stage (union-tagged frames → applyInPandas per
    doc) must emit exactly what the per-doc scalar loop produces for
    the same semantic info — including the table field carried through
    the headers/data frames."""
    test_stub_client_full_loop_kv_and_table()  # (re)build the case
    info, schema = _STUB_LOOP_CASE["info"], _STUB_LOOP_CASE["schema"]
    table = info["tables"][0]

    def df(rows, ddl):
        return spark.createDataFrame(rows, ddl)

    cells = df(
        [(7, c["id"], c["role"], c["contents"], *c["box"])
         for c in table["cells"].values()],
        "doc_id long, cell_id string, role string, contents string, "
        "x1 int, y1 int, x2 int, y2 int")
    kv = df(
        [(7, "/".join(k["key"]), k["value"]) for k in table["kv_items"]],
        "doc_id long, key_cells string, value_cell string")
    grid = table["grids"][0]
    headers = df(
        [(7, grid["id"], ci, pos, cid)
         for ci, ids in enumerate(grid["col_headers"])
         for pos, cid in enumerate(ids)],
        "doc_id long, grid_id string, col int, hdr_pos int, cell_id string")
    data = df(
        [(7, grid["id"], ri, ci, cid)
         for ri, row in enumerate(grid["data"])
         for ci, cid in enumerate(row) if cid is not None],
        "doc_id long, grid_id string, row int, col int, cell_id string")

    from yomitoku_spark.extractor_llm import llm_extract

    got = {
        (r.field, r.record_idx, r.col): (r.value, r.raw_text, r.confidence,
                                         r.source, r.cell_id)
        for r in llm_extract(cells, kv, schema, headers=headers,
                             data=data).collect()
    }

    # scalar referee over the SAME info (grid id + kv order as the
    # distributed assembly produces them)
    ref_info = {
        "tables": [{**table, "id": "t7",
                    "grids": [{**grid, "id": grid["id"]}]}],
        "paragraphs": [], "words": [],
    }
    rich = run_extraction_doc(ref_info, schema, KeyMatchStubClient())
    want = {}
    for f in schema.fields:
        entry = rich["fields"][f.name]
        if entry["structure"] == "table":
            for ri, rec in enumerate(entry["records"]):
                for col, cv in rec.items():
                    cids = cv.get("cell_ids", [])
                    want[(f.name, ri, col)] = (
                        cv.get("value", ""), cv.get("raw_text", ""), "high",
                        entry["source"], cids[0] if cids else None)
        else:
            cids = entry.get("cell_ids", [])
            want[(f.name, -1, "")] = (
                entry["value"], entry["raw_text"], entry["confidence"],
                entry["source"], cids[0] if cids else None)
    assert got == want
