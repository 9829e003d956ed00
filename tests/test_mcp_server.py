"""MCP server surface (reference cli/mcp_server.py analog).

Drives the dependency-free JSON-RPC implementation through the full
protocol conversation — initialize → initialized → tools/list →
tools/call → resources — as line strings (exactly what the stdio
transport carries), plus the reference's format semantics for the
process tool (json sorted-keys single document, '\n'-joined md/html,
blank-line csv separators, :84-148) and its error texts.
"""

from __future__ import annotations

import io
import json

import pytest

from yomitoku_spark.mcp_server import McpServer, handle_line, serve


@pytest.fixture(scope="module")
def resource_dir(spark, tmp_path_factory):
    from yomitoku_spark.datagen import transcripts_df

    d = tmp_path_factory.mktemp("mcp")
    transcripts_df(spark, n_convs=2, seed=11).write.parquet(str(d / "table1"))
    (d / "notes.txt").write_text("x")
    return str(d)


@pytest.fixture(scope="module")
def server(resource_dir, spark):
    return McpServer(resource_dir=resource_dir, spark=spark)


def _rpc(server, method, params=None, req_id=1):
    line = json.dumps({"jsonrpc": "2.0", "id": req_id, "method": method,
                       "params": params or {}})
    reply = handle_line(server, line)
    return json.loads(reply)


def test_resource_dir_required(monkeypatch):
    monkeypatch.delenv("RESOURCE_DIR", raising=False)
    with pytest.raises(ValueError, match="RESOURCE_DIR"):
        McpServer()


def test_initialize_and_capabilities(server):
    r = _rpc(server, "initialize", {"protocolVersion": "2024-11-05"})
    assert r["id"] == 1
    res = r["result"]
    assert res["serverInfo"]["name"] == "yomitoku_spark"
    assert "tools" in res["capabilities"] and "resources" in res["capabilities"]


def test_initialized_notification_gets_no_reply(server):
    line = json.dumps({"jsonrpc": "2.0",
                       "method": "notifications/initialized"})
    assert handle_line(server, line) is None


def test_unknown_method_and_parse_error(server):
    r = _rpc(server, "nope/nothere")
    assert r["error"]["code"] == -32601
    bad = handle_line(server, "{not json")
    assert json.loads(bad)["error"]["code"] == -32700


def test_tools_list(server):
    tools = _rpc(server, "tools/list")["result"]["tools"]
    assert [t["name"] for t in tools] == ["process_transcripts"]
    schema = tools[0]["inputSchema"]
    assert set(schema["required"]) == {"filename", "output_format"}
    assert schema["properties"]["output_format"]["enum"] == [
        "json", "markdown", "html", "csv"]


def test_resources_list_and_read(server, resource_dir):
    rl = _rpc(server, "resources/list")["result"]["resources"]
    assert rl[0]["uri"] == "file://list"
    rd = _rpc(server, "resources/read", {"uri": "file://list"})["result"]
    listing = json.loads(rd["contents"][0]["text"])
    assert "table1" in listing and "notes.txt" in listing
    err = _rpc(server, "resources/read", {"uri": "file://other"})["error"]
    assert "Unknown resource" in err["message"]


def test_tool_call_markdown_matches_render(server, spark, resource_dir):
    import os

    from yomitoku_spark.cli import render

    r = _rpc(server, "tools/call",
             {"name": "process_transcripts",
              "arguments": {"filename": "table1",
                            "output_format": "markdown"}})
    text = r["result"]["content"][0]["text"]
    assert r["result"]["isError"] is False
    rows = (render(spark, os.path.join(resource_dir, "table1"), "md",
                   None, combine=False, ignore_line_break=True)
            .orderBy("conv_id", "turn_idx").select("content").collect())
    assert text == "\n".join(x["content"] for x in rows)


def test_tool_call_json_is_one_sorted_document(server):
    r = _rpc(server, "tools/call",
             {"name": "process_transcripts",
              "arguments": {"filename": "table1", "output_format": "json"}})
    text = r["result"]["content"][0]["text"]
    payloads = json.loads(text)  # ONE valid JSON document: the page list
    assert isinstance(payloads, list) and payloads
    # reference :84-99 dump settings — sorted keys, ": " separator
    assert text == json.dumps(payloads, ensure_ascii=False, sort_keys=True,
                              separators=(",", ": "))


def test_tool_call_csv_blank_line_separators(server):
    r = _rpc(server, "tools/call",
             {"name": "process_transcripts",
              "arguments": {"filename": "table1", "output_format": "csv"}})
    text = r["result"]["content"][0]["text"]
    assert text.endswith("\n\n")  # blank line after every turn (:142-144)
    assert "\n\n" in text.rstrip("\n") + "\n\n"


def test_tool_call_bad_format_reference_error(server):
    r = _rpc(server, "tools/call",
             {"name": "process_transcripts",
              "arguments": {"filename": "table1", "output_format": "pdf"}})
    assert "Unsupported output format: pdf." in r["error"]["message"]
    r = _rpc(server, "tools/call", {"name": "other_tool", "arguments": {}})
    assert "Unknown tool" in r["error"]["message"]


def test_serve_loop_stdio_roundtrip(server):
    lines = [
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize",
                    "params": {}}),
        json.dumps({"jsonrpc": "2.0", "method": "notifications/initialized"}),
        "",
        json.dumps({"jsonrpc": "2.0", "id": 2, "method": "tools/list"}),
    ]
    out = io.StringIO()
    serve(server, stdin=io.StringIO("\n".join(lines) + "\n"), stdout=out)
    replies = [json.loads(x) for x in out.getvalue().splitlines()]
    assert [r["id"] for r in replies] == [1, 2]  # notification skipped
    assert replies[1]["result"]["tools"][0]["name"] == "process_transcripts"
