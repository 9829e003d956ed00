"""MCP server over the Spark engine — the reference's entry point 5.

The reference ships `yomitoku_mcp` (cli/mcp_server.py): a FastMCP
stdio server with one tool, ``process_ocr(filename, output_format)``
(load the file from $RESOURCE_DIR, run the analyzer, convert to
json/markdown/html/csv, :49-148) and one resource, ``file://list``
(directory listing, :151-159). This module provides the same surface
for the transcripts engine WITHOUT the `mcp` package (absent here): a
minimal, dependency-free JSON-RPC 2.0 implementation of the MCP stdio
subset the reference actually uses — initialize / tools/list /
tools/call / resources/list / resources/read over newline-delimited
JSON.

Semantics mirrored from the reference:

* ``$RESOURCE_DIR`` is REQUIRED (ValueError with the reference's
  message when unset, :20-23) and scopes every filename;
* the engine loads lazily on the first tool call and is then reused
  (the reference's global analyzer, :26-43);
* output formats (:83-148): json → ONE sorted-keys compact-ish dump of
  the per-page payload list; markdown/html → pages joined with '\\n';
  csv → page rows with a blank-line separator (the reference's
  ``writer.writerow([""])`` after each element, applied at the turn
  grain); unknown format → the reference's error text;
* every conversion runs ``ignore_line_break=True`` exactly as the
  reference's tool hard-codes it.

The tool is ``process_transcripts(filename, output_format)``: filename
names a parquet transcripts table under $RESOURCE_DIR (the analog of
the reference's image/PDF file), and the per-TURN rendered payloads
play the reference's per-PAGE results. Handlers are pure functions of
(request → response dict), so the full protocol is testable without a
subprocess; ``python -m yomitoku_spark.mcp_server`` serves stdio.
"""

from __future__ import annotations

import json
import os
import sys

PROTOCOL_VERSION = "2024-11-05"

TOOL_SPEC = {
    "name": "process_transcripts",
    "description": (
        "Run main-content extraction on the named transcripts table in "
        "the resource directory and convert the results to the desired "
        "format. Formats: json (structured payloads), markdown, html, "
        "csv."
    ),
    "inputSchema": {
        "type": "object",
        "properties": {
            "filename": {
                "type": "string",
                "description": "Table name inside the resource directory.",
            },
            "output_format": {
                "type": "string",
                "enum": ["json", "markdown", "html", "csv"],
            },
        },
        "required": ["filename", "output_format"],
    },
}


class McpServer:
    def __init__(self, resource_dir: str | None = None, spark=None):
        if resource_dir is None:
            try:
                resource_dir = os.environ["RESOURCE_DIR"]
            except KeyError:
                # reference cli/mcp_server.py:20-23, same message
                raise ValueError(
                    "Environment variable 'RESOURCE_DIR' is not set."
                )
        self.resource_dir = resource_dir
        self._spark = spark
        self._handlers = {
            "initialize": self._initialize,
            "notifications/initialized": None,  # notification: no reply
            "ping": lambda p: {},
            "tools/list": self._tools_list,
            "tools/call": self._tools_call,
            "resources/list": self._resources_list,
            "resources/read": self._resources_read,
        }

    # -- engine -----------------------------------------------------

    def spark(self):
        """Lazy engine load, then reuse (reference load_analyzer,
        cli/mcp_server.py:28-43)."""
        if self._spark is None:
            from yomitoku_spark.session import get_spark

            self._spark = get_spark(app="yomitoku-mcp")
        return self._spark

    # -- method handlers --------------------------------------------

    def _initialize(self, params: dict) -> dict:
        return {
            "protocolVersion": PROTOCOL_VERSION,
            "capabilities": {"tools": {}, "resources": {}},
            "serverInfo": {"name": "yomitoku_spark", "version": "1.0"},
        }

    def _tools_list(self, params: dict) -> dict:
        return {"tools": [TOOL_SPEC]}

    def _tools_call(self, params: dict) -> dict:
        name = params.get("name")
        if name != "process_transcripts":
            raise ValueError(f"Unknown tool: {name}")
        args = params.get("arguments") or {}
        text = self.process_transcripts(
            args["filename"], args["output_format"]
        )
        return {"content": [{"type": "text", "text": text}], "isError": False}

    def _resources_list(self, params: dict) -> dict:
        # reference @mcp.resource("file://list"), cli/mcp_server.py:151-159
        return {
            "resources": [{
                "uri": "file://list",
                "name": "file list",
                "description": "Files in the resource directory.",
                "mimeType": "application/json",
            }]
        }

    def _resources_read(self, params: dict) -> dict:
        uri = params.get("uri")
        if uri != "file://list":
            raise ValueError(f"Unknown resource: {uri}")
        listing = sorted(os.listdir(self.resource_dir))
        return {
            "contents": [{
                "uri": uri,
                "mimeType": "application/json",
                "text": json.dumps(listing),
            }]
        }

    # -- the tool ---------------------------------------------------

    def process_transcripts(self, filename: str, output_format: str) -> str:
        """Reference process_ocr (cli/mcp_server.py:49-148) at the
        turn grain; conversions run ignore_line_break=True like the
        reference's hard-coded calls."""
        from yomitoku_spark.cli import render

        if output_format not in ("json", "markdown", "html", "csv"):
            # reference :146-148, same text
            raise ValueError(
                f"Unsupported output format: {output_format}."
                " Supported formats are json, markdown, html or csv."
            )
        path = os.path.join(self.resource_dir, filename)
        fmt = {"markdown": "md"}.get(output_format, output_format)
        rows = (
            render(self.spark(), path, fmt, pages=None, combine=False,
                   ignore_line_break=True)
            .orderBy("conv_id", "turn_idx")
            .select("content")
            .collect()
        )
        pages = [r["content"] for r in rows]
        if output_format == "json":
            # reference :84-99 — ONE document: the list of per-page
            # payloads, sorted keys, the same separators
            return json.dumps(
                [json.loads(p) for p in pages],
                ensure_ascii=False, sort_keys=True, separators=(",", ": "),
            )
        if output_format in ("markdown", "html"):
            return "\n".join(pages)  # reference :101-125
        # csv: the reference streams every element through one writer
        # with a blank row after each (:127-144) — at our grain, one
        # blank line after each turn's rows
        return "".join(p + "\n\n" for p in pages)


# -- JSON-RPC 2.0 plumbing ------------------------------------------


def handle_line(server: McpServer, line: str) -> str | None:
    """One request line → one response line (None for notifications)."""
    try:
        req = json.loads(line)
    except json.JSONDecodeError as e:
        return json.dumps({
            "jsonrpc": "2.0", "id": None,
            "error": {"code": -32700, "message": f"Parse error: {e}"},
        })
    method = req.get("method", "")
    req_id = req.get("id")
    handler = server._handlers.get(method, "missing")
    if handler is None or "id" not in req:
        return None  # notification — JSON-RPC forbids a reply
    if handler == "missing":
        return json.dumps({
            "jsonrpc": "2.0", "id": req_id,
            "error": {"code": -32601, "message": f"Method not found: {method}"},
        })
    try:
        result = handler(req.get("params") or {})
        return json.dumps(
            {"jsonrpc": "2.0", "id": req_id, "result": result},
            ensure_ascii=False,
        )
    except Exception as e:
        return json.dumps({
            "jsonrpc": "2.0", "id": req_id,
            "error": {"code": -32603, "message": f"{type(e).__name__}: {e}"},
        })


def serve(server: McpServer, stdin=None, stdout=None) -> None:
    """Newline-delimited JSON-RPC over stdio (MCP stdio transport —
    the reference's `mcp.run()` default, cli/mcp_server.py:163-171;
    SSE is out of scope here)."""
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    for line in stdin:
        line = line.strip()
        if not line:
            continue
        reply = handle_line(server, line)
        if reply is not None:
            stdout.write(reply + "\n")
            stdout.flush()


def main() -> int:
    serve(McpServer())
    return 0


if __name__ == "__main__":
    sys.exit(main())
