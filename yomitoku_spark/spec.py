"""The extraction spec — shared CONSTANTS for the oracle and the engine.

This file intentionally holds only constants (regexes, thresholds, kind
names), never logic: the pure-Python oracle (:mod:`yomitoku_spark.oracle`)
and the Spark engine (:mod:`yomitoku_spark.plans.pipeline`) implement the
spec independently so the per-turn equality tests exercise two genuinely
different code paths — the same seam the reference uses when it compares
its relational core against golden JSON with the neural models
monkeypatched out (reference: tests/test_table_semantic_from_json.py:116-148).

Semantics mirrored from the reference (file:line cites are into
/root/reference/src/yomitoku):

* boilerplate roles dropped — reference drops ``page_header``/``page_footer``
  elements under ``--ignore_meta`` (document_analyzer.py:552-568,
  cli/main.py:404-408); our HTML analog is tag/class priors + link density
  (jusText/Readability-style block scoring).
* NFKC text normalization — text_recognizer.py:155.
* reading-order re-sort of layout blocks — reading_order.py:14-223
  (DAG of "reads-before" edges + deterministic priority traversal).
* table grid recovery with span expansion (anchor keeps content, covered
  cells empty) — table_structure_recognizer.py:49-85, utils/misc.py:137-154,
  export_markdown.py:30-67.
* markdown-ish export with headings and pipe tables — export_markdown.py.
"""

from __future__ import annotations

import re

# ---- payload classification --------------------------------------------
LAYOUT_PREFIX = '{"blocks"'
HTML_BLOCK_TAG_RE = re.compile(r"<(header|footer|nav|aside|div|p|h[1-6]|ul|table)\b")

# block-level elements parsed out of HTML-ish payloads, in document order.
# The generator only ever emits this flat subset (block elements are never
# nested except ul>li and table>tr>td), so a regex segmenter IS the spec.
HTML_ELEMENT_RE = re.compile(
    r"<(?P<tag>header|footer|nav|aside|h[1-6]|p|div|li|table)(?P<attrs>[^>]*)>"
    r"(?P<inner>.*?)</(?P=tag)>",
    re.DOTALL,
)
HTML_CLASS_RE = re.compile(r'class="([^"]*)"')
HTML_A_RE = re.compile(r"<a\b[^>]*>(.*?)</a>", re.DOTALL)
HTML_INLINE_STRIP_RE = re.compile(r"</?(?:a|b|i|em|strong|span)\b[^>]*>")
HTML_TR_RE = re.compile(r"<tr[^>]*>(.*?)</tr>", re.DOTALL)
HTML_TD_RE = re.compile(r"<t[dh][^>]*>(.*?)</t[dh]>", re.DOTALL)
BOILER_TAGS = frozenset({"header", "footer", "nav", "aside"})
BOILER_CLASS_RE = re.compile(r"\b(nav|menu|footer|sidebar|banner|ad)\b")

# ---- textual (non-HTML, non-layout) payloads ---------------------------
# fenced code blocks are carved out FIRST (they may contain blank lines
# and table/list-looking text that must stay verbatim); remaining gaps
# are split on blank lines. Unbalanced fences degrade to plain text.
FENCE_RE = re.compile(r"(?ms)^```[^\n]*\n.*?^```[ \t]*$")
BLANK_LINE_SPLIT_RE = re.compile(r"\n[ \t]*\n")
MD_HEADING_RE = re.compile(r"^(#{1,6}) (.+)$")
MD_LIST_LINE_RE = re.compile(r"^(?:[-*]|\d+\.) (.+)$")
MD_TABLE_LINE_RE = re.compile(r"^\|.*\|$")
MD_TABLE_SEP_RE = re.compile(r"^\|[\s\-:|]+\|$")
KV_LINE_RE = re.compile(r"^([A-Za-z][A-Za-z0-9_ ]{0,40}?):[ \t]+(\S.*)$")

# markdown-table merged-cell markers (rowspan / colspan continuation).
# Grid recovery expands spans anchor-only: covered positions render empty
# (reference span expansion: utils/misc.py:137-154).
ROWSPAN_MARK = "^^"
COLSPAN_MARK = "<<"

# ---- keep/drop thresholds (jusText-style, simplified) ------------------
MIN_PARA_CHARS = 10  # blocks shorter than this are noise (analog of the
#                      reference's is_noise small-box filter,
#                      document_analyzer.py:248-253)
MIN_HEADING_CHARS = 3
MAX_LINK_DENSITY = 0.5

# layout roles (subset of the reference layout-parser role vocabulary,
# configs/cfg_layout_parser_rtdtrv2_v2.py:72-89)
ROLE_PARAGRAPH = "paragraph"
ROLE_HEADING = "section_headings"
ROLE_PAGE_HEADER = "page_header"
ROLE_PAGE_FOOTER = "page_footer"
ROLE_FIGURE = "figure"
META_ROLES = frozenset({ROLE_PAGE_HEADER, ROLE_PAGE_FOOTER})

# block kinds emitted in result.spans[].kind
KIND_PARAGRAPH = "paragraph"
KIND_HEADING = "heading"
KIND_LIST = "list"
KIND_TABLE = "table"
KIND_KV = "kv"
KIND_FIGURE = "figure"
KIND_CODE = "code"  # fenced code: kept verbatim, no NFKC

BLOCK_JOINER = "\n\n"

WS_COLLAPSE_RE = re.compile(r"\s+")
