"""Scalar twins of the field normalizers, under the REFERENCE's rule
names.

The reference resolves normalizer names from the extraction schema in
TWO places: the rule cascade (vectorized here as the column registry in
:mod:`yomitoku_spark.functions.normalize`) and the LLM-assisted
pipeline (extractor/pipeline.py `_normalize_resolved_fields`), where
values are plain Python strings inside a per-document batch. This
module is that second surface: pure-stdlib string functions mirroring
/root/reference/src/yomitoku/extractor/normalizer.py:33-200, keyed by
the reference's own rule names (``phone_jp``, ``date_jp``, ...).

The jaconv.z2h(digit=True, ascii=True, kana=False) fold is the
full-width-ASCII-block translate — the SAME table as the column twin
(`normalize._FW_ASCII`), imported so the two registries cannot drift.
`tests/test_extractor_llm.py` pins these against the reference's own
normalizer vectors AND fuzzes scalar == column for the shared rules.
"""

from __future__ import annotations

import re
from typing import Callable, Optional

from yomitoku_spark.functions.normalize import _FW_ASCII, _HIRA, _HW_ASCII, _KATA

_Z2H = str.maketrans(_FW_ASCII, _HW_ASCII)
_KATA2HIRA = str.maketrans(_KATA, _HIRA)
_HIRA2KATA = str.maketrans(_HIRA, _KATA)

SCALAR_NORMALIZERS: dict[str, Callable[[str], str]] = {}


def register(name: str):
    def deco(fn):
        SCALAR_NORMALIZERS[name] = fn
        return fn

    return deco


def get_normalizer(name: str) -> Optional[Callable[[str], str]]:
    """Reference get_normalizer (normalizer.py:18-19)."""
    return SCALAR_NORMALIZERS.get(name)


def apply_normalize(text, rule: Optional[str]) -> str:
    """Reference apply_normalize (normalizer.py:22-30): None rule → text
    as-is (stringified), unknown rule → unchanged."""
    if rule is None:
        return text if isinstance(text, str) else str(text)
    if not isinstance(text, str):
        text = str(text)
    fn = get_normalizer(rule)
    if fn is None:
        return text
    return fn(text)


def _z2h(text: str) -> str:
    return text.translate(_Z2H)


@register("strip_spaces")
def strip_spaces(text: str) -> str:
    """normalizer.py:33-35."""
    return re.sub(r"[\s　]+", "", text)


@register("numeric")
def numeric(text: str) -> str:
    """normalizer.py:38-43 — width-fold, drop ','/'、', keep [\\d.+-]
    (Python Unicode \\d: non-ASCII decimal digits survive)."""
    text = _z2h(text).replace(",", "").replace("、", "")
    return re.sub(r"[^\d.\-+]", "", text)


@register("phone_jp")
def phone_jp(text: str) -> str:
    """normalizer.py:46-54 — hyphenate by digit count (11 → 3-4-4,
    10 → 3-3-4, else bare digits)."""
    digits = re.sub(r"[^\d]", "", _z2h(text))
    if len(digits) == 11:
        return f"{digits[:3]}-{digits[3:7]}-{digits[7:]}"
    if len(digits) == 10:
        return f"{digits[:3]}-{digits[3:6]}-{digits[6:]}"
    return digits


@register("postal_code_jp")
def postal_code_jp(text: str) -> str:
    """normalizer.py:195-200 — 7 digits → NNN-NNNN."""
    digits = re.sub(r"[^\d]", "", _z2h(text))
    if len(digits) == 7:
        return f"{digits[:3]}-{digits[3:]}"
    return digits


_ERA_KANJI = [("令和", 2018), ("平成", 1988), ("昭和", 1925),
              ("大正", 1911), ("明治", 1867)]
_ERA_ABBREV = {"R": 2018, "H": 1988, "S": 1925, "T": 1911, "M": 1867}


def _parse_date(text: str):
    """normalizer.py:74-110 — the cascade in the reference's exact tier
    order: kanji eras (年月日 only) → abbrev era with [/-.] → abbrev era
    with 年月日 → western 年月日 → YYYY[-/]M[-/]D."""
    text = _z2h(text)
    for era, offset in _ERA_KANJI:
        m = re.search(rf"{era}\s*(\d+)\s*年\s*(\d+)\s*月\s*(\d+)\s*日", text)
        if m:
            return offset + int(m.group(1)), int(m.group(2)), int(m.group(3))
    m = re.search(r"([RHSTM])\s*(\d{1,2})\s*[/\-\.]\s*(\d{1,2})\s*[/\-\.]\s*(\d{1,2})", text)
    if m and m.group(1) in _ERA_ABBREV:
        return _ERA_ABBREV[m.group(1)] + int(m.group(2)), int(m.group(3)), int(m.group(4))
    m = re.search(r"([RHSTM])\s*(\d{1,2})\s*年\s*(\d{1,2})\s*月\s*(\d{1,2})\s*日", text)
    if m and m.group(1) in _ERA_ABBREV:
        return _ERA_ABBREV[m.group(1)] + int(m.group(2)), int(m.group(3)), int(m.group(4))
    m = re.search(r"(\d{4})\s*年\s*(\d{1,2})\s*月\s*(\d{1,2})\s*日", text)
    if m:
        return int(m.group(1)), int(m.group(2)), int(m.group(3))
    m = re.search(r"(\d{4})[/\-](\d{1,2})[/\-](\d{1,2})", text)
    if m:
        return int(m.group(1)), int(m.group(2)), int(m.group(3))
    return None


@register("date_jp")
def date_jp(text: str) -> str:
    """normalizer.py:113-120 — ISO or the input unchanged."""
    r = _parse_date(text)
    return f"{r[0]:04d}-{r[1]:02d}-{r[2]:02d}" if r else text


@register("date_yyyymmdd")
def date_yyyymmdd(text: str) -> str:
    """normalizer.py:122-128."""
    r = _parse_date(text)
    return f"{r[0]:04d}{r[1]:02d}{r[2]:02d}" if r else text


@register("time_jp")
def time_jp(text: str) -> str:
    """normalizer.py:131-151 — H時MM分[SS秒] (hour unpadded)."""
    text = _z2h(text)
    m = re.search(r"(\d{1,2})\s*時\s*(\d{1,2})\s*分\s*(\d{1,2})\s*秒", text)
    if m:
        return f"{int(m.group(1))}時{int(m.group(2)):02d}分{int(m.group(3)):02d}秒"
    m = re.search(r"(\d{1,2})\s*時\s*(\d{1,2})\s*分", text)
    if m:
        return f"{int(m.group(1))}時{int(m.group(2)):02d}分"
    m = re.search(r"(\d{1,2})\s*:\s*(\d{1,2})\s*:\s*(\d{1,2})", text)
    if m:
        return f"{int(m.group(1))}時{int(m.group(2)):02d}分{int(m.group(3)):02d}秒"
    m = re.search(r"(\d{1,2})\s*:\s*(\d{1,2})", text)
    if m:
        return f"{int(m.group(1))}時{int(m.group(2)):02d}分"
    return text


@register("time_hms")
def time_hms(text: str) -> str:
    """normalizer.py:154-173 — HH:MM:SS (zero-padded, missing s → 00)."""
    text = _z2h(text)
    m = re.search(r"(\d{1,2})\s*時\s*(\d{1,2})\s*分\s*(\d{1,2})\s*秒", text)
    if m:
        return f"{int(m.group(1)):02d}:{int(m.group(2)):02d}:{int(m.group(3)):02d}"
    m = re.search(r"(\d{1,2})\s*時\s*(\d{1,2})\s*分", text)
    if m:
        return f"{int(m.group(1)):02d}:{int(m.group(2)):02d}:00"
    m = re.search(r"(\d{1,2})\s*:\s*(\d{1,2})\s*:\s*(\d{1,2})", text)
    if m:
        return f"{int(m.group(1)):02d}:{int(m.group(2)):02d}:{int(m.group(3)):02d}"
    m = re.search(r"(\d{1,2})\s*:\s*(\d{1,2})", text)
    if m:
        return f"{int(m.group(1)):02d}:{int(m.group(2)):02d}:00"
    return text


@register("alphanumeric")
def alphanumeric(text: str) -> str:
    """normalizer.py:177-180."""
    return re.sub(r"[^a-zA-Z0-9]", "", _z2h(text))


@register("hiragana")
def hiragana(text: str) -> str:
    """normalizer.py:183-186 — kata→hira, then hiragana block only."""
    return re.sub(r"[^぀-ゟ]", "", text.translate(_KATA2HIRA))


@register("katakana")
def katakana(text: str) -> str:
    """normalizer.py:189-192 — hira→kata, then katakana block only."""
    return re.sub(r"[^゠-ヿ]", "", text.translate(_HIRA2KATA))
