"""Property fuzz for the date-parse cascade: the Column implementation
(functions/normalize.py _date_parsed — Java regex, when-chain) must
agree with an independent stdlib scalar mirror of the reference's
_parse_date cascade (extractor/normalizer.py:74-109) extended with the
two documented supersets (元 → year 1, last-tier dotted western) on
RANDOMLY COMPOSED inputs — era names, digits, separators, whitespace,
noise — not just the fixed vectors."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_ERAS = [("令和", "R", 2018), ("平成", "H", 1988), ("昭和", "S", 1925),
         ("大正", "T", 1911), ("明治", "M", 1867)]

_FW = {ord(c): chr(ord(c) - 0xFEE0) for c in
       "".join(chr(x) for x in range(0xFF01, 0xFF5F))}
_FW[0x3000] = " "


def _z2h(s: str) -> str:
    return s.translate(_FW)


def _scalar_date_iso(text: str) -> str:
    """Stdlib mirror of the cascade, in the reference's pattern order."""
    s = _z2h(text)
    for kanji, _i, off in _ERAS:
        m = re.search(rf"{kanji}\s*(元|\d+)\s*年\s*(\d+)\s*月\s*(\d+)\s*日", s)
        if m:
            y = 1 if m.group(1) == "元" else int(m.group(1))
            return f"{y + off:04d}-{int(m.group(2)):02d}-{int(m.group(3)):02d}"
    m = re.search(r"([RHSTM])\s*(\d{1,2})\s*[/\-.]\s*(\d{1,2})\s*[/\-.]\s*(\d{1,2})", s)
    if m:
        off = dict((i, o) for _k, i, o in _ERAS)[m.group(1)]
        return f"{int(m.group(2)) + off:04d}-{int(m.group(3)):02d}-{int(m.group(4)):02d}"
    m = re.search(r"([RHSTM])\s*(\d{1,2})\s*年\s*(\d{1,2})\s*月\s*(\d{1,2})\s*日", s)
    if m:
        off = dict((i, o) for _k, i, o in _ERAS)[m.group(1)]
        return f"{int(m.group(2)) + off:04d}-{int(m.group(3)):02d}-{int(m.group(4)):02d}"
    m = re.search(r"(\d{4})\s*年\s*(\d{1,2})\s*月\s*(\d{1,2})\s*日", s)
    if m:
        return f"{int(m.group(1)):04d}-{int(m.group(2)):02d}-{int(m.group(3)):02d}"
    m = re.search(r"(\d{4})[/\-](\d{1,2})[/\-](\d{1,2})", s)
    if m:
        return f"{int(m.group(1)):04d}-{int(m.group(2)):02d}-{int(m.group(3)):02d}"
    m = re.search(r"(\d{4})\.(\d{1,2})\.(\d{1,2})", s)
    if m:
        return f"{int(m.group(1)):04d}-{int(m.group(2)):02d}-{int(m.group(3)):02d}"
    return text


_piece = st.one_of(
    st.sampled_from(
        ["令和", "平成", "昭和", "R", "H", "S", "M", "T", "年", "月", "日",
         "/", "-", ".", " ", "　", "元", "19", "2023", "5", "03", "1",
         "２０２４", "３", "x", "abc", "no date", ":",
         # exotic Unicode whitespace: Python \s matches these, Java \s
         # does not — the engine uses an explicit class to agree
         "\xa0", " ", " "]
    ),
    st.text(alphabet="0123456789", min_size=1, max_size=4),
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_piece, min_size=0, max_size=10))
def test_date_iso_column_equals_scalar(spark, pieces):
    from yomitoku_spark.functions.normalize import date_iso

    text = "".join(pieces)
    got = (
        spark.range(1)
        .select(date_iso(F.lit(text)).alias("o"))
        .collect()[0]["o"]
    )
    assert got == _scalar_date_iso(text), (text, got, _scalar_date_iso(text))


def _scalar_time_hms(text: str) -> str:
    """Stdlib mirror of the reference's time_hms (normalizer.py:154-173)."""
    s = _z2h(text)
    m = re.search(r"(\d{1,2})\s*時\s*(\d{1,2})\s*分\s*(\d{1,2})\s*秒", s)
    if m:
        return f"{int(m.group(1)):02d}:{int(m.group(2)):02d}:{int(m.group(3)):02d}"
    m = re.search(r"(\d{1,2})\s*時\s*(\d{1,2})\s*分", s)
    if m:
        return f"{int(m.group(1)):02d}:{int(m.group(2)):02d}:00"
    m = re.search(r"(\d{1,2})\s*:\s*(\d{1,2})\s*:\s*(\d{1,2})", s)
    if m:
        return f"{int(m.group(1)):02d}:{int(m.group(2)):02d}:{int(m.group(3)):02d}"
    m = re.search(r"(\d{1,2})\s*:\s*(\d{1,2})", s)
    if m:
        return f"{int(m.group(1)):02d}:{int(m.group(2)):02d}:00"
    # the reference reassigns text = jaconv.z2h(text) BEFORE matching
    # (normalizer.py:155), so its no-match fall-through is the FOLDED
    # string — unlike date_jp, which folds only inside _parse_date
    return _z2h(text)


_time_piece = st.one_of(
    st.sampled_from(["時", "分", "秒", ":", " ", "　", "\xa0", "14", "9", "05",
                     "１２", "x", "."]),
    st.text(alphabet="0123456789", min_size=1, max_size=3),
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_time_piece, min_size=0, max_size=8))
def test_time_hms_column_equals_scalar(spark, pieces):
    from yomitoku_spark.functions.normalize import time_hms

    text = "".join(pieces)
    got = (
        spark.range(1)
        .select(time_hms(F.lit(text)).alias("o"))
        .collect()[0]["o"]
    )
    assert got == _scalar_time_hms(text), (text, got, _scalar_time_hms(text))
