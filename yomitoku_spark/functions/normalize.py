"""Field normalizers as pure column expressions, with a named registry.

Re-expression of the reference's normalizer registry
(/root/reference/src/yomitoku/extractor/normalizer.py — `@register`
name → function, resolved from the extraction-schema YAML): whitespace
strip :33-35, numeric normalize :38-43, phone/postal by digit count
:46-54,194-200, Japanese era dates → ISO :57-127, kana conversion
:176-191, full/half-width via jaconv :40,48,75. Everything here is
JVM-side (`regexp_*`, `translate`, `when` cascades) — no Python in the
hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NORMALIZERS: dict[str, callable] = {}


def register(name: str):
    def deco(fn):
        NORMALIZERS[name] = fn
        return fn

    return deco


def normalize(name: str, col: Column) -> Column:
    return NORMALIZERS[name](col)


@register("identity")
def identity(col: Column) -> Column:
    return col


@register("strip_ws")
def strip_ws(col: Column) -> Column:
    """Remove ASCII + ideographic spaces (reference: normalizer.py:33-35)."""
    return F.regexp_replace(col, "[ 　\t]", "")


@register("collapse_ws")
def collapse_ws(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, r"\s+", " "))


@register("digits")
def digits(col: Column) -> Column:
    return F.regexp_replace(col, r"[^0-9]", "")


@register("numeric")
def numeric(col: Column) -> Column:
    """Strip currency/commas, keep digits + one decimal point
    (reference: normalizer.py:38-43)."""
    return F.regexp_replace(z2h(col), r"[^0-9.\-]", "")


_FW_DIGITS = "０１２３４５６７８９"
_HW_DIGITS = "0123456789"
_FW_UPPER = "ＡＢＣＤＥＦＧＨＩＪＫＬＭＮＯＰＱＲＳＴＵＶＷＸＹＺ"
_HW_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_FW_LOWER = "ａｂｃｄｅｆｇｈｉｊｋｌｍｎｏｐｑｒｓｔｕｖｗｘｙｚ"
_HW_LOWER = "abcdefghijklmnopqrstuvwxyz"


@register("z2h")
def z2h(col: Column) -> Column:
    """Full-width → half-width alnum (jaconv.z2h analog)."""
    return F.translate(
        col,
        _FW_DIGITS + _FW_UPPER + _FW_LOWER + "　．－",
        _HW_DIGITS + _HW_UPPER + _HW_LOWER + " .-",
    )


_HIRA = "".join(chr(c) for c in range(0x3041, 0x3097))
_KATA = "".join(chr(c) for c in range(0x30A1, 0x30F7))


@register("kata2hira")
def kata2hira(col: Column) -> Column:
    return F.translate(col, _KATA, _HIRA)


@register("hira2kata")
def hira2kata(col: Column) -> Column:
    return F.translate(col, _HIRA, _KATA)


@register("hiragana")
def hiragana(col: Column) -> Column:
    """Reference ``hiragana`` (normalizer.py:183-186): convert katakana
    to hiragana, then DROP everything outside the hiragana block —
    'テスト123abc' → 'てすと'."""
    return F.regexp_replace(kata2hira(col), r"[^\x{3040}-\x{309F}]", "")


@register("katakana")
def katakana(col: Column) -> Column:
    """Reference ``katakana`` (normalizer.py:189-192): convert hiragana
    to katakana, then keep only the katakana block."""
    return F.regexp_replace(hira2kata(col), r"[^\x{30A0}-\x{30FF}]", "")


@register("alphanumeric")
def alphanumeric(col: Column) -> Column:
    """Reference ``alphanumeric`` (normalizer.py:177-180): width-fold,
    then keep only [a-zA-Z0-9]."""
    return F.regexp_replace(z2h(col), r"[^a-zA-Z0-9]", "")


# era name → year offset (ISO year = offset + era year)
_ERAS = [("令和", "R", 2018), ("平成", "H", 1988), ("昭和", "S", 1925),
         ("大正", "T", 1911), ("明治", "M", 1867)]


def _date_parsed(col: Column, fmt_str: str) -> Column:
    """Shared era/western date parse with the reference's date_jp
    semantics (normalizer.py:74-120): kanji eras take the 年月日 form
    (令和6年3月15日); initial eras take 年月日 OR any of the / - .
    separators (R6/3/15, H30.1.1, S60-12-25); western 2024年3月15日,
    2024/3/15, 2024-03-15. NO MATCH RETURNS THE INPUT UNCHANGED, like
    the reference (date_jp:117-120). Documented supersets over the
    reference: 元年 parses as year 1 and dotted western dates
    (2023.3.2) parse — both unmatched (returned as-is) by the
    reference, never conflicting outputs."""
    s = z2h(col)

    def fmt(y: Column, m: Column, d: Column) -> Column:
        return F.format_string(fmt_str, y.cast("int"), m.cast("int"), d.cast("int"))

    # western: 2023年3月2日 / 2023/3/2 / 2023-03-02 / 2023.3.2
    wpat = r"(\d{4})[年/\-.](\d{1,2})[月/\-.](\d{1,2})日?"
    w_y = F.regexp_extract(s, wpat, 1)
    result = F.when(w_y != "", fmt(w_y, F.regexp_extract(s, wpat, 2), F.regexp_extract(s, wpat, 3)))
    # era forms: 令和5年3月2日 / R5.3.2 / R6/3/15 / S60-12-25 / 平成元年1月8日
    for kanji, initial, offset in _ERAS:
        pat = (
            rf"(?:{kanji}|{initial})(元|\d{{1,2}})"
            rf"[年/\-.](\d{{1,2}})[月/\-.](\d{{1,2}})日?"
        )
        ey = F.regexp_extract(s, pat, 1)
        year = F.when(ey == "元", F.lit(1)).otherwise(ey.cast("int")) + offset
        result = result.when(
            ey != "", fmt(year, F.regexp_extract(s, pat, 2), F.regexp_extract(s, pat, 3))
        )
    return result.otherwise(col)


@register("date_iso")
def date_iso(col: Column) -> Column:
    """Era/western date → 'YYYY-MM-DD' (reference date_jp)."""
    return _date_parsed(col, "%04d-%02d-%02d")


@register("date_yyyymmdd")
def date_yyyymmdd(col: Column) -> Column:
    """Era/western date → 'YYYYMMDD' (reference date_yyyymmdd,
    normalizer.py:122-128)."""
    return _date_parsed(col, "%04d%02d%02d")


@register("time_hms")
def time_hms(col: Column) -> Column:
    """時分[秒] and colon forms → 'HH:MM:SS' with the reference's
    time_hms semantics (normalizer.py:154-173): seconds kept when
    present, ':00' appended otherwise, single-digit fields zero-padded,
    minutes may be one digit (9:5 → 09:05:00); no match returns the
    input unchanged."""
    s = z2h(col)
    pats = [
        (r"(\d{1,2})時(\d{1,2})分(\d{1,2})秒", True),
        (r"(\d{1,2})時(\d{1,2})分", False),
        (r"(\d{1,2}):(\d{1,2}):(\d{1,2})", True),
        (r"(\d{1,2}):(\d{1,2})", False),
    ]
    result = None
    for pat, has_sec in pats:
        h = F.regexp_extract(s, pat, 1)
        out = F.format_string(
            "%02d:%02d:%02d",
            h.cast("int"),
            F.regexp_extract(s, pat, 2).cast("int"),
            F.regexp_extract(s, pat, 3).cast("int") if has_sec else F.lit(0),
        )
        result = F.when(h != "", out) if result is None else result.when(h != "", out)
    return result.otherwise(col)


@register("time_jp")
def time_jp(col: Column) -> Column:
    """Colon / 時分 forms → 'H時MM分[SS秒]' (reference time_jp,
    normalizer.py:131-151): hour unpadded, minutes/seconds padded,
    seconds kept only when present; no match returns the input."""
    s = z2h(col)
    pats = [
        (r"(\d{1,2})時(\d{1,2})分(\d{1,2})秒", True),
        (r"(\d{1,2})時(\d{1,2})分", False),
        (r"(\d{1,2}):(\d{1,2}):(\d{1,2})", True),
        (r"(\d{1,2}):(\d{1,2})", False),
    ]
    result = None
    for pat, has_sec in pats:
        h = F.regexp_extract(s, pat, 1)
        mm = F.regexp_extract(s, pat, 2).cast("int")
        if has_sec:
            out = F.format_string(
                "%d時%02d分%02d秒", h.cast("int"), mm,
                F.regexp_extract(s, pat, 3).cast("int"),
            )
        else:
            out = F.format_string("%d時%02d分", h.cast("int"), mm)
        result = F.when(h != "", out) if result is None else result.when(h != "", out)
    return result.otherwise(col)


@register("phone")
def phone(col: Column) -> Column:
    """Format by digit count: 11 → 3-4-4, 10 → 3-3-4, else digits
    (reference: normalizer.py:46-54)."""
    d = digits(z2h(col))
    n = F.length(d)
    return (
        F.when(n == 11, F.concat_ws("-", F.substring(d, 1, 3), F.substring(d, 4, 4), F.substring(d, 8, 4)))
        .when(n == 10, F.concat_ws("-", F.substring(d, 1, 3), F.substring(d, 4, 3), F.substring(d, 7, 4)))
        .otherwise(d)
    )


@register("postal")
def postal(col: Column) -> Column:
    """7 digits → NNN-NNNN (reference: normalizer.py:194-200)."""
    d = digits(z2h(col))
    return F.when(
        F.length(d) == 7, F.concat_ws("-", F.substring(d, 1, 3), F.substring(d, 4, 4))
    ).otherwise(d)
