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


# era name → year offset (ISO year = offset + era year)
_ERAS = [("令和", "R", 2018), ("平成", "H", 1988), ("昭和", "S", 1925),
         ("大正", "T", 1911), ("明治", "M", 1867)]


@register("date_iso")
def date_iso(col: Column) -> Column:
    """Japanese era / western date → 'YYYY-MM-DD'
    (reference: normalizer.py:57-127). Handles 令和5年3月2日, R5.3.2,
    平成元年1月8日 (元年 = year 1), 2023年3月2日, 2023/3/2, 2023-03-02."""
    s = z2h(col)
    result = F.lit(None).cast("string")

    def fmt(y: Column, m: Column, d: Column) -> Column:
        return F.format_string("%04d-%02d-%02d", y.cast("int"), m.cast("int"), d.cast("int"))

    # western: 2023年3月2日 / 2023/3/2 / 2023-03-02 / 2023.3.2
    wpat = r"(\d{4})[年/\-.](\d{1,2})[月/\-.](\d{1,2})日?"
    w_y = F.regexp_extract(s, wpat, 1)
    result = F.when(w_y != "", fmt(w_y, F.regexp_extract(s, wpat, 2), F.regexp_extract(s, wpat, 3)))
    # era forms, kanji or initial: 令和5年3月2日 / R5.3.2 / 平成元年1月8日
    for kanji, initial, offset in _ERAS:
        pat = rf"(?:{kanji}|{initial})(元|\d{{1,2}})[年.](\d{{1,2}})[月.](\d{{1,2}})日?"
        ey = F.regexp_extract(s, pat, 1)
        year = F.when(ey == "元", F.lit(1)).otherwise(ey.cast("int")) + offset
        result = result.when(
            ey != "", fmt(year, F.regexp_extract(s, pat, 2), F.regexp_extract(s, pat, 3))
        )
    return result.otherwise(F.lit(None).cast("string"))


@register("time_hms")
def time_hms(col: Column) -> Column:
    """時/分/秒 and colon forms → HH:MM (reference: normalizer.py:130-173)."""
    s = z2h(col)
    pat1 = r"(\d{1,2})時(\d{1,2})分?"
    pat2 = r"(\d{1,2}):(\d{2})"
    h1 = F.regexp_extract(s, pat1, 1)
    h2 = F.regexp_extract(s, pat2, 1)
    return (
        F.when(h1 != "", F.format_string("%02d:%02d", h1.cast("int"),
                                         F.regexp_extract(s, pat1, 2).cast("int")))
        .when(h2 != "", F.format_string("%02d:%02d", h2.cast("int"),
                                        F.regexp_extract(s, pat2, 2).cast("int")))
        .otherwise(F.lit(None).cast("string"))
    )


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
