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
    """Keep decimal digits. The reference's ``re.sub(r"[^\\d]")`` runs
    under CPython's UNICODE ``\\d`` (= category Nd), so non-ASCII
    decimal digits (e.g. Arabic-Indic ٣) are KEPT — Java's ``\\d`` is
    ASCII-only, hence the explicit ``\\p{Nd}`` class."""
    return F.regexp_replace(col, r"[^\p{Nd}]", "")


@register("numeric")
def numeric(col: Column) -> Column:
    """Strip currency/commas, keep digits, '.', '-', '+'
    (reference: normalizer.py:38-43 — the kept class is [\\d.\\-+],
    with PYTHON's Unicode \\d → ``\\p{Nd}`` here)."""
    return F.regexp_replace(z2h(col), r"[^\p{Nd}.\-+]", "")


# the complete full-width ASCII block (！ U+FF01 … ～ U+FF5E) plus the
# ideographic space — exactly what jaconv.z2h(digit=True, ascii=True,
# kana=False) folds (reference normalizer.py:40,48,75)
_FW_ASCII = "".join(chr(c) for c in range(0xFF01, 0xFF5F)) + "　"
_HW_ASCII = "".join(chr(c) for c in range(0x21, 0x7F)) + " "


@register("z2h")
def z2h(col: Column) -> Column:
    """Full-width → half-width ASCII (jaconv.z2h analog, full block)."""
    return F.translate(col, _FW_ASCII, _HW_ASCII)


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


# Java-regex class equal to PYTHON's \\s (the reference runs CPython
# re): Java \\s is ASCII-only, so NBSP/ideographic/typographic spaces
# between date-time components would silently diverge without this.
_WS = r"[\s\x{1C}-\x{1F}\x{85}\x{A0}\x{1680}\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]"


def _era_offset(letter: Column) -> Column:
    expr = None
    for _kanji, initial, offset in _ERAS:
        expr = (
            F.when(letter == initial, offset)
            if expr is None
            else expr.when(letter == initial, offset)
        )
    return expr


def _date_parsed(col: Column, fmt_str: str) -> Column:
    """Shared era/western date parse mirroring the reference's
    _parse_date cascade EXACTLY (normalizer.py:74-109): same pattern
    ORDER (kanji eras 年月日 → era initials with /-. separators → era
    initials 年月日 → western 年月日 → western slash/dash), same \\s*
    tolerance between every component (令和 5 年 3 月 2 日 parses), the
    年月日 forms REQUIRE the trailing 日, kanji eras take ONLY the
    年月日 form, and the western separator form accepts only / and -
    (each independently, so mixed R5/3.2 or 2024/3-15 match — as in the
    reference). NO MATCH RETURNS THE INPUT UNCHANGED (date_jp:117-120).
    Two documented NON-CONFLICTING supersets: 元 parses as era year 1
    (the reference's \\d+ never matches 元, and every reference pattern
    is still tried at its own priority first), and a LAST-tier dotted
    western form (2023.3.2) fires only on strings where the whole
    reference cascade passed the input through unchanged."""
    s = z2h(col)

    def fmt(y: Column, m: Column, d: Column) -> Column:
        return F.format_string(fmt_str, y.cast("int"), m.cast("int"), d.cast("int"))

    tiers: list[tuple[Column, Column]] = []
    # 1. kanji eras, 年月日 form only (reference :77-82); dict order = era order
    for kanji, _initial, offset in _ERAS:
        pat = rf"{kanji}{_WS}*(元|\d+){_WS}*年{_WS}*(\d+){_WS}*月{_WS}*(\d+){_WS}*日"
        ey = F.regexp_extract(s, pat, 1)
        year = F.when(ey == "元", F.lit(1)).otherwise(ey.cast("int")) + offset
        tiers.append(
            (ey != "", fmt(year, F.regexp_extract(s, pat, 2), F.regexp_extract(s, pat, 3)))
        )
    # 2. era initial + separators (reference :84-90); 3. + 年月日 (:92-99)
    for pat in (
        rf"([RHSTM]){_WS}*(\d{{1,2}}){_WS}*[/\-.]{_WS}*(\d{{1,2}}){_WS}*[/\-.]{_WS}*(\d{{1,2}})",
        rf"([RHSTM]){_WS}*(\d{{1,2}}){_WS}*年{_WS}*(\d{{1,2}}){_WS}*月{_WS}*(\d{{1,2}}){_WS}*日",
    ):
        letter = F.regexp_extract(s, pat, 1)
        year = F.regexp_extract(s, pat, 2).cast("int") + _era_offset(letter)
        tiers.append(
            (letter != "", fmt(year, F.regexp_extract(s, pat, 3), F.regexp_extract(s, pat, 4)))
        )
    # 4. western 年月日 (reference :101-103); 5. western /- (:105-107);
    # 6. dotted western — the documented superset tier, deliberately last
    for pat in (
        rf"(\d{{4}}){_WS}*年{_WS}*(\d{{1,2}}){_WS}*月{_WS}*(\d{{1,2}}){_WS}*日",
        r"(\d{4})[/\-](\d{1,2})[/\-](\d{1,2})",
        r"(\d{4})\.(\d{1,2})\.(\d{1,2})",
    ):
        y = F.regexp_extract(s, pat, 1)
        tiers.append(
            (y != "", fmt(y, F.regexp_extract(s, pat, 2), F.regexp_extract(s, pat, 3)))
        )
    result = None
    for cond, out in tiers:
        result = F.when(cond, out) if result is None else result.when(cond, out)
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
    WIDTH-FOLDED input — the reference reassigns ``text =
    jaconv.z2h(text)`` before matching (:155), so its fall-through
    returns the folded string (unlike date_jp, which folds only inside
    _parse_date and passes the original through)."""
    s = z2h(col)
    pats = [
        (rf"(\d{{1,2}}){_WS}*時{_WS}*(\d{{1,2}}){_WS}*分{_WS}*(\d{{1,2}}){_WS}*秒", True),
        (rf"(\d{{1,2}}){_WS}*時{_WS}*(\d{{1,2}}){_WS}*分", False),
        (rf"(\d{{1,2}}){_WS}*:{_WS}*(\d{{1,2}}){_WS}*:{_WS}*(\d{{1,2}})", True),
        (rf"(\d{{1,2}}){_WS}*:{_WS}*(\d{{1,2}})", False),
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
    return result.otherwise(s)


@register("time_jp")
def time_jp(col: Column) -> Column:
    """Colon / 時分 forms → 'H時MM分[SS秒]' (reference time_jp,
    normalizer.py:131-151): hour unpadded, minutes/seconds padded,
    seconds kept only when present; no match returns the WIDTH-FOLDED
    input (see time_hms — the reference folds before matching)."""
    s = z2h(col)
    pats = [
        (rf"(\d{{1,2}}){_WS}*時{_WS}*(\d{{1,2}}){_WS}*分{_WS}*(\d{{1,2}}){_WS}*秒", True),
        (rf"(\d{{1,2}}){_WS}*時{_WS}*(\d{{1,2}}){_WS}*分", False),
        (rf"(\d{{1,2}}){_WS}*:{_WS}*(\d{{1,2}}){_WS}*:{_WS}*(\d{{1,2}})", True),
        (rf"(\d{{1,2}}){_WS}*:{_WS}*(\d{{1,2}})", False),
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
    return result.otherwise(s)


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
