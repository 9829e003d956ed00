"""Reference normalizer parity — the reference's OWN test vectors
(tests/test_extractor.py:143-270) run through our column-level
normalizer registry (functions/normalize.py). Registry names map:
strip_spaces→strip_ws, phone_jp→phone, postal_code_jp→postal,
date_jp→date_iso; the rest share names."""

from pyspark.sql import functions as F

from yomitoku_spark.functions import normalize as N

VECTORS = [
    ("strip_ws", "東京都　渋谷区", "東京都渋谷区"),
    ("strip_ws", "a b c", "abc"),
    ("strip_ws", "hello", "hello"),
    ("numeric", "１，２３４円", "1234"),
    ("numeric", "¥3,000", "3000"),
    ("numeric", "-100.5", "-100.5"),
    # CPython's \d is Unicode (category Nd): the reference KEEPS
    # non-ASCII decimal digits — r5 advice parity fix (\p{Nd})
    ("numeric", "٣٤٥kg", "٣٤٥"),
    ("postal", "１２３٤٥６７", "123-٤٥67"),
    ("phone", "０９０１２３４５６７８", "090-1234-5678"),
    ("phone", "０３１２３４５６７８", "031-234-5678"),
    ("postal", "１２３４５６７", "123-4567"),
    ("postal", "123-4567", "123-4567"),
    ("date_iso", "令和6年3月15日", "2024-03-15"),
    ("date_iso", "平成30年1月1日", "2018-01-01"),
    ("date_iso", "昭和60年12月25日", "1985-12-25"),
    ("date_iso", "R6/3/15", "2024-03-15"),
    ("date_iso", "H30.1.1", "2018-01-01"),
    ("date_iso", "S60-12-25", "1985-12-25"),
    ("date_iso", "R5年1月11日", "2023-01-11"),
    ("date_iso", "2024年3月15日", "2024-03-15"),
    ("date_iso", "2024/3/15", "2024-03-15"),
    ("date_iso", "2024-03-15", "2024-03-15"),
    ("date_iso", "不明な日付", "不明な日付"),
    ("date_yyyymmdd", "令和6年3月15日", "20240315"),
    ("date_yyyymmdd", "R5/01/11", "20230111"),
    ("date_yyyymmdd", "2024/3/15", "20240315"),
    ("time_jp", "14:30", "14時30分"),
    ("time_jp", "9:05:30", "9時05分30秒"),
    ("time_jp", "14時30分", "14時30分"),
    ("time_hms", "14時30分", "14:30:00"),
    ("time_hms", "9:5", "09:05:00"),
    ("time_hms", "14:30:59", "14:30:59"),
    # the reference's \s* tolerance between every component (ADVICE r4
    # item (b)) — incl. non-ASCII whitespace, which Python's \s matches
    ("time_hms", "14 時 30 分 15 秒", "14:30:15"),
    ("time_jp", "9 : 05", "9時05分"),
    ("date_iso", "令和5年 3月2日", "2023-03-02"),  # NBSP: Python \\s matches it, Java \\s alone would not
    ("time_hms", "14 時 30 分", "14:30:00"),
    ("alphanumeric", "ＡＢＣ１２３", "ABC123"),
    ("alphanumeric", "abc 123!@#", "abc123"),
    ("alphanumeric", "商品A01", "A01"),
    ("hiragana", "カタカナ", "かたかな"),
    ("hiragana", "ひらがな", "ひらがな"),
    ("hiragana", "テスト123abc", "てすと"),
    ("hiragana", "カタカナとひらがな混在", "かたかなとひらがな"),
    ("katakana", "ひらがな", "ヒラガナ"),
    ("katakana", "カタカナ", "カタカナ"),
    ("katakana", "テスト123abc", "テスト"),
    ("katakana", "ひらがなとカタカナ混在", "ヒラガナトカタカナ"),
]


def test_reference_normalizer_vectors(spark):
    cols = [
        N.normalize(name, F.lit(text)).alias(f"c{i}")
        for i, (name, text, _) in enumerate(VECTORS)
    ]
    row = spark.range(1).select(*cols).collect()[0]
    bad = [
        (name, text, row[i], expected)
        for i, (name, text, expected) in enumerate(VECTORS)
        if row[i] != expected
    ]
    assert not bad, bad
