"""Encoding repair (text.fix_mojibake / clean_text): cp1252 and latin-1
mojibake roundtrips, guard behavior on unfixable/clean/non-latin text,
iterative double-encoding repair, and the pure-Catalyst plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_snapshot_spark.operators.text import clean_text, fix_mojibake

CP1252_MAP = {
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E, 0x85: 0x2026,
    0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030, 0x8A: 0x0160,
    0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019,
    0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A, 0x9C: 0x0153,
    0x9E: 0x017E, 0x9F: 0x0178,
}


def _mojibake(s: str) -> str:
    """UTF-8 bytes misread as cp1252 (unmapped bytes → C1 controls —
    the 'sloppy cp1252' every real-world misdecoder effectively uses)."""
    return "".join(chr(CP1252_MAP.get(b, b)) for b in s.encode("utf-8"))


def _fix(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    return [r.f for r in
            df.select(fix_mojibake(F.col("text")).alias("f")).collect()]


def test_roundtrip_cp1252(spark):
    originals = [
        "café — naïve “quoted” résumé",
        "€100 • l'œuvre † Škoda",
        "日本語テキスト",                 # 3-byte sequences
        "emoji 🎉 four-byte",            # 4-byte sequence
    ]
    fixed = _fix(spark, [_mojibake(s) for s in originals])
    assert fixed == originals


def test_latin1_only_mojibake(spark):
    # misdecode via pure latin-1 (no cp1252 punctuation involved)
    orig = "über schön ñandú"
    moji = orig.encode("utf-8").decode("latin-1")
    assert _fix(spark, [moji]) == [orig]


def test_clean_and_unfixable_pass_through(spark):
    cases = [
        "plain ascii text",
        "héllo real accents",            # real latin-1 text, no moji shape
        "正常な中国語と日本語",            # non-latin text untouched
        "mixed 中文 with cafÃ© inside",   # non-latin1 chars block repair
        "truncated artifact â€",         # lost 0x9D byte → invalid UTF-8
    ]
    assert _fix(spark, cases) == cases


def test_double_encoded_repairs_iteratively(spark):
    orig = "café"
    double = _mojibake(_mojibake(orig))
    once = _fix(spark, [double])
    assert once == [_mojibake(orig)]
    assert _fix(spark, once) == [orig]


def test_null_and_empty(spark):
    df = spark.createDataFrame([(None,), ("",)], "text string")
    got = [r.f for r in
           df.select(fix_mojibake(F.col("text")).alias("f")).collect()]
    assert got == [None, ""]


def test_clean_text_controls_and_whitespace(spark):
    df = spark.createDataFrame(
        [(0, "a\x00b\x1fc\td\ne"), (1, "w   ide   gaps")],
        ["doc_id", "text"])
    got = {r.doc_id: r.text for r in clean_text(
        df, collapse_whitespace=True).collect()}
    assert got[0] == "abc\td\ne"          # controls gone, \t \n kept
    assert got[1] == "w ide gaps"
    # control-strip also removes C1 leftovers from unfixable mojibake
    df2 = spark.createDataFrame([(0, "x\x9dy")], ["doc_id", "text"])
    assert clean_text(df2).collect()[0].text == "xy"


def test_roundtrip_property(spark):
    """Hypothesis: for any text over a mixed alphabet (ascii, accents,
    cp1252 punctuation, CJK, emoji) containing at least one multi-byte
    char, fix(mojibake(text)) == text.  Batched into one Spark job."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from(
        list("abc XYZ,.!?") + list("éüñàß€""•–—œŠ") + list("中文日éた🎉"))
    texts: list[str] = []

    @settings(max_examples=60, deadline=None)
    @given(st.lists(alphabet, min_size=1, max_size=30).map("".join))
    def collect(s):
        if any(ord(c) > 0x7F for c in s):
            texts.append(s)

    collect()
    assert texts
    fixed = _fix(spark, [_mojibake(s) for s in texts])
    assert fixed == texts


def test_fix_mojibake_plan_pure_catalyst(spark):
    df = spark.createDataFrame([("t",)], ["text"])
    out = clean_text(df, collapse_whitespace=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
