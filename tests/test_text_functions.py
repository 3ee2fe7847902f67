"""Text analysis function tests (charter §2B)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_java_spark.functions import text as TX


def _one(spark, s, expr):
    return spark.createDataFrame([(s,)], "t string").select(expr.alias("x")).first().x


def test_tokens(spark):
    assert _one(spark, "Hello, World! 42", TX.tokens("t")) == ["hello", "world", "42"]
    assert _one(spark, "", TX.tokens("t")) == []
    assert _one(spark, "  a  ", TX.tokens("t")) == ["a"]


def test_token_count_and_chars(spark):
    assert _one(spark, "one two three", TX.token_count("t")) == 3
    assert _one(spark, "abc", TX.char_count("t")) == 3


def test_word_shingles(spark):
    got = _one(spark, "a b c d", TX.word_shingles("t", 3))
    assert got == ["a b c", "b c d"]
    assert _one(spark, "a b", TX.word_shingles("t", 3)) == ["a b"]


def test_stopword_and_punct_ratio(spark):
    r = _one(spark, "the cat and the dog", TX.stopword_ratio("t"))
    assert abs(r - 3 / 5) < 1e-9
    p = _one(spark, "ab,.", TX.punct_ratio("t"))
    assert abs(p - 0.5) < 1e-9


def test_quality_score_bounds(spark):
    good = "this is a reasonably long document with many normal words " * 3
    bad = "!!! ??? ,,, ..."
    assert _one(spark, good, TX.quality_score("t")) >= 0.75
    assert _one(spark, bad, TX.quality_score("t")) <= 0.25


def test_lang_guess(spark):
    assert _one(spark, "the cat is on the mat and the dog", TX.lang_guess("t")) == "en"
    assert _one(spark, "el perro y la casa de que", TX.lang_guess("t")) == "es"
    assert _one(spark, "der hund und die katze ist", TX.lang_guess("t")) == "de"
    assert _one(spark, "zzz qqq", TX.lang_guess("t")) == "und"


def test_bpe_ish_token_count(spark):
    got = _one(spark, "hello world, it's 42 degrees!", TX.bpe_ish_token_count("t"))
    # hello | world | , | it | 's | 42 | degrees | !
    assert got == 8
    assert _one(spark, "", TX.bpe_ish_token_count("t")) == 0


def test_rolling_hash_deterministic(spark):
    a = _one(spark, "hello", TX.rolling_hash("t"))
    b = _one(spark, "hello", TX.rolling_hash("t"))
    c = _one(spark, "hellp", TX.rolling_hash("t"))
    assert a == b
    assert a != c
    # matches the straightforward python reference
    ref = 0
    for ch in "hello":
        ref = (ref * 31 + ord(ch)) % ((1 << 31) - 1)
    assert a == ref


def test_fingerprint_normalizes(spark):
    a = _one(spark, "Hello   World", TX.fingerprint("t"))
    b = _one(spark, "  hello world ", TX.fingerprint("t"))
    c = _one(spark, "hello worlds", TX.fingerprint("t"))
    assert a == b
    assert a != c
    assert len(a) == 32
