"""Analyzer conformance vectors (FIXTURES.md §4) + batch/scalar agreement."""

from __future__ import annotations

import pandas as pd
import pytest

from solr_spark.analysis import ENGLISH_STOPWORDS, analyze_series, analyze_text
from solr_spark.config import IndexConfig

CASES = [
    ("The QUICK brown-fox!", ["quick", "brown", "fox"]),
    ("it's O'Brien's", ["it's", "o'brien's"]),
    ("err404 v2.1.0 3.14", ["err404", "v2.1.0", "3.14"]),
    ("john.doe@example.com", ["john.doe", "example.com"]),
    ("café naïve 東京", ["café", "naïve", "東", "京"]),
    ("", []),
    ("the and of", []),
    ("THE The the", []),  # stop filter is case-insensitive
    ("a_b snake_case", ["a_b", "snake_case"]),
    ("1,000 items", ["1,000", "items"]),
    ("quick,brown", ["quick", "brown"]),
    ("http://example.com/path?q=1", ["http", "example.com", "path", "q", "1"]),
    ("repeat repeat REPEAT", ["repeat", "repeat", "repeat"]),  # tf counting
    ("tabs\tand\nnewlines", ["tabs", "newlines"]),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_conformance(raw, expected):
    assert analyze_text(raw) == expected


def test_stopword_list_size():
    assert len(ENGLISH_STOPWORDS) == 35  # reference lang/stopwords_en.txt entries


def test_max_token_length_split():
    out = analyze_text("x" * 300)
    assert out == ["x" * 255, "x" * 45]


def test_none_handling():
    assert analyze_text(None) == []


def test_batch_matches_scalar():
    texts = [raw for raw, _ in CASES] + [None, "x" * 300]
    got = analyze_series(pd.Series(texts, dtype=object)).tolist()
    assert got == [analyze_text(t) for t in texts]


def test_no_stopwords_mode():
    cfg = IndexConfig(stopwords="none")
    assert analyze_text("the quick fox", cfg) == ["the", "quick", "fox"]


def test_spark_udf_roundtrip(spark):
    from solr_spark.analysis import make_tokenize_udf

    df = spark.createDataFrame([(r,) for r, _ in CASES], "text string")
    tok = make_tokenize_udf()
    rows = df.select(tok("text").alias("tokens")).collect()
    assert [r["tokens"] for r in rows] == [e for _, e in CASES]
