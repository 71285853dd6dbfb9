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


def test_jvm_tokenizer_matches_python(spark):
    """The pure-JVM tokenize_column must agree with the Python analyzer on every
    conformance vector, the long-token split, and a randomized synthetic corpus
    (it's the index build's production path)."""
    from solr_spark.analysis.analyzer import tokenize_column
    from solr_spark.data import synth_transcripts_spark

    texts = [raw for raw, _ in CASES] + ["x" * 300, "MIXED case And STOPs the"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r[0] for r in df.select(tokenize_column("text")).collect()]
    assert got == [analyze_text(t) for t in texts]

    corpus = synth_transcripts_spark(spark, 500, seed=99).select("text")
    jvm = [r[0] for r in corpus.select(tokenize_column("text")).collect()]
    py = [analyze_text(r[0]) for r in corpus.collect()]
    assert jvm == py


def test_jvm_tokenizer_no_stopwords(spark):
    from solr_spark.analysis.analyzer import tokenize_column

    cfg = IndexConfig(stopwords="none")
    df = spark.createDataFrame([("the quick fox",)], "text string")
    assert df.select(tokenize_column("text", cfg)).head()[0] == \
        ["the", "quick", "fox"]
