"""Exact duplicated-substring spans (ExactSubstr role, Lee et al. 2022)."""

from __future__ import annotations

import pytest

from solr_spark.functions.dedup import (duplicated_spans,
                                        remove_duplicated_spans)


def _docs(spark):
    # "one two three four five" (5 tokens) is shared by docs 1 and 2;
    # doc 3 repeats "a b c d" twice WITHIN itself; doc 4 is clean;
    # doc 5 is shorter than min_tokens and must emit nothing.
    return spark.createDataFrame(
        [
            (1, "x one two three four five y z"),
            (2, "p q one two three four five r"),
            (3, "a b c d mid a b c d tail1 tail2"),
            (4, "totally unique tokens here nothing repeats at all ok"),
            (5, "tiny doc"),
        ],
        "doc_id int, text string",
    )


def _spans(df, **kw):
    return {(r["doc_id"], r["span_start"], r["span_end"])
            for r in df.collect()}


def test_cross_doc_duplicated_span(spark):
    got = _spans(duplicated_spans(_docs(spark), "doc_id", "text",
                                  min_tokens=5))
    # doc 1: tokens 1..5 = "one two three four five"; doc 2: tokens 2..6
    assert (1, 1, 6) in got
    assert (2, 2, 7) in got
    assert not any(d == 4 or d == 5 for d, _, _ in got)


def test_within_doc_repeat_counts_by_default(spark):
    got = _spans(duplicated_spans(_docs(spark), "doc_id", "text",
                                  min_tokens=4))
    # "a b c d" occurs twice within doc 3: positions 0..3 and 5..8
    assert (3, 0, 4) in got
    assert (3, 5, 9) in got


def test_cross_doc_only_excludes_within_doc(spark):
    got = _spans(duplicated_spans(_docs(spark), "doc_id", "text",
                                  min_tokens=4, cross_doc_only=True))
    assert not any(d == 3 for d, _, _ in got)
    # the cross-doc duplicate survives the distinct-doc census
    assert any(d == 1 for d, _, _ in got)


def test_overlapping_grams_merge_to_one_maximal_span(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h tail"), (2, "a b c d e f g h other")],
        "doc_id int, text string")
    got = _spans(duplicated_spans(docs, "doc_id", "text", min_tokens=3))
    # 6 duplicated 3-grams per doc merge into ONE [0, 8) span each
    assert got == {(1, 0, 8), (2, 0, 8)}


def test_span_exactness_no_overmark(spark):
    # shared PREFIX only: "c1 c2 c3" — the span must stop at token 3,
    # even though longer grams straddling the boundary exist in each doc.
    docs = spark.createDataFrame(
        [(1, "c1 c2 c3 a1 a2 a3"), (2, "c1 c2 c3 b1 b2 b3")],
        "doc_id int, text string")
    got = _spans(duplicated_spans(docs, "doc_id", "text", min_tokens=3))
    assert got == {(1, 0, 3), (2, 0, 3)}


def test_remove_duplicated_spans(spark):
    rows = {r["doc_id"]: r.asDict()
            for r in remove_duplicated_spans(
                _docs(spark), "doc_id", "text", min_tokens=5).collect()}
    assert rows[1]["cleaned_text"] == "x y z"
    assert rows[1]["n_tokens_removed"] == 5
    assert rows[2]["cleaned_text"] == "p q r"
    assert rows[4]["cleaned_text"] == rows[4]["text"]
    assert rows[4]["n_tokens_removed"] == 0
    assert rows[5]["cleaned_text"] == "tiny doc"  # short doc untouched


def test_remove_can_empty_a_doc(spark):
    docs = spark.createDataFrame(
        [(1, "same five tokens exactly here"),
         (2, "same five tokens exactly here")],
        "doc_id int, text string")
    rows = {r["doc_id"]: r.asDict()
            for r in remove_duplicated_spans(
                docs, "doc_id", "text", min_tokens=5).collect()}
    # every occurrence is cut (the released-tool semantics): both empty
    assert rows[1]["cleaned_text"] == "" and rows[2]["cleaned_text"] == ""
    assert rows[1]["n_tokens_kept"] == 0


def test_min_tokens_guard(spark):
    with pytest.raises(ValueError):
        duplicated_spans(_docs(spark), "doc_id", "text", min_tokens=1)


def test_semantic_decontaminate_flags_planted_leak(spark):
    from solr_spark.functions.dedup import semantic_decontaminate
    # bench vec 100 == train vec 1 (planted leak); train vec 2 orthogonal
    rows = [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]),
            (3, [0.0, 0.0, 1.0]), (100, [1.0, 0.0, 0.0]),
            (101, [0.7, 0.7, 0.0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    train = df.where("vec_id < 100")
    bench = df.where("vec_id >= 100")
    got = {r["vec_id"]: r.asDict()
           for r in semantic_decontaminate(
               train, bench, "vec_id", "embedding", 0.95,
               n_centroids=2, train=True, iters=3).collect()}
    assert 1 in got and got[1]["max_cosine"] == 1.0
    assert 3 not in got  # orthogonal to every bench vector
