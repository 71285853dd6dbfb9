"""Span algebra: surround-family W/N/OR/NOT with nesting
(reference: SurroundQParserPlugin.java:41, ComplexPhraseQParserPlugin.java;
see solr_spark/query/spans.py for the documented set-valued semantics)."""

from __future__ import annotations

import math

import pytest

from solr_spark.query.spans import (
    SpanNear,
    SpanNot,
    SpanOr,
    SpanTerm,
    span_eval,
    span_topk,
)

POS = {"a": [0, 3], "b": [1], "c": [2]}  # doc "a b c a"


def test_span_eval_vectors():
    a, b, c = SpanTerm("a"), SpanTerm("b"), SpanTerm("c")
    assert span_eval(a, POS) == [(0, 1), (3, 4)]
    assert span_eval(SpanOr(a, b), POS) == [(0, 1), (1, 2), (3, 4)]
    assert span_eval(SpanNear([a, b], 0, True), POS) == [(0, 2)]
    assert span_eval(SpanNear([a, c], 1, True), POS) == [(0, 3)]
    assert span_eval(SpanNear([c, a], 0, True), POS) == [(2, 4)]
    # unordered: non-overlapping, budget on total gap
    assert span_eval(SpanNear([a, b], 0, False), POS) == [(0, 2)]
    assert span_eval(SpanNear([a, b], 1, False), POS) == [(0, 2), (1, 4)]
    # not: include spans overlapping an exclude span drop out
    phrase_ab = SpanNear([a, b], 0, True)
    assert span_eval(SpanNot(a, phrase_ab), POS) == [(3, 4)]
    # nesting: or() inside near()
    nested = SpanNear([SpanOr(a, b), c], 0, True)
    assert span_eval(nested, POS) == [(1, 3)]
    # three-clause ordered chain
    assert span_eval(SpanNear([a, b, c], 0, True), POS) == [(0, 3)]
    assert span_eval(SpanNear([a, b, SpanTerm("zzz")], 5, True), POS) == []


def test_span_topk_end_to_end(spark, tmp_path):
    from solr_spark.config import IndexConfig
    from solr_spark.indexing import build_index
    from solr_spark.query.bm25 import IndexReader

    docs = {
        "d1": "fast scan runs",          # fast..scan adjacent
        "d2": "slow x x scan",           # slow..scan gap 2 (within slop 2)
        "d3": "scan fast",               # wrong order for the ordered query
        "d4": "fast x x x x scan",       # gap 4 > slop
        "d5": "merge join",              # no clause terms
    }
    rows = [(cid, 0, "u", t, None, None) for cid, t in sorted(docs.items())]
    src = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    cfg = IndexConfig(range_shift=8, num_term_buckets=4, stopwords="none",
                      lucene_norms=False)
    index_dir = str(tmp_path / "spanidx")
    build_index(spark, src, index_dir, cfg, input_token="span-fixture")
    reader = IndexReader.open(index_dir)

    q = SpanNear([SpanOr(SpanTerm("fast"), SpanTerm("slow")),
                  SpanTerm("scan")], slop=2, ordered=True)
    got = {r.conv_id: r for r in span_topk(spark, reader, q, k=10).collect()}
    assert set(got) == {"d1", "d2"}
    # scoring contract: BM25 with tf = |span set| = 1, df = 2
    n, df = reader.n_docs, 2
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    for cid in got:
        dl = len(docs[cid].split())
        want = idf * 1.0 / (1.0 + cfg.k1 * (1 - cfg.b + cfg.b * dl / reader.avgdl))
        assert got[cid].score == pytest.approx(want, abs=1e-9)

    # unordered finds the reversed doc too
    qn = SpanNear([SpanOr(SpanTerm("fast"), SpanTerm("slow")),
                   SpanTerm("scan")], slop=2, ordered=False)
    got_n = {r.conv_id for r in span_topk(spark, reader, qn, k=10).collect()}
    assert got_n == {"d1", "d2", "d3"}

    # span_not drops the phrase-overlapping occurrence
    qnot = SpanNot(SpanTerm("scan"),
                   SpanNear([SpanTerm("fast"), SpanTerm("scan")], 0, True))
    got_not = {r.conv_id for r in span_topk(spark, reader, qnot, k=10).collect()}
    assert got_not == {"d2", "d3", "d4"}  # d1's 'scan' sits inside 'fast scan'


def test_span_fanout_guard():
    """Hostile repetition fails loudly rather than hanging an executor."""
    a, b, c = SpanTerm("a"), SpanTerm("b"), SpanTerm("c")
    pos = {"a": list(range(0, 600, 3)), "b": list(range(1, 600, 3)),
           "c": list(range(2, 600, 3))}
    with pytest.raises(ValueError, match="fan-out"):
        span_eval(SpanNear([a, b, c], 5, False), pos)
    # two-clause stays under the cap and works
    assert span_eval(SpanNear([a, b], 0, True), pos)


def test_complex_phrase_topk(spark, tmp_path):
    """ComplexPhraseQParser role (ComplexPhraseQParserPlugin.java:43):
    wildcard + fuzzy words inside a phrase, dictionary-expanded to SpanOrs
    under a SpanNear with the phrase slop."""
    from solr_spark.config import IndexConfig
    from solr_spark.indexing import build_index
    from solr_spark.query.bm25 import IndexReader
    from solr_spark.query.multiterm import complex_phrase_topk

    docs = {
        "d1": "fast scan query runs",    # fast s* quer~1: adjacent chain
        "d2": "fast sort x query",       # one gap, within slop 1
        "d3": "fast x x sort query",     # fast..s* gap 2 -> width over slop
        "d4": "query sort fast",         # wrong order
        "d5": "fast scan merge",         # no quer~1 clause match
        "d6": "slow stream query",       # no 'fast'
    }
    rows = [(cid, 0, "u", t, None, None) for cid, t in sorted(docs.items())]
    src = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    cfg = IndexConfig(range_shift=8, num_term_buckets=4, stopwords="none",
                      lucene_norms=False)
    index_dir = str(tmp_path / "cpidx")
    build_index(spark, src, index_dir, cfg, input_token="cp-fixture")
    reader = IndexReader.open(index_dir)

    got = {r.conv_id: r for r in complex_phrase_topk(
        spark, reader, "fast s* quer~1", k=10, slop=1).collect()}
    assert set(got) == {"d1", "d2"}
    # scoring contract: BM25 with tf = |span set| = 1, query-time df = 2
    n, df = reader.n_docs, 2
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    for cid in got:
        dl = len(docs[cid].split())
        want = idf * 1.0 / (1.0 + cfg.k1 * (1 - cfg.b + cfg.b * dl / reader.avgdl))
        assert got[cid].score == pytest.approx(want, abs=1e-9)

    # unordered admits the reversed doc (inOrder=false local param)
    got_u = {r.conv_id for r in complex_phrase_topk(
        spark, reader, "fast s* quer~1", k=10, slop=1,
        ordered=False).collect()}
    assert "d4" in got_u and got_u >= {"d1", "d2"}

    # a clause with an empty expansion matches nothing
    assert complex_phrase_topk(spark, reader, "fast zz* query", k=10).count() == 0

    # single-word phrase degrades to the plain span-term path
    one = complex_phrase_topk(spark, reader, "quer~1", k=10)
    assert {r.conv_id for r in one.collect()} == {"d1", "d2", "d3", "d4", "d6"}
