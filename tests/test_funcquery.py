"""Corpus-dependent function queries: scale / recip / ms / ord / rord
(ScaleFloatFunction, ReciprocalFloatFunction, OrdFieldSource roles)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_spark.functions.funcquery import ms, recip, scale_fq, with_ord


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(1, 10.0, "b", "2024-01-01 00:00:00"),
         (2, 20.0, "a", "2024-01-02 00:00:00"),
         (3, 30.0, "c", "2024-01-01 12:00:00"),
         (4, None, None, None)],
        "id int, v double, s string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_scale_maps_corpus_min_max(df):
    rows = {r.id: r.scale_v for r in scale_fq(df, "v", 0.0, 1.0).collect()}
    assert rows[1] == 0.0 and rows[3] == 1.0
    assert abs(rows[2] - 0.5) < 1e-12
    assert rows[4] is None  # null value stays null


def test_scale_degenerate_corpus_is_midpoint(df):
    one = scale_fq(df.where("id=1"), "v", 0.0, 10.0).collect()[0]
    assert one.scale_v == 5.0


def test_recip_and_ms(df):
    r = df.where("id=1").select(recip(F.col("v"), 0.1, 1, 1).alias("r"))
    assert abs(r.collect()[0].r - 1 / (0.1 * 10 + 1)) < 1e-12
    got = {x.id: x for x in df.select(
        "id", ms("ts").alias("m"),
        ms("ts", F.lit("2024-01-01 00:00:00")).alias("d")).collect()}
    assert got[2].d == 86_400_000 and got[3].d == 43_200_000
    assert got[4].m is None


def test_ord_rord(df):
    od = {r.id: r.ord_s for r in with_ord(df, "s").collect()}
    assert od == {1: 2, 2: 1, 3: 3, 4: 0}  # null -> ordinal 0
    rod = {r.id: r.rord_s for r in with_ord(df, "s", reverse=True).collect()}
    assert rod == {1: 2, 2: 3, 3: 1, 4: 0}


def test_external_file_field(spark, tmp_path):
    """ExternalFileField / FileFloatSource: key=value parse, malformed lines
    skipped, last duplicate wins, defVal on missing keys."""
    from solr_spark.functions.funcquery import (
        load_external_floats,
        with_external_field,
    )

    p = str(tmp_path / "external_rank")
    with open(p, "w") as f:
        f.write("a=1.5\n")
        f.write("b=2.0\n")
        f.write("garbage line\n")
        f.write("c=notafloat\n")
        f.write("a=9.5\n")          # duplicate: last wins
        f.write("=3.0\n")           # empty key: skipped
    ext = load_external_floats(spark, p)
    got = {r.key: r.value for r in ext.collect()}
    assert got == {"a": 9.5, "b": 2.0}
    docs = spark.createDataFrame([("a",), ("b",), ("z",)], "id string")
    out = with_external_field(docs, ext, "id", "rank", default=0.5)
    vals = {r.id: r.rank for r in out.collect()}
    assert vals == {"a": 9.5, "b": 2.0, "z": 0.5}


def test_query_value_source(spark, built_index):
    """query($q) (ValueSourceParser.java:389 QueryValueSource): the
    subquery's BM25 score as a value, defVal for non-matching docs; the
    attached column equals the full-match-set bm25_topk scores."""
    from solr_spark.functions.funcquery import query_scores, with_query_score
    from solr_spark.query.bm25 import IndexReader, bm25_topk

    index_dir, cfg, _ = built_index
    reader = IndexReader.open(index_dir, cfg)
    scores = query_scores(spark, reader, "error timeout")
    want = {r.docid: r.score for r in
            bm25_topk(spark, reader, "error timeout",
                      k=reader.n_docs, mode="exact").collect()}
    got = {r.docid: r.qscore for r in scores.collect()}
    assert got == want and len(got) > 0

    # defVal fills non-matching docids; matching docids keep their score
    all_docs = reader.doc_map(spark).select("docid")
    n_total = all_docs.count()
    joined = with_query_score(all_docs, scores, default=-1.0)
    rows = {r.docid: r.qscore for r in joined.collect()}
    assert len(rows) == n_total
    assert all(v == -1.0 for d, v in rows.items() if d not in want)
    assert all(abs(rows[d] - s) < 1e-12 for d, s in want.items())
