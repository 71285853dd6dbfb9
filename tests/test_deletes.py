"""Delete path: soft tombstones at query time, hard purge at merge time.

Mirrors the reference's LSM delete lifecycle (stream/DeleteStream.java,
update/DirectUpdateHandler2.java; Lucene liveDocs): deletes are collect-time
masks that leave df/n_docs/avgdl untouched until a merge purges them.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from solr_spark.config import IndexConfig
from solr_spark.indexing import (
    build_index,
    delete_by_terms,
    delete_docids,
    merge_segments,
)
from solr_spark.query.bm25 import IndexReader, bm25_topk, term_docs

CFG = IndexConfig(range_shift=8, num_term_buckets=8, stopwords="none",
                  lucene_norms=False)


@pytest.fixture()
def del_index(spark, tmp_path):
    rows = [
        ("c0", 0, "u", "error timeout retry", None, None),
        ("c1", 0, "u", "error merge", None, None),
        ("c2", 0, "u", "merge vector", None, None),
        ("c3", 0, "u", "error vector timeout", None, None),
        ("c4", 0, "u", "timeout timeout", None, None),
    ]
    src = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    index_dir = str(tmp_path / "delidx")
    build_index(spark, src, index_dir, CFG, input_token="del-fixture")
    return index_dir


def test_soft_delete_masks_queries_but_not_stats(spark, del_index):
    reader = IndexReader.open(del_index)
    before = {r.docid: r.score for r in
              bm25_topk(spark, reader, "error", k=10).collect()}
    assert len(before) == 3  # c0, c1, c3

    # deleteByQuery: docs containing 'vector' -> c2, c3
    n = delete_by_terms(spark, reader, ["vector"])
    assert n == 2

    after_w = bm25_topk(spark, reader, "error", k=10, mode="wand").collect()
    after_e = bm25_topk(spark, reader, "error", k=10, mode="exact").collect()
    assert [r.asDict() for r in after_w] == [r.asDict() for r in after_e]
    got = {r.docid: r.score for r in after_w}
    # deleted doc gone; SURVIVING scores unchanged (df still counts deleted)
    assert set(got) == {d for d in before if d not in
                        {r["docid"] for r in
                         term_docs(spark, reader, "vector",
                                   apply_deletes=False).collect()}}
    for d, s in got.items():
        assert s == pytest.approx(before[d], abs=1e-12)

    # term_docs masks; phrase path masks
    assert {r["docid"] for r in term_docs(spark, reader, "merge").collect()} \
        == {r["docid"] for r in term_docs(spark, reader, "merge",
                                          apply_deletes=False).collect()} \
        - {r["docid"] for r in term_docs(spark, reader, "vector",
                                         apply_deletes=False).collect()}

    from solr_spark.query.phrase import phrase_topk

    ph = phrase_topk(spark, reader, "merge vector", k=10).collect()
    assert ph == []  # only c2 contained the phrase, and it is tombstoned


def test_merge_purges_tombstones_and_drops_df(spark, del_index):
    reader = IndexReader.open(del_index)
    d0 = spark.read.parquet(os.path.join(del_index, "dictionary"))
    df_merge_before = d0.where(F.col("term") == "merge").head()["df"]
    assert df_merge_before == 2

    delete_by_terms(spark, reader, ["vector"])  # tombstone c2, c3
    merge_segments(spark, del_index, CFG)

    # tombstones applied + cleared
    assert not os.path.isdir(os.path.join(del_index, "deletes"))
    reader2 = IndexReader.open(del_index)
    d1 = spark.read.parquet(os.path.join(del_index, "dictionary"))
    assert d1.where(F.col("term") == "merge").head()["df"] == 1
    assert d1.where(F.col("term") == "vector").head() is None  # fully purged

    live = {r["docid"] for r in term_docs(spark, reader2, "error").collect()}
    assert len(live) == 2  # c0, c1
    # queries after purge == queries under soft delete (ranks and membership)
    got = bm25_topk(spark, reader2, "timeout", k=10).collect()
    assert {r.conv_id for r in got} == {"c0", "c4"}


def test_delete_docids_direct(spark, del_index):
    reader = IndexReader.open(del_index)
    delete_docids(spark, del_index,
                  spark.createDataFrame([(0,)], "docid long"))
    assert 0 not in {r["docid"] for r in
                     term_docs(spark, reader, "error").collect()}
