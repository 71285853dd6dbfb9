"""Partition invariance + checkpoint-resume (FIXTURES.md §6).

The BaseDistributedSearchTestCase diff trick (reference:
solr/test-framework/src/java/org/apache/solr/BaseDistributedSearchTestCase.java): the
same corpus indexed at 1 partition and at 8 partitions must produce identical
dictionaries and identical top-k. Resume: delete a stage's manifest (simulating a kill
mid-stage) and rebuild — stages with intact manifests are skipped, output identical.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from solr_spark.config import IndexConfig
from solr_spark.indexing import build_index
from solr_spark.query import IndexReader, bm25_topk


def _dict_rows(spark, index_dir):
    rows = spark.read.parquet(os.path.join(index_dir, "dictionary")).collect()
    return sorted((r["term"], r["df"], r["cf"], r["max_tf"]) for r in rows)


def _topk(spark, index_dir, q="error timeout", k=20):
    reader = IndexReader.open(index_dir)
    return [
        (r["conv_id"], r["turn_idx"], r["docid"], round(r["score"], 9))
        for r in bm25_topk(spark, reader, q, k=k).collect()
    ]


def test_partition_invariance(spark, small_corpus, tmp_path):
    cfg = IndexConfig(range_shift=8, num_term_buckets=16)
    dir1 = str(tmp_path / "p1")
    dir8 = str(tmp_path / "p8")
    build_index(spark, small_corpus.coalesce(1), dir1, cfg,
                input_token="inv", num_partitions=1)
    build_index(spark, small_corpus.repartition(8), dir8, cfg,
                input_token="inv", num_partitions=8)
    assert _dict_rows(spark, dir1) == _dict_rows(spark, dir8)
    assert _topk(spark, dir1) == _topk(spark, dir8)


def test_resume_skips_complete_stages_and_is_identical(spark, small_corpus, tmp_path):
    cfg = IndexConfig(range_shift=8, num_term_buckets=16)
    index_dir = str(tmp_path / "resume")
    build_index(spark, small_corpus, index_dir, cfg, input_token="res")
    baseline_dict = _dict_rows(spark, index_dir)
    baseline_topk = _topk(spark, index_dir)
    analyzed_files = sorted(os.listdir(os.path.join(index_dir, "analyzed", "batch-000")))

    # simulate a kill between seg-000 and dictionary: drop the dictionary manifest
    os.remove(os.path.join(index_dir, "_manifests", "dictionary.json"))
    build_index(spark, small_corpus, index_dir, cfg, input_token="res")
    # earlier stages were NOT rewritten (same files), later stage was redone
    assert sorted(os.listdir(os.path.join(index_dir, "analyzed", "batch-000"))) == analyzed_files
    assert _dict_rows(spark, index_dir) == baseline_dict
    assert _topk(spark, index_dir) == baseline_topk


def test_resume_detects_input_change(spark, small_corpus, tmp_path):
    cfg = IndexConfig(range_shift=8, num_term_buckets=16)
    index_dir = str(tmp_path / "chg")
    build_index(spark, small_corpus, index_dir, cfg, input_token="tok-a")
    with open(os.path.join(index_dir, "_manifests", "analyzed.json")) as f:
        first = json.load(f)["written_at"]
    # same data, different lineage token -> full rebuild
    build_index(spark, small_corpus, index_dir, cfg, input_token="tok-b")
    with open(os.path.join(index_dir, "_manifests", "analyzed.json")) as f:
        second = json.load(f)["written_at"]
    assert second > first


def test_incremental_add_and_merge(spark, small_corpus, tmp_path, oracle):
    """add_documents appends a segment; merge_segments folds to one; results match
    an oracle over the concatenated corpus (arrival-ordered docids)."""
    from solr_spark.data import synth_transcripts_pandas
    from solr_spark.indexing.merge import add_documents, merge_segments
    from solr_spark.oracle import OracleIndex

    cfg = IndexConfig(range_shift=8, num_term_buckets=16)
    index_dir = str(tmp_path / "lsm")
    build_index(spark, small_corpus, index_dir, cfg, input_token="base")

    extra_pdf = synth_transcripts_pandas(300, seed=99)
    extra_pdf["conv_id"] = "x" + extra_pdf["conv_id"]  # distinct conversations
    extra = spark.createDataFrame(extra_pdf, small_corpus.schema)
    add_documents(spark, extra, index_dir, cfg)

    ora = OracleIndex(cfg)
    base_pdf_rows = oracle.docs  # docid -> (conv_id, turn_idx), already in rank order
    # rebuild an oracle with arrival order: base corpus first, then the extra batch
    from solr_spark.data import synth_transcripts_pandas as _synth

    base_pdf = _synth(1000, seed=42)
    for c, t, x in sorted(
        zip(base_pdf["conv_id"], base_pdf["turn_idx"], base_pdf["text"])
    ):
        ora.add(c, t, x)
    for c, t, x in sorted(
        zip(extra_pdf["conv_id"], extra_pdf["turn_idx"], extra_pdf["text"])
    ):
        ora.add(c, t, x)
    assert len(base_pdf_rows) + len(extra_pdf) == ora.n_docs

    got = _topk(spark, index_dir, "error timeout", 25)
    exp = [(c, t, d, round(s, 9)) for c, t, d, s in ora.topk("error timeout", 25)]
    assert got == exp

    # merge to a single segment: identical results
    names = merge_segments(spark, index_dir, cfg)
    assert names == ["merged-000"]
    assert _topk(spark, index_dir, "error timeout", 25) == exp
    seg_dirs = sorted(os.listdir(os.path.join(index_dir, "segments")))
    assert "merged-000" in seg_dirs


def test_events_table_unrelated_smoke(spark):
    """Sanity: the driver-provided testdata is readable (used by operator tests)."""
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    assert df.count() > 0
    assert "l_orderkey" in df.columns
