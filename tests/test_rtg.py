"""Realtime get (query/rtg.py): latest-version-by-key visibility before any
searcher reopen — adds, re-adds (version supersession), and tombstones.
Reference behavior: RealTimeGetComponent /get (update log before index)."""

from __future__ import annotations

import pytest

from solr_spark.config import IndexConfig
from solr_spark.data import synth_transcripts_spark
from solr_spark.indexing import build_index
from solr_spark.query import IndexReader, LocalSearcher, realtime_get

CFG = IndexConfig(range_shift=9, num_term_buckets=16)


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "rtg_idx")
    corpus = synth_transcripts_spark(spark, 400, seed=7)
    build_index(spark, corpus, d, CFG, input_token="rtg-400",
                stored_cols=("role",))
    return d


def _mk_batch(spark, rows):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
    ])
    return spark.createDataFrame(rows, schema)


def test_rtg_point_read_and_missing_keys(spark, idx):
    import pyarrow.parquet as pq
    import os

    sample = pq.ParquetDataset(os.path.join(idx, "analyzed")).read(
        columns=["conv_id", "turn_idx"]).to_pandas().iloc[0]
    key = (sample["conv_id"], int(sample["turn_idx"]))
    got = realtime_get(idx, [key, ("no-such-conv", 0)])
    assert len(got) == 1
    assert (got[0]["conv_id"], got[0]["turn_idx"]) == key
    assert got[0]["toks"]
    assert realtime_get(idx, []) == []


def test_rtg_sees_uncommitted_adds_and_latest_version(spark, idx):
    from solr_spark.indexing.merge import add_documents

    # a searcher opened NOW will not see the batch added after it...
    ls = LocalSearcher(IndexReader.open(idx, CFG))
    assert ls.search("xylophone", k=5) == []

    add_documents(spark, _mk_batch(spark, [
        ("rtg-conv", 0, "user", "xylophone quartz request"),
    ]), idx, CFG)
    # ...but realtime_get does, without any reopen
    got = realtime_get(idx, [("rtg-conv", 0)])
    assert len(got) == 1 and "xylophone" in got[0]["toks"]
    assert ls.search("xylophone", k=5) == []  # stale searcher stays stale

    # a re-add of the same key supersedes: latest docid wins
    add_documents(spark, _mk_batch(spark, [
        ("rtg-conv", 0, "user", "xylophone quartz request amended"),
    ]), idx, CFG)
    got2 = realtime_get(idx, [("rtg-conv", 0)])
    assert len(got2) == 1 and "amended" in got2[0]["toks"]
    assert got2[0]["docid"] > got[0]["docid"]


def test_rtg_respects_tombstones(spark, idx):
    from solr_spark.indexing.deletes import delete_docids
    from solr_spark.indexing.merge import add_documents

    add_documents(spark, _mk_batch(spark, [
        ("rtg-del", 3, "assistant", "ephemeral doomed document"),
    ]), idx, CFG)
    (doc,) = realtime_get(idx, [("rtg-del", 3)])
    delete_docids(spark, idx,
                  spark.createDataFrame([(doc["docid"],)], "docid long"))
    assert realtime_get(idx, [("rtg-del", 3)]) == []
