"""Multi-shard serving (query/shards.py): shard-split + merged top-k must be
rank- and score-identical to the unsharded searcher — the ExactStatsCache +
mergeIds contract."""

from __future__ import annotations

import pytest

from solr_spark.config import IndexConfig
from solr_spark.data import synth_transcripts_spark
from solr_spark.indexing import build_index
from solr_spark.query import (
    IndexReader,
    LocalSearcher,
    ShardedSearcher,
    bm25_topk,
    shard_index,
)

CFG = IndexConfig(range_shift=7, num_term_buckets=16)  # many ranges -> shards
QUERIES = ["error timeout", "deploy failed retry", "database",
           "the and of", "error"]


@pytest.fixture(scope="module")
def sharded(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("shard_idx"))
    corpus = synth_transcripts_spark(spark, 2000, seed=7)
    build_index(spark, corpus, idx, CFG, input_token="shard-2000",
                stored_cols=("role",))
    reader = IndexReader.open(idx, CFG)
    out = str(tmp_path_factory.mktemp("shards"))
    dirs = shard_index(spark, reader, out, n_shards=4)
    return idx, dirs


def test_shards_partition_the_corpus(spark, sharded):
    idx, dirs = sharded
    reader = IndexReader.open(idx, CFG)
    total = reader.forward(spark).count()
    per_shard = [IndexReader.open(d).forward(spark).count() for d in dirs]
    assert sum(per_shard) == total
    assert all(n > 0 for n in per_shard)
    # every shard scores with GLOBAL stats
    for d in dirs:
        sr = IndexReader.open(d)
        assert sr.n_docs == reader.n_docs and sr.avgdl == reader.avgdl


def test_merged_identical_to_unsharded(spark, sharded):
    idx, dirs = sharded
    reader = IndexReader.open(idx, CFG)
    single = LocalSearcher(reader)
    merged = ShardedSearcher(dirs)
    for q in QUERIES:
        for sim in ("bm25", "lmdirichlet"):
            want = single.search(q, k=10, similarity=sim)
            got = merged.search(q, k=10, similarity=sim)
            assert got == want, (q, sim)


def test_merged_matches_distributed_topk(spark, sharded):
    idx, dirs = sharded
    reader = IndexReader.open(idx, CFG)
    merged = ShardedSearcher(dirs)
    for q in QUERIES[:2]:
        want = [(r.docid, round(r.score, 10))
                for r in bm25_topk(spark, reader, q, k=10).collect()]
        got = [(h["docid"], round(h["score"], 10))
               for h in merged.search(q, k=10)]
        assert got == want, q


def test_merged_filtered_search(spark, sharded):
    idx, dirs = sharded
    reader = IndexReader.open(idx, CFG)
    merged = ShardedSearcher(dirs)
    want = [(r.docid, round(r.score, 10)) for r in bm25_topk(
        spark, reader, "error timeout", k=10,
        filters=["role:assistant"]).collect()]
    got = [(h["docid"], round(h["score"], 10))
           for h in merged.search("error timeout", k=10,
                                  filters=["role:assistant"])]
    assert got == want
