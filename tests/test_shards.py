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


# ----------------------------------- distributed components (round 5)


def test_sharded_facets_identical_to_unsharded(spark, sharded):
    """Sharded facet merge (per-shard raw buckets summed, avg re-divided)
    must equal the single-searcher facets exactly — counts are per-shard
    disjoint, so no refinement is needed."""
    idx, dirs = sharded
    single = LocalSearcher(IndexReader.open(idx, CFG))
    merged = ShardedSearcher(dirs)
    req = {
        "by_role": {"type": "terms", "field": "role", "limit": 3,
                    "facet": {"mean_turn": "avg(turn_idx)",
                              "max_turn": "max(turn_idx)"}},
        "turns": {"type": "range", "field": "turn_idx",
                  "start": 0, "gap": 5},
        "assistants": {"type": "query", "q": "role:assistant"},
        "mean_turn": "avg(turn_idx)",
    }
    for kw in ({}, {"query": "error timeout"},
               {"filters": ["turn_idx:[1 TO *]"]}):
        want = single.facets(req, **kw)
        got = merged.facets(req, **kw)
        for name in req:
            w, g = want[name], got[name]
            assert len(w) == len(g), (name, kw)
            for rw, rg in zip(w, g):
                assert rw.keys() == rg.keys(), (name, kw)
                for k in rw:
                    if isinstance(rw[k], float):
                        assert abs(rw[k] - rg[k]) < 1e-9, (name, k, kw)
                    else:
                        assert rw[k] == rg[k], (name, k, kw)


def test_sharded_facets_unique_raises(sharded):
    _idx, dirs = sharded
    merged = ShardedSearcher(dirs)
    with pytest.raises(ValueError, match="unique"):
        merged.facets({"u": {"type": "terms", "field": "role",
                             "facet": {"n": "unique(conv_id)"}}})


def test_sharded_suggest_and_spellcheck_parity(spark, sharded):
    """Suggest/spellcheck fan-out: merged results equal the unsharded
    searcher's (shard dictionaries are global ExactStatsCache copies)."""
    idx, dirs = sharded
    single = LocalSearcher(IndexReader.open(idx, CFG))
    merged = ShardedSearcher(dirs)
    assert merged.suggest("re", k=10) == single.suggest("re", k=10)
    assert merged.suggest_infix("im", k=10) == \
        single.suggest_infix("im", k=10)
    assert merged.suggest_fuzzy("tymeout", k=5) == \
        single.suggest_fuzzy("tymeout", k=5)


def test_sharded_rtg_point_read(spark, sharded):
    """Distributed /get: keys resolve across shards, latest version wins,
    missing keys are absent."""
    from solr_spark.query.rtg import realtime_get

    idx, dirs = sharded
    reader = IndexReader.open(idx, CFG)
    rows = reader.forward(spark).select("conv_id", "turn_idx") \
        .orderBy("docid").limit(5).collect()
    keys = [(r["conv_id"], r["turn_idx"]) for r in rows]
    merged = ShardedSearcher(dirs)
    got = merged.realtime_get(keys + [("no-such-conv", 0)])
    want = realtime_get(idx, keys)
    assert [(r["conv_id"], r["turn_idx"], r["docid"]) for r in got] == \
        [(r["conv_id"], r["turn_idx"], r["docid"]) for r in want]


def test_sharded_field_sorted_search(spark, sharded):
    """sort=field fans out through search(**kw); the coordinator's merge
    key is (score, docid) so field-sorted pages merge per-shard — assert
    per-shard pages union to the single searcher's page set."""
    idx, dirs = sharded
    single = LocalSearcher(IndexReader.open(idx, CFG))
    want = single.search("error timeout", k=10, sort="conv_id desc",
                         filters=["role:assistant"])
    per_shard = [s.search("error timeout", k=10, sort="conv_id desc",
                          filters=["role:assistant"])
                 for s in ShardedSearcher(dirs).shards]
    pool = [r for rows in per_shard for r in rows]
    pool.sort(key=lambda r: r["docid"])
    pool.sort(key=lambda r: r["conv_id"], reverse=True)
    assert [r["docid"] for r in pool[:10]] == [r["docid"] for r in want]


def test_sharded_field_sort_merge(spark, sharded):
    """sort= through the sharded coordinator: merged page identical to the
    unsharded field-sorted collector (ShardFieldSortedHitQueue order — sort
    fields with docid tiebreak, NOT score)."""
    idx, dirs = sharded
    reader = IndexReader.open(idx, CFG)
    single = LocalSearcher(reader)
    merged = ShardedSearcher(dirs)
    for sort in ("role desc, conv_id asc", "conv_id desc"):
        want = single.search("error timeout", k=15, sort=sort,
                             with_score=True)
        got = merged.search("error timeout", k=15, sort=sort,
                            with_score=True)
        assert got == want, sort


def test_sharded_offset_pages_globally(spark, sharded):
    """Distributed paging: each shard supplies start+rows candidates and the
    COORDINATOR applies the offset (QueryComponent.mergeIds) — per-shard
    offsets would skip globally-ranked docs. Pages must tile the unsharded
    ranking exactly."""
    idx, dirs = sharded
    reader = IndexReader.open(idx, CFG)
    single = LocalSearcher(reader)
    merged = ShardedSearcher(dirs)
    full = single.search("error timeout", k=30)
    paged = []
    for off in (0, 10, 20):
        paged.extend(merged.search("error timeout", k=10, offset=off))
    assert [(h["docid"], h["rank"]) for h in paged] == \
        [(h["docid"], h["rank"]) for h in full]
    # and on the field-sorted path
    full = single.search("error", k=20, sort="conv_id asc")
    page2 = merged.search("error", k=10, offset=10, sort="conv_id asc")
    assert page2 == full[10:20]


def test_sharded_select_matches_local(spark, sharded):
    """ShardedSearcher.select: the distributed /select (docs merge + facet
    merge + cross-shard fl resolution) must equal the unsharded serving
    answer for the same body."""
    idx, dirs = sharded
    reader = IndexReader.open(idx, CFG)
    single = LocalSearcher(reader)
    merged = ShardedSearcher(dirs)
    body = {"query": "error timeout", "limit": 10,
            "filter": ["role:assistant"],
            "fields": ["conv_id", "turn_idx", "docid", "role", "score",
                       "rank"],
            "facet": {"by_role": {"type": "terms", "field": "role"}}}
    got = merged.select(body)
    want = single.select(body)
    assert got["docs"] == want["docs"]
    assert got["facets"] == want["facets"]
    # sorted variant
    body2 = {"query": "error", "limit": 8, "offset": 3,
             "sort": "conv_id desc", "fields": ["conv_id", "docid", "rank"]}
    assert merged.select(body2)["docs"] == single.select(body2)["docs"]


def test_sharded_select_highlight(spark, sharded):
    idx, dirs = sharded
    reader = IndexReader.open(idx, CFG)
    body = {"query": "error timeout", "limit": 8,
            "params": {"hl": True, "hl.fragsize": 25}}
    got = ShardedSearcher(dirs).select(body)
    want = LocalSearcher(reader).select(body)
    assert [h["snippet"] for h in got["docs"]] == \
        [h["snippet"] for h in want["docs"]]
