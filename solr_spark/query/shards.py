"""Multi-shard serving: shard-split a built index, merge per-shard top-k.

The reference's distributed-search topology in this engine's terms:

  * `shard_index` splits one built index into N self-contained shard
    directories by `range_id % N` (the posting layout is already chunked
    into docid ranges, so a shard is a clean subset of posting rows, norms
    rows, and forward rows — no re-encoding). Each shard carries a COPY of
    the GLOBAL dictionary and stats.json: per-shard scoring then uses global
    df/N/avgdl, which is exactly the ExactStatsCache design
    (solr/core/src/java/org/apache/solr/search/stats/ExactStatsCache.java:61)
    — without it, per-shard IDF diverges and merged ranks are wrong.
  * `ShardedSearcher` holds one LocalSearcher per shard and merges their
    top-k by (score desc, docid asc) — QueryComponent's two-phase
    GET_TOP_IDS flow with mergeIds' sorted hit queue
    (handler/component/QueryComponent.java:789,971, ShardFieldSortedHitQueue
    :924). The global top-k is a subset of the union of per-shard top-k's,
    so the merge is exact; results are rank- and score-identical to the
    unsharded searcher (pytest-asserted in tests/test_shards.py).

At 100-TB scale each shard directory lives on its own serving node; the
merge step is the coordinator. The split itself is a layout-only Spark job:
partition-pruned reads, no decode, no shuffle beyond the write.
"""

from __future__ import annotations

import heapq
import json
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from solr_spark.query.bm25 import IndexReader
from solr_spark.query.local import LocalSearcher


def shard_index(spark: SparkSession, reader: IndexReader, out_dir: str,
                n_shards: int) -> list[str]:
    """Split a built index into n self-contained shard index dirs.

    Shard s owns every docid range with range_id % n_shards == s (range
    interleaving balances hot docid regions across shards). Postings, norms
    and forward rows are FILTERED COPIES (layout-only — blobs are moved, not
    re-encoded); the dictionary, stats.json and any tombstones are copied
    globally so every shard scores with corpus-wide statistics.
    """
    cfg = reader.config
    shift = cfg.range_shift
    shard_dirs = []
    seg = reader.segments_df(spark)
    norms = reader.norms(spark)
    fwd = reader.forward(spark)
    for s in range(n_shards):
        sd = os.path.join(out_dir, f"shard-{s:03d}")
        shard_dirs.append(sd)
        os.makedirs(sd, exist_ok=True)
        (seg.where(F.col("range_id") % n_shards == s)
            .write.partitionBy("term_bucket").mode("overwrite")
            .parquet(os.path.join(sd, "segments", "seg-000")))
        (norms.where(F.col("range_id") % n_shards == s)
              .write.mode("overwrite").parquet(os.path.join(sd, "norms")))
        (fwd.where(F.shiftright("docid", shift) % n_shards == s)
            .write.mode("overwrite")
            .parquet(os.path.join(sd, "analyzed", "batch-000")))
        # GLOBAL term dictionary + stats: the ExactStatsCache broadcast
        shutil.copytree(os.path.join(reader.index_dir, "dictionary"),
                        os.path.join(sd, "dictionary"), dirs_exist_ok=True)
        with open(os.path.join(reader.index_dir, "stats.json")) as f:
            stats = json.load(f)
        stats["shard"], stats["n_shards"] = s, n_shards
        with open(os.path.join(sd, "stats.json"), "w") as f:
            json.dump(stats, f, indent=2)
        with open(os.path.join(sd, "segments.json"), "w") as f:
            json.dump({"segments": ["seg-000"]}, f)
        deletes = os.path.join(reader.index_dir, "deletes")
        if os.path.isdir(deletes):
            shutil.copytree(deletes, os.path.join(sd, "deletes"),
                            dirs_exist_ok=True)
    return shard_dirs


class ShardedSearcher:
    """Coordinator over per-shard LocalSearchers: mergeIds for this engine.

    Every keyword argument of LocalSearcher.search (similarity, min_match,
    filters, ...) passes through; per-shard filter DocSets are computed on
    each shard's own forward rows, so the fq semantics are unchanged.
    """

    def __init__(self, shard_dirs: list[str],
                 cache_bytes: int = 256 << 20):
        self.shards = [LocalSearcher(IndexReader.open(d),
                                     cache_bytes=cache_bytes)
                       for d in shard_dirs]

    def search(self, query_text: str, k: int = 10, **kw) -> list[dict]:
        """Merged top-k: rank/score-identical to the unsharded searcher.

        Each shard collects its local top-k with GLOBAL stats (its dictionary
        and stats.json are corpus-wide copies); the coordinator k-way merges
        by (score desc, docid asc) — the ShardFieldSortedHitQueue order —
        and re-ranks. In a real deployment the per-shard calls fan out over
        the network; here they run in-process, same contract.
        """
        per_shard = [s.search(query_text, k=k, **kw) for s in self.shards]
        merged = heapq.merge(
            *per_shard, key=lambda h: (-h["score"], h["docid"]))
        out = []
        for rank, hit in enumerate(heapq.nsmallest(
                k, merged, key=lambda h: (-h["score"], h["docid"])), 1):
            hit = dict(hit)
            hit["rank"] = rank
            out.append(hit)
        return out


__all__ = ["shard_index", "ShardedSearcher"]
