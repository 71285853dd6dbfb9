"""LSM-style segment merge + incremental document addition.

Mirrors the reference's log-structured index lifecycle: new documents land in fresh
immutable segments; a background merge folds segments together and rebuilds the global
term dictionary (reference: TieredMergePolicy selected by
solr/core/src/java/org/apache/solr/index/DefaultMergePolicyFactory.java:42; segment
model in SURVEY.md §1.1).

Incremental docids: documents added after the initial build get
docid = existing n_docs + dense rank within the new batch — arrival-ordered, exactly
like Lucene's per-segment docid spaces. The score tie-break order is therefore
(arrival batch, conv_id, turn_idx), which the oracle reproduces.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solr_spark.config import DEFAULT_CONFIG, IndexConfig
from solr_spark.indexing import build as B
from solr_spark.indexing.manifest import write_manifest


def merge_segments(
    spark: SparkSession,
    index_dir: str,
    config: IndexConfig = DEFAULT_CONFIG,
    merged_name: str = "merged-000",
    num_partitions: int | None = None,
) -> list[str]:
    """Fold all live segments into one; rebuild dictionary; update live list.

    Reuses the build path's fully vectorized `_partial_merger` kernel (one
    concatenate-decode-lexsort-reencode pass per task, no per-(term,range)
    Python loops): a segment row IS a partial posting row — different segments'
    docid sets for the same (term, range_id) are disjoint, exactly like the
    build's map-side partials, so the merge is the same operation.

    Tombstones (indexing/deletes.py) are PURGED here — deleted docs' postings
    drop out of the merged segment, the dictionary rebuild lowers their df,
    and the applied tombstone files are cleared (Lucene's liveDocs-at-merge
    behavior). Norms/doc-map entries of deleted docids remain (ghost norms,
    as in Lucene until a full rewrite); postings never resurrect them.
    A single live segment still merges when tombstones are pending.
    """
    from solr_spark.indexing.deletes import clear_deletes, deleted_array

    names = B.live_segments(index_dir)
    dels = deleted_array(spark, index_dir)
    if len(names) <= 1 and not len(dels):
        return names
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    paths = [os.path.join(index_dir, "segments", n) for n in names]
    seg = B.read_segments(spark, paths)
    merged_path = os.path.join(index_dir, "segments", merged_name)
    merged = (
        seg.select("term", "range_id", "n_docs", "doc_gaps", "tfs")
        .repartition(num_partitions, "term", "range_id")
        .mapInArrow(B._partial_merger(config, dels if len(dels) else None),
                    B.SEGMENT_SCHEMA)
        .withColumn("term_bucket", F.crc32(F.col("term")) % config.num_term_buckets)
    )
    (merged.repartition(F.col("term_bucket"))
           .write.partitionBy("term_bucket").mode("overwrite").parquet(merged_path))
    B.write_live_segments(index_dir, [merged_name])
    B.write_dictionary(spark, index_dir, [merged_path])
    # Refresh corpus stats: a Lucene merge updates docCount and
    # sumTotalTermFreq along with docFreq. The purged docs' norms persist
    # (ghost norms) so n_total stays, n_ghosts grows, n_docs = live docs, and
    # sum_dl re-derives from the rebuilt (purged) dictionary — BM25/LM readers
    # opened post-merge see internally consistent live-doc statistics.
    prev_ghosts = int(B.read_stats(index_dir).get("n_ghosts", 0))
    stats = B.write_stats(spark, index_dir, config,
                          n_ghosts=prev_ghosts + len(dels))
    if len(dels):
        clear_deletes(index_dir)
    write_manifest(index_dir, f"merge-{merged_name}", config.config_hash(),
                   ",".join(names),
                   metrics={"purged_tombstones": int(len(dels)),
                            **{k: v for k, v in stats.items() if k != "config"}},
                   partitions=B._bucket_metrics(spark, merged_path))
    return [merged_name]


def segments_info(spark: SparkSession, index_dir: str) -> DataFrame:
    """Per-segment admin view (Solr /admin/segments,
    handler/admin/SegmentsInfoRequestHandler.java): one row per on-disk
    segment with liveness, file/byte footprint, posting-row and term
    cardinalities, and the docid-range span. Segment count is small by
    construction (the tiered merge policy bounds it), so the per-segment
    aggregations are a handful of bounded jobs."""
    live = set(B.live_segments(index_dir))
    seg_root = os.path.join(index_dir, "segments")
    rows = []
    for name in sorted(os.listdir(seg_root)):
        path = os.path.join(seg_root, name)
        if not os.path.isdir(path):
            continue
        n_files = n_bytes = 0
        for root, _dirs, files in os.walk(path):
            for fn in files:
                n_files += 1
                n_bytes += os.path.getsize(os.path.join(root, fn))
        agg = (spark.read.parquet(path)
               .agg(F.count(F.lit(1)).alias("postings"),
                    F.count_distinct("term").alias("terms"),
                    F.sum("n_docs").alias("doc_entries"),
                    F.min("range_id").alias("min_range"),
                    F.max("range_id").alias("max_range")).head())
        rows.append((name, name in live, n_files, n_bytes,
                     agg["postings"], agg["terms"], agg["doc_entries"],
                     agg["min_range"], agg["max_range"]))
    return spark.createDataFrame(
        rows,
        "segment string, live boolean, n_files int, n_bytes long, "
        "postings long, terms long, doc_entries long, "
        "min_range long, max_range long")


def add_documents(
    spark: SparkSession,
    new_source: DataFrame,
    index_dir: str,
    config: IndexConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
) -> dict:
    """Append a new batch as a fresh segment (NRT-style add; no rewrite of old data).

    Norms are rebuilt from all analyzed batches (dl column only — cheap column-pruned
    scan) because the tail docid range of the previous batch may now extend.
    """
    import json

    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    with open(os.path.join(index_dir, "stats.json")) as f:
        _stats = json.load(f)
    # Allocation watermark, NOT live-doc count: post-merge n_docs excludes
    # ghost docids whose norms entries still occupy the id space.
    docid_base = _stats.get("n_total", _stats["n_docs"])

    existing = B.live_segments(index_dir)
    batch_no = len([d for d in os.listdir(os.path.join(index_dir, "analyzed"))])
    batch_name = f"batch-{batch_no:03d}"
    seg_name = f"seg-{batch_no:03d}"

    analyzed_path = os.path.join(index_dir, "analyzed", batch_name)
    # new batches must carry the SAME stored attribute columns as the base
    # index (batch-* schemas must agree for forward-table reads); infer them
    # from the existing layout so callers can't silently fork the schema
    import glob as _glob

    import pyarrow.parquet as _pq

    first = sorted(_glob.glob(os.path.join(
        index_dir, "analyzed", "batch-*", "*.parquet")))[0]
    stored = tuple(c for c in _pq.read_schema(first).names
                   if c not in ("docid", "conv_id", "turn_idx", "dl", "toks"))
    B.write_analyzed(new_source, analyzed_path, config, num_partitions,
                     docid_base, stored_cols=stored)
    analyzed_new = spark.read.parquet(analyzed_path)

    seg_path = os.path.join(index_dir, "segments", seg_name)
    B.write_segment(analyzed_new, seg_path, config, num_partitions)
    B.write_live_segments(index_dir, existing + [seg_name])

    all_analyzed = spark.read.parquet(os.path.join(index_dir, "analyzed", "batch-*"))
    B.write_norms(all_analyzed, os.path.join(index_dir, "norms"), config)
    seg_paths = [os.path.join(index_dir, "segments", n) for n in existing + [seg_name]]
    B.write_dictionary(spark, index_dir, seg_paths)
    stats = B.write_stats(spark, index_dir, config)
    write_manifest(index_dir, f"add-{seg_name}", config.config_hash(), batch_name,
                   metrics=stats)
    return stats
