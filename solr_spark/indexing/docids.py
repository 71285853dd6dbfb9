"""Stable, deterministic docID assignment.

docid = dense rank of (conv_id, turn_idx) in lexicographic order. The rank is a
function of the DATA ONLY — independent of partitioning, task retries, or speculation
(SURVEY.md §7 "Deterministic docIDs at scale"; never monotonically_increasing_id).
Ties in BM25 scoring break by docid ascending (Lucene's rule), so this order is part
of the rank-identity contract with the pure-Python oracle.

Scale design: a single global Window.orderBy would funnel everything through one
partition. Instead we do a distributed prefix sum at CONVERSATION granularity
(~8x smaller than turns):
  1. conv sizes  = groupBy(conv_id).count()                        (one shuffle)
  2. range-partition conv sizes by conv_id, cache (pins partition boundaries so the
     downstream jobs see identical partitioning)
  3. per-partition totals -> driver (tiny: one long per partition) -> exclusive
     cumulative offsets, broadcast back
  4. conv_base = partition offset + within-partition running sum
     (window partitioned by spark_partition_id — parallel, no global funnel)
  5. docid = conv_base + row_number within conversation ordered by turn_idx
     (window partitioned by conv_id — parallel)
Analog of the reference's hash routing of uniqueKey -> shard
(solrj/src/java/org/apache/solr/common/cloud/CompositeIdRouter.java:135,147), but
rank-based because posting compression wants dense ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _docid_plan(df: DataFrame, num_partitions: int):
    """Build the docid plan; returns (out, conv_base, parted, conv_sizes) with the
    three intermediates CACHED (conv_sizes/parted populated by the totals collect,
    conv_base populated by the first consuming action)."""
    spark = df.sparkSession

    # cached so repartitionByRange's boundary-sampling pass doesn't re-run the
    # groupBy (and its corpus scan) a second time
    conv_sizes = df.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns")).cache()
    parted = (
        conv_sizes.repartitionByRange(num_partitions, "conv_id")
        # no sortWithinPartitions: the prefix-sum window below sorts by conv_id
        # within each pid anyway, so a pre-sort would just be a second sort
        .withColumn("pid", F.spark_partition_id())
        .cache()
    )
    totals = {
        r["pid"]: r["total"]
        for r in parted.groupBy("pid").agg(F.sum("n_turns").alias("total")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    offset_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "pid int, part_offset long"
    )
    w_part = Window.partitionBy("pid").orderBy("conv_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    conv_base = (
        parted.withColumn("prior", F.coalesce(F.sum("n_turns").over(w_part), F.lit(0)))
        .join(F.broadcast(offset_df), "pid")
        .select("conv_id", (F.col("part_offset") + F.col("prior")).alias("conv_base"))
        .cache()
    )
    w_conv = Window.partitionBy("conv_id").orderBy("turn_idx")
    out = (
        df.join(conv_base, "conv_id")
        .withColumn(
            "docid", (F.col("conv_base") + F.row_number().over(w_conv) - 1).cast("long")
        )
        .drop("conv_base")
    )
    return out, conv_base, parted, conv_sizes


def assign_doc_ids_deferred(
    df: DataFrame, num_partitions: int | None = None
):
    """Return (df + docid column, cleanup_fn) WITHOUT a materialization job.

    The first consuming action populates the conv_base cache from the
    still-pinned range partitioning; call cleanup_fn() after the LAST consuming
    action. Saves one Spark job versus assign_doc_ids — used by the index build,
    whose analyzed-write action does the materializing.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    out, conv_base, parted, conv_sizes = _docid_plan(df, num_partitions)

    def cleanup() -> None:
        conv_base.unpersist()
        parted.unpersist()
        conv_sizes.unpersist()

    return out, cleanup


def assign_doc_ids(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Return df + `docid` (long): dense rank of (conv_id, turn_idx).

    Standalone form: materializes conv_base (one row per conversation) so every
    later action on the result sees identical ids, then drops the build-side
    caches (conv_base itself stays cached for downstream joins).
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    out, conv_base, parted, conv_sizes = _docid_plan(df, num_partitions)
    conv_base.count()  # materialize while `parted`'s boundaries are still pinned
    parted.unpersist()
    conv_sizes.unpersist()
    return out
