"""Continuous / incremental consumption: topic(), daemon(), late-data windows.

Reference semantics being re-expressed (SURVEY.md §2.9):
  * topic() — checkpointed at-least-once incremental consumption: each call
    returns only documents not yet seen, persisting its position
    (solr/solrj-streaming/.../io/stream/TopicStream.java:75-77 checkpoints a
    `_version_` high watermark per shard into a checkpoint collection).
  * daemon() — run an expression repeatedly on an interval inside the server
    (stream/DaemonStream.java:50, managed by handler/StreamHandler.java:251-299).
  * NRT soft-commit visibility (update/CommitTracker.java:47,186-189) — new data
    becomes searchable in batches, not per-document.

Spark mapping: Structured Streaming IS this machinery — the file/Delta source
tracks consumed files in its checkpoint (TopicStream's persisted watermark), a
foreachBatch sink appends fresh index segments (NRT segment adds), and triggers
(availableNow / processingTime) are daemon scheduling. Late data is handled with
event-time watermarks, which the reference lacks entirely (it only has versions).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solr_spark.config import DEFAULT_CONFIG, IndexConfig

TRANSCRIPT_SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
                     "tool string, ts timestamp")


def index_stream(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    config: IndexConfig = DEFAULT_CONFIG,
    available_now: bool = True,
    processing_interval: str | None = None,
    dedup_signatures: str | None = None,
):
    """topic()-style continuous indexing: consume new transcript parquet files,
    append each micro-batch as a fresh LSM segment.

    The streaming checkpoint (consumed-file log) is the TopicStream watermark;
    `add_documents` per batch is the NRT segment add; `merge_segments` can run
    as the background TieredMergePolicy analog whenever segment count grows.

    dedup_signatures: None (off), "text_profile" or "md5" — the update-time
    SignatureUpdateProcessor role (reference:
    solr/core/src/java/org/apache/solr/update/processor/SignatureUpdateProcessorFactory.java,
    which dedups each UPDATE against the live index). Each batch drops rows
    whose content signature was already indexed: within-batch keep-first on
    (conv_id, turn_idx), then a broadcast anti-join against the signature
    ledger parquet under `{index_dir}/signatures/` (vocabulary of distinct
    signatures — ledger-sized, not corpus-sized), and the survivors' new
    signatures append to the ledger AFTER the segment add. Ordering note:
    segment-add-then-ledger keeps crash-replay at-least-once (a replayed
    batch may re-index docs whose ledger write was lost — duplicates, never
    data loss; the reference's soft-commit window has the same exposure).

    Returns the StreamingQuery; with available_now=True it drains pending files
    and stops (a scheduled daemon run), with processing_interval it keeps
    polling (a resident daemon).
    """
    from solr_spark.indexing.merge import add_documents

    stream = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
              .option("maxFilesPerTrigger", 64)
              .parquet(source_dir))
    ledger = os.path.join(index_dir, "signatures")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if dedup_signatures:
            from pyspark.sql import Window

            sig = _signature_col(dedup_signatures)
            w = (Window.partitionBy("__sig")
                       .orderBy("conv_id", "turn_idx"))
            fresh = (batch_df.withColumn("__sig", sig)
                     .withColumn("__rn", F.row_number().over(w))
                     .where(F.col("__rn") == 1).drop("__rn"))
            if os.path.isdir(ledger):
                seen = (spark.read.parquet(ledger)
                        .select(F.col("signature").alias("__sig")).distinct())
                fresh = fresh.join(F.broadcast(seen), "__sig", "left_anti")
            fresh = fresh.persist()
            try:
                if fresh.isEmpty():
                    return
                add_documents(spark, fresh.drop("__sig"), index_dir, config)
                (fresh.select(F.col("__sig").alias("signature")).distinct()
                      .write.mode("append").parquet(ledger))
            finally:
                fresh.unpersist()
            return
        add_documents(spark, batch_df, index_dir, config)

    writer = (stream.writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_interval:
        writer = writer.trigger(processingTime=processing_interval)
    return writer.start()


class CommitTracker:
    """autoCommit policy for the micro-batch indexing loop — the
    CommitTracker analog (update/CommitTracker.java:47,72,186-189 and
    solrconfig.xml autoCommit maxDocs/maxTime).

    Small incoming batches STAGE (parquet append under
    ``{index_dir}/staging/``) instead of each becoming a tiny LSM segment;
    the commit — ONE ``add_documents`` draining the stage into a single
    segment — fires when staged docs reach ``max_docs`` or the oldest
    staged batch's age reaches ``max_time_s`` (checked at add time, the
    batch-loop analog of the reference's scheduled tracker thread).
    ``flush()`` is the explicit hard commit.

    Durability window: staged files persist across a crash (the tlog role);
    a restarted tracker finds them (count + age recovered from the staging
    dir) and the next commit drains them — at-least-once, exactly the
    reference's tlog-replay exposure. ``clock`` is injectable for
    deterministic tests.
    """

    def __init__(self, spark: SparkSession, index_dir: str,
                 config: IndexConfig = DEFAULT_CONFIG,
                 max_docs: int | None = None,
                 max_time_s: float | None = None,
                 clock=None):
        if max_docs is None and max_time_s is None:
            raise ValueError("CommitTracker needs max_docs and/or max_time_s")
        import time as _time

        self.spark, self.index_dir, self.config = spark, index_dir, config
        self.max_docs, self.max_time_s = max_docs, max_time_s
        self._clock = clock or _time.monotonic
        self._staging = os.path.join(index_dir, "staging")
        self._staged_docs = 0
        self._first_stage_at: float | None = None
        if os.path.isdir(self._staging):  # crash recovery: count survivors
            staged = spark.read.parquet(self._staging)
            self._staged_docs = staged.count()
            if self._staged_docs:
                self._first_stage_at = self._clock()

    def add(self, batch_df: DataFrame) -> dict | None:
        """Stage a batch; commit if a policy threshold is now crossed.
        Returns the commit's index stats, or None if only staged."""
        n = batch_df.count()
        if n:
            batch_df.write.mode("append").parquet(self._staging)
            self._staged_docs += n
            if self._first_stage_at is None:
                self._first_stage_at = self._clock()
        return self._maybe_commit()

    def flush(self) -> dict | None:
        """Explicit hard commit of everything staged."""
        return self._commit() if self._staged_docs else None

    def _maybe_commit(self) -> dict | None:
        over_docs = (self.max_docs is not None
                     and self._staged_docs >= self.max_docs)
        over_time = (self.max_time_s is not None
                     and self._first_stage_at is not None
                     and self._clock() - self._first_stage_at
                     >= self.max_time_s)
        if self._staged_docs and (over_docs or over_time):
            return self._commit()
        return None

    def _commit(self) -> dict:
        import shutil

        from solr_spark.indexing.merge import add_documents

        staged = self.spark.read.parquet(self._staging)
        stats = add_documents(self.spark, staged, self.index_dir,
                              self.config)
        # drain AFTER the segment add: a crash between the two replays the
        # stage (duplicates possible, loss impossible — tlog semantics)
        shutil.rmtree(self._staging, ignore_errors=True)
        self._staged_docs, self._first_stage_at = 0, None
        return stats


def _signature_col(method: str):
    from solr_spark.functions.dedup import text_profile_signature

    if method == "text_profile":
        return text_profile_signature("text")
    if method == "md5":
        return F.md5(F.col("text"))
    raise ValueError(f"unknown dedup_signatures {method!r}")


def signature_ledger_init(spark: SparkSession, df: DataFrame, index_dir: str,
                          method: str = "text_profile") -> None:
    """Bootstrap the update-time dedup ledger from documents that are ALREADY
    in the index (e.g. after a batch `build_index`), so a subsequent
    `index_stream(dedup_signatures=...)` dedups new arrivals against the full
    live corpus — the reference's SignatureUpdateProcessor checks every
    update against the existing collection, not just other updates."""
    ledger = os.path.join(index_dir, "signatures")
    (df.select(_signature_col(method).alias("signature")).distinct()
       .write.mode("append").parquet(ledger))


def topic_poll(
    spark: SparkSession,
    table_path: str,
    checkpoint_file: str,
    version_col: str = "ts",
) -> tuple[DataFrame, "object"]:
    """Batch-mode topic(): return only rows with version_col strictly above the
    persisted high watermark, plus a commit() that advances it.

    This is the literal TopicStream contract — `_version_ > checkpoint` with the
    checkpoint persisted durably (TopicStream.java:118-119 stores it back into a
    collection; we use an atomic JSON file / object-store marker). At-least-once:
    rows are re-delivered if commit() never runs.
    """
    watermark = None
    if os.path.exists(checkpoint_file):
        with open(checkpoint_file) as f:
            watermark = json.load(f)["watermark"]
    df = spark.read.parquet(table_path)
    out = df.where(F.col(version_col) > F.lit(watermark)) if watermark is not None else df

    def commit() -> None:
        hi = out.agg(F.max(version_col)).collect()[0][0]
        if hi is None:
            return
        os.makedirs(os.path.dirname(checkpoint_file) or ".", exist_ok=True)
        with open(checkpoint_file + ".tmp", "w") as f:
            json.dump({"watermark": str(hi) if not isinstance(hi, (int, float)) else hi,
                       "version_col": version_col}, f)
        os.replace(checkpoint_file + ".tmp", checkpoint_file)

    return out, commit


def daemon(fn, runs: int, interval_secs: float = 0.0) -> list:
    """daemon() — run a DataFrame program repeatedly (micro-batch loop).

    The reference keeps a daemon thread per expression inside the server
    (DaemonStream.java:50); in Spark the scheduler is external (Airflow/cron) or
    a Structured Streaming trigger — this helper is the in-process test double.
    """
    import time as _t

    results = []
    for i in range(runs):
        results.append(fn(i))
        if interval_secs and i < runs - 1:
            _t.sleep(interval_secs)
    return results


def windowed_counts(
    stream_df: DataFrame,
    ts_col: str,
    window: str,
    watermark: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Event-time windowed aggregation with late-data watermark — the Spark-native
    upgrade over the reference's timeseries() range-facet buckets
    (stream/TimeSeriesStream.java:55), which have no late-data story."""
    grouped = stream_df.withWatermark(ts_col, watermark).groupBy(
        F.window(F.col(ts_col), window), *(keys or [])
    )
    return grouped.agg(F.count(F.lit(1)).alias("count"))
