"""Distributed inverted-index build: analyze -> docids -> postings -> norms.

Index directory layout (all Parquet unless noted):
    analyzed/batch-NNN/               docid, conv_id, turn_idx, dl, toks (forward index;
                                      toks = space-joined analyzed tokens, one string)
    norms/                            range_id, base_docid, n, norm_bytes  (SmallFloat blobs)
    segments/seg-NNN/term_bucket=*/   posting-range rows
    dictionary/term_bucket=*/         term, df, cf, max_tf                 (global term dict)
    segments.json                     live segment list (LSM state)
    stats.json                        n_docs, sum_dl, avgdl
    _manifests/                       per-stage checkpoint manifests

Shuffle plan (designed for 10^12 turns):
    S1  groupBy(conv_id)            docid prefix-sum (conversation granularity)
    S2  groupBy(term, docid)        tf counting — key includes docid, so hot terms do
                                    NOT skew this shuffle; count() partial-aggregates
                                    map-side before the exchange
    S3  hash(term, range_id)        posting-range assembly — a hot term's postings are
                                    spread over ceil(N / 2^range_shift) ranges, so no
                                    single task ever sees more than 2^range_shift
                                    postings. This range-chunking IS the skew handling
                                    (Spark-native analog of the reference's hot-term
                                    special path, search/facet/UnInvertedField.java:108-149);
                                    AQE skew settings stay on as a backstop.
    S4  repartition(term_bucket)    layout-only exchange of already-compressed rows so
                                    each term_bucket directory is written contiguously

Posting rows are encoded by a numpy kernel inside mapInPandas (Arrow batches, no
per-row Python): varint doc-gap deltas + varint tfs + per-block max-tf metadata
(block-max WAND input). Reference analog for the overall flow:
solr/core/src/java/org/apache/solr/update/DirectUpdateHandler2.java:407,513 (addDoc ->
IndexWriter) with segments per SURVEY.md §1.1.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solr_spark.analysis import make_tokenize_joined_udf
from solr_spark.codec.smallfloat import int_to_byte4
from solr_spark.codec.varint import encode_postings
from solr_spark.config import DEFAULT_CONFIG, IndexConfig
from solr_spark.indexing.docids import assign_doc_ids_deferred
from solr_spark.indexing.manifest import stage_complete, write_manifest

SEGMENT_SCHEMA = (
    "term string, range_id long, n_docs int, doc_gaps binary, tfs binary, "
    "block_first array<long>, block_max_tf array<int>, max_tf int, range_cf long"
)
NORMS_SCHEMA = "range_id long, base_docid long, n long, norm_bytes binary"


# ---------------------------------------------------------------- kernels


def _posting_encoder(config: IndexConfig):
    shift, block = config.range_shift, config.block_size

    def encode_iter(batches):
        carry_key: tuple | None = None
        carry_d: list[np.ndarray] = []
        carry_t: list[np.ndarray] = []
        out_rows: list[tuple] = []

        def emit(key, d_list, t_list):
            term, rid = key
            d = np.concatenate(d_list) if len(d_list) > 1 else d_list[0]
            t = np.concatenate(t_list) if len(t_list) > 1 else t_list[0]
            gaps, tfs_b, bf, bmt, mx = encode_postings(d, t, int(rid) << shift, block)
            out_rows.append(
                (term, int(rid), len(d), gaps, tfs_b, bf.tolist(),
                 bmt.tolist(), mx, int(t.sum()))
            )

        cols = ["term", "range_id", "n_docs", "doc_gaps", "tfs",
                "block_first", "block_max_tf", "max_tf", "range_cf"]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            terms = pdf["term"].to_numpy()
            rids = pdf["range_id"].to_numpy()
            docids = pdf["docid"].to_numpy()
            tfs = pdf["tf"].to_numpy()
            change = np.flatnonzero((terms[1:] != terms[:-1]) | (rids[1:] != rids[:-1])) + 1
            bounds = np.concatenate(([0], change, [len(pdf)]))
            for i in range(len(bounds) - 1):
                s, e = bounds[i], bounds[i + 1]
                key = (terms[s], rids[s])
                if carry_key is not None and key != carry_key:
                    emit(carry_key, carry_d, carry_t)
                    carry_d, carry_t = [], []
                carry_key = key
                carry_d.append(docids[s:e])
                carry_t.append(tfs[s:e])
                if i < len(bounds) - 2:  # last group may continue in the next batch
                    emit(carry_key, carry_d, carry_t)
                    carry_key, carry_d, carry_t = None, [], []
            if len(out_rows) >= 2048:
                yield pd.DataFrame(out_rows, columns=cols)
                out_rows = []
        if carry_key is not None:
            emit(carry_key, carry_d, carry_t)
        if out_rows:
            yield pd.DataFrame(out_rows, columns=cols)

    return encode_iter


def _norm_kernel(config: IndexConfig):
    shift, lucene = config.range_shift, config.lucene_norms

    def build_norms(pdf: pd.DataFrame) -> pd.DataFrame:
        rid = int(pdf["range_id"].iloc[0])
        base = rid << shift
        off = pdf["docid"].to_numpy() - base
        if lucene:  # SmallFloat-quantized 1-byte doc lengths (Lucene parity mode)
            arr = np.zeros(int(off.max()) + 1, dtype=np.uint8)
            arr[off] = int_to_byte4(pdf["dl"].to_numpy())
        else:       # exact mode: raw uint32 lengths (matches the SQL oracle exactly)
            arr = np.zeros(int(off.max()) + 1, dtype=np.uint32)
            arr[off] = pdf["dl"].to_numpy().astype(np.uint32)
        return pd.DataFrame(
            {"range_id": [rid], "base_docid": [base], "n": [len(pdf)],
             "norm_bytes": [arr.tobytes()]}
        )

    return build_norms


# ---------------------------------------------------------------- stage helpers


def write_analyzed(
    source: DataFrame, path: str, config: IndexConfig,
    num_partitions: int, docid_base: int = 0,
) -> None:
    # Forward index is ONE space-joined string per doc, produced directly by the
    # Arrow UDF: both the Arrow transfer and the parquet encoding handle a single
    # string far faster than an array<string> (no per-token offsets) — this was
    # the dominant, non-scaling cost of the stage. Tokens cannot contain spaces,
    # so the join is lossless; the posting build re-splits JVM-side.
    tokenize = make_tokenize_joined_udf(config)
    with_ids, docid_cleanup = assign_doc_ids_deferred(source, num_partitions)
    analyzed = (
        with_ids
        .withColumn("docid", F.col("docid") + F.lit(docid_base))
        # Explicit exchange so the tokenize+write stage runs at num_partitions
        # tasks. Without it, AQE coalesces the upstream join/window shuffle by
        # BYTE size — and bytes wildly underestimate the Python-UDF cost per row,
        # leaving most cores idle during the most expensive stage of the build.
        # Hash on docid: deterministic across retries (docids are content-keyed).
        .repartition(num_partitions, "docid")
        .withColumn("toks", tokenize(F.col("text")))
        .withColumn(
            "dl",
            F.when(F.col("toks") == "", F.lit(0))
             .otherwise(F.size(F.split("toks", " "))).cast("long"),
        )
        .select("docid", "conv_id", "turn_idx", "dl", "toks")
    )
    # Deliberately NO repartitionByRange here: range sampling evaluates the child
    # plan twice, which would run the (expensive) tokenize UDF over the whole
    # corpus a second time. Nothing downstream needs docid clustering — norms
    # shuffle by range_id and the posting build shuffles by (term, range_id).
    try:
        analyzed.write.mode("overwrite").parquet(path)
    finally:
        docid_cleanup()


def write_norms(analyzed: DataFrame, path: str, config: IndexConfig) -> None:
    norms = (
        analyzed.select("docid", "dl")
        .withColumn("range_id", F.shiftright("docid", config.range_shift))
        .groupBy("range_id")
        .applyInPandas(_norm_kernel(config), NORMS_SCHEMA)
    )
    norms.write.mode("overwrite").parquet(path)


def write_segment(
    analyzed: DataFrame, seg_path: str, config: IndexConfig, num_partitions: int
) -> None:
    pairs = (
        analyzed.select("docid", F.explode(F.split("toks", " ")).alias("term"))
        .where(F.col("term") != "")  # empty docs split to [""]
    )
    tf = (
        pairs.groupBy("term", "docid").agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("range_id", F.shiftright("docid", config.range_shift))
    )
    enc = (
        tf.repartition(num_partitions, "term", "range_id")
        .sortWithinPartitions("term", "range_id", "docid")
        .mapInPandas(_posting_encoder(config), SEGMENT_SCHEMA)
        .withColumn("term_bucket", F.crc32(F.col("term")) % config.num_term_buckets)
    )
    (enc.repartition(F.col("term_bucket"))
        .write.partitionBy("term_bucket").mode("overwrite").parquet(seg_path))


def read_segments(spark: SparkSession, seg_paths: list[str]) -> DataFrame:
    """Union-read several hive-partitioned segment roots (multi-root partition
    discovery is not supported by a single parquet() call)."""
    dfs = [spark.read.parquet(p) for p in seg_paths]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def write_dictionary(spark: SparkSession, index_dir: str, seg_paths: list[str]) -> None:
    seg = read_segments(spark, seg_paths)
    dictionary = seg.groupBy("term", "term_bucket").agg(
        F.sum("n_docs").alias("df"),
        F.sum("range_cf").alias("cf"),
        F.max("max_tf").alias("max_tf"),
    )
    (dictionary.repartition(F.col("term_bucket"))
               .write.partitionBy("term_bucket").mode("overwrite")
               .parquet(os.path.join(index_dir, "dictionary")))


def write_stats(spark: SparkSession, index_dir: str, config: IndexConfig) -> dict:
    # Derived from the two SMALL index artifacts, not a corpus re-scan:
    #   n_docs  = sum of per-range doc counts in norms
    #   sum_dl  = sum of collection frequencies in the dictionary (every analyzed
    #             token appears in exactly one posting's tf)
    norms = spark.read.parquet(os.path.join(index_dir, "norms"))
    n_docs = int(norms.agg(F.sum("n")).collect()[0][0] or 0)
    dictionary = spark.read.parquet(os.path.join(index_dir, "dictionary"))
    sum_dl = int(dictionary.agg(F.sum("cf")).collect()[0][0] or 0)
    stats = {
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        # Lucene BM25 avgFieldLength = sumTotalTermFreq / docCount (float division)
        "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
        "config": {"k1": config.k1, "b": config.b,
                   "range_shift": config.range_shift,
                   "num_term_buckets": config.num_term_buckets,
                   "lucene_norms": config.lucene_norms},
    }
    path = os.path.join(index_dir, "stats.json")
    with open(path + ".tmp", "w") as f:
        json.dump(stats, f, indent=2)
    os.replace(path + ".tmp", path)
    return stats


def write_live_segments(index_dir: str, names: list[str]) -> None:
    path = os.path.join(index_dir, "segments.json")
    with open(path + ".tmp", "w") as f:
        json.dump({"segments": names}, f, indent=2)
    os.replace(path + ".tmp", path)


def live_segments(index_dir: str) -> list[str]:
    path = os.path.join(index_dir, "segments.json")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return json.load(f)["segments"]


def _bucket_metrics(spark: SparkSession, seg_path: str) -> list[dict]:
    """Per-term-bucket build metrics (manifest lineage). Row/posting counts come
    from the cheap int columns; byte sizes come from the filesystem so the binary
    posting columns are never re-read."""
    seg = spark.read.parquet(seg_path)
    rows = {
        int(r["term_bucket"]): r.asDict()
        for r in seg.groupBy("term_bucket")
        .agg(F.count(F.lit(1)).alias("range_rows"),
             F.sum("n_docs").alias("postings"))
        .collect()
    }
    for name in os.listdir(seg_path):
        if not name.startswith("term_bucket="):
            continue
        bucket = int(name.split("=", 1)[1])
        d = os.path.join(seg_path, name)
        size = sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d) if f.endswith(".parquet")
        )
        if bucket in rows:
            rows[bucket]["file_bytes"] = size
    return [rows[b] for b in sorted(rows)]


# ---------------------------------------------------------------- full build


def build_index(
    spark: SparkSession,
    source: DataFrame,
    index_dir: str,
    config: IndexConfig = DEFAULT_CONFIG,
    input_token: str = "",
    num_partitions: int | None = None,
) -> dict:
    """Build (or resume building) a full-text index from a transcript DataFrame.

    `input_token` is the lineage fingerprint of `source` (manifest.source_input_token
    of the source files, or a synthetic-corpus seed tag). Stages whose manifest matches
    (stage, config_hash, input_token) are skipped — checkpoint-resume semantics
    (reference analog: update/UpdateLog.java:105-108 tlog replay).
    """
    cfg_hash = config.config_hash()
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    analyzed_path = os.path.join(index_dir, "analyzed", "batch-000")
    analyzed_fresh = not stage_complete(index_dir, "analyzed", cfg_hash, input_token)
    if analyzed_fresh:
        write_analyzed(source, analyzed_path, config, num_partitions)
    analyzed = spark.read.parquet(analyzed_path)

    # Independent stages run CONCURRENTLY on the Spark scheduler (thread-safe):
    # norms (small shuffle), the posting-segment build (the big job), and the
    # analyzed per-partition metrics all read the materialized analyzed parquet.
    # Overlapping them hides each job's scheduling/IO latency behind the big
    # stage's compute — a meaningful chunk of the serial fraction at high
    # parallelism. Manifests are only written on completion, so a crash
    # mid-phase resumes each incomplete stage independently.
    seg_path = os.path.join(index_dir, "segments", "seg-000")

    def _analyzed_manifest() -> None:
        part_stats = [
            r.asDict()
            for r in analyzed
            .groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count(F.lit(1)).alias("rows"), F.sum("dl").alias("tokens"))
            .orderBy("pid").collect()
        ]
        write_manifest(index_dir, "analyzed", cfg_hash, input_token,
                       metrics={"partitions": len(part_stats)}, partitions=part_stats)

    def _norms_stage() -> None:
        write_norms(analyzed, os.path.join(index_dir, "norms"), config)
        write_manifest(index_dir, "norms", cfg_hash, input_token)

    def _segment_stage() -> None:
        write_segment(analyzed, seg_path, config, num_partitions)
        write_live_segments(index_dir, ["seg-000"])
        write_manifest(index_dir, "seg-000", cfg_hash, input_token,
                       partitions=_bucket_metrics(spark, seg_path))

    from concurrent.futures import ThreadPoolExecutor

    tasks = []
    if analyzed_fresh:
        tasks.append(_analyzed_manifest)
    if not stage_complete(index_dir, "norms", cfg_hash, input_token):
        tasks.append(_norms_stage)
    if not stage_complete(index_dir, "seg-000", cfg_hash, input_token):
        tasks.append(_segment_stage)
    if tasks:
        with ThreadPoolExecutor(max_workers=len(tasks)) as pool:
            for fut in [pool.submit(t) for t in tasks]:
                fut.result()  # re-raise stage failures

    if not stage_complete(index_dir, "dictionary", cfg_hash, input_token):
        write_dictionary(spark, index_dir, [seg_path])
        stats = write_stats(spark, index_dir, config)
        write_manifest(index_dir, "dictionary", cfg_hash, input_token, metrics=stats)
    else:
        with open(os.path.join(index_dir, "stats.json")) as f:
            stats = json.load(f)
    return stats
