"""Streaming/incremental tests: topic checkpointing, streaming index build,
NRT adds + merge — the reference's TopicStream/daemon/commit semantics
(SURVEY.md §2.9) under Structured Streaming."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from solr_spark.config import IndexConfig
from solr_spark.streaming import (daemon, index_stream, signature_ledger_init,
                                  topic_poll, windowed_counts)

CFG = IndexConfig(range_shift=8, num_term_buckets=8)


def _mini_batch(spark, conv_prefix: str, texts: list[str], ts_base: int):
    rows = [
        (f"{conv_prefix}-{i:03d}", 0, "user", t, None, ts_base + i)
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts_i long",
    ).withColumn("ts", F.timestamp_seconds("ts_i")).drop("ts_i")


def test_topic_poll_at_least_once(spark, tmp_path):
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt.json")
    _mini_batch(spark, "a", ["one", "two"], 100).write.parquet(table)

    out1, commit1 = topic_poll(spark, table, ckpt)
    assert out1.count() == 2
    # without commit: re-delivery (at-least-once)
    out1b, _ = topic_poll(spark, table, ckpt)
    assert out1b.count() == 2
    commit1()

    # nothing new -> empty
    out2, commit2 = topic_poll(spark, table, ckpt)
    assert out2.count() == 0

    _mini_batch(spark, "b", ["three"], 200).write.mode("append").parquet(table)
    out3, commit3 = topic_poll(spark, table, ckpt)
    assert out3.count() == 1
    assert out3.collect()[0]["conv_id"] == "b-000"
    commit3()


def test_streaming_index_build(spark, tmp_path):
    from solr_spark.indexing import build_index, merge_segments
    from solr_spark.indexing.build import live_segments
    from solr_spark.query import IndexReader, bm25_topk

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")

    # initial batch indexed the batch way (segment seg-000)
    first = _mini_batch(spark, "conv0", ["alpha beta", "alpha gamma"], 100)
    build_index(spark, first, idx, CFG, input_token="stream-t0")

    # new files arrive; the stream drains them into fresh segments
    _mini_batch(spark, "conv1", ["delta alpha", "epsilon"], 200) \
        .write.parquet(src)
    q = index_stream(spark, src, idx, ckpt, CFG, available_now=True)
    q.awaitTermination(120)

    reader = IndexReader.open(idx, CFG)
    assert reader.n_docs == 4
    hits = bm25_topk(spark, reader, "alpha", k=10, mode="exact").collect()
    assert {r["conv_id"] for r in hits} == {"conv0-000", "conv0-001", "conv1-000"}

    # restart with same checkpoint: nothing re-consumed (exactly the TopicStream
    # watermark behavior), doc count stable
    q2 = index_stream(spark, src, idx, ckpt, CFG, available_now=True)
    q2.awaitTermination(120)
    assert IndexReader.open(idx, CFG).n_docs == 4

    # background merge folds the accumulated segments, results unchanged
    assert len(live_segments(idx)) == 2
    merge_segments(spark, idx, CFG)
    assert len(live_segments(idx)) == 1
    reader = IndexReader.open(idx, CFG)
    hits2 = bm25_topk(spark, reader, "alpha", k=10, mode="exact").collect()
    assert {r["conv_id"] for r in hits2} == {"conv0-000", "conv0-001", "conv1-000"}


def test_daemon_loop(spark):
    counts = daemon(lambda i: spark.range(i + 1).count(), runs=3)
    assert counts == [1, 2, 3]


def test_windowed_counts_streaming(spark, tmp_path):
    src = str(tmp_path / "evsrc")
    _mini_batch(spark, "w", ["x", "y", "z"], 1000).write.parquet(src)
    stream = (spark.readStream
              .schema("conv_id string, turn_idx int, role string, text string, "
                      "tool string, ts timestamp")
              .parquet(src))
    agg = windowed_counts(stream, "ts", "10 seconds", "1 minute")
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("win_counts").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from win_counts").collect()
    assert sum(r["count"] for r in rows) == 3


def test_sessionize_batch(spark):
    from solr_spark.streaming.sessions import sessionize_batch

    rows = [
        ("A", 0, "hi there", "2024-01-01 10:00:00"),
        ("A", 1, "ok", "2024-01-01 10:05:00"),
        ("A", 2, "back again", "2024-01-01 12:30:00"),
        ("A", 3, "yes", "2024-01-01 12:31:00"),
        ("B", 0, "solo turn", "2024-01-01 09:00:00"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string, ts_s string") \
        .withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts_s")).drop("ts_s")
    got = [(r.conv_id, r.session_id, r.n_turns, r.n_tokens)
           for r in sessionize_batch(df, gap_minutes=30).collect()]
    assert got == [("A", 0, 2, 3), ("A", 1, 2, 3), ("B", 0, 1, 2)]


def test_sessionize_stream_closes_superseded_sessions(spark, tmp_path):
    import pandas as pd
    from pyspark.sql import functions as F

    from solr_spark.streaming.sessions import sessionize_batch, sessionize_stream

    src = str(tmp_path / "turns")
    rows = [
        ("A", 0, "hi there", "2024-01-01 10:00:00"),
        ("A", 1, "ok", "2024-01-01 10:05:00"),
        ("A", 2, "back again", "2024-01-01 12:30:00"),
        ("A", 3, "yes", "2024-01-01 12:31:00"),
        ("B", 0, "solo turn", "2024-01-01 09:00:00"),
    ]
    df = (spark.createDataFrame(rows, "conv_id string, turn_idx int, text string, ts_s string")
          .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s"))
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (sessionize_stream(stream, gap_minutes=30)
         .writeStream.format("memory").queryName("sess_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.conv_id, r.session_id, r.n_turns, r.n_tokens)
           for r in spark.sql("select * from sess_out").collect()}
    # closed sessions = superseded inline (A0) or timed out because the final
    # watermark (max ts - 10min = 12:21) passed end + gap (B at 09:30);
    # A1 (closes 13:01) is still open and must NOT be emitted
    batch = sessionize_batch(df, gap_minutes=30).collect()
    want = {(r.conv_id, r.session_id, r.n_turns, r.n_tokens)
            for r in batch} - {("A", 1, 2, 3)}
    assert got == want


def test_streaming_index_dedup_signatures(spark, tmp_path):
    """Update-time signature dedup (SignatureUpdateProcessor role): exact and
    near-duplicate turns arriving in LATER micro-batches are dropped against
    the signature ledger; within-batch dups keep one."""
    from solr_spark.indexing import build_index
    from solr_spark.query import IndexReader, bm25_topk

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")

    base = "alpha alpha alpha beta beta gamma unique"
    tps_dup = "alpha alpha alpha beta beta delta unique"  # TPS-equal profile
    seed_df = _mini_batch(spark, "seed", [base], 100)
    build_index(spark, seed_df, idx, CFG, input_token="dedup-t0")
    signature_ledger_init(spark, seed_df, idx)  # live corpus into the ledger

    # batch 1: an exact dup of the seed, a TPS near-dup, a fresh doc,
    # and a within-batch pair of identical fresh docs
    _mini_batch(spark, "b1", [base, tps_dup, "totally new words here",
                              "pair pair pair same same",
                              "pair pair pair same same"], 200) \
        .write.parquet(src)
    q = index_stream(spark, src, idx, ckpt, CFG, available_now=True,
                     dedup_signatures="text_profile")
    q.awaitTermination(120)
    assert IndexReader.open(idx, CFG).n_docs == 3  # seed + 2 survivors

    # batch 2: replays the same contents as new files -> all dropped
    _mini_batch(spark, "b2", ["totally new words here",
                              "pair pair pair same same"], 300) \
        .write.mode("append").parquet(src)
    q = index_stream(spark, src, idx, ckpt, CFG, available_now=True,
                     dedup_signatures="text_profile")
    q.awaitTermination(120)
    reader = IndexReader.open(idx, CFG)
    assert reader.n_docs == 3
    hits = bm25_topk(spark, reader, "unique", k=10, mode="exact").collect()
    assert {r["conv_id"] for r in hits} == {"seed-000"}


def test_commit_tracker_max_docs_and_time(spark, tmp_path):
    """CommitTracker analog: small batches stage; the segment add fires on
    maxDocs or maxTime; the committed index equals a fresh full build."""
    from solr_spark.config import IndexConfig
    from solr_spark.data import synth_transcripts_spark
    from solr_spark.indexing import build_index
    from solr_spark.indexing.merge import segments_info
    from solr_spark.query import IndexReader, bm25_topk
    from solr_spark.streaming.topic import CommitTracker

    cfg = IndexConfig(range_shift=8, num_term_buckets=16)
    corpus = synth_transcripts_spark(spark, 300, seed=9)
    slices = [corpus.where(F.crc32("conv_id") % 3 == i) for i in range(3)]
    idx = str(tmp_path / "idx")
    build_index(spark, slices[0], idx, cfg, input_token="t0")
    n_seg0 = len(segments_info(spark, idx).collect())

    # maxDocs policy: first small batch stages, second crosses and commits
    tr = CommitTracker(spark, idx, cfg, max_docs=slices[1].count())
    assert tr.add(slices[1].limit(10)) is None          # staged only
    assert len(segments_info(spark, idx).collect()) == n_seg0
    stats = tr.add(slices[1].subtract(slices[1].limit(10)))
    assert stats is not None                            # committed ONE segment
    assert len(segments_info(spark, idx).collect()) == n_seg0 + 1

    # maxTime policy with an injected clock
    t = [0.0]
    tr2 = CommitTracker(spark, idx, cfg, max_time_s=30.0, clock=lambda: t[0])
    assert tr2.add(slices[2].limit(5)) is None
    t[0] = 31.0
    assert tr2.add(slices[2].subtract(slices[2].limit(5))) is not None

    # empty adds never commit; flush with nothing staged is a no-op
    assert tr2.add(slices[2].limit(0)) is None
    assert tr2.flush() is None

    # incrementally committed index == fresh full build, query-for-query
    full = str(tmp_path / "full")
    build_index(spark, corpus, full, cfg, input_token="t1")
    q = "error timeout"
    a = bm25_topk(spark, IndexReader.open(idx), q, k=10).collect()
    b = bm25_topk(spark, IndexReader.open(full), q, k=10).collect()
    assert [(r.conv_id, r.turn_idx, round(r.score, 6)) for r in a] == \
           [(r.conv_id, r.turn_idx, round(r.score, 6)) for r in b]
