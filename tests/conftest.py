from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master(os.environ.get("SPARK_TEST_MASTER", "local[4]"))
        .appName("solr_spark_tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_TEST_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("WARN")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_corpus_pdf():
    from solr_spark.data import synth_transcripts_pandas

    return synth_transcripts_pandas(1000, seed=42)


@pytest.fixture(scope="session")
def small_corpus(spark, small_corpus_pdf):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    return spark.createDataFrame(small_corpus_pdf, schema=schema).repartition(8, "conv_id")


@pytest.fixture(scope="session")
def oracle(small_corpus_pdf):
    from solr_spark.oracle import OracleIndex

    rows = list(
        zip(small_corpus_pdf["conv_id"], small_corpus_pdf["turn_idx"], small_corpus_pdf["text"])
    )
    return OracleIndex.from_rows(rows)


@pytest.fixture(scope="session")
def built_index(spark, small_corpus, tmp_path_factory):
    from solr_spark.indexing import build_index

    index_dir = str(tmp_path_factory.mktemp("index"))
    # small range_shift so the 1k-doc corpus spans multiple ranges (exercises chunking)
    from solr_spark.config import IndexConfig

    cfg = IndexConfig(range_shift=8, num_term_buckets=16)
    stats = build_index(spark, small_corpus, index_dir, cfg, input_token="synth-1k-s42")
    return index_dir, cfg, stats
