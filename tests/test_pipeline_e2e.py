"""End-to-end training-data pipeline over the documents corpus: the composed
flow a 100-TB pretraining run needs, built entirely from this repo's operators.

    raw docs
      -> exact + TextProfileSignature dedup        (functions/dedup.py)
      -> Gopher-style repetition/quality gating    (functions/textanalysis.py)
      -> benchmark decontamination, 13-gram rule   (functions/dedup.py)
      -> per-language stratified quotas            (functions/sampling.py)
      -> deterministic train/val split             (functions/sampling.py)
      -> token-budget sequence packing             (functions/sampling.py)
      -> inverted-index build + BM25 query check   (indexing/, query/)

Every stage is the same Column-algebra/one-shuffle shape the per-operator
gates verify; this test pins the COMPOSITION end-to-end, including that the
final index only contains surviving documents.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from solr_spark.config import IndexConfig
from solr_spark.functions.dedup import decontaminate, drop_signature_duplicates
from solr_spark.functions.sampling import (
    chunk_token_windows,
    deterministic_split,
    stratified_quota_sample,
    temperature_mixture_sample,
    token_budget_packs,
)
from solr_spark.functions.textanalysis import repetition_stats, token_count
from solr_spark.indexing import build_index
from solr_spark.query import IndexReader, bm25_topk


def test_training_pipeline_end_to_end(spark, tmp_path):
    docs = (spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
            .where(token_count("text") >= 2))
    n_raw = docs.count()

    # 1. dedup: one survivor per fuzzy content profile
    deduped = drop_signature_duplicates(docs, "doc_id", "text")
    n_dedup = deduped.count()
    assert 0 < n_dedup < n_raw  # the synthetic corpus contains dups

    # 2. quality gate: drop docs dominated by one repeated bigram
    rep = repetition_stats(F.col("text"), 2)
    gated = (deduped.withColumn("__rep", rep)
             .where(F.col("__rep")["top_ngram_char_frac"] <= 0.60)
             .drop("__rep"))
    n_gated = gated.count()
    assert 0 < n_gated <= n_dedup

    # 3. decontamination vs a held-out "benchmark" slice
    bench = docs.where(F.col("doc_id") % 97 == 0)
    dirty = decontaminate(gated, bench, "doc_id", "text", n=13)
    clean = gated.join(dirty.select("doc_id"), "doc_id", "left_anti")
    n_clean = clean.count()
    assert n_clean == n_gated - dirty.count()  # dirty ⊆ gated survivors

    # 4. per-language quotas (data-mixing weights), deterministic
    mixed = stratified_quota_sample(clean, "doc_id", ["lang"], 40)
    per_lang = {r["lang"]: r["n"] for r in
                mixed.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per_lang and all(n <= 40 for n in per_lang.values())

    # 4b. temperature mixture (alpha<1): tail languages gain share vs their
    # natural proportion — the rebalancing knob next to hard quotas
    nat = {r["lang"]: r["n"] for r in
           clean.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    t_mix = temperature_mixture_sample(clean, "doc_id", "lang",
                                       budget=150, alpha=0.5)
    t_by = {r["lang"]: r["n"] for r in
            t_mix.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_mix = sum(t_by.values())
    tail = min(nat, key=nat.get)
    assert t_by[tail] / n_mix > nat[tail] / sum(nat.values())

    # 5. stable split + 6. token-budget packing of the train split
    split = deterministic_split(mixed, "doc_id",
                                {"train": 0.8, "val": 0.2})
    train = split.where(F.col("split") == "train")
    packs = token_budget_packs(train, "doc_id", "text", budget=400,
                               shard_col="lang")
    tot = packs.groupBy("lang", "pack_id") \
               .agg(F.sum("n_tokens").alias("t")).collect()
    assert all(r["t"] > 0 for r in tot)

    # 6b. long docs chunk into bounded training sequences; chunks then pack
    # like documents (chunk id = (doc, idx)) with no window ever overflowing
    chunks = chunk_token_windows(train, "doc_id", "text",
                                 window=128, stride=96)
    assert chunks.where(F.col("chunk_tokens") > 128).count() == 0
    assert chunks.select("doc_id").distinct().count() == train.count()
    chunk_docs = chunks.select(
        F.concat_ws("#", F.col("doc_id").cast("string"),
                    F.col("chunk_idx").cast("string")).alias("doc_id"),
        F.col("chunk_text").alias("text"),
        F.lit("all").alias("shard"))
    cpacks = token_budget_packs(chunk_docs, "doc_id", "text", budget=400,
                                shard_col="shard")
    assert cpacks.count() == chunks.count()  # every chunk lands in a pack

    # 7. index the surviving train docs as transcript turns; query round-trip
    corpus = train.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"), "text",
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"))
    idx = str(tmp_path / "pipeline_idx")
    cfg = IndexConfig(range_shift=8, num_term_buckets=8)
    stats = build_index(spark, corpus, idx, cfg, input_token="pipeline-e2e")
    assert stats["n_docs"] == train.count()
    reader = IndexReader.open(idx, cfg)
    hits = bm25_topk(spark, reader, "query join table", k=5,
                     mode="wand").collect()
    assert hits  # survivors are searchable
    surviving = {r["conv_id"] for r in
                 train.select(F.col("doc_id").cast("string")
                              .alias("conv_id")).collect()}
    assert all(h["conv_id"] in surviving for h in hits)
