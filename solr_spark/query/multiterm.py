"""Dictionary-expanded scored multi-term queries: prefix, wildcard, fuzzy.

Reference semantics: Lucene MultiTermQuery rewrite as exposed by the `prefix`
and `fuzzy` QParsers (solr/core/src/java/org/apache/solr/search/
QParserPlugin.java:46-96 registry entries). The pattern is expanded against the
ANALYZED term dictionary (not the raw column — matching analyzed terms is what
distinguishes these from the filter parser's LIKE/levenshtein predicates), the
expansion capped at max_expansions by descending document frequency (Lucene's
TopTermsRewrite keeps the highest-scoring/df terms), and the surviving terms
scored as ONE blended group: pooled tf per document, saturated once, idf from
the max member df — the SynonymQuery/BlendedTermQuery shape Lucene's
TopTermsBlendedFreqScoringRewrite produces. (Deviation, documented: Lucene's
FuzzyQuery additionally boosts each expanded term by edit-distance similarity;
the blend here weights all members equally.)

Scale shape: the expansion is a scan of the term DICTIONARY (dictionary rows ~
vocabulary size, orders of magnitude smaller than postings; Lucene walks its
term dict with an automaton just the same), and scoring reuses the bm25_topk
synonym path — partition-pruned posting reads + WAND.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solr_spark.query.bm25 import IndexReader, bm25_topk


def _top_expansions(matches: DataFrame, max_expansions: int) -> list[str]:
    rows = (matches.select("term", "df")
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions).collect())
    return [r["term"] for r in rows]


def expand_prefix(spark: SparkSession, reader: IndexReader, prefix: str,
                  max_expansions: int = 50) -> list[str]:
    """Analyzed terms starting with `prefix`, top-df-first (PrefixQuery)."""
    d = reader.dictionary(spark)
    esc = (prefix.replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_"))
    return _top_expansions(d.where(F.col("term").like(esc + "%")),
                           max_expansions)


def expand_wildcard(spark: SparkSession, reader: IndexReader, pattern: str,
                    max_expansions: int = 50) -> list[str]:
    """Analyzed terms matching a `*`/`?` wildcard pattern (WildcardQuery)."""
    d = reader.dictionary(spark)
    like = (pattern.replace("\\", "\\\\").replace("%", r"\%")
            .replace("_", r"\_").replace("*", "%").replace("?", "_"))
    return _top_expansions(d.where(F.col("term").like(like)), max_expansions)


def fuzzy_candidates(d: DataFrame, term: str, max_edits: int) -> DataFrame:
    """Dictionary rows within `max_edits` Levenshtein of `term`.

    The length band |len(t) - len(term)| <= max_edits (a necessary condition
    for the edit distance) filters on the dictionary's stored `tlen` column —
    a PLAIN column predicate that reaches the parquet scan as PushedFilters
    and prunes row groups (the dictionary is written length-clustered), so a
    fuzzy query reads a sliver of the vocabulary instead of scanning it
    (the automaton-intersection analog of Lucene's FuzzyQuery; plan-audited).
    levenshtein's threshold form then short-circuits the DP on survivors."""
    n = len(term)
    band = ((F.col("tlen") >= n - max_edits) & (F.col("tlen") <= n + max_edits)
            if "tlen" in d.columns else  # pre-tlen index layout
            (F.length("term") >= n - max_edits)
            & (F.length("term") <= n + max_edits))
    return d.where(
        band & (F.levenshtein(F.col("term"), F.lit(term), max_edits) >= 0))


def expand_fuzzy(spark: SparkSession, reader: IndexReader, term: str,
                 max_edits: int = 2, max_expansions: int = 50) -> list[str]:
    """Analyzed terms within `max_edits` Levenshtein of `term` (FuzzyQuery).

    The exact term itself is included when present (distance 0), as in
    Lucene. See fuzzy_candidates for the pushed-down pruning."""
    return _top_expansions(
        fuzzy_candidates(reader.dictionary(spark), term, max_edits),
        max_expansions)


def _blended_topk(spark: SparkSession, reader: IndexReader,
                  members: list[str], k: int) -> DataFrame:
    """Score an expansion set as one blended group via the bm25_topk synonym
    path. The canonical term is the first (highest-df) member — a real
    dictionary term, so re-analysis is the identity and the group always
    resolves regardless of what raw pattern produced the expansion."""
    out_schema = "conv_id string, turn_idx int, docid long, score double, rank int"
    if not members:
        return spark.createDataFrame([], out_schema)
    canon = members[0]
    return bm25_topk(spark, reader, canon, k=k, mode="wand",
                     synonyms={canon: members})


def prefix_topk(spark: SparkSession, reader: IndexReader, prefix: str,
                k: int = 10, max_expansions: int = 50) -> DataFrame:
    """Scored prefix query `pre*`: expand against the dictionary, score the
    expansion as one blended group."""
    return _blended_topk(
        spark, reader, expand_prefix(spark, reader, prefix, max_expansions), k)


def wildcard_topk(spark: SparkSession, reader: IndexReader, pattern: str,
                  k: int = 10, max_expansions: int = 50) -> DataFrame:
    """Scored wildcard query (`vec*or`, `t?rm`)."""
    return _blended_topk(
        spark, reader,
        expand_wildcard(spark, reader, pattern, max_expansions), k)


def fuzzy_topk(spark: SparkSession, reader: IndexReader, term: str,
               k: int = 10, max_edits: int = 2,
               max_expansions: int = 50) -> DataFrame:
    """Scored fuzzy query `term~N`: dictionary-expanded, blended-group scored."""
    return _blended_topk(
        spark, reader,
        expand_fuzzy(spark, reader, term, max_edits, max_expansions), k)
