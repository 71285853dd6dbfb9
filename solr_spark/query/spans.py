"""Span algebra: composable positional queries — the surround parser family.

Reference behavior specs: solr/core/src/java/org/apache/solr/search/
SurroundQParserPlugin.java:41 (the `{!surround}` W/N/OR/NOT operators) and
ComplexPhraseQParserPlugin.java, both lowering to Lucene's SpanQuery family
(SpanTermQuery / SpanNearQuery ordered+unordered / SpanOrQuery / SpanNotQuery),
arbitrarily NESTED: `3W(2N(a, b), c)` is a first-class query.

Semantics here (documented, deliberately set-valued): a span node evaluates,
per document, to the SET of distinct (start, end) token windows it matches:

  term t          -> {(p, p+1) for every occurrence p}
  or(c1..cn)      -> union of the children's span sets
  near(c1..cn, slop, ordered) -> {(min start, max end)} over every tuple of
                     child spans that (ordered) chain start-after-end in
                     clause order, or (unordered) are mutually NON-OVERLAPPING,
                     with total-gap budget (max_end - min_start) - sum(child
                     span lengths) <= slop  — Lucene NearSpansOrdered's width
                     rule applied exhaustively.
  not(inc, exc)   -> include spans that do not overlap ANY exclude span

Deviation from Lucene, stated: Lucene's span iterators enumerate matches
lazily and can skip some same-window alignments; the set semantics above is
deterministic, order-free, and engine-portable (SQL-twin-checkable), with
tf = |span set| feeding BM25 exactly like the phrase path.

Scale shape: candidates are pre-filtered through the inverted index (AND of
clause groups, OR within a group — one partition-pruned posting read per
term), then a per-doc evaluator runs over the analyzed forward index for the
candidate set only, batch-at-a-time over Arrow. The evaluator is pure Python
over one doc's occurrence lists (the reference's span iterators are equally
per-document and sequential); docs are bounded by the candidate prefilter.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from solr_spark.analysis import analyze_text
from solr_spark.query.bm25 import IndexReader, _idf


# ------------------------------------------------------------------------ AST

@dataclass(frozen=True)
class SpanTerm:
    term: str


@dataclass(frozen=True)
class SpanOr:
    clauses: tuple

    def __init__(self, *clauses):
        object.__setattr__(self, "clauses", tuple(clauses))


@dataclass(frozen=True)
class SpanNear:
    clauses: tuple
    slop: int = 0
    ordered: bool = True

    def __init__(self, clauses, slop: int = 0, ordered: bool = True):
        object.__setattr__(self, "clauses", tuple(clauses))
        object.__setattr__(self, "slop", int(slop))
        object.__setattr__(self, "ordered", bool(ordered))


@dataclass(frozen=True)
class SpanNot:
    include: object
    exclude: object


@dataclass(frozen=True)
class SpanFirst:
    """Spans of `inner` ending at or before position `end` (Lucene
    SpanFirstQuery — the CoreParser `<SpanFirst end="N">` builder)."""
    inner: object
    end: int


def span_term(text: str, config=None) -> SpanTerm:
    """Analyze `text` to exactly one term and wrap it (surround's leaf)."""
    terms = analyze_text(text, config) if config is not None \
        else analyze_text(text)
    if len(terms) != 1:
        raise ValueError(f"span_term needs exactly one analyzed term, "
                         f"got {terms!r} from {text!r}")
    return SpanTerm(terms[0])


# ----------------------------------------------------------------- evaluation

def span_eval(node, positions: dict[str, list[int]]) -> list[tuple[int, int]]:
    """Evaluate a span AST against one document's per-term position lists.
    Returns the sorted set of (start, end) spans. Pure function (unit-tested
    against hand vectors); the Spark kernel maps it over candidate docs."""
    if isinstance(node, SpanTerm):
        return [(p, p + 1) for p in positions.get(node.term, ())]
    if isinstance(node, SpanOr):
        out = set()
        for c in node.clauses:
            out.update(span_eval(c, positions))
        return sorted(out)
    if isinstance(node, SpanNot):
        inc = span_eval(node.include, positions)
        exc = span_eval(node.exclude, positions)
        return [s for s in inc
                if not any(s[0] < e[1] and e[0] < s[1] for e in exc)]
    if isinstance(node, SpanFirst):
        return [s for s in span_eval(node.inner, positions)
                if s[1] <= node.end]
    if isinstance(node, SpanNear):
        child_spans = [span_eval(c, positions) for c in node.clauses]
        if any(not cs for cs in child_spans):
            return []
        # Exhaustive alignment is exponential in the worst case (a hostile
        # doc repeating every clause term hundreds of times). Fail LOUDLY
        # instead of hanging an executor; real span queries have 2-4 clauses
        # over bounded per-doc occurrence counts, far under this cap.
        fanout = 1
        for cs in child_spans:
            fanout *= len(cs)
        if fanout > 1_000_000:
            raise ValueError(
                f"span-near fan-out {fanout} exceeds the per-doc alignment "
                f"cap (clause occurrence counts "
                f"{[len(cs) for cs in child_spans]})")
        out: set[tuple[int, int]] = set()
        n = len(child_spans)

        def rec(i: int, chosen: list[tuple[int, int]]) -> None:
            if i == n:
                lo = min(s for s, _ in chosen)
                hi = max(e for _, e in chosen)
                total = sum(e - s for s, e in chosen)
                if (hi - lo) - total <= node.slop:
                    out.add((lo, hi))
                return
            for s in child_spans[i]:
                if node.ordered:
                    if chosen and s[0] < chosen[-1][1]:
                        continue
                    # safe prune: ordered suffixes only ever GROW the window
                    # and the gap total, so a prefix already over budget
                    # cannot recover
                    if chosen:
                        lo = chosen[0][0]
                        total = sum(e - b for b, e in chosen) + (s[1] - s[0])
                        if (s[1] - lo) - total > node.slop:
                            continue
                else:
                    if any(s[0] < e and b < s[1] for b, e in chosen):
                        continue  # unordered spans must not overlap
                rec(i + 1, chosen + [s])

        rec(0, [])
        return sorted(out)
    raise TypeError(f"not a span node: {node!r}")


def _required_groups(node) -> list[set[str]]:
    """CNF-ish prefilter groups: a doc can match only if, for every group,
    it contains at least one of the group's terms. NOT prunes on include."""
    if isinstance(node, SpanTerm):
        return [{node.term}]
    if isinstance(node, SpanOr):
        terms: set[str] = set()
        for c in node.clauses:
            for g in _required_groups(c):
                terms |= g
        return [terms] if terms else []
    if isinstance(node, SpanNot):
        return _required_groups(node.include)
    if isinstance(node, SpanFirst):
        return _required_groups(node.inner)
    if isinstance(node, SpanNear):
        out = []
        for c in node.clauses:
            out.extend(_required_groups(c))
        return out
    raise TypeError(f"not a span node: {node!r}")


def _all_terms(node) -> set[str]:
    if isinstance(node, SpanTerm):
        return {node.term}
    if isinstance(node, SpanOr):
        return set().union(*[_all_terms(c) for c in node.clauses])
    if isinstance(node, SpanNot):
        return _all_terms(node.include) | _all_terms(node.exclude)
    if isinstance(node, SpanFirst):
        return _all_terms(node.inner)
    if isinstance(node, SpanNear):
        return set().union(*[_all_terms(c) for c in node.clauses])
    raise TypeError(f"not a span node: {node!r}")


def _span_kernel(node, terms: list[str]):
    """mapInArrow kernel: Arrow-vectorized occurrence extraction, then the
    pure span_eval per candidate doc. tf = |span set|."""
    import numpy as np

    def it(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        out = pa.schema([("docid", pa.int64()), ("tf", pa.int64()),
                         ("dl", pa.int64())])
        term_arr = pa.array(terms)
        for b in batches:
            if not b.num_rows:
                continue
            docid = b.column("docid").to_numpy()
            dls = b.column("dl").to_numpy()
            tok_lists = pc.split_pattern(b.column("toks"), " ")
            lens = pc.list_value_length(tok_lists).to_numpy()
            codes = pc.fill_null(
                pc.index_in(pc.list_flatten(tok_lists), value_set=term_arr), -1
            ).to_numpy().astype(np.int64, copy=False)
            row_of = np.repeat(np.arange(len(docid), dtype=np.int64), lens)
            pos = np.arange(len(codes), dtype=np.int64) \
                - np.repeat(np.cumsum(lens) - lens, lens)
            occ = codes >= 0
            oc, orow, opos = codes[occ], row_of[occ], pos[occ]
            ids, tfs, odls = [], [], []
            for r in np.unique(orow):
                m = orow == r
                positions = {terms[t]: opos[m & (oc == t)].tolist()
                             for t in range(len(terms))}
                spans = span_eval(node, positions)
                if spans:
                    ids.append(docid[r])
                    tfs.append(len(spans))
                    odls.append(int(dls[r]))
            if ids:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(np.asarray(ids, dtype=np.int64)),
                     pa.array(np.asarray(tfs, dtype=np.int64)),
                     pa.array(np.asarray(odls, dtype=np.int64))], schema=out)

    return it


def span_matches(spark: SparkSession, reader: IndexReader, node):
    """Evaluate a span AST over the index: (matched, analyzed) where
    `matched` is DataFrame(docid, tf, dl) — tf = |distinct span set| — and
    `analyzed` is the live (delete-filtered) forward table the candidates
    came from. Candidates are index-prefiltered per _required_groups before
    the forward-index evaluator runs. Shared by span_topk (scored path) and
    the XML query parser's filter path (query/xmlquery.py)."""
    from solr_spark.query.bm25 import term_docs

    terms = sorted(_all_terms(node))
    analyzed = spark.read.parquet(
        os.path.join(reader.index_dir, "analyzed", "batch-*")
    ).select("docid", "conv_id", "turn_idx", "dl", "toks")

    from solr_spark.indexing.deletes import deletes_df

    dels = deletes_df(spark, reader.index_dir)
    if dels is not None:
        analyzed = analyzed.join(dels, "docid", "left_anti")

    for group in _required_groups(node):
        cand = None
        for t in sorted(group):
            td = term_docs(spark, reader, t)
            cand = td if cand is None else cand.unionByName(td).distinct()
        if cand is not None:
            analyzed = analyzed.join(cand, "docid", "left_semi")

    matched = analyzed.select("docid", "dl", "toks").mapInArrow(
        _span_kernel(node, terms), "docid long, tf long, dl long")
    return matched, analyzed


def span_topk(spark: SparkSession, reader: IndexReader, node,
              k: int = 10) -> DataFrame:
    """Top-k documents matching a span AST, BM25-scored with tf = |span set|
    and query-time df = number of matching docs (the phrase path's scoring
    contract)."""
    cfg = reader.config
    out_schema = ("conv_id string, turn_idx int, docid long, "
                  "score double, rank int")
    k = min(k, reader.n_docs)  # uncapped k OOMs Spark's TakeOrdered
    matched, analyzed = span_matches(spark, reader, node)
    df_span = matched.count()
    if df_span == 0:
        return spark.createDataFrame([], out_schema)
    w = _idf(reader.n_docs, df_span)
    k1, b, avgdl = cfg.k1, cfg.b, reader.avgdl
    scored = matched.withColumn(
        "score", F.lit(w) * F.col("tf")
        / (F.col("tf")
           + F.lit(k1) * (1.0 - b + b * F.col("dl") / F.lit(avgdl))))
    topk = scored.orderBy(F.desc("score"), F.asc("docid")).limit(k)
    return (topk.join(analyzed.select("docid", "conv_id", "turn_idx"),
                      "docid")
            .withColumn("rank", F.row_number().over(
                Window.orderBy(F.desc("score"), F.asc("docid"))))
            .select("conv_id", "turn_idx", "docid", "score", "rank")
            .orderBy("rank"))
