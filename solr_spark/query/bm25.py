"""BM25 top-k query layer: posting reads -> vectorized scoring -> block-max WAND.

Scoring follows Lucene 10's BM25Similarity (the reference's implicit default —
solr/core/src/java/org/apache/solr/search/similarities/SchemaSimilarityFactory.java:106,
defaults k1=1.2 b=0.75 per BM25SimilarityFactory.java:48-49):

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d) = sum_t  qtf(t) * idf(t) * tf / (tf + k1*(1 - b + b*dl_q/avgdl))

(no (k1+1) factor, as in Lucene 9+), where dl_q is the SmallFloat-quantized document
length and avgdl = sumTotalTermFreq/docCount. Ties break by docid ascending.

Distributed two-phase top-k (the reference's GET_TOP_IDS / GET_FIELDS split,
handler/component/QueryComponent.java:789,971,1402):
  phase 1: term-bucket-pruned posting scan -> per-range vectorized scoring kernel ->
           bounded candidates; global orderBy(score desc, docid).limit(k)
  phase 2: join winning docids back to the doc map for (conv_id, turn_idx).

Global (not per-shard) df/N/avgdl are broadcast into the kernels — the
ExactStatsCache lesson (search/stats/ExactStatsCache.java:61) applied by design.

WAND mode (reference exposure: QueryComponent.java:448-452, RankQParserPlugin.java:32):
posting-range rows carry max_tf; the per-range score upper bound
  sum_t weight_t * max_tf/(max_tf + k1*(1-b))          (dl -> 0 bound)
is computed JVM-side. Ranges are processed per-partition in descending bound order by
a mapInPandas kernel holding a bounded min-heap of size k; a range whose bound is
strictly below the partition's current k-th score is skipped without decoding.
Skipping against the partition-local k-th is safe: the global top-k is a subset of the
union of partition top-k's.
"""

from __future__ import annotations

import heapq
import json
import os
from collections import Counter
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from solr_spark.analysis import analyze_text
from solr_spark.codec.smallfloat import norm_length_table
from solr_spark.codec.varint import decode_postings
from solr_spark.config import DEFAULT_CONFIG, IndexConfig
from solr_spark.indexing.build import live_segments

_TOPK_SCHEMA = "docid long, score double"

from solr_spark.query.similarity import BM25Similarity as _BM25Sim  # noqa: E402
from solr_spark.query.similarity import resolve as _resolve_sim  # noqa: E402

_DEFAULT_SIM = _BM25Sim()


@dataclass
class IndexReader:
    """Handle on an on-disk index (paths + corpus stats).

    `warm(spark)` persists the per-query hot structures — norms and the
    docid -> (conv_id, turn_idx) map — the way a serving searcher keeps its
    norms/stored-field readers open across requests (reference analog:
    SolrIndexSearcher's caches, search/SolrIndexSearcher.java:164). Cuts
    steady-state query latency; `close(spark)` releases.
    """

    index_dir: str
    n_docs: int
    avgdl: float
    config: IndexConfig
    _cached: dict = None  # populated by warm()

    @classmethod
    def open(cls, index_dir: str, config: IndexConfig | None = None) -> "IndexReader":
        with open(os.path.join(index_dir, "stats.json")) as f:
            stats = json.load(f)
        if config is None:
            # stats.json carries the FULL build config (build.write_stats);
            # restore every field so query-time analysis (stopwords,
            # max_token_length, ...) matches index-time analysis exactly.
            from dataclasses import fields

            c = stats.get("config", {})
            known = {f.name for f in fields(IndexConfig)}
            config = IndexConfig(**{k: v for k, v in c.items() if k in known})
        return cls(index_dir, stats["n_docs"], stats["avgdl"], config)

    def segment_paths(self) -> list[str]:
        return [os.path.join(self.index_dir, "segments", n)
                for n in live_segments(self.index_dir)]

    def doc_map(self, spark: SparkSession) -> DataFrame:
        if self._cached and "doc_map" in self._cached:
            return self._cached["doc_map"]
        return spark.read.parquet(
            os.path.join(self.index_dir, "analyzed", "batch-*")
        ).select("docid", "conv_id", "turn_idx")

    def forward(self, spark: SparkSession) -> DataFrame:
        """The FULL forward table: docid, conv_id, turn_idx, dl, toks, plus
        any stored attribute columns (build_index stored_cols — the
        stored-field/docValues role). Filter predicates over it push down to
        the parquet scan; column pruning drops toks when unused."""
        return spark.read.parquet(
            os.path.join(self.index_dir, "analyzed", "batch-*"))

    def norms(self, spark: SparkSession) -> DataFrame:
        if self._cached and "norms" in self._cached:
            return self._cached["norms"]
        return spark.read.parquet(os.path.join(self.index_dir, "norms"))

    def dictionary(self, spark: SparkSession) -> DataFrame:
        if self._cached and "dictionary" in self._cached:
            return self._cached["dictionary"]
        return spark.read.parquet(os.path.join(self.index_dir, "dictionary"))

    def segments_df(self, spark: SparkSession) -> DataFrame:
        if self._cached and "segments" in self._cached:
            return self._cached["segments"]
        from solr_spark.indexing.build import read_segments

        return read_segments(spark, self.segment_paths())

    def warm(self, spark: SparkSession, segments: bool = False) -> "IndexReader":
        """Persist + materialize the hot query-side structures (idempotent).

        Always pins norms, the doc map, and the term dictionary (small: bytes
        per doc / per term). `segments=True` additionally pins the posting
        table itself — the serving posture when the working set fits executor
        memory (the reference equivalently depends on the OS page cache keeping
        hot postings resident); leave False when the index dwarfs the cluster's
        memory and rely on term_bucket partition pruning instead.
        """
        if self._cached:
            return self
        norms = spark.read.parquet(
            os.path.join(self.index_dir, "norms")).persist()
        doc_map = (spark.read.parquet(
            os.path.join(self.index_dir, "analyzed", "batch-*"))
            .select("docid", "conv_id", "turn_idx").persist())
        dictionary = spark.read.parquet(
            os.path.join(self.index_dir, "dictionary")).persist()
        norms.count()
        doc_map.count()
        dictionary.count()
        self._cached = {"norms": norms, "doc_map": doc_map,
                        "dictionary": dictionary}
        if segments:
            from solr_spark.indexing.build import read_segments

            seg = read_segments(spark, self.segment_paths()).persist()
            seg.count()
            self._cached["segments"] = seg
        return self

    def close(self, spark: SparkSession) -> None:
        for df in (self._cached or {}).values():
            df.unpersist()
        self._cached = None


def _term_buckets(terms: list[str], num_buckets: int) -> list[int]:
    import zlib

    return [zlib.crc32(t.encode()) % num_buckets for t in terms]


def _idf(n_docs: int, df: int) -> float:
    return float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


def _score_group(pdf: pd.Series, weights: dict, cfg: IndexConfig, avgdl: float,
                 length_table: np.ndarray, min_match: int,
                 groups: dict | None = None, gweights: dict | None = None,
                 sim=None, params: dict | None = None,
                 prohibited: set | None = None, required: set | None = None,
                 filtered: bool = False,
                 combine: str = "sum", tie: float = 0.0):
    """Score one range group; returns (docids, scores) numpy arrays.

    min_match is the edismax `mm` contract (ExtendedDismaxQParser.java:66):
    1 = pure disjunction, len(query terms) = conjunction, anything between =
    min-should-match (over synonym GROUPS when groups is set).

    groups/gweights enable Lucene SynonymQuery semantics (query-time
    SynonymGraphFilter, managed-schema.xml:309): every member term of a group
    contributes to ONE pooled tf per document, saturated once, weighted by the
    group's idf (computed from the max member df, as SynonymQuery does).

    sim/params plug the per-field Similarity (query/similarity.py; default
    BM25): params maps term (or group id) -> the similarity's per-term scalar
    (e.g. the LM collection probability).

    prohibited: terms whose postings ride the same range group but only mark
    documents for exclusion (BooleanClause.MUST_NOT — Lucene's ReqExclScorer
    skipping excluded docs before collection; they contribute no score and no
    mm count). required: canonical terms/groups that must ALL be present in a
    doc for it to match (BooleanClause.MUST over an otherwise-SHOULD query).

    combine/tie: the `{!maxscore}` qparser's clause combiner (reference:
    search/MaxScoreQParser.java:53 — SHOULD clauses are wrapped in a
    DisjunctionMaxQuery with `tie` as the tiebreaker, MUST clauses pass
    through as ordinary summed BooleanClauses). combine="dismax" scores a
    doc as sum(MUST contribs) + max(SHOULD contribs) + tie * (sum(SHOULD
    contribs) - max); combine="sum" (default) is the ordinary BooleanQuery
    sum. Synonym groups are not combinable with dismax (the reference parses
    `{!maxscore}` through the plain Lucene grammar, which has no graph
    expansion at that point).
    """
    if combine not in ("sum", "dismax"):
        raise ValueError(f"combine must be 'sum' or 'dismax', got {combine!r}")
    if combine == "dismax" and groups is not None:
        raise ValueError("combine='dismax' does not support synonym groups")
    if sim is None:
        sim = _DEFAULT_SIM
    params = params or {}
    base = int(pdf["range_id"].iloc[0]) << cfg.range_shift
    norm_blob = pdf["norm_bytes"].iloc[0]
    if cfg.lucene_norms:
        norms = np.frombuffer(norm_blob, dtype=np.uint8)
        dls = length_table[norms].astype(np.float64)
    else:
        dls = np.frombuffer(norm_blob, dtype=np.uint32).astype(np.float64)
    width = len(dls)
    acc = np.zeros(width, dtype=np.float64)
    # dismax combiner state: max SHOULD contribution per doc, plus the
    # pass-through sum of MUST contributions (MaxScoreQParser.java:63-78)
    acc_max = np.zeros(width, dtype=np.float64) if combine == "dismax" else None
    acc_must = np.zeros(width, dtype=np.float64) if combine == "dismax" else None
    present = np.zeros(width, dtype=np.int32) if min_match > 1 else None
    excl = None
    req_hit = np.zeros(width, dtype=np.int32) if required else None
    # fq DocSet mask (query/docsets.py): the range's filter bitmap rides the
    # posting rows via the range_id join; ANDed after scoring, before
    # collection — the getProcessedFilter intersection
    allow = None
    if filtered:
        from solr_spark.query.docsets import unpack_bits

        allow = unpack_bits(bytes(pdf["filter_bits"].iloc[0]), width)

    def _finish():
        if acc_max is not None:
            final = acc_must + acc_max + tie * (acc - acc_max)
        else:
            final = acc
        if present is not None:
            keep = present >= min_match
        elif acc_max is not None:
            keep = final > 0.0
        else:
            keep = acc > 0.0
        if req_hit is not None:
            keep &= req_hit >= len(required)
        if excl is not None:
            keep &= ~excl
        if allow is not None:
            keep &= allow
        nz = np.flatnonzero(keep)
        return nz + base, final[nz]

    # fixed term order => deterministic float summation (matches the oracle)
    order = np.argsort(pdf["term"].to_numpy(), kind="stable")
    if groups is None:
        for i in order:
            row = pdf.iloc[i]
            term = row["term"]
            d, t = decode_postings(bytes(row["doc_gaps"]), bytes(row["tfs"]), base)
            off = d - base
            if prohibited and term in prohibited:
                if excl is None:
                    excl = np.zeros(width, dtype=bool)
                excl[off] = True
                continue
            tf = t.astype(np.float64)
            contrib = sim.contrib(tf, dls[off], weights[term],
                                  params.get(term, 0.0), cfg, avgdl)
            if acc_max is not None and required and term in required:
                # MUST clauses bypass the dismax: ordinary summed clauses
                acc_must[off] += contrib
            else:
                acc[off] += contrib
                if acc_max is not None:
                    # off is unique within one posting list: plain fancy-index max
                    acc_max[off] = np.maximum(acc_max[off], contrib)
            if present is not None:
                present[off] += 1
            if req_hit is not None and term in required:
                req_hit[off] += 1
        return _finish()

    # synonym path: pool tf per group first, saturate once per group.
    # groups maps member term -> tuple of canonical group ids (a member may
    # belong to several groups when query terms' expansions overlap — each
    # canonical query term always owns its own group, so min_match counts
    # the user's terms, never a collapsed overlap).
    pooled: dict = {}
    for i in order:
        row = pdf.iloc[i]
        term = row["term"]
        d, t = decode_postings(bytes(row["doc_gaps"]), bytes(row["tfs"]), base)
        if prohibited and term in prohibited:
            if excl is None:
                excl = np.zeros(width, dtype=bool)
            excl[d - base] = True
            continue
        for gid in groups[term]:
            tfg = pooled.get(gid)
            if tfg is None:
                tfg = pooled[gid] = np.zeros(width, dtype=np.float64)
            tfg[d - base] += t
    for gid in sorted(pooled):  # deterministic group order
        tfg = pooled[gid]
        hit = np.flatnonzero(tfg)
        tf = tfg[hit]
        acc[hit] += sim.contrib(tf, dls[hit], gweights[gid],
                                params.get(gid, 0.0), cfg, avgdl)
        if present is not None:
            present[hit] += 1
        if req_hit is not None and gid in required:
            req_hit[hit] += 1
    return _finish()


def _local_topk(docids: np.ndarray, scores: np.ndarray, k: int):
    if len(docids) > k:
        kth = np.partition(scores, len(scores) - k)[len(scores) - k]
        keep = scores >= kth  # keep boundary ties; global sort resolves by docid
        docids, scores = docids[keep], scores[keep]
    return docids, scores


def terms_postings(spark: SparkSession, reader: IndexReader,
                   terms: list[str]) -> DataFrame:
    """Decoded postings for a set of query terms: DataFrame(term, docid, tf).

    Partition-pruned by term_bucket exactly like term_docs; the decode kernel
    touches only the query terms' posting-range rows (a handful per term), so
    the per-row Python is bounded by #terms x #ranges, never by corpus size.
    The relational shape feeds multi-field scoring (edismax) where the
    per-(term, docid) contribution must stay a DataFrame column.
    """
    cfg = reader.config
    terms = sorted(set(terms))
    if not terms:
        return spark.createDataFrame([], "term string, docid long, tf int")
    buckets = sorted(set(_term_buckets(terms, cfg.num_term_buckets)))
    seg = reader.segments_df(spark)
    rows = seg.where(F.col("term_bucket").isin(buckets)
                     & F.col("term").isin(terms)) \
              .select("term", "range_id", "doc_gaps", "tfs")
    shift = cfg.range_shift

    def decode_iter(batches):
        for pdf in batches:
            ts, ds, fs = [], [], []
            for row in pdf.itertuples(index=False):
                base = int(row.range_id) << shift
                d, t = decode_postings(bytes(row.doc_gaps), bytes(row.tfs), base)
                ds.append(d)
                fs.append(t)
                ts.append(np.repeat(np.array([row.term], dtype=object), len(d)))
            if ds:
                yield pd.DataFrame({
                    "term": np.concatenate(ts),
                    "docid": np.concatenate(ds),
                    "tf": np.concatenate(fs).astype(np.int32),
                })

    post = rows.mapInPandas(decode_iter, "term string, docid long, tf int")
    from solr_spark.indexing.deletes import deletes_df

    dels = deletes_df(spark, reader.index_dir)
    if dels is not None:
        post = post.join(dels, "docid", "left_anti")
    return post


def term_docs(spark: SparkSession, reader: IndexReader, term: str,
              apply_deletes: bool = True) -> DataFrame:
    """All documents containing `term`: partition-pruned posting lookup.

    The analog of a single-term `{!term}` filter query resolved from the inverted
    index (reference: search/TermQParserPlugin.java): prune segment files by
    term_bucket, decode only that term's posting ranges in an Arrow kernel.
    Returns DataFrame(docid long) — join doc_map for display fields.
    Tombstoned docids (indexing/deletes.py) are anti-joined away unless
    apply_deletes=False (the delete path itself needs the raw postings).
    """
    cfg = reader.config
    bucket = _term_buckets([term], cfg.num_term_buckets)[0]
    seg = reader.segments_df(spark)
    rows = seg.where((F.col("term_bucket") == bucket) & (F.col("term") == term)) \
              .select("range_id", "doc_gaps", "tfs")
    shift = cfg.range_shift

    def decode_iter(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                base = int(row["range_id"]) << shift
                d, _t = decode_postings(bytes(row["doc_gaps"]), bytes(row["tfs"]), base)
                out.append(d)
            if out:
                yield pd.DataFrame({"docid": np.concatenate(out)})

    docs = rows.mapInPandas(decode_iter, "docid long")
    if apply_deletes:
        from solr_spark.indexing.deletes import deletes_df

        dels = deletes_df(spark, reader.index_dir)
        if dels is not None:
            docs = docs.join(dels, "docid", "left_anti")
    return docs


def graph_terms_docs(spark: SparkSession, reader: IndexReader,
                     terms: list[str], max_doc_freq: int | None = None,
                     apply_deletes: bool = True) -> DataFrame:
    """`{!graphTerms}` — a terms filter that SKIPS high-frequency terms.

    Reference: search/GraphTermsQParserPlugin.java:72-88 — match documents
    containing any of `terms`, but a term whose docFreq exceeds maxDocFreq
    contributes NO matches (graph traversals use this to avoid fanning out
    through hub nodes). maxDocFreq=None (the reference's Integer.MAX_VALUE
    default, :100) degrades to a plain set query.

    Spark shape: the df cap is resolved against the DICTIONARY (tiny,
    term-bucket pruned) before any posting is decoded — a capped-out term
    costs one dictionary row, never a posting scan. Surviving terms ride the
    same partition-pruned decode kernel as term_docs. Output: docid, distinct.
    """
    terms = sorted(set(terms))
    if not terms:
        return spark.createDataFrame([], "docid long")
    if max_doc_freq is not None:
        cfg = reader.config
        buckets = sorted(set(_term_buckets(terms, cfg.num_term_buckets)))
        rows = (reader.dictionary(spark)
                .where(F.col("term_bucket").isin(buckets)
                       & F.col("term").isin(terms)
                       & (F.col("df") <= max_doc_freq))
                .select("term").collect())
        terms = sorted(r["term"] for r in rows)
        if not terms:
            return spark.createDataFrame([], "docid long")
    docs = terms_postings(spark, reader, terms).select("docid").distinct()
    if apply_deletes:
        from solr_spark.indexing.deletes import deletes_df

        dels = deletes_df(spark, reader.index_dir)
        if dels is not None:
            docs = docs.join(dels, "docid", "left_anti")
    return docs


def bm25_topk(
    spark: SparkSession,
    reader: IndexReader,
    query_text: str,
    k: int = 10,
    mode: str = "wand",
    require_all: bool = False,
    min_match: int | str | None = None,
    synonyms: dict[str, list[str]] | None = None,
    boosts: dict[str, float] | None = None,
    similarity: str | object = "bm25",
    prohibited: list[str] | None = None,
    required: list[str] | None = None,
    filters: list[str] | str | None = None,
    filter_docids: DataFrame | None = None,
    now: str | None = None,
    combine: str = "sum",
    tie: float = 0.0,
) -> DataFrame:
    """Top-k scored retrieval. Returns DataFrame(conv_id, turn_idx, docid, score, rank).

    filters / filter_docids: the q+fq flow (SolrIndexSearcher.java:1254
    getProcessedFilter). `filters` are classic-parser strings compiled
    against the forward table (query/docsets.py::filter_docids — stored
    attribute columns, conv_id/turn_idx, and `text` = analyzed tokens;
    `now` anchors date-math endpoints like `ts:[NOW-7DAYS TO *]`);
    `filter_docids` is a precomputed DataFrame(docid) — the filterCache
    handle, reusable across queries. Either becomes per-range bitmaps
    inner-joined to the posting scan: ranges with no allowed doc are skipped
    WITHOUT decoding (composing with WAND's bound skipping), surviving docs
    are masked before heap collection, and a selective filter still returns
    k hits (post-joining the top-k would not). Scoring stats stay GLOBAL —
    fq narrows the result set, never the scoring model.

    similarity: scoring model — "bm25" (default), "classic" (TF-IDF),
    "boolean", "lmdirichlet", "lmjelinekmercer", or a Similarity instance
    (query/similarity.py; the reference's per-field SimilarityFactory surface,
    schema/SimilarityFactory.java). Both exact and WAND modes honor it — each
    similarity supplies its own block-max range bound.

    min_match: edismax-style min-should-match over distinct query terms
    (1 = OR, n_terms = AND); require_all is shorthand for min_match = n_terms.

    boosts: per-term clause boosts — the classic parser's `term^2` syntax
    (grammar parser/QueryParser.jj; BoostQParserPlugin.java). Keys are
    analyzed terms; each multiplies that term's weight in the scoring kernel
    AND its WAND range bound (a boosted clause prunes consistently). With
    synonyms, a boost on a canonical term scales its whole group.

    synonyms: query-time expansion map {query term -> [synonym phrases]}, the
    SynonymGraphFilter position of the reference's default QUERY chain
    (managed-schema.xml:309). Scored with Lucene SynonymQuery semantics: a
    group's member terms pool their tf per document (saturated once) and share
    one idf computed from the max member df. min_match counts GROUPS.

    combine/tie: `{!maxscore}` semantics (search/MaxScoreQParser.java:53 —
    SHOULD clauses dismaxed with tiebreaker `tie`, MUST clauses summed
    through). WAND is unchanged: the per-range sum-of-term-bounds remains a
    valid upper bound for the dismax score because tie <= 1 implies
    max + tie * (sum - max) <= sum.
    """
    if combine not in ("sum", "dismax"):
        raise ValueError(f"combine must be 'sum' or 'dismax', got {combine!r}")
    if combine == "dismax" and synonyms:
        raise ValueError("combine='dismax' does not support synonyms")
    if combine == "dismax" and not (0.0 <= tie <= 1.0):
        raise ValueError(f"tie must be in [0, 1], got {tie}")
    cfg = reader.config
    sim = _resolve_sim(similarity)
    total_tokens = reader.n_docs * reader.avgdl
    out_schema = "conv_id string, turn_idx int, docid long, score double, rank int"
    qterms = Counter(analyze_text(query_text, cfg))
    if not qterms:
        return spark.createDataFrame([], out_schema)
    # a result can never exceed the doc count; un-capped k would make Spark's
    # TakeOrdered allocate an O(k) buffer (k=10^9 OOMs a 1 GiB driver)
    k = min(k, reader.n_docs)

    canon = sorted(qterms)
    # boolean-operator clauses (grammar parser/QueryParser.jj `+`/`-`):
    # prohibited = MUST_NOT (postings ride the scan, kernel excludes matching
    # docs before collection — ReqExclScorer); required = MUST (each analyzed
    # required term must also be a scoring clause and present in every hit)
    prohib_terms: set[str] = set()
    for p in prohibited or []:
        prohib_terms.update(analyze_text(p, cfg))
    req_terms: set[str] = set()
    for r in required or []:
        req_terms.update(analyze_text(r, cfg))
    if req_terms - set(canon):
        raise ValueError(
            f"required terms must also appear in query_text: "
            f"{sorted(req_terms - set(canon))}")
    group_of: dict[str, tuple[str, ...]] | None = None
    if synonyms:
        # member term -> tuple of canonical group ids. Every canonical query
        # term owns a group; overlapping expansions mean one member can feed
        # several groups' pooled tf (Lucene analog: duplicate SynonymQuery
        # clauses both match the shared term).
        member_groups: dict[str, list[str]] = {}
        for t in canon:
            members = [t] + [m for phrase in synonyms.get(t, [])
                             for m in analyze_text(phrase, cfg)]
            for m in dict.fromkeys(members):
                member_groups.setdefault(m, []).append(t)
        group_of = {m: tuple(gs) for m, gs in member_groups.items()}
        terms = sorted(group_of)
    else:
        terms = canon
    if require_all:
        min_match = len(canon)
    if isinstance(min_match, str):
        # the full Solr mm spec grammar ("75%", "2<-25%", conditionals) —
        # util/SolrPluginUtils.java::calculateMinShouldMatch
        from solr_spark.query.edismax import calculate_min_should_match

        min_match = calculate_min_should_match(len(canon), min_match)
    min_match = max(1, min(min_match or 1, len(canon)))
    buckets = sorted(set(_term_buckets(terms, cfg.num_term_buckets)))
    dict_df = (
        reader.dictionary(spark)
        .where(F.col("term_bucket").isin(buckets) & F.col("term").isin(terms))
        .select("term", "df", "cf").collect()
    )
    dfs = {r["term"]: r["df"] for r in dict_df}
    cfs = {r["term"]: r["cf"] for r in dict_df}
    found = [t for t in terms if t in dfs]
    if not found:
        return spark.createDataFrame([], out_schema)
    gweights: dict[str, float] | None = None
    score_params: dict[str, float]  # keyed like the kernel's weight dict
    if group_of is not None:
        groups_found: dict[str, list[str]] = {}
        for t in found:
            for g in group_of[t]:
                groups_found.setdefault(g, []).append(t)
        # SynonymQuery pooled stats: a group scores with its max member df/cf
        gweights = {
            g: sim.weight(qterms[g] * (boosts or {}).get(g, 1.0), reader.n_docs,
                          max(dfs[t] for t in ms), max(cfs[t] for t in ms),
                          total_tokens)
            for g, ms in groups_found.items()
        }
        score_params = {
            g: sim.term_param(max(dfs[t] for t in ms), max(cfs[t] for t in ms),
                              reader.n_docs, total_tokens)
            for g, ms in groups_found.items()
        }
        # per-member weight for the WAND range bound: the sum of the weights of
        # every group the member feeds (per-term saturated bounds dominate each
        # group's pooled score, so the sum is a valid upper bound); the bound
        # param takes the MIN over those groups' params (LM bounds grow as the
        # collection probability shrinks, so min keeps the bound dominant)
        weights = {t: sum(gweights[g] for g in group_of[t] if g in gweights)
                   for t in found}
        bound_params = {t: min(score_params[g] for g in group_of[t]
                               if g in score_params)
                        for t in found}
        if min_match > len(groups_found):
            # a canonical term whose whole group is absent can never match
            return spark.createDataFrame([], out_schema)
    else:
        weights = {t: sim.weight(qterms[t] * (boosts or {}).get(t, 1.0),
                                 reader.n_docs, dfs[t], cfs[t], total_tokens)
                   for t in found}
        score_params = {t: sim.term_param(dfs[t], cfs[t], reader.n_docs,
                                          total_tokens) for t in found}
        bound_params = score_params
        if min_match > len(found):
            # absent terms can never match; mm above the found count is unsatisfiable
            return spark.createDataFrame([], out_schema)

    # MUST check: a required term absent from the index is unsatisfiable
    if req_terms:
        satisfiable = (set(gweights) if group_of is not None else set(found))
        if req_terms - satisfiable:
            return spark.createDataFrame([], out_schema)
    # MUST_NOT terms that exist in the dictionary join the posting scan with
    # weight 0 — their postings only flip the kernel's exclusion mask
    prohib_found: list[str] = []
    if prohib_terms:
        pb = sorted(set(_term_buckets(sorted(prohib_terms),
                                      cfg.num_term_buckets)))
        prohib_found = [
            r["term"] for r in reader.dictionary(spark)
            .where(F.col("term_bucket").isin(pb)
                   & F.col("term").isin(sorted(prohib_terms)))
            .select("term").collect()]

    seg = reader.segments_df(spark)
    scan_terms = found + [t for t in prohib_found if t not in found]
    postings = seg.where(
        F.col("term_bucket").isin(sorted(set(_term_buckets(scan_terms, cfg.num_term_buckets))))
        & F.col("term").isin(scan_terms)
    ).select("term", "range_id", "doc_gaps", "tfs", "max_tf")
    norms = reader.norms(spark)
    joined = postings.join(norms.select("range_id", "norm_bytes"), "range_id")

    if isinstance(filters, (list, tuple)) and not filters:
        filters = None  # empty fq list = no filter, skip the bitmap machinery
    use_filter = filters is not None or filter_docids is not None
    if use_filter:
        from solr_spark.query.docsets import docid_range_bitmaps
        from solr_spark.query.docsets import filter_docids as _compile_fq

        if filters is not None and filter_docids is not None:
            raise ValueError("pass filters OR filter_docids, not both")
        if filters is not None:
            filter_docids = _compile_fq(spark, reader, filters, now=now)
        bitmaps = docid_range_bitmaps(filter_docids, cfg.range_shift)
        # inner join: a range with no allowed doc never reaches the kernel
        joined = joined.join(bitmaps, "range_id")

    length_table = norm_length_table()
    avgdl = reader.avgdl
    # liveDocs mask (indexing/deletes.py): tombstoned docids are dropped
    # AFTER scoring, BEFORE heap insertion — stats (df/n_docs/avgdl) still
    # include deleted docs until merge, exactly like Lucene's soft deletes.
    from solr_spark.indexing.deletes import deleted_array

    dels = deleted_array(spark, reader.index_dir)
    if not len(dels):
        dels = None

    def _live(d, s):
        if dels is None or not len(d):
            return d, s
        keep = ~np.isin(d, dels)
        return d[keep], s[keep]

    kernel_prohib = frozenset(prohib_found) or None
    kernel_req = frozenset(req_terms) or None

    if mode == "exact":
        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            d, s = _score_group(pdf, weights, cfg, avgdl, length_table,
                                min_match, group_of, gweights,
                                sim, score_params,
                                kernel_prohib, kernel_req, use_filter,
                                combine, tie)
            d, s = _live(d, s)
            d, s = _local_topk(d, s, k)
            return pd.DataFrame({"docid": d, "score": s})

        cand = joined.groupBy("range_id").applyInPandas(kernel, _TOPK_SCHEMA)
    elif mode == "wand":
        # prohibited rows carry weight 0 (and a harmless bound param): they
        # contribute nothing to the range bound, so WAND pruning is unchanged
        # — a skipped range emits no docs, hence nothing to exclude from
        wand_weights = dict(weights)
        wand_bparams = dict(bound_params)
        for t in prohib_found:
            if t not in wand_weights:
                wand_weights[t] = 0.0
                wand_bparams[t] = 1.0
        w_map = F.create_map(
            *[x for t in scan_terms for x in (F.lit(t), F.lit(wand_weights[t]))]
        )
        if hasattr(sim, "_bound_avgdl"):
            # normalization-family similarities (DFR/IB H2) bound tfn with
            # the corpus avgdl — stamp the query-time stat onto the frozen
            # instance before asking for bounds
            object.__setattr__(sim, "_bound_avgdl", float(avgdl))
        bounded = joined.withColumn(
            "term_bound", sim.bound_expr(w_map, wand_bparams, cfg))
        w = Window.partitionBy("range_id")
        bounded = bounded.withColumn("bound", F.sum("term_bound").over(w))
        sorted_rows = bounded.sortWithinPartitions(
            F.desc("bound"), "range_id", "term"
        )

        def wand_iter(batches):
            heap: list[tuple[float, int]] = []  # (score, -docid), size <= k
            carry: list[pd.DataFrame] = []
            carry_rid = None

            def process(group: pd.DataFrame):
                if len(heap) == k:
                    thresh = heap[0][0]
                    if float(group["bound"].iloc[0]) < thresh:
                        return  # block-max skip: provably non-competitive
                d, s = _score_group(group, weights, cfg, avgdl, length_table,
                                    min_match, group_of, gweights,
                                    sim, score_params,
                                    kernel_prohib, kernel_req, use_filter,
                                    combine, tie)
                d, s = _live(d, s)
                for di, si in zip(d.tolist(), s.tolist()):
                    item = (si, -di)
                    if len(heap) < k:
                        heapq.heappush(heap, item)
                    elif item > heap[0]:
                        heapq.heapreplace(heap, item)

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                rids = pdf["range_id"].to_numpy()
                change = np.flatnonzero(rids[1:] != rids[:-1]) + 1
                bounds_idx = np.concatenate(([0], change, [len(pdf)]))
                for i in range(len(bounds_idx) - 1):
                    s_, e_ = bounds_idx[i], bounds_idx[i + 1]
                    chunk = pdf.iloc[s_:e_]
                    rid = rids[s_]
                    if carry_rid is not None and rid != carry_rid:
                        process(pd.concat(carry, ignore_index=True))
                        carry.clear()
                    carry_rid = rid
                    carry.append(chunk)
                    if i < len(bounds_idx) - 2:
                        process(pd.concat(carry, ignore_index=True))
                        carry.clear()
                        carry_rid = None
            if carry:
                process(pd.concat(carry, ignore_index=True))
            if heap:
                yield pd.DataFrame(
                    {"docid": [-nd for _, nd in heap], "score": [s for s, _ in heap]}
                )

        cand = sorted_rows.mapInPandas(wand_iter, _TOPK_SCHEMA)
    else:
        raise ValueError(f"unknown mode: {mode}")

    topk = cand.orderBy(F.desc("score"), F.asc("docid")).limit(k)
    resolved = (
        topk.join(reader.doc_map(spark), "docid")
        .withColumn("rank", F.row_number().over(
            Window.orderBy(F.desc("score"), F.asc("docid"))))
        .select("conv_id", "turn_idx", "docid", "score", "rank")
        .orderBy("rank")
    )
    return resolved
