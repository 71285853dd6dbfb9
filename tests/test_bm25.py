"""BM25 rank-identity vs the pure-Python oracle (FIXTURES.md §2-3).

Query mix per FIXTURES.md: hot single term, rare single term, multi-term, absent
term, all-stopwords, case-variant duplicates; k=10 and k=100; exact and WAND modes
must agree with each other and with the oracle on both ranks and scores (1e-9).
"""

from __future__ import annotations

import pytest

from solr_spark.query import IndexReader, bm25_topk

QUERIES = [
    "error",                    # hot term
    "timeout retry",            # two hot-ish terms
    "error timeout connect",    # three terms
    "café",                     # unicode, rarer
    "v2.1.0",                   # punctuation token
    "zzz-not-in-corpus",        # absent -> empty
    "the and of",               # all stopwords -> empty
    "ERROR",                    # case variant of "error" -> identical results
    "error error",              # duplicate query term -> doubled weight
]


def _run(spark, built_index, q, k, mode, require_all=False):
    index_dir, cfg, _ = built_index
    reader = IndexReader.open(index_dir)
    df = bm25_topk(spark, reader, q, k=k, mode=mode, require_all=require_all)
    return [(r["conv_id"], r["turn_idx"], r["docid"], r["score"]) for r in df.collect()]


@pytest.mark.parametrize("q", QUERIES)
@pytest.mark.parametrize("k", [10, 100])
@pytest.mark.parametrize("mode", ["exact", "wand"])
def test_rank_identical_to_oracle(spark, built_index, oracle, q, k, mode):
    got = _run(spark, built_index, q, k, mode)
    exp = oracle.topk(q, k=k)
    assert [(c, t, d) for c, t, d, _ in got] == [(c, t, d) for c, t, d, _ in exp], q
    for (_, _, _, gs), (_, _, _, es) in zip(got, exp):
        assert gs == pytest.approx(es, abs=1e-9), q


def test_case_variant_identical(spark, built_index):
    a = _run(spark, built_index, "error", 10, "wand")
    b = _run(spark, built_index, "ERROR", 10, "wand")
    assert a == b


def test_require_all_mode(spark, built_index, oracle):
    q = "error timeout"
    got = _run(spark, built_index, q, 10, "exact", require_all=True)
    exp = oracle.topk(q, k=10, require_all=True)
    assert [(c, t, d) for c, t, d, _ in got] == [(c, t, d) for c, t, d, _ in exp]
    # AND results must be a subset of docs matching both terms
    for _, _, d, _ in got:
        assert d in oracle.postings["error"] and d in oracle.postings["timeout"]


def test_scores_monotone_in_tf(oracle):
    """Property: within equal doc length, higher tf never scores lower."""
    term = "error"
    plist = oracle.postings[term]
    by_len: dict[int, list[tuple[int, int]]] = {}
    for d, tf in plist.items():
        by_len.setdefault(oracle.doclen[d], []).append((tf, d))
    idf = oracle.idf(term)
    k1, b = oracle.config.k1, oracle.config.b
    for dl, items in by_len.items():
        items.sort()
        from solr_spark.oracle.reference import _small_float_quantize

        dlq = _small_float_quantize(dl)
        scores = [idf * tf / (tf + k1 * (1 - b + b * dlq / oracle.avgdl)) for tf, _ in items]
        assert scores == sorted(scores)


def test_warm_reader_identical_results(spark, built_index):
    """warm() (persisted norms/doc-map) must not change any result."""
    from solr_spark.query.bm25 import IndexReader, bm25_topk

    index_dir, cfg, _ = built_index
    cold = IndexReader.open(index_dir, cfg)
    want = [r.asDict() for r in
            bm25_topk(spark, cold, "error timeout", k=8).collect()]
    warm = IndexReader.open(index_dir, cfg).warm(spark)
    try:
        got = [r.asDict() for r in
               bm25_topk(spark, warm, "error timeout", k=8).collect()]
        assert got == want
        got2 = [r.asDict() for r in
                bm25_topk(spark, warm, "error timeout", k=8).collect()]
        assert got2 == want  # repeatable on the cached structures
    finally:
        warm.close(spark)


def test_synonym_query_semantics(spark, built_index, small_corpus_pdf):
    """synonyms= uses Lucene SynonymQuery scoring: pooled tf per group,
    saturated once, idf from the max member df; wand == exact."""
    import math

    from solr_spark.analysis import analyze_text
    from solr_spark.oracle.reference import _small_float_quantize
    from solr_spark.query.bm25 import IndexReader, bm25_topk

    index_dir, cfg, _ = built_index
    reader = IndexReader.open(index_dir, cfg)
    syn = {"error": ["failure"]}
    got_w = bm25_topk(spark, reader, "error", k=12, mode="wand",
                      synonyms=syn).collect()
    got_e = bm25_topk(spark, reader, "error", k=12, mode="exact",
                      synonyms=syn).collect()
    assert [r.asDict() for r in got_w] == [r.asDict() for r in got_e]

    keys = sorted((r.conv_id, int(r.turn_idx), r.text)
                  for r in small_corpus_pdf.itertuples(index=False))
    tf_pool, dls, dfreq = {}, {}, {"error": 0, "failure": 0}
    for docid, (cid, tix, text) in enumerate(keys):
        toks = analyze_text(text, cfg)
        dls[docid] = len(toks)
        pooled = toks.count("error") + toks.count("failure")
        for t in ("error", "failure"):
            if t in toks:
                dfreq[t] += 1
        if pooled:
            tf_pool[docid] = pooled
    n = reader.n_docs
    avgdl = reader.avgdl
    idf = math.log(1.0 + (n - max(dfreq.values()) + 0.5)
                   / (max(dfreq.values()) + 0.5))
    scored = []
    for d, tf in tf_pool.items():
        dlq = _small_float_quantize(dls[d])
        scored.append(
            (d, idf * tf / (tf + cfg.k1 * (1 - cfg.b + cfg.b * dlq / avgdl))))
    want = sorted(scored, key=lambda x: (-x[1], x[0]))[:12]
    assert [(r.docid, round(r.score, 9)) for r in got_w] == \
        [(d, round(s, 9)) for d, s in want]


def test_synonym_overlap_with_require_all(spark, built_index, small_corpus_pdf):
    """A query term that is also another term's synonym member must NOT make
    require_all unsatisfiable: each canonical term owns its own group, so
    'error failed' + synonyms {error: [failed]} + require_all matches every
    doc containing 'failed' (group-error := error|failure, group-failed :=
    failure — the conjunction reduces to 'failure present')."""
    from solr_spark.analysis import analyze_text
    from solr_spark.query.bm25 import IndexReader, bm25_topk

    index_dir, cfg, _ = built_index
    reader = IndexReader.open(index_dir, cfg)
    syn = {"error": ["failed"]}
    got_w = bm25_topk(spark, reader, "error failed", k=500, mode="wand",
                      synonyms=syn, require_all=True).collect()
    got_e = bm25_topk(spark, reader, "error failed", k=500, mode="exact",
                      synonyms=syn, require_all=True).collect()
    assert [r.asDict() for r in got_w] == [r.asDict() for r in got_e]
    assert got_w, "overlapping synonym groups must stay satisfiable"

    keys = sorted((r.conv_id, int(r.turn_idx), r.text)
                  for r in small_corpus_pdf.itertuples(index=False))
    with_failure = {docid for docid, (_c, _t, text) in enumerate(keys)
                    if "failed" in analyze_text(text, cfg)}
    assert {r.docid for r in got_w} <= with_failure
    assert len(got_w) == min(500, len(with_failure))


def test_synonyms_none_path_unchanged(spark, built_index):
    from solr_spark.query.bm25 import IndexReader, bm25_topk

    index_dir, cfg, _ = built_index
    reader = IndexReader.open(index_dir, cfg)
    a = bm25_topk(spark, reader, "error timeout", k=10).collect()
    b = bm25_topk(spark, reader, "error timeout", k=10, synonyms={}).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_boolean_occurs_prohibited_and_required(spark, built_index):
    """`-term` (MUST_NOT) and `+term` (MUST) clause operators: exclusion is
    applied inside the scoring kernel before heap collection (ReqExclScorer
    shape), so WAND top-k equals exact top-k equals a semi/anti-join twin."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from solr_spark.query.bm25 import IndexReader, bm25_topk, term_docs
    from solr_spark.query.scored import scored_topk

    index_dir, cfg, _ = built_index
    reader = IndexReader.open(index_dir, cfg)
    q = "error timeout"

    # k above the corpus size so the twin sees EVERY match (the
    # exclusion removes ~94% of them; a truncated base would under-fill)
    base = bm25_topk(spark, reader, q, k=5000, mode="exact")
    excl_ids = {r.docid for r in
                term_docs(spark, reader, "retry").collect()}

    # twin: exclusion = anti-join of the unrestricted result
    want = [(r.docid, round(r.score, 9)) for r in base.collect()
            if r.docid not in excl_ids][:20]
    got_w = bm25_topk(spark, reader, q, k=20, mode="wand",
                      prohibited=["retry"])
    got_e = bm25_topk(spark, reader, q, k=20, mode="exact",
                      prohibited=["retry"])
    assert [(r.docid, round(r.score, 9)) for r in got_w.collect()] == want
    assert [(r.docid, round(r.score, 9)) for r in got_e.collect()] == want
    assert excl_ids and len(want) == 20  # exclusion actually bites

    # required: every hit contains the MUST term; scores unchanged vs base
    req_ids = {r.docid for r in term_docs(spark, reader, "error").collect()}
    want_r = [(r.docid, round(r.score, 9)) for r in base.collect()
              if r.docid in req_ids][:20]
    got_r = bm25_topk(spark, reader, q, k=20, mode="wand", required=["error"])
    assert [(r.docid, round(r.score, 9)) for r in got_r.collect()] == want_r

    # MUST + MUST_NOT together, via the scored parser
    got_s = scored_topk(spark, reader, "+error timeout -retry", k=20)
    want_s = [(r.docid, round(r.score, 9)) for r in base.collect()
              if r.docid in req_ids and r.docid not in excl_ids][:20]
    assert [(r.docid, round(r.score, 9)) for r in got_s.collect()] == want_s

    # required term absent from the query text is a usage error
    with _pytest.raises(ValueError, match="required"):
        bm25_topk(spark, reader, q, k=5, required=["merge"])
    # unsatisfiable MUST (term not in the index) -> empty
    assert bm25_topk(spark, reader, "error qqqzz", k=5,
                     required=["qqqzz"]).count() == 0
    # self-contradiction: term both scored and prohibited -> empty
    assert bm25_topk(spark, reader, "error", k=5,
                     prohibited=["error"]).count() == 0
    # prohibited term not in the index: no-op
    assert bm25_topk(spark, reader, q, k=5,
                     prohibited=["qqqzz"]).count() == 5

def test_maxscore_dismax_combiner(spark, built_index):
    """`{!maxscore}` (search/MaxScoreQParser.java:53): SHOULD clauses are
    dismaxed with a tiebreaker, MUST clauses pass through summed. Twin: the
    per-term contributions ARE single-term bm25_topk scores, so the dismax
    combination is recomputable doc-by-doc from single-term runs."""
    import pytest as _pytest

    from solr_spark.query.bm25 import IndexReader, bm25_topk

    index_dir, cfg, _ = built_index
    reader = IndexReader.open(index_dir, cfg)
    q = "error timeout retry"
    terms = q.split()
    tie = 0.3

    per_term = {
        t: {r.docid: r.score
            for r in bm25_topk(spark, reader, t, k=5000, mode="exact").collect()}
        for t in terms
    }

    def expect(required=None):
        docs = set()
        for t in terms:
            docs |= set(per_term[t])
        out = []
        for d in sorted(docs):
            should = [per_term[t].get(d, 0.0) for t in terms
                      if t != (required or "")]
            must = per_term.get(required, {}).get(d) if required else None
            if required is not None and must is None:
                continue  # MUST not satisfied
            mx = max(should) if should else 0.0
            sc = (must or 0.0) + mx + tie * (sum(should) - mx)
            if sc > 0.0:
                out.append((d, sc))
        out.sort(key=lambda x: (-x[1], x[0]))
        return [(d, round(s, 9)) for d, s in out[:20]]

    got_w = bm25_topk(spark, reader, q, k=20, mode="wand",
                      combine="dismax", tie=tie)
    got_e = bm25_topk(spark, reader, q, k=20, mode="exact",
                      combine="dismax", tie=tie)
    want = expect()
    assert [(r.docid, round(r.score, 9)) for r in got_w.collect()] == want
    assert [(r.docid, round(r.score, 9)) for r in got_e.collect()] == want

    # MUST pass-through: `retry` summed outside the dismax
    got_m = bm25_topk(spark, reader, q, k=20, mode="wand",
                      combine="dismax", tie=tie, required=["retry"])
    assert [(r.docid, round(r.score, 9))
            for r in got_m.collect()] == expect(required="retry")

    # tie=1.0 degrades to the ordinary BooleanQuery sum
    got_1 = bm25_topk(spark, reader, q, k=20, mode="wand",
                      combine="dismax", tie=1.0)
    base = bm25_topk(spark, reader, q, k=20, mode="wand")
    assert [(r.docid, round(r.score, 9)) for r in got_1.collect()] == \
        [(r.docid, round(r.score, 9)) for r in base.collect()]

    with _pytest.raises(ValueError, match="tie"):
        bm25_topk(spark, reader, q, k=5, combine="dismax", tie=1.5)
    with _pytest.raises(ValueError, match="synonyms"):
        bm25_topk(spark, reader, q, k=5, combine="dismax",
                  synonyms={"error": ["failure"]})
    with _pytest.raises(ValueError, match="combine"):
        bm25_topk(spark, reader, q, k=5, mode="exact", combine="nope")


def test_graph_terms_df_cap(spark, built_index):
    """`{!graphTerms}` (search/GraphTermsQParserPlugin.java:72): terms whose
    docFreq exceeds maxDocFreq match NOTHING; the rest union like a set query."""
    from solr_spark.query.bm25 import IndexReader, graph_terms_docs, term_docs

    index_dir, cfg, _ = built_index
    reader = IndexReader.open(index_dir, cfg)
    terms = ["error", "timeout", "retry"]
    dfs = {t: {r.docid for r in term_docs(spark, reader, t).collect()}
           for t in terms}
    counts = sorted(len(v) for v in dfs.values())
    cap = counts[1]  # keeps the two least-frequent terms, drops the max

    kept = [t for t in terms if len(dfs[t]) <= cap]
    want = sorted(set().union(*[dfs[t] for t in kept]))
    got = graph_terms_docs(spark, reader, terms, max_doc_freq=cap)
    assert sorted(r.docid for r in got.collect()) == want

    # no cap = plain set query over all terms
    got_all = graph_terms_docs(spark, reader, terms)
    assert sorted(r.docid for r in got_all.collect()) == \
        sorted(set().union(*dfs.values()))

    # cap below every df -> empty; empty terms -> empty
    assert graph_terms_docs(spark, reader, terms, max_doc_freq=0).count() == 0
    assert graph_terms_docs(spark, reader, [], max_doc_freq=10).count() == 0
