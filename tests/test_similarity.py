"""Pluggable similarity scoring (query/similarity.py).

Each similarity's engine results are checked rank-and-score against an
independent closed-form recomputation over the pure-Python oracle's inverted
index (tests/conftest.py `oracle`), and WAND must equal exact mode for every
similarity (the block-max bounds are per-similarity, so this exercises that
each bound really dominates its scores).
"""

from __future__ import annotations

import math

import pytest

from solr_spark.analysis import analyze_text
from solr_spark.oracle.reference import _small_float_quantize
from solr_spark.query.bm25 import IndexReader, bm25_topk

SIMS = ["classic", "boolean", "lmdirichlet", "lmjelinekmercer",
        "dfi", "rawtf", "sweetspot", "dfr_gl2", "ib_ll"]
QUERIES = ["error timeout", "deploy failed", "database connection retry"]
K = 10


def _py_scores(oracle, qtext: str, sim: str) -> dict[int, float]:
    """Closed-form per-doc scores, straight from the module docstring's
    formulas (natural log), over the oracle's dict postings."""
    cfg = oracle.config
    from collections import Counter

    qterms = Counter(analyze_text(qtext, cfg))
    n = len(oracle.doclen)
    total_tokens = float(sum(oracle.doclen.values()))
    avgdl = total_tokens / n
    scores: dict[int, float] = {}
    for t, qtf in sorted(qterms.items()):
        post = oracle.postings.get(t)
        if not post:
            continue
        df = len(post)
        cf = sum(post.values())
        for docid, tf in post.items():
            dl_raw = oracle.doclen[docid]
            dl = float(_small_float_quantize(dl_raw)) if cfg.lucene_norms \
                else float(dl_raw)
            if sim == "classic":
                idf = 1.0 + math.log((n + 1.0) / (df + 1.0))
                c = qtf * idf * idf * math.sqrt(tf) / math.sqrt(dl)
            elif sim == "boolean":
                c = float(qtf)
            elif sim == "lmdirichlet":
                mu, p = 2000.0, (cf + 1.0) / (total_tokens + 1.0)
                c = qtf * max(0.0, math.log1p(tf / (mu * p))
                              + math.log(mu / (dl + mu)))
            elif sim == "lmjelinekmercer":
                lam, p = 0.7, (cf + 1.0) / (total_tokens + 1.0)
                c = qtf * max(0.0, math.log1p(((1.0 - lam) * tf / dl)
                                              / (lam * p)))
            elif sim == "dfi":
                e = (cf + 1.0) * dl / (total_tokens + 1.0)
                c = qtf * (math.log2((tf - e) / math.sqrt(e) + 1.0)
                           if tf > e else 0.0)
            elif sim == "rawtf":
                c = qtf * float(tf)
            elif sim == "sweetspot":
                # factory DEFAULTS (ln_min=ln_max=1, steepness=.5, tf sqrt
                # baseline) — which degenerate exactly to Classic; the
                # non-trivial plateau is covered by the instance test below
                idf = 1.0 + math.log((n + 1.0) / (df + 1.0))
                norm = 1.0 / math.sqrt(0.5 * (abs(dl - 1) + abs(dl - 1)) + 1.0)
                c = qtf * idf * idf * math.sqrt(tf) * norm
            elif sim == "dfr_gl2":
                lam = cf / (n + cf)
                tfn = tf * math.log2(1.0 + avgdl / dl)
                c = qtf * (math.log2(1.0 + lam)
                           + tfn * math.log2((1.0 + lam) / lam)) / (tfn + 1.0)
            elif sim == "ib_ll":
                lam = (cf + 1.0) / (n + 1.0)
                tfn = tf * math.log2(1.0 + avgdl / dl)
                c = qtf * math.log((tfn + lam) / lam)
            else:
                raise ValueError(sim)
            scores[docid] = scores.get(docid, 0.0) + c
    return {d: s for d, s in scores.items() if s > 0.0}


def _py_topk(oracle, qtext: str, sim: str, k: int = K):
    scores = _py_scores(oracle, qtext, sim)
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


@pytest.mark.parametrize("sim", SIMS)
@pytest.mark.parametrize("q", QUERIES)
def test_similarity_rank_and_score_vs_closed_form(spark, built_index, oracle,
                                                  sim, q):
    index_dir, cfg, _ = built_index
    reader = IndexReader.open(index_dir, cfg)
    got = bm25_topk(spark, reader, q, k=K, mode="exact",
                    similarity=sim).collect()
    want = _py_topk(oracle, q, sim)
    assert [r["docid"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-9)


@pytest.mark.parametrize("sim", SIMS)
@pytest.mark.parametrize("q", QUERIES)
def test_wand_equals_exact_per_similarity(spark, built_index, sim, q):
    index_dir, cfg, _ = built_index
    reader = IndexReader.open(index_dir, cfg)
    exact = bm25_topk(spark, reader, q, k=K, mode="exact",
                      similarity=sim).collect()
    wand = bm25_topk(spark, reader, q, k=K, mode="wand",
                     similarity=sim).collect()
    assert [(r["docid"], r["score"]) for r in exact] == \
        [(r["docid"], r["score"]) for r in wand]


def test_default_is_bm25(spark, built_index):
    index_dir, cfg, _ = built_index
    reader = IndexReader.open(index_dir, cfg)
    a = bm25_topk(spark, reader, "error timeout", k=K).collect()
    b = bm25_topk(spark, reader, "error timeout", k=K,
                  similarity="bm25").collect()
    assert [(r["docid"], r["score"]) for r in a] == \
        [(r["docid"], r["score"]) for r in b]


def test_similarity_with_boosts_and_mm(spark, built_index, oracle):
    """Boosts multiply the per-term weight for every similarity; min_match
    still gates on term presence."""
    index_dir, cfg, _ = built_index
    reader = IndexReader.open(index_dir, cfg)
    got = bm25_topk(spark, reader, "error timeout", k=K, mode="exact",
                    similarity="classic", boosts={"error": 2.0}).collect()
    # recompute: classic with error's contribution doubled
    scores = _py_scores(oracle, "error timeout", "classic")
    only_err = _py_scores(oracle, "error", "classic")
    boosted = {d: s + only_err.get(d, 0.0) for d, s in scores.items()}
    want = sorted(boosted.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    assert [r["docid"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-9)

    ra = bm25_topk(spark, reader, "error timeout", k=K, mode="wand",
                   similarity="lmdirichlet", require_all=True).collect()
    # presence, not score: LMD clamps some contributions to 0, but the doc
    # still CONTAINS the term (the engine's mm gate counts presence)
    both = set(oracle.postings.get("error", {})) \
        & set(oracle.postings.get("timeout", {}))
    assert set(r["docid"] for r in ra) <= both


def test_unknown_similarity_raises(spark, built_index):
    index_dir, cfg, _ = built_index
    reader = IndexReader.open(index_dir, cfg)
    with pytest.raises(ValueError, match="unknown similarity"):
        bm25_topk(spark, reader, "error", similarity="nope")


def test_sweetspot_plateau_instance(spark, built_index, oracle):
    """A non-default SweetSpot plateau: docs with dl inside [ln_min, ln_max]
    take NO length penalty; outside decays hyperbolically; wand == exact."""
    import math as _m

    from solr_spark.query.similarity import SweetSpotSimilarity

    index_dir, cfg, _ = built_index
    reader = IndexReader.open(index_dir, cfg)
    sim = SweetSpotSimilarity(ln_min=5, ln_max=40, steepness=0.3)
    got = bm25_topk(spark, reader, "error timeout", k=K, mode="exact",
                    similarity=sim).collect()
    # closed form
    n = len(oracle.doclen)
    scores = {}
    for t in ("error", "timeout"):
        post = oracle.postings.get(t, {})
        df = len(post)
        idf = 1.0 + _m.log((n + 1.0) / (df + 1.0))
        for docid, tf in post.items():
            dl_raw = oracle.doclen[docid]
            dl = float(_small_float_quantize(dl_raw)) if cfg.lucene_norms \
                else float(dl_raw)
            dev = abs(dl - 5) + abs(dl - 40) - 35
            norm = 1.0 / _m.sqrt(0.3 * dev + 1.0)
            scores[docid] = scores.get(docid, 0.0)                 + idf * idf * _m.sqrt(tf) * norm
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    assert [r["docid"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-9)
    wand = bm25_topk(spark, reader, "error timeout", k=K, mode="wand",
                     similarity=sim).collect()
    assert [(r["docid"], r["score"]) for r in wand] == \
        [(r["docid"], r["score"]) for r in got]
