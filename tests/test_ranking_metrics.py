"""trec_eval-style ranking metrics (operators/ltr.py::ranking_metrics)."""

from __future__ import annotations

import math

import pytest

from solr_spark.operators.ltr import ranking_metrics


def _fixtures(spark):
    # Query A: d1(g3)@1, d3(g1)@3 retrieved-relevant; d9(g2) missed;
    #          d4 judged grade 0 at rank 4 (non-relevant).
    # Query B: judged docs all grade 0 -> dropped from output.
    # Query C: relevant judgments exist, but no results rows at all.
    results = spark.createDataFrame(
        [("A", f"d{i}", i) for i in range(1, 6)]
        + [("B", "d1", 1), ("B", "d2", 2)],
        "query_id string, doc_id string, rank int")
    judgments = spark.createDataFrame(
        [("A", "d1", 3), ("A", "d3", 1), ("A", "d9", 2), ("A", "d4", 0),
         ("B", "d1", 0),
         ("C", "d7", 2)],
        "query_id string, doc_id string, grade int")
    return results, judgments


def test_per_query_metrics_closed_form(spark):
    results, judgments = _fixtures(spark)
    rows = {r["query_id"]: r.asDict()
            for r in ranking_metrics(results, judgments, k=5).collect()}
    assert set(rows) == {"A", "C"}  # B has no relevant judged doc

    a = rows["A"]
    assert a["n_rel"] == 3
    assert a["p_at_k"] == pytest.approx(2 / 5)
    assert a["recall_at_k"] == pytest.approx(2 / 3)
    assert a["rr"] == pytest.approx(1.0)
    # AP = (P@1 + P@3) / n_rel with 1e-6-grid terms
    assert a["ap"] == pytest.approx((1.0 + round(2 / 3, 6)) / 3, abs=1e-9)
    # DCG = 7/log2(2) + 1/log2(4); IDCG over grades 3,2,1
    dcg = 7.0 + 0.5
    idcg = (round(7 / math.log2(2), 6) + round(3 / math.log2(3), 6)
            + round(1 / math.log2(4), 6))
    assert a["ndcg"] == pytest.approx(dcg / idcg, abs=1e-9)

    c = rows["C"]  # judged-relevant but nothing retrieved
    assert c["n_rel"] == 1
    assert c["p_at_k"] == 0.0 and c["recall_at_k"] == 0.0
    assert c["rr"] == 0.0 and c["ap"] == 0.0 and c["ndcg"] == 0.0


def test_k_cuts_both_results_and_ideal(spark):
    results, judgments = _fixtures(spark)
    rows = {r["query_id"]: r.asDict()
            for r in ranking_metrics(results, judgments, k=2).collect()}
    a = rows["A"]
    # only d1 relevant within top-2; ideal DCG over top-2 grades (3, 2)
    assert a["p_at_k"] == pytest.approx(1 / 2)
    assert a["rr"] == pytest.approx(1.0)
    idcg2 = round(7 / math.log2(2), 6) + round(3 / math.log2(3), 6)
    assert a["ndcg"] == pytest.approx(7.0 / idcg2, abs=1e-9)


def test_k_guard(spark):
    results, judgments = _fixtures(spark)
    with pytest.raises(ValueError):
        ranking_metrics(results, judgments, k=0)
