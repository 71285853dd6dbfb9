"""Text-classification streams: igain feature selection + tlogit training
(reference: solrj-streaming FeaturesSelectionStream.java:62,
TextLogitStream.java:61; see solr_spark/operators/classify.py)."""

from __future__ import annotations

import math

import pytest

from solr_spark.operators.classify import (
    auc,
    igain_terms,
    tlogit_score,
    tlogit_train,
)


def _h(p: float) -> float:
    if p <= 0.0 or p >= 1.0:
        return 0.0
    return -p * math.log(p) - (1 - p) * math.log(1 - p)


def _ig(n, pos, df_t, pos_t) -> float:
    p_t = df_t / n
    h_given_t = _h(pos_t / df_t)
    h_given_not = _h((pos - pos_t) / (n - df_t)) if n > df_t else 0.0
    return _h(pos / n) - (p_t * h_given_t + (1 - p_t) * h_given_not)


def test_igain_matches_closed_form(spark):
    rows = [("spam offer cheap", 1), ("spam offer", 1),
            ("meeting notes agenda", 0), ("notes offer", 0)]
    df = spark.createDataFrame(rows, "text string, y int")
    got = {r["term"]: r["ig"] for r in
           igain_terms(df, "text", "y", k=100).collect()}
    # n=4 pos=2; spam: df=2 pos=2 (perfect predictor -> IG = H(1/2) = ln 2)
    assert got["spam"] == pytest.approx(round(_ig(4, 2, 2, 2), 6))
    assert got["spam"] == pytest.approx(round(math.log(2), 6))
    # offer: df=3 pos=2; notes: df=2 pos=0 (perfect negative predictor)
    assert got["offer"] == pytest.approx(round(_ig(4, 2, 3, 2), 6))
    assert got["notes"] == pytest.approx(round(math.log(2), 6))
    # uninformative singleton 'cheap': df=1 pos=1
    assert got["cheap"] == pytest.approx(round(_ig(4, 2, 1, 1), 6))
    # ranking: perfect predictors first
    top = [r["term"] for r in igain_terms(df, "text", "y", k=2).collect()]
    assert set(top) == {"spam", "notes"}


def test_tlogit_learns_separable_data(spark):
    rows = []
    for i in range(120):
        if i % 2 == 0:
            extra = "cheap" if i % 4 == 0 else "pills"
            rows.append((f"spam offer {extra} x{i % 7}", 1))
        else:
            extra = "agenda" if i % 4 == 1 else "minutes"
            rows.append((f"meeting notes {extra} x{i % 7}", 0))
    df = spark.createDataFrame(rows, "text string, y int")
    feats = ["spam", "offer", "meeting", "notes"]
    model = tlogit_train(df, "text", "y", feats, iters=25, lr=2.0)
    assert model["weights"]["spam"] > 0 > model["weights"]["meeting"]
    scored = df.select("y", tlogit_score("text", model).alias("p")).collect()
    a = auc([(r["p"], r["y"]) for r in scored])
    assert a >= 0.99, f"AUC {a}"
    # every positive scores above every negative on separable data
    ppos = min(r["p"] for r in scored if r["y"] == 1)
    pneg = max(r["p"] for r in scored if r["y"] == 0)
    assert ppos > pneg
    # deterministic: retrain -> identical model
    again = tlogit_train(df, "text", "y", feats, iters=25, lr=2.0)
    assert again == model


def test_auc_rank_statistic():
    assert auc([(0.9, 1), (0.8, 1), (0.3, 0), (0.1, 0)]) == 1.0
    assert auc([(0.9, 0), (0.8, 0), (0.3, 1), (0.1, 1)]) == 0.0
    assert auc([(0.5, 1), (0.5, 0)]) == 0.5


def test_binary_classification_metrics(spark):
    """Training-pipeline eval op: threshold confusion metrics + tie-exact
    rank-sum AUC (no global per-row rank window)."""
    from solr_spark.operators.classify import binary_classification_metrics

    rows = [(0.9, 1), (0.8, 1), (0.7, 0), (0.6, 1), (0.55, 0), (0.55, 1),
            (0.4, 0), (0.3, 0)]
    df = spark.createDataFrame(rows, "s double, y int")
    r = binary_classification_metrics(df, "s", "y", threshold=0.5).first()
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (4, 2, 0, 2)
    assert r["recall"] == 1.0 and r["precision"] == 0.666667
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    brute = sum((1.0 if p > n else 0.5 if p == n else 0.0)
                for p in pos for n in neg) / (len(pos) * len(neg))
    assert r["auc"] == round(brute, 6)
    # degenerate: all one class -> NULL precision-family stays defined,
    # AUC NULL (no pairs)
    one = spark.createDataFrame([(0.2, 1), (0.9, 1)], "s double, y int")
    r1 = binary_classification_metrics(one, "s", "y").first()
    assert r1["auc"] is None and r1["recall"] == 0.5 and r1["tn"] == 0
