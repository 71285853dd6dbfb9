"""ValueSource registry census (functions/vs_census.py): every
standardVSParsers name accounted exactly once, implemented targets real."""

from __future__ import annotations

import importlib

from solr_spark.functions.vs_census import (
    IMPLEMENTED,
    VS_NAMES,
    census,
    census_counts,
)


def test_every_name_accounted_once():
    c = census()
    assert set(c) == set(VS_NAMES)
    assert len(VS_NAMES) == len(set(VS_NAMES))
    counts = census_counts()
    assert sum(counts.values()) == len(VS_NAMES)
    assert counts["out_of_scope"] <= 3


def test_implemented_targets_resolve():
    for name, path in IMPLEMENTED.items():
        mod, _, attr = path.rpartition(".")
        obj = getattr(importlib.import_module(mod), attr, None)
        assert callable(obj), f"{name}: {path} does not resolve"


def test_currency_convert_semantics(spark):
    from pyspark.sql import functions as F

    from solr_spark.functions.funcquery import currency_convert

    df = spark.createDataFrame(
        [(100.0, "USD"), (100.0, "EUR"), (100.0, "XXX")],
        "amount double, ccy string")
    rates = {"USD": 1.0, "EUR": 0.8, "JPY": 110.0}
    out = df.select("ccy", currency_convert(
        "amount", "ccy", "JPY", rates).alias("jpy")).collect()
    got = {r["ccy"]: r["jpy"] for r in out}
    assert got["USD"] == 100.0 * 110.0
    assert abs(got["EUR"] - 100.0 * 110.0 / 0.8) < 1e-9
    assert got["XXX"] is None  # unknown code -> NULL, filterable
    # asymmetric pair overrides the cross rate
    out2 = df.where(F.col("ccy") == "USD").select(currency_convert(
        "amount", "ccy", "JPY", rates,
        asymmetric={("USD", "JPY"): 105.0}).alias("jpy")).first()
    assert out2["jpy"] == 100.0 * 105.0


def test_childfield_rides_best_child(spark):
    from solr_spark.operators.streams import block_join_parent_scored

    parents = spark.createDataFrame([("a",), ("b",)], "pk string")
    kids = spark.createDataFrame(
        [("a", 1, 1.0, "low"), ("a", 2, 3.0, "hi"), ("a", 3, 3.0, "hi2"),
         ("b", 4, 2.0, "only")],
        "pk string, kid int, score double, label string")
    out = block_join_parent_scored(
        parents, kids, "pk", "pk", score_mode="max",
        child_fields=["label"], child_tiebreak="kid").collect()
    got = {r["pk"]: (r["score"], r["label"]) for r in out}
    # ties on score break by SMALLEST kid (deterministic)
    assert got["a"] == (3.0, "hi")
    assert got["b"] == (2.0, "only")
