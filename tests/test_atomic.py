"""Atomic-update semantics vs the reference's AtomicUpdateDocumentMerger.

Value-level rules under test (AtomicUpdateDocumentMerger.java:163-180):
remove preserves survivor duplicates (removeAll), add-distinct checks
incrementally, set-null removes the field, inc starts from 0 on missing,
normal fields default to set, upsert creates docs, key update is rejected.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_spark.indexing.atomic import atomic_update


@pytest.fixture(scope="module")
def tables(spark):
    current = spark.createDataFrame(
        [
            (1, "alpha", 10, ["a", "b", "a", "c"]),
            (2, "beta", 20, ["x"]),
            (3, "gamma", 30, None),
        ],
        "id int, title string, views int, tags array<string>",
    )
    updates = spark.createDataFrame(
        [
            # doc 1: inc views, remove tag 'a' (both copies go, dup 'c' would stay),
            #        add-distinct ['b','d','d'] -> only one 'd' appended
            (1, None, 5, ["a"], ["b", "d", "d"]),
            # doc 4: brand-new doc (upsert) — inc from 0, adds from empty
            (4, "delta", 7, None, ["z"]),
        ],
        "id int, title string, views int, tags_rm array<string>, tags_add array<string>",
    )
    return current, updates


def _apply(current, updates, **kw):
    upd = (updates
           .withColumnRenamed("tags_rm", "tags")
           .withColumn("tags2", F.col("tags_add"))
           .drop("tags_add"))
    # field "tags" gets remove; "tags2" is update-only and uses add-distinct;
    # "views" inc; "title" defaults to set (absent from ops)
    out = atomic_update(
        current, upd, key=["id"],
        ops={"views": "inc", "tags": "remove", "tags2": "add-distinct"}, **kw)
    return {r["id"]: r.asDict() for r in out.collect()}


def test_merge_semantics(spark, tables):
    current, updates = tables
    rows = _apply(current, updates)
    assert set(rows) == {1, 2, 3, 4}
    d1 = rows[1]
    assert d1["views"] == 15  # inc
    assert d1["tags"] == ["b", "c"]  # removeAll of 'a' (both copies)
    assert d1["tags2"] == ["b", "d"]  # add-distinct onto empty: in-batch dup collapses
    assert d1["title"] is None  # normal field = set, explicit null removes
    d2 = rows[2]
    assert (d2["title"], d2["views"], d2["tags"]) == ("beta", 20, ["x"])
    assert d2["tags2"] is None  # untouched doc gains no value for the new field
    d4 = rows[4]
    assert d4["title"] == "delta" and d4["views"] == 7  # upsert: inc from 0
    assert d4["tags"] == [] and d4["tags2"] == ["z"]


def test_remove_preserves_survivor_duplicates(spark):
    cur = spark.createDataFrame([(1, ["a", "c", "a", "c"])],
                                "id int, tags array<string>")
    upd = spark.createDataFrame([(1, ["a"])], "id int, tags array<string>")
    out = atomic_update(cur, upd, ["id"], {"tags": "remove"}).collect()[0]
    assert out["tags"] == ["c", "c"]  # array_except would give ["c"]


def test_removeregex(spark):
    cur = spark.createDataFrame([(1, ["err_1", "ok_2", "err_3"])],
                                "id int, tags array<string>")
    upd = spark.createDataFrame([(1, True)], "id int, touch boolean").drop("touch") \
        .withColumn("tags", F.lit(None).cast("array<string>"))
    out = atomic_update(cur, upd, ["id"],
                        {"tags": ("removeregex", "^err_.*")}).collect()[0]
    assert out["tags"] == ["ok_2"]


def test_no_upsert_drops_new_docs(spark, tables):
    current, updates = tables
    rows = _apply(current, updates, upsert=False)
    assert set(rows) == {1, 2, 3}


def test_key_update_rejected(spark, tables):
    current, updates = tables
    with pytest.raises(ValueError, match="key field"):
        atomic_update(current, updates, ["id"], {"id": "set"})


def test_broadcast_plan(spark, tables):
    current, updates = tables
    upd = updates.select("id", "views")
    plan = atomic_update(current, upd, ["id"], {"views": "inc"}) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
