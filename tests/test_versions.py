"""Optimistic concurrency: `_version_` conditional updates vs the reference's
DistributedUpdateProcessor contract (>1 exact-match, =1 must-exist,
<0 must-not-exist, =0 unconditional)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_spark.indexing.versions import (
    APPLIED,
    CONFLICT_EXISTS,
    CONFLICT_MISMATCH,
    CONFLICT_MISSING,
    check_versions,
    versioned_update,
)


@pytest.fixture(scope="module")
def tables(spark):
    current = spark.createDataFrame(
        [(1, "one", 5), (2, "two", 7), (3, "three", 2)],
        "id int, title string, _version_ long",
    )
    updates = spark.createDataFrame(
        [
            (1, "one'", 5),     # exact match -> applied, new version 6
            (2, "two'", 3),     # mismatch (stored 7) -> conflict
            (3, "three'", 1),   # must exist -> applied
            (4, "four", 1),     # must exist, missing -> conflict
            (5, "five", -1),    # must not exist -> applied (create @2)
            (1, "one''", -1),   # must not exist, exists -> conflict
            (6, "six", 0),      # unconditional create -> applied @2
            (3, "three''", 99), # mismatch on existing -> conflict
        ],
        "id int, title string, _version_ long",
    )
    return current, updates


def test_check_versions_classification(tables):
    current, updates = tables
    got = {(r.id, r.title): (r.status, r.new_version)
           for r in check_versions(current, updates, ["id"]).collect()}
    assert got[(1, "one'")] == (APPLIED, 6)
    assert got[(2, "two'")] == (CONFLICT_MISMATCH, None)
    assert got[(3, "three'")] == (APPLIED, 3)
    assert got[(4, "four")] == (CONFLICT_MISSING, None)
    assert got[(5, "five")] == (APPLIED, 2)
    assert got[(1, "one''")] == (CONFLICT_EXISTS, None)
    assert got[(6, "six")] == (APPLIED, 2)
    assert got[(3, "three''")] == (CONFLICT_MISMATCH, None)


def test_versioned_update_skip(tables):
    current, updates = tables
    out = versioned_update(current, updates, ["id"], on_conflict="skip")
    rows = {r.id: (r.title, r._version_) for r in out.collect()}
    # one update row per id in this batch is applied; conflicts leave stored
    assert rows[1] == ("one'", 6)      # exact-match apply wins; -1 conflicted
    assert rows[2] == ("two", 7)       # conflict -> untouched
    assert rows[3] == ("three'", 3)    # must-exist apply; 99 conflicted
    assert rows[5] == ("five", 2)      # created
    assert rows[6] == ("six", 2)       # created
    assert 4 not in rows               # conflicting create never lands


def test_versioned_update_error_mode(tables):
    current, updates = tables
    with pytest.raises(ValueError, match="version conflict"):
        versioned_update(current, updates, ["id"], on_conflict="error")
    # a clean batch passes in error mode
    clean = updates.where(F.col("_version_") == 0)
    out = versioned_update(current, clean, ["id"], on_conflict="error")
    assert out.count() == 4


def test_missing_version_column_is_unconditional(spark):
    current = spark.createDataFrame([(1, "a")], "id int, title string")
    updates = spark.createDataFrame([(1, "b"), (2, "c")],
                                    "id int, title string")
    out = versioned_update(current, updates, ["id"], on_conflict="error")
    rows = {r.id: (r.title, r._version_) for r in out.collect()}
    assert rows[1] == ("b", 2)  # stored defaulted to 1, bumped to 2
    assert rows[2] == ("c", 2)
