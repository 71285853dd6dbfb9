"""Atomic updates: Solr's partial-document field modifiers as one DataFrame join.

Reference semantics: AtomicUpdateDocumentMerger
(solr/core/src/java/org/apache/solr/update/processor/AtomicUpdateDocumentMerger.java:163-180
— ops `add`, `set`, `remove`, `removeregex`, `inc`, `add-distinct`; :195 "normal
fields are treated as a set"; :289 updating the unique key is not allowed). Solr
applies these doc-at-a-time against the current stored version fetched through
RealTimeGet; the Spark-native shape is a single batch join of the current table
against the update batch — the update side is the small one in every realistic
workload, so it broadcasts and the operation is shuffle-free over the corpus.

Value-level parity details copied from the reference's java.util semantics:
  * `remove` (Collection.removeAll): drops EVERY occurrence of each listed value
    but PRESERVES duplicates of the values that stay — so `array_except` (which
    dedups survivors) is wrong; we use `filter(old, x -> !contains(vals, x))`.
  * `add-distinct` (doAddDistinct): appends each new value only if not already
    present, checking incrementally — duplicates inside the new batch collapse
    to one append, duplicates already in the old value are preserved.
  * `inc` on a missing field (or a brand-new doc) starts from 0.
  * `set` with an explicit NULL in a present update row REMOVES the field
    (Solr: set null / empty list removes) — distinguished from "no update for
    this doc" by an update-presence marker column, not by value nullness.

Documents present only in the update batch are created (upsert), with each op
applied to an empty document — exactly what DistributedUpdateProcessor does
when RealTimeGet finds no previous version.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPS = {"set", "add", "add-distinct", "remove", "removeregex", "inc"}
_PRESENT = "__upd_present"


def _apply_op(op: str, old: Column, new: Column, pattern: str | None) -> Column:
    empty = F.array()  # array<void>; coalesce coerces it to the field's type
    if op == "set":
        return new
    if op == "inc":
        return F.coalesce(old, F.lit(0)) + F.coalesce(new, F.lit(0))
    old_arr = F.coalesce(old, empty)
    new_arr = F.coalesce(new, empty)
    if op == "add":
        return F.concat(old_arr, new_arr)
    if op == "add-distinct":
        # incremental contains-check: within-batch dups collapse, old dups stay
        fresh = F.filter(F.array_distinct(new_arr),
                         lambda x: ~F.array_contains(old_arr, x))
        return F.concat(old_arr, fresh)
    if op == "remove":
        # removeAll: every occurrence of a listed value goes; survivors keep
        # their duplicates (array_except would dedup them)
        return F.filter(old_arr, lambda x: ~F.array_contains(new_arr, x))
    if op == "removeregex":
        if pattern is None:
            raise ValueError("removeregex needs ('removeregex', pattern)")
        return F.filter(old_arr, lambda x: ~x.rlike(pattern))
    raise ValueError(f"unknown atomic op {op!r}")


def atomic_update(
    current: DataFrame,
    updates: DataFrame,
    key: Sequence[str],
    ops: dict[str, str | tuple[str, str]] | None = None,
    upsert: bool = True,
    broadcast_updates: bool = True,
) -> DataFrame:
    """Apply an atomic-update batch to `current`, returning the merged table.

    `updates` carries the key columns plus one column per modified field; `ops`
    maps field -> op name (or ``("removeregex", pattern)``). Fields present in
    `updates` but absent from `ops` are treated as `set`, matching the
    reference's "normal fields are treated as a set". Key columns cannot be
    listed in `ops` (AtomicUpdateDocumentMerger.java:289). Columns of `current`
    never mentioned in `updates` pass through unchanged.

    Plan shape: one left-outer (or full-outer when ``upsert``) equi-join on the
    key, update side broadcast by default — shuffle-free over the corpus, which
    is the 100-TB-safe shape for small update batches. Disable
    ``broadcast_updates`` for corpus-sized batches and let AQE pick the join.
    """
    key = list(key)
    ops = dict(ops or {})
    for k in key:
        if k in ops:
            raise ValueError(f"cannot atomically update key field {k!r}")
    upd_fields = [c for c in updates.columns if c not in key]
    for f_ in upd_fields:
        ops.setdefault(f_, "set")

    upd = updates.withColumn(_PRESENT, F.lit(True))
    if broadcast_updates:
        upd = F.broadcast(upd)
    upd = upd.select(key + upd_fields + [_PRESENT])
    # disambiguate overlapping non-key columns
    ren = {f_: f"__upd_{f_}" for f_ in upd_fields}
    for a, b in ren.items():
        upd = upd.withColumnRenamed(a, b)

    joined = current.join(upd, on=key, how="full_outer" if upsert else "left")

    out_cols: list[Column] = [F.col(k) for k in key]
    for c in current.columns:
        if c in key:
            continue
        if c not in upd_fields:
            out_cols.append(F.col(c))
            continue
        spec = ops[c]
        op, pattern = spec if isinstance(spec, tuple) else (spec, None)
        if op not in _OPS:
            raise ValueError(f"unknown atomic op {op!r} for field {c!r}")
        merged = _apply_op(op, F.col(c), F.col(ren[c]), pattern)
        out_cols.append(
            F.when(F.col(_PRESENT).isNotNull(), merged)
            .otherwise(F.col(c)).alias(c))
    # update-only fields that don't exist in current yet are appended as-is
    for f_ in upd_fields:
        if f_ not in current.columns:
            spec = ops[f_]
            op, pattern = spec if isinstance(spec, tuple) else (spec, None)
            merged = _apply_op(op, F.lit(None), F.col(ren[f_]), pattern)
            out_cols.append(
                F.when(F.col(_PRESENT).isNotNull(), merged)
                .otherwise(F.lit(None)).alias(f_))
    return joined.select(*out_cols)
