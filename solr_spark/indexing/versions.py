"""Optimistic concurrency: Solr's `_version_` conditional-update semantics.

Reference: DistributedUpdateProcessor.versionAdd
(solr/core/src/java/org/apache/solr/update/processor/DistributedUpdateProcessor.java,
`checkDeleteByQueries`/version-bucket path) and the documented Optimistic
Concurrency contract (solr/solr-ref-guide updating-parts-of-documents.adoc):

  * ``_version_ > 1``  — the update applies only if the stored document's
    version EQUALS the supplied value (else HTTP 409 version conflict);
  * ``_version_ = 1``  — the document must EXIST (any stored version);
  * ``_version_ < 0``  — the document must NOT exist;
  * ``_version_ = 0``  — no constraint (normal upsert; missing
    ``_version_`` behaves the same).

Solr enforces this doc-at-a-time under a version bucket lock with versions
drawn from a hybrid clock. The Spark-native shape is a set-based two-phase
batch: ONE equi-join of the update batch against the current table's
``(key, version)`` projection classifies every update as applied/conflict
(the update side is the small one in any realistic workload, so Catalyst
broadcasts it and the corpus never shuffles), then the applied rows merge
via the same anti-join ∪ union the atomic-update path uses. New versions
are deterministic — ``stored + 1`` (creates start at 2, one above the
``=1`` sentinel) — because a distributed batch engine needs reproducible
version trajectories for its lineage manifests, where Solr needs only
monotonicity per bucket.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: outcome labels, mirroring the reference's conflict messages
APPLIED = "applied"
CONFLICT_MISMATCH = "conflict_version_mismatch"   # _version_>1, stored differs
CONFLICT_MISSING = "conflict_doc_missing"         # _version_>=1, no stored doc
CONFLICT_EXISTS = "conflict_doc_exists"           # _version_<0, doc exists


def check_versions(current: DataFrame, updates: DataFrame,
                   key: Sequence[str],
                   version_col: str = "_version_") -> DataFrame:
    """Classify each update row against the stored versions.

    Returns the update rows plus ``cur_version`` (stored version or null),
    ``status`` (``applied`` / ``conflict_*``) and ``new_version`` (the
    deterministic post-apply version for applied rows, null on conflict).
    One broadcastable equi-join on ``key``; the corpus side is projected to
    key+version before the join so only two columns of it move.
    """
    key = list(key)
    if version_col not in updates.columns:
        updates = updates.withColumn(version_col, F.lit(0).cast("long"))
    cur = current.select(*key, F.col(version_col).alias("cur_version")) \
        if version_col in current.columns else \
        current.select(*key, F.lit(None).cast("long").alias("cur_version"))
    req = F.coalesce(F.col(version_col).cast("long"), F.lit(0))
    exists = F.col("cur_version").isNotNull()
    status = (
        F.when((req > 1) & ~exists, F.lit(CONFLICT_MISSING))
         .when((req > 1) & (F.col("cur_version") != req),
               F.lit(CONFLICT_MISMATCH))
         .when((req == 1) & ~exists, F.lit(CONFLICT_MISSING))
         .when((req < 0) & exists, F.lit(CONFLICT_EXISTS))
         .otherwise(F.lit(APPLIED)))
    new_version = F.when(status == APPLIED,
                         F.coalesce(F.col("cur_version"), F.lit(1)) + 1)
    return (updates.join(cur, key, "left")
            .withColumn("status", status)
            .withColumn("new_version", new_version.cast("long")))


def versioned_update(current: DataFrame, updates: DataFrame,
                     key: Sequence[str],
                     version_col: str = "_version_",
                     on_conflict: str = "error") -> DataFrame:
    """Apply a conditional update batch, honoring `_version_` constraints.

    ``on_conflict='error'`` raises ValueError when ANY row conflicts (the
    batch analog of Solr's 409, since a Spark batch has no per-doc HTTP
    response); ``'skip'`` drops conflicting rows and applies the rest.
    Applied rows fully replace the stored document (normal add semantics)
    and carry ``new_version`` in ``version_col``; creates (``<0`` / ``0``
    on absent docs) are upserted at version 2.
    """
    if on_conflict not in ("error", "skip"):
        raise ValueError(f"on_conflict must be 'error' or 'skip', "
                         f"got {on_conflict!r}")
    key = list(key)
    checked = check_versions(current, updates, key, version_col)
    if on_conflict == "error":
        bad = (checked.where(F.col("status") != APPLIED)
               .select(*key, "status").limit(5).collect())
        if bad:
            raise ValueError(
                f"version conflict on {len(bad)}+ update rows, e.g. "
                + "; ".join(f"{tuple(r[c] for c in key)}: {r['status']}"
                            for r in bad))
    data_cols = [c for c in updates.columns if c != version_col]
    applied = (checked.where(F.col("status") == APPLIED)
               .select(*data_cols,
                       F.col("new_version").alias(version_col)))
    if version_col not in current.columns:
        current = current.withColumn(version_col, F.lit(1).cast("long"))
    survivors = current.join(applied.select(*key), key, "left_anti")
    return survivors.unionByName(applied.select(*survivors.columns))
