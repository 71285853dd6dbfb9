"""Index lifecycle: tiered merge policy + snapshot/restore.

Reference semantics:
  * TieredMergePolicy (Lucene; selected by solr/core/src/java/org/apache/solr/
    index/DefaultMergePolicyFactory.java:42) — segments are grouped into
    size tiers; when a tier holds more than `segments_per_tier` segments the
    policy merges up to `max_merge_at_once` of the SMALLEST together, and the
    merged result may cascade into a higher tier's count. Unlike the
    merge-everything `merge_segments` (indexing/merge.py:27), a tiered merge
    rewrites only the chosen group — amortized write cost stays O(n log n)
    over the index's life instead of O(n) per maintenance pass.
  * SnapshotDeletionPolicy / replication-handler backup (Solr's
    handler/ReplicationHandler.java backup + core/snapshots/
    SolrSnapshotManager.java) — a snapshot pins a commit point (the live
    segment list) by NAME; segments are immutable so backup is a manifest
    write and restore is a pointer flip plus derived-artifact rebuild.

Scale shape: planning reads only directory sizes (no data); a group merge
shuffles only the group's postings (repartition on (term, range_id), the same
vectorized _partial_merger kernel as the build); snapshot/restore move no
posting bytes at all.
"""

from __future__ import annotations

import json
import math
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from solr_spark.config import DEFAULT_CONFIG, IndexConfig
from solr_spark.indexing import build as B
from solr_spark.indexing.manifest import write_manifest

SNAPSHOT_DIR = "snapshots"


# --------------------------------------------------------------- merge policy

def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def plan_tiered_merges(sizes: dict[str, int], segments_per_tier: int = 10,
                       max_merge_at_once: int = 10,
                       max_merged_bytes: int | None = None
                       ) -> list[list[str]]:
    """Pure policy: which segment groups to merge, given on-disk sizes.

    Tier of a segment = floor(log_{segments_per_tier}(size)) — tiers are
    size decades in the merge factor, as in TieredMergePolicy's
    size-stratified budget. Any tier holding MORE than segments_per_tier
    segments contributes a merge of its `max_merge_at_once` smallest
    members; the merged segment (sum of sizes) re-enters planning, so
    merges cascade upward exactly like the reference. Groups never exceed
    max_merged_bytes (oversized segments are left alone).

    Deterministic: ties break on segment name. Returns groups in the order
    they should run; later groups may contain `+`-joined synthetic names of
    earlier results only in planning — the executor names them for real.
    """
    if segments_per_tier < 2 or max_merge_at_once < 2:
        raise ValueError("segments_per_tier and max_merge_at_once must be >= 2")
    work = dict(sizes)
    plans: list[list[str]] = []
    base = float(segments_per_tier)

    def tier(sz: int) -> int:
        return int(math.floor(math.log(max(sz, 1), base)))

    while True:
        tiers: dict[int, list[str]] = {}
        for name, sz in work.items():
            tiers.setdefault(tier(sz), []).append(name)
        candidate = None
        for t in sorted(tiers):
            members = tiers[t]
            if len(members) <= segments_per_tier:
                continue
            members.sort(key=lambda n: (work[n], n))
            group = members[:max_merge_at_once]
            merged_sz = sum(work[n] for n in group)
            if max_merged_bytes is not None:
                while len(group) > 2 and merged_sz > max_merged_bytes:
                    merged_sz -= work[group.pop()]
                if merged_sz > max_merged_bytes:
                    continue
            candidate = (group, merged_sz)
            break
        if candidate is None:
            return plans
        group, merged_sz = candidate
        real = [n for g in group for n in (g.split("+") if "+" in g else [g])]
        plans.append(sorted(real))
        for n in group:
            del work[n]
        work["+".join(sorted(group))] = merged_sz


def merge_segment_group(spark: SparkSession, index_dir: str,
                        names: list[str],
                        config: IndexConfig = DEFAULT_CONFIG,
                        merged_name: str | None = None,
                        num_partitions: int | None = None) -> str:
    """Merge ONE group of live segments into a new segment; other segments
    are untouched. Tombstones are NOT purged here (a partial merge cannot
    retire the global tombstone set — only the full `merge_segments` does);
    they keep masking at collect time, so query results are unchanged.
    """
    live = B.live_segments(index_dir)
    missing = [n for n in names if n not in live]
    if missing:
        raise ValueError(f"not live segments: {missing}")
    if len(names) < 2:
        raise ValueError("a merge group needs at least 2 segments")
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    if merged_name is None:
        existing = os.listdir(os.path.join(index_dir, "segments"))
        n = sum(1 for e in existing if e.startswith("tiered-"))
        merged_name = f"tiered-{n:03d}"
    paths = [os.path.join(index_dir, "segments", n) for n in names]
    merged_path = os.path.join(index_dir, "segments", merged_name)
    seg = B.read_segments(spark, paths)
    merged = (
        seg.select("term", "range_id", "n_docs", "doc_gaps", "tfs")
           .repartition(num_partitions, "term", "range_id")
           .mapInArrow(B._partial_merger(config, None), B.SEGMENT_SCHEMA)
           .withColumn("term_bucket",
                       F.crc32(F.col("term")) % config.num_term_buckets))
    (merged.repartition(F.col("term_bucket"))
           .write.partitionBy("term_bucket").mode("overwrite")
           .parquet(merged_path))
    new_live = [n for n in live if n not in names] + [merged_name]
    B.write_live_segments(index_dir, new_live)
    # same postings, same tombstones -> df/cf and corpus stats are unchanged
    # by construction; the dictionary is rebuilt over the new layout anyway
    # so the artifact always derives from the live list alone.
    seg_paths = [os.path.join(index_dir, "segments", n) for n in new_live]
    B.write_dictionary(spark, index_dir, seg_paths)
    stats = B.write_stats(spark, index_dir, config)
    write_manifest(index_dir, f"tiered-{merged_name}", config.config_hash(),
                   ",".join(names),
                   metrics={"merged_into": merged_name, **{
                       k: v for k, v in stats.items() if k != "config"}})
    return merged_name


def tiered_merge(spark: SparkSession, index_dir: str,
                 config: IndexConfig = DEFAULT_CONFIG,
                 segments_per_tier: int = 10, max_merge_at_once: int = 10,
                 max_merged_bytes: int | None = None,
                 num_partitions: int | None = None) -> list[str]:
    """Run the tiered policy to quiescence. Returns the merged-segment names
    created (empty when the index is already within budget)."""
    created: list[str] = []
    while True:
        sizes = {n: dir_bytes(os.path.join(index_dir, "segments", n))
                 for n in B.live_segments(index_dir)}
        plans = plan_tiered_merges(sizes, segments_per_tier,
                                   max_merge_at_once, max_merged_bytes)
        if not plans:
            return created
        # execute only the first plan, then replan on REAL sizes (the
        # planner's cascade estimates sum-of-inputs; compression says
        # otherwise often enough to re-measure)
        created.append(merge_segment_group(
            spark, index_dir, plans[0], config,
            num_partitions=num_partitions))


# ------------------------------------------------------------ snapshot/restore

def _snap_path(index_dir: str, name: str) -> str:
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"bad snapshot name {name!r}")
    return os.path.join(index_dir, SNAPSHOT_DIR, f"{name}.json")


def snapshot(index_dir: str, name: str) -> dict:
    """Pin the current commit point: live segment list, tombstone batches,
    stats.json. Segments are immutable, so this is a manifest write — no
    posting bytes move (ReplicationHandler backup semantics)."""
    from solr_spark.indexing.deletes import DELETES_DIR

    snap = {
        "name": name,
        "created_at": time.time(),
        "segments": B.live_segments(index_dir),
        "deletes": sorted(
            d for d in os.listdir(os.path.join(index_dir, DELETES_DIR))
            if d.startswith("del-")
        ) if os.path.isdir(os.path.join(index_dir, DELETES_DIR)) else [],
        "stats": B.read_stats(index_dir),
    }
    path = _snap_path(index_dir, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path + ".tmp", "w") as f:
        json.dump(snap, f, indent=2)
    os.replace(path + ".tmp", path)
    return snap


def list_snapshots(index_dir: str) -> list[str]:
    d = os.path.join(index_dir, SNAPSHOT_DIR)
    if not os.path.isdir(d):
        return []
    return sorted(p[:-5] for p in os.listdir(d) if p.endswith(".json"))


def restore(spark: SparkSession, index_dir: str, name: str,
            config: IndexConfig = DEFAULT_CONFIG) -> dict:
    """Flip the index back to a snapshot's commit point: restore the live
    segment list and stats, drop tombstone batches created after the
    snapshot, rebuild the dictionary for the restored live set. Segments
    and analyzed batches written after the snapshot stay on disk (unreferenced
    — exactly Lucene's unreferenced-files-until-cleanup posture); queries see
    the snapshot's results again."""
    import shutil

    from solr_spark.indexing.deletes import DELETES_DIR

    path = _snap_path(index_dir, name)
    if not os.path.exists(path):
        raise FileNotFoundError(f"no snapshot {name!r} "
                                f"(have: {list_snapshots(index_dir)})")
    with open(path) as f:
        snap = json.load(f)
    missing = [s for s in snap["segments"] if not os.path.isdir(
        os.path.join(index_dir, "segments", s))]
    if missing:
        raise ValueError(f"snapshot {name!r} references deleted segments: "
                         f"{missing}")
    B.write_live_segments(index_dir, snap["segments"])
    droot = os.path.join(index_dir, DELETES_DIR)
    if os.path.isdir(droot):
        keep = set(snap["deletes"])
        for d in os.listdir(droot):
            if d.startswith("del-") and d not in keep:
                shutil.rmtree(os.path.join(droot, d))
    seg_paths = [os.path.join(index_dir, "segments", n)
                 for n in snap["segments"]]
    B.write_dictionary(spark, index_dir, seg_paths)
    # stats restore verbatim: the snapshot's n_docs/n_ghosts/avgdl ARE the
    # commit point's scoring statistics
    spath = os.path.join(index_dir, "stats.json")
    with open(spath + ".tmp", "w") as f:
        json.dump(snap["stats"], f, indent=2)
    os.replace(spath + ".tmp", spath)
    snap_cfg = snap["stats"].get("config")
    cfg_hash = IndexConfig(**snap_cfg).config_hash() if snap_cfg \
        else config.config_hash()
    write_manifest(index_dir, f"restore-{name}", cfg_hash, name,
                   metrics={"segments": len(snap["segments"])})
    return snap
