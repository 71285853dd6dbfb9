"""Realtime get: fetch the CURRENT stored version of documents by unique key,
visible before any searcher reopen.

Reference semantics: RealTimeGetComponent (solr/core/src/java/org/apache/solr/
handler/component/RealTimeGetComponent.java:121 `process` — consult the update
log for uncommitted versions first, fall back to the newest index version) —
`/get` returns the latest document for a unique key even when it was added or
atomically updated after the last commit/searcher open.

This engine's analog of "the update log" is the analyzed batch directories:
`add_documents` (indexing/merge.py:89) writes `analyzed/batch-NNN` immediately,
BEFORE any LocalSearcher reopen, so a key's latest version is the row with the
highest docid across all batches. Tombstones (indexing/deletes.py) hide
deleted docids exactly like liveDocs does for RTG.

Read path: a uniqueKey -> (file, row-group, row) sidecar index — the Lucene
terms-index/FST role for the id field — built lazily from ONE narrow scan of
(conv_id, turn_idx, docid) columns and cached per index state (new NRT
batches invalidate it, because the file census is the cache token). A point
read then opens exactly the parquet row groups owning the requested keys: no
Spark job, no full-table scan. Without the index, conv_id min/max row-group
stats cannot prune (keys hash-scatter across every batch file), so a naive
filtered read decodes the WHOLE stored table per /get — the difference
between ms and seconds at one shard, and between one row group and 100 TB at
cluster scale. (conv_id, turn_idx) is the engine's unique key per SURVEY §1.3.
"""

from __future__ import annotations

import os

from solr_spark.indexing.deletes import deleted_array

# analyzed-dir -> (file census token, {conv_id: [(docid, turn_idx, path,
# row_group, local_row), ...]}). Keys group by conv_id (one dict probe per
# requested conversation); the per-conv list is turn-grained.
_KEY_INDEX: dict[str, tuple[tuple, dict]] = {}


def _census(analyzed_dir: str) -> tuple:
    """Cache token: every analyzed parquet file with its size — NRT
    add_documents batches append files, invalidating stale indexes."""
    out = []
    for root, _dirs, files in os.walk(analyzed_dir):
        for f in sorted(files):
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out.append((p, os.path.getsize(p)))
    return tuple(sorted(out))


def _build_key_index(analyzed_dir: str, token: tuple) -> dict:
    import pyarrow.parquet as pq

    index: dict = {}
    for path, _sz in token:
        pf = pq.ParquetFile(path)
        for rg in range(pf.num_row_groups):
            tbl = pf.read_row_group(rg, columns=["conv_id", "turn_idx",
                                                 "docid"])
            convs = tbl.column("conv_id").to_pylist()
            turns = tbl.column("turn_idx").to_numpy()
            docids = tbl.column("docid").to_numpy()
            for i, conv in enumerate(convs):
                index.setdefault(conv, []).append(
                    (int(docids[i]), int(turns[i]), path, rg, i))
    return index


def _key_index(analyzed_dir: str) -> dict:
    token = _census(analyzed_dir)
    cached = _KEY_INDEX.get(analyzed_dir)
    if cached is not None and cached[0] == token:
        return cached[1]
    index = _build_key_index(analyzed_dir, token)
    _KEY_INDEX[analyzed_dir] = (token, index)
    return index


def realtime_get(index_dir: str, keys: list[tuple[str, int]]) -> list[dict]:
    """Latest live stored fields for each (conv_id, turn_idx) key.

    Returns one dict per FOUND key (missing keys are simply absent, like
    /get's response omitting unknown ids), in the order requested. A key
    whose latest version is tombstoned returns nothing — deletes win over
    stale earlier versions, matching DirectUpdateHandler2's
    deletesAfter/ulog-lookup ordering.
    """
    import pyarrow.parquet as pq

    if not keys:
        return []
    index = _key_index(os.path.join(index_dir, "analyzed"))

    # resolve each key to its latest version's physical location
    # (max docid = latest: add_documents allocates past the n_total
    # watermark, so a re-add/atomic update always outbids its predecessors)
    located: dict[tuple[str, int], tuple] = {}
    for conv, turn in keys:
        best = None
        for docid, t, path, rg, row in index.get(conv, ()):
            if t == int(turn) and (best is None or docid > best[0]):
                best = (docid, path, rg, row)
        if best is not None:
            located[(conv, int(turn))] = best

    if not located:
        return []
    dels = deleted_array(None, index_dir)
    if len(dels):
        dead = set(int(d) for d in dels)
        located = {k: v for k, v in located.items()
                   if v[0] not in dead}

    # one read per touched row group, all columns, rows taken by position
    by_rg: dict[tuple[str, int], list[int]] = {}
    for docid, path, rg, row in located.values():
        by_rg.setdefault((path, rg), []).append(row)
    rows_by_loc: dict[tuple[str, int, int], dict] = {}
    for (path, rg), rows in by_rg.items():
        tbl = pq.ParquetFile(path).read_row_group(rg)
        taken = tbl.take(sorted(rows)).to_pylist()
        for row, rec in zip(sorted(rows), taken):
            rows_by_loc[(path, rg, row)] = rec

    out = []
    for conv, turn in keys:
        loc = located.get((conv, int(turn)))
        if loc is None:
            continue
        _docid, path, rg, row = loc
        out.append(dict(rows_by_loc[(path, rg, row)]))
    return out


__all__ = ["realtime_get"]
