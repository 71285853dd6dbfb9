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

The read path is pyarrow with a pushed `conv_id IN (...)` predicate — a point
read over the key's row groups, no Spark job, the same ms-class posture as
LocalSearcher. (conv_id, turn_idx) is the engine's unique key per SURVEY §1.3.
"""

from __future__ import annotations

import os

import numpy as np

from solr_spark.indexing.deletes import deleted_array


def realtime_get(index_dir: str, keys: list[tuple[str, int]]) -> list[dict]:
    """Latest live stored fields for each (conv_id, turn_idx) key.

    Returns one dict per FOUND key (missing keys are simply absent, like
    /get's response omitting unknown ids), in the order requested. A key
    whose latest version is tombstoned returns nothing — deletes win over
    stale earlier versions, matching DirectUpdateHandler2's
    deletesAfter/ulog-lookup ordering.
    """
    import pyarrow.dataset as ds

    if not keys:
        return []
    conv_ids = sorted({c for c, _ in keys})
    dset = ds.dataset(os.path.join(index_dir, "analyzed"))
    tbl = dset.to_table(filter=ds.field("conv_id").isin(conv_ids))
    pdf = tbl.to_pandas()
    want = set(keys)
    pdf = pdf[[(c, t) in want
               for c, t in zip(pdf["conv_id"], pdf["turn_idx"])]]
    if len(pdf) == 0:
        return []
    # latest version per key = max docid (docids are allocation-ordered:
    # add_documents assigns past the n_total watermark, so a re-add or atomic
    # update of a key always carries a larger docid than its predecessors)
    pdf = (pdf.sort_values("docid")
              .drop_duplicates(["conv_id", "turn_idx"], keep="last"))
    dels = deleted_array(None, index_dir)
    if len(dels):
        pdf = pdf[~np.isin(pdf["docid"].to_numpy(), dels)]
    by_key = {(c, int(t)): row
              for (c, t), (_, row) in zip(
                  zip(pdf["conv_id"], pdf["turn_idx"]), pdf.iterrows())}
    out = []
    for key in keys:
        row = by_key.get((key[0], int(key[1])))
        if row is None:
            continue
        out.append({k: (v.item() if hasattr(v, "item") else v)
                    for k, v in row.items()})
    return out
