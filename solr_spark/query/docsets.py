"""Filter DocSets for the scored path: fq -> docid bitmap -> kernel mask.

The reference intersects cached filter DocSets with every scored query
(search/SolrIndexSearcher.java:164 filterCache, :1254 getProcessedFilter;
the DocSet itself is a BitDocSet — one bit per internal docid). This module
is that flow restated for the range-partitioned posting layout:

  1. `filter_docids` compiles classic-parser filter strings against the
     index's FORWARD table (the analyzed parquet, which carries docid,
     conv_id, turn_idx and any stored attribute columns) into a
     DataFrame(docid) — predicates push down to the parquet scan.
  2. `docid_range_bitmaps` turns any DataFrame(docid) into one fixed-width
     bitmap PER POSTING RANGE (range_id, filter_bits): little-endian packed,
     2**range_shift bits = one byte per 8 docs. Built map-side (each input
     partition packs partial bitmaps for the ranges it touches) and merged
     with a per-range OR — the shuffle moves bitmap bytes, never raw docids,
     so a 50%-selective filter over 10^12 docs exchanges ~n_ranges * 8 KB,
     not 5*10^11 rows.
  3. The scoring kernels inner-join posting rows to the bitmaps on range_id —
     a range with NO allowed docs drops out BEFORE postings are decoded
     (filter-driven skipping, composing with block-max WAND's bound-driven
     skipping) — and AND the unpacked bits into the keep mask after scoring.

Scoring statistics (df, n_docs, avgdl) stay GLOBAL: fq narrows the result
set, never the scoring model — exactly the reference's q+fq semantics.
A precomputed DataFrame(docid) can be persisted and reused across queries;
that handle IS the filterCache role here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BITMAP_SCHEMA = "range_id long, filter_bits binary"


def filter_docids(spark: SparkSession, reader, filters, now=None) -> DataFrame:
    """Compile classic-syntax filter strings (fq) to a DataFrame(docid).

    Filters evaluate against the index's forward table: `text` addresses the
    ANALYZED token text (word-boundary semantics, matching what the index
    matched at build time), every stored attribute column (build_index
    stored_cols) by name, plus conv_id / turn_idx. Multiple filters AND, as
    fq's do. Predicates are plain Catalyst columns — pushed to the scan.
    `now` anchors date-math range endpoints (`ts:[NOW-7DAYS TO *]`) — pass a
    fixed ISO instant for deterministic results (Solr's request NOW param).
    """
    from pyspark.errors import AnalysisException

    from solr_spark.query.parser import LuceneQueryParser

    if isinstance(filters, str):
        filters = [filters]
    fwd = reader.forward(spark).withColumnRenamed("toks", "text")
    parser = LuceneQueryParser("text", {"text"}, now=now)
    for f in filters:
        try:
            fwd = fwd.where(parser.parse(f))
        except AnalysisException as e:
            # a filter on a field the index never stored must fail with the
            # fix in the message, not a raw Catalyst resolution error
            raise ValueError(
                f"fq {f!r} references a field not stored in this index "
                f"(forward columns: {sorted(fwd.columns)}); rebuild with "
                f"build_index(..., stored_cols=(<field>,)) to filter on it"
            ) from e
    return fwd.select("docid")


def docid_range_bitmaps(docids: DataFrame, range_shift: int) -> DataFrame:
    """DataFrame(docid) -> DataFrame(range_id, filter_bits).

    filter_bits is a little-endian packed bitmap of width 2**range_shift
    (bit o of byte o//8 = docid (range_id << shift) + o allowed). Packing is
    map-side (mapInPandas over whatever partitioning the filter scan
    produced); the per-range OR-merge shuffles only packed bytes.
    """
    width = 1 << range_shift
    nbytes = width // 8
    mask = width - 1

    def pack_iter(batches):
        acc: dict[int, np.ndarray] = {}
        for pdf in batches:
            d = pdf["docid"].to_numpy()
            if not len(d):
                continue
            rid = d >> range_shift
            off = (d & mask).astype(np.int64)
            order = np.argsort(rid, kind="stable")
            rid, off = rid[order], off[order]
            bounds = np.flatnonzero(rid[1:] != rid[:-1]) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(rid)]))
            for s, e in zip(starts, ends):
                r = int(rid[s])
                bits = acc.get(r)
                if bits is None:
                    bits = acc[r] = np.zeros(width, dtype=bool)
                bits[off[s:e]] = True
        if acc:
            yield pd.DataFrame({
                "range_id": list(acc),
                "filter_bits": [
                    np.packbits(b, bitorder="little").tobytes()
                    for b in acc.values()],
            })

    partials = docids.select("docid").mapInPandas(pack_iter, _BITMAP_SCHEMA)

    def or_merge(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = np.zeros(nbytes, dtype=np.uint8)
        for blob in pdf["filter_bits"]:
            merged |= np.frombuffer(blob, dtype=np.uint8)
        return pd.DataFrame({"range_id": [pdf["range_id"].iloc[0]],
                             "filter_bits": [merged.tobytes()]})

    return partials.groupBy("range_id").applyInPandas(
        or_merge, _BITMAP_SCHEMA)


def unpack_bits(blob: bytes, width: int) -> np.ndarray:
    """Packed little-endian bitmap blob -> bool array of length `width`."""
    return np.unpackbits(np.frombuffer(blob, dtype=np.uint8),
                         bitorder="little")[:width].astype(bool)


__all__ = ["filter_docids", "docid_range_bitmaps", "unpack_bits"]
