"""Pure-Python reference oracle: in-memory inverted index + exact Lucene-style BM25.

Implements the published Lucene 10 BM25 semantics directly (no Spark, no numpy
vectorization tricks) so the distributed engine has an independent golden target
(FIXTURES.md §3): dict-based inverted index, SmallFloat-quantized doc lengths,
idf = ln(1 + (N - df + 0.5)/(df + 0.5)), score = sum qtf*idf*tf/(tf + k1*(1-b+b*dl/avgdl)),
ties broken by docid ascending. Documents are ranked in docid order where
docid = dense rank of (conv_id, turn_idx) — the same identity contract as the engine.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from solr_spark.analysis import analyze_text
from solr_spark.config import DEFAULT_CONFIG, IndexConfig


def _small_float_quantize(length: int) -> int:
    """Scalar Lucene SmallFloat intToByte4 -> int4ToLong roundtrip (independent impl)."""
    if length < 0:
        raise ValueError(length)
    num_bits = length.bit_length()
    if num_bits < 4:
        return length
    shift = num_bits - 4
    mantissa = (length >> shift) & 0x07
    return (mantissa | 0x08) << shift


class OracleIndex:
    def __init__(self, config: IndexConfig = DEFAULT_CONFIG):
        self.config = config
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)  # term -> docid -> tf
        self.doclen: dict[int, int] = {}
        self.docs: dict[int, tuple[str, int]] = {}  # docid -> (conv_id, turn_idx)
        self._next = 0

    @classmethod
    def from_rows(cls, rows, config: IndexConfig = DEFAULT_CONFIG) -> "OracleIndex":
        """rows: iterable of (conv_id, turn_idx, text); docids by sorted identity."""
        idx = cls(config)
        for conv_id, turn_idx, text in sorted(rows, key=lambda r: (r[0], r[1])):
            idx.add(conv_id, turn_idx, text)
        return idx

    def add(self, conv_id: str, turn_idx: int, text: str | None) -> int:
        docid = self._next
        self._next += 1
        tokens = analyze_text(text, self.config)
        self.docs[docid] = (conv_id, turn_idx)
        self.doclen[docid] = len(tokens)
        for term, tf in Counter(tokens).items():
            self.postings[term][docid] = tf
        return docid

    @property
    def n_docs(self) -> int:
        return len(self.docs)

    @property
    def avgdl(self) -> float:
        return sum(self.doclen.values()) / len(self.doclen) if self.doclen else 0.0

    def term_stats(self) -> dict[str, tuple[int, int]]:
        """term -> (df, cf) for build verification (FIXTURES.md §5)."""
        return {t: (len(p), sum(p.values())) for t, p in self.postings.items()}

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def topk(
        self, query_text: str, k: int = 10, require_all: bool = False
    ) -> list[tuple[str, int, int, float]]:
        """Returns [(conv_id, turn_idx, docid, score)] ranked desc, docid-asc ties."""
        qterms = Counter(analyze_text(query_text, self.config))
        if not qterms:
            return []
        if require_all and any(t not in self.postings for t in qterms):
            return []
        k1, b, avgdl = self.config.k1, self.config.b, self.avgdl
        scores: dict[int, float] = defaultdict(float)
        seen: dict[int, int] = defaultdict(int)
        for term in sorted(qterms):  # fixed summation order (matches engine kernel)
            plist = self.postings.get(term)
            if not plist:
                continue
            w = qterms[term] * self.idf(term)
            for docid, tf in plist.items():
                dl = self.doclen[docid]
                if self.config.lucene_norms:
                    dl = _small_float_quantize(dl)
                scores[docid] += w * tf / (tf + k1 * (1.0 - b + b * dl / avgdl))
                seen[docid] += 1
        if require_all:
            n = len(qterms)
            scores = {d: s for d, s in scores.items() if seen[d] == n}
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(self.docs[d][0], self.docs[d][1], d, s) for d, s in ranked]
