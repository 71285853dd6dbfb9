"""Varint/posting codec + SmallFloat property tests."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from solr_spark.codec import varint_decode, varint_encode
from solr_spark.codec.smallfloat import int4_to_long, int_to_byte4, quantize_doc_length
from solr_spark.codec.varint import decode_postings, encode_postings
from solr_spark.oracle.reference import _small_float_quantize


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varint_decode(varint_encode(arr)).tolist() == vals


@given(
    st.lists(
        st.tuples(st.integers(0, 2**40), st.integers(1, 10_000)),
        min_size=1, max_size=300, unique_by=lambda x: x[0],
    ),
    st.integers(1, 256),
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(pairs, block):
    pairs.sort()
    docids = np.array([p[0] for p in pairs], dtype=np.int64)
    tfs = np.array([p[1] for p in pairs], dtype=np.int64)
    base = int(docids[0]) - (int(docids[0]) % 7)
    gaps, tf_b, bf, bmt, mx = encode_postings(docids, tfs, base, block)
    d2, t2 = decode_postings(gaps, tf_b, base)
    assert d2.tolist() == docids.tolist()
    assert t2.tolist() == tfs.tolist()
    assert mx == tfs.max()
    assert bf[0] == docids[0]
    assert max(bmt) == mx


@given(st.integers(0, 2**31 - 1))
@settings(max_examples=500, deadline=None)
def test_smallfloat_matches_scalar_oracle(x):
    """Vectorized numpy SmallFloat == independent scalar implementation."""
    vec = int(int4_to_long(int_to_byte4(np.array([x])))[0])
    assert vec == _small_float_quantize(x)


def test_smallfloat_known_values():
    # Lucene semantics: exact below 8, monotone non-increasing error, idempotent
    xs = np.arange(0, 50_000)
    q = quantize_doc_length(xs)
    assert (q[:8] == xs[:8]).all()
    assert (q <= xs).all()
    assert (np.diff(q) >= 0).all()
    assert (quantize_doc_length(q) == q).all()  # fixpoint
    assert q[255] == 240 and q[16] == 16 and q[19] == 18
