"""Hypothesis property tests for the round-3 pure kernels (no Spark session —
these are the unit-level invariants the reference pins with randomized tests,
SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from solr_spark.codec import media
from solr_spark.query.phrase import lucene_sloppy_freq
from solr_spark.query.spans import SpanNear, SpanTerm, span_eval

# --------------------------------------------------------------- media codecs

images = st.integers(1, 12).flatmap(
    lambda h: st.integers(1, 12).map(lambda w: (h, w))).flatmap(
    lambda hw: st.binary(min_size=hw[0] * hw[1] * 3,
                         max_size=hw[0] * hw[1] * 3).map(
        lambda b: np.frombuffer(b, dtype=np.uint8).reshape(hw[0], hw[1], 3)))


@settings(max_examples=60, deadline=None)
@given(images)
def test_ppm_bmp_roundtrip(img):
    assert (media.decode_ppm(media.encode_ppm(img)) == img).all()
    assert (media.decode_bmp(media.encode_bmp(img)) == img).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(-1.0, 1.0, allow_nan=False), min_size=1,
                max_size=500),
       st.sampled_from([4000, 8000, 16000]))
def test_wav_roundtrip(samples, rate):
    pcm = np.asarray(samples, dtype=np.float32)
    got, r = media.decode_wav(media.encode_wav(pcm, rate))
    assert r == rate and len(got) == len(pcm)
    # encode rounds at /32767, decode divides by /32768: worst case ~1.5 ulp
    assert np.abs(got - pcm).max() <= 1.5 / 32768 + 1e-6


# --------------------------------------------------------- span/sloppy kernels

pos_lists2 = st.tuples(
    st.lists(st.integers(0, 30), min_size=1, max_size=6, unique=True),
    st.lists(st.integers(0, 30), min_size=1, max_size=6, unique=True))


@settings(max_examples=120, deadline=None)
@given(pos_lists2, st.integers(0, 6))
def test_span_near_invariants(lists, slop):
    pa, pb = sorted(lists[0]), sorted(lists[1])
    positions = {"a": pa, "b": pb}
    a, b = SpanTerm("a"), SpanTerm("b")
    ordered = set(span_eval(SpanNear([a, b], slop, True), positions))
    unordered = set(span_eval(SpanNear([a, b], slop, False), positions))
    # every ordered chain is a mutually-non-overlapping tuple -> subset
    assert ordered <= unordered
    # slop monotonicity
    ordered_next = set(span_eval(SpanNear([a, b], slop + 1, True), positions))
    assert ordered <= ordered_next
    # every span satisfies the width rule and covers one a and one b
    for s, e in unordered:
        assert (e - s) - 2 <= slop
        assert any(s <= p < e for p in pa) and any(s <= p < e for p in pb)


@settings(max_examples=120, deadline=None)
@given(pos_lists2, st.integers(0, 6))
def test_lucene_sloppy_freq_bounds(lists, slop):
    """The pq matcher's freq is positive iff SOME alignment fits the slop,
    each match weighs in (0, 1], and match count never exceeds the total
    occurrence count (every nextMatch advances at least one iterator; a
    position CAN participate in two matches — 'a b a' style — so the bound
    is len(a)+len(b), not min)."""
    pa, pb = sorted(lists[0]), sorted(lists[1])
    if set(pa) & set(pb):
        return  # distinct terms cannot share a position in a real doc
    freq = lucene_sloppy_freq([pa, pb], slop)
    best = min(abs(x - (y - 1)) for x in pa for y in pb)
    if best <= slop:
        assert freq >= 1.0 / (1.0 + slop) - 1e-12
        # the best alignment is always found: freq >= its weight
        assert freq >= 1.0 / (1.0 + best) - 1e-12
    else:
        assert freq == 0.0
    assert freq <= (len(pa) + len(pb)) * 1.0 + 1e-12
