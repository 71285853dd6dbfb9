"""Tests: graph traversal operators + multimodal column plumbing."""

from __future__ import annotations

import numpy as np
import pytest

from solr_spark.functions.multimodal import (
    audio_features,
    image_features,
    resize_images,
    sample_frames,
    synth_media,
)
from solr_spark.operators.graph import gather_nodes, graph_query, shortest_path


@pytest.fixture(scope="module")
def edges(spark):
    #  a -> b -> c -> d,  a -> c,  d -> a (cycle),  x -> y (island)
    rows = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("d", "a"), ("x", "y")]
    return spark.createDataFrame(rows, "src string, dst string")


def _roots(spark, *nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node string")


def test_gather_nodes_levels(spark, edges):
    out = {r["node"]: r["level"] for r in
           gather_nodes(edges, _roots(spark, "a"), "src", "dst", levels=2).collect()}
    assert out == {"b": 1, "c": 1, "d": 2}  # c at min level 1, not re-emitted at 2


def test_graph_query_fixpoint_with_cycle(spark, edges):
    out = {r["node"] for r in
           graph_query(edges, _roots(spark, "b"), "src", "dst").collect()}
    assert out == {"b", "c", "d", "a"}  # cycle closed, terminates
    capped = {r["node"] for r in
              graph_query(edges, _roots(spark, "b"), "src", "dst",
                          max_depth=1).collect()}
    assert capped == {"b", "c"}


def test_shortest_path(spark, edges):
    assert shortest_path(edges, "a", "d", "src", "dst") == ["a", "c", "d"]
    assert shortest_path(edges, "a", "y", "src", "dst") == []
    assert shortest_path(edges, "d", "c", "src", "dst") == ["d", "a", "c"]


# ----------------------------------------------------------------- multimodal


def test_image_features_shape_and_determinism(spark):
    media = synth_media(spark, 6)
    out = image_features(media, dim=32).collect()
    assert len(out) == 6
    assert all(len(r["features"]) == 32 for r in out)
    assert all(0.0 <= v <= 1.0 for r in out for v in r["features"])
    # deterministic: same content -> same features across runs
    again = image_features(synth_media(spark, 6), dim=32).collect()
    a = {r["media_id"]: r["features"] for r in out}
    b = {r["media_id"]: r["features"] for r in again}
    assert a == b


def test_resize_images_meta(spark):
    out = resize_images(synth_media(spark, 3), size=(4, 4)).collect()
    assert len(out) == 3
    for r in out:
        assert len(r["content"]) == 4 * 4 * 3  # raw HxWx3 bytes
        assert r["meta"]["width"] == 4 and r["meta"]["height"] == 4


def test_sample_frames_explodes(spark):
    out = sample_frames(synth_media(spark, 5)).collect()
    assert len(out) >= 5
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    for idxs in by_id.values():
        assert sorted(idxs) == list(range(len(idxs)))  # dense frame indices
    assert all(len(r["frame"]) == 8 * 8 * 3 for r in out)


def test_audio_features_bands(spark):
    out = audio_features(synth_media(spark, 4), n_bands=8).collect()
    assert len(out) == 4
    assert all(len(r["features"]) == 8 for r in out)
    assert all(np.isfinite(r["features"]).all() for r in out)


def test_real_codec_is_explicitly_stubbed(spark):
    from solr_spark.functions.multimodal import _decode_image_bytes

    with pytest.raises(NotImplementedError):
        _decode_image_bytes(b"\xff\xd8\xff", fake=False)


def test_shortest_path_wide_frontier(spark):
    """Wide synthetic frontier: hub fans out to 2,000 nodes, all of which link
    to the same sink. The preds table holds thousands of rows, but the path
    walk only ever looks up one node per step (no driver-side full collect)."""
    hub_out = [("hub", f"m{i}") for i in range(2000)]
    to_sink = [(f"m{i}", "sink") for i in range(2000)]
    edges = spark.createDataFrame(
        [("start", "hub")] + hub_out + to_sink, "src string, dst string")
    path = shortest_path(edges, "start", "sink", "src", "dst", max_depth=5)
    assert path[0] == "start" and path[1] == "hub" and path[3] == "sink"
    assert len(path) == 4
    # min-predecessor tiebreak: 'm0' is the lexicographic minimum middle node
    assert path[2] == "m0"
    assert shortest_path(edges, "sink", "start", "src", "dst", max_depth=5) == []
