"""IndexSchema (schema.py): dynamic-field resolution precedence, pattern
validation, and copyField materialization semantics (IndexSchema.java:1107
longest-pattern-wins, :1119 pattern shape, :1211 registerCopyField,
CopyField.java maxChars)."""

from __future__ import annotations

import pytest

from solr_spark.schema import CopyRule, IndexSchema


def test_dynamic_field_resolution_precedence():
    s = IndexSchema(
        fields={"title": "text_general", "body_txt_en": "text_plain"},
        dynamic_fields={"*": "string", "*_en": "text_en",
                        "*_txt_en": "text_txt_en", "pre_*": "prefixed"})
    # explicit beats every dynamic pattern, even a longer one
    assert s.field_type("body_txt_en") == "text_plain"
    # longest dynamic pattern wins: *_txt_en > *_en > *
    assert s.field_type("notes_txt_en") == "text_txt_en"
    assert s.field_type("notes_en") == "text_en"
    assert s.field_type("anything") == "string"
    assert s.field_type("pre_custom") == "prefixed"
    # prefix pattern loses to a LONGER suffix pattern when both match
    assert s.field_type("pre_txt_en") == "text_txt_en"

    no_star = IndexSchema(fields={"a": "t"}, dynamic_fields={"*_s": "string"})
    assert no_star.field_type("x_s") == "string"
    with pytest.raises(KeyError):
        no_star.field_type("unmatched")
    assert no_star.field_type("unmatched", default=None) is None


def test_dynamic_field_pattern_validation():
    for bad in ("a*b", "*mid*", "**", ""):
        with pytest.raises(ValueError):
            IndexSchema(dynamic_fields={bad: "t"})


def test_copyfield_validation():
    with pytest.raises(ValueError):  # unresolvable dest
        IndexSchema(fields={"a": "t"}, copy_fields=[("a", "nope")])
    with pytest.raises(ValueError):  # glob dest out of scope
        IndexSchema(fields={"a": "t"}, dynamic_fields={"*_s": "t"},
                    copy_fields=[("a", "x_*")])
    with pytest.raises(ValueError):  # unresolvable explicit source
        IndexSchema(fields={"a": "t", "dst": "t"},
                    copy_fields=[("ghost", "dst")])
    # dest resolving through a dynamic pattern is fine
    s = IndexSchema(fields={"a": "t"}, dynamic_fields={"*_txt": "t"},
                    copy_fields=[CopyRule("a", "all_txt", max_chars=5)])
    assert s.copy_fields[0].max_chars == 5


def test_apply_copies_semantics(spark):
    from pyspark.sql import functions as F

    s = IndexSchema(
        fields={"title": "t", "body": "t", "tag_s": "t", "catchall": "t",
                "vals": "t"},
        copy_fields=[("title", "catchall"), ("*_s", "catchall"),
                     CopyRule("body", "catchall", max_chars=4),
                     ("vals", "catchall")])
    df = spark.createDataFrame(
        [("T1", "longbody", "tagged", ["v1", "v2"], 7)],
        "title string, body string, tag_s string, vals array<string>, n int")
    out = s.apply_copies(df).select("catchall").first()[0]
    # rule order, glob expansion, maxChars truncation, array flattening
    assert out == ["T1", "tagged", "long", "v1", "v2"]

    # null sources are dropped (Solr skips absent values), numerics stringify
    s2 = IndexSchema(fields={"a": "t", "n": "t", "dst": "t"},
                     copy_fields=[("a", "dst"), ("n", "dst")])
    df2 = spark.createDataFrame([(None, 7)], "a string, n int")
    assert s2.apply_copies(df2).first()["dst"] == ["7"]

    # a column matching the glob that IS the dest never copies into itself
    s3 = IndexSchema(dynamic_fields={"*": "t"}, copy_fields=[("*", "dst")])
    df3 = spark.createDataFrame([("x", "y")], "a string, dst string")
    assert s3.apply_copies(df3).first()["dst"] == ["x"]


def test_copyfield_catchall_searchable_end_to_end(spark, tmp_path):
    """The reference's `copyField * -> _text_` pattern: a term that only
    exists in a copied attribute column is retrievable by BM25 over the
    catch-all index."""
    from solr_spark.config import IndexConfig
    from solr_spark.indexing import build_index
    from solr_spark.query import IndexReader, bm25_topk

    cfg = IndexConfig(range_shift=9, num_term_buckets=16)
    s = IndexSchema(
        fields={"text": "t", "role": "t", "tool": "t", "catchall": "t"},
        copy_fields=[("text", "catchall"), ("role", "catchall"),
                     ("tool", "catchall")])
    df = spark.createDataFrame(
        [("c0", 0, "user", "grep", "find the bug"),
         ("c1", 0, "assistant", "pytest", "run the suite"),
         ("c2", 0, "assistant", None, "plain reply")],
        "conv_id string, turn_idx int, role string, tool string, text string")
    src = (s.apply_copies(df).drop("text")
            .withColumnRenamed("catchall", "text"))
    idx = str(tmp_path / "copy_idx")
    build_index(spark, src, idx, cfg, input_token="copyfield-e2e")
    reader = IndexReader.open(idx, cfg)
    hits = bm25_topk(spark, reader, "pytest", k=5).collect()
    assert [h.conv_id for h in hits] == ["c1"]
    # dl counts copied values: c2's missing tool contributes nothing
    hits = bm25_topk(spark, reader, "assistant", k=5).collect()
    assert {h.conv_id for h in hits} == {"c1", "c2"}
