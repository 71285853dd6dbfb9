"""Source adapters: format dispatch, schema contract, lineage fingerprints."""

from __future__ import annotations

import os

import pytest

from solr_spark.sources import (
    input_fingerprint,
    read_transcripts,
    validate_transcripts,
)


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    from solr_spark.data import synth_transcripts_spark

    d = str(tmp_path_factory.mktemp("src") / "corpus")
    synth_transcripts_spark(spark, 200, seed=3).write.parquet(d)
    return d


def test_read_parquet_roundtrip(spark, corpus_dir):
    df, token = read_transcripts(spark, corpus_dir)
    assert df.count() == 200
    assert token.startswith("files-")


def test_fingerprint_stable_and_sensitive(spark, corpus_dir):
    _, t1 = read_transcripts(spark, corpus_dir)
    _, t2 = read_transcripts(spark, corpus_dir)
    assert t1 == t2  # deterministic
    # touching a data file must change the fingerprint
    part = next(f for f in os.listdir(corpus_dir) if f.endswith(".parquet"))
    p = os.path.join(corpus_dir, part)
    os.utime(p, (os.path.getatime(p), os.path.getmtime(p) + 5))
    _, t3 = read_transcripts(spark, corpus_dir)
    assert t3 != t1


def test_json_reader(spark, tmp_path):
    p = str(tmp_path / "t.jsonl")
    with open(p, "w") as f:
        f.write('{"conv_id":"c1","turn_idx":0,"role":"user","text":"hi",'
                '"tool":null,"ts":"2024-01-01T00:00:00Z"}\n')
        f.write('{"conv_id":"c1","turn_idx":1,"role":"agent","text":"yo",'
                '"tool":"search","ts":"2024-01-01T00:00:05Z"}\n')
    df, token = read_transcripts(spark, p)
    assert df.count() == 2
    assert df.schema["turn_idx"].dataType.simpleString() == "int"


def test_validate_missing_column(spark):
    df = spark.createDataFrame([("c1", 0)], "conv_id string, turn_idx int")
    with pytest.raises(ValueError, match="text"):
        validate_transcripts(df)


def test_validate_casts_types(spark):
    df = spark.createDataFrame(
        [("c1", "0", "hello")], "conv_id string, turn_idx string, text string")
    out = validate_transcripts(df)
    assert out.schema["turn_idx"].dataType.simpleString() == "int"
    with pytest.raises(ValueError, match="turn_idx"):
        validate_transcripts(df, strict=True)


def test_catalog_table_fingerprint(spark, corpus_dir):
    spark.read.parquet(corpus_dir).createOrReplaceTempView("transcripts_v")
    # temp view: no iceberg snapshots; falls back to the file listing
    df, token = read_transcripts(spark, "transcripts_v")
    assert df.count() == 200
    assert token.startswith("files-")
    assert input_fingerprint(spark, "transcripts_v").startswith("files-")


def test_arrow_ipc_reader(spark, tmp_path):
    """Binary ingest (JavabinLoader/CborLoader role): Arrow IPC files decode
    distributed via binaryFile + mapInArrow; columns resolve by name, missing
    nullable columns fill with null, extra columns drop."""
    import datetime

    import pyarrow as pa
    import pyarrow.ipc

    rows = {
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": pa.array([0, 1, 0], type=pa.int32()),
        "text": ["hello world", "error timeout", "retry merge"],
        "role": ["u", "a", "u"],
        "ts": pa.array([datetime.datetime(2024, 1, 1)] * 3,
                       type=pa.timestamp("us")),
        "extra_col": [1, 2, 3],    # dropped
        # 'tool' missing -> null
    }
    t = pa.table(rows)
    for name, (off, n) in [("a.arrow", (0, 2)), ("b.arrow", (2, 1))]:
        with pa.ipc.new_file(str(tmp_path / name), t.schema) as w:
            w.write_table(t.slice(off, n))
    df, token = read_transcripts(spark, str(tmp_path) + "/*.arrow")
    got = sorted((r.conv_id, r.turn_idx, r.text, r.tool)
                 for r in df.collect())
    assert got == [("c1", 0, "hello world", None),
                   ("c1", 1, "error timeout", None),
                   ("c2", 0, "retry merge", None)]
    assert df.schema["turn_idx"].dataType.simpleString() == "int"
    assert token.startswith("files-")


def test_xml_solr_update_format(spark, tmp_path):
    """XMLLoader role: <add><doc><field name=..> parses natively and lands
    on the transcript contract; repeated field names keep the first value."""
    p = str(tmp_path / "t.xml")
    with open(p, "w") as f:
        f.write(
            "<add>"
            '<doc><field name="conv_id">c1</field>'
            '<field name="turn_idx">0</field>'
            '<field name="role">user</field>'
            '<field name="text">hello world</field>'
            '<field name="ts">2024-01-01T00:00:00Z</field></doc>'
            '<doc><field name="conv_id">c1</field>'
            '<field name="turn_idx">1</field>'
            '<field name="role">assistant</field>'
            '<field name="text">first value</field>'
            '<field name="text">second value dropped</field>'
            '<field name="tool">search</field></doc>'
            "</add>")
    df, token = read_transcripts(spark, p)
    rows = {r.turn_idx: r for r in df.collect()}
    assert len(rows) == 2
    assert rows[0].text == "hello world" and rows[0].role == "user"
    assert rows[0].ts is not None
    assert rows[1].text == "first value"  # multivalued keeps first
    assert rows[1].tool == "search" and rows[1].ts is None
    assert df.schema["turn_idx"].dataType.simpleString() == "int"
    assert token.startswith("files-")


def test_xml_not_update_format_raises(spark, tmp_path):
    p = str(tmp_path / "bad.xml")
    with open(p, "w") as f:
        f.write("<add><doc><title>plain</title></doc></add>")
    import pytest as _pt
    with _pt.raises(ValueError, match="update format"):
        read_transcripts(spark, p)
