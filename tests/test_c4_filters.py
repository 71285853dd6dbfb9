"""C4/FineWeb heuristic cleaning rules (textanalysis.py::c4_filters)."""

from __future__ import annotations

from solr_spark.functions.textanalysis import c4_filters


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    return {r["doc_id"]: r.asDict()
            for r in c4_filters(df, "doc_id", "text", **kw).collect()}


def test_line_rules(spark):
    text = "\n".join([
        "a good long sentence here.",     # kept
        "no terminal punctuation",        # dropped: no . ! ?
        "short.",                         # dropped: < 3 words
        "is that a question?",            # kept
        "enable javascript to view this page.",  # dropped: javascript
        'he said "stop it now!"',         # kept: ends in closing quote
    ])
    got = _run(spark, [(1, text)], min_sentences=1)[1]
    assert got["n_lines"] == 6 and got["n_lines_kept"] == 3
    assert got["cleaned_text"].splitlines() == [
        "a good long sentence here.",
        "is that a question?",
        'he said "stop it now!"',
    ]
    assert got["keep"] is True


def test_page_rules(spark):
    ok = "\n".join(["one fine sentence here."] * 5)
    got = _run(spark, [
        (1, ok),
        (2, ok + "\nlorem ipsum dolor sit amet."),
        (3, ok + "\nvar f = function() { return; }"),
        (4, "\n".join(["one fine sentence here."] * 4)),  # only 4 sentences
    ])
    assert got[1]["keep"] is True and got[1]["n_sentences"] == 5
    assert got[2]["keep"] is False and got[2]["has_lorem_ipsum"] is True
    assert got[3]["keep"] is False and got[3]["has_curly_brace"] is True
    assert got[4]["keep"] is False and got[4]["n_sentences"] == 4


def test_empty_and_unpunctuated_doc(spark):
    got = _run(spark, [(1, "token soup with no punctuation at all")])
    assert got[1]["n_lines_kept"] == 0
    assert got[1]["cleaned_text"] == ""
    assert got[1]["keep"] is False


def test_sentence_count_uses_cleaned_text(spark):
    # the dropped line's '.' must not count toward n_sentences
    text = "enable javascript now please.\n" + "\n".join(
        ["a kept sentence right here."] * 2)
    got = _run(spark, [(1, text)], min_sentences=3)[1]
    assert got["n_lines_kept"] == 2
    assert got["n_sentences"] == 2
    assert got["keep"] is False


def test_bpe_token_count_pieces(spark):
    from solr_spark.functions.textanalysis import bpe_token_count
    df = spark.createDataFrame(
        [(1, "it's 2024, really?!"),   # it|'s| 2024|,| really|?!
         (2, "def f(x): return x+1"),
         (3, ""), (4, "   ")],
        "doc_id int, t string")
    got = {r["doc_id"]: r["n"]
           for r in df.select("doc_id",
                              bpe_token_count("t").alias("n")).collect()}
    assert got[1] == 6
    # def| f|(|x|):| return| x|+|1  -> 9 pieces
    assert got[2] == 9
    assert got[3] == 0
    assert got[4] == 1  # one whitespace run
