"""Analyzer conformance vectors (FIXTURES.md §4) + batch/scalar agreement."""

from __future__ import annotations

import pandas as pd
import pytest

from solr_spark.analysis import ENGLISH_STOPWORDS, analyze_series, analyze_text
from solr_spark.config import IndexConfig

CASES = [
    ("The QUICK brown-fox!", ["quick", "brown", "fox"]),
    ("it's O'Brien's", ["it's", "o'brien's"]),
    ("err404 v2.1.0 3.14", ["err404", "v2.1.0", "3.14"]),
    ("john.doe@example.com", ["john.doe", "example.com"]),
    ("café naïve 東京", ["café", "naïve", "東", "京"]),
    ("", []),
    ("the and of", []),
    ("THE The the", []),  # stop filter is case-insensitive
    ("a_b snake_case", ["a_b", "snake_case"]),
    ("1,000 items", ["1,000", "items"]),
    ("quick,brown", ["quick", "brown"]),
    ("http://example.com/path?q=1", ["http", "example.com", "path", "q", "1"]),
    ("repeat repeat REPEAT", ["repeat", "repeat", "repeat"]),  # tf counting
    ("tabs\tand\nnewlines", ["tabs", "newlines"]),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_conformance(raw, expected):
    assert analyze_text(raw) == expected


def test_stopword_list_size():
    assert len(ENGLISH_STOPWORDS) == 35  # reference lang/stopwords_en.txt entries


def test_max_token_length_split():
    out = analyze_text("x" * 300)
    assert out == ["x" * 255, "x" * 45]


def test_none_handling():
    assert analyze_text(None) == []


def test_batch_matches_scalar():
    texts = [raw for raw, _ in CASES] + [None, "x" * 300]
    got = analyze_series(pd.Series(texts, dtype=object)).tolist()
    assert got == [analyze_text(t) for t in texts]


def test_no_stopwords_mode():
    cfg = IndexConfig(stopwords="none")
    assert analyze_text("the quick fox", cfg) == ["the", "quick", "fox"]


def test_spark_udf_roundtrip(spark):
    from solr_spark.analysis import make_tokenize_udf

    df = spark.createDataFrame([(r,) for r, _ in CASES], "text string")
    tok = make_tokenize_udf()
    rows = df.select(tok("text").alias("tokens")).collect()
    assert [r["tokens"] for r in rows] == [e for _, e in CASES]


def test_jvm_tokenizer_matches_python(spark):
    """The pure-JVM tokenize_column must agree with the Python analyzer on every
    conformance vector, the long-token split, and a randomized synthetic corpus
    (it's the index build's production path)."""
    from solr_spark.analysis.analyzer import tokenize_column
    from solr_spark.data import synth_transcripts_spark

    texts = [raw for raw, _ in CASES] + ["x" * 300, "MIXED case And STOPs the"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r[0] for r in df.select(tokenize_column("text")).collect()]
    assert got == [analyze_text(t) for t in texts]

    corpus = synth_transcripts_spark(spark, 500, seed=99).select("text")
    jvm = [r[0] for r in corpus.select(tokenize_column("text")).collect()]
    py = [analyze_text(r[0]) for r in corpus.collect()]
    assert jvm == py


def test_jvm_tokenizer_no_stopwords(spark):
    from solr_spark.analysis.analyzer import tokenize_column

    cfg = IndexConfig(stopwords="none")
    df = spark.createDataFrame([("the quick fox",)], "text string")
    assert df.select(tokenize_column("text", cfg)).head()[0] == \
        ["the", "quick", "fox"]


# ---------------------------------------------------------------------------
# Porter stemming + ASCII folding filters (text_en chain parity)
# ---------------------------------------------------------------------------

PORTER_VECTORS = {
    # step 1a / 1b / 1c (Porter 1980 §: worked examples)
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "sized": "size", "hopping": "hop", "tanned": "tan", "filing": "file",
    "happy": "happi", "sky": "sky",
    # step 2 incl. the two ANSI-C departures (bli->ble, logi->log)
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "digitizer": "digit", "conformabli": "conform",
    "radicalli": "radic", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "analogi": "analog",   # logi->log fires (m("ana")=1)
    "geologi": "geologi",  # logi->log blocked: m("geo")=0 — matches the C code
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "communism": "commun", "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # famous whole-chain examples
    "generalizations": "gener", "oscillators": "oscil",
    # short-token guard
    "a": "a", "is": "is",
}


def test_porter_vectors():
    from solr_spark.analysis.porter import porter_stem

    bad = {w: (porter_stem(w), e) for w, e in PORTER_VECTORS.items()
           if porter_stem(w) != e}
    assert not bad, bad


def test_stem_chain_and_possessive():
    cfg = IndexConfig(stem="porter")
    assert analyze_text("John's queries were merging tables", cfg) == \
        ["john", "queri", "were", "merg", "tabl"]
    # query-side and index-side analysis share the one code path
    assert analyze_series(pd.Series(["running dogs"]), cfg).iloc[0] == \
        ["run", "dog"]


def test_fold_ascii_scalar_and_batch():
    cfg = IndexConfig(fold_ascii=True)
    assert analyze_text("Café naïve Zürich mañana", cfg) == \
        ["cafe", "naive", "zurich", "manana"]
    assert analyze_series(pd.Series(["séries télé"]), cfg).iloc[0] == \
        ["series", "tele"]
    # folding must not move token boundaries vs unfolded text
    assert len(analyze_text("très-bien café.net", cfg)) == \
        len(analyze_text("tres-bien cafe.net"))


def test_fold_matches_duckdb_strip_accents():
    """_fold_text is the engine's claimed twin of DuckDB strip_accents (what
    the ft18 oracle relies on) — check the whole Latin-1/Extended-A range."""
    import duckdb

    from solr_spark.analysis.analyzer import _fold_text

    chars = "".join(chr(c) for c in range(0x00C0, 0x0180) if chr(c).isalpha())
    con = duckdb.connect()
    duck = con.execute("select strip_accents(?)", [chars]).fetchone()[0]
    assert _fold_text(chars) == duck


def test_jvm_fold_twin(spark):
    from solr_spark.analysis.analyzer import tokenize_column

    cfg = IndexConfig(fold_ascii=True)
    texts = ["Café naïve Zürich mañana", "ẩ ḗ plain", "déjà-vu crème brûlée",
             # non-Latin decomposables: Cyrillic й/ё, Greek ά, Greek Extended
             # ἄ (U+1F04) — the JVM translate table must fold the full BMP,
             # not just the Latin ranges (round-2 advice)
             "йод Ёлка ελληνικά ἄνθρωπος ся́дзьмы"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r[0] for r in df.select(tokenize_column("text", cfg)).collect()]
    assert got == [analyze_text(t, cfg) for t in texts]


def test_jvm_tokenizer_rejects_stem():
    from solr_spark.analysis.analyzer import tokenize_column

    with pytest.raises(NotImplementedError):
        tokenize_column("text", IndexConfig(stem="porter"))


def test_fast_path_matches_scalar_randomized():
    """The simple-text fast path (space-split, no regex) must equal the scalar
    analyzer on a mixed corpus: simple rows, punctuation rows, accents, CJK,
    multi-space runs, long-token chunking, and every filter combination."""
    import random

    rng = random.Random(7)
    words = ["spark", "the", "merge", "query's", "v2.1.0", "café",
             "東京", "a_b", "x" * 300, "", " ", "stop"]
    texts = []
    for _ in range(300):
        n = rng.randint(0, 8)
        sep = rng.choice([" ", "  ", " "])
        texts.append(sep.join(rng.choice(words) for _ in range(n)))
    texts += ["plain simple words only", "double  space", " lead trail ", None]
    for cfg in (IndexConfig(), IndexConfig(max_token_length=4),
                IndexConfig(stem="porter"), IndexConfig(fold_ascii=True),
                IndexConfig(stem="porter", fold_ascii=True),
                IndexConfig(stopwords="none")):
        got = analyze_series(pd.Series(texts), cfg).tolist()
        want = [analyze_text(t, cfg) for t in texts]
        assert got == want, cfg


def test_protected_words_keyword_marker(spark):
    """KeywordMarkerFilter role (protwords.txt): protected tokens bypass the
    stemmer in BOTH the scalar and the Arrow batch analyzer; possessive strip
    still applies; config_hash changes so indexes don't alias."""
    import pandas as pd

    from solr_spark.analysis.analyzer import analyze_series, analyze_text
    from solr_spark.config import IndexConfig

    cfg = IndexConfig(stem="porter", protected_words=("running", "foxes"))
    plain = IndexConfig(stem="porter")
    text = "The running foxes's jumping"
    assert analyze_text(text, cfg) == ["running", "foxes", "jump"]
    assert analyze_text(text, plain) == ["run", "fox", "jump"]
    got = analyze_series(pd.Series([text]), cfg)[0]
    assert list(got) == ["running", "foxes", "jump"]
    assert cfg.config_hash() != plain.config_hash()


WD_CASES = [
    ("PowerShot SD500", ["power", "shot", "sd", "500"]),
    ("USAToday", ["usa", "today"]),
    ("wi-fi", ["wi", "fi"]),
    ("O'Neil's car", ["o", "neil", "car"]),
    ("it's 3.14", ["3", "14"]),  # possessive strip, then "it" stop-filtered
    ("Customer#000000123", ["customer", "000000123"]),
    ("SegBUILDING v2.1-beta", ["seg", "building", "v", "2", "1", "beta"]),
    ("ABCd eFGh", ["ab", "cd", "e", "f", "gh"]),
    ("500X2", ["500", "x", "2"]),
    ("café-Bar’s", ["café", "bar"]),
    ("the And of", []),                      # stop filter composes after lowering
    ("", []),
]


@pytest.mark.parametrize("raw,expected", WD_CASES)
def test_word_delimiter_vectors(raw, expected):
    """WordDelimiterGraphFilter role (text_en_splitting chain): possessive
    strip, acronym/camelCase/letter-digit boundaries, delimiter splits —
    pinned vectors match Lucene's documented generate-parts behavior."""
    cfg = IndexConfig(word_delimiter=True)
    assert analyze_text(raw, cfg) == expected


def test_word_delimiter_three_engine_parity(spark):
    """Scalar, Arrow-batch, pure-JVM Column, and DuckDB-SQL word-delimiter
    pipelines must all emit identical tokens (the full-hash gate contract)."""
    import duckdb

    from solr_spark.analysis.analyzer import tokenize_column, word_delimiter_sql

    texts = [raw for raw, _ in WD_CASES] + [
        "X-23b McKinley", "mixedUPPERlower", "a1b2c3", "trailing's",
        "The QUICK brown-fox!", "tabs\tand\nnewlines", "double  space",
    ]
    cfg = IndexConfig(word_delimiter=True)
    want = [analyze_text(t, cfg) for t in texts]
    assert analyze_series(pd.Series(texts), cfg).tolist() == want
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    jvm = [r[0] for r in df.select(tokenize_column("text", cfg)).collect()]
    assert jvm == want
    stops = ", ".join(f"'{s}'" for s in sorted(ENGLISH_STOPWORDS))
    sql = word_delimiter_sql("t")
    duck = [r[0] for r in duckdb.connect().execute(
        f"SELECT list_filter(string_split({sql}, ' '), "
        f"x -> x <> '' AND x NOT IN ({stops})) "
        f"FROM (SELECT unnest(?) AS t)", [texts]).fetchall()]
    assert duck == want


def test_word_delimiter_stem_and_fold_compose():
    """wd + porter (text_en_splitting's tail) and wd + fold run in chain
    order fold -> wd -> lower -> stop -> stem; config_hash distinguishes."""
    cfg = IndexConfig(word_delimiter=True, stem="porter")
    assert analyze_text("FastRunning foxes's", cfg) == ["fast", "run", "fox"]
    fold = IndexConfig(word_delimiter=True, fold_ascii=True)
    assert analyze_text("CaféBar", fold) == ["cafe", "bar"]
    assert cfg.config_hash() != fold.config_hash() != IndexConfig().config_hash()
    got = analyze_series(pd.Series(["FastRunning foxes's"]), cfg)[0]
    assert list(got) == ["fast", "run", "fox"]


HTML_CASES = [
    ('<div class="x"><b>hello</b> world</div>', ["hello", "world"]),
    ('Tom &amp; Jerry &lt;3 &quot;quoted&quot;', ["tom", "jerry", "3", "quoted"]),
    ('<script>var x=1;</script>keep <!-- gone --> here', ["keep", "here"]),
    ('<STYLE type="a">h1{color:red}</STYLE>after', ["after"]),
    ("a&#169;b &amp;lt; stays", ["b", "lt", "stays"]),  # single-pass decode
    ("<p>Line</p><p>Two</p>", ["line", "two"]),
    ("no markup here", ["markup", "here"]),
]


@pytest.mark.parametrize("raw,expected", HTML_CASES)
def test_html_strip_char_filter(raw, expected):
    """HTMLStripCharFilter role: tags/comments/script/style become separators,
    common entities decode exactly once."""
    assert analyze_text(raw, IndexConfig(html_strip=True)) == expected


def test_char_filters_three_engine_parity(spark):
    """Char-filter stage parity: scalar, Arrow-batch, JVM Column, DuckDB SQL
    agree on html_strip and a \\N-backref pattern_replace chain."""
    import duckdb

    from solr_spark.analysis.analyzer import char_filters_sql, tokenize_column

    simple_texts = ["call 555-1234 now #tag", "a-1 2-b", None, ""]
    for cfg, texts in (
            (IndexConfig(html_strip=True),
             [raw for raw, _ in HTML_CASES] + simple_texts),
            # pattern_replace alone: joiner-free inputs only, because the
            # test's punctuation-split DuckDB stand-in can't mimic the UAX
            # ':'/'.' mid-token joiners ("color:red") that survive unstripped
            (IndexConfig(pattern_replace=((r"(\d+)-(\d+)", r"\1\2"),
                                          (r"#\w+", " "))),
             simple_texts)):
        want = [analyze_text(t, cfg) if t else [] for t in texts]
        got = analyze_series(pd.Series(texts), cfg).tolist()
        assert [list(x) for x in got] == want, cfg
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        jvm = [r[0] for r in df.select(
            tokenize_column("text", cfg)).collect()]
        assert [x if x is not None else [] for x in jvm] == want, cfg
        # DuckDB twin of the char-filter stage only (tokenizer twins are
        # gate-specific); ASCII punctuation-split equivalence holds here
        stops = ", ".join(f"'{s}'" for s in sorted(ENGLISH_STOPWORDS))
        sql = char_filters_sql("t", cfg)
        duck = [r[0] for r in duckdb.connect().execute(
            f"""SELECT list_filter(
                   string_split(regexp_replace(lower({sql}),
                                '[^a-z0-9]+', ' ', 'g'), ' '),
                   x -> x <> '' AND x NOT IN ({stops}))
                FROM (SELECT unnest(?) AS t)""", [texts]).fetchall()]
        assert [x if x is not None else [] for x in duck] == want, cfg


def test_char_filters_compose_with_wd_and_config_roundtrip():
    """Chain order charfilters -> tokenizer(+wd); pattern_replace survives the
    JSON list round-trip (stats.json contract)."""
    cfg = IndexConfig(html_strip=True, word_delimiter=True)
    assert analyze_text("<b>PowerShot</b> SD500", cfg) == \
        ["power", "shot", "sd", "500"]
    import dataclasses
    import json

    d = json.loads(json.dumps(dataclasses.asdict(
        IndexConfig(pattern_replace=(("x", "y"),)))))
    rt = IndexConfig(**d)
    assert rt == IndexConfig(pattern_replace=(("x", "y"),))
    assert rt.config_hash() == IndexConfig(pattern_replace=(("x", "y"),)).config_hash()


def test_analyze_stages_debug_surface():
    """FieldAnalysisRequestHandler.java:55 — per-stage token stream; last
    stage always equals analyze_text."""
    from solr_spark.analysis.analyzer import analyze_stages, analyze_text
    from solr_spark.config import IndexConfig

    cfg = IndexConfig(stem="porter")
    st = analyze_stages("The Quick-Running FOXES jumped", cfg)
    names = [n for n, _ in st]
    assert names[0] == "input" and names[-1] == "tokens"
    assert "tokenizer" in names and "stopFilter" in names
    assert "tokenFilter" in names  # porter stage present
    stages = dict(st)
    # stop filter drops 'the'; stemmer maps foxes->fox AFTER stop filtering
    assert "the" in stages["tokenizer"]
    assert "the" not in stages["stopFilter"]
    assert "fox" in stages["tokenFilter"]
    assert st[-1][1] == analyze_text("The Quick-Running FOXES jumped", cfg)

    # char-filter stage appears only when configured
    cfg2 = IndexConfig(html_strip=True)
    st2 = dict(analyze_stages("<b>error</b> timeout", cfg2))
    assert "charFilters" in st2 and "<b>" not in st2["charFilters"]
    assert "charFilters" not in dict(analyze_stages("error", IndexConfig()))

    # empty / None inputs
    assert analyze_stages("", cfg)[-1] == ("tokens", [])
    assert analyze_stages(None, cfg)[-1] == ("tokens", [])
