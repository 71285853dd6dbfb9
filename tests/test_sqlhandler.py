"""Solr Parallel SQL dialect (query/sqlhandler.py) — the /sql handler role.

Reference semantics: solr-ref-guide sql-query.adoc (operator table, OFFSET/
FETCH, implicit GROUP BY limit) and modules/sql TestSQLHandler.java.
"""

import pytest
from pyspark.sql import functions as F

from solr_spark.query import solr_sql


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "error timeout in worker", "en", "web", 100),
        (2, "all good here", "en", "web", 250),
        (3, "timeout while parsing", "en", "code", 300),
        (4, "fehler beim parsen", "de", "web", 150),
        (5, "network error detected", "en", "code", None),
        (6, "daylight saving change", "fr", "web", 450),
        (7, "days of error handling", "en", "web", 500),
    ]
    return spark.createDataFrame(
        rows, "id int, text string, lang string, source string, n int")


def test_select_where_order_limit(docs):
    out = solr_sql(
        docs,
        "SELECT id AS i, lang FROM docs "
        "WHERE n >= 150 AND lang = 'en' ORDER BY n DESC, i ASC LIMIT 2",
        table="docs")
    assert [r["i"] for r in out.collect()] == [7, 3]
    assert out.columns == ["i", "lang"]


def test_text_field_search_semantics(docs):
    tf = {"text"}
    # phrase search on a text field
    got = solr_sql(docs, "SELECT id FROM docs WHERE text = 'error timeout'",
                   text_fields=tf)
    assert [r["id"] for r in got.collect()] == [1]
    # parens inject raw Solr syntax (OR of terms), scoped to the field
    got = solr_sql(docs,
                   "SELECT id FROM docs WHERE text = '(timeout parsing)' "
                   "ORDER BY id ASC", text_fields=tf)
    assert [r["id"] for r in got.collect()] == [3]
    got = solr_sql(docs,
                   "SELECT id FROM docs WHERE text = '(timeout OR fehler)' "
                   "ORDER BY id ASC", text_fields=tf)
    assert [r["id"] for r in got.collect()] == [1, 3, 4]
    # range-syntax string value
    got = solr_sql(docs, "SELECT id FROM docs WHERE n = '[400 TO *]' "
                   "ORDER BY id ASC", text_fields=tf)
    assert [r["id"] for r in got.collect()] == [6, 7]


def test_operator_table(docs):
    q = lambda w: sorted(
        r["id"] for r in
        solr_sql(docs, f"SELECT id FROM docs WHERE {w}",
                 text_fields={"text"}).collect())
    assert q("lang <> 'en'") == [4, 6]
    assert q("n > 300") == [6, 7]
    assert q("n BETWEEN 150 AND 300") == [2, 3, 4]
    assert q("n NOT BETWEEN 150 AND 300") == [1, 6, 7]
    assert q("lang IN ('de', 'fr')") == [4, 6]
    assert q("lang NOT IN ('de', 'fr')") == [1, 2, 3, 5, 7]
    assert q("n IS NULL") == [5]
    assert q("n IS NOT NULL") == [1, 2, 3, 4, 6, 7]
    # LIKE with % -> wildcard on text fields; plain LIKE on stored strings
    assert q("text LIKE 'day%'") == [6, 7]
    assert q("source LIKE 'co%'") == [3, 5]
    assert q("(lang = 'de') OR (source = 'code' AND n > 200)") == [3, 4]
    assert q("(lang = 'en') AND NOT (source = 'code')") == [1, 2, 7]


def test_group_by_having(docs):
    out = solr_sql(
        docs,
        "SELECT lang, COUNT(*) AS cnt, SUM(n) AS total, MIN(n) AS lo "
        "FROM docs GROUP BY lang HAVING COUNT(*) > 1 "
        "ORDER BY cnt DESC, lang ASC")
    rows = [(r["lang"], r["cnt"], r["total"], r["lo"]) for r in out.collect()]
    assert rows == [("en", 5, 1150, 100)]
    # HAVING by alias
    out = solr_sql(docs, "SELECT lang, COUNT(*) AS cnt FROM docs "
                   "GROUP BY lang HAVING cnt = 1 ORDER BY lang ASC")
    assert [r["lang"] for r in out.collect()] == ["de", "fr"]


def test_group_by_implicit_limit_rule(docs, spark):
    big = spark.range(500).select(
        F.col("id").alias("k"), F.lit(1).alias("v"))
    # ORDER BY on an aggregate alias -> implicit LIMIT 100
    out = solr_sql(big, "SELECT k, COUNT(*) AS c FROM t "
                   "GROUP BY k ORDER BY c DESC, k ASC")
    assert out.count() == 100
    # ORDER BY exactly the GROUP BY fields -> no implicit limit
    out = solr_sql(big, "SELECT k, COUNT(*) AS c FROM t "
                   "GROUP BY k ORDER BY k ASC")
    assert out.count() == 500


def test_distinct_and_aggregate_no_group(docs):
    out = solr_sql(docs, "SELECT DISTINCT lang, source FROM docs "
                   "ORDER BY lang ASC, source ASC")
    assert [(r["lang"], r["source"]) for r in out.collect()] == [
        ("de", "web"), ("en", "code"), ("en", "web"), ("fr", "web")]
    row = solr_sql(
        docs,
        "SELECT COUNT(*) AS c, COUNT(DISTINCT lang) AS langs, "
        "AVG(n) AS m FROM docs").first()
    assert (row["c"], row["langs"]) == (7, 3)
    assert abs(row["m"] - 1750 / 6) < 1e-9


def test_offset_fetch_paging(docs):
    out = solr_sql(docs, "SELECT id FROM docs WHERE lang = 'en' "
                   "ORDER BY id ASC OFFSET 2 FETCH NEXT 2 ROWS ONLY")
    assert [r["id"] for r in out.collect()] == [3, 5]
    with pytest.raises(ValueError, match="OFFSET without FETCH"):
        solr_sql(docs, "SELECT id FROM docs ORDER BY id ASC OFFSET 2")


def test_reserved_word_escaping_and_errors(docs, spark):
    esc = spark.createDataFrame([(1, 2020)], "id int, `year` int")
    out = solr_sql(esc, 'SELECT "year" FROM t WHERE "year" = 2020')
    assert out.collect()[0]["year"] == 2020
    out = solr_sql(esc, "SELECT `year` FROM t")
    assert out.columns == ["year"]
    with pytest.raises(ValueError, match="unknown table"):
        solr_sql(docs, "SELECT id FROM wrong", table="docs")
    with pytest.raises(ValueError, match="score requires"):
        solr_sql(docs, "SELECT id, score FROM docs LIMIT 5")
    with pytest.raises(ValueError, match="field on one side"):
        solr_sql(docs, "SELECT id FROM docs WHERE 5 < 10")
    with pytest.raises(ValueError, match="GROUP BY"):
        solr_sql(docs, "SELECT lang, source, COUNT(*) AS c FROM docs "
                 "GROUP BY lang")
    with pytest.raises(ValueError, match="ORDER BY unknown column"):
        solr_sql(docs, "SELECT id FROM docs ORDER BY nope ASC")


def test_where_pushed_to_scan(docs, tmp_path):
    docs.write.mode("overwrite").parquet(str(tmp_path / "docs"))
    df = docs.sparkSession.read.parquet(str(tmp_path / "docs"))
    out = solr_sql(df, "SELECT id FROM docs WHERE n > 300 AND lang = 'en'")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(n,300)" in plan


@pytest.fixture(scope="module")
def sql_index(spark, tmp_path_factory):
    from solr_spark.config import IndexConfig
    from solr_spark.data import synth_transcripts_spark
    from solr_spark.indexing import build_index
    from solr_spark.query import IndexReader

    idx = str(tmp_path_factory.mktemp("sql_idx"))
    cfg = IndexConfig(range_shift=9, num_term_buckets=16)
    corpus = synth_transcripts_spark(spark, 1500, seed=13)
    build_index(spark, corpus, idx, cfg, input_token="sqlsearch-1500",
                stored_cols=("role", "tool"))
    return IndexReader.open(idx, cfg)


def test_scored_sql_matches_json_search(spark, sql_index):
    """solr_sql_search = limited /sql query with score: same ranks/scores as
    the json_search body it compiles to (q + fq flow)."""
    from solr_spark.query import json_search, solr_sql_search

    out = solr_sql_search(
        spark, sql_index,
        "SELECT conv_id, turn_idx, score FROM transcripts "
        "WHERE text = '(error timeout)' AND role = 'assistant' "
        "ORDER BY score DESC LIMIT 8")
    ref = json_search(spark, sql_index,
                      {"query": "error timeout", "filter": ["role:assistant"],
                       "limit": 8,
                       "fields": ["conv_id", "turn_idx", "score"]})
    assert [tuple(r) for r in out.collect()] == \
           [tuple(r) for r in ref.collect()]
    # phrase form and paging
    page = solr_sql_search(
        spark, sql_index,
        "SELECT docid, score FROM transcripts WHERE text = '(error timeout)' "
        "ORDER BY score DESC OFFSET 3 FETCH NEXT 3 ROWS ONLY")
    full = solr_sql_search(
        spark, sql_index,
        "SELECT docid, score FROM transcripts "
        "WHERE text = '(error timeout)' LIMIT 6")
    assert [r["docid"] for r in page.collect()] == \
           [r["docid"] for r in full.collect()][3:]


def test_scored_sql_operator_rendering(spark, sql_index):
    """Attr conjuncts render to fq strings per the operator table; every hit
    satisfies them."""
    from solr_spark.query import solr_sql_search

    out = solr_sql_search(
        spark, sql_index,
        "SELECT docid, role, score FROM transcripts "
        "WHERE text = '(error timeout)' AND role IN ('assistant', 'user') "
        "AND turn_idx >= 2 LIMIT 10")
    rows = out.collect()
    assert rows and all(r["role"] in ("assistant", "user") for r in rows)


def test_scored_sql_guards(spark, sql_index):
    from solr_spark.query import solr_sql_search

    with pytest.raises(ValueError, match="requires LIMIT"):
        solr_sql_search(spark, sql_index,
                        "SELECT docid, score FROM t WHERE text = 'error'")
    with pytest.raises(ValueError, match="exactly one text-field"):
        solr_sql_search(spark, sql_index,
                        "SELECT docid FROM t WHERE role = 'user' LIMIT 5")
    with pytest.raises(ValueError, match="ORDER BY score DESC"):
        solr_sql_search(spark, sql_index,
                        "SELECT docid, score FROM t WHERE text = 'error' "
                        "ORDER BY score ASC LIMIT 5")
    with pytest.raises(ValueError, match="plain SELECT"):
        solr_sql_search(spark, sql_index,
                        "SELECT role, COUNT(*) AS c FROM t "
                        "WHERE text = 'error' GROUP BY role LIMIT 5")


def test_sql_parser_never_crashes_unstructured(spark, docs):
    """Property: arbitrary token soup either parses to a plan or raises
    ValueError — never an unhandled exception type (the handler's error
    contract)."""
    import random

    from solr_spark.query.sqlhandler import solr_sql

    rng = random.Random(42)
    words = ["SELECT", "FROM", "WHERE", "ORDER", "BY", "GROUP", "LIMIT",
             "id", "lang", "docs", "COUNT", "(", ")", "*", ",", "=", "<>",
             "'en'", "10", "AND", "OR", "NOT", "IN", "LIKE", "ASC", "DESC",
             "AS", "HAVING", "BETWEEN", "IS", "NULL", "OFFSET", "FETCH"]
    crashes = 0
    for _ in range(400):
        stmt = " ".join(rng.choice(words)
                        for _ in range(rng.randint(1, 14)))
        try:
            solr_sql(docs, stmt, text_fields={"text"})
        except ValueError:
            pass
        except Exception as e:  # noqa: BLE001 — the property under test
            # Catalyst analysis errors are acceptable only as ValueError;
            # count anything else as a crash
            crashes += 1
            if crashes == 1:
                first = (stmt, type(e).__name__, str(e)[:120])
    assert crashes == 0, first
