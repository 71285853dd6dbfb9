"""Operator-surface tests: query parser, facets, windows, streams.

Mirrors the reference's fixture-driven operator tests (SURVEY.md §5 — e.g.
TestJsonFacets request→expected-bucket assertions) at pytest scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_spark.operators import facets, streams, windows
from solr_spark.query.parser import parse_query


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        (1, "alice", "eng", 100.0, "error timeout in worker"),
        (2, "bob", "eng", 250.0, "all good"),
        (3, "carol", "ops", 50.0, "timeout again"),
        (4, "dave", "ops", 300.0, "v2.1.0 released"),
        (5, "erin", "sales", 120.0, None),
        (6, "frank", "sales", 120.0, "error error error"),
    ]
    return spark.createDataFrame(
        rows, "id int, name string, dept string, amount double, note string"
    )


# ----------------------------------------------------------------- parser

def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_parser_term_and_range(people):
    assert _ids(people.where(parse_query("dept:eng", "name"))) == [1, 2]
    assert _ids(people.where(parse_query("amount:[100 TO 250]", "name"))) == [1, 2, 5, 6]
    assert _ids(people.where(parse_query("amount:{100 TO 300}", "name"))) == [2, 5, 6]
    assert _ids(people.where(parse_query("amount:[250 TO *]", "name"))) == [2, 4]


def test_parser_boolean(people):
    assert _ids(people.where(parse_query("dept:eng OR dept:ops", "name"))) == [1, 2, 3, 4]
    assert _ids(people.where(parse_query("dept:eng AND amount:[200 TO *]", "name"))) == [2]
    assert _ids(people.where(parse_query("dept:sales NOT amount:120", "name"))) == []
    assert _ids(people.where(parse_query("(dept:eng OR dept:ops) AND amount:[100 TO *]",
                                         "name"))) == [1, 2, 4]
    # implicit AND
    assert _ids(people.where(parse_query("dept:ops amount:300", "name"))) == [4]


def test_parser_wildcard_fuzzy_phrase(people):
    assert _ids(people.where(parse_query("name:a*", "name"))) == [1]
    assert _ids(people.where(parse_query("name:?ob", "name"))) == [2]
    assert _ids(people.where(parse_query("name:alice~1", "name"))) == [1]
    # text-field term → word-boundary match
    assert _ids(people.where(parse_query("note:timeout", "name", {"note"}))) == [1, 3]
    assert _ids(people.where(parse_query('note:"error timeout"', "name",
                                         {"note"}))) == [1]
    assert _ids(people.where(parse_query("name:/(al|bo).*/", "name"))) == [1, 2]


def test_parser_rejects_garbage():
    with pytest.raises(ValueError):
        parse_query("dept:eng AND (unclosed", "name")


# ----------------------------------------------------------------- facets

def test_terms_facet(people):
    out = {r["bucket"]: r["count"] for r in
           facets.terms_facet(people, "dept", limit=2).collect()}
    assert out == {"eng": 2, "ops": 2}  # sales ties broken alphabetically


def test_range_and_query_facet(people):
    rf = {r["bucket_start"]: r["count"] for r in
          facets.range_facet(people, "amount", 0.0, 100.0).collect()}
    assert rf == {0.0: 1, 100.0: 3, 200.0: 1, 300.0: 1}
    qf = {r["bucket"]: r["count"] for r in facets.query_facet(people, {
        "big": F.col("amount") >= 200, "eng": F.col("dept") == "eng"}).collect()}
    assert qf == {"big": 2, "eng": 2}


def test_stats_component(people):
    row = facets.stats_component(people, "amount").collect()[0]
    assert row["min"] == 50.0 and row["max"] == 300.0
    assert row["count"] == 6 and row["missing"] == 0
    assert row["sum"] == 940.0


def test_pivot_and_nested(people):
    piv = facets.pivot_facet(people, ["dept", "amount"]).collect()
    assert len(piv) == 5  # sales has one (amount) bucket shared by 2 rows
    assert {(r["dept"], r["amount"], r["count"]) for r in piv} >= {("sales", 120.0, 2)}


# ----------------------------------------------------------------- windows

def test_collapse_and_expand(people):
    heads = windows.collapse(people, "dept", [F.desc("amount"), F.asc("id")])
    assert _ids(heads) == [2, 4, 5]
    rest = windows.expand(people, "dept", [F.desc("amount"), F.asc("id")], 1)
    assert _ids(rest) == [1, 3, 6]


def test_group_top_n(people):
    out = windows.group_top_n(people, "dept", [F.desc("amount"), F.asc("id")], 1)
    assert _ids(out) == [2, 4, 5]
    assert all(r["group_rank"] == 1 for r in out.collect())


def test_cursor_page(people):
    p1 = windows.cursor_page(people, ["amount", "id"], None, 2).collect()
    assert [r["id"] for r in p1] == [3, 1]
    p2 = windows.cursor_page(people, ["amount", "id"],
                             [p1[-1]["amount"], p1[-1]["id"]], 2).collect()
    assert [r["id"] for r in p2] == [5, 6]
    p3 = windows.cursor_page(people, ["amount", "id"],
                             [p2[-1]["amount"], p2[-1]["id"]], 2).collect()
    assert [r["id"] for r in p3] == [2, 4]


def test_elevate(people):
    out = windows.elevate(people, "id", [6, 3], [2], [F.desc("amount")], 4).collect()
    assert [r["id"] for r in out] == [6, 3, 4, 5]


# ----------------------------------------------------------------- streams

def test_set_ops(spark, people):
    eng = people.where("dept = 'eng'").select("id")
    rich = people.where("amount >= 200").select("id")
    assert _ids(streams.intersect(people, rich, ["id"])) == [2, 4]
    assert _ids(streams.complement(people, eng, ["id"])) == [3, 4, 5, 6]
    assert streams.merge(eng, rich).count() == 4


def test_unique_first_wins(spark):
    df = spark.createDataFrame(
        [(1, "b", 10), (1, "a", 20), (2, "c", 30)], "k int, s string, v int")
    out = streams.unique(df, ["k"], sort=["s"]).collect()
    got = {r["k"]: r["v"] for r in out}
    assert got == {1: 20, 2: 30}


def test_top_and_select(people):
    out = streams.top(people, 2, [F.desc("amount"), F.asc("id")]).collect()
    assert [r["id"] for r in out] == [4, 2]
    sel = streams.select_stream(people, {"who": F.col("name"),
                                         "double_amt": F.col("amount") * 2})
    assert sel.columns == ["who", "double_amt"]


def test_significant_terms(spark):
    rows = [(i, "fg" if i < 2 else "bg", "rare common") if i < 2
            else (i, "bg", "common") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id int, grp string, text string")
    pairs = df.select("doc_id", "grp", F.explode(F.split("text", " ")).alias("term"))
    out = {r["term"]: r for r in streams.significant_terms(
        pairs, F.col("grp") == "fg", doc_col="doc_id").collect()}
    assert out["rare"]["fg"] == 2 and out["rare"]["bg"] == 2
    assert out["rare"]["score"] == 5.0     # (2/2)/(2/10)
    assert out["common"]["score"] == 1.0   # present everywhere


def test_more_like_this(spark):
    rows = [(0, "apple banana cherry"), (1, "apple banana date"),
            (2, "apple elderberry"), (3, "fig grape")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    pairs = df.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    out = streams.more_like_this(pairs, 0, 4, doc_col="doc_id", k=3).collect()
    assert out[0]["doc_id"] == 1 and out[0]["n_shared"] == 2
    assert {r["doc_id"] for r in out} == {1, 2}  # doc 3 shares nothing


def test_relatedness_metric(spark):
    from pyspark.sql import functions as F

    from solr_spark.operators import facets

    df = spark.createDataFrame(
        [("x", 1)] * 6 + [("x", 0)] * 2 + [("y", 1)] * 1 + [("y", 0)] * 7,
        "bucket string, fg int")
    out = {r["bucket"]: r for r in
           facets.relatedness(df, "bucket", F.col("fg") == 1).collect()}
    # fg sizes: x=6, y=1 (fg_size 7); bg: x=8, y=8 (bg_size 16)
    assert out["x"]["fg_count"] == 6 and out["x"]["bg_count"] == 8
    fgx, bgx = 6 / 7, 8 / 16
    assert abs(out["x"]["relatedness"] - round((fgx - bgx) / (fgx + bgx), 6)) < 1e-9
    assert out["y"]["relatedness"] < 0  # under-represented in foreground

    none = spark.createDataFrame([("z", 0)], "bucket string, fg int")
    z = facets.relatedness(none, "bucket", F.col("fg") == 1).collect()[0]
    assert z["relatedness"] == -1.0  # empty foreground pins to -1


def test_parser_boost_and_slop_suffixes(spark):
    """`term^2` / `"a b"~2^3` lex cleanly; boosts are no-ops in filter context
    (the reference ignores boosts on fq predicates)."""
    from solr_spark.query.parser import parse_query

    df = spark.createDataFrame(
        [(1, "fatal error in merge", "open"), (2, "all good", "closed")],
        "id int, msg string, status string")
    pred = parse_query('status:open^2 AND msg:error^1.5', "msg", {"msg"})
    assert [r.id for r in df.where(pred).collect()] == [1]
    pred2 = parse_query('msg:"fatal error"~2^3', "msg", {"msg"})
    assert [r.id for r in df.where(pred2).collect()] == [1]


def test_scored_join_modes(spark):
    """{!join score=...}: aggregated inner score per key; semi-join semantics."""
    import pytest as _pytest

    from solr_spark.operators import scored_join

    outer = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    inner = spark.createDataFrame(
        [(1, 10.0), (1, 4.0), (2, 6.0)], "fk int, score double")
    got = {m: {r.k: r.score for r in
               scored_join(outer, inner, "k", "fk", mode=m).collect()}
           for m in ("max", "min", "avg", "total")}
    assert got["max"] == {1: 10.0, 2: 6.0}
    assert got["min"] == {1: 4.0, 2: 6.0}
    assert got["avg"] == {1: 7.0, 2: 6.0}
    assert got["total"] == {1: 14.0, 2: 6.0}
    with _pytest.raises(ValueError, match="unknown score mode"):
        scored_join(outer, inner, "k", "fk", mode="sum")


def test_payload_score_and_check(spark):
    """Delimited-payload queries (PayloadScore/PayloadCheckQParserPlugin)."""
    import pytest as _pytest

    from solr_spark.functions.payloads import (
        payload_check,
        payload_score,
        with_payloads,
    )

    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "b c"), (3, "")], "id int, text string") \
        .withColumn("ptext", with_payloads("text"))
    row = df.where(F.col("id") == 1).select(
        payload_score("ptext", "a", func="min").alias("mn"),
        payload_score("ptext", "a", func="max").alias("mx"),
        payload_score("ptext", "a", func="sum").alias("sm"),
        payload_score("ptext", "a", func="average").alias("av"),
        payload_score("ptext", "a", func="first").alias("fs"),
        payload_score("ptext", "zzz", func="max").alias("absent"),
    ).head()
    assert (row.mn, row.mx, row.sm, row.av, row.fs) == (0.0, 2.0, 2.0, 1.0, 0.0)
    assert row.absent is None
    got = {r.id for r in df.where(payload_check("ptext", "b", 1.0)).collect()}
    assert got == {1}  # doc 2 has b at position 0, doc 1 at position 1
    with _pytest.raises(ValueError, match="unknown payload func"):
        payload_score("ptext", "a", func="median")


def test_hll_metric_within_error_bounds(spark):
    """approx_count_distinct (the hll facet metric) stays within the HLL++
    relative-error bound of the exact distinct count."""
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    approx = {r.event_type: r.hll for r in
              ev.groupBy("event_type")
                .agg(F.approx_count_distinct("user_id", 0.02).alias("hll"))
                .collect()}
    exact = {r.event_type: r.d for r in
             ev.groupBy("event_type")
               .agg(F.count_distinct("user_id").alias("d")).collect()}
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(2, 0.05 * exact[k]), \
            (k, approx[k], exact[k])


def test_context_window(spark):
    from pyspark.sql import functions as F

    from solr_spark.operators.windows import context_window

    rows = [("c1", i, "hit" if i == 3 else "x") for i in range(6)] + \
           [("c2", 0, "x"), ("c2", 1, "x")]
    df = spark.createDataFrame(rows, "conv string, idx int, txt string")
    out = context_window(df, F.col("txt") == "hit", ["conv"], ["idx"],
                         before=1, after=2).collect()
    got = sorted((r["conv"], r["idx"], r["is_match"], r["is_context"]) for r in out)
    assert got == [("c1", 2, False, True), ("c1", 3, True, False),
                   ("c1", 4, False, True), ("c1", 5, False, True)]


def test_facet_domain_exclude_tags(spark):
    from pyspark.sql import functions as F

    from solr_spark.operators.facets import facet_domain, to_children, to_parents

    base = spark.createDataFrame(
        [(1, "a", 1), (2, "a", 2), (3, "b", 1)], "id int, cat string, pr int")
    tagged = {"cat": F.col("cat") == "a", "pr": F.col("pr") == 1}
    assert facet_domain(base, tagged).count() == 1
    assert {r["id"] for r in facet_domain(base, tagged, ["pr"]).collect()} == {1, 2}
    assert {r["id"] for r in facet_domain(base, tagged, ["cat", "pr"]).collect()} == {1, 2, 3}

    kids = spark.createDataFrame([(1, 10), (1, 11), (3, 12)], "id int, kid int")
    dom = facet_domain(base, tagged, ["pr"])  # ids {1,2}
    assert {r["kid"] for r in to_children(dom, kids, "id").collect()} == {10, 11}
    assert {r["id"] for r in to_parents(kids, base, "id").collect()} == {1, 3}


def test_enum_terms(spark, tmp_path):
    from solr_spark.config import IndexConfig
    from solr_spark.indexing import build_index
    from solr_spark.operators.components import enum_terms

    rows = [("c%d" % i, 0, t) for i, t in enumerate(
        ["scan scan sort", "sort stream", "stream scan", "spark small"])]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    idx = str(tmp_path / "enum_idx")
    build_index(spark, df, idx, IndexConfig(range_shift=9, num_term_buckets=4),
                input_token="t")
    out = enum_terms(spark, idx, regex="^s", min_df=2, k=10).collect()
    assert [(r["term"], r["df"]) for r in out] == \
        [("scan", 2), ("sort", 2), ("stream", 2)]
    out2 = enum_terms(spark, idx, lower="so", upper="st", sort_by_df=False, k=10)
    assert [r["term"] for r in out2.collect()] == ["sort", "spark"]


def test_score_nodes(spark):
    import math

    from pyspark.sql import functions as F

    from solr_spark.operators.graph import score_nodes

    hits = spark.createDataFrame([("a", 2), ("b", 1)], "node string, count long")
    edges = spark.createDataFrame(
        [("a",)] * 4 + [("b",)] * 1 + [("c",)] * 5, "dst string")
    out = {r["node"]: r["score"] for r in score_nodes(hits, edges, "dst").collect()}
    assert abs(out["a"] - 2 * math.log1p(10 / 4)) < 1e-12
    assert abs(out["b"] - 1 * math.log1p(10 / 1)) < 1e-12
    # selective node 'b' outscores hub-ish 'a' per unit count
    assert out["b"] > out["a"] / 2


def test_cluster_by_dominant_term(spark):
    from solr_spark.operators.clustering import (cluster_by_dominant_term,
                                                 cluster_sizes)

    rows = [(1, "spark spark merge"), (2, "merge merge window"),
            (3, "spark window window"), (4, "")]
    df = spark.createDataFrame(rows, "docid long, toks string")
    got = {r["docid"]: r["cluster"]
           for r in cluster_by_dominant_term(df).collect()}
    # tf breaks toward the repeated term; empty doc gets no cluster row
    assert got == {1: "spark", 2: "merge", 3: "window"}
    sizes = cluster_sizes(cluster_by_dominant_term(df)).collect()
    assert [(r["cluster"], r["size"]) for r in sizes] == \
        [("merge", 1), ("spark", 1), ("window", 1)]


def test_collapse_null_policy(spark):
    from solr_spark.operators.windows import collapse

    rows = [(0, "a", 5), (1, "a", 9), (2, None, 3), (3, None, 7), (4, "b", 1)]
    df = spark.createDataFrame(rows, "id int, grp string, score int")
    sort = [F.desc("score"), F.asc("id")]
    ign = sorted(r["id"] for r in collapse(df, "grp", sort).collect())
    assert ign == [1, 4]                      # nulls dropped
    exp = sorted(r["id"] for r in
                 collapse(df, "grp", sort, null_policy="expand").collect())
    assert exp == [1, 2, 3, 4]                # every null survives
    col = sorted(r["id"] for r in
                 collapse(df, "grp", sort, null_policy="collapse").collect())
    assert col == [1, 3, 4]                   # one head for the null group
    import pytest as _pytest
    with _pytest.raises(ValueError, match="nullPolicy"):
        collapse(df, "grp", sort, null_policy="bogus")


def test_ltr_log_features(spark):
    from solr_spark.operators.ltr import (
        linear_model_score,
        log_features,
        ltr_rerank,
    )

    rows = [(1, 10.0, 2.0), (2, 5.0, 8.0), (3, 1.0, 1.0)]
    hits = (spark.createDataFrame(rows,
                                  "doc int, recency double, clicks double")
            .withColumn("score", F.col("recency")))
    feats = {"recency": F.col("recency") / 10.0, "clicks": "clicks"}
    logged = log_features(hits, feats).collect()
    got = {r["doc"]: r["features"] for r in logged}
    assert got[1]["recency"] == 1.0 and got[1]["clicks"] == 2.0
    dense = log_features(hits, feats, fmt="dense", out_col="fv") \
        .where(F.col("doc") == 2).head()["fv"]
    assert dense == "recency=0.5,clicks=8.0"
    # training/serving share the same mapping: the logged features reproduce
    # the serving-side model score exactly
    w = {"recency": 2.0, "clicks": 0.25}
    # ReRank adds the model to the first-pass score (rerank() contract)
    score = {r["doc"]: r["recency"] + 2.0 * r["features"]["recency"]
             + 0.25 * r["features"]["clicks"] for r in logged}
    served = ltr_rerank(hits, feats, w, rerank_docs=3,
                        first_sort=[F.desc("recency")]).collect()
    got_order = [r["doc"] for r in
                 sorted(served, key=lambda r: (-r["new_score"], r["doc"]))]
    assert got_order == sorted(score, key=lambda d: (-score[d], d))
    for r in served:
        assert abs(r["new_score"] - score[r["doc"]]) < 1e-12
    import pytest as _pytest
    with _pytest.raises(ValueError, match="format"):
        log_features(hits, feats, fmt="sparse")


def test_range_facet_include_flags(spark):
    """facet.range.include boundary semantics, hand-counted (FacetRange.java):
    lower/upper double-count boundaries, edge opens only the outermost edges,
    outer widens before/after, hardend truncates the last bucket."""
    from solr_spark.operators.facets import range_facet_include

    vals = [0, 1, 5, 10, 11, 15, 20, 21, 25, 30, 99]
    df = spark.createDataFrame([(v,) for v in vals], "v int")

    def run(**kw):
        return {r["bucket"]: r["count"]
                for r in range_facet_include(df, "v", 1, 21, 10, **kw).collect()}

    # default include=lower: [1,11) [11,21); after counts v >= 21 (upper edge
    # goes to `after` because neither upper nor edge claims it)
    got = run()
    assert got == {"1.0": 3, "11.0": 3, "before": 1, "after": 4, "between": 6}
    # lower+upper: 11 counts in BOTH buckets; 21 joins bucket 2 and between
    got = run(include=("lower", "upper"))
    assert got == {"1.0": 4, "11.0": 4, "before": 1, "after": 3, "between": 7}
    # edge: only the outermost edges (1 and 21) are included; the interior
    # boundary 11 falls out of BOTH in-range buckets (Solr's documented
    # pathology) yet still counts in between
    got = run(include=("edge",))
    assert got == {"1.0": 3, "11.0": 3, "before": 1, "after": 3, "between": 7}
    # outer: before/after also claim the boundary points
    got = run(include=("lower", "upper", "outer"))
    assert got == {"1.0": 4, "11.0": 4, "before": 2, "after": 4, "between": 7}
    # all == lower+upper+edge+outer
    assert run(include=("all",)) == run(include=("lower", "upper",
                                                 "edge", "outer"))
    # hardend truncates the last bucket at end (end=15 not gap-aligned)
    got = {r["bucket"]: r["count"] for r in
           range_facet_include(df, "v", 1, 15, 10,
                               hardend=True).collect()}
    # buckets [1,11) and [11,15); after = v >= 15
    assert got == {"1.0": 3, "11.0": 1, "before": 1, "after": 6, "between": 4}


def test_child_docs_transformer(spark):
    """[child] transformer: filter, deterministic order, childLimit, and the
    childless-parent contract (empty array, n_children 0)."""
    from solr_spark.operators.streams import child_docs

    parents = spark.createDataFrame(
        [(1, "p1"), (2, "p2"), (3, "p3")], "pid int, name string")
    kids = spark.createDataFrame(
        [(1, 2, "b"), (1, 1, "a"), (1, 3, "c"), (2, 1, "x")],
        "pid int, pos int, val string")
    out = {r["pid"]: r for r in
           child_docs(parents, kids, "pid", ["pos"], limit=2).collect()}
    assert out[1]["n_children"] == 3                      # pre-limit count
    assert [c["val"] for c in out[1]["children"]] == ["a", "b"]  # sorted, capped
    assert out[2]["n_children"] == 1
    assert [c["val"] for c in out[2]["children"]] == ["x"]
    assert out[3]["n_children"] == 0 and out[3]["children"] == []
    # childFilter applies before counting
    out_f = {r["pid"]: r for r in
             child_docs(parents, kids, "pid", ["pos"],
                        child_filter=F.col("val") != "a").collect()}
    assert out_f[1]["n_children"] == 2
    assert [c["val"] for c in out_f[1]["children"]] == ["b", "c"]


def test_collapse_agg_matches_window_path(spark):
    """collapse_agg (min_by fast path) picks the identical survivor set as
    the window-based collapse under every nullPolicy, on data with duplicate
    sort keys and a unique tiebreak."""
    import random

    rng = random.Random(5)
    rows = [(rng.randrange(20) if rng.random() > 0.1 else None,
             float(rng.randrange(5)), i)
            for i in range(500)]
    df = spark.createDataFrame(rows, "grp int, score double, uid int")
    for policy in ("ignore", "collapse"):
        w = {(r["grp"], r["uid"]) for r in windows.collapse(
            df, "grp", [F.desc("score"), F.asc("uid")],
            null_policy=policy).collect()}
        a = {(r["grp"], r["uid"]) for r in windows.collapse_agg(
            df, "grp", [("score", True), ("uid", False)],
            null_policy=policy).collect()}
        assert a == w, policy
    # expand keeps every null-group row in both paths
    w = windows.collapse(df, "grp", [F.desc("score"), F.asc("uid")],
                         null_policy="expand").count()
    a = windows.collapse_agg(df, "grp", [("score", True), ("uid", False)],
                             null_policy="expand").count()
    assert a == w
    with pytest.raises(ValueError):
        windows.collapse_agg(df, "grp", [("score", True)], null_policy="bad")


def test_sft_pairs(spark):
    """SFT pair extraction: assistant turns paired with the rendered previous
    context window; bounded frame, no self-join (hand vectors)."""
    from pyspark.sql import functions as F

    from solr_spark.operators.windows import sft_pairs

    rows = [
        ("c1", 1, "user", "hi there"),
        ("c1", 2, "assistant", "hello"),
        ("c1", 3, "user", "do thing"),
        ("c1", 4, "assistant", "done ok"),
        ("c2", 1, "assistant", "orphan greeting"),   # no prior context
        ("c2", 2, "user", "q"),
        ("c2", 3, "assistant", "a"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")
    out = {(r.conv_id, r.turn_idx): r for r in sft_pairs(
        df, F.col("role") == "assistant", context_turns=2).collect()}

    # c1 turn 2: context = the one prior turn
    assert out[("c1", 2)].context == "user: hi there"
    assert out[("c1", 2)].response == "hello"
    assert out[("c1", 2)].n_context_turns == 1
    assert out[("c1", 2)].context_tokens == 3  # 'user:' 'hi' 'there'
    assert out[("c1", 2)].response_tokens == 1

    # c1 turn 4: frame capped at 2 prior turns (turn 1 falls out)
    assert out[("c1", 4)].context == "assistant: hello\nuser: do thing"
    assert out[("c1", 4)].n_context_turns == 2

    # c2 turn 1: zero context -> dropped by min_context_turns=1
    assert ("c2", 1) not in out
    assert out[("c2", 3)].context == "assistant: orphan greeting\nuser: q"

    # min_context_turns=0 keeps the orphan with empty context
    all_pairs = {(r.conv_id, r.turn_idx): r for r in sft_pairs(
        df, F.col("role") == "assistant", context_turns=2,
        min_context_turns=0).collect()}
    assert all_pairs[("c2", 1)].context == ""
    assert all_pairs[("c2", 1)].n_context_turns == 0


def test_pivot_facet_stats_levels_and_metrics(spark):
    from solr_spark.operators.facets import pivot_facet_stats

    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "x", 2), ("a", "y", 4), ("b", "x", 8)],
        "f1 string, f2 string, v int")
    rows = pivot_facet_stats(df, ["f1", "f2"],
                             metrics={"sv": "sum(v)", "mx": "max(v)"}
                             ).collect()
    got = {(r["f1"], r["f2"], r["level"]): (r["count"], r["sv"], r["mx"])
           for r in rows}
    assert got == {
        ("a", None, 1): (3, 7, 4), ("b", None, 1): (1, 8, 8),
        ("a", "x", 2): (2, 3, 2), ("a", "y", 2): (1, 4, 4),
        ("b", "x", 2): (1, 8, 8)}
    # no grand-total row; parents follow their children (NULLS LAST order)
    assert len(rows) == 5
    names = [(r["f1"], r["f2"]) for r in rows]
    assert names.index(("a", "x")) < names.index(("a", None))

    # mincount prunes tree nodes at every level
    rows = pivot_facet_stats(df, ["f1", "f2"], mincount=2).collect()
    assert {(r["f1"], r["f2"]) for r in rows} == {("a", None), ("a", "x")}


def test_group_ngroups_and_grouped_facet(spark):
    from solr_spark.operators.windows import group_ngroups, grouped_facet

    df = spark.createDataFrame(
        [("u1", "click"), ("u1", "click"), ("u1", "view"),
         ("u2", "click"), ("u3", "view"), ("u3", None)],
        "user string, et string")
    row = group_ngroups(df, "user").first()
    assert (row["matches"], row["ngroups"]) == (6, 3)

    # group.facet: u1 counts ONCE for click despite two click docs
    got = [(r["bucket"], r["count"])
           for r in grouped_facet(df, "user", "et").collect()]
    assert got == [("click", 2), ("view", 2)]
    got = [(r["bucket"], r["count"])
           for r in grouped_facet(df, "user", "et", mincount=3).collect()]
    assert got == []


def test_terms_facet_offset_paging(spark):
    from solr_spark.operators.facets import terms_facet

    df = spark.createDataFrame(
        [(c,) for c, n in [("a", 5), ("b", 4), ("c", 3), ("d", 2), ("e", 1)]
         for _ in range(n)], "f string")
    full = [(r["bucket"], r["count"])
            for r in terms_facet(df, "f", limit=5).collect()]
    page2 = [(r["bucket"], r["count"])
             for r in terms_facet(df, "f", limit=2, offset=2).collect()]
    assert page2 == full[2:4]
    # offset composes with index order and past-the-end returns empty
    idx = [(r["bucket"],) for r in
           terms_facet(df, "f", limit=2, offset=1, sort="index asc",
                       sort_by_count=False).collect()]
    assert idx == [("b",), ("c",)]
    assert terms_facet(df, "f", limit=3, offset=10).count() == 0


def test_stats_component_calcdistinct(spark):
    from solr_spark.operators.facets import stats_component

    df = spark.createDataFrame([(1.0,), (1.0,), (2.0,), (None,)],
                               "v double")
    row = stats_component(df, "v", calcdistinct=True).first()
    assert row["count_distinct"] == 2 and row["count"] == 3
    assert "count_distinct" not in stats_component(df, "v").columns


def test_group_query_and_func(spark):
    """Grouping.java:860 CommandQuery / :933 CommandFunc."""
    from solr_spark.operators.windows import group_func, group_query

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 30.0), (3, "b", 20.0),
         (4, "b", 40.0), (5, "c", 35.0)],
        "id int, cat string, v double")
    out = group_query(
        df, {"hi": F.col("v") >= 30, "ab": F.col("cat").isin("a", "b")},
        [F.desc("v"), F.asc("id")], n=2)
    got = sorted((r["group"], r["id"], r["group_rank"]) for r in out.collect())
    # id=4 matches BOTH queries and appears in both groups
    assert got == [("ab", 2, 2), ("ab", 4, 1), ("hi", 4, 1), ("hi", 5, 2)]

    out = group_func(df, F.floor(F.col("v") / 20).cast("long"),
                     [F.desc("v"), F.asc("id")], n=1, group_col="band")
    got = sorted((r["band"], r["id"]) for r in out.collect())
    assert got == [(0, 1), (1, 5), (2, 4)]


def test_switch_qparser(spark):
    """SwitchQParserPlugin.java:119 — case selection, blank input, default,
    no-match error."""
    import pytest as _pt

    from solr_spark.query.parser import switch_query

    df = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 50), (3, "a", 500)], "id int, g string, v int")
    cases = {"small": "v:[* TO 10]", "big": "v:[100 TO *]", "": "g:a"}

    def ids(val, **kw):
        return sorted(r["id"] for r in df.where(
            switch_query(val, cases, "g", **kw)).collect())

    assert ids("small") == [1]
    assert ids(" big ") == [3]          # input is trimmed
    assert ids("") == [1, 3]            # blank input -> the `case` param
    assert ids(None) == [1, 3]
    assert ids("nope", default="v:[0 TO *]") == [1, 2, 3]
    with _pt.raises(ValueError, match="no case matches"):
        ids("nope")


def test_simple_qparser(spark):
    """SimpleQParserPlugin.java:65 — end-user grammar, never throws."""
    from solr_spark.query.parser import simple_query

    df = spark.createDataFrame(
        [(1, "error timeout worker"), (2, "all good"), (3, "timeout parse"),
         (4, "warn error"), (5, "quiet day")], "id int, text string")

    def ids(q, **kw):
        return sorted(r["id"] for r in
                      df.where(simple_query(q, "text", **kw)).collect())

    assert ids("error timeout") == [1, 3, 4]             # OR default
    assert ids("error timeout", default_op="AND") == [1]
    assert ids("error + timeout") == [1]                 # + is AND
    assert ids("error | quiet") == [1, 4, 5]
    assert ids("error -timeout") == [4]                  # - is MUST_NOT
    assert ids("error + -timeout") == [4]
    assert ids('"error timeout"') == [1]                 # phrase
    assert ids("tim*") == [1, 3]                         # prefix wildcard
    assert ids("eror~1") == [1, 4]                       # fuzzy... word-level
    assert ids("(error | warn) + quiet") == []
    assert ids("(timeout | quiet) + day") == [5]
    # never-throws degradations
    assert ids('"unterminated phrase') == []             # literal, no match
    assert ids("error)") == [1, 4]                       # stray paren dropped
    assert ids("(error") == [1, 4]                       # unclosed paren
    assert ids("-quiet") == [1, 2, 3, 4]                 # pure negative
    assert ids("+ | -") == [1, 2, 3, 4, 5]               # operators only
    assert ids("") == [1, 2, 3, 4, 5]                    # empty = match all


def test_elevate_marked_excludes(spark):
    """markExcludes + [elevated]/[excluded] transformers: excluded docs stay,
    annotated and unpinned."""
    from solr_spark.operators.windows import elevate_marked

    df = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7), (4, 0.6)], "id int, score double")
    out = elevate_marked(df, "id", elevated_ids=[3, 2], excluded_ids=[2],
                         sort=[F.desc("score")], rows=10).collect()
    ids = [r.id for r in out]
    assert ids[0] == 3                       # elevated (and not excluded)
    assert set(ids) == {1, 2, 3, 4}          # excluded doc 2 KEPT
    marks = {r.id: (r.elevated, r.excluded) for r in out}
    assert marks[3] == (True, False)
    assert marks[2] == (False, True)         # exclusion cancels elevation
    assert marks[1] == (False, False)
    # doc 2 sorts by natural order among non-elevated
    assert ids == [3, 1, 2, 4]


def test_mlt_content(spark):
    """mlt_content (search/mlt/MLTContentQParserPlugin.java): free-text seed —
    term boosts are tf-in-content * corpus idf; docs ranked by the boost sum
    over shared terms. Hand-computed twin on a 4-doc corpus."""
    import math

    rows = [(0, "apple banana cherry"), (1, "apple banana date"),
            (2, "apple elderberry"), (3, "fig grape")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    pairs = df.select("doc_id", F.explode(F.split("text", " ")).alias("term"))

    # content: banana twice (ctf 2), fig once, kiwi not in the corpus
    out = streams.mlt_content(pairs, ["banana", "banana", "fig", "kiwi"], 4,
                              doc_col="doc_id", k=10).collect()
    idf_banana = math.log(4 / 2)  # df(banana)=2
    idf_fig = math.log(4 / 1)
    got = {r["doc_id"]: (r["mlt_score"], r["n_shared"]) for r in out}
    assert got[0] == (round(2 * idf_banana, 4), 1)
    assert got[1] == (round(2 * idf_banana, 4), 1)
    assert got[3] == (round(1 * idf_fig, 4), 1)
    assert 2 not in got  # shares nothing with the content

    # max_query_terms truncation: banana and fig tie on boost EXACTLY
    # (2*ln2 == ln4), so the deterministic term-asc tiebreak keeps banana
    out2 = streams.mlt_content(pairs, ["banana", "banana", "fig", "kiwi"], 4,
                               doc_col="doc_id", k=10, max_query_terms=1)
    assert {r["doc_id"] for r in out2.collect()} == {0, 1}

    # mintf prunes single-occurrence content terms; empty content -> empty
    out3 = streams.mlt_content(pairs, ["banana", "banana", "fig"], 4,
                               doc_col="doc_id", min_tf=2)
    assert {r["doc_id"] for r in out3.collect()} == {0, 1}
    assert streams.mlt_content(pairs, [], 4, doc_col="doc_id").count() == 0


def test_subquery_transformer(spark):
    """[subquery] (SubQueryAugmenterFactory.java): per-parent top rows of a
    separate query — salted top-N + group-collect + one left join. The
    subquery sort order must survive into the collected array, numFound is
    the pre-limit match count, and a parent with no matches gets []/0."""
    parents = spark.createDataFrame([(1,), (2,), (3,)], "pid int")
    sub = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 9.0), (1, 12, 7.0),
         (2, 20, 1.0)],
        "fk int, sid int, weight double")

    out = {r["pid"]: r for r in streams.subquery_docs(
        parents, sub, "pid", "fk",
        [F.desc("weight"), F.asc("sid")], rows=2).collect()}
    assert out[1]["subquery_numFound"] == 3
    assert [(s["sid"], s["weight"]) for s in out[1]["subquery"]] == \
        [(11, 9.0), (12, 7.0)]  # weight desc, capped at 2
    assert out[2]["subquery_numFound"] == 1
    assert [(s["sid"], s["weight"]) for s in out[2]["subquery"]] == [(20, 1.0)]
    assert out[3]["subquery_numFound"] == 0 and out[3]["subquery"] == []

    # sub_filter narrows the subquery before ranking (numFound follows)
    out_f = {r["pid"]: r for r in streams.subquery_docs(
        parents, sub, "pid", "fk", [F.desc("weight"), F.asc("sid")],
        rows=2, sub_filter=F.col("weight") >= 6.0, out="hits").collect()}
    assert out_f[1]["hits_numFound"] == 2
    assert [s["sid"] for s in out_f[1]["hits"]] == [11, 12]
    assert out_f[2]["hits_numFound"] == 0 and out_f[2]["hits"] == []


def test_group_offset(spark, people):
    """group.offset (Grouping.java groupOffset): within-group paging keeps
    ABSOLUTE ranks; offset past a group's size empties that group."""
    out = windows.group_top_n(
        people, "dept", [F.desc("amount"), F.asc("id")], 1, offset=1)
    got = {(r["dept"], r["id"], r["group_rank"]) for r in out.collect()}
    # rank-2 row per dept: eng -> id 1 (100 < 250), ops -> 3, sales -> 6
    assert got == {("eng", 1, 2), ("ops", 3, 2), ("sales", 6, 2)}
    # offset beyond every group's size -> empty
    assert windows.group_top_n(
        people, "dept", [F.desc("amount"), F.asc("id")], 2, offset=5
    ).count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="offset"):
        windows.group_top_n(people, "dept", [F.asc("id")], 1, offset=-1)


def test_block_join_parent_scored_modes(spark):
    """{!parent score=...}: each ScoreMode aggregates matching children's
    scores onto the parent; parents without matching children drop
    (semi-join); ranking is score desc, key asc."""
    from solr_spark.operators.streams import block_join_parent_scored

    parents = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "pk string, attr int")
    kids = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 2.0)], "pk string, score double")
    got = {m: [(r["pk"], r["score"]) for r in
               block_join_parent_scored(parents, kids, "pk", "pk",
                                        score_mode=m).collect()]
           for m in ("max", "min", "avg", "total")}
    assert got["max"] == [("a", 3.0), ("b", 2.0)]
    assert got["min"] == [("b", 2.0), ("a", 1.0)]
    assert got["avg"] == [("a", 2.0), ("b", 2.0)]
    assert got["total"] == [("a", 4.0), ("b", 2.0)]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="score mode"):
        block_join_parent_scored(parents, kids, "pk", "pk",
                                 score_mode="none")
