"""facet_tree (operators/facets.py): arbitrary-depth nested facets — level
stats on the right domain, per-node sort/limit/mincount, range levels, and
the moment re-aggregation rules."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_spark.operators.facets import FacetLevel, facet_tree


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(400):
        lang = ["en", "fr", "de", "zh"][i % 4]
        src = f"s{i % 5}"
        rows.append((i, lang, src, float(100 + (i * 37) % 500)))
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars double")


def test_two_level_matches_manual(spark, docs):
    tree = facet_tree(docs, [
        FacetLevel("langs", "lang", limit=2),
        FacetLevel("srcs", "source", limit=3),
    ]).collect()
    # manual: top-2 langs by count, top-3 sources within each
    cnt = {(r.lang, r.source): r.n for r in
           docs.groupBy("lang", "source").agg(
               F.count("*").alias("n")).collect()}
    lang_tot = {}
    for (lg, _), n in cnt.items():
        lang_tot[lg] = lang_tot.get(lg, 0) + n
    top_langs = sorted(lang_tot, key=lambda x: (-lang_tot[x], x))[:2]
    want = set()
    for lg in top_langs:
        srcs = sorted((s for (l2, s) in cnt if l2 == lg),
                      key=lambda s: (-cnt[(lg, s)], s))[:3]
        want |= {(lg, s) for s in srcs}
    assert {(r.langs, r.srcs) for r in tree} == want
    for r in tree:
        assert r.langs_count == lang_tot[r.langs]
        assert r.srcs_count == cnt[(r.langs, r.srcs)]


def test_outer_stats_ignore_inner_domain(spark, docs):
    # the range sub-facet covers only [100, 300) — outer avg/count must still
    # be over ALL docs of the lang bucket (the FacetRequest.processSubs rule)
    tree = facet_tree(docs, [
        FacetLevel("langs", "lang", limit=4,
                   stats={"avg_chars": ("avg", "n_chars")}),
        FacetLevel("sizes", "n_chars", kind="range",
                   start=100.0, gap=100.0, end=300.0),
    ])
    rows = tree.collect()
    truth = {r.lang: (r.n, r.a) for r in docs.groupBy("lang").agg(
        F.count("*").alias("n"), F.avg("n_chars").alias("a")).collect()}
    assert rows
    for r in rows:
        n, a = truth[r.langs]
        assert r.langs_count == n
        assert abs(r.avg_chars - a) < 1e-9
        assert r.sizes in (100.0, 200.0)


def test_sort_by_stat_and_mincount(spark, docs):
    skewed = docs.where((F.col("lang") != "zh") | (F.col("doc_id") < 8))
    tree = facet_tree(skewed, [
        FacetLevel("langs", "lang", limit=2, mincount=50,
                   sort="mx desc", stats={"mx": ("max", "n_chars")}),
        FacetLevel("srcs", "source", limit=1),
    ]).collect()
    # zh has 2 docs < mincount 50 -> excluded even if its max is high
    assert all(r.langs != "zh" for r in tree)
    mx = {r.lang: r.m for r in skewed.groupBy("lang").agg(
        F.max("n_chars").alias("m")).collect()}
    langs_out = [r.langs for r in tree]
    ordered = sorted({lg for lg in mx if lg != "zh"},
                     key=lambda x: (-mx[x], x))[:2]
    assert sorted(set(langs_out)) == sorted(ordered)


def test_nonleaf_stddev_moments(spark, docs):
    tree = facet_tree(docs, [
        FacetLevel("langs", "lang", limit=4,
                   stats={"sd": ("stddev", "n_chars")}),
        FacetLevel("srcs", "source", limit=5),
    ]).collect()
    truth = {r.lang: r.s for r in docs.groupBy("lang").agg(
        F.stddev("n_chars").alias("s")).collect()}
    for r in tree:
        assert abs(r.sd - truth[r.langs]) < 1e-9


def test_unique_leaf_only(spark, docs):
    with pytest.raises(ValueError, match="leaf-level only"):
        facet_tree(docs, [
            FacetLevel("langs", "lang",
                       stats={"u": ("unique", "source")}),
            FacetLevel("srcs", "source"),
        ])
    # at the leaf it's allowed
    tree = facet_tree(docs, [
        FacetLevel("langs", "lang", limit=1),
        FacetLevel("srcs", "source", limit=2,
                   stats={"u": ("unique", "doc_id")}),
    ]).collect()
    assert all(r.u == r.srcs_count for r in tree)  # doc_id unique per row


def test_bucket_with_empty_subdomain_still_ranks(spark):
    # lang 'xx' has many docs but NONE inside the range sub-facet's domain;
    # it must still occupy a top-limit slot (Solr shows it with an empty
    # sub-facet), so the next lang must NOT be promoted into the cut.
    rows = [(i, "xx", 50.0) for i in range(30)] + \
           [(100 + i, "en", 150.0) for i in range(20)] + \
           [(200 + i, "fr", 150.0) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars double")
    tree = facet_tree(df, [
        FacetLevel("langs", "lang", limit=2),
        FacetLevel("sizes", "n_chars", kind="range",
                   start=100.0, gap=100.0, end=300.0),
    ]).collect()
    # top-2 langs by count are xx (30) and en (20); xx has no leaf rows, so
    # the output contains ONLY en leaves — never fr
    assert {r.langs for r in tree} == {"en"}


def test_list_ranges_facet(spark):
    """SOLR-6348 `ranges` param: arbitrary overlapping ranges, canonical
    range-string bucket keys, metrics in the same single pass."""
    from solr_spark.operators.facets import list_ranges_facet

    df = spark.createDataFrame(
        [(i, float(i * 10)) for i in range(10)], "id int, v double")
    out = list_ranges_facet(
        df, "v",
        [{"range": "[0,30)"},                       # 0,10,20
         {"from": 20, "to": 50},                    # 20,30,40 (defaults)
         {"from": 40, "to": 60, "inclusive_from": False,
          "inclusive_to": True},                    # 50,60
         {"range": "[80,*)"},                       # 80,90
         {"range": "(90,*)"}],                      # empty
        metrics=[("sum", "v"), ("max", "id")]).collect()
    got = {r["range"]: (r["count"], r.sum_v, r.max_id) for r in out}
    assert got["[0,30)"] == (3, 30.0, 2)
    assert got["[20,50)"] == (3, 90.0, 4)
    assert got["(40,60]"] == (2, 110.0, 6)
    assert got["[80,*)"] == (2, 170.0, 9)
    assert got["(90,*)"] == (0, None, None)
    # request order preserved
    assert [r["range"] for r in out] == [
        "[0,30)", "[20,50)", "(40,60]", "[80,*)", "(90,*)"]


def test_json_graph_domain(spark):
    """domain.graph: each hop finds docs whose `from` matches the frontier
    docs' `to` values; returnRoot controls the original domain's docs."""
    from solr_spark.query.jsonapi import json_facets

    docs = spark.createDataFrame(
        [(1, 10, "a"), (10, 100, "b"), (100, 0, "c"),
         (2, 20, "a"), (20, 0, "b"), (7, 9, "z")],
        "from_v int, to_v int, tag string")
    req = {"query": "from_v:1",
           "facet": {"tags": {
               "type": "terms", "field": "tag", "limit": 10,
               "domain": {"graph": {"from": "from_v", "to": "to_v"}}}}}
    out = json_facets(docs, req)["tags"].collect()
    # roots={doc 1}; walk: to=10 -> doc 10 -> to=100 -> doc 100; tags a,b,c
    got = {r.bucket: r["count"] for r in out}
    assert got == {"a": 1, "b": 1, "c": 1}
    req["facet"]["tags"]["domain"]["graph"]["returnRoot"] = False
    out2 = json_facets(docs, req)["tags"].collect()
    assert {r.bucket: r["count"] for r in out2} == {"b": 1, "c": 1}
    req["facet"]["tags"]["domain"]["graph"]["maxDepth"] = 1
    req["facet"]["tags"]["domain"]["graph"]["returnRoot"] = True
    out3 = json_facets(docs, req)["tags"].collect()
    got3 = {r.bucket: r["count"] for r in out3}
    assert got3 == {"a": 1, "b": 1}  # one DOC hop: root + doc 10 only


def test_query_facet_stats_and_unlimited_terms(spark):
    from solr_spark.operators.facets import query_facet_stats, terms_facet
    from solr_spark.query.jsonapi import json_facets

    df = spark.createDataFrame(
        [(i, float(i), "t%d" % (i % 13)) for i in range(40)],
        "id int, v double, tag string")
    out = query_facet_stats(
        df, {"big": F.col("v") >= 20, "small": F.col("v") < 20},
        metrics=[("sum", "v"), ("max", "id")]).collect()
    got = {r.bucket: (r["count"], r.sum_v, r.max_id) for r in out}
    assert got["big"] == (20, sum(float(i) for i in range(20, 40)), 39)
    assert got["small"] == (20, sum(float(i) for i in range(20)), 19)
    # JSON adapter: query facet with nested stats
    req = {"query": "*:*",
           "facet": {"big": {"type": "query", "q": "v:[20 TO *]",
                             "facet": {"total": "sum(v)"}}}}
    jf = json_facets(df, req)["big"].collect()[0]
    assert jf["count"] == 20 and jf.total == got["big"][1]
    # limit:-1 returns every bucket
    allb = terms_facet(df, "tag", limit=-1)
    assert allb.count() == 13


def test_range_with_terms_subfacet(spark):
    """Top-level range facet carrying a terms sub-facet routes through the
    facet_tree compilation (one scan)."""
    from solr_spark.query.jsonapi import json_facets

    df = spark.createDataFrame(
        [(i, float(i % 100), ["en", "fr", "de"][i % 3]) for i in range(90)],
        "id int, v double, lang string")
    req = {"query": "*:*",
           "facet": {"sizes": {"type": "range", "field": "v",
                               "start": 0, "gap": 50, "end": 100,
                               "facet": {"langs": {"type": "terms",
                                                   "field": "lang",
                                                   "limit": 3}}}}}
    out = json_facets(df, req)["sizes"].collect()
    got = {(r.bucket, r.langs): r["count"] for r in out}
    # bucket [0,50): i in 0..49 -> en(i%3==0)=17, fr=17, de=16
    # bucket [50,100): i in 50..89 -> en=13, fr=13, de=14
    assert got[(0.0, "en")] == 17 and got[(0.0, "de")] == 16
    assert got[(50.0, "de")] == 14 and got[(50.0, "en")] == 13
    assert len(got) == 6


# ------------------------------------------------- sibling sub-facets (r5)


def test_sibling_subfacets_branch_per_path(spark, docs):
    """A node with a MAP of sub-facets (FacetRequest.processSubs) emits one
    DataFrame per root-to-leaf chain, keyed by the '/'-joined path, with
    identical root buckets/counts across branches."""
    from solr_spark.query.jsonapi import json_facets

    req = {"query": "*:*", "facet": {"langs": {
        "type": "terms", "field": "lang", "limit": 2,
        "facet": {
            "mean_chars": "avg(n_chars)",
            "by_src": {"type": "terms", "field": "source", "limit": 2},
            "sizes": {"type": "range", "field": "n_chars",
                      "start": 100, "gap": 200, "end": 500}}}}}
    res = json_facets(docs, req)
    assert set(res) == {"langs/by_src", "langs/sizes"}
    a = res["langs/by_src"].collect()
    b = res["langs/sizes"].collect()
    # identical root buckets + counts + root stats in both branches
    ra = {(r["bucket"], r["langs_count"], round(r["mean_chars"], 9))
          for r in a}
    rb = {(r["bucket"], r["langs_count"], round(r["mean_chars"], 9))
          for r in b}
    assert ra == rb and len(ra) == 2
    # branch-specific leaves
    assert all("by_src" in r.asDict() for r in a)
    assert all("sizes" in r.asDict() for r in b)
    # range branch counts respect start/end
    dom = docs.where((F.col("n_chars") >= 100) & (F.col("n_chars") < 500))
    for r in b:
        n = dom.where((F.col("lang") == r["bucket"])
                      & (F.col("n_chars") >= r["sizes"])
                      & (F.col("n_chars") < r["sizes"] + 200)).count()
        assert n == r["count"]


def test_single_chain_key_unchanged(spark, docs):
    """Back-compat: a tree with exactly one chain keeps its root name."""
    from solr_spark.query.jsonapi import json_facets

    res = json_facets(docs, {"query": "*:*", "facet": {"langs": {
        "type": "terms", "field": "lang", "limit": 2,
        "facet": {"by_src": {"type": "terms", "field": "source",
                             "limit": 2}}}}})
    assert set(res) == {"langs"}
