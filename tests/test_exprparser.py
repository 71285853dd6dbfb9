"""Streaming-expression parser + dispatcher tests.

Parser grammar cases mirror solr/solrj-streaming/src/test/org/apache/solr/
client/solrj/io/stream/expr/StreamExpressionParserTest.java; dispatcher cases
check string programs against the equivalent direct DataFrame programs.
"""

import pytest
from pyspark.sql import functions as F

from solr_spark.streaming.exprparser import (
    ExpressionSyntaxError, NamedParam, StreamExpr, parse_expression,
)
from solr_spark.streaming.dispatch import run_expression

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ parser

def test_parse_simple_function():
    e = parse_expression("unique(over=a)")
    assert e.name == "unique"
    assert e.named1("over") == "a"


def test_parse_positional_and_named():
    e = parse_expression('search(coll1, q="a:b", fl="x,y", sort="x asc")')
    assert e.positional_values() == ["coll1"]
    assert e.named1("q") == "a:b"
    assert e.named1("fl") == "x,y"


def test_parse_nested_expressions():
    e = parse_expression("top(n=3, search(c, q=*:*, sort=\"f asc\"), sort=\"f desc\")")
    assert e.name == "top"
    assert e.named1("n") == "3"
    subs = e.sub_expressions()
    assert len(subs) == 1 and subs[0].name == "search"


def test_parse_repeatable_named_params():
    e = parse_expression('search(c, q=*:*, fq="a:1", fq="b:2", sort="a asc")')
    assert e.named("fq") == ["a:1", "b:2"]


def test_parse_escaped_quotes_inside_value():
    e = parse_expression('search(c, q="t:\\"hello world\\"", sort="a asc")')
    assert e.named1("q") == 't:"hello world"'


def test_parse_commas_and_parens_inside_quotes():
    e = parse_expression('search(c, q="a:(x OR y), b:z", sort="a asc")')
    assert e.named1("q") == "a:(x OR y), b:z"
    assert len(e.sub_expressions()) == 0


def test_parse_backtick_as_quote():
    # backticks become embedded double-quotes (used INSIDE an outer quoted
    # value, e.g. a phrase query) — StreamExpressionParser.java:136-146
    e = parse_expression('search(c, q="t:`hello world`", sort="a asc")')
    assert e.named1("q") == 't:"hello world"'


def test_parse_comment_lines_stripped():
    e = parse_expression("# a comment\nrollup(\n# another\nsearch(c), over=a, sum(b))")
    assert e.name == "rollup"
    assert [s.name for s in e.sub_expressions()] == ["search", "sum"]


def test_parse_metric_star():
    e = parse_expression("rollup(search(c), over=a, count(*))")
    m = e.sub_expressions()[1]
    assert m.name == "count" and m.positional_values() == ["*"]


def test_parse_named_nested_expression():
    e = parse_expression("hashJoin(search(a), hashed=search(b), on=k)")
    h = e.named1("hashed")
    assert isinstance(h, StreamExpr) and h.name == "search"


def test_parse_rejects_garbage():
    with pytest.raises(ExpressionSyntaxError):
        parse_expression("not an expression")
    with pytest.raises(ExpressionSyntaxError):
        parse_expression("fn(unbalanced")


# --------------------------------------------------------------- dispatcher

@pytest.fixture(scope="module")
def colls(spark):
    return {n: spark.read.parquet(f"{SF_DIR}/{n}.parquet")
            for n in ("orders", "customer", "lineitem", "events", "nation",
                      "region")}


def test_dispatch_search_filters_and_projects(colls):
    out = run_expression(
        'search(orders, q="o_orderstatus:F", fq="o_totalprice:[100000 TO *]", '
        'fl="o_orderkey,o_totalprice", sort="o_orderkey asc")', colls)
    assert out.columns == ["o_orderkey", "o_totalprice"]
    rows = out.collect()
    assert rows and all(r.o_totalprice >= 100000 for r in rows)
    direct = colls["orders"].where(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") >= 100000))
    assert len(rows) == direct.count()


def test_dispatch_rollup_matches_groupby(colls):
    out = run_expression(
        'rollup(search(lineitem, q=*:*, fl="l_returnflag,l_quantity", '
        'sort="l_returnflag asc"), over="l_returnflag", sum(l_quantity), count(*))',
        colls).collect()
    direct = {r["l_returnflag"]: (r["s"], r["n"]) for r in
              colls["lineitem"].groupBy("l_returnflag")
              .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n"))
              .collect()}
    assert {r["l_returnflag"]: (r["sum(l_quantity)"], r["count(*)"])
            for r in out} == direct


def test_dispatch_top_and_having(colls):
    out = run_expression(
        'top(n=5, having(search(orders, q=*:*, fl="o_orderkey,o_totalprice", '
        'sort="o_orderkey asc"), gt(o_totalprice, 400000)), '
        'sort="o_totalprice desc")', colls).collect()
    assert len(out) == 5
    assert all(r.o_totalprice > 400000 for r in out)
    prices = [r.o_totalprice for r in out]
    assert prices == sorted(prices, reverse=True)


def test_dispatch_inner_join_rename_keys(colls):
    out = run_expression(
        'innerJoin(search(orders, q=*:*, fl="o_orderkey,o_custkey", '
        'sort="o_custkey asc"), search(customer, q=*:*, fl="c_custkey,c_name", '
        'sort="c_custkey asc"), on="o_custkey=c_custkey")', colls)
    assert "c_name" in out.columns and "c_custkey" not in out.columns
    assert out.count() == colls["orders"].count()  # every order has a customer


def test_dispatch_select_evaluator_and_rename(colls):
    out = run_expression(
        'select(search(orders, q=*:*, fl="o_orderkey,o_totalprice", '
        'sort="o_orderkey asc"), o_orderkey as okey, '
        'div(o_totalprice, 1000) as kprice)', colls)
    assert out.columns == ["okey", "kprice"]
    row = out.orderBy("okey").first()
    base = colls["orders"].orderBy("o_orderkey").first()
    assert row.kprice == pytest.approx(base.o_totalprice / 1000)


def test_dispatch_unique_first_wins(colls):
    out = run_expression(
        'unique(search(orders, q=*:*, fl="o_custkey,o_orderkey", '
        'sort="o_custkey asc, o_orderkey asc"), over="o_custkey")', colls)
    rows = out.collect()
    direct = (colls["orders"].groupBy("o_custkey")
              .agg(F.min("o_orderkey").alias("o_orderkey")).collect())
    assert {(r.o_custkey, r.o_orderkey) for r in rows} == \
           {(r.o_custkey, r.o_orderkey) for r in direct}


def test_dispatch_facet_bucket_sorts_by_metric(colls):
    out = run_expression(
        'facet(orders, q="*:*", buckets="o_orderpriority", '
        'bucketSorts="sum(o_totalprice) desc", bucketSizeLimit=3, '
        'sum(o_totalprice), count(*))', colls).collect()
    assert len(out) == 3
    sums = [r["sum(o_totalprice)"] for r in out]
    assert sums == sorted(sums, reverse=True)


def test_dispatch_stats_single_row(colls):
    out = run_expression(
        'stats(orders, q="*:*", sum(o_totalprice), min(o_totalprice), '
        'max(o_totalprice), avg(o_totalprice), count(*))', colls).collect()
    assert len(out) == 1
    r = out[0]
    assert r["min(o_totalprice)"] <= r["avg(o_totalprice)"] <= r["max(o_totalprice)"]


def test_dispatch_merge_union_sorted(colls):
    out = run_expression(
        'merge(search(orders, q="o_orderstatus:F", fl="o_orderkey", sort="o_orderkey asc"), '
        'search(orders, q="o_orderstatus:O", fl="o_orderkey", sort="o_orderkey asc"), '
        'on="o_orderkey asc")', colls)
    keys = [r.o_orderkey for r in out.collect()]
    assert keys == sorted(keys)


def test_dispatch_intersect_complement(colls):
    inter = run_expression(
        'intersect(search(orders, q="o_orderstatus:F", fl="o_custkey", sort="o_custkey asc"), '
        'search(orders, q="o_orderstatus:O", fl="o_custkey", sort="o_custkey asc"), '
        'on="o_custkey")', colls)
    comp = run_expression(
        'complement(search(orders, q="o_orderstatus:F", fl="o_custkey", sort="o_custkey asc"), '
        'search(orders, q="o_orderstatus:O", fl="o_custkey", sort="o_custkey asc"), '
        'on="o_custkey")', colls)
    f_keys = {r.o_custkey for r in colls["orders"]
              .where(F.col("o_orderstatus") == "F").select("o_custkey").collect()}
    o_keys = {r.o_custkey for r in colls["orders"]
              .where(F.col("o_orderstatus") == "O").select("o_custkey").collect()}
    assert {r.o_custkey for r in inter.collect()} == f_keys & o_keys
    assert {r.o_custkey for r in comp.collect()} == f_keys - o_keys


def test_dispatch_hash_join_broadcasts(colls):
    out = run_expression(
        'hashJoin(search(orders, q=*:*, fl="o_orderkey,o_custkey", sort="o_orderkey asc"), '
        'hashed=search(customer, q=*:*, fl="c_custkey,c_nationkey", sort="c_custkey asc"), '
        'on="o_custkey=c_custkey")', colls)
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_dispatch_timeseries(colls):
    out = run_expression(
        'timeseries(events, q="*:*", field="ts", start="2024-01-01", '
        'end="2024-12-31", gap="+1MONTH", count(*))', colls).collect()
    assert out and all(r["count(*)"] > 0 for r in out)


def test_dispatch_reduce_group_topn(colls):
    out = run_expression(
        'reduce(search(orders, q=*:*, fl="o_custkey,o_orderkey,o_totalprice", '
        'sort="o_custkey asc"), by="o_custkey", '
        'group(sort="o_totalprice desc", n="2"))', colls)
    counts = out.groupBy("o_custkey").count().agg(F.max("count")).first()[0]
    assert counts <= 2


def test_dispatch_cartesian_product(spark, colls):
    df = spark.createDataFrame([(1, ["a", "b"]), (2, ["c"])], ["id", "vals"])
    out = run_expression(
        'cartesianProduct(search(arr, q=*:*, sort="id asc"), vals)',
        {**colls, "arr": df})
    assert out.count() == 3


def test_dispatch_shortest_path(spark, colls):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "d"), ("d", "c"), ("c", "e")],
        ["src", "dst"])
    out = run_expression(
        'shortestPath(g, from="a", to="e", edge="src=dst", maxDepth=5)',
        {**colls, "g": edges}).collect()
    assert [r.node for r in out][0] == "a"
    assert [r.node for r in out][-1] == "e"
    assert len(out) == 4


def test_dispatch_gather_nodes_seed(spark, colls):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d")], ["from_id", "to_id"])
    out = run_expression(
        'gatherNodes(g, walk="a->from_id", gather="to_id")',
        {**colls, "g": edges}).collect()
    assert {r.to_id for r in out} == {"b", "c"}


def test_dispatch_unknown_function_raises(colls):
    with pytest.raises(ValueError, match="unknown stream function"):
        run_expression("daemonize(search(orders, sort=\"o_orderkey asc\"))", colls)


def test_dispatch_significant_terms(spark, colls):
    docs = spark.createDataFrame(
        [(0, "a", "rare shared shared"), (1, "a", "rare common"),
         (2, "b", "common shared"), (3, "b", "common other"),
         (4, "b", "common other")],
        ["doc_id", "source", "text"])
    out = run_expression(
        'significantTerms(d, q="source:a", field="text", minDocFreq="1")',
        {**colls, "d": docs}).collect()
    scores = {r["term"]: r["score"] for r in out}
    # 'rare' occurs only in foreground: lift = (2/2)/(2/5) = 2.5
    assert scores["rare"] == pytest.approx(2.5)
    # foreground-only terms are returned ('other' is bg-only)
    assert "other" not in scores
    # limit keeps the top by score
    top1 = run_expression(
        'significantTerms(d, q="source:a", field="text", limit="1")',
        {**colls, "d": docs}).collect()
    assert len(top1) == 1 and top1[0]["term"] == "rare"


def test_dispatch_score_nodes(spark, colls):
    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("a", "niche")],
        ["src", "dst"])
    roots = spark.createDataFrame([("a",), ("b",)], ["node_id"])
    out = run_expression(
        'scoreNodes(gatherNodes(g, search(r, q=*:*, fl="node_id", '
        'sort="node_id asc"), walk="node_id->src", gather="dst"), '
        'edges="g", to="dst")',
        {**colls, "g": edges, "r": roots}).collect()
    rows = {r["node"]: r for r in out}
    # hub reached from a+b (count from gatherNodes dedup = 1 each after
    # dedup -> groupBy counts occurrences in the stream)
    assert set(rows) == {"hub", "niche"}
    # niche (df=1) outscores hub (df=3) at equal stream counts
    if rows["hub"]["count"] == rows["niche"]["count"]:
        assert rows["niche"]["score"] > rows["hub"]["score"]


def test_dispatch_random_deterministic(colls):
    expr = ('random(orders, q="o_orderstatus:F", fl="o_orderkey", '
            'rows="5", seed="3")')
    a = [r["o_orderkey"] for r in run_expression(expr, colls).collect()]
    b = [r["o_orderkey"] for r in run_expression(expr, colls).collect()]
    assert a == b and len(a) == 5
    other = [r["o_orderkey"] for r in run_expression(
        'random(orders, q="o_orderstatus:F", fl="o_orderkey", '
        'rows="5", seed="4")', colls).collect()]
    assert set(other) != set(a)


def test_dispatch_let_get(colls):
    """LetStream/GetStream: later bindings see earlier ones; variables
    shadow collections inside the let; trailing expression is the result."""
    out = run_expression(
        'let(a=search(orders, q="o_orderstatus:F", '
        'fl="o_orderkey,o_totalprice", sort="o_orderkey asc"), '
        'b=having(get(a), gt(o_totalprice, 100000)), '
        'top(get(b), n="3", sort="o_totalprice desc"))', colls)
    rows = out.collect()
    assert len(rows) == 3
    assert rows[0]["o_totalprice"] >= rows[1]["o_totalprice"]
    assert all(r["o_totalprice"] > 100000 for r in rows)


def test_dispatch_let_requires_trailing_expr(colls):
    with pytest.raises(ValueError, match="trailing expression"):
        run_expression('let(a=search(orders, sort="o_orderkey asc"))', colls)


def test_dispatch_get_unknown_raises(colls):
    with pytest.raises(ValueError, match="no such let variable"):
        run_expression('get(zzz)', colls)


def test_dispatch_tuple(colls):
    row = run_expression('tuple(x=add(1, 2), y=4, z=mult(2, val(3)))',
                         colls).collect()[0]
    assert (row["x"], row["y"]) == (3, 4)
    # tuple sees ONE row
    assert run_expression('tuple(x=1)', colls).count() == 1


def test_dispatch_tuple_stream_value_raises(colls):
    with pytest.raises(ValueError, match="stream-valued"):
        run_expression(
            'let(a=search(orders, sort="o_orderkey asc"), tuple(t=a))',
            colls)


def test_evaluator_registry_fallback(spark, colls):
    """select() expression columns dispatch through the full Lang census
    registry (functions/evaluators.ev) when the name isn't in the scalar
    core: sqrt/ln/ceil work from expression text; unknown names and
    out-of-scope names stay loud."""
    df = spark.createDataFrame([(4.0,), (9.0,)], ["v"])
    out = run_expression(
        'select(search(d, q=*:*, fl="v", sort="v asc"), '
        'sqrt(v) as r, ceil(v) as c)', {**colls, "d": df}).collect()
    assert [(r["r"], r["c"]) for r in out] == [(2.0, 4), (3.0, 9)]
    with pytest.raises(ValueError, match="unknown evaluator"):
        run_expression(
            'select(search(d, q=*:*, fl="v", sort="v asc"), zzz(v) as z)',
            {**colls, "d": df})


def test_dispatch_knn_mlt(spark, colls):
    """KnnStream: knn(collection, id=, qf=, k=) ranks neighbours by shared
    rare terms with the seed; the seed itself is excluded; qf/id required."""
    docs = spark.createDataFrame(
        [(0, "alpha beta rare"), (1, "alpha beta rare"),
         (2, "alpha common"), (3, "unrelated words")],
        ["doc_id", "text"])
    out = run_expression('knn(d, id="0", qf="text", k="3")',
                         {**colls, "d": docs}).collect()
    ids = [r["doc_id"] for r in out]
    assert 0 not in ids and ids[0] == 1  # identical doc ranks first
    with pytest.raises(ValueError, match="requires qf"):
        run_expression('knn(d, id="0")', {**colls, "d": docs})


def test_dispatch_train_tlogit(spark, colls):
    """TextLogitStream: train() selects top-igain features then fits the
    deterministic logistic regression; output is (term, weight) rows plus
    __intercept__; the discriminative token gets a positive weight."""
    docs = spark.createDataFrame(
        [(i, ("spamword buy now" if i % 2 else "normal message text"),
          1 if i % 2 else 0) for i in range(20)],
        ["doc_id", "text", "y"])
    out = run_expression(
        'train(d, q=*:*, field="text", outcome="y", numTerms="3", '
        'maxIterations="8")', {**colls, "d": docs}).collect()
    w = {r["term"]: r["weight"] for r in out}
    assert "__intercept__" in w and len(w) == 4
    # every token is perfectly class-separating here, so igain ties and the
    # deterministic (ig desc, term asc) order picks alphabetically: 'buy'
    # (positive class) and 'message'/'normal' (negative class)
    assert w["buy"] > 0 and w["message"] < 0
    with pytest.raises(ValueError, match="requires outcome"):
        run_expression('train(d, field="text")', {**colls, "d": docs})


def test_dispatch_list_plist(spark, colls):
    """ListStream/PlistStream: sub-streams concatenate with _list_idx
    carrying declaration order; columns union by name with null fill."""
    a = spark.createDataFrame([(1, "x")], ["id", "s"])
    b = spark.createDataFrame([(2,), (3,)], ["id"])
    out = run_expression(
        'list(search(a, q=*:*, sort="id asc"), search(b, q=*:*, '
        'sort="id asc"))', {**colls, "a": a, "b": b}).collect()
    by_idx = sorted((r["_list_idx"], r["id"], r["s"]) for r in out)
    assert by_idx == [(0, 1, "x"), (1, 2, None), (1, 3, None)]
    same = run_expression(
        'plist(search(a, q=*:*, sort="id asc"), search(b, q=*:*, '
        'sort="id asc"))', {**colls, "a": a, "b": b}).count()
    assert same == 3


# ---------------------------------------------------------------- stateful
# streams: update/commit/topic/daemon + classify/parallel/eval/drill


def test_dispatch_update_topic_daemon(spark, tmp_path):
    """daemon(update(dest, topic(...))) — the reference's incremental
    indexing loop: each daemon run indexes only rows above the watermark."""
    from solr_spark.config import IndexConfig
    from solr_spark.data import synth_transcripts_spark
    from solr_spark.indexing import build_index
    from solr_spark.query import IndexReader, bm25_topk

    corpus = synth_transcripts_spark(spark, 400, seed=11).withColumn(
        "rank_ts", F.col("turn_idx").cast("long"))
    base = corpus.where(F.col("conv_id") < "c")  # deterministic split? no —
    # split by hash instead for stability
    base = corpus.where(F.crc32(F.col("conv_id")) % 2 == 0)
    extra = corpus.where(F.crc32(F.col("conv_id")) % 2 == 1)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(range_shift=8, num_term_buckets=16)
    build_index(spark, base, idx, cfg, input_token="t0")

    colls = {"incoming": extra}
    out = run_expression(
        'daemon(update(dest, topic(ck, incoming, versionField="rank_ts")), '
        'runs=2)',
        colls, index_dirs={"dest": idx},
        checkpoint_dir=str(tmp_path / "ck"), config=cfg)
    rows = out.collect()
    # run 0 indexes everything, run 1 sees an advanced watermark -> 0 new
    by_run = {r.DAEMON_RUN: r.batchIndexed for r in rows}
    assert by_run[0] == extra.count()
    assert by_run[1] == 0
    # the incrementally-built index equals a fresh full build, query-wise
    full_idx = str(tmp_path / "full")
    build_index(spark, corpus, full_idx, cfg, input_token="t1")
    q = "error timeout"
    inc = bm25_topk(spark, IndexReader.open(idx), q, k=10).collect()
    ful = bm25_topk(spark, IndexReader.open(full_idx), q, k=10).collect()
    assert [(r.conv_id, r.turn_idx, round(r.score, 6)) for r in inc] == \
           [(r.conv_id, r.turn_idx, round(r.score, 6)) for r in ful]


def test_dispatch_commit_passthrough(spark, tmp_path):
    from solr_spark.config import IndexConfig
    from solr_spark.data import synth_transcripts_spark
    from solr_spark.indexing import build_index

    corpus = synth_transcripts_spark(spark, 100, seed=5)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(range_shift=8, num_term_buckets=16)
    build_index(spark, corpus.limit(50), idx, cfg, input_token="t0")
    out = run_expression(
        'commit(dest, update(dest, search(more, q=*:*, fl="conv_id,turn_idx,'
        'text", sort="conv_id asc")))',
        {"more": corpus.limit(60).subtract(corpus.limit(50))},
        index_dirs={"dest": idx}, config=cfg)
    assert out.collect()[0].batchIndexed == 10


def test_dispatch_classify(spark, colls):
    """classify(train(...), search(...)) adds score_d/probability_d from the
    trained weights."""
    docs = colls["events"].select(
        "event_id", F.col("event_type").alias("text"),
        (F.crc32("event_type") % 2 == 0).cast("int").alias("y"))
    local = {"train_docs": docs, "apply_docs": docs}
    out = run_expression(
        'classify(train(train_docs, q=*:*, field="text", outcome="y", '
        'numTerms="4", maxIterations="5"), '
        'search(apply_docs, q=*:*, fl="event_id,text", sort="event_id asc"))',
        local)
    rows = out.limit(200).collect()
    assert all(0.0 <= r.probability_d <= 1.0 for r in rows)
    # label is a pure function of the token, so trained probabilities must
    # separate the two classes
    import statistics
    import zlib
    pos = [r.probability_d for r in rows
           if zlib.crc32(r.text.encode()) % 2 == 0]
    neg = [r.probability_d for r in rows
           if zlib.crc32(r.text.encode()) % 2 == 1]
    assert pos and neg
    assert statistics.mean(pos) > statistics.mean(neg)
    # score_d is the raw margin: sigmoid(score_d) == probability_d
    import math
    for r in rows[:10]:
        assert abs(1.0 / (1.0 + math.exp(-r.score_d)) - r.probability_d) < 1e-9


def test_dispatch_parallel_and_outer_hash_join(colls):
    seq = run_expression(
        'rollup(search(orders, q=*:*, fl="o_custkey,o_totalprice", '
        'sort="o_custkey asc"), over="o_custkey", sum(o_totalprice))', colls)
    par = run_expression(
        'parallel(workers, rollup(search(orders, q=*:*, fl="o_custkey,'
        'o_totalprice", sort="o_custkey asc"), over="o_custkey", '
        'sum(o_totalprice)), workers=4, sort="o_custkey asc")', colls)
    a = [(r[0], round(float(r[1]), 2)) for r in seq.orderBy("o_custkey").collect()]
    b = [(r[0], round(float(r[1]), 2)) for r in par.collect()]
    assert a == b
    oj = run_expression(
        'outerHashJoin(search(nation, q=*:*, fl="n_nationkey,n_name,'
        'n_regionkey", sort="n_nationkey asc"), '
        'hashed=search(region, q="r_name:ASIA", fl="r_regionkey,r_name", '
        'sort="r_regionkey asc"), on="n_regionkey=r_regionkey")', colls)
    rows = oj.collect()
    assert len(rows) == colls["nation"].count()  # left outer keeps all
    assert any(r.r_name is None for r in rows)
    assert any(r.r_name == "ASIA" for r in rows)


def test_dispatch_eval_and_drill(spark, colls):
    ev = run_expression(
        'eval(tuple(expr_s="echo(hello world)"))', colls)
    assert ev.collect()[0].echo == "hello world"
    dr = run_expression(
        'drill(lineitem, q=*:*, fl="l_returnflag,l_quantity", '
        'sort="l_returnflag asc", '
        'rollup(input(), over="l_returnflag", sum(l_quantity)))', colls)
    direct = (colls["lineitem"].groupBy("l_returnflag")
              .agg(F.sum("l_quantity")).collect())
    got = {r[0]: float(r[1]) for r in dr.collect()}
    want = {r[0]: float(r[1]) for r in direct}
    assert got == want
    with pytest.raises(ValueError, match="input"):
        run_expression('input()', colls)


def test_dispatch_shuffle_and_null(colls):
    sh = run_expression(
        'shuffle(orders, q=*:*, fl="o_orderkey", sort="o_orderkey asc", '
        'rows="5")', colls)
    assert [r.o_orderkey for r in sh.collect()] == sorted(
        r.o_orderkey for r in sh.collect())
    nl = run_expression(
        'null(search(orders, q="o_orderstatus:F", fl="o_orderkey", '
        'sort="o_orderkey asc"))', colls)
    n = nl.collect()
    assert len(n) == 1 and n[0].nullCount == colls["orders"].where(
        "o_orderstatus = 'F'").count()


def test_dispatch_analyze_evaluator(spark, colls):
    """analyze(field) (AnalyzeEvaluator) matches the direct JVM analyzer
    chain, and cartesianProduct explodes its token array."""
    from solr_spark.analysis.analyzer import tokenize_column

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    c = dict(colls, documents=docs)
    out = run_expression(
        'select(search(documents, q=*:*, fl="doc_id,text", '
        'sort="doc_id asc"), doc_id as doc_id, analyze(text) as terms)', c)
    direct = docs.select("doc_id",
                         tokenize_column("text").alias("terms"))
    assert out.orderBy("doc_id").collect() == \
        direct.orderBy("doc_id").collect()
    exploded = run_expression(
        'cartesianProduct(select(search(documents, q=*:*, fl="doc_id,text", '
        'sort="doc_id asc"), doc_id as doc_id, analyze(text) as terms), '
        'terms)', c)
    n_tokens = docs.select(F.explode(tokenize_column("text"))).count()
    assert exploded.count() == n_tokens
    with pytest.raises(ValueError, match="text_general"):
        run_expression(
            'select(search(documents, q=*:*, fl="doc_id,text", '
            'sort="doc_id asc"), analyze(text, text_en) as terms)', c)


def test_dispatch_delete_stream(spark, tmp_path):
    """delete(dest, <stream>) tombstones the inner stream's docids; a
    subsequent search no longer returns them (liveDocs semantics)."""
    from solr_spark.config import IndexConfig
    from solr_spark.data import synth_transcripts_spark
    from solr_spark.indexing import build_index
    from solr_spark.query import IndexReader, bm25_topk

    corpus = synth_transcripts_spark(spark, 200, seed=7)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(range_shift=8, num_term_buckets=16)
    build_index(spark, corpus, idx, cfg, input_token="t0")
    reader = IndexReader.open(idx)
    before = bm25_topk(spark, reader, "error timeout", k=5).collect()
    assert before
    victim = before[0]
    fwd = reader.forward(spark)
    doomed = fwd.where((F.col("conv_id") == victim.conv_id) &
                       (F.col("turn_idx") == victim.turn_idx))
    out = run_expression(
        'delete(dest, search(victims, q=*:*, fl="docid", sort="docid asc"))',
        {"victims": doomed.select("docid")}, index_dirs={"dest": idx})
    row = out.collect()[0]
    assert row.dest == "dest" and row.totalDeleted == 1
    after = bm25_topk(spark, IndexReader.open(idx), "error timeout",
                      k=5).collect()
    assert (victim.conv_id, victim.turn_idx) not in \
        [(r.conv_id, r.turn_idx) for r in after]
    with pytest.raises(ValueError, match="not registered"):
        run_expression(
            'delete(other, search(victims, q=*:*, fl="docid", '
            'sort="docid asc"))',
            {"victims": doomed.select("docid")}, index_dirs={"dest": idx})


def test_dispatch_cell(colls):
    """cell(name, <stream>) collapses the stream to one tuple holding the
    list of inner tuples (canonical field order, documented deviation)."""
    out = run_expression(
        'cell(rows, search(nation, q=*:*, fl="n_nationkey,n_name", '
        'sort="n_nationkey asc"))', colls)
    rows = out.collect()
    assert len(rows) == 1
    got = [(t.n_nationkey, t.n_name) for t in rows[0].rows]
    want = [(r.n_nationkey, r.n_name) for r in
            colls["nation"].orderBy("n_nationkey").collect()]
    assert got == want
