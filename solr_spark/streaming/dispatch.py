"""Streaming-expression dispatcher: parsed expression tree -> DataFrame program.

The reference side of this file is StreamFactory
(solr/solrj-streaming/src/java/org/apache/solr/client/solrj/io/stream/expr/
StreamFactory.java:219 constructStream — a registry mapping function names to
TupleStream classes). Here the same registry maps names to builders over the
already-implemented DataFrame operators (solr_spark.operators.*), so a user's
expression STRING runs unchanged:

    run_expression('rollup(search(tbl, q="f:v", fl="a,b", sort="a asc"), '
                   'over="a", sum(b))', {"tbl": df})

Collections resolve against a {name: DataFrame} dict — the Spark analog of a
collection is any DataFrame (parquet table, Iceberg table, or a sub-program).
`q`/`fq` strings go through the classic lucene parser (filter semantics,
solr_spark.query.parser) and therefore push down to the scan; everything else
is declarative Column algebra, so Catalyst still sees one whole plan per
expression — the string front-end adds zero execution overhead.

Per-function reference citations live on each handler. Stateful streams
(`update`/`commit`/`topic`/`daemon`) are registered too: they need
`index_dirs=` / `checkpoint_dir=` passed to `run_expression`, and their
side effects (segment adds, watermark advances) happen EAGERLY at dispatch
time — the batch analog of the reference's push-as-you-stream semantics.
Not registered (with reasons): `jdbc` (spark.read.jdbc is the idiomatic
spelling), `executor` (a distributed task queue — Spark's scheduler role).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solr_spark.query.parser import parse_query
from solr_spark.operators import streams, windows
from solr_spark.operators.graph import gather_nodes, shortest_path
from solr_spark.streaming.exprparser import (
    NamedParam, StreamExpr, parse_expression,
)


@dataclass
class _Ctx:
    collections: dict
    default_field: str
    text_fields: set | None
    index_dirs: dict | None = None      # name -> index dir (update/commit)
    checkpoint_dir: str | None = None   # topic() watermark files
    config: object = None               # IndexConfig for update()


# ---------------------------------------------------------------- helpers

_SORT_PART = re.compile(r"^\s*([\w.()*]+)(?:\s+(asc|desc))?\s*$", re.I)


def _sort_cols(spec: str) -> list[Column]:
    """'a asc, b desc' -> [asc(a), desc(b)] (SortStream/StreamComparator)."""
    cols = []
    for part in spec.split(","):
        m = _SORT_PART.match(part)
        if not m:
            raise ValueError(f"bad sort spec part: {part!r}")
        c = F.col(m.group(1))
        cols.append(c.desc() if (m.group(2) or "asc").lower() == "desc"
                    else c.asc())
    return cols


def _fields(spec: str) -> list[str]:
    return [f.strip() for f in spec.split(",") if f.strip()]


_METRIC_FNS = {
    "sum": F.sum, "min": F.min, "max": F.max,
    "avg": F.avg, "mean": F.avg, "std": F.stddev_samp,
    "countDist": F.count_distinct,
}


def _metric(e: StreamExpr) -> Column:
    """One metric sub-expression -> aliased aggregate Column.

    Reference: io/stream/metrics/{Sum,Min,Max,Mean,Count,Std,Per,CountDist}
    Metric.java — the output tuple key is the literal metric text, e.g.
    `sum(a_i)`; we keep that convention so expression users see the same
    column names.
    """
    args = e.positional_values()
    label = f"{e.name}({','.join(args)})"
    if e.name == "count":
        inner = F.lit(1) if args == ["*"] else F.col(args[0])
        return F.count(inner).alias(label)
    if e.name == "per":  # per(field, pct) -> exact percentile at batch scale
        fld, pct = args[0], float(args[1])
        return F.percentile(F.col(fld), F.lit(pct / 100.0)).alias(label)
    fn = _METRIC_FNS.get(e.name)
    if fn is None:
        raise ValueError(f"unknown metric function: {e.name!r}")
    return fn(args[0]).alias(label)


_NUM_RE = re.compile(r"^-?\d+(\.\d+)?$")

_ARITH = {"add": lambda a, b: a + b, "sub": lambda a, b: a - b,
          "mult": lambda a, b: a * b, "div": lambda a, b: a / b,
          "pow": lambda a, b: a ** b, "mod": lambda a, b: a % b}
_BOOL = {"eq": lambda a, b: a == b, "gt": lambda a, b: a > b,
         "lt": lambda a, b: a < b, "gteq": lambda a, b: a >= b,
         "lteq": lambda a, b: a <= b}


def _evaluator(node) -> Column:
    """Evaluator sub-language -> Column (io/eval/*Evaluator.java).

    Covers the arithmetic/boolean/conditional core used by select() and
    having(); the ~150-strong math long tail lives as named Python functions
    in solr_spark.functions.evaluators (documented split: expressions embed
    the scalar core, programs call the vector/matrix evaluators directly).
    """
    if isinstance(node, str):
        v = node.strip()
        if _NUM_RE.match(v):
            return F.lit(float(v) if "." in v else int(v))
        return F.col(v)
    assert isinstance(node, StreamExpr), node
    if node.name == "analyze":
        # AnalyzeEvaluator (handler/AnalyzeEvaluator.java:49): run a field
        # through an analyzer chain, yielding the token array — typically
        # exploded with cartesianProduct(..., analyze(text) as term). The
        # chain runs as the pure-JVM Column analyzer (tokenize_column), so
        # the evaluator stays inside whole-stage codegen. The optional
        # second positional is the fieldType name; only the default
        # text_general chain has a JVM expression form (stemming chains are
        # Arrow-kernel-only and can't be embedded in expression text).
        from solr_spark.analysis.analyzer import tokenize_column

        pos = [p for p in node.params if not isinstance(p, NamedParam)]
        if not pos:
            raise ValueError("analyze() needs a field to analyze")
        if len(pos) > 1:
            ftype = pos[1] if isinstance(pos[1], str) else None
            if ftype != "text_general":
                raise ValueError(
                    f"analyze(): fieldType {ftype!r} has no expression-"
                    "embeddable chain (only text_general; stemming chains "
                    "run as Arrow kernels in the index build)")
        return tokenize_column(_evaluator(pos[0]))
    args = [_evaluator(p) for p in node.params if not isinstance(p, NamedParam)]
    name = node.name
    if name in _ARITH:
        out = args[0]
        for a in args[1:]:
            out = _ARITH[name](out, a)
        return out
    if name in _BOOL:
        return _BOOL[name](args[0], args[1])
    if name == "and":
        out = args[0]
        for a in args[1:]:
            out = out & a
        return out
    if name == "or":
        out = args[0]
        for a in args[1:]:
            out = out | a
        return out
    if name == "not":
        return ~args[0]
    if name == "abs":
        return F.abs(args[0])
    if name == "if":  # if(bool, then, else)
        return F.when(args[0], args[1]).otherwise(args[2])
    if name == "val":
        return F.lit(node.positional_values()[0])
    # fall back to the full Lang.java census registry
    # (functions/evaluators.py::ev — 166 implemented names): the scalar and
    # array evaluators are Column -> Column, so expression text like
    # select(..., sqrt(a_i) as r) dispatches straight through. A registry
    # evaluator whose signature needs non-Column parameters fails ITS call
    # loudly and surfaces here as unknown — never a silently-wrong Column.
    try:
        from solr_spark.functions.evaluators import ev

        return ev(name, *args)
    except NotImplementedError:
        raise
    except Exception as exc:
        raise ValueError(f"unknown evaluator: {name!r} "
                         f"(registry dispatch failed: {exc})") from exc


def _input_stream(ctx: _Ctx, e: StreamExpr) -> DataFrame:
    subs = e.sub_expressions()
    if not subs:
        raise ValueError(f"{e.name}() needs an input stream sub-expression")
    return _dispatch(ctx, subs[0])


def _collection(ctx: _Ctx, e: StreamExpr) -> DataFrame:
    names = e.positional_values()
    if not names:
        raise ValueError(f"{e.name}() needs a collection name")
    # facet("c1, c2", ...) reads several collections as one domain
    parts = _fields(names[0])
    df = ctx.collections[parts[0]]
    for p in parts[1:]:
        df = df.unionByName(ctx.collections[p], allowMissingColumns=True)
    return df


def _apply_q_fq(ctx: _Ctx, df: DataFrame, e: StreamExpr) -> DataFrame:
    for q in (e.named("q") or []) + (e.named("fq") or []):
        if q.strip() in ("*:*", ""):
            continue
        df = df.where(parse_query(q, ctx.default_field, ctx.text_fields))
    return df


def _join_keys(on: str) -> tuple[list[str], list[tuple[str, str]]]:
    """'a=b, c' -> (same-name keys, [(left,right) renames])."""
    same, renames = [], []
    for part in _fields(on):
        if "=" in part:
            l, r = (s.strip() for s in part.split("=", 1))
            renames.append((l, r))
        else:
            same.append(part)
    return same, renames


def _equi_join(ctx: _Ctx, e: StreamExpr, how: str) -> DataFrame:
    left, right = (_dispatch(ctx, s) for s in e.sub_expressions()[:2])
    same, renames = _join_keys(e.named1("on", ""))
    for l, r in renames:
        right = right.withColumnRenamed(r, l)
    keys = same + [l for l, _ in renames]
    return left.join(right, keys, how)


# ---------------------------------------------------------------- handlers
# Each cites the TupleStream it re-expresses (all under
# solr/solrj-streaming/src/java/org/apache/solr/client/solrj/io/stream/).


def _h_search(ctx, e):
    """CloudSolrStream.java:73 / /export. q+fq compile to pushed-down
    predicates; fl prunes the scan; sort=... maps to orderBy (the /export
    sorted-stream contract)."""
    df = _apply_q_fq(ctx, _collection(ctx, e), e)
    fl = e.named1("fl")
    sort = e.named1("sort")
    rows = e.named1("rows")
    df = streams.search(df, fl=_fields(fl) if fl else None,
                        sort=_sort_cols(sort) if sort else None)
    return df.limit(int(rows)) if rows else df


def _h_select(ctx, e):
    """SelectStream.java:46 — projection with `as` renames and evaluator
    columns ('add(a,b) as total')."""
    df = _input_stream(ctx, e)
    cols = []
    for part in e.positional_values():
        m = re.split(r"\s+as\s+", part, maxsplit=1)
        src = m[0].strip()
        node = parse_expression(src) if src.endswith(")") else src
        col = _evaluator(node)
        cols.append(col.alias(m[1].strip()) if len(m) == 2 else col)
    return df.select(*cols)


def _h_top(ctx, e):
    """RankStream.java:47 — bounded priority queue == TakeOrdered."""
    return streams.top(_input_stream(ctx, e), int(e.named1("n")),
                       _sort_cols(e.named1("sort")))


def _h_unique(ctx, e):
    """UniqueStream.java:44 — first tuple per over-key in stream order."""
    inner = e.sub_expressions()[0]
    sort = inner.named1("sort") if inner.name == "search" else None
    return streams.unique(_input_stream(ctx, e), _fields(e.named1("over")),
                          sort=_sort_cols(sort) if sort else None)


def _h_sort(ctx, e):
    """SortStream.java:43 — full re-sort (unlike top's bounded heap)."""
    return _input_stream(ctx, e).orderBy(*_sort_cols(e.named1("by")))


def _h_rollup(ctx, e):
    """RollupStream.java:48 — group-by-over with metric accumulators; Spark's
    hash aggregate does the same with map-side partial aggregation."""
    df = _input_stream(ctx, e)
    over = _fields(e.named1("over"))
    metrics = [_metric(m) for m in e.sub_expressions()[1:]]
    return df.groupBy(*over).agg(*metrics).orderBy(*over)


def _h_facet(ctx, e):
    """FacetStream.java:77 — JSON-facet push-down as an expression. bucketSorts
    may reference a metric ('sum(a_i) desc') or 'index'."""
    df = _apply_q_fq(ctx, _collection(ctx, e), e)
    buckets = _fields(e.named1("buckets"))
    metrics = [_metric(m) for m in e.sub_expressions()]
    out = df.groupBy(*buckets).agg(*metrics)
    sort_spec = e.named1("bucketSorts", "count(*) desc")
    sorts = []
    for part in _split_top(sort_spec):
        name, _, direction = part.strip().rpartition(" ")
        if not name:
            name, direction = direction, "asc"
        col = (F.col(buckets[0]) if name == "index"
               else F.col(f"`{name}`"))
        sorts.append(col.desc() if direction.lower() == "desc" else col.asc())
    out = out.orderBy(*sorts)
    limit = e.named1("bucketSizeLimit") or e.named1("rows")
    return out.limit(int(limit)) if limit else out


def _split_top(spec: str) -> list[str]:
    """Split 'sum(a_i) desc, count(*) asc' on commas outside parens."""
    parts, depth, cur = [], 0, []
    for c in spec:
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == "," and depth == 0:
            parts.append("".join(cur)); cur = []
        else:
            cur.append(c)
    if cur:
        parts.append("".join(cur))
    return parts


def _h_stats(ctx, e):
    """StatsStream.java:52 — one-row global aggregate."""
    df = _apply_q_fq(ctx, _collection(ctx, e), e)
    return df.agg(*[_metric(m) for m in e.sub_expressions()])


_GAP_UNITS = {"YEAR": "year", "MONTH": "month", "DAY": "day",
              "HOUR": "hour", "MINUTE": "minute", "SECOND": "second"}
_GAP_RE = re.compile(r"^\+?(\d+)([A-Z]+?)S?$")


def _h_timeseries(ctx, e):
    """TimeSeriesStream.java:55 — date-range facet. gap='+1DAY' etc.; only
    unit gaps (+1X) map to date_trunc buckets, matching the gate corpus."""
    df = _apply_q_fq(ctx, _collection(ctx, e), e)
    fld = e.named1("field")
    m = _GAP_RE.match(e.named1("gap", "+1DAY"))
    n, unit = int(m.group(1)), _GAP_UNITS[m.group(2)]
    if n != 1:
        raise ValueError("only unit gaps (+1YEAR/+1DAY/...) are supported")
    start, end = e.named1("start"), e.named1("end")
    if start:
        df = df.where(F.col(fld) >= F.lit(start).cast("timestamp"))
    if end:
        df = df.where(F.col(fld) <= F.lit(end).cast("timestamp"))
    metrics = [_metric(mm) for mm in e.sub_expressions()]
    bucket = F.date_trunc(unit, F.col(fld)).alias(fld)
    return df.groupBy(bucket).agg(*metrics).orderBy(fld)


def _h_merge(ctx, e):
    """MergeStream.java:46 — merge already-sorted streams on a comparator;
    union + orderBy yields the identical sequence."""
    subs = [_dispatch(ctx, s) for s in e.sub_expressions()]
    out = subs[0]
    for s in subs[1:]:
        out = out.unionByName(s)
    return out.orderBy(*_sort_cols(e.named1("on")))


def _h_having(ctx, e):
    """HavingStream.java:42 — boolean-evaluator filter over tuples."""
    bool_expr = e.sub_expressions()[1]
    return _input_stream(ctx, e).where(_evaluator(bool_expr))


def _h_reduce(ctx, e):
    """ReduceStream.java:39 with GroupOperation — top-n per by-key."""
    group = next(s for s in e.sub_expressions() if s.name == "group")
    df = _input_stream(ctx, e)
    by = _fields(e.named1("by"))
    return windows.group_top_n(df, by[0], _sort_cols(group.named1("sort")),
                               int(group.named1("n"))).drop("group_rank")


def _h_fetch(ctx, e):
    """FetchStream.java:53 — batched lookup enrich; broadcast lookup join."""
    dim = _collection(ctx, e)
    stream = _input_stream(ctx, e)
    same, renames = _join_keys(e.named1("on", ""))
    for l, r in renames:
        dim = dim.withColumnRenamed(r, l)
    keys = same + [l for l, _ in renames]
    return streams.fetch(stream, dim, keys, _fields(e.named1("fl")))


def _h_cartesian(ctx, e):
    """CartesianProductStream.java:47 — unnest a multivalued field."""
    fld = e.positional_values()[0]
    out = streams.cartesian_product(_input_stream(ctx, e), fld, fld)
    sort = e.named1("productSort")
    return out.orderBy(*_sort_cols(sort)) if sort else out


def _h_gather_nodes(ctx, e):
    """GatherNodesStream.java:63 — one breadth-first expansion per call.
    Seed form: walk="rootValue->fromField"; stream form: walk="col->fromField"
    with an inner stream providing the seed column."""
    edges = _collection(ctx, e)
    seed, from_col = (s.strip() for s in e.named1("walk").split("->"))
    to_col = e.named1("gather")
    subs = e.sub_expressions()
    if subs:
        roots = _dispatch(ctx, subs[0]).select(F.col(seed).alias("node"))
    else:
        roots = edges.sparkSession.createDataFrame([(seed,)], ["node"])
        roots = roots.select(F.col("node").cast(edges.schema[from_col].dataType))
    out = gather_nodes(edges, roots, from_col, to_col, levels=1)
    return out.select(F.col("node").alias(to_col), "level").orderBy(to_col)


def _h_shortest_path(ctx, e):
    """ShortestPathStream.java:59 — level-synchronous BFS; returns one row per
    path hop (path as ordered rows, the tuple-stream analog of its path lists)."""
    edges = _collection(ctx, e)
    from_col, to_col = (s.strip() for s in e.named1("edge").split("="))
    src = e.named1("from")
    dst = e.named1("to")
    typ = edges.schema[from_col].dataType
    import pyspark.sql.types as T
    if not isinstance(typ, T.StringType):
        src, dst = int(src), int(dst)
    path = shortest_path(edges, src, dst, from_col, to_col,
                         max_depth=int(e.named1("maxDepth", 10)))
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(path)],
        f"hop INT, node {'STRING' if isinstance(typ, T.StringType) else 'BIGINT'}",
    )


def _h_echo(ctx, e):
    """EchoStream.java:36."""
    txt = e.positional_values()[0]
    any_df = next(iter(ctx.collections.values()))
    return any_df.sparkSession.createDataFrame([(txt,)], ["echo"])


def _h_let(ctx, e):
    """LetStream.java:63 — bind named sub-streams to variables IN ORDER
    (later bindings and the trailing expression see earlier ones), then
    evaluate the trailing expression. Variables shadow collection names for
    the duration of the let, exactly the reference's variable map pushed
    into the StreamContext. String values bind as-is (the reference's
    non-stream lets)."""
    scope = dict(ctx.collections)
    inner = _Ctx(scope, ctx.default_field, ctx.text_fields)
    result = None
    for p in e.params:
        if isinstance(p, NamedParam):
            v = p.value
            scope[p.name] = (_dispatch(inner, v)
                             if isinstance(v, StreamExpr) else v)
        elif isinstance(p, StreamExpr):
            result = _dispatch(inner, p)
    if result is None:
        raise ValueError("let() needs a trailing expression to evaluate")
    return result


def _h_get(ctx, e):
    """GetStream.java:42 — replay a let-bound stream by variable name."""
    names = e.positional_values()
    if not names:
        raise ValueError("get() needs a variable name")
    df = ctx.collections.get(names[0])
    if df is None:
        raise ValueError(f"get({names[0]!r}): no such let variable or "
                         f"collection (bound: {sorted(ctx.collections)})")
    return df


def _h_tuple(ctx, e):
    """TupStream.java:48 — a ONE-row stream of named evaluator values
    (x=add(1,2), y=3). Stream-valued entries (x=<let variable>) raise: the
    reference attaches them in stream arrival order, which a distributed
    collect can't reproduce deterministically — read the variable with
    get() instead."""
    any_df = next(iter(ctx.collections.values()))
    spark = any_df.sparkSession
    cols = []
    for p in e.params:
        if not isinstance(p, NamedParam):
            continue
        v = p.value
        if isinstance(v, str) and v.strip() in ctx.collections \
                and not _NUM_RE.match(v.strip()):
            raise ValueError(
                f"tuple({p.name}={v}): stream-valued tuple entries are not "
                "supported (arrival order is nondeterministic on a cluster) "
                "— use get() to read the bound stream")
        if isinstance(v, str) and not _NUM_RE.match(v.strip()):
            # a bare string in tuple() is a constant (TupStream evaluates
            # literals; there is no row context for a column reference)
            cols.append(F.lit(v).alias(p.name))
        else:
            cols.append(_evaluator(v).alias(p.name))
    if not cols:
        raise ValueError("tuple() needs at least one named value")
    return spark.range(1).select(*cols)


def _h_knn(ctx, e):
    """KnnStream.java:55 — text k-nearest-neighbours via MoreLikeThis:
    knn(collection, id=<doc>, qf=<text field>, k=<n>[, maxqt=<seed terms>,
    docId=<key col>]). The seed doc's top idf terms become a disjunction
    ranked by summed idf (operators/streams.py::more_like_this — seed terms
    broadcast, one shuffle over the selected postings). mintf/mindf/boost
    long tail documented out of scope on the operator."""
    df = _collection(ctx, e)
    field = e.named1("qf")
    if field is None:
        raise ValueError("knn() requires qf= (the text field)")
    id_col = e.named1("docId", "doc_id")
    seed_id = e.named1("id")
    if seed_id is None:
        raise ValueError("knn() requires id= (the seed document)")
    typ = df.schema[id_col].dataType.simpleString()
    seed = seed_id if typ == "string" else int(seed_id)
    n_docs = df.count()
    pairs = df.select(
        F.col(id_col),
        F.explode(F.filter(F.split(F.col(field), " "),
                           lambda t: t != "")).alias("term"))
    return streams.more_like_this(
        pairs, seed, n_docs, doc_col=id_col,
        k=int(e.named1("k", 10)),
        max_query_terms=int(e.named1("maxqt", 25)))


def _h_list(ctx, e):
    """ListStream.java:42 / PlistStream — emit each sub-stream's tuples,
    streams in declaration order. A `_list_idx` column carries which
    sub-stream each row came from (the cluster-safe restatement of the
    reference's sequential-open ordering: consumers sort or filter on it;
    Spark runs the branches in parallel, which is exactly plist's point).
    Columns union by name with nulls for the missing ones."""
    subs = e.sub_expressions()
    if not subs:
        raise ValueError("list() needs at least one sub-stream")
    out = None
    for i, s in enumerate(subs):
        part = _dispatch(ctx, s).withColumn("_list_idx", F.lit(i))
        out = part if out is None else out.unionByName(
            part, allowMissingColumns=True)
    return out


def _h_features_selection(ctx, e):
    """FeaturesSelectionStream.java:59 — top numTerms= features of field=
    by information gain against the binary outcome= column over the q=
    match set (operators/classify.py::igain_terms: one distinct-(doc,term)
    explode + one groupBy, totals broadcast)."""
    df = _apply_q_fq(ctx, _collection(ctx, e), e)
    outcome = e.named1("outcome")
    if outcome is None:
        raise ValueError("featuresSelection() requires outcome= "
                         "(the binary label column)")
    from solr_spark.operators.classify import igain_terms

    return igain_terms(df, e.named1("field", ctx.default_field), outcome,
                       k=int(e.named1("numTerms", 10)))


def _h_train(ctx, e):
    """TextLogitStream.java:61 — logistic regression over the top-igain
    token-presence features: train(collection, q=, field=, outcome=,
    numTerms=, maxIterations=). Feature selection and the per-iteration
    gradient pass both run as bounded aggregations (classify.igain_terms /
    tlogit_train — weights travel as broadcast literals, the reference's
    ship-the-weight-vector-to-every-shard shape). Emits the trained model as
    rows: (term, weight) per feature plus an `__intercept__` row, the
    relational restatement of the reference's final weight tuple."""
    df = _apply_q_fq(ctx, _collection(ctx, e), e)
    outcome = e.named1("outcome")
    if outcome is None:
        raise ValueError("train() requires outcome= (the binary label column)")
    field = e.named1("field", ctx.default_field)
    from solr_spark.operators.classify import igain_terms, tlogit_train

    feats = [r["term"] for r in
             igain_terms(df, field, outcome,
                         k=int(e.named1("numTerms", 10))).collect()]
    model = tlogit_train(df, field, outcome, feats,
                         iters=int(e.named1("maxIterations", 10)))
    rows = sorted(model["weights"].items()) + [
        ("__intercept__", model["intercept"])]
    return df.sparkSession.createDataFrame(rows, "term string, weight double")


def _h_significant_terms(ctx, e):
    """SignificantTermsStream.java:57 — q= defines the FOREGROUND document
    set, the whole collection is the background; terms come from whitespace
    tokens of field= (default the context's default field). id= names the
    document key column (the uniqueKey analog; default doc_id).
    minDocFreq= floors the background df; limit= keeps the top-N by lift
    (score desc, term asc). Only foreground terms are returned, as the
    reference. One conditional-aggregation shuffle (operators/streams.py::
    significant_terms)."""
    df = _collection(ctx, e)
    field = e.named1("field", ctx.default_field)
    id_col = e.named1("id", "doc_id")
    qs = e.named1("q", "*:*")
    fg = (F.lit(True) if qs.strip() in ("*:*", "")
          else parse_query(qs, ctx.default_field, ctx.text_fields))
    pairs = df.select(
        F.col(id_col), fg.alias("__fg_mark"),
        F.explode(F.filter(F.split(F.col(field), " "),
                           lambda t: t != "")).alias("term"))
    out = streams.significant_terms(
        pairs, F.col("__fg_mark"), term_col="term", doc_col=id_col,
        min_doc_freq=int(e.named1("minDocFreq", 1)))
    out = out.where(F.col("fg") > 0).orderBy(F.desc("score"), F.asc("term"))
    limit = e.named1("limit")
    return out.limit(int(limit)) if limit else out


def _h_score_nodes(ctx, e):
    """ScoreNodesStream.java:63 — TF-IDF relevance for traversal-gathered
    nodes. The reference resolves each node's global df by re-querying the
    collection recorded in the node tuples' metadata; collections here are
    plain DataFrames, so the edge table and its to-column are explicit named
    params: scoreNodes(<nodes>, edges=<collection>, to=<col>[, node=<col>]).
    node= names the input stream's node column (default: the to= name).
    Occurrence counts are taken from a `count` column when the input has one,
    else counted from the stream."""
    nodes = _input_stream(ctx, e)
    edges = ctx.collections[e.named1("edges")]
    to = e.named1("to")
    node_col = e.named1("node", to)
    if "count" in nodes.columns:
        hits = nodes.select(F.col(node_col).alias("node"), "count")
    else:
        hits = (nodes.groupBy(F.col(node_col).alias("node"))
                .agg(F.count(F.lit(1)).alias("count")))
    from solr_spark.operators.graph import score_nodes

    return score_nodes(hits, edges, to)


def _h_random(ctx, e):
    """RandomStream.java:60 — pseudo-random sample of the q= match set.
    The reference shuffles with a per-session Random; a cluster engine needs
    reruns and retried partitions to agree, so the order here is the
    DETERMINISTIC md5 used across functions/sampling.py: md5 over the fl
    values joined with 0x1f plus seed= (default 0). Same q/fl/seed ->
    byte-identical sample on every engine and every rerun; vary seed= for a
    fresh draw. TakeOrdered — no global sort materializes."""
    df = _apply_q_fq(ctx, _collection(ctx, e), e)
    fl = _fields(e.named1("fl"))
    seed = e.named1("seed", "0")
    key = F.md5(F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in fl], F.lit(seed)))
    rows = int(e.named1("rows", 10))
    return (df.select(*fl)
              .orderBy(key.asc(), *[F.col(c).asc() for c in fl])
              .limit(rows))


def _h_update(ctx, e):
    """UpdateStream.java:60 — update(dest, <stream>): push the inner
    stream's tuples into the destination index as a fresh NRT segment
    (indexing.merge.add_documents), EAGERLY at dispatch time (the reference
    indexes as it pulls tuples), then emit the batch-summary tuple the
    reference emits (batchIndexed / totalIndexed). `dest` resolves through
    run_expression's `index_dirs=` mapping."""
    names = e.positional_values()
    if not names:
        raise ValueError("update() needs a destination collection name")
    dest = names[0]
    if not ctx.index_dirs or dest not in ctx.index_dirs:
        raise ValueError(
            f"update() destination {dest!r} not registered — pass "
            f"index_dirs={{{dest!r}: <index path>}} to run_expression")
    df = _input_stream(ctx, e)
    spark = df.sparkSession
    n = df.count()
    if n:
        from solr_spark.config import DEFAULT_CONFIG
        from solr_spark.indexing.merge import add_documents

        stats = add_documents(spark, df, ctx.index_dirs[dest],
                              ctx.config or DEFAULT_CONFIG)
        total = stats["n_docs"]
    else:
        import json as _json
        import os as _os

        with open(_os.path.join(ctx.index_dirs[dest], "stats.json")) as f:
            total = _json.load(f)["n_docs"]
    return spark.createDataFrame(
        [(dest, n, total)],
        "dest string, batchIndexed long, totalIndexed long")


def _h_delete(ctx, e):
    """DeleteStream.java:44 — delete(dest, <stream>): each inner tuple's id
    becomes a delete-by-id against the destination index. Our document
    identity is the dense docid (indexing/docids.py), so the inner stream
    supplies a `docid` column (override with id=<col>); deletes are LSM
    tombstones (indexing/deletes.py) consulted at collect time and purged
    at merge, exactly the liveDocs flow the reference wraps. Emits the
    reference's batch-summary tuple shape (totalDeleted)."""
    names = e.positional_values()
    if not names:
        raise ValueError("delete() needs a destination collection name")
    dest = names[0]
    if not ctx.index_dirs or dest not in ctx.index_dirs:
        raise ValueError(
            f"delete() destination {dest!r} not registered — pass "
            f"index_dirs={{{dest!r}: <index path>}} to run_expression")
    from solr_spark.indexing.deletes import delete_docids

    df = _input_stream(ctx, e)
    id_col = e.named1("id", "docid")
    spark = df.sparkSession
    n = delete_docids(spark, ctx.index_dirs[dest],
                      df.select(F.col(id_col).alias("docid")))
    return spark.createDataFrame([(dest, n)],
                                 "dest string, totalDeleted long")


def _h_cell(ctx, e):
    """CellStream.java:40 — cell(name, <stream>): collapse the inner stream
    into ONE tuple whose `name` field is the list of inner tuples (the
    let()/zplot matrix-loading idiom). The reference keeps stream arrival
    order; a distributed collect can't reproduce that, so the list is
    canonically ordered by all fields (documented deviation — deterministic
    on any cluster, and order-insensitive consumers like zplot/matrix
    loaders see the same multiset)."""
    names = e.positional_values()
    if not names:
        raise ValueError("cell() needs a name for the tuple list")
    df = _input_stream(ctx, e)
    packed = F.array_sort(F.collect_list(F.struct(*df.columns)))
    return df.agg(packed.alias(names[0]))


def _h_commit(ctx, e):
    """CommitStream.java:46 — commit(dest, <stream>): run the wrapped
    (usually update) stream, then make its adds durable. The LSM layout
    commits on segment write (write_live_segments is the atomic commit
    point), so this is a semantic passthrough that re-emits the inner
    stream's tuples — registered for expression compatibility."""
    names = e.positional_values()
    if not names:
        raise ValueError("commit() needs a destination collection name")
    return _input_stream(ctx, e)


def _h_topic(ctx, e):
    """TopicStream.java:118 — topic(checkpointName, collection, id=,
    versionField=): return only rows with version strictly above the
    persisted watermark, then advance the watermark. The reference
    checkpoints into a collection as it streams (checkpointEvery); the
    batch analog computes the batch's high watermark EAGERLY (one bounded
    agg job), persists it, and returns the frozen slice — so
    daemon(update(dest, topic(...))) indexes each row exactly once across
    runs. Requires checkpoint_dir= on run_expression."""
    import json as _json
    import os as _os

    names = e.positional_values()
    if len(names) < 2:
        raise ValueError("topic() needs (checkpointName, collection)")
    if not ctx.checkpoint_dir:
        raise ValueError("topic() requires checkpoint_dir= on run_expression")
    ckpt_name, coll = names[0], names[1]
    topic_id = e.named1("id", ckpt_name)
    vcol = e.named1("versionField", "ts")
    df = ctx.collections[coll]
    df = _apply_q_fq(ctx, df, e)
    fl = e.named1("fl")
    if fl:
        df = df.select(*_fields(fl))
    path = _os.path.join(ctx.checkpoint_dir, f"topic-{topic_id}.json")
    watermark = None
    if _os.path.exists(path):
        with open(path) as f:
            watermark = _json.load(f)["watermark"]
    out = df.where(F.col(vcol) > F.lit(watermark)) \
        if watermark is not None else df
    hi = out.agg(F.max(vcol)).collect()[0][0]
    if hi is not None:
        _os.makedirs(ctx.checkpoint_dir, exist_ok=True)
        val = hi if isinstance(hi, (int, float)) else str(hi)
        with open(path + ".tmp", "w") as f:
            _json.dump({"watermark": val, "version_col": vcol}, f)
        _os.replace(path + ".tmp", path)
        # freeze the slice against rows arriving after the watermark read
        out = out.where(F.col(vcol) <= F.lit(hi))
    return out


def _h_daemon(ctx, e):
    """DaemonStream.java:50 — daemon(<stream>, id=, runs=N): the reference
    re-runs the wrapped expression on an interval inside the server; the
    batch analog re-DISPATCHES it `runs` times (each dispatch re-reads
    topic watermarks and re-fires update side effects — the micro-batch
    loop) and returns the union of the per-run tuples tagged with
    DAEMON_RUN. Scheduling intervals belong to an external scheduler."""
    subs = e.sub_expressions()
    if not subs:
        raise ValueError("daemon() needs an input stream sub-expression")
    runs = int(e.named1("runs", 1))
    outs = []
    for i in range(runs):
        outs.append(_dispatch(ctx, subs[0])
                    .withColumn("DAEMON_RUN", F.lit(i)))
    df = outs[0]
    for o in outs[1:]:
        df = df.unionByName(o)
    return df


def _h_classify(ctx, e):
    """ClassifyStream.java:38 — classify(<model>, <docs>, field=): apply a
    trained logistic-regression model (the (term, weight) rows train()
    emits, `__intercept__` included) to the doc stream, adding the
    reference's score_d (raw margin) and probability_d (sigmoid) fields.
    The model is a bounded collect (numTerms rows) shipped as broadcast
    literals — the reference ships the weight vector to every shard the
    same way."""
    subs = e.sub_expressions()
    if len(subs) < 2:
        raise ValueError("classify() needs (model stream, doc stream)")
    model_df, docs = _dispatch(ctx, subs[0]), _dispatch(ctx, subs[1])
    field = e.named1("field", ctx.default_field)
    rows = model_df.select("term", "weight").collect()
    weights = {r["term"]: float(r["weight"]) for r in rows}
    intercept = weights.pop("__intercept__", 0.0)
    from solr_spark.functions.textanalysis import whitespace_tokens

    toks = F.array_distinct(whitespace_tokens(field))
    margin = F.lit(float(intercept))
    for t in sorted(weights):
        margin = margin + (F.lit(weights[t])
                           * F.array_contains(toks, t).cast("double"))
    return (docs.withColumn("score_d", margin)
            .withColumn("probability_d",
                        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score_d")))))


def _h_parallel(ctx, e):
    """ParallelStream.java:72 — parallel(workerColl, <stream>, workers=N,
    sort=): the reference sends the inner expression to N workers, each
    executing it over its hash slice ({!hash workers=N worker=i}), and
    merge-sorts the streams back. Spark's shuffle IS that worker
    partitioning — every groupBy/join in the inner plan already hash-splits
    across executors — so the handler validates workers, dispatches the
    inner stream once, and applies the merge sort= ordering."""
    subs = e.sub_expressions()
    if not subs:
        raise ValueError("parallel() needs an input stream sub-expression")
    workers = int(e.named1("workers", 1))
    if workers < 1:
        raise ValueError(f"parallel() workers must be >= 1, got {workers}")
    out = _dispatch(ctx, subs[0])
    sort = e.named1("sort")
    return out.orderBy(*_sort_cols(sort)) if sort else out


def _h_eval(ctx, e):
    """EvalStream.java:39 — eval(<stream>): read the FIRST tuple of the
    inner stream, parse the streaming expression in its `expr_s` field, and
    dispatch it. A driver-side indirection (one-row collect), exactly the
    reference's read-one-tuple-then-open semantics."""
    inner = _input_stream(ctx, e)
    first = inner.limit(1).collect()
    if not first or "expr_s" not in first[0].__fields__ \
            or first[0]["expr_s"] is None:
        raise ValueError("eval() needs an input tuple with an expr_s field")
    return _dispatch(ctx, parse_expression(first[0]["expr_s"]))


def _h_drill(ctx, e):
    """DrillStream.java:43 + the /export DrillHandler — drill(collection,
    q=, fl=, sort=, <expr over input()>): run the inner aggregating
    expression with input() bound to the exported scan. The reference
    pushes the rollup INTO each shard's export handler; Spark's partial
    aggregation does the identical map-side combine, so dispatching the
    inner expression over the scan yields the same pushed-down plan."""
    df = _apply_q_fq(ctx, _collection(ctx, e), e)
    fl = e.named1("fl")
    if fl:
        df = df.select(*_fields(fl))
    sort = e.named1("sort")
    if sort:
        df = df.orderBy(*_sort_cols(sort))
    subs = e.sub_expressions()
    if not subs:
        raise ValueError("drill() needs an aggregating sub-expression "
                         "over input()")
    inner_ctx = _Ctx({**ctx.collections, "__drill_input__": df},
                     ctx.default_field, ctx.text_fields,
                     ctx.index_dirs, ctx.checkpoint_dir, ctx.config)
    return _dispatch(inner_ctx, subs[0])


def _h_input(ctx, e):
    """input() — DrillStream's placeholder for the shard-local exported
    stream; resolves to the scan drill() bound."""
    if "__drill_input__" not in ctx.collections:
        raise ValueError("input() is only valid inside drill()")
    return ctx.collections["__drill_input__"]


_HANDLERS = {
    "search": _h_search,
    "select": _h_select,
    "top": _h_top,
    "unique": _h_unique,
    "sort": _h_sort,
    "rollup": _h_rollup,
    "hashRollup": _h_rollup,
    "facet": _h_facet,
    "stats": _h_stats,
    "timeseries": _h_timeseries,
    "merge": _h_merge,
    "having": _h_having,
    "reduce": _h_reduce,
    "fetch": _h_fetch,
    "cartesianProduct": _h_cartesian,
    "innerJoin": lambda c, e: _equi_join(c, e, "inner"),
    "leftOuterJoin": lambda c, e: _equi_join(c, e, "left"),
    "fullOuterJoin": lambda c, e: _equi_join(c, e, "full"),
    "intersect": lambda c, e: streams.intersect(
        _dispatch(c, e.sub_expressions()[0]), _dispatch(c, e.sub_expressions()[1]),
        _fields(e.named1("on"))),
    "complement": lambda c, e: streams.complement(
        _dispatch(c, e.sub_expressions()[0]), _dispatch(c, e.sub_expressions()[1]),
        _fields(e.named1("on"))),
    "hashJoin": lambda c, e: _h_hash_join(c, e),
    "gatherNodes": _h_gather_nodes,
    "nodes": _h_gather_nodes,
    "shortestPath": _h_shortest_path,
    "echo": _h_echo,
    "significantTerms": _h_significant_terms,
    "scoreNodes": _h_score_nodes,
    "random": _h_random,
    "let": _h_let,
    "get": _h_get,
    "tuple": _h_tuple,
    "knn": _h_knn,
    "featuresSelection": _h_features_selection,
    "features": _h_features_selection,
    "train": _h_train,
    "list": _h_list,
    "plist": _h_list,
    "update": _h_update,
    "delete": _h_delete,
    "cell": _h_cell,
    "commit": _h_commit,
    "topic": _h_topic,
    "daemon": _h_daemon,
    "classify": _h_classify,
    "parallel": _h_parallel,
    "eval": _h_eval,
    "drill": _h_drill,
    "input": _h_input,
    "outerHashJoin": lambda c, e: _h_outer_hash_join(c, e),
    # ShuffleStream (ShuffleStream.java) IS search against /export — same
    # contract, never a different plan here
    "shuffle": _h_search,
    "null": lambda c, e: _h_null(c, e),
}


def _h_null(ctx, e):
    """NullStream.java:41 — consume the inner stream, emit ONE tuple with
    the tuple count (the reference's parallel-plumbing perf probe)."""
    df = _input_stream(ctx, e)
    return df.agg(F.count(F.lit(1)).alias("nullCount"))


def _h_outer_hash_join(ctx, e):
    """OuterHashJoinStream.java:50 — left outer hashJoin: every full-side
    tuple passes, hashed-side fields attach where keys match. The hashed=
    side is read into memory in the reference == broadcast left join here."""
    full = _input_stream(ctx, e)
    hashed = _dispatch(ctx, e.named1("hashed"))
    same, renames = _join_keys(e.named1("on", ""))
    for l, r in renames:
        hashed = hashed.withColumnRenamed(r, l)
    return full.join(F.broadcast(hashed), same + [l for l, _ in renames],
                     "left")


def _h_hash_join(ctx, e):
    """HashJoinStream.java:46 — hashed= side read into memory == broadcast."""
    full = _input_stream(ctx, e)
    hashed = _dispatch(ctx, e.named1("hashed"))
    same, renames = _join_keys(e.named1("on", ""))
    for l, r in renames:
        hashed = hashed.withColumnRenamed(r, l)
    return streams.hash_join(full, hashed, same + [l for l, _ in renames])


def _dispatch(ctx: _Ctx, e: StreamExpr) -> DataFrame:
    h = _HANDLERS.get(e.name)
    if h is None:
        raise ValueError(f"unknown stream function: {e.name!r} "
                         f"(registered: {sorted(_HANDLERS)})")
    return h(ctx, e)


def run_expression(expr: str | StreamExpr, collections: dict,
                   default_field: str = "text",
                   text_fields: set | None = None,
                   index_dirs: dict | None = None,
                   checkpoint_dir: str | None = None,
                   config: object = None) -> DataFrame:
    """Evaluate a streaming-expression string against named DataFrames.

    `index_dirs` maps update()/commit() destination names to index
    directories; `checkpoint_dir` hosts topic() watermark files; `config`
    is the IndexConfig update() builds new segments with.
    """
    if isinstance(expr, str):
        expr = parse_expression(expr)
    return _dispatch(_Ctx(collections, default_field, text_fields,
                          index_dirs, checkpoint_dir, config), expr)
