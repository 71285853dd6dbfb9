"""Complete per-name census of the reference's ValueSource registry.

Reference: solr/core/src/java/org/apache/solr/search/ValueSourceParser.java
— the static ``standardVSParsers`` map (initialized at :136-147 and filled
by the ``addParser`` calls through :1380) registers every function-query
name (``func``/``frange``/``bf``/sort-by-function all resolve through it).
This module accounts for EVERY registered name, in exactly one of four
buckets (the lang_census.py contract, applied to value sources):

* ``implemented``  — a function in this package (value = dotted path);
* ``operator``     — covered by a DataFrame operator / scoring path here
                     (value = the implementation + gate);
* ``native``       — the Spark Column algebra already IS the value source
                     (value = the idiomatic Spark spelling); wrapping it
                     would add a layer with no semantics;
* ``out_of_scope`` — documented non-goal with the reason.

``census()`` returns {name: (bucket, target)} for every snapshot name and
raises if any is unaccounted; tests/test_vs_census.py additionally imports
each ``implemented`` target to pin that the paths stay real.
"""

from __future__ import annotations

# frozen snapshot of the addParser registrations (single-name, NamedParser,
# DoubleParser/Double2Parser math families), ValueSourceParser.java:163-1380;
# "agg_" + RelatednessAgg.NAME resolves to agg_relatedness
VS_NAMES: tuple[str, ...] = (
    "testfunc", "ord", "literal", "threadid", "sleep", "rord", "top",
    "linear", "recip", "scale", "div", "mod", "map", "abs", "cscore",
    "sum", "product", "sub", "vector", "query", "boost", "joindf",
    "geodist", "hsin", "ghhsin", "geohash", "strdist", "field", "currency",
    "max", "min", "sqedist", "dist", "ms", "pi", "e", "docfreq",
    "totaltermfreq", "sumtotaltermfreq", "idf", "termfreq", "tf", "norm",
    "maxdoc", "numdocs", "payload", "true", "false", "exists", "isnan",
    "not", "and", "or", "xor", "if", "gt", "lt", "gte", "lte", "eq",
    "def", "concat",
    # single-arg math (DoubleParser) + two-arg (Double2Parser)
    "rad", "deg", "sqrt", "cbrt", "log", "ln", "exp", "sin", "cos", "tan",
    "asin", "acos", "atan", "sinh", "cosh", "tanh", "ceil", "floor",
    "rint", "pow", "hypot", "atan2",
    # vectors
    "vectorSimilarity", "lateVector",
    # JSON-facet aggregates (usable wherever a value source is)
    "agg", "agg_count", "agg_unique", "agg_uniqueBlock", "agg_hll",
    "agg_sum", "agg_avg", "agg_sumsq", "agg_variance", "agg_stddev",
    "agg_missing", "agg_countvals", "agg_min", "agg_max",
    "agg_percentile", "agg_relatedness", "agg_multistat",
    # block join
    "childfield",
)

IMPLEMENTED: dict[str, str] = {
    "ord": "solr_spark.functions.funcquery.with_ord",           # q109
    "rord": "solr_spark.functions.funcquery.with_ord",          # q110
    "recip": "solr_spark.functions.funcquery.recip",            # q111
    "scale": "solr_spark.functions.funcquery.scale_fq",         # q25
    "ms": "solr_spark.functions.funcquery.ms",                  # q35
    "query": "solr_spark.functions.funcquery.query_scores",     # q119
    "currency": "solr_spark.functions.funcquery.currency_convert",  # q125
    "childfield":
        "solr_spark.operators.streams.block_join_parent_scored",  # q126
    "geodist": "solr_spark.functions.geo.geodist",              # q34
    "hsin": "solr_spark.functions.geo.haversine_km",            # q34
    "ghhsin": "solr_spark.functions.geo.haversine_km",
    "geohash": "solr_spark.functions.geo.geo_grid_cell",        # q40
    "strdist": "solr_spark.functions.textanalysis.jaro_winkler",  # q36
    "payload": "solr_spark.functions.payloads.payload_score",   # q47
    "vectorSimilarity":
        "solr_spark.functions.vectors.cosine_topk",             # vv04
}

# names answered by the index-stat tables / scoring paths (ft03/ft04 pin
# tf/df/idf/ttf/numdocs against the dictionary + posting tables)
OPERATOR: dict[str, str] = {
    "docfreq": "dictionary table df (ft03)",
    "totaltermfreq": "dictionary table cf (ft03)",
    "sumtotaltermfreq": "stats.json total tokens (ft04)",
    "idf": "similarity.weight from dictionary df (ft03)",
    "termfreq": "posting decode tf (ft02)",
    "tf": "posting decode tf with norm (ft03)",
    "norm": "norms table doc length (ft04)",
    "maxdoc": "stats.json n_docs (ft04)",
    "numdocs": "stats.json n_docs minus tombstones (ft04)",
    "boost": "bm25_topk(boosts=) clause boosts (ft12)",
    "cscore": "windows.collapse aggregation fast path (q12)",
    "agg": "operators.facets.metric (q05)",
    "agg_count": "operators.facets._METRICS['count'] (q05)",
    "agg_unique": "operators.facets._METRICS['unique'] (q44)",
    "agg_uniqueBlock": "operators.facets uniqueBlock (q97)",
    "agg_hll": "operators.facets._METRICS['hll'] (q50 rows-only)",
    "agg_sum": "operators.facets._METRICS['sum'] (q05)",
    "agg_avg": "operators.facets._METRICS['avg'] (q07)",
    "agg_sumsq": "operators.facets._METRICS['sumsq'] (q44)",
    "agg_variance": "operators.facets._METRICS['variance'] (q44)",
    "agg_stddev": "operators.facets._METRICS['stddev'] (q44)",
    "agg_missing": "operators.facets._METRICS['missing'] (q113)",
    "agg_countvals": "operators.facets._METRICS['countvals'] (q113)",
    "agg_min": "operators.facets._METRICS['min'] (q05)",
    "agg_max": "operators.facets._METRICS['max'] (q05)",
    "agg_percentile": "operators.facets.percentile_metric (q113)",
    "agg_relatedness": "operators.facets relatedness (q42)",
    "agg_multistat": "multi-metric facet agg — any facet carrying several "
                     "metrics compiles to one agg (q07)",
    "dist": "functions.evaluators distance family (q51)",
    "sqedist": "functions.evaluators euclidean**2 (q51)",
}

# the Spark Column algebra IS the value source; value = idiomatic spelling
NATIVE: dict[str, str] = {
    "literal": "F.lit", "field": "F.col", "concat": "F.concat",
    "sum": "Column +", "sub": "Column -", "product": "Column *",
    "div": "Column /", "mod": "Column %", "abs": "F.abs",
    "linear": "a * F.col(x) + b", "map": "F.when(...).otherwise(...)",
    "max": "F.greatest", "min": "F.least",
    "true": "F.lit(True)", "false": "F.lit(False)",
    "exists": "Column.isNotNull", "isnan": "F.isnan",
    "not": "~Column", "and": "Column &", "or": "Column |",
    "xor": "Column != Column (boolean)", "if": "F.when",
    "gt": "Column >", "lt": "Column <", "gte": "Column >=",
    "lte": "Column <=", "eq": "Column ==", "def": "F.coalesce",
    "vector": "F.array", "joindf": "groupBy(to_field).count() equi-join "
    "(JoinDocFreqValueSource is plain relational algebra)",
    "lateVector": "ArrayType(FloatType) column — DataFrame columns are "
    "late-materialized by Parquet column pruning already",
    "top": "no per-segment reader context in a DataFrame — every column "
    "is already top-level",
    "pi": "F.lit(math.pi)", "e": "F.lit(math.e)",
    "rad": "F.radians", "deg": "F.degrees", "sqrt": "F.sqrt",
    "cbrt": "F.cbrt", "log": "F.log10 (Solr's log is base 10)",
    "ln": "F.log", "exp": "F.exp", "sin": "F.sin", "cos": "F.cos",
    "tan": "F.tan", "asin": "F.asin", "acos": "F.acos", "atan": "F.atan",
    "sinh": "F.sinh", "cosh": "F.cosh", "tanh": "F.tanh",
    "ceil": "F.ceil", "floor": "F.floor",
    "rint": "F.expr('rint(x)') (half-even)",
    "pow": "F.pow", "hypot": "F.hypot", "atan2": "F.atan2",
}

OUT_OF_SCOPE: dict[str, str] = {
    "testfunc": "test-suite-only hook (registered for Solr's own tests; "
                "no user semantics to pin)",
    "threadid": "debug utility exposing the searcher thread id — "
                "meaningless in a distributed plan",
    "sleep": "debug utility (artificial latency for timeout tests) — "
             "a data-independent side effect, not a value source",
}


def census() -> dict[str, tuple[str, str]]:
    """{name: (bucket, target)} for every snapshot name; raises if any
    registered name is unaccounted or double-accounted."""
    out: dict[str, tuple[str, str]] = {}
    for name in VS_NAMES:
        buckets = [b for b, tbl in (("implemented", IMPLEMENTED),
                                    ("operator", OPERATOR),
                                    ("native", NATIVE),
                                    ("out_of_scope", OUT_OF_SCOPE))
                   if name in tbl]
        if len(buckets) != 1:
            raise ValueError(
                f"value source {name!r} accounted in {buckets or 'no'} "
                "buckets — every name needs exactly one")
        b = buckets[0]
        tbl = {"implemented": IMPLEMENTED, "operator": OPERATOR,
               "native": NATIVE, "out_of_scope": OUT_OF_SCOPE}[b]
        out[name] = (b, tbl[name])
    return out


def census_counts() -> dict[str, int]:
    out: dict[str, int] = {}
    for bucket, _ in census().values():
        out[bucket] = out.get(bucket, 0) + 1
    return out


__all__ = ["VS_NAMES", "IMPLEMENTED", "OPERATOR", "NATIVE", "OUT_OF_SCOPE",
           "census", "census_counts"]
