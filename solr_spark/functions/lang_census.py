"""Complete census of the reference streaming-expression language registry.

Reference: solr/solrj-streaming/src/java/org/apache/solr/client/solrj/io/
Lang.java:424-531 registers 296 unique function names (streams + evaluators).
This module accounts for EVERY one of them, in exactly one of four buckets:

* ``evaluator``   — implemented in functions/evaluators.py or
                    functions/distributions.py, dispatchable via ``ev(name)``;
* ``operator``    — implemented as a DataFrame operator elsewhere in this
                    package (value = the dotted path of the implementation);
* ``native``      — the Spark DataFrame API already IS the operator (value =
                    the idiomatic Spark spelling); re-wrapping it would add a
                    layer with no semantics;
* ``out_of_scope``— documented non-goal with a reason (value = the reason;
                    same registry evaluators.OUT_OF_SCOPE raises from).

``census()`` returns {name: (bucket, target)} for all 296 names and raises if
any registered Lang name is unaccounted — the completeness test imports the
frozen name list below (snapshot of Lang.java at the cited lines) so the
accounting is pinned even where the reference tree is absent.
"""

from __future__ import annotations

# frozen snapshot of the 296 unique withFunctionName registrations
LANG_NAMES: tuple[str, ...] = (
    "abs", "acos", "add", "addAll", "akima", "and", "anova", "append",
    "array", "asc", "asin", "atan", "avg", "betaDistribution",
    "bicubicSpline", "binomialCoefficient", "binomialDistribution", "calc",
    "canberra", "cartesianProduct", "cbrt", "ceil", "cell", "chebyshev",
    "chiSquareDataSet", "coalesce", "col", "colAt", "columnCount", "commit",
    "complement", "concat", "constantDistribution", "conv", "convert",
    "convexHull", "copyOf", "copyOfRange", "corr", "corrPValues", "cos",
    "cosh", "cosine", "cosineSimilarity", "count", "countDist", "cov",
    "cumulativeProbability", "daemon", "dateTime", "dbscan", "delete",
    "density", "derivative", "describe", "diff", "distance", "distinct",
    "div", "dotProduct", "double", "drill", "earthMovers", "ebeAdd",
    "ebeDivide", "ebeMultiply", "ebeSubtract", "echo", "empiricalDistribution",
    "enclosingDisk", "enumeratedDistribution", "eor", "eq", "euclidean",
    "eval", "executor", "expMovingAvg", "export", "facet", "facet2D",
    "factorial", "featureSelect", "features", "fetch", "fft", "finddelay",
    "floor", "freqTable", "fullOuterJoin", "fuzzyKmeans", "gammaDistribution",
    "gatherNodes", "gaussfit", "geometricDistribution", "get", "getAmplitude",
    "getAngularFrequency", "getArea", "getAttribute", "getAttributes",
    "getBaryCenter", "getBoundarySize", "getCache", "getCenter",
    "getCentroids", "getCluster", "getColumnLabels", "getMembershipMatrix",
    "getPhase", "getRadius", "getRowLabels", "getSupportPoints", "getValue",
    "getVertices", "grandSum", "group", "gt", "gteq", "gtestDataSet",
    "harmfit", "harmonicFit", "hashJoin", "hashRollup", "having", "hist",
    "if", "ifft", "indexOf", "innerJoin", "input", "integral", "intersect",
    "isNull", "kmeans", "knn", "knnRegress", "knnSearch",
    "kolmogorovSmirnov", "ks", "l1norm", "l2norm", "latlonVectors",
    "leftOuterJoin", "length", "lerp", "let", "linfnorm", "list",
    "listCache", "loess", "log", "log10", "logNormalDistribution", "long",
    "lower", "lt", "lteq", "ltrim", "manhattan", "mannWhitney",
    "markovChain", "matches", "matrix", "matrixMult", "max", "mean",
    "meanDifference", "memset", "merge", "min", "minMaxScale", "missing",
    "mod", "mode", "model", "monteCarlo", "movingAvg", "movingMAD",
    "movingMedian", "mult", "multiKmeans", "multiVariateNormalDistribution",
    "natural", "nodes", "noop", "normalDistribution", "normalizeSum", "not",
    "notNull", "null", "olsRegress", "ones", "or", "oscillate",
    "outerHashJoin", "outliers", "pairSort", "pairedTtest", "parallel",
    "parseCSV", "parseTSV", "per", "percentile", "pivot", "plist", "plot",
    "poissonDistribution", "polyfit", "pow", "precision", "predict",
    "primes", "priority", "probability", "projectToBorder", "putCache",
    "random", "rank", "recNum", "recip", "reduce", "regress", "removeCache",
    "repeat", "replace", "rev", "rollup", "round", "rowAt", "rowCount",
    "rtrim", "sample", "scalarAdd", "scalarDivide", "scalarMultiply",
    "scalarSubtract", "scale", "scoreNodes", "search", "select", "sequence",
    "setColumnLabels", "setRowLabels", "setValue", "shortestPath", "shuffle",
    "significantTerms", "sin", "sinh", "sort", "spline", "split", "sql",
    "sqrt", "standardize", "stats", "std", "stddev", "stream", "sub", "sum",
    "sumColumns", "sumDifference", "sumRows", "sumSq", "tan", "tanh",
    "termVectors", "timeseries", "top", "topFeatures", "topic", "train",
    "transpose", "triangularDistribution", "trim", "trunc", "ttest", "tuple",
    "uniformDistribution", "uniformIntegerDistribution", "unique", "unitize",
    "update", "upper", "uuid", "val", "valueAt", "var",
    "weibullDistribution", "withField", "withValue", "zeros",
    "zipFDistribution", "zplot", "zscores",
)

# Lang streams implemented as DataFrame operators in this package
OPERATORS: dict[str, str] = {
    "search": "solr_spark.operators.streams.search",
    "select": "solr_spark.operators.streams.select_stream",
    "top": "solr_spark.operators.streams.top",
    "unique": "solr_spark.operators.streams.unique",
    "merge": "solr_spark.operators.streams.merge",
    "intersect": "solr_spark.operators.streams.intersect",
    "complement": "solr_spark.operators.streams.complement",
    "innerJoin": "solr_spark.operators.streams.inner_join",
    "leftOuterJoin": "solr_spark.operators.streams.left_outer_join",
    "fullOuterJoin": "solr_spark.operators.streams.full_outer_join",
    "hashJoin": "solr_spark.operators.streams.hash_join",
    "outerHashJoin": "solr_spark.operators.streams.hash_join",
    "fetch": "solr_spark.operators.streams.fetch",
    "cartesianProduct": "solr_spark.operators.streams.cartesian_product",
    "rollup": "solr_spark.operators.streams.rollup",
    "hashRollup": "solr_spark.operators.streams.rollup",
    "significantTerms": "solr_spark.operators.streams.significant_terms",
    "facet": "solr_spark.operators.facets.terms_facet",
    "facet2D": "solr_spark.operators.facets.facet_2d",
    "stats": "solr_spark.operators.facets.stats_component",
    "timeseries": "solr_spark.operators.facets.timeseries",
    "pivot": "solr_spark.operators.facets.pivot_facet",
    "min": "solr_spark.operators.facets.metric",
    "max": "solr_spark.operators.facets.metric",
    "avg": "solr_spark.operators.facets.metric",
    "sum": "solr_spark.operators.facets.metric",
    "count": "solr_spark.operators.facets.metric",
    "std": "solr_spark.operators.facets.metric",
    "per": "solr_spark.operators.facets.percentiles",
    "countDist": "solr_spark.operators.facets.metric",
    "missing": "solr_spark.operators.facets.metric",
    "group": "solr_spark.operators.windows.group_top_n",
    "gatherNodes": "solr_spark.operators.graph.gather_nodes",
    "nodes": "solr_spark.operators.graph.gather_nodes",
    "shortestPath": "solr_spark.operators.graph.shortest_path",
    "scoreNodes": "solr_spark.operators.graph.score_nodes",
    "train": "solr_spark.operators.classify.tlogit_train",
    "model": "solr_spark.operators.classify.tlogit_score",
    "features": "solr_spark.operators.classify.igain_terms",
    "featureSelect": "solr_spark.operators.classify.igain_terms",
    "topFeatures": "solr_spark.operators.classify.igain_terms",
    "termVectors": "solr_spark.operators.classify.term_vectors",
    "knn": "solr_spark.functions.vectors.cosine_topk",
    "knnSearch": "solr_spark.functions.vectors.cosine_topk",
    "update": "solr_spark.indexing.merge.add_documents",
    "commit": "solr_spark.indexing.merge.add_documents",
    "delete": "solr_spark.indexing.deletes.delete_docids",
    "topic": "solr_spark.streaming.topic.topic_poll",
    "daemon": "solr_spark.streaming.topic.daemon",
}

# Lang names whose operator IS the Spark DataFrame API — the idiomatic
# spelling, not a missing feature
NATIVE: dict[str, str] = {
    "sort": "df.orderBy(...)",
    "shuffle": "df.sort(...) — Spark's sort-shuffle is the export engine",
    "export": "df.sort(...).write — plus windows.cursor_page for keyset pages",
    "random": "df.orderBy(F.rand(seed)).limit(n)",
    "parallel": "Spark's scheduler — every plan here is already parallel",
    "plist": "Spark's scheduler (concurrent actions via the async API)",
    "executor": "Spark's executors",
    "priority": "scheduler pools (spark.scheduler.pool)",
    "null": "F.lit(None)",
    "noop": "identity — no tuple mutation step is needed in a plan",
    "calc": "Column expressions",
    "eval": "Column expressions / spark.sql",
    "let": "Python variable bindings over DataFrames",
    "get": "Python variable bindings",
    "echo": "F.lit",
    "cell": "Python variable bindings",
    "list": "spark.createDataFrame / union",
    "tuple": "F.struct / Row",
    "val": "F.lit",
    "array": "F.array",
    "col": "F.col",
    "sql": "spark.sql(...)",
    "drill": "groupBy partial aggregation — Spark's map-side combine IS the "
             "export+rollup pushdown drill implements",
    "having": "df.where(predicate) after aggregation",
    "distinct": "df.distinct()",
    "replace": "F.when(...).otherwise(...)",
    "withValue": "df.withColumn(name, F.lit(v))",
    "withField": "df.withColumn / Column.withField",
    "reduce": "groupBy + collect_list + array_sort (sorted-group reduce, gate q37)",
    "stream": "a DataFrame is already a lazy stream of tuples",
    "putCache": "df.cache() / df.persist()",
    "getCache": "spark.catalog.isCached / the cached DataFrame reference",
    "removeCache": "df.unpersist()",
    "listCache": "spark.catalog.listTables / storage UI",
    "parseCSV": "spark.read.csv",
    "parseTSV": "spark.read.option('sep', '\\t').csv",
    "convert": "Column.cast",
    "input": "spark.read",
    "recNum": "F.monotonically_increasing_id / row_number window",
    "latlonVectors": "F.array(lat, lon) over the location columns",
    "getColumnLabels": "DataFrame.columns — labels are schema, not data",
    "setColumnLabels": "df.toDF(*labels)",
    "getRowLabels": "a label column — rows are labeled by data, not position",
    "setRowLabels": "df.withColumn(label_col, ...)",
    "getAttribute": "DataFrame schema metadata",
    "getAttributes": "DataFrame schema metadata",
    "getValue": "Row[field] / F.element_at",
    "setValue": "df.withColumn",
    "memset": "df.withColumn(name, F.lit(v)) — matrices here are columns",
}

# documented non-goals beyond evaluators.OUT_OF_SCOPE (same contract: a
# reason, not silence)
EXTRA_OUT_OF_SCOPE: dict[str, str] = {
    "zplot": "notebook visualization (Apache Zeppelin binding) — plot from "
             "pandas after collect",
    "plot": "visualization — plot from pandas after collect",
    "getMembershipMatrix": "fuzzyKmeans accessor; fuzzy clustering is out of "
                           "scope",
    "getVertices": "computational-geometry accessor (convexHull family)",
    "getBaryCenter": "computational-geometry accessor",
    "getArea": "computational-geometry accessor",
    "getBoundarySize": "computational-geometry accessor",
    "getCenter": "computational-geometry accessor (enclosingDisk family)",
    "getRadius": "computational-geometry accessor",
    "getSupportPoints": "computational-geometry accessor",
    "projectToBorder": "computational-geometry accessor",
    "getAmplitude": "harmonic-fit accessor (fitted-curve family)",
    "getPhase": "harmonic-fit accessor (fitted-curve family)",
    "getAngularFrequency": "harmonic-fit accessor (fitted-curve family)",
}


def census() -> dict[str, tuple[str, str]]:
    """Account for every Lang.java registration; raises on any gap."""
    from solr_spark.functions import distributions  # noqa: F401 (registers)
    from solr_spark.functions.evaluators import EVALUATORS, OUT_OF_SCOPE

    out: dict[str, tuple[str, str]] = {}
    missing: list[str] = []
    for name in LANG_NAMES:
        if name in EVALUATORS:
            target = getattr(EVALUATORS[name], "__module__", "evaluators")
            out[name] = ("evaluator", target)
        elif name in OPERATORS:
            out[name] = ("operator", OPERATORS[name])
        elif name in NATIVE:
            out[name] = ("native", NATIVE[name])
        elif name in OUT_OF_SCOPE:
            out[name] = ("out_of_scope", OUT_OF_SCOPE[name])
        elif name in EXTRA_OUT_OF_SCOPE:
            out[name] = ("out_of_scope", EXTRA_OUT_OF_SCOPE[name])
        else:
            missing.append(name)
    if missing:
        raise AssertionError(f"unaccounted Lang.java names: {missing}")
    return out


def census_counts() -> dict[str, int]:
    counts: dict[str, int] = {}
    for bucket, _ in census().values():
        counts[bucket] = counts.get(bucket, 0) + 1
    return counts
