"""Facet / aggregation surface (SURVEY.md §2.4) as DataFrame programs.

The reference's JSON facet engine builds a nested bucket tree with per-bucket metrics
(solr/core/src/java/org/apache/solr/search/facet/FacetModule.java:45,
FacetRequest.java:47,353). Distributed, it over-requests per shard and runs a
refinement round (FacetModule.java:180-199) because per-shard top-N is approximate.
Spark's groupBy is EXACT under partial+final hash aggregation, so refinement is a
non-goal by design — one shuffle, no second pass, no long-tail bugs
(cf. DistributedFacetSimpleRefinementLongTailTest.java).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Facet metric name -> Spark aggregate, mirroring search/facet/*Agg.java and the
# agg_* value sources registered in search/ValueSourceParser.java.
_METRICS = {
    "sum": F.sum,                       # SumAgg.java
    "avg": F.avg,                       # AvgAgg.java
    "min": F.min,                       # MinMaxAgg.java
    "max": F.max,                       # MinMaxAgg.java
    "count": F.count,                   # CountAgg.java
    "countvals": F.count,               # CountValsAgg.java (non-null count)
    "missing": lambda c: F.count(F.when(F.col(c).isNull(), F.lit(1))),  # MissingAgg
    "unique": F.count_distinct,         # UniqueAgg.java (exact)
    "hll": F.approx_count_distinct,     # HLLAgg.java (HyperLogLog both sides)
    "stddev": F.stddev,                 # StddevAgg.java (sample stddev)
    "variance": F.variance,             # VarianceAgg.java
    "sumsq": lambda c: F.sum(F.col(c) * F.col(c)),  # SumsqAgg.java
}


def metric(name: str, col: str) -> Column:
    """One JSON-facet metric as an aliased Spark aggregate column."""
    return _METRICS[name](col).alias(f"{name}_{col}")


def percentile_metric(col: str, p: float) -> Column:
    """`percentile(field, P)` per-bucket JSON-facet metric (PercentileAgg.java,
    registered in search/ValueSourceParser.java).

    Exact linear-interpolation percentile (Spark `percentile`), engine-portable
    (DuckDB quantile_cont interpolates identically). The reference computes a
    t-digest sketch; at 100 TB swap to F.percentile_approx for the same
    approximate contract. Rides INSIDE the facet's single partial-agg shuffle —
    no extra pass over the data.
    """
    return (F.expr(f"percentile({col}, {p!r})")
             .alias(f"p{int(round(p * 100))}_{col}"))


def terms_facet(df: DataFrame, field: str, limit: int = 10,
                metrics: Sequence[Column] = (), min_count: int = 1,
                sort_by_count: bool = True, sort: str | None = None,
                all_buckets: bool = False, num_buckets: bool = False,
                missing: bool = False, prefix: str | None = None,
                contains: str | None = None, offset: int = 0) -> DataFrame:
    """`terms` facet: top buckets of a field with per-bucket metrics, with the
    JSON-facet bucket options surface.

    Reference: FacetFieldProcessorByArrayDV.java / SimpleFacets.java:107;
    options per facet/FacetField.java:32-33 + FacetRequest.java:50-85
    (FacetSort). One shuffle (partial-agg combines hot buckets map-side);
    top-N is TakeOrdered, not a sort. NULL field values are never a bucket
    (Solr terms-facet semantics; they surface only via `missing`).

    sort: "name desc|asc" over `count`, `index` (the bucket value), or any
    metric alias (e.g. "avg_value desc" — FacetSort sort-by-nested-stat);
    overrides sort_by_count.
    all_buckets: append a `__all__` row — counts/metrics over ALL buckets,
    unaffected by limit/min_count (AllBucketsAcc role).
    num_buckets: append a `__numBuckets__` row — count = number of distinct
    buckets prior to limit/min_count, metric columns NULL.
    missing: append a `__missing__` row — counts/metrics over NULL-field docs.
    With any option on, `bucket` is cast to string to carry the labels.
    offset: skip the first `offset` buckets of the sorted order before
    taking `limit` (facet.offset / JSON facet `offset` — bucket paging).
    prefix / contains: restrict the bucket DOMAIN before counting
    (facet.prefix / facet.contains — SimpleFacets request params); allBuckets,
    numBuckets, and missing are computed over the same restricted domain,
    matching the reference's per-request filtering.

    Multivalued (ArrayType) fields facet like the reference's UnInvertedField:
    each VALUE of a doc's array is a bucket occurrence (one explode ahead of
    the same single-shuffle partial aggregation — map-side combine intact);
    `missing` counts docs with a NULL or EMPTY array (no values at all).
    """
    from pyspark.sql.types import ArrayType

    if isinstance(df.schema[field].dataType, ArrayType):
        no_values = F.col(field).isNull() | (F.size(field) == 0)
        exploded = df.withColumn(field, F.explode(field))
        if missing:
            # explode drops value-less docs; count them from the ORIGINAL df
            # and splice the row in after the single-valued computation
            out = terms_facet(exploded, field, limit=limit, metrics=metrics,
                              min_count=min_count,
                              sort_by_count=sort_by_count, sort=sort,
                              all_buckets=all_buckets,
                              num_buckets=num_buckets, missing=False,
                              prefix=prefix, contains=contains,
                              offset=offset)
            out = out.withColumn("bucket", F.col("bucket").cast("string"))
            metric_cols = [c for c in out.columns
                           if c not in ("bucket", "count")]
            miss = (df.where(no_values)
                      .agg(F.count(F.lit(1)).alias("count"), *metrics)
                      .select(F.lit("__missing__").alias("bucket"), "count",
                              *metric_cols))
            return out.unionByName(miss)
        df = exploded
    present = df.where(F.col(field).isNotNull())
    if prefix is not None:
        present = present.where(F.col(field).startswith(prefix))
    if contains is not None:
        present = present.where(F.col(field).contains(contains))
    agg = present.groupBy(F.col(field).alias("bucket")).agg(
        F.count(F.lit(1)).alias("count"), *metrics)
    filtered = agg.where(F.col("count") >= min_count)
    if sort:
        name, _, direction = sort.partition(" ")
        key = F.col("bucket") if name == "index" else F.col(name)
        order = [key.asc() if direction == "asc" else key.desc(),
                 F.asc("bucket")]
    else:
        order = ([F.desc("count"), F.asc("bucket")] if sort_by_count
                 else [F.asc("bucket")])
    out = filtered.orderBy(*order)
    if offset:
        out = out.offset(int(offset))
    if limit >= 0:
        # limit < 0 = "all buckets" (JSON facet limit:-1 / facet.limit=-1)
        out = out.limit(limit)
    if not (all_buckets or num_buckets or missing):
        return out

    out = out.withColumn("bucket", F.col("bucket").cast("string"))
    metric_cols = [c for c in out.columns if c not in ("bucket", "count")]
    extras = []
    if all_buckets:
        extras.append(present.agg(F.count(F.lit(1)).alias("count"), *metrics)
                      .select(F.lit("__all__").alias("bucket"), "count",
                              *metric_cols))
    if missing:
        extras.append(df.where(F.col(field).isNull())
                      .agg(F.count(F.lit(1)).alias("count"), *metrics)
                      .select(F.lit("__missing__").alias("bucket"), "count",
                              *metric_cols))
    if num_buckets:
        extras.append(agg.agg(F.count(F.lit(1)).alias("count"))
                      .select(F.lit("__numBuckets__").alias("bucket"), "count",
                              *[F.lit(None).cast(out.schema[c].dataType)
                                 .alias(c) for c in metric_cols]))
    for e in extras:
        out = out.unionByName(e)
    return out


def range_facet(df: DataFrame, field: str, start: float, gap: float,
                metrics: Sequence[Column] = ()) -> DataFrame:
    """`range` facet: fixed-width numeric buckets (bucket = floor((v-start)/gap)).

    Reference: facet/FacetRange.java (legacy: RangeFacetProcessor). Bucket start is
    returned like the reference's bucket `val`.
    """
    bucket = (F.floor((F.col(field) - F.lit(start)) / F.lit(gap)))
    return (df.where(F.col(field) >= start)
              .groupBy((bucket * F.lit(gap) + F.lit(start)).alias("bucket_start"))
              .agg(F.count(F.lit(1)).alias("count"), *metrics)
              .orderBy("bucket_start"))


def range_facet_other(df: DataFrame, field: str, start: float, end: float,
                      gap: float) -> DataFrame:
    """`range` facet with the full facet.range.other surface: in-range buckets
    PLUS the before / after / between summary rows (reference:
    facet/FacetRange.java `other=all` — before = v < start, after = v >= end,
    between = everything in [start, end)).

    One single-pass conditional aggregation: the bucket key is a string label
    so in-range buckets and the three summary rows share one groupBy — no
    second scan, no union of jobs. Returns (bucket, count) with in-range
    buckets labeled by their numeric start, ordered buckets-first.
    """
    v = F.col(field)
    in_range = (v >= start) & (v < end)
    bucket_start = (F.floor((v - F.lit(start)) / F.lit(gap))
                    * F.lit(gap) + F.lit(start))
    label = F.when(in_range, bucket_start.cast("string")) \
             .when(v < start, F.lit("before")).otherwise(F.lit("after"))
    # numeric start carried as a separate sort column so in-range buckets come
    # out in NUMERIC order (Solr's facet.range bucket order) — '10.0' must not
    # sort before '5.0'; the string label is display-only.
    buckets = (df.groupBy(label.alias("bucket"),
                          F.when(in_range, bucket_start).alias("_start"))
                 .agg(F.count(F.lit(1)).alias("count")))
    between = (df.where(in_range)
                 .agg(F.count(F.lit(1)).alias("count"))
                 .select(F.lit("between").alias("bucket"),
                         F.lit(None).cast("double").alias("_start"), "count"))
    out = buckets.unionByName(between)
    is_summary = F.col("bucket").isin("before", "after", "between")
    return (out.orderBy(is_summary.cast("int"),
                        F.col("_start"), F.col("bucket"))
               .select("bucket", "count"))


def date_range_facet(df: DataFrame, field: str, start: str, end: str,
                     gap: str, now=None,
                     metrics: Sequence[Column] = ()) -> DataFrame:
    """`facet.range` over a DATE field with DateMath endpoints and gap
    (reference: handler/component/RangeFacetRequest.java date handling +
    util/DateMathParser.java:91 — `start=NOW/MONTH-2MONTHS`, `gap=+1MONTH`).

    Bucket boundaries are enumerated DRIVER-side exactly like the reference
    (lo += gap until end — calendar arithmetic, so month/year buckets have
    their true variable widths), then counting is ONE conditional-CASE
    groupBy: the bucket key is a literal boundary chain evaluated in codegen,
    one shuffle with map-side combine, no per-bucket scan. `now` anchors NOW
    (pass a fixed instant for deterministic results — Solr's request-scoped
    NOW parameter). Output: (bucket_start timestamp, count, *metrics) in
    bucket order; docs outside [start, last bucket end) fall in no bucket.
    """
    from solr_spark.functions.datemath import (
        apply_gap,
        date_math_py,
        parse_gap,
    )

    lo = date_math_py(start, now=now)
    hi = date_math_py(end, now=now)
    gap_ops = parse_gap(gap)
    bounds = []
    b = lo
    while b < hi:
        nxt = apply_gap(b, gap_ops)
        if nxt <= b:
            raise ValueError(f"gap {gap!r} does not advance from {b}")
        # the last bucket runs a full gap past `end` (Solr's default,
        # hardend=false), so its width is never truncated
        bounds.append((b, nxt))
        b = nxt
    if not bounds:
        raise ValueError("empty date range: end must exceed start")
    v = F.col(field)
    label = None
    for blo, bhi in bounds:
        cond = (v >= F.lit(blo)) & (v < F.lit(bhi))
        label = F.when(cond, F.lit(blo)) if label is None \
            else label.when(cond, F.lit(blo))
    return (df.groupBy(label.cast("timestamp").alias("bucket_start"))
              .agg(F.count(F.lit(1)).alias("count"), *metrics)
              .where(F.col("bucket_start").isNotNull())
              .orderBy("bucket_start"))


def facet_2d(df: DataFrame, x: str, y: str, limit_x: int = 5,
             limit_y: int = 3, metrics: Sequence[Column] = ()) -> DataFrame:
    """`facet2D()` stream: top-X outer buckets (by total count), top-Y inner
    buckets per outer, with per-cell count + metrics (reference:
    solrj-streaming/.../io/stream/Facet2DStream.java — dimensions=(X, Y)).

    One (x, y) groupBy produces every cell, outer totals rank the X cut, and
    a per-outer window takes the Y cut — two exchanges total, no per-bucket
    re-query, no refinement (exact, like all facets here). Output:
    (x, y, count, *metrics) ordered by outer total desc, x, count desc, y.
    """
    cell = df.groupBy(F.col(x).alias("x"), F.col(y).alias("y")).agg(
        F.count(F.lit(1)).alias("count"), *metrics)
    top_outer = (cell.groupBy("x").agg(F.sum("count").alias("_xtot"))
                 .orderBy(F.desc("_xtot"), F.asc("x")).limit(limit_x))
    w = Window.partitionBy("x").orderBy(F.desc("count"), F.asc("y"))
    return (cell.join(F.broadcast(top_outer), "x")
                .withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= limit_y)
                .orderBy(F.desc("_xtot"), F.asc("x"),
                         F.desc("count"), F.asc("y"))
                .drop("_rn", "_xtot"))


def interval_facet(df: DataFrame, field: str,
                   intervals: dict[str, str]) -> DataFrame:
    """`facet.interval`: arbitrary, possibly-OVERLAPPING intervals over one
    field, counted in a SINGLE conditional-aggregation pass (the reference
    streams doc values once through its interval list —
    request/IntervalFacets.java:101; we fold all intervals into one scan,
    same as query_facet).

    Interval syntax is Solr's: '[lo,hi]' / '(lo,hi)' mixes inclusive and
    exclusive ends, '*' is unbounded (e.g. '[*,10)'). Values parse as
    numbers when possible, else compare as strings. Output: (interval,
    count) in request order (Solr returns intervals in request order).
    """
    import re

    def bound(raw: str):
        raw = raw.strip()
        if raw == "*":
            return None
        try:
            return float(raw)
        except ValueError:
            return raw

    v = F.col(field)
    preds: dict[str, Column] = {}
    for name, spec in intervals.items():
        m = re.match(r"^([\[\(])(.*),(.*)([\]\)])$", spec.strip())
        if not m:
            raise ValueError(f"bad interval syntax {spec!r}")
        lo, hi = bound(m.group(2)), bound(m.group(3))
        p = F.lit(True)
        if lo is not None:
            p = p & (v >= lo if m.group(1) == "[" else v > lo)
        if hi is not None:
            p = p & (v <= hi if m.group(4) == "]" else v < hi)
        preds[name] = p
    row = df.agg(*[F.count(F.when(p, F.lit(1))).alias(n)
                   for n, p in preds.items()])
    stack = ", ".join(f"'{n}', `{n}`" for n in preds)
    return row.select(
        F.expr(f"stack({len(preds)}, {stack}) as (interval, count)"))


def list_ranges_facet(df: DataFrame, field: str,
                      ranges: Sequence[dict],
                      metrics: Sequence[tuple[str, str]] = ()) -> DataFrame:
    """JSON range facet with an explicit `ranges` list (SOLR-6348;
    RangeFacetProcessor's `ranges` parameter — arbitrary, possibly
    overlapping ranges instead of start/gap arithmetic).

    Each range is `{"range": "[0,100)"}` (interval syntax, `*` unbounded) or
    `{"from": 0, "to": 100, "inclusive_from": True, "inclusive_to": False}`
    (the reference's defaults: from-inclusive, to-exclusive). The bucket key
    is the canonical range string, exactly how the reference labels these
    buckets. Like `interval_facet`, ALL ranges and metrics fold into ONE
    conditional-aggregation scan — overlap costs nothing extra, and there is
    no shuffle at all (one partial-agg reduce to a single row, then a stack).
    """
    import re

    v = F.col(field)
    rows: list[tuple[str, Column]] = []
    for spec in ranges:
        if "range" in spec:
            m = re.match(r"^([\[\(])(.*),(.*)([\]\)])$", spec["range"].strip())
            if not m:
                raise ValueError(f"bad range syntax {spec['range']!r}")
            lo = None if m.group(2).strip() == "*" else float(m.group(2))
            hi = None if m.group(3).strip() == "*" else float(m.group(3))
            inc_lo, inc_hi = m.group(1) == "[", m.group(4) == "]"
        else:
            lo, hi = spec.get("from"), spec.get("to")
            inc_lo = bool(spec.get("inclusive_from", True))
            inc_hi = bool(spec.get("inclusive_to", False))
        p = F.lit(True)
        if lo is not None:
            p = p & (v >= lo if inc_lo else v > lo)
        if hi is not None:
            p = p & (v <= hi if inc_hi else v < hi)

        def fmt(x):
            if x is None:
                return "*"
            return str(int(x)) if float(x).is_integer() else str(x)

        key = (("[" if inc_lo else "(") + fmt(lo) + "," + fmt(hi)
               + ("]" if inc_hi else ")"))
        rows.append((key, p))

    aggs, names = [], []
    for i, (key, p) in enumerate(rows):
        aggs.append(F.count(F.when(p, F.lit(1))).alias(f"__c{i}"))
        names.append((key, [f"__c{i}"]))
        for name, col in metrics:
            a = f"__m{i}_{name}_{col}"
            if name == "missing":
                m = F.count(F.when(p & F.col(col).isNull(), F.lit(1)))
            elif name == "sumsq":
                m = F.sum(F.when(p, F.col(col) * F.col(col)))
            else:
                m = _METRICS[name](F.when(p, F.col(col)))
            aggs.append(m.alias(a))
            names[-1][1].append(a)
    one = df.agg(*aggs)
    out_cols = ["count"] + [f"{n}_{c}" for n, c in metrics]
    stack = ", ".join(
        f"'{key}', " + ", ".join(f"`{a}`" for a in cols)
        for key, cols in names)
    return one.select(F.expr(
        f"stack({len(rows)}, {stack}) as (`range`, "
        + ", ".join(f"`{c}`" for c in out_cols) + ")"))


def query_facet(df: DataFrame, preds: dict[str, Column]) -> DataFrame:
    """`query` facets: one bucket per named predicate, computed in a SINGLE pass via
    conditional aggregation + stack (the reference runs one DocSet intersection per
    query facet; we fold them all into one map-side scan).

    Reference: search/facet/FacetQuery.java. Bucket names must be identifier-safe.
    """
    aggs = [F.count(F.when(p, F.lit(1))).alias(name) for name, p in preds.items()]
    row = df.agg(*aggs)
    stack = ", ".join(f"'{n}', `{n}`" for n in preds)
    return row.select(
        F.expr(f"stack({len(preds)}, {stack}) as (bucket, count)")
    ).orderBy("bucket")


def query_facet_stats(df: DataFrame, preds: dict[str, Column],
                      metrics: Sequence[tuple[str, str]] = ()) -> DataFrame:
    """`query` facets carrying nested stat metrics (FacetQuery.java with a
    `facet` block of agg strings): count plus each metric per named
    predicate, still ONE conditional-aggregation pass — overlapping
    predicates cost nothing extra and nothing shuffles by key."""
    aggs, names = [], []
    for i, (bname, p) in enumerate(preds.items()):
        aggs.append(F.count(F.when(p, F.lit(1))).alias(f"__c{i}"))
        cols = [f"__c{i}"]
        for mname, col in metrics:
            a = f"__m{i}_{mname}_{col}"
            if mname == "missing":
                m = F.count(F.when(p & F.col(col).isNull(), F.lit(1)))
            elif mname == "sumsq":
                m = F.sum(F.when(p, F.col(col) * F.col(col)))
            else:
                m = _METRICS[mname](F.when(p, F.col(col)))
            aggs.append(m.alias(a))
            cols.append(a)
        names.append((bname, cols))
    one = df.agg(*aggs)
    out_cols = ["count"] + [f"{n}_{c}" for n, c in metrics]
    stack = ", ".join(
        f"'{b}', " + ", ".join(f"`{a}`" for a in cols) for b, cols in names)
    return (one.select(F.expr(
        f"stack({len(names)}, {stack}) as (bucket, "
        + ", ".join(f"`{c}`" for c in out_cols) + ")"))
        .orderBy("bucket"))


def nested_facet(df: DataFrame, outer: str, inner: str,
                 metrics: Sequence[Column] = (), limit_outer: int | None = None
                 ) -> DataFrame:
    """Nested terms facet (sub-facet per bucket): one multi-key groupBy, NOT a
    per-bucket re-query — the flat (outer, inner) aggregation is the exact,
    single-shuffle equivalent of the reference's recursive bucket tree
    (FacetRequest.java:353 processSubs).
    """
    agg = df.groupBy(
        F.col(outer).alias("outer_bucket"), F.col(inner).alias("inner_bucket")
    ).agg(F.count(F.lit(1)).alias("count"), *metrics)
    return agg.orderBy("outer_bucket", "inner_bucket") if limit_outer is None else agg


class FacetLevel:
    """One level of a nested facet tree (see facet_tree).

    kind: "terms" or "range". stats: {alias: (metric_name, column)} computed
    over THIS level's buckets (the FacetRequest.processSubs rule: a stat in a
    node's `facet` dict belongs to that node's buckets, not to leaf cells).
    sort: "count desc|asc", "index asc|desc", or "<stat alias> desc|asc".
    """

    def __init__(self, name: str, field: str, kind: str = "terms",
                 limit: int = 10, mincount: int = 1, sort: str | None = None,
                 stats: dict[str, tuple[str, str]] | None = None,
                 prefix: str | None = None, contains: str | None = None,
                 start: float | None = None, end: float | None = None,
                 gap: float | None = None):
        self.name, self.field, self.kind = name, field, kind
        self.limit, self.mincount, self.sort = limit, mincount, sort
        self.stats = stats or {}
        self.prefix, self.contains = prefix, contains
        self.start, self.end, self.gap = start, end, gap
        if kind == "range" and (start is None or gap is None):
            raise ValueError(f"range level {name!r} needs start and gap")
        if kind not in ("terms", "range"):
            raise ValueError(f"unsupported facet level kind {kind!r}")

    def key_expr(self) -> Column:
        """Bucket key, NULL for docs outside this level's domain — outer
        levels keep counting such docs (a doc below a range sub-facet's start
        still counts in its parent terms bucket, as in the reference)."""
        v = F.col(self.field)
        if self.kind == "terms":
            pred = v.isNotNull()
            if self.prefix is not None:
                pred = pred & v.startswith(self.prefix)
            if self.contains is not None:
                pred = pred & v.contains(self.contains)
            return F.when(pred, v)
        pred = v >= float(self.start)
        if self.end is not None:
            pred = pred & (v < float(self.end))
        bucket = (F.floor((v - F.lit(float(self.start))) / F.lit(float(self.gap)))
                  * F.lit(float(self.gap)) + F.lit(float(self.start)))
        return F.when(pred, bucket)


# Metrics whose bucket value is re-aggregable from per-cell moment partials
# (sum of sums, min of mins, ...). `unique`/`hll`/`missing` are not — they are
# leaf-level only in facet_tree (raise otherwise).
_MOMENT_METRICS = {"sum", "avg", "min", "max", "count", "countvals",
                   "sumsq", "stddev", "variance"}


def facet_tree(df: DataFrame, levels: Sequence[FacetLevel]) -> DataFrame:
    """Arbitrary-depth nested facet tree in ONE corpus scan.

    The reference's FacetParser/FacetRequest tree (search/facet/
    FacetRequest.java:353 processSubs) nests terms/range facets to any depth
    with per-node sort/limit/mincount and per-node stats. The exact,
    Spark-shaped equivalent generalizes the facet_2d plan:

      1. ONE groupBy over every level's bucket key produces the leaf CELLS
         (with per-cell count, leaf stats, and moment partials for non-leaf
         stats). Docs outside an inner level's domain get a NULL key there but
         still flow into their outer buckets' aggregates.
      2. Per level, window sums over the (tiny) cells table reconstitute the
         level's bucket count + stats — no second corpus scan.
      3. Per level, a dense_rank window applies that node's sort + limit +
         mincount; surviving cells keep descending.

    All post-scan work happens on the cells table (bounded by the product of
    bucket cardinalities), so the plan is one wide exchange + small-window
    exchanges — the facet_2d shape at depth n. Non-leaf stats must be
    moment re-aggregable (sum/avg/min/max/count/countvals/sumsq/stddev/
    variance); unique/hll are leaf-only by construction (exact distinct does
    not decompose over cells).

    Output: one row per surviving leaf cell — per level ℓ: `<name>` (bucket)
    and `<name>_count`, stat columns under their aliases; ordered by each
    level's rank then bucket.
    """
    if not levels:
        raise ValueError("facet_tree needs at least one level")
    names = [lv.name for lv in levels]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate level names: {names}")
    aliases = [a for lv in levels for a in lv.stats]
    if len(set(aliases)) != len(aliases):
        raise ValueError(f"duplicate stat aliases across levels: {aliases}")
    n = len(levels)
    leaf = n - 1

    # ---- pass 1: one scan -> leaf cells with count + partials
    keys = [lv.key_expr().alias(lv.name) for lv in levels]
    aggs: list[Column] = [F.count(F.lit(1)).alias("__cells")]
    # moment partials per (level, alias): which partials a metric needs
    for i, lv in enumerate(levels):
        for alias, (m, col) in lv.stats.items():
            if i == leaf:
                if m not in _METRICS:
                    raise ValueError(f"unknown facet metric {m!r}")
                aggs.append(_METRICS[m](col).alias(alias))
                continue
            if m not in _MOMENT_METRICS:
                raise ValueError(
                    f"stat {m!r} ({alias}) is not re-aggregable across "
                    f"sub-facet cells — leaf-level only")
            c = F.col(col)
            if m in ("sum", "avg", "sumsq", "stddev", "variance", "countvals",
                     "count"):
                aggs.append(F.count(c).alias(f"__{alias}_n"))
            if m in ("sum", "avg", "stddev", "variance"):
                aggs.append(F.sum(c).alias(f"__{alias}_s"))
            if m in ("sumsq", "stddev", "variance"):
                aggs.append(F.sum(c * c).alias(f"__{alias}_q"))
            if m == "min":
                aggs.append(F.min(c).alias(f"__{alias}_mn"))
            if m == "max":
                aggs.append(F.max(c).alias(f"__{alias}_mx"))
    cells = df.groupBy(*keys).agg(*aggs)

    # ---- pass 2: per-level bucket aggregates via windows over cells
    out = cells
    for i, lv in enumerate(levels):
        w = Window.partitionBy(*[F.col(x.name) for x in levels[: i + 1]])
        out = out.withColumn(f"{lv.name}_count", F.sum("__cells").over(w))
        for alias, (m, col) in lv.stats.items():
            if i == leaf:
                continue  # computed directly in the cell agg
            if m in ("count", "countvals"):
                expr = F.sum(f"__{alias}_n").over(w)
            elif m in ("sum", "sumsq"):
                src = f"__{alias}_s" if m == "sum" else f"__{alias}_q"
                expr = F.sum(src).over(w)
            elif m == "avg":
                expr = (F.sum(f"__{alias}_s").over(w)
                        / F.sum(f"__{alias}_n").over(w))
            elif m == "min":
                expr = F.min(f"__{alias}_mn").over(w)
            elif m == "max":
                expr = F.max(f"__{alias}_mx").over(w)
            else:  # stddev / variance (sample, matching F.stddev/F.variance)
                cnt = F.sum(f"__{alias}_n").over(w)
                s = F.sum(f"__{alias}_s").over(w)
                q = F.sum(f"__{alias}_q").over(w)
                var = F.when(cnt > 1, (q - s * s / cnt) / (cnt - F.lit(1)))
                expr = F.sqrt(var) if m == "stddev" else var
            out = out.withColumn(alias, expr)

    # ---- pass 3: per-level sort + mincount + limit via dense_rank
    for i, lv in enumerate(levels):
        bucket = F.col(lv.name)
        cnt = F.col(f"{lv.name}_count")
        out = out.where(bucket.isNull() | (cnt >= lv.mincount))
        if lv.sort:
            sname, _, sdir = lv.sort.strip().partition(" ")
            sdir = (sdir or "desc").strip().lower()
            if sdir not in ("asc", "desc"):
                raise ValueError(f"bad sort direction {sdir!r} in {lv.sort!r}")
            skey = (bucket if sname == "index"
                    else cnt if sname == "count" else F.col(sname))
            order = [skey.asc_nulls_last() if sdir == "asc"
                     else skey.desc_nulls_last()]
        elif lv.kind == "range":
            order = [bucket.asc_nulls_last()]   # range buckets: index order
        else:
            order = [cnt.desc_nulls_last()]     # terms default: count desc
        order.append(bucket.asc_nulls_last())
        wr = Window.partitionBy(
            *[F.col(x.name) for x in levels[:i]]).orderBy(*order)
        out = (out.withColumn(f"__rk_{i}", F.dense_rank().over(wr))
                  .where(bucket.isNull() | (F.col(f"__rk_{i}") <= lv.limit)))

    # leaf rows: every level's bucket resolved
    for lv in levels:
        out = out.where(F.col(lv.name).isNotNull())
    keep = ([x for lv in levels
             for x in (lv.name, f"{lv.name}_count")] + aliases)
    return (out.orderBy(*[c for i in range(n)
                          for c in (f"__rk_{i}", levels[i].name)])
               .select(*keep))


def pivot_facet(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    """Legacy pivot facet: counts along a field path (decision-tree counts).

    Reference: handler/component/PivotFacetProcessor.java. Multi-column groupBy.
    """
    return (df.groupBy(*[F.col(f) for f in fields])
              .agg(F.count(F.lit(1)).alias("count"))
              .orderBy(*fields))


def pivot_facet_stats(df: DataFrame, fields: Sequence[str],
                      metrics: dict[str, str] | None = None,
                      mincount: int = 1) -> DataFrame:
    """Pivot facet with per-bucket counts at EVERY level plus attached stats
    (the `facet.pivot={!stats=piv}f1,f2` + `stats.field={!tag=piv}x` combo).

    Reference: handler/component/PivotFacetProcessor.java (the pivot tree
    carries a count per node at every depth, not just the leaves; :258
    addPivotQueriesAndRanges attaches tagged stats to each node). The
    reference materializes the tree by recursive per-bucket DocSet
    intersections; the Spark shape is ONE `rollup` aggregation — Catalyst
    expands it to a single pass with partial (map-side) aggregation, so every
    tree level comes out of one shuffle, and stats ride the same pass.

    Output: one row per tree node — the pivot fields (rolled-up suffix
    levels are NULL), `level` (1-based depth), `count`, plus one column per
    metrics entry (name -> "stat(col)" strings as in terms_facet). The
    grand-total row is excluded (the reference's pivot has no root node).
    Caveat: a genuine NULL data value in a pivot field is distinguishable
    from a rolled-up level only via `level`, as with SQL ROLLUP.
    """
    cols = [F.col(f) for f in fields]
    aggs = [F.count(F.lit(1)).alias("count")]
    for name, spec in (metrics or {}).items():
        aggs.append(metric(spec[:spec.index("(")],
                           spec[spec.index("(") + 1:-1]).alias(name))
    # grouping() is only valid inside the aggregate list, so `level` is
    # computed as one of the aggs rather than a post-hoc withColumn
    level = sum((F.lit(1) - F.grouping(c)).cast("int") for c in cols)
    aggs.append(level.alias("level"))
    out = (df.rollup(*cols).agg(*aggs)
             .where(F.col("level") >= 1)
             .where(F.col("count") >= int(mincount)))
    order = [F.asc_nulls_last(f) for f in fields] + [F.asc("level")]
    return out.orderBy(*order)


def stats_component(df: DataFrame, field: str,
                    calcdistinct: bool = False) -> DataFrame:
    """StatsComponent: min/max/sum/count/missing/mean/stddev/sumOfSquares for a field.

    Reference: handler/component/StatsComponent.java:34, StatsValuesFactory.java.
    Single map-side-combinable aggregation.

    calcdistinct=True appends `count_distinct` (stats.calcdistinct /
    countDistinct — StatsValuesFactory's DISTINCT_VALUES stat; the
    reference's unbounded distinctValues LIST is deliberately not returned:
    it is a documented OOM hazard there and an anti-pattern at scale).
    """
    from solr_spark.functions.portable import exact_sum

    c = F.col(field)
    # sum / sumOfSquares use the order-independent exact_sum kernel and stay
    # DECIMAL(38,4): double accumulation is partition-order-nondeterministic
    # (sum_of_squares at sf0.1 reaches ~2e15, where order noise exceeds the 4dp
    # rounding grain, and even the final decimal->double cast is
    # engine-specific once the ulp reaches 0.25), while the quantize-then-
    # DECIMAL sum is deterministic at every scale and every partitioning, and
    # still map-side combinable.
    return df.agg(*_stats_aggs(field, calcdistinct))


def _stats_aggs(field: str, calcdistinct: bool = False) -> list[Column]:
    from solr_spark.functions.portable import exact_sum

    c = F.col(field)
    extra = [F.count_distinct(c).alias("count_distinct")] \
        if calcdistinct else []
    return [
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        exact_sum(c, 4).alias("sum"),
        F.count(c).alias("count"),
        F.count(F.when(c.isNull(), F.lit(1))).alias("missing"),
        F.round(F.avg(c), 6).alias("mean"),
        exact_sum(c * c, 4).alias("sum_of_squares"),
        F.round(F.stddev(c), 6).alias("stddev"),
        *extra,
    ]


def stats_facet(df: DataFrame, field: str, facet_field: str,
                calcdistinct: bool = False) -> DataFrame:
    """StatsComponent's `stats.facet`: the full stats block PER VALUE of a
    facet field (StatsComponent.java stats.facet / StatsInfo.facets). One
    grouped aggregation — identical stat kernels to stats_component, keyed
    by the facet value (null bucket included, as the reference returns a
    bucket for documents missing the facet field)."""
    return (df.groupBy(F.col(facet_field).alias("facet_value"))
              .agg(*_stats_aggs(field, calcdistinct)))


def percentiles(df: DataFrame, field: str, pcts: Sequence[float]) -> DataFrame:
    """percentile facet metric — exact linear-interpolation percentiles.

    Reference: search/facet/PercentileAgg.java (t-digest approximation). We use
    Spark's exact `percentile` here for oracle parity; at 100 TB swap to
    percentile_approx (same t-digest-style contract as the reference).
    """
    cols = [F.round(F.expr(f"percentile({field}, {p})"), 6).alias(f"p{int(p * 100)}")
            for p in pcts]
    return df.agg(*cols)


def timeseries(df: DataFrame, ts_col: str, unit: str,
               metrics: Sequence[Column] = ()) -> DataFrame:
    """timeseries() — fixed time buckets with metrics.

    Reference: stream/TimeSeriesStream.java:55 (range facet over time). Spark:
    date_trunc groupBy; at scale the bucket column should also be the table's
    partition column so the scan prunes.
    """
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket_ts")
    return (df.groupBy(bucket)
              .agg(F.count(F.lit(1)).alias("count"), *metrics)
              .orderBy("bucket_ts"))


def relatedness(df: DataFrame, bucket_field: str, fg_pred: Column,
                min_popularity: float = 0.0) -> DataFrame:
    """JSON-facet `relatedness` metric: how related each bucket is to a
    foreground set vs the background collection.

    Reference: RelatednessAgg (solr/core/src/java/org/apache/solr/search/facet/
    RelatednessAgg.java) — per bucket, fg_count/fg_size vs bg_count/bg_size,
    normalized to (-1, 1) (the "semantic knowledge graph" metric). One groupBy
    pass with conditional aggregation; the global sizes come from a scalar
    re-aggregation of the (small) bucket table broadcast-joined back — no
    unpartitioned window funneling every bucket through one task.
    """
    counted = df.groupBy(bucket_field).agg(
        F.sum(fg_pred.cast("long")).alias("fg_count"),
        F.count(F.lit(1)).alias("bg_count"))
    totals = counted.agg(F.sum("fg_count").alias("fg_size"),
                         F.sum("bg_count").alias("bg_size"))
    counted = counted.join(F.broadcast(totals))
    if min_popularity > 0:
        counted = counted.where(
            (F.col("bg_count") / F.col("bg_size")) >= min_popularity)
    fg_pop = F.col("fg_count") / F.col("fg_size")
    bg_pop = F.col("bg_count") / F.col("bg_size")
    rel = F.when(F.col("fg_count") == 0, F.lit(-1.0)).otherwise(
        (fg_pop - bg_pop) / (fg_pop + bg_pop))
    return counted.select(
        bucket_field, "fg_count", "bg_count",
        F.round(rel, 6).alias("relatedness"))


# ----------------------------------------------------------- domain changes

def facet_domain(base: DataFrame, tagged_filters: dict[str, Column],
                 exclude_tags: Sequence[str] = ()) -> DataFrame:
    """JSON Facet `domain:{excludeTags:[...]}`: re-derive a facet's domain by
    applying every tagged filter EXCEPT the excluded ones (the multi-select
    faceting idiom — a field's own filter is excluded from its facet counts).

    Reference: the tag/ex local params + JSON facet domain filter exclusion
    (search/facet/FacetRequest.java domain parsing; SimpleFacets excludeTags).
    Filters compose as plain `where` predicates, so Catalyst still pushes the
    conjunction of the kept filters into the scan — excluding a tag widens
    the pushed predicate, it never disables pushdown.
    """
    out = base
    for tag, pred in tagged_filters.items():
        if tag not in exclude_tags:
            out = out.where(pred)
    return out


def to_children(parents: DataFrame, children: DataFrame, on: str) -> DataFrame:
    """JSON Facet `domain:{blockChildren:...}`: map a PARENT domain to its
    child documents. Relational analog of Lucene's block-join child transform
    (search/join/BlockJoinChildQParserPlugin.java): a left-semi join of the
    child table against the parent keys — broadcastable when the parent
    domain is filtered small, one shuffle otherwise; never a row-multiplying
    join (semi keeps child rows unique)."""
    return children.join(parents.select(on).distinct(), on, "left_semi")


def to_parents(children: DataFrame, parents: DataFrame, on: str) -> DataFrame:
    """JSON Facet `domain:{blockParent:...}` — child domain to parent docs
    (search/join/BlockJoinParentQParserPlugin.java)."""
    return parents.join(children.select(on).distinct(), on, "left_semi")


def range_facet_include(df: DataFrame, field: str, start: float, end: float,
                        gap: float, include: Sequence[str] = ("lower",),
                        hardend: bool = False) -> DataFrame:
    """`range` facet with the full facet.range.include + facet.range.hardend
    surface (reference: facet/FacetRange.java include flags, legacy
    RangeFacetProcessor; params lower/upper/edge/outer/all).

    Solr's boundary rules, reproduced exactly:
      * each gap bucket [lo, hi] includes lo iff `lower` is set (or `edge`
        and lo == start), includes hi iff `upper` is set (or `edge` and hi ==
        the actual end);
      * with BOTH lower and upper set, boundary values legitimately count in
        two adjacent buckets — so buckets cannot be a partition/groupBy key;
      * before counts v < start (<= iff `outer`, or neither lower nor edge);
        after counts v > actual end (>= iff `outer`, or neither upper nor
        edge); between spans [start, end] with each edge included iff
        lower/upper (or edge) is set;
      * hardend=True truncates the last bucket at `end`; otherwise it runs a
        full gap past it (the actual end used by after/between follows suit).

    Because buckets may overlap, this is ONE conditional aggregation — a
    single scan producing one row of per-bucket sums (bucket list is
    driver-side bounded, like the reference's), unpivoted to (bucket, count).
    Map-side partial aggregation applies; no shuffle bigger than one row per
    partition at any scale.
    """
    incl = set(include)
    if "all" in incl:
        incl = {"lower", "upper", "edge", "outer"}
    bounds: list[tuple[float, float]] = []
    lo = float(start)
    while lo < end:
        hi = lo + gap
        if hardend:
            hi = min(hi, float(end))
        bounds.append((lo, hi))
        lo += gap
    if not bounds:
        raise ValueError("empty range: end must exceed start")
    end_actual = bounds[-1][1]
    v = F.col(field)

    aggs, labels = [], []
    for i, (blo, bhi) in enumerate(bounds):
        inc_lo = "lower" in incl or ("edge" in incl and blo == float(start))
        inc_hi = "upper" in incl or ("edge" in incl and bhi == end_actual)
        cond = (v >= blo) if inc_lo else (v > blo)
        cond = cond & ((v <= bhi) if inc_hi else (v < bhi))
        aggs.append(F.sum(cond.cast("long")).alias(f"_b{i}"))
        labels.append(str(blo))
    lower_in = bool({"lower", "edge"} & incl)
    upper_in = bool({"upper", "edge"} & incl)
    before = (v <= start) if ("outer" in incl or not lower_in) else (v < start)
    after = ((v >= end_actual) if ("outer" in incl or not upper_in)
             else (v > end_actual))
    between = (((v >= start) if lower_in else (v > start))
               & ((v <= end_actual) if upper_in else (v < end_actual)))
    row = df.agg(*aggs,
                 F.sum(before.cast("long")).alias("_before"),
                 F.sum(after.cast("long")).alias("_after"),
                 F.sum(between.cast("long")).alias("_between"))
    pairs = [x for i, lab in enumerate(labels) for x in (f"'{lab}'", f"_b{i}")]
    pairs += ["'before'", "_before", "'after'", "_after",
              "'between'", "_between"]
    n = len(labels) + 3
    return row.selectExpr(
        f"stack({n}, {', '.join(pairs)}) AS (bucket, count)"
    ).select("bucket", F.coalesce("count", F.lit(0)).alias("count"))
