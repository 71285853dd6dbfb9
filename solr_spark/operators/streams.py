"""Streaming-expression analogs (SURVEY.md §2.3/§2.4/§2.7) as DataFrame combinators.

The reference's streaming expressions are pull-based Volcano iterators
(solr/solrj-streaming/src/java/org/apache/solr/client/solrj/io/stream/TupleStream.java);
here each expression is a function DataFrame -> DataFrame and the "stream tree" is the
Catalyst logical plan — pushdown / join-strategy selection / partial aggregation come
from the optimizer instead of hand-written iterators.

Scale notes per operator are in the docstrings: which ones shuffle, which broadcast,
and what the 100-TB plan shape is.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def search(df: DataFrame, where: Column | str | None = None,
           fl: Sequence[str] | None = None,
           sort: Sequence[Column | str] | None = None) -> DataFrame:
    """search(collection, q, fl, sort) source — a filtered/projected scan.

    Reference: stream/SearchStream.java:51 (one SolrStream per shard, k-way merged by
    CloudSolrStream.java:279-444). Spark: filter + project reach the parquet scan as
    PushedFilters/ReadSchema; the shard merge is the sort-shuffle.
    """
    if where is not None:
        df = df.where(where)
    if fl:
        df = df.select(*fl)
    if sort:
        df = df.orderBy(*sort)
    return df


def select_stream(df: DataFrame, mapping: dict[str, Column | str]) -> DataFrame:
    """select(...) decorator: projection + rename + computed fields.

    Reference: stream/SelectStream.java:49. `mapping` is out_name -> column/expr.
    """
    cols = [(F.expr(c) if isinstance(c, str) else c).alias(name)
            for name, c in mapping.items()]
    return df.select(*cols)


def top(df: DataFrame, n: int, sort: Sequence[Column | str]) -> DataFrame:
    """top(n, sort) — bounded re-sort of a stream.

    Reference: stream/RankStream.java:47 (bounded priority queue). Spark's
    TakeOrderedAndProject is the same algorithm distributed: per-partition heap of
    size n, then a driver-side merge — no full sort at any scale.
    """
    return df.orderBy(*sort).limit(n)


def unique(df: DataFrame, over: Sequence[str],
           sort: Sequence[Column | str] | None = None) -> DataFrame:
    """unique(over=f) — dedup by key, first-wins under the stream's sort order.

    Reference: stream/UniqueStream.java:44 (requires sorted input; emits first of each
    group). With `sort` given we reproduce first-wins deterministically via a windowed
    row_number (one shuffle on `over`); without it this is dropDuplicates (hash agg).
    """
    if sort is None:
        return df.dropDuplicates(list(over))
    from pyspark.sql import Window

    w = Window.partitionBy(*over).orderBy(*sort)
    return (df.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") == 1).drop("__rn"))


def merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """merge(a, b, on=sort) — sorted union. Reference: stream/MergeStream.java:41.

    Spark keeps order as a property of the plan, not the stream: union then sort
    where order matters downstream (the sort-merge is one shuffle-free pass when
    both inputs are already range-partitioned).
    """
    return a.unionByName(b)


def intersect(a: DataFrame, b: DataFrame, on: Sequence[str]) -> DataFrame:
    """intersect(a, b, on) — rows of A whose key appears in B.

    Reference: stream/IntersectStream.java:42 (sorted-input merge intersect).
    Spark: left-semi join; AQE picks broadcast when B's key set is small.
    """
    return a.join(b.select(*on).dropDuplicates(list(on)), list(on), "left_semi")


def complement(a: DataFrame, b: DataFrame, on: Sequence[str]) -> DataFrame:
    """complement(a, b, on) — rows of A whose key does NOT appear in B.

    Reference: stream/ComplementStream.java:42. Spark: left-anti join.
    """
    return a.join(b.select(*on).dropDuplicates(list(on)), list(on), "left_anti")


def inner_join(a: DataFrame, b: DataFrame, on: Sequence[str]) -> DataFrame:
    """innerJoin(a, b, on) — reference sort-merge join (stream/InnerJoinStream.java:34,
    'both streams must be sorted'). Spark picks SMJ/shuffled-hash/broadcast itself."""
    return a.join(b, list(on), "inner")


def left_outer_join(a: DataFrame, b: DataFrame, on: Sequence[str]) -> DataFrame:
    """leftOuterJoin — stream/LeftOuterJoinStream.java."""
    return a.join(b, list(on), "left")


def full_outer_join(a: DataFrame, b: DataFrame, on: Sequence[str]) -> DataFrame:
    """fullOuterJoin — stream/FullOuterJoinStream.java."""
    return a.join(b, list(on), "full")


def hash_join(full: DataFrame, hashed: DataFrame, on: Sequence[str],
              how: str = "inner") -> DataFrame:
    """hashJoin(full, hashed, on) — reference reads `hashed` fully into memory and
    probes (stream/HashJoinStream.java:46). Spark analog: explicit broadcast of the
    small side — the planner hint version of the same decision.
    """
    return full.join(F.broadcast(hashed), list(on), how)


def scored_join(outer: DataFrame, inner: DataFrame, outer_key: str,
                inner_key: str, score_col: str = "score",
                mode: str = "max") -> DataFrame:
    """{!join score=max|avg|total|min} — scored semi-join: keep outer rows whose
    `outer_key` appears among the inner rows' `inner_key`, carrying an
    aggregated `score` column (the per-key max/avg/total/min of the inner
    side's scores) instead of the constant-score semi-join.

    Reference: search/join/ScoreJoinQParserPlugin.java:92 (Lucene JoinUtil
    ScoreMode). Spark shape: the inner side aggregates FIRST (map-side partial
    agg shrinks it to one row per key — at 100 TB this is the difference
    between joining postings and joining a key dictionary), then an equi-join
    that AQE broadcasts when the aggregated side is small.
    """
    aggs = {"max": F.max, "min": F.min, "avg": F.avg, "total": F.sum}
    if mode not in aggs:
        raise ValueError(f"unknown score mode: {mode!r} (use {sorted(aggs)})")
    scores = (inner.groupBy(F.col(inner_key).alias(outer_key))
              .agg(aggs[mode](score_col).alias("score")))
    return outer.join(scores, outer_key, "inner")


def block_join_parent_scored(parents: DataFrame, children: DataFrame,
                             parent_key: str, child_key: str,
                             score_col: str = "score",
                             score_mode: str = "max",
                             child_fields: "Sequence[str] | None" = None,
                             child_tiebreak: str | None = None) -> DataFrame:
    """``{!parent which=<parentFilter> score=max|avg|total|min}`` — the
    SCORED block join: child hits' scores roll up to their parent block.

    Reference: search/join/BlockJoinParentQParser.java:56 (the `score`
    local param selects a Lucene ToParentBlockJoinQuery ScoreMode) with the
    ScoreMode contract of ScoreJoinQParserPlugin.java:92 — max/avg/total/
    min of the matching children's scores becomes the parent's score;
    ScoreMode.None is the plain semi-join (q24's shape, `intersect`).

    `children` is the CHILD QUERY's result (typically the scored path's
    output — bm25_topk/scored_topk rows, optionally pre-filtered by a
    child fq) carrying `score_col`; `parents` is the parent-filter domain.
    Spark shape: the children aggregate FIRST (map-side partial agg shrinks
    them to one row per parent key before any join — at 10^12 turns this
    joins a key dictionary, not the child hit stream), then one equi-join
    that AQE broadcasts when the aggregated side is small. Output: parent
    columns + `score`, parents ranked score desc / key asc.

    child_fields: the ``childfield(field)`` value source
    (search/join/BlockJoinParentQParser / ChildFieldValueSourceParser —
    registered in ValueSourceParser.java's standardVSParsers): each listed
    child column rides along from the BEST-scoring child of the block
    (requires score_mode="max"; deterministic tie-break by
    `child_tiebreak` ascending, default the child key). The carry is a
    max-of-struct inside the SAME per-key aggregate — no second pass.
    """
    aggs = {"max": F.max, "min": F.min, "avg": F.avg, "total": F.sum}
    if score_mode not in aggs:
        raise ValueError(f"unknown block-join score mode {score_mode!r} "
                         f"(use {sorted(aggs)}, or intersect() for none)")
    agg_cols = [aggs[score_mode](score_col).alias("score")]
    if child_fields:
        if score_mode != "max":
            raise ValueError(
                "child_fields (the childfield() value source) carries "
                "values from the BEST child — it requires score_mode='max'")
        tb = child_tiebreak or child_key
        # max over (score asc-struct, NEGATED tiebreak, payload): the struct
        # max picks the highest score, then the SMALLEST tiebreak (negated
        # numerics sort reversed; for string tiebreaks pass an ordered
        # surrogate), then the payload rides along deterministically
        best = F.max(F.struct(
            F.col(score_col).alias("__s"),
            (-F.col(tb)).alias("__t"),
            *[F.col(f).alias(f) for f in child_fields])).alias("__best")
        agg_cols.append(best)
    rolled = (children.groupBy(F.col(child_key).alias(parent_key))
              .agg(*agg_cols))
    if child_fields:
        for f in child_fields:
            rolled = rolled.withColumn(f, F.col("__best").getField(f))
        rolled = rolled.drop("__best")
    return (parents.join(rolled, parent_key, "inner")
            .orderBy(F.desc("score"), F.asc(parent_key)))


def fetch(stream: DataFrame, dim: DataFrame, on: Sequence[str],
          fl: Sequence[str]) -> DataFrame:
    """fetch() — batched lookup join enriching tuples from a collection by key.

    Reference: stream/FetchStream.java:53 (batchSize-chunked key lookups). Spark:
    broadcast lookup join against the dimension projection.
    """
    return stream.join(F.broadcast(dim.select(*on, *fl)), list(on), "left")


def cartesian_product(df: DataFrame, col: str, out: str) -> DataFrame:
    """cartesianProduct() — one tuple per value of a multivalued field (explode).

    Reference: stream/CartesianProductStream.java:47 (despite the name it unnests).
    """
    return df.withColumn(out, F.explode(F.col(col)))


def rollup(df: DataFrame, over: Sequence[str], metrics: Sequence[Column]) -> DataFrame:
    """rollup(over, metrics) — GROUP BY aggregation.

    Reference: stream/RollupStream.java:43 (sort-based, O(1) memory on sorted input)
    and stream/HashRollupStream.java:43 (hash). Spark's hash aggregate does map-side
    partial aggregation before the exchange, so hot group keys are pre-combined —
    the scale answer to the reference's need for a sorted input.
    """
    return df.groupBy(*over).agg(*metrics)


def significant_terms(docs_terms: DataFrame, fg_pred: Column, term_col: str = "term",
                      doc_col: str = "doc_id", min_doc_freq: int = 1) -> DataFrame:
    """significantTerms — terms over-represented in the foreground vs the corpus.

    Reference: stream/SignificantTermsStream.java:57 and
    search/SignificantTermsQParserPlugin.java (per-shard background+foreground counts
    merged at the coordinator). Input is an exploded (doc, term) table; fg_pred marks
    foreground docs. Single pass: conditional aggregation computes fg and bg document
    frequencies in ONE shuffle, score = (fg/fg_total)/(bg/bg_total) — no second scan.
    Output: term, fg, bg, score (lift).
    """
    pairs = docs_terms.select(doc_col, term_col, fg_pred.alias("__fg")).dropDuplicates(
        [doc_col, term_col]
    )
    totals = pairs.select(
        F.count_distinct(doc_col).alias("n_bg"),
        F.count_distinct(F.when(F.col("__fg"), F.col(doc_col))).alias("n_fg"),
    )
    counts = pairs.groupBy(term_col).agg(
        F.count(F.lit(1)).alias("bg"),
        F.sum(F.col("__fg").cast("long")).alias("fg"),
    ).where(F.col("bg") >= min_doc_freq)
    return counts.crossJoin(F.broadcast(totals)).select(
        F.col(term_col).alias("term"),
        "fg",
        "bg",
        ((F.col("fg") / F.col("n_fg")) / (F.col("bg") / F.col("n_bg"))).alias("score"),
    )


def more_like_this(docs_terms: DataFrame, doc_id, n_docs: int,
                   term_col: str = "term", doc_col: str = "doc_id",
                   k: int = 10, max_query_terms: int = 25) -> DataFrame:
    """mlt — rank documents by shared rare terms with a seed document.

    Reference: handler/MoreLikeThisHandler.java + {!mlt} qparser: select the seed
    doc's top terms by tf*idf, then run them as a disjunction query. Spark shape:
    seed terms (tiny) are broadcast into a semi-join + idf-weighted sum — one shuffle
    over only the postings of the selected terms.
    Output: doc_id, mlt_score (sum of idf of shared seed terms), n_shared.
    """
    pairs = docs_terms.select(doc_col, term_col).dropDuplicates([doc_col, term_col])
    df_counts = pairs.groupBy(term_col).agg(F.count(F.lit(1)).alias("df"))
    seed = (pairs.where(F.col(doc_col) == doc_id)
                 .join(df_counts, term_col)
                 .withColumn("idf", F.log(F.lit(float(n_docs)) / F.col("df")))
                 .orderBy(F.desc("idf"), term_col).limit(max_query_terms))
    return (pairs.where(F.col(doc_col) != doc_id)
                 .join(F.broadcast(seed.select(term_col, "idf")), term_col)
                 .groupBy(doc_col)
                 .agg(F.round(F.sum("idf"), 4).alias("mlt_score"),
                      F.count(F.lit(1)).alias("n_shared"))
                 .orderBy(F.desc("mlt_score"), doc_col)
                 .limit(k))


def mlt_interesting_terms(docs_terms: DataFrame, doc_id, n_docs: int,
                           term_col: str = "term", doc_col: str = "doc_id",
                           max_query_terms: int = 25) -> DataFrame:
    """mlt interestingTerms=details: the seed terms MLT selected, with their
    idf boosts — the introspection companion of more_like_this (same seed
    selection, exposed instead of executed).

    Reference: handler/MoreLikeThisHandler.java InterestingTerm /
    mlt.interestingTerms=list|details (MoreLikeThisParams.INTERESTING_TERMS);
    boost = the term's idf weight, what the reference reports with
    boost=true. Output: term, idf (round 6), df — idf desc, term asc.
    """
    pairs = docs_terms.select(doc_col, term_col).dropDuplicates(
        [doc_col, term_col])
    df_counts = pairs.groupBy(term_col).agg(F.count(F.lit(1)).alias("df"))
    return (pairs.where(F.col(doc_col) == doc_id)
            .join(df_counts, term_col)
            .withColumn("idf", F.round(
                F.log(F.lit(float(n_docs)) / F.col("df")), 6))
            .orderBy(F.desc("idf"), term_col).limit(max_query_terms)
            .select(term_col, "idf", F.col("df").cast("long").alias("df")))


def mlt_content(docs_terms: DataFrame, content_tokens: Sequence[str],
                n_docs: int, term_col: str = "term", doc_col: str = "doc_id",
                k: int = 10, max_query_terms: int = 25,
                min_tf: int = 1, min_doc_freq: int = 1) -> DataFrame:
    """mlt_content — MoreLikeThis seeded by FREE TEXT instead of a stored doc.

    Reference: search/mlt/MLTContentQParserPlugin.java (the `{!mlt_content}`
    parser: `v=` carries arbitrary text, MoreLikeThis.like(Reader) extracts
    interesting terms from it) vs MLTQParserPlugin's seed-document mode.
    Term selection follows MoreLikeThis.createQueue: score each content term
    by tf-in-content * idf (idf = ln(n_docs/df) from the CORPUS dictionary),
    keep the top max_query_terms; mintf/mindf prune low-signal terms
    (SimpleMLTQParser's mintf/mindf knobs). Documents are then ranked by the
    boost-weighted disjunction sum(tf_content * idf) over shared terms.

    Scale shape: the content is query-side and tiny — its term table is
    built on the driver, joined to the corpus df counts, and the surviving
    <= max_query_terms seed rows are BROADCAST into the postings semi-join;
    one groupBy(doc) shuffle bounded by the selected terms' postings.
    Output: doc_id, mlt_score (round 4), n_shared — score desc, doc_id asc.
    """
    from collections import Counter

    spark = docs_terms.sparkSession
    ctf = Counter(t for t in content_tokens if t)
    ctf = {t: c for t, c in ctf.items() if c >= min_tf}
    if not ctf:
        # preserve doc_col's ACTUAL input type (string-keyed corpora must
        # stay unionable with the normal path's result)
        id_t = docs_terms.schema[doc_col].dataType.simpleString()
        return spark.createDataFrame(
            [], f"{doc_col} {id_t}, mlt_score double, n_shared long")
    content = spark.createDataFrame(
        [(t, float(c)) for t, c in sorted(ctf.items())],
        f"{term_col} string, ctf double")
    pairs = docs_terms.select(doc_col, term_col).dropDuplicates(
        [doc_col, term_col])
    df_counts = pairs.groupBy(term_col).agg(F.count(F.lit(1)).alias("df"))
    seed = (content.join(df_counts, term_col)
            .where(F.col("df") >= min_doc_freq)
            .withColumn("idf", F.log(F.lit(float(n_docs)) / F.col("df")))
            .withColumn("boost", F.col("ctf") * F.col("idf"))
            .orderBy(F.desc("boost"), term_col).limit(max_query_terms))
    return (pairs.join(F.broadcast(seed.select(term_col, "boost")), term_col)
            .groupBy(doc_col)
            .agg(F.round(F.sum("boost"), 4).alias("mlt_score"),
                 F.count(F.lit(1)).alias("n_shared"))
            .orderBy(F.desc("mlt_score"), doc_col)
            .limit(k))


def subquery_docs(parents: DataFrame, sub: DataFrame, parent_field: str,
                  sub_field: str, order_by: Sequence[Column | str],
                  rows: int = 10, sub_filter: Column | None = None,
                  out: str = "subquery") -> DataFrame:
    """`[subquery]` doc transformer — every result doc carries the top rows
    of a SEPARATE query parameterized by the row.

    Reference: response/transform/SubQueryAugmenterFactory.java — the
    canonical idiom `fl=*,children:[subquery]` +
    `children.q={!terms f=<sub_field> v=$row.<parent_field>}` re-executes
    the subquery per result document with `$row.*` substitution; fromIndex
    points it at another collection. Relationally the row-parameter
    substitution IS an equi-join key, so the Spark shape is: optional
    subquery filter -> salted two-stage top-`rows` per key
    (windows.salted_top_n — a hot key never funnels one reducer) ->
    group-collect the bounded survivors -> ONE left join onto parents.

    Output adds `out` = array<struct> of the subquery's own columns in
    subquery-sort order, and `out`_numFound = the per-parent TOTAL match
    count pre-limit (what the reference reports as the subquery numFound).
    """
    from solr_spark.operators.windows import salted_top_n

    if sub_filter is not None:
        sub = sub.where(sub_filter)
    keyed = (sub.withColumnRenamed(sub_field, parent_field)
             if sub_field != parent_field else sub)
    nf = f"{out}_numFound"
    counts = keyed.groupBy(parent_field).agg(F.count(F.lit(1)).alias(nf))
    top = salted_top_n(keyed, parent_field, order_by, rows, rank_col="__rn")
    rest = [c for c in top.columns if c not in (parent_field, "__rn")]
    # __rn leads the struct so sort_array reproduces the subquery sort order
    kid = F.struct(F.col("__rn"), *[F.col(c) for c in rest])
    grouped = (top.groupBy(parent_field)
               .agg(F.sort_array(F.collect_list(kid)).alias("__sub")))
    grouped = grouped.withColumn(
        "__sub", F.transform("__sub", lambda s: F.struct(
            *[s[c].alias(c) for c in rest])))
    return (parents.join(grouped, parent_field, "left")
            .join(counts, parent_field, "left")
            .withColumn(out, F.coalesce(F.col("__sub"), F.array()))
            .withColumn(nf, F.coalesce(F.col(nf), F.lit(0)).cast("long"))
            .drop("__sub"))


def child_docs(parents: DataFrame, children: DataFrame, key: str,
               order_cols: Sequence[str], child_filter: Column | None = None,
               limit: int | None = None) -> DataFrame:
    """`[child]` doc transformer (reference: response/transform/
    ChildDocTransformerFactory.java): attach each parent result's child
    documents — optionally filtered (childFilter) and capped (limit, the
    transformer's childLimit with its deterministic first-N contract).

    Children come back as an array<struct> column `children`, ordered by
    `order_cols` (struct sort is field-major, so put the ordering keys
    first), plus `n_children` (the POST-filter, pre-limit count, what the
    reference reports as numFound for the child query).

    Scale shape: one shuffle groups children by parent key (map-side
    combinable collect per key), then an equi-join to parents. Per-parent
    child arrays are block-sized by construction (the reference stores
    parent+children as one contiguous block), so the collected array is
    bounded the same way the reference's child stack is.
    """
    if child_filter is not None:
        children = children.where(child_filter)
    rest = [c for c in children.columns if c not in order_cols and c != key]
    kid = F.struct(*[F.col(c) for c in list(order_cols) + rest])
    grouped = (children.groupBy(key)
               .agg(F.sort_array(F.collect_list(kid)).alias("__ch"),
                    F.count(F.lit(1)).alias("n_children")))
    if limit is not None:
        grouped = grouped.withColumn("__ch", F.slice("__ch", 1, limit))
    return (parents.join(grouped, key, "left")
            .withColumn("children",
                        F.coalesce(F.col("__ch"), F.array()))
            .withColumn("n_children",
                        F.coalesce(F.col("n_children"), F.lit(0))
                         .cast("long"))
            .drop("__ch"))
