"""Window-function analogs (SURVEY.md §2.5): grouping, collapse, expand, cursors.

Solr has no SQL window frames; its grouping/collapse family is collector machinery
(search/Grouping.java:73, search/CollapsingQParserPlugin.java:121 — 3812 LoC).
Each becomes a few lines of windowed DataFrame code; the shuffle is one hash
exchange on the group key, and AQE handles group-key skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def collapse(df: DataFrame, field: str, sort: Sequence[Column | str],
             null_policy: str = "ignore") -> DataFrame:
    """{!collapse field=f nullPolicy=...} — keep exactly one best row per group.

    Reference: search/CollapsingQParserPlugin.java:121 (PostFilter with min/max/sort
    head selection; NULL_IGNORE/NULL_EXPAND/NULL_COLLAPSE). Spark: row_number over
    (partitionBy field, orderBy sort) == 1.
    One shuffle; at 100 TB prefer a pre-bucketed table on `field` to skip it.

    null_policy (the reference's nullPolicy):
      * "ignore"   (default) — rows with a null collapse field are DROPPED;
      * "expand"   — every null-field row survives as its own group (they skip
        the window entirely, so no skew from a hot null partition);
      * "collapse" — all null-field rows form ONE group with one survivor
        (Spark's partitionBy groups nulls together, which is exactly this).
    """
    if null_policy not in ("ignore", "expand", "collapse"):
        raise ValueError(f"unknown nullPolicy {null_policy!r}")
    w = Window.partitionBy(field).orderBy(*sort)
    base = df if null_policy == "collapse" else df.where(F.col(field).isNotNull())
    out = (base.withColumn("__rn", F.row_number().over(w))
               .where(F.col("__rn") == 1).drop("__rn"))
    if null_policy == "expand":
        out = out.unionByName(df.where(F.col(field).isNull()))
    return out


def collapse_agg(df: DataFrame, field: str,
                 keys: Sequence[tuple[str, bool]],
                 null_policy: str = "ignore") -> DataFrame:
    """Aggregation-based `{!collapse}` — same survivor as `collapse(df, field,
    [desc/asc per keys])`, picked with `min_by` over an ordering struct
    instead of a row_number window.

    Why it exists: the window plan shuffles EVERY row to its group's reducer
    and sorts there; `min_by` partial-aggregates map-side, so the exchange
    carries one candidate row per (group, map partition) — measured ~2x
    faster at sf0.1 and the gap widens with rows-per-group (at 100 TB the
    window's shuffle is corpus-sized, this one is group-sized). The struct
    buffer makes Spark pick SortAggregate rather than HashAggregate; the
    partial phase (plan-audited) is what delivers the win.

    keys: [(column_name, descending), ...] — the collapse sort. Descending
    keys are negated inside the ordering struct, so they must be numeric
    (the reference's collapse min/max selectors share this shape); for
    string-desc or expression sorts use `collapse()`. Ties beyond `keys`
    fall to `min_by`'s arbitrary pick, same contract as row_number on a
    tied window sort — pass a unique tiebreak key, as the reference does
    with its docid fallback.
    """
    if null_policy not in ("ignore", "expand", "collapse"):
        raise ValueError(f"unknown nullPolicy {null_policy!r}")
    order = F.struct(*[
        ((-F.col(c)) if desc else F.col(c)).alias(f"__k{i}")
        for i, (c, desc) in enumerate(keys)])
    base = df if null_policy == "collapse" else df.where(F.col(field).isNotNull())
    out = (base.groupBy(field)
               .agg(F.min_by(F.struct(*df.columns), order).alias("__s"))
               .select("__s.*"))
    if null_policy == "expand":
        out = out.unionByName(df.where(F.col(field).isNull()))
    return out


def salted_top_n(df: DataFrame, key: str | Sequence[str],
                 order: Sequence[Column | str], n: int,
                 salts: int = 16, rank_col: str = "__rank") -> DataFrame:
    """Skew-safe top-N rows per key: two-stage salted window.

    A single `row_number().over(partitionBy(key))` must co-locate EVERY row
    of a key before filtering to N — a degenerate key (10^8 crawl pages of
    one host) lands on one reducer, and AQE does not split window skew the
    way it splits join skew. The salted shape bounds any task's input:

      stage 1: rank within (key, salt) — salt = xxhash64(all columns) % S,
               deterministic and partitioning-independent — keep local top-N.
               The heaviest key now spreads over S reducers.
      stage 2: rank within key over the ≤ S*N survivors — exact, because the
               global per-key top-N is a subset of the union of per-salt
               top-N's.

    `order` must total-order rows within a key (unique tiebreak) — the same
    determinism contract the single-window version had. `rank_col` carries
    the final 1-based within-key position.
    """
    keys = [key] if isinstance(key, str) else list(key)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salts))
    w1 = Window.partitionBy(*keys, "__salt").orderBy(*order)
    pre = (df.withColumn("__salt", salt)
             .withColumn("__lrn", F.row_number().over(w1))
             .where(F.col("__lrn") <= n)
             .drop("__salt", "__lrn"))
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (pre.withColumn(rank_col, F.row_number().over(w2))
               .where(F.col(rank_col) <= n))


def group_top_n(df: DataFrame, field: str, sort: Sequence[Column | str],
                n: int, offset: int = 0) -> DataFrame:
    """Result grouping (group.field, group.limit=n) — top-N rows per group value.

    Reference: search/Grouping.java:73; distributed via two-phase
    PURPOSE_GET_TOP_GROUPS (handler/component/ShardRequest.java:39). Spark:
    the salted two-stage top-N (salted_top_n) — rank within (group, salt),
    then within group over the bounded survivors — so one hot group value
    never funnels through a single task. The `group_rank` column is the
    within-group position (1-based), matching the reference's within-group sort.

    offset: group.offset — skip the first `offset` rows WITHIN each group
    before taking n (within-group paging, Grouping.java groupOffset). The
    salted stages rank to offset+n so the page's rows always survive
    stage 1; group_rank keeps the absolute within-group position
    (offset+1 .. offset+n), matching the reference's start-relative ranks.
    """
    if offset < 0:
        raise ValueError(f"offset must be >= 0, got {offset}")
    out = salted_top_n(df, field, sort, n + offset, rank_col="group_rank")
    if offset:
        out = out.where(F.col("group_rank") > offset)
    return out


def group_ngroups(df: DataFrame, field: str) -> DataFrame:
    """group.ngroups=true: the total number of matched groups alongside the
    total matched document count.

    Reference: Grouping.java getNGroups / TopGroupsFieldCommand — Solr counts
    distinct group values over the full match set (and documents the
    all-of-a-group-on-one-shard requirement distributed; Spark's
    count_distinct is exact without that constraint). One map-side-combinable
    aggregation pass.

    Output: one row (matches, ngroups).
    """
    return df.agg(F.count(F.lit(1)).cast("long").alias("matches"),
                  F.count_distinct(F.col(field)).cast("long").alias("ngroups"))


def grouped_facet(df: DataFrame, group_field: str, facet_field: str,
                  limit: int = 10, mincount: int = 1) -> DataFrame:
    """group.facet=true: facet counts by GROUP, not by document — each group
    contributes 1 to a bucket if ANY of its documents carries the value.

    Reference: search/grouping/GroupedFacetCollector (TermGroupFacetCollector
    via SimpleFacets.getGroupedCounts, handler/component/FacetComponent
    group.facet) — the collector dedups (group, facetValue) pairs before
    counting. Spark shape: distinct over the two columns, then the same
    single-shuffle count aggregation as terms_facet; the distinct is
    map-side partial so a hot (group, value) pair collapses early.

    Output: bucket, count (groups containing the value), count desc /
    bucket asc, top `limit`.
    """
    pairs = df.select(F.col(group_field).alias("__g"),
                      F.col(facet_field).alias("bucket")).distinct()
    return (pairs.where(F.col("bucket").isNotNull())
                 .groupBy("bucket")
                 .agg(F.count(F.lit(1)).cast("long").alias("count"))
                 .where(F.col("count") >= int(mincount))
                 .orderBy(F.desc("count"), F.asc("bucket"))
                 .limit(limit))


def expand(df: DataFrame, field: str, sort: Sequence[Column | str],
           n: int) -> DataFrame:
    """Expand component — for each collapsed head, the group's next-best rows.

    Reference: handler/component/ExpandComponent.java:110. Rows ranked 2..n+1 per
    group (rank 1 is the collapsed head returned by `collapse`).
    """
    w = Window.partitionBy(field).orderBy(*sort)
    return (df.withColumn("__rn", F.row_number().over(w))
              .where((F.col("__rn") > 1) & (F.col("__rn") <= n + 1)).drop("__rn"))


def cursor_page(df: DataFrame, sort_cols: Sequence[str], last: Sequence | None,
                rows: int) -> DataFrame:
    """cursorMark deep paging — stateless keyset pagination on a total order.

    Reference: search/CursorMark.java:46 (sort values of the last doc become the
    cursor; uniqueKey tiebreak mandatory). Spark: a lexicographic (k1,k2,...) > (v1,
    v2,...) keyset predicate that PUSHES DOWN to the scan, then top-`rows` — no
    OFFSET scan-and-discard at any page depth.
    """
    out = df
    if last is not None:
        pred = None
        eq = None
        for col, val in zip(sort_cols, last):
            gt = F.col(col) > F.lit(val)
            clause = gt if eq is None else (eq & gt)
            pred = clause if pred is None else (pred | clause)
            e = F.col(col) == F.lit(val)
            eq = e if eq is None else (eq & e)
        out = out.where(pred)
    return out.orderBy(*[F.asc(c) for c in sort_cols]).limit(rows)


def elevate(df: DataFrame, id_col: str, elevated_ids: Sequence,
            excluded_ids: Sequence, sort: Sequence[Column | str],
            rows: int) -> DataFrame:
    """Query elevation — pin specific ids to the top, exclude others.

    Reference: handler/component/QueryElevationComponent.java:107 (editorial
    elevate.xml). Spark: a broadcast-sized editorial map becomes a sort-key
    override column; excluded ids are filtered.
    """
    elev_rank = F.when(
        F.col(id_col).isin(list(elevated_ids)),
        F.array_position(F.array(*[F.lit(i) for i in elevated_ids]), F.col(id_col)),
    ).otherwise(F.lit(None))
    out = df
    if excluded_ids:
        out = out.where(~F.col(id_col).isin(list(excluded_ids)))
    return (out.withColumn("__elev", elev_rank)
               .orderBy(F.asc_nulls_last("__elev"), *sort)
               .limit(rows).drop("__elev"))


def elevate_marked(df: DataFrame, id_col: str, elevated_ids: Sequence,
                   excluded_ids: Sequence, sort: Sequence[Column | str],
                   rows: int) -> DataFrame:
    """Query elevation with markExcludes=true + the [elevated]/[excluded]
    doc transformers (QueryElevationComponent.java markExcludes handling;
    response/transform/ElevatedMarkerFactory.java / ExcludedMarkerFactory):
    excluded docs are KEPT, annotated `excluded=true`, and lose their
    elevation (they sort by the natural order); elevated docs pin to the
    top annotated `elevated=true`."""
    excl = list(excluded_ids)
    is_excl = F.col(id_col).isin(excl) if excl else F.lit(False)
    elev_rank = F.when(
        F.col(id_col).isin(list(elevated_ids)) & ~is_excl,
        F.array_position(F.array(*[F.lit(i) for i in elevated_ids]),
                         F.col(id_col)),
    ).otherwise(F.lit(None))
    return (df.withColumn("__elev", elev_rank)
              .withColumn("elevated", F.col("__elev").isNotNull())
              .withColumn("excluded", is_excl)
              .orderBy(F.asc_nulls_last("__elev"), *sort)
              .limit(rows).drop("__elev"))


def context_window(
    df: DataFrame,
    match: Column,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    before: int = 1,
    after: int = 1,
) -> DataFrame:
    """Matching rows plus their +-N neighbors within an ordered partition —
    the transcript-pipeline "show the matching turn with surrounding turns"
    operator (conversation context for a search hit; grep -C for tables).

    Spark-first shape: ONE window pass, no self-join, no range-join blowup —
    a row is kept iff any match lies within `after` rows before it or
    `before` rows after it, computed as max(is_match) over a bounded row
    frame. One hash exchange on partition_by; frame width is before+after+1
    regardless of corpus size, so the plan is unchanged at 100 TB.

    Returns the input rows (filtered) plus `is_match` (this row matched) and
    `is_context` (kept only because of a neighbor).
    """
    flagged = df.withColumn("is_match", match.cast("boolean"))
    w = (Window.partitionBy(*partition_by).orderBy(*order_by)
         .rowsBetween(-after, before))
    kept = flagged.withColumn(
        "_keep", F.max(F.col("is_match").cast("int")).over(w) == 1)
    return (kept.where("_keep")
                .withColumn("is_context", ~F.col("is_match"))
                .drop("_keep"))


def sft_pairs(
    df: DataFrame,
    response_filter: Column,
    partition_by: Sequence[str] = ("conv_id",),
    order_by: Sequence[Column | str] = ("turn_idx",),
    role_col: str = "role",
    text_col: str = "text",
    context_turns: int = 8,
    min_context_turns: int = 1,
    sep: str = "\n",
) -> DataFrame:
    """Supervised-finetuning pair extraction over multi-turn transcripts:
    every row matching `response_filter` (typically role = 'assistant')
    becomes a training pair — the turn's text as `response`, the previous
    `context_turns` turns rendered "role: text" and joined by `sep` as
    `context`.

    This is the transcripts-payload training-pipeline operator the reference
    has no analog for (its streaming `select`/window surface stops at field
    projection); the shape follows the standard SFT data-prep recipe
    (context window capped by turns, document never split).

    Spark-first shape: ONE bounded row-frame window per pair — collect_list
    over ROWS BETWEEN -context_turns AND -1 preserves frame order, and the
    render is transform + array_join, all JVM codegen (no self-join, no
    Python). One hash exchange on partition_by; frame width is constant, so
    the plan survives 100 TB of transcripts unchanged. Token counts are
    whitespace counts (textanalysis.token_count convention), computed on the
    rendered strings.

    Output: partition/order passthrough columns + context, response,
    n_context_turns, context_tokens, response_tokens.
    """
    w = (Window.partitionBy(*partition_by).orderBy(*order_by)
         .rowsBetween(-context_turns, -1))
    turns = F.collect_list(
        F.concat(F.col(role_col), F.lit(": "), F.col(text_col))).over(w)
    out = (
        df.withColumn("_ctx", turns)
          .where(response_filter)
          .where(F.size("_ctx") >= min_context_turns)
          .withColumn("context", F.array_join(F.col("_ctx"), sep))
          .withColumn("response", F.col(text_col))
          .withColumn("n_context_turns", F.size("_ctx").cast("int"))
          .withColumn(
              "context_tokens",
              F.size(F.filter(F.split(F.col("context"), r"\s+"),
                              lambda t: t != "")).cast("long"))
          .withColumn(
              "response_tokens",
              F.size(F.filter(F.split(F.col("response"), r"\s+"),
                              lambda t: t != "")).cast("long"))
          .drop("_ctx")
    )
    return out


def group_query(df: DataFrame, queries: dict[str, Column],
                sort: Sequence[Column | str], n: int) -> DataFrame:
    """group.query grouping: each named query is one group; return the top-N
    matching rows per group (search/Grouping.java:860 CommandQuery — one
    TopDocsCollector per query over the same match stream).

    Spark shape: ONE corpus scan — each row is tagged with the array of
    group names whose predicate it satisfies, exploded (a row matching two
    group.queries appears in both groups, as in the reference), then the
    salted two-stage top-N bounds any hot group. Rows matching no query are
    dropped before the explode so the shuffle carries only group members.

    Output: the input columns + `group` (query name) + `group_rank`.
    """
    if not queries:
        raise ValueError("group_query needs at least one named query")
    tags = F.array_compact(F.array(*[
        F.when(pred, F.lit(name)) for name, pred in queries.items()]))
    tagged = (df.withColumn("__tags", tags)
                .where(F.size("__tags") > 0)
                .withColumn("group", F.explode("__tags"))
                .drop("__tags"))
    return salted_top_n(tagged, "group", sort, n, rank_col="group_rank")


def group_func(df: DataFrame, func: Column, sort: Sequence[Column | str],
               n: int, group_col: str = "group") -> DataFrame:
    """group.func grouping: group by a computed function value
    (search/Grouping.java:933 CommandFunc — ValueSource-keyed groups).

    The function value materializes as a plain column (so the grouping key
    is computed once, JVM-side) and the salted two-stage top-N applies
    unchanged. Output: input columns + `group_col` + `group_rank`.
    """
    return salted_top_n(df.withColumn(group_col, func), group_col, sort, n,
                        rank_col="group_rank")
