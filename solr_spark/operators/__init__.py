"""SURVEY.md §2 operator surface: streams, facets, windows (+ query parser in
solr_spark.query.parser, text/dedup/vector functions in solr_spark.functions)."""

from solr_spark.operators import components, facets, streams, windows
from solr_spark.operators.components import (
    hash_partition_filter,
    highlight,
    rerank,
    suggest_terms,
)
from solr_spark.operators.facets import (
    nested_facet,
    percentiles,
    pivot_facet,
    query_facet,
    range_facet,
    stats_component,
    terms_facet,
    timeseries,
)
from solr_spark.operators.streams import (
    cartesian_product,
    complement,
    fetch,
    full_outer_join,
    hash_join,
    inner_join,
    intersect,
    left_outer_join,
    merge,
    more_like_this,
    rollup,
    scored_join,
    search,
    select_stream,
    significant_terms,
    top,
    unique,
)
from solr_spark.operators.windows import (
    collapse,
    cursor_page,
    elevate,
    expand,
    group_top_n,
)

__all__ = [
    "components", "facets", "streams", "windows",
    "hash_partition_filter", "highlight", "rerank", "suggest_terms",
    "nested_facet", "percentiles", "pivot_facet", "query_facet", "range_facet",
    "stats_component", "terms_facet", "timeseries",
    "cartesian_product", "complement", "fetch", "full_outer_join", "hash_join",
    "scored_join",
    "inner_join", "intersect", "left_outer_join", "merge", "more_like_this",
    "rollup", "search", "select_stream", "significant_terms", "top", "unique",
    "collapse", "cursor_page", "elevate", "expand", "group_top_n",
]
