from solr_spark.query.bm25 import IndexReader, bm25_topk, term_docs, terms_postings
from solr_spark.query.edismax import edismax_topk
from solr_spark.query.multiterm import (
    expand_fuzzy,
    expand_prefix,
    expand_wildcard,
    fuzzy_topk,
    prefix_topk,
    wildcard_topk,
)
from solr_spark.query.hybrid import rrf_fuse
from solr_spark.query.fieldsort import field_sorted_search, parse_sort_spec
from solr_spark.query.jsonapi import (json_facets, json_request, json_search,
                                      json_select)
from solr_spark.query.sqlhandler import solr_sql, solr_sql_search
from solr_spark.query.local import LocalSearcher
from solr_spark.query.docsets import docid_range_bitmaps, filter_docids
from solr_spark.query.parser import LuceneQueryParser, parse_query
from solr_spark.query.rtg import realtime_get
from solr_spark.query.scored import parse_scored_query, scored_topk
from solr_spark.query.shards import ShardedSearcher, shard_index
from solr_spark.query.xmlquery import (parse_xml_query, xml_query_docids,
                                       xml_query_topk)

__all__ = ["IndexReader", "bm25_topk", "term_docs", "terms_postings",
           "edismax_topk", "LuceneQueryParser", "parse_query",
           "expand_prefix", "expand_wildcard", "expand_fuzzy",
           "prefix_topk", "wildcard_topk", "fuzzy_topk",
           "parse_scored_query", "scored_topk", "rrf_fuse", "LocalSearcher",
           "json_request", "json_search", "json_facets", "json_select",
           "solr_sql", "solr_sql_search",
           "field_sorted_search", "parse_sort_spec",
           "parse_xml_query", "xml_query_docids", "xml_query_topk",
           "filter_docids", "docid_range_bitmaps",
           "shard_index", "ShardedSearcher", "realtime_get"]
