from solr_spark.query.bm25 import IndexReader, bm25_topk, term_docs
from solr_spark.query.parser import LuceneQueryParser, parse_query

__all__ = ["IndexReader", "bm25_topk", "term_docs", "LuceneQueryParser", "parse_query"]
