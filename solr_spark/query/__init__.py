from solr_spark.query.bm25 import IndexReader, bm25_topk

__all__ = ["IndexReader", "bm25_topk"]
