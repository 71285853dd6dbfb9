from solr_spark.indexing.build import build_index
from solr_spark.indexing.docids import assign_doc_ids
from solr_spark.indexing.merge import merge_segments

__all__ = ["build_index", "assign_doc_ids", "merge_segments"]
