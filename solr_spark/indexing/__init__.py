from solr_spark.indexing.build import build_index
from solr_spark.indexing.deletes import (
    delete_by_terms,
    delete_docids,
    deleted_array,
    deletes_df,
)
from solr_spark.indexing.docids import assign_doc_ids
from solr_spark.indexing.lifecycle import (
    list_snapshots,
    merge_segment_group,
    plan_tiered_merges,
    restore,
    snapshot,
    tiered_merge,
)
from solr_spark.indexing.merge import add_documents, merge_segments

__all__ = ["build_index", "assign_doc_ids", "merge_segments", "add_documents",
           "delete_docids", "delete_by_terms", "deletes_df", "deleted_array",
           "plan_tiered_merges", "merge_segment_group", "tiered_merge",
           "snapshot", "restore", "list_snapshots"]
