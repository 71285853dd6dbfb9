"""Training-data-pipeline functions: text analysis, dedup, vector similarity.

These extend the reference's surface (Solr ships langid / dedup-signature update
processors — solr/core/src/java/org/apache/solr/update/processor/ — and dense-vector
KNN — schema/DenseVectorField.java) with the operations a 100-TB training-data
pipeline needs, built as single-shuffle DataFrame programs.
"""

from solr_spark.functions.dedup import (
    decontaminate,
    drop_signature_duplicates,
    exact_dedup,
    minhash_bands,
    minhash_near_dup_pairs,
    near_dup_clusters,
    drop_near_duplicates,
    signature_dedup,
    simhash,
    simhash_near_dup_pairs,
    text_profile_signature,
)
from solr_spark.functions.datemath import date_math, date_math_sql
from solr_spark.functions.geo import (
    bbox_filter,
    geo_grid_cell,
    geodist,
    geofilt,
    haversine_km,
)
from solr_spark.functions.textanalysis import (
    doc_fingerprint,
    jaro_winkler,
    lang_id,
    phonetic_matches,
    quality_score,
    soundex_code,
    token_count,
    whitespace_tokens,
)
from solr_spark.functions.vectors import (
    cosine_sim,
    cosine_topk,
    knn_prefiltered,
    lsh_ann_topk,
)

__all__ = [
    "exact_dedup", "minhash_bands", "minhash_near_dup_pairs", "simhash",
    "near_dup_clusters", "drop_near_duplicates",
    "simhash_near_dup_pairs", "signature_dedup", "text_profile_signature",
    "drop_signature_duplicates", "doc_fingerprint", "lang_id", "quality_score",
    "token_count", "whitespace_tokens", "cosine_sim", "cosine_topk",
    "lsh_ann_topk", "knn_prefiltered", "soundex_code", "phonetic_matches",
    "decontaminate",
    "date_math", "date_math_sql", "haversine_km", "geodist", "geofilt",
    "bbox_filter", "geo_grid_cell", "jaro_winkler",
]
