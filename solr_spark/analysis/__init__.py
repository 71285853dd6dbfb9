from solr_spark.analysis.analyzer import (
    analyze_series,
    analyze_text,
    make_tokenize_joined_multi_udf,
    make_tokenize_joined_udf,
    make_tokenize_udf,
)
from solr_spark.analysis.stopwords import ENGLISH_STOPWORDS

__all__ = [
    "analyze_series",
    "analyze_text",
    "make_tokenize_joined_multi_udf",
    "make_tokenize_joined_udf",
    "make_tokenize_udf",
    "ENGLISH_STOPWORDS",
]
