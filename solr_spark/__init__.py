"""sparkgrep: a PySpark-native full-text inverted-index + BM25 engine.

Built from scratch against the behavior of Apache Solr/Lucene (reference at
/root/reference — see SURVEY.md for the file:line-cited blueprint). The engine is
DataFrame/Catalyst-first: relational operators are built-in Spark primitives; only the
posting-list codec, the BM25 scoring kernel, and block-max WAND pruning are custom
vectorized (numpy / Arrow pandas-UDF) kernels.

Public surface:
    solr_spark.analysis   — analyzer chain (UAX#29-style tokenize -> stop -> lowercase)
    solr_spark.codec      — varint/delta posting codec, Lucene SmallFloat norms
    solr_spark.indexing   — docID assignment, posting-segment build, LSM merge, manifests
    solr_spark.query      — BM25 top-k (exact and block-max WAND), mini query parser
    solr_spark.operators  — SURVEY.md §2 relational/aggregation/dedup/similarity surface
    solr_spark.data       — deterministic synthetic transcript corpus
    solr_spark.oracle     — pure-Python reference implementation (tests only)
"""

__version__ = "0.1.0"
