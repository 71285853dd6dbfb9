"""Search-result clustering (the clustering component's job: organize the
returned result set into labeled topical groups).

Reference analog: Solr's clustering contrib (ClusteringComponent +
Carrot2 engines). The algorithm here is the deterministic dominant-term
variant of suffix-tree/Lingo-style label induction: each result document is
assigned to the cluster labeled by its highest-scoring term, where the score
is result-set-local TF-IDF

    score(doc, t) = tf(doc, t) * ln(1 + N_res / df_res(t))

(N_res = result-set size, df_res = result-set document frequency — like the
reference engines, statistics come from the RESULT SET being clustered, not
the whole corpus, so rare-in-results terms label aggressively).

Scale shape: explode -> two map-side-combinable groupBys -> one window
ranked by (score desc, term asc) for a deterministic argmax. The result set
is usually a top-N page, but nothing here collects to the driver — the same
plan holds when "the result set" is a 10^8-row filtered corpus slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cluster_by_dominant_term(toks_df: DataFrame, id_col: str = "docid",
                             toks_col: str = "toks") -> DataFrame:
    """Assign each document to its dominant-term cluster.

    toks_df: (id_col, toks_col) with toks_col the space-joined analyzed token
    string (the index's `analyzed` artifact, or `tokenize_column_joined`).
    Returns (id_col, cluster, score) — one row per document.
    """
    n_res = toks_df.count()
    tok = toks_df.select(
        id_col, F.explode(F.split(F.col(toks_col), " ")).alias("term")
    ).where(F.col("term") != "")
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_res = tok.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("df"))
    scored = tf.join(df_res, "term").withColumn(
        "score", F.col("tf") * F.log1p(F.lit(float(n_res)) / F.col("df")))
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc())
    return (scored.withColumn("_rn", F.row_number().over(w))
                  .where(F.col("_rn") == 1)
                  .select(id_col, F.col("term").alias("cluster"), "score"))


def cluster_sizes(clustered: DataFrame, min_size: int = 1,
                  limit: int = 20) -> DataFrame:
    """Cluster summary: (cluster, size) largest-first — the component's
    cluster list with an `other topics` cutoff via min_size."""
    return (clustered.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("size"))
            .where(F.col("size") >= min_size)
            .orderBy(F.desc("size"), F.asc("cluster")).limit(limit))
