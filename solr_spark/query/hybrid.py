"""Hybrid retrieval: reciprocal-rank fusion of ranked result lists.

Reference analog: Solr's hybrid lexical+vector search combiner (the
`combiner=rrf` request surface added for knn+lucene hybrid queries; public
algorithm: Cormack, Clarke & Buettcher, "Reciprocal Rank Fusion outperforms
Condorcet and individual rank learning methods", SIGIR 2009).

    rrf(d) = sum over lists L containing d of  1 / (k0 + rank_L(d))

with rank 1-based and k0 = 60 by default (the paper's constant and Solr's).

Scale shape: the inputs are ALREADY top-N projections from their retrieval
kernels (BM25 WAND / vector top-k), i.e. a few hundred rows each — the fusion
itself is a driver-light broadcast-sized join chain, never a shuffle over the
corpus. The heavy lifting stays in the upstream retrievals, which carry their
own 100-TB plans (bm25.py, functions/vectors.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    inputs: list[tuple[DataFrame, str, str]],
    k0: int = 60,
    k: int = 10,
    id_out: str = "doc_id",
) -> DataFrame:
    """Fuse ranked lists into one RRF-scored top-k.

    inputs: (df, id_col, score_col) triples. Each df is a top-N result list;
    ranks are (re)derived per list as row_number over (score desc, id asc) so
    callers don't need to agree on a rank column convention. A document
    missing from a list contributes nothing for that list.

    Returns DataFrame(id_out, rrf_score, rank) sorted by rrf_score desc with
    id asc tie-break.
    """
    if not inputs:
        raise ValueError("rrf_fuse needs at least one ranked list")
    ranked = []
    for i, (df, id_col, score_col) in enumerate(inputs):
        # single-partition window is fine: the input is a top-N list by
        # contract, not a corpus-sized table
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        ranked.append(
            df.select(
                F.col(id_col).alias(id_out),
                (F.lit(1.0) / (F.lit(float(k0)) + F.row_number().over(w)))
                .alias(f"_rrf_{i}"),
            )
        )
    fused = reduce(lambda a, b: a.join(b, id_out, "full_outer"), ranked)
    contrib = [F.coalesce(F.col(f"_rrf_{i}"), F.lit(0.0))
               for i in range(len(ranked))]
    scored = fused.select(
        id_out,
        reduce(lambda a, b: a + b, contrib).alias("rrf_score"),
    )
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_out).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .orderBy("rank"))
