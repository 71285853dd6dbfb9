"""Learning-to-rank rescoring: feature extraction + model scoring + rerank.

Reference: the LTR module — LTRQParserPlugin rescores the top-N of a first-pass
ranking with a trained model over declared features
(solr/modules/ltr/src/java/org/apache/solr/ltr/search/LTRQParserPlugin.java:56,
LTRRescorer.java; LinearModel in ltr/model/LinearModel.java). Spark-first
restatement: features are Columns (or a model UDF), the model is a weighted
combination, and the rescoring reuses operators.components.rerank (top-N only,
exactly like LTRRescorer's reRankDocs contract).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solr_spark.operators.components import rerank


def linear_model_score(features: Mapping[str, Column | str],
                       weights: Mapping[str, float],
                       intercept: float = 0.0) -> Column:
    """LinearModel: score = intercept + sum(w_i * feature_i).

    Unknown feature names in `weights` raise (same strictness as the
    reference's model validation, ltr/model/LTRScoringModel.java).
    """
    missing = set(weights) - set(features)
    if missing:
        raise ValueError(f"weights reference unknown features: {sorted(missing)}")
    score: Column = F.lit(float(intercept))
    for name, w in weights.items():
        c = features[name]
        score = score + F.lit(float(w)) * (F.col(c) if isinstance(c, str) else c)
    return score


def ltr_rerank(topk: DataFrame, features: Mapping[str, Column | str],
               weights: Mapping[str, float], rerank_docs: int,
               first_sort: Sequence[Column], intercept: float = 0.0) -> DataFrame:
    """Rescore the first-pass top-`rerank_docs` rows with a linear LTR model.

    Rows beyond rerank_docs keep their first-pass score (LTRRescorer
    semantics). Output column: `new_score`.
    """
    return rerank(topk, linear_model_score(features, weights, intercept),
                  rerank_docs=rerank_docs, first_sort=first_sort)
