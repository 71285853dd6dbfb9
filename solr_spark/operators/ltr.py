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

from pyspark.sql import Column, DataFrame, Window
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


def tree_score(features: Mapping[str, Column | str], tree: Mapping) -> Column:
    """One regression tree -> a nested CASE WHEN expression.

    Tree nodes follow the reference's MultipleAdditiveTreesModel JSON shape
    (ltr/model/MultipleAdditiveTreesModel.java): a branch is
    {"feature": name, "threshold": t, "left": node, "right": node} with
    feature <= threshold going LEFT; a leaf is {"value": v}. The whole tree
    compiles to a single Catalyst expression — codegen, no UDF.
    """
    if "value" in tree:
        return F.lit(float(tree["value"]))
    name = tree["feature"]
    if name not in features:
        raise ValueError(f"tree references unknown feature: {name!r}")
    c = features[name]
    col = F.col(c) if isinstance(c, str) else c
    return F.when(col <= F.lit(float(tree["threshold"])),
                  tree_score(features, tree["left"])) \
            .otherwise(tree_score(features, tree["right"]))


def trees_model_score(features: Mapping[str, Column | str],
                      trees: Sequence[Mapping]) -> Column:
    """MultipleAdditiveTreesModel: score = sum_i weight_i * tree_i(features).

    Each entry: {"weight": w, "root": <tree node>} (the reference's
    trees[].weight / trees[].root). Compiles the whole ensemble into one
    additive expression — a GBDT of hundreds of trees stays JVM-side.
    """
    score: Column = F.lit(0.0)
    for t in trees:
        score = score + F.lit(float(t.get("weight", 1.0))) \
            * tree_score(features, t["root"])
    return score


def ltr_rerank(topk: DataFrame, features: Mapping[str, Column | str],
               weights: Mapping[str, float] | None, rerank_docs: int,
               first_sort: Sequence[Column], intercept: float = 0.0,
               trees: Sequence[Mapping] | None = None) -> DataFrame:
    """Rescore the first-pass top-`rerank_docs` rows with an LTR model —
    linear (`weights`) or additive tree ensemble (`trees`), reference
    LinearModel / MultipleAdditiveTreesModel.

    Rows beyond rerank_docs keep their first-pass score (LTRRescorer
    semantics). Output column: `new_score`.
    """
    if (weights is None) == (trees is None):
        raise ValueError("pass exactly one of weights= or trees=")
    model = (trees_model_score(features, trees) + F.lit(float(intercept))
             if trees is not None
             else linear_model_score(features, weights, intercept))
    return rerank(topk, model, rerank_docs=rerank_docs, first_sort=first_sort)


def team_draft_interleave(list_a: DataFrame, list_b: DataFrame,
                          k: int | None = None, seed: int = 0,
                          id_col: str = "docid") -> DataFrame:
    """TeamDraft interleaving of two ranked lists for online model A/B
    evaluation (reference: modules/ltr/.../interleaving/
    TeamDraftInterleaving.java via Interleaving.java): the team with fewer
    picks so far drafts its highest-ranked not-yet-picked doc; equal-size
    ties flip a seeded coin (the reference uses java.util.Random the same
    way — pass `seed` for reproducibility).

    Inputs are ranked DataFrames (id_col ordered by a `rank` column if
    present, else input order). Interleaved lists are rerank-window-sized
    (top-k), so the draft itself runs driver-side on two collected k-row
    lists — same shape as the reference, which interleaves two in-memory
    ScoreDoc arrays. Output: (rank, <id_col>, team) with team 'A'/'B'.

    Invariants (pinned by tests, mirroring TeamDraftInterleavingTest): no
    duplicate docs; |picks(A) - picks(B)| <= 1 when both lists can still
    supply docs; each team's picks preserve that list's relative order.
    """
    import random

    def ordered_ids(df: DataFrame) -> list:
        cols = df.columns
        rows = (df.orderBy("rank").collect() if "rank" in cols
                else df.collect())
        return [r[id_col] for r in rows]

    a, b = ordered_ids(list_a), ordered_ids(list_b)
    rng = random.Random(seed)
    picked: set = set()
    out: list[tuple[int, object, str]] = []
    na = nb = 0
    ia = ib = 0
    limit = k if k is not None else len(a) + len(b)
    while len(out) < limit:
        while ia < len(a) and a[ia] in picked:
            ia += 1
        while ib < len(b) and b[ib] in picked:
            ib += 1
        a_ok, b_ok = ia < len(a), ib < len(b)
        if not a_ok and not b_ok:
            break
        take_a = (a_ok and not b_ok) or (
            a_ok and b_ok and (na < nb or (na == nb and rng.random() < 0.5)))
        if take_a:
            doc, team = a[ia], "A"
            na += 1
        else:
            doc, team = b[ib], "B"
            nb += 1
        picked.add(doc)
        out.append((len(out) + 1, doc, team))
    spark = list_a.sparkSession
    id_type = list_a.schema[id_col].dataType.simpleString()
    return spark.createDataFrame(
        out, f"rank int, {id_col} {id_type}, team string")


def log_features(hits: DataFrame, features: Mapping[str, Column | str],
                 fmt: str = "struct", out_col: str = "features") -> DataFrame:
    """`[features]` doc transformer / FeatureLogger role (reference:
    solr/modules/ltr/src/java/org/apache/solr/ltr/response/transform/
    LTRFeatureLoggerTransformerFactory.java:66-84 with CSVFeatureLogger's
    DENSE format): materialize every declared feature per result row, so a
    training pipeline can export judgments + features for offline model
    fitting — the extraction half of the LTR loop (ltr_rerank is the
    serving half, and the two share the same feature Mapping, which is
    what keeps training/serving features consistent).

    fmt="struct": one struct column of named double features (the shape a
    DataFrame trainer wants). fmt="dense": Solr's CSV form
    "name1=v1,name2=v2" in declaration order. Pure projection — no shuffle,
    no Python; feature expressions stay whole-stage codegen.
    """
    cols = {n: (F.col(c) if isinstance(c, str) else c).cast("double")
            for n, c in features.items()}
    if fmt == "struct":
        out = F.struct(*[c.alias(n) for n, c in cols.items()])
    elif fmt == "dense":
        out = F.concat_ws(",", *[
            F.concat_ws("=", F.lit(n), c.cast("string"))
            for n, c in cols.items()])
    else:
        raise ValueError(f"unknown feature log format {fmt!r}")
    return hits.withColumn(out_col, out)


def ranking_metrics(results: DataFrame, judgments: DataFrame, k: int = 10,
                    query_col: str = "query_id", doc_col: str = "doc_id",
                    rank_col: str = "rank",
                    grade_col: str = "grade") -> DataFrame:
    """Per-query ranking-quality metrics — the trec_eval companion to the LTR
    stack (reference: the LTR module trains/rescores but ships no evaluator;
    solr/modules/ltr/README.adoc points users at external judgment tooling —
    this closes that loop on the same DataFrame surface).

    Inputs: `results` (query, doc, 1-based rank) and `judgments` (query, doc,
    integer grade >= 0; grade > 0 means relevant). Queries with no relevant
    judged doc are dropped (the trec_eval convention). Output per query:
    n_rel, p_at_k, recall_at_k, rr (reciprocal rank), ap (average precision,
    /n_rel), ndcg (exponential gain, log2 position discount).

    Determinism: per-position contributions (precision@i, DCG terms) are
    rounded to a 1e-6 grid and summed as DECIMAL(38,6) — exact, order-free
    addition, so the result is bit-identical across engines and across
    shuffle orders (the dd18/q65 pattern).

    Scale shape: one shuffle on the query key (the judgments join, the
    cumulative-hit window, and the final groupBy all share it); every window
    is bounded by k rows per query after the rank filter, and the ideal-DCG
    window by the per-query judged set. Nothing global, nothing driver-side.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q, d, r, g = query_col, doc_col, rank_col, grade_col
    dec = "decimal(38,6)"

    jrel = judgments.where(F.col(g) > 0)
    wj = Window.partitionBy(q).orderBy(F.col(g).desc(), F.col(d))
    ideal = (jrel
             .withColumn("__i", F.row_number().over(wj))
             .where(F.col("__i") <= k)
             .groupBy(q)
             .agg(F.sum(F.round(
                      (F.pow(F.lit(2.0), F.col(g)) - 1.0)
                      / F.log2(F.col("__i") + 1.0), 6).cast(dec))
                   .alias("__idcg")))
    totals = jrel.groupBy(q).agg(F.count(F.lit(1)).alias("n_rel"))

    hits = (results.where(F.col(r) <= k)
            .join(judgments.select(q, d, g), [q, d], "left")
            .withColumn("__g", F.coalesce(F.col(g), F.lit(0)))
            .withColumn("__rel", (F.col("__g") > 0).cast("int")))
    wr = Window.partitionBy(q).orderBy(r)
    hits = hits.withColumn(
        "__cum", F.sum("__rel").over(
            wr.rowsBetween(Window.unboundedPreceding, 0)))
    perq = (hits.groupBy(q).agg(
        F.sum("__rel").alias("__hits"),
        F.max(F.when(F.col("__rel") == 1,
                     F.round(1.0 / F.col(r), 6))).alias("__rr"),
        F.sum(F.when(F.col("__rel") == 1,
                     F.round(F.col("__cum") / F.col(r), 6).cast(dec))
               .otherwise(F.lit(0).cast(dec))).alias("__apnum"),
        F.sum(F.round((F.pow(F.lit(2.0), F.col("__g")) - 1.0)
                      / F.log2(F.col(r) + 1.0), 6).cast(dec))
         .alias("__dcg")))
    return (totals
            .join(ideal, q)
            .join(perq, q, "left")
            .select(
                F.col(q),
                F.col("n_rel").cast("long").alias("n_rel"),
                (F.coalesce(F.col("__hits"), F.lit(0)) / float(k))
                 .alias("p_at_k"),
                (F.coalesce(F.col("__hits"), F.lit(0)) / F.col("n_rel"))
                 .alias("recall_at_k"),
                F.coalesce(F.col("__rr"), F.lit(0.0)).alias("rr"),
                (F.coalesce(F.col("__apnum").cast("double"), F.lit(0.0))
                 / F.col("n_rel")).alias("ap"),
                (F.coalesce(F.col("__dcg").cast("double"), F.lit(0.0))
                 / F.col("__idcg").cast("double")).alias("ndcg")))
