"""Text-classification streams: information-gain feature selection and
logistic-regression training, the reference's `features`/`igain` and `tlogit`
streaming expressions re-expressed as DataFrame programs.

Reference behavior specs:
  * solr/solrj-streaming/src/java/org/apache/solr/client/solrj/io/stream/
    FeaturesSelectionStream.java:62 (+ the per-shard term statistics it
    aggregates, search/IGainTermsQParserPlugin.java) — select the k terms
    with the highest information gain against a binary label.
  * solr/solrj-streaming/src/java/org/apache/solr/client/solrj/io/stream/
    TextLogitStream.java:61 — iterative logistic-regression training where
    every iteration is one pass over the shards with the current weight
    vector shipped along (exactly a broadcast-literal aggregation pass here).

Scale shape (100 TB): igain is ONE shuffle — distinct (doc, term) explode,
map-side-combinable per-term (df, positive-df) counts, then a closed-form
entropy expression against two broadcast scalars. tlogit is a kmeans-style
literal-weights loop: each iteration is a single whole-stage-codegen
aggregation pass (no join, no shuffle — gradients are global avgs), so
iteration cost is a narrow scan regardless of corpus size; the feature set
(igain-selected, e.g. <= a few hundred) rides as column literals.

These directly serve the training-data-pipeline brief: quality classifiers
trained on the corpus itself (e.g. label = high-quality subset, features =
informative vocabulary).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solr_spark.functions.textanalysis import whitespace_tokens


def _binary_entropy(p: Column) -> Column:
    """-p ln p - (1-p) ln(1-p) with the 0*ln(0) = 0 convention (natural log,
    as in IGainTermsQParserPlugin)."""
    def plogp(x: Column) -> Column:
        return F.when((x > 0) & (x < 1), -x * F.log(x)).otherwise(F.lit(0.0))

    return plogp(p) + plogp(1.0 - p)


def igain_terms(df: DataFrame, text_col: str, label_col: str,
                k: int = 10, min_df: int = 1) -> DataFrame:
    """Top-k terms by information gain against a binary label.

    IG(t) = H(y) - [ p(t) H(y|t) + p(!t) H(y|!t) ]  (natural log), computed
    from four counts: n docs, positive docs, docs containing t, positive docs
    containing t — the exact quantities FeaturesSelectionStream aggregates
    across shards. One distinct-(doc,term) explode + one groupBy(term);
    corpus totals join in as a broadcast single-row frame.

    label_col: boolean/0-1 column. Output: (term, ig) ordered ig desc,
    term asc, ig rounded to 6dp for engine portability.
    """
    lab = df.select(F.monotonically_increasing_id().alias("__doc"),
                    F.col(label_col).cast("double").alias("__y"),
                    F.array_distinct(whitespace_tokens(text_col))
                     .alias("__toks"))
    tot = lab.agg(F.count(F.lit(1)).cast("double").alias("n"),
                  F.sum("__y").alias("pos"))
    per = (lab.select("__doc", "__y", F.explode("__toks").alias("term"))
              .groupBy("term")
              .agg(F.count(F.lit(1)).cast("double").alias("df_t"),
                   F.sum("__y").alias("pos_t"))
              .where(F.col("df_t") >= min_df))
    j = per.crossJoin(F.broadcast(tot))
    p_t = F.col("df_t") / F.col("n")
    h_y = _binary_entropy(F.col("pos") / F.col("n"))
    h_given_t = _binary_entropy(F.col("pos_t") / F.col("df_t"))
    rest = F.col("n") - F.col("df_t")
    h_given_not = F.when(
        rest > 0,
        _binary_entropy((F.col("pos") - F.col("pos_t")) / rest)
    ).otherwise(F.lit(0.0))
    ig = h_y - (p_t * h_given_t + (1.0 - p_t) * h_given_not)
    return (j.select("term", F.round(ig, 6).alias("ig"))
             .orderBy(F.desc("ig"), F.asc("term")).limit(k))


def tlogit_train(df: DataFrame, text_col: str, label_col: str,
                 features: Sequence[str], iters: int = 20,
                 lr: float = 1.0) -> dict:
    """Batch-gradient logistic regression over binary token-presence features
    (TextLogitStream.java:61's training loop shape: one aggregation pass per
    iteration, weights broadcast as literals — the Spark twin of shipping the
    weight vector to every shard).

    Deterministic: zero init, fixed learning rate, no sampling. Returns
    {"weights": {term: w}, "intercept": b, "iters": iters}.
    """
    feats = list(features)
    toks = F.array_distinct(whitespace_tokens(text_col))
    base = df.select(
        F.col(label_col).cast("double").alias("__y"),
        *[F.array_contains(toks, t).cast("double").alias(f"__x{j}")
          for j, t in enumerate(feats)])
    w = [0.0] * len(feats)
    b = 0.0
    for _ in range(iters):
        margin = F.lit(b)
        for j in range(len(feats)):
            margin = margin + F.lit(w[j]) * F.col(f"__x{j}")
        err = (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))) - F.col("__y")
        row = base.agg(
            *[F.avg(err * F.col(f"__x{j}")).alias(f"g{j}")
              for j in range(len(feats))],
            F.avg(err).alias("gb")).collect()[0]
        w = [w[j] - lr * float(row[f"g{j}"]) for j in range(len(feats))]
        b -= lr * float(row["gb"])
    return {"weights": dict(zip(feats, w)), "intercept": b, "iters": iters}


def tlogit_score(text_col: str, model: dict) -> Column:
    """P(y=1 | doc) as a pure Column expression from a tlogit_train model —
    the classify step of the reference's `classify()` stream
    (ClassifyStream.java uses the stored model the same way)."""
    toks = F.array_distinct(whitespace_tokens(text_col))
    margin = F.lit(float(model["intercept"]))
    for t in sorted(model["weights"]):
        margin = margin + (F.lit(float(model["weights"][t]))
                           * F.array_contains(toks, t).cast("double"))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))


def auc(pairs: list[tuple[float, int]]) -> float:
    """Exact ROC AUC (rank statistic with tie correction) from
    (score, label) pairs — driver-side helper for model-quality gates."""
    ranked = sorted(pairs, key=lambda x: x[0])
    n = len(ranked)
    # average ranks over score ties
    ranks: dict[int, float] = {}
    i = 0
    while i < n:
        jdx = i
        while jdx + 1 < n and ranked[jdx + 1][0] == ranked[i][0]:
            jdx += 1
        avg_rank = (i + jdx) / 2.0 + 1.0
        for t in range(i, jdx + 1):
            ranks[t] = avg_rank
        i = jdx + 1
    pos = [idx for idx, (_, y) in enumerate(ranked) if y]
    n_pos = len(pos)
    n_neg = n - n_pos
    if not n_pos or not n_neg:
        return float("nan")
    rank_sum = sum(ranks[idx] for idx in pos)
    return (rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))


def term_vectors(df: DataFrame, id_col: str, text_col: str,
                 min_df_frac: float = 0.0, max_df_frac: float = 1.0,
                 ) -> tuple[DataFrame, list[str]]:
    """TF-IDF document-term vectors, the `termVectors` evaluator.

    Reference: solr/solrj-streaming/.../io/eval/TermVectorsEvaluator.java:135-176
    — value = sqrt(tf) * (ln((n+1)/(df+1)) + 1); terms kept when
    min_df_frac <= df/n <= max_df_frac, columns ordered alphabetically (the
    reference's TreeMap iteration order).

    Returns (DataFrame(id, vector array<double>), term_labels). The vocabulary
    after the doc-freq band is the matrix width — bounded exactly like the
    reference's in-memory matrix — so the per-term weights ride as a broadcast
    map literal; the doc pass itself is one explode + one groupBy (scale-safe).
    Feed the result to evaluators.kmeans for the reference's
    `kmeans(termVectors(...))` clustering pipeline.
    """
    n = df.count()
    toks = (df.select(F.col(id_col).alias("_id"),
                      F.explode(whitespace_tokens(F.col(text_col))).alias("term"))
              .groupBy("_id", "term").agg(F.count(F.lit(1)).alias("tf")))
    dfreq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    kept = (dfreq.where((F.col("df") >= float(min_df_frac) * n)
                        & (F.col("df") <= float(max_df_frac) * n))
                 .orderBy("term").collect())
    labels = [r["term"] for r in kept]
    idf = {r["term"]: math.log((n + 1) / (r["df"] + 1.0)) + 1.0 for r in kept}
    weights = F.map_from_arrays(
        F.array(*[F.lit(t) for t in labels]),
        F.array(*[F.lit(idf[t]) for t in labels]))
    per_doc = (toks.where(F.col("term").isin(labels))
                   .groupBy("_id")
                   .agg(F.map_from_entries(
                       F.collect_list(F.struct("term", "tf"))).alias("tfs")))
    vec = F.transform(
        F.array(*[F.lit(t) for t in labels]),
        lambda t: F.coalesce(
            F.sqrt(F.element_at(F.col("tfs"), t).cast("double")), F.lit(0.0))
        * F.element_at(weights, t))
    out = per_doc.select(F.col("_id").alias(id_col), vec.alias("vector"))
    return out, labels


def binary_classification_metrics(df: DataFrame, score_col: str,
                                  label_col: str,
                                  threshold: float = 0.5) -> DataFrame:
    """Classifier quality report: precision / recall / F1 / accuracy at
    `threshold`, plus threshold-free ROC AUC — the evaluation half of this
    engine's quality-classifier stack (igain/tlogit train; this scores).

    Role beyond the reference (training-pipeline op): the reference ships
    model TRAINING streams (ml/TextLogitStream role) but no distributed
    eval report; pipeline QA needs one (is the quality classifier worth
    its threshold?).

    AUC is the rank-sum (Mann-Whitney) form with tie-averaged ranks:
    AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg). Ranks are a
    function of the SCORE alone — rank(s) = #rows below s + (ties+1)/2 —
    so the whole statistic reduces over the per-distinct-score count table
    (one groupBy + the distributed prefix sum), never a per-row global
    rank window; the same scale shape as functions/evaluators.mann_whitney.
    Threshold metrics are one conditional aggregation pass.

    Returns ONE row: n, n_pos, tp, fp, fn, tn, precision, recall, f1,
    accuracy, auc (6dp; metrics NULL when undefined, e.g. no positives).
    """
    from solr_spark.functions.evaluators import distributed_cumsum

    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    pred = (s >= F.lit(float(threshold))).cast("double")
    base = df.select(s.alias("__s"), y.alias("__y"), pred.alias("__p"))

    per = base.groupBy("__s").agg(
        F.sum("__y").alias("pos"),
        F.count("*").cast("double").alias("ct"))
    cum = distributed_cumsum(per, "__s", ["ct"], inclusive=False)
    rank_pos = cum.agg(
        F.sum(F.col("pos") * (F.col("cum_ct") + (F.col("ct") + 1) / 2.0)
              ).alias("r_pos"),
        F.sum("pos").alias("n_pos"),
        F.sum(F.col("ct") - F.col("pos")).alias("n_neg"))

    conf = base.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when((F.col("__p") == 1) & (F.col("__y") == 1), 1)
               .otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when((F.col("__p") == 1) & (F.col("__y") == 0), 1)
               .otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when((F.col("__p") == 0) & (F.col("__y") == 1), 1)
               .otherwise(0)).cast("long").alias("fn"),
        F.sum(F.when((F.col("__p") == 0) & (F.col("__y") == 0), 1)
               .otherwise(0)).cast("long").alias("tn"))

    out = conf.crossJoin(rank_pos)  # two one-row frames
    prec = F.col("tp") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0))
    rec = F.col("tp") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0))
    auc = ((F.col("r_pos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
           / F.nullif(F.col("n_pos") * F.col("n_neg"), F.lit(0.0)))
    return out.select(
        "n", F.col("n_pos").cast("long").alias("n_pos"),
        "tp", "fp", "fn", "tn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(2 * prec * rec / F.nullif(prec + rec, F.lit(0.0)), 6)
         .alias("f1"),
        F.round((F.col("tp") + F.col("tn")) / F.col("n"), 6)
         .alias("accuracy"),
        F.round(auc, 6).alias("auc"))
