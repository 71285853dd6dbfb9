"""Bigram language-model quality scoring (CCNet-style pseudo-perplexity).

A training-data pipeline filters web-scale text by perplexity under a small
language model trained on a trusted corpus (CCNet, Gopher, Llama data recipes).
The reference engine has the ingredient statistics (LMDirichlet/LMJelinekMercer
similarities hold per-term collection LM probabilities — see
solr/core reference role ``search/similarities/LMDirichletSimilarity.java``)
but no document-level LM scorer; this module supplies the pipeline operator as
pure DataFrame algebra — no Python in the hot path, engine-portable math so a
SQL twin reproduces every value bit-for-bit.

Model: interpolated additive bigram LM.

    Pu(w)   = (C(w) + 1) / (N + V)                    (add-one unigram)
    P(w|v)  = (C(vw) + alpha * Pu(w)) / (C(v) + alpha)
    CE(doc) = -(1 / n_bigrams) * sum ln P(w_i | w_{i-1})
    PPL     = exp(CE)

All counts are exact integers; the only floats are ln/exp on identical inputs
plus one order-free ``exact_sum`` per doc, so the result is reproducible at any
partitioning and matches an ANSI-SQL oracle.

Scale shape (100 TB): the bigram stream never materializes per-doc Python —
``arrays_zip(slice, slice)`` builds adjacent pairs JVM-side; counting is one
map-side-combinable groupBy per table; scoring is two equi-joins of the doc
bigram stream against vocabulary-bounded count tables (broadcast when small,
sort-merge otherwise — both shapes are skew-tolerant because hot bigrams are
hot on BOTH sides of an equi-join, and AQE's skew split applies) plus one
final per-doc aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solr_spark.functions.portable import exact_sum, round_half_away


def _tokens(col: Column | str) -> Column:
    """Lowercased whitespace tokens (the corpus-statistics tokenizer used by
    the other textanalysis ops; the index analyzer is deliberately NOT used
    here — LM filtering happens upstream of indexing)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def _bigram_stream(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, v, w, tf) — adjacent-token pairs with per-doc term frequency.

    Pairs are built JVM-side with two array slices zipped together (no
    posexplode self-join, no Python); the per-(doc,v,w) tf aggregation is the
    stream's ONE shuffle and is map-side combinable.
    """
    toks = _tokens(text_col)
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("v"),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w"),
    )
    return (
        df.select(F.col(id_col).alias("_id"), F.explode(pairs).alias("p"))
        .select("_id", F.col("p.v").alias("v"), F.col("p.w").alias("w"))
        .groupBy("_id", "v", "w")
        .agg(F.count("*").alias("tf"))
    )


def lm_counts(corpus: DataFrame, text_col: str) -> tuple[DataFrame, DataFrame]:
    """Train: (unigram counts, bigram counts) from a trusted corpus.

    Returns ``(unigrams(w, c_w), bigrams(v, w, c_vw))`` — each one explode +
    one map-side-combinable groupBy; both tables are vocabulary-bounded
    (independent of corpus row count), which is what makes the scoring joins
    broadcast-able in practice.
    """
    toks = _tokens(text_col)
    uni = (
        corpus.select(F.explode(toks).alias("w"))
        .groupBy("w").agg(F.count("*").alias("c_w"))
    )
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("v"),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w"),
    )
    bi = (
        corpus.select(F.explode(pairs).alias("p"))
        .select(F.col("p.v").alias("v"), F.col("p.w").alias("w"))
        .groupBy("v", "w").agg(F.count("*").alias("c_vw"))
    )
    return uni, bi


def bigram_lm_score(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    corpus: DataFrame | None = None,
    alpha: float = 1.0,
    scale: int = 4,
) -> DataFrame:
    """Score each doc's pseudo-perplexity under a bigram LM.

    ``corpus`` is the trusted training corpus (defaults to ``docs`` itself —
    self-scoring, the CCNet bootstrap mode). Returns one row per doc:
    ``(id_col, n_bigrams, cross_entropy, perplexity)`` with the floats rounded
    via the engine-portable kernel; docs with fewer than 2 tokens get
    ``n_bigrams = 0`` and NULL entropy/perplexity.

    Determinism: per-(doc, v, w) tf is an exact integer; each distinct bigram
    contributes ``tf * ln P`` once, quantized per-value and summed in
    DECIMAL(38,6) (``exact_sum``) so the doc total is independent of partition
    order at any scale.
    """
    if corpus is None:
        corpus = docs
    uni, bi = lm_counts(corpus, text_col)

    # scalar model constants: total tokens N and vocab size V (bounded collect)
    n_v = uni.agg(
        F.sum("c_w").cast("long").alias("n"), F.count("*").alias("v")
    ).collect()[0]
    n_tokens, vocab = int(n_v["n"] or 0), int(n_v["v"])

    stream = _bigram_stream(docs, id_col, text_col)
    # equi-joins against vocabulary-bounded tables; unmatched -> count 0
    joined = (
        stream
        .join(F.broadcast(bi), ["v", "w"], "left")
        .join(F.broadcast(uni.select(F.col("w").alias("v"),
                                     F.col("c_w").alias("c_v"))), ["v"], "left")
        .join(F.broadcast(uni), ["w"], "left")
    )
    c_vw = F.coalesce(F.col("c_vw"), F.lit(0)).cast("double")
    c_v = F.coalesce(F.col("c_v"), F.lit(0)).cast("double")
    c_w = F.coalesce(F.col("c_w"), F.lit(0)).cast("double")
    p_u = (c_w + F.lit(1.0)) / F.lit(float(n_tokens + vocab))
    p = (c_vw + F.lit(alpha) * p_u) / (c_v + F.lit(alpha))
    per_doc = (
        joined
        .groupBy("_id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            exact_sum(F.col("tf").cast("double") * F.log(p), 6).alias("_s"),
        )
    )
    ce = -(F.col("_s").cast("double")) / F.col("n_bigrams").cast("double")
    # right-join back so 0/1-token docs still appear with n_bigrams = 0
    ids = docs.select(F.col(id_col).alias("_id")).distinct()
    out = (
        per_doc.join(ids, ["_id"], "right")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            round_half_away(ce, scale).alias("cross_entropy"),
            round_half_away(F.exp(round_half_away(ce, scale)), scale)
            .alias("perplexity"),
        )
    )
    return out


def lm_score_sql(text_expr: str, table: str, id_expr: str,
                 alpha: float = 1.0, scale: int = 4) -> str:
    """DuckDB twin of ``bigram_lm_score(docs, corpus=docs)`` — same counts,
    same interpolation, same per-value quantize + DECIMAL(38,6) sum."""
    toks = f"list_filter(string_split(lower({text_expr}), ' '), t -> t <> '')"
    return f"""
WITH t AS (
  SELECT {id_expr} AS _id, {toks} AS toks FROM {table}
),
stream AS (
  SELECT _id, p.v AS v, p.w AS w, count(*) AS tf
  FROM (
    SELECT _id,
           unnest(list_transform(range(1, len(toks)),
                                 i -> struct_pack(v := toks[i],
                                                  w := toks[i + 1]))) AS p
    FROM t
  )
  GROUP BY 1, 2, 3
),
uni AS (
  SELECT w, count(*)::BIGINT AS c_w
  FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w
),
bi AS (
  SELECT v, w, sum(tf)::BIGINT AS c_vw FROM stream GROUP BY v, w
),
consts AS (
  SELECT sum(c_w)::BIGINT AS n, count(*)::BIGINT AS vcb FROM uni
),
scored AS (
  SELECT s._id, s.tf,
    (coalesce(b.c_vw, 0) + {alpha} * ((coalesce(u.c_w, 0) + 1.0)
        / (consts.n + consts.vcb)))
      / (coalesce(uv.c_w, 0) + {alpha}) AS p
  FROM stream s
  LEFT JOIN bi b ON s.v = b.v AND s.w = b.w
  LEFT JOIN uni uv ON s.v = uv.w
  LEFT JOIN uni u ON s.w = u.w
  CROSS JOIN consts
),
per_doc AS (
  SELECT _id, sum(tf)::BIGINT AS n_bigrams,
         sum(round(tf * ln(p), 6)::DECIMAL(38,6)) AS _s
  FROM scored GROUP BY _id
)
SELECT t2._id AS doc_id,
       coalesce(p.n_bigrams, 0) AS n_bigrams,
       round(-(p._s::DOUBLE) / p.n_bigrams, {scale}) AS cross_entropy,
       round(exp(round(-(p._s::DOUBLE) / p.n_bigrams, {scale})), {scale})
         AS perplexity
FROM (SELECT DISTINCT _id FROM t) t2
LEFT JOIN per_doc p ON t2._id = p._id
ORDER BY doc_id
"""
