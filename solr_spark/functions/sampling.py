"""Deterministic, engine-portable sampling / dataset splitting.

Training-pipeline operator (beyond the reference's `random` stream source,
solrj-streaming RandomFacadeStream.java, which is session-random): assigning
every document a STABLE split (train/val/test) or sample membership that any
engine can reproduce. The assignment hashes a key column with md5 — a
cross-engine primitive (Spark `F.md5` == DuckDB `md5` == Python hashlib on
the same bytes) — and buckets the first 8 hex digits as a uint32 fraction:

    u = int(md5(key)[:8], 16) / 2^32   in [0, 1)
    split = first s with cumulative_fraction(s) > u

Properties the pipeline cares about: stable under reruns and repartitioning
(content-keyed, not rand()), independent of row order, exact-expression
portable (the driver's DuckDB oracle reproduces it bit-for-bit), and adding
documents never reassigns existing ones. All pure codegen'd Column
expressions — one projection, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_fraction_col(key: Column | str) -> Column:
    """u in [0, 1): the md5-derived uniform fraction for a key column.
    The key is cast to string first — do the same in any oracle SQL."""
    c = key if isinstance(key, Column) else F.col(key)
    return (F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
            .cast("double") / F.lit(float(1 << 32)))


def deterministic_split(df: DataFrame, key: Column | str,
                        fractions: dict[str, float],
                        out_col: str = "split") -> DataFrame:
    """Add a stable split label column. fractions: ordered {name: fraction};
    must sum to 1.0 (validated). Assignment: cumulative interval containing
    the key's md5 fraction."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    u = split_fraction_col(key)
    expr = None
    acc = 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        acc += frac
        cond = u < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def deterministic_sample(df: DataFrame, key: Column | str,
                         fraction: float) -> DataFrame:
    """Stable subsample: keep rows whose md5 fraction < `fraction`. The same
    keys survive on every engine and every rerun; supersets nest (a 10%
    sample contains the 5% sample)."""
    return df.where(split_fraction_col(key) < fraction)


def stratified_quota_sample(df: DataFrame, key: Column | str,
                            strata_cols: list[str],
                            quota: int | dict[tuple, int]) -> DataFrame:
    """Exact-count stratified sampling: keep the `quota` rows with the
    smallest md5 fraction inside each stratum — the data-mixing primitive
    (N docs per language/source) a pretraining pipeline uses to hit target
    mixture weights exactly, deterministically, on any engine.

    `quota` is either one int for every stratum or {stratum-value-tuple: n}
    (strata missing from the dict are dropped). Ranking is md5-keyed, so the
    sample is stable under reruns/repartitioning and nests: quota 100
    contains quota 50. One window (rank inside stratum) — a single exchange
    on the strata columns; no global sort.
    """
    from pyspark.sql import Window

    kcol = key if isinstance(key, Column) else F.col(key)
    u = split_fraction_col(key)
    # Tie-break on the KEY, not the (partition-constant) strata columns:
    # the 32-bit md5 fraction collides within large strata, and an
    # unresolved tie would make reruns/engines disagree and break nesting.
    w = (Window.partitionBy(*strata_cols)
               .orderBy(F.asc("__u"), kcol.asc()))
    ranked = (df.withColumn("__u", u)
                .withColumn("__rk", F.row_number().over(w)))
    if isinstance(quota, int):
        keep = ranked.where(F.col("__rk") <= quota)
    else:
        if not quota:
            raise ValueError("quota dict must not be empty")
        expr = None
        for svals, n in quota.items():
            svals = svals if isinstance(svals, tuple) else (svals,)
            if len(svals) != len(strata_cols):
                raise ValueError(
                    f"quota key {svals!r} must name all strata columns "
                    f"{strata_cols}")
            cond = F.lit(True)
            for c, v in zip(strata_cols, svals):
                cond = cond & (F.col(c) == F.lit(v))
            branch = cond & (F.col("__rk") <= int(n))
            expr = branch if expr is None else (expr | branch)
        keep = ranked.where(expr)
    return keep.drop("__u", "__rk")


def token_budget_packs(df: DataFrame, id_col: str, text_col: str,
                       budget: int, shard_col: str | None = None) -> DataFrame:
    """Token-budget packing: assign consecutive documents (in `id_col` order)
    to packs so each pack holds ~`budget` tokens — the sequence-packing /
    shard-assembly step before pretraining batch construction.

    Semantics (budget-quantized, exactly reproducible in SQL): pack_id =
    floor(tokens_before / budget), where tokens_before is the exclusive
    running token count in id order. A document never splits; a pack may
    overshoot by at most its last document's length.

    Scale: with `shard_col` the running count restarts per shard and packing
    is embarrassingly parallel (pack within file/source — what production
    pipelines do); the pack key is then (shard, pack_id). Without it the
    prefix sum needs a total order — fine up to the sort capacity of one
    stage, and the window carries only (id, n_tokens) longs, but prefer
    sharded packing at 100 TB.

    Output: id [, shard], n_tokens, pack_id.
    """
    from pyspark.sql import Window

    from solr_spark.functions.textanalysis import token_count

    parts = [shard_col] if shard_col else []
    w = (Window.partitionBy(*parts).orderBy(F.asc(id_col))
               .rowsBetween(Window.unboundedPreceding, -1))
    nt = token_count(text_col)
    out_cols = [id_col] + parts + ["n_tokens", "pack_id"]
    return (df.select(*( [F.col(id_col)] + [F.col(c) for c in parts]),
                      nt.alias("n_tokens"))
              .withColumn("__before",
                          F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
              .withColumn("pack_id",
                          F.floor(F.col("__before") / F.lit(budget))
                           .cast("long"))
              .select(*out_cols))


def temperature_mixture_sample(df: DataFrame, key: Column | str,
                               domain_col: str, budget: int,
                               alpha: float = 0.5,
                               weight_scale: int = 10_000) -> DataFrame:
    """Temperature-scaled domain mixing: sample ~`budget` documents with
    per-domain quotas proportional to n_d^alpha — the multilingual /
    multi-source rebalancing rule (alpha=1 keeps natural proportions,
    alpha=0 gives uniform domains, alpha~0.3-0.7 up-samples the tail)
    used to set pretraining mixture weights from corpus counts.

    Role beyond the reference (training-pipeline op): the reference's
    `random` stream source (solrj-streaming RandomFacadeStream.java) is
    session-random; this is its deterministic, mixture-weighted analog.

    Engine-portable by construction: the only float step is n_d^alpha,
    quantized PER DOMAIN to an integer weight w_d = floor(n_d^alpha *
    weight_scale + 0.5) (per-value, order-free; alpha=0.5 uses sqrt, which
    IEEE requires correctly rounded, so every engine agrees bit-for-bit).
    Quotas are then pure integer arithmetic — quota_d = min(n_d,
    (budget * w_d) div sum(w_d)) — and membership is the md5-fraction rank
    used across this module, so the sample is stable under reruns,
    repartitioning, and engines, and nests as budget grows only via quota
    monotonicity per domain.

    Plan shape: one groupBy(domain) count (tiny), a broadcast join of the
    quota table back onto the md5-ranked corpus, one window exchange on
    domain. floor-division under-allocates at most one doc per domain
    (no largest-remainder pass — keeps the rule closed-form in SQL).
    """
    from pyspark.sql import Window

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    kcol = key if isinstance(key, Column) else F.col(key)
    counts = df.groupBy(domain_col).agg(F.count("*").alias("__n"))
    nd = F.col("__n").cast("double")
    scaled = F.sqrt(nd) if alpha == 0.5 else F.pow(nd, F.lit(float(alpha)))
    weights = counts.withColumn(
        "__w", F.floor(scaled * F.lit(float(weight_scale)) + F.lit(0.5))
                .cast("long"))
    # Global weight total via an empty-frame window — the quota table is one
    # row per domain (tiny), so the single-partition window is free and keeps
    # the plan fully declarative (no driver collect, no self-join lineage).
    # NB: "__wtot", not "__W" — Spark resolution is case-insensitive, so a
    # name differing from "__w" only in case would silently replace it.
    quotas = (weights.withColumn("__wtot", F.sum("__w").over(
                  Window.partitionBy()))
              .withColumn("__quota",
                          F.least(F.col("__n"),
                                  F.expr(f"({budget} * __w) div __wtot")))
              .select(domain_col, "__quota"))
    u = split_fraction_col(key)
    w = (Window.partitionBy(domain_col)
               .orderBy(F.asc("__u"), kcol.asc()))
    ranked = (df.withColumn("__u", u)
                .withColumn("__rk", F.row_number().over(w)))
    return (ranked.join(F.broadcast(quotas), domain_col)
                  .where(F.col("__rk") <= F.col("__quota"))
                  .drop("__u", "__rk", "__quota"))


def chunk_token_windows(df: DataFrame, id_col: str, text_col: str,
                        window: int, stride: int | None = None) -> DataFrame:
    """Sliding token-window chunking: split each document's whitespace
    token sequence into windows of `window` tokens advancing by `stride`
    (stride < window overlaps; stride == window tiles) — the long-document
    -> training-sequence splitter that feeds sequence packing.

    Semantics (closed-form, integer-only, so any engine reproduces it):
    a document with n > 0 tokens yields n_chunks = 1 + ceil(max(0, n -
    window) / stride) chunks; chunk i covers tokens [i*stride, i*stride +
    window) (the last window is short rather than re-aligned — no token is
    dropped and none duplicated beyond the declared overlap). Empty
    documents yield no chunks.

    Plan shape: one projection + explode(sequence(...)) — narrow, no
    shuffle, no Python; the token array is built once per row and sliced
    per chunk JVM-side. At 100 TB this is the shape you want: chunking is
    embarrassingly parallel and columnar end-to-end.

    Output: id, chunk_idx (long), chunk_tokens (long), chunk_text.
    """
    from solr_spark.functions.textanalysis import whitespace_tokens

    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    stride = window if stride is None else stride
    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")
    if stride > window:
        # the closed-form chunk count assumes overlap (stride < window) or
        # tiling (stride == window); a gapped stride would emit empty
        # past-the-end chunks AND silently drop tokens between windows
        raise ValueError(
            f"stride ({stride}) must not exceed window ({window}): "
            f"chunking is overlap/tiling only, gaps would drop tokens")
    toks = whitespace_tokens(text_col)
    base = (df.select(F.col(id_col), toks.alias("__toks"))
              .withColumn("__n", F.size("__toks"))
              .where(F.col("__n") > 0)
              .withColumn(
                  "__nc",
                  F.expr(f"1 + (greatest(__n - {window}, 0) + {stride - 1}) "
                         f"div {stride}")))
    piece = F.slice(F.col("__toks"),
                    F.col("chunk_idx").cast("int") * stride + 1, window)
    return (base.select(
                F.col(id_col),
                F.explode(F.sequence(F.lit(0).cast("long"),
                                     F.col("__nc") - 1)).alias("chunk_idx"),
                F.col("__toks"))
            .select(F.col(id_col), "chunk_idx",
                    F.size(piece).cast("long").alias("chunk_tokens"),
                    F.array_join(piece, " ").alias("chunk_text")))


def hashed_ngram_buckets(df: DataFrame, id_col: str, text_col: str,
                         n_buckets: int = 10000) -> DataFrame:
    """Hashed n-gram features (DSIR, Xie et al. 2023 arXiv:2302.03169 §3):
    unigrams + bigrams of the whitespace tokens, hashed into `n_buckets`
    (bucket = md5-derived uint % n_buckets — the engine-portable hash this
    module already uses), counted per document.

    Output: id, bucket (int), cnt (long). One explode + one
    map-side-combinable count; hot buckets pre-combine before the exchange.
    """
    from solr_spark.functions.textanalysis import whitespace_tokens

    toks = whitespace_tokens(text_col)
    bigrams = F.filter(
        F.transform(toks, lambda x, i: F.concat_ws(
            " ", x, F.get(toks, i + 1))),
        lambda g: g.contains(" "))
    grams = F.concat(toks, bigrams)
    bucket = (F.conv(F.substring(F.md5(F.col("__gram")), 1, 15), 16, 10)
               .cast("long") % n_buckets).cast("int")
    return (df.select(F.col(id_col), F.explode(grams).alias("__gram"))
              .where(F.col("__gram") != "")
              .select(id_col, bucket.alias("bucket"))
              .groupBy(id_col, "bucket")
              .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


def dsir_log_weights(raw_df: DataFrame, target_df: DataFrame, id_col: str,
                     text_col: str, n_buckets: int = 10000,
                     alpha: float = 1.0) -> DataFrame:
    """DSIR importance log-weights: log p_target(x) - log p_raw(x) under
    bag-of-hashed-ngrams unigram models (Xie et al. 2023 §3.1-3.2).

    Both models are Laplace-smoothed bucket multinomials:
    p_b = (count_b + alpha) / (total + alpha * n_buckets). A document's
    log-weight is sum over its grams of log(p_target_b / p_raw_b).

    Scale shape: the two model fits are n_buckets-bounded aggregations; the
    per-document weight is one broadcast join of the doc-bucket counts
    against the (≤ n_buckets)-row log-ratio table plus one
    map-side-combinable sum. The sum is order-independent (exact_sum at 1e-6)
    so weights are deterministic under any partitioning — and SQL-twinnable.

    Output: id, log_weight (DECIMAL sum of 6-decimal quantized terms).
    """
    import math

    from solr_spark.functions.portable import exact_sum

    raw_b = hashed_ngram_buckets(raw_df, id_col, text_col, n_buckets)
    tgt_b = hashed_ngram_buckets(target_df, id_col, text_col, n_buckets)

    def model(b: DataFrame, denom: float) -> DataFrame:
        return (b.groupBy("bucket").agg(F.sum("cnt").alias("c"))
                 .select("bucket",
                         F.log((F.col("c") + F.lit(float(alpha)))
                               / F.lit(denom)).alias("logp")))

    # log p for a bucket ABSENT from a model's fit is log(alpha / denom);
    # materialize ratios only for buckets either model saw (a gram in a
    # scored doc always exists in the raw fit when raw_df is the scored
    # corpus — the DSIR setting; scoring a foreign doc coalesces to the
    # smoothed floor below). The totals are scalar aggregates (bounded
    # driver reads), one per model.
    tgt_total = (tgt_b.agg(F.sum("cnt")).first()[0] or 0) \
        + alpha * n_buckets
    raw_total = (raw_b.agg(F.sum("cnt")).first()[0] or 0) \
        + alpha * n_buckets
    tgt_floor = math.log(alpha / tgt_total)
    raw_floor = math.log(alpha / raw_total)
    ratio = (model(raw_b, raw_total).withColumnRenamed("logp", "logq")
             .join(model(tgt_b, tgt_total), "bucket", "full_outer")
             .select("bucket",
                     (F.coalesce(F.col("logp"), F.lit(tgt_floor))
                      - F.coalesce(F.col("logq"), F.lit(raw_floor)))
                     .alias("log_ratio")))
    scored = (raw_b.join(F.broadcast(ratio), "bucket", "left")
              .select(id_col,
                      (F.col("cnt") * F.coalesce(
                          F.col("log_ratio"),
                          F.lit(tgt_floor - raw_floor))).alias("__t")))
    return (scored.groupBy(id_col)
                  .agg(exact_sum(F.col("__t"), 6).alias("log_weight")))


def dsir_select(raw_df: DataFrame, target_df: DataFrame, id_col: str,
                text_col: str, k: int, n_buckets: int = 10000,
                alpha: float = 1.0, gumbel: bool = False) -> DataFrame:
    """DSIR data selection: keep the k raw documents whose hashed-ngram
    importance weights are largest (Xie et al. 2023 §3.3).

    gumbel=False is the temperature-0 variant: top-k by log_weight with id
    tiebreak. gumbel=True implements the paper's Gumbel top-k resampling
    (equivalent to sampling without replacement proportionally to the
    weights) with DETERMINISTIC noise g = -ln(-ln(u)), u the md5 uniform of
    the id — stable under reruns/repartitioning like every sampler here.

    Output: id, log_weight, ordered by the selection key descending.
    """
    w = dsir_log_weights(raw_df, target_df, id_col, text_col, n_buckets,
                         alpha)
    key = F.col("log_weight").cast("double")
    if gumbel:
        key = key + -F.log(-F.log(split_fraction_col(F.col(id_col))))
    return (w.select(id_col, "log_weight", key.alias("__key"))
             .orderBy(F.desc("__key"), F.asc(id_col)).limit(k)
             .drop("__key"))


def cluster_balanced_sample(df: DataFrame, vec_col: str, budget: int,
                            centroids: "DataFrame | None" = None,
                            n_centroids: int = 16, alpha: float = 0.5,
                            id_col: str = "vec_id") -> DataFrame:
    """Topic-balanced sampling over an embedding column (the D4-style
    diversify step, Tirumala et al. 2023 §3): cluster the corpus in
    embedding space, then draw a temperature-scaled per-cluster quota —
    alpha<1 up-samples tail topics the way temperature_mixture_sample
    up-samples tail domains, but with clusters DISCOVERED from the vectors
    instead of taken from a metadata column.

    Role beyond the reference (training-pipeline op): composes this
    module's deterministic mixture sampler with the vectors module's IVF
    machinery — `centroids` (DataFrame(cid, cvec), e.g. from ivf_train)
    pins the clustering for reproducibility; centroids=None trains
    spherical k-means on the corpus first.

    Plan shape: the assignment is one broadcast crossJoin + per-id argmax
    window (ivf_assign — narrow, no shuffle of the corpus), then the
    mixture sampler's tiny count-aggregate, broadcast quota join, and one
    window exchange on the cluster key. Output: input columns + `cluster`.
    """
    from solr_spark.functions.vectors import ivf_assign, ivf_train

    if centroids is None:
        centroids = ivf_train(df, vec_col, n_centroids, id_col=id_col)
    assigned = ivf_assign(df, vec_col, centroids, id_col=id_col)
    return temperature_mixture_sample(assigned, id_col, "cluster", budget,
                                      alpha=alpha)


def perplexity_buckets(scored: DataFrame, ppl_col: str = "perplexity",
                       n_buckets: int = 3,
                       labels: tuple[str, ...] = ("head", "middle", "tail"),
                       out_col: str = "ppl_bucket") -> DataFrame:
    """CCNet perplexity bucketing (Wenzek et al. 2019, "CCNet: Extracting
    High Quality Monolingual Datasets from Web Crawl Data"): split a scored
    corpus into head/middle/tail by LM-perplexity quantiles — head = the
    most-fluent third, tail = the most-perplexing.

    Exact, VALUE-GRANULAR quantiles over the DISTINCT perplexity table.
    A 6-dp rounding grid over exp(cross-entropy) admits ~1e9+ distinct
    values, so at corpus scale the distinct table can approach the corpus —
    the cumulative count therefore runs through `distributed_cumsum`
    (evaluators.py — range-partition, per-partition totals to the driver,
    offsets broadcast back), never a global unpartitioned window. Every doc
    sharing a score lands in the bucket of that value's FIRST position —
    deterministic and engine-portable, unlike ntile's arbitrary tie split.
    Bucket k covers positions ((k-1)*N/n, k*N/n]. The value->bucket map
    joins back on the score column (a plain shuffle join; AQE broadcasts
    it when the distinct table is actually small).

    Unscorable docs (NULL perplexity — under 2 tokens) get a NULL bucket:
    CCNet cannot place what the LM cannot score; route them separately.
    """
    from solr_spark.functions.evaluators import distributed_cumsum

    if n_buckets != len(labels):
        raise ValueError(f"need {n_buckets} labels, got {len(labels)}")
    p = F.col(ppl_col)
    valid = scored.where(p.isNotNull())
    dist = valid.groupBy(ppl_col).agg(F.count(F.lit(1)).alias("__c")).cache()
    n = dist.agg(F.sum("__c")).first()[0] or 0
    if n == 0:
        return scored.withColumn(out_col, F.lit(None).cast("string"))
    cum = distributed_cumsum(dist, ppl_col, ["__c"])
    first_pos = F.col("cum___c") - F.col("__c") + 1
    idx = F.floor((first_pos - 1) * n_buckets / F.lit(float(n)))
    label = None
    for i, name in enumerate(labels):
        label = (F.when(idx == i, name) if label is None
                 else label.when(idx == i, name))
    buckets = cum.select(ppl_col, label.alias(out_col))
    return scored.join(buckets, ppl_col, "left")


def ccnet_sample(scored: DataFrame, id_col: str,
                 keep: dict[str, float] | None = None,
                 ppl_col: str = "perplexity",
                 bucket_col: str = "ppl_bucket",
                 seed: str = "ccnet") -> DataFrame:
    """CCNet bucket-weighted downsampling: keep each perplexity bucket at
    its own rate (the released pipeline keeps head, halves middle, drops
    most of tail). Membership is md5-keyed on (seed, id) — deterministic,
    engine-portable, and nesting (a higher rate's sample contains the
    lower's), the same contract as deterministic_sample. NULL-bucket docs
    (unscorable) are dropped — the caller routes them explicitly.
    """
    keep = {"head": 1.0, "middle": 0.5, "tail": 0.1} if keep is None else keep
    df = scored
    if bucket_col not in df.columns:
        # labels are POSITIONAL in perplexity_buckets (most-fluent first);
        # a keep dict written tail-first must not invert the terciles, so
        # the derived order is pinned to the canonical CCNet labels rather
        # than dict insertion order. Custom labels require a pre-bucketed
        # frame (the caller knows their fluency order; we don't).
        order = tuple(l for l in ("head", "middle", "tail") if l in keep)
        if len(order) != len(keep):
            raise ValueError(
                "ccnet_sample derives buckets only for the canonical "
                "head/middle/tail labels; got "
                f"{sorted(keep)} — pre-bucket the frame ({bucket_col!r}) "
                "to use custom labels")
        df = perplexity_buckets(df, ppl_col, len(order), order,
                                out_col=bucket_col)
    u = split_fraction_col(F.concat(F.lit(seed), F.lit(":"),
                                    F.col(id_col).cast("string")))
    rate = None
    for name, frac in keep.items():
        rate = (F.when(F.col(bucket_col) == name, float(frac)) if rate is None
                else rate.when(F.col(bucket_col) == name, float(frac)))
    return df.where(F.col(bucket_col).isNotNull() & (u < rate))


def unimax_allocations(df: DataFrame, lang_col: str, total_budget: int,
                       max_epochs: int = 4) -> DataFrame:
    """UniMax per-language document budgets (Chung et al. 2023, "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): spread `total_budget` docs UNIFORMLY across languages,
    but never take more than `max_epochs` passes over a language's corpus —
    low-resource languages cap out at their epoch budget, the surplus
    waterfills into the rest.

    Exact integer waterfilling, closed-form over the LANGUAGE table (bounded
    by |languages|, never corpus-sized): sort languages by capacity
    cap_l = n_l * max_epochs ascending (name tiebreak); a language is capped
    iff cap_l * langs_remaining <= budget_remaining at its position (the
    prefix property holds because caps are sorted); uncapped languages split
    the remainder evenly with the first `remainder mod k` (in sort order)
    getting one extra — allocations sum EXACTLY to min(total_budget,
    sum(cap_l)). Pure BIGINT arithmetic, so any engine reproduces it.
    Output: lang, n_docs, capacity, allocation.
    """
    from pyspark.sql import Window

    if total_budget < 0 or max_epochs <= 0:
        raise ValueError("total_budget must be >= 0 and max_epochs >= 1")
    # NULL-language rows can never join back to their allocation
    # (null == null is never true), so letting them form a group would
    # silently strand budget — exclude them up front; the realized sample
    # then sums exactly to min(budget, sum capacity) over REAL languages.
    df = df.where(F.col(lang_col).isNotNull())
    counts = (df.groupBy(F.col(lang_col).alias("lang"))
              .agg(F.count(F.lit(1)).alias("n_docs"))
              .withColumn("capacity",
                          (F.col("n_docs") * max_epochs).cast("long")))
    w = Window.orderBy("capacity", "lang")
    wall = Window.partitionBy()
    ranked = (counts
              .withColumn("__i", F.row_number().over(w))
              .withColumn("__cum", F.sum("capacity").over(
                  w.rowsBetween(Window.unboundedPreceding, 0)))
              .withColumn("__k", F.count(F.lit(1)).over(wall)))
    b = F.lit(int(total_budget))
    # capped iff taking the full capacity still leaves >= an even share for
    # everyone after it: cap_i * (k - i + 1) <= B - cum_{i-1}
    capped = (F.col("capacity") * (F.col("__k") - F.col("__i") + 1)
              <= b - (F.col("__cum") - F.col("capacity")))
    ranked = ranked.withColumn("__capped", capped)
    # the waterline sits after the last capped language
    agg = ranked.withColumn(
        "__cap_sum", F.sum(F.when(F.col("__capped"),
                                  F.col("capacity")).otherwise(0)).over(wall)
    ).withColumn(
        "__n_capped", F.sum(F.col("__capped").cast("long")).over(wall))
    rem_budget = b - F.col("__cap_sum")
    rem_langs = F.col("__k") - F.col("__n_capped")
    share = F.floor(rem_budget / rem_langs)
    extra = rem_budget - share * rem_langs  # first `extra` uncapped get +1
    uncapped_pos = (F.col("__i") - F.col("__n_capped"))  # 1-based in order
    alloc = F.when(F.col("__capped"), F.col("capacity")).otherwise(
        share + F.when(uncapped_pos <= extra, 1).otherwise(0))
    return (agg.select("lang", "n_docs", "capacity",
                       F.greatest(F.lit(0), alloc).cast("long")
                        .alias("allocation")))


def unimax_sample(df: DataFrame, key: Column | str, lang_col: str,
                  total_budget: int, max_epochs: int = 4) -> DataFrame:
    """Materialize the UniMax allocation as an epoch-tagged sample: every
    doc of a language repeats floor(alloc / n_docs) full epochs, and the
    `alloc mod n_docs` docs with the smallest md5 fraction take one extra
    pass — exact allocation counts, deterministic on any engine, nesting
    in the fractional epoch the way deterministic_sample nests.
    NULL-language rows are excluded (no allocation can reach them).

    Shape: the allocation table (|languages| rows) broadcasts onto the
    corpus; full epochs = explode(sequence) map-only. The fractional-epoch
    pick is the THRESHOLD variant of distributed selection — no
    per-language full-partition sort: bucket every doc by the top 16 bits
    of its md5 fraction, per-(lang, bucket) counts (<= 65536 rows per
    language in the cumulative window), locate the bucket containing the
    rem-th smallest fraction, broadcast that boundary back; docs strictly
    below the boundary bucket are selected map-side, and only the boundary
    bucket's docs (expected n_lang / 65536) are rank-ordered to pick the
    exact remainder — identical selection to a full (u, key) sort because
    buckets are a prefix of u's bits. Output: input columns + epoch
    (1-based pass index).
    """
    from pyspark.sql import Window

    valid = df.where(F.col(lang_col).isNotNull())
    allocs = unimax_allocations(valid, lang_col, total_budget, max_epochs)
    tagged = valid.join(
        F.broadcast(allocs.withColumnRenamed("lang", "__unimax_lang")),
        F.col(lang_col) == F.col("__unimax_lang"), "inner"
    ).drop("__unimax_lang")
    kc = key if isinstance(key, Column) else F.col(key)
    u32 = (F.conv(F.substring(F.md5(kc.cast("string")), 1, 8), 16, 10)
           .cast("long"))
    u = split_fraction_col(kc)
    rem = (F.col("allocation") % F.col("n_docs")).cast("long")

    # per-(lang, bucket) histogram of md5-fraction top bits; the per-lang
    # cumulative window is bounded by 65536 buckets, never corpus-sized
    hist = (valid.select(F.col(lang_col).alias("__hl"),
                         F.shiftright(u32, 16).alias("__b"))
            .groupBy("__hl", "__b").agg(F.count(F.lit(1)).alias("__c")))
    wb = (Window.partitionBy("__hl").orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, 0))
    hist = hist.withColumn("__cum", F.sum("__c").over(wb))
    rem_tbl = allocs.select(
        F.col("lang").alias("__hl"),
        (F.col("allocation") % F.col("n_docs")).cast("long").alias("__rem"))
    # boundary bucket per language: exclusive-cum < rem <= inclusive-cum;
    # languages with rem == 0 simply have no boundary row
    bounds = (hist.join(rem_tbl, "__hl")
              .where((F.col("__cum") - F.col("__c") < F.col("__rem"))
                     & (F.col("__rem") <= F.col("__cum")))
              .select("__hl", F.col("__b").alias("__bb"),
                      (F.col("__cum") - F.col("__c")).alias("__below")))

    tagged = (tagged.withColumn("__b", F.shiftright(u32, 16))
              .join(F.broadcast(bounds),
                    F.col(lang_col) == F.col("__hl"), "left")
              .drop("__hl"))
    below = tagged.where(F.col("__bb").isNull()
                         | (F.col("__b") != F.col("__bb"))) \
                  .withColumn("__extra",
                              (F.col("__b") < F.col("__bb")).cast("int"))
    # only the boundary bucket's rows enter the ranking window
    rw = Window.partitionBy(lang_col).orderBy(u.asc(), kc.cast("string"))
    cand = (tagged.where(F.col("__b") == F.col("__bb"))
            .withColumn("__r", F.row_number().over(rw))
            .withColumn("__extra",
                        (F.col("__below") + F.col("__r") <= rem).cast("int"))
            .drop("__r"))
    merged = below.unionByName(cand)
    full = F.floor(F.col("allocation") / F.col("n_docs")).cast("int")
    n_epochs = full + F.coalesce(F.col("__extra"), F.lit(0))
    out_cols = df.columns
    return (merged.withColumn("__e", n_epochs)
            .where(F.col("__e") > 0)
            .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("__e"))))
            .select(*out_cols, "epoch"))


def doremi_weights(df: DataFrame, step_col: str, domain_col: str,
                   loss_col: str, ref_loss_col: str,
                   eta: float = 1.0, smoothing: float = 1e-3) -> DataFrame:
    """DoReMi domain-mixture reweighting (Xie et al. 2023, "DoReMi:
    Optimizing Data Mixtures Speeds Up Language Model Pretraining",
    Algorithm 1): given a proxy-model training log of per-example losses and
    reference-model losses, produce the time-averaged domain mixture weights
    the paper feeds to the full-size pretraining run.

    Exact restatement, closed-form over steps: the exponentiated-gradient
    state after step t is w_t[d] ∝ exp(eta * Σ_{s<=t} λ_s[d]) where
    λ_s[d] = mean over the step's domain-d examples of the CLIPPED excess
    loss max(0, loss - ref_loss) (the paper's per-domain excess-loss
    gradient); the played distribution is the smoothed
    α_t = (1 - c) · softmax(eta · L_t) + c/k, and the returned weight is
    avg_t α_t[d] — the paper's average over proxy training. Because
    smoothing perturbs only the PLAYED α, never the EG state, the cumsum
    closed form is exact, and the whole computation is Column algebra.

    Scale shape: the corpus-sized work is ONE groupBy(step, domain) partial
    agg; every window after it runs over the (steps × domains) census grid
    — bounded by the training schedule, not the corpus. The per-step
    softmax is max-stabilized so long schedules cannot overflow exp.
    A (step, domain) cell with no examples contributes zero excess loss
    (that domain was not sampled at that step — its EG state holds).

    Returns DataFrame(domain_col, weight) with weights summing to 1.
    """
    from pyspark.sql import Window

    if not 0.0 <= smoothing < 1.0:
        raise ValueError(f"smoothing must be in [0, 1), got {smoothing}")
    xl = F.greatest(F.lit(0.0),
                    F.col(loss_col) - F.col(ref_loss_col))
    agg = (df.groupBy(step_col, domain_col)
             .agg(F.avg(xl).alias("__xl")))
    # dense (step x domain) grid: absent cells hold the EG state (0 excess)
    grid = (agg.select(step_col).distinct()
               .crossJoin(agg.select(domain_col).distinct())
               .join(agg, [step_col, domain_col], "left")
               .fillna(0.0, subset=["__xl"]))
    per_dom = Window.partitionBy(domain_col).orderBy(step_col)  # bounded:
    per_step = Window.partitionBy(step_col)                     # census grid
    grid = (grid.withColumn("__L", F.sum("__xl").over(per_dom))
                .withColumn("__m", F.max("__L").over(per_step))
                .withColumn("__e", F.exp(F.lit(float(eta))
                                         * (F.col("__L") - F.col("__m"))))
                .withColumn("__Z", F.sum("__e").over(per_step))
                .withColumn("__k", F.count("*").over(per_step)))
    alpha = (F.lit(1.0 - smoothing) * F.col("__e") / F.col("__Z")
             + F.lit(float(smoothing)) / F.col("__k"))
    return (grid.groupBy(domain_col)
                .agg(F.avg(alpha).alias("weight"))
                .orderBy(domain_col))
