"""Vector similarity: brute-force cosine top-k and LSH-bucketed ANN.

Reference analog: Solr's DenseVectorField + {!knn} / {!vectorSimilarity} parsers
(solr/core/src/java/org/apache/solr/schema/DenseVectorField.java:70-81, HNSW-backed).
HNSW is a pointer-chasing graph — wrong shape for Spark; the scale path here is
random-hyperplane LSH bucketing (the standard shuffle-friendly ANN), with
brute-force cosine as the exact baseline and the verifier for bucket candidates.

Dot products run as JVM `aggregate`/`zip_with` expressions (whole-stage codegen,
no Python). At very high dimensions a numpy/Arrow pandas-UDF kernel wins on SIMD —
`cosine_topk(..., kernel="pandas")` flips to a vectorized numpy matmul that scores a
whole Arrow batch per call.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim(vec_col: Column | str, query: Sequence[float]) -> Column:
    """Cosine similarity of an array<float/double> column against a literal query
    vector, as a pure JVM expression."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    v = v.cast("array<double>")
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = math.sqrt(sum(float(x) * float(x) for x in query))
    return _dot(v, q) / (_norm(v) * F.lit(qn))


def cosine_topk(df: DataFrame, vec_col: str, query: Sequence[float], k: int,
                id_col: str = "vec_id", kernel: str = "expr") -> DataFrame:
    """Exact brute-force cosine top-k: score every row, TakeOrdered(k).

    kernel="expr": codegen'd aggregate/zip_with (no Python in the hot path).
    kernel="pandas": Arrow-batched numpy matmul (wins at high dim / wide batches).
    Output: id, cosine (rounded 6dp), ordered desc with id tiebreak.
    """
    if kernel == "pandas":
        q = np.asarray(list(query), dtype=np.float64)
        qn = float(np.linalg.norm(q))

        @F.pandas_udf("double")
        def cos(vs: pd.Series) -> pd.Series:
            m = np.stack(vs.apply(np.asarray).to_numpy()).astype(np.float64)
            sims = (m @ q) / (np.linalg.norm(m, axis=1) * qn)
            return pd.Series(sims)

        scored = df.select(F.col(id_col), cos(F.col(vec_col)).alias("__c"))
    else:
        scored = df.select(F.col(id_col), cosine_sim(vec_col, query).alias("__c"))
    return (scored.select(id_col, F.round("__c", 6).alias("cosine"))
                  .orderBy(F.desc("cosine"), F.asc(id_col)).limit(k))


def quantize_int8(df: DataFrame, vec_col: str, id_col: str = "vec_id",
                  keep_cols: Sequence[str] = ()) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization: q_i = round(127 x_i /
    max|x|), stored as array<tinyint> plus one double `scale` (= max|x|/127).

    The 100-TB lever: a quantized embedding column scans at ~1/4 the bytes
    (int8 vs float32/64 per component) and the dequantized dot product stays
    whole-stage codegen. Reference role: Lucene's scalar-quantized
    KNN vectors (Lucene99ScalarQuantizedVectorsFormat behavior; Solr
    DenseVectorField picks it up via the codec). One narrow map — no shuffle.

    Rounding uses the engine-portable half-away kernel so a SQL twin
    (round(127 * x / amax)) reproduces the exact same codes.
    """
    from solr_spark.functions.portable import round_half_away

    v = F.col(vec_col).cast("array<double>")
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = (amax / F.lit(127.0)).alias("scale")
    qvec = F.transform(
        v, lambda x: F.when(amax == 0, F.lit(0))
        .otherwise(round_half_away(x * F.lit(127.0) / amax, 0))
        .cast("tinyint")).alias("qvec")
    return df.select(F.col(id_col), *[F.col(c) for c in keep_cols], qvec, scale)


def dequantize(qvec_col: Column | str, scale_col: Column | str) -> Column:
    """array<tinyint> + scale -> array<double> (exact inverse up to the
    quantization grid)."""
    q = F.col(qvec_col) if isinstance(qvec_col, str) else qvec_col
    s = F.col(scale_col) if isinstance(scale_col, str) else scale_col
    return F.transform(q, lambda x: x.cast("double") * s)


def cosine_scores(df: DataFrame, vec_col: str, query: Sequence[float],
                  id_col: str = "vec_id") -> DataFrame:
    """Cosine similarity of EVERY vector to a literal query — the unranked
    companion of cosine_topk (same 6dp contract, no sort/limit): feeds
    downstream relational ops (joins, metrics, filters) where top-k
    truncation would be wrong. Pure codegen Column algebra, map-only."""
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = math.sqrt(sum(float(x) * float(x) for x in query))
    v = F.col(vec_col).cast("array<double>")
    sim = _dot(v, q) / (_norm(v) * F.lit(qn))
    return df.select(F.col(id_col), F.round(sim, 6).alias("cosine"))


def cosine_topk_int8(df: DataFrame, query: Sequence[float], k: int,
                     id_col: str = "vec_id", qvec_col: str = "qvec",
                     scale_col: str = "scale") -> DataFrame:
    """cosine_topk over an int8-quantized table (output contract identical:
    id, cosine 6dp, desc with id tiebreak). Note cosine is scale-invariant,
    so the per-vector scale cancels and scoring is a pure int8->double
    dot against the literal query — the scan reads 1/4 the bytes and the
    expression stays codegen."""
    dq = dequantize(qvec_col, scale_col)
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = math.sqrt(sum(float(x) * float(x) for x in query))
    sim = _dot(dq, q) / (_norm(dq) * F.lit(qn))
    return (df.select(F.col(id_col), F.round(sim, 6).alias("cosine"))
              .orderBy(F.desc("cosine"), F.asc(id_col)).limit(k))


def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH (seeded PCG64 — generated on
    the driver, broadcast as literals; no executor-side RNG, so retries are safe)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec_col: Column | str, planes: Sequence[Sequence[float]]) -> Column:
    """Sign-LSH bucket id: bit i = (v . plane_i) >= 0, packed into a long."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    v = v.cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        pl = F.array(*[F.lit(float(x)) for x in p])
        bit = (_dot(v, pl) >= 0).cast("long")
        bucket = bucket + bit * F.lit(1 << i).cast("long")
    return bucket


def lsh_ann_topk(df: DataFrame, vec_col: str, query: Sequence[float], k: int,
                 id_col: str = "vec_id", n_planes: int = 8, seed: int = 7,
                 multiprobe: int = 1) -> DataFrame:
    """Approximate NN: restrict the brute-force scan to the query's LSH bucket
    (plus `multiprobe` single-bit-flip neighbor buckets for recall), then exact
    cosine top-k on the candidates.

    At 100 TB the table is written bucketed/partitioned by `lsh_bucket`, so this
    query prunes to a handful of partitions instead of scanning the corpus.
    """
    dim = len(list(query))
    planes = hyperplanes(dim, n_planes, seed)
    q = np.asarray(list(query), dtype=np.float64)
    qbits = [(float(np.dot(q, np.asarray(p))) >= 0.0) for p in planes]
    qbucket = sum(1 << i for i, b in enumerate(qbits) if b)
    probe = {qbucket}
    for i in range(min(multiprobe, n_planes)):
        probe.add(qbucket ^ (1 << i))
    with_bucket = df.withColumn("__bucket", lsh_bucket(vec_col, planes))
    cand = with_bucket.where(F.col("__bucket").isin(sorted(probe)))
    return cosine_topk(cand, vec_col, query, k, id_col)


def ivf_assign(df: DataFrame, vec_col: str, centroids: DataFrame,
               id_col: str = "vec_id") -> DataFrame:
    """Assign every vector to its nearest centroid by cosine (IVF coarse
    quantization). centroids: DataFrame(cid, cvec). Deterministic tiebreak:
    highest cosine, then lowest cid. One broadcast join + window — at 100 TB
    the assignment is a narrow scan against a few-thousand-row broadcast, and
    the table is then written partitioned by `cluster` so probes prune files.
    """
    from pyspark.sql import Window

    sim = _dot(F.col(vec_col).cast("array<double>"),
               F.col("cvec").cast("array<double>")) / (
        _norm(F.col(vec_col).cast("array<double>"))
        * _norm(F.col("cvec").cast("array<double>")))
    w = Window.partitionBy(id_col).orderBy(F.desc("__sim"), F.asc("cid"))
    return (df.crossJoin(F.broadcast(centroids))
            .withColumn("__sim", F.round(sim, 9))
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__sim", "__rn", "cvec")
            .withColumnRenamed("cid", "cluster"))


def ivf_train(df: DataFrame, vec_col: str, n_centroids: int = 16,
              iters: int = 5, id_col: str = "vec_id",
              seed: int = 7) -> DataFrame:
    """Train the IVF coarse quantizer: Lloyd's k-means over L2-NORMALIZED
    vectors (spherical k-means — Euclidean argmin on the unit sphere is
    cosine argmax, matching ivf_assign's metric). Reuses the kmeans
    evaluator kernel (functions/evaluators.py: assignment as a codegen'd
    literal-centroid argmin — no join/shuffle; centroid update shuffles only
    k*dim rows per iteration), so training is one narrow scan per iteration
    at any corpus size. Deterministic: seeded xxhash64 init, no runtime RNG.

    Returns DataFrame(cid, cvec) for ivf_assign / ivf_ann_topk(centroids=...).
    Reference role: schema/DenseVectorField.java:70-81 (the quantizer quality
    knob HNSW's graph build plays there).
    """
    from solr_spark.functions.evaluators import kmeans

    v = F.col(vec_col).cast("array<double>")
    unit = (df.select(F.col(id_col), v.alias("__v"))
              .withColumn("__n", _norm(F.col("__v")))
              .select(id_col,
                      F.transform("__v", lambda x: x / F.col("__n"))
                       .alias("__uv")))
    _, cents = kmeans(unit, "__uv", k=n_centroids, iters=iters,
                      id_col=id_col, seed=seed)
    return cents.select("cid", F.col("centroid").alias("cvec"))


def ivf_ann_topk(df: DataFrame, vec_col: str, query: Sequence[float], k: int,
                 id_col: str = "vec_id", n_centroids: int = 16,
                 n_probe: int = 4, centroids: DataFrame | None = None,
                 train: bool = False) -> DataFrame:
    """IVF approximate NN: coarse-quantize to `n_centroids` clusters, probe the
    `n_probe` clusters nearest the query, exact cosine top-k on candidates.

    Pass `centroids` (from ivf_train) or `train=True` for a TRAINED
    quantizer — the production path; recall@10 >= 0.9 vs exact cosine is
    pytest-gated on a corpus where the untrained default demonstrably fails.
    Without either, a deterministic seed set (the first n_centroids vectors
    by id) keeps the operator SQL-twin-checkable (the oracle can't run
    k-means) — and warns, so nobody serves off the weak quantizer by
    accident. Either way the PLUMBING is the IVF scale path: broadcast
    assignment, probe-pruned candidate scan, exact verify. Complements
    lsh_ann_topk as the second ANN family (reference context:
    DenseVectorField's HNSW is pointer-chasing and wrong-shaped for Spark).
    """
    if centroids is None and train:
        centroids = ivf_train(df, vec_col, n_centroids, id_col=id_col)
    elif centroids is None:
        import warnings

        warnings.warn(
            "ivf_ann_topk: untrained seed quantizer (first n_centroids ids) "
            "— recall is corpus-dependent; pass train=True or "
            "centroids=ivf_train(...) for serving", stacklevel=2)
        centroids = (df.where(F.col(id_col) < n_centroids)
                     .select(F.col(id_col).alias("cid"),
                             F.col(vec_col).alias("cvec")))
    assigned = ivf_assign(df, vec_col, centroids, id_col)
    q = np.asarray(list(query), dtype=np.float64)
    cs = centroids.collect()  # tiny: n_centroids rows
    scored = sorted(
        ((float(np.dot(q, np.asarray(r["cvec"], dtype=np.float64))
                / (np.linalg.norm(q)
                   * np.linalg.norm(np.asarray(r["cvec"], dtype=np.float64)))),
          -r["cid"]) for r in cs), reverse=True)
    probe = sorted(-c for _, c in scored[:n_probe])
    cand = assigned.where(F.col("cluster").isin(probe))
    return cosine_topk(cand, vec_col, query, k, id_col)


def knn_prefiltered(df: DataFrame, vec_col: str, query: Sequence[float], k: int,
                    prefilter: Column, id_col: str = "vec_id",
                    method: str = "exact", **kw) -> DataFrame:
    """Solr 9 filtered KNN: `{!knn}` with fq / preFilter acting as a PRE-filter
    (reference: solr/core/src/java/org/apache/solr/search/vector/KnnQParser.java:44-53,
    141-192 — filters restrict the candidate set BEFORE the vector search, so
    exactly k ELIGIBLE neighbors come back; post-filtering a fixed top-k can
    starve to fewer than k results, which is why Lucene threads the filter
    into the KNN search itself).

    `prefilter` is any boolean Column over `df`. It is applied before the
    chosen search path:
      * exact — filter -> brute-force cosine top-k. The predicate pushes into
        the parquet scan, so at 100 TB a selective prefilter prunes row
        groups before any vector math runs.
      * lsh / ivf — filter -> bucket/probe pruning -> exact verify. Buckets
        carry only eligible vectors: filter selectivity MULTIPLIES with the
        bucket pruning instead of probe budget being spent on hits the
        filter would discard.
    Extra kwargs flow to the underlying ANN (n_planes/multiprobe for lsh,
    n_centroids/n_probe/centroids for ivf).
    """
    filtered = df.where(prefilter)
    if method == "exact":
        return cosine_topk(filtered, vec_col, query, k, id_col)
    if method == "lsh":
        return lsh_ann_topk(filtered, vec_col, query, k, id_col, **kw)
    if method == "ivf":
        # The coarse quantizer must come from the WHOLE corpus, not the
        # filtered view: a prefilter excluding the low ids would otherwise
        # leave the default seed-centroid set empty (0 neighbors returned)
        # or degraded. Only the candidate set is filtered. train=True trains
        # on the whole corpus for the same reason.
        if kw.get("centroids") is None:
            if kw.pop("train", False):
                kw = {**kw, "centroids": ivf_train(
                    df, vec_col, kw.get("n_centroids", 16), id_col=id_col)}
            else:
                import warnings

                warnings.warn(
                    "knn_prefiltered(method='ivf'): untrained seed quantizer "
                    "— pass train=True or centroids=ivf_train(...) for "
                    "serving", stacklevel=2)
                n_centroids = kw.get("n_centroids", 16)
                kw = {**kw,
                      "centroids": (df.where(F.col(id_col) < n_centroids)
                                      .select(F.col(id_col).alias("cid"),
                                              F.col(vec_col).alias("cvec")))}
        return ivf_ann_topk(filtered, vec_col, query, k, id_col, **kw)
    raise ValueError(f"unknown knn method {method!r}")


def ivf_write(df: DataFrame, vec_col: str, path: str, id_col: str = "vec_id",
              n_centroids: int = 16, centroids: DataFrame | None = None,
              train: bool = False) -> None:
    """Persist the IVF layout the 100-TB ANN story depends on: vectors
    written hive-partitioned by their coarse cluster (`{path}/data/cluster=*`)
    plus the centroid table (`{path}/centroids`). A probe then prunes to
    n_probe PARTITIONS at the file level — the scan never touches the other
    clusters' bytes (plan-audited: PartitionFilters on `cluster`). This is
    the on-disk role Lucene's HNSW graph files play for DenseVectorField,
    reshaped for Spark (data-skipping instead of pointer-chasing).

    train=True fits spherical k-means centroids (ivf_train); otherwise the
    deterministic seed set (or a provided `centroids`) is used.
    """
    if centroids is None:
        centroids = (ivf_train(df, vec_col, n_centroids, id_col=id_col)
                     if train else
                     df.where(F.col(id_col) < n_centroids)
                       .select(F.col(id_col).alias("cid"),
                               F.col(vec_col).alias("cvec")))
    assigned = ivf_assign(df, vec_col, centroids, id_col)
    assigned.write.mode("overwrite").partitionBy("cluster") \
        .parquet(path + "/data")
    centroids.write.mode("overwrite").parquet(path + "/centroids")


def ivf_read_topk(spark, path: str, query: Sequence[float], k: int,
                  n_probe: int = 4, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Query a persisted IVF layout: pick the `n_probe` centroids nearest the
    query driver-side (centroid table is tiny), push `cluster IN (probes)`
    into the partitioned scan (file-level pruning), exact cosine top-k on the
    surviving candidates."""
    cents = spark.read.parquet(path + "/centroids").collect()
    q = np.asarray(list(query), dtype=np.float64)
    scored = sorted(
        ((float(np.dot(q, np.asarray(r["cvec"], dtype=np.float64))
                / (np.linalg.norm(q)
                   * np.linalg.norm(np.asarray(r["cvec"], dtype=np.float64)))),
          -r["cid"]) for r in cents), reverse=True)
    probe = sorted(-c for _, c in scored[:n_probe])
    df = (spark.read.parquet(path + "/data")
          .where(F.col("cluster").isin(probe)))
    return cosine_topk(df, vec_col, query, k, id_col)


def cosine_near_dup_pairs(df: DataFrame, id_col: str, vec_col: str,
                          threshold: float, method: str = "lsh",
                          n_planes: int = 12, seed: int = 7) -> DataFrame:
    """Embedding near-duplicate pairs: (a_id < b_id) with cosine >= threshold.

    method="exact": all-pairs join with a codegen'd cosine — the oracle-exact
    baseline (O(n^2), fine for verification corpora).
    method="lsh": sign-LSH blocking — pairs must share a hyperplane-sign
    bucket before the exact cosine verify. The scale path: candidate count is
    per-bucket quadratic instead of global, and high-cosine pairs collide with
    high probability (every emitted pair is exactly verified, so precision is
    1; bucketing only affects recall, tested against the exact method).
    """
    a = df.select(F.col(id_col).alias("a_id"),
                  F.col(vec_col).cast("array<double>").alias("a_vec"))
    b = df.select(F.col(id_col).alias("b_id"),
                  F.col(vec_col).cast("array<double>").alias("b_vec"))
    if method == "exact":
        pairs = a.crossJoin(b).where(F.col("a_id") < F.col("b_id"))
    elif method == "lsh":
        dim = len(df.select(vec_col).head()[0])
        planes = hyperplanes(dim, n_planes, seed)
        a = a.withColumn("__bkt", lsh_bucket("a_vec", planes))
        b = b.withColumn("__bkt", lsh_bucket("b_vec", planes))
        pairs = a.join(b, "__bkt").where(F.col("a_id") < F.col("b_id"))
    else:
        raise ValueError(f"unknown method {method!r}")
    sim = _dot(F.col("a_vec"), F.col("b_vec")) / (
        _norm(F.col("a_vec")) * _norm(F.col("b_vec")))
    return (pairs.withColumn("cosine", F.round(sim, 6))
                 .where(F.col("cosine") >= threshold)
                 .select("a_id", "b_id", "cosine")
                 .dropDuplicates(["a_id", "b_id"])
                 .orderBy("a_id", "b_id"))


def hard_negative_mine(queries: DataFrame, corpus: DataFrame,
                       positives: DataFrame | None = None,
                       q_id: str = "q_id", q_vec: str = "embedding",
                       c_id: str = "vec_id", c_vec: str = "embedding",
                       k: int = 5, max_sim: float | None = None) -> DataFrame:
    """Hard-negative mining for embedding/retrieval training: for each query
    vector, the top-k most-similar corpus docs EXCLUDING its known positives
    (the DPR / sentence-transformers recipe: train on (query, positive,
    hardest-non-positive) triples).

    `positives` is a (q_id, c_id) pair table anti-joined away BEFORE
    ranking, so a positive never burns a negative slot. `max_sim` trims the
    band's top — similarity above it is treated as an unlabeled
    near-positive (the RocketQA false-negative guard), not a negative.

    Scale shape: the query batch is the BROADCAST side (mining batches are
    bounded; the corpus side streams through one scan), the cosine is pure
    codegen zip_with/aggregate, exclusion is one anti-join on (q, doc), and
    per-query top-k is the salted two-stage rank — a query never funnels
    the corpus through one reducer. For corpus-scale query sets, pre-bucket
    both sides with ivf_assign and mine within clusters (the semantic_dedup
    pairing shape) instead of the exact cross product.
    Output: q_id, c_id, cosine (round 6), rank (1-based per query).
    """
    from solr_spark.operators.windows import salted_top_n

    qs = queries.select(F.col(q_id).alias("__qid"),
                        F.col(q_vec).cast("array<double>").alias("__qv"))
    cs = corpus.select(F.col(c_id).alias("__cid"),
                       F.col(c_vec).cast("array<double>").alias("__cv"))
    sims = (cs.crossJoin(F.broadcast(qs))
            .select("__qid", "__cid",
                    (_dot(F.col("__qv"), F.col("__cv"))
                     / (_norm(F.col("__qv")) * _norm(F.col("__cv"))))
                    .alias("__sim")))
    if positives is not None:
        pos = positives.select(F.col(q_id).alias("__qid"),
                               F.col(c_id).alias("__cid"))
        sims = sims.join(pos, ["__qid", "__cid"], "left_anti")
    if max_sim is not None:
        sims = sims.where(F.col("__sim") <= max_sim)
    top = salted_top_n(sims, "__qid", [F.desc("__sim"), F.asc("__cid")], k,
                       rank_col="rank")
    return top.select(F.col("__qid").alias(q_id), F.col("__cid").alias(c_id),
                      F.round("__sim", 6).alias("cosine"), "rank")
