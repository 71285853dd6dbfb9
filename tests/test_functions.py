"""Tests for text-analysis, dedup, and vector-similarity functions against
pure-Python oracles (the reference's golden-assertion style, SURVEY.md §5)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_spark.functions.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
    minhash_signatures,
    simhash,
    simhash_near_dup_pairs,
)
from solr_spark.functions.textanalysis import text_stats
from solr_spark.functions.vectors import cosine_topk, lsh_ann_topk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (3, "completely different content about spark engines"),
        (4, "dog lazy the over jumps fox brown quick the"),   # shuffled 0
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_exact_dedup(docs):
    out = {r["doc_id"]: r for r in exact_dedup(docs, "doc_id", "text").collect()}
    assert out[0]["canonical_id"] == 0 and out[0]["group_size"] == 2
    assert out[2]["canonical_id"] == 0
    assert out[1]["group_size"] == 1


def test_text_stats_fingerprint_order_insensitive(docs):
    out = {r["doc_id"]: r for r in text_stats(docs, "doc_id", "text").collect()}
    # doc 4 is doc 0 shuffled → same sorted-distinct-token fingerprint
    assert out[0]["fingerprint"] == out[4]["fingerprint"]
    assert out[0]["fingerprint"] != out[1]["fingerprint"]
    assert out[0]["n_tokens"] == 9
    assert out[5]["n_tokens"] == 0 and out[5]["stop_ratio"] == 0.0
    # python oracle for the md5
    toks = sorted(set("the quick brown fox jumps over the lazy dog".split()))
    assert out[0]["fingerprint"] == hashlib.md5(" ".join(toks).encode()).hexdigest()
    # stopword ratio: the×2 / 9 tokens ("over" is not in the 35-word list)
    assert out[0]["stop_ratio"] == round(2 / 9, 4)
    assert out[0]["lang_pred"] == "en" and out[3]["lang_pred"] == "und"


def test_minhash_signature_matches_python_oracle(docs):
    got = {(r["doc_id"], r["seed"]): r["minhash"]
           for r in minhash_signatures(docs, "doc_id", "text", 8).collect()}
    for doc_id, text in [(0, "the quick brown fox jumps over the lazy dog"),
                         (3, "completely different content about spark engines")]:
        toks = set(text.split())
        for seed in range(8):
            want = min(hashlib.md5(f"{seed}:{t}".encode()).hexdigest() for t in toks)
            assert got[(doc_id, seed)] == want
    assert (5, 0) not in got  # empty doc has no tokens → no signature


def test_minhash_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in
             minhash_near_dup_pairs(docs, "doc_id", "text").collect()}
    assert (0, 2) in pairs      # exact dup always collides
    assert (0, 4) in pairs      # shuffled: same token set → same signature
    assert (0, 3) not in pairs  # disjoint content
    verified = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
                minhash_near_dup_pairs(docs, "doc_id", "text",
                                       jaccard_threshold=0.5).collect()}
    assert verified.get((0, 2)) == 1.0
    if (0, 1) in verified:      # 8 shared / 10 union
        assert verified[(0, 1)] == 0.8


def test_simhash_python_oracle(spark, docs):
    out = {r["doc_id"]: r["simhash"] for r in
           simhash(docs, "doc_id", "text").collect()}
    # identical text → identical fingerprint; shuffled → identical (order-free)
    assert out[0] == out[2] == out[4]
    # near-dup differs in few bits, disjoint differs in many
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(out[0], out[1]) <= 16
    assert ham(out[0], out[3]) >= 20
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=16).collect()}
    assert pairs.get((0, 2)) == 0 and pairs.get((0, 4)) == 0


def test_simhash_md5_mode_python_oracle(spark, docs):
    """Portable md5 mode: fingerprints match a pure-Python md5 twin exactly
    (the dd04 oracle contract), and the invariants of the default mode hold."""
    out = {r["doc_id"]: r["simhash"] for r in
           simhash(docs, "doc_id", "text", hash="md5").collect()}

    def twin(text):
        sums = [0] * 60
        for tok in text.split():
            h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
            for j in range(60):
                sums[j] += 1 if (h >> j) & 1 else -1
        return sum(1 << j for j in range(60) if sums[j] > 0)

    for doc_id, text in [(0, "the quick brown fox jumps over the lazy dog"),
                         (3, "completely different content about spark engines")]:
        assert out[doc_id] == twin(text)
    assert out[0] == out[2] == out[4]  # dup + shuffled identical
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown simhash hash"):
        simhash(docs, "doc_id", "text", hash="crc").collect()


def test_cosine_topk_matches_numpy(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((50, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id int, embedding array<float>")
    q = [float(x) for x in vecs[7]]
    for kernel in ("expr", "pandas"):
        got = [(r["vec_id"], r["cosine"]) for r in
               cosine_topk(df, "embedding", q, 5, kernel=kernel).collect()]
        v = vecs.astype(np.float64)
        qq = np.asarray(q)
        sims = v @ qq / (np.linalg.norm(v, axis=1) * np.linalg.norm(qq))
        order = np.argsort(-sims)[:5]
        assert [g[0] for g in got] == order.tolist()
        assert got[0][0] == 7 and got[0][1] == 1.0
        for (_, c), i in zip(got, order):
            assert abs(c - sims[i]) < 1e-5


def test_repetition_stats_and_pii(spark):
    from solr_spark.functions.textanalysis import pii_redact, repetition_stats

    text = "a b a b a b c d"          # bigrams: "a b" x3, "b a" x2, "b c", "c d"
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(repetition_stats(F.col("text"), 2).alias("r")) \
            .collect()[0]["r"]
    total = len(text)
    assert got["top_ngram_char_frac"] == round(3 * 3 / total, 4)
    assert got["dup_ngram_char_frac"] == round((3 * 3 + 2 * 3) / total, 4)
    assert got["dup_token_frac"] == round(1 - 4 / 8, 4)
    # no duplicate grams -> dup mass 0, top = single-gram mass
    got2 = spark.createDataFrame([("x yy zzz",)], "text string") \
        .select(repetition_stats(F.col("text"), 2).alias("r")).collect()[0]["r"]
    assert got2["dup_ngram_char_frac"] == 0.0
    assert got2["top_ngram_char_frac"] == round(len("yy zzz") / len("x yy zzz"), 4)

    red = spark.createDataFrame(
        [("mail bob@example.com ip 10.0.0.1 acct 123456789 ok 123",)],
        "text string").select(pii_redact(F.col("text")).alias("t")) \
        .collect()[0]["t"]
    assert red == "mail <EMAIL> ip <IP> acct <NUM> ok 123"


def test_int8_quantized_cosine(spark):
    from solr_spark.functions.vectors import (
        cosine_topk_int8,
        dequantize,
        quantize_int8,
    )

    rng = np.random.default_rng(23)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id int, embedding array<float>")
    qt = quantize_int8(df, "embedding")
    # codes in range, dequantization error bounded by half a grid step
    row = qt.where(F.col("vec_id") == 0).select(
        "qvec", "scale", dequantize("qvec", "scale").alias("dq")).collect()[0]
    assert all(-127 <= c <= 127 for c in row["qvec"])
    err = np.abs(np.array(row["dq"]) - vecs[0].astype(np.float64))
    assert err.max() <= row["scale"] / 2 + 1e-12

    q = [float(x) for x in vecs[7]]
    exact = [r["vec_id"] for r in cosine_topk(df, "embedding", q, 10).collect()]
    quant = cosine_topk_int8(qt, q, 10).collect()
    got = [r["vec_id"] for r in quant]
    # int8 grid keeps >= 9/10 of the true neighbors and sims within 1%
    assert len(set(exact) & set(got)) >= 9
    assert got[0] == 7 and quant[0]["cosine"] > 0.999
    v = vecs.astype(np.float64)
    qq = np.asarray(q)
    sims = v @ qq / (np.linalg.norm(v, axis=1) * np.linalg.norm(qq))
    for r in quant:
        assert abs(r["cosine"] - sims[r["vec_id"]]) < 0.01


def test_lsh_ann_recall(spark):
    # clustered data (the realistic near-dup/embedding shape): 10 centers,
    # 20 small-noise members each — true neighbors share LSH sign-buckets
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((10, 16))
    vecs = (np.repeat(centers, 20, axis=0)
            + 0.05 * rng.standard_normal((200, 16))).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id int, embedding array<float>")
    q = [float(x) for x in vecs[0]]
    exact = {r["vec_id"] for r in cosine_topk(df, "embedding", q, 5).collect()}
    approx = {r["vec_id"] for r in
              lsh_ann_topk(df, "embedding", q, 5, n_planes=6, multiprobe=3).collect()}
    assert 0 in approx                       # query's own vector always found
    assert len(exact & approx) >= 4          # high recall on clustered data


def test_cosine_near_dup_lsh_subset_of_exact(spark):
    import numpy as np

    from solr_spark.functions.vectors import cosine_near_dup_pairs

    rng = np.random.default_rng(5)
    base = rng.normal(size=(20, 16))
    rows = []
    vid = 0
    for v in base:
        rows.append((vid, [float(x) for x in v])); vid += 1
        # a near-duplicate of each: tiny perturbation
        rows.append((vid, [float(x) for x in v + rng.normal(scale=0.01, size=16)]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {(r.a_id, r.b_id) for r in cosine_near_dup_pairs(
        df, "vec_id", "embedding", 0.99, method="exact").collect()}
    lsh = {(r.a_id, r.b_id) for r in cosine_near_dup_pairs(
        df, "vec_id", "embedding", 0.99, method="lsh", n_planes=8).collect()}
    assert lsh <= exact                      # precision 1: every pair verified
    planted = {(i, i + 1) for i in range(0, 40, 2)}
    assert planted <= exact                  # perturbed twins found exactly
    assert len(lsh & planted) >= len(planted) * 0.8  # high recall on twins


def test_ivf_ann_topk(spark):
    """IVF ANN: probe-pruned candidates, exact verify; recall vs brute force."""
    from pyspark.sql import functions as F

    from solr_spark.functions.vectors import cosine_topk, ivf_ann_topk

    sf_embeddings = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qvec = [float(x) for x in
            sf_embeddings.where(F.col("vec_id") == 0).head()["embedding"]]
    exact = [r.vec_id for r in
             cosine_topk(sf_embeddings, "embedding", qvec, k=10).collect()]
    approx = ivf_ann_topk(sf_embeddings, "embedding", qvec, k=10,
                          n_centroids=16, n_probe=4).collect()
    assert len(approx) == 10
    # the query vector itself is always found (it lives in a probed cluster)
    assert approx[0].vec_id == 0 and approx[0].cosine == 1.0
    got = [r.vec_id for r in approx]
    recall = len(set(got) & set(exact)) / 10
    assert recall >= 0.3, f"IVF recall too low: {recall} ({got} vs {exact})"
    # probing ALL clusters must recover the exact answer
    full = ivf_ann_topk(sf_embeddings, "embedding", qvec, k=10,
                        n_centroids=16, n_probe=16).collect()
    assert [r.vec_id for r in full] == exact


def test_ivf_trained_centroids_recall(spark):
    """Trained quantizer (ivf_train spherical k-means) holds recall@10 >= 0.9
    on EVERY query of a corpus where the untrained seed default demonstrably
    fails some queries: ids are cluster-major and cluster 0 is angularly
    TIGHT, so the 16 seed centroids (vec_id < 16) are near-parallel
    directions — members of the WIDE query cones then split pseudo-randomly
    across the degenerate Voronoi slivers and a 4-probe misses most of the
    true neighborhood on unlucky queries. (Tight query clusters would assign
    coherently under ANY quantizer, which is why the corpus uses wide cones.)
    """
    from solr_spark.functions.vectors import cosine_topk, ivf_ann_topk, ivf_train

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 16))
    centers = 1.5 * (centers / np.linalg.norm(centers, axis=1, keepdims=True))
    rows, vid = [], 0
    for c in range(8):
        sigma = 0.02 if c == 0 else 0.375  # seeds tight, query cones wide
        for _ in range(40):
            v = centers[c] + sigma * rng.standard_normal(16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").cache()

    cents = ivf_train(df, "embedding", n_centroids=16, iters=5)
    trained_r, seeded_r = [], []
    for qid in [200, 205, 210, 215, 220, 45, 90, 130, 285, 310]:
        q = rows[qid][1]
        exact = [r.vec_id for r in
                 cosine_topk(df, "embedding", q, 10).collect()]
        tr = [r.vec_id for r in
              ivf_ann_topk(df, "embedding", q, 10, n_probe=4,
                           centroids=cents).collect()]
        sd = [r.vec_id for r in
              ivf_ann_topk(df, "embedding", q, 10,
                           n_centroids=16, n_probe=4).collect()]
        trained_r.append(len(set(tr) & set(exact)) / 10)
        seeded_r.append(len(set(sd) & set(exact)) / 10)
    assert min(trained_r) >= 0.9, f"trained recall@10 {trained_r}"
    assert min(seeded_r) <= 0.5, (
        f"seed centroids were supposed to fail some queries: {seeded_r}")
    assert (sum(trained_r) / len(trained_r)
            > sum(seeded_r) / len(seeded_r)), (trained_r, seeded_r)
    # training is deterministic: same seed -> same centroids
    again = ivf_train(df, "embedding", n_centroids=16, iters=5)
    assert sorted(map(tuple, cents.collect())) == \
        sorted(map(tuple, again.collect()))


def test_rrf_fuse(spark):
    """RRF semantics: 1/(k0+rank) summed across lists, missing entries
    contribute 0, ties broken by id."""
    from solr_spark.query.hybrid import rrf_fuse

    a = spark.createDataFrame([(1, 9.0), (2, 5.0), (3, 1.0)], "id long, s double")
    b = spark.createDataFrame([(2, 0.9), (4, 0.8)], "id long, c double")
    out = rrf_fuse([(a, "id", "s"), (b, "id", "c")], k0=60, k=10).collect()
    got = {r["doc_id"]: round(r["rrf_score"], 9) for r in out}
    assert got == {
        1: round(1 / 61, 9),
        2: round(1 / 62 + 1 / 61, 9),
        3: round(1 / 63, 9),
        4: round(1 / 62, 9),
    }
    assert [r["doc_id"] for r in out] == [2, 1, 4, 3]  # 1/61 > 1/62: id tie-break
    assert [r["rank"] for r in out] == [1, 2, 3, 4]


def test_deterministic_split_and_sample(spark):
    import hashlib

    from pyspark.sql import functions as F

    from solr_spark.functions.sampling import (deterministic_sample,
                                               deterministic_split)

    df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    out = deterministic_split(df, F.col("id"),
                              {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = {r["id"]: r["split"] for r in out.collect()}
    # python twin: identical assignment
    for i in (0, 1, 7, 42, 1999):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 2**32
        want = "train" if u < 0.8 else ("val" if u < 0.9 else "test")
        assert rows[i] == want, i
    # fractions land near target and are rerun-stable
    from collections import Counter
    c = Counter(rows.values())
    assert 0.75 < c["train"] / 2000 < 0.85
    rows2 = {r["id"]: r["split"] for r in
             deterministic_split(df.repartition(7), F.col("id"),
                                 {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert rows2 == rows
    # nested supersets: 5% sample within the 10% sample
    s5 = {r["id"] for r in deterministic_sample(df, F.col("id"), 0.05).collect()}
    s10 = {r["id"] for r in deterministic_sample(df, F.col("id"), 0.10).collect()}
    assert s5 <= s10 and len(s10) > len(s5) > 0

    import pytest as _pt
    with _pt.raises(ValueError):
        deterministic_split(df, F.col("id"), {"a": 0.5, "b": 0.4})


def test_terms_facet_bucket_options(spark):
    """JSON-facet bucket options: sort-by-nested-stat, allBuckets, numBuckets,
    missing bucket; numeric bucket order for range_facet_other is covered
    below. NULL field values never form a bucket (Solr semantics)."""
    from solr_spark.operators.facets import metric, terms_facet

    rows = [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 2.0), ("c", 5.0),
            (None, 100.0), (None, 50.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = terms_facet(df, "k", limit=2, metrics=[metric("avg", "v")],
                      sort="avg_v desc", all_buckets=True, num_buckets=True,
                      missing=True).collect()
    by = {r["bucket"]: r for r in out}
    # sort by avg desc: b (6.0), c (5.0); a (2.0) cut by limit=2
    assert [r["bucket"] for r in out[:2]] == ["b", "c"]
    assert by["b"]["avg_v"] == 6.0 and by["b"]["count"] == 2
    # allBuckets: all non-null rows regardless of limit
    assert by["__all__"]["count"] == 5 and by["__all__"]["avg_v"] == 4.2
    # missing: the NULL-field docs
    assert by["__missing__"]["count"] == 2 and by["__missing__"]["avg_v"] == 75.0
    # numBuckets: distinct buckets pre-limit, metrics NULL
    assert by["__numBuckets__"]["count"] == 3
    assert by["__numBuckets__"]["avg_v"] is None
    # index sort + no options: legacy schema (native bucket type, no extras)
    plain = terms_facet(df, "k", limit=10, sort="index asc").collect()
    assert [r["bucket"] for r in plain] == ["a", "b", "c"]


def test_interval_facet(spark):
    """facet.interval: overlapping intervals, Solr bracket syntax, one pass."""
    import pytest as _pytest

    from solr_spark.operators.facets import interval_facet

    df = spark.createDataFrame([(float(v),) for v in
                                [0, 1, 2, 5, 5, 7, 10]], "v double")
    got = {r["interval"]: r["count"] for r in interval_facet(df, "v", {
        "lo": "[*,5)", "mid": "[2,7]", "hi": "(5,*]",
        "excl": "(2,5)", "all": "[*,*]",
    }).collect()}
    assert got == {"lo": 3, "mid": 4, "hi": 2, "excl": 0, "all": 7}
    with _pytest.raises(ValueError, match="bad interval"):
        interval_facet(df, "v", {"x": "5..10"})


def test_range_facet_other(spark):
    from solr_spark.operators.facets import range_facet_other

    df = spark.createDataFrame([(float(v),) for v in
                                [-3, 1, 5, 6, 11, 19, 20, 25]], "v double")
    got = {r["bucket"]: r["count"]
           for r in range_facet_other(df, "v", 5.0, 20.0, 5.0).collect()}
    assert got == {"5.0": 2, "10.0": 1, "15.0": 1,
                   "before": 2, "after": 2, "between": 4}


def test_minhash_query(spark, docs):
    """{!minhash} parser: identical text estimates sim 1.0; shuffled token
    order too (order-free token sets); disjoint content never surfaces."""
    from solr_spark.functions.dedup import minhash_query

    q = "the quick brown fox jumps over the lazy dog"  # == doc 0 and dup 2
    got = {r["doc_id"]: r["sim"] for r in
           minhash_query(docs, "doc_id", "text", q, num_hashes=16,
                         k=10).collect()}
    assert got[0] == 1.0 and got[2] == 1.0
    assert got[4] == 1.0            # shuffled word order, same token set
    assert 3 not in got             # disjoint content
    top = minhash_query(docs, "doc_id", "text", q, num_hashes=16,
                        k=2).collect()
    assert [r["doc_id"] for r in top] == [0, 2]  # sim desc, id asc
    assert minhash_query(docs, "doc_id", "text", "  ", k=5).collect() == []


def test_facet_2d(spark):
    """facet2D: top-X outer by total, top-Y inner per outer, exact counts."""
    from solr_spark.operators.facets import facet_2d

    rows = ([("a", "p")] * 5 + [("a", "q")] * 3 + [("a", "r")] * 1
            + [("b", "p")] * 4 + [("b", "q")] * 2
            + [("c", "p")] * 1)
    df = spark.createDataFrame(rows, "x string, y string")
    out = facet_2d(df, "x", "y", limit_x=2, limit_y=2).collect()
    got = [(r["x"], r["y"], r["count"]) for r in out]
    # outer cut: a (9), b (6); c dropped. inner cut per outer: top-2 by count
    assert got == [("a", "p", 5), ("a", "q", 3), ("b", "p", 4), ("b", "q", 2)]


def test_terms_facet_prefix_contains(spark):
    """facet.prefix / facet.contains restrict the bucket domain pre-count."""
    from solr_spark.operators.facets import terms_facet

    rows = [("apple",), ("apricot",), ("apricot",), ("banana",), ("grape",)]
    df = spark.createDataFrame(rows, "k string")
    got = {r["bucket"]: r["count"] for r in
           terms_facet(df, "k", limit=10, prefix="ap").collect()}
    assert got == {"apple": 1, "apricot": 2}
    got2 = {r["bucket"]: r["count"] for r in
            terms_facet(df, "k", limit=10, contains="ap").collect()}
    assert got2 == {"apple": 1, "apricot": 2, "grape": 1}
    # option rows respect the restricted domain
    out = {r["bucket"]: r["count"] for r in
           terms_facet(df, "k", limit=1, prefix="ap", all_buckets=True,
                       num_buckets=True).collect()}
    assert out["__all__"] == 3 and out["__numBuckets__"] == 2


def _tps_oracle(text: str, quant_rate: float = 0.01, min_len: int = 2) -> str:
    """Pure-Python TextProfileSignature oracle, written from the reference
    behavior spec (update/processor/TextProfileSignature.java:51-134) with the
    repo's documented deterministic tie-break (count desc, token asc)."""
    import math
    from collections import Counter

    runs = "".join(ch if ch.isalnum() else " " for ch in text.lower()).split()
    toks = [t for t in runs if len(t) > min_len]
    c = Counter(toks)
    if not c:
        profile = ""
    else:
        maxf = max(c.values())
        quant = math.floor(maxf * quant_rate + 0.5)
        if quant < 2:
            quant = 2 if maxf > 1 else 1
        items = [(t, (n // quant) * quant) for t, n in c.items()]
        items = [(t, n) for t, n in items if n >= quant]
        items.sort(key=lambda x: (-x[1], x[0]))
        profile = "\n".join(f"{t} {n}" for t, n in items)
    return hashlib.md5(profile.encode()).hexdigest()


def test_text_profile_signature_python_oracle(spark):
    from solr_spark.functions.dedup import text_profile_signature

    rows = [
        (0, "Alpha alpha ALPHA, beta beta; gamma!"),   # quant=2, gamma dropped
        (1, "alpha alpha alpha beta beta delta"),      # same profile as 0
        (2, "one two two three three three"),          # 'one' len 3 kept, freq 1
        (3, "a an to be it — of in on"),               # all tokens len<=2 -> empty
        (4, ""),
        (5, "x1y z2w x1y ... x1y?? z2w"),              # digits inside tokens
        (6, "word " * 250),                            # maxFreq 250 -> quant 3
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r["sig"] for r in
           df.select("doc_id",
                     text_profile_signature("text").alias("sig")).collect()}
    for i, text in rows:
        assert got[i] == _tps_oracle(text), (i, text)
    assert got[0] == got[1]          # rare-token difference is invisible
    assert got[3] == got[4]          # both empty profiles
    assert got[0] != got[2]


def test_signature_dedup_and_drop(spark):
    from solr_spark.functions.dedup import (
        drop_signature_duplicates,
        signature_dedup,
    )

    rows = [
        (0, "alpha alpha alpha beta beta gamma", "s0"),
        (1, "alpha alpha alpha beta beta delta", "s1"),  # TPS-dup of 0
        (2, "totally different words here today", "s2"),
        (3, "alpha alpha alpha beta beta gamma", "s3"),  # exact dup of 0
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, src string")
    tps = {r["doc_id"]: r for r in
           signature_dedup(df, "doc_id", "text").collect()}
    assert tps[0]["canonical_id"] == 0 and tps[0]["group_size"] == 3
    assert tps[1]["canonical_id"] == 0 and tps[3]["canonical_id"] == 0
    assert tps[2]["group_size"] == 1
    # md5 method only collapses the byte-exact pair
    md5g = {r["doc_id"]: r for r in
            signature_dedup(df, "doc_id", "text", method="md5").collect()}
    assert md5g[0]["group_size"] == 2 and md5g[1]["group_size"] == 1
    # URP drop: one survivor per signature, original columns intact
    kept = drop_signature_duplicates(df, "doc_id", "text")
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 2]
    assert kept.columns == ["doc_id", "text", "src"]


def test_knn_prefiltered(spark):
    from solr_spark.functions.vectors import knn_prefiltered

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((60, 8))
    rows = [(i, [float(x) for x in vecs[i]], int(i % 3)) for i in range(60)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    q = [float(x) for x in vecs[0]]
    pred = F.col("label") == 1
    got = knn_prefiltered(df, "embedding", q, k=5, prefilter=pred).collect()
    # identical to brute-force over the manually filtered frame
    want = cosine_topk(df.where(pred), "embedding", q, 5).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == \
           [(r["vec_id"], r["cosine"]) for r in want]
    assert all(r["vec_id"] % 3 == 1 for r in got) and len(got) == 5
    # ANN paths: eligible-only candidates, scores exact on what they return
    for method, kw in (("lsh", {"n_planes": 4, "multiprobe": 2}),
                       ("ivf", {"n_centroids": 4, "n_probe": 3})):
        ann = knn_prefiltered(df, "embedding", q, k=5, prefilter=pred,
                              method=method, **kw).collect()
        assert all(r["vec_id"] % 3 == 1 for r in ann), method
        exact = {r["vec_id"]: r["cosine"] for r in want}
        hits = [r for r in ann if r["vec_id"] in exact]
        assert all(abs(exact[r["vec_id"]] - r["cosine"]) < 1e-9 for r in hits)


def test_soundex_census_vectors(spark):
    """Published US-census Soundex vectors, incl. the H/W-transparency rule
    and H/W-first-letter handling."""
    from solr_spark.functions.textanalysis import soundex_code, soundex_sql
    import duckdb

    vectors = {
        "Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
        "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
        "Jackson": "J250", "Honeyman": "H555", "Wright": "W623",
        "Whitney": "W350", "Gutierrez": "G362", "o'Brien": "O165",
        "a": "A000", "": "", "123": "",
    }
    df = spark.createDataFrame([(k,) for k in vectors], "name string")
    got = {r["name"]: r["c"] for r in
           df.select("name", soundex_code("name").alias("c")).collect()}
    assert got == vectors
    # the DuckDB twin emits byte-identical codes
    for name, want in vectors.items():
        lit = "'" + name.replace("'", "''") + "'"
        tw = duckdb.sql(f"SELECT {soundex_sql(lit)}").fetchone()[0]
        assert tw == want, (name, tw, want)


def test_phonetic_matches(spark):
    from solr_spark.functions.textanalysis import phonetic_matches

    df = spark.createDataFrame(
        [(0, "scan skim join merge jane"), (1, "scam gem chain shine")],
        "doc_id int, text string")
    # skan -> S500 (first-letter S collapses with same-code k); shine is
    # S500 too via the census H-transparency rule
    got = [r["token"] for r in phonetic_matches(df, "text", "skan").collect()]
    assert got == ["scam", "scan", "shine", "skim"]
    got2 = [r["token"] for r in phonetic_matches(df, "text", "joyn").collect()]
    assert got2 == ["jane", "join"]          # J500; gem is G500, chain C500


def test_decontaminate(spark):
    from solr_spark.functions.dedup import decontaminate

    train = spark.createDataFrame([
        (0, "a b c d e f"),            # contains bench gram "b c d"+"c d e"
        (1, "x y z w q r"),            # clean
        (2, "c d e zz ww"),            # one hit: "c d e"
        (3, "sh ort"),                 # short doc, no match
    ], "doc_id int, text string")
    bench = spark.createDataFrame([(100, "b c d e")],
                                  "doc_id int, text string")
    got = {r["doc_id"]: r["n_hits"] for r in
           decontaminate(train, bench, "doc_id", "text", n=3).collect()}
    assert got == {0: 2, 2: 1}


def test_stratified_quota_sample(spark):
    from solr_spark.functions.sampling import (
        split_fraction_col,
        stratified_quota_sample,
    )

    rows = [(i, "en" if i % 2 == 0 else "fr") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id int, lang string")
    out5 = stratified_quota_sample(df, "doc_id", ["lang"], 5)
    got = out5.groupBy("lang").count().collect()
    assert {r["lang"]: r["count"] for r in got} == {"en": 5, "fr": 5}
    # nests: quota 10 contains quota 5
    ids5 = {r["doc_id"] for r in out5.collect()}
    ids10 = {r["doc_id"] for r in
             stratified_quota_sample(df, "doc_id", ["lang"], 10).collect()}
    assert ids5 <= ids10
    # per-stratum dict quotas, including dropping a stratum
    d = stratified_quota_sample(df, "doc_id", ["lang"], {("en",): 3})
    assert d.count() == 3 and all(r["lang"] == "en" for r in d.collect())
    # python oracle: the quota keeps the md5-smallest keys
    import hashlib
    u = {i: int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 2**32
         for i, _ in rows}
    want_en = set(sorted((i for i, l in rows if l == "en"),
                         key=lambda i: u[i])[:5])
    assert {r["doc_id"] for r in out5.where("lang = 'en'").collect()} == want_en


def test_token_budget_packs(spark):
    from solr_spark.functions.sampling import token_budget_packs

    rows = [(i, "s%d" % (i % 2), "w " * (i + 1)) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id int, source string, text string")
    got = {(r["source"], r["doc_id"]): (r["n_tokens"], r["pack_id"]) for r in
           token_budget_packs(df, "doc_id", "text", budget=6,
                              shard_col="source").collect()}
    # shard s0: docs 0,2,4,6 with 1,3,5,7 tokens; before = 0,1,4,9
    assert got[("s0", 0)] == (1, 0) and got[("s0", 2)] == (3, 0)
    assert got[("s0", 4)] == (5, 0) and got[("s0", 6)] == (7, 1)
    # shard s1: docs 1,3,5,7 with 2,4,6,8 tokens; before = 0,2,6,12
    assert got[("s1", 1)] == (2, 0) and got[("s1", 3)] == (4, 0)
    assert got[("s1", 5)] == (6, 1) and got[("s1", 7)] == (8, 2)
    # global (unsharded) variant: one running count in id order
    g = {r["doc_id"]: r["pack_id"] for r in
         token_budget_packs(df, "doc_id", "text", budget=10).collect()}
    # before = 0,1,3,6,10,15,21,28 -> packs 0,0,0,0,1,1,2,2
    assert [g[i] for i in range(8)] == [0, 0, 0, 0, 1, 1, 2, 2]


def test_knn_prefiltered_ivf_filter_excludes_seed_ids(spark):
    """Regression: the IVF coarse quantizer seeds from the WHOLE corpus, so a
    prefilter excluding every id < n_centroids still returns k neighbors."""
    from solr_spark.functions.vectors import knn_prefiltered

    rng = np.random.default_rng(17)
    vecs = rng.standard_normal((80, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(80)],
        "vec_id long, embedding array<double>")
    q = [float(x) for x in vecs[50]]
    got = knn_prefiltered(df, "embedding", q, k=5,
                          prefilter=F.col("vec_id") >= 40, method="ivf",
                          n_centroids=16, n_probe=16).collect()
    assert len(got) == 5 and all(r["vec_id"] >= 40 for r in got)
    assert got[0]["vec_id"] == 50  # probe-all recovers the exact best


def test_decontaminate_ignores_empty_docs(spark):
    from solr_spark.functions.dedup import decontaminate

    train = spark.createDataFrame([(0, ""), (1, "  "), (2, "real b c d text")],
                                  "doc_id int, text string")
    bench = spark.createDataFrame([(9, ""), (10, "b c d")],
                                  "doc_id int, text string")
    got = {r["doc_id"]: r["n_hits"] for r in
           decontaminate(train, bench, "doc_id", "text", n=3).collect()}
    assert got == {2: 1}  # empty docs never flag


def test_stratified_quota_validation(spark):
    from solr_spark.functions.sampling import stratified_quota_sample

    df = spark.createDataFrame([(1, "en", "web")],
                               "doc_id int, lang string, source string")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="must name all strata"):
        stratified_quota_sample(df, "doc_id", ["lang", "source"],
                                {("en",): 5}).collect()
    with _pytest.raises(ValueError, match="must not be empty"):
        stratified_quota_sample(df, "doc_id", ["lang"], {})


def test_ivf_persisted_layout(spark, tmp_path):
    """ivf_write/ivf_read_topk: probe-all equals exact cosine top-k; a narrow
    probe returns eligible-cluster hits with exact scores; the data lands
    hive-partitioned by cluster (the file-level pruning layout)."""
    import os

    from solr_spark.functions.vectors import ivf_read_topk, ivf_write

    rng = np.random.default_rng(31)
    vecs = rng.standard_normal((120, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(120)],
        "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf")
    ivf_write(df, "embedding", path, n_centroids=8)
    assert any(d.startswith("cluster=")
               for d in os.listdir(path + "/data"))
    q = [float(x) for x in vecs[9]]
    exact = cosine_topk(df, "embedding", q, 10).collect()
    got_all = ivf_read_topk(spark, path, q, k=10, n_probe=8).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got_all] == \
           [(r["vec_id"], r["cosine"]) for r in exact]
    got_2 = ivf_read_topk(spark, path, q, k=10, n_probe=2).collect()
    assert got_2 and got_2[0]["vec_id"] == 9  # own cluster is probed first
    ex = {r["vec_id"]: r["cosine"] for r in exact}
    assert all(abs(ex[r["vec_id"]] - r["cosine"]) < 1e-9
               for r in got_2 if r["vec_id"] in ex)


def _uf_oracle(edges):
    """Pure-Python union-find ground truth for connected components."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_connected_components_chain_and_islands(spark):
    """Alternating-star CC: a long chain (worst diameter), two islands, and a
    clique all resolve to min-id components."""
    from solr_spark.operators.graph import connected_components

    edges = ([(i, i + 1) for i in range(1, 12)]          # chain 1..12
             + [(20, 21), (21, 22), (20, 22)]             # clique island
             + [(30, 31)])                                # pair island
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["id"]: r["component_id"]
           for r in connected_components(df, "a", "b").collect()}
    assert got == _uf_oracle(edges)
    assert got[12] == 1 and got[22] == 20 and got[31] == 30


def test_connected_components_randomized_vs_union_find(spark):
    """Seeded random graphs (including duplicate + reversed + self edges)
    match the union-find oracle exactly."""
    import random

    from solr_spark.operators.graph import connected_components

    rng = random.Random(17)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(90)]
    df = spark.createDataFrame(edges + [(e[1], e[0]) for e in edges[:10]],
                               "a long, b long")
    got = {r["id"]: r["component_id"]
           for r in connected_components(df, "a", "b").collect()}
    assert got == _uf_oracle(e for e in edges if e[0] != e[1])


def test_near_dup_cluster_survivors(spark):
    """drop_near_duplicates keeps exactly the min id per pair-graph component
    plus all unpaired docs; works on string ids."""
    from solr_spark.functions import drop_near_duplicates, near_dup_clusters

    docs = spark.createDataFrame(
        [(f"d{i}", f"text {i}") for i in range(8)], "doc_id string, text string")
    pairs = spark.createDataFrame(
        [("d0", "d1"), ("d1", "d2"), ("d4", "d5")], "id_a string, id_b string")
    comp = {r["id"]: r["component_id"]
            for r in near_dup_clusters(pairs).collect()}
    assert comp == {"d0": "d0", "d1": "d0", "d2": "d0", "d4": "d4", "d5": "d4"}
    kept = sorted(r["doc_id"]
                  for r in drop_near_duplicates(docs, "doc_id", pairs).collect())
    assert kept == ["d0", "d3", "d4", "d6", "d7"]


def test_bigram_lm_score(spark):
    """Hand-computed interpolated bigram LM on a tiny corpus + edge cases."""
    import math

    from solr_spark.functions.lm import bigram_lm_score

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "c"), (4, "")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           bigram_lm_score(docs, "doc_id", "text").collect()}

    # corpus counts: unigrams a:3 b:3 c:1 (N=7, V=3); bigrams ab:3 ba:1
    n, v = 7, 3

    def p(c_vw, c_v, c_w):
        return (c_vw + (c_w + 1) / (n + v)) / (c_v + 1.0)

    # doc 1: bigrams ab, ba, ab -> tf: ab=2, ba=1; engine arithmetic is
    # per-distinct-bigram quantize at 6dp then exact sum
    qsum = round(2 * math.log(p(3, 3, 3)), 6) + round(math.log(p(1, 3, 3)), 6)
    ce = -qsum / 3
    assert out[1]["n_bigrams"] == 3
    assert abs(out[1]["cross_entropy"] - round(ce, 4)) < 1e-9
    assert abs(out[1]["perplexity"] - round(math.exp(round(ce, 4)), 4)) < 1e-9
    # doc 2 is a sub-sequence of doc 1 -> lower or equal entropy than doc 3
    assert out[2]["n_bigrams"] == 1
    # docs with < 2 tokens: present, NULL scores
    for d in (3, 4):
        assert out[d]["n_bigrams"] == 0
        assert out[d]["cross_entropy"] is None
        assert out[d]["perplexity"] is None
    # a rarer sequence scores strictly higher perplexity than a common one
    docs2 = spark.createDataFrame(
        [(10, "x y"), (11, "q z")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [(0, "x y x y x y z q")], ["doc_id", "text"])
    r = {row["doc_id"]: row for row in
         bigram_lm_score(docs2, "doc_id", "text", corpus=corpus).collect()}
    assert r[10]["perplexity"] < r[11]["perplexity"]


def test_semantic_dedup(spark):
    """SemDeDup: trained-quantizer pairs match the exact all-pairs baseline
    on a separable corpus; survivor selection keeps min id + singletons."""
    import random

    from solr_spark.functions.dedup import (semantic_dedup,
                                            semantic_dedup_pairs)
    from solr_spark.functions.vectors import cosine_near_dup_pairs

    rng = random.Random(11)
    dim = 8

    def jitter(base, eps):
        return [x + rng.uniform(-eps, eps) for x in base]

    base_a = [1.0] + [0.0] * (dim - 1)
    base_b = [0.0] * (dim - 1) + [1.0]
    rows = []
    # two tight duplicate groups (ids 0-3 near base_a, 10-13 near base_b)
    for i in range(4):
        rows.append((i, jitter(base_a, 0.01)))
        rows.append((10 + i, jitter(base_b, 0.01)))
    # isolated points far from both groups
    rows.append((20, [0.7] * dim))
    rows.append((21, [1.0, -1.0] * (dim // 2)))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    exact = {(r["a_id"], r["b_id"]) for r in
             cosine_near_dup_pairs(df, "vec_id", "embedding", 0.999,
                                   method="exact").collect()}
    got = {(r["a_id"], r["b_id"]) for r in
           semantic_dedup_pairs(df, "vec_id", "embedding", 0.999,
                                n_centroids=3, train=True).collect()}
    # the two dup groups are cluster-separable, so trained SemDeDup recovers
    # every exact pair (blocking affects recall only; precision is exact)
    assert got == exact
    assert {(0, 1), (0, 2), (10, 11)} <= got
    assert all(a < 10 and b < 10 or a >= 10 and b >= 10 for a, b in got)

    kept = sorted(r["vec_id"] for r in
                  semantic_dedup(df, "vec_id", "embedding", 0.999,
                                 n_centroids=3, train=True).collect())
    assert kept == [0, 10, 20, 21]


def test_temperature_mixture_sample(spark):
    """alpha=0.5 up-samples tail domains vs natural share; alpha=1 keeps
    them; quotas never exceed domain size; sample is md5-stable."""
    from solr_spark.functions.sampling import temperature_mixture_sample

    rows = ([(f"a{i}", "big") for i in range(90)]
            + [(f"b{i}", "small") for i in range(10)])
    df = spark.createDataFrame(rows, "doc_id string, dom string")

    got = temperature_mixture_sample(df, "doc_id", "dom", budget=20,
                                     alpha=0.5).collect()
    by = {}
    for r in got:
        by[r["dom"]] = by.get(r["dom"], 0) + 1
    # sqrt weights: 90->94868, 10->31623; quotas floor(20*w/126491) = 14, 5
    assert by == {"big": 14, "small": 5}

    nat = temperature_mixture_sample(df, "doc_id", "dom", budget=20,
                                     alpha=1.0).collect()
    byn = {}
    for r in nat:
        byn[r["dom"]] = byn.get(r["dom"], 0) + 1
    assert byn == {"big": 18, "small": 2}  # natural proportions

    # budget larger than the corpus: quotas cap at domain size
    allq = temperature_mixture_sample(df, "doc_id", "dom", budget=1000,
                                      alpha=0.5).count()
    assert allq == 100

    # deterministic: same members on rerun
    again = {r["doc_id"] for r in
             temperature_mixture_sample(df, "doc_id", "dom", budget=20,
                                        alpha=0.5).collect()}
    assert again == {r["doc_id"] for r in got}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="budget"):
        temperature_mixture_sample(df, "doc_id", "dom", budget=0)
    with _pytest.raises(ValueError, match="alpha"):
        temperature_mixture_sample(df, "doc_id", "dom", budget=5, alpha=-1)


def test_chunk_token_windows(spark):
    """Window/stride chunk math: counts, boundaries, overlap, tail, and
    the no-token-dropped invariant; empty docs vanish."""
    from solr_spark.functions.sampling import chunk_token_windows

    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, text), (2, "one two"), (3, ""), (4, "   "), (5, "solo")],
        "doc_id int, text string")

    got = (chunk_token_windows(df, "doc_id", "text", window=4, stride=3)
           .orderBy("doc_id", "chunk_idx").collect())
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)

    # doc 1: n=10, n_chunks = 1 + ceil(6/3) = 3 -> starts 0,3,6 (covers all)
    c1 = by_doc[1]
    assert [r["chunk_text"] for r in c1] == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"]
    assert [r["chunk_tokens"] for r in c1] == [4, 4, 4]
    # every token appears in some chunk
    seen = set()
    for r in c1:
        seen.update(r["chunk_text"].split(" "))
    assert seen == {f"t{i}" for i in range(10)}

    assert [r["chunk_text"] for r in by_doc[2]] == ["one two"]  # short doc
    assert 3 not in by_doc and 4 not in by_doc  # empty docs yield nothing
    assert [r["chunk_tokens"] for r in by_doc[5]] == [1]

    # tiling (stride == window): disjoint cover with a short tail
    tiled = (chunk_token_windows(df.where("doc_id = 1"), "doc_id", "text",
                                 window=4).orderBy("chunk_idx").collect())
    assert [r["chunk_text"] for r in tiled] == [
        "t0 t1 t2 t3", "t4 t5 t6 t7", "t8 t9"]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="window"):
        chunk_token_windows(df, "doc_id", "text", window=0)
    with _pytest.raises(ValueError, match="stride"):
        chunk_token_windows(df, "doc_id", "text", window=4, stride=0)


def test_hashed_ngram_buckets_counts(spark):
    from solr_spark.functions.sampling import hashed_ngram_buckets

    df = spark.createDataFrame([(1, "a b a"), (2, ""), (3, "solo")],
                               "id long, text string")
    rows = hashed_ngram_buckets(df, "id", "text", n_buckets=1000).collect()
    per_doc = {}
    for r in rows:
        per_doc[r["id"]] = per_doc.get(r["id"], 0) + r["cnt"]
    # doc 1: unigrams a,b,a + bigrams 'a b','b a' = 5; doc 2: none;
    # doc 3: one unigram, no bigram
    assert per_doc == {1: 5, 3: 1}


def test_dsir_select_prefers_target_like_docs(spark):
    from solr_spark.functions.sampling import dsir_log_weights, dsir_select

    raw = spark.createDataFrame(
        [(i, "le chat noir dort") for i in range(5)]
        + [(i, "the quick brown fox") for i in range(5, 10)],
        "id long, text string")
    target = spark.createDataFrame(
        [(100, "le chat blanc"), (101, "le chien noir")],
        "id long, text string")
    top = dsir_select(raw, target, "id", "text", k=5,
                      n_buckets=2048).collect()
    assert {r["id"] for r in top} == set(range(5))

    # weights are identical for identical texts, deterministic across runs
    w = {r["id"]: float(r["log_weight"])
         for r in dsir_log_weights(raw, target, "id", "text",
                                   n_buckets=2048).collect()}
    assert len({round(w[i], 9) for i in range(5)}) == 1
    assert len({round(w[i], 9) for i in range(5, 10)}) == 1
    assert w[0] > w[5]

    # gumbel top-k is deterministic (md5 noise) and still weight-biased
    g1 = [r["id"] for r in dsir_select(raw, target, "id", "text", k=5,
                                       n_buckets=2048,
                                       gumbel=True).collect()]
    g2 = [r["id"] for r in dsir_select(raw, target, "id", "text", k=5,
                                       n_buckets=2048,
                                       gumbel=True).collect()]
    assert g1 == g2
    assert len(set(g1) & set(range(5))) >= 3


def test_bloom_decontaminate_superset_of_exact(spark):
    from solr_spark.functions.dedup import bloom_decontaminate, decontaminate

    train = spark.createDataFrame(
        [(i, f"w{i} " * 3 + "shared benchmark phrase here") for i in range(6)]
        + [(i, f"unique text {i} nothing else") for i in range(6, 12)],
        "id long, text string")
    bench = spark.createDataFrame(
        [(0, "shared benchmark phrase here")], "id long, text string")
    exact = {r["id"]: r["n_hits"]
             for r in decontaminate(train, bench, "id", "text", n=4).collect()}
    bloom = {r["id"]: r["n_hits"]
             for r in bloom_decontaminate(train, bench, "id", "text", n=4,
                                          m_bits=1 << 16,
                                          k_hashes=3).collect()}
    # one-sided error: every exact flag survives with at least as many hits
    assert set(exact) <= set(bloom)
    for i, h in exact.items():
        assert bloom[i] >= h
    assert set(exact) == set(range(6))

    # a tiny, saturated filter still never MISSES a true overlap
    tiny = {r["id"] for r in
            bloom_decontaminate(train, bench, "id", "text", n=4,
                                m_bits=64, k_hashes=2).collect()}
    assert set(exact) <= tiny


def test_cluster_balanced_sample(spark):
    """D4-style diversify: per-cluster temperature quotas over discovered
    (here: pinned) embedding clusters."""
    import math

    from solr_spark.functions.sampling import cluster_balanced_sample

    # two tight clusters of very different size: 40 docs near +x, 10 near +y
    rows = [(i, [1.0, 0.01 * (i % 5)]) for i in range(40)]
    rows += [(100 + i, [0.01 * (i % 3), 1.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, v array<float>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid int, cvec array<float>")
    out = cluster_balanced_sample(df, "v", budget=20, centroids=cents,
                                  alpha=0.5, id_col="vec_id")
    got = out.groupBy("cluster").count().collect()
    by_c = {r["cluster"]: r["count"] for r in got}
    # quotas ~ sqrt(n): w0=sqrt(40), w1=sqrt(10) -> q0 = 20*w0/(w0+w1) = 13,
    # q1 = 6 (floor division under-allocates at most 1 per cluster)
    w0, w1 = math.sqrt(40), math.sqrt(10)
    assert by_c[0] == int(20 * math.floor(w0 * 10000 + 0.5)
                          // (math.floor(w0 * 10000 + 0.5)
                              + math.floor(w1 * 10000 + 0.5)))
    assert by_c[1] == 6
    # deterministic under reruns
    again = cluster_balanced_sample(df, "v", budget=20, centroids=cents,
                                    alpha=0.5, id_col="vec_id")
    assert sorted(r["vec_id"] for r in out.collect()) == \
           sorted(r["vec_id"] for r in again.collect())
    # trains its own quantizer when centroids are omitted
    trained = cluster_balanced_sample(df, "v", budget=10, n_centroids=2,
                                      id_col="vec_id")
    assert 0 < trained.count() <= 10


def test_ccnet_perplexity_buckets(spark):
    """perplexity_buckets: exact value-granular terciles — ties share a
    bucket (the value's FIRST position decides), NULL scores get NULL
    bucket; ccnet_sample keeps head fully and drops NULL-bucket docs."""
    from solr_spark.functions.sampling import ccnet_sample, perplexity_buckets

    rows = ([(i, 10.0) for i in range(4)]          # 4-way tie at the head
            + [(10 + i, 20.0 + i) for i in range(4)]
            + [(20 + i, 100.0 + i) for i in range(4)]
            + [(30, None)])
    df = spark.createDataFrame(rows, "doc_id int, perplexity double")
    out = {r.doc_id: r.ppl_bucket
           for r in perplexity_buckets(df).collect()}
    # 12 scored docs -> positions 1-4 head, 5-8 middle, 9-12 tail;
    # the tie block 10.0 starts at position 1 -> all head
    assert all(out[i] == "head" for i in range(4))
    assert all(out[10 + i] == "middle" for i in range(4))
    assert all(out[20 + i] == "tail" for i in range(4))
    assert out[30] is None

    kept = ccnet_sample(perplexity_buckets(df), "doc_id",
                        keep={"head": 1.0, "middle": 1.0, "tail": 0.0})
    ids = {r.doc_id for r in kept.collect()}
    assert ids == set(range(4)) | {10, 11, 12, 13}  # tail + NULL dropped

    # nesting: a lower keep rate's sample is a subset of a higher one's
    lo = {r.doc_id for r in ccnet_sample(
        perplexity_buckets(df), "doc_id",
        keep={"head": 0.3, "middle": 0.3, "tail": 0.3}).collect()}
    hi = {r.doc_id for r in ccnet_sample(
        perplexity_buckets(df), "doc_id",
        keep={"head": 0.8, "middle": 0.8, "tail": 0.8}).collect()}
    assert lo <= hi

    with pytest.raises(ValueError, match="labels"):
        perplexity_buckets(df, n_buckets=4)


def test_unimax_allocation_and_sample(spark):
    """UniMax (Chung et al. 2023): uniform cross-language budget with an
    epoch cap — low-resource languages cap at max_epochs * n_docs, the
    surplus waterfills; allocations sum exactly to min(budget, capacity)."""
    from solr_spark.functions.sampling import unimax_allocations, unimax_sample

    rows = ([(i, "en") for i in range(100)]
            + [(200 + i, "de") for i in range(20)]
            + [(300 + i, "sw") for i in range(3)])
    df = spark.createDataFrame(rows, "doc_id int, lang string")

    # budget 90, cap 2 epochs: sw caps at 6, de caps at 40 > share -> de and
    # en split the remaining 84 evenly: 42 each (en uncapped, de capped at 40
    # only if 40*2 <= 84? 80 <= 84 -> capped; then en gets 44)
    alloc = {r.lang: r.allocation
             for r in unimax_allocations(df, "lang", 90, 2).collect()}
    assert sum(alloc.values()) == 90
    assert alloc["sw"] == 6              # capacity-capped
    assert alloc["de"] == 40             # capacity-capped (40*2 <= 90-6)
    assert alloc["en"] == 44             # the waterfilled remainder

    out = unimax_sample(df, "doc_id", "lang", 90, 2).collect()
    per_lang = {}
    for r in out:
        per_lang.setdefault(r.lang, []).append(r)
    assert {k: len(v) for k, v in per_lang.items()} == alloc
    # sw: 3 docs, alloc 6 -> every doc exactly 2 epochs
    sw_epochs = sorted((r.doc_id, r.epoch) for r in per_lang["sw"])
    assert sw_epochs == [(300, 1), (300, 2), (301, 1), (301, 2),
                         (302, 1), (302, 2)]
    # en: alloc 44 over 100 docs -> no full epoch, 44 distinct docs once
    assert all(r.epoch == 1 for r in per_lang["en"])
    assert len({r.doc_id for r in per_lang["en"]}) == 44

    # budget above total capacity -> everyone at capacity
    alloc_all = {r.lang: r.allocation
                 for r in unimax_allocations(df, "lang", 10_000, 2).collect()}
    assert alloc_all == {"en": 200, "de": 40, "sw": 6}

    # tiny budget spreads one each to the smallest-capacity languages first
    alloc_tiny = {r.lang: r.allocation
                  for r in unimax_allocations(df, "lang", 2, 2).collect()}
    assert sum(alloc_tiny.values()) == 2 and max(alloc_tiny.values()) == 1

    with pytest.raises(ValueError, match="max_epochs"):
        unimax_allocations(df, "lang", 10, 0)


def test_hard_negative_mining(spark):
    """hard_negative_mine: positives never burn a negative slot, max_sim
    trims near-positives, ranks are per-query 1..k by similarity desc."""
    from solr_spark.functions.vectors import hard_negative_mine

    # corpus: unit vectors at varying angles from e1
    import math

    def vec(theta):
        return [math.cos(theta), math.sin(theta)]

    corpus = spark.createDataFrame(
        [(i, vec(i * 0.2)) for i in range(8)],
        "vec_id int, embedding array<double>")
    qs = spark.createDataFrame([(0, vec(0.0))],
                               "q_id int, embedding array<double>")
    pos = spark.createDataFrame([(0, 0), (0, 1)], "q_id int, vec_id int")

    out = hard_negative_mine(qs, corpus, positives=pos, k=3).collect()
    ids = [r.vec_id for r in out]
    assert ids == [2, 3, 4]            # 0 and 1 excluded, then angle order
    assert [r.rank for r in out] == [1, 2, 3]
    cos = [r.cosine for r in out]
    assert cos == sorted(cos, reverse=True)

    # max_sim: treat anything within ~0.84 rad as near-positive
    band = hard_negative_mine(qs, corpus, positives=pos, k=3,
                              max_sim=math.cos(0.84)).collect()
    assert [r.vec_id for r in band] == [5, 6, 7]

    # no positives: the query's own identical vector ranks first
    raw = hard_negative_mine(qs, corpus, k=1).collect()
    assert raw[0].vec_id == 0 and abs(raw[0].cosine - 1.0) < 1e-9


def test_doremi_weights_hand_vector(spark):
    """DoReMi (Xie et al. 2023 Alg. 1) closed form against a hand-computed
    two-domain / two-step schedule, with and without smoothing."""
    import math

    from solr_spark.functions.sampling import doremi_weights

    rows = [  # (step, domain, loss, ref): clipped excess a=[1.0, 0.5], b=[0, 1.5]
        (1, "a", 3.0, 2.0), (1, "b", 1.0, 2.0),
        (2, "a", 2.5, 2.0), (2, "b", 3.5, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "step int, domain string, loss double, ref double")
    got = {r.domain: r.weight
           for r in doremi_weights(df, "step", "domain", "loss", "ref",
                                   eta=1.0, smoothing=0.0).collect()}
    # L_1 = (a: 1.0, b: 0.0) -> softmax (0.731.., 0.268..);
    # L_2 = (a: 1.5, b: 1.5) -> (0.5, 0.5); weight = mean over steps
    a1 = 1.0 / (1.0 + math.exp(-1.0))
    assert got["a"] == pytest.approx((a1 + 0.5) / 2, abs=1e-12)
    assert got["b"] == pytest.approx((1 - a1 + 0.5) / 2, abs=1e-12)
    assert got["a"] + got["b"] == pytest.approx(1.0, abs=1e-12)

    sm = {r.domain: r.weight
          for r in doremi_weights(df, "step", "domain", "loss", "ref",
                                  eta=1.0, smoothing=0.1).collect()}
    assert sm["a"] == pytest.approx((0.9 * a1 + 0.05 + 0.5) / 2, abs=1e-12)

    # a domain absent at a step holds its EG state (zero excess that step)
    df2 = spark.createDataFrame(rows[:3],
                                "step int, domain string, loss double, "
                                "ref double")
    got2 = {r.domain: r.weight
            for r in doremi_weights(df2, "step", "domain", "loss", "ref",
                                    eta=1.0, smoothing=0.0).collect()}
    # b absent at step 2: L_2 = (a: 1.5, b: 0.0)
    a2 = math.exp(1.5) / (math.exp(1.5) + 1.0)
    assert got2["a"] == pytest.approx((a1 + a2) / 2, abs=1e-12)

    with pytest.raises(ValueError, match="smoothing"):
        doremi_weights(df, "step", "domain", "loss", "ref", smoothing=1.0)
