"""Deterministic synthetic transcript corpus (BASELINE.json input_hint shape).

Schema: conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp — the exact input-table shape from BASELINE.json. Generation is fully
seeded (numpy PCG64) per FIXTURES.md §1: Zipf(s=1.1)-ish vocabulary of ~5k terms so a
handful of hot terms appear in >10% of turns (the skew driver), lengths 1–300 tokens,
a few empty strings, punctuation / mixed case / unicode sprinkled in.

`transcripts_from_documents` derives a transcript table of the same shape from the
driver-provided documents.parquet (scales with sf) for benchmarking — pure Spark
expressions, deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_ROLES = np.array(["user", "assistant", "system", "tool"])
_ROLE_P = np.array([0.40, 0.45, 0.05, 0.10])
_TOOLS = np.array(["bash", "search", "browser", "editor"])

_UNICODE_SPICE = ["café", "naïve", "東京", "emoji✓", "Zürich"]
_PUNCT_SPICE = ["error-code!", "v2.1.0", "it's", "(fixed)", "http://example.com/x"]


def _vocab(n_terms: int, rng: np.random.Generator) -> np.ndarray:
    base = np.array([f"term{i:04d}" for i in range(n_terms)], dtype=object)
    # hot head terms get realistic names so queries read naturally
    head = ["error", "timeout", "retry", "connect", "server", "request", "failed",
            "success", "user", "agent", "token", "query", "index", "shard", "merge"]
    base[: len(head)] = head
    spice_at = rng.choice(np.arange(50, n_terms), size=10, replace=False)
    for j, w in enumerate(_UNICODE_SPICE + _PUNCT_SPICE):
        base[spice_at[j]] = w
    return base


def synth_transcripts_pandas(n_turns: int, seed: int = 42, n_terms: int = 5000) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = _vocab(n_terms, rng)
    # Zipf-ish rank weights, s = 1.1
    ranks = np.arange(1, n_terms + 1, dtype=np.float64)
    probs = ranks ** -1.1
    probs /= probs.sum()

    n_convs = max(1, n_turns // 8)
    conv_of = rng.integers(0, n_convs, size=n_turns)
    conv_of.sort()
    conv_ids = np.array([f"conv-{c:06d}" for c in conv_of], dtype=object)
    # dense turn_idx within conversation
    turn_idx = np.zeros(n_turns, dtype=np.int32)
    _, starts = np.unique(conv_of, return_index=True)
    bounds = np.append(starts, n_turns)
    for s, e in zip(bounds[:-1], bounds[1:]):
        turn_idx[s:e] = np.arange(e - s, dtype=np.int32)

    roles = rng.choice(_ROLES, size=n_turns, p=_ROLE_P)
    lengths = rng.integers(1, 301, size=n_turns)
    lengths[rng.random(n_turns) < 0.005] = 0  # a few empty texts
    total = int(lengths.sum())
    words = rng.choice(vocab, size=total, p=probs)
    offs = np.cumsum(lengths)
    texts = np.empty(n_turns, dtype=object)
    prev = 0
    for i, off in enumerate(offs):
        toks = words[prev:off]
        if len(toks) and rng.random() < 0.3:  # mixed case noise
            j = rng.integers(0, len(toks))
            toks = toks.copy()
            toks[j] = str(toks[j]).upper()
        texts[i] = " ".join(toks)
        prev = off

    tools = np.where(roles == "tool", rng.choice(_TOOLS, size=n_turns), None)
    base_ts = np.int64(1_700_000_000)
    jitter = rng.integers(5, 121, size=n_turns).astype(np.int64)
    ts = pd.to_datetime((base_ts + conv_of * 10_000 + turn_idx * jitter) * 1_000_000_000)

    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx,
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )


def synth_transcripts_spark(spark, n_turns: int, seed: int = 42, n_partitions: int = 8):
    """Synthetic corpus as a Spark DataFrame with a controlled partition count."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    pdf = synth_transcripts_pandas(n_turns, seed=seed)
    return spark.createDataFrame(pdf, schema=schema).repartition(n_partitions, "conv_id")


def transcripts_from_documents(spark, sf_dir: str):
    """Derive an input_hint-shaped transcript table from documents.parquet.

    Each document becomes one conversation; its text is split into sentence-ish turns.
    Deterministic, pure built-in expressions (no UDF), scales with sf.
    """
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    turns = (
        docs.select(
            F.format_string("doc-%08d", F.col("doc_id")).alias("conv_id"),
            F.posexplode(F.split(F.col("text"), r"(?<=[.!?])\s+")).alias("turn_idx", "text"),
        )
        .where(F.length("text") > 0)
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
    )
    return turns.select(
        "conv_id",
        "turn_idx",
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant")), (F.col("turn_idx") % 2) + 1
        ).alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        (F.lit(1_700_000_000) + F.crc32(F.col("conv_id")) % 86400 + F.col("turn_idx") * 37)
        .cast("timestamp")
        .alias("ts"),
    )
