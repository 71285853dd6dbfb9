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
