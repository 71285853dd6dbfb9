"""Corpus-dependent function queries: scale / recip / ms / ord / rord.

The scalar function-query families (abs/log/pow/if/concat/strdist/...) map
1:1 onto pyspark.sql.functions and are gated as plain Column expressions
(q25/q26). The four here need more than a row-local expression and so get
real operators:

  * ``scale(field, lo, hi)`` — Lucene ScaleFloatFunction
    (lucene/queries/.../function/valuesource/ScaleFloatFunction.java):
    linearly maps the field's CORPUS min/max onto [lo, hi]. One bounded
    min/max aggregation broadcast back over the scan.
  * ``recip(x, m, a, b)`` — ReciprocalFloatFunction: a / (m*x + b), the
    classic recency-boost kernel (recip(ms(NOW, date), 3.16e-11, 1, 1)).
  * ``ms(a, b)`` — millisecond difference of two date/timestamp expressions
    (DateMathParser-adjacent; function-queries doc).
  * ``ord(field)`` / ``rord(field)`` — the 1-based ordinal of the doc's
    value within the field's sorted unique values (FileFloatSource /
    OrdFieldSource). Distributed shape: rank the DISTINCT-value table (the
    same bounded-window-over-distinct-values pattern the KS/Mann-Whitney
    evaluators use — the window sees |vocabulary| rows, never |corpus|),
    then join back. For near-continuous fields the distinct table
    approaches corpus size; ord() on those is as meaningless in the
    reference (every doc has its own ordinal) as it is expensive here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scale_fq(df: DataFrame, col: str, lo: float, hi: float,
             out: str | None = None) -> DataFrame:
    """Add `out` (default scale_<col>) = corpus-min/max linear map onto
    [lo, hi]. Degenerate corpus (min == max) maps to the midpoint, the
    one-value fixpoint of the reference's formula family."""
    out = out or f"scale_{col}"
    stats = df.agg(F.min(col).alias("__fq_mn"), F.max(col).alias("__fq_mx"))
    scaled = F.when(
        F.col("__fq_mx") == F.col("__fq_mn"),
        F.lit((lo + hi) / 2.0),
    ).otherwise(
        (F.col(col) - F.col("__fq_mn"))
        / (F.col("__fq_mx") - F.col("__fq_mn"))
        * F.lit(float(hi) - float(lo)) + F.lit(float(lo)))
    return (df.crossJoin(F.broadcast(stats))
              .withColumn(out, scaled.cast("double"))
              .drop("__fq_mn", "__fq_mx"))


def recip(x: Column, m: float, a: float, b: float) -> Column:
    """ReciprocalFloatFunction: a / (m*x + b)."""
    return F.lit(float(a)) / (F.lit(float(m)) * x.cast("double")
                              + F.lit(float(b)))


def ms(a: Column | str, b: Column | str | None = None) -> Column:
    """ms(a[, b]): milliseconds of a, or a - b, as the reference's ms()
    function query (epoch-millis arithmetic over date/timestamp fields)."""
    def millis(c: Column | str) -> Column:
        c = F.col(c) if isinstance(c, str) else c
        # timestamp -> double is epoch seconds (fractional micros preserved)
        return F.round(c.cast("timestamp").cast("double") * 1000
                       ).cast("long")

    return millis(a) if b is None else millis(a) - millis(b)


def with_ord(df: DataFrame, col: str, reverse: bool = False,
             out: str | None = None) -> DataFrame:
    """Add `out` (default ord_<col> / rord_<col>) = the doc value's 1-based
    ordinal in the field's sorted unique values (rord counts from the top:
    rord = n_distinct + 1 - ord). Nulls get ordinal 0, matching the
    reference's missing-value ordinal."""
    out = out or (f"rord_{col}" if reverse else f"ord_{col}")
    vals = df.select(col).where(F.col(col).isNotNull()).distinct()
    w = Window.orderBy(F.col(col).asc())  # over DISTINCT values only
    ranked = vals.withColumn("__fq_ord", F.row_number().over(w))
    n = F.max("__fq_ord").over(Window.partitionBy())
    if reverse:
        ranked = ranked.withColumn("__fq_ord", n + 1 - F.col("__fq_ord"))
    joined = df.join(ranked, col, "left")
    return joined.withColumn(
        out, F.coalesce(F.col("__fq_ord"), F.lit(0)).cast("long")
    ).drop("__fq_ord")
