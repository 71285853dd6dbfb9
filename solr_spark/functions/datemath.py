"""Solr date-math expressions compiled to timestamp Column expressions.

Reference: DateMathParser (solr/core/src/java/org/apache/solr/util/
DateMathParser.java:91) — the `NOW/DAY-7DAYS`-style grammar used across
range facets, filters, and TrieDate/DatePoint queries:

    expr     := anchor op*
    anchor   := "NOW" | <ISO-8601 instant ending in Z>
    op       := "/" UNIT                 (round down)
              | ("+" | "-") N UNIT       (add / subtract)
    UNIT     := YEAR(S) MONTH(S) DAY(S) DATE HOUR(S) MINUTE(S) SECOND(S)
                MILLI(S) MILLISECOND(S)

Parsing happens driver-side; the result is a pure JVM Column (date_trunc +
timestampadd), so the expression runs at codegen speed and has an exact
ANSI-SQL twin. `NOW` binds to the moment of *query compilation* via an
anchor you pass in (or current_timestamp()), mirroring Solr's request-scoped
NOW parameter (DateMathParser.java `setNow`).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_UNIT = {
    "YEAR": "YEAR", "YEARS": "YEAR",
    "MONTH": "MONTH", "MONTHS": "MONTH",
    "DAY": "DAY", "DAYS": "DAY", "DATE": "DAY",
    "HOUR": "HOUR", "HOURS": "HOUR",
    "MINUTE": "MINUTE", "MINUTES": "MINUTE",
    "SECOND": "SECOND", "SECONDS": "SECOND",
    "MILLI": "MILLISECOND", "MILLIS": "MILLISECOND",
    "MILLISECOND": "MILLISECOND", "MILLISECONDS": "MILLISECOND",
}
_OP = re.compile(r"/([A-Z]+)|([+-])(\d+)([A-Z]+)")


def parse_ops(expr: str) -> tuple[str | None, list[tuple]]:
    """Split a date-math string into (anchor_instant | None for NOW, ops).

    ops entries: ("round", unit) or ("add", signed_n, unit).
    Raises ValueError on any unrecognized syntax (same strictness as the
    reference parser).
    """
    if expr.startswith("NOW"):
        anchor, rest = None, expr[3:]
    else:
        z = expr.find("Z")
        if z < 0:
            raise ValueError(f"date math must anchor at NOW or a Z instant: {expr!r}")
        anchor, rest = expr[: z + 1], expr[z + 1:]
    ops: list[tuple] = []
    pos = 0
    while pos < len(rest):
        m = _OP.match(rest, pos)
        if not m:
            raise ValueError(f"bad date math op at {rest[pos:]!r} in {expr!r}")
        if m.group(1):
            unit = _UNIT.get(m.group(1))
            if not unit:
                raise ValueError(f"unknown unit {m.group(1)!r} in {expr!r}")
            ops.append(("round", unit))
        else:
            unit = _UNIT.get(m.group(4))
            if not unit:
                raise ValueError(f"unknown unit {m.group(4)!r} in {expr!r}")
            n = int(m.group(3))
            ops.append(("add", -n if m.group(2) == "-" else n, unit))
        pos = m.end()
    return anchor, ops


def date_math(expr: str, now: Column | str | None = None) -> Column:
    """Compile a Solr date-math string to a timestamp Column.

    `now` anchors the NOW token (a Column, an ISO string, or None for
    current_timestamp()); ignored when the expression carries its own instant.
    """
    anchor, ops = parse_ops(expr)
    if anchor is not None:
        ts = F.to_timestamp(F.lit(anchor.replace("Z", "+00:00")))
    elif now is None:
        ts = F.current_timestamp()
    elif isinstance(now, str):
        ts = F.to_timestamp(F.lit(now.replace("Z", "+00:00")))
    else:
        ts = now
    for op in ops:
        if op[0] == "round":
            ts = F.date_trunc(op[1], ts)
        else:
            ts = F.timestamp_add(op[2], F.lit(op[1]), ts)
    return ts


def date_math_sql(expr: str, now_sql: str | None = None) -> str:
    """The exact ANSI-SQL twin of date_math() (for oracle queries/tests)."""
    anchor, ops = parse_ops(expr)
    if anchor is not None:
        sql = f"TIMESTAMP '{anchor.replace('T', ' ').replace('Z', '')}'"
    else:
        sql = now_sql or "now()"
    for op in ops:
        if op[0] == "round":
            sql = f"date_trunc('{op[1].lower()}', {sql})"
        else:
            n, unit = op[1], op[2].lower()
            sign = "-" if n < 0 else "+"
            sql = f"({sql} {sign} INTERVAL {abs(n)} {unit})"
    return sql


# -------------------------------------------------- driver-side evaluation
# Range facets over date fields enumerate their bucket boundaries driver-side
# (exactly like the reference: RangeFacetRequest walks lo += gap until end),
# which needs date math evaluated to real datetimes, including CALENDAR
# arithmetic for month/year gaps where bucket widths vary.

import datetime as _dt  # noqa: E402

_TRUNC_PY = {
    "YEAR": lambda d: d.replace(month=1, day=1, hour=0, minute=0, second=0,
                                microsecond=0),
    "MONTH": lambda d: d.replace(day=1, hour=0, minute=0, second=0,
                                 microsecond=0),
    "DAY": lambda d: d.replace(hour=0, minute=0, second=0, microsecond=0),
    "HOUR": lambda d: d.replace(minute=0, second=0, microsecond=0),
    "MINUTE": lambda d: d.replace(second=0, microsecond=0),
    "SECOND": lambda d: d.replace(microsecond=0),
    "MILLISECOND": lambda d: d.replace(
        microsecond=(d.microsecond // 1000) * 1000),
}
_DELTA_PY = {"DAY": _dt.timedelta(days=1), "HOUR": _dt.timedelta(hours=1),
             "MINUTE": _dt.timedelta(minutes=1),
             "SECOND": _dt.timedelta(seconds=1),
             "MILLISECOND": _dt.timedelta(milliseconds=1)}


def _add_unit_py(d: _dt.datetime, n: int, unit: str) -> _dt.datetime:
    if unit in _DELTA_PY:
        return d + n * _DELTA_PY[unit]
    months = n * (12 if unit == "YEAR" else 1)
    total = d.year * 12 + (d.month - 1) + months
    year, month = divmod(total, 12)
    month += 1
    # clamp the day like java.time plusMonths (Jan 31 + 1MONTH = Feb 28/29)
    last = [31, 29 if year % 4 == 0 and (year % 100 != 0 or year % 400 == 0)
            else 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31][month - 1]
    return d.replace(year=year, month=month, day=min(d.day, last))


def date_math_py(expr: str, now: "_dt.datetime | str | None" = None
                 ) -> _dt.datetime:
    """Evaluate a date-math string to a naive-UTC datetime driver-side (the
    DateMathParser.java evaluation itself, for boundary enumeration)."""
    anchor, ops = parse_ops(expr)
    if anchor is not None:
        d = _dt.datetime.fromisoformat(anchor.replace("Z", "+00:00")) \
            .replace(tzinfo=None)
    elif now is None:
        raise ValueError("NOW-anchored date math needs an explicit `now` "
                         "(determinism: Solr's request-scoped NOW param)")
    elif isinstance(now, str):
        d = _dt.datetime.fromisoformat(now.replace("Z", "+00:00")) \
            .replace(tzinfo=None)
    else:
        d = now
    for op in ops:
        d = _TRUNC_PY[op[1]](d) if op[0] == "round" \
            else _add_unit_py(d, op[1], op[2])
    return d


def parse_gap(gap: str) -> list[tuple]:
    """Parse a facet.range.gap string ('+1MONTH', '+7DAYS', '+1DAY+12HOURS')
    into add-ops; rounding ops are rejected (a gap must advance)."""
    _anchor, ops = parse_ops("NOW" + gap if not gap.startswith("NOW") else gap)
    if not ops or any(op[0] != "add" for op in ops):
        raise ValueError(f"gap must be pure +N UNIT terms: {gap!r}")
    return ops


def apply_gap(d: _dt.datetime, gap_ops: list[tuple]) -> _dt.datetime:
    for op in gap_ops:
        d = _add_unit_py(d, op[1], op[2])
    return d
