"""Payload queries over delimited-payload token text.

Reference semantics: DelimitedPayloadTokenFilter attaches a per-occurrence
payload encoded as `token|payload` in the source text; PayloadScoreQParserPlugin
(solr/core/src/java/org/apache/solr/search/PayloadScoreQParserPlugin.java)
scores docs by an aggregate (min/max/sum/average/first) of a term's payloads,
and PayloadCheckQParserPlugin filters docs whose term carries given payloads.

Spark shape: the payloads live IN the delimited text column (the same place the
reference's analyzer reads them from); extraction is split/filter/transform
array expressions — whole-stage codegen, no Python, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def with_payloads(text_col, delimiter: str = "|") -> Column:
    """Attach 0-based token positions as payloads: `tok` -> `tok|pos`.

    The encode half of DelimitedPayloadTokenFilter for the common
    position-payload case; any upstream process may also write its own
    `tok|payload` text directly."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.array_join(
        F.transform(F.split(col, " "),
                    lambda t, i: F.concat(t, F.lit(delimiter),
                                          i.cast("string"))), " ")


def payload_values(text_col, term: str, delimiter: str = "|") -> Column:
    """array<double> of the payloads attached to `term`'s occurrences."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    pref = term + delimiter
    occs = F.filter(F.split(col, " "), lambda t: t.startswith(pref))
    return F.transform(
        occs, lambda t: F.substring(t, len(pref) + 1, 2_147_483_000)
        .cast("double"))


def payload_score(text_col, term: str, delimiter: str = "|",
                  func: str = "max") -> Column:
    """PayloadScoreQParserPlugin: aggregate of `term`'s payloads in the doc
    (null when the term is absent). func: min | max | sum | average | first."""
    vals = payload_values(text_col, term, delimiter)
    empty = F.size(vals) == 0
    if func == "min":
        agg = F.array_min(vals)
    elif func == "max":
        agg = F.array_max(vals)
    elif func == "sum":
        agg = F.aggregate(vals, F.lit(0.0), lambda a, x: a + x)
    elif func == "average":
        agg = (F.aggregate(vals, F.lit(0.0), lambda a, x: a + x)
               / F.size(vals))
    elif func == "first":
        agg = F.element_at(vals, 1)
    else:
        raise ValueError(f"unknown payload func: {func!r}")
    return F.when(~empty, agg)


def payload_check(text_col, term: str, payload: float,
                  delimiter: str = "|") -> Column:
    """PayloadCheckQParserPlugin: true when `term` occurs with the given
    payload value."""
    return F.array_contains(payload_values(text_col, term, delimiter),
                            float(payload))
