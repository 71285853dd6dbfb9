"""Streaming-expression string parser: `fn(arg, nested(...), name=value)` -> AST.

The reference's user-facing streaming API is a prefix-notation string DSL —
`rollup(search(coll, q="a:b", fl="a,b", sort="a asc"), over="a", sum(b))` —
parsed by solr/solrj-streaming/src/java/org/apache/solr/client/solrj/io/stream/
expr/StreamExpressionParser.java:35 (parse), :62 (generateStreamExpression),
:171 (isExpressionClause), :216 (findNextClear quote/paren scanner), :252
(splitOn). This module reproduces that grammar:

- `#`-prefixed LINES are comments and are stripped first (stripComments, :45).
- A clause `name(...)` is an expression; `name` may contain word chars plus
  `_ . -` (wordChars, :29).
- Parameters split on commas that are "clear" (not inside quotes or parens);
  each is a nested expression, a named parameter `name=<value|expression>`
  (first clear `=`), or a bare value.
- Double-quoted values drop the outer quotes and unescape `\\"` -> `"`
  (generateNamedParameterExpression, :114-130; same for positional values).

The AST is deliberately tiny: `StreamExpr(name, params)` where params are
`StreamExpr`, `NamedParam(name, value)`, or `str` values. Evaluation against
DataFrames lives in solr_spark.streaming.dispatch.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class NamedParam:
    name: str
    value: "StreamExpr | str"


@dataclass
class StreamExpr:
    name: str
    params: list = field(default_factory=list)

    def named(self, name: str, default=None):
        """All values for a (repeatable) named parameter; scalar via named1()."""
        vals = [p.value for p in self.params
                if isinstance(p, NamedParam) and p.name == name]
        return vals if vals else default

    def named1(self, name: str, default=None):
        vals = self.named(name)
        return vals[0] if vals else default

    def positional_values(self) -> list[str]:
        return [p for p in self.params if isinstance(p, str)]

    def sub_expressions(self) -> list["StreamExpr"]:
        return [p for p in self.params if isinstance(p, StreamExpr)]


class ExpressionSyntaxError(ValueError):
    pass


def _strip_comments(clause: str) -> str:
    return "\n".join(
        line for line in clause.splitlines() if not line.strip().startswith("#")
    )


def _find_next_clear(s: str, start: int, ch: str) -> int:
    """Index of the next `ch` at quote-depth 0 and paren-depth 0, else -1.

    Mirrors StreamExpressionParser.findNextClear (:197-255): a `\\` toggles an
    escaped state (so `\\\\` is a literal backslash), both `"` and `'` open
    quote states (each ignored while inside the other), and parens only count
    outside quotes.
    """
    open_parens = 0
    in_double = in_single = escaped = False
    for i in range(start, len(s)):
        c = s[i]
        if c == ch and not escaped and not in_single and not in_double \
                and open_parens == 0:
            return i
        if c == "\\":
            escaped = not escaped
            continue
        if c == '"':
            if not escaped and not in_single:
                in_double = not in_double
        elif c == "'":
            if not escaped and not in_double:
                in_single = not in_single
        elif c == "(":
            if not escaped and not in_single and not in_double:
                open_parens += 1
        elif c == ")":
            if not escaped and not in_single and not in_double:
                open_parens -= 1
        escaped = False
    return -1


def _split_on(s: str, ch: str) -> list[str]:
    """Split on clear `ch` occurrences (StreamExpressionParser.splitOn)."""
    parts = []
    while True:
        idx = _find_next_clear(s, 0, ch)
        if idx < 0:
            parts.append(s)
            return parts
        parts.append(s[:idx])
        s = s[idx + 1:]


def _is_expression_clause(s: str) -> bool:
    s = s.strip()
    if not s.endswith(")"):
        return False
    op = _find_next_clear(s, 0, "(")
    if op <= 0:
        return False
    name = s[:op].strip()
    return bool(name) and all(c.isalnum() or c in "_.-" for c in name)


def _is_named_parameter_clause(s: str) -> bool:
    s = s.strip()
    eq = _find_next_clear(s, 0, "=")
    if eq <= 0:
        return False
    name = s[:eq].strip()
    return bool(name) and all(c.isalnum() or c in "_.-" for c in name)


_BACKTICK_RE = re.compile(r"(?<!\\)`")


def _unquote(v: str) -> str:
    """Value normalization per generateNamedParameterExpression (:114-146):
    strip one layer of wrapping double quotes, unescape `\\"` -> `"`, and allow
    backtick as an alternate quote char (un-escaped backticks become `"`).
    The reference applies this to named-parameter values; positional values get
    the same treatment downstream in each stream's factory, so we normalize
    both here."""
    v = v.strip()
    if len(v) >= 2 and v.startswith('"') and v.endswith('"'):
        v = v[1:-1].strip()
    if '\\"' in v:
        v = v.replace('\\"', '"')
    if "`" in v:
        v = _BACKTICK_RE.sub('"', v)
    return v


def parse_expression(clause: str) -> StreamExpr:
    """Parse one streaming-expression string into a StreamExpr tree."""
    working = _strip_comments(clause).strip()
    if not _is_expression_clause(working):
        raise ExpressionSyntaxError(
            f"{working!r} is not a proper expression clause")
    op = _find_next_clear(working, 0, "(")
    expr = StreamExpr(working[:op].strip())
    inner = working[op + 1:-1].strip()
    if not inner:
        return expr
    for part in _split_on(inner, ","):
        part = part.strip()
        if not part:
            continue
        if _is_expression_clause(part):
            expr.params.append(parse_expression(part))
        elif _is_named_parameter_clause(part):
            eq = _find_next_clear(part, 0, "=")
            name, val = part[:eq].strip(), part[eq + 1:].strip()
            if _is_expression_clause(val):
                expr.params.append(NamedParam(name, parse_expression(val)))
            else:
                expr.params.append(NamedParam(name, _unquote(val)))
        else:
            expr.params.append(_unquote(part))
    return expr
