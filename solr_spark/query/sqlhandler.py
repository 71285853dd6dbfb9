"""Solr Parallel SQL (`/sql` handler) over DataFrames.

The reference's third query surface: a restricted SQL dialect parsed by
Apache Calcite (modules/sql/src/java/org/apache/solr/handler/sql/
SQLHandler.java:71, Lex config CalciteSolrDriver.java:29) whose relational
nodes are pushed down to Solr queries — SolrFilter translates WHERE
predicates to Solr query strings (SolrRules.java:141-202, the operator
table in sql-query.adoc "Supported WHERE Operators"), SolrAggregate maps
GROUP BY to facet/rollup streams, SolrSort/LimitStream handle ORDER
BY/LIMIT, and SELECT DISTINCT runs as either a shuffled unique() or a
facet (sql-query.adoc "SELECT DISTINCT Queries").

Spark restatement (SURVEY.md §3.3): Calcite's pushdown planning *is*
Catalyst here — this module is a dialect front-end, not an execution
layer. It parses the Solr-SQL grammar (single table, field-on-one-side
predicates, Solr search syntax injected through string equality) and
declares the equivalent DataFrame plan: WHERE compiles through the classic
LuceneQueryParser to Catalyst predicates (pushed to the scan), GROUP BY is
one partial-aggregated groupBy, ORDER BY+LIMIT is TakeOrdered, DISTINCT is
the map-side-combinable dropDuplicates. Nothing here adds a new execution
path; every statement inherits the audited plans.

Dialect semantics carried over from sql-query.adoc / TestSQLHandler.java:
  * WHERE must have a field on one side; string literals are single-quoted,
    double quotes / backquotes escape identifiers (reserved words).
  * On a TEXT field, ``f = 'term1 term2'`` is a phrase search; wrapping the
    value in parens (``f = '(term1 term2)'``) injects raw Solr query syntax
    scoped to that field; ``f = '[0 TO 100]'`` is a range query. These are
    parsed by solr_spark.query.parser with default_field=f.
  * Operator table: ``=`` -> f:v, ``<>`` -> -f:v, ``>`` -> f:{v TO *],
    ``>=``/``<``/``<=`` ranges, IN -> OR chain, LIKE ('%'/'_' -> '*'/'?')
    -> wildcard, BETWEEN -> [a TO b], IS [NOT] NULL.
  * ORDER BY is case-sensitive field names; aliases from the select list
    are accepted. OFFSET requires FETCH (OFFSET without FETCH raises, as
    the reference's handler does).
  * GROUP BY queries: if ORDER BY uses only GROUP BY fields, no implicit
    limit; otherwise the reference applies an implicit LIMIT 100 unless an
    explicit LIMIT is present — reproduced here for result parity.
  * ``score`` in the select/order list requires the scored path — this
    module raises and points at json_search/bm25_topk (ranked retrieval is
    a separate, index-backed surface in this engine).

Aggregates: COUNT(*), COUNT(DISTINCT f), APPROX_COUNT_DISTINCT(f), MIN,
MAX, SUM, AVG (sql-query.adoc "Statistical Functions").
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solr_spark.query.parser import LuceneQueryParser

_KEYWORDS = {
    "select", "distinct", "from", "where", "group", "by", "having", "order",
    "limit", "offset", "fetch", "next", "rows", "only", "and", "or", "not",
    "in", "like", "between", "is", "null", "as", "asc", "desc", "row",
}

_AGG_FNS = {"count", "min", "max", "sum", "avg", "approx_count_distinct"}

_SQL_TOKEN_RE = re.compile(
    r"""\s*(?:
      (?P<str>'(?:[^']|'')*')
    | (?P<qid>"[^"]+"|`[^`]+`)
    | (?P<num>-?\d+(?:\.\d+)?)
    | (?P<op><>|>=|<=|=|>|<)
    | (?P<punct>[(),*])
    | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
    )""",
    re.VERBOSE,
)


@dataclass
class _SqlTok:
    kind: str   # str | qid | num | op | punct | word | kw
    text: str   # normalized: kw lowercase, str unquoted, qid unquoted


def _sql_lex(sql: str) -> list[_SqlTok]:
    toks, pos = [], 0
    while pos < len(sql):
        m = _SQL_TOKEN_RE.match(sql, pos)
        if not m or m.end() == pos:
            if sql[pos:].strip():
                raise ValueError(f"cannot lex SQL at: {sql[pos:]!r}")
            break
        pos = m.end()
        kind = m.lastgroup
        text = m.group(kind)
        if kind == "str":
            text = text[1:-1].replace("''", "'")
        elif kind == "qid":
            text, kind = text[1:-1], "word"
        elif kind == "word" and text.lower() in _KEYWORDS:
            text, kind = text.lower(), "kw"
        toks.append(_SqlTok(kind, text))
    return toks


@dataclass
class _Select:
    distinct: bool = False
    items: list = dc_field(default_factory=list)  # (kind, spec, alias)
    table: str = ""
    where: Column | None = None
    group_by: list[str] = dc_field(default_factory=list)
    having: list = dc_field(default_factory=list)  # parsed predicate tuples
    order_by: list[tuple[str, str]] = dc_field(default_factory=list)
    limit: int | None = None
    offset: int = 0


class _SqlParser:
    """Recursive-descent parser for the Solr-SQL subset."""

    def __init__(self, sql: str, pred_compiler, allow_score: bool = False):
        self.toks = _sql_lex(sql)
        self.i = 0
        self.pred = pred_compiler  # (field, op, values) -> Column
        self.allow_score = allow_score

    # -- token helpers --------------------------------------------------
    def peek(self) -> _SqlTok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> _SqlTok:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of SQL statement")
        self.i += 1
        return t

    def accept_kw(self, *kws: str) -> bool:
        t = self.peek()
        if t and t.kind == "kw" and t.text in kws:
            self.i += 1
            return True
        return False

    def expect_kw(self, kw: str) -> None:
        if not self.accept_kw(kw):
            raise ValueError(f"expected {kw.upper()} at token {self.i} "
                             f"({self.peek()!r})")

    def expect_punct(self, p: str) -> None:
        t = self.next()
        if t.kind != "punct" or t.text != p:
            raise ValueError(f"expected {p!r}, got {t!r}")

    def ident(self) -> str:
        t = self.next()
        if t.kind != "word":
            raise ValueError(f"expected identifier, got {t!r}")
        return t.text

    # -- grammar ---------------------------------------------------------
    def statement(self) -> _Select:
        s = _Select()
        self.expect_kw("select")
        s.distinct = self.accept_kw("distinct")
        s.items = self._select_list()
        self.expect_kw("from")
        s.table = self.ident()
        if self.accept_kw("where"):
            s.where = self._bool_expr()
        if self.accept_kw("group"):
            self.expect_kw("by")
            s.group_by.append(self.ident())
            while self._accept_punct(","):
                s.group_by.append(self.ident())
        if self.accept_kw("having"):
            s.having = self._having_expr()
        if self.accept_kw("order"):
            self.expect_kw("by")
            s.order_by.append(self._order_item())
            while self._accept_punct(","):
                s.order_by.append(self._order_item())
        if self.accept_kw("offset"):
            s.offset = int(self.next().text)
            # OFFSET without FETCH "is not supported and generates an
            # exception" (sql-query.adoc "OFFSET with FETCH")
            if not self.accept_kw("fetch"):
                raise ValueError("OFFSET without FETCH is not supported")
            self.expect_kw("next")
            s.limit = int(self.next().text)
            if not (self.accept_kw("rows") or self.accept_kw("row")):
                raise ValueError("expected ROWS ONLY after FETCH NEXT n")
            self.expect_kw("only")
        elif self.accept_kw("limit"):
            s.limit = int(self.next().text)
        if self.peek() is not None:
            raise ValueError(f"trailing tokens in SQL: {self.peek()!r}")
        return s

    def _accept_punct(self, p: str) -> bool:
        t = self.peek()
        if t and t.kind == "punct" and t.text == p:
            self.i += 1
            return True
        return False

    def _select_list(self) -> list:
        items = [self._select_item()]
        while self._accept_punct(","):
            items.append(self._select_item())
        return items

    def _select_item(self):
        t = self.peek()
        if t and t.kind == "punct" and t.text == "*":
            self.i += 1
            return ("star", None, None)
        name = self.ident()
        if name.lower() == "score" and not self.allow_score:
            raise ValueError(
                "score requires the ranked path — use solr_sql_search "
                "(index-backed scoring) or json_search/bm25_topk")
        if self._accept_punct("("):
            fn = name.lower()
            if fn not in _AGG_FNS:
                raise ValueError(f"unsupported function {name!r}")
            distinct = self.accept_kw("distinct")
            t = self.peek()
            if t and t.kind == "punct" and t.text == "*":
                self.i += 1
                arg = "*"
            else:
                arg = self.ident()
            self.expect_punct(")")
            if distinct:
                if fn != "count":
                    raise ValueError("DISTINCT only inside COUNT(...)")
                fn = "count_distinct"
            spec = (fn, arg)
            alias = self._alias() or f"{fn.upper()}({arg})"
            return ("agg", spec, alias)
        return ("col", name, self._alias() or name)

    def _alias(self) -> str | None:
        if self.accept_kw("as"):
            return self.ident()
        t = self.peek()
        if t and t.kind == "word":
            self.i += 1
            return t.text
        return None

    def _order_item(self) -> tuple[str, str]:
        name = self.ident()
        if name.lower() == "score" and not self.allow_score:
            raise ValueError(
                "ORDER BY score requires the ranked path — use "
                "solr_sql_search or json_search/bm25_topk")
        direction = "asc"
        if self.accept_kw("desc"):
            direction = "desc"
        elif self.accept_kw("asc"):
            direction = "asc"
        return (name, direction)

    # WHERE boolean grammar: or := and (OR and)* ; and := factor (AND factor)*
    def _bool_expr(self) -> Column:
        left = self._bool_and()
        while self.accept_kw("or"):
            left = left | self._bool_and()
        return left

    def _bool_and(self) -> Column:
        left = self._bool_factor()
        while self.accept_kw("and"):
            left = left & self._bool_factor()
        return left

    def _bool_factor(self) -> Column:
        if self.accept_kw("not"):
            return ~self._bool_factor()
        if self._accept_punct("("):
            col = self._bool_expr()
            self.expect_punct(")")
            return col
        return self._predicate()

    def _value(self):
        t = self.next()
        if t.kind == "str":
            return t.text
        if t.kind == "num":
            return float(t.text) if "." in t.text else int(t.text)
        raise ValueError(f"expected literal value, got {t!r} "
                         "(the WHERE clause must have a field on one side)")

    def _predicate(self) -> Column:
        t = self.peek()
        if t is not None and t.kind != "word":
            # "The WHERE clause must have a field on one side of the
            # predicate" (sql-query.adoc) — constants on both sides rejected
            raise ValueError(
                f"the WHERE clause must have a field on one side of each "
                f"predicate (got {t.text!r})")
        fld = self.ident()
        t = self.peek()
        if t is None:
            raise ValueError(f"dangling predicate field {fld!r}")
        negate = self.accept_kw("not")
        if self.accept_kw("in"):
            self.expect_punct("(")
            vals = [self._value()]
            while self._accept_punct(","):
                vals.append(self._value())
            self.expect_punct(")")
            col = self.pred(fld, "in", vals)
        elif self.accept_kw("like"):
            col = self.pred(fld, "like", [self._value()])
        elif self.accept_kw("between"):
            lo = self._value()
            self.expect_kw("and")
            col = self.pred(fld, "between", [lo, self._value()])
        elif self.accept_kw("is"):
            neg_null = self.accept_kw("not")
            self.expect_kw("null")
            col = self.pred(fld, "isnull", [])
            if neg_null:
                col = ~col
        elif t.kind == "op":
            op = self.next().text
            col = self.pred(fld, op, [self._value()])
        else:
            raise ValueError(f"expected operator after field {fld!r}, "
                             f"got {t!r}")
        return ~col if negate else col

    # HAVING: comparisons over aggregate specs / aliases, AND/OR
    def _having_expr(self) -> list:
        def factor():
            if self._accept_punct("("):
                e = expr()
                self.expect_punct(")")
                return e
            name = self.ident()
            if self._accept_punct("("):
                fn = name.lower()
                distinct = self.accept_kw("distinct")
                t = self.peek()
                if t and t.kind == "punct" and t.text == "*":
                    self.i += 1
                    arg = "*"
                else:
                    arg = self.ident()
                self.expect_punct(")")
                fn = "count_distinct" if distinct else fn
                ref = ("spec", (fn, arg))
            else:
                ref = ("alias", name)
            op = self.next()
            if op.kind != "op":
                raise ValueError(f"expected comparison in HAVING, got {op!r}")
            return ("cmp", ref, op.text, self._value())

        def expr():
            left = term()
            while self.accept_kw("or"):
                left = ("or", left, term())
            return left

        def term():
            left = factor()
            while self.accept_kw("and"):
                left = ("and", left, factor())
            return left

        return [expr()]


def _agg_column(fn: str, arg: str) -> Column:
    if fn == "count":
        return F.count(F.lit(1)) if arg == "*" else F.count(arg)
    if fn == "count_distinct":
        return F.count_distinct(arg)
    if fn == "approx_count_distinct":
        return F.approx_count_distinct(arg)
    return {"min": F.min, "max": F.max, "sum": F.sum, "avg": F.avg}[fn](arg)


_RANGE_VAL_RE = re.compile(r"^[\[{].*\sTO\s.*[\]}]$")


def _make_pred_compiler(text_fields: set[str], now=None):
    """Compile (field, op, values) per the reference's operator table
    (sql-query.adoc 'Supported WHERE Operators') — each predicate becomes
    the same Solr query string the reference's SolrFilter would emit, then
    parses to a Catalyst Column through the classic-parser leaf semantics."""

    def parser_for(fld: str) -> LuceneQueryParser:
        return LuceneQueryParser(fld, text_fields, now=now)

    def str_eq(fld: str, v: str) -> Column:
        p = parser_for(fld)
        if _RANGE_VAL_RE.match(v):                 # f = '[0 TO 100]'
            return p.parse(f"{fld}:{v}")
        if v.startswith("(") and v.endswith(")"):  # f = '(t1 t2)' raw syntax
            return p.parse(v)
        if fld in text_fields:
            if "*" in v or "?" in v:               # f = 'sam*' wildcard
                return p.parse(f'{fld}:{v}')
            return p.parse(f'{fld}:"{v}"')         # phrase search
        return F.col(fld) == F.lit(v)

    def compile_pred(fld: str, op: str, vals: list) -> Column:
        c = F.col(fld)
        if op == "=":
            v = vals[0]
            return str_eq(fld, v) if isinstance(v, str) else (c == F.lit(v))
        if op == "<>":
            v = vals[0]
            return ~str_eq(fld, v) if isinstance(v, str) else (c != F.lit(v))
        if op in (">", ">=", "<", "<="):
            v = F.lit(vals[0])
            return {">": c > v, ">=": c >= v, "<": c < v, "<=": c <= v}[op]
        if op == "in":
            return c.isin([F.lit(v) for v in vals])
        if op == "like":
            # '%'/'_' -> Solr '*'/'?' wildcards (sql-query.adoc LIKE row);
            # a bare '*' is the Solr-specific shorthand, already handled by
            # str_eq. Non-text fields: plain SQL LIKE on the stored value.
            v = str(vals[0])
            if fld in text_fields:
                solr = v.replace("%", "*").replace("_", "?")
                return parser_for(fld).parse(f"{fld}:{solr}")
            return c.like(v)
        if op == "between":
            return (c >= F.lit(vals[0])) & (c <= F.lit(vals[1]))
        if op == "isnull":
            return c.isNull()
        raise ValueError(f"unsupported operator {op!r}")

    return compile_pred


def _having_col(node, spec_to_alias: dict, columns: list[str]) -> Column:
    kind = node[0]
    if kind in ("and", "or"):
        left = _having_col(node[1], spec_to_alias, columns)
        right = _having_col(node[2], spec_to_alias, columns)
        return (left & right) if kind == "and" else (left | right)
    _, ref, op, val = node
    if ref[0] == "spec":
        alias = spec_to_alias.get(ref[1])
        if alias is None:
            raise ValueError(
                f"HAVING references {ref[1][0].upper()}({ref[1][1]}) which "
                f"is not in the select list")
    else:
        alias = ref[1]
        if alias not in columns:
            raise ValueError(f"HAVING references unknown column {alias!r}")
    c, v = F.col(alias), F.lit(val)
    return {"=": c == v, "<>": c != v, ">": c > v, ">=": c >= v,
            "<": c < v, "<=": c <= v}[op]


def solr_sql(df: DataFrame, sql: str, table: str | None = None,
             text_fields: set[str] | None = None, now=None) -> DataFrame:
    """Execute a Solr-SQL statement against a DataFrame (the collection).

    `table` (optional) asserts the FROM table name matches the collection
    this DataFrame holds, the single-table rule of SolrSchema.java.
    `text_fields` marks analyzed columns: string equality on them is a
    full-text search (phrase / injected Solr syntax), as in SolrFilter.

    Returns the declared DataFrame plan — filters are Catalyst predicates
    (pushed to the scan), GROUP BY one partial aggregation, ORDER BY+LIMIT
    TakeOrdered. A statement with no LIMIT is the /export role: the full
    (sorted) result streams out, nothing is collected.
    """
    tf = text_fields or set()
    stmt = _SqlParser(sql, _make_pred_compiler(tf, now=now)).statement()
    if table is not None and stmt.table != table:
        raise ValueError(f"unknown table {stmt.table!r} (collection: {table!r})")

    out = df
    if stmt.where is not None:
        out = out.where(stmt.where)

    aggs = [(spec, alias) for kind, spec, alias in stmt.items if kind == "agg"]
    cols = [(spec, alias) for kind, spec, alias in stmt.items if kind == "col"]
    star = any(kind == "star" for kind, _, _ in stmt.items)

    if stmt.group_by or aggs:
        if star:
            raise ValueError("SELECT * cannot be combined with aggregates")
        bad = [a for spec, a in cols if spec not in stmt.group_by]
        if bad:
            raise ValueError(
                f"non-aggregate columns {bad} must appear in GROUP BY")
        spec_to_alias = {spec: alias for spec, alias in aggs}
        agg_cols = [_agg_column(fn, arg).alias(alias)
                    for (fn, arg), alias in aggs]
        if stmt.group_by:
            out = out.groupBy(*stmt.group_by).agg(*agg_cols)
        else:
            out = out.agg(*agg_cols)
        if stmt.having:
            out = out.where(
                _having_col(stmt.having[0], spec_to_alias, out.columns))
        # project group-by columns under their select aliases, in select order
        proj = []
        for kind, spec, alias in stmt.items:
            if kind == "col":
                proj.append(F.col(spec).alias(alias))
            else:
                proj.append(F.col(spec_to_alias[spec]))
        out = out.select(*proj)
        # the reference's implicit-limit rule: ORDER BY on anything beyond
        # the GROUP BY fields (e.g. an aggregate alias) applies LIMIT 100
        # unless an explicit LIMIT is present (sql-query.adoc "ORDER BY")
        if stmt.order_by and stmt.limit is None:
            alias_src = {alias: spec for kind, spec, alias in stmt.items
                         if kind == "col"}
            if any(alias_src.get(f_) not in stmt.group_by
                   for f_, _ in stmt.order_by):
                stmt.limit = 100
        out = _sort_page(out, stmt, set(out.columns))
    else:
        if not star:
            # ORDER BY may reference select aliases or any (even unselected)
            # source field — limited queries "allow any indexed field in the
            # ORDER BY list" (sql-query.adoc LIMIT clause). Unselected sort
            # fields ride as hidden columns and are dropped after paging.
            aliases = {alias for _, _, alias in stmt.items}
            hidden = [f_ for f_, _ in stmt.order_by
                      if f_ not in aliases and f_ in out.columns]
            if stmt.distinct and hidden:
                raise ValueError(
                    f"SELECT DISTINCT: ORDER BY fields {hidden} must appear "
                    f"in the select list")
            proj = [F.col(spec).alias(alias) for _, spec, alias in stmt.items]
            visible = [alias for _, _, alias in stmt.items]
            out = out.select(*proj, *[F.col(h) for h in hidden])
            if stmt.distinct:
                out = out.dropDuplicates()
            out = _sort_page(out, stmt, set(out.columns))
            if hidden:
                out = out.select(*visible)
        else:
            if stmt.distinct:
                out = out.dropDuplicates()
            out = _sort_page(out, stmt, set(out.columns))
    return out


def _sort_page(out: DataFrame, stmt: _Select, known: set) -> DataFrame:
    if stmt.order_by:
        for f_, _ in stmt.order_by:
            if f_ not in known:
                raise ValueError(f"ORDER BY unknown column {f_!r} "
                                 f"(available: {sorted(known)})")
        out = out.orderBy(*[F.col(f_).desc() if d == "desc" else F.col(f_).asc()
                            for f_, d in stmt.order_by])
    if stmt.offset:
        if not stmt.order_by:
            raise ValueError("OFFSET requires an ORDER BY clause")
        out = out.offset(stmt.offset)
    if stmt.limit is not None:
        out = out.limit(stmt.limit)
    return out


class _Pred:
    """Recording predicate node: supports the parser's &/|/~ composition so
    the same grammar can yield an AST instead of a Column (the scored path
    renders it back to q/fq strings, the way SolrFilter keeps RexNodes
    symbolic until SolrTable compiles the search stream)."""

    def __init__(self, kind, *args):
        self.kind = kind   # leaf | and | or | not
        self.args = args

    def __and__(self, other):
        return _Pred("and", self, other)

    def __or__(self, other):
        return _Pred("or", self, other)

    def __invert__(self):
        return _Pred("not", self)


def _q_str(v) -> str:
    """Render a literal as a classic-parser value token."""
    s = str(v)
    if isinstance(v, str) and (" " in s or s == ""):
        return f'"{s}"'
    return s


def _render_fq(node: _Pred) -> str:
    """Predicate AST -> classic fq string per the operator table
    (sql-query.adoc 'Supported WHERE Operators' Solr Query column)."""
    if node.kind == "and":
        return f"({_render_fq(node.args[0])} AND {_render_fq(node.args[1])})"
    if node.kind == "or":
        return f"({_render_fq(node.args[0])} OR {_render_fq(node.args[1])})"
    if node.kind == "not":
        return f"(NOT {_render_fq(node.args[0])})"
    fld, op, vals = node.args
    if op == "=":
        v = vals[0]
        if isinstance(v, str) and _RANGE_VAL_RE.match(v):
            return f"{fld}:{v}"
        if isinstance(v, str) and v.startswith("(") and v.endswith(")"):
            # field-scoped raw syntax: distribute the field over bare terms
            # is the parser's job; fq strings keep the default-field form
            raise ValueError(
                f"raw Solr syntax on non-text field {fld!r} is not "
                f"supported on the scored path's filter side")
        return f"{fld}:{_q_str(v)}"
    if op == "<>":
        return f"(NOT {fld}:{_q_str(vals[0])})"
    if op == ">":
        return f"{fld}:{{{vals[0]} TO *]"
    if op == ">=":
        return f"{fld}:[{vals[0]} TO *]"
    if op == "<":
        return f"{fld}:[* TO {vals[0]}}}"
    if op == "<=":
        return f"{fld}:[* TO {vals[0]}]"
    if op == "in":
        return "(" + " OR ".join(f"{fld}:{_q_str(v)}" for v in vals) + ")"
    if op == "like":
        pat = str(vals[0]).replace("%", "*").replace("_", "?")
        return f"{fld}:{pat}"
    if op == "between":
        return f"{fld}:[{vals[0]} TO {vals[1]}]"
    if op == "isnull":
        return f"(NOT {fld}:*)"
    raise ValueError(f"unsupported operator {op!r} on the scored path")


def _text_query(vals: list) -> str:
    """Text-field equality value -> the scored-surface q string."""
    v = str(vals[0])
    if v.startswith("(") and v.endswith(")"):
        return v[1:-1]          # injected Solr syntax, default-field scoped
    if " " in v:
        return f'"{v}"'         # phrase search
    return v


def solr_sql_search(spark, reader, sql: str,
                    text_fields: set[str] | None = None,
                    table: str | None = None, now=None) -> DataFrame:
    """Scored Solr-SQL: the limited-query path of the /sql handler where
    ``score`` is available in the select/ORDER BY list (sql-query.adoc
    'LIMIT Clause' — "Limited queries support score") and the WHERE clause
    compiles to a search against an IndexReader instead of DataFrame
    predicates (SolrTable compiling to a search stream).

    Supported shape: a conjunctive WHERE (top-level AND chain) holding
    EXACTLY ONE text-field predicate — it becomes the ranked ``q`` — with
    every other conjunct rendered to a classic fq string (DocSet-intersected
    before scoring, the q+fq flow); LIMIT required; ORDER BY absent or
    ``score DESC`` (rank order is the contract — re-sorting a ranked page
    is a separate operator, as in json_search); OFFSET/FETCH pages by rank.
    The select list may name result columns (conv_id, turn_idx, docid,
    score, rank) or any stored field (fl join semantics of json_search).
    """
    tf = text_fields or {"text"}
    p = _SqlParser(sql, lambda fld, op, vals: _Pred("leaf", fld, op, vals),
                   allow_score=True)
    stmt = p.statement()
    if table is not None and stmt.table != table:
        raise ValueError(f"unknown table {stmt.table!r} (collection: {table!r})")
    if stmt.group_by or stmt.having or stmt.distinct:
        raise ValueError("scored SQL supports plain SELECT only "
                         "(GROUP BY/DISTINCT run on the unranked path)")
    if any(kind != "col" for kind, _, _ in stmt.items):
        raise ValueError("scored SQL select list must be plain columns")
    if stmt.limit is None:
        raise ValueError(
            "scored SQL requires LIMIT — unlimited queries are the /export "
            "role and do not carry score (sql-query.adoc LIMIT clause)")
    for f_, d in stmt.order_by:
        if f_ != "score" or d != "desc":
            raise ValueError(
                "scored SQL orders by rank; only ORDER BY score DESC is "
                "accepted (re-sorting a ranked page is a separate operator)")

    # flatten the top-level AND chain; one text predicate -> q, rest -> fq
    conjuncts: list[_Pred] = []

    def flatten(n: _Pred) -> None:
        if n.kind == "and":
            flatten(n.args[0])
            flatten(n.args[1])
        else:
            conjuncts.append(n)

    if stmt.where is None:
        raise ValueError("scored SQL needs a text-field predicate in WHERE")
    flatten(stmt.where)
    text_preds = [c for c in conjuncts
                  if c.kind == "leaf" and c.args[0] in tf]
    if len(text_preds) != 1:
        raise ValueError(
            f"scored SQL needs exactly one text-field predicate "
            f"({len(text_preds)} found; text fields: {sorted(tf)})")
    tp = text_preds[0]
    if tp.args[1] != "=":
        raise ValueError("text-field predicate must be an equality search")
    filters = [_render_fq(c) for c in conjuncts if c is not tp]

    from solr_spark.query.jsonapi import json_search

    body: dict = {"query": _text_query(tp.args[2]), "limit": stmt.limit}
    if filters:
        body["filter"] = filters
    if stmt.offset:
        body["offset"] = stmt.offset
    if now is not None:
        body["params"] = {"NOW": now}
    fields = [spec for _, spec, _ in stmt.items]
    if fields:
        body["fields"] = fields
    out = json_search(spark, reader, body)
    # apply select aliases (json_search returns source-named columns)
    return out.select(*[F.col(spec).alias(alias)
                        for _, spec, alias in stmt.items])


__all__ = ["solr_sql", "solr_sql_search"]
