"""Solr `lucene`-syntax query parser → Catalyst Column predicates.

Covers the classic query-parser surface the reference exposes for FILTER semantics
(fq / non-scored q): field terms, quoted phrases, ranges `[a TO b]` / `{a TO b}`,
wildcards `*`/`?`, regex `/…/`, fuzzy `term~N`, boolean AND/OR/NOT (&&, ||, !, unary
+/-), and parentheses. Reference grammar: the JavaCC file
solr/core/src/java/org/apache/solr/parser/QueryParser.jj, wired via
search/QParser.java:364; boolean containers per search/BoolQParserPlugin.java.

Scored retrieval (`q` with ranking) funnels into the BM25 kernel
(solr_spark.query.bm25) instead — this module produces *predicates*, the analog of
Solr's fq DocSets (search/SolrIndexSearcher.java:1254 getProcessedFilter), which
Catalyst then pushes down to the parquet/Iceberg scan (PushedFilters).

Typing: values compare as the column's native type — numeric literals are emitted
un-quoted so Catalyst's implicit casts apply; `text_fields` get substring semantics
for bare terms/phrases (analyzed-field analog), other fields get equality.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(
    r"""\s*(?:
      (?P<lparen>\()
    | (?P<rparen>\))
    | (?P<and>AND\b|&&)
    | (?P<or>OR\b|\|\|)
    | (?P<not>NOT\b|!)
    | (?P<plus>\+)
    | (?P<minus>-(?=[\w"(\[{*/]))
    | (?P<range>(?P<fld_r>[\w.]+):(?P<lb>[\[{])\s*(?P<lo>[^\s\]}]+)\s+TO\s+(?P<hi>[^\s\]}]+)\s*(?P<rb>[\]}]))
    | (?P<regexq>(?P<fld_re>[\w.]+):/(?P<rx>[^/]*)/)
    | (?P<phrase>(?:(?P<fld_p>[\w.]+):)?"(?P<ph>[^"]*)"
        (?:~(?P<pslop>\d+))?(?:\^(?P<pboost>\d+(?:\.\d+)?))?)
    | (?P<term>(?:(?P<fld_t>[\w.]+):)?(?P<val>[^\s()"]+))
    )""",
    re.VERBOSE,
)

_NUM_RE = re.compile(r"^-?\d+(\.\d+)?$")
# a range endpoint that is Solr date math: NOW[...ops] or an ISO-8601 Z
# instant optionally followed by /ROUND and +/-N UNIT ops
# (util/DateMathParser.java:91 — `ts:[NOW-7DAYS TO *]`, `ts:[NOW/DAY TO NOW]`)
_DATEMATH_RE = re.compile(
    r"^(NOW|\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?Z)([/+-].*)?$")


@dataclass
class _Tok:
    kind: str
    m: re.Match


def _lex(q: str) -> list[_Tok]:
    toks, pos = [], 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m or m.end() == pos:
            if q[pos:].strip():
                raise ValueError(f"cannot lex query at: {q[pos:]!r}")
            break
        pos = m.end()
        toks.append(_Tok(m.lastgroup or "term", m))
    return toks


class LuceneQueryParser:
    """Recursive-descent parser for the classic syntax subset.

    default_field: field for bare terms; text_fields: fields whose term/phrase
    predicates use substring (contains) semantics instead of equality.
    `now` anchors the NOW token of date-math range endpoints
    (`ts:[NOW-7DAYS TO *]`) — an ISO string or timestamp Column; None binds
    NOW to query-compilation current_timestamp(), mirroring Solr's
    request-scoped NOW param (pass a fixed instant for determinism).
    """

    def __init__(self, default_field: str, text_fields: set[str] | None = None,
                 now=None):
        self.default_field = default_field
        self.text_fields = text_fields or set()
        self.now = now

    def parse(self, query: str) -> Column:
        self._toks = _lex(query)
        self._i = 0
        col = self._or_expr()
        if self._i != len(self._toks):
            raise ValueError(f"trailing tokens in query: {query!r}")
        return col

    # grammar: or := and (OR and)* ; and := unary ((AND)? unary)*  (implicit AND
    # — Solr's default operator in filter context is effectively conjunctive for fq
    # chains; q.op=OR exists but we pin AND for predictability)
    def _peek(self) -> _Tok | None:
        return self._toks[self._i] if self._i < len(self._toks) else None

    def _or_expr(self) -> Column:
        left = self._and_expr()
        while (t := self._peek()) and t.kind == "or":
            self._i += 1
            left = left | self._and_expr()
        return left

    def _and_expr(self) -> Column:
        left = self._unary()
        while (t := self._peek()) and t.kind not in ("or", "rparen"):
            if t.kind == "and":
                self._i += 1
            left = left & self._unary()
        return left

    def _unary(self) -> Column:
        t = self._peek()
        if t is None:
            raise ValueError("unexpected end of query")
        if t.kind in ("not", "minus"):
            self._i += 1
            return ~self._unary()
        if t.kind == "plus":
            self._i += 1
            return self._unary()
        if t.kind == "lparen":
            self._i += 1
            col = self._or_expr()
            if not (self._peek() and self._peek().kind == "rparen"):
                raise ValueError("unbalanced parenthesis")
            self._i += 1
            return col
        self._i += 1
        return self._leaf(t)

    # ---- leaves -------------------------------------------------------------
    def _lit(self, s: str):
        if _NUM_RE.match(s):
            return F.lit(float(s) if "." in s else int(s))
        return F.lit(s)

    def _range_endpoint(self, s: str):
        if _DATEMATH_RE.match(s):
            from solr_spark.functions.datemath import date_math

            return date_math(s, now=self.now)
        return self._lit(s)

    def _leaf(self, t: _Tok) -> Column:
        m = t.m
        if t.kind == "range":
            fld = F.col(m["fld_r"])
            col = None
            if m["lo"] != "*":
                lo = self._range_endpoint(m["lo"])
                col = (fld >= lo) if m["lb"] == "[" else (fld > lo)
            if m["hi"] != "*":
                hi = self._range_endpoint(m["hi"])
                c2 = (fld <= hi) if m["rb"] == "]" else (fld < hi)
                col = c2 if col is None else (col & c2)
            return col if col is not None else fld.isNotNull()
        if t.kind == "regexq":
            return F.col(m["fld_re"]).rlike(m["rx"])
        if t.kind == "phrase":
            fld = m["fld_p"] or self.default_field
            ph = m["ph"]
            if fld in self.text_fields:
                return F.col(fld).contains(ph)
            return F.col(fld) == F.lit(ph)
        # plain term, possibly wildcard / fuzzy / ^boosted
        fld = m["fld_t"] or self.default_field
        val = m["val"]
        # `term^2` boosts affect SCORING only; in filter (fq/DocSet) context
        # the reference ignores them — strip and match the bare term
        boosted = re.match(r"^(.+)\^\d+(?:\.\d+)?$", val)
        if boosted:
            val = boosted.group(1)
        fuzzy = re.match(r"^(.*?)~(\d*)$", val)
        if fuzzy and fuzzy.group(1):
            dist = int(fuzzy.group(2) or 2)
            return F.levenshtein(F.col(fld), F.lit(fuzzy.group(1))) <= dist
        if "*" in val or "?" in val:
            # wildcard → SQL LIKE (escape %/_ first)
            like = (val.replace("\\", "\\\\").replace("%", r"\%")
                       .replace("_", r"\_").replace("*", "%").replace("?", "_"))
            return F.col(fld).like(like)
        if fld in self.text_fields:
            # analyzed-term analog: token match via word-boundary regex
            return F.col(fld).rlike(rf"(^|\W){re.escape(val)}(\W|$)")
        return F.col(fld) == self._lit(val)


def parse_query(query: str, default_field: str,
                text_fields: set[str] | None = None) -> Column:
    """One-shot helper: Solr classic query string -> Column predicate."""
    return LuceneQueryParser(default_field, text_fields).parse(query)


def switch_query(value: str | None, cases: dict[str, str],
                 default_field: str, text_fields: set[str] | None = None,
                 default: str | None = None, now=None) -> Column:
    """`{!switch}` qparser: select one of several predefined queries by an
    input value (search/SwitchQParserPlugin.java:119 — `case.<val>` local
    params, `case` for blank input, `default` fallback).

    Request-templating helper: `cases` maps trimmed input values to classic
    query strings (the empty-string key is the blank-input `case` param);
    an unmatched value without a `default` raises, as the reference's 400
    does. The chosen string compiles through LuceneQueryParser, so the
    result is an ordinary pushed predicate.
    """
    key = (value or "").strip()
    q = cases.get(key, default)
    if q is None:
        raise ValueError(
            f"switch: no case matches input {key!r} and no default "
            f"(cases: {sorted(cases)})")
    return LuceneQueryParser(default_field, text_fields, now=now).parse(q)


def simple_query(query: str, default_field: str,
                 text_fields: set[str] | None = None,
                 default_op: str = "OR") -> Column:
    """`{!simple}` qparser: Lucene SimpleQueryParser's end-user grammar —
    `+`/AND, `|`/OR, `-`/NOT, `"phrase"`, trailing `*` prefix, `term~N`
    fuzzy, `(...)` precedence, `\\` escape — with its defining property:
    it NEVER throws. Malformed operator usage degrades to literal terms
    (search/SimpleQParserPlugin.java:65; Lucene SimpleQueryParser).

    Filter-predicate analog of the reference (this engine's scored surface
    is bm25_topk/edismax): terms compile through the classic parser's leaf
    semantics against `default_field`. An input that reduces to nothing
    (empty / operators only) matches everything, as the reference's empty
    query does.
    """
    tf = text_fields if text_fields is not None else {default_field}
    leaf_parser = LuceneQueryParser(default_field, tf)

    # tokenize: phrases, parens, operators, escaped chars, bare terms
    toks: list[tuple[str, str]] = []
    i, n = 0, len(query)
    while i < n:
        c = query[i]
        if c.isspace():
            i += 1
            continue
        if c == '"':
            j = i + 1
            buf = []
            while j < n and query[j] != '"':
                buf.append(query[j])
                j += 1
            if j < n:           # closed phrase
                toks.append(("phrase", "".join(buf)))
                i = j + 1
            else:               # unterminated quote -> literal degradation
                toks.append(("term", "".join(buf)))
                i = n
            continue
        if c in "+&":
            toks.append(("and", c)); i += 1
            continue
        if c == "|":
            toks.append(("or", c)); i += 1
            continue
        if c == "-":
            toks.append(("not", c)); i += 1
            continue
        if c in "()":
            toks.append(("lparen" if c == "(" else "rparen", c)); i += 1
            continue
        # bare term (handles \ escapes, trailing * and ~N inside the leaf)
        j, buf = i, []
        while j < n and not query[j].isspace() and query[j] not in '+|-()"&':
            if query[j] == "\\" and j + 1 < n:
                buf.append(query[j + 1]); j += 2
            else:
                buf.append(query[j]); j += 1
        toks.append(("term", "".join(buf)))
        i = j

    def leaf_col(kind: str, text: str) -> Column | None:
        if not text:
            return None
        try:
            if kind == "phrase":
                return leaf_parser.parse(f'"{text}"')
            if default_field in tf:
                # word-level multiterm semantics on analyzed fields: the
                # classic parser's wildcard/fuzzy leaves compare the whole
                # stored value; SimpleQueryParser operators apply per TOKEN
                import re as _re2
                fz = _re2.match(r"^(.+?)~(\d*)$", text)
                if fz and fz.group(1) and not any(c in fz.group(1) for c in "*?"):
                    dist = int(fz.group(2) or 2)
                    return F.exists(
                        F.split(F.col(default_field), r"\s+"),
                        lambda t: F.levenshtein(t, F.lit(fz.group(1))) <= dist)
                if "*" in text or "?" in text:
                    pat = "".join(r"\w*" if c == "*" else r"\w" if c == "?"
                                  else _re2.escape(c) for c in text)
                    return F.col(default_field).rlike(
                        rf"(^|\W){pat}(\W|$)")
            return leaf_parser.parse(text)
        except ValueError:
            # never-throws contract: unparseable leaf -> literal equality
            return F.col(default_field) == F.lit(text)

    # recursive descent with graceful degradation: operators missing an
    # operand are dropped, unbalanced parens close at end-of-input
    pos = 0

    def expr() -> Column | None:
        nonlocal pos
        out: Column | None = None  # positive clauses (SHOULD/MUST chain)
        neg: Column | None = None  # MUST_NOT conjunction for this group
        pending_op = None          # "and" | "or" | None (whitespace=default)
        negate_next = False
        while pos < len(toks):
            kind, text = toks[pos]
            if kind == "rparen":
                break
            pos += 1
            if kind in ("and", "or"):
                pending_op = kind
                continue
            if kind == "not":
                negate_next = not negate_next
                continue
            if kind == "lparen":
                sub = expr()
                if pos < len(toks) and toks[pos][0] == "rparen":
                    pos += 1
                col = sub
            else:
                col = leaf_col(kind, text)
            if col is None:
                pending_op, negate_next = None, False
                continue
            if negate_next:
                # Lucene occurs semantics: '-' marks MUST_NOT within the
                # clause group — it excludes regardless of the OR/AND chain
                # the positive clauses form ("a -b" = a AND NOT b)
                neg = ~col if neg is None else (neg & ~col)
                negate_next = False
                pending_op = None
                continue
            if out is None:
                out = col
            elif pending_op == "and" or (pending_op is None
                                         and default_op.upper() == "AND"):
                out = out & col
            else:
                out = out | col
            pending_op = None
        if neg is not None:
            out = neg if out is None else (out & neg)
        return out

    result = expr()
    # trailing tokens after an unmatched ')' degrade: keep OR-ing remaining
    while pos < len(toks):
        if toks[pos][0] == "rparen":
            pos += 1
            continue
        more = expr()
        if more is not None:
            result = more if result is None else (result | more)
    return result if result is not None else F.lit(True)
