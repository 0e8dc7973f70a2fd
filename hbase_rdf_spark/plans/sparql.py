"""SPARQL front-end: the subset the reference's query corpus uses.

The reference exposes two SPARQL engines (Jena/ARQ and Sesame) over its
pattern-scan layer (reference: nl/vu/jena/, nl/vu/datalayer/hbase/sail/).
Their observable query surface — the 13 quad queries in
reference: data/test-queries.rq, the BSBM mixes in
reference: examples/BSBMQueries.java:5-76 — uses: SELECT [DISTINCT],
FROM <g> / GRAPH clauses, basic graph patterns, FILTER with numeric and
equality comparisons, OPTIONAL, UNION, ORDER BY, LIMIT/OFFSET.

This module parses exactly that subset (recursive descent, no deps) and
compiles it onto the set-oriented BGP executor — SPARQL text in,
DataFrame out. Where ARQ ran a client-side iterator chain, every clause
here lowers to DataFrame algebra: BGP → joins (J2), FILTER → column
predicates pushed by Catalyst (J6/J7), OPTIONAL → left join, UNION →
unionByName, ORDER+LIMIT → TakeOrderedAndProject (the reference's TopN
transform, reference: nl/vu/jena/sparql/engine/optimizer/HBaseOptimize.java:103-104).

Unsupported (deliberately, matching the reference's own gaps §2.6):
aggregates, property paths, subqueries, CONSTRUCT/DESCRIBE/ASK.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from hbase_rdf_spark.plans.bgp import Bgp, Filter, execute_bgp, materialize

_TOKEN_RX = re.compile(
    r"""
    (?P<iri><[^<>]*>)
  | (?P<literal>"(?:[^"\\]|\\.)*"(?:@[A-Za-z-]+|\^\^<[^<>]*>)?)
  | (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
  | (?P<num>-?[0-9]+(?:\.[0-9]+)?)
  | (?P<punct>[{}().,;])
  | (?P<op><=|>=|!=|=|<|>|&&|\|\|)
  | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)

_NUM_DT = re.compile(
    r"\^\^<http://www\.w3\.org/2001/XMLSchema#"
    r"(double|float|decimal|integer|long|int|short|byte)>$"
)


def tokenize(q: str) -> list[str]:
    # strip comments
    q = re.sub(r"(?m)^\s*#.*$", "", q)
    out, pos = [], 0
    while pos < len(q):
        if q[pos].isspace():
            pos += 1
            continue
        m = _TOKEN_RX.match(q, pos)
        if not m:
            raise SparqlSyntaxError(f"bad token at: {q[pos:pos + 30]!r}")
        out.append(m.group(0))
        pos = m.end()
    return out


class SparqlSyntaxError(ValueError):
    pass


@dataclass
class Query:
    variables: list[str]  # projected ?vars ('*' expanded at exec)
    distinct: bool = False
    patterns: list[Bgp] = field(default_factory=list)
    optional: list[Bgp] = field(default_factory=list)
    union_blocks: list[list[Bgp]] = field(default_factory=list)
    filters: list[Filter] = field(default_factory=list)
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # (var, asc)
    limit: int | None = None
    offset: int | None = None


class _Parser:
    def __init__(self, tokens: list[str]):
        self.t = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.t[self.i] if self.i < len(self.t) else None

    def next(self) -> str:
        tok = self.peek()
        if tok is None:
            raise SparqlSyntaxError("unexpected end of query")
        self.i += 1
        return tok

    def expect(self, word: str) -> None:
        tok = self.next()
        if tok.upper() != word.upper():
            raise SparqlSyntaxError(f"expected {word}, got {tok}")

    def kw(self, word: str) -> bool:
        tok = self.peek()
        if tok is not None and tok.upper() == word.upper():
            self.i += 1
            return True
        return False

    # -- terms ----------------------------------------------------------
    def term(self):
        """→ '?var' | constant str | (lexical, kind) | float."""
        tok = self.next()
        if tok.startswith("?"):
            return tok
        if tok.startswith("<"):
            return tok[1:-1]  # IRI → entity constant (kind 0)
        if tok.startswith('"'):
            m = re.match(r'^"((?:[^"\\]|\\.)*)"(.*)$', tok)
            lex, suffix = m.group(1), m.group(2)
            lex = lex.replace('\\"', '"').replace("\\\\", "\\")
            if _NUM_DT.search(tok):
                return float(lex)
            if suffix.startswith("^^"):
                # keep full typed-literal lexical form as the term,
                # matching how non-numeric typed literals are stored
                return (f"{lex}{suffix}", 1)
            return (lex, 1)
        try:
            return float(tok)
        except ValueError:
            raise SparqlSyntaxError(f"unexpected term {tok}")

    # -- query ----------------------------------------------------------
    def parse(self) -> Query:
        self.expect("SELECT")
        q = Query(variables=[])
        if self.kw("DISTINCT"):
            q.distinct = True
        while True:
            tok = self.peek()
            if tok == "*":
                self.next()
                break
            if tok is not None and tok.startswith("?"):
                q.variables.append(self.next())
            else:
                break
        default_graph = None
        if self.kw("FROM"):
            g = self.next()
            default_graph = g[1:-1] if g.startswith("<") else g
        self.expect("WHERE")
        self.expect("{")
        self._group(q, default_graph)
        self.expect("}")
        self._modifiers(q)
        return q

    def _group(self, q: Query, graph) -> None:
        while True:
            tok = self.peek()
            if tok is None or tok == "}":
                break
            up = tok.upper()
            if up == "GRAPH":
                self.next()
                g = self.term()
                self.expect("{")
                sub = Query(variables=[])
                self._group(sub, g)
                self.expect("}")
                q.patterns.extend(sub.patterns)
                q.optional.extend(sub.optional)
                q.filters.extend(sub.filters)
            elif up == "OPTIONAL":
                self.next()
                self.expect("{")
                sub = Query(variables=[])
                self._group(sub, graph)
                self.expect("}")
                q.optional.extend(sub.patterns)
            elif up == "FILTER":
                self.next()
                self.expect("(")
                self._filter_expr(q)
                self.expect(")")
            elif tok == "{":
                # braced block, possibly a UNION chain
                self.next()
                sub = Query(variables=[])
                self._group(sub, graph)
                self.expect("}")
                blocks = [sub.patterns]
                while self.peek() is not None and self.peek().upper() == "UNION":
                    self.next()
                    self.expect("{")
                    alt = Query(variables=[])
                    self._group(alt, graph)
                    self.expect("}")
                    blocks.append(alt.patterns)
                if len(blocks) == 1:
                    q.patterns.extend(blocks[0])
                else:
                    q.union_blocks = blocks
            elif tok == ".":
                self.next()
            else:
                s = self.term()
                p = self.term()
                o = self.term()
                q.patterns.append(Bgp(s, p, o, g=graph))
                if self.peek() == ".":
                    self.next()

    def _filter_expr(self, q: Query) -> None:
        while True:
            lhs = self.term()
            op = self.next()
            rhs = self.term()
            if isinstance(lhs, str) and lhs.startswith("?"):
                if isinstance(rhs, (int, float)):
                    q.filters.append(Filter(lhs, op, float(rhs)))
                elif op in ("=", "!=") and isinstance(rhs, (str, tuple)):
                    # constant (in)equality: bind into the pattern set
                    # via an equality filter on the encoded id — J6's
                    # constant-binding rewrite
                    q.filters.append(_TermFilter(lhs, op, rhs))
                else:
                    raise SparqlSyntaxError(f"unsupported FILTER on {rhs!r}")
            else:
                raise SparqlSyntaxError("FILTER lhs must be a variable")
            if self.peek() == "&&":
                self.next()
                continue
            break

    def _modifiers(self, q: Query) -> None:
        if self.kw("ORDER"):
            self.expect("BY")
            while True:
                tok = self.peek()
                if tok is None:
                    break
                up = tok.upper()
                if up in ("ASC", "DESC"):
                    self.next()
                    self.expect("(")
                    v = self.next()
                    self.expect(")")
                    q.order_by.append((v, up == "ASC"))
                elif tok.startswith("?"):
                    q.order_by.append((self.next(), True))
                else:
                    break
        if self.kw("LIMIT"):
            q.limit = int(self.next())
        if self.kw("OFFSET"):
            q.offset = int(self.next())


@dataclass
class _TermFilter(Filter):
    """(in)equality of a var against an entity/string constant."""

    def apply(self, col):  # type: ignore[override]
        from hbase_rdf_spark.plans.patterns import encode_term

        term, kind = (
            (self.value, 0) if isinstance(self.value, str) else self.value
        )
        eq = col.getField("id") == encode_term(term, kind)
        return eq if self.op == "=" else ~eq


def parse(query: str) -> Query:
    return _Parser(tokenize(query)).parse()


def execute(store, query: str | Query) -> DataFrame:
    """SPARQL text → materialized DataFrame (one string column per var)."""
    q = parse(query) if isinstance(query, str) else query

    def run_block(patterns: list[Bgp]) -> DataFrame:
        return execute_bgp(
            store, patterns, filters=list(q.filters), optional=list(q.optional)
        )

    if q.union_blocks:
        blocks = [run_block(q.patterns + b) for b in q.union_blocks]
        result = blocks[0]
        for b in blocks[1:]:
            result = result.unionByName(b, allowMissingColumns=True)
    else:
        result = run_block(q.patterns)

    variables = q.variables or [f"?{c}" for c in result.columns]
    out = materialize(result, store, variables)
    if q.distinct:
        out = out.dropDuplicates()
    if q.order_by:
        out = out.orderBy(
            *[
                F.col(v[1:]).asc() if asc else F.col(v[1:]).desc()
                for v, asc in q.order_by
            ]
        )
    if q.offset:
        out = out.offset(q.offset)
    if q.limit is not None:
        out = out.limit(q.limit)
    return out
