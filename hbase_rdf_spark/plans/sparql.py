"""SPARQL front-end: the subset the reference's query corpus uses.

The reference exposes two SPARQL engines (Jena/ARQ and Sesame) over its
pattern-scan layer (reference: nl/vu/jena/, nl/vu/datalayer/hbase/sail/).
Their observable query surface — the 13 quad queries in
reference: data/test-queries.rq, the BSBM mixes in
reference: examples/BSBMQueries.java:5-76 — uses: PREFIX declarations,
prefixed names, the ``a`` keyword, SELECT [DISTINCT|REDUCED], ASK,
DESCRIBE, CONSTRUCT, FROM <g> / GRAPH clauses, basic graph patterns,
FILTER with numeric / equality / var-vs-var (±constant) comparisons and
langMatches(lang()), OPTIONAL, UNION, ORDER BY, LIMIT/OFFSET. Aggregates
(COUNT/SUM/AVG/MIN/MAX + GROUP BY/HAVING) are carried from the Sesame path,
which evaluated them in its in-memory store
(reference: sail/HBaseSailConnection.java:11-87 imports, :522-576) —
here they lower to a real distributed groupBy.

This module parses exactly that subset (recursive descent, no deps) and
compiles it onto the set-oriented BGP executor — SPARQL text in,
DataFrame out. Where ARQ ran a client-side iterator chain, every clause
here lowers to DataFrame algebra: BGP → joins (J2), FILTER → column
predicates pushed by Catalyst (J6/J7), OPTIONAL → left join, UNION →
unionByName, ORDER+LIMIT → TakeOrderedAndProject (the reference's TopN
transform, reference: nl/vu/jena/sparql/engine/optimizer/HBaseOptimize.java:103-104).

Property paths support the +, * and ? modifiers (transitive closure
via iterative frontier joins; '?' reachable through the Bgp API since
the token clashes with variable syntax). Unsupported (deliberately):
subqueries, path sequences/alternatives.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from hbase_rdf_spark.plans.bgp import Bgp, Filter, VarFilter, execute_bgp, materialize

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_TOKEN_RX = re.compile(
    r"""
    (?P<iri><[^<>]*>)
  | (?P<literal>"(?:[^"\\]|\\.)*"(?:@[A-Za-z-]+|\^\^<[^<>]*>)?)
  | (?P<squote>'(?:[^'\\]|\\.)*')
  | (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
  | (?P<num>-?[0-9]+(?:\.[0-9]+)?)
  | (?P<pname>[A-Za-z_][A-Za-z0-9_-]*:[A-Za-z0-9_][A-Za-z0-9_.-]*|[A-Za-z_][A-Za-z0-9_-]*:)
  | (?P<punct>[{}()*.,;])
  | (?P<op><=|>=|!=|=|<|>|&&|\|\||[+-])
  | (?P<word>[A-Za-z_][A-Za-z0-9_-]*)
    """,
    re.VERBOSE,
)

_NUM_DT = re.compile(
    r"\^\^<http://www\.w3\.org/2001/XMLSchema#"
    r"(double|float|decimal|integer|long|int|short|byte)>$"
)

_AGG_FUNCS = {"COUNT", "SUM", "AVG", "MIN", "MAX", "GROUP_CONCAT", "SAMPLE"}


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
class Aggregate:
    func: str  # COUNT | SUM | AVG | MIN | MAX
    var: str | None  # None = COUNT(*)
    alias: str
    distinct: bool = False


@dataclass
class LangFilter:
    """FILTER langMatches(lang(?v), 'range') — needs the literal label,
    so it evaluates via one id2term join after the BGP (late-bound lang,
    the J12 ``lang()``/``langMatches`` functions of the reference)."""

    var: str
    range: str


@dataclass
class Query:
    variables: list[str]  # projected ?vars ('*' expanded at exec)
    form: str = "select"  # select | ask | describe
    distinct: bool = False
    patterns: list[Bgp] = field(default_factory=list)
    optional: list[Bgp] = field(default_factory=list)
    union_blocks: list[list[Bgp]] = field(default_factory=list)
    filters: list[Filter] = field(default_factory=list)
    lang_filters: list[LangFilter] = field(default_factory=list)
    aggregates: list[Aggregate] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    describe_target: object = None  # '?var' or constant term
    construct_template: list[Bgp] = field(default_factory=list)
    having: tuple | None = None  # (?aggAlias, op, number)
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # (var, asc)
    limit: int | None = None
    offset: int | None = None


class _Parser:
    def __init__(self, tokens: list[str]):
        self.t = tokens
        self.i = 0
        self.prefixes: dict[str, str] = {}

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
    def _expand_pname(self, tok: str):
        pfx, _, local = tok.partition(":")
        if pfx not in self.prefixes:
            raise SparqlSyntaxError(f"undeclared prefix {pfx!r} in {tok}")
        return self.prefixes[pfx] + local

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
            if suffix.startswith("@"):
                # language-tagged literal: stored in N-Triples lexical
                # form '"lex"@lang' (see sources/ntriples.py quads())
                return (f'"{lex}"{suffix}', 1)
            if suffix.startswith("^^"):
                # non-numeric typed literal: quoted N-Triples lexical
                # form, exactly how sources/ntriples.py quads() stores it
                return (f'"{lex}"{suffix}', 1)
            return (lex, 1)
        if ":" in tok:
            return self._expand_pname(tok)
        try:
            return float(tok)
        except ValueError:
            raise SparqlSyntaxError(f"unexpected term {tok}")

    def _pred_term(self):
        """Predicate position: the ``a`` keyword means rdf:type."""
        if self.peek() == "a":
            self.next()
            return RDF_TYPE
        return self.term()

    # -- query ----------------------------------------------------------
    def parse(self) -> Query:
        while self.kw("PREFIX"):
            name = self.next()
            if not name.endswith(":"):
                raise SparqlSyntaxError(f"bad prefix declaration {name!r}")
            iri = self.next()
            self.prefixes[name[:-1]] = iri[1:-1]

        head = self.next().upper()
        if head == "SELECT":
            q = Query(variables=[])
            self._select_clause(q)
        elif head == "ASK":
            q = Query(variables=[], form="ask")
        elif head == "DESCRIBE":
            q = Query(variables=[], form="describe")
            tok = self.peek()
            if tok is not None and tok.startswith("?"):
                q.describe_target = self.next()
            else:
                q.describe_target = self.term()
        elif head == "CONSTRUCT":
            q = Query(variables=[], form="construct")
            self.expect("{")
            tmpl = Query(variables=[])
            self._group(tmpl, None)
            self.expect("}")
            q.construct_template = tmpl.patterns
        else:
            raise SparqlSyntaxError(f"unsupported query form {head}")

        default_graph = None
        if self.kw("FROM"):
            g = self.next()
            default_graph = g[1:-1] if g.startswith("<") else g
        if q.form in ("select", "describe", "construct"):
            if q.form == "describe" and self.peek() is None:
                return q  # DESCRIBE <iri> with no pattern
            self.expect("WHERE")
        else:
            self.kw("WHERE")  # ASK WHERE { } — WHERE optional
        self.expect("{")
        self._group(q, default_graph)
        self.expect("}")
        self._modifiers(q)
        return q

    def _select_clause(self, q: Query) -> None:
        # REDUCED permits-but-does-not-require dedup; hash-based
        # dropDuplicates costs the same either way, so both lower to
        # DISTINCT (the reference's DISTINCT→REDUCED transform inverted,
        # reference: optimizer/HBaseOptimize.java:106-107)
        if self.kw("DISTINCT") or self.kw("REDUCED"):
            q.distinct = True
        while True:
            tok = self.peek()
            if tok == "*":
                self.next()
                break
            if tok is not None and tok.startswith("?"):
                q.variables.append(self.next())
            elif tok == "(":
                self.next()
                func = self.next().upper()
                if func not in _AGG_FUNCS:
                    raise SparqlSyntaxError(f"unsupported aggregate {func}")
                self.expect("(")
                distinct = self.kw("DISTINCT")
                v = None
                if self.peek() == "*":
                    self.next()
                    if func != "COUNT":
                        raise SparqlSyntaxError(f"{func}(*) is not valid")
                else:
                    v = self.next()
                    if not v.startswith("?"):
                        raise SparqlSyntaxError("aggregate argument must be a var")
                self.expect(")")
                self.expect("AS")
                alias = self.next()
                if not alias.startswith("?"):
                    raise SparqlSyntaxError("aggregate alias must be a var")
                self.expect(")")
                q.aggregates.append(Aggregate(func, v, alias, distinct))
                q.variables.append(alias)
            else:
                break

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
                self._subgroup(sub, g)
                self.expect("}")
                q.patterns.extend(sub.patterns)
                q.optional.extend(sub.optional)
                q.filters.extend(sub.filters)
                q.lang_filters.extend(sub.lang_filters)
            elif up == "OPTIONAL":
                self.next()
                self.expect("{")
                sub = Query(variables=[])
                self._subgroup(sub, graph)
                self.expect("}")
                q.optional.extend(sub.patterns)
            elif up == "FILTER":
                self.next()
                self._filter(q)
            elif tok == "{":
                # braced block, possibly a UNION chain
                self.next()
                sub = Query(variables=[])
                self._subgroup(sub, graph)
                self.expect("}")
                blocks = [sub.patterns]
                while self.peek() is not None and self.peek().upper() == "UNION":
                    self.next()
                    self.expect("{")
                    alt = Query(variables=[])
                    self._subgroup(alt, graph)
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
                p = self._pred_term()
                path_mod = None
                if self.peek() in ("+", "*"):
                    # property path modifiers (transitive closure /
                    # zero-or-more; the reference evaluated paths via
                    # stock ARQ after its path-flattening transform,
                    # HBaseOptimize.java:111)
                    path_mod = self.next()
                o = self.term()
                q.patterns.append(Bgp(s, p, o, g=graph, path_mod=path_mod))
                if self.peek() == ".":
                    self.next()

    def _subgroup(self, sub: "Query", graph) -> None:
        self._group(sub, graph)

    # -- filters --------------------------------------------------------
    def _filter(self, q: Query) -> None:
        tok = self.peek()
        if tok is not None and tok.lower() == "langmatches":
            self.next()
            self.expect("(")
            fn = self.next()
            if fn.lower() != "lang":
                raise SparqlSyntaxError("expected lang(?var) in langMatches")
            self.expect("(")
            v = self.next()
            self.expect(")")
            self.expect(",")
            rng = self.next()
            if rng.startswith("'") or rng.startswith('"'):
                rng = rng.strip("'\"")
            self.expect(")")
            q.lang_filters.append(LangFilter(v, rng))
            return
        self.expect("(")
        self._filter_expr(q)
        self.expect(")")

    def _operand(self):
        """var | number | constant term, with optional ± constant."""
        paren = self.peek() == "("
        if paren:
            self.next()
        base = self.term()
        offset = 0.0
        while self.peek() in ("+", "-"):
            sign = 1.0 if self.next() == "+" else -1.0
            off = self.term()
            if not isinstance(off, (int, float)):
                raise SparqlSyntaxError("arithmetic offset must be numeric")
            offset += sign * float(off)
        if paren:
            self.expect(")")
        return base, offset

    _FLIP = {"<": ">", ">": "<", "<=": ">=", ">=": "<=", "=": "=", "!=": "!="}

    def _filter_expr(self, q: Query) -> None:
        while True:
            lhs, l_off = self._operand()
            op = self.next()
            rhs, r_off = self._operand()
            if not (isinstance(lhs, str) and lhs.startswith("?")):
                # constant-on-the-left form (BSBM Q5): flip the comparison
                lhs, rhs = rhs, lhs
                l_off, r_off = r_off, l_off
                op = self._FLIP.get(op)
                if op is None:
                    raise SparqlSyntaxError("unsupported FILTER operator")
            if not (isinstance(lhs, str) and lhs.startswith("?")):
                raise SparqlSyntaxError("FILTER needs a variable operand")
            if isinstance(rhs, str) and rhs.startswith("?"):
                q.filters.append(
                    VarFilter(lhs, op, 0.0, other=rhs, offset=r_off - l_off)
                )
            elif isinstance(rhs, (int, float)):
                q.filters.append(Filter(lhs, op, float(rhs) + r_off - l_off))
            elif op in ("=", "!=") and isinstance(rhs, (str, tuple)):
                # constant (in)equality: bind into the pattern set via an
                # equality filter on the encoded id — J6's constant binding
                q.filters.append(_TermFilter(lhs, op, rhs))
            else:
                raise SparqlSyntaxError(f"unsupported FILTER on {rhs!r}")
            if self.peek() == "&&":
                self.next()
                continue
            break

    def _modifiers(self, q: Query) -> None:
        if self.kw("GROUP"):
            self.expect("BY")
            while self.peek() is not None and self.peek().startswith("?"):
                q.group_by.append(self.next())
            if self.kw("HAVING"):
                # HAVING ( ?aggAlias op number ) — post-aggregation filter
                self.expect("(")
                v = self.next()
                if not v.startswith("?"):
                    raise SparqlSyntaxError("HAVING operand must be a var")
                op = self.next()
                num = self.term()
                if not isinstance(num, (int, float)):
                    raise SparqlSyntaxError("HAVING comparison must be numeric")
                self.expect(")")
                q.having = (v, op, float(num))
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


# ---------------------------------------------------------------------------
# execution
# ---------------------------------------------------------------------------

_LANG_RX = r'^".*"@([A-Za-z0-9-]+)$'


def _apply_lang_filters(result: DataFrame, store, lang_filters) -> DataFrame:
    """langMatches(lang(?v), 'rng') via one id2term join per filter var.

    The literal's language tag lives in its stored lexical form
    '"lex"@lang'; an id-join recovers it without materializing the whole
    binding set.
    """
    for lf in lang_filters:
        name = lf.var[1:]
        d = store.id2term().select(
            F.col("id").alias(f"__{name}_lid"),
            F.col("label").alias(f"__{name}_llabel"),
        )
        result = result.join(
            d, result[name].getField("id") == d[f"__{name}_lid"], "left"
        )
        lang = F.when(
            F.col(f"__{name}_llabel").rlike(_LANG_RX),
            F.lower(F.regexp_extract(F.col(f"__{name}_llabel"), _LANG_RX, 1)),
        ).otherwise(F.lit(""))
        rng = lf.range.lower()
        if rng == "*":
            cond = lang != ""
        else:
            cond = (lang == rng) | lang.startswith(rng + "-")
        result = result.filter(cond).drop(f"__{name}_lid", f"__{name}_llabel")
    return result


def _agg_expr(a: Aggregate):
    if a.func == "COUNT":
        if a.var is None:
            return F.count(F.lit(1)).alias(a.alias[1:])
        col = F.col(a.var[1:])
        return (
            F.countDistinct(col) if a.distinct else F.count(col)
        ).alias(a.alias[1:])
    if a.func in ("GROUP_CONCAT", "SAMPLE"):
        # label-space aggregates: operate on the pre-materialized lexical
        # column (see the label-attach step in execute()). Deterministic:
        # GROUP_CONCAT sorts its members; SAMPLE picks the minimum.
        lbl = F.col(f"__{a.var[1:]}_lbl")
        if a.func == "SAMPLE":
            return F.min(lbl).alias(a.alias[1:])
        members = F.collect_set(lbl) if a.distinct else F.collect_list(lbl)
        return F.concat_ws(" ", F.sort_array(members)).alias(a.alias[1:])
    num = F.col(a.var[1:]).getField("num")
    fn = {"SUM": F.sum, "AVG": F.avg, "MIN": F.min, "MAX": F.max}[a.func]
    return fn(num).alias(a.alias[1:])


def _attach_labels(result, store, var_names):
    """Join the lexical label for each var (numeric fallback) as
    ``__{v}_lbl`` — needed by label-space aggregates BEFORE grouping."""
    for v in var_names:
        d = store.id2term().select(
            F.col("id").alias(f"__{v}_aid"), F.col("label").alias(f"__{v}_albl")
        )
        result = (
            result.join(
                d, result[v].getField("id") == d[f"__{v}_aid"], "left"
            )
            .withColumn(
                f"__{v}_lbl",
                F.coalesce(
                    F.col(f"__{v}_albl"),
                    F.col(v).getField("num").cast("string"),
                ),
            )
            .drop(f"__{v}_aid", f"__{v}_albl")
        )
    return result


def _describe(store, q: Query, bindings: DataFrame | None) -> DataFrame:
    """DESCRIBE: all triples whose subject is the described resource(s) —
    the subject-triples handler of the reference (J11, execDescribeTriples,
    reference: examples/RunJenaHBase.java:93-98)."""
    from hbase_rdf_spark.plans.patterns import encode_term

    if isinstance(q.describe_target, str) and q.describe_target.startswith("?"):
        assert bindings is not None
        name = q.describe_target[1:]
        ids = bindings.select(
            F.col(name).getField("id").alias("s")
        ).distinct()
    else:
        term = q.describe_target
        lex = term if isinstance(term, str) else term[0]
        kind = 0 if isinstance(term, str) else term[1]
        ids = store.spark.range(1).select(encode_term(lex, kind).alias("s"))
    triples = store.index("spo").join(ids, "s", "left_semi")
    i2t = store.id2term()
    out = triples
    for pos in ("s", "p", "o"):
        d = i2t.select(
            F.col("id").alias(f"__{pos}_id"), F.col("label").alias(f"__{pos}_l")
        )
        out = out.join(d, out[pos] == d[f"__{pos}_id"], "left")
    # a DESCRIBE result is a GRAPH (set of triples): the same fact
    # asserted in several contexts must appear once
    return out.select(
        F.col("__s_l").alias("s"),
        F.col("__p_l").alias("p"),
        F.coalesce(F.col("__o_l"), F.col("o_num").cast("string")).alias("o"),
    ).dropDuplicates()


def _construct(store, q: Query, bindings: DataFrame) -> DataFrame:
    """CONSTRUCT: instantiate the template once per binding, union the
    per-pattern projections, distinct — stock-ARQ semantics (J11)."""
    def _is_var(e):
        return isinstance(e, str) and e.startswith("?")

    tmpl_vars = sorted(
        {
            e[1:]
            for pat in q.construct_template
            for e in (pat.s, pat.p, pat.o)
            if _is_var(e)
        }
    )
    mat = materialize(bindings, store, [f"?{v}" for v in tmpl_vars])

    def render(e):
        if _is_var(e):
            return F.col(e[1:])
        if isinstance(e, tuple):
            return F.lit(e[0])
        return F.lit(str(e))

    out = None
    for pat in q.construct_template:
        rowset = mat.select(
            render(pat.s).alias("s"),
            render(pat.p).alias("p"),
            render(pat.o).alias("o"),
        )
        out = rowset if out is None else out.unionByName(rowset)
    assert out is not None, "empty CONSTRUCT template"
    # a binding with an unbound (OPTIONAL) var yields no triple for
    # patterns using it, per SPARQL semantics
    return out.filter(
        F.col("s").isNotNull() & F.col("p").isNotNull() & F.col("o").isNotNull()
    ).dropDuplicates()


def execute(store, query: str | Query) -> DataFrame:
    """SPARQL text → materialized DataFrame (one string column per var)."""
    q = parse(query) if isinstance(query, str) else query

    def run_block(patterns: list[Bgp]) -> DataFrame:
        return execute_bgp(
            store, patterns, filters=list(q.filters), optional=list(q.optional)
        )

    if q.form == "describe" and not q.patterns and not q.union_blocks:
        return _describe(store, q, None)

    if q.union_blocks:
        blocks = [run_block(q.patterns + b) for b in q.union_blocks]
        result = blocks[0]
        for b in blocks[1:]:
            result = result.unionByName(b, allowMissingColumns=True)
    else:
        result = run_block(q.patterns)

    if q.lang_filters:
        result = _apply_lang_filters(result, store, q.lang_filters)

    if q.form == "ask":
        n = result.limit(1).count()
        return store.spark.createDataFrame([(n > 0,)], "ask boolean")
    if q.form == "describe":
        return _describe(store, q, result)
    if q.form == "construct":
        return _construct(store, q, result)

    if q.aggregates:
        gvars = [v[1:] for v in q.group_by]
        label_vars = sorted({
            a.var[1:] for a in q.aggregates
            if a.func in ("GROUP_CONCAT", "SAMPLE") and a.var
        })
        if label_vars:
            result = _attach_labels(result, store, label_vars)
        aggs = [_agg_expr(a) for a in q.aggregates]
        grouped = (
            result.groupBy(*gvars).agg(*aggs) if gvars else result.agg(*aggs)
        )
        if q.having:
            v, op, num = q.having
            col = F.col(v[1:])
            grouped = grouped.filter(
                {
                    "<": col < num, "<=": col <= num, ">": col > num,
                    ">=": col >= num, "=": col == num, "!=": col != num,
                }[op]
            )
        # materialize group vars; aggregate columns pass through verbatim
        out = materialize(
            grouped, store, [f"?{g}" for g in gvars],
            keep=[a.alias[1:] for a in q.aggregates],
        )
        projected = [
            v[1:] for v in (q.variables or [f"?{c}" for c in out.columns])
        ]
        out = out.select(*projected)
    else:
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
