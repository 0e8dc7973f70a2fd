"""SPARQL front-end: the subset the reference's query corpus uses.

The reference exposes two SPARQL engines (Jena/ARQ and Sesame) over its
pattern-scan layer (reference: nl/vu/jena/, nl/vu/datalayer/hbase/sail/).
Their observable query surface — the 13 quad queries in
reference: data/test-queries.rq, the BSBM mixes in
reference: examples/BSBMQueries.java:5-76 — uses: PREFIX declarations,
prefixed names, the ``a`` keyword, SELECT [DISTINCT|REDUCED], ASK,
DESCRIBE, CONSTRUCT, FROM <g> / GRAPH clauses, basic graph patterns,
FILTER expressions, OPTIONAL, UNION, ORDER BY, LIMIT/OFFSET. Aggregates
(COUNT/SUM/AVG/MIN/MAX + GROUP BY/HAVING) are carried from the Sesame path,
which evaluated them in its in-memory store
(reference: sail/HBaseSailConnection.java:11-87 imports, :522-576) —
here they lower to a real distributed groupBy.

This module parses exactly that subset (recursive descent, no deps) and
compiles it onto the set-oriented BGP executor — SPARQL text in,
DataFrame out. Where ARQ ran a client-side iterator chain, every clause
here lowers to DataFrame algebra: BGP → joins (J2), FILTER → column
predicates pushed by Catalyst (J6/J7), OPTIONAL → group-as-unit left
join (ARQ OpConditional), UNION → unionByName (multiple independent
chains distribute over the required patterns), ORDER+LIMIT →
TakeOrderedAndProject (the reference's TopN transform,
reference: nl/vu/jena/sparql/engine/optimizer/HBaseOptimize.java:103-104).
ORDER BY is type-aware per the spec's total order — sort keys derive
from the binding structs (unbound < entities/IRIs < literals; numeric
literals by VALUE, not by their rendered string), with lexical ties
broken on the materialized form; see ``_add_order_sidecars``.

FILTER surface (J12): numeric/var-vs-var comparisons, term
(in)equality, ``&&``/``||``/``!``, ``bound()``,
``isIRI/isURI/isBlank/isLiteral/isNumeric``, ``str()`` comparisons,
``regex()`` and ``langMatches(lang())`` — see plans/filters.py
(reference: optimizer/HBaseOptimize.java:75-93 disjunction expansion,
sail/HBaseQueryVisitor.java:289-313 function stringifiers).

Property paths: ``^p`` inverse, ``p1/p2`` sequence, ``p1|p2``
alternative, and the ``+ * ?`` closures, freely composable with parens
(reference flattens paths via stock ARQ, HBaseOptimize.java:111).
Blank nodes in queries (``_:b``, ``[]``) act as non-projectable
variables, per spec.

Solution-set clauses: ``VALUES`` (in-group and the trailing
ValuesClause after the modifiers, SPARQL 1.1 grammar [28]; inline
table joined on shared vars
via SPARQL compatibility — ``UNDEF`` cells and OPTIONAL-null bindings
match anything and the merge keeps the bound side; new vars extend
bindings), ``MINUS`` (anti-join on shared vars; block filters over
outer-scope vars evaluate those vars as UNBOUND, per the spec's
no-substitution rule — NULL struct columns + three-valued logic),
``FILTER [NOT] EXISTS`` (semi/anti join; uncorrelated → global
emptiness test; correlated block filters join-condition-evaluate
under substitution semantics — numeric/term comparisons AND
label-space predicates, the latter via per-var id2term label
attachment on the substituted side), ``FILTER(?x [NOT]
IN (…))`` (OptimizeIn-style
equality expansion), ``BIND(expr AS ?v)`` (constant terms, variable
copies, numeric arithmetic ``+ - * /`` over vars/numbers, and the
string builtins ``STR/CONCAT/UCASE/LCASE/STRLEN`` — label-space, one
id2term join per referenced var, producing plain-literal bindings
with the in-plan hash id + lexical sidecar; a NULL operand or
division by zero leaves the var unbound, per the SPARQL error→unbound
rule; FILTERs over BIND vars are deferred until after the
assignment). A graph pattern AFTER the BIND may CONSUME its var —
SPARQL's in-group evaluation order Join(Extend(G,v,expr), P): the
consuming patterns (with their var-connected component and the
filters they can answer) evaluate as a separate post-BGP and
compatibility-join back after the Extend (``_post_bind_split``; term
ids are content-addressed, so the computed term carries exactly its
dictionary id and the join is plain struct equality). A consuming
pattern BEFORE the BIND, a collision with an OPTIONAL/UNION/VALUES/
subquery var, and circular input dependencies raise.

Subqueries: nested ``{ SELECT … }`` blocks evaluate bottom-up in ID
SPACE and join the enclosing group on shared variables — the standard
analytic shape (per-group aggregate joined back to detail rows).
Surface: the full group algebra in the WHERE body (BGP/FILTER/
OPTIONAL/UNION/VALUES/BIND/MINUS/EXISTS/nested subqueries)
+ aggregates (incl. the label-space
GROUP_CONCAT/SAMPLE, which export kind-1 structs with a lexical
sidecar; expression arguments ``SUM(?a * ?b)`` desugar to a hidden
pre-grouping Extend; SUM/AVG honour DISTINCT) with GROUP BY/HAVING
and DISTINCT, SELECT expressions over the aggregated frame —
``(?tot / COUNT(?o) AS ?avg)``, inline aggregate calls become hidden
aggregates — plus ORDER BY …
LIMIT/OFFSET top-k slices (type-aware sort keys — aggregate aliases
sort natively, pattern vars on the SPARQL total order with a lexical
tie-break; Catalyst lowers sort+limit to TakeOrderedAndProject, no
full sort); subqueries nest one level into
OPTIONAL/GRAPH/UNION (deeper nesting raises). Property paths work in
every group position — top level, OPTIONAL, UNION branches, GRAPH
with a constant, and GRAPH ?var (per-named-graph pair algebra: the
context id rides the closure as an extra join key, plans/bgp.py
``_path_step``) — matching ARQ's path flattening in the reference
(optimizer/HBaseOptimize.java:28-124). Every group position accepts
the FULL group algebra — VALUES, MINUS, FILTER [NOT] EXISTS,
subqueries mixed with patterns, and nested UNION chains mixed with
other content ({ {A} UNION {B} . C } — joins distribute over the
union): an OPTIONAL block, a UNION branch, a MINUS block, an EXISTS
block, or a bare braced group carrying any of these becomes a
``group``-backed block evaluated through the same GroupGraphPattern
evaluator as a top-level WHERE clause (``_group_bindings``) and
combined (left-/anti-/semi-joined) as a unit.

Dataset semantics: with no dataset clause, patterns scan the
STATEMENT-LEVEL quad view — one solution per containing named graph,
the RDF4J/Sesame repository default the reference's sail layer exposes
(sail/HBaseSailConnection.java getStatements over all contexts). A
triple asserted in k graphs therefore contributes k to non-DISTINCT
aggregates, exactly like the direct BGP API. ``FROM`` switches to the
SPARQL 1.1 §13.2 RDF-merge default graph (set union for ground
triples, dedup in the scan — plans/bgp.py ``_scan_pattern``);
``GRAPH``/``FROM NAMED`` bind or bound the context explicitly.

"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass, field, replace as _dc_replace
from functools import reduce as _reduce

from pyspark.sql import DataFrame, functions as F

from hbase_rdf_spark.plans.bgp import (
    Bgp,
    Filter,
    OptionalBlock,
    Path,
    VarFilter,
    execute_bgp,
    materialize,
    pattern_vars,
    _apply_filter,
    _block_vars,
    _merge_join,
)
from hbase_rdf_spark.plans.filters import (
    And,
    Bound,
    DatatypeEq,
    DtCmp,
    DtPartCmp,
    ErrorCond,
    FilterExpr,
    LangEq,
    LangMatch,
    Not,
    Or,
    Regex,
    StrCmp,
    TzEq,
    StrLenCmp,
    StrPred,
    TypeTest,
)

# a whole signed numeric-literal token ('-1', '-.5', '-2e3'): the
# tokenizer folds the sign in, so additive-expression loops must accept
# it as a '-'-continuation (SPARQL grammar [116] AdditiveExpression
# special-cases NumericLiteralNegative for exactly this)
_NEGNUM_RX = re.compile(r"^-(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+)(?:[eE][+-]?[0-9]+)?$")

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"

# token order matters: IRIs (no whitespace allowed inside — rules out
# mis-capturing a '<'…'>' span across a FILTER), literals, vars, then
# numbers, pnames (local part may contain but not END with '.', per
# SPARQL PN_LOCAL — 'foaf:Person.' is a pname + the triple terminator),
# multi-char ops BEFORE single-char punctuation ('||' vs '|').
_TOKEN_RX = re.compile(
    r"""
    (?P<iri><[^<>\s]*>)
  | (?P<literal>"(?:[^"\\]|\\.)*"(?:@[A-Za-z-]+|\^\^<[^<>\s]*>)?)
  | (?P<squote>'(?:[^'\\]|\\.)*')
  | (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
  | (?P<num>-?(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+)(?:[eE][+-]?[0-9]+)?)
  | (?P<pname>(?:[A-Za-z_][A-Za-z0-9_-]*)?:(?:[A-Za-z0-9_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?)?)
  | (?P<op><=|>=|!=|=|<|>|&&|\|\||!|[+-])
  | (?P<punct>[{}()*.,;/|^?\[\]])
  | (?P<word>[A-Za-z_][A-Za-z0-9_-]*)
    """,
    re.VERBOSE,
)

#: the full inlined-numeric value space — every type the scan side
#: treats as numeric (sources/ntriples.py NUMERIC_DATATYPES), longest
#: alternatives first so prefixes ('int' in 'integer') can't shadow
_NUM_DT = re.compile(
    r"\^\^<http://www\.w3\.org/2001/XMLSchema#"
    r"(nonPositiveInteger|nonNegativeInteger|negativeInteger"
    r"|positiveInteger|unsignedLong|unsignedShort|unsignedByte"
    r"|unsignedInt|integer|decimal|double|float|short|long|byte|int)>$"
)

_AGG_FUNCS = {"COUNT", "SUM", "AVG", "MIN", "MAX", "GROUP_CONCAT", "SAMPLE"}

_TYPE_TESTS = {"isiri", "isuri", "isblank", "isliteral", "isnumeric"}


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
    # GROUP_CONCAT(?v; SEPARATOR="…") — SPARQL 1.1 §18.5.1.7
    separator: str = " "


@dataclass
class LangFilter:
    """Legacy API form of FILTER langMatches(lang(?v), 'range') — the
    parser now emits plans/filters.LangMatch; this stays for direct
    Query-object users."""

    var: str
    range: str


@dataclass
class GroupBlock:
    """One branch of a UNION chain: patterns + branch-local filters,
    OPTIONAL blocks, and BIND assignments (the common branch-tagging
    idiom ``{ … BIND("a" AS ?t) } UNION { … BIND("b" AS ?t) }``)."""

    patterns: list[Bgp] = field(default_factory=list)
    filters: list = field(default_factory=list)
    optional: list[OptionalBlock] = field(default_factory=list)
    binds: list = field(default_factory=list)
    # a subquery-only branch ({ SELECT … } UNION …): its solutions
    # join the rest of the combo on shared vars
    subquery: object = None
    out_names: tuple = ()
    # a full-algebra branch (nested UNION mixed with other content,
    # VALUES/MINUS/EXISTS/subqueries inside the branch): the parsed
    # sub-Query, evaluated through _group_bindings and joined to the
    # rest of the combo on shared vars
    group: object = None


class _Undef:
    """Sentinel for an ``UNDEF`` cell in a VALUES row (singleton)."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return "UNDEF"


UNDEF = _Undef()


@dataclass
class ValuesBlock:
    """VALUES inline data: vars (no '?') × constant rows (terms as
    parsed by ``term()``; ``UNDEF`` cells hold the :data:`UNDEF`
    sentinel and translate to unbound (NULL) binding structs)."""

    vars: list[str] = field(default_factory=list)
    rows: list[list] = field(default_factory=list)


@dataclass
class ServiceBlock:
    """``SERVICE [SILENT] <endpoint> { … }`` (SPARQL 1.1 Federated
    Query): the inner group is NOT planned locally — its verbatim token
    span ships to the remote endpoint as ``SELECT * WHERE { … }`` (with
    this query's PREFIX declarations) over the SPARQL protocol, and the
    returned solution sequence joins the enclosing group exactly like a
    VALUES table (compatibility join; remote-unbound cells are UNDEF).

    The reference gets SERVICE free from ARQ inside Fuseki
    (fuseki-config-hbase.ttl front-end, SURVEY S9) — this is the
    engine-side equivalent, paired with ``service.SparqlService`` as
    the server half. Scale posture: a SERVICE result is a remote
    endpoint's capped SELECT response fetched once on the driver (like
    VALUES inline data), not a distributed scan — federation is for
    small dimension-style remote lookups, never for bulk transfer."""

    endpoint: str  # absolute IRI, no <> ("" when endpoint_var is set)
    tokens: tuple  # verbatim token span of the inner group
    silent: bool = False
    prefixes: dict = field(default_factory=dict)
    # vars mentioned in the span — scope/nullability superset used at
    # plan time (the authoritative set is the response's head.vars)
    vars_hint: tuple = ()
    # ``SERVICE ?ep { … }``: the endpoint variable (no '?'). Supported
    # when ?ep is enumerable from a VALUES clause in the query — each
    # candidate IRI is queried and the union of responses (each row
    # extended with its ?ep binding) joins the group; the VALUES
    # compatibility join then enforces ?ep consistency. Truly dynamic
    # endpoint discovery (?ep bound only by graph data) stays an
    # explicit error, like the reference deployment.
    endpoint_var: str | None = None


@dataclass
class BindAssign:
    """``BIND(expr AS ?var)``: var (no '?') ← a value expression tree.

    expr nodes: ``('var', '?x')`` | ``('num', 3.5)`` | ``('const',
    term)`` | ``('arith', op, left, right)`` with op in ``+ - * /``.
    """

    var: str
    expr: tuple
    # pattern count of the enclosing group at the BIND's parse
    # position: patterns at index >= at may consume the var (they
    # evaluate AFTER the Extend and join back — _post_bind_split).
    # None = positionless (projection expressions, which evaluate
    # after the whole group): consuming patterns stay an error.
    at: int | None = None


@dataclass
class Query:
    variables: list[str]  # projected ?vars ('*' expanded at exec)
    form: str = "select"  # select | ask | describe
    distinct: bool = False
    patterns: list[Bgp] = field(default_factory=list)
    optional: list[OptionalBlock] = field(default_factory=list)
    # UNION chains: each chain is a list of GroupBlock branches; joins
    # distribute over unions, so N chains execute as the cross product
    # of their branches
    union_blocks: list[list[GroupBlock]] = field(default_factory=list)
    filters: list = field(default_factory=list)
    lang_filters: list[LangFilter] = field(default_factory=list)
    values: list[ValuesBlock] = field(default_factory=list)
    # trailing VALUES whose vars are aggregate aliases / BIND outputs /
    # non-group-key vars: joined POST-projection on rendered solutions
    # (§18.2.4 joins the ValuesClause after grouping)
    post_values: list[ValuesBlock] = field(default_factory=list)
    services: list[ServiceBlock] = field(default_factory=list)
    binds: list[BindAssign] = field(default_factory=list)
    # nested { SELECT … } blocks: evaluated bottom-up in id space and
    # joined to the enclosing group on shared variables
    subqueries: list["Query"] = field(default_factory=list)
    minus: list[GroupBlock] = field(default_factory=list)
    # FILTER [NOT] EXISTS { … }: (positive, block) pairs
    exists: list[tuple[bool, GroupBlock]] = field(default_factory=list)
    aggregates: list[Aggregate] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    # SELECT '(expr AS ?v)' expressions, parked here until the whole
    # query is parsed, then staged by _stage_select_exprs: grouped
    # query → postagg_binds (Extend over the aggregated frame);
    # ungrouped → appended to binds (ordinary per-solution Extend)
    select_exprs: list[BindAssign] = field(default_factory=list)
    # hidden per-solution Extends for aggregate EXPRESSION arguments
    # (SUM(?a * ?b)), applied just before the groupBy at both
    # aggregation sites
    agg_prebinds: list[BindAssign] = field(default_factory=list)
    postagg_binds: list[BindAssign] = field(default_factory=list)
    describe_target: object = None  # '?var' or constant term
    construct_template: list[Bgp] = field(default_factory=list)
    having: tuple | None = None  # (?aggAlias, op, number)
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # (var, asc)
    # ORDER BY expression keys desugar to hidden binds named __ord_e{i}
    # (routed to binds / postagg_binds); listed here so execution can
    # materialize them as sort sidecars and drop them from the output
    order_hidden: list[str] = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None
    # dataset clause (SPARQL 1.1 §13.2): None = no clause (query the
    # whole store); otherwise (default_graphs, named_graphs) tuples —
    # the default graph is the merge of default_graphs, and GRAPH
    # iteration is restricted to named_graphs. Informational here (the
    # restriction is baked into each Bgp's g/g_in at parse time).
    dataset: tuple[tuple, tuple] | None = None


#: value-expression function names _bind_atom recognizes (also used to
#: spot builtin-call ORDER BY keys)
_BIND_FN_NAMES = (
    "str", "concat", "ucase", "lcase", "strlen",
    "substr", "replace", "strbefore", "strafter",
    "abs", "ceil", "floor", "round", "coalesce", "if",
    "md5", "sha1", "sha256", "sha384", "sha512",
    "encode_for_uri", "iri", "uri", "strdt", "strlang", "lang", "bnode",
    "year", "month", "day", "hours", "minutes", "seconds", "tz",
    "timezone", "now", "rand", "uuid", "struuid",
)

#: an IRI with a scheme is absolute — never BASE-resolved (RFC 3986 §3.1)
_IRI_SCHEME_RX = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")

#: zero-argument builtins (SPARQL 1.1 §17.4.1.4/.5, §17.4.4.1/.2,
#: §17.4.5.1). NOW() is captured once per query parse (every call in
#: one execution sees the same instant, per spec); RAND/UUID/STRUUID
#: are per-row nondeterministic by definition.
_NOARG_FNS = ("now", "rand", "uuid", "struuid")

#: XSD constructor-cast targets (SPARQL 1.1 §17.5 — XPath casting,
#: inherited by the reference via ARQ). Numeric + boolean targets
#: produce kind-2 numeric values (booleans inline as 1.0/0.0 exactly
#: like sources/ntriples.py stores them); xsd:string rewrites to
#: STR(); xsd:dateTime/date rewrite to STRDT() (the stored typed-
#: literal form). Integer-family casts truncate numeric sources
#: toward zero and ERROR (NULL → unbound) on non-integer lexicals,
#: per XPath.
_XSD_NS = "http://www.w3.org/2001/XMLSchema#"
_CAST_INT_TYPES = frozenset(
    "integer nonPositiveInteger negativeInteger long int short byte "
    "nonNegativeInteger unsignedLong unsignedInt unsignedShort "
    "unsignedByte positiveInteger".split()
)
_CAST_NUM_TYPES = _CAST_INT_TYPES | {"double", "float", "decimal"}
_CAST_TYPES = _CAST_NUM_TYPES | {"boolean", "string", "dateTime", "date"}

#: numeric dateTime component accessors (SPARQL 1.1 §17.4.5)
_DT_NUM_FNS = ("year", "month", "day", "hours", "minutes", "seconds")


def _expr_vars(expr) -> set[str]:
    """Every ``('var', '?x')`` name (no '?') in a value-expression
    tree, FilterExpr condition nodes included."""
    out: set[str] = set()
    if isinstance(expr, tuple):
        if expr[0] == "var":
            return {expr[1][1:]}
        for a in expr[1:]:
            out |= _expr_vars(a)
    elif isinstance(expr, list):
        for a in expr:
            out |= _expr_vars(a)
    elif isinstance(expr, FilterExpr):
        out |= expr.vars()
    return out


class _Parser:
    def __init__(self, tokens: list[str]):
        self.t = tokens
        self.i = 0
        self.prefixes: dict[str, str] = {}
        # BASE in effect (grammar [5]; the reference gets RFC 3986
        # resolution from ARQ's IRIResolver). None = no BASE declared:
        # relative IRIs then pass through verbatim (the engine treats
        # IRIs as opaque identifiers, so scheme-less test vocabularies
        # like <merge> keep working)
        self._base: str | None = None
        self._bn_counter = 0
        # BNODE() value-function call counter (distinct from syntax
        # blank nodes): each no-arg call site gets its own salt
        self._bnfn_counter = 0
        # when non-None, _bind_atom accepts aggregate calls and
        # desugars each into a hidden aggregate of this query —
        # active only while parsing SELECT projection expressions
        self._agg_ctx: Query | None = None
        # dataset clause: None until a FROM / FROM NAMED is parsed,
        # then (default_graphs, named_graphs) — consulted by
        # _graph_slot when stamping graph scope onto patterns
        self._dataset: tuple[tuple, tuple] | None = None

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
    def _prologue(self) -> None:
        """Prologue (grammar [4]): BASE and PREFIX declarations in any
        order, each taking effect for the declarations after it (a
        later BASE resolves against an earlier one, and prefix IRIs
        resolve against the BASE in effect — ARQ's behavior)."""
        while True:
            if self.kw("BASE"):
                b = self.next()
                if not (b.startswith("<") and b.endswith(">")):
                    raise SparqlSyntaxError(f"bad BASE declaration {b!r}")
                self._base = self._resolve_iri(b[1:-1])
            elif self.kw("PREFIX"):
                name = self.next()
                if not name.endswith(":"):
                    raise SparqlSyntaxError(
                        f"bad prefix declaration {name!r}"
                    )
                iri = self.next()
                self.prefixes[name[:-1]] = self._resolve_iri(iri[1:-1])
            else:
                return

    def _resolve_iri(self, s: str) -> str:
        """RFC 3986 resolution against the BASE in effect. Absolute
        IRIs (with a scheme) pass through; so does everything when no
        BASE is declared."""
        if self._base is None or _IRI_SCHEME_RX.match(s):
            return s
        from urllib.parse import urljoin

        return urljoin(self._base, s)

    def _expand_pname(self, tok: str):
        pfx, _, local = tok.partition(":")
        if pfx == "_":
            # blank-node label: a non-projectable variable scoped to the
            # query, per SPARQL semantics
            return f"?__bn_{local}"
        if pfx not in self.prefixes:
            raise SparqlSyntaxError(f"undeclared prefix {pfx!r} in {tok}")
        return self.prefixes[pfx] + local

    def term(self):
        """→ '?var' | constant str | (lexical, kind) | float."""
        tok = self.next()
        if tok.startswith("?"):
            return tok
        if tok == "[":
            # anonymous blank node '[]' → fresh non-projectable variable
            self.expect("]")
            self._bn_counter += 1
            return f"?__bn_anon{self._bn_counter}"
        if tok.startswith("<"):
            # IRI → entity constant (kind 0), BASE-resolved
            return self._resolve_iri(tok[1:-1])
        if tok.lower() in ("true", "false"):
            # grammar [133] BooleanLiteral — inlined numeric, exactly
            # how sources/ntriples.py stores xsd:boolean (1.0 / 0.0)
            return 1.0 if tok.lower() == "true" else 0.0
        if tok.startswith('"'):
            m = re.match(r'^"((?:[^"\\]|\\.)*)"(.*)$', tok)
            lex, suffix = m.group(1), m.group(2)
            lex = lex.replace('\\"', '"').replace("\\\\", "\\")
            if _NUM_DT.search(tok):
                try:
                    return float(lex)
                except ValueError:
                    # ill-typed numeric literal — stored as a kind-1
                    # string with its wrapper (matches the scan side)
                    return (f'"{lex}"{suffix}', 1)
            if suffix == "^^<http://www.w3.org/2001/XMLSchema#boolean>":
                if lex in ("true", "1"):
                    return 1.0
                if lex in ("false", "0"):
                    return 0.0
                return (f'"{lex}"{suffix}', 1)  # ill-typed boolean
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

    # -- property paths -------------------------------------------------
    # path := seq ('|' seq)* ; seq := elt ('/' elt)* ;
    # elt := ['^'] primary ['+'|'*'|'?'] ; primary := iri | 'a' | '(' path ')'
    def _path(self):
        """Parse the predicate position → '?var' | IRI str | Path."""
        p = self._path_alt()
        if isinstance(p, Path) and p.op == "atom":
            return p.iri  # plain predicate — the common fast path
        return p

    def _path_alt(self):
        parts = [self._path_seq()]
        while self.peek() == "|":
            self.next()
            parts.append(self._path_seq())
        if len(parts) == 1:
            return parts[0]
        return Path("alt", tuple(self._as_path(p) for p in parts))

    def _path_seq(self):
        parts = [self._path_elt()]
        while self.peek() == "/":
            self.next()
            parts.append(self._path_elt())
        if len(parts) == 1:
            return parts[0]
        return Path("seq", tuple(self._as_path(p) for p in parts))

    def _as_path(self, p) -> Path:
        if isinstance(p, Path):
            return p
        if isinstance(p, str) and p.startswith("?"):
            raise SparqlSyntaxError(
                "a variable cannot appear inside a property-path expression"
            )
        return Path("atom", iri=p)

    def _path_elt(self):
        inv = self.peek() == "^"
        if inv:
            self.next()
        prim = self._path_primary()
        mod = None
        if self.peek() in ("+", "*", "?"):
            mod = self.next()
        elif self.peek() == "{":
            # counted repetition p{n}, p{n,}, p{n,m} — ARQ's path
            # grammar extension (the reference inherits it via Jena;
            # dropped from the SPARQL 1.1 REC but kept by ARQ)
            self.next()
            lo = self._path_count()
            hi: int | None = lo
            if self.peek() == ",":
                self.next()
                hi = None if self.peek() == "}" else self._path_count()
            self.expect("}")
            if hi is not None and hi < lo:
                raise SparqlSyntaxError(
                    f"bad path quantifier {{{lo},{hi}}}: max < min"
                )
            mod = (lo, hi)
        if isinstance(prim, str) and prim.startswith("?"):
            if inv or mod:
                raise SparqlSyntaxError(
                    "path operators on a variable predicate are not valid SPARQL"
                )
            return prim
        if mod is not None:
            prim = Path("mod", (self._as_path(prim),), mod=mod)
        if inv:
            prim = Path("inv", (self._as_path(prim),))
        return prim

    def _path_count(self) -> int:
        tok = self.next()
        if not tok.isdigit():
            raise SparqlSyntaxError(f"bad path quantifier count {tok!r}")
        return int(tok)

    def _path_primary(self):
        if self.peek() == "!":
            self.next()
            return self._neg_prop_set()
        if self.peek() == "(":
            self.next()
            p = self._path_alt()
            self.expect(")")
            return self._as_path(p)
        t = self._pred_term()
        if isinstance(t, str):
            return t  # '?var' or IRI
        raise SparqlSyntaxError(f"invalid path element {t!r}")

    def _neg_prop_set(self) -> Path:
        """Negated property set ``!iri`` / ``!(iri1|^iri2|…)``.

        SPARQL 1.1 §9.1: a set with both forward and inverse members
        splits into ``!(forward…) UNION ^(!(inverse…))`` — handled at
        execution (bgp._neg_pairs); here inverse members are marked by
        wrapping in an 'inv' node."""

        def member() -> Path:
            inv = False
            if self.peek() == "^":
                self.next()
                inv = True
            t = self._pred_term()
            if not isinstance(t, str) or t.startswith("?"):
                raise SparqlSyntaxError(
                    "negated property set members must be IRIs"
                )
            atom = Path("atom", iri=t)
            return Path("inv", (atom,)) if inv else atom

        if self.peek() == "(":
            self.next()
            iris = [member()]
            while self.peek() == "|":
                self.next()
                iris.append(member())
            self.expect(")")
        else:
            iris = [member()]
        return Path("neg", tuple(iris))

    # -- query ----------------------------------------------------------
    def parse(self) -> Query:
        self._prologue()

        head = self.next().upper()
        if head == "SELECT":
            q = Query(variables=[])
            self._select_clause(q)
        elif head == "ASK":
            q = Query(variables=[], form="ask")
        elif head == "DESCRIBE":
            # DESCRIBE ( VarOrIri )+ | '*'  (grammar [11]) — ARQ
            # accepts any mix of vars and IRIs; '*' describes every
            # projectable variable of the WHERE group
            q = Query(variables=[], form="describe")
            if self.peek() == "*":
                self.next()
                q.describe_target = "*"
            else:
                targets: list = []
                while True:
                    tok = self.peek()
                    if (
                        tok is None
                        or tok == "{"
                        or tok.upper() in ("WHERE", "FROM")
                    ):
                        break
                    targets.append(
                        self.next() if tok.startswith("?") else self.term()
                    )
                if not targets:
                    raise SparqlSyntaxError("DESCRIBE needs a target")
                q.describe_target = targets
        elif head == "CONSTRUCT":
            q = Query(variables=[], form="construct")
            if (self.peek() or "").upper() == "WHERE":
                # CONSTRUCT WHERE { TriplesTemplate } shortform (SPARQL
                # 1.1 §10.2.2): the pattern IS the template — filled in
                # after the group parses below
                q.construct_template = None
            else:
                self.expect("{")
                tmpl = Query(variables=[])
                self._group(tmpl, None)
                self.expect("}")
                if tmpl.binds:
                    raise SparqlSyntaxError(
                        "BIND in a CONSTRUCT template is invalid"
                    )
                _reject_template_paths(tmpl.patterns)
                q.construct_template = tmpl.patterns
        else:
            raise SparqlSyntaxError(f"unsupported query form {head}")

        # dataset clause: any number of FROM / FROM NAMED (SPARQL 1.1
        # §13.2). The default graph is the MERGE of all FROM graphs;
        # GRAPH iteration is restricted to the FROM NAMED set. When a
        # dataset clause is present, an absent part is the EMPTY graph
        # (e.g. FROM NAMED only → patterns outside GRAPH match nothing).
        default_graph = None
        defaults: list[str] = []
        named: list[str] = []
        while self.kw("FROM"):
            is_named = self.kw("NAMED")
            g = self.next()
            if g.startswith("<"):
                g = self._resolve_iri(g[1:-1])
            elif ":" in g:
                g = self._expand_pname(g)
            (named if is_named else defaults).append(g)
        if defaults or named:
            self._dataset = (tuple(defaults), tuple(named))
            q.dataset = self._dataset
            default_graph = tuple(defaults)
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
        if q.form == "construct" and q.construct_template is None:
            # CONSTRUCT WHERE: spec restricts the pattern to a plain
            # triples template — no FILTER/OPTIONAL/UNION/etc., and no
            # property paths (a path is not a triple)
            if (q.filters or q.lang_filters or q.optional
                    or q.union_blocks or q.values or q.services
                    or q.minus or q.exists
                    or q.binds or q.subqueries):
                raise SparqlSyntaxError(
                    "CONSTRUCT WHERE allows only a plain triples template"
                )
            _reject_template_paths(q.patterns)
            q.construct_template = q.patterns
        self._stage_select_exprs(q)
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
                # unified '( expr AS ?v )': aggregates are ordinary
                # atoms of the expression grammar here (the _bind_atom
                # agg hook desugars each into a hidden aggregate and
                # returns a reference to its alias), so plain
                # (SUM(?x) AS ?s), expression arguments SUM(?a*?b),
                # and aggregate combinations (SUM(?a)/SUM(?b) AS ?r)
                # all parse through one path
                self.next()
                n_aggs = len(q.aggregates)
                self._agg_ctx = q
                try:
                    expr = self._bind_expr()
                finally:
                    self._agg_ctx = None
                self.expect("AS")
                v = self.next()
                if not v.startswith("?"):
                    raise SparqlSyntaxError(
                        "projection-expression alias must be a variable"
                    )
                self.expect(")")
                if (
                    expr[0] == "var"
                    and len(q.aggregates) == n_aggs + 1
                    and expr[1] == q.aggregates[-1].alias
                ):
                    # the expression IS one bare aggregate — promote
                    # the hidden aggregate to its declared alias
                    q.aggregates[-1].alias = v
                else:
                    q.select_exprs.append(BindAssign(v[1:], expr))
                q.variables.append(v)
            else:
                break

    def _parse_aggregate(self, q: Query) -> Aggregate:
        """Parse ``FUNC ( [DISTINCT] ( * | ?v | expr ) [; SEPARATOR] )``
        with a placeholder alias. A non-variable argument (SPARQL 1.1
        grammar: any Expression) desugars into a hidden per-solution
        BIND (``q.agg_prebinds`` — evaluated over the group's solutions
        just BEFORE grouping, §18.4) and the aggregate runs over the
        hidden var, so ``SUM(?price * ?qty)`` costs one Extend plus the
        same map-side-combinable Spark aggregate as ``SUM(?x)``."""
        func = self.next().upper()
        self.expect("(")
        distinct = self.kw("DISTINCT")
        v = None
        if self.peek() == "*":
            self.next()
            if func != "COUNT":
                raise SparqlSyntaxError(f"{func}(*) is not valid")
        else:
            after = self.t[self.i + 1] if self.i + 1 < len(self.t) else None
            if (self.peek() or "").startswith("?") and after in (")", ";"):
                v = self.next()  # plain-var fast path: SUM(?x)
            else:
                expr = self._bind_expr()
                hidden = f"__aggarg{len(q.agg_prebinds)}"
                q.agg_prebinds.append(BindAssign(hidden, expr))
                v = "?" + hidden
        sep = self._agg_separator(func)
        self.expect(")")
        return Aggregate(func, v, "?__unaliased", distinct, sep)

    def _stage_select_exprs(self, q: Query) -> None:
        """SELECT-expression staging, decided once the whole query is
        parsed (GROUP BY and HAVING can introduce grouping after the
        SELECT clause): in a grouped query they are Extends over the
        AGGREGATED frame — group keys and aggregate aliases, SPARQL 1.1
        §18.2.4.4 — otherwise ordinary BINDs over the group's
        solutions, applied AFTER any in-group BIND so application
        order matches scope."""
        if not q.select_exprs:
            return
        if q.aggregates or q.group_by:
            q.postagg_binds = list(q.select_exprs)
        else:
            q.binds = q.binds + list(q.select_exprs)
        q.select_exprs = []

    def _parse_subselect(self, graph) -> "Query":
        """Parse a SubSelect after its SELECT keyword was peeked:
        consumes SELECT … WHERE { group } modifiers."""
        self.next()  # SELECT
        sq = Query(variables=[])
        self._select_clause(sq)
        self.expect("WHERE")
        self.expect("{")
        self._group(sq, graph)
        self.expect("}")
        self._modifiers(sq)
        self._stage_select_exprs(sq)
        return sq

    def _group(self, q: Query, graph) -> None:
        # group-context stack: lets EXISTS{…} parse as an expression
        # leaf from value positions (BIND, IF conditions) anywhere
        # inside this group's body — _bind_atom reads the top
        stack = getattr(self, "_gctx", None)
        if stack is None:
            stack = self._gctx = []
        stack.append((q, graph))
        try:
            self._group_body(q, graph)
        finally:
            stack.pop()

    def _group_body(self, q: Query, graph) -> None:
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
                # everything parsed inside carried g on its patterns —
                # splice it all into the enclosing group (bind
                # positions shift by the patterns already parsed)
                off = len(q.patterns)
                q.patterns.extend(sub.patterns)
                q.optional.extend(sub.optional)
                q.filters.extend(sub.filters)
                q.lang_filters.extend(sub.lang_filters)
                for b in sub.binds:  # BIND is graph-agnostic
                    if b.at is not None:
                        b.at += off
                q.binds.extend(sub.binds)
                q.union_blocks.extend(sub.union_blocks)
                q.values.extend(sub.values)
                q.minus.extend(sub.minus)
                q.exists.extend(sub.exists)
                # a subquery inside GRAPH splices too: its patterns were
                # parsed with graph=g, so the scan scoping is already
                # carried on each Bgp — nothing graph-specific remains
                q.subqueries.extend(sub.subqueries)
            elif up == "OPTIONAL":
                self.next()
                self.expect("{")
                if (self.peek() or "").upper() == "SELECT":
                    # bare SubSelect directly inside the braces
                    # (GroupGraphPattern ::= '{' (SubSelect | …) '}')
                    sq = self._parse_subselect(graph)
                    self.expect("}")
                    q.optional.append(
                        OptionalBlock(
                            subquery=sq,
                            out_names=tuple(_subquery_out_names(sq)),
                        )
                    )
                    continue
                sub = Query(variables=[])
                self._subgroup(sub, graph)
                self.expect("}")
                if (len(sub.subqueries) == 1 and not sub.patterns
                        and not sub.filters and not sub.lang_filters
                        and not sub.optional and not sub.union_blocks
                        and not sub.binds and not sub.values
                        and not sub.minus and not sub.exists):
                    # subquery as the block's sole content: its
                    # solutions left-join directly on shared vars
                    sq = sub.subqueries[0]
                    q.optional.append(
                        OptionalBlock(
                            subquery=sq,
                            out_names=tuple(_subquery_out_names(sq)),
                        )
                    )
                    continue
                complex_branch = any(
                    getattr(br, "group", None) is not None
                    or getattr(br, "subquery", None) is not None
                    for chain in sub.union_blocks
                    for br in chain
                )
                bind_consumed = any(
                    b.var in pattern_vars(sub.patterns) for b in sub.binds
                )
                if (sub.values or sub.services or sub.minus or sub.exists
                        or sub.subqueries or complex_branch
                        or bind_consumed or _has_marker_filters(sub)):
                    # full-algebra group: VALUES / MINUS / FILTER
                    # EXISTS / a subquery mixed with other content, a
                    # UNION chain whose branch needs the full
                    # evaluator, or a block pattern consuming a
                    # block-local BIND var (in-group evaluation order
                    # via _post_bind_split) — run through the complete
                    # GroupGraphPattern evaluator (_group_bindings)
                    # via step_fn
                    q.optional.append(
                        OptionalBlock(
                            group=sub,
                            out_names=tuple(sorted(_query_scope_vars(sub))),
                        )
                    )
                    continue
                # the whole group left-joins as a unit, its FILTERs
                # applied inside the block (SPARQL LeftJoin semantics);
                # UNION chains expand per branch combination, BINDs
                # extend the group's solutions before the left join
                q.optional.append(
                    OptionalBlock(
                        patterns=sub.patterns,
                        filters=sub.filters,
                        optional=sub.optional,
                        union=sub.union_blocks,
                        binds=sub.binds,
                    )
                )
            elif up == "SELECT":
                # bare SubSelect as the group's content
                # (GroupGraphPattern ::= '{' (SubSelect | …) '}')
                q.subqueries.append(self._parse_subselect(graph))
            elif up == "FILTER":
                self.next()
                self._filter(q, graph)
            elif up == "VALUES":
                self.next()
                q.values.append(self._values_block())
            elif up == "SERVICE":
                self.next()
                q.services.append(self._service_block())
            elif up == "BIND":
                self.next()
                self.expect("(")
                expr = self._bind_expr()
                self.expect("AS")
                v = self.next()
                if not v.startswith("?"):
                    raise SparqlSyntaxError("BIND alias must be a variable")
                self.expect(")")
                q.binds.append(
                    BindAssign(v[1:], expr, at=len(q.patterns))
                )
            elif up == "MINUS":
                self.next()
                self.expect("{")
                sub = Query(variables=[])
                self._subgroup(sub, graph)
                self.expect("}")
                br = self._as_branch(sub)
                if getattr(br, "binds", None):
                    # a BIND inside MINUS extends the block's solutions
                    # BEFORE the compatibility anti-join; only the full
                    # group evaluator applies block-local binds here
                    # (the plain-branch path would silently drop them)
                    br = GroupBlock(
                        group=sub,
                        out_names=tuple(sorted(_query_scope_vars(sub))),
                    )
                q.minus.append(br)
            elif tok == "{":
                # braced block: a subquery, or a group / UNION chain
                self.next()
                if (self.peek() or "").upper() == "SELECT":
                    sq = self._parse_subselect(graph)
                    self.expect("}")
                    if (self.peek() or "").upper() == "UNION":
                        # { SELECT … } UNION { … }: the subquery is the
                        # first branch of a UNION chain
                        branches = [
                            GroupBlock(
                                subquery=sq,
                                out_names=tuple(_subquery_out_names(sq)),
                            )
                        ]
                        while (self.peek() or "").upper() == "UNION":
                            self.next()
                            self.expect("{")
                            alt = Query(variables=[])
                            self._subgroup(alt, graph)
                            self.expect("}")
                            branches.extend(self._branchify(alt))
                        q.union_blocks.append(branches)
                        continue
                    q.subqueries.append(sq)
                    continue
                sub = Query(variables=[])
                self._subgroup(sub, graph)
                self.expect("}")
                branches = self._branchify(sub)
                while self.peek() is not None and self.peek().upper() == "UNION":
                    self.next()
                    self.expect("{")
                    alt = Query(variables=[])
                    self._subgroup(alt, graph)
                    self.expect("}")
                    branches.extend(self._branchify(alt))
                b = branches[0]
                if (len(branches) == 1
                        and getattr(b, "group", None) is None
                        and getattr(b, "subquery", None) is None):
                    # plain group: splice into the enclosing group
                    # (bind positions shift by the patterns already
                    # parsed)
                    off = len(q.patterns)
                    q.patterns.extend(b.patterns)
                    q.filters.extend(b.filters)
                    q.optional.extend(b.optional)
                    for bd in b.binds:
                        if getattr(bd, "at", None) is not None:
                            bd.at += off
                    q.binds.extend(b.binds)
                else:
                    # a full-algebra single branch ({ {A} UNION {B} . C }
                    # or a braced group carrying VALUES/MINUS/EXISTS/
                    # subqueries) evaluates as a unit through the union
                    # combo machinery — a 1-branch chain
                    q.union_blocks.append(branches)
            elif tok == ".":
                self.next()
            else:
                n_before = len(q.patterns)
                s = self._node(q, graph)
                # '[ p o ] .' — a bare blank-node property list is a
                # complete triples block; its triples are already emitted
                bare_bnpl = (
                    len(q.patterns) > n_before
                    and self.peek() in (".", "}", None)
                )
                if not bare_bnpl:
                    self._pred_obj_list(q, graph, s)
                if self.peek() == ".":
                    self.next()

    def _graph_slot(self, graph) -> tuple:
        """Map the threaded graph scope + dataset clause → (g, g_in).

        ``graph`` is what parsing threaded down: None (no scope), a
        tuple (FROM default-graph merge), '?var' / constant (GRAPH).
        SPARQL 1.1 §13.2: FROM NAMED restricts GRAPH iteration; with a
        dataset clause present but no FROM NAMED, GRAPH matches the
        empty set; GRAPH <g> outside the named set matches nothing.
        """
        if graph is None:
            return None, None
        if isinstance(graph, tuple):  # FROM default-graph merge
            if len(graph) == 1:
                return graph[0], None  # exact single-graph pushdown
            return None, graph  # () = empty default graph
        if graph.startswith("?"):  # GRAPH ?var
            named = self._dataset[1] if self._dataset is not None else None
            return graph, named
        if self._dataset is not None and graph not in self._dataset[1]:
            return None, ()  # GRAPH <g> outside FROM NAMED
        return graph, None

    def _emit_triple(self, q: Query, graph, s, p, o) -> None:
        g, g_in = self._graph_slot(graph)
        if isinstance(p, Path):
            if p.op == "mod" and p.children[0].op == "atom":
                # single-modifier shorthand — legacy Bgp form
                q.patterns.append(
                    Bgp(s, p.children[0].iri, o, g=g, g_in=g_in,
                        path_mod=p.mod)
                )
            else:
                q.patterns.append(Bgp(s, p, o, g=g, g_in=g_in))
        else:
            q.patterns.append(Bgp(s, p, o, g=g, g_in=g_in))

    def _pred_obj_list(self, q: Query, graph, s) -> None:
        """Turtle-style predicateObjectList: ``p1 o1, o2 ; p2 o3``."""
        while True:
            p = self._path()
            while True:  # objectList: 'o1, o2, o3'
                o = self._node(q, graph)
                self._emit_triple(q, graph, s, p, o)
                if self.peek() == ",":
                    self.next()
                    continue
                break
            if self.peek() == ";":
                while self.peek() == ";":  # tolerate stray ';;'
                    self.next()
                if self.peek() in (".", "}", None):
                    break  # trailing ';' before the terminator
                continue
            break

    def _node(self, q: Query, graph):
        """Subject/object position: a term, a blank-node property
        list ``[ p o ; … ]``, or an RDF collection ``( e1 e2 … )`` —
        both TriplesNode forms desugar to fresh non-projectable
        variables plus inline triples (SPARQL grammar [98]/[102])."""
        if self.peek() == "[" and self.t[self.i + 1 : self.i + 2] != ["]"]:
            self.next()
            self._bn_counter += 1
            b = f"?__bn_anon{self._bn_counter}"
            self._pred_obj_list(q, graph, b)
            self.expect("]")
            return b
        if self.peek() == "(":
            # RDF collection: rdf:first/rdf:rest chain ending in
            # rdf:nil (grammar [102] Collection; Turtle §2.8). The
            # empty collection is the rdf:nil IRI itself.
            self.next()
            if self.peek() == ")":
                self.next()
                return RDF_NIL
            elems = []
            while self.peek() is not None and self.peek() != ")":
                elems.append(self._node(q, graph))
            self.expect(")")
            cells = []
            for _ in elems:
                self._bn_counter += 1
                cells.append(f"?__bn_anon{self._bn_counter}")
            for i, el in enumerate(elems):
                self._emit_triple(q, graph, cells[i], RDF_FIRST, el)
                rest = cells[i + 1] if i + 1 < len(elems) else RDF_NIL
                self._emit_triple(q, graph, cells[i], RDF_REST, rest)
            return cells[0]
        return self.term()

    def _branchify(self, sub: "Query") -> list[GroupBlock]:
        """One UNION branch → its GroupBlocks. A branch that is ITSELF a
        single bare UNION chain splices into the enclosing chain —
        UNION is associative, so '{ {A} UNION {B} } UNION {C}'
        flattens to the 3-branch chain A|B|C. A subquery-only branch
        becomes a subquery GroupBlock."""
        if (
            len(sub.subqueries) == 1
            and not sub.patterns
            and not sub.filters
            and not sub.lang_filters
            and not sub.optional
            and not sub.union_blocks
            and not sub.values
            and not sub.minus
            and not sub.exists
            and not sub.binds
        ):
            sq = sub.subqueries[0]
            return [
                GroupBlock(
                    subquery=sq, out_names=tuple(_subquery_out_names(sq))
                )
            ]
        if (
            len(sub.union_blocks) == 1
            and not sub.patterns
            and not sub.filters
            and not sub.lang_filters
            and not sub.optional
            and not sub.values
            and not sub.minus
            and not sub.exists
            and not sub.binds
            and not sub.subqueries
        ):
            return list(sub.union_blocks[0])
        return [self._as_branch(sub)]

    def _as_branch(self, sub: "Query") -> GroupBlock:
        if (sub.union_blocks or sub.values or sub.services
                or sub.minus or sub.exists
                or sub.subqueries or _has_marker_filters(sub)):
            # full-algebra branch: a nested UNION mixed with other
            # content ({ {A} UNION {B} . C } — joins distribute over
            # unions, evaluated as a unit), or VALUES/MINUS/EXISTS/
            # subqueries inside the branch; _group_bindings evaluates
            # the whole sub-group
            return GroupBlock(
                group=sub, out_names=tuple(sorted(_query_scope_vars(sub)))
            )
        for b in sub.binds:
            if b.var in pattern_vars(sub.patterns):
                if getattr(b, "at", None) is None or any(
                    i < b.at
                    for i, p in enumerate(sub.patterns)
                    if b.var in pattern_vars([p])
                ):
                    # used BEFORE the BIND: a genuine rebinding
                    raise SparqlSyntaxError(
                        f"BIND var ?{b.var} is reused by a pattern in "
                        "the same branch"
                    )
                # a LATER pattern CONSUMES the branch-local BIND var:
                # route the branch through the full group evaluator,
                # whose _post_bind_split implements the in-group
                # evaluation order (circular inputs raise there)
                return GroupBlock(
                    group=sub,
                    out_names=tuple(sorted(_query_scope_vars(sub))),
                )
        return GroupBlock(
            patterns=sub.patterns,
            filters=sub.filters,
            optional=sub.optional,
            binds=sub.binds,
        )

    def _agg_separator(self, func: str) -> str:
        """Optional ``; SEPARATOR="…"`` tail inside the aggregate's
        parens (SPARQL 1.1 §18.5.1.7, GROUP_CONCAT only)."""
        if self.peek() != ";":
            return " "
        self.next()
        w = self.next()
        if w.upper() != "SEPARATOR":
            raise SparqlSyntaxError(f"expected SEPARATOR, got {w}")
        if func != "GROUP_CONCAT":
            raise SparqlSyntaxError(
                "SEPARATOR is only valid on GROUP_CONCAT"
            )
        self.expect("=")
        tok = self.next()
        m = re.match(r'^"((?:[^"\\]|\\.)*)"$', tok) or re.match(
            r"^'((?:[^'\\]|\\.)*)'$", tok
        )
        if not m:
            raise SparqlSyntaxError("SEPARATOR must be a string literal")
        return m.group(1).replace('\\"', '"').replace("\\\\", "\\")

    def _service_block(self) -> ServiceBlock:
        """``SERVICE [SILENT] <iri> { … }`` or ``SERVICE ?ep { … }``
        with a VALUES-enumerable endpoint variable; the braced group is
        captured VERBATIM as its token span and never planned
        locally."""
        silent = False
        if (self.peek() or "").upper() == "SILENT":
            self.next()
            silent = True
        ep = self.next()
        endpoint_var = None
        if ep.startswith("?"):
            endpoint, endpoint_var = "", ep[1:]
        elif ep.startswith("<") and ep.endswith(">"):
            endpoint = ep[1:-1]
        elif ":" in ep:
            endpoint = self._expand_pname(ep)
        else:
            raise SparqlSyntaxError(
                "SERVICE endpoint must be a constant IRI or a variable"
            )
        self.expect("{")
        depth, toks = 1, []
        while depth:
            t = self.next()
            if t == "{":
                depth += 1
            elif t == "}":
                depth -= 1
            if depth:
                toks.append(t)
        hint = {t[1:] for t in toks if t.startswith("?") and len(t) > 1}
        if endpoint_var:
            hint.add(endpoint_var)
        return ServiceBlock(
            endpoint=endpoint,
            tokens=tuple(toks),
            silent=silent,
            prefixes=dict(self.prefixes),
            vars_hint=tuple(sorted(hint)),
            endpoint_var=endpoint_var,
        )

    def _values_block(self) -> ValuesBlock:
        multi = self.peek() == "("
        vars_: list[str] = []
        if multi:
            self.next()
            while self.peek() != ")":
                v = self.next()
                if not v.startswith("?"):
                    raise SparqlSyntaxError("VALUES vars must be variables")
                vars_.append(v[1:])
            self.expect(")")
        else:
            v = self.next()
            if not v.startswith("?"):
                raise SparqlSyntaxError("VALUES vars must be variables")
            vars_.append(v[1:])
        self.expect("{")
        rows: list[list] = []
        while self.peek() != "}":
            if multi:
                self.expect("(")
                row = []
                while self.peek() != ")":
                    row.append(self._values_term())
                self.expect(")")
            else:
                row = [self._values_term()]
            if len(row) != len(vars_):
                raise SparqlSyntaxError(
                    f"VALUES row arity {len(row)} != {len(vars_)} vars"
                )
            rows.append(row)
        self.expect("}")
        return ValuesBlock(vars_, rows)

    def _values_term(self):
        tok = self.peek()
        if tok is not None and tok.upper() == "UNDEF":
            self.next()
            return UNDEF
        t = self.term()
        if isinstance(t, str) and t.startswith("?"):
            raise SparqlSyntaxError("VALUES data must be constants")
        return t

    def _subgroup(self, sub: "Query", graph) -> None:
        self._group(sub, graph)

    # -- BIND value expressions -----------------------------------------
    # additive := mult (('+'|'-') mult)* ; mult := atom (('*'|'/') atom)*
    # atom := '(' additive ')' | ?var | number | constant term
    def _bind_expr(self) -> tuple:
        node = self._bind_mult()
        while True:
            nxt = self.peek()
            if nxt in ("+", "-"):
                op = self.next()
                node = ("arith", op, node, self._bind_mult())
            elif nxt is not None and _NEGNUM_RX.match(nxt):
                # grammar [116]: a signed numeric literal continues the
                # additive expression (`?a -1` ≡ `?a - 1`)
                self.next()
                node = ("arith", "-", node, ("num", float(nxt[1:])))
            else:
                return node

    def _bind_mult(self) -> tuple:
        node = self._bind_atom()
        while self.peek() in ("*", "/"):
            op = self.next()
            node = ("arith", op, node, self._bind_atom())
        return node

    def _bind_atom(self) -> tuple:
        # unary sign (SPARQL grammar [118] UnaryExpression): negative
        # numeric literals tokenize whole, so only `-?v` / `-(…)` and
        # redundant `+` reach here
        if self.peek() == "-":
            self.next()
            return ("arith", "-", ("num", 0.0), self._bind_atom())
        if self.peek() == "+":
            self.next()
            return self._bind_atom()
        up = (self.peek() or "").upper()
        gctx = getattr(self, "_gctx", None)
        if up in ("EXISTS", "NOT") and gctx:
            # §17.4.1.4: EXISTS{…} as a VALUE — xsd:boolean, inlined
            # onto the numeric 1.0/0.0 space like every other boolean
            got = self._parse_exists_leaf(gctx[-1])
            if got is not None:
                leaf, neg = got
                return ("existsm", Not(leaf) if neg else leaf)
        if (
            self._agg_ctx is not None
            and up in _AGG_FUNCS
            and self.i + 1 < len(self.t)
            and self.t[self.i + 1] == "("
        ):
            # aggregate call inside a SELECT expression
            # (SUM(?a)/SUM(?b) AS ?r): desugar to a hidden aggregate
            # and reference its alias — the enclosing expression then
            # evaluates over the aggregated frame. The sink is cleared
            # while the argument parses: nested aggregates are invalid
            ctx, self._agg_ctx = self._agg_ctx, None
            try:
                agg = self._parse_aggregate(ctx)
            finally:
                self._agg_ctx = ctx
            agg.alias = f"?__hagg{len(ctx.aggregates)}"
            ctx.aggregates.append(agg)
            return ("var", agg.alias)
        if self.peek() == "(":
            self.next()
            e = self._bind_expr()
            self.expect(")")
            return e
        low = (self.peek() or "").lower()
        if (
            low in _BIND_FN_NAMES
            and self.i + 1 < len(self.t)
            and self.t[self.i + 1] == "("
        ):
            self.next()
            self.expect("(")
            if low in _NOARG_FNS:
                self.expect(")")
                if low == "now":
                    # one instant per query parse — every NOW() in
                    # this execution returns the same value (§17.4.5.1)
                    if getattr(self, "_now_lex", None) is None:
                        from datetime import datetime, timezone

                        self._now_lex = (
                            datetime.now(timezone.utc)
                            .strftime("%Y-%m-%dT%H:%M:%S.%f")
                            + "Z"
                        )
                    return ("now", self._now_lex)
                return (low,)
            if low in ("concat", "coalesce"):
                args = [self._bind_expr()]
                while self.peek() == ",":
                    self.next()
                    args.append(self._bind_expr())
                self.expect(")")
                return (low, args)
            if low == "substr":
                s = self._bind_expr()
                self.expect(",")
                start = self._bind_expr()
                length = None
                if self.peek() == ",":
                    self.next()
                    length = self._bind_expr()
                self.expect(")")
                return ("substr", s, start, length)
            if low == "replace":
                s = self._bind_expr()
                self.expect(",")
                pat = self._string_arg()
                self.expect(",")
                repl = self._string_arg()
                flags = ""
                if self.peek() == ",":
                    self.next()
                    flags = self._string_arg()
                self.expect(")")
                return ("replace", s, pat, repl, flags)
            if low in ("strbefore", "strafter"):
                s = self._bind_expr()
                self.expect(",")
                t = self._string_arg()
                self.expect(")")
                return (low, s, t)
            if low in ("abs", "ceil", "floor", "round"):
                e = self._bind_expr()
                self.expect(")")
                return ("nfunc", low, e)
            if low in ("iri", "uri"):
                # SPARQL §17.4.2.8: IRI(str) constructs an IRI term.
                # Relative-IRI resolution (no BASE support) is out of
                # scope — the argument must be an absolute IRI string.
                e = self._bind_expr()
                self.expect(")")
                return ("iri", e)
            if low == "bnode":
                # §17.4.2.9 BNODE([str]): the no-arg form mints a
                # blank node distinct per call (parse-time salt) per
                # solution; the 1-arg form unifies same-literal calls
                # within a solution (salt excluded — see
                # _bind_term_value)
                salt = self._bnfn_counter
                self._bnfn_counter += 1
                if self.peek() == ")":
                    self.next()
                    return ("bnode", salt, None)
                e = self._bind_expr()
                self.expect(")")
                return ("bnode", salt, e)
            if low in ("strdt", "strlang"):
                # §17.4.2.9/.10 — constant datatype IRI / language tag
                s = self._bind_expr()
                self.expect(",")
                if low == "strlang":
                    t = self._string_arg()
                else:
                    t = self.term()
                    if not isinstance(t, str) or t.startswith("?"):
                        raise SparqlSyntaxError(
                            "STRDT needs a constant datatype IRI"
                        )
                self.expect(")")
                return (low, s, t)
            if low == "if":
                gctx = getattr(self, "_gctx", None)
                cond = self._or_expr(gctx[-1] if gctx else None)
                self.expect(",")
                then = self._bind_expr()
                self.expect(",")
                other = self._bind_expr()
                self.expect(")")
                return ("if", cond, then, other)
            e = self._bind_expr()
            self.expect(")")
            return (low, e)
        tok = self.peek()
        if (
            tok
            and not tok.startswith(('"', "?", "_"))
            and (":" in tok or tok.startswith("<"))
            and self.t[self.i + 1 : self.i + 2] == ["("]
        ):
            # XSD constructor cast: xsd:integer(?x), <…#double>(?x), …
            iri = tok[1:-1] if tok.startswith("<") else self._expand_pname(tok)
            if iri.startswith(_XSD_NS) and iri[len(_XSD_NS):] in _CAST_TYPES:
                local = iri[len(_XSD_NS):]
                self.next()
                self.expect("(")
                e = self._bind_expr()
                self.expect(")")
                if local == "string":
                    return ("str", e)
                if local in ("dateTime", "date"):
                    return ("strdt", e, iri)
                return ("cast", local, e)
            raise SparqlSyntaxError(
                f"unsupported function call {tok!r} — only XSD "
                "constructor casts are callable by IRI"
            )
        t = self.term()
        if isinstance(t, str) and t.startswith("?"):
            return ("var", t)
        if isinstance(t, (int, float)) and not isinstance(t, bool):
            return ("num", float(t))
        return ("const", t)

    # -- filters --------------------------------------------------------
    # expr := and_expr ('||' and_expr)* ; and_expr := unary ('&&' unary)*
    # unary := '!' unary | '(' expr ')' | builtin-call | comparison
    def _filter(self, q: Query, graph=None) -> None:
        # FILTER [NOT] EXISTS { … } — correlated existence via
        # semi/anti join on the shared variables
        tok = self.peek()
        up = tok.upper() if tok is not None else ""
        neg = False
        if up == "NOT":
            save = self.i
            self.next()
            if (self.peek() or "").upper() == "EXISTS":
                up, neg = "EXISTS", True
            else:
                self.i = save
        if up == "EXISTS":
            self.next()
            self.expect("{")
            sub = Query(variables=[])
            self._subgroup(sub, graph)
            self.expect("}")
            br = self._as_branch(sub)
            if getattr(br, "binds", None):
                # same as MINUS: block-local BINDs need the full group
                # evaluator — the plain semi/anti path ignores them
                br = GroupBlock(
                    group=sub,
                    out_names=tuple(sorted(_query_scope_vars(sub))),
                )
            q.exists.append((not neg, br))
            return
        if self.peek() == "(":
            self.next()
            e = self._or_expr((q, graph))
            self.expect(")")
        else:
            # bare builtin-call form: FILTER langMatches(...), FILTER !bound(...)
            e = self._unary_expr((q, graph))
        # split a top-level conjunction so each conjunct pushes down
        # independently (the reference's filter-placement transform,
        # HBaseTransformFilterPlacement.java)
        for c in (e.children if isinstance(e, And) else [e]):
            q.filters.append(c)

    # ctx = (enclosing Query, graph scope) — threaded so EXISTS{…} can
    # parse as an expression leaf; None in contexts with no group scope
    # (e.g. the IF() condition inside BIND), where EXISTS raises
    def _or_expr(self, ctx=None):
        parts = [self._and_expr(ctx)]
        while self.peek() == "||":
            self.next()
            parts.append(self._and_expr(ctx))
        return parts[0] if len(parts) == 1 else Or(parts)

    def _and_expr(self, ctx=None):
        parts = [self._unary_expr(ctx)]
        while self.peek() == "&&":
            self.next()
            parts.append(self._unary_expr(ctx))
        return parts[0] if len(parts) == 1 else And(parts)

    def _unary_expr(self, ctx=None):
        tok = self.peek()
        if tok == "!":
            self.next()
            return Not(self._unary_expr(ctx))
        up = tok.upper() if tok is not None else ""
        if ctx is not None and up in ("EXISTS", "NOT"):
            # §17.4.1.4: EXISTS{…} / NOT EXISTS{…} as an expression
            # leaf inside a boolean combination — becomes a marker
            # column computed by _attach_exists_marker
            got = self._parse_exists_leaf(ctx)
            if got is not None:
                leaf, neg = got
                return Not(leaf) if neg else leaf
        low = tok.lower() if tok is not None else ""
        if low == "bound":
            self.next()
            self.expect("(")
            v = self.next()
            if not v.startswith("?"):
                raise SparqlSyntaxError("bound() takes a variable")
            self.expect(")")
            return Bound(v)
        if low in _TYPE_TESTS:
            self.next()
            self.expect("(")
            v = self.next()
            if not v.startswith("?"):
                raise SparqlSyntaxError(f"{tok}() takes a variable")
            self.expect(")")
            test = "isiri" if low == "isuri" else low
            return TypeTest(v, test)
        if low == "sameterm":
            # §17.4.1.8 — for this engine identical to RDFterm-equal
            # (kind-2 numerics carry only their value, so two lexical
            # forms of one number were already conflated at encode)
            self.next()
            self.expect("(")
            a = self.term()
            self.expect(",")
            b = self.term()
            self.expect(")")
            if not (isinstance(a, str) and a.startswith("?")):
                a, b = b, a
            if not (isinstance(a, str) and a.startswith("?")):
                raise SparqlSyntaxError("sameTerm needs a variable operand")
            if isinstance(b, str) and b.startswith("?"):
                return VarFilter(a, "=", 0.0, other=b)
            if isinstance(b, (int, float)) and not isinstance(b, bool):
                return Filter(a, "=", float(b))
            return _TermFilter(a, "=", b)
        if low == "regex":
            self.next()
            self.expect("(")
            v = self._str_or_var()
            self.expect(",")
            pat = self._string_arg()
            flags = ""
            if self.peek() == ",":
                self.next()
                flags = self._string_arg()
            self.expect(")")
            return Regex(v, pat, flags)
        if low in ("strstarts", "strends", "contains"):
            self.next()
            self.expect("(")
            v = self._str_or_var()
            self.expect(",")
            txt = self._string_arg()
            self.expect(")")
            return StrPred(v, low, txt)
        if low == "langmatches":
            self.next()
            self.expect("(")
            fn = self.next()
            if fn.lower() != "lang":
                raise SparqlSyntaxError("expected lang(?var) in langMatches")
            self.expect("(")
            v = self.next()
            self.expect(")")
            self.expect(",")
            rng = self._string_arg()
            self.expect(")")
            return LangMatch(v, rng)
        if tok == "(":
            # either a parenthesized boolean expression or a
            # parenthesized arithmetic operand — disambiguate by trying
            # the boolean parse first and backtracking
            save = self.i
            try:
                self.next()
                e = self._or_expr(ctx)
                self.expect(")")
                # the general-expression fallback can "succeed" on a
                # parenthesized arithmetic OPERAND (`(?p + 1) < 3` —
                # EbvExpr(?p + 1)); only accept the boolean reading
                # when what follows cannot continue a comparison
                nxt = self.peek()
                if (
                    nxt in self._FLIP
                    or nxt in ("*", "/", "+", "-")
                    or (nxt or "").upper() in ("IN", "NOT")
                    or (nxt is not None and _NEGNUM_RX.match(nxt))
                ):
                    # a signed numeric literal continues an additive
                    # expression per grammar [116] — `(?a) -1 > 0`
                    # tokenizes '-1' whole, so it must backtrack to
                    # the arithmetic reading like a bare '-' would
                    self.i = save
                else:
                    return e
            except SparqlSyntaxError:
                self.i = save
        save = self.i
        try:
            return self._comparison()
        except SparqlSyntaxError:
            # operands beyond the pushdown-normalizable grammar
            # (var-var arithmetic, IF/COALESCE values, bare EBV
            # expressions): re-parse through the BIND value grammar
            self.i = save
            return self._general_cmp()

    def _parse_exists_leaf(self, ctx):
        """[NOT] EXISTS { … } at the cursor → (ExistsExpr, negated),
        or None (cursor restored) when what's here isn't that form."""
        save = self.i
        up = (self.peek() or "").upper()
        neg = False
        if up == "NOT":
            self.next()
            if (self.peek() or "").upper() == "EXISTS":
                neg = True
            else:
                self.i = save
                return None
        elif up != "EXISTS":
            return None
        self.next()  # EXISTS
        if self.peek() != "{":
            self.i = save  # e.g. a var named ?EXISTS… — not ours
            return None
        q, graph = ctx
        self.expect("{")
        sub = Query(variables=[])
        self._subgroup(sub, graph)
        self.expect("}")
        br = self._as_branch(sub)
        if getattr(br, "binds", None):
            br = GroupBlock(
                group=sub,
                out_names=tuple(sorted(_query_scope_vars(sub))),
            )
        self._exm_n = getattr(self, "_exm_n", 0) + 1
        return ExistsExpr(marker=f"__exm{self._exm_n}", block=br), neg

    def _general_cmp(self):
        """General-expression comparison / EBV fallback (ExprCmp /
        EbvExpr) — correct but not scan-pushable; the specialized
        ``_comparison`` grammar stays the fast path."""
        lhs = self._bind_expr()
        nxt = self.peek()
        if nxt in self._FLIP:
            self.next()
            return ExprCmp(lhs, nxt, self._bind_expr())
        return EbvExpr(lhs)

    def _str_or_var(self) -> str:
        """A ?var, or str(?var) — both denote the same label column."""
        tok = self.next()
        if tok.lower() == "str":
            self.expect("(")
            v = self.next()
            self.expect(")")
        else:
            v = tok
        if not v.startswith("?"):
            raise SparqlSyntaxError(f"expected a variable, got {v}")
        return v

    def _in_list(
        self, var: str, off: float = 0.0, scl: float = 1.0,
        as_str: bool = False,
    ):
        """``?x IN (c1, c2, …)`` → Or of equality filters (the
        reference's OptimizeIn-style expansion). An arithmetic LHS
        solves for the var (``?x + 1 IN (13)`` ⇔ ``?x = 12``); a
        ``str(?x)`` LHS compares lexical forms."""
        self.expect("(")
        parts = []
        while True:
            t = self.term()
            if isinstance(t, str) and t.startswith("?"):
                raise SparqlSyntaxError("IN list must contain constants")
            if as_str:
                if isinstance(t, (int, float)):
                    raise SparqlSyntaxError(
                        "str() IN list must contain strings"
                    )
                lex = t[0] if isinstance(t, tuple) else t
                parts.append(StrCmp(var, "=", lex))
            elif isinstance(t, (int, float)):
                # s·v + off = t ⇔ v = s·(t − off)  (s ∈ {1, −1})
                parts.append(Filter(var, "=", scl * (float(t) - off)))
            elif off or scl != 1.0:
                # arithmetic vs non-numeric term: a type error LEG —
                # keep it in the disjunction as an error (NULL)
                # condition so negation propagates it (§17.2: NOT IN
                # over an erroring member is error → row dropped, not
                # true)
                parts.append(ErrorCond(var))
            else:
                parts.append(_TermFilter(var, "=", t))
            if self.peek() == ",":
                self.next()
                continue
            break
        self.expect(")")
        return parts[0] if len(parts) == 1 else Or(parts)

    def _string_arg(self) -> str:
        tok = self.next()
        if tok.startswith('"') or tok.startswith("'"):
            body = tok[1:-1]
            # strip any @lang/^^dt suffix a bare term-literal would carry
            m = re.match(r'^"((?:[^"\\]|\\.)*)"', tok)
            if m:
                body = m.group(1)
            return body.replace('\\"', '"').replace("\\\\", "\\")
        raise SparqlSyntaxError(f"expected a string argument, got {tok}")

    def _operand(self):
        """var | number | constant term | str(?v), with optional unary
        minus and ± constant.

        Returns (base, offset, is_str, scale): is_str marks a str(?v)
        wrapper; scale is -1.0 under a unary minus (``-?p``), else 1.0.
        """
        if self.peek() is not None and self.peek().lower() == "str":
            save = self.i
            self.next()
            if self.peek() == "(":
                self.expect("(")
                v = self.next()
                self.expect(")")
                if not v.startswith("?"):
                    raise SparqlSyntaxError("str() takes a variable")
                return v, 0.0, True, 1.0
            self.i = save
        scale = 1.0
        while self.peek() in ("-", "+"):  # unary sign(s) before the base
            if self.next() == "-":
                scale = -scale
        paren = self.peek() == "("
        if paren:
            self.next()
        base = self.term()
        in_off = 0.0  # ± constants under the unary sign (inside parens);
        # on an unparenthesized base, `-?p + 3` is `(-?p) + 3`, so the
        # chained offset sits OUTSIDE the sign
        out_off = 0.0
        while (o := self._chain_off()) is not None:
            if paren:
                in_off += o
            else:
                out_off += o
        if paren:
            self.expect(")")
            while (o := self._chain_off()) is not None:  # trailing `-(…) ± c`
                out_off += o
        offset = scale * in_off + out_off
        if isinstance(base, (int, float)) and not isinstance(base, bool):
            return scale * float(base) + offset, 0.0, False, 1.0
        return base, offset, False, scale

    def _chain_off(self):
        """One additive continuation at the cursor: ``+``/``-`` followed
        by a numeric term, or a whole signed numeric-literal token
        (``-1`` — grammar [116]). Returns the signed offset, or None
        when the cursor isn't at one (cursor untouched)."""
        nxt = self.peek()
        if nxt in ("+", "-"):
            sign = 1.0 if self.next() == "+" else -1.0
            off = self.term()
            if not isinstance(off, (int, float)):
                raise SparqlSyntaxError("arithmetic offset must be numeric")
            return sign * float(off)
        if nxt is not None and _NEGNUM_RX.match(nxt):
            self.next()
            return float(nxt)
        return None

    _FLIP = {"<": ">", ">": "<", "<=": ">=", ">=": "<=", "=": "=", "!=": "!="}

    def _comparison(self):
        # scalar-function LHS forms: STRLEN(?v) op n, lang(?v) = "tag",
        # datatype(?v) = <iri> (SPARQL 1.1 §17.4; the reference gets
        # these from stock ARQ — sail/HBaseQueryVisitor.java:289-313)
        low = (self.peek() or "").lower()
        if (
            low in ("strlen", "lang", "datatype", "tz") or low in _DT_NUM_FNS
        ) and self.i + 1 < len(self.t) and self.t[self.i + 1] == "(":
            self.next()
            self.expect("(")
            v = self.next()
            if not v.startswith("?"):
                raise SparqlSyntaxError(f"{low}() takes a variable")
            self.expect(")")
            op = self.next()
            if op not in self._FLIP:
                raise SparqlSyntaxError(f"unsupported FILTER operator {op!r}")
            if low == "strlen" or low in _DT_NUM_FNS:
                rhs = self.term()
                if not isinstance(rhs, (int, float)):
                    raise SparqlSyntaxError(
                        f"{low.upper()} comparison needs a number"
                    )
                if low == "strlen":
                    return StrLenCmp(v, op, float(rhs))
                return DtPartCmp(v, low, op, float(rhs))
            if op not in ("=", "!="):
                raise SparqlSyntaxError(f"{low}() supports = / != only")
            if low == "lang":
                return LangEq(v, op, self._string_arg())
            if low == "tz":
                return TzEq(v, op, self._string_arg())
            rhs = self.term()
            if not isinstance(rhs, str) or rhs.startswith("?"):
                raise SparqlSyntaxError("datatype() comparison needs an IRI")
            return DatatypeEq(v, op, rhs)
        lhs, l_off, l_str, l_scl = self._operand()
        nxt = self.peek()
        nup = nxt.upper() if nxt is not None else ""
        if (
            nup in ("IN", "NOT")
            and isinstance(lhs, str)
            and lhs.startswith("?")
        ):
            neg = False
            if nup == "NOT":
                save = self.i
                self.next()
                if (self.peek() or "").upper() == "IN":
                    neg = True
                else:
                    self.i = save
            if neg or nup == "IN":
                self.next()  # consume IN
                e = self._in_list(lhs, l_off, l_scl, l_str)
                return Not(e) if neg else e
        op = self.next()
        if op not in self._FLIP:
            raise SparqlSyntaxError(f"unsupported FILTER operator {op!r}")
        rhs, r_off, r_str, r_scl = self._operand()
        if self.peek() in ("*", "/"):
            # a multiplicative continuation on the RHS (?u < ?v * 4)
            # is beyond the linearizable grammar — punt to the
            # general-expression fallback instead of returning a
            # truncated comparison with tokens left over
            raise SparqlSyntaxError("multiplicative comparison RHS")
        if r_str and not l_str:
            # put the str() side on the left
            lhs, rhs = rhs, lhs
            l_off, r_off = r_off, l_off
            l_str, r_str = r_str, l_str
            l_scl, r_scl = r_scl, l_scl
            op = self._FLIP[op]
        if l_str:
            if r_str or not isinstance(rhs, tuple):
                raise SparqlSyntaxError(
                    "str() comparisons support a string constant RHS only"
                )
            if op not in ("=", "!="):
                raise SparqlSyntaxError("str() supports = / != only")
            return StrCmp(lhs, op, rhs[0])
        if not (isinstance(lhs, str) and lhs.startswith("?")):
            # constant-on-the-left form (BSBM Q5): flip the comparison
            lhs, rhs = rhs, lhs
            l_off, r_off = r_off, l_off
            l_scl, r_scl = r_scl, l_scl
            op = self._FLIP[op]
        if not (isinstance(lhs, str) and lhs.startswith("?")):
            raise SparqlSyntaxError("FILTER needs a variable operand")
        if isinstance(rhs, str) and rhs.startswith("?"):
            if l_scl != r_scl:
                # mixed signs make a sum of variables (?a op -?b + c) —
                # not a two-sided comparison any rewrite can linearize
                raise SparqlSyntaxError(
                    "FILTER comparison of oppositely-signed variables "
                    "is not supported"
                )
            # common scale s: s·a + l_off op s·b + r_off ⇔
            # a op' b + s·(r_off − l_off), op' flipped when s = −1.
            # (With s = −1 the operands are numeric by construction, so
            # the =/!= term-equality fast path degrades to numeric
            # equality — exactly the spec's unary-minus typing.)
            eff = op if l_scl == 1.0 else self._FLIP[op]
            return VarFilter(
                lhs, eff, 0.0, other=rhs, offset=l_scl * (r_off - l_off)
            )
        if isinstance(rhs, (int, float)):
            # s·v + l_off op c ⇔ v op' s·(c − l_off)
            eff = op if l_scl == 1.0 else self._FLIP[op]
            return Filter(lhs, eff, l_scl * (float(rhs) + r_off - l_off))
        if l_scl != 1.0 or l_off:
            # an arithmetic LHS against a non-numeric constant is a
            # type error on every row — an error (NULL) condition, so
            # a bare FILTER drops every row while !/&&/|| propagate
            # the error per §17.2 (a static false would make
            # FILTER(!(?p+1 = <iri>)) wrongly keep rows)
            return ErrorCond(lhs)
        if isinstance(rhs, tuple) and re.search(
            r"\^\^<http://www\.w3\.org/2001/XMLSchema#(?:dateTime|date)>$",
            rhs[0],
        ):
            # chronological comparison against a date/dateTime literal
            # — value semantics (equal instants in different timezones
            # compare equal), so it takes precedence over the id-space
            # term-equality fast path below
            return DtCmp(lhs, op, rhs[0])
        if op in ("=", "!=") and isinstance(rhs, (str, tuple)):
            # constant (in)equality: bind into the pattern set via an
            # equality filter on the encoded id — J6's constant binding
            return _TermFilter(lhs, op, rhs)
        raise SparqlSyntaxError(f"unsupported FILTER on {rhs!r}")

    # -- HAVING ----------------------------------------------------------
    # having_expr := having_and ('||' having_and)*
    # having_and  := having_unary ('&&' having_unary)*
    # having_unary:= '!' having_unary | '(' having_expr ')' | having_cmp
    # having_cmp  := (AGG '(' [DISTINCT] (?v | '*') ')' | ?aggAlias) op num
    # Produces a tuple tree (("and"/"or", parts) | ("not", x) |
    # ("cmp", alias, op, num)) that `_having_col` compiles to one Spark
    # Column over the aggregated frame.
    def _having_bracketed(self, q: Query) -> tuple:
        self.expect("(")
        e = self._having_or(q)
        self.expect(")")
        return e

    def _having_or(self, q: Query) -> tuple:
        parts = [self._having_and(q)]
        while self.peek() == "||":
            self.next()
            parts.append(self._having_and(q))
        return parts[0] if len(parts) == 1 else ("or", tuple(parts))

    def _having_and(self, q: Query) -> tuple:
        parts = [self._having_unary(q)]
        while self.peek() == "&&":
            self.next()
            parts.append(self._having_unary(q))
        return parts[0] if len(parts) == 1 else ("and", tuple(parts))

    def _having_unary(self, q: Query) -> tuple:
        if self.peek() == "!":
            self.next()
            return ("not", self._having_unary(q))
        if self.peek() == "(":
            # parenthesized sub-expression vs. a comparison whose LHS
            # merely follows — the grammar above has no parenthesized
            # operands, so '(' here always opens a boolean group
            self.next()
            e = self._having_or(q)
            self.expect(")")
            return e
        return self._having_cmp(q)

    def _having_cmp(self, q: Query) -> tuple:
        if (self.peek() or "").upper() in _AGG_FUNCS:
            # same grammar as a SELECT aggregate — including expression
            # arguments (HAVING (SUM(?p * ?q) > 10)), which desugar to
            # a hidden pre-grouping Extend via _parse_aggregate
            agg = self._parse_aggregate(q)
            v = next(
                (
                    a.alias
                    for a in q.aggregates
                    if (a.func, a.var, a.distinct)
                    == (agg.func, agg.var, agg.distinct)
                ),
                None,
            )
            if v is None:
                v = f"?__having_{len(q.aggregates)}"
                agg.alias = v
                q.aggregates.append(agg)
        else:
            v = self.next()
            if not v.startswith("?"):
                raise SparqlSyntaxError("HAVING operand must be a var")
        op = self.next()
        if op not in ("<", "<=", ">", ">=", "=", "!="):
            raise SparqlSyntaxError(f"bad HAVING comparison operator {op!r}")
        num = self.term()
        if isinstance(num, bool) or not isinstance(num, (int, float)):
            raise SparqlSyntaxError("HAVING comparison must be numeric")
        return ("cmp", v, op, float(num))

    def _modifiers(self, q: Query) -> None:
        if self.kw("GROUP"):
            self.expect("BY")
            # GroupCondition (grammar [19]): Var | '(' Expression
            # ('AS' Var)? ')' | BuiltInCall. Expression keys desugar
            # to a per-solution Extend over the group's solutions and
            # a grouping on its output — exactly §18.5.1's
            # Group(exprlist, Ω) which evaluates each key expression
            # per solution. A bare '(expr)' / builtin-call key groups
            # under a hidden __gk* var the projection never emits.
            while True:
                tok = self.peek()
                if tok is None:
                    break
                if tok.startswith("?"):
                    q.group_by.append(self.next())
                    continue
                is_call = (
                    tok.lower() in _BIND_FN_NAMES
                    and self.i + 1 < len(self.t)
                    and self.t[self.i + 1] == "("
                )
                if tok == "(":
                    self.next()
                    expr = self._bind_expr()
                    if self.kw("AS"):
                        v = self.next()
                        if not v.startswith("?"):
                            raise SparqlSyntaxError(
                                "GROUP BY alias must be a variable"
                            )
                        name = v[1:]
                    else:
                        name = f"__gk{len(q.group_by)}"
                    self.expect(")")
                elif is_call:
                    expr = self._bind_atom()
                    name = f"__gk{len(q.group_by)}"
                else:
                    break
                q.binds.append(BindAssign(name, expr, at=len(q.patterns)))
                q.group_by.append("?" + name)
            if not q.group_by:
                raise SparqlSyntaxError("GROUP BY needs at least one key")
            if self.kw("HAVING"):
                # HAVING HavingCondition+ (SPARQL 1.1 grammar [21]):
                # each condition is a bracketed boolean expression over
                # aggregate calls / aggregate aliases — arbitrary
                # `&&`/`||`/`!` combinations of numeric comparisons
                # (the reference inherits full HAVING from Sesame/ARQ,
                # SURVEY SE2). A direct aggregate reuses an identical
                # SELECT aggregate when one exists; otherwise it
                # aggregates under a hidden __having alias the final
                # projection never emits. Multiple bracketed
                # conditions conjoin.
                conds = [self._having_bracketed(q)]
                while self.peek() == "(":
                    conds.append(self._having_bracketed(q))
                q.having = (
                    conds[0] if len(conds) == 1 else ("and", tuple(conds))
                )
        if self.kw("ORDER"):
            self.expect("BY")
            while True:
                tok = self.peek()
                if tok is None:
                    break
                up = tok.upper()
                asc = None
                if up in ("ASC", "DESC"):
                    self.next()
                    self.expect("(")
                    asc = up == "ASC"
                elif tok.startswith("?"):
                    q.order_by.append((self.next(), True))
                    continue
                elif tok == "(" or (
                    (up in _AGG_FUNCS or tok.lower() in _BIND_FN_NAMES)
                    and self.i + 1 < len(self.t)
                    and self.t[self.i + 1] == "("
                ):
                    pass  # bracketed / builtin-call / aggregate key
                else:
                    break
                # expression sort key (SPARQL 1.1 grammar [24]
                # OrderCondition): parse as a value expression —
                # aggregates desugar to hidden ?__haggN aliases like
                # SELECT expressions do — and desugar the key itself to
                # a hidden bind the executor materializes as a sort
                # sidecar and drops from the output
                save_ctx = self._agg_ctx
                self._agg_ctx = q
                try:
                    e = self._bind_expr()
                finally:
                    self._agg_ctx = save_ctx
                if asc is not None:
                    self.expect(")")
                if e[0] == "var":
                    q.order_by.append((e[1], asc if asc is not None else True))
                    continue
                if q.distinct and q.variables:
                    # with DISTINCT the key is computed per distinct
                    # solution, which is only well-defined when the
                    # expression is a function of the projection
                    proj = {
                        v[1:] for v in q.variables if v.startswith("?")
                    } | {a.alias[1:] for a in q.aggregates}
                    bad = sorted(_expr_vars(e) - proj)
                    if bad:
                        raise SparqlSyntaxError(
                            "ORDER BY expression under DISTINCT may "
                            f"only use projected variables: {bad}"
                        )
                name = f"__ord_e{len(q.order_hidden)}"
                q.order_hidden.append(name)
                sink = (
                    q.postagg_binds
                    if (q.aggregates or q.group_by)
                    else q.binds
                )
                sink.append(BindAssign(name, e))
                q.order_by.append((f"?{name}", asc if asc is not None else True))
        if self.kw("LIMIT"):
            q.limit = int(self.next())
        if self.kw("OFFSET"):
            q.offset = int(self.next())
        if self.kw("VALUES"):
            # trailing ValuesClause (SPARQL 1.1 grammar [28]): the
            # inline table joins the query's solutions. For vars bound
            # by graph patterns the in-group compatibility join is
            # equivalent (group keys pass through aggregation
            # unchanged; new vars extend every solution) — a VALUES
            # over an aggregate alias or BIND output would need a
            # post-projection join and is rejected explicitly.
            vb = self._values_block()
            post = {a.alias[1:] for a in q.aggregates} | {
                b.var for b in q.binds
            }
            needs_post = bool(set(vb.vars) & post)
            if (q.aggregates or q.group_by) and not needs_post:
                # SPARQL 18.2.4 joins the ValuesClause AFTER grouping:
                # only group keys survive aggregation with their
                # bindings, so only they may fold into the group; a
                # non-group-key var is unbound post-aggregation and
                # must join the projected solutions instead (where the
                # VALUES row binds it freely, counts unchanged).
                gkeys = {v[1:] for v in q.group_by}
                needs_post = bool(set(vb.vars) - gkeys)
            # round 5: VALUES over aggregate aliases / BIND outputs /
            # non-group-key vars joins POST-projection on the rendered
            # solutions (previously an explicit rejection)
            (q.post_values if needs_post else q.values).append(vb)


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


@dataclass
class ExistsExpr(FilterExpr):
    """SPARQL 1.1 §17.4.1.4 ``EXISTS { … }`` as an *expression* — a
    boolean leaf inside arbitrary FILTER combinations
    (``FILTER(EXISTS { … } && ?p > 5)``).

    The bare top-level ``FILTER [NOT] EXISTS`` keeps its semi/anti-join
    fast path; this node instead materializes a boolean *marker*
    column (one compatibility semi-join over the DISTINCT outer key
    set, joined back null-safely — never a row-multiplying join) that
    the enclosing expression reads like any other predicate. EBV of
    EXISTS is always true/false, never an error, so the marker
    coalesces NULL (no compatible solution) to false.

    The reference evaluates E_Exists anywhere in an ARQ expression
    tree (SURVEY J12; nl/vu/jena gets it from stock ARQ)."""

    marker: str  # hidden column name, attached by _attach_exists_marker
    block: object = None  # GroupBlock: patterns+filters, or full group

    def vars(self) -> set[str]:
        # correlation happens through the marker join, not the
        # expression evaluator — no outer columns read by cond()
        return set()

    def label_vars(self) -> set[str]:
        return set()

    def cond(self):
        return F.coalesce(F.col(self.marker), F.lit(False))


def _exists_leaves(f) -> list:
    """Every ExistsExpr leaf of a FILTER expression tree (incl. ones
    buried in the value trees of the general-expression fallbacks)."""
    if isinstance(f, ExistsExpr):
        return [f]
    if isinstance(f, Not):
        return _exists_leaves(f.child)
    if isinstance(f, (And, Or)):
        out: list = []
        for c in f.children:
            out += _exists_leaves(c)
        return out
    if isinstance(f, EbvExpr):
        return _bind_exists_leaves(f.expr)
    if isinstance(f, ExprCmp):
        return _bind_exists_leaves(f.lhs) + _bind_exists_leaves(f.rhs)
    return []


def _bind_exists_leaves(expr) -> list:
    """Every ExistsExpr reachable from a BIND value tree — through
    ``('existsm', node)`` value leaves or the FilterExpr condition of
    an IF."""
    if isinstance(expr, FilterExpr):
        return _exists_leaves(expr)
    if not isinstance(expr, tuple):
        return []
    if expr[0] == "existsm":
        return _exists_leaves(expr[1])
    out: list = []
    for item in expr[1:]:
        if isinstance(item, (tuple, FilterExpr)):
            out += _bind_exists_leaves(item)
        elif isinstance(item, list):
            for a in item:
                out += _bind_exists_leaves(a)
    return out


def _has_marker_filters(sub: "Query") -> bool:
    return any(_exists_leaves(f) for f in sub.filters) or any(
        _bind_exists_leaves(b.expr) for b in sub.binds
    )


def _cmp_channel(e: tuple) -> str:
    """Static value channel of a BIND-grammar tree: 'str', 'num', or
    'var' (ambiguous — resolved against the other side)."""
    tag = e[0]
    if tag in _STR_FUNCS or tag == "const":
        return "str"
    if tag == "var":
        return "var"
    return "num"


@dataclass
class ExprCmp(FilterExpr):
    """General comparison of two BIND-grammar value expressions —
    ``FILTER(?price * ?qty > 100)``, ``FILTER(STRLEN(?a) < STRLEN(?b))``,
    ``FILTER(CONCAT(?a, "x") = "yx")``. The fallback when the
    specialized (pushdown-normalizable) comparison grammar can't
    express the operands; the reference evaluates these through stock
    ARQ expression trees (SURVEY J12). NULL (unbound/type error)
    propagates through the compiled columns — error → row dropped."""

    lhs: tuple
    op: str
    rhs: tuple

    def _channels(self) -> tuple[str, str]:
        lt, rt = _cmp_channel(self.lhs), _cmp_channel(self.rhs)
        if lt == "var":
            lt = "str" if rt == "str" else "num"
        if rt == "var":
            rt = "str" if lt == "str" else "num"
        return lt, rt

    def vars(self) -> set[str]:
        return _bind_expr_vars(self.lhs) | _bind_expr_vars(self.rhs)

    def label_vars(self) -> set[str]:
        out = _bind_label_vars(self.lhs) | _bind_label_vars(self.rhs)
        lt, rt = self._channels()
        # a bare var compared in the string channel reads its label
        if lt == "str" and self.lhs[0] == "var":
            out.add(self.lhs[1][1:])
        if rt == "str" and self.rhs[0] == "var":
            out.add(self.rhs[1][1:])
        return out

    def _side(self, e: tuple, ch: str):
        from hbase_rdf_spark.plans.filters import str_value

        if ch == "str":
            return str_value(e[1][1:]) if e[0] == "var" else _bind_str_col(e)
        return _bind_num_col(e)

    def cond(self):
        lt, rt = self._channels()
        if lt != rt:
            # statically type-incompatible operands (e.g.
            # STRLEN(?a) = CONCAT(?b, "x")): a type error on every
            # row → NULL condition (error → row dropped in FILTER,
            # error-propagating under !/&&/||), matching ARQ's
            # ExprEvalException — not a raise at execution time
            return F.lit(None).cast("boolean")
        lc, rc = self._side(self.lhs, lt), self._side(self.rhs, rt)
        return _CMP[self.op](lc, rc)


# kind-1 lexical of a typed literal with a non-xsd:string datatype —
# outside the §17.2.2 EBV domain (plain / lang-tagged / xsd:string
# literals have string EBV; booleans and numerics inline to kind 2)
_EBV_NONSTR_RX = (
    r'^".*"\^\^<(?!http://www\.w3\.org/2001/XMLSchema#string>)[^<>]*>$'
)


@dataclass
class EbvExpr(FilterExpr):
    """§17.2.2 effective boolean value of a bare value expression used
    as a FILTER — ``FILTER(?flag)``, ``FILTER(IF(?p > 5, 1, 0))``.
    Numerics (incl. the inlined xsd:booleans) are true iff non-zero
    (NaN is false); plain/xsd:string literals iff non-empty;
    IRIs/unbound/non-string typed literals are a type error → NULL →
    row dropped."""

    expr: tuple

    def vars(self) -> set[str]:
        return _bind_expr_vars(self.expr)

    def label_vars(self) -> set[str]:
        out = set(_bind_label_vars(self.expr))
        if self.expr[0] == "var":
            out.add(self.expr[1][1:])  # kind-1 strings read their lexical
        return out

    def cond(self):
        from hbase_rdf_spark.plans.filters import str_value

        e = self.expr
        if e[0] == "var":
            name = e[1][1:]
            v = F.col(name)
            num = v.getField("num")
            lbl = F.col(f"__{name}_flbl")
            return (
                # §17.2.2 rule: EBV(NaN) is false, but Spark's
                # NaN != 0 is true — guard explicitly
                F.when(v.getField("kind") == 2, (num != 0) & ~F.isnan(num))
                .when(
                    # a typed literal whose datatype is neither
                    # xsd:string nor boolean/numeric (those inline to
                    # kind 2) has no EBV: type error → NULL → dropped
                    (v.getField("kind") == 1) & lbl.rlike(_EBV_NONSTR_RX),
                    F.lit(None).cast("boolean"),
                )
                .when(
                    v.getField("kind") == 1,
                    F.length(str_value(name)) > 0,
                )
            )
        if _cmp_channel(e) == "str":
            return F.length(_bind_str_col(e)) > 0
        num = _bind_num_col(e)
        return (num != 0) & ~F.isnan(num)


def parse(query: str) -> Query:
    return _Parser(tokenize(query)).parse()


# ---------------------------------------------------------------------------
# execution
# ---------------------------------------------------------------------------

_LANG_RX = r'^".*"@([A-Za-z0-9-]+)$'


def _add_order_sidecars(df: DataFrame, order_by) -> tuple[DataFrame, set[str]]:
    """Attach ``__ord_{v}_k`` / ``__ord_{v}_n`` sort-key columns for each
    ORDER BY var still in binding-struct form.

    SPARQL's total order is type-aware — lexicographic sort over the
    materialized strings would rank "150.0" before "50.0". The sidecars
    reproduce the spec order where it is defined and a deterministic
    extension where it is not: unbound (-1) < blank nodes (-0.5,
    refined at sort time from the rendered ``_:`` prefix) <
    entities/IRIs (0) < literals (1); numeric literals compare by
    value and sort before string literals (num NULL); remaining ties
    break on the materialized lexical form — tagged/typed literals
    render with their full ``"lex"@lang`` / ``"lex"^^<dt>`` wrapper,
    so the tie-break distinguishes them deterministically where the
    spec leaves the order undefined.
    """
    added: set[str] = set()
    structy = {
        f.name for f in df.schema.fields
        if f.dataType.typeName() == "struct"
    }
    for v, _asc in order_by:
        name = v[1:]
        if name not in structy or name in added:
            continue
        b = F.col(name)
        df = df.withColumn(
            f"__ord_{name}_k",
            F.when(b.isNull(), F.lit(-1))
            .when(b.getField("kind") == 0, F.lit(0))
            .otherwise(F.lit(1)),
        ).withColumn(f"__ord_{name}_n", b.getField("num"))
        added.add(name)
    return df, added


def _split_block_filters(blk: GroupBlock):
    """Partition a MINUS/EXISTS block's filters into (local, foreign):
    local filters reference only vars the block's own patterns bind
    (they evaluate inside ``execute_bgp``); foreign ones also touch
    vars from the enclosing scope and need block-specific handling —
    substitution (EXISTS) or unbound-NULL evaluation (MINUS)."""
    bound = pattern_vars(blk.patterns)
    for ob in blk.optional:
        bound |= _block_vars(ob)
    local = [f for f in blk.filters if f.vars() <= bound]
    foreign = [f for f in blk.filters if not f.vars() <= bound]
    return local, foreign


def _apply_lang_filters(result: DataFrame, store, lang_filters) -> DataFrame:
    """Legacy LangFilter application (parser-built queries use the
    LangMatch FilterExpr instead, evaluated inside execute_bgp)."""
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
        return F.concat_ws(
            getattr(a, "separator", " "), F.sort_array(members)
        ).alias(a.alias[1:])
    num = F.col(a.var[1:]).getField("num")
    if a.distinct and a.func in ("SUM", "AVG"):
        # §18.5.1: Distinct applies to the multiset of argument values.
        # MIN/MAX are insensitive; AVG(DISTINCT) = SUM/COUNT of the
        # distinct values (try_divide: empty group → NULL, not error)
        if a.func == "SUM":
            return F.sum_distinct(num).alias(a.alias[1:])
        return F.try_divide(
            F.sum_distinct(num), F.count_distinct(num)
        ).alias(a.alias[1:])
    fn = {"SUM": F.sum, "AVG": F.avg, "MIN": F.min, "MAX": F.max}[a.func]
    return fn(num).alias(a.alias[1:])


def _attach_labels(result, store, var_names):
    """Join the lexical label for each var (numeric fallback) as
    ``__{v}_lbl`` — needed by label-space aggregates BEFORE grouping.
    A var carrying a ``__{v}_vlex`` sidecar (BIND-produced string,
    VALUES literal) uses it first: its in-plan hash id is not in the
    dictionary, so the id2term join would miss."""
    for v in var_names:
        d = store.id2term().select(
            F.col("id").alias(f"__{v}_aid"), F.col("label").alias(f"__{v}_albl")
        )
        side = (
            [F.col(f"__{v}_vlex")]
            if f"__{v}_vlex" in result.columns
            else []
        )
        result = (
            result.join(
                d, result[v].getField("id") == d[f"__{v}_aid"], "left"
            )
            .withColumn(
                f"__{v}_lbl",
                F.coalesce(
                    *side,
                    F.col(f"__{v}_albl"),
                    F.col(v).getField("num").cast("string"),
                ),
            )
            .drop(f"__{v}_aid", f"__{v}_albl")
        )
    return result


def _describe(
    store, q: Query, bindings: DataFrame | None, with_kinds: bool = False
) -> DataFrame:
    """DESCRIBE: all triples whose subject is the described resource(s) —
    the subject-triples handler of the reference (J11, execDescribeTriples,
    reference: examples/RunJenaHBase.java:93-98).

    ``with_kinds`` (service layer): emit ``__k_s/__k_p/__k_o`` term-kind
    sidecars — s/p are always entities, o's kind comes off the index —
    so the N-Triples serializer types terms exactly."""
    from hbase_rdf_spark.plans.patterns import encode_term

    targets = q.describe_target
    if targets == "*":
        assert bindings is not None
        targets = [
            f"?{c}" for c in bindings.columns if not c.startswith("__")
        ]
    elif not isinstance(targets, list):  # legacy single-target form
        targets = [targets]
    id_frames = []
    for term in targets:
        if isinstance(term, str) and term.startswith("?"):
            assert bindings is not None
            id_frames.append(
                bindings.select(F.col(term[1:]).getField("id").alias("s"))
            )
        else:
            lex = term if isinstance(term, str) else term[0]
            kind = 0 if isinstance(term, str) else term[1]
            id_frames.append(
                store.spark.range(1).select(encode_term(lex, kind).alias("s"))
            )
    ids = id_frames[0]
    for fr in id_frames[1:]:
        ids = ids.unionByName(fr)
    ids = ids.distinct()
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
    cols = [
        F.col("__s_l").alias("s"),
        F.col("__p_l").alias("p"),
        F.coalesce(F.col("__o_l"), F.col("o_num").cast("string")).alias("o"),
    ]
    if with_kinds:
        cols += [
            F.lit(0).cast("tinyint").alias("__k_s"),
            F.lit(0).cast("tinyint").alias("__k_p"),
            F.col("o_kind").cast("tinyint").alias("__k_o"),
        ]
    return out.select(*cols).dropDuplicates()


def _construct(
    store, q: Query, bindings: DataFrame, with_kinds: bool = False
) -> DataFrame:
    """CONSTRUCT: instantiate the template once per binding, union the
    per-pattern projections, distinct — stock-ARQ semantics (J11).

    ``with_kinds``: emit ``__k_s/__k_p/__k_o`` sidecars — a var slot's
    kind comes from materialization, a constant slot's from its parsed
    term (IRI 0 / literal tuple 1 / float 2), template bnodes are 0."""
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
    # template-only blank nodes (§16.2: a fresh blank node per
    # solution, shared across the template's patterns within one
    # solution): not bound by the WHERE clause, so they render as a
    # content-addressed label — hash of the solution's bound template
    # vars + the bnode's template slot (deterministic across runs,
    # distinct across solutions)
    bound = set(bindings.columns)
    fresh_bns = [
        v for v in tmpl_vars if v.startswith("__bn_") and v not in bound
    ]
    tmpl_vars = [v for v in tmpl_vars if v not in fresh_bns]
    if fresh_bns:
        # hash the WHOLE solution (all binding structs, not just the
        # template's vars) so two solutions differing only in a
        # non-template var still get distinct nodes; duplicate
        # solutions share one (the triple set dedups regardless)
        sol_cols = [c for c in bindings.columns if not c.startswith("__")]
        for bn in fresh_bns:
            bindings = bindings.withColumn(
                bn,
                F.concat(
                    F.lit("_:c"),
                    F.abs(
                        F.xxhash64(F.lit(bn), *[F.col(c) for c in sol_cols])
                    ).cast("string"),
                ),
            )
    mat = materialize(
        bindings, store, [f"?{v}" for v in tmpl_vars],
        keep=fresh_bns, with_kinds=with_kinds,
    )

    def render(e):
        if _is_var(e):
            return F.col(e[1:])
        if isinstance(e, tuple):
            return F.lit(e[0])
        return F.lit(str(e))

    def kind_of(e):
        if _is_var(e):
            n = e[1:]
            if n in fresh_bns:  # template bnode → entity
                return F.lit(0).cast("tinyint")
            return F.col(f"__k_{n}")
        if isinstance(e, tuple):
            return F.lit(int(e[1])).cast("tinyint")
        if isinstance(e, float):
            return F.lit(2).cast("tinyint")
        return F.lit(0).cast("tinyint")  # IRI constant

    out = None
    for pat in q.construct_template:
        cols = [
            render(pat.s).alias("s"),
            render(pat.p).alias("p"),
            render(pat.o).alias("o"),
        ]
        if with_kinds:
            cols += [
                kind_of(pat.s).alias("__k_s"),
                kind_of(pat.p).alias("__k_p"),
                kind_of(pat.o).alias("__k_o"),
            ]
        rowset = mat.select(*cols)
        out = rowset if out is None else out.unionByName(rowset)
    assert out is not None, "empty CONSTRUCT template"
    # a binding with an unbound (OPTIONAL) var yields no triple for
    # patterns using it, per SPARQL semantics
    return out.filter(
        F.col("s").isNotNull() & F.col("p").isNotNull() & F.col("o").isNotNull()
    ).dropDuplicates()


def _values_df(store, vb: ValuesBlock) -> DataFrame:
    """VALUES rows → a DataFrame of binding structs (one col per var).

    Ids are computed with the SAME in-plan hash as pattern constants
    (xxhash64(kind, lex)), so the join keys line up with scan output.
    """
    from hbase_rdf_spark.plans.bgp import _binding_struct

    flat_rows = []
    for row in vb.rows:
        flat: list = []
        for t in row:
            if t is UNDEF:
                flat += [None, None, None]
            elif isinstance(t, (int, float)) and not isinstance(t, bool):
                flat += [None, 2, float(t)]
            else:
                lex, kind = t if isinstance(t, tuple) else (t, 0)
                flat += [lex, kind, None]
        flat_rows.append(tuple(flat))
    schema = ", ".join(
        f"__{v}_lex string, __{v}_kind int, __{v}_num double" for v in vb.vars
    )
    df = store.spark.createDataFrame(flat_rows, schema)
    cols = []
    for v in vb.vars:
        k = F.col(f"__{v}_kind")
        ident = F.when(k != 2, F.xxhash64(k.cast("int"), F.col(f"__{v}_lex")))
        # an UNDEF cell (NULL kind) is an unbound var: the whole struct
        # is NULL, matching how OPTIONAL leaves vars unbound
        cols.append(
            F.when(k.isNotNull(), _binding_struct(k, ident, F.col(f"__{v}_num")))
            .alias(v)
        )
        # VALUES may introduce terms absent from the store dictionary;
        # carry the lexical form so materialize() can still render them
        cols.append(F.col(f"__{v}_lex").alias(f"__{v}_vlex"))
    return df.select(*cols)


_SERVICE_VAR_MAX_ENDPOINTS = 8


def _service_values_block(
    sb: ServiceBlock, values_blocks=(),
) -> ValuesBlock | None:
    """Execute a SERVICE block against its endpoint and shape the
    response as a ValuesBlock (SPARQL 1.1 Federated Query §2.2: the
    SERVICE solution sequence joins the group like any other).

    The remote query is ``SELECT * WHERE { <verbatim token span> }``
    prefixed with the outer query's PREFIX declarations — the tokens
    re-serialize losslessly (each is self-delimiting), so the remote
    engine sees exactly the group the user wrote, including OPTIONAL /
    FILTER / paths this engine never has to plan. Failure: plain
    SERVICE re-raises (query aborts); SERVICE SILENT returns ``None``,
    which the caller treats as the unit solution (join identity), per
    §4.

    ``SERVICE ?ep``: the candidate endpoints are enumerated from the
    query's VALUES clauses (the standard federation idiom — truly
    dynamic discovery from graph data stays an error). Each candidate
    is queried; the union of responses, each row extended with its
    ?ep binding, joins the group, and the VALUES compatibility join
    enforces ?ep consistency. Per-endpoint SILENT failures contribute
    that endpoint's unit solution (?ep bound, everything else UNDEF)."""
    from hbase_rdf_spark.service import fetch_bindings

    text = "".join(
        f"PREFIX {p}: <{iri}>\n" for p, iri in sb.prefixes.items()
    ) + "SELECT * WHERE { " + " ".join(sb.tokens) + " }"
    if not sb.endpoint_var:
        try:
            head_vars, rows = fetch_bindings(sb.endpoint, text)
        except RuntimeError:
            if sb.silent:
                return None
            raise
        return ValuesBlock(vars=head_vars, rows=rows)

    cands: list[str] = []
    for vb in values_blocks:
        if sb.endpoint_var in vb.vars:
            i = vb.vars.index(sb.endpoint_var)
            for row in vb.rows:
                cell = row[i]
                iri = (
                    cell if isinstance(cell, str)
                    else cell[0] if isinstance(cell, tuple) else None
                )
                if iri and not iri.startswith("_:") and iri not in cands:
                    cands.append(iri)
    if not cands:
        raise SparqlSyntaxError(
            f"SERVICE ?{sb.endpoint_var} requires the endpoint variable "
            "to be enumerable from a VALUES clause in the query"
        )
    if len(cands) > _SERVICE_VAR_MAX_ENDPOINTS:
        raise SparqlSyntaxError(
            f"SERVICE ?{sb.endpoint_var} enumerates {len(cands)} "
            f"endpoints (cap {_SERVICE_VAR_MAX_ENDPOINTS})"
        )
    per: list[tuple[str, list[str], list[list]]] = []
    for ep in cands:
        try:
            hv, rows = fetch_bindings(ep, text)
        except RuntimeError:
            if sb.silent:
                per.append((ep, [], [[]]))  # unit solution for this ep
                continue
            raise
        per.append((ep, hv, rows))
    out_vars = [sb.endpoint_var] + sorted(
        set().union(set(), *(set(hv) for _, hv, _ in per))
        - {sb.endpoint_var}
    )
    out_rows: list[list] = []
    for ep, hv, rows in per:
        ep_cell = (ep, 0)  # KIND_ENTITY tuple, term_from_json shape
        for r in rows:
            m = dict(zip(hv, r))
            out_rows.append(
                [ep_cell] + [m.get(v, UNDEF) for v in out_vars[1:]]
            )
    return ValuesBlock(vars=out_vars, rows=out_rows)


_STR_FUNCS = (
    "str", "concat", "ucase", "lcase",
    "substr", "replace", "strbefore", "strafter",
    "md5", "sha1", "sha256", "sha384", "sha512", "encode_for_uri",
    "lang", "tz", "struuid",
)

#: expressions that construct a NON-plain-string term (IRI / typed or
#: tagged literal) — term-valued like COALESCE/IF, not _STR_FUNCS.
#: TIMEZONE() constructs an xsd:dayTimeDuration typed literal
#: (§17.4.5.7), unlike plain-string TZ(); NOW() an xsd:dateTime,
#: UUID() a urn:uuid IRI.
_TERM_CTORS = ("iri", "strdt", "strlang", "timezone", "now", "uuid", "bnode")


def _bind_num_col(expr: tuple):
    """Numeric value column of a BIND arithmetic tree (NULL = error →
    unbound, incl. division by zero under ANSI-off semantics)."""
    tag = expr[0]
    if tag == "var":
        return F.col(expr[1][1:]).getField("num")
    if tag == "num":
        return F.lit(expr[1])
    if tag == "rand":
        # §17.4.4.1 — per-row xsd:double in [0, 1), JVM-side
        return F.rand()
    if tag == "cast":
        return _cast_num_col(expr)
    if tag == "strlen":
        return F.length(_bind_str_col(expr[1])).cast("double")
    if tag == "nfunc":
        c = _bind_num_col(expr[2])
        if expr[1] == "abs":
            return F.abs(c)
        if expr[1] == "ceil":
            return F.ceil(c).cast("double")
        if expr[1] == "floor":
            return F.floor(c).cast("double")
        # SPARQL/xpath ROUND: half rounds toward positive infinity
        return F.floor(c + F.lit(0.5)).cast("double")
    if tag == "coalesce":
        return F.coalesce(*[_bind_num_col(a) for a in expr[1]])
    if tag == "existsm":
        # EXISTS-as-value: true/false, never an error → 1.0/0.0 (the
        # inlined xsd:boolean space); marker attached pre-bind
        return F.when(expr[1].cond(), F.lit(1.0)).otherwise(F.lit(0.0))
    if tag == "if":
        c = expr[1].cond()
        return (
            F.when(c, _bind_num_col(expr[2]))
            .when(~c, _bind_num_col(expr[3]))
        )
    if tag in _DT_NUM_FNS:
        from hbase_rdf_spark.plans.filters import dt_part

        return dt_part(_bind_str_col(expr[1]), tag)
    if tag == "const" or tag in _STR_FUNCS or tag in _TERM_CTORS:
        raise SparqlSyntaxError(
            "string-valued expression inside BIND arithmetic"
        )
    _, op, left, right = expr
    lc, rc = _bind_num_col(left), _bind_num_col(right)
    if op == "/":
        # SPARQL division-by-zero is an error → unbound (Spark's int/
        # float division already yields NULL with ANSI off, but be
        # explicit so the semantics don't depend on session config)
        return F.when(rc != 0, lc / rc)
    return {"+": lc + rc, "-": lc - rc, "*": lc * rc}[op]


def _cast_num_col(expr: tuple):
    """``('cast', local, arg)`` — XSD numeric/boolean constructor cast
    (XPath casting rules, SPARQL 1.1 §17.5). Two source channels: the
    argument's NUMERIC value (a kind-2 term or arithmetic result) and
    its LEXICAL form (a string literal / string expression); whichever
    is populated drives the cast. NULL result = casting error →
    unbound."""
    _, target, arg = expr
    if arg[0] == "var":
        from hbase_rdf_spark.plans.filters import str_value

        v = arg[1][1:]
        from_num = F.col(v).getField("num")
        # lexical channel only for NON-numeric terms — str_value's
        # num-as-string fallback must not re-enter the numeric channel
        lex = F.when(from_num.isNull(), str_value(v))
    elif arg[0] == "const" or arg[0] in _STR_FUNCS:
        from_num = F.lit(None).cast("double")
        lex = _bind_str_col(arg)
    else:
        from_num = _bind_num_col(arg)
        lex = F.lit(None).cast("string")
    if target == "boolean":
        # numbers: 0 → false, anything else → true; lexical space:
        # true/false/1/0 (XPath §19.1.2.2) — stored as 1.0 / 0.0,
        # matching how sources/ntriples.py inlines xsd:boolean
        return F.coalesce(
            F.when(
                from_num.isNotNull(),
                F.when(from_num != 0, F.lit(1.0)).otherwise(F.lit(0.0)),
            ),
            F.when(F.trim(lex).isin("true", "1"), F.lit(1.0)).when(
                F.trim(lex).isin("false", "0"), F.lit(0.0)
            ),
        )
    if target in _CAST_INT_TYPES:
        # numeric source truncates toward zero; a non-integer lexical
        # is a casting ERROR (try_cast → NULL), per XPath. Constrained
        # derived types enforce their value ranges — out-of-range is
        # an error, same rule the reference's TypedId encoders assert
        # (id/TypedIdTestNumericals.java:91-104)
        out = F.coalesce(
            from_num.cast("long"), F.trim(lex).try_cast("long")
        ).cast("double")
        range_ok = {
            "nonPositiveInteger": out <= 0,
            "negativeInteger": out < 0,
            "positiveInteger": out > 0,
            **{
                t: out >= 0
                for t in (
                    "nonNegativeInteger", "unsignedLong", "unsignedInt",
                    "unsignedShort", "unsignedByte",
                )
            },
        }
        return F.when(range_ok[target], out) if target in range_ok else out
    # double / float / decimal
    return F.coalesce(from_num, F.trim(lex).try_cast("double"))


def _bind_str_col(expr: tuple):
    """String value column of a BIND string tree. Variables read their
    attached ``__{v}_flbl`` label (tag/datatype wrappers stripped, per
    SPARQL ``str()``) with the numeric fallback; see ``_apply_binds``
    for the attach step."""
    from hbase_rdf_spark.plans.filters import str_value

    tag = expr[0]
    if tag == "var":
        return str_value(expr[1][1:])
    if tag == "num":
        return F.lit(expr[1]).cast("string")
    if tag == "const":
        t = expr[1]
        lex, _kind = t if isinstance(t, tuple) else (t, 0)
        return F.lit(lex)
    if tag == "str":
        return _bind_str_col(expr[1])
    if tag == "concat":
        return F.concat(*[_bind_str_col(a) for a in expr[1]])
    if tag == "ucase":
        return F.upper(_bind_str_col(expr[1]))
    if tag == "lcase":
        return F.lower(_bind_str_col(expr[1]))
    if tag == "substr":
        s = _bind_str_col(expr[1])
        start = _bind_num_col(expr[2]).cast("int")
        if expr[3] is None:
            return F.substring(s, start, F.length(s))
        return F.substring(s, start, _bind_num_col(expr[3]).cast("int"))
    if tag == "replace":
        _, s_e, pat, repl, flags = expr
        if "i" in flags:
            pat = "(?i)" + pat
        return F.regexp_replace(_bind_str_col(s_e), F.lit(pat), F.lit(repl))
    if tag in ("strbefore", "strafter"):
        s = _bind_str_col(expr[1])
        t = expr[2]
        found = F.instr(s, F.lit(t))
        if tag == "strbefore":
            # STRBEFORE(s, "") = "" ; not found → "" (SPARQL §17.4.3.8)
            if t == "":
                return F.lit("")
            return F.when(found > 0, F.substring(s, F.lit(1), found - 1)) \
                .otherwise(F.lit(""))
        # STRAFTER(s, "") = s ; not found → ""
        if t == "":
            return s
        return F.when(
            found > 0, F.substring(s, found + len(t), F.length(s))
        ).otherwise(F.lit(""))
    if tag == "lang":
        # §17.4.4.3 — the tag of a language-tagged literal, "" for any
        # other literal (numerics included: their raw label is NULL).
        # The RAW label (wrapper intact) is read, not str()'s stripped
        # form, so the variable must be a label-attached var.
        if expr[1][0] != "var":
            raise SparqlSyntaxError("LANG() takes a variable")
        raw = F.col(f"__{expr[1][1][1:]}_flbl")
        return F.when(
            raw.rlike(_LANG_RX), F.regexp_extract(raw, _LANG_RX, 1)
        ).otherwise(F.lit(""))
    if tag == "tz":
        from hbase_rdf_spark.plans.filters import tz_part

        return tz_part(_bind_str_col(expr[1]))
    if tag == "timezone":
        # STR(TIMEZONE(?t)) — the duration lexical without the type
        from hbase_rdf_spark.plans.filters import timezone_duration

        return timezone_duration(_bind_str_col(expr[1]))
    if tag == "struuid":
        # §17.4.4.3 — one fresh UUID string per solution, JVM-side
        return F.expr("uuid()")
    if tag == "now":
        return F.lit(expr[1])
    if tag == "uuid":
        return F.concat(F.lit("urn:uuid:"), F.expr("uuid()"))
    if tag in ("md5", "sha1", "sha256", "sha384", "sha512"):
        c = _bind_str_col(expr[1])
        if tag == "md5":
            return F.md5(c)
        if tag == "sha1":
            return F.sha1(c)
        return F.sha2(c, int(tag[3:]))
    if tag == "encode_for_uri":
        # Java URLEncoder (F.url_encode) → RFC 3986 percent-encoding
        # (SPARQL §17.4.3.18): '+' (an encoded space; a literal '+' is
        # already %2B) → %20, %7E → unreserved '~', kept '*' → %2A
        c = F.url_encode(_bind_str_col(expr[1]))
        c = F.replace(c, F.lit("+"), F.lit("%20"))
        c = F.replace(c, F.lit("%7E"), F.lit("~"))
        return F.replace(c, F.lit("*"), F.lit("%2A"))
    if tag == "bnode":
        # STR() of a blank node is a type error (§17.4.2.5) → unbound
        return F.lit(None).cast("string")
    if tag in _TERM_CTORS:
        # str() of a constructed term: the IRI string / plain lexical
        return _bind_str_col(expr[1])
    if tag == "coalesce":
        return F.coalesce(*[_bind_str_col(a) for a in expr[1]])
    if tag == "if":
        c = expr[1].cond()
        return (
            F.when(c, _bind_str_col(expr[2]))
            .when(~c, _bind_str_col(expr[3]))
        )
    # arith / strlen / nfunc in string position: render the number
    return _bind_num_col(expr).cast("string")


def _has_bnode(expr) -> bool:
    """True when a value-expression tree contains a BNODE() call."""
    if isinstance(expr, tuple):
        if expr[0] == "bnode":
            return True
        return any(_has_bnode(a) for a in expr[1:])
    if isinstance(expr, list):
        return any(_has_bnode(a) for a in expr)
    return False


def _bind_label_vars(expr: tuple) -> set[str]:
    """Vars (no '?') whose LABEL the expression reads — through a
    string-context subtree or an IF condition's label-space filter."""
    tag = expr[0]
    if tag in ("num", "const", "existsm") or tag in _NOARG_FNS:
        return set()
    if tag == "var":
        return set()  # only counts when reached through a string node
    if tag == "arith":
        return _bind_label_vars(expr[2]) | _bind_label_vars(expr[3])
    if tag == "nfunc":
        return _bind_label_vars(expr[2])
    if tag == "concat":
        out: set[str] = set()
        for a in expr[1]:
            out |= _str_ctx_vars(a)
        return out
    if tag == "coalesce":
        # args are term-valued at the top level and string/num-valued in
        # typed context; label needs surface only via string children
        out = set()
        for a in expr[1]:
            out |= _bind_label_vars(a)
        return out
    if tag == "if":
        return (
            set(expr[1].label_vars())
            | _bind_label_vars(expr[2])
            | _bind_label_vars(expr[3])
        )
    if tag == "substr":
        out = _str_ctx_vars(expr[1]) | _bind_label_vars(expr[2])
        if expr[3] is not None:
            out |= _bind_label_vars(expr[3])
        return out
    if tag in ("replace", "strbefore", "strafter"):
        return _str_ctx_vars(expr[1])
    if tag == "bnode":
        return _str_ctx_vars(expr[2]) if expr[2] is not None else set()
    if tag == "cast":
        # a var source may fall back to its lexical form (non-numeric
        # term cast to a number) — the label must be attached
        return _str_ctx_vars(expr[2])
    # str / ucase / lcase / strlen — child is in string context
    return _str_ctx_vars(expr[1])


def _str_ctx_vars(expr: tuple) -> set[str]:
    if expr[0] == "var":
        return {expr[1][1:]}
    if expr[0] == "coalesce":
        out: set[str] = set()
        for a in expr[1]:
            out |= _str_ctx_vars(a)
        return out
    if expr[0] == "if":
        return (
            set(expr[1].label_vars())
            | _str_ctx_vars(expr[2])
            | _str_ctx_vars(expr[3])
        )
    return _bind_label_vars(expr)


def _attach_any_labels(result: DataFrame, store, names: list[str]):
    """Attach ``__{v}_flbl`` label columns for label-space filter
    evaluation, preferring a BIND/VALUES ``__{v}_vlex`` sidecar (the
    term may be dictionary-absent) over the id2term join. Returns
    (df, attached-column-names)."""
    from hbase_rdf_spark.plans.bgp import _attach_filter_labels

    attached = []
    for v in names:
        if f"__{v}_flbl" in result.columns:
            continue
        if f"__{v}_vlex" in result.columns:
            result = result.withColumn(f"__{v}_flbl", F.col(f"__{v}_vlex"))
        else:
            result = _attach_filter_labels(store, result, [v])
        attached.append(f"__{v}_flbl")
    return result, attached


def _apply_deferred_filter(result: DataFrame, store, f) -> DataFrame:
    """Apply a FILTER deferred past BIND/subquery var creation —
    label-space expressions need their ``__{v}_flbl`` columns attached
    first (a BIND var's lexical lives in its vlex sidecar)."""
    lv = sorted(f.label_vars())
    if not lv:
        return result.filter(f.cond())
    result, attached = _attach_any_labels(result, store, lv)
    return result.filter(f.cond()).drop(*attached)


def _bind_term_value(expr: tuple, columns: list[str]):
    """Evaluate an expression to an RDF *term* — (struct, vlex) column
    pair — preserving the original term type where the expression is
    type-transparent (COALESCE/IF pass their argument through unchanged,
    per SPARQL 1.1 §17.4.1.3: the value, not its string form).

    ``columns`` is the solution's current column list (for var
    sidecar lookup)."""
    from hbase_rdf_spark.plans.bgp import _binding_struct

    tag = expr[0]
    if tag == "var":
        v = expr[1][1:]
        vlex = (
            F.col(f"__{v}_vlex")
            if f"__{v}_vlex" in columns
            else F.lit(None).cast("string")
        )
        return F.col(v), vlex
    if tag == "num":
        return (
            _binding_struct(F.lit(2), F.lit(None), F.lit(expr[1])),
            F.lit(None).cast("string"),
        )
    if tag == "const":
        t = expr[1]
        lex, kind = t if isinstance(t, tuple) else (t, 0)
        return (
            _binding_struct(
                F.lit(kind),
                F.xxhash64(F.lit(kind).cast("int"), F.lit(lex)),
                F.lit(None),
            ),
            F.lit(lex),
        )
    if tag == "coalesce":
        pairs = [_bind_term_value(a, columns) for a in expr[1]]
        struct = F.coalesce(*[s for s, _ in pairs])
        vlex = F.lit(None).cast("string")
        for s, v in reversed(pairs):
            vlex = F.when(s.isNotNull(), v).otherwise(vlex)
        return struct, vlex
    if tag == "if":
        c = expr[1].cond()
        ts, tv = _bind_term_value(expr[2], columns)
        es, ev = _bind_term_value(expr[3], columns)
        # SPARQL: an error-valued condition is an error → unbound
        return (
            F.when(c, ts).when(~c, es),
            F.when(c, tv).when(~c, ev),
        )
    if tag in _STR_FUNCS:
        lex = _bind_str_col(expr)
        return (
            F.when(
                lex.isNotNull(),
                _binding_struct(
                    F.lit(1),
                    F.xxhash64(F.lit(1).cast("int"), lex),
                    F.lit(None),
                ),
            ),
            lex,
        )
    if tag == "iri":
        lex = _bind_str_col(expr[1])
        return (
            F.when(
                lex.isNotNull(),
                _binding_struct(
                    F.lit(0),
                    F.xxhash64(F.lit(0).cast("int"), lex),
                    F.lit(None),
                ),
            ),
            lex,
        )
    if tag == "bnode":
        # §17.4.2.9 — a blank node guaranteed fresh vs the dataset
        # (labels carry a reserved "_:bf"/"_:ba" prefix plus a hash no
        # parsed label collides with at these lengths). The label
        # derives from a hash of the WHOLE solution (the same idiom as
        # CONSTRUCT template bnodes — identical duplicate solutions
        # share a label, the accepted compromise): no-arg calls mix in
        # their per-call-site salt so distinct BNODE() calls mint
        # distinct nodes; BNODE(str) mixes the argument INSTEAD so
        # same-literal calls within one solution unify, per spec.
        sol = (
            [F.col("__bnsol")]
            if "__bnsol" in columns
            # fallback for call sites outside _apply_binds (no batch
            # snapshot): the visible solution columns as-is
            else [F.col(c) for c in columns if not c.startswith("__")]
        )
        if expr[2] is None:
            lex = F.concat(
                F.lit("_:bf"),
                F.lower(F.hex(F.xxhash64(F.lit(f"bn{expr[1]}"), *sol))),
            )
        else:
            arg = _bind_str_col(expr[2])
            lex = F.when(
                arg.isNotNull(),
                F.concat(
                    F.lit("_:ba"),
                    F.lower(F.hex(F.xxhash64(F.lit("bna"), arg, *sol))),
                ),
            )
        # blank nodes share kind 0 with IRIs, distinguished by label
        return (
            F.when(
                lex.isNotNull(),
                _binding_struct(
                    F.lit(0),
                    F.xxhash64(F.lit(0).cast("int"), lex),
                    F.lit(None),
                ),
            ),
            lex,
        )
    if tag == "now":
        # §17.4.5.1 — xsd:dateTime of the query execution instant
        # (lexical captured once at parse time, shared by every NOW()
        # in the query)
        full = (
            '"' + expr[1]
            + '"^^<http://www.w3.org/2001/XMLSchema#dateTime>'
        )
        return (
            _binding_struct(
                F.lit(1),
                F.xxhash64(F.lit(1).cast("int"), F.lit(full)),
                F.lit(None),
            ),
            F.lit(full),
        )
    if tag == "uuid":
        # §17.4.4.2 — a fresh urn:uuid IRI per solution
        lex = F.concat(F.lit("urn:uuid:"), F.expr("uuid()"))
        return (
            _binding_struct(
                F.lit(0), F.xxhash64(F.lit(0).cast("int"), lex), F.lit(None)
            ),
            lex,
        )
    if tag == "timezone":
        # §17.4.5.7 — an xsd:dayTimeDuration typed literal (NULL =
        # no timezone / not a dateTime → type error → unbound)
        from hbase_rdf_spark.plans.filters import timezone_duration

        dur = timezone_duration(_bind_str_col(expr[1]))
        full = F.concat(
            F.lit('"'), dur,
            F.lit('"^^<http://www.w3.org/2001/XMLSchema#dayTimeDuration>'),
        )
        return (
            F.when(
                full.isNotNull(),
                _binding_struct(
                    F.lit(1),
                    F.xxhash64(F.lit(1).cast("int"), full),
                    F.lit(None),
                ),
            ),
            full,
        )
    if tag in ("strdt", "strlang"):
        from hbase_rdf_spark.sources.ntriples import NUMERIC_DATATYPES

        plain = _bind_str_col(expr[1])
        if tag == "strdt" and expr[2] in NUMERIC_DATATYPES:
            # a numeric XSD datatype constructs a kind-2 numeric term
            # (sources/ntriples.py inlines the same 16 types); a
            # non-numeric lexical form is a type error → unbound
            # (try_cast: NULL instead of an ANSI cast failure)
            num = plain.try_cast("double")
            return (
                F.when(
                    num.isNotNull(),
                    _binding_struct(F.lit(2), F.lit(None), num),
                ),
                F.lit(None).cast("string"),
            )
        # full N-Triples lexical form — identical to how the store
        # keeps tagged/typed literals, so ids line up with scans
        suffix = (
            '"@' + expr[2] if tag == "strlang" else '"^^<' + expr[2] + ">"
        )
        full = F.concat(F.lit('"'), plain, F.lit(suffix))
        return (
            F.when(
                full.isNotNull(),
                _binding_struct(
                    F.lit(1),
                    F.xxhash64(F.lit(1).cast("int"), full),
                    F.lit(None),
                ),
            ),
            full,
        )
    # arith / strlen / nfunc → numeric term
    num = _bind_num_col(expr)
    return (
        F.when(num.isNotNull(), _binding_struct(F.lit(2), F.lit(None), num)),
        F.lit(None).cast("string"),
    )


def _apply_binds(
    result: DataFrame, store, binds: list[BindAssign]
) -> DataFrame:
    """Extend solutions with BIND assignments (applied after the
    group's patterns — parse-time guards ensure no pattern consumes a
    BIND var, so this is equivalent to in-place evaluation).

    Representation matches ``_values_df``: constants get the same
    in-plan xxhash64 id as pattern constants; terms possibly absent
    from the dictionary carry a ``__{v}_vlex`` sidecar so
    ``materialize`` can render them; computed numbers are kind-2
    structs with a NULL id. A NULL arithmetic result nulls the whole
    struct (unbound), matching OPTIONAL's null-extension."""
    from hbase_rdf_spark.plans.bgp import _binding_struct

    # label columns attached for ANY bind in this batch are dropped
    # once at the end: two BINDs reading the same var's label (e.g.
    # DAY(?t) and HOURS(?t)) share one id2term join instead of
    # re-joining the dictionary per BIND
    all_attached: list[str] = []
    if any(_has_bnode(b.expr) for b in binds):
        # one SOLUTION-identity hash for the whole batch, captured
        # BEFORE any of its BINDs extend the row: two BNODE("k") calls
        # in the batch must agree no matter how many binds sit between
        # them (a later bind's output column must not perturb the hash)
        result = result.withColumn(
            "__bnsol",
            F.xxhash64(
                *[F.col(c) for c in result.columns
                  if not c.startswith("__")]
            ),
        )
        all_attached.append("__bnsol")
    for b in binds:
        expr = b.expr
        lvars = sorted(_bind_label_vars(expr))
        # a VALUES/BIND-produced var may be dictionary-absent: its vlex
        # sidecar IS the label (_attach_any_labels prefers it)
        result, attached = _attach_any_labels(result, store, lvars)
        all_attached += attached
        if expr[0] in _STR_FUNCS:
            lex = _bind_str_col(expr)
            result = result.withColumn(
                b.var,
                F.when(
                    lex.isNotNull(),
                    _binding_struct(
                        F.lit(1),
                        F.xxhash64(F.lit(1).cast("int"), lex),
                        F.lit(None),
                    ),
                ),
            ).withColumn(f"__{b.var}_vlex", lex)
            continue
        if expr[0] in ("coalesce", "if") or expr[0] in _TERM_CTORS:
            # term-valued: COALESCE/IF return their argument's VALUE
            # (type-preserving), not its string form; IRI/STRDT/STRLANG
            # construct a non-plain-string term
            struct, vlex = _bind_term_value(expr, result.columns)
            result = result.withColumn(b.var, struct).withColumn(
                f"__{b.var}_vlex", vlex
            )
        elif expr[0] == "var":
            src = expr[1][1:]
            result = result.withColumn(b.var, F.col(src))
            if f"__{src}_vlex" in result.columns:
                result = result.withColumn(
                    f"__{b.var}_vlex", F.col(f"__{src}_vlex")
                )
        elif expr[0] == "num":
            result = result.withColumn(
                b.var,
                _binding_struct(F.lit(2), F.lit(None), F.lit(expr[1])),
            )
        elif expr[0] == "const":
            t = expr[1]
            lex, kind = t if isinstance(t, tuple) else (t, 0)
            result = result.withColumn(
                b.var,
                _binding_struct(
                    F.lit(kind),
                    F.xxhash64(F.lit(kind).cast("int"), F.lit(lex)),
                    F.lit(None),
                ),
            ).withColumn(f"__{b.var}_vlex", F.lit(lex))
        else:
            num = _bind_num_col(expr)
            result = result.withColumn(
                b.var,
                F.when(
                    num.isNotNull(),
                    _binding_struct(F.lit(2), F.lit(None), num),
                ),
            )
    if all_attached:  # strlen-in-arithmetic labels, no longer needed
        result = result.drop(*all_attached)
    return result


_CMP = {
    "<": lambda c, n: c < n, "<=": lambda c, n: c <= n,
    ">": lambda c, n: c > n, ">=": lambda c, n: c >= n,
    "=": lambda c, n: c == n, "!=": lambda c, n: c != n,
}


def _having_col(h: tuple):
    """Compile a HAVING expression tree to one boolean Column over the
    aggregated frame (aggregate aliases are plain scalar columns here).
    NULL comparisons evaluate to NULL and the filter drops the group —
    SPARQL's expression-error-eliminates-solution semantics."""
    kind = h[0]
    if kind == "cmp":
        _, v, op, num = h
        return _CMP[op](F.col(v[1:]), num)
    if kind == "and":
        return _reduce(lambda a, b: a & b, (_having_col(c) for c in h[1]))
    if kind == "or":
        return _reduce(lambda a, b: a | b, (_having_col(c) for c in h[1]))
    if kind == "not":
        return ~_having_col(h[1])
    raise ValueError(f"unknown HAVING node {h!r}")


def _postagg_num_col(expr: tuple, scalars: set, gvars: set):
    """Numeric column of a SELECT expression over the AGGREGATED frame
    (SPARQL 1.1 §18.2.4.4): aggregate aliases and earlier SELECT-
    expression targets are plain scalar columns; group-key vars are
    binding structs and contribute their numeric value. NULL = error →
    unbound, same as BIND arithmetic."""
    tag = expr[0]
    if tag == "var":
        n = expr[1][1:]
        if n in scalars:
            return F.col(n).cast("double")
        if n in gvars:
            return F.col(n).getField("num")
        raise SparqlSyntaxError(
            f"SELECT expression over a grouped query may only use "
            f"GROUP BY variables and aggregates, not {expr[1]}"
        )
    if tag == "num":
        return F.lit(expr[1])
    if tag == "nfunc":
        c = _postagg_num_col(expr[2], scalars, gvars)
        if expr[1] == "abs":
            return F.abs(c)
        if expr[1] == "ceil":
            return F.ceil(c).cast("double")
        if expr[1] == "floor":
            return F.floor(c).cast("double")
        return F.floor(c + F.lit(0.5)).cast("double")
    if tag == "coalesce":
        return F.coalesce(
            *[_postagg_num_col(a, scalars, gvars) for a in expr[1]]
        )
    if tag == "if":
        c = expr[1].cond()
        return (
            F.when(c, _postagg_num_col(expr[2], scalars, gvars))
            .when(~c, _postagg_num_col(expr[3], scalars, gvars))
        )
    if tag != "arith":
        raise SparqlSyntaxError(
            "only numeric SELECT expressions are supported over a "
            "grouped query"
        )
    _, op, left, right = expr
    lc = _postagg_num_col(left, scalars, gvars)
    rc = _postagg_num_col(right, scalars, gvars)
    if op == "/":
        return F.when(rc != 0, lc / rc)
    return {"+": lc + rc, "-": lc - rc, "*": lc * rc}[op]


def _apply_postagg(
    df: DataFrame, binds: list, agg_aliases: list, gvars: list
) -> tuple[DataFrame, list, list]:
    """Extend the aggregated frame with the query's SELECT expressions.
    Returns ``(df, scalar_aliases, term_aliases)``: scalar targets pass
    through materialization verbatim like aggregate aliases; a bare
    copy of a group var stays a binding struct (term) and materializes
    with the group keys. Pure projection — no shuffle."""
    term_aliases: list = []
    scalar_aliases: list = []
    scalars = set(agg_aliases)
    gset = set(gvars)
    for b in binds:
        if b.expr[0] == "var" and b.expr[1][1:] in gset:
            src = b.expr[1][1:]
            df = df.withColumn(b.var, F.col(src))
            if f"__{src}_vlex" in df.columns:
                df = df.withColumn(f"__{b.var}_vlex", F.col(f"__{src}_vlex"))
            term_aliases.append(b.var)
        elif b.expr[0] == "var" and b.expr[1][1:] in scalars:
            df = df.withColumn(b.var, F.col(b.expr[1][1:]))
            scalar_aliases.append(b.var)
            scalars.add(b.var)
        else:
            df = df.withColumn(
                b.var, _postagg_num_col(b.expr, scalars, gset)
            )
            scalar_aliases.append(b.var)
            scalars.add(b.var)
    return df, scalar_aliases, term_aliases


def _query_scope_vars(sub: Query) -> set[str]:
    """Every variable a group can bind: pattern vars, UNION branch
    vars, OPTIONAL-nested vars, BIND targets, VALUES vars, subquery
    projections. Used as the visible-var set (``out_names``) of a
    full-algebra OPTIONAL group."""
    names = pattern_vars(sub.patterns)
    for blk in sub.optional:
        names |= _block_vars(blk)
    for chain in sub.union_blocks:
        for br in chain:
            names |= pattern_vars(br.patterns)
            names |= set(getattr(br, "out_names", ()) or ())
            names |= {b.var for b in getattr(br, "binds", ()) or ()}
            for blk in br.optional:
                names |= _block_vars(blk)
    names |= {b.var for b in sub.binds}
    for vb in sub.values:
        names |= set(vb.vars)
    for sb in sub.services:
        names |= set(sb.vars_hint)
    for sq in sub.subqueries:
        names |= set(_subquery_out_names(sq))
    # __bn_* blank-node vars are non-projectable (§4.1.4); __ord_e*
    # hidden ORDER BY expression binds are internal
    return {n for n in names if not n.startswith("__")}


def _subquery_out_names(sub: Query) -> list[str]:
    """Projected column names (no '?') of a subquery."""
    if sub.variables:
        return [v[1:] for v in sub.variables]
    if sub.aggregates:
        # legacy Query-object API (no explicit projection): group keys
        # + visible aggregate aliases; hidden SELECT-expression
        # aggregates (__hagg*) are internal
        return [v[1:] for v in sub.group_by] + [
            a.alias[1:] for a in sub.aggregates
            if not a.alias.startswith("?__")
        ]
    # SELECT *: every visible variable of the group (patterns,
    # OPTIONAL blocks, UNION branches, BIND/VALUES vars, nested
    # subquery projections), in sorted order for determinism;
    # blank-node vars are non-projectable (SPARQL 1.1 §4.1.4)
    names = _query_scope_vars(sub)
    if not names:
        raise SparqlSyntaxError("SELECT * subquery binds no variables")
    return sorted(names)


def _execute_subquery(store, sub: Query) -> DataFrame:
    """Nested { SELECT … }: evaluated bottom-up, entirely in ID SPACE
    (binding-struct columns), so the enclosing group joins it like any
    other pattern source — no premature materialization. Aggregate
    outputs become kind-2 numeric structs (they render via the numeric
    fallback, e.g. COUNT → \"3.0\").

    Surface: the full GroupGraphPattern algebra in the WHERE body —
    BGP + FILTER + OPTIONAL, plus UNION / VALUES / BIND / MINUS /
    FILTER [NOT] EXISTS / nested subqueries via ``_group_bindings``
    (round 4) —, [DISTINCT], aggregates (incl.
    label-space GROUP_CONCAT/SAMPLE → kind-1 structs with a lexical
    sidecar) with GROUP BY/HAVING, and ORDER BY … LIMIT/OFFSET top-k
    slices. Sort keys are type-aware (round 4): an aggregate alias
    sorts on its raw scalar; a pattern/group var sorts on the SPARQL
    total order — unbound < IRIs < literals, numerics by value,
    lexical tie-break on the label (one id2term join per order var).
    Catalyst lowers the sort+limit to ``TakeOrderedAndProject`` — a
    per-partition top-k plus a driver merge of k-row heads, no full
    sort at any scale.
    """
    if sub.order_by and sub.limit is None and sub.offset is None:
        # ORDER without a slice is algebraically unobservable through
        # the enclosing join — reject rather than silently ignore
        raise SparqlSyntaxError(
            "ORDER BY inside a subquery requires LIMIT/OFFSET"
        )
    from hbase_rdf_spark.plans.bgp import _binding_struct

    if (sub.union_blocks or sub.values or sub.services
            or sub.minus or sub.exists
            or sub.binds or sub.subqueries):
        # full-algebra WHERE body (UNION / VALUES / BIND / MINUS /
        # FILTER EXISTS / nested subqueries): the complete
        # GroupGraphPattern evaluator; bag semantics inside — DISTINCT
        # applies to the projection below, per spec
        res = _group_bindings(store, sub, False)
    else:
        _attach_bind_fns(store, sub.optional)
        res = execute_bgp(
            store, sub.patterns, filters=list(sub.filters),
            optional=list(sub.optional),
            dedup=sub.distinct and not sub.aggregates,
        )
    label_aggs: list[str] = []
    pa_scalars: list = []
    if sub.aggregates or sub.group_by:
        if sub.agg_prebinds:
            # aggregate expression arguments: per-solution Extend
            # before grouping (§18.4) — same as the top-level site
            res = _apply_binds(res, store, sub.agg_prebinds)
        label_vars = sorted({
            a.var[1:] for a in sub.aggregates
            if a.func in ("GROUP_CONCAT", "SAMPLE") and a.var
        })
        if label_vars:
            res = _attach_labels(res, store, label_vars)
        label_aggs = [
            a.alias[1:] for a in sub.aggregates
            if a.func in ("GROUP_CONCAT", "SAMPLE")
        ]
        gvars = [v[1:] for v in sub.group_by]
        aggs = [_agg_expr(a) for a in sub.aggregates]
        # a grouped BIND/VALUES string var carries its lexical sidecar
        # through the groupBy (the struct id is the hash OF the
        # lexical, so first() is exact per group)
        aggs += [
            F.first(F.col(f"__{gv}_vlex")).alias(f"__{gv}_vlex")
            for gv in gvars
            if f"__{gv}_vlex" in res.columns
        ]
        if not aggs:
            # aggregate-free GROUP BY (same synth as the top-level
            # site): dropped right after the groupBy
            aggs = [F.count(F.lit(1)).alias("__gb_card")]
        res = res.groupBy(*gvars).agg(*aggs) if gvars else res.agg(*aggs)
        if "__gb_card" in res.columns:
            res = res.drop("__gb_card")
        if sub.having:
            res = res.filter(_having_col(sub.having))
        if sub.postagg_binds:
            res, pa_scalars, _pa_terms = _apply_postagg(
                res, sub.postagg_binds,
                [a.alias[1:] for a in sub.aggregates], gvars,
            )
    if sub.order_by:
        agg_aliases = {a.alias[1:] for a in sub.aggregates} | set(pa_scalars)
        lbl_vars = sorted({
            v[1:] for v, _ in sub.order_by if v[1:] not in agg_aliases
        })
        # type-aware SPARQL total order for binding-struct keys
        # (round 4 — previously numeric-only): unbound < IRIs <
        # literals; numerics by value, string literals after/before
        # them; lexical tie-break on the label — one id2term join per
        # order var, bounded by the subquery's own cardinality (the
        # same plumbing GROUP_CONCAT uses). Aggregate aliases are raw
        # scalars and sort natively.
        if lbl_vars:
            res = _attach_labels(res, store, lbl_vars)
        keys = []
        for v, asc in sub.order_by:
            name = v[1:]
            if name in agg_aliases:
                keys.append(F.col(name).asc() if asc else F.col(name).desc())
                continue
            b = F.col(name)
            rank = (
                F.when(b.isNull(), F.lit(-1))
                .when(b.getField("kind") == 0, F.lit(0))
                .otherwise(F.lit(1))
            )
            num = b.getField("num")
            lbl = F.col(f"__{name}_lbl")
            keys += [
                rank.asc() if asc else rank.desc(),
                num.asc_nulls_last() if asc else num.desc_nulls_first(),
                lbl.asc() if asc else lbl.desc(),
            ]
        res = res.orderBy(*keys)
        if lbl_vars:
            res = res.drop(*[f"__{v}_lbl" for v in lbl_vars])
    if sub.offset:
        res = res.offset(sub.offset)
    if sub.limit is not None:
        res = res.limit(sub.limit)
    # postagg SELECT-expression targets are scalars too — id-space
    # conversion below treats a string one (a GROUP_CONCAT copy) as a
    # label, a numeric one exactly like a numeric aggregate
    scalar_names = [a.alias[1:] for a in sub.aggregates] + list(pa_scalars)
    str_cols = {
        f.name for f in res.schema.fields
        if f.dataType.typeName() == "string"
    }
    for name in scalar_names:
        if name in label_aggs or (name in pa_scalars and name in str_cols):
            # string scalar → kind-1 plain literal with the in-plan
            # hash id + lexical sidecar (same shape as BIND strings)
            res = res.withColumn(
                f"__{name}_vlex", F.col(name)
            ).withColumn(
                name,
                F.when(
                    F.col(f"__{name}_vlex").isNotNull(),
                    _binding_struct(
                        F.lit(1),
                        F.xxhash64(
                            F.lit(1).cast("int"), F.col(f"__{name}_vlex")
                        ),
                        F.lit(None),
                    ),
                ),
            )
        else:
            res = res.withColumn(
                name,
                _binding_struct(
                    F.lit(2), F.lit(None), F.col(name).cast("double")
                ),
            )
    out = _subquery_out_names(sub)
    side = [f"__{n}_vlex" for n in out if f"__{n}_vlex" in res.columns]
    res = res.select(*out, *side)
    if sub.distinct and not sub.aggregates:
        res = res.dropDuplicates()
    return res


def _reject_template_paths(patterns: list) -> None:
    """A CONSTRUCT template is a set of TRIPLES: a property-path
    predicate (Path node or +/*/? modifier) would otherwise render as
    its repr or silently drop the modifier — fabricated triples."""
    for p in patterns:
        if isinstance(p.p, Path) or getattr(p, "path_mod", None):
            raise SparqlSyntaxError(
                "property paths are not allowed in a CONSTRUCT template"
            )


def _bind_scope_check(q: Query) -> None:
    """Parse-level guards that make post-hoc BIND evaluation exact."""
    pat_scope = pattern_vars(q.patterns)
    scope = set(pat_scope)
    for blk in q.optional:
        scope |= _block_vars(blk)
    branch_binds: list[tuple[object, set[str]]] = []  # (bind, branch vars)
    for chain in q.union_blocks:
        for br in chain:
            bvars = pattern_vars(br.patterns) | set(
                getattr(br, "out_names", ())
            )
            for blk in br.optional:
                bvars |= _block_vars(blk)
            scope |= bvars
            for b in getattr(br, "binds", []):
                branch_binds.append((b, bvars))
    for vb in q.values:
        scope |= set(vb.vars)
    for sub in q.subqueries:
        scope |= set(_subquery_out_names(sub))
    # branch-local BINDs: a collision with any PATTERN-bound var (own
    # branch, sibling branch, or the enclosing group) would silently
    # overwrite the column in _combo_result — forbid; two branches
    # binding the SAME fresh var is legal (the branch-tagging idiom)
    for b, bvars in branch_binds:
        if b.var in scope:
            raise SparqlSyntaxError(
                f"BIND ?{b.var} inside a UNION branch would rebind a "
                "variable already bound by a graph pattern"
            )
    q_bind_vars = {b.var for b in q.binds}
    for b, _ in branch_binds:
        if b.var in q_bind_vars:
            raise SparqlSyntaxError(
                f"BIND ?{b.var} is assigned both inside a UNION branch "
                "and at the group level"
            )
    for b in q.binds:
        if b.var in scope:
            # a group pattern may CONSUME the var when every consuming
            # pattern sits after the BIND's parse position — it then
            # evaluates post-Extend and joins back (_post_bind_split).
            # Anything else (a pattern before the BIND, an OPTIONAL /
            # UNION / VALUES / subquery var, even one that ALSO
            # appears in a later pattern) is a rebinding error.
            at = getattr(b, "at", None)
            forward_ok = (
                at is not None
                and b.var in pat_scope
                and b.var not in _nonpattern_scope(q)
                and all(
                    i >= at
                    for i, p in enumerate(q.patterns)
                    if b.var in pattern_vars([p])
                )
            )
            if not forward_ok:
                raise SparqlSyntaxError(
                    f"BIND ?{b.var} would rebind a variable already in "
                    "scope (only graph patterns AFTER the BIND may "
                    "consume its variable)"
                )
        used = _bind_expr_vars(b.expr)
        if not used <= scope:
            missing = ", ".join(f"?{v}" for v in sorted(used - scope))
            raise SparqlSyntaxError(
                f"BIND expression uses out-of-scope variable(s) {missing}"
            )
        scope.add(b.var)  # later BINDs may chain on earlier ones


def _nonpattern_scope(q: Query) -> set[str]:
    """Vars a group binds through anything OTHER than its own required
    patterns: OPTIONAL blocks, UNION branches, VALUES, subqueries.
    A BIND var colliding with one of these cannot take the
    post-Extend-join path (those stages evaluate around the BIND in
    ways a pattern split can't reorder)."""
    out: set[str] = set()
    for blk in q.optional:
        out |= _block_vars(blk)
    for chain in q.union_blocks:
        for br in chain:
            out |= pattern_vars(br.patterns) | set(
                getattr(br, "out_names", ()) or ()
            )
            for blk in br.optional:
                out |= _block_vars(blk)
    for vb in q.values:
        out |= set(vb.vars)
    for sub in q.subqueries:
        out |= set(_subquery_out_names(sub))
    return out


def _post_bind_split(q: Query) -> tuple[Query, list, list]:
    """Split out the group patterns that CONSUME a BIND-introduced var
    — SPARQL's in-group evaluation order, ``Join(Extend(G, v, expr),
    P)``, the one shape post-hoc BIND evaluation can't express
    directly.  Returns ``(q', post_patterns, post_filters)``: ``q'``
    has those patterns (and the filters fully answerable by them)
    removed; the caller evaluates the post BGP separately and
    compatibility-joins it back AFTER ``_apply_binds`` (an
    error→unbound BIND value is compatible with every post solution,
    per §8.3).

    The join needs no dictionary lookup: term ids are
    content-addressed (``xxhash64(kind, lexical)``,
    functions/encoding.py:30), so a BIND-computed term carries exactly
    the id its dictionary entry would have and the join is plain
    struct equality.  Patterns var-connected to a consuming pattern
    move with it, keeping the pre-BGP free of induced cross joins;
    patterns that bind a BIND input var always stay pre (the Extend
    must see them)."""
    bind_vars = {
        b.var for b in q.binds if getattr(b, "at", None) is not None
    }
    if not bind_vars or not q.patterns:
        return q, [], []
    pv = [pattern_vars([p]) for p in q.patterns]
    post = {i for i, vs in enumerate(pv) if vs & bind_vars}
    if not post:
        return q, [], []
    expr_vars = set().union(
        *[_bind_expr_vars(b.expr) for b in q.binds]
    )
    changed = True
    while changed:
        changed = False
        post_vars = set().union(*[pv[i] for i in post])
        for j, vs in enumerate(pv):
            if j in post or not (vs & post_vars) or (vs & expr_vars):
                continue
            post.add(j)
            changed = True
    pre_vars = pattern_vars(
        [p for i, p in enumerate(q.patterns) if i not in post]
    )
    post_vars = set().union(*[pv[i] for i in post])
    only_post = post_vars - pre_vars - bind_vars
    for b in q.binds:
        circular = _bind_expr_vars(b.expr) & only_post
        if circular:
            missing = ", ".join(f"?{v}" for v in sorted(circular))
            raise SparqlSyntaxError(
                f"BIND ?{b.var} reads {missing}, which is bound only by "
                "a pattern that consumes a BIND variable (circular "
                "in-group dependency)"
            )
    post_pats = [q.patterns[i] for i in sorted(post)]
    # filters fully answerable inside the post BGP push into it (a
    # shared var is equalized by the join, so post-side filtering is
    # equivalent); filters touching a post-only var but spanning both
    # sides defer until after the join (caller routes them through the
    # deferred-filter stage)
    post_filts = [
        f for f in q.filters if f.vars() and f.vars() <= post_vars
    ]
    q = _dc_replace(
        q,
        patterns=[p for i, p in enumerate(q.patterns) if i not in post],
        filters=[f for f in q.filters if f not in post_filts],
    )
    return q, post_pats, post_filts


def _bind_expr_vars(expr: tuple) -> set[str]:
    tag = expr[0]
    if tag == "var":
        return {expr[1][1:]}
    if tag == "arith":
        return _bind_expr_vars(expr[2]) | _bind_expr_vars(expr[3])
    if tag in ("concat", "coalesce"):
        out: set[str] = set()
        for a in expr[1]:
            out |= _bind_expr_vars(a)
        return out
    if tag == "substr":
        out = _bind_expr_vars(expr[1]) | _bind_expr_vars(expr[2])
        if expr[3] is not None:
            out |= _bind_expr_vars(expr[3])
        return out
    if tag == "nfunc":
        return _bind_expr_vars(expr[2])
    if tag == "if":
        # FilterExpr.vars() yields bare names (no '?') already
        return (
            set(expr[1].vars())
            | _bind_expr_vars(expr[2])
            | _bind_expr_vars(expr[3])
        )
    if tag in ("str", "ucase", "lcase", "strlen",
               "replace", "strbefore", "strafter"):
        return _bind_expr_vars(expr[1])
    return set()


def _combo_result(store, q: Query, combo, dedup: bool) -> DataFrame:
    """Evaluate one branch combination of the query's UNION chains.

    Branch-local BINDs extend the branch's solutions after its patterns
    (the branch-tagging idiom); filters over BIND vars are deferred
    until the assignment exists."""
    pats = list(q.patterns)
    filts = list(q.filters)
    opts = list(q.optional)
    binds = []
    subs = []
    grps = []
    for b in combo:
        pats += b.patterns
        filts += b.filters
        opts += b.optional
        binds += getattr(b, "binds", [])
        if getattr(b, "subquery", None) is not None:
            subs.append(b)
        if getattr(b, "group", None) is not None:
            grps.append(b)
    bind_vars = {bd.var for bd in binds}
    sub_vars = {n for b in subs + grps for n in b.out_names}
    scope = pattern_vars(pats) | bind_vars | sub_vars
    for blk in opts:
        scope |= _block_vars(blk)
    out_of_scope = [f for f in filts if not f.vars() <= scope]
    deferred = [
        f
        for f in filts
        if f.vars() & (bind_vars | sub_vars) and f.vars() <= scope
    ]
    applicable = [
        f for f in filts if f not in out_of_scope and f not in deferred
    ]
    result = None
    if pats or opts:
        result = execute_bgp(
            store, pats, filters=applicable, optional=opts, dedup=dedup
        )
    elif not subs and not grps:
        # pattern-free branch (pure BIND tagging): the unit solution —
        # one row, no columns — which the BINDs below then extend
        result = store.spark.range(1).drop("id")
    # vars an OPTIONAL block in this combo can leave NULL on the
    # result side — a subquery/group join over one needs SPARQL
    # compatibility semantics, as does a step that can itself emit
    # unbound shared vars
    nullable = set()
    for blk in opts:
        nullable |= _block_vars(blk)
    for b in subs + grps:
        sub_q = b.subquery if getattr(b, "subquery", None) is not None else b.group
        sdf = (
            _execute_subquery(store, b.subquery)
            if getattr(b, "subquery", None) is not None
            else _group_bindings(store, b.group, dedup)
        )
        if result is None:
            result = sdf
            continue
        shared = [c for c in sdf.columns if c in result.columns]
        step_null = _nullable_vars(sub_q) & set(sdf.columns)
        if not shared:
            result = result.crossJoin(sdf)
        elif set(shared) & (step_null | nullable):
            result = _merge_join(result, sdf, shared, "inner")
        else:
            result = result.join(sdf, on=shared, how="inner")
        nullable |= step_null
    if binds:
        result = _apply_binds(result, store, binds)
    for f in deferred:
        result = _apply_deferred_filter(result, store, f)
    if out_of_scope:
        # SPARQL: a filter var unbound in this branch is a type error →
        # every solution of the branch is dropped; keep the schema
        return result.limit(0)
    return result


def _nullable_vars(q: Query) -> set:
    """Which of the group's vars can come back UNBOUND: OPTIONAL
    misses, VALUES UNDEF cells, union branches of differing scope,
    BIND's error→unbound rule, or a nested subquery projecting such a
    var. Joins keyed on one of these need SPARQL compatibility
    semantics (``_merge_join``) instead of plain column equality. Lets joins keep the hash fast
    path when the potentially-unbound vars are not among the join
    keys (e.g. an OPTIONAL block whose BIND var is new — only the
    always-bound pattern var is shared)."""
    out: set = set()
    for blk in q.optional:
        out |= _block_vars(blk)
    for vb in q.values:
        out |= set(vb.vars)
    for sb in q.services:
        out |= set(sb.vars_hint)
    out |= {b.var for b in q.binds}
    for chain in q.union_blocks:
        sets = []
        for br in chain:
            bv = pattern_vars(br.patterns) | set(
                getattr(br, "out_names", ()) or ()
            ) | {b.var for b in getattr(br, "binds", ()) or ()}
            for blk in br.optional:
                out |= _block_vars(blk)
            if getattr(br, "group", None) is not None:
                out |= _nullable_vars(br.group)
            sets.append(bv)
        if len(sets) > 1:
            # a var missing from some branch is NULL in its rows
            out |= set().union(*sets) - set.intersection(*sets)
    for s in q.subqueries:
        out |= _nullable_vars(s) & set(_subquery_out_names(s))
    return out


def _attach_bind_fns(store, blocks) -> None:
    """Give every OPTIONAL block carrying BINDs a closure that applies
    them (bgp.py cannot import this layer); recurses into nested blocks
    and the optional lists of UNION branches."""
    for blk in blocks:
        if (getattr(blk, "subquery", None) is not None
                and getattr(blk, "step_fn", None) is None):
            blk.step_fn = (
                lambda sq: lambda: _execute_subquery(store, sq)
            )(blk.subquery)
            blk.step_nullable = tuple(
                _nullable_vars(blk.subquery)
                & set(_subquery_out_names(blk.subquery))
            )
        if (getattr(blk, "group", None) is not None
                and getattr(blk, "step_fn", None) is None):
            blk.step_nullable = tuple(_nullable_vars(blk.group))
            # full-algebra OPTIONAL group (VALUES/MINUS/EXISTS/mixed
            # subqueries): the block's solutions come from the complete
            # GroupGraphPattern evaluator; bag semantics inside the
            # block (dedup=False) — LeftJoin preserves multiplicities
            blk.step_fn = (
                lambda g: lambda: _group_bindings(store, g, False)
            )(blk.group)
        if getattr(blk, "binds", None) and getattr(blk, "bind_fn", None) is None:
            blk.bind_fn = (
                lambda b: lambda df: _apply_binds(df, store, b.binds)
            )(blk)
        _attach_bind_fns(store, blk.optional)
        for chain in getattr(blk, "union", ()) or ():
            for br in chain:
                _attach_bind_fns(store, br.optional)


def _compat_join(
    result: DataFrame,
    step: DataFrame,
    shared: list,
    how: str,
    require_overlap: bool,
) -> DataFrame:
    """Null-tolerant SPARQL-compatibility semi/anti join.

    Two solutions are compatible when every commonly *bound* var agrees
    (SPARQL 1.1 §8.3) — a NULL (unbound) side never disqualifies. MINUS
    additionally requires ``require_overlap``: at least one shared var
    bound on BOTH sides (disjoint domains remove nothing). The block
    side is projected to the shared vars and deduplicated first, so the
    nested-loop inner side is bounded by the block's distinct
    shared-tuple count, not its full width × cardinality.
    """
    vars_ = [c for c in shared if not c.startswith("__")]
    if not vars_:  # only internal sidecars shared — equality is exact
        return result.join(step, on=shared, how=how)
    blk = step.select(*vars_).dropDuplicates()
    # quadrant decomposition (same idea as bgp._merge_join): between
    # two all-bound sides, compatibility IS equality (and MINUS's
    # domain-overlap requirement is trivially met), so the bulk takes
    # a hash semi/anti join; only null-key slices keep the non-equi
    # condition, bounding the nested-loop legs by the slices instead
    # of the full outer × distinct-block product.
    null_of = lambda cols: _reduce(  # noqa: E731
        lambda a, b: a | b, (F.col(v).isNull() for v in cols)
    )
    b_bound = blk.filter(~null_of(vars_))
    b_nulls = blk.filter(null_of(vars_))
    r_bound = result.filter(~null_of(vars_))
    r_nulls = result.filter(null_of(vars_))
    if how == "left_anti":
        out_b = r_bound.join(b_bound, on=vars_, how="left_anti")
        out_b = _nl_compat(out_b, b_nulls, vars_, how, require_overlap)
        out_n = _nl_compat(r_nulls, blk, vars_, how, require_overlap)
        return out_b.unionByName(out_n)
    # left_semi: legs must stay disjoint (a row matching both the
    # bound and the null-slice quadrant may only surface once)
    m1 = r_bound.join(b_bound, on=vars_, how="left_semi")
    rest = r_bound.join(b_bound, on=vars_, how="left_anti")
    m2 = _nl_compat(rest, b_nulls, vars_, how, require_overlap)
    m3 = _nl_compat(r_nulls, blk, vars_, how, require_overlap)
    return m1.unionByName(m2).unionByName(m3)


def _nl_compat(
    result: DataFrame, blk: DataFrame, vars_: list, how: str,
    require_overlap: bool,
) -> DataFrame:
    """One non-equi leg of ``_compat_join``: the §8.3 null-tolerant
    condition (optionally with MINUS's bound-overlap requirement) as a
    nested-loop semi/anti join — callers pass SLICES, never both full
    sides."""
    for v in vars_:
        blk = blk.withColumnRenamed(v, f"__mx_{v}")
    cond = F.lit(True)
    for v in vars_:
        b = F.col(f"__mx_{v}")
        cond = cond & (F.col(v).isNull() | b.isNull() | (F.col(v) == b))
    if require_overlap:
        ov = F.lit(False)
        for v in vars_:
            ov = ov | (F.col(v).isNotNull() & F.col(f"__mx_{v}").isNotNull())
        cond = cond & ov
    return result.join(blk, cond, how)


def _group_bindings(store, q: Query, dedup: bool) -> DataFrame:
    """Id-space solutions of one GroupGraphPattern: patterns, OPTIONAL
    blocks, UNION chains, subqueries, VALUES, BIND, MINUS and FILTER
    [NOT] EXISTS — the full group algebra before the solution
    modifiers (aggregation / DISTINCT / ORDER / LIMIT) and before
    materialization. ``execute`` runs it on the WHERE clause; a
    full-algebra OPTIONAL group (``OptionalBlock.group``) closes over
    it as the block's ``step_fn``, which is what lets VALUES / MINUS /
    EXISTS / mixed subqueries appear inside OPTIONAL."""
    _attach_bind_fns(store, q.optional)
    for chain in q.union_blocks:
        for br in chain:
            _attach_bind_fns(store, br.optional)

    # filters whose expression tree contains an EXISTS{…} leaf need
    # marker columns that exist only after every other stage — pull
    # them out before anything (incl. execute_bgp pushdown) sees them
    marker_filts = [f for f in q.filters if _exists_leaves(f)]
    if marker_filts:
        mset = {id(f) for f in marker_filts}
        q = _dc_replace(
            q, filters=[f for f in q.filters if id(f) not in mset]
        )

    # filters over vars produced AFTER the pattern joins (BIND targets,
    # subquery projections) are deferred until those vars exist
    deferred: list = []
    post_vars: set = set()
    for sub in q.subqueries:
        post_vars |= set(_subquery_out_names(sub))
    # VALUES / SERVICE vars bind only once their solution tables join
    # in — any filter over them defers to after that join (previously
    # such a filter raised "never bound by the pattern"; SERVICE's
    # vars_hint is a superset of head.vars, so no such filter reaches
    # execute_bgp)
    for vb in q.values:
        post_vars |= set(vb.vars)
    for sb in q.services:
        post_vars |= set(sb.vars_hint)
    has_branch_binds = any(
        getattr(br, "binds", None)
        for chain in q.union_blocks
        for br in chain
    )
    post_pats: list = []
    post_filts: list = []
    if q.binds or has_branch_binds:
        _bind_scope_check(q)
        # patterns consuming a BIND var evaluate after the Extend —
        # pull them (and their filters) out; they join back after
        # _apply_binds below
        q, post_pats, post_filts = _post_bind_split(q)
        post_vars |= {b.var for b in q.binds}
        if post_pats:
            post_vars |= pattern_vars(post_pats)
    if post_vars:
        # label-space deferred filters read the BIND var's vlex sidecar
        # (or an id2term join for id-space subquery vars) — see
        # _apply_deferred_filter
        deferred = [f for f in q.filters if f.vars() & post_vars]
        if deferred:
            q = _dc_replace(
                q, filters=[f for f in q.filters if f not in deferred]
            )

    if q.union_blocks:
        combos = list(itertools.product(*q.union_blocks))
        results = [_combo_result(store, q, combo, dedup) for combo in combos]
        result = _reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), results
        )
    elif not q.patterns and not q.optional and q.subqueries:
        # outer group is ONLY subqueries: seed from the first, join the
        # rest; any non-deferred filter has nothing to bind against
        if q.filters or q.lang_filters:
            raise SparqlSyntaxError(
                "FILTER over variables not bound by any pattern"
            )
        result = None
    elif not q.patterns and not q.optional and (
        q.values or q.services or q.binds or q.minus or q.exists
        or marker_filts
    ):
        # pattern-free group (e.g. `SELECT ?x WHERE { VALUES ?x {…} }`
        # or a group whose only content is MINUS / FILTER EXISTS —
        # both valid SPARQL): seed the unit solution — one row, no
        # columns — which the VALUES join / BINDs below extend and the
        # MINUS/EXISTS stages prune (ADVICE r2; round 4 for the
        # MINUS/EXISTS-only shape, reachable through full-algebra
        # groups). Any plain filter here references vars the
        # VALUES/BIND stages bind, so defer them all.
        if q.filters:
            # identity dedup — filter objects are unhashable dataclasses
            have = {id(f) for f in deferred}
            deferred = list(deferred) + [
                f for f in q.filters if id(f) not in have
            ]
        result = store.spark.range(1).drop("id")
    else:
        result = execute_bgp(
            store, q.patterns, filters=list(q.filters),
            optional=list(q.optional), dedup=dedup,
        )

    # subqueries: bottom-up id-space evaluation, joined on shared vars
    # (none shared = cartesian, per SPARQL join semantics; a side that
    # can leave shared vars unbound — OPTIONAL/UNION on the group
    # side, OPTIONAL/UNION/VALUES/BIND inside the subquery — takes
    # the compatibility merge join)
    group_nullable = _nullable_vars(q)
    for sub in q.subqueries:
        sdf = _execute_subquery(store, sub)
        if result is None:
            result = sdf
            continue
        shared = [c for c in sdf.columns if c in result.columns]
        step_null = _nullable_vars(sub) & set(sdf.columns)
        if not shared:
            result = result.crossJoin(sdf)
        elif set(shared) & (step_null | group_nullable):
            result = _merge_join(result, sdf, shared, "inner")
        else:
            result = result.join(sdf, on=shared, how="inner")

    # VALUES: inline solution table joined on its shared vars (new vars
    # extend the bindings; no shared vars = cartesian, per spec). The
    # join is SPARQL compatibility, not equality: a shared var matches
    # when EITHER side is unbound (UNDEF cell / OPTIONAL null) or both
    # agree, and the merged solution takes the bound side. The VALUES
    # table is a handful of inline rows, so the non-equi condition
    # costs one broadcast nested-loop pass — no scale concern.
    # SERVICE blocks join identically: the remote solution sequence IS
    # a values table (capped by the endpoint, fetched once on the
    # driver); SILENT failures collapse to the unit solution (None).
    service_tables = [
        vb
        for vb in (_service_values_block(sb, q.values) for sb in q.services)
        if vb is not None
    ]
    for vb in itertools.chain(q.values, service_tables):
        vdf = _values_df(store, vb)
        shared = [v for v in vb.vars if v in result.columns]
        if not shared:
            result = result.crossJoin(F.broadcast(vdf))
            continue
        for v in shared:
            vdf = vdf.withColumnRenamed(v, f"__{v}_vv").withColumnRenamed(
                f"__{v}_vlex", f"__{v}_vvlex"
            )
        cond = F.lit(True)
        for v in shared:
            vv = F.col(f"__{v}_vv")
            cond = cond & (vv.isNull() | F.col(v).isNull() | (F.col(v) == vv))
        result = result.join(F.broadcast(vdf), cond, "inner")
        for v in shared:
            result = result.withColumn(
                v, F.coalesce(F.col(v), F.col(f"__{v}_vv"))
            ).drop(f"__{v}_vv")
            # merge the lexical sidecars: after the compatibility
            # filter, bound sides agree, so a plain coalesce always
            # carries the winner's lexical form
            if f"__{v}_vlex" in result.columns:
                result = result.withColumn(
                    f"__{v}_vlex",
                    F.coalesce(F.col(f"__{v}_vlex"), F.col(f"__{v}_vvlex")),
                ).drop(f"__{v}_vvlex")
            else:
                result = result.withColumnRenamed(f"__{v}_vvlex", f"__{v}_vlex")

    # BIND: extend each solution (post-hoc evaluation is exact —
    # _bind_scope_check / _post_bind_split guarantee every pattern
    # still in q.patterns predates the BINDs); patterns that CONSUME a
    # BIND var join back here, compatibility semantics because an
    # error→unbound BIND value matches every post solution (§8.3);
    # deferred filters apply once BIND / subquery / post-pattern vars
    # exist
    # EXISTS leaves inside BIND values / IF conditions need their
    # marker columns BEFORE the binds evaluate
    bind_exm = [l for b in q.binds for l in _bind_exists_leaves(b.expr)]
    if bind_exm:
        # markers attach BEFORE the bind stage, so a block correlated
        # through a var that this group's own BINDs produce would see
        # it unbound — reject rather than mis-evaluate
        targets = {b.var for b in q.binds}
        for ex in bind_exm:
            blk = ex.block
            scope = (
                set(blk.out_names or ())
                if getattr(blk, "group", None) is not None
                else set(pattern_vars(blk.patterns))
            )
            if scope & targets:
                raise SparqlSyntaxError(
                    "EXISTS inside BIND may not reference variables "
                    f"bound in the same group: {sorted(scope & targets)}"
                )
    for ex in bind_exm:
        result = _attach_exists_marker(
            store, result, ex,
            bool(q.optional or q.union_blocks or q.values
                 or q.services or q.subqueries),
        )
    if q.binds:
        result = _apply_binds(result, store, q.binds)
    if bind_exm:
        result = result.drop(*[ex.marker for ex in bind_exm])
    if post_pats:
        pdf = execute_bgp(store, post_pats, filters=post_filts, dedup=dedup)
        shared = [c for c in pdf.columns if c in result.columns]
        # compatibility because an error→unbound BIND value matches
        # every post solution; _merge_join's quadrant decomposition
        # keeps the all-bound bulk on the hash path
        result = _merge_join(result, pdf, shared, "inner")
    for f in deferred:
        result = _apply_deferred_filter(result, store, f)

    # MINUS / EXISTS compatibility is defined over commonly BOUND vars
    # (SPARQL 1.1 §8.3): an unbound (NULL) shared var never disqualifies
    # a match. Plain column-equality joins get that wrong as soon as the
    # outer group can produce unbound vars — NULL == x is NULL, so a
    # solution the spec says to remove survives (ADVICE r2). The
    # null-tolerant condition costs a nested-loop join, so it is used
    # only when unbound shared vars are actually possible; the common
    # all-bound case keeps the hash anti/semi join.
    may_unbound = bool(
        q.optional or q.union_blocks or q.values or q.services
        or q.subqueries or q.binds
    )

    # MINUS: remove solutions compatible with the block on shared vars
    # (disjoint domains remove nothing, per spec); removal additionally
    # requires a non-empty bound overlap — dom(μ)∩dom(μ′) ≠ ∅.
    for blk in q.minus:
        if getattr(blk, "group", None) is not None:
            # full-algebra MINUS block (UNION chain, VALUES, nested
            # MINUS/EXISTS, subqueries): the complete group evaluator;
            # a filter over vars bound only outside the block raises
            # inside it (correlated full-algebra MINUS is out of scope)
            step, foreign = _group_bindings(store, blk.group, True), []
        else:
            local, foreign = _split_block_filters(blk)
            _attach_bind_fns(store, blk.optional)
            step = execute_bgp(
                store, blk.patterns, filters=local,
                optional=blk.optional, dedup=True,
            )
        # spec: MINUS evaluates its pattern WITHOUT substitution, so a
        # filter var bound only outside the block is simply UNBOUND
        # inside it. Materializing those vars as NULL struct columns
        # makes SQL three-valued logic reproduce the spec exactly:
        # comparisons → NULL → row dropped (type error → false), while
        # !bound(?outer) is genuinely true.
        if foreign:
            nulled: list[str] = []
            for f in foreign:
                for v in sorted(f.vars() - set(step.columns)):
                    step = step.withColumn(
                        v, F.lit(None).cast(
                            "struct<kind:tinyint,id:bigint,num:double>"
                        )
                    )
                    nulled.append(v)
                step = _apply_filter(store, step, f)
            step = step.drop(*nulled)
        shared = [c for c in step.columns if c in result.columns]
        if shared:
            if may_unbound or blk.optional:
                result = _compat_join(
                    result, step, shared, "left_anti", require_overlap=True
                )
            else:
                result = result.join(step, on=shared, how="left_anti")

    # FILTER [NOT] EXISTS: correlated existence via semi/anti join;
    # uncorrelated blocks collapse to a global emptiness test. EXISTS
    # uses SUBSTITUTION semantics (unlike MINUS): a block filter may
    # reference outer vars, and it then becomes part of the join
    # condition — shared-var equality plus the filter predicates, with
    # the block's copies of shared vars renamed out of the way so each
    # unqualified column name resolves to exactly one side.
    for positive, blk in q.exists:
        if getattr(blk, "group", None) is not None:
            # full-algebra EXISTS block: complete group evaluator;
            # correlation happens only through shared-var compatibility
            # (a filter over outer-only vars raises inside)
            step, correlated = _group_bindings(store, blk.group, True), []
        else:
            local, correlated = _split_block_filters(blk)
            _attach_bind_fns(store, blk.optional)
            step = execute_bgp(
                store, blk.patterns, filters=local,
                optional=blk.optional, dedup=True,
            )
        shared = [c for c in step.columns if c in result.columns]
        how = "left_semi" if positive else "left_anti"
        if correlated:
            for f in correlated:
                missing = f.vars() - set(step.columns) - set(result.columns)
                if missing:
                    raise SparqlSyntaxError(
                        "EXISTS filter references variables bound "
                        f"nowhere: {sorted(missing)}"
                    )
            # label-space correlated filters (regex/str()/langMatches/
            # isIRI…): attach each referenced var's lexical label to
            # the side that carries it through the join — the OUTER
            # side for outer and shared vars (EXISTS substitutes the
            # outer binding, SPARQL 1.1 §8.1.1), the block side for
            # block-only vars. _attach_any_labels prefers a
            # BIND/VALUES vlex sidecar (dictionary-absent term) over
            # the id2term join — one join per var either way.
            lbl_outer: list[str] = []
            lvs = sorted(
                set().union(set(), *(f.label_vars() for f in correlated))
            )
            for v in lvs:
                if v in result.columns:
                    result, att = _attach_any_labels(result, store, [v])
                    lbl_outer.extend(att)
                else:
                    step, _ = _attach_any_labels(step, store, [v])
            for v in shared:
                step = step.withColumnRenamed(v, f"__ex_{v}")
            cond = F.lit(True)
            for v in shared:
                eqv = F.col(v) == F.col(f"__ex_{v}")
                if may_unbound or blk.optional:
                    eqv = (
                        F.col(v).isNull()
                        | F.col(f"__ex_{v}").isNull()
                        | eqv
                    )
                cond = cond & eqv
            for f in correlated:
                cond = cond & f.cond()
            # non-equi conjuncts force a nested-loop strategy; the
            # equality conjuncts still hash-partition both sides when
            # shared vars exist, and the block side is dedup'd — the
            # same shape Catalyst gives a correlated SQL EXISTS
            result = result.join(step, cond, how)
            if lbl_outer:
                result = result.drop(*lbl_outer)
        elif shared:
            if may_unbound or blk.optional:
                result = _compat_join(
                    result, step, shared, how, require_overlap=False
                )
            else:
                result = result.join(step, on=shared, how=how)
        else:
            if positive != (not step.isEmpty()):
                result = result.limit(0)

    # EXISTS{…} leaves inside boolean FILTER trees: attach each leaf's
    # marker column, then evaluate the whole expression like any other
    # deferred filter (filters commute over the group algebra, so
    # last-position evaluation is exact)
    for f in marker_filts:
        leaves = _exists_leaves(f)
        for ex in leaves:
            result = _attach_exists_marker(store, result, ex, may_unbound)
        result = _apply_deferred_filter(result, store, f)
        result = result.drop(*[ex.marker for ex in leaves])

    return result


def _attach_exists_marker(
    store, result: DataFrame, ex: ExistsExpr, may_unbound: bool
) -> DataFrame:
    """Extend ``result`` with ``ex.marker``: true where a solution of
    the EXISTS block is compatible with the row, else NULL.

    Shape: semi-join the DISTINCT outer key set (shared vars plus any
    outer vars the block's correlated filters read — typically tiny
    relative to the solution multiset) against the block, then join
    the surviving keys back null-safely. The back-join is key-unique
    by construction, so the marker never multiplies rows — the same
    guarantee the top-level FILTER EXISTS semi-join gives."""
    blk = ex.block
    if getattr(blk, "group", None) is not None:
        step, correlated = _group_bindings(store, blk.group, True), []
    else:
        local, correlated = _split_block_filters(blk)
        _attach_bind_fns(store, blk.optional)
        step = execute_bgp(
            store, blk.patterns, filters=local,
            optional=blk.optional, dedup=True,
        )
    shared = [c for c in step.columns if c in result.columns]
    outer_corr = sorted(
        set().union(set(), *(f.vars() for f in correlated))
        & set(result.columns)
    )
    for f in correlated:
        missing = f.vars() - set(step.columns) - set(result.columns)
        if missing:
            raise SparqlSyntaxError(
                "EXISTS filter references variables bound nowhere: "
                f"{sorted(missing)}"
            )
    need = sorted(set(shared) | set(outer_corr))
    if not need:  # uncorrelated: global emptiness test
        return result.withColumn(ex.marker, F.lit(not step.isEmpty()))
    keys = result.select(*need).dropDuplicates(need)
    # label columns for correlated label-space filters: outer vars
    # attach to the key side (EXISTS substitutes the outer binding,
    # §8.1.1), block-only vars to the block side
    key_lbls: list[str] = []
    lvs = sorted(set().union(set(), *(f.label_vars() for f in correlated)))
    for v in lvs:
        if v in keys.columns:
            keys, att = _attach_any_labels(keys, store, [v])
            key_lbls += att
        else:
            step, _ = _attach_any_labels(step, store, [v])
    for v in shared:
        step = step.withColumnRenamed(v, f"__ex_{v}")
    cond = F.lit(True)
    # null-tolerant key equality whenever EITHER side can produce
    # unbound shared vars: the outer group (may_unbound), an OPTIONAL
    # inside the block, or a full-algebra block group (UNION/OPTIONAL/
    # VALUES UNDEF inside EXISTS { { A } UNION { B } } can null-extend
    # block-side vars, which §8.3 compatibility matches to anything)
    tol = (
        may_unbound
        or getattr(blk, "optional", None)
        or getattr(blk, "group", None) is not None
    )
    for v in shared:
        eqv = F.col(v) == F.col(f"__ex_{v}")
        if tol:
            eqv = F.col(v).isNull() | F.col(f"__ex_{v}").isNull() | eqv
        cond = cond & eqv
    for f in correlated:
        cond = cond & f.cond()
    matched = keys.join(step, cond, "left_semi").drop(*key_lbls)
    matched = matched.withColumn(ex.marker, F.lit(True))
    for v in need:
        matched = matched.withColumnRenamed(v, f"__exk_{v}")
    back = _reduce(
        lambda a, b: a & b,
        (F.col(v).eqNullSafe(F.col(f"__exk_{v}")) for v in need),
    )
    return result.join(matched, back, "left").drop(
        *[f"__exk_{v}" for v in need]
    )


def _apply_post_values(out: DataFrame, vb: ValuesBlock) -> DataFrame:
    """Join a trailing VALUES table onto the PROJECTED solution frame
    (§18.2.4: the ValuesClause joins after grouping) — the path for
    vars the in-group compatibility join can't reach: aggregate
    aliases, BIND outputs, non-group-key vars.

    The frame here is rendered (lexical strings / scalar aggregate
    columns), so each VALUES cell carries a value-space channel: a
    numeric cell compares under double cast (COUNT bigint, AVG double
    and rendered numeric lexicals all coerce), everything else under
    string equality on the rendered form. UNDEF and solution-side
    NULLs match anything (§8.3 compatibility). New vars extend every
    compatible solution with the cell's rendered lexical."""
    spark = out.sparkSession
    rows = []
    for r in vb.rows:
        flat: list = []
        for cell in r:
            if cell is UNDEF:
                flat += [None, None]
            elif isinstance(cell, bool):
                flat += [float(cell), None]
            elif isinstance(cell, (int, float)):
                flat += [float(cell), None]
            elif isinstance(cell, tuple):
                flat += [None, str(cell[0])]
            else:
                flat += [None, str(cell)]
        rows.append(flat)
    schema = ", ".join(
        f"__pv_{v}_num double, __pv_{v}_str string" for v in vb.vars
    )
    vdf = spark.createDataFrame(rows, schema)
    shared = [v for v in vb.vars if v in out.columns]
    new = [v for v in vb.vars if v not in out.columns]
    cond = F.lit(True)
    for v in shared:
        num, s = F.col(f"__pv_{v}_num"), F.col(f"__pv_{v}_str")
        c = F.col(v)
        cmp_ = (
            F.when(num.isNotNull(), c.cast("double").eqNullSafe(num)
                   & c.cast("double").isNotNull())
            .when(s.isNotNull(), c.cast("string") == s)
            .otherwise(F.lit(True))  # UNDEF cell matches anything
        )
        cond = cond & (c.isNull() | cmp_)
    out = out.join(F.broadcast(vdf), cond, "inner")
    for v in new:
        out = out.withColumn(
            v,
            F.coalesce(
                F.col(f"__pv_{v}_num").cast("string"),
                F.col(f"__pv_{v}_str"),
            ),
        )
    return out.drop(
        *[f"__pv_{v}_{s}" for v in vb.vars for s in ("num", "str")]
    )


def execute(
    store, query: str | Query, with_kinds: bool = False
) -> DataFrame:
    """SPARQL text → materialized DataFrame (one string column per var).

    ``with_kinds`` (service layer): emit a hidden ``__k_{var}`` tinyint
    column per projected SELECT variable carrying the binding's term
    kind, so results-JSON typing is exact rather than string-sniffed.
    """
    q = parse(query) if isinstance(query, str) else query

    if q.form == "describe" and not q.patterns and not q.union_blocks:
        return _describe(store, q, None, with_kinds=with_kinds)

    # set-semantics evaluation is sound exactly when only the solution
    # SET can be observed: SELECT DISTINCT / ASK without aggregates
    # (aggregates count multiplicities — must keep bags)
    dedup = (q.distinct or q.form == "ask") and not q.aggregates
    result = _group_bindings(store, q, dedup)

    if q.lang_filters:  # legacy Query-object API
        result = _apply_lang_filters(result, store, q.lang_filters)

    if q.form == "ask":
        n = result.limit(1).count()
        return store.spark.createDataFrame([(n > 0,)], "ask boolean")
    if q.form == "describe":
        return _describe(store, q, result, with_kinds=with_kinds)
    if q.form == "construct":
        return _construct(store, q, result, with_kinds=with_kinds)

    def _projectable(cols):
        # blank-node vars (__bn_*) and internal sidecar columns
        # (__*_vlex) are never projectable
        return [c for c in cols if not c.startswith("__")]

    if q.aggregates or q.group_by:
        # group_by without aggregates is still a Group+Project per
        # §18.2.4: one row per key (e.g. GROUP BY expression keys
        # used purely to collapse solutions)
        if q.agg_prebinds:
            # aggregate expression arguments (SUM(?a * ?b)): one
            # per-solution Extend just before grouping, §18.4
            result = _apply_binds(result, store, q.agg_prebinds)
        gvars = [v[1:] for v in q.group_by]
        label_vars = sorted({
            a.var[1:] for a in q.aggregates
            if a.func in ("GROUP_CONCAT", "SAMPLE") and a.var
        })
        if label_vars:
            result = _attach_labels(result, store, label_vars)
        aggs = [_agg_expr(a) for a in q.aggregates]
        # dictionary-absent group keys (BIND/VALUES-produced terms)
        # render from their vlex sidecar — carry it through the groupBy
        # (the struct id is the hash OF the lexical, so first() is
        # exact per group; same pattern as the subquery path)
        aggs += [
            F.first(F.col(f"__{gv}_vlex")).alias(f"__{gv}_vlex")
            for gv in gvars
            if f"__{gv}_vlex" in result.columns
        ]
        if not aggs:
            # aggregate-free GROUP BY: groupBy().agg() needs at least
            # one expression — a throwaway cardinality the keep= list
            # below never carries into the output
            aggs = [F.count(F.lit(1)).alias("__gb_card")]
        grouped = (
            result.groupBy(*gvars).agg(*aggs) if gvars else result.agg(*aggs)
        )
        if q.having:
            grouped = grouped.filter(_having_col(q.having))
        pa_scalars: list = []
        pa_terms: list = []
        if q.postagg_binds:
            grouped, pa_scalars, pa_terms = _apply_postagg(
                grouped, q.postagg_binds,
                [a.alias[1:] for a in q.aggregates], gvars,
            )
        grouped, ordered_vars = _add_order_sidecars(grouped, q.order_by)
        # materialize group vars; aggregate columns pass through verbatim
        out = materialize(
            grouped, store,
            # hidden __gk* expression keys group but never render
            [f"?{g}" for g in gvars if not g.startswith("__")]
            + [f"?{t}" for t in pa_terms],
            keep=[a.alias[1:] for a in q.aggregates] + pa_scalars
            + sorted(
                f"__ord_{n}_{s}" for n in ordered_vars for s in ("k", "n")
            ),
            with_kinds=with_kinds,
        )
        projected = [
            v[1:] for v in (
                q.variables or [f"?{c}" for c in _projectable(out.columns)]
            )
        ]
        pv_vars = {v for vb in q.post_values for v in vb.vars}
        out = out.select(
            # a post-VALUES-only var isn't a column yet — the
            # post-projection join below introduces it
            *[v for v in projected if v not in pv_vars or v in out.columns],
            *[c for c in out.columns if c.startswith("__ord_")],
            *[
                c for c in out.columns
                if c.startswith("__k_") and c[4:] in projected
            ],
        )
    else:
        pv_vars = {v for vb in q.post_values for v in vb.vars}
        variables = q.variables or [
            f"?{c}" for c in _projectable(result.columns)
        ]
        variables = [
            v for v in variables
            if v[1:] not in pv_vars or v[1:] in result.columns
        ]
        # hidden ORDER BY expression binds materialize alongside the
        # projection (their __ord_e* columns are dropped post-sort)
        variables = variables + [f"?{n}" for n in q.order_hidden]
        if q.distinct:
            # dedupe in ID SPACE before materialization: DISTINCT applies
            # to the projected solution, and shrinking the binding set
            # first makes the per-var id2term joins proportional to the
            # distinct count, not the raw join fan-out. The post-
            # materialize dropDuplicates below still runs — two ids of
            # different kinds can render to the same lexical string.
            names = [v[1:] if v.startswith("?") else v for v in variables]
            keep_cols = names + [
                c for c in result.columns
                if c.startswith("__") and c.endswith("_vlex")
                and c[2:-5] in names
            ]
            result = result.select(*keep_cols).dropDuplicates()
        result, ordered_vars = _add_order_sidecars(result, q.order_by)
        out = materialize(
            result, store, variables,
            keep=sorted(
                f"__ord_{n}_{s}" for n in ordered_vars for s in ("k", "n")
            ),
            with_kinds=with_kinds,
        )
    for vb in q.post_values:
        out = _apply_post_values(out, vb)
    if q.post_values and q.variables:
        # projection order restored; VALUES vars the SELECT doesn't
        # project are dropped (only internal sidecars pass through)
        want = [v[1:] for v in q.variables]
        out = out.select(
            *[c for c in want if c in out.columns],
            *[c for c in out.columns if c not in want and c.startswith("__")],
        )
    if q.distinct:
        # __k_ sidecars are excluded from the DISTINCT key: two ids of
        # different kinds rendering to one lexical string stay one
        # solution (an arbitrary kind survives — JSON typing only)
        out = out.dropDuplicates(
            [c for c in out.columns
             if not c.startswith("__ord_") and not c.startswith("__k_")]
        )
    if q.order_by:
        # type-aware keys where the sidecars exist (pattern vars);
        # aggregate aliases are raw numeric scalars and sort natively
        keys = []
        for v, asc in q.order_by:
            name = v[1:]
            if f"__ord_{name}_k" in out.columns:
                num = F.col(f"__ord_{name}_n")
                # §15.1 rank: unbound(-1) < blank nodes(-0.5) <
                # IRIs(0) < literals(1). Blank nodes are recognized by
                # the rendered `_:` prefix (an IRI can never render
                # so), refining the id-space kind rank at sort time.
                k = F.col(f"__ord_{name}_k").cast("double")
                k = F.when(
                    (k == 0) & F.col(name).startswith("_:"), F.lit(-0.5)
                ).otherwise(k)
                keys += [
                    k.asc() if asc else k.desc(),
                    # numerics by value; string literals (NULL num)
                    # after them ascending, before them descending
                    num.asc_nulls_last() if asc else num.desc_nulls_first(),
                    F.col(name).asc() if asc else F.col(name).desc(),
                ]
            else:
                keys.append(F.col(name).asc() if asc else F.col(name).desc())
        out = out.orderBy(*keys)
    out = out.drop(*[c for c in out.columns if c.startswith("__ord_")])
    if q.offset:
        out = out.offset(q.offset)
    if q.limit is not None:
        out = out.limit(q.limit)
    return out
