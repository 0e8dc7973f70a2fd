"""Stage 7b — BGP (basic graph pattern) evaluation: set-oriented joins.

The reference evaluates a BGP as an index-nested-loop chain: one HBase
prefix scan **per upstream binding** per pattern
(reference: nl/vu/jena/sparql/engine/iterator/QueryIterTriplePattern.java:21-143,
QueryIterBlockTriples.java:42-115). That per-binding re-scan is the
single biggest scalability cliff in the reference design; this module
replaces it with hash/sort-merge DataFrame joins — the whole point of
the Spark rebuild (SURVEY.md §7.5).

What carries over semantically:

- **Greedy selectivity reordering** — deterministic parity with the
  reference's static weight table + bound-var promotion
  (reference: nl/vu/jena/sparql/engine/optimizer/reorder/ReorderHeuristics.java:41-74
  weights, :105-159 greedy loop + VAR→TERM promotion). Catalyst/AQE
  would reorder too, but the explicit pre-planner keeps plans stable
  run-to-run (resume + P/R determinism).
- **Id-space execution** (reference: graph/ValueIdMapper.java:20-111):
  constants are hash-encoded into the scan predicates; joins run on
  64-bit ids; a constant with no dictionary entry simply yields an
  empty scan (the reference's dummy-NULL-pattern trick, QueryIterBlockTriples.java:84-96,
  falls out for free).
- **Late materialization** (reference: binding/BindingMaterializer.java:25-116):
  ids become lexical terms only after all joins, via one id2term join
  per projected variable.

Variable bindings are uniform ``struct(kind, id, num)`` columns so
entity and numeric-literal bindings join and compare with one code path
(the TypedId duality of the reference, id/TypedId.java:21-46).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from hbase_rdf_spark.functions.encoding import KIND_ENTITY
from hbase_rdf_spark.plans.patterns import TriplePattern, scan

Elem = str | tuple[str, int] | int | float  # "?var" | term | (lex, kind) | number


def is_var(e: Elem) -> bool:
    return isinstance(e, str) and e.startswith("?")


@dataclass(frozen=True)
class Bgp:
    """One pattern of a BGP: each element a '?var' or a constant.

    ``g`` is the named-graph/context slot (GRAPH clause): None = any
    graph, '?var' = bind it, constant = filter on it — the quad-pattern
    C position of the reference's SPOC masks.
    """

    s: Elem
    p: Elem
    o: Elem
    g: Elem | None = None
    filtered: bool = False  # an attached FILTER bonus, per ReorderHeuristics
    path_mod: str | None = None  # property-path modifier: '+' | '*' | '?'


@dataclass
class Filter:
    """Numeric filter on an object variable: (var, op, value)."""

    var: str
    op: str  # '<', '<=', '>', '>=', '=', '!='
    value: float

    def apply(self, col: Column) -> Column:
        n = col.getField("num")
        return {
            "<": n < self.value,
            "<=": n <= self.value,
            ">": n > self.value,
            ">=": n >= self.value,
            "=": n == self.value,
            "!=": n != self.value,
        }[self.op]


@dataclass
class VarFilter(Filter):
    """Var-vs-var numeric comparison with an optional constant offset:
    ``?a < ?b + 120`` (BSBM Q5 shape) → ``a.num < b.num + offset``.

    ``value`` (inherited) is unused; ``other`` names the RHS variable.
    """

    other: str = ""
    offset: float = 0.0

    def cond(self) -> Column:
        lhs = F.col(self.var[1:]).getField("num")
        rhs = F.col(self.other[1:]).getField("num") + self.offset
        return {
            "<": lhs < rhs,
            "<=": lhs <= rhs,
            ">": lhs > rhs,
            ">=": lhs >= rhs,
            "=": lhs == rhs,
            "!=": lhs != rhs,
        }[self.op]


def _filter_vars(f: Filter) -> list[str]:
    vs = [f.var[1:]]
    if isinstance(f, VarFilter):
        vs.append(f.other[1:])
    return vs


# Static weight table — parity with ReorderHeuristics.java:41-74.
_WEIGHTS = {
    "spo": 1.0, "sp?": 2.0, "s?o": 3.0, "?po": 4.0,
    "s??": 5.0, "??o": 6.0, "?p?": 7.0, "???": 8.0,
}
_FILTER_BONUS = 0.5  # filtered pattern ranks above its unfiltered twin


def _mask(p: Bgp, bound: set[str]) -> str:
    def b(e: Elem, ch: str) -> str:
        if not is_var(e):
            return ch
        return ch if e in bound else "?"  # bound-var promotion VAR→TERM

    return b(p.s, "s") + b(p.p, "p") + b(p.o, "o")


def reorder(patterns: list[Bgp]) -> list[Bgp]:
    """Greedy lowest-weight-first ordering with bound-var promotion."""
    remaining = list(patterns)
    bound: set[str] = set()
    ordered: list[Bgp] = []
    while remaining:
        best_i, best_w = 0, float("inf")
        for i, p in enumerate(remaining):
            w = _WEIGHTS[_mask(p, bound)] - (_FILTER_BONUS if p.filtered else 0.0)
            if w < best_w:
                best_i, best_w = i, w
        chosen = remaining.pop(best_i)
        ordered.append(chosen)
        for e in (chosen.s, chosen.p, chosen.o):
            if is_var(e):
                bound.add(e)
    return ordered


def _binding_struct(kind: Column, ident: Column, num: Column) -> Column:
    return F.struct(
        kind.cast("tinyint").alias("kind"),
        ident.cast("bigint").alias("id"),
        num.cast("double").alias("num"),
    )


PATH_MAX_ITERS = 30


def _path_closure(store, pred: Elem) -> DataFrame:
    """Transitive closure of one predicate: (a, b, b_kind, b_num) pairs
    reachable in ≥ 1 hops — the evaluation behind ``<p>+`` paths.

    Frontier expansion with distinct + anti-join (only NEW pairs join
    next round), ``localCheckpoint`` per round to cut lineage — the same
    iterative-DataFrame discipline as connected components
    (operators/cc.py). Cycles terminate naturally: a revisited pair is
    filtered by the anti-join. Literal endpoints are terminal by
    construction (their kind-tagged hash ids never appear in the
    subject position).
    """
    e = scan(store, TriplePattern(p=None if is_var(pred) else pred))
    base = (
        e.select(
            F.col("s").alias("a"),
            F.col("o").alias("b"),
            F.col("o_kind").alias("b_kind"),
            F.col("o_num").alias("b_num"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    closure, frontier = base, base
    for _ in range(PATH_MAX_ITERS):
        nxt = (
            frontier.alias("f")
            .join(base.alias("e"), F.col("f.b") == F.col("e.a"))
            .select(
                F.col("f.a").alias("a"),
                F.col("e.b").alias("b"),
                F.col("e.b_kind").alias("b_kind"),
                F.col("e.b_num").alias("b_num"),
            )
            .distinct()
        )
        new = nxt.join(closure, ["a", "b"], "left_anti").localCheckpoint(eager=True)
        if new.isEmpty():
            break
        closure = closure.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    else:
        raise RuntimeError(f"path closure did not converge in {PATH_MAX_ITERS} rounds")
    return closure


def _graph_nodes(store) -> DataFrame:
    """All terms occurring in the graph as (a, b=a, b_kind, b_num) —
    the zero-length path pairs for * and ? modifiers."""
    spo = store.index("spo")
    subs = spo.select(
        F.col("s").alias("b"),
        F.lit(0).cast("tinyint").alias("b_kind"),
        F.lit(None).cast("double").alias("b_num"),
    )
    objs = spo.select(
        F.col("o").alias("b"),
        F.col("o_kind").alias("b_kind"),
        F.col("o_num").alias("b_num"),
    )
    return (
        subs.unionByName(objs)
        .dropDuplicates(["b"])
        .select(F.col("b").alias("a"), "b", "b_kind", "b_num")
    )


def _path_step(store, p: Bgp) -> DataFrame:
    """Binding step for s <pred>{+,*,?} o patterns.

    '+' = transitive closure; '*' adds the zero-length identity pairs
    over every graph term; '?' = identity pairs + single hop.
    """
    from hbase_rdf_spark.plans.patterns import encode_term

    if p.path_mod == "+":
        df = _path_closure(store, p.p)
    elif p.path_mod == "*":
        df = _path_closure(store, p.p).unionByName(_graph_nodes(store)).distinct()
    elif p.path_mod == "?":
        one = scan(store, TriplePattern(p=None if is_var(p.p) else p.p)).select(
            F.col("s").alias("a"), F.col("o").alias("b"),
            F.col("o_kind").alias("b_kind"), F.col("o_num").alias("b_num"),
        )
        df = one.unionByName(_graph_nodes(store)).distinct()
    else:
        raise ValueError(f"unknown path modifier {p.path_mod!r}")
    if not is_var(p.s):
        df = df.filter(F.col("a") == encode_term(p.s))
    if not is_var(p.o):
        if isinstance(p.o, (int, float)) and not isinstance(p.o, bool):
            df = df.filter(
                (F.col("b_kind") == 2) & (F.col("b_num") == float(p.o))
            )
        else:
            lex, kind = p.o if isinstance(p.o, tuple) else (p.o, KIND_ENTITY)
            df = df.filter(
                (F.col("b_kind") == kind) & (F.col("b") == encode_term(lex, kind))
            )
    cols = []
    if is_var(p.s):
        cols.append(_binding_struct(F.lit(0), F.col("a"), F.lit(None)).alias(p.s[1:]))
    if is_var(p.o):
        cols.append(
            _binding_struct(
                F.col("b_kind"), F.col("b"), F.col("b_num")
            ).alias(p.o[1:])
        )
    if not cols:
        cols.append(F.lit(1).alias("__exists"))
    out = df.select(*cols)
    if is_var(p.s) and is_var(p.o) and p.s == p.o:
        # same var both ends: only cyclic reachability rows qualify
        out = df.filter(F.col("a") == F.col("b")).select(
            _binding_struct(F.lit(0), F.col("a"), F.lit(None)).alias(p.s[1:])
        )
    return out


def _scan_pattern(store, p: Bgp) -> DataFrame:
    """Scan one pattern; project var columns as binding structs."""
    if p.path_mod:
        return _path_step(store, p)
    tp = TriplePattern(
        s=None if is_var(p.s) else p.s,
        p=None if is_var(p.p) else p.p,
        o=None
        if is_var(p.o)
        else ((p.o, KIND_ENTITY) if isinstance(p.o, str) else
              (p.o if isinstance(p.o, tuple) else None)),
        o_num=p.o if isinstance(p.o, (int, float)) and not isinstance(p.o, bool) else None,
        c=None if (p.g is None or is_var(p.g)) else p.g,
    )
    df = scan(store, tp)
    bindings: list[tuple[str, Column]] = []
    if is_var(p.s):
        bindings.append((p.s[1:], _binding_struct(F.lit(0), F.col("s"), F.lit(None))))
    if is_var(p.p):
        bindings.append((p.p[1:], _binding_struct(F.lit(0), F.col("p"), F.lit(None))))
    if is_var(p.o):
        bindings.append(
            (p.o[1:], _binding_struct(F.col("o_kind"), F.col("o"), F.col("o_num")))
        )
    if p.g is not None and is_var(p.g):
        bindings.append((p.g[1:], _binding_struct(F.lit(0), F.col("c"), F.lit(None))))
    # duplicate-var consistency WITHIN a pattern (?x p ?x): bind once,
    # constrain the repeated positions equal — the reference enforces
    # this in its binding insert (graph/TripleBinder.java:10-33,
    # QueryIterTriplePattern.insert)
    seen: dict[str, Column] = {}
    cols = []
    for name, struct_col in bindings:
        if name in seen:
            df = df.filter(seen[name].eqNullSafe(struct_col))
        else:
            seen[name] = struct_col
            cols.append(struct_col.alias(name))
    if not cols:  # fully bound pattern → existence check, keep a marker
        cols.append(F.lit(1).alias("__exists"))
    return df.select(*cols)


def execute_bgp(
    store,
    patterns: list[Bgp],
    filters: list[Filter] | None = None,
    optional: list[Bgp] | None = None,
) -> DataFrame:
    """Evaluate a BGP to a DataFrame of binding structs (one col per var).

    ``optional`` patterns are left-joined after the required ones
    (OPTIONAL semantics, reference: stock ARQ OpConditional — J11).
    Filters apply as soon as their variable is in scope; Catalyst pushes
    them further down on its own.
    """
    from dataclasses import replace

    filters = list(filters or [])
    # J8 fidelity: a pattern whose object var carries a single-var filter
    # ranks above its unfiltered twin (ReorderHeuristics' filtered flag,
    # reference: optimizer/reorder/StatsMatcher.java:291-400)
    fvars = {f.var for f in filters if not isinstance(f, VarFilter)}
    patterns = [
        replace(p, filtered=True)
        if (is_var(p.o) and p.o in fvars and not p.filtered)
        else p
        for p in patterns
    ]
    result: DataFrame | None = None
    for p in reorder(patterns):
        step = _scan_pattern(store, p)
        if result is None:
            result = step
        else:
            shared = [c for c in step.columns if c in result.columns and c != "__exists"]
            if shared:
                result = result.join(step, on=shared, how="inner")
            else:
                result = result.crossJoin(step)
        # apply any filter whose vars are all now bound
        ready = [
            f for f in filters
            if all(v in result.columns for v in _filter_vars(f))
        ]
        for f in ready:
            cond = f.cond() if isinstance(f, VarFilter) else f.apply(
                F.col(f.var[1:])
            )
            result = result.filter(cond)
            filters.remove(f)
    assert result is not None, "empty BGP"
    for p in optional or []:
        step = _scan_pattern(store, p)
        shared = [c for c in step.columns if c in result.columns and c != "__exists"]
        result = result.join(step, on=shared, how="left") if shared else result.crossJoin(step)
    if "__exists" in result.columns:
        result = result.drop("__exists")
    return result


def materialize(
    result: DataFrame,
    store,
    variables: list[str] | None = None,
    keep: list[str] | None = None,
) -> DataFrame:
    """Late materialization: binding structs → lexical strings.

    One broadcast-or-shuffle join with id2term per projected variable —
    the set-oriented analog of the reference's per-binding LRU-memoized
    id→string resolution (binding/BindingMaterializer.java:25-116).

    ``keep``: plain (non-binding) columns to pass through verbatim —
    aggregate outputs that are already scalar values.
    """
    id2term = store.id2term()
    variables = variables or [c for c in result.columns if c not in (keep or [])]
    out = result
    for v in variables:
        name = v[1:] if v.startswith("?") else v
        d = id2term.select(
            F.col("id").alias(f"__{name}_id"), F.col("label").alias(f"__{name}_label")
        )
        out = out.join(
            d, out[name].getField("id") == d[f"__{name}_id"], "left"
        ).withColumn(
            name + "_term",
            F.coalesce(
                F.col(f"__{name}_label"),
                F.col(name).getField("num").cast("string"),
            ),
        ).drop(f"__{name}_id", f"__{name}_label")
    cols = [
        F.col((v[1:] if v.startswith("?") else v) + "_term").alias(
            v[1:] if v.startswith("?") else v
        )
        for v in variables
    ] + [F.col(k) for k in (keep or [])]
    return out.select(*cols)
