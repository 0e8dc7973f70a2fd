"""Property-based BGP correctness: random patterns vs a brute-force
pandas evaluator over a small N-Quads store.

The reference has no randomized testing (SURVEY §5.1.5); this closes
that gap for the query layer. Hypothesis generates arbitrary 1-3
pattern BGPs (random bound/unbound masks over known constants, shared
variables); the engine's result must equal the set produced by a naive
pandas join over the raw triples — per-example, every mask combination
and join topology the 16-mask router and reorderer can face.
"""

import itertools

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from hbase_rdf_spark.functions.encoding import build_dictionaries, encode_quads
from hbase_rdf_spark.operators.materialize import TripleStore
from hbase_rdf_spark.plans.bgp import Bgp, execute_bgp, materialize
from hbase_rdf_spark.sources.ntriples import parse_lines, quads

SUBJECTS = [f"http://ex/s{i}" for i in range(4)]
PREDS = [f"http://ex/p{i}" for i in range(3)]
OBJECTS = [f"http://ex/o{i}" for i in range(3)] + SUBJECTS[:2]
GRAPHS = ["http://ex/g0", "http://ex/g1"]

# deterministic small quad graph: ~60% density over (s, p) pairs,
# context assigned round-robin
TRIPLES = [
    (s, p, OBJECTS[(i * 7 + j * 3) % len(OBJECTS)], GRAPHS[(i + j) % 2])
    for i, s in enumerate(SUBJECTS)
    for j, p in enumerate(PREDS)
    if (i * 5 + j * 11) % 10 < 6
]


@pytest.fixture(scope="module")
def pstore(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("propstore"))
    lines = spark.createDataFrame(
        [(f"<{s}> <{p}> <{o}> <{g}> .",) for s, p, o, g in TRIPLES],
        "value string",
    )
    resolved = quads(parse_lines(lines))
    st_ = TripleStore(spark, root, num_partitions=2)
    t2i, i2t = build_dictionaries(resolved)
    st_.write_dictionaries(t2i, i2t, "prop")
    st_.write_indexes(encode_quads(resolved), "prop")
    return st_


def brute_force(patterns: list[Bgp]) -> set[tuple]:
    """Naive evaluation: cross-join all pattern matches, keep rows where
    shared variables agree; project variables in sorted name order.

    The engine stores contexts dictionary-encoded as ``conv:<graph>``
    terms (ntriples context → conv_id slot), so the g column carries
    that prefix for variable bindings while constants compare raw."""
    tdf = pd.DataFrame(TRIPLES, columns=["s", "p", "o", "_graw"])
    tdf["g"] = "conv:" + tdf["_graw"]
    frames = []
    for k, pat in enumerate(patterns):
        m = tdf
        cols = {}
        for slot in ("s", "p", "o", "g"):
            v = getattr(pat, slot)
            if v is None:
                continue
            if isinstance(v, str) and v.startswith("?"):
                cols[slot] = v[1:]
            elif slot == "g":
                m = m[m["_graw"] == v]
            else:
                m = m[m[slot] == v]
        m = m.rename(columns=cols)[list(cols.values())]
        m = m.assign(_k=1)
        # a pattern may bind the same var twice (e.g. ?x p ?x): dedupe
        # columns by enforcing equality
        dup = [c for c in m.columns if list(m.columns).count(c) > 1]
        if dup:
            keep = m.loc[:, ~m.columns.duplicated()].copy()
            for c in set(dup):
                same = m.loc[:, m.columns == c]
                keep = keep[same.nunique(axis=1).eq(1).values]
            m = keep
        frames.append(m.add_suffix(f"__{k}").rename(columns={f"_k__{k}": "_k"}))
    out = frames[0]
    for f in frames[1:]:
        out = out.merge(f, on="_k")
    # enforce shared-variable equality across patterns
    allvars = sorted(
        {c.split("__")[0] for c in out.columns if c != "_k"}
    )
    for v in allvars:
        cols = [c for c in out.columns if c.split("__")[0] == v]
        if len(cols) > 1:
            out = out[out[cols].nunique(axis=1).eq(1)]
    rows = set()
    for _, r in out.iterrows():
        rows.add(
            tuple(
                r[[c for c in out.columns if c.split("__")[0] == v][0]]
                for v in allvars
            )
        )
    return rows


def elem(draw, pool, var_names):
    kind = draw(st.integers(0, 2))
    if kind == 0:
        return draw(st.sampled_from(pool))
    return "?" + draw(st.sampled_from(var_names))


@st.composite
def bgps(draw):
    n = draw(st.integers(1, 3))
    var_names = ["x", "y", "z", "w"]
    pats = []
    for _ in range(n):
        s = elem(draw, SUBJECTS, var_names)
        p = elem(draw, PREDS, var_names)
        o = elem(draw, OBJECTS, var_names)
        gk = draw(st.integers(0, 3))  # 0-1: no graph slot (any graph)
        g = None
        if gk == 2:
            g = draw(st.sampled_from(GRAPHS))
        elif gk == 3:
            g = "?g"
        pats.append(Bgp(s, p, o, g=g))
    # at least one variable somewhere, else nothing to project
    if not any(
        isinstance(e, str) and e.startswith("?")
        for pat in pats
        for e in (pat.s, pat.p, pat.o)
    ):
        pats[0] = Bgp("?x", pats[0].p, pats[0].o)
    return pats


def to_sparql(patterns: list[Bgp]) -> str:
    """Render patterns back to SPARQL text (round-trips the parser),
    wrapping graph-constrained patterns in GRAPH blocks."""

    def term(e):
        return e if (isinstance(e, str) and e.startswith("?")) else f"<{e}>"

    parts = []
    for p in patterns:
        t = f"{term(p.s)} {term(p.p)} {term(p.o)}"
        parts.append(t if p.g is None else f"GRAPH {term(p.g)} {{ {t} }}")
    return f"SELECT * WHERE {{ {' . '.join(parts)} }}"


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(patterns=bgps())
def test_sparql_text_matches_bruteforce(spark, pstore, patterns):
    """The full text path (tokenize → parse → plan → execute) agrees
    with the naive evaluator on arbitrary generated queries."""
    from hbase_rdf_spark.plans.sparql import execute

    expected = brute_force(patterns)
    out = execute(pstore, to_sparql(patterns))
    got = {tuple(r[c] for c in sorted(out.columns)) for r in out.collect()}
    assert got == expected, f"query={to_sparql(patterns)!r}"


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(patterns=bgps())
def test_bgp_matches_bruteforce(spark, pstore, patterns):
    expected = brute_force(patterns)
    result = execute_bgp(pstore, patterns)
    allvars = sorted(result.columns)
    got = set()
    if allvars:
        mat = materialize(result, pstore, [f"?{v}" for v in allvars])
        got = {tuple(r[v] for v in allvars) for r in mat.collect()}
    assert got == expected, f"patterns={patterns}"
