"""Round-4 EXISTS as an *expression* (SPARQL 1.1 §17.4.1.4).

``FILTER [NOT] EXISTS { … }`` as the whole filter keeps its semi/anti
join fast path; these tests cover EXISTS *leaves inside boolean
combinations* — ``FILTER(EXISTS{…} && ?p > 5)`` — which the reference
gets for free from ARQ's E_Exists expression node (SURVEY J12). Here
each leaf becomes a hidden boolean marker column: one compatibility
semi-join over the DISTINCT outer key set, joined back null-safely
(key-unique, so rows never multiply), then the whole expression
evaluates as an ordinary column predicate.
"""

import pytest

from hbase_rdf_spark.functions.encoding import build_dictionaries, encode_quads
from hbase_rdf_spark.operators.materialize import TripleStore
from hbase_rdf_spark.plans.sparql import execute
from hbase_rdf_spark.sources.ntriples import parse_lines, quads

XSD_I = "http://www.w3.org/2001/XMLSchema#integer"

NQ = [
    f'<http://ex/i1> <http://ex/price> "12"^^<{XSD_I}> .',
    f'<http://ex/i2> <http://ex/price> "17"^^<{XSD_I}> .',
    f'<http://ex/i3> <http://ex/price> "23"^^<{XSD_I}> .',
    '<http://ex/i1> <http://ex/name> "alpha" .',
    '<http://ex/i2> <http://ex/name> "beta" .',
    '<http://ex/i1> <http://ex/knows> <http://ex/i2> .',
    '<http://ex/i2> <http://ex/knows> <http://ex/i3> .',
]


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("exmstore"))
    lines = spark.createDataFrame([(l,) for l in NQ], "value string")
    resolved = quads(parse_lines(lines))
    st = TripleStore(spark, root, num_partitions=2)
    t2i, i2t = build_dictionaries(resolved)
    st.write_dictionaries(t2i, i2t, "nq")
    st.write_indexes(encode_quads(resolved), "nq")
    return st


def rows(store, q):
    return sorted(tuple(r) for r in execute(store, q).collect())


def test_exists_and_numeric(store):
    # i3 has no name; i1 fails the numeric conjunct
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/price> ?p .
          FILTER(EXISTS { ?s <http://ex/name> ?n } && ?p > 13) }""")
    assert got == [("http://ex/i2",)]


def test_not_exists_or_numeric(store):
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/price> ?p .
          FILTER(NOT EXISTS { ?s <http://ex/name> ?n } || ?p < 13) }""")
    assert got == [("http://ex/i1",), ("http://ex/i3",)]


def test_bang_exists(store):
    # grammar-wise EXISTS is a BuiltInCall, so `!EXISTS{…}` is valid
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/price> ?p .
          FILTER(!EXISTS { ?s <http://ex/name> ?n } && ?p > 13) }""")
    assert got == [("http://ex/i3",)]


def test_two_exists_leaves_disjunction(store):
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/price> ?p .
          FILTER(EXISTS { ?s <http://ex/name> ?n }
              || EXISTS { ?s <http://ex/knows> ?o }) }""")
    assert got == [("http://ex/i1",), ("http://ex/i2",)]


def test_parenthesized_single_exists(store):
    # FILTER(EXISTS{…}) — parenthesized, so it parses through the
    # expression grammar rather than the top-level semi-join form
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/price> ?p .
          FILTER(EXISTS { ?s <http://ex/knows> <http://ex/i3> }) }""")
    assert got == [("http://ex/i2",)]


def test_uncorrelated_exists_is_global_emptiness(store):
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/name> ?n .
          FILTER(EXISTS { <http://ex/i1> <http://ex/knows> ?z }
              && ?n = "alpha") }""")
    assert got == [("http://ex/i1",)]
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/name> ?n .
          FILTER(EXISTS { <http://ex/i3> <http://ex/knows> ?z }) }""")
    assert got == []


def test_exists_block_with_correlated_inner_filter(store):
    # the inner FILTER reads the OUTER ?p — substitution semantics
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/price> ?p .
          FILTER(EXISTS { ?s <http://ex/knows> ?o . FILTER(?p > 13) }
              && ?p < 100) }""")
    assert got == [("http://ex/i2",)]


def test_exists_expr_inside_optional_block(store):
    got = rows(store, """
        SELECT ?s ?n WHERE { ?s <http://ex/price> ?p .
          OPTIONAL { ?s <http://ex/name> ?n .
            FILTER(EXISTS { ?s <http://ex/knows> ?o } && STRLEN(?n) > 4) } }
        """)
    assert got == sorted([
        ("http://ex/i1", "alpha"),
        ("http://ex/i2", None),  # "beta" fails STRLEN > 4 → unbound
        ("http://ex/i3", None),
    ], key=lambda t: t[0])


def test_exists_expr_inside_union_branch(store):
    got = rows(store, """
        SELECT ?s WHERE {
          { ?s <http://ex/name> ?n .
            FILTER(EXISTS { ?s <http://ex/knows> ?o } && STRLEN(?n) > 3) }
          UNION
          { ?s <http://ex/price> ?p . FILTER(?p > 20) } }""")
    assert got == [
        ("http://ex/i1",), ("http://ex/i2",), ("http://ex/i3",),
    ]


def test_exists_over_property_path(store):
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/price> ?p .
          FILTER(EXISTS { ?s <http://ex/knows>+ <http://ex/i3> }
              && ?p < 100) }""")
    assert got == [("http://ex/i1",), ("http://ex/i2",)]


def test_pattern_free_exists_ask(store):
    # a group whose only content is the expression filter seeds the
    # unit solution
    got = rows(store, "ASK { FILTER(EXISTS { ?s <http://ex/knows> ?o }) }")
    assert got == [(True,)]
    got = rows(store, """
        ASK { FILTER(EXISTS { <http://ex/i3> <http://ex/knows> ?o }) }""")
    assert got == [(False,)]


def test_marker_join_never_multiplies_rows(store):
    # i1 knows one node but the EXISTS block has TWO solutions through
    # ?o when unconstrained — the distinct-key back-join must keep
    # exactly one output row per input row
    got = rows(store, """
        SELECT ?s ?p WHERE { ?s <http://ex/price> ?p .
          FILTER(EXISTS { ?x <http://ex/knows> ?o } || ?p > 0) }""")
    assert len(got) == 3
