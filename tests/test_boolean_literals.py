"""xsd:boolean literals and ill-typed numeric literals end-to-end.

The store inlines xsd:boolean as kind-2 numerics (1.0/0.0 — the
reference's TypedId boolean subtype, id/TypedId.java:24-44, collapsed
onto the numeric channel per the engine's documented datatype
erasure). Before this round the ingest path crashed on them: quads()
forwarded the lexical 'true' into encode_quads' ANSI double cast. The
query parser likewise treated "true"^^xsd:boolean as a kind-1 string,
so boolean constants could never match, and bare `true`/`false`
(grammar [133] BooleanLiteral) did not parse at all.

Ill-typed numeric literals ("12x"^^xsd:integer — legal RDF, just not
in the value space) now degrade to kind-1 string literals with their
datatype wrapper preserved instead of failing the whole scan.
"""

import pytest

from hbase_rdf_spark.functions.encoding import build_dictionaries, encode_quads
from hbase_rdf_spark.operators.materialize import TripleStore
from hbase_rdf_spark.plans.sparql import execute
from hbase_rdf_spark.sources.ntriples import parse_lines, quads

XSD_B = "http://www.w3.org/2001/XMLSchema#boolean"
XSD_I = "http://www.w3.org/2001/XMLSchema#integer"

NQ = [
    f'<http://ex/i1> <http://ex/active> "true"^^<{XSD_B}> .',
    f'<http://ex/i2> <http://ex/active> "false"^^<{XSD_B}> .',
    f'<http://ex/i3> <http://ex/active> "true"^^<{XSD_B}> .',
    f'<http://ex/i4> <http://ex/active> "1"^^<{XSD_B}> .',
    f'<http://ex/i5> <http://ex/n> "12x"^^<{XSD_I}> .',
    f'<http://ex/i6> <http://ex/n> "12"^^<{XSD_I}> .',
]


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("boolstore"))
    lines = spark.createDataFrame([(l,) for l in NQ], "value string")
    resolved = quads(parse_lines(lines))
    st = TripleStore(spark, root, num_partitions=2)
    t2i, i2t = build_dictionaries(resolved)
    st.write_dictionaries(t2i, i2t, "nq")
    st.write_indexes(encode_quads(resolved), "nq")
    return st


def rows(store, q):
    return sorted(tuple(r) for r in execute(store, q).collect())


def test_boolean_constant_in_pattern(store):
    got = rows(store, f"""
        SELECT ?s WHERE {{ ?s <http://ex/active> "true"^^<{XSD_B}> }}""")
    assert got == [
        ("http://ex/i1",), ("http://ex/i3",), ("http://ex/i4",),
    ]


def test_bare_boolean_keyword(store):
    got = rows(store, "SELECT ?s WHERE { ?s <http://ex/active> false }")
    assert got == [("http://ex/i2",)]


def test_boolean_filter_equality(store):
    got = rows(store, f"""
        SELECT ?s WHERE {{ ?s <http://ex/active> ?a .
          FILTER(?a = "false"^^<{XSD_B}>) }}""")
    assert got == [("http://ex/i2",)]


def test_boolean_one_zero_lexicals_unify(store):
    # "1"^^xsd:boolean and "true"^^xsd:boolean share the value space
    got = rows(store, "SELECT ?s WHERE { ?s <http://ex/active> true }")
    assert got == [
        ("http://ex/i1",), ("http://ex/i3",), ("http://ex/i4",),
    ]


def test_ill_typed_numeric_survives_as_string_literal(store):
    # the scan did not crash (fixture built), the term is retrievable
    # with its wrapper, and it does NOT match numeric comparisons
    got = rows(store, "SELECT ?s ?o WHERE { ?s <http://ex/n> ?o }")
    assert got == [
        ("http://ex/i5", f'"12x"^^<{XSD_I}>'),
        ("http://ex/i6", "12.0"),  # the engine's numeric rendering
    ]
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/n> ?o . FILTER(?o >= 12) }""")
    assert got == [("http://ex/i6",)]


def test_ill_typed_constant_matches_stored_form(store):
    got = rows(store, f"""
        SELECT ?s WHERE {{ ?s <http://ex/n> "12x"^^<{XSD_I}> }}""")
    assert got == [("http://ex/i5",)]
