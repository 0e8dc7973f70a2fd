"""Correlated OPTIONAL filters → left-join conditions (VERDICT r4 #2).

SPARQL 1.1 §8.2: ``OPTIONAL { P . FILTER(expr) }`` where ``expr`` reads
outer-bound variables is ``LeftJoin(Ω1, Ω2, expr)`` — the filter is the
JOIN CONDITION evaluated on the merged solution. Three behaviors that
distinguish it from pre-/post-join filtering:

- an extension failing the condition is dropped, but the outer row
  SURVIVES null-extended (a post-join filter would drop the row);
- the condition sees the outer binding (a pre-join filter cannot);
- multiple candidate extensions are filtered independently.

The reference inherits this from stock ARQ (OpLeftJoin conditionals,
visible at HBaseTransformFilterPlacement.java:359-369).
"""

import pytest

from hbase_rdf_spark.functions.encoding import build_dictionaries, encode_quads
from hbase_rdf_spark.operators.materialize import TripleStore
from hbase_rdf_spark.plans.sparql import execute
from hbase_rdf_spark.sources.ntriples import parse_lines, quads

XSD_I = "http://www.w3.org/2001/XMLSchema#integer"

NQ = [
    # outer: every item has a base price
    f'<http://ex/i1> <http://ex/base> "10"^^<{XSD_I}> .',
    f'<http://ex/i2> <http://ex/base> "20"^^<{XSD_I}> .',
    f'<http://ex/i3> <http://ex/base> "30"^^<{XSD_I}> .',
    # offers: i1 has two (5, 15), i2 has one (15), i3 has none
    f'<http://ex/i1> <http://ex/offer> "5"^^<{XSD_I}> .',
    f'<http://ex/i1> <http://ex/offer> "15"^^<{XSD_I}> .',
    f'<http://ex/i2> <http://ex/offer> "15"^^<{XSD_I}> .',
    # labels for the label-space variant
    '<http://ex/i1> <http://ex/tag> "red" .',
    '<http://ex/i2> <http://ex/tag> "blue" .',
]


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("optcorr"))
    lines = spark.createDataFrame([(l,) for l in NQ], "value string")
    resolved = quads(parse_lines(lines))
    st = TripleStore(spark, root, num_partitions=2)
    t2i, i2t = build_dictionaries(resolved)
    st.write_dictionaries(t2i, i2t, "nq")
    st.write_indexes(encode_quads(resolved), "nq")
    return st


def rows(store, q):
    return sorted(
        tuple(r) for r in execute(store, q).collect()
    )


def test_correlated_filter_is_join_condition(store):
    # offer < base: i1 keeps only the 5-offer (15 < 10 fails); i2's
    # sole offer 15 < 20 passes; i3 has no offer → null-extended.
    got = rows(store, """
        SELECT ?s ?o WHERE { ?s <http://ex/base> ?b .
          OPTIONAL { ?s <http://ex/offer> ?o . FILTER(?o < ?b) } }""")
    assert got == [
        ("http://ex/i1", "5.0"),
        ("http://ex/i2", "15.0"),
        ("http://ex/i3", None),
    ]


def test_failing_condition_null_extends_not_drops(store):
    # every extension fails (?o > 100): ALL outer rows survive with
    # ?o unbound — the §8.2 distinction vs a post-join FILTER
    got = rows(store, """
        SELECT ?s ?o WHERE { ?s <http://ex/base> ?b .
          OPTIONAL { ?s <http://ex/offer> ?o . FILTER(?o > ?b + 100) } }""")
    assert got == [
        ("http://ex/i1", None),
        ("http://ex/i2", None),
        ("http://ex/i3", None),
    ]


def test_mixed_local_and_correlated_filters(store):
    # block-local (?o > 6) evaluates inside the block; correlated
    # (?o < ?b) joins conditionally: i1 offers {5,15} → local keeps 15,
    # condition 15<10 fails → null-extended; i2 offer 15 passes both.
    got = rows(store, """
        SELECT ?s ?o WHERE { ?s <http://ex/base> ?b .
          OPTIONAL { ?s <http://ex/offer> ?o .
                     FILTER(?o > 6) FILTER(?o < ?b) } }""")
    assert got == [
        ("http://ex/i1", None),
        ("http://ex/i2", "15.0"),
        ("http://ex/i3", None),
    ]


def test_correlated_var_var_arithmetic(store):
    # ExprCmp fallback path as a join condition: ?o * 3 > ?b
    got = rows(store, """
        SELECT ?s ?o WHERE { ?s <http://ex/base> ?b .
          OPTIONAL { ?s <http://ex/offer> ?o . FILTER(?o * 3 > ?b) } }""")
    assert got == [
        ("http://ex/i1", "15.0"),
        ("http://ex/i1", "5.0"),
        ("http://ex/i2", "15.0"),
        ("http://ex/i3", None),
    ]


def test_correlated_label_space_filter(store):
    # label-space condition (str() of the OUTER var) — the filter's
    # dictionary join attaches on the merged frame
    got = rows(store, """
        SELECT ?s ?t WHERE { ?s <http://ex/base> ?b .
          OPTIONAL { ?s <http://ex/tag> ?t . FILTER(str(?t) != "red") } }""")
    assert got == [
        ("http://ex/i1", None),
        ("http://ex/i2", "blue"),
        ("http://ex/i3", None),
    ]


def test_correlated_filter_missing_var_raises(store):
    with pytest.raises(ValueError):
        rows(store, """
            SELECT ?s WHERE { ?s <http://ex/base> ?b .
              OPTIONAL { ?s <http://ex/offer> ?o .
                         FILTER(?o < ?nowhere) } }""")


def test_second_optional_sees_first_extension(store):
    # chained OPTIONALs: the second block's condition reads a var the
    # FIRST optional bound (nullable on the outer side → merge path)
    got = rows(store, """
        SELECT ?s ?o ?t WHERE { ?s <http://ex/base> ?b .
          OPTIONAL { ?s <http://ex/offer> ?o . FILTER(?o < ?b) }
          OPTIONAL { ?s <http://ex/tag> ?t . FILTER(?o = 15) } }""")
    assert got == [
        ("http://ex/i1", "5.0", None),
        ("http://ex/i2", "15.0", "blue"),
        ("http://ex/i3", None, None),
    ]
