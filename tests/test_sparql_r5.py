"""Round-5 expression-semantics fixes (ADVICE r4).

1. Statically type-erroring legs (arithmetic vs a non-numeric constant)
   compile to an error (NULL) condition, not static false, so negation
   propagates the error per §17.2 three-valued logic — FILTER(!(err))
   and NOT IN over an erroring member drop rows instead of keeping them
   (ARQ raises ExprEvalException; NULL is Spark's error channel).
2. §17.2.2 EBV edges: EBV(NaN) is false; a typed literal with a
   non-xsd:string datatype (e.g. xsd:dateTime) has no EBV → type error;
   statically channel-incompatible ExprCmp comparisons evaluate to
   error → zero rows rather than raising.
3. EXISTS-as-expression markers use null-tolerant key compatibility
   when the block is a full algebra group (UNION inside EXISTS can
   null-extend block-side shared vars; §8.3 compatibility matches
   them to any outer value).
4. Signed numeric-literal tokens continue additive expressions
   (grammar [116]): FILTER((?p) -1 > 12) and FILTER((?p -1) > 12)
   both parse.
"""

import pytest

from hbase_rdf_spark.functions.encoding import build_dictionaries, encode_quads
from hbase_rdf_spark.operators.materialize import TripleStore
from hbase_rdf_spark.plans.sparql import execute
from hbase_rdf_spark.sources.ntriples import parse_lines, quads

XSD_I = "http://www.w3.org/2001/XMLSchema#integer"
XSD_D = "http://www.w3.org/2001/XMLSchema#double"
XSD_DT = "http://www.w3.org/2001/XMLSchema#dateTime"

NQ = [
    f'<http://ex/i1> <http://ex/price> "12"^^<{XSD_I}> .',
    f'<http://ex/i2> <http://ex/price> "17"^^<{XSD_I}> .',
    f'<http://ex/i3> <http://ex/price> "23"^^<{XSD_I}> .',
    f'<http://ex/i1> <http://ex/qty> "10"^^<{XSD_I}> .',
    f'<http://ex/i2> <http://ex/qty> "2"^^<{XSD_I}> .',
    f'<http://ex/i1> <http://ex/nanv> "NaN"^^<{XSD_D}> .',
    f'<http://ex/i2> <http://ex/nanv> "1.5"^^<{XSD_D}> .',
    f'<http://ex/i1> <http://ex/when> "2024-01-01T00:00:00Z"^^<{XSD_DT}> .',
    '<http://ex/i1> <http://ex/name> "alpha" .',
    '<http://ex/i2> <http://ex/name> "bete" .',
    '<http://ex/i1> <http://ex/qa> <http://ex/z1> .',
]


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r5store"))
    lines = spark.createDataFrame([(l,) for l in NQ], "value string")
    resolved = quads(parse_lines(lines))
    st = TripleStore(spark, root, num_partitions=2)
    t2i, i2t = build_dictionaries(resolved)
    st.write_dictionaries(t2i, i2t, "nq")
    st.write_indexes(encode_quads(resolved), "nq")
    return st


def rows(store, q):
    return sorted(tuple(r) for r in execute(store, q).collect())


# -- 1. negation-safe type-error legs ---------------------------------------


def test_not_in_with_erroring_member_drops_all(store):
    # ?p+1 != "foo" is a type error on every row; NOT IN is the
    # conjunction of != (§17.4.1.9) so the whole expression errors
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/price> ?p .
          FILTER(?p + 1 NOT IN ("foo", 10)) }""")
    assert got == []


def test_in_with_erroring_member_keeps_true_rows(store):
    # error || true is true: the p=12 row matches the 13 member
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/price> ?p .
          FILTER(?p + 1 IN ("foo", 13)) }""")
    assert got == [("http://ex/i1",)]


def test_negated_arithmetic_vs_iri_drops_all(store):
    # ?p+1 = <iri> is a type error; !error is still error → no rows
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/price> ?p .
          FILTER(!(?p + 1 = <http://ex/i1>)) }""")
    assert got == []


# -- 2. EBV / ExprCmp edges --------------------------------------------------


def test_ebv_nan_is_false(store):
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/nanv> ?v . FILTER(?v) }""")
    assert got == [("http://ex/i2",)]


def test_ebv_nan_arith_is_false(store):
    # non-var numeric EBV leg: NaN * 1 is still NaN → false
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/nanv> ?v . FILTER(?v * 1) }""")
    assert got == [("http://ex/i2",)]


def test_ebv_nonstring_typed_literal_is_error(store):
    # xsd:dateTime has no EBV → type error → row dropped (previously
    # took the string branch and evaluated true on non-empty lexical)
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/when> ?v . FILTER(?v) }""")
    assert got == []


def test_ebv_plain_string_still_works(store):
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/name> ?v . FILTER(?v) }""")
    assert got == [("http://ex/i1",), ("http://ex/i2",)]


def test_exprcmp_incompatible_channels_is_error_not_raise(store):
    # numeric channel vs string channel: statically incompatible →
    # error on every row → zero rows (ARQ: ExprEvalException → false)
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/price> ?p ;
            <http://ex/qty> ?q ; <http://ex/name> ?n .
          FILTER((?p + ?q) = CONCAT(?n, "x")) }""")
    assert got == []


# -- 3. EXISTS-expression marker over a UNION group --------------------------


def test_exists_expr_union_block_unbound_shared_var(store):
    # block branch {?s <qa> ?z} binds ?s but leaves ?v unbound; §8.3
    # compatibility matches the outer (?s,?v) row anyway → EXISTS true
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/price> ?v .
          FILTER(EXISTS { { ?s <http://ex/qa> ?z }
                          UNION { ?v <http://ex/qb> ?z } } || false) }""")
    assert got == [("http://ex/i1",)]


# -- 4. signed numeric-literal continuation ---------------------------------


def test_multiplicative_rhs_comparison(store):
    # ?p < ?q * 10 — the multiplicative RHS is beyond the linearizable
    # comparison grammar; it must fall through to ExprCmp instead of
    # returning a truncated ?p < ?q with tokens left over
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/price> ?p ; <http://ex/qty> ?q .
          FILTER(?p < ?q * 10) }""")
    # i1: 12 < 100, i2: 17 < 20; i3: 23 < 10 fails
    assert got == [("http://ex/i1",), ("http://ex/i2",)]


def test_paren_var_minus_literal_outside(store):
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/price> ?p .
          FILTER((?p) -1 > 12) }""")
    assert got == [("http://ex/i2",), ("http://ex/i3",)]


def test_paren_var_minus_literal_inside(store):
    got = rows(store, """
        SELECT ?s WHERE { ?s <http://ex/price> ?p .
          FILTER((?p -1) > 12) }""")
    assert got == [("http://ex/i2",), ("http://ex/i3",)]


# -- trailing VALUES over post-projection outputs (§18.2.4) ------------------


def test_trailing_values_over_aggregate_alias(store):
    got = rows(store, """
        SELECT ?s (SUM(?p) AS ?tot) WHERE { ?s <http://ex/price> ?p }
        GROUP BY ?s VALUES ?tot { 12 }""")
    assert got == [("http://ex/i1", 12.0)]


def test_trailing_values_over_bind_output(store):
    got = rows(store, """
        SELECT ?s ?r WHERE { ?s <http://ex/price> ?p .
          BIND(?p + 1 AS ?r) } VALUES ?r { 13 }""")
    assert got == [("http://ex/i1", "13.0")]


def test_trailing_values_new_var_and_undef(store):
    # (12, "low") matches only i1; (UNDEF, "any") matches every group —
    # bag semantics keep i1 twice with different tags
    got = rows(store, """
        SELECT ?s ?tot ?tag WHERE { ?s <http://ex/price> ?p .
        } GROUP BY ?s VALUES (?tot ?tag) { (UNDEF "any") }""")
    # aggregate-free GROUP BY + new-var VALUES: every key extended
    assert got == [
        ("http://ex/i1", None, "any"),
        ("http://ex/i2", None, "any"),
        ("http://ex/i3", None, "any"),
    ]


def test_trailing_values_agg_alias_multirow(store):
    got = rows(store, """
        SELECT ?s (SUM(?p) AS ?tot) (COUNT(*) AS ?n)
        WHERE { ?s <http://ex/price> ?p } GROUP BY ?s
        VALUES ?tot { 12 17 99 }""")
    assert got == [
        ("http://ex/i1", 12.0, 1),
        ("http://ex/i2", 17.0, 1),
    ]


def test_trailing_values_non_group_key_var(store):
    # §18.2.4: ?p is unbound in the post-aggregation solutions, so the
    # VALUES row joins freely — groups and counts unchanged
    got = rows(store, """
        SELECT ?s (COUNT(?p) AS ?n) WHERE { ?s <http://ex/price> ?p }
        GROUP BY ?s VALUES ?p { 999 }""")
    assert got == [
        ("http://ex/i1", 1), ("http://ex/i2", 1), ("http://ex/i3", 1),
    ]


def test_bind_minus_literal_token(store):
    got = rows(store, """
        SELECT ?s ?r WHERE { ?s <http://ex/price> ?p .
          BIND(?p -2 AS ?r) FILTER(?r > 20) }""")
    # arithmetic BIND values render on the double channel
    assert got == [("http://ex/i3", "21.0")]
