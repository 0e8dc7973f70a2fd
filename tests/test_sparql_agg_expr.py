"""Round-4 aggregate-expression surface (SPARQL 1.1 §18.4/§18.2.4.4).

1. Aggregates over EXPRESSION arguments — ``SUM(?price * ?qty)`` —
   desugar into a hidden per-solution Extend just before the groupBy
   (q.agg_prebinds), so the Spark aggregate stays map-side combinable.
2. SELECT expressions over the AGGREGATED frame — referencing earlier
   aggregate aliases ``(?rev / 2 AS ?half)`` or containing aggregate
   calls inline ``(SUM(?a)/SUM(?b) AS ?r)`` (hidden ``__hagg*``
   aggregates) — evaluate as Extends AFTER grouping + HAVING.
3. SUM/AVG respect DISTINCT (§18.5.1: Distinct applies to the multiset
   of argument values).

The reference inherits all three from ARQ/Sesame's aggregate algebra
(SURVEY SE2; reference: src/main/java/nl/vu/jena/sparql/engine/ hands
queries to ARQ verbatim).
"""

import pytest

from hbase_rdf_spark.functions.encoding import build_dictionaries, encode_quads
from hbase_rdf_spark.operators.materialize import TripleStore
from hbase_rdf_spark.plans.sparql import SparqlSyntaxError, execute
from hbase_rdf_spark.sources.ntriples import parse_lines, quads

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
NQ = [
    f'<http://x/a> <http://x/price> "2"^^<{XSD_INT}> .',
    f'<http://x/a> <http://x/qty> "3"^^<{XSD_INT}> .',
    f'<http://x/b> <http://x/price> "5"^^<{XSD_INT}> .',
    f'<http://x/b> <http://x/qty> "4"^^<{XSD_INT}> .',
    f'<http://x/c> <http://x/price> "5"^^<{XSD_INT}> .',
    "<http://x/a> <http://x/tag> <http://x/T> .",
    "<http://x/b> <http://x/tag> <http://x/T> .",
]


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("aggexpr"))
    lines = spark.createDataFrame([(line,) for line in NQ], "value string")
    resolved = quads(parse_lines(lines))
    st = TripleStore(spark, root, num_partitions=2)
    t2i, i2t = build_dictionaries(resolved)
    st.write_dictionaries(t2i, i2t, "nq")
    st.write_indexes(encode_quads(resolved), "nq")
    return st


def _rows(store, q):
    return [tuple(r) for r in execute(store, q).collect()]


def test_sum_of_product(store):
    got = _rows(store, """
        SELECT ?s (SUM(?p * ?q) AS ?rev) WHERE {
          ?s <http://x/price> ?p . ?s <http://x/qty> ?q .
        } GROUP BY ?s ORDER BY ?s""")
    assert got == [("http://x/a", 6.0), ("http://x/b", 20.0)]


def test_ratio_of_sums_inline_aggregates(store):
    got = _rows(store, """
        SELECT (SUM(?p) / SUM(?q) AS ?ratio) (COUNT(*) AS ?n) WHERE {
          ?s <http://x/price> ?p . ?s <http://x/qty> ?q . }""")
    assert got == [(1.0, 2)]  # (2+5)/(3+4); only a,b have both preds


def test_expression_over_aggregate_alias(store):
    got = _rows(store, """
        SELECT ?s (SUM(?p) AS ?tot) (?tot * 2 AS ?dbl) WHERE {
          ?s <http://x/price> ?p . } GROUP BY ?s ORDER BY ?s""")
    assert got == [
        ("http://x/a", 2.0, 4.0),
        ("http://x/b", 5.0, 10.0),
        ("http://x/c", 5.0, 10.0),
    ]


def test_order_by_postagg_alias(store):
    got = _rows(store, """
        SELECT ?s (SUM(?p) AS ?t) (0 - ?t AS ?neg) WHERE {
          ?s <http://x/price> ?p . } GROUP BY ?s ORDER BY ?neg ?s""")
    assert [r[0] for r in got] == ["http://x/b", "http://x/c", "http://x/a"]


def test_sum_avg_distinct(store):
    got = _rows(store, """
        SELECT (SUM(DISTINCT ?p) AS ?sd) (AVG(DISTINCT ?p) AS ?ad)
               (SUM(?p) AS ?sall) WHERE { ?s <http://x/price> ?p . }""")
    assert got == [(7.0, 3.5, 12.0)]  # values {2,5,5} → distinct {2,5}


def test_count_expression_skips_error_rows(store):
    # ?p / 0 errors on every row → unbound → COUNT sees no values;
    # COUNT(?p + 0) sees all three
    got = _rows(store, """
        SELECT (COUNT(?p / 0) AS ?z) (COUNT(?p + 0) AS ?n) WHERE {
          ?s <http://x/price> ?p . }""")
    assert got == [(0.0, 3.0)]


def test_subquery_aggregate_expression(store):
    got = _rows(store, """
        SELECT ?s ?rev WHERE {
          ?s <http://x/tag> <http://x/T> .
          { SELECT ?s (SUM(?p * ?q) AS ?rev) WHERE {
              ?s <http://x/price> ?p . ?s <http://x/qty> ?q .
            } GROUP BY ?s }
        } ORDER BY ?s""")
    assert got == [("http://x/a", "6.0"), ("http://x/b", "20.0")]


def test_subquery_postagg_expression(store):
    got = _rows(store, """
        SELECT ?s ?m WHERE {
          ?s <http://x/tag> <http://x/T> .
          { SELECT ?s (SUM(?p) / COUNT(?p) AS ?m) WHERE {
              ?s <http://x/price> ?p . } GROUP BY ?s }
        } ORDER BY ?s""")
    assert got == [("http://x/a", "2.0"), ("http://x/b", "5.0")]


def test_having_aggregate_expression(store):
    got = _rows(store, """
        SELECT ?s (SUM(?p * ?q) AS ?rev) (?rev / 2 AS ?half) WHERE {
          ?s <http://x/price> ?p . ?s <http://x/qty> ?q .
        } GROUP BY ?s HAVING (SUM(?p * ?q) > 10)""")
    assert got == [("http://x/b", 20.0, 10.0)]


def test_group_concat_expression_argument(store):
    got = _rows(store, """
        SELECT (GROUP_CONCAT(STR(?p); SEPARATOR="|") AS ?cc) WHERE {
          ?s <http://x/price> ?p . }""")
    assert got == [("2.0|2.0|5.0",)] or got == [("2.0|5.0|5.0",)]


def test_group_var_copy_alias(store):
    got = _rows(store, """
        SELECT ?s (?s AS ?also) (COUNT(?p) AS ?n) WHERE {
          ?s <http://x/price> ?p . } GROUP BY ?s ORDER BY ?s""")
    assert got == [
        ("http://x/a", "http://x/a", 1.0),
        ("http://x/b", "http://x/b", 1.0),
        ("http://x/c", "http://x/c", 1.0),
    ]


def test_select_expr_over_ungrouped_var_raises(store):
    with pytest.raises(SparqlSyntaxError):
        execute(store, """
            SELECT (?p + 1 AS ?bad) (COUNT(?p) AS ?n) WHERE {
              ?s <http://x/price> ?p . }""").collect()


def test_ungrouped_select_expr_still_binds(store):
    # no aggregates → SELECT expression stays an ordinary per-solution
    # Extend (regression guard for the staging split)
    got = _rows(store, """
        SELECT ?s (?p * 10 AS ?cents) WHERE {
          ?s <http://x/price> ?p . } ORDER BY ?s""")
    assert got == [
        ("http://x/a", "20.0"),
        ("http://x/b", "50.0"),
        ("http://x/c", "50.0"),
    ]
