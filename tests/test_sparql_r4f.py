"""Round-4 solution-modifier widening: ORDER BY expressions (grammar
[24] OrderCondition — brackets, builtin calls, arithmetic, aggregates)
and LANG() as a BIND value function.

The reference inherits expression order keys from ARQ's
OpOrder/ExprTransform pipeline (SURVEY J9/SE2); here each expression
key desugars at parse time to a hidden bind (``__ord_e{i}``) routed to
``binds`` (plain queries) or ``postagg_binds`` (grouped queries — the
same Extend-over-the-aggregated-frame SELECT expressions use), so the
executor's existing machinery computes it as a sort sidecar and drops
it from the output.
"""

import pytest

from hbase_rdf_spark.functions.encoding import build_dictionaries, encode_quads
from hbase_rdf_spark.operators.materialize import TripleStore
from hbase_rdf_spark.plans.sparql import SparqlSyntaxError, execute
from hbase_rdf_spark.sources.ntriples import parse_lines, quads

NQ = [
    '<http://ex/a> <http://ex/name> "Alice" .',
    '<http://ex/b> <http://ex/name> "Bo" .',
    '<http://ex/c> <http://ex/name> "Cyrene" .',
    '<http://ex/a> <http://ex/score> "7"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    '<http://ex/b> <http://ex/score> "9"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    '<http://ex/c> <http://ex/score> "2"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    '<http://ex/a> <http://ex/label> "chat"@fr .',
    '<http://ex/b> <http://ex/label> "cat" .',
    '<http://ex/a> <http://ex/knows> <http://ex/b> .',
    '<http://ex/a> <http://ex/knows> <http://ex/c> .',
    '<http://ex/b> <http://ex/knows> <http://ex/c> .',
]

A, B, C = "http://ex/a", "http://ex/b", "http://ex/c"


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sparqlr4fstore"))
    lines = spark.createDataFrame([(l,) for l in NQ], "value string")
    resolved = quads(parse_lines(lines))
    st = TripleStore(spark, root, num_partitions=2)
    t2i, i2t = build_dictionaries(resolved)
    st.write_dictionaries(t2i, i2t, "nq")
    st.write_indexes(encode_quads(resolved), "nq")
    return st


def _col(store, q, col):
    return [r[col] for r in execute(store, q).collect()]


def test_order_by_arithmetic_desc(store):
    got = _col(
        store,
        'SELECT ?s ?n WHERE { ?s <http://ex/score> ?n } '
        'ORDER BY DESC(?n * 2 - 1)',
        "s",
    )
    assert got == [B, A, C]


def test_order_by_bare_bracketed_expr(store):
    got = _col(
        store,
        'SELECT ?s ?n WHERE { ?s <http://ex/score> ?n } ORDER BY (?n - 10)',
        "s",
    )
    assert got == [C, A, B]


def test_order_by_strlen_no_longer_silently_ignored(store):
    got = _col(
        store,
        'SELECT ?s ?nm WHERE { ?s <http://ex/name> ?nm } '
        'ORDER BY DESC(STRLEN(?nm))',
        "s",
    )
    assert got == [C, A, B]


def test_order_by_string_expression(store):
    got = _col(
        store,
        'SELECT ?s ?nm WHERE { ?s <http://ex/name> ?nm } '
        'ORDER BY DESC(UCASE(?nm))',
        "s",
    )
    assert got == [C, B, A]


def test_order_by_aggregate(store):
    got = _col(
        store,
        'SELECT ?s (COUNT(?o) AS ?c) WHERE { ?s <http://ex/knows> ?o } '
        'GROUP BY ?s ORDER BY DESC(COUNT(?o)) ?s',
        "s",
    )
    assert got == [A, B]


def test_order_by_aggregate_expression(store):
    # hidden aggregate inside arithmetic: SUM(?n) * 3
    got = _col(
        store,
        'SELECT ?s WHERE { ?s <http://ex/score> ?n } GROUP BY ?s '
        'ORDER BY DESC(SUM(?n) * 3)',
        "s",
    )
    assert got == [B, A, C]


def test_order_expr_with_limit_takes_top_k(store):
    got = _col(
        store,
        'SELECT ?s ?n WHERE { ?s <http://ex/score> ?n } '
        'ORDER BY DESC(?n + 1) LIMIT 2',
        "s",
    )
    assert got == [B, A]


def test_order_expr_inside_subquery(store):
    got = _col(
        store,
        'SELECT ?s WHERE { { SELECT ?s WHERE { ?s <http://ex/score> ?n } '
        'ORDER BY DESC(?n + 1) LIMIT 2 } }',
        "s",
    )
    assert sorted(got) == [A, B]


def test_order_expr_under_distinct_projected_ok(store):
    got = _col(
        store,
        'SELECT DISTINCT ?n WHERE { ?s <http://ex/score> ?n } '
        'ORDER BY DESC(?n + 0)',
        "n",
    )
    assert got == ["9.0", "7.0", "2.0"]


def test_order_expr_under_distinct_nonprojected_raises(store):
    with pytest.raises(SparqlSyntaxError):
        execute(
            store,
            'SELECT DISTINCT ?s WHERE { ?s <http://ex/score> ?n } '
            'ORDER BY DESC(?n + 1)',
        )


def test_order_hidden_column_not_in_output(store):
    out = execute(
        store,
        'SELECT ?s WHERE { ?s <http://ex/score> ?n } ORDER BY DESC(?n * 2)',
    )
    assert out.columns == ["s"]


def test_order_expr_mixed_with_plain_var_keys(store):
    # expr key first, var tie-break second
    got = _col(
        store,
        'SELECT ?s (COUNT(?o) AS ?c) WHERE { ?s ?p ?o } GROUP BY ?s '
        'ORDER BY DESC(COUNT(?o) * 1) ?s',
        "s",
    )
    assert got[0] == A  # 5 triples from a


def test_order_by_hash_total_order(store):
    import hashlib

    got = _col(
        store,
        'SELECT ?nm WHERE { ?s <http://ex/name> ?nm } ORDER BY MD5(?nm)',
        "nm",
    )
    assert got == sorted(
        ["Alice", "Bo", "Cyrene"],
        key=lambda s: hashlib.md5(s.encode()).hexdigest(),
    )


def test_lang_bind_tagged_vs_plain(store):
    rows = execute(
        store,
        'SELECT ?s ?lg WHERE { ?s <http://ex/label> ?l . '
        'BIND(LANG(?l) AS ?lg) } ORDER BY ?s',
    ).collect()
    assert [(r["s"], r["lg"]) for r in rows] == [(A, "fr"), (B, "")]


def test_lang_of_numeric_is_empty(store):
    got = _col(
        store,
        'SELECT ?s ?lg WHERE { ?s <http://ex/score> ?n . '
        'BIND(LANG(?n) AS ?lg) } ORDER BY ?s',
        "lg",
    )
    assert got == ["", "", ""]


def test_lang_in_group_by_expr(store):
    # GROUP BY a LANG-derived bind: counts split by language tag
    rows = execute(
        store,
        'SELECT ?lg (COUNT(?s) AS ?c) WHERE { ?s <http://ex/label> ?l . '
        'BIND(LANG(?l) AS ?lg) } GROUP BY ?lg ORDER BY ?lg',
    ).collect()
    assert [(r["lg"], r["c"]) for r in rows] == [("", 1), ("fr", 1)]


def test_construct_template_bnode_fresh_per_solution(store):
    # §16.2: [] in a CONSTRUCT template is a fresh blank node per
    # solution — distinct across solutions, and NOT a WHERE-bound term
    rows = execute(
        store,
        'CONSTRUCT { ?s <http://ex/via> [] } '
        'WHERE { ?s <http://ex/knows> ?o }',
    ).collect()
    assert len(rows) == 3
    bnodes = [r["o"] for r in rows]
    assert all(b.startswith("_:") for b in bnodes)
    assert len(set(bnodes)) == 3  # one per solution


def test_construct_shared_label_bridges_within_solution(store):
    # a labeled template bnode is ONE node per solution across the
    # template's patterns: via/to pairs must link up
    rows = execute(
        store,
        'CONSTRUCT { ?s <http://ex/via> _:m . _:m <http://ex/to> ?o } '
        'WHERE { ?s <http://ex/knows> ?o }',
    ).collect()
    via = {r["o"]: r["s"] for r in rows if r["p"] == "http://ex/via"}
    to = {r["s"]: r["o"] for r in rows if r["p"] == "http://ex/to"}
    assert set(via) == set(to)  # same bnodes bridge both patterns
    pairs = {(via[b], to[b]) for b in via}
    assert pairs == {(A, B), (A, C), (B, C)}


def test_lang_requires_variable(store):
    with pytest.raises(SparqlSyntaxError):
        execute(
            store,
            'SELECT ?s WHERE { ?s <http://ex/label> ?l . '
            'BIND(LANG(UCASE(?l)) AS ?x) }',
        )
