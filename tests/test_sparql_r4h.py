"""Round-4 GROUP BY expression keys (SPARQL 1.1 grammar [19]
GroupCondition: Var | '(' Expression ('AS' Var)? ')' | BuiltInCall).

The reference inherits full GroupCondition parsing from Sesame/ARQ
(SURVEY SE2 — sail/HBaseQueryVisitor.java re-evaluates the parsed
group expressions in memory); here each expression key desugars to a
per-solution Extend (a hidden BIND) and the groupBy runs on its
output — §18.5.1's Group(exprlist, Ω) evaluated distributed.
"""

import pytest

from hbase_rdf_spark.functions.encoding import build_dictionaries, encode_quads
from hbase_rdf_spark.operators.materialize import TripleStore
from hbase_rdf_spark.plans.sparql import SparqlSyntaxError, execute
from hbase_rdf_spark.sources.ntriples import parse_lines, quads

XSD_I = "http://www.w3.org/2001/XMLSchema#integer"

NQ = [
    f'<http://ex/i1> <http://ex/price> "12"^^<{XSD_I}> .',
    f'<http://ex/i2> <http://ex/price> "17"^^<{XSD_I}> .',
    f'<http://ex/i3> <http://ex/price> "23"^^<{XSD_I}> .',
    f'<http://ex/i4> <http://ex/price> "29"^^<{XSD_I}> .',
    f'<http://ex/i5> <http://ex/price> "5"^^<{XSD_I}> .',
    '<http://ex/i1> <http://ex/name> "alpha" .',
    '<http://ex/i2> <http://ex/name> "Beta" .',
    '<http://ex/i3> <http://ex/name> "beta" .',
    '<http://ex/i4> <http://ex/name> "Gamma" .',
]


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gkstore"))
    lines = spark.createDataFrame([(l,) for l in NQ], "value string")
    resolved = quads(parse_lines(lines))
    st = TripleStore(spark, root, num_partitions=2)
    t2i, i2t = build_dictionaries(resolved)
    st.write_dictionaries(t2i, i2t, "nq")
    st.write_indexes(encode_quads(resolved), "nq")
    return st


def rows(df):
    return {tuple(r) for r in df.collect()}


def test_group_by_aliased_expression_key(store):
    # decade bucket of the price: (FLOOR(?p / 10) AS ?b), projected
    q = """
    SELECT ?b (SUM(?p) AS ?t) WHERE { ?s <http://ex/price> ?p }
    GROUP BY (FLOOR(?p / 10) AS ?b)
    """
    got = {(float(b), float(t)) for b, t in rows(execute(store, q))}
    assert got == {(0.0, 5.0), (1.0, 29.0), (2.0, 52.0)}


def test_group_by_bare_parenthesized_expression(store):
    # hidden key: groups collapse by bucket but only the aggregate
    # projects
    q = """
    SELECT (COUNT(?p) AS ?n) WHERE { ?s <http://ex/price> ?p }
    GROUP BY (FLOOR(?p / 10))
    """
    got = sorted(int(r[0]) for r in execute(store, q).collect())
    assert got == [1, 2, 2]


def test_group_by_builtin_call_key(store):
    # bare BuiltInCall form (no surrounding parens): LCASE(?n)
    q = """
    SELECT (COUNT(?s) AS ?c) WHERE { ?s <http://ex/name> ?n }
    GROUP BY LCASE(?n)
    """
    got = sorted(int(r[0]) for r in execute(store, q).collect())
    assert got == [1, 1, 2]


def test_group_by_string_expression_key_projected(store):
    q = """
    SELECT ?l (COUNT(?s) AS ?c) WHERE { ?s <http://ex/name> ?n }
    GROUP BY (LCASE(?n) AS ?l)
    """
    got = {(l, int(c)) for l, c in rows(execute(store, q))}
    assert got == {("alpha", 1), ("beta", 2), ("gamma", 1)}


def test_group_by_expression_key_mixed_with_var(store):
    # expression key alongside a plain var key
    q = """
    SELECT ?s ?b (COUNT(?p) AS ?n) WHERE { ?s <http://ex/price> ?p }
    GROUP BY ?s (FLOOR(?p / 10) AS ?b)
    """
    out = rows(execute(store, q))
    assert len(out) == 5 and all(int(n) == 1 for _, _, n in out)


def test_group_by_expression_key_with_having(store):
    q = """
    SELECT ?b (COUNT(?p) AS ?n) WHERE { ?s <http://ex/price> ?p }
    GROUP BY (FLOOR(?p / 10) AS ?b) HAVING (COUNT(?p) > 1)
    """
    got = {(float(b), int(n)) for b, n in rows(execute(store, q))}
    assert got == {(1.0, 2), (2.0, 2)}


def test_group_by_without_aggregates_collapses(store):
    # aggregate-free GROUP BY is Group+Project: one row per key
    q = """
    SELECT ?l WHERE { ?s <http://ex/name> ?n }
    GROUP BY (LCASE(?n) AS ?l)
    """
    assert rows(execute(store, q)) == {("alpha",), ("beta",), ("gamma",)}


def test_group_by_expression_in_subquery(store):
    # expression key inside a nested { SELECT … } — joined by bucket
    q = """
    SELECT ?b ?t WHERE {
      { SELECT ?b (SUM(?p) AS ?t) WHERE { ?s <http://ex/price> ?p }
        GROUP BY (FLOOR(?p / 10) AS ?b) }
    }
    """
    got = {(float(b), float(t)) for b, t in rows(execute(store, q))}
    assert got == {(0.0, 5.0), (1.0, 29.0), (2.0, 52.0)}


def test_group_by_alias_must_be_var(store):
    with pytest.raises(SparqlSyntaxError):
        execute(store, """
        SELECT (COUNT(?p) AS ?n) WHERE { ?s <http://ex/price> ?p }
        GROUP BY (FLOOR(?p / 10) AS x)
        """)


def test_group_by_empty_rejected(store):
    with pytest.raises(SparqlSyntaxError):
        execute(store, """
        SELECT (COUNT(?p) AS ?n) WHERE { ?s <http://ex/price> ?p }
        GROUP BY HAVING (COUNT(?p) > 0)
        """)


# -- BNODE() value function (§17.4.2.9) ------------------------------------


def test_bnode_noarg_fresh_per_solution_and_call(store):
    q = """
    SELECT ?s ?x ?y WHERE {
      ?s <http://ex/price> ?p .
      BIND(BNODE() AS ?x) BIND(BNODE() AS ?y)
    }
    """
    out = execute(store, q).collect()
    assert len(out) == 5
    xs = [r["x"] for r in out]
    ys = [r["y"] for r in out]
    # every minted node is a blank-node label
    assert all(v.startswith("_:") for v in xs + ys)
    # fresh per solution …
    assert len(set(xs)) == 5 and len(set(ys)) == 5
    # … and distinct across call sites within one solution
    assert all(x != y for x, y in zip(xs, ys))


def test_bnode_arg_unifies_within_solution(store):
    q = """
    SELECT ?s ?x ?y ?z WHERE {
      ?s <http://ex/price> ?p .
      BIND(BNODE("k") AS ?x) BIND(BNODE("k") AS ?y)
      BIND(BNODE("other") AS ?z)
    }
    """
    out = execute(store, q).collect()
    assert len(out) == 5
    for r in out:
        assert r["x"] == r["y"]          # same literal, same solution
        assert r["x"] != r["z"]          # different literal
    assert len({r["x"] for r in out}) == 5   # distinct across solutions


def test_bnode_is_blank_for_isblank(store):
    q = """
    SELECT ?s WHERE {
      ?s <http://ex/price> ?p .
      BIND(BNODE() AS ?b) FILTER(isBlank(?b))
    }
    """
    assert len(execute(store, q).collect()) == 5


# -- BASE + relative IRI resolution (grammar [4]/[5]) -----------------------


def test_base_resolves_relative_iris(store):
    q = """
    BASE <http://ex/>
    SELECT ?p WHERE { <i1> <price> ?p }
    """
    assert {float(r[0]) for r in execute(store, q).collect()} == {12.0}


def test_base_nested_and_prefix_resolution(store):
    # a later BASE resolves against the earlier one; prefix IRIs
    # resolve against the BASE in effect
    q = """
    BASE <http://ex/deep/>
    BASE <../>
    PREFIX x: <i>
    SELECT ?p WHERE { x:1 <price> ?p }
    """
    assert {float(r[0]) for r in execute(store, q).collect()} == {12.0}


def test_absolute_iris_ignore_base(store):
    q = """
    BASE <http://other/>
    SELECT ?p WHERE { <http://ex/i1> <http://ex/price> ?p }
    """
    assert {float(r[0]) for r in execute(store, q).collect()} == {12.0}


# -- ARQ counted path quantifiers {n} {n,} {n,m} ----------------------------


CHAIN_NQ = [
    '<http://ex/a> <http://ex/knows> <http://ex/b> .',
    '<http://ex/b> <http://ex/knows> <http://ex/c> .',
    '<http://ex/c> <http://ex/knows> <http://ex/d> .',
    '<http://ex/d> <http://ex/knows> <http://ex/e> .',
]


@pytest.fixture(scope="module")
def chain_store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("chainstore"))
    lines = spark.createDataFrame([(l,) for l in CHAIN_NQ], "value string")
    resolved = quads(parse_lines(lines))
    st = TripleStore(spark, root, num_partitions=2)
    t2i, i2t = build_dictionaries(resolved)
    st.write_dictionaries(t2i, i2t, "nq")
    st.write_indexes(encode_quads(resolved), "nq")
    return st


def _reach(chain_store, q):
    return {tuple(r) for r in execute(chain_store, q).collect()}


def test_path_exact_count(chain_store):
    got = _reach(chain_store, """
        SELECT ?y WHERE { <http://ex/a> <http://ex/knows>{2} ?y }""")
    assert got == {("http://ex/c",)}


def test_path_range_count(chain_store):
    got = _reach(chain_store, """
        SELECT ?y WHERE { <http://ex/a> <http://ex/knows>{2,3} ?y }""")
    assert got == {("http://ex/c",), ("http://ex/d",)}


def test_path_count_zero_includes_self(chain_store):
    got = _reach(chain_store, """
        SELECT ?y WHERE { <http://ex/a> <http://ex/knows>{0,1} ?y }""")
    assert got == {("http://ex/a",), ("http://ex/b",)}


def test_path_at_least_count(chain_store):
    got = _reach(chain_store, """
        SELECT ?y WHERE { <http://ex/a> <http://ex/knows>{3,} ?y }""")
    assert got == {("http://ex/d",), ("http://ex/e",)}


def test_path_count_on_sequence_primary(chain_store):
    # parenthesized path under a counted quantifier: (knows/knows){2}
    got = _reach(chain_store, """
        SELECT ?y WHERE {
          <http://ex/a> (<http://ex/knows>/<http://ex/knows>){2} ?y }""")
    assert got == {("http://ex/e",)}


def test_path_count_bad_range_rejected(chain_store):
    with pytest.raises(SparqlSyntaxError):
        execute(chain_store, """
            SELECT ?y WHERE { <http://ex/a> <http://ex/knows>{3,2} ?y }""")


# -- RDF collections ( e1 e2 … ) in patterns (grammar [102]) ----------------


RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

LIST_NQ = [
    '<http://ex/l> <http://ex/has> _:c1 .',
    f'_:c1 <{RDF_NS}first> "1"^^<{XSD_I}> .',
    f'_:c1 <{RDF_NS}rest> _:c2 .',
    f'_:c2 <{RDF_NS}first> "2"^^<{XSD_I}> .',
    f'_:c2 <{RDF_NS}rest> <{RDF_NS}nil> .',
    f'<http://ex/e> <http://ex/has> <{RDF_NS}nil> .',
]


@pytest.fixture(scope="module")
def list_store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("liststore"))
    lines = spark.createDataFrame([(l,) for l in LIST_NQ], "value string")
    resolved = quads(parse_lines(lines))
    st = TripleStore(spark, root, num_partitions=2)
    t2i, i2t = build_dictionaries(resolved)
    st.write_dictionaries(t2i, i2t, "nq")
    st.write_indexes(encode_quads(resolved), "nq")
    return st


def test_collection_object_matches_list(list_store):
    q = """
    SELECT ?a ?b WHERE { <http://ex/l> <http://ex/has> ( ?a ?b ) }
    """
    got = {(float(a), float(b)) for a, b in execute(list_store, q).collect()}
    assert got == {(1.0, 2.0)}


def test_empty_collection_is_rdf_nil(list_store):
    q = "ASK { <http://ex/e> <http://ex/has> () }"
    assert execute(list_store, q).collect()[0][0] is True


def test_collection_wrong_arity_no_match(list_store):
    # a 3-element pattern cannot match the 2-element list (rest of the
    # 2nd cell is rdf:nil, not another cons cell)
    q = """
    SELECT ?a ?b ?c WHERE { <http://ex/l> <http://ex/has> ( ?a ?b ?c ) }
    """
    assert execute(list_store, q).collect() == []


# -- DESCRIBE multiple targets / '*' (grammar [11]) -------------------------


def test_describe_multiple_constants(list_store):
    q = "DESCRIBE <http://ex/l> <http://ex/e>"
    got = {tuple(r)[:2] for r in execute(list_store, q).collect()}
    assert got == {("http://ex/l", "http://ex/has"),
                   ("http://ex/e", "http://ex/has")}


def test_describe_star(chain_store):
    # '*' describes every variable the WHERE group binds
    q = """
    DESCRIBE * WHERE { <http://ex/a> <http://ex/knows> ?y }
    """
    got = {tuple(r) for r in execute(chain_store, q).collect()}
    # ?y = b; describe(b) = its outgoing triple
    assert got == {("http://ex/b", "http://ex/knows", "http://ex/c")}


def test_describe_var_and_constant_mix(chain_store):
    q = """
    DESCRIBE ?y <http://ex/d> WHERE { <http://ex/a> <http://ex/knows> ?y }
    """
    got = {tuple(r) for r in execute(chain_store, q).collect()}
    assert got == {("http://ex/b", "http://ex/knows", "http://ex/c"),
                   ("http://ex/d", "http://ex/knows", "http://ex/e")}


# -- chronological dateTime FILTER comparisons ------------------------------


XSD_DT = "http://www.w3.org/2001/XMLSchema#dateTime"
XSD_D = "http://www.w3.org/2001/XMLSchema#date"

DT_NQ = [
    f'<http://ex/a> <http://ex/at> "2024-03-05T10:11:12Z"^^<{XSD_DT}> .',
    f'<http://ex/b> <http://ex/at> "2023-12-31T23:59:59Z"^^<{XSD_DT}> .',
    f'<http://ex/c> <http://ex/at> "2024-07-01T00:00:00Z"^^<{XSD_DT}> .',
    # chronologically equal to a's instant, different lexical/timezone
    f'<http://ex/d> <http://ex/at> "2024-03-05T12:11:12+02:00"^^<{XSD_DT}> .',
    f'<http://ex/e> <http://ex/born> "1999-01-15"^^<{XSD_D}> .',
    '<http://ex/f> <http://ex/at> "not a date" .',
]


@pytest.fixture(scope="module")
def dt_store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dtcmpstore"))
    lines = spark.createDataFrame([(l,) for l in DT_NQ], "value string")
    resolved = quads(parse_lines(lines))
    st = TripleStore(spark, root, num_partitions=2)
    t2i, i2t = build_dictionaries(resolved)
    st.write_dictionaries(t2i, i2t, "nq")
    st.write_indexes(encode_quads(resolved), "nq")
    return st


def test_datetime_gt_constant(dt_store):
    got = {r[0] for r in execute(dt_store, f"""
        SELECT ?s WHERE {{ ?s <http://ex/at> ?t .
          FILTER(?t > "2024-01-01T00:00:00Z"^^<{XSD_DT}>) }}""").collect()}
    assert got == {"http://ex/a", "http://ex/c", "http://ex/d"}


def test_datetime_value_equality_across_timezones(dt_store):
    # a (…10:11:12Z) and d (…12:11:12+02:00) are the same instant
    got = {r[0] for r in execute(dt_store, f"""
        SELECT ?s WHERE {{ ?s <http://ex/at> ?t .
          FILTER(?t = "2024-03-05T10:11:12Z"^^<{XSD_DT}>) }}""").collect()}
    assert got == {"http://ex/a", "http://ex/d"}


def test_datetime_le_drops_non_datetime(dt_store):
    # f's plain-string object is a type error -> row dropped
    got = {r[0] for r in execute(dt_store, f"""
        SELECT ?s WHERE {{ ?s <http://ex/at> ?t .
          FILTER(?t <= "2024-01-01T00:00:00Z"^^<{XSD_DT}>) }}""").collect()}
    assert got == {"http://ex/b"}


def test_date_comparison(dt_store):
    got = {r[0] for r in execute(dt_store, f"""
        SELECT ?s WHERE {{ ?s <http://ex/born> ?d .
          FILTER(?d < "2000-01-01"^^<{XSD_D}>) }}""").collect()}
    assert got == {"http://ex/e"}
