"""Round-4 datetime builtins: YEAR/MONTH/DAY/HOURS/MINUTES/SECONDS/TZ
(SPARQL 1.1 §17.4.5) over xsd:dateTime / xsd:date literals.

The reference inherits these from stock ARQ's XSDFuncOp datetime
accessors (SURVEY J12 — sail/HBaseQueryVisitor.java filter re-eval
path). Here the lexical form stored for non-numeric typed literals
('"2024-03-05T10:11:12Z"^^<…dateTime>') is component-extracted with
JVM regexes (plans/filters.py DT_PART_RX) — no timestamp parsing, no
timezone normalization, so values round-trip exactly and a
non-dateTime operand is a type error (NULL → unbound / row dropped).
"""

import pytest

from hbase_rdf_spark.functions.encoding import build_dictionaries, encode_quads
from hbase_rdf_spark.operators.materialize import TripleStore
from hbase_rdf_spark.plans.sparql import SparqlSyntaxError, execute
from hbase_rdf_spark.sources.ntriples import parse_lines, quads

XSD_DT = "http://www.w3.org/2001/XMLSchema#dateTime"
XSD_D = "http://www.w3.org/2001/XMLSchema#date"

NQ = [
    f'<http://ex/a> <http://ex/at> "2024-03-05T10:11:12Z"^^<{XSD_DT}> .',
    f'<http://ex/b> <http://ex/at> "2023-12-31T23:59:59.25+05:30"^^<{XSD_DT}> .',
    f'<http://ex/c> <http://ex/at> "2024-07-01T00:00:00"^^<{XSD_DT}> .',
    f'<http://ex/d> <http://ex/born> "1999-01-15"^^<{XSD_D}> .',
    '<http://ex/e> <http://ex/at> "not a date" .',
    '<http://ex/a> <http://ex/name> "Ann" .',
]

A, B, C, D = (f"http://ex/{x}" for x in "abcd")


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dtstore"))
    lines = spark.createDataFrame([(l,) for l in NQ], "value string")
    resolved = quads(parse_lines(lines))
    st = TripleStore(spark, root, num_partitions=2)
    t2i, i2t = build_dictionaries(resolved)
    st.write_dictionaries(t2i, i2t, "nq")
    st.write_indexes(encode_quads(resolved), "nq")
    return st


def rows(store, q):
    return {tuple(r) for r in execute(store, q).collect()}


def test_bind_year_month_day(store):
    got = rows(store, """
        SELECT ?s ?y ?m ?d WHERE {
          ?s <http://ex/at> ?t .
          BIND(YEAR(?t) AS ?y) BIND(MONTH(?t) AS ?m) BIND(DAY(?t) AS ?d)
        }""")
    # computed numerics render through the engine's lexical
    # materializer (plans/bgp.py materialize) as double strings
    assert (A, "2024.0", "3.0", "5.0") in got
    assert (B, "2023.0", "12.0", "31.0") in got
    # the non-dateTime literal yields unbound accessors (type error)
    assert ("http://ex/e", None, None, None) in got


def test_bind_time_components_and_fraction(store):
    got = rows(store, """
        SELECT ?s ?h ?mi ?sec WHERE {
          ?s <http://ex/at> ?t .
          BIND(HOURS(?t) AS ?h) BIND(MINUTES(?t) AS ?mi)
          BIND(SECONDS(?t) AS ?sec)
        }""")
    assert (A, "10.0", "11.0", "12.0") in got
    b = next(r for r in got if r[0] == B)
    assert b[1:] == ("23.0", "59.0", "59.25")


def test_date_literal_has_date_parts_only(store):
    got = rows(store, """
        SELECT ?y ?h WHERE {
          <http://ex/d> <http://ex/born> ?t .
          BIND(YEAR(?t) AS ?y) BIND(HOURS(?t) AS ?h)
        }""")
    assert got == {("1999.0", None)}


def test_tz_bind_and_filter(store):
    got = rows(store, """
        SELECT ?s ?z WHERE {
          ?s <http://ex/at> ?t . BIND(TZ(?t) AS ?z)
        }""")
    assert (A, "Z") in got and (B, "+05:30") in got and (C, "") in got
    # TZ of a non-dateTime is an error → unbound
    assert ("http://ex/e", None) in got
    z = rows(store, """
        SELECT ?s WHERE {
          ?s <http://ex/at> ?t . FILTER(TZ(?t) = "Z")
        }""")
    assert z == {(A,)}


def test_filter_year_comparison_and_boolean_combo(store):
    got = rows(store, """
        SELECT ?s WHERE {
          ?s <http://ex/at> ?t . FILTER(YEAR(?t) = 2024)
        }""")
    assert got == {(A,), (C,)}
    got = rows(store, """
        SELECT ?s WHERE {
          ?s <http://ex/at> ?t .
          FILTER(YEAR(?t) = 2024 && MONTH(?t) < 6)
        }""")
    assert got == {(A,)}


def test_order_by_datetime_expression(store):
    got = [r["s"] for r in execute(store, """
        SELECT ?s WHERE { ?s <http://ex/at> ?t . FILTER(YEAR(?t) > 0) }
        ORDER BY MONTH(?t) ?s
    """).collect()]
    assert got == [A, C, B]


def test_if_condition_with_datetime(store):
    got = rows(store, """
        SELECT ?s ?half WHERE {
          ?s <http://ex/at> ?t .
          BIND(IF(MONTH(?t) <= 6, "H1", "H2") AS ?half)
        }""")
    assert (A, "H1") in got and (C, "H2") in got and (B, "H2") in got


def test_timezone_duration_literal(store):
    # §17.4.5.7: TIMEZONE() is an xsd:dayTimeDuration TYPED literal
    # ('PT0S' for Z); absent timezone is an ERROR (unlike TZ()'s ''),
    # as is a non-dateTime operand
    dt = "http://www.w3.org/2001/XMLSchema#dayTimeDuration"
    got = rows(store, """
        SELECT ?s ?z WHERE {
          ?s <http://ex/at> ?t . BIND(TIMEZONE(?t) AS ?z)
        }""")
    assert (A, f'"PT0S"^^<{dt}>') in got
    assert (B, f'"PT5H30M"^^<{dt}>') in got
    assert (C, None) in got
    assert ("http://ex/e", None) in got


def test_str_of_timezone_is_plain_duration(store):
    got = rows(store, """
        SELECT ?s ?zs WHERE {
          ?s <http://ex/at> ?t . BIND(STR(TIMEZONE(?t)) AS ?zs)
        }""")
    assert (A, "PT0S") in got and (B, "PT5H30M") in got


def test_now_uuid_struuid_rand(store):
    # §17.4.1.4/§17.4.4: NOW() one instant per query (xsd:dateTime
    # typed literal, every row identical), UUID() fresh urn:uuid IRIs,
    # STRUUID() fresh plain strings, RAND() xsd:double in [0,1)
    import re

    out = execute(store, """
        SELECT ?s ?t ?u ?su ?r WHERE {
          ?s <http://ex/at> ?x .
          BIND(NOW() AS ?t) BIND(UUID() AS ?u)
          BIND(STRUUID() AS ?su) BIND(RAND() AS ?r)
        }""").collect()
    assert len(out) == 4
    ts = {r["t"] for r in out}
    assert len(ts) == 1
    assert re.match(
        r'^"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d+Z"'
        r"\^\^<http://www\.w3\.org/2001/XMLSchema#dateTime>$",
        next(iter(ts)),
    )
    assert all(r["u"].startswith("urn:uuid:") for r in out)
    assert len({r["u"] for r in out}) == 4
    assert len({r["su"] for r in out}) == 4
    assert all(0.0 <= float(r["r"]) < 1.0 for r in out)


def test_year_of_now_filters(store):
    # the datetime accessors compose with NOW()'s vlex sidecar
    got = rows(store, """
        SELECT ?s WHERE {
          ?s <http://ex/at> ?t2 . BIND(NOW() AS ?t)
          FILTER(YEAR(?t) >= 2026)
        }""")
    assert len(got) == 4


def test_channel_incompatible_comparison_is_error(store):
    # round 5 (ADVICE r4): a numeric-vs-string comparison is a runtime
    # TYPE error (→ false, zero rows), not a syntax error — ARQ
    # evaluates YEAR(?t) = "x" to ExprEvalException per row
    got = rows(store, 'SELECT ?s WHERE { ?s ?p ?t . FILTER(YEAR(?t) = "x") }')
    assert got == set()


XSD_PFX = "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"


@pytest.fixture(scope="module")
def cast_store(spark, tmp_path_factory):
    xsd = "http://www.w3.org/2001/XMLSchema#"
    nq = [
        '<http://ex/a> <http://ex/v> "42" .',
        '<http://ex/b> <http://ex/v> "3.7" .',
        f'<http://ex/c> <http://ex/v> "-5"^^<{xsd}integer> .',
        '<http://ex/d> <http://ex/v> "oops" .',
        f'<http://ex/e> <http://ex/v> "2.9"^^<{xsd}double> .',
        '<http://ex/f> <http://ex/v> "true" .',
    ]
    root = str(tmp_path_factory.mktemp("caststore"))
    lines = spark.createDataFrame([(l,) for l in nq], "value string")
    resolved = quads(parse_lines(lines))
    st = TripleStore(spark, root, num_partitions=2)
    t2i, i2t = build_dictionaries(resolved)
    st.write_dictionaries(t2i, i2t, "nq")
    st.write_indexes(encode_quads(resolved), "nq")
    return st


def test_xsd_casts_xpath_semantics(cast_store):
    # §17.5 constructor casts: integer truncates numerics toward zero
    # and ERRORS on non-integer lexicals; double parses lexicals;
    # boolean accepts true/false/1/0 lexicals and num != 0; constrained
    # derived types enforce ranges (reference TypedIdTestNumericals)
    got = rows(cast_store, XSD_PFX + """
        SELECT ?s ?i ?d ?b ?p WHERE {
          ?s <http://ex/v> ?x .
          BIND(xsd:integer(?x) AS ?i) BIND(xsd:double(?x) AS ?d)
          BIND(xsd:boolean(?x) AS ?b)
          BIND(xsd:positiveInteger(?x) AS ?p)
        }""")
    assert ("http://ex/a", "42.0", "42.0", None, "42.0") in got
    assert ("http://ex/b", None, "3.7", None, None) in got
    assert ("http://ex/c", "-5.0", "-5.0", "1.0", None) in got
    assert ("http://ex/d", None, None, None, None) in got
    assert ("http://ex/e", "2.0", "2.9", "1.0", "2.0") in got
    assert ("http://ex/f", None, None, "1.0", None) in got


def test_cast_composes_with_arithmetic_and_filter(cast_store):
    got = rows(cast_store, XSD_PFX + """
        SELECT ?s WHERE {
          ?s <http://ex/v> ?x .
          BIND(xsd:integer(?x) * 2 AS ?y) FILTER(?y >= 84)
        }""")
    assert got == {("http://ex/a",)}


def test_xsd_string_and_datetime_casts(cast_store):
    got = rows(cast_store, XSD_PFX + """
        SELECT ?s ?str WHERE {
          ?s <http://ex/v> ?x . BIND(xsd:string(?x) AS ?str)
        }""")
    assert ("http://ex/a", "42") in got and ("http://ex/d", "oops") in got
    dt = "http://www.w3.org/2001/XMLSchema#dateTime"
    got = rows(cast_store, XSD_PFX + """
        SELECT ?t WHERE {
          <http://ex/a> <http://ex/v> ?x .
          BIND(xsd:dateTime("2024-03-05T10:11:12Z") AS ?t)
        }""")
    assert got == {(f'"2024-03-05T10:11:12Z"^^<{dt}>',)}


def test_unknown_function_iri_rejected(cast_store):
    with pytest.raises(SparqlSyntaxError):
        execute(cast_store, XSD_PFX + """
            SELECT ?s WHERE {
              ?s <http://ex/v> ?x . BIND(xsd:gYear(?x) AS ?y)
            }""")
