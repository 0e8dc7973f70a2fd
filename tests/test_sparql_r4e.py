"""Round-4 builtin widening: hash functions (MD5/SHA1/SHA256/SHA384/
SHA512), ENCODE_FOR_URI, the term constructors IRI/URI, STRDT and
STRLANG, and the sameTerm filter.

The reference inherits all of these from stock ARQ/Sesame expression
evaluation (sail/HBaseQueryVisitor.java routes FILTER/BIND expressions
to the underlying engine's function library); here they compile to
JVM-side column expressions (F.md5/F.sha1/F.sha2/F.url_encode) — no
Python UDFs.  Term constructors exploit content-addressed term ids
(xxhash64(kind, lexical)): a constructed IRI/literal carries exactly
the dictionary id the store would have assigned, so constructed terms
join scans with plain struct equality.
"""

import hashlib
import urllib.parse

import pytest

from hbase_rdf_spark.functions.encoding import build_dictionaries, encode_quads
from hbase_rdf_spark.operators.materialize import TripleStore
from hbase_rdf_spark.plans.sparql import SparqlSyntaxError, execute
from hbase_rdf_spark.sources.ntriples import parse_lines, quads

NQ = [
    '<http://ex/a> <http://ex/name> "Alice" .',
    '<http://ex/b> <http://ex/name> "Bob Marley" .',
    '<http://ex/a> <http://ex/score> "7"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    '<http://ex/b> <http://ex/score> "8"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    '<http://ex/x> <http://ex/val> "8"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    '<http://ex/a> <http://ex/label> "chat"@fr .',
    '<http://ex/b> <http://ex/area> "12.5"^^<http://ex/squareKilometre> .',
]


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sparqlr4estore"))
    lines = spark.createDataFrame([(l,) for l in NQ], "value string")
    resolved = quads(parse_lines(lines))
    st = TripleStore(spark, root, num_partitions=2)
    t2i, i2t = build_dictionaries(resolved)
    st.write_dictionaries(t2i, i2t, "nq")
    st.write_indexes(encode_quads(resolved), "nq")
    return st


def _one(store, query, col):
    rows = execute(store, query).collect()
    assert len(rows) == 1
    return rows[0][col]


def test_hash_functions_match_hashlib(store):
    for fn, ref in [
        ("MD5", hashlib.md5), ("SHA1", hashlib.sha1),
        ("SHA256", hashlib.sha256), ("SHA384", hashlib.sha384),
        ("SHA512", hashlib.sha512),
    ]:
        got = _one(
            store,
            f"""SELECT ?h WHERE {{
                 <http://ex/a> <http://ex/name> ?nm .
                 BIND({fn}(?nm) AS ?h)
               }}""",
            "h",
        )
        assert got == ref(b"Alice").hexdigest()


def test_hash_of_composed_string(store):
    got = _one(
        store,
        """SELECT ?h WHERE {
             <http://ex/a> <http://ex/name> ?nm .
             BIND(SHA256(CONCAT("salt:", LCASE(?nm))) AS ?h)
           }""",
        "h",
    )
    assert got == hashlib.sha256(b"salt:alice").hexdigest()


def test_encode_for_uri_rfc3986(store):
    # space -> %20 (not '+'), '~' stays, '*' -> %2A, non-ASCII -> UTF-8
    # percent escapes: the urllib reference implements RFC 3986 §2.3
    got = _one(
        store,
        """SELECT ?u WHERE {
             <http://ex/b> <http://ex/name> ?nm .
             BIND(ENCODE_FOR_URI(CONCAT(?nm, " ~*/é")) AS ?u)
           }""",
        "u",
    )
    assert got == urllib.parse.quote("Bob Marley ~*/é", safe="~")


def test_iri_constructor_joins_a_scan(store):
    # IRI(CONCAT(...)) builds the content-addressed id of the stored
    # subject, so the constructed term seeds a pattern join
    out = execute(
        store,
        """SELECT ?nm WHERE {
             <http://ex/a> <http://ex/name> ?nm0 .
             BIND(IRI(CONCAT("http://ex/", LCASE("A"))) AS ?s2)
             ?s2 <http://ex/name> ?nm .
           }""",
    )
    assert [r["nm"] for r in out.collect()] == ["Alice"]


def test_uri_alias_and_str_roundtrip(store):
    got = _one(
        store,
        """SELECT ?s WHERE {
             <http://ex/a> <http://ex/name> ?nm .
             BIND(STR(URI(CONCAT("http://ex/", ?nm))) AS ?s)
           }""",
        "s",
    )
    assert got == "http://ex/Alice"


def test_strlang_equals_stored_tagged_literal(store):
    out = execute(
        store,
        """SELECT ?s WHERE {
             ?s <http://ex/label> ?l .
             BIND(STRLANG("chat", "fr") AS ?l2)
             FILTER(?l = ?l2)
           }""",
    )
    assert [r["s"] for r in out.collect()] == ["http://ex/a"]


def test_strlang_different_tag_differs(store):
    out = execute(
        store,
        """SELECT ?s WHERE {
             ?s <http://ex/label> ?l .
             BIND(STRLANG("chat", "en") AS ?l2)
             FILTER(?l = ?l2)
           }""",
    )
    assert out.collect() == []


def test_strdt_numeric_datatype_builds_kind2(store):
    # STRDT(str, xsd:integer) is a NUMBER: it value-joins the stored 8
    out = execute(
        store,
        """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
           SELECT ?s ?x WHERE {
             ?s <http://ex/score> ?n .
             BIND(STRDT("8", xsd:integer) AS ?m)
             FILTER(?n = ?m)
             ?x <http://ex/val> ?n .
           }""",
    )
    assert sorted((r["s"], r["x"]) for r in out.collect()) == [
        ("http://ex/b", "http://ex/x"),
    ]


def test_strdt_custom_datatype_matches_store(store):
    out = execute(
        store,
        """SELECT ?s WHERE {
             ?s <http://ex/area> ?a .
             BIND(STRDT("12.5", <http://ex/squareKilometre>) AS ?a2)
             FILTER(?a = ?a2)
           }""",
    )
    assert [r["s"] for r in out.collect()] == ["http://ex/b"]


def test_strdt_numeric_bad_lexical_is_unbound(store):
    # a non-numeric lexical form under a numeric datatype is a type
    # error -> ?m unbound -> FILTER(?n = ?m) drops every row
    out = execute(
        store,
        """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
           SELECT ?s WHERE {
             ?s <http://ex/score> ?n .
             BIND(STRDT("oops", xsd:integer) AS ?m)
             FILTER(?n = ?m)
           }""",
    )
    assert out.collect() == []


def test_sameterm_var_var(store):
    out = execute(
        store,
        """SELECT ?s WHERE {
             ?s <http://ex/score> ?n .
             <http://ex/x> <http://ex/val> ?v .
             FILTER sameTerm(?n, ?v)
           }""",
    )
    assert [r["s"] for r in out.collect()] == ["http://ex/b"]


def test_sameterm_var_const_and_negation(store):
    out = execute(
        store,
        """SELECT ?s ?nm WHERE {
             ?s <http://ex/name> ?nm .
             FILTER (!sameTerm(?s, <http://ex/a>))
           }""",
    )
    assert [(r["s"], r["nm"]) for r in out.collect()] == [
        ("http://ex/b", "Bob Marley")
    ]


def test_sameterm_numeric_const(store):
    out = execute(
        store,
        """SELECT ?s WHERE {
             ?s <http://ex/score> ?n .
             FILTER sameTerm(?n, 7)
           }""",
    )
    assert [r["s"] for r in out.collect()] == ["http://ex/a"]


def test_hash_in_select_expression(store):
    out = execute(
        store,
        """SELECT ?s (MD5(?nm) AS ?h) WHERE {
             ?s <http://ex/name> ?nm .
           } ORDER BY ?s""",
    )
    rows = out.collect()
    assert [r["h"] for r in rows] == [
        hashlib.md5(b"Alice").hexdigest(),
        hashlib.md5(b"Bob Marley").hexdigest(),
    ]


def test_strdt_variable_datatype_raises(store):
    with pytest.raises(SparqlSyntaxError):
        execute(
            store,
            """SELECT ?s WHERE {
                 ?s <http://ex/name> ?nm .
                 BIND(STRDT(?nm, ?dt) AS ?x)
               }""",
        )
