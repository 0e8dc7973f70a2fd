"""HTTP SPARQL endpoint e2e: protocol forms, result-JSON typing, ASK,
error handling — the reference's Fuseki-service surface
(reference: fuseki-config-hbase.ttl, runHBaseSparqlEngine.sh)."""

import json
import urllib.parse
import urllib.request

import pytest

from hbase_rdf_spark.engine import KgEngine
from hbase_rdf_spark.functions.encoding import build_dictionaries, encode_quads
from hbase_rdf_spark.service import SparqlService
from hbase_rdf_spark.sources.ntriples import parse_lines, quads

NQ = [
    "<http://ex/a> <http://ex/knows> <http://ex/b> .",
    "<http://ex/b> <http://ex/knows> <http://ex/c> .",
    '<http://ex/a> <http://ex/name> "Alice"@en .',
    '<http://ex/a> <http://ex/age> "41"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    # plain literals whose lexical shapes used to fool the sniffing
    # typer: slash, scheme-colon prefix, digits-only
    '<http://ex/a> <http://ex/status> "n/a" .',
    '<http://ex/b> <http://ex/status> "foo:bar" .',
    '<http://ex/a> <http://ex/code> "12345" .',
]


@pytest.fixture(scope="module")
def service(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("svcstore"))
    eng = KgEngine(spark, root, num_partitions=2)
    resolved = quads(parse_lines(
        spark.createDataFrame([(l,) for l in NQ], "value string")
    ))
    t2i, i2t = build_dictionaries(resolved)
    eng.store.write_dictionaries(t2i, i2t, "svc")
    eng.store.write_indexes(encode_quads(resolved), "svc")
    svc = SparqlService(eng, port=0)
    svc.start()
    yield svc
    svc.stop()


def _get(svc, query):
    url = (
        f"http://127.0.0.1:{svc.port}/sparql?query="
        + urllib.parse.quote(query)
    )
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def test_get_select_json(service):
    out = _get(service, "SELECT ?o WHERE { <http://ex/a> <http://ex/knows> ?o }")
    assert out["head"]["vars"] == ["o"]
    assert out["results"]["bindings"] == [
        {"o": {"type": "uri", "value": "http://ex/b"}}
    ]


def test_literal_typing(service):
    out = _get(service, "SELECT ?n WHERE { <http://ex/a> <http://ex/name> ?n }")
    assert out["results"]["bindings"] == [
        {"n": {"type": "literal", "value": "Alice", "xml:lang": "en"}}
    ]
    out = _get(service, "SELECT ?a WHERE { <http://ex/a> <http://ex/age> ?a }")
    (b,) = out["results"]["bindings"]
    assert b["a"]["type"] == "literal" and float(b["a"]["value"]) == 41.0


def test_post_forms(service):
    q = "SELECT ?o WHERE { <http://ex/b> <http://ex/knows> ?o }"
    url = f"http://127.0.0.1:{service.port}/sparql"
    # form-encoded
    req = urllib.request.Request(
        url,
        data=urllib.parse.urlencode({"query": q}).encode(),
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    with urllib.request.urlopen(req) as r:
        got1 = json.load(r)
    # raw sparql-query body
    req = urllib.request.Request(
        url, data=q.encode(),
        headers={"Content-Type": "application/sparql-query"},
    )
    with urllib.request.urlopen(req) as r:
        got2 = json.load(r)
    assert got1 == got2
    assert got1["results"]["bindings"][0]["o"]["value"] == "http://ex/c"


def test_ask(service):
    out = _get(service, "ASK { <http://ex/a> <http://ex/knows> <http://ex/b> }")
    assert out == {"head": {}, "boolean": True}
    out = _get(service, "ASK { <http://ex/a> <http://ex/knows> <http://ex/zzz> }")
    assert out["boolean"] is False


def test_unbound_optional_var_omitted(service):
    out = _get(service, """
        SELECT ?o ?n WHERE {
          <http://ex/b> <http://ex/knows> ?o .
          OPTIONAL { ?o <http://ex/name> ?n }
        }""")
    (b,) = out["results"]["bindings"]
    assert "o" in b and "n" not in b  # unbound var omitted per spec


def test_syntax_error_is_400(service):
    url = (
        f"http://127.0.0.1:{service.port}/sparql?query="
        + urllib.parse.quote("SELECT WHERE {{{")
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(url)
    assert exc.value.code == 400


def test_plain_literal_with_slash_not_uri(service):
    # ADVICE r2: "n/a"-shaped and "scheme:"-shaped PLAIN LITERALS were
    # sniffed as uris; the __k_ sidecar now types them exactly
    q = 'SELECT ?s ?o WHERE { ?s <http://ex/status> ?o }'
    out = _get(service, q)
    bindings = out["results"]["bindings"]
    assert bindings, "fixture triple missing"
    for b in bindings:
        assert b["o"]["type"] == "literal"
        assert b["s"]["type"] == "uri"


def test_digit_literal_not_double(service):
    # a digit-only plain string literal stays an untyped literal
    q = 'SELECT ?o WHERE { ?s <http://ex/code> ?o }'
    out = _get(service, q)
    (b,) = out["results"]["bindings"]
    assert b["o"]["type"] == "literal"
    assert "datatype" not in b["o"] or "double" not in b["o"]["datatype"]


def test_select_var_named_ask_stays_select(service):
    # ADVICE r2: a SELECT projecting ?ask must not become an ASK response
    q = 'SELECT ?ask WHERE { <http://ex/a> <http://ex/knows> ?ask }'
    out = _get(service, q)
    assert "boolean" not in out
    assert out["head"]["vars"] == ["ask"]
    assert out["results"]["bindings"] == [
        {"ask": {"type": "uri", "value": "http://ex/b"}}
    ]


# -- content negotiation (Fuseki-front-end parity: W3C result formats) --


def _get_fmt(svc, query, accept):
    url = (
        f"http://127.0.0.1:{svc.port}/sparql?query="
        + urllib.parse.quote(query)
    )
    req = urllib.request.Request(url, headers={"Accept": accept})
    with urllib.request.urlopen(req) as r:
        return r.read().decode(), r.headers.get("Content-Type")


def test_select_csv(service):
    body, ctype = _get_fmt(
        service,
        "SELECT ?s ?o WHERE { ?s <http://ex/knows> ?o } ORDER BY ?s",
        "text/csv",
    )
    assert ctype.startswith("text/csv")
    lines = body.split("\r\n")
    assert lines[0] == "s,o"
    # CSV plain values: IRIs bare, no quoting needed here
    assert lines[1] == "http://ex/a,http://ex/b"
    assert lines[2] == "http://ex/b,http://ex/c"


def test_select_tsv_term_syntax(service):
    body, ctype = _get_fmt(
        service,
        "SELECT ?n WHERE { <http://ex/a> <http://ex/name> ?n }",
        "text/tab-separated-values",
    )
    assert ctype.startswith("text/tab-separated-values")
    lines = body.rstrip("\n").split("\n")
    assert lines[0] == "?n"
    assert lines[1] == '"Alice"@en'  # TSV keeps N-Triples term syntax


def test_select_xml(service):
    body, ctype = _get_fmt(
        service,
        "SELECT ?o WHERE { <http://ex/a> <http://ex/knows> ?o }",
        "application/sparql-results+xml",
    )
    assert ctype == "application/sparql-results+xml"
    import xml.etree.ElementTree as ET

    root = ET.fromstring(body)
    ns = "{http://www.w3.org/2005/sparql-results#}"
    names = [v.get("name") for v in root.iter(f"{ns}variable")]
    assert names == ["o"]
    uris = [u.text for u in root.iter(f"{ns}uri")]
    assert uris == ["http://ex/b"]


def test_ask_xml(service):
    body, ctype = _get_fmt(
        service,
        "ASK { <http://ex/a> <http://ex/knows> <http://ex/b> }",
        "application/sparql-results+xml",
    )
    assert ctype == "application/sparql-results+xml"
    assert "<boolean>true</boolean>" in body


def test_construct_ntriples(service):
    body, ctype = _get_fmt(
        service,
        "CONSTRUCT { ?s <http://ex/knew> ?o } "
        "WHERE { ?s <http://ex/knows> ?o }",
        "*/*",
    )
    assert ctype == "application/n-triples"
    lines = sorted(l for l in body.split("\n") if l)
    assert lines == [
        "<http://ex/a> <http://ex/knew> <http://ex/b> .",
        "<http://ex/b> <http://ex/knew> <http://ex/c> .",
    ]


def test_describe_ntriples_term_forms(service):
    # DESCRIBE serializes a graph: IRIs bracketed, lang-tagged stored
    # form verbatim, numerics as xsd:double literals, plain literals
    # quoted (even uri-shaped ones like "n/a")
    body, ctype = _get_fmt(service, "DESCRIBE <http://ex/a>", "*/*")
    assert ctype == "application/n-triples"
    lines = set(l for l in body.split("\n") if l)
    assert "<http://ex/a> <http://ex/knows> <http://ex/b> ." in lines
    assert '<http://ex/a> <http://ex/name> "Alice"@en .' in lines
    assert '<http://ex/a> <http://ex/status> "n/a" .' in lines
    age = [l for l in lines if "<http://ex/age>" in l]
    assert len(age) == 1 and '^^<http://www.w3.org/2001/XMLSchema#double>' in age[0]


def test_json_beats_xml_when_both_accepted(service):
    body, ctype = _get_fmt(
        service,
        "SELECT ?o WHERE { <http://ex/a> <http://ex/knows> ?o }",
        "application/sparql-results+json, application/xml;q=0.5",
    )
    assert ctype == "application/sparql-results+json"
    assert json.loads(body)["head"]["vars"] == ["o"]
