"""SPARQL 1.1 Federated Query e2e: ``SERVICE [SILENT] <ep> { … }``
against a live in-process SPARQL-protocol endpoint.

The reference gets SERVICE for free from ARQ running inside Fuseki
(fuseki-config-hbase.ttl + runHBaseSparqlEngine.sh launch the engine
behind Fuseki's ARQ front-end, which federates transparently); here the
engine's own evaluator ships the verbatim inner group to the endpoint
and compatibility-joins the returned solution sequence like a VALUES
table (plans/sparql.py ServiceBlock / _service_values_block,
service.py fetch_bindings).

The "remote" side is a second TripleStore behind service.SparqlService
on an ephemeral port — disjoint data from the local store, so a passing
join proves rows really crossed HTTP.
"""

import pytest

from hbase_rdf_spark.engine import KgEngine
from hbase_rdf_spark.functions.encoding import build_dictionaries, encode_quads
from hbase_rdf_spark.operators.materialize import TripleStore
from hbase_rdf_spark.plans.sparql import SparqlSyntaxError, execute
from hbase_rdf_spark.service import SparqlService
from hbase_rdf_spark.sources.ntriples import parse_lines, quads

# local store: people and who they know
LOCAL_NQ = [
    "<http://ex/a> <http://ex/knows> <http://ex/b> .",
    "<http://ex/a> <http://ex/knows> <http://ex/c> .",
    "<http://ex/b> <http://ex/knows> <http://ex/c> .",
]

# remote store: names / ages / a French label — NOT in the local store
REMOTE_NQ = [
    '<http://ex/b> <http://ex/name> "Bo" .',
    '<http://ex/c> <http://ex/name> "Cyrene" .',
    '<http://ex/d> <http://ex/name> "Dana" .',
    '<http://ex/b> <http://ex/age> "33"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    '<http://ex/b> <http://ex/label> "chat"@fr .',
]

A, B, C, D = "http://ex/a", "http://ex/b", "http://ex/c", "http://ex/d"


def _mkstore(spark, root, nq):
    lines = spark.createDataFrame([(l,) for l in nq], "value string")
    resolved = quads(parse_lines(lines))
    st = TripleStore(spark, root, num_partitions=2)
    t2i, i2t = build_dictionaries(resolved)
    st.write_dictionaries(t2i, i2t, "nq")
    st.write_indexes(encode_quads(resolved), "nq")
    return st


@pytest.fixture(scope="module")
def local_store(spark, tmp_path_factory):
    return _mkstore(
        spark, str(tmp_path_factory.mktemp("fedlocal")), LOCAL_NQ
    )


@pytest.fixture(scope="module")
def endpoint(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fedremote"))
    eng = KgEngine(spark, root, num_partitions=2)
    resolved = quads(parse_lines(
        spark.createDataFrame([(l,) for l in REMOTE_NQ], "value string")
    ))
    t2i, i2t = build_dictionaries(resolved)
    eng.store.write_dictionaries(t2i, i2t, "nq")
    eng.store.write_indexes(encode_quads(resolved), "nq")
    svc = SparqlService(eng, port=0)
    port = svc.start()
    yield f"http://127.0.0.1:{port}/sparql"
    svc.stop()


def test_service_only_group(local_store, endpoint):
    rows = execute(
        local_store,
        f'SELECT ?s ?n WHERE {{ SERVICE <{endpoint}> '
        f'{{ ?s <http://ex/name> ?n }} }} ORDER BY ?n',
    ).collect()
    assert [(r["s"], r["n"]) for r in rows] == [
        (B, "Bo"), (C, "Cyrene"), (D, "Dana"),
    ]


def test_federated_join_on_shared_var(local_store, endpoint):
    # local edge scan × remote name lookup, joined on ?o over HTTP
    rows = execute(
        local_store,
        f'SELECT ?s ?o ?n WHERE {{ ?s <http://ex/knows> ?o . '
        f'SERVICE <{endpoint}> {{ ?o <http://ex/name> ?n }} }} '
        f'ORDER BY ?s ?n',
    ).collect()
    assert [(r["s"], r["o"], r["n"]) for r in rows] == [
        (A, B, "Bo"), (A, C, "Cyrene"), (B, C, "Cyrene"),
    ]


def test_remote_numeric_in_local_filter(local_store, endpoint):
    # a remote typed-integer binding participates in a LOCAL filter —
    # proves the JSON→KIND_NUMERIC round-trip. Rendering follows the
    # VALUES convention (solution-table numerics materialize via the
    # lexical sidecar, i.e. as strings).
    rows = execute(
        local_store,
        f'SELECT ?o ?a WHERE {{ ?s <http://ex/knows> ?o . '
        f'SERVICE <{endpoint}> {{ ?o <http://ex/age> ?a }} '
        f'FILTER(?a > 30) }}',
    ).collect()
    assert {(r["o"], r["a"]) for r in rows} == {(B, "33.0")}


def test_remote_optional_unbound_is_undef(local_store, endpoint):
    # remote OPTIONAL leaves ?a unbound for ex/c and ex/d — those
    # solutions must survive with NULL, like VALUES UNDEF cells
    rows = execute(
        local_store,
        f'SELECT ?x ?a WHERE {{ SERVICE <{endpoint}> '
        f'{{ ?x <http://ex/name> ?nm . '
        f'OPTIONAL {{ ?x <http://ex/age> ?a }} }} }} ORDER BY ?x',
    ).collect()
    assert [(r["x"], r["a"]) for r in rows] == [
        (B, "33.0"), (C, None), (D, None),
    ]


def test_remote_lang_tagged_literal_round_trip(local_store, endpoint):
    rows = execute(
        local_store,
        f'SELECT ?l WHERE {{ SERVICE <{endpoint}> '
        f'{{ <http://ex/b> <http://ex/label> ?l }} }}',
    ).collect()
    assert [r["l"] for r in rows] == ['"chat"@fr']


def test_service_silent_failure_is_unit(local_store):
    # dead endpoint + SILENT → unit solution: local patterns unaffected
    rows = execute(
        local_store,
        'SELECT ?s ?o WHERE { ?s <http://ex/knows> ?o . '
        'SERVICE SILENT <http://127.0.0.1:9/sparql> '
        '{ ?o <http://ex/name> ?n } }',
    ).collect()
    assert len(rows) == 3


def test_service_failure_raises(local_store):
    with pytest.raises(RuntimeError, match="SERVICE"):
        execute(
            local_store,
            'SELECT ?s WHERE { SERVICE <http://127.0.0.1:9/sparql> '
            '{ ?s <http://ex/name> ?n } }',
        ).collect()


def test_service_variable_endpoint_needs_values(local_store):
    # round 5: SERVICE ?ep is supported when ?ep is enumerable from a
    # VALUES clause; with no enumeration it stays an explicit error
    with pytest.raises(SparqlSyntaxError, match="VALUES"):
        execute(
            local_store,
            'SELECT ?s WHERE { SERVICE ?ep { ?s <http://ex/name> ?n } }',
        )


def test_service_variable_endpoint_from_values(local_store, endpoint):
    # the standard federation idiom: VALUES enumerates the endpoints,
    # each candidate is queried, responses union with ?ep bound
    rows = execute(
        local_store,
        f'SELECT ?s ?n ?ep WHERE {{ VALUES ?ep {{ <{endpoint}> }} '
        f'?s <http://ex/knows> ?o . '
        f'SERVICE ?ep {{ ?s <http://ex/name> ?n }} }} ORDER BY ?s',
    ).collect()
    assert [(r["s"], r["n"], r["ep"]) for r in rows] == [
        (B, "Bo", endpoint),
    ]


def test_service_variable_endpoint_silent_partial_failure(
    local_store, endpoint
):
    # two candidates, one dead: SILENT keeps the live endpoint's rows
    # and contributes the dead one's unit solution (?n UNDEF)
    dead = "http://127.0.0.1:9/sparql"
    rows = execute(
        local_store,
        f'SELECT ?ep ?n WHERE {{ VALUES ?ep {{ <{endpoint}> <{dead}> }} '
        f'SERVICE SILENT ?ep {{ ?p <http://ex/name> ?n }} }}',
    ).collect()
    got = sorted((r["ep"], r["n"]) for r in rows)
    assert (dead, None) in got
    assert {(endpoint, "Bo"), (endpoint, "Cyrene"), (endpoint, "Dana")} <= set(got)


def test_service_variable_endpoint_failure_raises(local_store, endpoint):
    dead = "http://127.0.0.1:9/sparql"
    with pytest.raises(RuntimeError, match="SERVICE"):
        execute(
            local_store,
            f'SELECT ?n WHERE {{ VALUES ?ep {{ <{dead}> }} '
            f'SERVICE ?ep {{ ?p <http://ex/name> ?n }} }}',
        ).collect()


def test_service_with_prefixes_and_inner_filter(local_store, endpoint):
    # pnames in the shipped span resolve via the forwarded PREFIX
    # declarations; the FILTER runs remotely
    rows = execute(
        local_store,
        f'PREFIX ex: <http://ex/> SELECT ?s WHERE {{ '
        f'SERVICE <{endpoint}> {{ ?s ex:name ?n '
        f'FILTER(STRSTARTS(?n, "B")) }} }}',
    ).collect()
    assert [r["s"] for r in rows] == [B]


def test_service_inside_optional(local_store, endpoint):
    # SERVICE nested in OPTIONAL: ex/a has no remote name → NULL
    rows = execute(
        local_store,
        f'SELECT ?s ?o ?n WHERE {{ ?s <http://ex/knows> ?o . '
        f'OPTIONAL {{ SERVICE <{endpoint}> {{ ?s <http://ex/name> ?n }} }} }}'
        f' ORDER BY ?s ?o',
    ).collect()
    assert [(r["s"], r["o"], r["n"]) for r in rows] == [
        (A, B, None), (A, C, None), (B, C, "Bo"),
    ]
