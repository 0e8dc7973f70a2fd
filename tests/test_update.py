"""SPARQL 1.1 Update over the TripleStore (plans/update.py).

The reference inherits updates from its Sail layer — per-statement
dictionary inserts + index Puts (reference: loader/HBaseLoader.java:82-231)
and removeStatements with null-context wildcard. Here each update form
is exercised end to end against a store bulk-loaded from N-Quads, with
the SELECT engine verifying post-state.
"""

import json
import urllib.request

import pytest

from hbase_rdf_spark.functions.encoding import build_dictionaries, encode_quads
from hbase_rdf_spark.operators.materialize import TripleStore
from hbase_rdf_spark.plans.sparql import execute
from hbase_rdf_spark.plans.update import execute_update, parse_update
from hbase_rdf_spark.plans.sparql import SparqlSyntaxError
from hbase_rdf_spark.sources.ntriples import parse_lines, quads

NQ = [
    '<http://ex/a> <http://ex/knows> <http://ex/b> <http://ex/g1> .',
    '<http://ex/b> <http://ex/knows> <http://ex/c> <http://ex/g1> .',
    '<http://ex/a> <http://ex/name> "Alice" <http://ex/g1> .',
    '<http://ex/b> <http://ex/name> "Bob" <http://ex/g2> .',
    '<http://ex/a> <http://ex/age> "41"^^<http://www.w3.org/2001/XMLSchema#integer> <http://ex/g2> .',
]


@pytest.fixture()
def store(spark, tmp_path):
    """Function-scoped: every test mutates its own store copy."""
    root = str(tmp_path / "updstore")
    lines = spark.createDataFrame([(l,) for l in NQ], "value string")
    resolved = quads(parse_lines(lines))
    st = TripleStore(spark, root, num_partitions=2)
    t2i, i2t = build_dictionaries(resolved)
    st.write_dictionaries(t2i, i2t, "nq")
    st.write_indexes(encode_quads(resolved), "nq")
    return st


def rows(df):
    return {tuple(r) for r in df.collect()}


def _names(store):
    return rows(execute(
        store, "SELECT ?s ?n WHERE { ?s <http://ex/name> ?n }"
    ))


def test_insert_data_and_idempotence(store):
    up = """
    PREFIX ex: <http://ex/>
    INSERT DATA {
      ex:c ex:name "Carol" .
      GRAPH ex:g2 { ex:c ex:knows ex:a }
    }
    """
    stats = execute_update(store, up)
    assert stats == {"inserted": 2, "deleted": 0}
    assert ("http://ex/c", "Carol") in _names(store)
    got = rows(execute(
        store,
        "SELECT ?g WHERE { GRAPH ?g { <http://ex/c> <http://ex/knows> <http://ex/a> } }",
    ))
    # graph vars render with the store's context prefix (the engine's
    # convention — see tests/test_sparql.py::test_graph_variable)
    assert got == {("conv:http://ex/g2",)}
    # content-hash ids make re-insert a no-op
    again = execute_update(store, up)
    assert again == {"inserted": 0, "deleted": 0}


def test_delete_data_wildcard_and_graph_scoped(store):
    # no GRAPH → Sail wildcard: removes the quad from every context
    stats = execute_update(
        store, 'DELETE DATA { <http://ex/a> <http://ex/name> "Alice" }'
    )
    assert stats["deleted"] == 1
    assert ("http://ex/a", "Alice") not in _names(store)
    # graph-scoped delete misses a quad stored in a different graph
    stats = execute_update(
        store,
        'DELETE DATA { GRAPH <http://ex/g1> { <http://ex/b> <http://ex/name> "Bob" } }',
    )
    assert stats["deleted"] == 0
    assert ("http://ex/b", "Bob") in _names(store)


def test_delete_where_shorthand(store):
    stats = execute_update(
        store, "DELETE WHERE { ?s <http://ex/knows> ?o }"
    )
    assert stats["deleted"] == 2
    assert rows(execute(
        store, "SELECT ?s WHERE { ?s <http://ex/knows> ?o }"
    )) == set()
    # everything else untouched
    assert len(_names(store)) == 2


def test_delete_insert_where_pre_state(store):
    # rename the predicate: delete + insert instantiate against the SAME
    # pre-state binding set (SPARQL 1.1 Update §3.1.3)
    up = """
    DELETE { ?s <http://ex/name> ?n }
    INSERT { ?s <http://ex/label> ?n }
    WHERE  { ?s <http://ex/name> ?n }
    """
    stats = execute_update(store, up)
    assert stats == {"inserted": 2, "deleted": 2}
    assert _names(store) == set()
    got = rows(execute(
        store, "SELECT ?s ?n WHERE { ?s <http://ex/label> ?n }"
    ))
    assert got == {("http://ex/a", "Alice"), ("http://ex/b", "Bob")}


def test_insert_where_numeric_and_with_graph(store):
    up = """
    INSERT { GRAPH <http://ex/derived> { ?s <http://ex/age2> ?a } }
    WHERE  { ?s <http://ex/age> ?a }
    """
    assert execute_update(store, up)["inserted"] == 1
    got = rows(execute(
        store,
        "SELECT ?a WHERE { GRAPH <http://ex/derived> { ?s <http://ex/age2> ?a } }",
    ))
    assert got == {("41.0",)}
    # WITH scopes both the template and the WHERE group
    up2 = """
    WITH <http://ex/derived>
    DELETE { ?s <http://ex/age2> ?a }
    WHERE  { ?s <http://ex/age2> ?a }
    """
    assert execute_update(store, up2)["deleted"] == 1


def test_clear_graph_and_all(store):
    stats = execute_update(store, "CLEAR GRAPH <http://ex/g2>")
    assert stats["deleted"] == 2
    assert rows(execute(
        store, "SELECT ?s WHERE { GRAPH <http://ex/g2> { ?s ?p ?o } }"
    )) == set()
    stats = execute_update(store, "CLEAR ALL")
    assert stats["deleted"] == 3
    assert rows(execute(store, "SELECT ?s WHERE { ?s ?p ?o }")) == set()


def test_chained_ops_single_request(store):
    up = """
    PREFIX ex: <http://ex/>
    DELETE DATA { ex:a ex:knows ex:b } ;
    INSERT DATA { ex:a ex:knows ex:c }
    """
    stats = execute_update(store, up)
    assert stats == {"inserted": 1, "deleted": 1}
    got = rows(execute(
        store, "SELECT ?o WHERE { <http://ex/a> <http://ex/knows> ?o }"
    ))
    assert got == {("http://ex/c",)}


def test_parse_rejections():
    with pytest.raises(SparqlSyntaxError):
        parse_update("INSERT DATA { ?s <http://ex/p> <http://ex/o> }")
    with pytest.raises(SparqlSyntaxError):
        parse_update(
            "DELETE { _:b <http://ex/p> ?o } WHERE { ?s <http://ex/p> ?o }"
        )
    with pytest.raises(SparqlSyntaxError):
        parse_update(
            "INSERT { ?s <http://ex/p>+ ?o } WHERE { ?s <http://ex/p> ?o }"
        )
    with pytest.raises(SparqlSyntaxError):
        parse_update("SELECT ?s WHERE { ?s ?p ?o }")


def test_update_via_http_endpoint(spark, store):
    from hbase_rdf_spark.engine import KgEngine
    from hbase_rdf_spark.service import SparqlService

    eng = KgEngine.__new__(KgEngine)
    eng.spark = spark
    eng.store = store
    svc = SparqlService(eng, port=0)
    port = svc.start()
    try:
        body = 'INSERT DATA { <http://ex/h> <http://ex/name> "Henry" }'
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/update",
            data=body.encode(),
            headers={"Content-Type": "application/sparql-update"},
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            ack = json.loads(r.read())
        assert ack == {"inserted": 1, "deleted": 0}
        # form-encoded update= on the /sparql path (protocol §2.2.2)
        import urllib.parse as up

        form = up.urlencode(
            {"update": "DELETE WHERE { <http://ex/h> ?p ?o }"}
        )
        req2 = urllib.request.Request(
            f"http://127.0.0.1:{port}/sparql",
            data=form.encode(),
            headers={"Content-Type": "application/x-www-form-urlencoded"},
            method="POST",
        )
        with urllib.request.urlopen(req2) as r:
            ack2 = json.loads(r.read())
        assert ack2["deleted"] == 1
        assert ("http://ex/h", "Henry") not in _names(store)
    finally:
        svc.stop()
