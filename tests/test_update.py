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


def _graph_quads(store, g):
    return rows(execute(
        store,
        "SELECT ?s ?p ?o WHERE { GRAPH <%s> { ?s ?p ?o } }" % g,
    ))


def test_add_copies_graph_idempotently(store):
    g1 = _graph_quads(store, "http://ex/g1")
    g2_before = _graph_quads(store, "http://ex/g2")
    stats = execute_update(store, "ADD <http://ex/g1> TO <http://ex/g2>")
    assert stats == {"inserted": 3, "deleted": 0}
    assert _graph_quads(store, "http://ex/g2") == g1 | g2_before
    # src untouched, re-ADD a no-op (content-identical rows dedup)
    assert _graph_quads(store, "http://ex/g1") == g1
    assert execute_update(
        store, "ADD <http://ex/g1> TO <http://ex/g2>"
    ) == {"inserted": 0, "deleted": 0}


def test_copy_overwrites_and_move_drops_src(store):
    g1 = _graph_quads(store, "http://ex/g1")
    stats = execute_update(store, "COPY <http://ex/g1> TO <http://ex/g2>")
    assert stats == {"inserted": 3, "deleted": 2}  # old g2 had 2 quads
    assert _graph_quads(store, "http://ex/g2") == g1
    assert _graph_quads(store, "http://ex/g1") == g1
    stats = execute_update(store, "MOVE <http://ex/g2> TO <http://ex/g3>")
    assert stats == {"inserted": 3, "deleted": 3}  # g3 empty; src dropped
    assert _graph_quads(store, "http://ex/g3") == g1
    assert _graph_quads(store, "http://ex/g2") == set()
    # self MOVE is a no-op (spec: same graph → no operation)
    assert execute_update(
        store, "MOVE <http://ex/g3> TO <http://ex/g3>"
    ) == {"inserted": 0, "deleted": 0}


def test_add_default_to_named_and_back(store):
    # the store fixture has no default-graph rows: seed one
    execute_update(store, 'INSERT DATA { <http://ex/d> <http://ex/name> "Dee" }')
    stats = execute_update(store, "ADD DEFAULT TO <http://ex/g9>")
    assert stats == {"inserted": 1, "deleted": 0}
    assert ("http://ex/d", "http://ex/name", "Dee") in _graph_quads(
        store, "http://ex/g9"
    )
    # and named → DEFAULT: g9's row already exists in default (it came
    # from there), so MOVE deletes the src copy and re-inserts
    stats = execute_update(store, "MOVE <http://ex/g9> TO DEFAULT")
    assert stats["deleted"] >= 1
    assert _graph_quads(store, "http://ex/g9") == set()
    assert ("http://ex/d", "Dee") in _names(store)


def test_drop_and_create(store):
    # CREATE parses as a no-op; DROP ≡ CLEAR
    stats = execute_update(
        store,
        "CREATE GRAPH <http://ex/new> ; DROP SILENT GRAPH <http://ex/g2>",
    )
    assert stats == {"inserted": 0, "deleted": 2}
    assert _graph_quads(store, "http://ex/g2") == set()


def test_load_into_graph_and_silent(store, tmp_path):
    doc = tmp_path / "extra.nt"
    doc.write_text(
        '<http://ex/x> <http://ex/name> "Xena" .\n'
        '<http://ex/x> <http://ex/knows> <http://ex/a> .\n'
    )
    stats = execute_update(
        store, f"LOAD <{doc}> INTO GRAPH <http://ex/gload>"
    )
    assert stats == {"inserted": 2, "deleted": 0}
    assert ("http://ex/x", "http://ex/name", "Xena") in _graph_quads(
        store, "http://ex/gload"
    )
    # plain LOAD (no INTO) lands rows in the document/default context
    stats = execute_update(store, f"LOAD <{doc}>")
    assert stats["inserted"] == 2
    assert ("http://ex/x", "Xena") in _names(store)
    # missing file: LOAD raises, LOAD SILENT returns 0
    with pytest.raises(Exception):
        execute_update(store, "LOAD <http://definitely/absent.nt>")
    assert execute_update(
        store, "LOAD SILENT <http://definitely/absent.nt>"
    ) == {"inserted": 0, "deleted": 0}
    # corrupt line: hard error without SILENT
    bad = tmp_path / "bad.nt"
    bad.write_text("this is not a triple\n")
    with pytest.raises(ValueError, match="unparseable"):
        execute_update(store, f"LOAD <{bad}>")


def test_using_scopes_where_and_overrides_with(store):
    # ?s ex:knows ?o exists in g1 only. USING <g2> → WHERE sees nothing
    stats = execute_update(
        store,
        "DELETE { ?s <http://ex/knows> ?o } USING <http://ex/g2> "
        "WHERE { ?s <http://ex/knows> ?o }",
    )
    assert stats == {"inserted": 0, "deleted": 0}
    # USING <g1> → both knows-rows bind; wildcard delete removes them
    stats = execute_update(
        store,
        "DELETE { ?s <http://ex/knows> ?o } USING <http://ex/g1> "
        "WHERE { ?s <http://ex/knows> ?o }",
    )
    assert stats == {"inserted": 0, "deleted": 2}
    # USING NAMED restricts GRAPH ?g iteration: only g2's name quad
    got = execute_update(
        store,
        "INSERT { ?s <http://ex/seen> ?g } USING NAMED <http://ex/g2> "
        "WHERE { GRAPH ?g { ?s <http://ex/name> ?n } }",
    )
    assert got["inserted"] == 1
    seen = rows(execute(store, "SELECT ?s WHERE { ?s <http://ex/seen> ?g }"))
    assert seen == {("http://ex/b",)}
