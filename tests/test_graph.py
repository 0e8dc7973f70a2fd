"""Graph analytics (degrees, PageRank) + index compaction."""

import glob

import pytest
from pyspark.sql import functions as F

from hbase_rdf_spark.ops.graph import degrees, pagerank


def test_degrees(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")], "s string, o string"
    )
    got = {r["node"]: (r["out_deg"], r["in_deg"]) for r in degrees(e).collect()}
    assert got == {"a": (2, 1), "b": (1, 1), "c": (1, 2)}


def test_pagerank_star_and_sum(spark):
    # hub-and-spoke: every spoke points at the hub → hub dominates
    edges = [(f"s{i}", "hub") for i in range(10)] + [("hub", "s0")]
    e = spark.createDataFrame(edges, "s string, o string")
    ranks = {r["node"]: r["rank"] for r in pagerank(e, iterations=15).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-6  # probability mass conserved
    assert ranks["hub"] == max(ranks.values())
    assert ranks["s0"] > ranks["s1"]  # s0 receives the hub's outflow
    # determinism across runs: FP-tolerance level (shuffle merge order
    # varies the last ulp of the inflow sums; see pagerank docstring)
    ranks2 = {r["node"]: r["rank"] for r in pagerank(e, iterations=15).collect()}
    assert all(abs(ranks[k] - ranks2[k]) < 1e-12 for k in ranks)


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    e = spark.createDataFrame(edges, "s string, o string")
    got = {r["node"]: r["rank"] for r in pagerank(e, iterations=25).collect()}

    nodes = sorted({x for p in edges for x in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    outd = {}
    for s, _ in edges:
        outd[s] = outd.get(s, 0) + 1
    for s, o in edges:
        M[idx[o], idx[s]] = 1.0 / outd[s]
    r = np.full(n, 1.0 / n)
    d = 0.85
    for _ in range(25):
        dangling = sum(r[idx[x]] for x in nodes if x not in outd)
        r = (1 - d) / n + d * (M @ r) + d * dangling / n
    for node in nodes:
        assert abs(got[node] - r[idx[node]]) < 1e-9


def test_compaction_preserves_content_and_restores_layout(spark, tmp_path):
    from hbase_rdf_spark.operators.materialize import TripleStore
    from hbase_rdf_spark.pipeline import build_kg
    from hbase_rdf_spark.sources.synthetic import build_gazetteer, transcripts_df
    from hbase_rdf_spark.streaming.incremental import append_batch

    gaz = spark.createDataFrame(
        build_gazetteer(), "alias string, entity_id string, kind string"
    ).select("alias", "entity_id")
    root = str(tmp_path / "kg")
    build_kg(spark, transcripts_df(spark, 20, seed=13), gaz, root)
    store = TripleStore(spark, root)
    for off in (20, 30, 40):
        append_batch(store, transcripts_df(spark, 10, seed=13, conv_offset=off), gaz)

    before = store.index("spo")
    rows_before = before.count()
    files_before = len(glob.glob(root + "/triples_spo/part-*.parquet"))
    content = before.orderBy("s", "p", "o_kind", "o", "o_num", "c").collect()

    stats = store.compact_all()
    assert stats["spo"] == rows_before

    after = store.index("spo")
    files_after = len(glob.glob(root + "/triples_spo/part-*.parquet"))
    assert files_after < files_before  # 4 append layers collapsed
    assert after.orderBy("s", "p", "o_kind", "o", "o_num", "c").collect() == content
