"""Connected components: correctness + skew (hot-node) behavior.

The north_rule calls out explicit skew handling; the CC implementation
avoids any collect_list-style neighbor materialization precisely so a
high-degree node cannot blow up one task (hbase_rdf_spark/operators/cc.py
docstring). These tests pin the semantics and exercise the hot-node path
with a star graph orders of magnitude more skewed than the linking stage
ever produces.
"""

import pytest
from pyspark.sql import functions as F

from hbase_rdf_spark.operators.cc import (
    canonicalize_unresolved,
    connected_components,
)


def comps(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df).collect()
    m = {}
    for r in out:
        m[r["node"]] = r["component"]
    return m


def test_cc_chain_and_clique(spark):
    # chain 1-2-3-4, clique {10,11,12}, isolated pair 20-21
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    m = comps(spark, edges)
    assert m[1] == m[2] == m[3] == m[4] == 1
    assert m[10] == m[11] == m[12] == 10
    assert m[20] == m[21] == 20


def test_cc_bridges_merge_components(spark):
    # two chains joined by one bridge edge late in id order
    edges = [(1, 2), (2, 3), (100, 101), (101, 102), (3, 100)]
    m = comps(spark, edges)
    assert len(set(m.values())) == 1
    assert set(m.values()) == {1}


def test_cc_skewed_star(spark):
    """One hub with 20k spokes + disjoint noise: the hot node must not
    require its full neighborhood in a single task (no collect_list),
    and min-id labeling stays exact."""
    hub = 5_000_000
    n = 20_000
    spokes = spark.range(1, n + 1).select(
        F.lit(hub).alias("src"), (F.col("id") + hub).alias("dst")
    )
    noise = spark.range(0, 500).select(
        (F.col("id") * 2 + 1).alias("src"), (F.col("id") * 2 + 2).alias("dst")
    )
    out = connected_components(spokes.unionByName(noise))
    star = out.filter(F.col("node") > hub - 1)
    # every spoke + the hub labeled with the hub id (the minimum)
    assert star.count() == n + 1
    assert star.filter(F.col("component") != hub).count() == 0
    # noise pairs untouched by the star
    noise_comps = out.filter(F.col("node") < hub).select("component").distinct()
    assert noise_comps.count() == 500


def test_canonicalize_groups_surfaces(spark):
    pairs = spark.createDataFrame(
        [("Acme Corp", "acme corp"), ("acme corp", "Acme Cor"),
         ("Globex", "globex inc")],
        "a string, b string",
    )
    out = {r["surface"]: r["canon_surface"]
           for r in canonicalize_unresolved(pairs).collect()}
    assert out["Acme Corp"] == out["acme corp"] == out["Acme Cor"]
    assert out["Globex"] == out["globex inc"]
    assert out["Globex"] != out["Acme Corp"]
