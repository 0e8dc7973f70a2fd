"""Skew primitives: salted aggregation equivalence + hot-bucket caps."""

from pyspark.sql import functions as F

from hbase_rdf_spark.functions.skew import cap_group_size, salted_aggregate
from hbase_rdf_spark.ops.dedup import minhash_duplicate_pairs


def test_salted_aggregate_set_union(spark):
    # one hot key (100k rows), several cold keys
    hot = spark.range(100_000).select(
        F.lit("hot").alias("k"), (F.col("id") % 500).alias("v")
    )
    cold = spark.range(50).select(
        F.concat(F.lit("c"), (F.col("id") % 5).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    df = hot.unionByName(cold)
    out = salted_aggregate(df, ["k"], F.collect_set("v"), "flatten_distinct", "vs")
    got = {r["k"]: sorted(r["vs"]) for r in out.collect()}
    assert got["hot"] == list(range(500))
    assert got["c0"] == [0, 5, 10, 15, 20, 25, 30, 35, 40, 45]


def test_salted_aggregate_sum(spark):
    df = spark.range(10_000).select(
        F.lit("k").alias("k"), F.lit(1.0).alias("v")
    )
    out = salted_aggregate(df, ["k"], F.sum("v"), "sum", "total").collect()
    assert out[0]["total"] == 10_000.0


def test_cap_group_size_reports_drop(spark):
    df = spark.range(1_000).select(
        F.when(F.col("id") < 900, F.lit("viral")).otherwise(
            F.concat(F.lit("g"), (F.col("id") % 20).cast("string"))
        ).alias("bucket"),
        F.col("id").alias("member"),
    )
    counter: dict = {}
    kept = cap_group_size(df, ["bucket"], max_size=50, counter=counter)
    assert counter["dropped_groups"] == 1
    assert counter["dropped_rows"] == 900
    assert kept.filter(F.col("bucket") == "viral").count() == 0
    assert kept.count() == 100


def test_minhash_band_cap_keeps_recall_via_other_bands(spark):
    # near-dup pair + unrelated docs; tiny cap still finds the pair
    # because an identical pair collides in EVERY band, so capping a few
    # buckets cannot remove all of its collisions
    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "one two three four five six seven eight nine ten"),
        (4, "red orange yellow green blue indigo violet pink brown black"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    counter: dict = {}
    pairs = minhash_duplicate_pairs(
        df, threshold=0.5, max_band_size=2, skew_counter=counter
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert "dropped_groups" in counter
