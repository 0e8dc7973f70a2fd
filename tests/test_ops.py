"""Training-data-pipeline operators: dedup family, similarity, text,
multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from hbase_rdf_spark.ops.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_duplicate_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_candidate_pairs,
)
from hbase_rdf_spark.ops.multimodal import (
    extract_features,
    sample_frames,
    synthetic_assets,
)
from hbase_rdf_spark.ops.similarity import cosine_topk_bruteforce, lsh_topk
from hbase_rdf_spark.ops.text import detect_language, fingerprint, token_count


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (2, "the quick brown fox jumps over the lazy dog and runs away fast"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat and runs away fast"),  # near dup of 1
    (4, "der schnelle braune fuchs springt und ist nicht langsam heute"),
    (5, "completely different content about spark shuffle partitions tuning"),
    (6, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["group_size"] == 2 and groups[0]["keep_id"] == 1
    kept = dedup_exact(docs)
    assert kept.count() == 5
    assert kept.filter(F.col("doc_id") == 2).count() == 0


def test_minhash_near_dup(spark, docs):
    pairs = minhash_duplicate_pairs(docs, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert not any(5 in p for p in got)


def test_ngram_jaccard_exact_baseline(spark, docs):
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got and got[(1, 3)] < 1.0


def test_simhash_properties(spark, docs):
    sig = {r["id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sig[1] == sig[2]  # identical text → identical sketch
    assert sig[1] != sig[5]
    pairs = simhash_candidate_pairs(simhash(docs), max_hamming=16).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got[(1, 2)] == 0
    assert (1, 3) in got  # near dup within hamming 16


def test_cosine_topk_self_match(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = [(i, rng.randn(16).astype(float).tolist()) for i in range(50)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = cosine_topk_bruteforce(df, q, k=3).collect()
    first = {r["query_id"]: r["vec_id"] for r in top if r["rank"] == 1}
    assert first == {0: 0, 1: 1}  # self is nearest


def test_lsh_topk_recall(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    base = rng.randn(40, 12)
    # plant a near-duplicate of vector 0 at id 99
    near = base[0] + rng.randn(12) * 0.01
    rows = [(i, base[i].astype(float).tolist()) for i in range(40)]
    rows.append((99, near.astype(float).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = lsh_topk(df, q, dim=12, k=2, n_bits=8, n_tables=4)
    got = {r["vec_id"] for r in approx.collect()}
    assert 0 in got and 99 in got  # near-dup lands in the same buckets


def test_text_ops(spark, docs):
    out = docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n"),
        detect_language(F.col("text")).alias("lang"),
        fingerprint(F.col("text")).alias("fp"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["n"] == 13 and by_id[6]["n"] == 0
    assert by_id[1]["lang"] == "en" and by_id[4]["lang"] == "de"
    assert by_id[1]["fp"] == by_id[2]["fp"]
    assert by_id[1]["fp"] != by_id[5]["fp"]


def test_multimodal_plumbing(spark):
    assets = synthetic_assets(spark, n=30)
    feats = extract_features(assets, feature_dim=8).collect()
    assert len(feats) == 30
    assert all(len(r["feature"]) == 8 for r in feats)
    # determinism
    feats2 = extract_features(synthetic_assets(spark, n=30), feature_dim=8).collect()
    assert {(r["asset_id"], tuple(r["feature"])) for r in feats} == {
        (r["asset_id"], tuple(r["feature"])) for r in feats2
    }
    frames = sample_frames(assets, every_ms=1000)
    fr = frames.groupBy("asset_id").count().collect()
    assert len(fr) == 10  # every 3rd asset is a video
    assert all(r["count"] >= 3 for r in fr)
