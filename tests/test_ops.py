"""Training-data-pipeline operators: dedup family, similarity, text,
multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from hbase_rdf_spark.ops.dedup import (
    dedup_exact,
    dedup_keep_list,
    duplicate_clusters,
    embedding_near_duplicates,
    embedding_near_duplicates_lsh,
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


def test_duplicate_clusters_transitive_and_singletons(spark, docs):
    # chain 10—20—30 must merge into ONE cluster even though (10, 30)
    # is not an edge; 40 has no edge → singleton cluster of itself
    d = spark.createDataFrame(
        [(10, "aaaa"), (20, "bbbbbb"), (30, "cc"), (40, "dd")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(10, 20), (20, 30)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(d, pairs).collect()
    }
    assert got == {10: 10, 20: 10, 30: 10, 40: 40}


def test_dedup_keep_list_survivor_policy(spark):
    # survivor = longest text, tie → smallest id; exactly one keep per
    # cluster, singletons always kept
    d = spark.createDataFrame(
        [(1, "xxxxx"), (2, "xxxxxxxx"), (3, "yyyyyyyy"), (9, "z")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    rows = {r["doc_id"]: r for r in dedup_keep_list(d, pairs).collect()}
    assert all(rows[i]["cluster_id"] == 1 for i in (1, 2, 3))
    assert rows[9]["cluster_id"] == 9 and rows[9]["keep"]
    assert rows[9]["cluster_size"] == 1
    # 2 and 3 tie on length 8 → keep id 2
    assert rows[2]["keep"] and not rows[1]["keep"] and not rows[3]["keep"]
    assert rows[1]["cluster_size"] == 3


def test_keep_list_end_to_end_minhash(spark, docs):
    out = dedup_keep_list(docs, minhash_duplicate_pairs(docs, threshold=0.5))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert out.count() == len(DOCS)  # total function over the corpus
    assert {i for i, r in rows.items() if r["cluster_id"] == 1} == {1, 2, 3}
    # one survivor per cluster
    assert sum(1 for r in rows.values() if r["keep"]) == 4


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


def test_embedding_near_dup_exact_and_lsh(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.randn(30, 16)
    rows = [(i, base[i].astype(float).tolist()) for i in range(30)]
    # two planted near-dup pairs, one anti-parallel distractor
    rows.append((100, (base[0] + rng.randn(16) * 0.01).astype(float).tolist()))
    rows.append((101, (base[1] * 2.0).astype(float).tolist()))  # same direction
    rows.append((102, (-base[2]).astype(float).tolist()))  # cos = -1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_near_duplicates(df, threshold=0.95).collect()
    }
    assert (0, 100) in exact and (1, 101) in exact
    assert exact[(1, 101)] == 1.0
    assert not any(102 in p for p in exact)

    approx = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates_lsh(
            df, dim=16, threshold=0.95, n_bits=8, n_tables=6
        ).collect()
    }
    # LSH has recall<1 in general but near-parallel pairs collide whp
    assert (0, 100) in approx and (1, 101) in approx
    assert approx <= set(exact)  # verified rescore ⇒ no false positives


def test_bpe_token_count(spark):
    from hbase_rdf_spark.ops.text import bpe_token_count

    df = spark.createDataFrame(
        [(1, "don't panic, it's 2024!"), (2, ""), (3, "abc123")],
        "id long, text string",
    )
    got = {
        r["id"]: r["n"]
        for r in df.select(
            "id", bpe_token_count(F.col("text")).alias("n")
        ).collect()
    }
    # don / ' / t / panic / , / it / ' / s / 2024 / !  → 10
    assert got[1] == 10
    assert got[2] == 0
    assert got[3] == 2  # abc | 123


def test_sketch_accuracy(spark):
    """HLL++ distinct and quantile sketches stay within advertised error
    vs exact answers (the rows-only events_approx_sketches entry)."""
    import numpy as np

    rng = np.random.RandomState(17)
    vals = rng.exponential(50.0, size=20_000)
    users = rng.randint(0, 3_000, size=20_000)
    df = spark.createDataFrame(
        [(int(u), float(v)) for u, v in zip(users, vals)],
        "user_id long, value double",
    )
    row = df.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("au"),
        F.percentile_approx("value", 0.5, 10_000).alias("p50"),
        F.percentile_approx("value", 0.95, 10_000).alias("p95"),
    ).collect()[0]
    exact_users = df.select("user_id").distinct().count()
    assert abs(row["au"] - exact_users) / exact_users < 0.05
    assert abs(row["p50"] - float(np.quantile(vals, 0.5))) < 2.0
    assert abs(row["p95"] - float(np.quantile(vals, 0.95))) < 5.0


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


def test_multimodal_resize(spark):
    from hbase_rdf_spark.ops.multimodal import resize_images

    assets = synthetic_assets(spark, n=30)
    out = resize_images(assets, max_side=32).collect()
    assert len(out) == 30
    by_id = {r["asset_id"]: r for r in out}
    src = {r["asset_id"]: r for r in assets.collect()}
    for aid, r in by_id.items():
        if r["modality"] == "image":
            assert max(r["meta"]["width"], r["meta"]["height"]) <= 32
            assert bytes(r["media"]) != bytes(src[aid]["media"])  # re-encoded
        else:
            assert bytes(r["media"]) == bytes(src[aid]["media"])  # untouched
    # determinism
    out2 = resize_images(synthetic_assets(spark, n=30), max_side=32).collect()
    assert {(r["asset_id"], bytes(r["media"])) for r in out} == {
        (r["asset_id"], bytes(r["media"])) for r in out2
    }


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


def test_embedding_near_dup_size_guard_routes_to_lsh(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(20, 16)
    rows = [(i, base[i].astype(float).tolist()) for i in range(20)]
    rows.append((100, (base[0] + rng.randn(16) * 0.01).astype(float).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # a 10-byte budget cannot hold the build side: the exact path must
    # refuse the driver collect and route to the sign-LSH plan
    guarded = embedding_near_duplicates(
        df, threshold=0.95, broadcast_budget_bytes=10
    )
    got = {(r["id_a"], r["id_b"]) for r in guarded.collect()}
    assert (0, 100) in got  # near-parallel planted pair collides whp
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(df, threshold=0.95).collect()
    }
    assert got <= exact  # LSH route rescores exactly ⇒ no false positives


def test_multimodal_kernel_swap_pgm_and_wav(spark):
    """Kernel-swap proof: the SAME mapInPandas contract runs a real
    Netpbm decode and a real stdlib-WAV decode; features match a local
    numpy computation bit for bit and the schema is unchanged."""
    import io
    import struct
    import wave as wavmod

    import numpy as np

    from hbase_rdf_spark.ops.multimodal import (
        PgmKernel,
        WavKernel,
        _pooled_feature,
        extract_features,
    )

    rng = np.random.RandomState(11)
    assets, expected = [], {}
    for i in range(6):
        w, h = 12 + i, 9 + i
        img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        payload = f"P5 {w} {h} 255\n".encode() + img.tobytes()
        assets.append((i, "image", bytearray(payload), (w, h, 0, 0)))
        expected[i] = _pooled_feature(img.astype(np.float32), 16)
    for i in range(6, 9):
        samples = (rng.randn(400) * 3000).astype("<i2")
        buf = io.BytesIO()
        with wavmod.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(16000)
            wf.writeframes(samples.tobytes())
        assets.append((i, "audio", bytearray(buf.getvalue()), (0, 0, 16000, 0)))
        arr = np.abs(samples.astype(np.float32).reshape(1, -1)) / 256.0
        expected[i] = _pooled_feature(arr, 16)

    df = spark.createDataFrame(
        assets,
        "asset_id bigint, modality string, media binary, "
        "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>",
    )
    out = extract_features(
        df, kernels={"image": PgmKernel(), "audio": WavKernel()}
    ).collect()
    assert len(out) == 9
    for r in out:
        assert r["n_bytes"] > 0
        got = np.array(r["feature"], dtype=np.float32)
        want = np.array(expected[r["asset_id"]], dtype=np.float32)
        assert np.allclose(got, want, atol=0), r["asset_id"]


def test_ppm_color_kernel_roundtrip_and_features(spark):
    """PpmKernel: real P6/P3 color decode → BT.601 luma 2-D contract;
    the pooled-feature stage consumes it bit for bit like grayscale."""
    import numpy as np

    from hbase_rdf_spark.ops.multimodal import (
        PpmKernel,
        _pooled_feature,
        extract_features,
    )

    k = PpmKernel()
    rng = np.random.RandomState(7)
    luma = np.array([0.299, 0.587, 0.114], dtype=np.float32)
    assets, expected = [], {}
    for i in range(4):
        w, h = 10 + i, 8 + i
        rgb = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        payload = f"P6 {w} {h} 255\n".encode() + rgb.tobytes()
        assets.append((i, "image", bytearray(payload), (w, h, 0, 0)))
        expected[i] = _pooled_feature(rgb.astype(np.float32) @ luma, 16)
    # P3 ASCII variant with a comment after the header
    p3 = b"P3 2 2 255 # rgb\n255 0 0  0 255 0\n0 0 255  255 255 255"
    d = k.decode(p3)
    assert d.shape == (2, 2)
    assert abs(d[1, 1] - 255.0) < 0.01  # white → full luma
    # encode replicates gray to 3 channels; decode returns it exactly
    gray = np.arange(6, dtype=np.float32).reshape(2, 3) * 40
    assert np.allclose(k.decode(k.encode(gray)), gray, atol=0.51)

    df = spark.createDataFrame(
        assets,
        "asset_id bigint, modality string, media binary, "
        "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>",
    )
    out = extract_features(df, kernels={"image": k}).collect()
    assert len(out) == 4
    for r in out:
        got = np.array(r["feature"], dtype=np.float32)
        want = np.array(expected[r["asset_id"]], dtype=np.float32)
        assert np.allclose(got, want, atol=1e-5), r["asset_id"]


def test_multimodal_real_resize_roundtrip(spark):
    import numpy as np

    from hbase_rdf_spark.ops.multimodal import PgmKernel, resize_images

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(40, 60)).astype(np.uint8)
    payload = b"P5 60 40 255\n" + img.tobytes()
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload), (60, 40, 0, 0))],
        "asset_id bigint, modality string, media binary, "
        "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>",
    )
    out = resize_images(df, max_side=30, kernel=PgmKernel()).collect()[0]
    assert (out["meta"]["width"], out["meta"]["height"]) == (30, 20)
    decoded = PgmKernel().decode(bytes(out["media"]))
    assert decoded.shape == (20, 30)
    # nearest-neighbor resample is reproducible locally
    want = PgmKernel.resample(img.astype(np.float32), 20, 30)
    assert np.array_equal(decoded, want)


def test_stratified_sample_exact_k_and_deterministic(spark):
    rows = [(i, "en" if i % 3 else "de", f"t{i}") for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    from hbase_rdf_spark.ops.sampling import stratified_sample

    s1 = stratified_sample(d, ["lang"], k=7, seed="a")
    per = {r["lang"]: r["n"] for r in s1.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    assert per == {"en": 7, "de": 7}
    # identical selection regardless of physical partitioning
    s2 = stratified_sample(d.repartition(13), ["lang"], k=7, seed="a")
    assert {r["doc_id"] for r in s1.collect()} == {r["doc_id"] for r in s2.collect()}
    # a different seed draws a different sample
    s3 = stratified_sample(d, ["lang"], k=7, seed="b")
    assert {r["doc_id"] for r in s1.collect()} != {r["doc_id"] for r in s3.collect()}
    # rank<=k lowered to the map-side group-limit physical rule
    assert "WindowGroupLimit" in s1._jdf.queryExecution().executedPlan().toString()


def test_sample_fraction_nested_and_stable(spark):
    d = spark.createDataFrame(
        [(i, f"t{i}") for i in range(2000)], "doc_id long, text string"
    )
    from hbase_rdf_spark.ops.sampling import sample_fraction

    small = {r["doc_id"] for r in sample_fraction(d, 0.1, seed="s").collect()}
    big = {r["doc_id"] for r in sample_fraction(d, 0.4, seed="s").collect()}
    assert small and small < big  # non-empty, strictly nested
    assert abs(len(big) / 2000 - 0.4) < 0.08  # roughly calibrated
    # repartitioning must not change the selection (unlike df.sample)
    again = {r["doc_id"] for r in sample_fraction(d.repartition(17), 0.4, seed="s").collect()}
    assert again == big
    # portable md5 path agrees with itself and stays calibrated
    p = {r["doc_id"] for r in sample_fraction(d, 0.4, seed="s", portable=True).collect()}
    assert abs(len(p) / 2000 - 0.4) < 0.08


def test_context_window_packing(spark):
    from hbase_rdf_spark.ops.packing import assign_context_windows

    d = spark.createDataFrame(
        [(i, (i % 7) + 1) for i in range(100)], "doc_id long, tok long"
    )
    out = assign_context_windows(d, 16, "tok", num_partitions=5)
    rows = sorted(out.collect(), key=lambda r: r["doc_id"])
    cum = 0
    for r in rows:  # exact exclusive prefix sum semantics
        assert r["bin_id"] == cum // 16 and r["bin_offset"] == cum % 16
        cum += r["tok"]
    # identical assignment at any parallelism / input partitioning
    alt = sorted(
        assign_context_windows(
            d.repartition(3), 16, "tok", num_partitions=13
        ).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [(r["bin_id"], r["bin_offset"]) for r in rows] == [
        (r["bin_id"], r["bin_offset"]) for r in alt
    ]
    # a doc longer than the window lands in the window of its first token
    big = spark.createDataFrame(
        [(1, 5), (2, 40), (3, 5)], "doc_id long, tok long"
    )
    got = {
        r["doc_id"]: (r["bin_id"], r["bin_offset"])
        for r in assign_context_windows(big, 16, "tok").collect()
    }
    assert got == {1: (0, 0), 2: (0, 5), 3: (2, 13)}
    # the plan must NOT contain a global (un-partitioned) Window sort
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "Window" not in plan


def test_mixture_sample_fractions_and_drop(spark):
    from hbase_rdf_spark.ops.sampling import mixture_sample

    d = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3]) for i in range(3000)],
        "doc_id long, lang string",
    )
    mix = {"en": 1.0, "de": 0.5}
    for portable in (False, True):
        got = {
            r["lang"]: r["count"]
            for r in mixture_sample(d, mix, strata_col="lang", portable=portable)
            .groupBy("lang").count().collect()
        }
        assert got["en"] == 1000  # fraction 1.0 keeps everything
        assert abs(got["de"] - 500) < 80  # calibrated
        assert "fr" not in got  # absent stratum dropped
    # scaled-down mixture nests inside the full one
    half = {r["doc_id"] for r in mixture_sample(
        d, {"en": 0.5, "de": 0.25}, strata_col="lang").collect()}
    full = {r["doc_id"] for r in mixture_sample(
        d, mix, strata_col="lang").collect()}
    assert half < full
    import pytest as _pt
    with _pt.raises(ValueError):
        mixture_sample(d, {"en": 1.5}, strata_col="lang")


def test_assign_shards_deterministic_permutation(spark, tmp_path):
    from hbase_rdf_spark.ops.sampling import assign_shards, export_shards

    d = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1000)], "doc_id long, text string"
    )
    out = assign_shards(d, 8, seed="s").select(
        "doc_id", "shard_id", "shard_pos"
    )
    got = {(r.doc_id, r.shard_id, r.shard_pos) for r in out.collect()}
    # every row assigned, positions are 1..n contiguous per shard
    assert len(got) == 1000
    by_shard = {}
    for _, sid, pos in got:
        by_shard.setdefault(sid, []).append(pos)
    assert set(by_shard) == set(range(8))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # rough balance: no shard below half or above double the mean
    sizes = [len(v) for v in by_shard.values()]
    assert min(sizes) > 1000 / 8 / 2 and max(sizes) < 1000 / 8 * 2
    # partitioning-independent (retry/cluster-size stable)
    again = {
        (r.doc_id, r.shard_id, r.shard_pos)
        for r in assign_shards(d.repartition(17), 8, seed="s")
        .select("doc_id", "shard_id", "shard_pos")
        .collect()
    }
    assert again == got
    # a different seed is a different permutation
    other = {
        (r.doc_id, r.shard_id, r.shard_pos)
        for r in assign_shards(d, 8, seed="s2")
        .select("doc_id", "shard_id", "shard_pos")
        .collect()
    }
    assert other != got
    # export: one dir per shard, rows inside in shuffle order
    path = str(tmp_path / "shards")
    export_shards(d, path, 4, seed="s")
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert {r.shard_id for r in back.select("shard_id").distinct().collect()} == {
        0, 1, 2, 3,
    }


def test_redact_pii_counts_and_text(spark):
    from hbase_rdf_spark.ops.text import redact_pii

    rows = [
        (1, "write to bob.smith+x@corp.example.org today"),
        (2, "ssn 123-45-6789 phone +1-555-0142 host 192.168.0.7"),
        (3, "no pii here at all"),
        # ssn-shaped substring INSIDE a phone must not double-count:
        # phone runs after ssn, ssn's 3-2-4 shape never matches +NN-NNN-NNNN
        (4, "+49-123-4567 and 10.0.0.1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[1].n_email == 1 and "<EMAIL>" in out[1].red_text
    assert "bob" not in out[1].red_text
    assert (out[2].n_ssn, out[2].n_phone, out[2].n_ipv4) == (1, 1, 1)
    assert out[2].red_text == "ssn <SSN> phone <PHONE> host <IPV4>"
    assert (out[3].n_email, out[3].n_ssn, out[3].n_phone, out[3].n_ipv4) == (
        0, 0, 0, 0,
    )
    assert (out[4].n_ssn, out[4].n_phone, out[4].n_ipv4) == (0, 1, 1)


def test_benchmark_contamination_overlap(spark):
    from hbase_rdf_spark.ops.contamination import benchmark_contamination

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),   # fully contained
            (2, "alpha beta gamma zeta eta theta"),  # 1 of 4 grams match
            (3, "iota kappa lambda mu"),             # no overlap
            (4, "xy"),                               # < n tokens → no row
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in benchmark_contamination(
            corpus, bench, n=3, threshold=0.5
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1].n_grams == 3 and out[1].n_matched == 3
    assert out[1].contaminated == 1
    assert out[2].n_grams == 4 and out[2].n_matched == 1
    assert out[2].contaminated == 0
    assert out[3].n_matched == 0 and out[3].contaminated == 0


def test_repetition_features_hand_computed(spark):
    from hbase_rdf_spark.ops.text import repetition_features

    rows = [
        (1, "a a a b"),        # 4 toks, 2 distinct; 2grams: [a a, a a, a b]
        (2, "x y z"),          # all distinct
        (3, ""),               # empty → all zeros
        (4, "solo"),           # 1 token → no 2grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_features(df).collect()}
    r1 = out[1]
    assert r1.rep_tokens == 4
    assert r1.rep_dup_token_frac == 0.5
    assert r1.rep_top_token_frac == 0.75
    assert r1.rep_dup_2gram_frac == round(1 / 3, 6)
    assert r1.rep_top_2gram_frac == round(2 / 3, 6)
    r2 = out[2]
    assert r2.rep_dup_token_frac == 0.0
    assert r2.rep_top_token_frac == round(1 / 3, 6)
    assert out[3].rep_tokens == 0 and out[3].rep_top_token_frac == 0.0
    assert out[4].rep_dup_2gram_frac == 0.0 and out[4].rep_top_2gram_frac == 0.0


def test_prep_training_data_end_to_end(spark):
    from hbase_rdf_spark.ops.prep import prep_training_data

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "to the old stone bridge by the river in the quiet morning light"
    )
    rows = [
        (1, base, "web"),
        (2, base, "web"),                        # exact dup of 1 → dropped
        (3, base.replace("dog", "cat"), "web"),  # near dup of 1 → dropped
        (4, "spam spam spam spam spam spam spam spam", "web"),  # repetitive
        (5, "the fast red train and the long iron rail cross the wide "
            "green valley under a pale sky write me at a.b@c.example.com",
            "books"),
        (6, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi", "bench_overlap"),   # contaminated vs bench
        (7, "the small grey mouse hides under the warm wooden floor of "
            "the house near the garden wall every single day", "books"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    out, stats = prep_training_data(
        docs,
        bench=bench,
        minhash_threshold=0.5,
        min_quality=0.3,
        max_top_2gram_frac=0.5,
        contamination_threshold=0.3,
        mixture={"web": 1.0, "books": 1.0},  # drops unreviewed strata
        n_shards=2,
        collect_stats=True,
    )
    got = {r.doc_id: r for r in out.collect()}
    # 2 exact-dup, 3 near-dup, 4 repetition, 6 contamination,
    # plus doc 6's stratum is absent from the mixture anyway
    assert set(got) == {1, 5, 7}
    assert stats["input"] == 7
    assert stats["exact_dedup"] == 6
    assert stats["near_dedup"] == 5
    assert stats["quality_filter"] == 4
    assert stats["decontaminate"] == 3
    assert stats["pii_redact"] == 3
    # PII scrubbed, schema carries shard assignment
    assert "<EMAIL>" in got[5].text and "a.b@" not in got[5].text
    assert {"shard_id", "shard_pos"} <= set(out.columns)
    # deterministic: same seed → identical result set
    out2, _ = prep_training_data(
        docs, bench=bench, minhash_threshold=0.5, min_quality=0.3,
        max_top_2gram_frac=0.5, contamination_threshold=0.3,
        mixture={"web": 1.0, "books": 1.0}, n_shards=2,
    )
    assert {tuple(r) for r in out2.collect()} == {tuple(r) for r in out.collect()}


def test_chunk_documents_overlap_and_remainder(spark):
    from hbase_rdf_spark.ops.packing import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    out = sorted(
        chunk_documents(df, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: (r.doc_id, r.chunk_idx),
    )
    got = [
        (r.doc_id, r.chunk_idx, r.tok_start, r.n_chunk_tokens, r.chunk_text)
        for r in out
    ]
    assert got == [
        (1, 0, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 3, 4, "t3 t4 t5 t6"),
        (1, 2, 6, 4, "t6 t7 t8 t9"),
        (2, 0, 0, 2, "a b"),   # short doc → one whole-doc chunk
    ]                          # empty doc → no rows
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_quantized_topk_recall_vs_exact(spark):
    import math
    import random

    from hbase_rdf_spark.ops.similarity import (
        cosine_topk_bruteforce,
        quantize_embeddings,
        quantized_topk,
    )

    rng = random.Random(7)

    def unit():
        v = [rng.gauss(0, 1) for _ in range(16)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    # unit-norm vectors: dot == cosine, so any top-k disagreement below
    # is quantization error alone
    rows = [(i, unit()) for i in range(100)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter("vec_id < 4").selectExpr(
        "vec_id as query_id", "embedding"
    )
    # int8 range + dequant error bound per coordinate: |x - s*q| <= s/2
    qz = quantize_embeddings(emb).collect()
    for r in qz:
        assert all(-127 <= q <= 127 for q in r.q_vec)
        for x, q in zip(r.embedding, r.q_vec):
            assert abs(x - r.q_scale * q) <= r.q_scale / 2 + 1e-12
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk_bruteforce(emb, queries, k=10).collect()
    }
    quant = {
        (r.query_id, r.vec_id)
        for r in quantized_topk(emb, queries, k=10, dim=16).collect()
    }
    # on unit vectors the only disagreement source is int8 rounding
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.9, recall


def test_ivf_topk_finds_planted_clusters(spark):
    import random

    from hbase_rdf_spark.ops.similarity import (
        cosine_topk_bruteforce,
        ivf_topk,
        kmeans_fit,
    )

    # planted structure: 4 well-separated directions, 25 vectors each
    rng = random.Random(3)
    centers = [[10.0 if i == c else 0.0 for i in range(8)] for c in range(4)]
    rows = []
    for j in range(100):
        c = centers[j % 4]
        rows.append((j, [x + rng.gauss(0, 0.5) for x in c]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(emb, n_cells=4, iterations=5, seed="t")
    assert len(cents) == 4 and all(len(c) == 8 for c in cents)
    q = emb.filter("vec_id < 4").selectExpr("vec_id as query_id", "embedding")
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk_bruteforce(emb, q, k=10).collect()
    }
    # planted clusters are far apart → probing ONE cell of four must
    # recover the exact neighborhood completely
    approx = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(emb, q, cents, k=10, nprobe=1, dim=8).collect()
    }
    assert approx == exact


def test_png_kernel_roundtrip_filters_and_color(spark):
    import struct
    import zlib
    import binascii

    import numpy as np

    from hbase_rdf_spark.ops.multimodal import PngKernel

    kern = PngKernel()
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(13, 17)).astype(np.float32)
    # grayscale round-trip through our own filter-0 encoder
    back = kern.decode(kern.encode(img))
    assert np.array_equal(back, img)

    # hand-filter rows with ALL five filter types, decode must invert
    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", binascii.crc32(typ + data) & 0xFFFFFFFF))

    g = img.astype(np.int32)
    h, w = g.shape
    raws = []
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        f = y % 5
        cur = g[y]
        filt = np.empty(w, dtype=np.int32)
        for i in range(w):
            a = int(cur[i - 1]) if i >= 1 else 0
            b = int(prev[i])
            c = int(prev[i - 1]) if i >= 1 else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2}.get(f)
            if pred is None:  # paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            filt[i] = (int(cur[i]) - pred) & 0xFF
        raws.append(bytes([f]) + filt.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(b"".join(raws)))
           + chunk(b"IEND", b""))
    assert np.array_equal(kern.decode(png), img)

    # RGB color type 2 → BT.601 luma
    rgb = rng.integers(0, 256, size=(5, 4, 3)).astype(np.uint8)
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(5))
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    luma = rgb.astype(np.float32) @ np.array([0.299, 0.587, 0.114], "float32")
    assert np.allclose(kern.decode(png), luma, atol=1e-3)


def test_gif_kernel_lzw_roundtrip_and_real_file(spark):
    import base64

    import numpy as np

    from hbase_rdf_spark.ops.multimodal import GifKernel

    kern = GifKernel()
    luma_w = np.array([0.299, 0.587, 0.114], "float32")
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(23, 31)).astype(np.float32)
    # gray palette → luma of (v,v,v) == v up to float error
    back = kern.decode(kern.encode(img))
    want = img[..., None].repeat(3, -1).astype(np.float32) @ luma_w
    assert np.allclose(back, want, atol=1e-3)
    # long runs exercise deep LZW dictionary chains
    img2 = np.tile(
        np.arange(8, dtype=np.float32).repeat(16), (40, 1)
    )[:, :100]
    want2 = img2[..., None].repeat(3, -1) @ luma_w
    assert np.allclose(kern.decode(kern.encode(img2)), want2, atol=1e-3)
    # a REAL file from the wild: the canonical 1x1 transparent GIF —
    # validates header/color-table/LZW against an external encoder
    one = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    out = kern.decode(one)
    assert out.shape == (1, 1) and float(out[0, 0]) == 0.0


def test_jpeg_kernel_roundtrip_and_features(spark):
    import numpy as np

    from hbase_rdf_spark.ops.multimodal import JpegKernel

    kern = JpegKernel()
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(21, 37)).astype(np.float32)
    back = kern.decode(kern.encode(img))
    # unit quant table → per-pixel error bounded by rounding (< 1.5)
    assert back.shape == img.shape
    assert float(np.abs(back - img).max()) < 1.5
    # non-multiple-of-8 sizes pad then crop exactly
    flat = np.full((9, 10), 200.0, dtype=np.float32)
    assert np.allclose(kern.decode(kern.encode(flat)), flat, atol=0.5)
    # progressive / non-JPEG inputs raise cleanly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        kern.decode(b"\x89PNG\r\n\x1a\n")


def test_jpeg_color_420_decodes_luma(spark):
    import struct

    import numpy as np

    from hbase_rdf_spark.ops import jpeg as J

    # hand-build a 16x16 YCbCr 4:2:0 baseline JPEG: 1 MCU = 4 Y blocks
    # + 1 Cb + 1 Cr, unit quant, our canonical tables
    rng = np.random.default_rng(21)
    y = rng.integers(0, 256, size=(16, 16)).astype(np.float32)
    cb = np.full((8, 8), 128.0, dtype=np.float32)
    cr = np.full((8, 8), 90.0, dtype=np.float32)
    dc = J._codes(J._DC_BITS, J._DC_VALS)
    ac = J._codes(J._AC_BITS, J._AC_VALS)
    bw = J._BitWriter()
    pred = {1: 0, 2: 0, 3: 0}
    for by in range(2):          # Y blocks in raster order inside MCU
        for bx in range(2):
            pred[1] = J._encode_block(
                bw, y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                pred[1], dc, ac,
            )
    pred[2] = J._encode_block(bw, cb, pred[2], dc, ac)
    pred[3] = J._encode_block(bw, cr, pred[3], dc, ac)
    bw.flush()

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    q = np.ones(64, dtype=np.uint8)
    out = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + q.tobytes())
        + seg(0xC0, struct.pack(">BHHB", 8, 16, 16, 3)
              + b"\x01\x22\x00" + b"\x02\x11\x00" + b"\x03\x11\x00")
        + seg(0xC4, b"\x00" + bytes(J._DC_BITS) + J._DC_VALS
              + b"\x10" + bytes(J._AC_BITS) + J._AC_VALS)
        + seg(0xDA, b"\x03" + b"\x01\x00\x02\x00\x03\x00"
              + b"\x00\x3f\x00")
        + bytes(bw.out) + b"\xff\xd9"
    )
    back = J.decode_luma(out)
    assert back.shape == (16, 16)
    assert float(np.abs(back - y).max()) < 1.5


def test_default_kernel_sniffs_real_formats(spark):
    import numpy as np

    from hbase_rdf_spark.ops.multimodal import (
        HashStubKernel,
        PngKernel,
        SniffingKernel,
    )

    img = np.arange(64, dtype=np.float32).reshape(8, 8) * 3
    png = PngKernel().encode(img)
    sniff = SniffingKernel()
    # real format → real decode (exact PNG round-trip), not the stub
    assert np.array_equal(sniff.decode(png), img)
    assert not np.array_equal(
        HashStubKernel().decode(png), sniff.decode(png)
    )
    # unknown payload → deterministic stub fallback
    fake = b"\x00\x01noformat"
    assert np.array_equal(
        sniff.decode(fake), HashStubKernel().decode(fake)
    )


def test_ivf_topk_string_query_ids(spark):
    # ADVICE r2: the probe-table schema must follow the caller's id
    # type — string query ids crashed the hardcoded "query_id long"
    from hbase_rdf_spark.ops.similarity import ivf_topk, kmeans_fit

    centers = [[10.0 if i == c else 0.0 for i in range(4)] for c in range(2)]
    rows = [(j, [x + (j % 3) * 0.1 for x in centers[j % 2]]) for j in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(emb, n_cells=2, iterations=3, seed="s")
    q = emb.filter("vec_id < 2").selectExpr(
        "concat('q', vec_id) as query_id", "embedding"
    )
    got = ivf_topk(emb, q, cents, k=3, nprobe=1, dim=4).collect()
    assert {r.query_id for r in got} == {"q0", "q1"}
    assert all(isinstance(r.query_id, str) for r in got)


def test_video_avi_roundtrip_and_real_frame_sampling(spark):
    """MJPEG-in-AVI real path: mux → demux roundtrip preserves frames,
    dims, fps; sample_frames decodes REAL frame content (hash is
    container-invariant); extract_features sniffs the AVI kernel."""
    import numpy as np

    from hbase_rdf_spark.ops.jpeg import decode_luma
    from hbase_rdf_spark.ops.multimodal import extract_features, sample_frames
    from hbase_rdf_spark.ops.video import demux_avi, mux_avi, synthesize_avi

    payload = synthesize_avi(asset_id=7, n_frames=6, width=32, height=24, fps=4)
    stream = demux_avi(payload)
    assert len(stream.frames) == 6
    assert (stream.width, stream.height) == (32, 24)
    assert stream.fps == 4.0
    assert stream.duration_ms == 1500

    assets = spark.createDataFrame(
        [
            (7, "video", bytearray(payload), (32, 24, 0, stream.duration_ms)),
            # non-AVI payload keeps the deterministic stub path
            (8, "video", bytearray(b"\x00" * 64), (0, 0, 0, 2000)),
        ],
        "asset_id bigint, modality string, media binary, "
        "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>",
    )
    got = {
        (r["asset_id"], r["frame_idx"]): r["frame_hash"]
        for r in sample_frames(assets, every_ms=1000).collect()
    }
    # fps=4, every 1000 ms → every 4th frame: indexes 0 and 4
    assert {k for k in got if k[0] == 7} == {(7, 0), (7, 4)}
    assert {k for k in got if k[0] == 8} == {(8, 0), (8, 1)}
    # content hash: identical frames re-muxed at a different fps hash
    # identically (frame 0 of both containers is the same image)
    remux = mux_avi(list(stream.frames), 32, 24, fps=1)
    got2 = {
        (r["asset_id"], r["frame_idx"]): r["frame_hash"]
        for r in sample_frames(
            spark.createDataFrame(
                [(7, "video", bytearray(remux), (32, 24, 0, 6000))],
                "asset_id bigint, modality string, media binary, "
                "meta struct<width:int, height:int, sample_rate:int, "
                "duration_ms:int>",
            ),
            every_ms=1000,
        ).collect()
    }
    assert got2[(7, 0)] == got[(7, 0)]

    # extract_features routes video → AviMjpegKernel: feature equals the
    # pooled first-frame luma
    feats = {r["asset_id"]: r for r in extract_features(assets, feature_dim=8).collect()}
    luma0 = decode_luma(stream.frames[0])
    expect = (np.resize(luma0.mean(axis=0), 8) / 255.0).astype(np.float32)
    assert np.allclose(np.array(feats[7]["feature"], dtype=np.float32), expect)


def test_prep_substring_budget_stage(spark):
    from hbase_rdf_spark.ops.prep import prep_training_data

    boiler = (
        "all rights reserved worldwide under applicable law and treaty "
        "two thousand twenty four all rights reserved worldwide again"
    )
    rows = [
        # mostly boilerplate (shared with doc 2) + tiny unique tail
        (1, boiler + " unique tail one", "web"),
        (2, boiler + " other ending two", "web"),
        # unique long document — no duplicated spans
        (3, "the small grey mouse hides under the warm wooden floor of "
            "the house near the garden wall every single day in spring",
            "web"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    out, stats = prep_training_data(
        docs,
        max_dup_span_frac=0.5,
        dup_span_window=30,
        minhash_threshold=0.95,  # keep near-dedup out of the way
        min_quality=0.0,
        max_top_2gram_frac=1.0,
        collect_stats=True,
    )
    kept = {r.doc_id for r in out.collect()}
    # docs 1/2 share ≥ half their chars as duplicated spans → dropped;
    # doc 3 has no duplicated windows → kept
    assert kept == {3}
    assert stats["substring_dedup"] == 1
    # without the budget the stage is skipped entirely
    out2, stats2 = prep_training_data(
        docs,
        minhash_threshold=0.95,
        min_quality=0.0,
        max_top_2gram_frac=1.0,
        collect_stats=True,
    )
    assert "substring_dedup" not in stats2
