"""Similarity search over embedding columns (array<float>).

Two tiers:

- :func:`cosine_topk_bruteforce` — exact top-k by full cross scoring.
  JVM-only math (``zip_with`` + ``aggregate``), broadcast of the query
  set. The correctness baseline; O(N·Q) — fine when Q is small even at
  huge N because the scan is embarrassingly parallel and nothing
  shuffles except the per-partition top-k (TakeOrderedAndProject).
- :func:`lsh_topk` — random-hyperplane (sign) LSH bucketing: vectors
  shuffle only their 32-bit bucket signature per table; candidates are
  exactly re-scored. The 100 TB path: probes touch a vanishing fraction
  of rows.

Hyperplanes are generated from a fixed seed with a splitmix64-based
generator so plans are deterministic run-to-run (no Math.random in the
plan — required for resume semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Dot product as an unrolled multiply-add chain.

    Higher-order functions (aggregate/zip_with) are interpreted per
    element in Spark — they break whole-stage codegen. With a known
    ``dim``, an explicit ``a[1]*b[1] + … + a[d]*b[d]`` expression stays
    inside codegen and runs ~10× faster on all-pairs scoring. The
    left-to-right add order matches the sequential fold of :func:`_dot`,
    so results are bit-identical.
    """
    expr = None
    for i in range(1, dim + 1):
        term = F.element_at(a, i) * F.element_at(b, i)
        expr = term if expr is None else expr + term
    return expr


def _dot_lit(vec: Column, weights) -> Column:
    """Codegen-friendly dot of a vector column with literal weights."""
    expr = None
    for i, w in enumerate(weights):
        term = F.element_at(vec, i + 1) * float(w)
        expr = term if expr is None else expr + term
    return expr


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries``: (query_id, embedding). Broadcast-joined against the
    vector table; ranked per query with a deterministic tie-break on
    neighbor id. Returns (query_id, vec_id, score, rank).
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    scored = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v_vec")
    ).crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("v_vec"), F.col("q_vec")), 9).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes (splitmix64 → uniform)."""
    out = np.empty((n_bits, dim), dtype=np.float64)
    state = np.uint64(seed)
    vals = []
    for _ in range(n_bits * dim):
        state = np.uint64((int(state) + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        z = int(state)
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        z = z ^ (z >> 31)
        vals.append(z / 2**64 - 0.5)
    out[:] = np.array(vals).reshape(n_bits, dim)
    return out


def _bucket_expr(vec_col: str, dim: int, n_bits: int, seed: int) -> Column:
    """Sign-LSH bucket id as a pure codegen expression (unrolled dots)."""
    planes = _hyperplanes(dim, n_bits, seed)
    sig = F.lit(0).cast("long")
    for b in range(n_bits):
        bit = F.when(
            _dot_lit(F.col(vec_col), planes[b]) >= 0, F.lit(1 << b)
        ).otherwise(F.lit(0))
        sig = sig.bitwiseOR(bit)
    return sig


def signatures(
    vectors: DataFrame,
    dim: int,
    n_bits: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append a sign-LSH bucket id column (one int per row, JVM math)."""
    return vectors.withColumn("bucket", _bucket_expr(vec_col, dim, n_bits, seed))


def multi_table_buckets(
    df: DataFrame,
    dim: int,
    n_bits: int,
    n_tables: int,
    vec_col: str,
    seed0: int = 42,
) -> DataFrame:
    """Explode each row into ``n_tables`` (tbl, bucket) rows in ONE pass.

    All n_tables × n_bits plane projections run as a single numpy
    matmul inside an Arrow-batched pandas UDF — one vector-table scan,
    one (n × dim) @ (dim × T·B) GEMM per batch. (A pure column-expr
    unrolling was tried first: 2048-term Add trees blow up Catalyst
    analysis time; a vectorized UDF is the idiomatic escape hatch.)
    Plane matrices are seed-deterministic (splitmix64), so bucket ids
    are stable across runs/retries — required for resumability.
    """
    from pyspark.sql.functions import pandas_udf

    flat = np.concatenate(
        [_hyperplanes(dim, n_bits, seed0 + 1000 * t) for t in range(n_tables)]
    )  # (T·B, dim)
    weights = (1 << np.arange(n_bits)).astype(np.int64)
    n_t, n_b = n_tables, n_bits

    @pandas_udf("array<long>")
    def _buckets(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        m = np.array([np.asarray(x, dtype=np.float64) for x in v])
        proj = m @ flat.T  # (n, T·B)
        bits = (proj >= 0).reshape(len(v), n_t, n_b)
        bucks = (bits * weights).sum(axis=2).astype(np.int64)
        return pd.Series(list(bucks))

    return (
        df.withColumn("_bk", _buckets(F.col(vec_col)))
        .select("*", F.posexplode("_bk").alias("tbl", "bucket"))
        .drop("_bk")
    )


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: multi-table sign-LSH bucket join + exact rescore.

    Each of ``n_tables`` independent hash tables contributes candidates
    whose bucket matches the query's; one broadcast join over the
    exploded (tbl, bucket) rows → exact cosine on the deduped candidate
    set → top-k.
    """
    v = multi_table_buckets(
        vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v_vec")),
        dim, n_bits, n_tables, "v_vec",
    )
    q = multi_table_buckets(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        ),
        dim, n_bits, n_tables, "q_vec",
    )
    cand = (
        v.join(F.broadcast(q), ["tbl", "bucket"])
        .select("query_id", "vec_id", "v_vec", "q_vec")
        .dropDuplicates(["query_id", "vec_id"])
    )
    na = F.sqrt(dot_unrolled(F.col("v_vec"), F.col("v_vec"), dim))
    nb = F.sqrt(dot_unrolled(F.col("q_vec"), F.col("q_vec"), dim))
    scored = cand.select(
        "query_id",
        "vec_id",
        F.round(
            dot_unrolled(F.col("v_vec"), F.col("q_vec"), dim) / (na * nb), 9
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q_vec",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization for the ANN storage path.

    ``scale = max|x| / 127``, ``q_i = floor(x_i/scale + 0.5)`` — HALF-UP
    rounding written as floor(+0.5) because Spark and the DuckDB oracle
    implement it identically (library round() functions differ on .5
    ties). 4× less memory/scan bandwidth for the 100 TB vector table;
    dots of quantized vectors are INTEGER sums (exact in double in any
    summation order), so scoring is reproducible cross-engine
    bit-for-bit. All codegen column expressions — no UDF, no shuffle.
    """
    v = F.col(vec_col).cast("array<double>")
    scale = (
        F.greatest(
            F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(1e-30)
        )
        / F.lit(127.0)
    )
    out = df.withColumn(scale_col, scale)
    return out.withColumn(
        out_col,
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.floor(x / F.col(scale_col) + F.lit(0.5)).cast("int"),
        ),
    )


def quantized_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k by DEQUANTIZED dot product over int8 vectors.

    ``score = s_v · s_q · (q_v · q_q)`` — the integer dot is exact, the
    two scale multiplies are the only float ops, so results are
    engine-portable. With ``dim`` given the dot unrolls into a codegen
    multiply-add chain (see :func:`dot_unrolled`). Same broadcast +
    per-partition-top-k shape as :func:`cosine_topk_bruteforce`.
    """
    qv = quantize_embeddings(vectors, vec_col).select(
        F.col(id_col).alias("vec_id"),
        F.col("q_vec").alias("v_q"),
        F.col("q_scale").alias("v_s"),
    )
    qq = quantize_embeddings(queries, vec_col).select(
        F.col(query_id_col).alias("query_id"),
        F.col("q_vec").alias("qq_q"),
        F.col("q_scale").alias("qq_s"),
    )
    if dim is not None:
        idot = dot_unrolled(F.col("v_q"), F.col("qq_q"), dim)
    else:
        idot = F.aggregate(
            F.zip_with(F.col("v_q"), F.col("qq_q"), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
    scored = qv.crossJoin(F.broadcast(qq)).select(
        "query_id",
        "vec_id",
        F.round(F.col("v_s") * F.col("qq_s") * idot, 9).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# -- IVF (inverted-file) ANN --------------------------------------------------
# The third scale tier: k-means-partitioned vector table; queries probe
# only the nprobe nearest cells, so scoring touches ~nprobe/n_cells of
# the corpus. Complements sign-LSH (data-independent buckets) with a
# data-adaptive partitioning — the FAISS IVF-Flat shape on DataFrames.


def _assign_cells(df: DataFrame, centroids, vec_col: str, out: str) -> DataFrame:
    """Add the nearest-centroid index via ONE numpy GEMM per Arrow
    batch (argmin ||v-c||² = argmax (v·c - ||c||²/2)) — a k×dim
    expression bank would blow up the Catalyst tree (see lsh banks)."""
    import numpy as np

    c = np.asarray(centroids, dtype=np.float64)         # (k, dim)
    half_sq = 0.5 * (c * c).sum(axis=1)                  # (k,)
    from pyspark.sql.types import IntegerType, StructField, StructType

    cols = df.columns
    # fresh StructType — StructType.add mutates the df's cached schema
    schema = StructType(
        list(df.schema.fields) + [StructField(out, IntegerType())]
    )

    def gen(batches):
        for pdf in batches:
            m = np.vstack(pdf[vec_col].to_numpy())       # (n, dim)
            cell = np.argmax(m @ c.T - half_sq, axis=1)
            pdf = pdf.copy()
            pdf[out] = cell.astype("int32")
            yield pdf

    return df.mapInPandas(gen, schema=schema)[*cols, out]


def kmeans_fit(
    vectors: DataFrame,
    n_cells: int = 16,
    iterations: int = 5,
    seed: str = "ivf0",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd's k-means over a vector DataFrame; returns the centroid
    list (k × dim, driver-side — kilobytes, the legitimate small side).

    Init: the ``n_cells`` rows with smallest ``xxhash64(seed, id)`` — a
    deterministic uniform sample, no Math.random in the plan. Each
    round: assignment via the batched GEMM (no shuffle), then a
    combinable explode+groupBy mean per (cell, dim) — k·dim rows back
    to the driver per round. Empty cells keep their previous centroid.
    """
    # spherical k-means: unit-normalize so cells align with COSINE
    # neighborhoods (plain Lloyd cells track magnitude, not direction)
    raw = F.col(vec_col).cast("array<double>")
    # greatest(…, tiny) guards all-zero vectors: x/0 is NULL in Spark
    # and NULL elements would crash the numpy GEMM downstream.
    # The norm binds to an attribute BEFORE the normalize transform:
    # an inline aggregate referenced inside the lambda re-evaluates
    # per element (no CSE inside HOFs) — O(dim²) per row
    nrm = F.greatest(
        F.sqrt(F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x)),
        F.lit(1e-30),
    )
    base = vectors.select(
        F.col(id_col).alias("_id"), raw.alias("_raw"), nrm.alias("_nrm")
    ).select(
        "_id",
        F.transform(F.col("_raw"), lambda x: x / F.col("_nrm")).alias("_v"),
    )
    import zlib

    import numpy as np

    # k-means++ seeding over a deterministic hash-ordered sample —
    # random init splits/merges true clusters; ++ spreads the seeds
    # (Arthur & Vassilvitskii SODA'07). Sample size is driver-bounded.
    n_samp = min(max(50 * n_cells, 1000), 100_000)
    samp = (
        base.withColumn(
            "_h", F.xxhash64(F.lit(str(seed)), F.col("_id").cast("string"))
        )
        .orderBy("_h", "_id")
        .limit(n_samp)
        .select("_v")
        .collect()
    )
    if len(samp) < n_cells:
        raise ValueError(
            f"need >= {n_cells} vectors to fit {n_cells} cells"
        )
    X = np.asarray([r._v for r in samp], dtype=np.float64)
    rng = np.random.default_rng(zlib.crc32(str(seed).encode()))
    chosen = [0]  # first seed: smallest-hash row (deterministic)
    d2 = ((X - X[0]) ** 2).sum(axis=1)
    for _ in range(1, n_cells):
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        nxt = int(rng.choice(len(X), p=probs))
        chosen.append(nxt)
        d2 = np.minimum(d2, ((X - X[nxt]) ** 2).sum(axis=1))
    centroids = [list(X[i]) for i in chosen]
    for _ in range(iterations):
        assigned = _assign_cells(base, centroids, "_v", "_cell")
        means = (
            assigned.select("_cell", F.posexplode("_v").alias("_d", "_x"))
            .groupBy("_cell", "_d")
            .agg(F.avg("_x").alias("_m"))
            .collect()
        )
        nxt = [list(c) for c in centroids]  # empty cells keep position
        for r in means:
            nxt[r._cell][r._d] = r._m
        # renormalize (spherical update: mean direction of members)
        import math

        centroids = []
        for c in nxt:
            n = math.sqrt(sum(x * x for x in c)) or 1.0
            centroids.append([x / n for x in c])
    return centroids


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids,
    k: int = 10,
    nprobe: int = 4,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-Flat search: probe the ``nprobe`` nearest cells per query,
    exact-rescore only those cells' vectors, take top-k by cosine.

    The corpus side is assigned once (batched GEMM, no shuffle) and
    joined on ``cell`` against the broadcast (query, probe-cell) list —
    candidates ∝ nprobe/n_cells of the table. Same output shape as
    :func:`cosine_topk_bruteforce`.
    """
    import numpy as np

    d = dim or len(centroids[0])
    # unit centroids: argmax v·c == nearest by angle, any |v| (spherical)
    c = np.asarray(centroids, dtype=np.float64)
    c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-30)
    centroids = c.tolist()
    v = _assign_cells(
        vectors.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v_vec"),
        ),
        centroids, "v_vec", "cell",
    )
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    ).collect()  # the broadcast side by contract (queries are few)
    probe_rows = []
    for r in qrows:
        scores = np.asarray(r.q_vec) @ c.T
        for cell in np.argsort(-scores)[:nprobe]:
            probe_rows.append((r.query_id, int(cell), list(r.q_vec)))
    spark = vectors.sparkSession
    # query_id keeps the caller's id type (string ids crash a hardcoded
    # "long" schema — ADVICE r2; sibling APIs accept any id type)
    import pyspark.sql.types as T

    qid_type = queries.schema[query_id_col].dataType
    probes = spark.createDataFrame(
        probe_rows,
        T.StructType([
            T.StructField("query_id", qid_type),
            T.StructField("cell", T.IntegerType()),
            T.StructField("q_vec", T.ArrayType(T.DoubleType())),
        ]),
    )
    cand = v.join(F.broadcast(probes), "cell").select(
        "query_id", "vec_id", "v_vec", "q_vec"
    )
    na = F.sqrt(dot_unrolled(F.col("v_vec"), F.col("v_vec"), d))
    nb = F.sqrt(dot_unrolled(F.col("q_vec"), F.col("q_vec"), d))
    scored = cand.select(
        "query_id",
        "vec_id",
        F.round(
            dot_unrolled(F.col("v_vec"), F.col("q_vec"), d) / (na * nb), 9
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
