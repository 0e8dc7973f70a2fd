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
from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


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


def signatures(
    vectors: DataFrame,
    dim: int,
    n_bits: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append a sign-LSH bucket id column (one int per row, JVM math)."""
    planes = _hyperplanes(dim, n_bits, seed)
    sig = F.lit(0).cast("long")
    for b in range(n_bits):
        plane = F.array(*[F.lit(float(x)) for x in planes[b]])
        bit = F.when(_dot(F.col(vec_col), plane) >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = sig.bitwiseOR(bit)
    return vectors.withColumn("bucket", sig)


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
    whose bucket matches the query's; union → exact cosine → top-k.
    """
    cand = None
    for t in range(n_tables):
        v = signatures(vectors, dim, n_bits, seed=42 + 1000 * t, vec_col=vec_col)
        q = signatures(
            queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col)),
            dim, n_bits, seed=42 + 1000 * t, vec_col=vec_col,
        ).select("query_id", F.col(vec_col).alias("q_vec"), "bucket")
        c = v.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v_vec"), "bucket"
        ).join(F.broadcast(q), "bucket").select("query_id", "vec_id", "v_vec", "q_vec")
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.dropDuplicates(["query_id", "vec_id"])
    scored = cand.select(
        "query_id", "vec_id", F.round(cosine("v_vec", "q_vec"), 9).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
