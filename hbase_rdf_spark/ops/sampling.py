"""Deterministic sampling operators for training-corpus curation.

Corpus assembly needs samples that are REPRODUCIBLE across reruns,
retries and repartitioning — ``df.sample()`` is none of those (it
seeds per partition, so a fetch-failure retry or an upstream
repartition changes the selected rows; the SPARK-23207 class of bug).
Both operators here derive the sampling decision from a keyed hash of
the ROW ID, so the sample is a pure function of (data, seed):

- ``stratified_sample``: exact k rows per stratum, smallest keyed
  hashes win. The ``rank <= k`` filter over ``row_number`` lowers to
  Spark's WindowGroupLimit physical rule — every map task pre-prunes
  to its local top-k per stratum BEFORE the shuffle, so the full
  stratum never converges on one task (the naive window-sort trap).
- ``sample_fraction``: keep a row iff its keyed hash falls below the
  fraction threshold — a map-only filter, no shuffle at all, stable
  under any execution order. Mirrors the reference's deterministic
  id-hash partitioning idea (util/SPOHash.java) applied to sampling.

``portable=True`` swaps xxhash64 for an md5-derived key a SQL oracle
(DuckDB) can replay bit-for-bit; the default stays on the cheaper
JVM xxhash64 — same plan shape, same statistical behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_SEP = "\x1f"  # unit separator: cannot appear in ids or seeds


def _sample_key(seed: str, id_col: str, portable: bool) -> Column:
    tagged = F.concat_ws(_SEP, F.lit(str(seed)), F.col(id_col).cast("string"))
    return F.md5(tagged) if portable else F.xxhash64(tagged)


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    seed: str = "s0",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, deterministically.

    Rows are ranked inside each stratum by a keyed hash of their id
    (ties by id — total order, so the sample is unique) and the k
    smallest survive, with the rank exposed as ``sample_rank``. One
    shuffle on the strata key; map-side WindowGroupLimit keeps a
    mega-stratum from funneling through a single sort.
    """
    key = _sample_key(seed, id_col, portable)
    w = Window.partitionBy(*strata_cols).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def sample_fraction(
    df: DataFrame,
    fraction: float,
    seed: str = "s0",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Keep ~``fraction`` of rows by keyed-hash threshold — map-only.

    The decision is per-row and independent of partitioning, so the
    SAME rows survive on every rerun, any cluster size, and any retry;
    samples at different fractions nest (f1 < f2 → sample(f1) ⊆
    sample(f2)), which gives consistent scaling-ladder subsets for
    data-mixture experiments.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction == 1.0:
        return df
    if portable:
        # first 15 hex chars = 60 uniform bits; lexicographic compare
        # on fixed-width hex == numeric compare, and a SQL oracle can
        # replay it with substr(md5(..)) against the same literal
        bound = format(int(fraction * 16**15), "015x")
        key = F.substring(_sample_key(seed, id_col, True), 1, 15)
        return df.filter(key < F.lit(bound))
    bound = int((fraction - 0.5) * 2**64)  # xxhash64 is signed
    return df.filter(_sample_key(seed, id_col, False) < F.lit(bound))


def mixture_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    seed: str = "s0",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Per-stratum keep fractions — the data-mixture reweighting step.

    ``fractions`` maps stratum value → keep probability; strata absent
    from the map are DROPPED (explicit is better than silently keeping
    an unreviewed source at 100%). The per-stratum hash *threshold* is
    precomputed on the driver and shipped as a tiny literal map, so the
    whole operator is ONE codegen filter over the scan — zero shuffles,
    and the same row survives at any parallelism (the `sample_fraction`
    guarantee, per stratum). Mixtures at scaled-down fractions nest,
    which keeps ablation corpora subsets of the full mix.
    """
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    if portable:
        # v=1.0 would need a 16-char bound; 'g' sorts above every hex
        # char, so it is the lexicographic +infinity for a 15-char key
        bounds = {
            k: "g" if v == 1.0 else format(int(v * 16**15), "015x")
            for k, v in fractions.items()
        }
        key = F.substring(_sample_key(seed, id_col, True), 1, 15)
    else:
        # clamp: fraction 1.0 would land exactly on 2^63 (not a long)
        bounds = {
            k: min(int((v - 0.5) * 2**64), 2**63 - 1)
            for k, v in fractions.items()
        }
        key = _sample_key(seed, id_col, False)
    mapping = F.create_map(
        *[F.lit(x) for kv in bounds.items() for x in kv]
    )
    # absent stratum → null bound → null predicate → row filtered out
    return df.filter(key < mapping[F.col(strata_col)])


def assign_shards(
    df: DataFrame,
    n_shards: int,
    seed: str = "s0",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Deterministic global shuffle + sharding for training export.

    Adds ``shard_id`` (keyed-hash mod ``n_shards``) and ``shard_pos``
    (the row's rank inside its shard by the same hash, ties by id) —
    together a stable pseudo-random permutation of the corpus: the same
    (shard, position) for a given row at any parallelism, on any rerun,
    after any retry. Changing ``seed`` reshuffles; changing only
    ``n_shards`` keeps the underlying order (the hash is shard-count-
    free) so resharding never re-randomizes the curriculum.

    One shuffle on ``shard_id`` (the write layout needs it anyway);
    the in-shard rank is a per-shard sort, never a global one. With
    ``portable=True`` the hash is md5-derived so an external system
    (or the DuckDB oracle) can replay the exact permutation.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from hbase_rdf_spark.functions.portable import md5_long60

    tagged = F.concat_ws(_SEP, F.lit(str(seed)), F.col(id_col).cast("string"))
    key = md5_long60(tagged) if portable else F.xxhash64(tagged)
    out = df.withColumn("__sk", key).withColumn(
        "shard_id", F.pmod(F.col("__sk"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard_id").orderBy(
        F.col("__sk").asc(), F.col(id_col).asc()
    )
    return out.withColumn("shard_pos", F.row_number().over(w)).drop("__sk")


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    seed: str = "s0",
    id_col: str = "doc_id",
) -> None:
    """Write the sharded corpus as ``path/shard_id=K/`` parquet, rows
    inside each shard in shuffle order (``shard_pos``).

    ``repartition(shard_id)`` + ``sortWithinPartitions`` → one shuffle,
    one sorted write per shard, no driver funnel; a trainer streams
    shard files in order and gets the deterministic permutation.
    """
    sharded = assign_shards(df, n_shards, seed=seed, id_col=id_col)
    (
        sharded.repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", "shard_pos")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )
