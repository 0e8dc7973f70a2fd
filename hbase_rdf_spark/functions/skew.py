"""Skew-handling primitives: salting + hot-key guards.

The north rule requires explicit partitioning/shuffle/skew handling.
Three mechanisms cover the pipeline's skew surfaces:

1. **Map-side-combinable aggregations by construction** — every hot-key
   aggregation in the engine (CC neighborhood minima, simhash bit
   votes, counts) is expressed with combinable functions, so a hot key
   reduces partially on every map partition and the shuffle carries one
   row per (partition, key). Nothing to salt.
2. **AQE skew-join splitting** (`session.py` enables it) — handles
   skewed JOIN partitions at runtime by splitting oversized shuffle
   blocks.
3. **This module** — for the residual cases AQE cannot fix:
   - :func:`salted_aggregate` — two-phase salted groupBy for
     NON-combinable aggregations (collect_set/collect_list-style state)
     where one hot key would otherwise funnel into a single reduce
     task;
   - :func:`cap_group_size` — hot-bucket guard for self-join blocking
     schemes (LSH bands): a bucket of size m yields m²/2 candidate
     pairs, so one viral bucket dominates the whole join. Production
     web-dedup pipelines cap bucket size and REPORT the drop (no
     silent truncation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    agg_col: Column,
    merge: str,
    alias: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase groupBy for aggregations whose state grows with group
    size (the non-combinable regime where a hot key = one giant task).

    Phase 1 groups by (key, salt) — the hot key's rows spread over
    ``n_salts`` tasks; phase 2 merges the per-salt partials. ``merge``
    names the second-phase combiner applied to the array of partials:
    currently ``flatten_distinct`` (set union) or ``sum``.

    Example::

        salted_aggregate(sh, ["id"], F.collect_set("sh"),
                         "flatten_distinct", "shs")
    """
    # salt must be DETERMINISTIC per row content, not per physical
    # placement: monotonically_increasing_id() depends on partition
    # layout, so a fetch-failure/stage retry could re-salt rows
    # differently and duplicate or lose partials (the SPARK-23207
    # round-robin class of bug). Hashing the row's own columns is
    # retry-stable; fully identical rows share a salt, which only
    # reduces spreading for pathological all-duplicate groups and never
    # affects correctness.
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(agg_col.alias("_part"))
    grouped = partial.groupBy(*key_cols).agg(
        F.collect_list("_part").alias("_parts")
    )
    if merge == "flatten_distinct":
        out = grouped.withColumn(alias, F.array_distinct(F.flatten("_parts")))
    elif merge == "sum":
        out = grouped.withColumn(
            alias,
            F.aggregate("_parts", F.lit(0).cast("double"), lambda a, v: a + v),
        )
    else:
        raise ValueError(f"unknown merge {merge!r}")
    return out.drop("_parts")


def cap_group_size(
    df: DataFrame,
    key_cols: list[str],
    max_size: int,
    counter: dict | None = None,
) -> DataFrame:
    """Drop groups larger than ``max_size``, reporting what was dropped.

    For LSH-style blocking self-joins: a band bucket of m members emits
    O(m²) pairs, so a single viral bucket (boilerplate text, empty
    strings) can dominate the entire join. Near-dup recall loss is
    bounded and acceptable — members of a giant bucket still collide in
    their OTHER bands — but the drop must be visible: pass ``counter``
    to receive {"dropped_groups": n, "dropped_rows": m}.
    """
    sizes = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_gsz"))
    keep = sizes.filter(F.col("_gsz") <= max_size).drop("_gsz")
    if counter is not None:
        dropped = sizes.filter(F.col("_gsz") > max_size)
        row = dropped.agg(
            F.count(F.lit(1)).alias("g"), F.coalesce(F.sum("_gsz"), F.lit(0)).alias("r")
        ).collect()[0]
        counter["dropped_groups"] = row["g"]
        counter["dropped_rows"] = int(row["r"])
    return df.join(keep, key_cols, "left_semi")
