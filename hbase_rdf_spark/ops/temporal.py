"""Temporal operators Spark lacks natively: as-of join.

``asof_join`` matches each left row to the most recent right row at or
before its timestamp, per key — the point-in-time join every
feature-store / market-data / attribution pipeline needs.

Implementation is the union-marker technique, NOT a per-key loop:

1. tag both sides and union them (right rows carry their payload,
   left rows carry nulls there);
2. ONE shuffle: partition by key, sort by (ts, side) — right sorts
   before left on timestamp ties so "at or before" is inclusive;
3. a running ``last(ignorenulls)`` window fills each left row with the
   latest preceding right payload;
4. keep left rows.

Cost = one shuffle of both inputs + a linear scan per partition —
the same plan shape as a sort-merge join, with no range-explosion.
Skewed keys hit the same window-partition path AQE cannot split, so a
hot key's rows sort in one task: acceptable because the state is one
row (the running last), not the neighbor set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str = "ts",
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Range join: each point row matched to every interval (same key)
    with ``start_ts ≤ point_ts ≤ end_ts`` — inclusive on both ends.

    A naive theta-join degenerates to a per-key cross product. Instead
    the time domain is bucketed: every interval explodes into the
    buckets it covers (``sequence`` — one row per covered bucket), each
    point maps to its single bucket, and the join becomes an EQUI-join
    on (key…, bucket) plus an exact residual filter. Work scales with
    interval-length/bucket_seconds instead of |points|×|intervals|;
    pick ``bucket_seconds`` near the typical interval length.
    """
    epoch = lambda c: F.col(c).cast("timestamp_ltz").cast("long")  # noqa: E731
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(epoch(start_ts) / bucket_seconds),
                F.floor(epoch(end_ts) / bucket_seconds),
            )
        ),
    )
    pt = points.withColumn("_bkt", F.floor(epoch(point_ts) / bucket_seconds))
    out = pt.join(iv, on=[*on, "_bkt"]).filter(
        (F.col(point_ts) >= F.col(start_ts))
        & (F.col(point_ts) <= F.col(end_ts))
    )
    return out.drop("_bkt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_r",
) -> DataFrame:
    """Backward (inclusive) as-of join: for every left row, the right row
    with the greatest ``right_ts`` ≤ ``left_ts`` within the same key.

    Unmatched left rows keep nulls (ASOF LEFT JOIN semantics). Right
    payload columns (everything except key + timestamp) are appended
    with ``suffix``; the matched timestamp arrives as ``{right_ts}{suffix}``.
    For determinism under timestamp ties on the RIGHT side, pre-aggregate
    the right input to one row per (key, ts) — the operator itself keeps
    whichever sorts last, which is not defined across engines.
    """
    payload = [c for c in right.columns if c not in on and c != right_ts]
    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
    )
    l = left.select(
        "*", F.col(left_ts).alias("_ts"), F.lit(1).alias("_side")
    )
    both = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc("_ts"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [f"{right_ts}{suffix}"] + [f"{c}{suffix}" for c in payload]
    for c in carried:
        both = both.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return both.filter(F.col("_side") == 1).drop("_ts", "_side")
