"""Streaming exact deduplication with bounded state.

The batch engine dedups on a 128-bit content hash (ops/dedup.py
``dedup_exact`` — the shuffle moves 16 bytes per row, never documents).
The streaming twin keeps the SAME key but bounds the dedup state with
an event-time watermark: ``dropDuplicatesWithinWatermark`` keeps a
key's state only until the watermark passes its event time + delay, so
state size is O(unique keys per watermark window), not O(stream).

This mirrors what the reference's incremental bulk loader achieves with
HBase's idempotent puts (reference: bulkload/HBaseLoader.java — re-put
of the same rowkey is a no-op): re-ingesting a transcript chunk does
not duplicate index rows. Here the dedup happens BEFORE the sink, so
parquet/Iceberg appends stay idempotent within the watermark horizon.

Semantics note (matches Spark's contract): the FIRST arrival of a key
is emitted, later arrivals within the watermark horizon are dropped.
A duplicate arriving after the horizon re-emits — exactly-once across
unbounded time requires the batch dedup pass; the two compose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    delay: str = "1 hour",
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Streaming DataFrame → same rows with duplicate contents dropped.

    ``docs`` must be a streaming DataFrame carrying ``text_col`` and an
    event-time ``ts_col``. Duplicates are detected on md5(text) (+ any
    ``extra_keys``), the identical key the batch ``dedup_exact`` uses,
    so a document surviving the stream pass also survives a later batch
    re-dedup (same survivor key space).
    """
    keyed = docs.withColumn("__ck", F.md5(F.col(text_col))).withWatermark(
        ts_col, delay
    )
    out = keyed.dropDuplicatesWithinWatermark(["__ck", *extra_keys])
    return out.drop("__ck")
