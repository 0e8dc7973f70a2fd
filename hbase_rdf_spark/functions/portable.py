"""Cross-engine-portable 60-bit hashing.

The engine's internal ids use ``xxhash64`` (fast, JVM-side — see
functions/encoding.py), but xxhash64 exists in no SQL oracle. For every
gate query whose VALUES depend on a hash family (minhash bands, simhash
bit votes, winnowing fingerprints), the portable twin derives a 60-bit
integer from the md5 hex prefix — md5 is the one hash Spark and DuckDB
compute identically (same trick as ops/wordkg.md5_id for term ids).

60 bits (15 hex chars) keeps the value strictly inside a signed 64-bit
range on both engines, so no unsigned-overflow edge cases exist.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def md5_long60(col: Column) -> Column:
    """First 60 bits of md5(col) as a non-negative BIGINT (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_long60_sql(expr: str) -> str:
    """DuckDB twin of :func:`md5_long60` over a SQL expression."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"
