"""Streaming corpus-filter stage: the stateless prep filters on a stream.

The quality / repetition / language / PII stages of the corpus-prep
pipeline (ops/prep.py) are pure per-row projections and filters — no
aggregation, no join, no state — so they run UNCHANGED on a Structured
Streaming DataFrame in append mode: the same whole-stage-codegen
expressions, evaluated per micro-batch, no watermark needed.

This is the streaming ingestion front of a training-data pipeline:
filter + scrub documents as they arrive, land the survivors in
parquet/Iceberg, and run the stateful stages (dedup via
streaming/dedup.py within a watermark horizon, or the batch pass over
the landed table) behind it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hbase_rdf_spark.ops.text import (
    detect_language,
    quality_repetition_filter,
    scrub_pii,
)


def filter_stream(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_quality: float = 0.3,
    max_top_2gram_frac: float = 0.5,
    langs: set[str] | None = None,
    redact: bool = True,
) -> DataFrame:
    """Apply the stateless prep filters to a (streaming) DataFrame.

    Works identically on batch and streaming inputs — the transform is
    append-safe (row-wise, stateless). Returns the input schema with
    ``text_col`` scrubbed when ``redact=True``.
    """
    out = quality_repetition_filter(
        docs, text_col, min_quality, max_top_2gram_frac
    )
    if langs is not None:
        out = out.filter(
            detect_language(F.col(text_col)).isin(*sorted(langs))
        )
    if redact:
        out = scrub_pii(out, text_col)
    return out
