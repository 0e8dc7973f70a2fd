"""Context-window sequence packing for training-data preparation.

Pre-training dataloaders concatenate documents into one logical token
stream and cut it into fixed-size context windows; the table-level
question is "which window does each document start in, and at what
offset" — i.e. an exclusive PREFIX SUM of token counts over a global
document order, then integer division by the window size.

A naive Spark window (``sum().over(Window.orderBy(...))`` with no
partition key) funnels the ENTIRE table through one task — the classic
global-window trap. This module implements the scale-safe two-pass
prefix sum instead:

1. range-repartition + sort on the order key (Spark's distributed sort
   — partition i holds keys strictly below partition i+1);
2. a column-pruned first pass aggregates ONE token total per partition
   (collected to the driver: |partitions| rows, kilobytes);
3. an Arrow-batched ``mapInPandas`` second pass streams each sorted
   partition once, adding the running local cumsum to the broadcast
   partition offset — no further shuffle, no Python per-row loop
   (pandas ``cumsum`` over whole Arrow batches).

The result is deterministic for a unique order key, independent of
parallelism (verified in tests at 1/4/13 partitions), and every stage
is either a pushed-down scan, a combinable agg, or a linear pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def assign_context_windows(
    df: DataFrame,
    window_tokens: int,
    token_col: str,
    order_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each document its context-window id and start offset.

    Documents are laid out in ``order_col`` order (the key must be
    unique — ties would make the packing ambiguous) and packed
    greedily: ``bin_id = start_offset // window_tokens`` where
    ``start_offset`` is the exclusive prefix sum of ``token_col``;
    ``bin_offset`` is the position within that window. A document
    longer than the window spans several windows but is assigned the
    window its first token lands in (concat-and-chunk semantics —
    the downstream chunker slices the stream, this operator answers
    placement and shard-assignment queries).

    Adds columns ``bin_id``, ``bin_offset`` (both long).
    """
    if window_tokens <= 0:
        raise ValueError(f"window_tokens must be positive, got {window_tokens}")
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    parts = (
        df.repartitionByRange(int(n), F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_tok", F.col(token_col).cast("long"))
    )
    # Pin the partitioning ONCE: repartitionByRange samples its range
    # boundaries per execution (RDD-id-seeded), so without this the
    # pass-1 totals job and the lazy pass-2 mapInPandas (recomputed on
    # every downstream action) could see DIFFERENT partition contents,
    # silently shifting bin_id for rows near boundaries (ADVICE r2).
    parts = parts.localCheckpoint(eager=True)

    # pass 1: one row per partition — column-pruned, map-side combined
    totals = (
        parts.groupBy("_pid").agg(F.sum("_tok").alias("t")).collect()
    )
    by_pid = {r["_pid"]: r["t"] for r in totals}
    offsets = {}
    acc = 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]

    # pass 2: streaming local cumsum + broadcast offset, order preserved
    # within each sorted partition; state (the running total) lives
    # across Arrow batches of the same partition only
    out_schema = parts.schema
    def add_cumsum(batches):
        run = None
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(_start=pdf["_tok"])  # keeps the schema
                continue
            if run is None:
                run = offsets.get(int(pdf["_pid"].iloc[0]), 0)
            start = pdf["_tok"].cumsum() - pdf["_tok"] + run
            run = int(start.iloc[-1] + pdf["_tok"].iloc[-1])
            pdf = pdf.assign(_start=start.astype("int64"))
            yield pdf

    import pyspark.sql.types as T

    schema = T.StructType(
        list(out_schema.fields) + [T.StructField("_start", T.LongType())]
    )
    with_start = parts.mapInPandas(add_cumsum, schema=schema)
    # integer DIV, not FP division: a 10^14-token stream overflows the
    # double mantissa long before it overflows a long
    w = int(window_tokens)
    return with_start.select(
        *[c for c in df.columns],
        F.expr(f"_start DIV {w}").alias("bin_id"),
        F.expr(f"_start % {w}").alias("bin_offset"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping fixed-size token chunks.

    The RAG / long-doc-training preprocessing step: chunk ``i`` covers
    tokens ``[i*stride, i*stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap``; the last chunk is the
    remainder (>= overlap+1 tokens unless the doc itself is shorter).
    Output: one row per chunk with ``chunk_idx``, ``tok_start``,
    ``n_chunk_tokens``, ``chunk_text``. Empty documents yield no rows.

    Scale shape: a pure projection + explode — chunk construction is
    whole-stage codegen (``sequence``/``transform``/``slice``/
    ``array_join``), no shuffle, no UDF; output size is input size ×
    (1 + overlap fraction), streamed, never buffered per doc.
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})"
        )
    from hbase_rdf_spark.ops.text import tokens

    stride = chunk_tokens - overlap
    # bind the token array to an attribute FIRST: referencing the
    # tokenize expression inside the higher-order lambda re-evaluates
    # it per chunk (no CSE inside HOFs — the wordkg/dedup trap)
    w = F.col("__ck_w")
    n = F.size(w)
    n_chunks = F.greatest(
        F.lit(1),
        F.floor((n - overlap + (stride - 1)) / F.lit(stride)).cast("int"),
    )
    chunks = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_idx"),
                (i * stride).cast("int").alias("tok_start"),
                F.least(F.lit(chunk_tokens), n - i * stride)
                .cast("int")
                .alias("n_chunk_tokens"),
                F.array_join(
                    F.slice(w, i * stride + 1, chunk_tokens), " "
                ).alias("chunk_text"),
            ),
        ),
    ).otherwise(F.array().cast(
        "array<struct<chunk_idx:int,tok_start:int,"
        "n_chunk_tokens:int,chunk_text:string>>"
    ))
    return docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__ck_w")
    ).select(
        F.col(id_col), F.explode(chunks).alias("c")
    ).select(
        id_col, "c.chunk_idx", "c.tok_start", "c.n_chunk_tokens",
        "c.chunk_text",
    )
