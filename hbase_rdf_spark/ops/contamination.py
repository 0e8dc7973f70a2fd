"""Benchmark-contamination detection for training corpora.

A training document is "contaminated" when a large fraction of its word
n-grams also appears in a benchmark / eval set — the standard
decontamination step run before LLM pretraining (GPT-3's appendix-C
13-gram filter is the canonical instance; ``n`` and the overlap
threshold are parameters here).

Scale shape (the part that must survive 100 TB):

- **Benchmark side** is small by definition (eval sets are thousands to
  millions of grams) → distinct-gram set is ``broadcast`` so the corpus
  side never shuffles.  ``broadcast=False`` falls back to a plain
  shuffle join keyed by the gram for oversized benchmark sets.
- **Corpus side** is one projection + one explode of per-doc *distinct*
  grams and a single combinable ``groupBy(doc_id)`` — map-side partial
  aggregation, keys are uniformly distributed doc ids, no all-pairs
  structure and no driver collect anywhere.
- All gram construction is JVM whole-stage codegen
  (``split`` / ``sequence`` / ``transform`` / ``slice`` /
  ``array_join``); no Python UDFs.

No counterpart exists in the reference (it stops at triple storage);
this extends the engine toward the training-data-pipeline surface the
task brief requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from hbase_rdf_spark.ops.text import tokens


def _ngrams_of(w: Column, n: int) -> Column:
    """Distinct space-joined word ``n``-grams of a TOKEN-ARRAY column.

    ``w`` must be a bound attribute (not an inline tokenize
    expression): the lambda references it per element and HOF
    evaluation has no common-subexpression elimination — an inline
    ``tokens(text)`` here re-tokenizes the document once per gram
    (the wordkg/dedup trap, round-5 sf1.0 probe)."""
    cnt = F.size(w) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), cnt),
        lambda i: F.array_join(F.slice(w, i, n), " "),
    )
    return F.when(cnt >= 1, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams(text: Column, n: int) -> Column:
    """Distinct space-joined word ``n``-grams of ``text``.

    Documents shorter than ``n`` tokens yield an empty array (they
    cannot be contaminated at this gram size). Convenience form for
    one-off expressions; hot paths bind the token array to a column
    first and use ``_ngrams_of`` (see its note)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    return _ngrams_of(tokens(text), n)


def benchmark_contamination(
    docs: DataFrame,
    bench: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.08,
    broadcast: bool = True,
) -> DataFrame:
    """Score every corpus doc by word-``n``-gram overlap with ``bench``.

    Returns one row per corpus document that has at least one gram
    (i.e. ``>= n`` tokens) with::

        id_col, n_grams, n_matched, overlap, contaminated

    where ``overlap = n_matched / n_grams`` over the document's
    *distinct* grams and ``contaminated = int(overlap >= threshold)``.

    ``bench`` only needs ``text_col``.  With ``broadcast=True`` (the
    default — benchmark sets are small) the distinct benchmark-gram set
    is broadcast, so the only shuffle is the combinable per-doc count
    aggregation.
    """
    grams = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__cg_w")
    ).select(
        F.col(id_col),
        F.explode(_ngrams_of(F.col("__cg_w"), n)).alias("gram"),
    )
    bench_grams = (
        bench.select(tokens(F.col(text_col)).alias("__cg_w"))
        .select(F.explode(_ngrams_of(F.col("__cg_w"), n)).alias("gram"))
        .distinct()
        .withColumn("bench_hit", F.lit(1))
    )
    if broadcast:
        bench_grams = F.broadcast(bench_grams)
    marked = grams.join(bench_grams, "gram", "left")
    agg = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.coalesce(F.col("bench_hit"), F.lit(0))).alias("n_matched"),
    )
    overlap = F.col("n_matched") / F.col("n_grams")
    return agg.select(
        id_col,
        "n_grams",
        "n_matched",
        F.round(overlap, 6).alias("overlap"),
        (overlap >= F.lit(threshold)).cast("int").alias("contaminated"),
    )
