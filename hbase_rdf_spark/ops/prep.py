"""End-to-end training-data preparation: the standard corpus-prep
pipeline (C4 / RefinedWeb / Gopher shape) as one composable operator.

Stage order — each one an operator from this package, each individually
oracle-gated (`__spark_entry__` `text_* dedup_* sample_*` entries):

1. exact dedup                     (`dedup.dedup_exact`)
2. duplicated-substring budget     (`dedup.duplicated_substring_spans`
   (opt-in via max_dup_span_frac)   — Lee et al. ExactSubstr, doc-granular)
3. near-dup removal (MinHash-LSH)  (`dedup.minhash_duplicate_pairs`
                                    → `dedup.dedup_keep_list`)
4. quality + repetition filters    (`text.quality_features`,
                                    `text.repetition_features`)
5. language filter                 (`text.detect_language`)
6. benchmark decontamination       (`contamination.benchmark_contamination`)
7. PII redaction                   (`text.redact_pii`)
8. data-mixture sampling           (`sampling.mixture_sample`)
9. training-shard assignment       (`sampling.assign_shards`)

Scale notes: every stage is individually scale-safe (bucketed candidate
generation, broadcast benchmark grams, codegen projections, map-only
sampling — see each operator's docstring); composing them adds nothing
driver-side. With ``collect_stats=True`` each stage boundary runs one
``count()`` job — fine for auditing, skip it in production and read the
counts off the Spark UI instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hbase_rdf_spark.ops.contamination import benchmark_contamination
from hbase_rdf_spark.ops.dedup import (
    dedup_exact,
    dedup_keep_list,
    duplicated_substring_spans,
    minhash_duplicate_pairs,
)
from hbase_rdf_spark.ops.sampling import assign_shards, mixture_sample
from hbase_rdf_spark.ops.text import (
    detect_language,
    quality_repetition_filter,
    scrub_pii,
)


def prep_training_data(
    docs: DataFrame,
    *,
    bench: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    minhash_threshold: float = 0.8,
    max_dup_span_frac: float | None = None,
    dup_span_window: int = 50,
    min_quality: float = 0.3,
    max_top_2gram_frac: float = 0.5,
    langs: set[str] | None = None,
    contamination_n: int = 3,
    contamination_threshold: float = 0.08,
    mixture: dict[str, float] | None = None,
    strata_col: str = "source",
    n_shards: int | None = None,
    seed: str = "prep0",
    collect_stats: bool = False,
) -> tuple[DataFrame, dict[str, int] | None]:
    """Run the full corpus-prep pipeline; returns ``(df, stats)``.

    ``stats`` maps stage name → surviving row count when
    ``collect_stats=True`` (one count job per stage), else ``None``.
    Stages with a ``None``/falsy parameter are skipped: no ``bench`` →
    no decontamination, no ``mixture`` → no reweighting, no
    ``n_shards`` → no shard assignment.
    """
    stats: dict[str, int] | None = {} if collect_stats else None

    def note(stage: str, df: DataFrame) -> DataFrame:
        if stats is not None:
            stats[stage] = df.count()
        return df

    out = note("input", docs)

    out = note("exact_dedup", dedup_exact(out, text_col, id_col))

    if max_dup_span_frac is not None:
        # Lee et al. 2021 ExactSubstr policy, document-granular: drop
        # documents whose duplicated-substring coverage exceeds the
        # budget (boilerplate-heavy pages). Spans from the anchored
        # fingerprint sweep; coverage = merged span chars / doc chars.
        spans = duplicated_substring_spans(
            out, text_col=text_col, id_col=id_col,
            window=dup_span_window,
        )
        cover = spans.groupBy(id_col).agg(
            F.sum(
                F.col("span_end") - F.col("span_start") + 1
            ).alias("__dupchars")
        )
        out = note(
            "substring_dedup",
            out.join(cover, on=id_col, how="left").filter(
                F.coalesce(F.col("__dupchars"), F.lit(0))
                <= max_dup_span_frac * F.length(F.col(text_col))
            ).drop("__dupchars"),
        )

    pairs = minhash_duplicate_pairs(
        out, text_col=text_col, id_col=id_col, threshold=minhash_threshold
    )
    keep = dedup_keep_list(out, pairs, id_col=id_col, text_col=text_col)
    out = note(
        "near_dedup",
        out.join(
            keep.filter(~F.col("keep")).select(id_col),
            on=id_col,
            how="left_anti",
        ),
    )

    out = note(
        "quality_filter",
        quality_repetition_filter(
            out, text_col, min_quality, max_top_2gram_frac
        ),
    )

    if langs is not None:
        out = note(
            "lang_filter",
            out.filter(
                detect_language(F.col(text_col)).isin(*sorted(langs))
            ),
        )

    if bench is not None:
        scores = benchmark_contamination(
            out, bench, id_col=id_col, text_col=text_col,
            n=contamination_n, threshold=contamination_threshold,
        ).select(id_col, "contaminated")
        out = note(
            "decontaminate",
            out.join(scores, on=id_col, how="left").filter(
                F.coalesce(F.col("contaminated"), F.lit(0)) == 0
            ).drop("contaminated"),
        )

    out = note("pii_redact", scrub_pii(out, text_col))

    if mixture is not None:
        out = note(
            "mixture_sample",
            mixture_sample(
                out, mixture, strata_col=strata_col,
                seed=seed, id_col=id_col,
            ),
        )

    if n_shards is not None:
        out = note(
            "shard_assign",
            assign_shards(out, n_shards, seed=seed, id_col=id_col),
        )

    return out, stats
