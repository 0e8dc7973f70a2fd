"""Text-analysis operators for large-scale training-data pipelines.

All pure JVM column expressions (whole-stage codegen, no Python) so they
run at scan speed over 100 TB document tables: language id (stopword
n-gram heuristic), quality scoring, token counting, and rolling-hash
document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny per-language stopword marker sets (heuristic language id — the
# real thing would be a fastText-style model behind a pandas UDF; the
# *Spark plumbing* is identical).
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "los"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty text → empty array (not [''])."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer classes, restricted to constructs that Java
# regex (Spark) and RE2 (DuckDB oracle) interpret identically: runs of
# letters, runs of digits, and single non-alphanumeric marks.
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: letter runs / digit runs / punctuation marks.

    `regexp_extract_all` stays inside whole-stage codegen — no UDF. A
    real BPE vocabulary would further split rare words, so this is a
    lower bound; the pre-tokenization (the part that determines Spark
    plumbing and cost) is exactly the GPT-2 shape.
    """
    return F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT_PATTERN), F.lit(0)))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit counts over the token set."""
    toks = F.array_distinct(tokens(F.lower(text)))
    return {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(m) for m in markers]))
        )
        for lang, markers in _LANG_MARKERS.items()
    }


def detect_language(text: Column) -> Column:
    """argmax over marker scores; 'und' (undetermined) when all zero.

    Deterministic tie-break: language code order.
    """
    scores = lang_scores(text)
    pairs = sorted(scores.items())  # deterministic order
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, s in pairs:
        better = s > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, s).otherwise(best_score)
    return best_lang


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features.

    quality_score ∈ [0,1]: penalizes very short docs, punctuation walls,
    and stopword-free (keyword-spam-like) text.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_hits = sum(lang_scores(t).values(), F.lit(0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.least(n_tokens / F.lit(20.0), F.lit(1.0)) * 0.4
        + (1.0 - F.least(punct_ratio * 4, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 10, F.lit(1.0)) * 0.3
    )
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tokens.alias("q_tokens"),
        F.round(punct_ratio, 6).alias("q_punct_ratio"),
        F.round(mean_tok_len, 6).alias("q_mean_token_len"),
        F.round(score, 6).alias("quality_score"),
    )


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1).

    Adds per-document columns::

        rep_tokens           token count
        rep_dup_token_frac   1 - distinct_tokens / tokens
        rep_top_token_frac   occurrences of the most frequent token / tokens
        rep_dup_2gram_frac   1 - distinct_2grams / 2grams
        rep_top_2gram_frac   occurrences of the most frequent 2gram / 2grams

    Scale shape: everything is per-row higher-order functions
    (transform / filter / array_distinct) — NO shuffle, unlike the
    explode+groupBy formulation which would shuffle the whole corpus
    twice. Cost is O(distinct × len) per row, bounded by document
    length (cap documents upstream if unbounded).

    The token and 2-gram arrays are BOUND AS COLUMNS in two upstream
    projections before any HOF reads them: a lambda that references a
    non-trivial expression re-evaluates it on EVERY element invocation
    (HOF evaluation has no common-subexpression elimination), which
    turned the O(n) tokenizer split into O(n² · distinct) work per row
    — a 1000× cliff first observed on the sf1.0 depth probe (round 5).
    A bound column reference is an O(1) lookup, and Catalyst's
    CollapseProject keeps multi-referenced non-cheap aliases in their
    own projection, so the staging survives optimization.
    """
    w = F.col("__rep_w")
    grams = F.col("__rep_g")
    n = F.size(w)
    ng = F.size(grams)

    def _top_freq(arr: Column) -> Column:
        # max element frequency: for each distinct element, count its
        # occurrences; per-row, no shuffle
        return F.array_max(
            F.transform(
                F.array_distinct(arr),
                lambda x: F.size(F.filter(arr, lambda y: y == x)),
            )
        )

    def _frac(num: Column, den: Column) -> Column:
        return F.round(
            F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0)), 6
        )

    staged = df.withColumn("__rep_w", tokens(F.col(text_col))).withColumn(
        "__rep_g",
        F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.array_join(F.slice(w, i, 2), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    return staged.select(
        *df.columns,
        n.alias("rep_tokens"),
        _frac(n - F.size(F.array_distinct(w)), n).alias("rep_dup_token_frac"),
        _frac(F.when(n > 0, _top_freq(w)).otherwise(F.lit(0)), n).alias(
            "rep_top_token_frac"
        ),
        _frac(ng - F.size(F.array_distinct(grams)), ng).alias(
            "rep_dup_2gram_frac"
        ),
        _frac(F.when(ng > 0, _top_freq(grams)).otherwise(F.lit(0)), ng).alias(
            "rep_top_2gram_frac"
        ),
    )


# PII patterns restricted to constructs Java regex (Spark) and RE2
# (DuckDB oracle) interpret identically: character classes, bounded
# repetition, and ASCII word boundaries — no lookaround, no
# backreferences. Applied in THIS order (dict order is the contract):
# an earlier replacement must not manufacture text a later pattern
# matches, and the tags (<EMAIL> …) contain no digits so they never do.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "red_text"
) -> DataFrame:
    """Scrub emails / SSNs / phones / IPv4s from a text column.

    Adds one ``n_<kind>`` count column per pattern plus the redacted
    text (each match replaced by its ``<KIND>`` tag). Counts are taken
    on the progressively-redacted text, so an SSN-shaped substring of
    an already-redacted phone is not double-counted — sequential
    semantics a SQL oracle can replay with nested regexp_replace.

    Scale: a pure projection — regexp_extract_all / regexp_replace are
    whole-stage-codegen JVM expressions; no shuffle, no UDF, runs at
    scan speed over a 100 TB corpus.
    """
    red = F.col(text_col)
    counts = []
    for kind, pat in PII_PATTERNS.items():
        counts.append(
            F.size(F.regexp_extract_all(red, F.lit(pat), F.lit(0))).alias(
                f"n_{kind}"
            )
        )
        red = F.regexp_replace(red, pat, f"<{kind.upper()}>")
    return df.select("*", *counts, red.alias(out_col))


def fingerprint(text: Column, window: int = 8, portable: bool = False) -> Column:
    """Winnowing-style document fingerprint: min rolling-window hash.

    Hash over sliding char windows, aggregated to the minimum — a
    single stable 64-bit sketch per document, JVM-side via
    transform+array_min (no shuffle, no UDF). ``portable=True`` swaps
    xxhash64 for the md5-derived 60-bit hash (functions/portable.py) so
    a DuckDB oracle replays the value exactly.
    """
    if portable:
        from hbase_rdf_spark.functions.portable import md5_long60

        hash_fn = md5_long60
    else:
        hash_fn = F.xxhash64
    n = F.greatest(F.length(text) - (window - 1), F.lit(1))
    return F.array_min(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: hash_fn(text.substr(i, F.lit(window))),
        )
    )

_QUALITY_FEATURE_COLS = [
    "q_chars", "q_tokens", "q_punct_ratio", "q_mean_token_len",
    "quality_score", "rep_tokens", "rep_dup_token_frac",
    "rep_top_token_frac", "rep_dup_2gram_frac", "rep_top_2gram_frac",
]


def quality_repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.3,
    max_top_2gram_frac: float = 0.5,
) -> DataFrame:
    """Quality + repetition gate, feature columns dropped afterwards —
    the shared stateless stage of batch prep (ops/prep.py) and the
    streaming filter front (streaming/filters.py)."""
    out = quality_features(df, text_col)
    out = repetition_features(out, text_col)
    return out.filter(
        (F.col("quality_score") >= min_quality)
        & (F.col("rep_top_2gram_frac") <= max_top_2gram_frac)
    ).drop(*_QUALITY_FEATURE_COLS)


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace ``text_col`` with its redacted form, dropping the
    per-kind count columns (use :func:`redact_pii` to keep them)."""
    counts = [f"n_{k}" for k in PII_PATTERNS]
    return (
        redact_pii(df, text_col, out_col="__red")
        .drop(text_col, *counts)
        .withColumnRenamed("__red", text_col)
    )
