"""Stage 3 — LINK: mention surface → canonical entity id.

Generalizes the reference's exact-string dictionary matching
(reference: bulkload/QuadBreakDown.java:200-217 — one id per distinct
term) to fuzzy entity resolution:

1. **Exact/broadcast**: normalized surface → gazetteer alias, broadcast
   hash join (analog of the String2Id point-Get,
   reference: operations/HBPrefixMatchOperationManager.java:474-489).
2. **MinHash-LSH blocking** for the residue: char-3-gram shingles →
   k=32 minhashes → b=8 bands of r=4 → band-hash equijoin against the
   (small, broadcast) gazetteer signature table.
3. **Vectorized scoring**: exact Jaccard over shingle sets via
   ``array_intersect`` on the *candidate pairs only*; best match per
   surface above a threshold wins (deterministic tie-break on entity id).

Everything runs JVM-side (built-in functions, whole-stage codegen) — no
Python UDFs at all in this stage. The LSH input is the set of *distinct
unmatched surfaces*, orders of magnitude smaller than the triple stream,
so the groupBy-surface aggregations are cheap and skew-free at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

SHINGLE_N = 2  # 2-grams keep short-surface typos reachable by banding
NUM_HASHES = 16
BANDS = 8  # 8 bands × 2 rows: candidate recall ≥ 0.97 at J ≥ 0.6
ROWS_PER_BAND = NUM_HASHES // BANDS
DEFAULT_THRESHOLD = 0.5

# Deterministic multipliers / offsets for the k affine hash families.
# The shingle hash is first reduced to a 31-bit domain so a*x+b stays
# well inside int64 under Spark's ANSI overflow checking
# (2^31 * 2^31 + 2^31 < 2^63).
_DOMAIN = (1 << 31) - 1  # Mersenne prime 2^31-1
_HASH_A = [(0x9E3779B9 * (2 * i + 1)) % _DOMAIN or 1 for i in range(NUM_HASHES)]
_HASH_B = [(0xBF58476D ^ (i * 0x94D049BB)) % _DOMAIN for i in range(NUM_HASHES)]


def normalize_surface(col: Column) -> Column:
    """Case/whitespace/punctuation normalization applied to both sides."""
    c = F.lower(F.trim(col))
    c = F.regexp_replace(c, r"[^\w\s]", "")  # strip punctuation ('.', ',')
    return F.regexp_replace(c, r"\s+", " ")


def _shingles(df: DataFrame, surface_col: str) -> DataFrame:
    """(surface) → (surface, sh: long) char-n-gram hashes (with dups —
    every consumer is dedup-insensitive: min / collect_set).

    JVM-only: sequence+explode+substring+xxhash64. Short surfaces are
    padded so every surface has at least one shingle.
    """
    base = normalize_surface(F.col(surface_col))
    # pad only strings shorter than one shingle (rpad would otherwise
    # TRUNCATE longer strings to SHINGLE_N chars)
    norm = F.when(F.length(base) >= SHINGLE_N, base).otherwise(
        F.rpad(base, SHINGLE_N, "_")
    )
    return (
        df.select(F.col(surface_col).alias("surface"), norm.alias("_norm"))
        .select(
            "surface",
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(_norm) - {SHINGLE_N - 1}), "
                    f"i -> substring(_norm, i, {SHINGLE_N}))"
                )
            ).alias("shingle"),
        )
        .select("surface", F.xxhash64("shingle").alias("sh"))
    )


def _sketches(shingles: DataFrame) -> DataFrame:
    """ONE groupBy per surface → minhash signature AND exact shingle set.

    (surface, shs: array<long>, mh0..mhK) — the signature feeds banding,
    the set feeds exact Jaccard verification; fusing them halves the
    shuffle/plan count of the LSH stage.
    """
    reduced = shingles.withColumn("sh31", F.pmod(F.col("sh"), F.lit(_DOMAIN)))
    aggs = [F.collect_set("sh").alias("shs")] + [
        F.min(F.pmod(F.col("sh31") * F.lit(a) + F.lit(b), F.lit(_DOMAIN))).alias(f"mh{i}")
        for i, (a, b) in enumerate(zip(_HASH_A, _HASH_B))
    ]
    return reduced.groupBy("surface").agg(*aggs)


def _band_rows(sketches: DataFrame) -> DataFrame:
    """sketch rows → exploded (surface, band, band_hash)."""
    bands = F.array(
        *[
            F.xxhash64(
                *[F.col(f"mh{band * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)],
                F.lit(band),
            )
            for band in range(BANDS)
        ]
    )
    return sketches.select(
        "surface", F.posexplode(bands).alias("band", "band_hash")
    )


def link_mentions(
    mentions: DataFrame,
    gazetteer: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
) -> DataFrame:
    """Resolve distinct mention surfaces against a gazetteer.

    Parameters
    ----------
    mentions : DataFrame(surface: string) — distinct mention surfaces.
    gazetteer : DataFrame(alias: string, entity_id: string) — small
        (broadcastable) alias dictionary.

    Returns
    -------
    DataFrame(surface, entity_id, method, score) where ``entity_id`` is
    null for surfaces no strategy could resolve (handled by stage 4
    canonicalization) and method ∈ {exact, lsh, none}.
    """
    gaz_norm = (
        gazetteer.select(
            normalize_surface(F.col("alias")).alias("_gnorm"),
            F.col("entity_id"),
        )
        # one winner per normalized alias, deterministic
        .groupBy("_gnorm").agg(F.min("entity_id").alias("entity_id"))
    )
    m = mentions.select(
        "surface", normalize_surface(F.col("surface")).alias("_mnorm")
    )
    exact = (
        m.join(F.broadcast(gaz_norm), m["_mnorm"] == gaz_norm["_gnorm"], "left")
        .select("surface", "entity_id")
        .persist()  # reused by the matched + residue branches
    )
    matched = exact.filter(F.col("entity_id").isNotNull()).select(
        "surface", "entity_id", F.lit("exact").alias("method"), F.lit(1.0).alias("score")
    )
    residue = exact.filter(F.col("entity_id").isNull()).select("surface")

    # --- LSH path over the residue -------------------------------------
    gaz_surf = gazetteer.select(F.col("alias").alias("surface")).distinct()
    g_sk = _sketches(_shingles(gaz_surf, "surface")).persist()
    m_sk = _sketches(_shingles(residue, "surface")).persist()

    cand = (
        _band_rows(m_sk)
        .join(
            F.broadcast(
                _band_rows(g_sk).withColumnRenamed("surface", "g_surface")
            ),
            ["band", "band_hash"],
        )
        .select("surface", "g_surface")
        .distinct()
    )
    # Hybrid verification score: shingle Jaccard OR normalized Levenshtein
    # similarity, whichever is higher — Jaccard discriminates long
    # surfaces, edit distance rescues short ones where a single typo
    # destroys most shingles. Both are JVM built-ins on the (small)
    # candidate-pair set only.
    lev_sim = 1.0 - F.levenshtein(
        normalize_surface(F.col("m_surface")), normalize_surface(F.col("g_surface"))
    ) / F.greatest(
        F.length(normalize_surface(F.col("m_surface"))),
        F.length(normalize_surface(F.col("g_surface"))),
    )
    scored = (
        cand.withColumnRenamed("surface", "m_surface")
        .join(
            m_sk.select(F.col("surface").alias("m_surface"), F.col("shs").alias("m_shs")),
            "m_surface",
        )
        .join(
            F.broadcast(
                g_sk.select(F.col("surface").alias("g_surface"), F.col("shs").alias("g_shs"))
            ),
            "g_surface",
        )
        .withColumn("_inter", F.size(F.array_intersect("m_shs", "g_shs")))
        .withColumn(
            "_jacc",
            F.col("_inter")
            / (F.size("m_shs") + F.size("g_shs") - F.col("_inter")),
        )
        .withColumn("score", F.greatest(F.col("_jacc"), lev_sim))
        .filter(F.col("score") >= threshold)
    )
    # map gazetteer surface → entity id (small), pick best per mention
    gaz_best = gazetteer.select(
        F.col("alias").alias("g_surface"), "entity_id"
    ).groupBy("g_surface").agg(F.min("entity_id").alias("entity_id"))
    w = Window.partitionBy("m_surface").orderBy(
        F.desc("score"), F.asc("entity_id")
    )
    lsh = (
        scored.join(F.broadcast(gaz_best), "g_surface")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("m_surface").alias("surface"),
            "entity_id",
            F.lit("lsh").alias("method"),
            "score",
        )
        .persist()  # consumed by the result union AND the left_anti below
    )
    unresolved = (
        residue.join(lsh.select("surface"), "surface", "left_anti")
        .select(
            "surface",
            F.lit(None).cast("string").alias("entity_id"),
            F.lit("none").alias("method"),
            F.lit(0.0).alias("score"),
        )
    )
    return matched.unionByName(lsh).unionByName(unresolved)


def self_candidate_pairs(
    surfaces: DataFrame, threshold: float = DEFAULT_THRESHOLD
) -> DataFrame:
    """LSH candidate pairs *within* one surface set, Jaccard-scored.

    Feeds stage-4 canonicalization: surfaces no gazetteer entry could
    resolve are clustered among themselves (connected components over
    these edges). Returns (a, b, score) with a < b.
    """
    sk = _sketches(_shingles(surfaces, "surface")).persist()
    sig = _band_rows(sk)
    left = sig.withColumnRenamed("surface", "a")
    right = sig.withColumnRenamed("surface", "b")
    cand = (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    a_sets = sk.select(F.col("surface").alias("a"), F.col("shs").alias("m_shs"))
    b_sets = sk.select(F.col("surface").alias("b"), F.col("shs").alias("g_shs"))
    lev_sim = 1.0 - F.levenshtein(
        normalize_surface(F.col("a")), normalize_surface(F.col("b"))
    ) / F.greatest(
        F.length(normalize_surface(F.col("a"))),
        F.length(normalize_surface(F.col("b"))),
    )
    return (
        cand.join(a_sets, "a")
        .join(b_sets, "b")
        .withColumn("_inter", F.size(F.array_intersect("m_shs", "g_shs")))
        .withColumn(
            "_jacc",
            F.col("_inter") / (F.size("m_shs") + F.size("g_shs") - F.col("_inter")),
        )
        .withColumn("score", F.greatest(F.col("_jacc"), lev_sim))
        .filter(F.col("score") >= threshold)
        .select("a", "b", "score")
    )
