"""Graph analytics over DataFrame edge lists — PageRank for entity
importance ranking (item graphs, citation/link graphs in corpus
curation: rank domains/documents by link structure before sampling).

Same iterative discipline as :func:`..operators.dedup.connected_components`:
one shuffle-bounded round per iteration, lineage cut with lazy
``localCheckpoint`` so Catalyst never sees an exponentially nested
plan, zero driver-side actions inside the loop (the caller's terminal
action runs everything). Fixed iteration counts keep the operator
deterministic and ORACLE-expressible (the DuckDB twin unrolls the same
rounds as CTEs) — production runs pick ``iterations`` from the graph's
mixing time rather than a convergence probe, exactly like the fixed-
depth CC variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 3,
) -> DataFrame:
    """Fixed-iteration PageRank over a DIRECTED edge list →
    ``(node, rank)``.

    ``r_{t+1}(v) = (1-d)/N + d·(Σ_{u→v} r_t(u)/deg(u) + dangling_t/N)``
    with uniform init ``r_0 = 1/N``; ``dangling_t`` is the rank mass
    sitting on zero-out-degree nodes, redistributed uniformly (the
    standard correction — without it rank mass leaks each round).

    Shape per round: one join of ranks onto edges keyed by ``src``
    (the natural edge partitioning), one ``dst``-keyed aggregate, a
    left join back onto the node list, and two 1-row broadcast scalars
    (N, dangling mass). Hot destination nodes are the skew risk — the
    aggregate is map-side combinable so AQE's skew split covers it.
    Parallel edges are honored (each contributes, deg counts them).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    d = float(damping)
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
    )
    deg = e.groupBy(F.col("u").alias("node")).agg(F.count("*").alias("deg"))
    # node list with out-degree (NULL deg = dangling), reused each round
    nd = nodes.join(deg, "node", "left").localCheckpoint(eager=False)
    n1 = nd.agg(F.count("*").cast("double").alias("n"))

    ranks = nd.crossJoin(F.broadcast(n1)).select(
        "node", "deg", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(int(iterations)):
        dang = ranks.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("r"), F.lit(0.0)).alias("dang")
        )
        contrib = (
            ranks.join(e, ranks["node"] == e["u"])
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.col("r") / F.col("deg")).alias("c"))
        )
        ranks = (
            nd.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n1))
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                "deg",
                (
                    (1.0 - d) / F.col("n")
                    + d
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("dang") / F.col("n")
                    )
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.col("r").alias("rank"))
