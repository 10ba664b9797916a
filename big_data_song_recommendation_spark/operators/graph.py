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


def triangle_count(
    edges: DataFrame, *, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global triangle census of an UNDIRECTED graph → 1 row
    (n_nodes, n_edges, n_triangles, n_wedges, global_clustering).

    Uses the degree-ORIENTED algorithm (each edge directed from its
    lower-(degree, id) endpoint): every triangle is counted exactly
    once, and — the scale property — the wedge-join fan-out per node
    is bounded by its ORIENTED out-degree, which is O(√m) on any
    graph (arboricity bound), not by the raw degree. A hub with 10M
    neighbors contributes no 10M² wedge explosion; the naive
    edge-edge-edge join does. Wedges (length-2 paths) come from the
    symmetric degrees: Σ deg·(deg-1)/2 — integer-exact.

    Three shuffles total: degree aggregate, wedge self-join on the
    hinge node, the closing-edge semi-join on (b, c).
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    und = und.localCheckpoint(eager=False)
    sym = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count("*").alias("deg"))

    base = (
        und.join(deg.withColumnRenamed("u", "__n1"), F.col("u") == F.col("__n1"))
        .withColumnRenamed("deg", "du")
        .drop("__n1")
        .join(deg.withColumnRenamed("u", "__n2"), F.col("v") == F.col("__n2"))
        .withColumnRenamed("deg", "dv")
        .drop("__n2")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = base.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, F.col("du")).otherwise(F.col("dv")).alias("da"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ).localCheckpoint(eager=False)

    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    # wedges at hinge a: out-neighbor pairs ordered by (deg, id) so the
    # closing edge, if present, is oriented exactly (b -> c)
    wedges = o1.join(o2, F.col("o1.a") == F.col("o2.a")).filter(
        (F.col("o1.db") < F.col("o2.db"))
        | ((F.col("o1.db") == F.col("o2.db")) & (F.col("o1.b") < F.col("o2.b")))
    ).select(F.col("o1.b").alias("x"), F.col("o2.b").alias("y"))
    tri = wedges.join(
        oriented.select(F.col("a").alias("x"), F.col("b").alias("y")),
        ["x", "y"],
        "left_semi",
    ).agg(F.count("*").alias("n_triangles"))

    stats = deg.agg(
        F.count("*").alias("n_nodes"),
        (F.sum("deg") / 2).cast("long").alias("n_edges"),
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2)
        .cast("long")
        .alias("n_wedges"),
    )
    from ..functions.scalars import stable_round

    return (
        stats.crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.when(F.col("n_wedges") == 0, F.lit(0.0))
            .otherwise(
                stable_round(
                    3.0 * F.col("n_triangles") / F.col("n_wedges"), 6
                )
            )
            .alias("global_clustering"),
        )
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    damping: float = 0.85,
    iterations: int = 3,
) -> DataFrame:
    """Personalized PageRank: the restart vector concentrates on the
    SEED set instead of being uniform — random-walk-with-restart item
    recommendations over a co-occurrence graph (the graph-native
    collaborative signal: rank items by proximity to what the user
    already played). Same loop discipline as :func:`pagerank` (lazy
    localCheckpoint per round, zero driver actions); dangling mass
    teleports back to the seeds, as the PPR formulation requires.

    ``r_{t+1}(v) = (1-d)·e(v) + d·(Σ_{u→v} r_t(u)/deg(u) +
    dangling_t·e(v))`` with ``e`` = 1/|S| on seeds, 0 elsewhere,
    ``r_0 = e``. Deterministic and oracle-expressible (unrolled CTE
    rounds, like q87).
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
    s = seeds.select(F.col(seed_col).alias("node")).distinct()
    ns = s.agg(F.count("*").cast("double").alias("ns"))
    base = (
        nodes.join(deg, "node", "left")
        .join(s.withColumn("__seed", F.lit(1)), "node", "left")
        .crossJoin(F.broadcast(ns))
        .select(
            "node",
            "deg",
            F.when(F.col("__seed").isNotNull(), F.lit(1.0) / F.col("ns"))
            .otherwise(F.lit(0.0))
            .alias("e"),
        )
        .localCheckpoint(eager=False)
    )
    ranks = base.select("node", "deg", "e", F.col("e").alias("r"))
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
            base.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                "deg",
                "e",
                (
                    F.lit(1.0 - d) * F.col("e")
                    + d
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("dang") * F.col("e")
                    )
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.col("r").alias("rank"))
