"""Ranking evaluation + quality gates (SURVEY.md §5).

The reference DECLARES quality thresholds (``data/models/config/
als_config.json``: min_rmse 0.8, min_precision_at_k 0.15,
min_recall_at_k 0.10) but never enforces them anywhere in code. Here
they are computed distributed and enforced as a real gate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: the reference's declared (never-enforced) thresholds
REFERENCE_THRESHOLDS = {
    "max_rmse": 0.8,
    "min_precision_at_k": 0.15,
    "min_recall_at_k": 0.10,
}


@dataclass
class RankingMetrics:
    k: int
    precision_at_k: float
    recall_at_k: float
    n_users: int


def ranking_metrics(
    recs: DataFrame,
    relevant: DataFrame,
    *,
    k: int = 10,
    user_col: str = "user_id",
    item_col: str = "item_id",
    rank_col: str = "rnk",
) -> RankingMetrics:
    """Precision@k / recall@k over flat (user, item, rank) recs vs a
    (user, item) relevance set — two joins + one aggregation, fully
    distributed (no per-user collect).

    Users with no relevant items are excluded (standard convention);
    users with relevant items but no recs count as zero hits."""
    top = recs.filter(F.col(rank_col) <= k).select(user_col, item_col)
    rel = relevant.select(user_col, item_col).distinct()
    hits = top.join(rel, [user_col, item_col], "left_semi")

    per_user = (
        rel.groupBy(user_col)
        .agg(F.count("*").alias("n_rel"))
        .join(
            hits.groupBy(user_col).agg(F.count("*").alias("n_hit")),
            user_col,
            "left",
        )
        .na.fill({"n_hit": 0})
    )
    agg = per_user.agg(
        F.avg(F.col("n_hit") / F.lit(k)).alias("p_at_k"),
        F.avg(F.col("n_hit") / F.col("n_rel")).alias("r_at_k"),
        F.count("*").alias("n_users"),
    ).first()
    return RankingMetrics(
        k=k,
        precision_at_k=float(agg["p_at_k"] or 0.0),
        recall_at_k=float(agg["r_at_k"] or 0.0),
        n_users=int(agg["n_users"]),
    )


def passes_quality_gate(
    *,
    rmse: float | None,
    metrics: RankingMetrics,
    thresholds: dict | None = None,
) -> tuple[bool, list[str]]:
    """Enforce the reference's declared thresholds; returns (ok,
    failure reasons). ``rmse=None`` (empty eval set) fails the gate —
    an unevaluated model must not be promoted silently."""
    t = {**REFERENCE_THRESHOLDS, **(thresholds or {})}
    reasons = []
    if rmse is None:
        reasons.append("rmse: not evaluable (empty eval set)")
    elif rmse > t["max_rmse"]:
        reasons.append(f"rmse {rmse:.4f} > {t['max_rmse']}")
    if metrics.precision_at_k < t["min_precision_at_k"]:
        reasons.append(
            f"precision@{metrics.k} {metrics.precision_at_k:.4f} < {t['min_precision_at_k']}"
        )
    if metrics.recall_at_k < t["min_recall_at_k"]:
        reasons.append(
            f"recall@{metrics.k} {metrics.recall_at_k:.4f} < {t['min_recall_at_k']}"
        )
    return (not reasons, reasons)


DCG_SCALE = 10**9


def dcg_weights(k: int) -> list[int]:
    """Integer-surrogate DCG position weights:
    ``round(1e9 / log2(rank+1))``. Scaling to int64 makes the per-user
    DCG sum ORDER-INDEPENDENT and exact (sums of doubles are not) —
    the q131 integer-surrogate discipline applied to ranking eval;
    only the final NDCG ratio divides two exact integers."""
    import math

    return [round(DCG_SCALE / math.log2(r + 1)) for r in range(1, k + 1)]


def graded_ranking_metrics(
    candidates: DataFrame,
    relevance: DataFrame,
    *,
    k: int = 10,
    user_col: str = "user_id",
    item_col: str = "item",
    rank_col: str = "rnk",
    rel_col: str = "rel",
) -> DataFrame:
    """Graded ranking metrics per user — NDCG@k, MRR@k, hits@k — for a
    shared candidate ranking (e.g. a popularity or co-occurrence
    recommender's top-k) against per-user graded relevance. The
    reference evaluates RMSE only (src/spark/training.py M8); ranking
    quality is what a recommender actually ships on.

    ``candidates``: (item, rank) with rank 1..k — small, broadcast.
    ``relevance``: (user, item, rel) graded gains (e.g. interaction
    counts), ONE row per (user, item) — pre-aggregate first; duplicate
    pairs would fan out the candidate grid. Users absent from
    ``relevance`` are out of scope (no signal to grade against);
    candidate items a user never touched contribute rel=0.

    NDCG uses the retrieved-set convention (IDCG re-orders the SAME k
    candidate gains, so NDCG=1 iff the ranking sorts the user's own
    gains perfectly). DCG/IDCG are exact int64 sums of
    ``rel × dcg_weights[r]``; IDCG's descending re-order happens
    in-row (sort_array + zip_with fold), so every term and both sums
    are bit-identical across engines — only the final ratio and the
    1/first-hit-rank MRR divide doubles.

    100 TB shape: the candidate list broadcasts; the only data-grain
    shuffles are the relevance aggregate and the (user,item) join; the
    per-user state is exactly k rows."""
    from ..functions.scalars import stable_round

    W = dcg_weights(k)
    w_arr = F.array(*[F.lit(w).cast("long") for w in W])
    cand = candidates.filter(F.col(rank_col) <= k).select(
        F.col(item_col), F.col(rank_col).cast("int").alias("__r")
    )
    rel = relevance.select(
        F.col(user_col), F.col(item_col), F.col(rel_col).cast("long").alias("__g")
    )
    grid = (
        rel.select(user_col)
        .distinct()
        .crossJoin(F.broadcast(cand))
        .join(rel, [user_col, item_col], "left")
        .na.fill({"__g": 0})
    )
    per_user = grid.groupBy(user_col).agg(
        F.sum(F.col("__g") * F.element_at(w_arr, F.col("__r"))).alias("__dcg"),
        F.sum((F.col("__g") > 0).cast("long")).alias("hits"),
        F.min(F.when(F.col("__g") > 0, F.col("__r"))).alias("__fh"),
        F.sort_array(F.collect_list("__g"), asc=False).alias("__gains"),
    )
    # zip_with pads the shorter array with NULLs (candidate lists may
    # hold fewer than k items) — coalesce each term so the fold's sum
    # skips the padding instead of poisoning IDCG to NULL.
    ideal = F.aggregate(
        F.zip_with("__gains", w_arr, lambda g, w: F.coalesce(g * w, F.lit(0))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return per_user.select(
        user_col,
        F.when(
            ideal > 0,
            stable_round(
                F.col("__dcg").cast("double") / ideal.cast("double"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("ndcg"),
        F.when(
            F.col("__fh").isNotNull(),
            stable_round(F.lit(1.0) / F.col("__fh"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("mrr"),
        "hits",
    )
