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
