"""Item co-occurrence / association mining (item-based CF core).

The quadratic risk in co-occurrence is per-user fan-out: a user with k
items emits k(k-1)/2 pairs, so one 10k-item bot account emits 50M
pairs. ``max_items_per_user`` bounds this deterministically (keep the
lowest item ids per user) — the standard production cap; the shuffle
key (user_id) is otherwise perfectly spreadable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cooccurrence_pairs(
    user_items: DataFrame,
    *,
    user_col: str = "user_id",
    item_col: str = "item_id",
    min_support: int = 3,
    max_items_per_user: int | None = None,
) -> DataFrame:
    """(item_a < item_b, n_co) pairs over distinct (user, item) rows."""
    ui = user_items.select(user_col, item_col).distinct()
    if max_items_per_user is not None:
        w = Window.partitionBy(user_col).orderBy(item_col)
        ui = (
            ui.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_items_per_user)
            .drop("__rn")
        )
    a, b = ui.alias("a"), ui.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{user_col}") == F.col(f"b.{user_col}"))
            & (F.col(f"a.{item_col}") < F.col(f"b.{item_col}")),
        )
        .groupBy(
            F.col(f"a.{item_col}").alias("item_a"),
            F.col(f"b.{item_col}").alias("item_b"),
        )
        .agg(F.count("*").alias("n_co"))
        .filter(F.col("n_co") >= min_support)
    )


def with_lift(
    pairs: DataFrame, user_items: DataFrame, *, user_col: str = "user_id", item_col: str = "item_id"
) -> DataFrame:
    """Attach lift = P(a,b) / (P(a)·P(b)): co-count scaled by the user
    universe over the item popularity product.

    The user-universe scalar is folded in as a 1-row broadcast
    cross-join, NOT a driver-side ``count()`` — an eager count would
    execute the upstream plan a second time whenever the caller didn't
    cache it, and keeps construction lazy (one action total at the
    caller's terminal op)."""
    ui = user_items.select(user_col, item_col).distinct()
    n_users = ui.agg(
        F.count_distinct(F.col(user_col)).cast("double").alias("__n_users")
    )
    item_n = ui.groupBy(F.col(item_col).alias("iid")).agg(F.count("*").alias("n"))
    na, nb = item_n.alias("na"), item_n.alias("nb")
    lift = (F.col("n_co") * F.col("__n_users")) / (F.col("na.n") * F.col("nb.n"))
    return (
        pairs.join(na, F.col("item_a") == F.col("na.iid"))
        .join(nb, F.col("item_b") == F.col("nb.iid"))
        .crossJoin(F.broadcast(n_users))
        .select("item_a", "item_b", "n_co", F.round(lift, 4).alias("lift"))
    )
