"""Item co-occurrence / association mining (item-based CF core).

The quadratic risk in co-occurrence is per-user fan-out: a user with k
items emits k(k-1)/2 pairs, so one 10k-item bot account emits 50M
pairs. ``max_items_per_user`` bounds this deterministically (keep the
lowest item ids per user) — the standard production cap; the shuffle
key (user_id) is otherwise perfectly spreadable.

Pair generation is a per-user ARRAY COMBINATION, not a self-join: one
groupBy collects each user's (deduped, sorted, capped) item array and
a codegen'd ``transform``/``flatten``/``explode`` emits the k(k-1)/2
ordered pairs in-row. Same output as the classic
``a JOIN b ON a.user = b.user AND a.item < b.item`` but with no join
at all — the self-join shape sorts/shuffles the user-item table twice
and materializes the same fan-out as join output (measured 2.4 s vs
0.4 s at bench scale). The array shape is also the one that survives
100 TB: the only big shuffle is the groupBy on user_id, the fan-out
is bounded by the cap, and the pair aggregation that follows is
map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Default production cap on per-user fan-out: a user contributes pairs
# from at most this many (lowest-id) items, so the worst task emits
# ≤ cap·(cap-1)/2 ≈ 20k pairs regardless of bot accounts / crawler
# users with 10k+ items. 200 is far above organic catalogs-per-user
# (p99 is 61 at every test SF; max 67) so it never binds on real
# users, while turning the one unbounded quadratic in the roster into
# a constant. Oracle twins mirror the same cap (row_number over
# item_id ≤ cap), so parity holds at ANY scale factor, not just the
# ones where the cap is slack.
DEFAULT_MAX_ITEMS_PER_USER = 200


def cooccurrence_pairs(
    user_items: DataFrame,
    *,
    user_col: str = "user_id",
    item_col: str = "item_id",
    min_support: int = 3,
    max_items_per_user: int | None = None,
) -> DataFrame:
    """(item_a < item_b, n_co) pairs over distinct (user, item) rows."""
    items = F.sort_array(F.collect_set(item_col))
    if max_items_per_user is not None:
        # deterministic cap: lowest item ids per user (sorted prefix)
        items = F.slice(items, 1, int(max_items_per_user))
    per_user = user_items.groupBy(user_col).agg(items.alias("__items"))
    # all ordered pairs (i < j) of the array, generated JVM-side
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("__items"),
                lambda x, i: F.transform(
                    F.slice(F.col("__items"), i + 2, F.size("__items")),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
    )
    return (
        per_user.select(pair.alias("p"))
        .groupBy(F.col("p.a").alias("item_a"), F.col("p.b").alias("item_b"))
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
    caller's terminal op). Item popularities are a small aggregate,
    explicitly broadcast into the pair list twice (item side counts
    are bounded by the catalog, not the event volume)."""
    ui = user_items.select(user_col, item_col).distinct()
    n_users = ui.agg(
        F.count_distinct(F.col(user_col)).cast("double").alias("__n_users")
    )
    item_n = ui.groupBy(F.col(item_col).alias("iid")).agg(F.count("*").alias("n"))
    na, nb = item_n.alias("na"), item_n.alias("nb")
    lift = (F.col("n_co") * F.col("__n_users")) / (F.col("na.n") * F.col("nb.n"))
    return (
        pairs.join(F.broadcast(na), F.col("item_a") == F.col("na.iid"))
        .join(F.broadcast(nb), F.col("item_b") == F.col("nb.iid"))
        .crossJoin(F.broadcast(n_users))
        .select("item_a", "item_b", "n_co", F.round(lift, 4).alias("lift"))
    )
