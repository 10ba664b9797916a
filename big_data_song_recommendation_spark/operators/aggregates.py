"""Aggregation operators (SURVEY.md §2.4-§2.6, A1-A11, O1-O6).

All single-shuffle shapes; the reference computed these with Python
loops over collected lists (``src/streaming_service.py:306-382``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def histogram(df: DataFrame, col: str, count_name: str = "n") -> DataFrame:
    """A6: frequency histogram (emotion/action distribution)."""
    return df.groupBy(col).agg(F.count("*").alias(count_name))


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """O1-O3: global top-k. Spark compiles orderBy+limit into
    TakeOrderedAndProject — no full sort, per-partition heaps only.
    Pass a total order (tie-break on a key) for determinism."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    k: int,
    rank_name: str = "rnk",
) -> DataFrame:
    """A7/A9/§2.5: top-k per group via row_number window. One shuffle
    on the group key; state per group is O(k) after AQE."""
    w = Window.partitionBy(*group).orderBy(*order)
    return df.withColumn(rank_name, F.row_number().over(w)).filter(
        F.col(rank_name) <= k
    )


def argmax_per_group(
    df: DataFrame, group: list[str], order_col: str, payload: list[str]
) -> DataFrame:
    """A9: per-group argmax carrying payload columns (the reference's
    'featured tracks': per-track max rating + display struct) via
    ``max_by`` — single aggregation, no self-join."""
    aggs = [F.max(order_col).alias(f"max_{order_col}")] + [
        F.max_by(p, order_col).alias(p) for p in payload
    ]
    return df.groupBy(*group).agg(*aggs)


def distinct_count(
    df: DataFrame, group: list[str], col: str, *, approx: bool = False, rsd: float = 0.05
) -> DataFrame:
    """A3: distinct counts. ``approx=True`` switches to HyperLogLog++
    (`approx_count_distinct`) — the only sane option at 100 TB; exact
    mode exists for oracle-checked correctness queries."""
    agg = (
        F.approx_count_distinct(col, rsd) if approx else F.countDistinct(col)
    ).alias(f"n_{col}")
    return df.groupBy(*group).agg(agg)


def paginate(
    df: DataFrame, sort: list[Column], limit: int, offset: int = 0
) -> DataFrame:
    """O4: keyset-ordered limit/offset (the `/songs` endpoint). The
    reference collected limit+offset rows to the driver and sliced in
    Python (``src/app.py:175-183``); Spark 3.4+ pushes offset into the
    plan."""
    out = df.orderBy(*sort)
    if offset:
        out = out.offset(offset)
    return out.limit(limit)
