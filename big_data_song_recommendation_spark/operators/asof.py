"""As-of (most-recent-prior) join — an operator Spark lacks natively
(absent from the reference too, SURVEY.md §2.3 "absent join types";
included because event-time pipelines need it constantly).

Implemented as the sort-based union-window form: tag both sides, union,
window ``last(right_value, ignorenulls)`` over (key, time-order) rows
preceding. ONE shuffle on the key + an in-partition sort — no range
join, no per-key loop; this is the shape that survives 100 TB. (The
``pd.merge_asof``-per-group alternative in the PySpark guide shuffles
the same amount but pays Python/Arrow transfer.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    tiebreak: str | None = None,
    strict: bool = True,
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts < left.ts`` (``<=`` when ``strict=False``) per key.

    ``tiebreak``: optional column ordering rows with identical
    timestamps (rows sort by (ts, side, tiebreak); the right side
    sorts before the left at equal ts only when ``strict=False``).
    Payload columns come back as ``asof_<name>``; the match timestamp
    as ``asof_ts``.

    ``tolerance``: optional maximum lookback as an interval string
    (e.g. ``"1 hour"`` — ``pd.merge_asof(tolerance=...)`` semantics):
    a match older than ``left.ts - tolerance`` is discarded (payload
    nulled), applied as a post-window filter so the plan shape is
    unchanged. This is also the retention contract a streaming
    deployment would use to bound per-key state."""
    right_payload = right_payload or []

    lt = left.withColumn("__side", F.lit(1))
    rt = right.withColumn("__side", F.lit(0))

    # align schemas for the union
    carry = [F.col(right_ts).alias("__rts")] + [
        F.col(c).alias(f"__rp_{c}") for c in right_payload
    ]
    rt = rt.select(F.col(on).alias("__k"), F.col(right_ts).alias("__ts"), "__side", *carry)
    null_carry = [F.lit(None).cast(dict(rt.dtypes)["__rts"]).alias("__rts")] + [
        F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__rp_{c}") for c in right_payload
    ]
    lt_cols = [F.col(c) for c in left.columns]
    lt = lt.select(
        F.col(on).alias("__k"), F.col(left_ts).alias("__ts"), "__side", *null_carry, *lt_cols
    )
    rt_full = rt.select(
        "__k", "__ts", "__side", "__rts",
        *[F.col(f"__rp_{c}") for c in right_payload],
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns],
    )
    unioned = lt.unionByName(rt_full)

    # strict: at equal ts the left row sorts BEFORE the right row, so
    # the preceding-frame window can't see a same-ts right row.
    side_order = F.col("__side").asc() if not strict else F.col("__side").desc()
    order = [F.col("__ts").asc(), side_order]
    if tiebreak:
        order.append(F.col(tiebreak).asc_nulls_first())
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    out = unioned.withColumn("asof_ts", F.last("__rts", ignorenulls=True).over(w))
    for c in right_payload:
        out = out.withColumn(f"asof_{c}", F.last(f"__rp_{c}", ignorenulls=True).over(w))
    if tolerance is not None:
        in_window = F.col("asof_ts") >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
        for c in right_payload:
            out = out.withColumn(
                f"asof_{c}", F.when(in_window, F.col(f"asof_{c}"))
            )
        out = out.withColumn("asof_ts", F.when(in_window, F.col("asof_ts")))
    return (
        out.filter(F.col("__side") == 1)
        .drop("__k", "__ts", "__side", "__rts", *[f"__rp_{c}" for c in right_payload])
    )
