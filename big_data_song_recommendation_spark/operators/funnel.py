"""Ordered funnel analysis: how many users complete step 1 → 2 → … in
order (each step strictly after the previous one), with per-stage
conversion counts.

Shape: ONE shuffle — everything happens inside a single per-user
window partitioning. Stage k's earliest valid timestamp is
``min(ts) FILTER (event = step_k AND ts > stage_{k-1}_ts)`` as a
window over the user; each stage references the previous stage's
window result, which Catalyst plans as a chain of Window operators
over the SAME Exchange+Sort (no self-joins — the naive formulation
joins the events table once per step, k shuffles instead of one).

At 100 TB: the user key is the natural partitioner; skewed power
users are bounded because only (step, ts) pairs matter — project
before the window and the per-user state is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user earliest completion time of each ordered step:
    ``(user, stage1_ts, …, stageN_ts)`` — NULL from the first
    uncompleted stage onward."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    ev = events.select(user_col, type_col, ts_col)
    w = Window.partitionBy(user_col)
    out = ev
    prev = None
    for i, step in enumerate(steps, start=1):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        name = f"stage{i}_ts"
        out = out.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = name
    return out.select(
        user_col, *[f"stage{i}_ts" for i in range(1, len(steps) + 1)]
    ).distinct()


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Stage-level rollup: ``(stage, step, n_users, pct_of_prev)`` —
    users reaching each stage in order, with the per-stage conversion
    ratio (4-dp floored for engine parity)."""
    stages = funnel_stages(
        events, steps, user_col=user_col, type_col=type_col, ts_col=ts_col
    )
    counts = stages.agg(
        *[
            F.count(f"stage{i}_ts").alias(f"n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    # one explode over a struct array, NOT a per-stage union: a union
    # of k selects over the same aggregate re-executes the whole
    # window pipeline k times (each branch is an independent subtree)
    structs = []
    for i, step in enumerate(steps, start=1):
        pct = (
            F.lit(None).cast("double")
            if i == 1
            else F.when(
                F.col(f"n{i - 1}") > 0,
                F.floor(F.col(f"n{i}") / F.col(f"n{i - 1}") * 10000.0) / 10000.0,
            )
        )
        structs.append(
            F.struct(
                F.lit(i).alias("stage"),
                F.lit(step).alias("step"),
                F.col(f"n{i}").alias("n_users"),
                pct.alias("pct_of_prev"),
            )
        )
    return counts.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
