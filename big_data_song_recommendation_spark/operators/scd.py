"""Interval coalescing (islands) / SCD Type-2 dimension build.

The classic warehouse operator the reference never needed (its
dimensions are static CSV loads — ``src/spark/training.py:113-150``)
but any system ingesting *observations* of a changing attribute does:
collapse a per-key, time-ordered stream of observed states into
validity intervals ``[valid_from, valid_to)`` with a version counter
and an ``is_current`` flag — i.e. run-length-encode consecutive equal
states (gaps-and-islands).

Shape at 100 TB: one shuffle on the key for the two fact-grain
windows (lag + running sum — Catalyst plans them over the SAME sort
order, one Exchange + one Sort), then an aggregate to island grain
(orders-of-magnitude smaller than the fact table), then a lead window
on the *island* grain. No self-joins, no per-key loops; the partition
key is the entity key, so skew follows entity activity (salt upstream
if one entity dominates — see operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def collapse_runs(
    df: DataFrame,
    *,
    keys: list[str],
    state_col: str,
    ts_col: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse consecutive rows with an equal ``state_col`` (per
    ``keys``, ordered by ``(ts_col, tiebreak)``) into one interval row:

    ``keys…, version, state, valid_from, valid_to, n_obs, is_current``

    ``version`` is 1-based per key in time order. ``valid_to`` is the
    next interval's ``valid_from`` (half-open convention) and NULL on
    the current (last) interval. State equality is null-safe: a run of
    NULL states is one island, and a NULL→value change closes it.
    """
    order: list[Column] = [F.col(ts_col)]
    if tiebreak is not None:
        order.append(F.col(tiebreak))
    w = Window.partitionBy(*keys).orderBy(*order)

    # First row per key is detected with lag over a constant (a NULL
    # lagged *state* would be ambiguous with a genuine NULL state).
    prev_state = F.lag(state_col).over(w)
    is_first = F.lag(F.lit(1)).over(w).isNull()
    changed = is_first | ~F.col(state_col).eqNullSafe(prev_state)
    run = df.withColumn(
        "__version",
        F.sum(changed.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )

    island = run.groupBy(*keys, "__version").agg(
        # any_value is safe: the state is constant within an island by
        # construction
        F.any_value(state_col).alias("state"),
        F.min(ts_col).alias("valid_from"),
        F.count("*").alias("n_obs"),
    )
    wv = Window.partitionBy(*keys).orderBy("__version")
    return island.select(
        *keys,
        F.col("__version").alias("version"),
        "state",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "n_obs",
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    )
