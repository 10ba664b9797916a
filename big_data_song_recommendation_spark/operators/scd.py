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
    tiebreak: str | list[str] | None = None,
) -> DataFrame:
    """Collapse consecutive rows with an equal ``state_col`` (per
    ``keys``, ordered by ``(ts_col, tiebreak)``) into one interval row:

    ``keys…, version, state, valid_from, valid_to, n_obs, is_current``

    ``version`` is 1-based per key in time order. ``valid_to`` is the
    next interval's ``valid_from`` (half-open convention) and NULL on
    the current (last) interval. State equality is null-safe: a run of
    NULL states is one island, and a NULL→value change closes it.

    Plan shape: every window below partitions on ``keys`` only, so the
    whole build is ONE exchange — no island-grain re-shuffle. Run
    starts carry their fact-grain row_number; the island size is pure
    rank arithmetic (``lead(rn) - rn``, with the per-key total closing
    the last island), never a groupBy.
    """
    ties = (
        [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    )
    order: list[Column] = [F.col(ts_col), *(F.col(t) for t in ties)]
    w = Window.partitionBy(*keys).orderBy(*order)
    wk = Window.partitionBy(*keys)

    # First row per key is detected with lag over a constant (a NULL
    # lagged *state* would be ambiguous with a genuine NULL state).
    prev_state = F.lag(state_col).over(w)
    is_first = F.lag(F.lit(1)).over(w).isNull()
    changed = is_first | ~F.col(state_col).eqNullSafe(prev_state)
    starts = df.select(
        *keys,
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wk).alias("__total"),
        changed.alias("__chg"),
    ).filter("__chg")

    # the filtered run-start rows keep their (ts, tiebreak) order, so
    # the same keys-partitioned window serves version / n_obs / lead
    ws = Window.partitionBy(*keys).orderBy("__rn")
    nxt_rn = F.lead("__rn").over(ws)
    return starts.select(
        *keys,
        F.row_number().over(ws).alias("version"),
        "state",
        "valid_from",
        F.lead("valid_from").over(ws).alias("valid_to"),
        (F.coalesce(nxt_rn, F.col("__total") + 1) - F.col("__rn")).alias(
            "n_obs"
        ),
        nxt_rn.isNull().alias("is_current"),
    )
