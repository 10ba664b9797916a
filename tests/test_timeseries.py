"""Time-series gap-fill (operators/timeseries.py): grid completeness,
fill modes, gap flags, and the no-self-join plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from big_data_song_recommendation_spark.operators import timeseries


def _events(spark):
    base = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        # key 1: observations at hours 0, 3 (gap at 1, 2)
        (1, base, 10.0),
        (1, base + dt.timedelta(hours=3), 40.0),
        # key 2: single observation (degenerate 1-point grid)
        (2, base + dt.timedelta(hours=1), 5.0),
    ]
    return spark.createDataFrame(rows, "k long, ts timestamp, v double")


def test_forward_fill_grid(spark):
    out = timeseries.gap_fill(
        _events(spark), ["k"], "ts", F.sum("v"), step_seconds=3600, fill="forward"
    )
    rows = {(r["k"], r["bucket"].hour): (r["value"], r["is_gap"]) for r in out.collect()}
    assert rows[(1, 0)] == (10.0, False)
    assert rows[(1, 1)] == (10.0, True)   # carried forward, flagged gap
    assert rows[(1, 2)] == (10.0, True)
    assert rows[(1, 3)] == (40.0, False)
    assert rows[(2, 1)] == (5.0, False)
    assert len(rows) == 5  # dense per-key grids, no cross-key calendar


def test_zero_and_none_fill(spark):
    z = timeseries.gap_fill(
        _events(spark), ["k"], "ts", F.sum("v"), step_seconds=3600, fill="zero"
    )
    assert {r["value"] for r in z.filter("is_gap").collect()} == {0.0}
    n = timeseries.gap_fill(
        _events(spark), ["k"], "ts", F.sum("v"), step_seconds=3600, fill="none"
    )
    assert all(r["value"] is None for r in n.filter("is_gap").collect())


def test_rejects_unknown_fill(spark):
    import pytest

    with pytest.raises(ValueError):
        timeseries.gap_fill(_events(spark), ["k"], "ts", F.sum("v"), fill="bogus")


def test_plan_has_no_self_join_for_fill(spark):
    """Forward fill must be a window, not an as-of self-join: exactly
    one join in the plan (grid ⟕ observations)."""
    out = timeseries.gap_fill(
        _events(spark), ["k"], "ts", F.sum("v"), step_seconds=3600
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    joins = sum(plan.count(j) for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"))
    assert joins == 1
    assert "CartesianProduct" not in plan
