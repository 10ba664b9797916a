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


def test_mad_outliers_flags_planted_spike_not_mean_dragged(spark):
    from big_data_song_recommendation_spark.operators.timeseries import (
        mad_outliers,
    )

    # tight cluster around 10 plus one huge spike: classic case where
    # mean/stddev z-score UNDER-flags (the spike inflates sigma) but
    # median/MAD flags exactly the spike
    vals = [9.0, 9.5, 10.0, 10.0, 10.5, 11.0, 1000.0]
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(vals)], ["g", "i", "v"]
    )
    out = {r["i"]: r["is_outlier"] for r in mad_outliers(df, ["g"], "v").collect()}
    assert out[6] is True
    assert all(out[i] is False for i in range(6))


def test_mad_outliers_zero_mad_degenerate_group(spark):
    from big_data_song_recommendation_spark.operators.timeseries import (
        mad_outliers,
    )

    # >half identical values -> MAD 0: every deviant flags, equals don't
    df = spark.createDataFrame(
        [("a", i, 5.0) for i in range(5)] + [("a", 9, 5.1)], ["g", "i", "v"]
    )
    rows = mad_outliers(df, ["g"], "v").collect()
    flags = {r["i"]: r["is_outlier"] for r in rows}
    assert flags[9] is True
    assert all(flags[i] is False for i in range(5))
    assert all(r["mad"] == 0.0 for r in rows)


def test_resample_ohlc_first_last_by_ts_then_id(spark):
    import datetime as dt

    from big_data_song_recommendation_spark.operators.timeseries import (
        resample_ohlc,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("a", 1, t0, 5.0),                              # open (earliest)
        ("a", 2, t0, 7.0),                              # same ts: id breaks tie
        ("a", 3, t0 + dt.timedelta(hours=2), 1.0),      # low
        ("a", 4, t0 + dt.timedelta(hours=3), 9.0),      # high
        ("a", 5, t0 + dt.timedelta(hours=4), 6.0),      # close (latest)
        ("a", 6, t0 + dt.timedelta(days=1), 2.0),       # next bucket
    ]
    df = spark.createDataFrame(rows, ["k", "id", "ts", "v"])
    out = {r["bucket"]: r for r in
           resample_ohlc(df, ["k"], "ts", "v", "id", step_seconds=86400).collect()}
    day1 = out[t0]
    assert (day1["open"], day1["high"], day1["low"], day1["close"], day1["n"]) == (
        5.0, 9.0, 1.0, 6.0, 5,
    )
    day2 = out[t0 + dt.timedelta(days=1)]
    assert (day2["open"], day2["close"], day2["n"]) == (2.0, 2.0, 1)


# ---------------------------------------------------------------------------
# time_weighted_avg (TWAP)
# ---------------------------------------------------------------------------


def _twap_events(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        # key 1: 10.0 held 60 s, 20.0 held 180 s, 40.0 open-ended
        (1, base, 10.0),
        (1, base + dt.timedelta(seconds=60), 20.0),
        (1, base + dt.timedelta(seconds=240), 40.0),
        # key 2: single observation → no interval, no output row
        (2, base, 99.0),
    ]
    return spark.createDataFrame(rows, "k int, ts timestamp, value double")


def test_time_weighted_avg_hand_computed(spark):
    out = timeseries.time_weighted_avg(
        _twap_events(spark), keys=["k"]
    ).collect()
    rows = {r.k: (r.n_intervals, r.twav) for r in out}
    # (10*60 + 20*180) / 240 = 17.5 ; key 2 drops (no duration)
    assert rows == {1: (2, 17.5)}


def test_time_weighted_avg_keys_isolate(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 10.0),
        (1, base + dt.timedelta(seconds=10), 0.0),
        (2, base + dt.timedelta(seconds=5), 50.0),
        (2, base + dt.timedelta(seconds=15), 0.0),
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, value double")
    out = {r.k: r.twav for r in timeseries.time_weighted_avg(df, keys=["k"]).collect()}
    # durations never cross keys: both series hold one 10 s interval
    assert out == {1: 10.0, 2: 50.0}


def test_time_weighted_avg_single_exchange(spark):
    """Window and rollup share the partition keys → ONE Exchange."""
    df = _twap_events(spark)
    plan = (
        timeseries.time_weighted_avg(df, keys=["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
