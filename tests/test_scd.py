"""Interval coalescing / SCD2 (operators/scd.py): island boundaries,
null-safe state compare, tiebreak order, half-open interval chain."""

from __future__ import annotations

import datetime as dt

from big_data_song_recommendation_spark.operators.scd import collapse_runs

T0 = dt.datetime(2024, 1, 1)


def _at(m):
    return T0 + dt.timedelta(minutes=m)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, seq int, ts timestamp, state string")


def test_runs_collapse_and_versions(spark):
    rows = [
        (1, 1, _at(0), "a"),
        (1, 2, _at(1), "a"),
        (1, 3, _at(2), "b"),
        (1, 4, _at(3), "a"),
        (2, 5, _at(0), "x"),
    ]
    out = collapse_runs(
        _df(spark, rows), keys=["k"], state_col="state", tiebreak="seq"
    )
    got = {
        (r.k, r.version): (r.state, r.n_obs, r.is_current)
        for r in out.collect()
    }
    assert got == {
        (1, 1): ("a", 2, False),
        (1, 2): ("b", 1, False),
        (1, 3): ("a", 1, True),
        (2, 1): ("x", 1, True),
    }


def test_half_open_interval_chain(spark):
    rows = [(1, 1, _at(0), "a"), (1, 2, _at(5), "b"), (1, 3, _at(9), "c")]
    out = (
        collapse_runs(_df(spark, rows), keys=["k"], state_col="state")
        .orderBy("version")
        .collect()
    )
    # valid_to of version N == valid_from of version N+1; last is open
    assert [r.valid_from for r in out] == [_at(0), _at(5), _at(9)]
    assert [r.valid_to for r in out] == [_at(5), _at(9), None]
    assert [r.is_current for r in out] == [False, False, True]


def test_null_states_form_islands(spark):
    # a NULL run is ONE island (null-safe equality), and NULL→value is
    # a change; a leading NULL state still starts version 1
    rows = [
        (1, 1, _at(0), None),
        (1, 2, _at(1), None),
        (1, 3, _at(2), "a"),
        (1, 4, _at(3), None),
    ]
    out = (
        collapse_runs(_df(spark, rows), keys=["k"], state_col="state")
        .orderBy("version")
        .collect()
    )
    assert [(r.version, r.state, r.n_obs) for r in out] == [
        (1, None, 2),
        (2, "a", 1),
        (3, None, 1),
    ]


def test_tiebreak_orders_equal_timestamps(spark):
    # same ts: seq decides run membership deterministically
    rows = [
        (1, 2, _at(0), "b"),
        (1, 1, _at(0), "a"),
        (1, 3, _at(1), "b"),
    ]
    out = (
        collapse_runs(
            _df(spark, rows), keys=["k"], state_col="state", tiebreak="seq"
        )
        .orderBy("version")
        .collect()
    )
    assert [(r.version, r.state, r.n_obs) for r in out] == [
        (1, "a", 1),
        (2, "b", 2),
    ]


def test_single_exchange_plan(spark):
    """The whole islands build partitions on the keys only → ONE
    Exchange (no island-grain re-shuffle; n_obs is rank arithmetic)."""
    rows = [(1, 1, _at(0), "a"), (1, 2, _at(1), "b")]
    plan = (
        collapse_runs(
            _df(spark, rows), keys=["k"], state_col="state", tiebreak="seq"
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1


def test_incremental_apply_equals_full_rebuild(spark):
    """The documented incremental recipe (union the CURRENT open
    intervals' observations with the new batch, re-collapse) yields
    the same dimension as a full-history rebuild."""
    rows_old = [
        (1, 1, _at(0), "a"),
        (1, 2, _at(5), "b"),
        (2, 3, _at(0), "x"),
    ]
    rows_new = [
        (1, 4, _at(10), "b"),   # no change for key 1 → still one 'b' run
        (1, 5, _at(12), "c"),   # change
        (2, 6, _at(11), "y"),   # change
        (3, 7, _at(1), "q"),    # brand-new key
    ]
    full = collapse_runs(
        _df(spark, rows_old + rows_new),
        keys=["k"], state_col="state", tiebreak="seq",
    )

    # incremental: keep closed intervals, re-collapse open ones + new
    hist = collapse_runs(
        _df(spark, rows_old), keys=["k"], state_col="state", tiebreak="seq"
    )
    closed = hist.filter(~hist.is_current)
    # reconstruct each open interval's defining observation (its
    # start), union the new batch, re-collapse the tail
    open_obs = (
        hist.filter(hist.is_current)
        .selectExpr(
            "k", "CAST(NULL AS int) AS seq", "valid_from AS ts", "state"
        )
    )
    tail = collapse_runs(
        open_obs.unionByName(_df(spark, rows_new)),
        keys=["k"], state_col="state", tiebreak="seq",
    )
    # stitch: closed intervals keep their versions; tail versions are
    # offset by the closed count per key
    from pyspark.sql import functions as F

    offs = closed.groupBy("k").agg(F.count("*").alias("off"))
    stitched = (
        tail.join(offs, "k", "left")
        .na.fill({"off": 0})
        .withColumn("version", F.col("version") + F.col("off"))
        .drop("off")
        .unionByName(closed)
    )

    def key(df):
        return {
            (r.k, r.version): (r.state, r.valid_from, r.valid_to, r.is_current)
            for r in df.collect()
        }

    # n_obs differs on the resumed run (the open interval collapses to
    # one synthetic observation) — the interval CHAIN must match
    assert key(stitched) == key(full)
