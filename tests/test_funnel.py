"""Ordered funnel (operators/funnel.py): step ORDER matters (an
out-of-order completion must not count), per-stage conversion math,
and the one-shuffle window-chain plan."""

from __future__ import annotations

import datetime as dt

from big_data_song_recommendation_spark.operators import funnel


def _ev(spark):
    t0 = dt.datetime(2024, 1, 1)

    def at(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        # u1 completes in order: view(0) click(5) purchase(9)
        (1, "view", at(0)), (1, "click", at(5)), (1, "purchase", at(9)),
        # u2 clicks BEFORE viewing: click(1) view(2) -> stage2 not reached
        (2, "click", at(1)), (2, "view", at(2)),
        # u3 views only
        (3, "view", at(0)),
        # u4 purchase before click: view(0) purchase(1) click(2) -> stage3 unmet
        (4, "view", at(0)), (4, "purchase", at(1)), (4, "click", at(2)),
        # u5 never views (click+purchase) -> stage1 unmet, counts nowhere
        (5, "click", at(0)), (5, "purchase", at(1)),
    ]
    return spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")


def test_order_sensitive_counts(spark):
    out = {r["stage"]: r for r in funnel.funnel_counts(
        _ev(spark), ["view", "click", "purchase"]).collect()}
    assert out[1]["n_users"] == 4          # u1-u4 viewed
    assert out[2]["n_users"] == 2          # u1 and u4 clicked after viewing
    assert out[3]["n_users"] == 1          # only u1 purchased after that click
    assert out[1]["pct_of_prev"] is None
    assert out[2]["pct_of_prev"] == 0.5
    assert out[3]["pct_of_prev"] == 0.5
    assert [out[i]["step"] for i in (1, 2, 3)] == ["view", "click", "purchase"]


def test_stage_timestamps_cascade_nulls(spark):
    stages = {r["user_id"]: r for r in funnel.funnel_stages(
        _ev(spark), ["view", "click", "purchase"]).collect()}
    assert stages[3]["stage2_ts"] is None and stages[3]["stage3_ts"] is None
    assert stages[2]["stage1_ts"] is not None and stages[2]["stage2_ts"] is None
    assert stages[5]["stage1_ts"] is None
    u1 = stages[1]
    assert u1["stage1_ts"] < u1["stage2_ts"] < u1["stage3_ts"]


def test_single_shuffle_window_chain(spark):
    plan = (
        funnel.funnel_counts(_ev(spark), ["view", "click", "purchase"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan  # no per-step self-joins


def test_rejects_short_funnel(spark):
    import pytest

    with pytest.raises(ValueError):
        funnel.funnel_stages(_ev(spark), ["view"])
