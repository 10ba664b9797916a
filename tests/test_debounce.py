"""Debounce operators: gap (window) vs stateful (applyInPandas)
semantics, each against an independent Python reference."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from big_data_song_recommendation_spark.operators.debounce import (
    debounce_gap,
    debounce_py_reference,
    debounce_stateful,
)

BASE = dt.datetime(2026, 1, 1, 12, 0, 0)


def _ev(uid: int, sec: float, eid: int) -> Row:
    return Row(
        user_id=uid,
        ts=BASE + dt.timedelta(seconds=sec),
        event_id=eid,
    )


def test_stateful_emits_one_per_cooldown_under_sustained_stream(spark):
    """1 Hz stream, 5 s cooldown: gap-debounce keeps ONLY the first
    event (no inter-event gap ever reaches 5 s); stateful keeps one
    event every 5 s — the semantic difference that justifies the
    applyInPandas operator."""
    rows = [_ev(1, i, i) for i in range(20)]  # 1 Hz, 20 s
    df = spark.createDataFrame(rows)

    got_gap = debounce_gap(
        df, keys=["user_id"], cooldown_s=5.0
    ).collect()
    assert len(got_gap) == 1 and got_gap[0].event_id == 0

    got_stateful = sorted(
        r.event_id
        for r in debounce_stateful(
            df, keys=["user_id"], cooldown_s=5.0
        ).collect()
    )
    assert got_stateful == [0, 5, 10, 15]


@pytest.mark.parametrize("impl", ["fold", "pandas"])
def test_stateful_matches_python_reference_on_irregular_stream(spark, impl):
    secs = [0, 1, 2, 9, 9.5, 10, 30, 31, 200, 201, 205, 206, 400]
    rows = [_ev(u, s + u * 0.37, i * 10 + u) for u in (1, 2, 3)
            for i, s in enumerate(secs)]
    df = spark.createDataFrame(rows).repartition(7)

    got = sorted(
        (r.user_id, r.event_id)
        for r in debounce_stateful(
            df, keys=["user_id"], cooldown_s=8.0, impl=impl
        ).collect()
    )
    ref_rows = [
        (r.user_id, (r.ts - BASE).total_seconds(), r.event_id)
        for r in rows
    ]
    want = sorted(
        (k, tie) for k, _, tie in debounce_py_reference(ref_rows, 8.0)
    )
    assert got == want


def test_fold_and_pandas_agree_on_random_streams(spark):
    import random

    rng = random.Random(7)
    rows = []
    eid = 0
    for u in range(12):
        t = 0.0
        for _ in range(rng.randint(1, 60)):
            t += rng.choice([0.5, 1.0, 3.0, 7.9, 8.0, 8.1, 30.0])
            rows.append(_ev(u, t, eid))
            eid += 1
    df = spark.createDataFrame(rows)
    a = sorted(
        (r.user_id, r.event_id)
        for r in debounce_stateful(
            df, keys=["user_id"], cooldown_s=8.0, impl="fold"
        ).collect()
    )
    b = sorted(
        (r.user_id, r.event_id)
        for r in debounce_stateful(
            df, keys=["user_id"], cooldown_s=8.0, impl="pandas"
        ).collect()
    )
    assert a == b


def test_gap_debounce_keeps_schema_and_first_rows(spark):
    rows = [_ev(1, 0, 1), _ev(1, 700, 2), _ev(1, 900, 3), _ev(2, 0, 4)]
    df = spark.createDataFrame(rows)
    out = debounce_gap(df, keys=["user_id"], cooldown_s=600.0)
    assert out.columns == df.columns
    kept = sorted(r.event_id for r in out.collect())
    # event 3 is 200 s after event 2 → dropped; firsts kept
    assert kept == [1, 2, 4]


def test_stateful_partitioning_invariant(spark):
    rows = [_ev(u, s, u * 100 + int(s)) for u in (1, 2) for s in range(0, 60, 3)]
    df = spark.createDataFrame(rows)
    a = sorted(
        (r.user_id, r.event_id)
        for r in debounce_stateful(df, keys=["user_id"], cooldown_s=10.0).collect()
    )
    b = sorted(
        (r.user_id, r.event_id)
        for r in debounce_stateful(
            df.repartition(13), keys=["user_id"], cooldown_s=10.0
        ).collect()
    )
    assert a == b
