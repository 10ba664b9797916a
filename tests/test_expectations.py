"""Expectation audit (operators/expectations.py): per-kind metric
semantics, NULL handling, and the one-scan plan contract."""

from __future__ import annotations

import pytest

from big_data_song_recommendation_spark.operators.expectations import (
    expectation_audit,
)
from big_data_song_recommendation_spark.sources.readers import load_table

from .conftest import SF_DIR


def _rows(df):
    return {
        (r.check, r.column): (r.metric, r.passed) for r in df.collect()
    }


def test_each_check_kind(spark):
    df = spark.createDataFrame(
        [
            (1, "F", 10.0),
            (1, "O", -5.0),  # dup id, out-of-range value
            (2, None, 20.0),  # NULL status ignored by accepted
            (3, "Z", 2_000_000.0),  # bad status, out-of-range value
            (None, "O", 30.0),  # NULL id
        ],
        "id long, status string, amount double",
    )
    got = _rows(
        expectation_audit(
            df,
            [
                ("min_rows", None, 10),
                ("not_null", "id"),
                ("unique", "id"),
                ("accepted", "status", ["F", "O"]),
                ("range", "amount", 0.0, 1_000_000.0),
            ],
        )
    )
    assert got == {
        ("min_rows", "*"): (5, False),
        ("not_null", "id"): (1, False),
        ("unique", "id"): (1, False),  # one duplicated non-null id
        ("accepted", "status"): (1, False),  # only 'Z'; NULL not counted
        ("range", "amount"): (2, False),
    }


def test_all_pass_on_clean_input(spark):
    df = spark.createDataFrame(
        [(1, "F", 1.0), (2, "O", 2.0)], "id long, status string, amount double"
    )
    got = _rows(
        expectation_audit(
            df,
            [
                ("min_rows", None, 2),
                ("not_null", "id"),
                ("unique", "id"),
                ("accepted", "status", ["F", "O"]),
                ("range", "amount", 0.0, 10.0),
            ],
        )
    )
    assert all(passed for _, passed in got.values())
    assert got[("min_rows", "*")] == (2, True)


def test_empty_input_metrics_are_zero(spark):
    df = spark.createDataFrame([], "id long, status string")
    got = _rows(
        expectation_audit(
            df, [("min_rows", None, 1), ("not_null", "id")]
        )
    )
    assert got == {
        ("min_rows", "*"): (0, False),
        ("not_null", "id"): (0, True),
    }


def test_single_scan_plan(spark):
    """Every check compiles into the SAME aggregate: exactly one
    parquet scan regardless of check count (the deequ property)."""
    orders = load_table(spark, SF_DIR, "orders")
    audit = expectation_audit(
        orders,
        [
            ("min_rows", None, 1),
            ("not_null", "o_orderkey"),
            ("unique", "o_orderkey"),
            ("accepted", "o_orderstatus", ["F", "O", "P"]),
            ("range", "o_totalprice", 0.0, 1e9),
        ],
    )
    plan = audit._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_unknown_kind_raises(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="unknown check kind"):
        expectation_audit(df, [("nope", "id")]).collect()
