"""Skew operators: salted join and salted distinct-count must be
row-identical to their unsalted equivalents, with the salt visible in
the shuffle key."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_song_recommendation_spark.operators import skew
from big_data_song_recommendation_spark.sources.readers import load_table

from .conftest import SF_DIR


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey")
    salted = skew.salted_join(li, orders, "l_orderkey", salts=4)
    cols = ["l_orderkey", "l_partkey", "l_quantity", "o_totalprice"]
    assert _sorted_rows(salted, cols) == _sorted_rows(plain, cols)


def test_salted_join_spreads_shuffle_key(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    out = skew.salted_join(li, orders, "l_orderkey", salts=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan  # the shuffle/join key carries the salt


def test_salted_join_outer_keeps_unmatched(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], ["k", "v"])
    b = spark.createDataFrame([(1, 10.0)], ["k", "w"])
    out = skew.salted_join(a, b, "k", salts=3, how="left").collect()
    assert len(out) == 3
    assert {r["k"]: r["w"] for r in out} == {1: 10.0, 2: None, 3: None}


def test_salted_distinct_count_exact(spark):
    ev = load_table(spark, SF_DIR, "events")
    want = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {
        r["event_type"]: r["n_distinct_user_id"]
        for r in skew.salted_distinct_count(
            ev, "event_type", "user_id", salts=16
        ).collect()
    }
    assert got == want
