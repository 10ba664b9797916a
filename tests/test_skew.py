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


def test_skew_report_ranks_hot_key_and_no_global_sort(spark):
    from big_data_song_recommendation_spark.operators.skew import skew_report

    # key 7 owns 90 of 100 rows; ten singleton keys fill the rest
    rows = [(7,)] * 90 + [(i,) for i in range(10, 20)]
    df = spark.createDataFrame(rows, ["k"])
    out = skew_report(df, "k", top_k=3)
    got = out.collect()
    assert [r["rnk"] for r in got] == [1, 2, 3]
    top = got[0]
    assert (top["key"], top["n"]) == ("7", 90)
    assert top["share"] == 0.9
    # 11 keys, mean 100/11 ≈ 9.09 -> ratio 90*11/100 = 9.9
    assert top["ratio_to_mean"] == 9.9
    # top-k must plan as TakeOrdered, not a global Sort+Exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
