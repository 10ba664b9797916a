"""Exact weighted quantile (operators/ranks.weighted_quantile)."""

from pyspark.sql import Row

from big_data_song_recommendation_spark.operators.ranks import (
    weighted_quantile,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(g=g, v=float(v), w=w) for g, v, w in rows]
    )


def test_weighted_median_hand_case(spark):
    # values 1..4 with weights 1,1,1,7 -> half the mass (5 of 10)
    # is reached only at v=4
    rows = [("a", 1, 1), ("a", 2, 1), ("a", 3, 1), ("a", 4, 7)]
    got = weighted_quantile(_df(spark, rows), "v", "w", group=["g"]).head()
    assert got["wq"] == 4.0


def test_unit_weights_reduce_to_lower_median(spark):
    rows = [("a", v, 1) for v in [10, 20, 30, 40]]
    got = weighted_quantile(_df(spark, rows), "v", "w", group=["g"]).head()
    assert got["wq"] == 20.0  # cum(20)=2, 2*2 >= 4


def test_duplicate_values_collapse_to_value_grain(spark):
    # 5 copies of v=1 (w=1 each) vs one v=2 (w=1): median 1
    rows = [("a", 1, 1)] * 5 + [("a", 2, 1)]
    got = weighted_quantile(_df(spark, rows), "v", "w", group=["g"]).head()
    assert got["wq"] == 1.0


def test_quantile_fractions_and_total(spark):
    rows = [("a", v, 1) for v in range(1, 11)]
    df = _df(spark, rows)
    p90 = weighted_quantile(
        df, "v", "w", group=["g"], q_num=9, q_den=10, tot_out="tot"
    ).head()
    assert (p90["wq"], p90["tot"]) == (9.0, 10)
    p10 = weighted_quantile(
        df, "v", "w", group=["g"], q_num=1, q_den=10
    ).head()
    assert p10["wq"] == 1.0


def test_groups_independent(spark):
    rows = [("a", 1, 9), ("a", 100, 1), ("b", 100, 9), ("b", 1, 1)]
    got = {
        r["g"]: r["wq"]
        for r in weighted_quantile(
            _df(spark, rows), "v", "w", group=["g"]
        ).collect()
    }
    assert got == {"a": 1.0, "b": 100.0}
