"""local_frame (r12): committed-literal tables must stage as in-JVM
LocalRelations with values IDENTICAL to the classic createDataFrame
path — the optimization swaps the physical staging (a 32-task pickled
RDD scan per action → driver-local Arrow rows), never the data."""

import pytest

from big_data_song_recommendation_spark.sources.readers import local_frame


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_lm_tier_rows_identical_and_local(spark):
    from big_data_song_recommendation_spark.ml import lm

    tri, _, _ = lm.score_maps()
    data = list(tri.items())
    schema = "k string, v long"
    got = local_frame(spark, data, schema)
    want = spark.createDataFrame(data, schema)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert "LocalRelation" in _plan(got)
    assert got.schema == want.schema


def test_array_column_rows_identical_and_local(spark):
    from big_data_song_recommendation_spark.ml import als_factors as AF

    schema = "user_id int, uf array<bigint>"
    got = local_frame(spark, AF.ALS_USER_FACTORS, schema)
    want = spark.createDataFrame(AF.ALS_USER_FACTORS, schema)
    assert sorted((r[0], tuple(r[1])) for r in got.collect()) == sorted(
        (r[0], tuple(r[1])) for r in want.collect()
    )
    assert "LocalRelation" in _plan(got)
    assert got.schema == want.schema


def test_empty_and_exotic_rows_fall_back(spark):
    empty = local_frame(spark, [], "fp string")
    assert empty.count() == 0
    assert empty.schema.simpleString() == "struct<fp:string>"
    # dict rows are outside the strict tuple/list contract — classic path
    dicts = local_frame(spark, [{"a": 1}], "a int")
    assert [r["a"] for r in dicts.collect()] == [1]


def test_column_name_list_schema(spark):
    got = local_frame(spark, [("x", 1), ("y", 2)], ["k", "n"])
    want = spark.createDataFrame([("x", 1), ("y", 2)], ["k", "n"])
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.columns == ["k", "n"]


def test_float_and_bool_columns(spark):
    rows = [(1, [1.5, -2.25], True), (2, [0.0], False)]
    schema = "cluster int, centroid array<double>, flag boolean"
    got = local_frame(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    assert sorted(
        (r[0], tuple(r[1]), r[2]) for r in got.collect()
    ) == sorted((r[0], tuple(r[1]), r[2]) for r in want.collect())
