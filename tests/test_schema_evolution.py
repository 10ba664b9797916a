"""Evolving-lake reads: shards written before a column existed must
stay readable (NULL where absent), the merged schema must be the
union, and the required-columns guard must catch renames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_song_recommendation_spark.sources.readers import (
    read_parquet_evolving,
)


@pytest.fixture()
def lake(spark, tmp_path):
    base = str(tmp_path / "lake")
    spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit("alpha").alias("text")
    ).write.parquet(f"{base}/epoch=0")
    spark.range(5, 9).select(
        F.col("id").alias("doc_id"),
        F.lit("beta").alias("text"),
        F.lit("en").alias("lang"),  # column added in epoch 1
    ).write.parquet(f"{base}/epoch=1")
    return base


def test_merged_read_unions_schema_and_nulls_old_rows(spark, lake):
    df = read_parquet_evolving(spark, f"{lake}/epoch=0", f"{lake}/epoch=1")
    assert set(df.columns) == {"doc_id", "text", "lang"}
    assert df.count() == 9
    assert df.filter(F.col("lang").isNull()).count() == 5  # epoch 0
    assert df.filter(F.col("lang") == "en").count() == 4


def test_required_guard_catches_missing_or_mistyped(spark, lake):
    # present + correctly typed → fine
    read_parquet_evolving(
        spark,
        f"{lake}/epoch=0",
        f"{lake}/epoch=1",
        required={"doc_id": "bigint", "lang": "string"},
    )
    with pytest.raises(ValueError, match="language"):  # renamed column
        read_parquet_evolving(
            spark,
            f"{lake}/epoch=0",
            f"{lake}/epoch=1",
            required={"language": "string"},
        )
    with pytest.raises(ValueError, match="doc_id"):  # type drift
        read_parquet_evolving(
            spark, f"{lake}/epoch=0", required={"doc_id": "string"}
        )


def test_pruning_survives_merge(spark, lake):
    df = read_parquet_evolving(
        spark, f"{lake}/epoch=0", f"{lake}/epoch=1"
    ).filter(F.col("doc_id") >= 5).select("doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<doc_id:bigint>" in plan, plan
    assert df.count() == 4
