"""Partitioned parquet sinks: layout, round-trip, and the partition-
pruning contract (a date filter must prune to matching directories)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_song_recommendation_spark.sources import sinks
from big_data_song_recommendation_spark.sources.readers import load_table

from .conftest import SF_DIR


def test_events_by_day_roundtrip_and_pruning(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    out = str(tmp_path / "events_lake")
    sinks.write_events_by_day(ev, out)

    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    n_days = back.select("event_date").distinct().count()
    assert n_days >= 2, "fixture spans multiple days"

    one_day = back.select("event_date").orderBy("event_date").first()["event_date"]
    filtered = back.filter(F.col("event_date") == F.lit(one_day))
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # the date predicate must land in PartitionFilters (directory
    # pruning), NOT in PushedFilters (row-group skipping)
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "event_date" in pf
    assert filtered.count() == ev.filter(F.to_date("ts") == F.lit(one_day)).count()


def test_csv_json_roundtrip(spark, tmp_path):
    df = load_table(spark, SF_DIR, "region")
    sinks.write_csv(df, str(tmp_path / "r_csv"))
    sinks.write_json(df, str(tmp_path / "r_json"))
    csv_back = spark.read.option("header", True).csv(str(tmp_path / "r_csv"))
    json_back = spark.read.json(str(tmp_path / "r_json"))
    assert csv_back.count() == df.count()
    assert json_back.count() == df.count()
    assert set(json_back.columns) == set(df.columns)
