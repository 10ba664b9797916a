"""HLL sketch rollup tables (operators/sketches.py): bounded error vs
exact, and the mergeability algebra that makes pre-aggregated sketch
tables sound (union of per-grain state == state of the union)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_song_recommendation_spark.operators import sketches
from big_data_song_recommendation_spark.sources.readers import load_table

from .conftest import SF_DIR


def test_rollup_error_bounded(spark):
    ev = load_table(spark, SF_DIR, "events").withColumn("day", F.to_date("ts"))
    daily = sketches.sketch_rollup(ev, ["day", "event_type"], "user_id")
    # coarser grain via union of stored sketches
    per_type = sketches.rollup_distinct(daily, ["event_type"]).collect()
    exact = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert per_type
    for r in per_type:
        e = exact[r["event_type"]]
        assert abs(r["approx_distinct"] - e) / e < 0.05, (r, e)


def test_union_of_grains_equals_sketch_of_union(spark):
    """estimate(union(per-day sketches)) must EXACTLY equal
    estimate(one sketch over all rows): HLL state union is lossless
    for same-lg_k sketches, which is what makes incremental rollup
    refresh correct (not merely approximately correct)."""
    ev = load_table(spark, SF_DIR, "events").withColumn("day", F.to_date("ts"))
    daily = sketches.sketch_rollup(ev, ["day"], "user_id")
    merged = sketches.rollup_distinct(daily, []).first()["approx_distinct"]
    direct = ev.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(sketches.DEFAULT_LG_K))
        ).alias("d")
    ).first()["d"]
    assert merged == direct
    # and row counts carry through the rollup
    assert (
        sketches.rollup_distinct(daily, []).first()["n_rows"] == ev.count()
    )


def test_rollup_is_single_shuffle(spark):
    ev = load_table(spark, SF_DIR, "events")
    plan = (
        sketches.sketch_rollup(ev, ["event_type"], "user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1  # map-side combined
