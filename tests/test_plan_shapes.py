"""Physical-plan shape checks — the scale contract, asserted.

Correctness tests prove the answers; these prove the PLANS stay the
ones that survive a 100× scale-up: dimension joins broadcast (fact
side never shuffles for lookups), filters and projections reach the
parquet scan, and hot paths stay inside whole-stage codegen."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_song_recommendation_spark.plans.queries import QUERIES
from big_data_song_recommendation_spark.sources.readers import load_table

from .conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dimension_joins_broadcast(spark):
    """q03 (region→nation→customer→orders→lineitem): every dim join is
    a broadcast; the fact table is never shuffled for a lookup."""
    plan = _plan(QUERIES["q03_region_revenue"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_filter_and_projection_pushdown(spark):
    """Predicate + column pruning reach the parquet scan: PushedFilters
    carries the equality, ReadSchema carries ONLY the used columns."""
    ev = load_table(spark, SF_DIR, "events")
    df = ev.filter(F.col("event_type") == "click").select("user_id", "event_type")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "user_id" in read_schema and "event_type" in read_schema
    assert "props" not in read_schema and "value" not in read_schema


def test_q01_scan_prunes_unused_columns(spark):
    plan = _plan(QUERIES["q01_pricing_summary"](spark, SF_DIR))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # 11-column lineitem: the pricing summary needs 7; the scan must
    # not read the join keys it never touches
    assert "l_partkey" not in read_schema
    assert "l_suppkey" not in read_schema
    assert "l_orderkey" not in read_schema


def test_no_interpreted_folds_on_pair_joins(spark):
    """Pair-join similarity must be codegen arithmetic: Catalyst
    higher-order functions (aggregate/zip_with) evaluate interpreted
    per element and are banned from O(n²) paths
    (vectors.dot_expanded contract — 139.7s → 0.9s at sf0.1)."""
    for q in ("q16_knn_cosine", "q21_embedding_dup_pairs"):
        plan = _plan(QUERIES[q](spark, SF_DIR))
        assert "zip_with" not in plan, f"{q}: interpreted fold on pair path"


def test_knn_probe_side_broadcast(spark):
    """brute_force_knn broadcasts the probe set: one corpus pass."""
    plan = _plan(QUERIES["q16_knn_cosine"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_exact_dedup_single_shuffle(spark):
    """q15 exact dedup: one hash-partition exchange (the window), no
    extra repartitions or joins."""
    plan = _plan(QUERIES["q15_doc_exact_dedup"](spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1


def test_q51_all_filters_pushed_to_scan(spark):
    """Q6-shape range predicates (date/discount/quantity) must all
    reach the parquet scan as PushedFilters."""
    plan = _plan(QUERIES["q51_forecast_revenue"](spark, SF_DIR))
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed, f"{frag} not pushed: {pushed}"
