"""MERGE-family operators (operators/merge.py): keyed upsert,
conditional MERGE INTO with row-provenance audit, SCD2 compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_song_recommendation_spark.operators import merge


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, score double",
    )


def test_upsert_updates_and_inserts(spark):
    src = spark.createDataFrame(
        [(2, "B", 22.0), (4, "d", 40.0)], "id long, name string, score double"
    )
    out = {r["id"]: (r["name"], r["score"]) for r in merge.upsert(_target(spark), src, ["id"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("B", 22.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_upsert_within_batch_last_writer_wins(spark):
    src = spark.createDataFrame(
        [(2, "old", 1.0, 1), (2, "new", 2.0, 5), (2, "mid", 3.0, 3)],
        "id long, name string, score double, seq long",
    )
    tgt = _target(spark).withColumn("seq", F.lit(0))
    out = merge.upsert(tgt, src, ["id"], order_by="seq").filter("id = 2").first()
    assert (out["name"], out["score"]) == ("new", 2.0)


def test_merge_into_clauses_and_provenance(spark):
    src = spark.createDataFrame(
        [(1, "A", 0.0), (3, "x", 99.0), (5, "e", 50.0)],
        "id long, name string, score double",
    )
    out = merge.merge_into(
        _target(spark),
        src,
        ["id"],
        when_matched_update={"name": F.col("s.name"), "score": F.col("t.score") + 1},
        when_matched_delete=F.col("s.score") > 90,
        insert_not_matched=True,
    )
    rows = {r["id"]: r for r in out.collect()}
    # id=1 matched -> updated name from source, score incremented
    assert rows[1]["name"] == "A" and rows[1]["score"] == 11.0
    assert rows[1]["__merge_action"] == "updated"
    # id=3 matched the delete predicate -> gone
    assert 3 not in rows
    # id=2 untouched target row
    assert rows[2]["__merge_action"] == "kept" and rows[2]["name"] == "b"
    # id=5 inserted from source
    assert rows[5]["__merge_action"] == "inserted" and rows[5]["score"] == 50.0


def test_merge_into_no_insert_mode(spark):
    src = spark.createDataFrame([(9, "z", 9.0)], "id long, name string, score double")
    out = merge.merge_into(
        _target(spark), src, ["id"], insert_not_matched=False
    )
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3]


def test_merge_plan_has_single_key_shuffle(spark):
    """The merge is one outer join on the keys: no extra exchanges, no
    cartesian, and a small CDC source side may broadcast."""
    src = _target(spark)
    plan = (
        merge.upsert(_target(spark), src, ["id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_scd2_compact_intervals(spark):
    rows = [
        (1, "x", 100, 1), (1, "x", 200, 2), (1, "y", 300, 3), (1, "x", 400, 4),
        (2, "z", 150, 5),
    ]
    df = spark.createDataFrame(rows, "uid long, state string, ts long, eid long")
    hist = merge.scd2_compact(df, ["uid"], "state", ts_col="ts", tie_breaks=["eid"])
    got = sorted(
        (r["uid"], r["state"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in hist.collect()
    )
    assert got == [
        (1, "x", 100, 300, False),
        (1, "x", 400, None, True),
        (1, "y", 300, 400, False),
        (2, "z", 150, None, True),
    ]


def test_upsert_source_null_really_overwrites(spark):
    """Row presence decides, not per-column coalesce: a source row
    setting a column to NULL must null it out."""
    src = spark.createDataFrame([(2, None, 0.0)], "id long, name string, score double")
    out = merge.upsert(_target(spark), src, ["id"]).filter("id = 2").first()
    assert out["name"] is None and out["score"] == 0.0


def test_upsert_null_key_matches_null_key(spark):
    """The key join is null-safe: a NULL-keyed source row updates the
    NULL-keyed target row instead of inserting a duplicate."""
    tgt = spark.createDataFrame(
        [(None, "orphan", 1.0), (1, "a", 10.0)], "id long, name string, score double"
    )
    src = spark.createDataFrame([(None, "claimed", 2.0)], "id long, name string, score double")
    rows = merge.upsert(tgt, src, ["id"]).collect()
    assert len(rows) == 2
    orphan = [r for r in rows if r["id"] is None]
    assert len(orphan) == 1 and orphan[0]["name"] == "claimed"


def test_snapshot_diff_verdicts_and_null_safety(spark):
    from big_data_song_recommendation_spark.operators.merge import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, None, "C"), (4, 40.0, None)],
        ["k", "v", "s"],
    )
    new = spark.createDataFrame(
        # 1 unchanged; 2 changed (both cols); 3 changed (null -> value);
        # 4 removed; 5 added
        [(1, 10.0, "A"), (2, 21.0, "B2"), (3, 3.0, "C"), (5, 50.0, "E")],
        ["k", "v", "s"],
    )
    out = {r["k"]: r for r in snapshot_diff(old, new, ["k"], ["v", "s"]).collect()}
    assert out[1]["verdict"] == "unchanged" and out[1]["n_changed_cols"] == 0
    assert out[2]["verdict"] == "changed" and out[2]["n_changed_cols"] == 2
    assert out[3]["verdict"] == "changed" and out[3]["n_changed_cols"] == 1
    assert out[4]["verdict"] == "removed"
    assert out[5]["verdict"] == "added"


def test_scd2_compact_null_run_is_one_interval(spark):
    """A run of NULL tracked states is ONE interval (the pre-delegation
    filter form emitted one interval per NULL observation because
    lag IS NULL conflated 'first row' with 'previous state NULL')."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, "a", t0, 1),
        (1, None, t0 + dt.timedelta(minutes=1), 2),
        (1, None, t0 + dt.timedelta(minutes=2), 3),
        (1, "b", t0 + dt.timedelta(minutes=3), 4),
    ]
    df = spark.createDataFrame(rows, "uid int, state string, ts timestamp, eid int")
    hist = merge.scd2_compact(df, ["uid"], "state", ts_col="ts", tie_breaks=["eid"]).collect()
    got = [(r.state, r.is_current) for r in sorted(hist, key=lambda r: r.valid_from)]
    assert got == [("a", False), (None, False), ("b", True)]
