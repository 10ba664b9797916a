"""Serving-layer queries (§2.12): browse pagination, collaborative/
content/hybrid recommendations with in-plan display enrichment, and
the J5 tiered display fallback."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_song_recommendation_spark.plans import serving, training

from .test_training_pipeline import _write_fixtures


@pytest.fixture(scope="module")
def domain(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("servedata")
    _write_fixtures(d)
    tables = training.load_reference_tables(spark, str(d))
    tracks = training.clean_tracks(tables["tracks"]).cache()
    enriched = training.enriched_tracks(
        tracks, tables["artists"], tables["albums"], tables["emotions"]
    ).cache()
    ratings = training.synthetic_ratings(tracks, n_users=50)
    from big_data_song_recommendation_spark.ml import features, recommend

    indexer = features.string_indexer("track_id")
    idx_model = indexer.fit(ratings)
    indexed = idx_model.transform(ratings).withColumn(
        "track_index", F.col("track_id_index").cast("int")
    )
    als = recommend.train_als(
        indexed,
        item_col="track_index",
        evaluate=False,
        rank=4,
        maxIter=3,
        implicitPrefs=False,
    )
    index_map = indexed.select(
        F.col("track_index"), F.col("track_id")
    ).distinct()
    return tracks, enriched, als.model, index_map


def test_browse_pagination(spark, domain):
    tracks, *_ = domain
    p1 = serving.browse(tracks, limit=10, offset=0).collect()
    p2 = serving.browse(tracks, limit=10, offset=10).collect()
    assert len(p1) == 10 and len(p2) == 10
    ids1, ids2 = [r["id"] for r in p1], [r["id"] for r in p2]
    assert ids1 == sorted(ids1) and ids2 == sorted(ids2)
    assert set(ids1).isdisjoint(ids2)
    assert ids1[-1] < ids2[0]  # keyset-continuous pages


def test_collaborative_with_display(spark, domain):
    tracks, enriched, model, index_map = domain
    users = spark.createDataFrame([(1,), (2,)], ["user_id"])
    out = serving.collaborative(
        model, users, serving.display_dim(enriched), n=5, index_map=index_map
    ).collect()
    assert {r["user_id"] for r in out} <= {1, 2}
    for r in out:
        assert r["track_name"] is not None and r["artist_name"] is not None
        assert r["url"].startswith("https://open.spotify.com/track/")
        assert 1 <= r["rnk"] <= 5


def test_content_excludes_seed(spark, domain):
    tracks, enriched, *_ = domain
    out = serving.content(tracks, "t003", serving.display_dim(enriched), n=5).collect()
    assert len(out) == 5
    assert all(r["track_id"] != "t003" for r in out)
    assert [r["rnk"] for r in out] == [1, 2, 3, 4, 5]


def test_hybrid_mix_and_truncate(spark, domain):
    tracks, enriched, model, index_map = domain
    disp = serving.display_dim(enriched)
    users = spark.createDataFrame([(1,)], ["user_id"])
    collab = serving.collaborative(model, users, disp, n=10, index_map=index_map)
    cont = serving.content(tracks, "t003", disp, n=5)
    out = serving.hybrid(collab, cont, n=6).collect()
    assert len(out) <= 6
    assert [r["rnk"] for r in out] == list(range(1, len(out) + 1))
    totals = [r["total"] for r in out]
    assert totals == sorted(totals, reverse=True)


def test_display_fallback_tier(spark, domain):
    """J5: unknown ids get deterministic synthetic display attributes."""
    _, enriched, *_ = domain
    recs = spark.createDataFrame(
        [("t003", 1), ("zzz_unknown", 2)], ["track_id", "rnk"]
    )
    out = {
        r["track_id"]: r
        for r in serving.with_display(recs, serving.display_dim(enriched)).collect()
    }
    assert out["t003"]["track_name"] == "Song 3"  # real tier
    syn = out["zzz_unknown"]
    assert syn["track_name"] in serving._NAME_POOL  # synthetic tier
    assert syn["artist_name"] in serving._ARTIST_POOL
    # deterministic: same id → same synthetic attributes on re-run
    again = {
        r["track_id"]: r
        for r in serving.with_display(recs, serving.display_dim(enriched)).collect()
    }
    assert again["zzz_unknown"]["track_name"] == syn["track_name"]


def test_models_info(spark, domain, tmp_path):
    from big_data_song_recommendation_spark.ml.registry import ModelRegistry

    _, _, model, _ = domain
    reg = ModelRegistry(str(tmp_path / "reg"))
    reg.save("als", model, {"rank": 4})
    infos = serving.models_info(reg)
    assert len(infos) == 1 and infos[0]["name"] == "als" and infos[0]["rank"] == 4


def test_batch_endpoints_over_lake(spark, tmp_path):
    """§2.12 /batches/stats and /batches/featured over a BatchSink lake."""
    from datetime import datetime, timedelta

    from big_data_song_recommendation_spark.streaming import jobs

    base = datetime(2024, 1, 1, 12, 0, 0)
    schema = "ts timestamp, user_id long, item_id string, rating double, action string"
    rows = [
        (base + timedelta(seconds=i), i % 5, f"item_{i % 3}", 1.0 + (i % 5), "play")
        for i in range(30)
    ]
    in_dir = str(tmp_path / "in")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(in_dir)
    stream = jobs.file_stream(spark, in_dir, spark.read.parquet(in_dir).schema)
    sink = jobs.BatchSink(str(tmp_path / "lake"), snapshot=False)
    q = jobs.start_pipeline(stream, sink, checkpoint_dir=str(tmp_path / "ck"),
                            trigger_seconds=None)
    q.processAllAvailable()
    q.stop()

    stats = serving.batch_stats(spark, str(tmp_path / "lake")).collect()
    assert sum(r["size"] for r in stats) == 30
    assert all(1.0 <= r["avg_rating"] <= 5.0 and r["unique_users"] <= 5 for r in stats)

    feat = serving.featured_items(spark, str(tmp_path / "lake"), n=2).collect()
    assert len(feat) == 2
    assert feat[0]["max_rating"] >= feat[1]["max_rating"]


def test_collaborative_committed_serves_without_model(spark, domain):
    """Round 10: the collaborative endpoint served from the committed
    factor matrices — no fitted model object; parity with the q40
    scoring surface (same user set → same (item, rnk) pairs), display
    contract intact, cold users absent."""
    from big_data_song_recommendation_spark.ml.als_factors import (
        ALS_USER_FACTORS,
    )
    from big_data_song_recommendation_spark.ml.recommend import (
        recommend_top_n_committed,
    )

    uid = ALS_USER_FACTORS[0][0]
    users = spark.createDataFrame([(uid,), (999_999,)], ["user_id"])
    # display keyed in the committed item-id space (ints); unmatched
    # items take the deterministic synthetic fallback
    display = spark.createDataFrame(
        [(0, "Zero Song", "Zero Artist")],
        "track_id int, track_name string, artist_name string",
    )
    out = serving.collaborative_committed(spark, users, display, n=5).collect()
    assert {r["user_id"] for r in out} == {uid}  # cold user dropped
    raw = recommend_top_n_committed(spark, users, 5).collect()
    assert [(r["track_id"], r["rnk"]) for r in out] == [
        (r["item_id"], r["rnk"]) for r in sorted(raw, key=lambda x: x["rnk"])
    ]
    for r in out:
        assert r["track_name"] is not None and r["url"].startswith(
            "https://open.spotify.com/track/"
        )
