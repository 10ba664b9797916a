"""ML module tests: seeded reproducibility (ranking-level goldens, not
float equality — SURVEY.md §5), registry versioning/GC, and the
rows-only ML queries' row/schema contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_song_recommendation_spark.ml import features, recommend
from big_data_song_recommendation_spark.ml.registry import ModelRegistry
from big_data_song_recommendation_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ratings(spark):
    ev = load_table(spark, SF, "events")
    return recommend.derive_ratings_from_events(ev).cache()


def test_ratings_shape(ratings):
    row = ratings.first()
    assert set(ratings.columns) == {"user_id", "item_id", "rating"}
    assert 1.0 <= row["rating"] <= 5.0


def test_als_seeded_rankings_reproducible(spark, ratings):
    def run():
        res = recommend.train_als(
            ratings, evaluate=False, rank=8, maxIter=5, implicitPrefs=False
        )
        users = ratings.select("user_id").distinct().limit(5)
        recs = recommend.recommend_top_n(res.model, 3, users=users)
        return {(r["user_id"], r["rnk"]): r["item_id"] for r in recs.collect()}

    assert run() == run()  # same seed ⇒ same rankings


def test_als_rmse_sane(ratings):
    res = recommend.train_als(ratings, rank=8, maxIter=5, implicitPrefs=False)
    assert res.rmse is not None and 0.0 < res.rmse < 2.5


def test_feature_pipeline_and_kmeans(spark):
    li = load_table(spark, SF, "lineitem").limit(2000)
    pipe = features.feature_pipeline(["l_quantity", "l_extendedprice", "l_discount"])
    _, out = features.fit_transform(pipe, li)
    assert "scaled_features" in out.columns
    _, assigned = recommend.train_kmeans(out, k=5)
    counts = assigned.groupBy("cluster").count().collect()
    assert len(counts) == 5


def test_tfidf_pipeline(spark):
    docs = load_table(spark, SF, "documents").limit(200)
    _, out = features.fit_transform(features.tfidf_pipeline("text", vocab_size=50), docs)
    first = out.select("tfidf_features").first()[0]
    # vocabSize is an upper bound; this corpus has <50 distinct terms
    assert 0 < first.size <= 50


def test_registry_versioning_and_gc(spark, tmp_path):
    from pyspark.ml.feature import StringIndexer, StringIndexerModel

    df = spark.createDataFrame([("a",), ("b",), ("c",)], ["x"])
    model = StringIndexer(inputCol="x", outputCol="xi").fit(df)

    reg = ModelRegistry(str(tmp_path), keep_last=2)
    v1 = reg.save("indexer", model, {"note": "first"})
    v2 = reg.save("indexer", model)
    v3 = reg.save("indexer", model)
    assert reg.versions("indexer") == sorted([v2.version, v3.version])  # GC'd v1
    assert reg.metadata("indexer")["version"] == v3.version

    reg.mark_best("indexer", v2.version)
    loaded = reg.load("indexer", StringIndexerModel, pointer="best")
    assert loaded.transform(df).count() == 3
    # best-pinned version survives GC even when old
    reg.save("indexer", model)
    reg.save("indexer", model)
    assert v2.version in reg.versions("indexer")


@pytest.mark.parametrize(
    "name", ["q40_als_recommendations", "q41_kmeans_clusters", "q42_tfidf_features", "q43_hybrid_recommendations"]
)
def test_ml_queries_run(spark, name):
    from big_data_song_recommendation_spark.plans import QUERIES

    df = QUERIES[name](spark, SF)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns  # stable schema


def test_average_user_profile(spark):
    """A10: distributed mean of user factors == local numpy mean."""
    import numpy as np
    from big_data_song_recommendation_spark.ml import recommend

    ratings = spark.createDataFrame(
        [(u, i, float(1 + (u * i) % 5)) for u in range(20) for i in range(10)],
        ["user_id", "item_id", "rating"],
    )
    res = recommend.train_als(
        ratings, evaluate=False, rank=4, maxIter=2, implicitPrefs=False
    )
    profile = recommend.average_user_profile(res.model)
    local = np.mean(
        [r["features"] for r in res.model.userFactors.collect()], axis=0
    )
    assert len(profile) == 4
    assert np.allclose(profile, local, rtol=1e-6)
