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


def test_ratings_span_bucket_range(ratings):
    """VERDICT r1: min-max rescaling must spread ratings across the
    1-5 popularity buckets instead of compressing to the bottom two
    (the old avg%100 fold's failure mode)."""
    buckets = {r["rating"] for r in ratings.select("rating").distinct().collect()}
    assert len(buckets) >= 4, buckets
    assert buckets <= {1.0, 2.0, 3.0, 4.0, 5.0}


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


def test_ranking_metrics_known_values(spark):
    """precision/recall@k on a hand-computable example."""
    from big_data_song_recommendation_spark.ml import evaluation

    # user 1: recs [a,b,c], relevant {a,c,d}  -> hits 2: p=2/3, r=2/3
    # user 2: recs [x,y,z], relevant {q}      -> hits 0: p=0,   r=0
    # user 3: no recs,      relevant {m}      -> counts, zero hits
    recs = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "c", 3),
         (2, "x", 1), (2, "y", 2), (2, "z", 3)],
        ["user_id", "item_id", "rnk"],
    )
    rel = spark.createDataFrame(
        [(1, "a"), (1, "c"), (1, "d"), (2, "q"), (3, "m")],
        ["user_id", "item_id"],
    )
    m = evaluation.ranking_metrics(recs, rel, k=3)
    assert m.n_users == 3
    assert m.precision_at_k == pytest.approx((2 / 3 + 0 + 0) / 3)
    assert m.recall_at_k == pytest.approx((2 / 3 + 0 + 0) / 3)

    ok, reasons = evaluation.passes_quality_gate(rmse=0.5, metrics=m)
    assert ok  # p=0.22, r=0.22 clear the reference thresholds
    ok2, reasons2 = evaluation.passes_quality_gate(rmse=None, metrics=m)
    assert not ok2 and "not evaluable" in reasons2[0]
    ok3, reasons3 = evaluation.passes_quality_gate(
        rmse=0.5, metrics=m, thresholds={"min_precision_at_k": 0.9}
    )
    assert not ok3 and "precision@3" in reasons3[0]


def test_quality_gate_on_trained_model(spark):
    """End-to-end: train ALS, self-recommend, gate on train-set
    relevance (sanity — a factorizer must retrieve its own strong
    interactions far above the reference thresholds)."""
    from big_data_song_recommendation_spark.ml import evaluation, recommend

    ratings = spark.createDataFrame(
        [(u, (u * 7 + j) % 30, 5.0 if j < 3 else 1.0)
         for u in range(25) for j in range(8)],
        ["user_id", "item_id", "rating"],
    )
    res = recommend.train_als(
        ratings, evaluate=False, rank=8, maxIter=5, implicitPrefs=False
    )
    recs = recommend.recommend_top_n(res.model, 5)
    recs = recs.withColumnRenamed(res.model.getItemCol(), "item_id")
    relevant = ratings.filter(F.col("rating") >= 4.0)
    m = evaluation.ranking_metrics(recs, relevant, k=5)
    assert m.n_users == 25
    assert m.recall_at_k >= 0.5  # retrieves most of its own 5-star items
    ok, _ = evaluation.passes_quality_gate(rmse=0.3, metrics=m)
    assert ok


def test_time_decayed_confidence_halves_per_half_life(spark):
    """weight = 0.5^(age/half_life): an interaction one half-life old
    counts exactly half a fresh one; confidences sum per (user,item)."""
    from datetime import datetime

    rows = [
        (datetime(2024, 3, 1, 0, 0, 0), 1, 7),   # fresh at as_of
        (datetime(2024, 1, 31, 0, 0, 0), 1, 7),  # exactly 30 days old
        (datetime(2024, 3, 1, 0, 0, 0), 2, 9),
    ]
    df = spark.createDataFrame(rows, ["ts", "user_id", "item_id"])
    out = {
        (r["user_id"], r["item_id"]): r["confidence"]
        for r in recommend.time_decayed_confidence(
            df, as_of="2024-03-01 00:00:00", half_life_days=30.0
        ).collect()
    }
    assert out[(2, 9)] == pytest.approx(1.0)
    assert out[(1, 7)] == pytest.approx(1.5)  # 1.0 fresh + 0.5 one-half-life


def test_negative_samples_deterministic_and_disjoint(spark):
    """Negatives never overlap positives, come from the item catalog,
    and are bit-identical across runs (xxhash64, not rand)."""
    pos = spark.createDataFrame(
        [(u, i, 5.0) for u in range(20) for i in range(u % 5, 40, 5)],
        ["user_id", "item_id", "rating"],
    )
    neg1 = recommend.negative_samples(pos, per_positive=2, seed=7)
    neg2 = recommend.negative_samples(pos, per_positive=2, seed=7)
    rows1 = {(r["user_id"], r["item_id"]) for r in neg1.collect()}
    rows2 = {(r["user_id"], r["item_id"]) for r in neg2.collect()}
    assert rows1 == rows2 and rows1, "deterministic across runs"
    positives = {(r["user_id"], r["item_id"]) for r in pos.collect()}
    assert not (rows1 & positives), "no accidental positives survive"
    catalog = {r["item_id"] for r in pos.select("item_id").distinct().collect()}
    assert {i for _, i in rows1} <= catalog
    assert all(r["rating"] == 0.0 for r in neg1.collect())
