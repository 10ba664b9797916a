"""Golden-file invariance for the ML TRAINING substrate (VERDICT r4
#8, narrowed in round 10): serving is now oracle-checked against
committed artifacts, but the iterative fits themselves (seeded ALS
ranking, seeded MLlib KMeans assignment) stay pinned to goldens —
any hyperparameter, seed, partitioning, or convergence drift fails
here instead of shipping invisibly. Regenerate DELIBERATELY with
scripts/gen_ml_goldens.py after an intentional change."""

from __future__ import annotations

import json
import os

import pytest

from big_data_song_recommendation_spark.ml import features, recommend
from big_data_song_recommendation_spark.sources.readers import load_table

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "ml_goldens.json")
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


def test_als_ranking_matches_golden(spark, golden):
    ev = load_table(spark, SF, "events")
    ratings = recommend.derive_ratings_from_events(ev).cache()
    res = recommend.train_als(
        ratings, evaluate=False, rank=8, maxIter=5, implicitPrefs=False
    )
    users = ratings.select("user_id").distinct().orderBy("user_id").limit(5)
    recs = recommend.recommend_top_n(res.model, 3, users=users)
    got = {f"{r['user_id']}:{r['rnk']}": int(r["item_id"]) for r in recs.collect()}
    assert got == golden["als_top3"]


def test_kmeans_assignment_matches_golden(spark, golden):
    li = (
        load_table(spark, SF, "lineitem")
        .orderBy(
            "l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount"
        )
        .limit(500)
    )
    pipe = features.feature_pipeline(["l_quantity", "l_extendedprice", "l_discount"])
    _, out = features.fit_transform(pipe, li)
    _, assigned = recommend.train_kmeans(out, k=5)
    rows = assigned.select("l_orderkey", "l_linenumber", "cluster").collect()
    groups: dict[int, list[str]] = {}
    for r in rows:
        groups.setdefault(r["cluster"], []).append(
            f"{r['l_orderkey']}:{r['l_linenumber']}"
        )
    got = sorted(sorted(g) for g in groups.values())
    assert got == golden["kmeans_partition"]


def test_tfidf_pipeline_fit_matches_golden(spark, golden):
    """q42 graduated to a committed-artifact oracle in round 11
    (ml/tfidf_vocab.py), but the MLlib PIPELINE FIT stays golden-
    pinned — this replays the pre-round-11 q42 rollup (fit at query
    time, per-lang mean vector nnz) so vocabulary-selection or IDF
    drift in the fit itself fails here instead of shipping
    invisibly."""
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    docs = load_table(spark, SF, "documents")
    _, out = features.fit_transform(
        features.tfidf_pipeline("text", vocab_size=100), docs
    )
    nnz = F.size(
        F.filter(vector_to_array(F.col("tfidf_features")), lambda x: x != 0.0)
    )
    df = (
        out.withColumn("nnz", nnz)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("nnz"), 2).alias("avg_terms"),
        )
    )
    got = sorted(
        "|".join(f"{c}={r[c]}" for c in sorted(df.columns))
        for r in df.collect()
    )
    assert got == golden["q42_tfidf_rows"]


def test_committed_tfidf_artifact_matches_refit(spark, golden):
    """The committed vocabulary/IDF literals (ml/tfidf_vocab.py) must
    equal a fresh fit on the fit corpus — the als_factors/centroids
    regeneration pin applied to the TF-IDF artifact."""
    import math

    from big_data_song_recommendation_spark.ml.tfidf_vocab import (
        FIT_SF_DIR,
        MICRO,
        TFIDF_IDF_MICRO,
        TFIDF_VOCAB,
    )

    docs = load_table(spark, FIT_SF_DIR, "documents")
    model, _ = features.fit_transform(
        features.tfidf_pipeline("text", vocab_size=100), docs
    )
    assert list(model.stages[2].vocabulary) == TFIDF_VOCAB
    refit = [int(math.floor(float(x) * MICRO)) for x in model.stages[3].idf]
    assert refit == TFIDF_IDF_MICRO
