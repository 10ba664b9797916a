"""Generate tests/golden/ml_goldens.json — the seeded ALS ranking and
KMeans assignment goldens test_ml_goldens.py asserts against.

Run ONCE (and only rerun deliberately after an intentional
hyperparameter change): the whole point of the golden is that silent
convergence/hyperparameter drift across rounds FAILS the suite.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_song_recommendation_spark.ml import recommend  # noqa: E402
from big_data_song_recommendation_spark.session import get_spark  # noqa: E402
from big_data_song_recommendation_spark.sources.readers import load_table  # noqa: E402

SF = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "ml_goldens.json")


def als_golden(spark):
    ev = load_table(spark, SF, "events")
    ratings = recommend.derive_ratings_from_events(ev).cache()
    res = recommend.train_als(
        ratings, evaluate=False, rank=8, maxIter=5, implicitPrefs=False
    )
    users = ratings.select("user_id").distinct().orderBy("user_id").limit(5)
    recs = recommend.recommend_top_n(res.model, 3, users=users)
    return {
        f"{r['user_id']}:{r['rnk']}": int(r["item_id"]) for r in recs.collect()
    }


def kmeans_golden(spark):
    from big_data_song_recommendation_spark.ml import features

    li = load_table(spark, SF, "lineitem").orderBy(
            "l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount"
        ).limit(500)
    pipe = features.feature_pipeline(["l_quantity", "l_extendedprice", "l_discount"])
    _, out = features.fit_transform(pipe, li)
    _, assigned = recommend.train_kmeans(out, k=5)
    rows = assigned.select("l_orderkey", "l_linenumber", "cluster").collect()
    # canonical partition form: cluster ids may renumber across
    # environments; the grouping itself must not move
    groups: dict[int, list[str]] = {}
    for r in rows:
        groups.setdefault(r["cluster"], []).append(f"{r['l_orderkey']}:{r['l_linenumber']}")
    return sorted(sorted(g) for g in groups.values())


def tfidf_fit_golden(spark) -> list[str]:
    """The MLlib TF-IDF PIPELINE-FIT rollup (per-lang mean vector nnz
    at sf0.001) — the pre-round-11 q42 computation, kept as the fit's
    invariance pin now that q42 the QUERY serves from the committed
    artifact (ml/tfidf_vocab.py) and is oracle-checked. Every float is
    rounded in-plan, so the string form is run-stable."""
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    from big_data_song_recommendation_spark.ml import features
    from big_data_song_recommendation_spark.sources.readers import load_table

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
    return sorted(
        "|".join(f"{c}={r[c]}" for c in sorted(df.columns))
        for r in df.collect()
    )


def main() -> None:
    spark = get_spark("gen-ml-goldens", shuffle_partitions=8)
    golden = {
        "als_top3": als_golden(spark),
        "kmeans_partition": kmeans_golden(spark),
        "q42_tfidf_rows": tfidf_fit_golden(spark),
    }
    with open(OUT, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
