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


def query_golden(spark, name: str) -> list[str]:
    """Full result of a rows-only query at sf0.001, serialized row-per
    string (column=value joined sorted by column name) — the invariance
    pin for queries with no SQL oracle (q42 TF-IDF — q43/q47
    graduated to oracles in round 10, VERDICT r5 #4 / r9 #1). Every
    float in these outputs is already
    rounded in-plan, so the string form is run-stable."""
    from big_data_song_recommendation_spark.plans.queries import QUERIES

    df = QUERIES[name](spark, SF)
    rows = [
        "|".join(f"{c}={r[c]}" for c in sorted(df.columns))
        for r in df.collect()
    ]
    return sorted(rows)


def main() -> None:
    spark = get_spark("gen-ml-goldens", shuffle_partitions=8)
    golden = {
        "als_top3": als_golden(spark),
        "kmeans_partition": kmeans_golden(spark),
        "q42_tfidf_rows": query_golden(spark, "q42_tfidf_features"),
    }
    with open(OUT, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
