"""Recommendation models (SURVEY.md §2.9, M5-M10, M13-M14).

ALS replaces both the reference's Spark ALS (``src/spark/training.py:
473-483``) and its sklearn NMF twin (``src/training_service.py:
520-555`` — NMF existed only because the lightweight path avoided
Spark; one engine needs one factorizer). Defaults mirror
``data/models/config/als_config.json``: rank 50, maxIter 10,
regParam 0.1, implicitPrefs true, alpha 1.0, seed 42.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import scalars

REFERENCE_ALS_CONFIG: dict = {
    "rank": 50,
    "maxIter": 10,
    "regParam": 0.1,
    "implicitPrefs": True,
    "alpha": 1.0,
    "seed": 42,
    "coldStartStrategy": "drop",
}


@dataclass
class ALSResult:
    model: object
    rmse: float | None = None
    config: dict = field(default_factory=dict)


def derive_ratings_from_events(events: DataFrame) -> DataFrame:
    """Turn the generic event stream into (user, item, rating):
    item = the JSON ``props.k`` field, rating = popularity bucket of
    the pair's avg value (the reference derived ratings from
    popularity buckets + noise, F8 — here deterministic, no noise).

    avg_value is min-max rescaled to the 0-100 popularity scale the
    bucketer expects via a 1-row global aggregate broadcast back onto
    the pairs (scale-safe: the extra pass is a map-side-combined
    min/max, the join is a 1-row broadcast). The r1 form bucketed
    ``avg % 100`` directly, which compressed concentrated averages
    into the bottom buckets; rescaling spans the full 1-5 range for
    any non-constant value distribution."""
    from ..functions.scalars import rating_from_popularity

    k = F.get_json_object("props", "$.k").cast("int")
    pairs = (
        events.withColumn("item_id", k)
        .filter(F.col("item_id").isNotNull())
        .groupBy("user_id", "item_id")
        .agg(F.avg("value").alias("avg_value"), F.count("*").alias("n"))
    )
    stats = pairs.agg(
        F.min("avg_value").alias("__lo"), F.max("avg_value").alias("__hi")
    )
    pop = F.coalesce(
        (F.col("avg_value") - F.col("__lo"))
        / (F.col("__hi") - F.col("__lo"))
        * 100.0,
        F.lit(50.0),  # degenerate all-equal distribution → mid bucket
    )
    return (
        pairs.crossJoin(F.broadcast(stats))
        .select(
            "user_id",
            "item_id",
            rating_from_popularity(pop).alias("rating"),
        )
    )


def time_decayed_confidence(
    events: DataFrame,
    *,
    as_of: str,
    ts_col: str = "ts",
    user_col: str = "user_id",
    item_col: str = "item_id",
    half_life_days: float = 30.0,
) -> DataFrame:
    """Recency-weighted implicit-feedback confidence (Hu-Koren style):
    each interaction contributes ``0.5^(age_days / half_life)``, summed
    per (user, item) → ``confidence``. The input an implicit ALS
    (``implicitPrefs=true``, the reference's declared config) actually
    wants — recent plays matter, year-old plays barely.

    ``as_of`` is an explicit 'yyyy-MM-dd HH:mm:ss' anchor, NOT
    current_timestamp(): determinism is a contract in this engine
    (seeded models, oracle-checked queries), and wall-clock weights
    would break reproducible retrains. Pure column expressions — one
    aggregate shuffle on (user, item)."""
    age_days = (
        F.lit(as_of).cast("timestamp").cast("double")
        - scalars.epoch_seconds(ts_col)
    ) / 86400.0
    weight = F.pow(F.lit(0.5), age_days / F.lit(half_life_days))
    return (
        events.groupBy(user_col, item_col)
        .agg(F.sum(weight).alias("confidence"))
    )


def negative_samples(
    positives: DataFrame,
    *,
    user_col: str = "user_id",
    item_col: str = "item_id",
    per_positive: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Deterministic unobserved (user, item) pairs with rating 0 — the
    negative class an implicit-feedback trainer samples against.

    Spark-first and crossJoin-free: each positive row proposes
    ``per_positive`` candidate items via ``xxhash64(user, k, seed) %
    n_items`` into a dense item index, then accidental positives are
    anti-joined away. xxhash64, not rand(): two runs on identical
    input MUST produce identical negatives (the determinism contract
    rand() breaks after any shuffle). Collisions and accidental
    positives mean per-user output can be slightly UNDER
    per_positive×positives — standard for samplers, documented here.

    The dense index is a total-order row_number over the distinct item
    catalog, delivered by the two-phase bucketed rank
    (operators/ranks.py): numeric item ids bucket by equi-width value
    bin, string ids by the 2 characters AFTER the catalog's longest
    common prefix (a fixed 2-char prefix degenerates to one bucket —
    one task — for 'item_000001'-style catalogs; ADVICE r6, fixed via
    ranks.with_string_prefix_bucket). Either way no single-partition
    sort even at extreme catalog sizes (the idx broadcast below is the
    catalog-size bound that matters first)."""
    from pyspark.sql.types import NumericType

    from ..operators.ranks import (
        bucketed_rank,
        with_equi_width_bucket,
        with_string_prefix_bucket,
    )

    items = positives.select(item_col).distinct()
    if isinstance(items.schema[0].dataType, NumericType):
        bucketed = with_equi_width_bucket(items, item_col)
    else:
        bucketed = with_string_prefix_bucket(items, item_col)
    idx = bucketed_rank(
        bucketed,
        [F.col(item_col).asc()],
        ["__vb"],
        out="__idx",
    ).drop("__vb").withColumn("__idx", F.col("__idx").cast("int"))
    n_items = idx.count()
    proposals = (
        positives.select(user_col)
        .withColumn("__k", F.explode(F.array(*[F.lit(i) for i in range(per_positive)])))
        .withColumn(
            "__idx",
            (
                F.abs(F.xxhash64(F.col(user_col), F.col("__k"), F.lit(seed)))
                % F.lit(n_items)
                + 1
            ).cast("int"),
        )
        .join(F.broadcast(idx), "__idx")
        .select(user_col, item_col)
        .distinct()
    )
    return (
        proposals.join(
            positives.select(user_col, item_col), [user_col, item_col], "left_anti"
        )
        .withColumn("rating", F.lit(0.0))
    )


def train_als(
    ratings: DataFrame,
    *,
    user_col: str = "user_id",
    item_col: str = "item_id",
    rating_col: str = "rating",
    evaluate: bool = True,
    **overrides,
) -> ALSResult:
    """M5+M6+M8: seeded 80/20 split, ALS fit, RMSE evaluation."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.recommendation import ALS

    config = {**REFERENCE_ALS_CONFIG, **overrides}
    als = ALS(
        userCol=user_col,
        itemCol=item_col,
        ratingCol=rating_col,
        **config,
    )
    if evaluate:
        # NOT randomSplit (the reference's M5): positional Bernoulli
        # sampling depends on row order, which is nondeterministic
        # after any shuffle — two runs on identical input get different
        # splits. A content-hash split is deterministic at any scale
        # and needs no sort.
        from ..functions.scalars import md5_bucket

        bucket = md5_bucket(
            F.concat_ws(":", F.col(user_col), F.col(item_col)), 100
        )
        train = ratings.filter(bucket < 80)
        test = ratings.filter(bucket >= 80)
        model = als.fit(train)
        # coldStartStrategy="drop" can empty the eval set (every test
        # user/item unseen in train on tiny corpora) — report no RMSE
        # rather than crash the evaluator's summarizer
        preds = model.transform(test).cache()
        rmse = (
            None
            if preds.isEmpty()
            else RegressionEvaluator(
                metricName="rmse", labelCol=rating_col, predictionCol="prediction"
            ).evaluate(preds)
        )
        return ALSResult(model=model, rmse=rmse, config=config)
    return ALSResult(model=als.fit(ratings), config=config)


def recommend_top_n(
    als_model,
    n: int = 10,
    users: DataFrame | None = None,
    *,
    bounded_users: bool | None = None,
) -> DataFrame:
    """M7: top-n per user, exploded to flat (user_id, item_id, score)
    rows — serving joins displays onto this in DataFrame land (fixing
    the reference's collect-loop hotspot, ``src/app.py:233-245``).

    For a bounded ``users`` subset the scoring is a direct factor
    cross: semi-join the user factors down, broadcast them against the
    item factors, codegen dot, window top-n. Same scores as MLlib's
    ``recommendForUserSubset`` (it computes exactly this via blocked
    BLAS) with a transparent plan and none of the blockify machinery —
    the all-users path keeps MLlib's blocked implementation, which is
    the right tool when the user side is NOT broadcastable.

    The direct cross is gated on the subset size: a subset past
    ``max_direct_users`` (10k users ≈ rank-64 floats well under any
    broadcast limit) falls back to MLlib's ``recommendForUserSubset``,
    which handles arbitrarily large user sides — the previous
    unconditional broadcast failed fast on big subsets (ADVICE r3).
    ``bounded_users=True`` asserts the subset is small and skips the
    size probe (one bounded count job) — pass it on hot serving paths
    where the caller already knows the batch size; ``False`` forces
    the MLlib path outright."""
    from pyspark.sql import Window

    user_col = als_model.getUserCol()
    item_col = als_model.getItemCol()
    max_direct_users = 10_000
    if users is not None:
        wanted = users.select(
            F.col(user_col).cast("int").alias("id")
        ).distinct()
        # bounded probe: limit(N+1).count() touches at most N+1 rows,
        # never the full subset cardinality
        if bounded_users is False or (
            bounded_users is None
            and wanted.limit(max_direct_users + 1).count() > max_direct_users
        ):
            recs = als_model.recommendForUserSubset(
                wanted.withColumnRenamed("id", user_col), n
            )
            return recs.select(
                user_col, F.posexplode("recommendations").alias("rank0", "rec")
            ).select(
                F.col(user_col),
                F.col("rec.*"),
                (F.col("rank0") + 1).alias("rnk"),
            )
        uf = als_model.userFactors.join(
            wanted,
            "id",
            "left_semi",
        ).select(F.col("id").alias("__uid"), F.col("features").alias("__uf"))
        itf = als_model.itemFactors.select(
            F.col("id").alias("__iid"), F.col("features").alias("__if")
        )
        score = F.aggregate(
            F.zip_with("__uf", "__if", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        w = Window.partitionBy("__uid").orderBy(F.desc("rating"), F.asc("__iid"))
        return (
            itf.join(F.broadcast(uf))
            .withColumn("rating", score.cast("float"))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= n)
            .select(
                F.col("__uid").alias(user_col),
                F.col("__iid").alias(item_col),
                "rating",
                "rnk",
            )
        )
    recs = als_model.recommendForAllUsers(n)
    return recs.select(
        user_col, F.posexplode("recommendations").alias("rank0", "rec")
    ).select(
        F.col(user_col),
        F.col("rec.*"),
        (F.col("rank0") + 1).alias("rnk"),
    )


def committed_factor_frames(spark):
    """The serving twin of :func:`train_als` — DataFrames over the
    COMMITTED factor matrices (ml/als_factors.py, written once by
    scripts/gen_als_factors.py): the round-9 PQ-codebook discipline
    applied to the recommender, so scoring is a pure integer fold over
    literals that a DuckDB twin replays exactly (q40/q43 flip from
    rows-only to hash-checked; the iterative FIT stays golden-pinned).
    Factors are micro-unit int64, tiny (users·rank + items·rank ints)
    — both frames broadcast at any realistic rank."""
    from . import als_factors as AF
    from ..sources.readers import local_frame

    uf = local_frame(
        spark, AF.ALS_USER_FACTORS, "user_id int, uf array<bigint>"
    )
    itf = local_frame(
        spark, AF.ALS_ITEM_FACTORS, "item_id int, itf array<bigint>"
    )
    return uf, itf


def recommend_top_n_committed(
    spark,
    users: DataFrame,
    n: int = 5,
    *,
    user_col: str = "user_id",
) -> DataFrame:
    """Top-n per user over the committed factor matrices: exact int64
    dot product in micro² units (rank-term unrolled sum — |f|·10⁶
    squared × rank ≈ 10¹³, well inside int64), ranked desc with ties
    toward the smaller item id. Users without committed factors are
    cold-start (inner join drops them — serve them the average-profile
    fallback, :func:`average_user_profile`). Returns (user_id,
    item_id, score_micro2, rnk); both factor sides broadcast, the
    top-n window partitions on the bounded user set."""
    from pyspark.sql import Window

    from . import als_factors as AF

    uf, itf = committed_factor_frames(spark)
    wanted = users.select(F.col(user_col).cast("int").alias("user_id")).distinct()
    score = None
    for j in range(1, AF.ALS_RANK + 1):
        term = F.element_at("uf", j) * F.element_at("itf", j)
        score = term if score is None else score + term
    w = Window.partitionBy("user_id").orderBy(
        F.desc("score_micro2"), F.asc("item_id")
    )
    return (
        wanted.join(F.broadcast(uf), "user_id")
        .join(F.broadcast(itf))
        .withColumn("score_micro2", score)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= n)
        .select("user_id", "item_id", "score_micro2", "rnk")
    )


def average_user_profile(als_model) -> list[float]:
    """A10: the cold-start fallback profile — element-wise mean of all
    user factor vectors (``np.mean(user_features, axis=0)`` at
    ``src/app_optimized.py:398``), computed distributed via
    ``Summarizer.mean`` over the factors DataFrame (never collected)."""
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.stat import Summarizer

    factors = als_model.userFactors.select(
        array_to_vector(F.col("features").cast("array<double>")).alias("f")
    )
    mean_vec = factors.select(Summarizer.mean(F.col("f")).alias("m")).first()["m"]
    return [float(x) for x in mean_vec]


def train_kmeans(
    df: DataFrame,
    *,
    features_col: str = "scaled_features",
    k: int | None = None,
    seed: int = 42,
    max_iter: int = 8,
):
    """M9: KMeans with the reference's adaptive k =
    clamp(rows/1000, 10, 50) (``src/spark/training.py:377-402``).

    ``max_iter`` defaults to 8, not MLlib's 20: measured on the
    embeddings corpus the training cost plateaus by iteration 8
    (1881.5 vs 1878.0 at 20 — 0.2%) while each extra iteration is a
    full corpus pass; iteration count is the term that scales with
    data volume (same reasoning as similarity.ivf_index). The default
    is tuned to THAT corpus — callers on other datasets can restore
    full convergence by passing ``max_iter=20`` (ADVICE r3)."""
    from pyspark.ml.clustering import KMeans

    if k is None:
        n = df.count()
        k = max(10, min(50, n // 1000))
    km = KMeans(k=k, seed=seed, featuresCol=features_col, maxIter=max_iter)
    model = km.fit(df)
    return model, model.transform(df).withColumnRenamed("prediction", "cluster")
