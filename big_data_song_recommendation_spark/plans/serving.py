"""Serving-layer queries (SURVEY.md §2.12) as library functions.

Each reference REST endpoint becomes a composable DataFrame query:

- ``GET /songs?limit&offset``                → :func:`browse`
- ``GET /recommend/collaborative/<user>``    → :func:`collaborative`
- ``GET /recommend/content/<track>``         → :func:`content`
- ``GET /recommend/hybrid/<user>``           → :func:`hybrid`
- ``GET /models/info``                       → :func:`models_info`

Display enrichment happens IN the plan (broadcast join + coalesce
fallback chain) — the reference collected the tracks table and looped
per recommendation (``src/app.py:233-245``, its worst hotspot) and
layered dict fallbacks in Python (``src/app_optimized.py:282-374``,
J5). The md5-derived synthetic tier reproduces its deterministic
pseudo-attributes relationally (F5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import pick_deterministic, spotify_url
from ..operators.aggregates import paginate
from ..operators.similarity import brute_force_knn

#: synthetic display pools (the reference's hash-pick pools,
#: src/app_optimized.py:259-277)
_NAME_POOL = ["Midnight Echo", "Golden Hour", "Neon Drift", "Silver Line", "Wildfire"]
_ARTIST_POOL = ["The Wanderers", "Luna Park", "Static Bloom", "Coral Keys", "North Ave"]

AUDIO_FEATURES_FOR_CONTENT = (
    "acousticness",
    "danceability",
    "energy",
    "instrumentalness",
    "liveness",
    "speechiness",
    "valence",
)


def display_dim(tracks: DataFrame) -> DataFrame:
    """Pre-projected display dimension: the broadcast side of every
    serving join. Works on bare tracks or the enriched frame."""
    artist = (
        F.col("artist_name")
        if "artist_name" in tracks.columns
        else F.lit(None).cast("string")
    )
    return tracks.select(
        F.col("id").alias("track_id"),
        F.col("name").alias("track_name"),
        artist.alias("artist_name"),
        F.col("popularity").alias("track_popularity"),
    )


def with_display(recs: DataFrame, display: DataFrame, id_col: str = "track_id") -> DataFrame:
    """J5: display lookup with tiered fallback — real display row if
    the broadcast join hits, else deterministic md5-derived synthetic
    attributes. One projection, no driver loops."""
    joined = recs.join(F.broadcast(display), id_col, "left")
    return joined.withColumns(
        {
            "track_name": F.coalesce(
                F.col("track_name"), pick_deterministic(F.col(id_col), _NAME_POOL)
            ),
            "artist_name": F.coalesce(
                F.col("artist_name"), pick_deterministic(F.col(id_col), _ARTIST_POOL)
            ),
            "url": spotify_url(F.col(id_col)),
        }
    )


def browse(tracks: DataFrame, *, limit: int = 20, offset: int = 0) -> DataFrame:
    """Paginated browse (O4) with a deterministic total order."""
    page = paginate(tracks, sort=[F.col("id")], limit=limit, offset=offset)
    return page.select("id", "name", "popularity")


def collaborative(
    als_model,
    users: DataFrame,
    display: DataFrame,
    *,
    n: int = 10,
    index_map: DataFrame | None = None,
    bounded_users: bool | None = True,
) -> DataFrame:
    """ALS top-n with display enrichment. ``index_map`` (track_index →
    track_id, from the StringIndexer) converts model item indices back
    to ids when the model was trained on indexed items.

    ``bounded_users`` defaults to True here: a serving request carries
    a per-request user batch (the reference's endpoint takes one user),
    so the direct factor-cross path is taken without a size probe.
    Batch/offline callers with unbounded user sets pass None (probe)
    or False (MLlib subset path)."""
    from ..ml.recommend import recommend_top_n

    recs = recommend_top_n(als_model, n, users=users, bounded_users=bounded_users)
    item_col = als_model.getItemCol()
    if index_map is not None:
        recs = recs.join(F.broadcast(index_map), item_col).drop(item_col)
    else:
        recs = recs.withColumnRenamed(item_col, "track_id")
    out = with_display(recs, display)
    return out.select(
        F.col(als_model.getUserCol()).alias("user_id"),
        "track_id",
        "track_name",
        "artist_name",
        "url",
        F.round(F.col("rating"), 4).alias("score"),
        "rnk",
    ).orderBy("user_id", "rnk")


def collaborative_committed(
    spark,
    users: DataFrame,
    display: DataFrame,
    *,
    n: int = 10,
) -> DataFrame:
    """The collaborative endpoint served from the COMMITTED factor
    matrices (round 10, ml/als_factors.py) — no fitted model object in
    the serving process at all: the nightly trainer commits factors,
    every replica serves exact integer dot-product top-n from the
    literals (ml/recommend.recommend_top_n_committed) plus the display
    join. Same output contract as :func:`collaborative`; scores are
    the micro² integers rescaled to the model's float scale at 4 dp.
    This is the q40 serving surface with display enrichment — the
    deployment shape where model artifacts, not model OBJECTS, cross
    the trainer/server boundary."""
    from ..ml.recommend import recommend_top_n_committed

    recs = recommend_top_n_committed(spark, users, n).withColumnRenamed(
        "item_id", "track_id"
    )
    out = with_display(recs, display)
    return out.select(
        "user_id",
        "track_id",
        "track_name",
        "artist_name",
        "url",
        F.round(F.col("score_micro2") / F.lit(1_000_000_000_000.0), 4).alias(
            "score"
        ),
        "rnk",
    ).orderBy("user_id", "rnk")


def content(
    tracks: DataFrame,
    seed_track_id: str,
    display: DataFrame,
    *,
    n: int = 5,
    feature_cols: tuple[str, ...] = AUDIO_FEATURES_FOR_CONTENT,
) -> DataFrame:
    """Content similarity: cosine over audio-feature vectors, seed
    excluded (O1's self-skip as a filter, P11)."""
    featured = tracks.select(
        F.col("id"), F.array(*[F.col(c) for c in feature_cols]).alias("fv")
    )
    probes = featured.filter(F.col("id") == seed_track_id)
    recs = brute_force_knn(
        featured, probes, id_col="id", vec_col="fv", k=n, exclude_self=True
    ).select(
        F.col("neighbor_id").alias("track_id"),
        F.col("sim").alias("score"),
        "rnk",
    )
    return with_display(recs, display).select(
        "track_id", "track_name", "artist_name", "url", "score", "rnk"
    ).orderBy("rnk")


def hybrid(
    collab_recs: DataFrame,
    content_recs: DataFrame,
    *,
    n: int = 10,
    collab_weight: float = 0.7,
) -> DataFrame:
    """U1: weighted union-truncate (0.7 collaborative / 0.3 content,
    BASELINE.md) with rank-reciprocal scores and a total-order tiebreak."""
    from pyspark.sql import Window

    c = collab_recs.select(
        "track_id",
        (F.lit(collab_weight) / F.col("rnk")).alias("score"),
        F.lit("collaborative").alias("source"),
    )
    t = content_recs.select(
        "track_id",
        (F.lit(1.0 - collab_weight) / F.col("rnk")).alias("score"),
        F.lit("content").alias("source"),
    )
    w = Window.orderBy(F.desc("total"), F.asc("track_id"))
    return (
        c.unionByName(t)
        .groupBy("track_id")
        .agg(F.round(F.sum("score"), 6).alias("total"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= n)
        .orderBy("rnk")
    )


def batch_stats(spark, lake_dir: str) -> DataFrame:
    """``GET /batches/stats`` (§2.12): aggregate over the streaming
    lake's parquet data — per-epoch size, avg rating, distinct users
    (the reference's per-batch JSON summaries, recomputed relationally
    so they stay correct under reprocessing)."""
    data = spark.read.parquet(f"{lake_dir}/data")
    return (
        data.groupBy("epoch")
        .agg(
            F.count("*").alias("size"),
            F.round(F.avg("rating"), 2).alias("avg_rating"),
            F.countDistinct("user_id").alias("unique_users"),
            F.countDistinct("item_id").alias("unique_items"),
        )
        .orderBy("epoch")
    )


def featured_items(spark, lake_dir: str, *, n: int = 5) -> DataFrame:
    """``GET /batches/featured``: top-n items by max rating across the
    lake (the reference's T4 'featured tracks', A9 argmax shape)."""
    data = spark.read.parquet(f"{lake_dir}/data")
    return (
        data.groupBy("item_id")
        .agg(F.max("rating").alias("max_rating"), F.count("*").alias("n_plays"))
        .orderBy(F.desc("max_rating"), F.desc("n_plays"), F.asc("item_id"))
        .limit(n)
    )


def models_info(registry) -> list[dict]:
    """Metadata projection over the registry (``GET /models/info``)."""
    out = []
    for name in sorted(p.name for p in registry.base.iterdir() if p.is_dir()):
        try:
            out.append(registry.metadata(name))
        except FileNotFoundError:
            continue
    return out


def batch_files(lake_dir: str) -> list[dict]:
    """``GET /batches/files`` (ref dashboard contract,
    ``src/streamlit_app.py:636-645``: a ``batch_files`` list with
    ``timestamp`` + size per file, newest last): enumerate the
    BatchSink snapshot JSONs in epoch order.

    Driver-side file listing by design — snapshots are one small JSON
    per micro-batch (dashboard metadata, not data); the data-volume
    path is :func:`batch_stats` over the parquet lake."""
    import json as _json
    from pathlib import Path

    out = []
    snap_dir = Path(lake_dir) / "snapshots"
    if not snap_dir.is_dir():
        return out
    for p in sorted(snap_dir.glob("batch_*.json")):
        try:
            snap = _json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        out.append(
            {
                "filename": p.name,
                "batch_id": snap.get("epoch"),
                "size": snap.get("size"),
                "timestamp": snap.get("ts"),
                "avg_rating": snap.get("avg_rating"),
            }
        )
    return out


def latest_batch(lake_dir: str) -> dict | None:
    """``GET /batches/latest`` (ref ``src/streamlit_app.py:538-560``):
    the newest snapshot shaped to the dashboard's ``latest_batch``
    contract — ``batch_id``/``size`` at the top, ``training_summary``
    with ``unique_users``, ``ui_summary`` with ``avg_rating`` +
    ``featured_tracks``. Returns None when no batch has flushed yet
    (the ref endpoint 404s; a library returns None)."""
    import json as _json
    from pathlib import Path

    snaps = sorted((Path(lake_dir) / "snapshots").glob("batch_*.json"))
    if not snaps:
        return None
    snap = _json.loads(snaps[-1].read_text())
    return {
        "latest_batch": {
            "batch_id": snap.get("epoch"),
            "size": snap.get("size"),
            "training_summary": {
                "unique_users": snap.get("unique_users"),
                "unique_items": snap.get("unique_items"),
            },
            "ui_summary": {
                "avg_rating": snap.get("avg_rating"),
                "featured_tracks": snap.get("featured_items", []),
                "action_distribution": snap.get("action_distribution", {}),
            },
        }
    }
