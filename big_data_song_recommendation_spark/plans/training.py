"""Reference-domain end-to-end batch training pipeline (SURVEY.md §3.1).

The reference's flagship entry point (`src/train_models.py` →
`src/spark/training.py:404-441` ``train_all_models``) as ONE composed
Spark pipeline: schema'd ingest → clean → enrich (3 broadcast dim
joins) → feature pipeline → KMeans + ALS → registry save. Differences
from the reference, by design:

- one ``cache()`` of the enriched frame instead of repeated
  ``.count()`` materializations (``src/spark/training.py:98,230,318``
  re-ran the plan each time);
- display enrichment stays in DataFrame land (no collect loops);
- per-column defaults applied in a single projection
  (:func:`..operators.clean.clean`) instead of two when/otherwise
  passes (``src/spark/training.py:68-95,273-299``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import first_list_element, rating_from_popularity
from ..ml import features, recommend
from ..ml.registry import ModelRegistry
from ..operators.clean import clean, drop_invalid, keep_first_by
from ..operators.joins import broadcast_dim_join, normalized_key_join
from ..sources import readers

#: per-column missing-value defaults (src/spark/training.py:68-80)
TRACK_DEFAULTS: dict = {
    "popularity": 0.0,
    "duration_ms": 180000.0,
    "acousticness": 0.5,
    "danceability": 0.5,
    "energy": 0.5,
    "instrumentalness": 0.0,
    "liveness": 0.2,
    "loudness": -10.0,
    "speechiness": 0.1,
    "tempo": 120.0,
    "valence": 0.5,
}

FEATURE_COLS: tuple[str, ...] = readers.AUDIO_FEATURES + ("popularity", "duration_ms")


def load_reference_tables(spark: SparkSession, data_dir: str) -> dict[str, DataFrame]:
    """S1-S3 ingest with declared schemas: tracks/artists/albums CSVs +
    emotions JSON from ``{data_dir}/``."""
    return {
        "tracks": readers.read_csv_hardened(
            spark, f"{data_dir}/spotify_tracks.csv", readers.TRACKS_SCHEMA
        ),
        "artists": readers.read_csv_hardened(
            spark, f"{data_dir}/spotify_artists.csv", readers.ARTISTS_SCHEMA
        ),
        "albums": readers.read_csv_hardened(
            spark, f"{data_dir}/spotify_albums.csv", readers.ALBUMS_SCHEMA
        ),
        "emotions": readers.read_json_hardened(
            spark, f"{data_dir}/emotion_data.json", readers.EMOTIONS_SCHEMA
        ),
    }


def clean_tracks(tracks: DataFrame) -> DataFrame:
    """P3-P9 hardening: defaults, key requirements, deterministic
    dedup on id (smallest name wins for reproducibility)."""
    out = clean(tracks, TRACK_DEFAULTS)
    out = drop_invalid(out, ["id", "name"])
    return keep_first_by(out, ["id"], ["name"])


def enriched_tracks(
    tracks: DataFrame,
    artists: DataFrame,
    albums: DataFrame,
    emotions: DataFrame,
) -> DataFrame:
    """J1+J2+J3: tracks ⋈ artists ⋈ albums ⋈ emotions, every dim
    broadcast (``src/spark/training.py:156-231`` pre-renamed columns;
    here dims are pre-projected instead). ``artists_id`` arrives as a
    stringified Python list (F10) — first element is the join key."""
    t = tracks.withColumn("artist_ref_id", first_list_element("artists_id"))
    a = artists.select(
        F.col("id").alias("a_id"),
        F.col("name").alias("artist_name"),
        F.col("followers").alias("artist_followers"),
        F.col("popularity").alias("artist_popularity"),
    )
    al = albums.select(
        F.col("id").alias("album_ref_id"),
        F.col("name").alias("album_name"),
        F.col("release_date").alias("album_release_date"),
        F.col("total_tracks").alias("album_total_tracks"),
    )
    e = emotions.select(
        F.col("artist").alias("em_artist"),
        F.col("song").alias("em_song"),
        F.col("emotion"),
    )
    out = broadcast_dim_join(t, a, F.col("artist_ref_id") == F.col("a_id")).drop("a_id")
    out = broadcast_dim_join(out, al, F.col("album_id") == al["album_ref_id"]).drop(
        "album_ref_id"
    )
    # J3 joins on normalized song name (the reference's exact-case join
    # missed legit matches; SURVEY.md J3 note)
    out = normalized_key_join(out, e, "name", "em_song").drop("em_artist", "em_song")
    return out


def synthetic_ratings(
    tracks: DataFrame, n_users: int = 1000, per_track: int = 5
) -> DataFrame:
    """F8: popularity-bucket ratings for ALS training, deterministic
    users via md5 (the reference used ``rand()*1000`` user ids,
    ``src/spark/training.py:444-459`` — irreproducible). ``per_track``
    interactions per track keep items warm across a train/test split
    (coldStartStrategy="drop" would otherwise drop every test row)."""
    from ..functions.scalars import md5_bucket

    rep = F.explode(F.sequence(F.lit(0), F.lit(per_track - 1))).alias("rep")
    return tracks.select(F.col("id"), F.col("popularity"), rep).select(
        md5_bucket(F.concat(F.col("id"), F.lit(":"), F.col("rep")), n_users)
        .cast("int")
        .alias("user_id"),
        F.col("id").alias("track_id"),
        rating_from_popularity("popularity").alias("rating"),
    )


@dataclass
class TrainingArtifacts:
    enriched_count: int
    kmeans_k: int
    als_rmse: float | None
    registry_dir: str
    gate_passed: bool = False
    gate_reasons: list | None = None


def content_feature_pipeline(vocab_size: int = 100):
    """M11+M12: the reference's content model input — TF-IDF over
    ``artist + emotion`` text (``src/training_service.py:608-614``)
    hstacked with the scaled audio features
    (``src/training_service.py:616-620``) — as one declared Pipeline
    over the enriched frame."""
    from pyspark.ml import Pipeline

    audio = features.feature_pipeline(list(FEATURE_COLS))
    tfidf = features.tfidf_pipeline("artist_emotion", vocab_size=vocab_size)
    concat = features.concat_features(
        ["scaled_features", "tfidf_features"], output_col="content_features"
    )
    return Pipeline(stages=[audio, tfidf, concat])


def train_all(
    spark: SparkSession,
    data_dir: str,
    registry_dir: str,
    *,
    als_overrides: dict | None = None,
    kmeans_k: int | None = None,
    quality_thresholds: dict | None = None,
) -> TrainingArtifacts:
    """The full §3.1 flow. Small-config overrides keep tests fast; the
    no-override defaults are the reference's published hyperparameters
    (BASELINE.md: ALS rank 50/iter 10/reg 0.1/seed 42).

    The quality gate (reference ``als_config.json`` thresholds,
    declared there but never enforced — VERDICT r3 item 6) now gates
    REGISTRATION: a failing ALS model is saved quarantined
    (``promote=False`` — artifact + metadata kept for audit, no
    pointer moves) so serving can never load a degraded retrain.
    ``quality_thresholds`` overrides individual thresholds
    (max_rmse / min_precision_at_k / min_recall_at_k)."""
    tables = load_reference_tables(spark, data_dir)
    tracks = clean_tracks(tables["tracks"])
    enriched = enriched_tracks(
        tracks, tables["artists"], tables["albums"], tables["emotions"]
    ).cache()
    n = enriched.count()  # one materialization, reused by every stage

    # content path: audio features + TF-IDF(artist+emotion) → KMeans
    with_text = enriched.withColumn(
        "artist_emotion",
        F.concat_ws(
            " ", F.coalesce(F.col("artist_name"), F.lit("")),
            F.coalesce(F.col("emotion"), F.lit("")),
        ),
    )
    content_model, feat_df = features.fit_transform(
        content_feature_pipeline(), with_text
    )
    km_model, assigned = recommend.train_kmeans(feat_df, k=kmeans_k)

    # collaborative path: synthetic ratings → indexer → ALS
    ratings = synthetic_ratings(tracks)
    indexer = features.string_indexer("track_id")
    idx_model = indexer.fit(ratings)
    indexed = idx_model.transform(ratings).withColumn(
        "track_index", F.col("track_id_index").cast("int")
    )
    als = recommend.train_als(
        indexed,
        item_col="track_index",
        **(als_overrides or {}),
    )

    # quality gate (the reference declared thresholds but never
    # enforced them): rank the train set itself and require the model
    # to retrieve its own strong interactions before promotion
    from ..ml import evaluation

    recs = recommend.recommend_top_n(als.model, 10).withColumnRenamed(
        "track_index", "item_id"
    )
    relevant = indexed.filter(F.col("rating") >= 4.0).select(
        "user_id", F.col("track_index").alias("item_id")
    )
    metrics = evaluation.ranking_metrics(recs, relevant, k=10)
    ok, reasons = evaluation.passes_quality_gate(
        rmse=als.rmse, metrics=metrics, thresholds=quality_thresholds
    )

    reg = ModelRegistry(registry_dir)
    reg.save("content_features", content_model, {"cols": list(FEATURE_COLS), "rows": n})
    reg.save("kmeans", km_model, {"k": km_model.getK()})
    v = reg.save(
        "als",
        als.model,
        {
            "rmse": als.rmse,
            "precision_at_10": metrics.precision_at_k,
            "recall_at_10": metrics.recall_at_k,
            "gate_passed": ok,
            "gate_reasons": reasons,
            **als.config,
        },
        promote=ok,
    )
    if ok:
        reg.mark_best("als", v.version)
    return TrainingArtifacts(
        enriched_count=n,
        kmeans_k=km_model.getK(),
        als_rmse=als.rmse,
        registry_dir=registry_dir,
        gate_passed=ok,
        gate_reasons=reasons,
    )
