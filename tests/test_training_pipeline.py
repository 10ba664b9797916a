"""End-to-end reference-domain training pipeline (SURVEY.md §3.1):
dirty CSVs → schema'd ingest → clean → enrich → KMeans + ALS →
registry. Input fixtures include every dirty-data case FIXTURES.md §A
requires: nulls, NaN, "", "NULL", ±inf, duplicate ids, null keys."""

from __future__ import annotations

import csv
import json
import math
import random

import pytest
from pyspark.sql import functions as F

from big_data_song_recommendation_spark.plans import training

N_TRACKS = 60


def _write_fixtures(d):
    random.seed(42)
    tr = d / "spotify_tracks.csv"
    with open(tr, "w", newline="") as f:
        w = csv.writer(f)
        cols = (
            ["id", "name", "artists_id", "album_id"]
            + list(training.readers.AUDIO_FEATURES)
            + ["popularity", "duration_ms", "key", "mode", "time_signature",
               "preview_url", "href"]
        )
        w.writerow(cols)
        for i in range(N_TRACKS):
            feats = [round(random.random(), 3) for _ in training.readers.AUDIO_FEATURES]
            w.writerow(
                [f"t{i:03d}", f"Song {i}", f"['a{i % 7}']", f"al{i % 5}"]
                + feats
                + [random.randint(0, 100), 200000 + i, i % 12, i % 2, 4, "", ""]
            )
        # dirty rows: NaN feature, "NULL" sentinel, inf, dup id, null name
        w.writerow(["t900", "Dirty NaN", "['a0']", "al0"] + ["NaN"] * 9 + [50, 1000, 0, 0, 4, "", ""])
        w.writerow(["t901", "Dirty NULL", "['a1']", "al1"] + ["NULL"] * 9 + ["", "", 0, 0, 4, "", ""])
        w.writerow(["t902", "Dirty inf", "['a2']", "al2"] + ["inf"] * 9 + [10, 1000, 0, 0, 4, "", ""])
        w.writerow(["t000", "Song 0 dup", "['a0']", "al0"] + ["0.1"] * 9 + [1, 1, 0, 0, 4, "", ""])
        w.writerow(["", "No id", "['a0']", "al0"] + ["0.1"] * 9 + [1, 1, 0, 0, 4, "", ""])

    with open(d / "spotify_artists.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "name", "followers", "genres", "popularity"])
        for i in range(7):
            w.writerow([f"a{i}", f"Artist {i}", 1000 * i, "['pop']", 50 + i])

    with open(d / "spotify_albums.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "name", "release_date", "total_tracks"])
        for i in range(5):
            w.writerow([f"al{i}", f"Album {i}", f"200{i}-01-01", 10 + i])

    emotions = [
        {"artist": f"Artist {i % 7}", "song": f"SONG {i}", "emotion": "happy",
         "variance": 0.1, "Genre": "pop"}
        for i in range(0, N_TRACKS, 2)  # half the tracks match (case-insensitively)
    ]
    (d / "emotion_data.json").write_text("\n".join(json.dumps(e) for e in emotions))


@pytest.fixture(scope="module")
def artifacts(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("refdata")
    _write_fixtures(d)
    reg_dir = str(tmp_path_factory.mktemp("registry"))
    art = training.train_all(
        spark,
        str(d),
        reg_dir,
        als_overrides={"rank": 4, "maxIter": 3, "implicitPrefs": False},
        kmeans_k=5,
    )
    return d, art


def test_clean_and_enrich(spark, artifacts):
    d, art = artifacts
    tables = training.load_reference_tables(spark, str(d))
    tracks = training.clean_tracks(tables["tracks"])
    rows = {r["id"]: r for r in tracks.collect()}
    # dropped: null id; deduped: t000 keeps exactly one row
    assert "" not in rows and None not in rows
    assert tracks.filter(F.col("id") == "t000").count() == 1
    # defaults applied to every dirty numeric
    assert rows["t900"]["tempo"] == 120.0 and rows["t900"]["loudness"] == -10.0
    assert rows["t902"]["energy"] == 0.5  # inf normalized
    assert not math.isnan(rows["t901"]["valence"])

    enriched = training.enriched_tracks(
        tracks, tables["artists"], tables["albums"], tables["emotions"]
    )
    e = {r["id"]: r for r in enriched.collect()}
    assert e["t003"]["artist_name"] == "Artist 3"
    assert e["t003"]["album_name"] == "Album 3"
    # emotion joined case-insensitively ("SONG 2" ↔ "Song 2")
    assert e["t002"]["emotion"] == "happy"
    assert e["t003"]["emotion"] is None
    # left joins preserve every track
    assert enriched.count() == tracks.count()


def test_training_artifacts_and_registry(artifacts):
    from pyspark.ml.clustering import KMeansModel
    from pyspark.ml.recommendation import ALSModel

    _, art = artifacts
    assert art.enriched_count == N_TRACKS + 3  # 60 clean + 3 repaired dirty
    assert art.kmeans_k == 5
    assert art.als_rmse is not None and math.isfinite(art.als_rmse)

    reg = training.ModelRegistry(art.registry_dir)
    km = reg.load("kmeans", KMeansModel)
    assert len(km.clusterCenters()) == 5
    # address the ALS version explicitly: a gate-failing fit is saved
    # quarantined (no latest pointer), a passing one is promoted
    als_version = reg.versions("als")[-1]
    als = reg.load("als", ALSModel, version=als_version)
    assert als.rank == 4
    meta = reg.metadata("als", version=als_version)
    assert meta["rmse"] == art.als_rmse
    assert meta["promoted"] == art.gate_passed
    # quality gate computed and recorded; best-pointer only when passed
    assert meta["gate_passed"] == art.gate_passed
    assert 0.0 <= meta["precision_at_10"] <= 1.0
    if art.gate_passed:
        assert reg.load("als", ALSModel, pointer="best").rank == 4
    # content model (audio + TF-IDF(artist+emotion)) is versioned too
    from pyspark.ml import PipelineModel

    content = reg.load("content_features", PipelineModel)
    assert any("CountVectorizer" in type(s).__name__ for s in content.stages[1].stages)


def test_reproducible_over_rerun(spark, artifacts, tmp_path):
    d, art = artifacts
    art2 = training.train_all(
        spark,
        str(d),
        str(tmp_path / "reg2"),
        als_overrides={"rank": 4, "maxIter": 3, "implicitPrefs": False},
        kmeans_k=5,
    )
    # seeded fits + content-hash split → same metrics on same input
    # (tolerance: float sums over shuffle partitions vary in last ulps)
    assert art2.als_rmse == pytest.approx(art.als_rmse, rel=1e-6)
    assert art2.enriched_count == art.enriched_count


def test_degraded_model_rejected_by_registry(spark, tmp_path):
    """VERDICT r3 item 6: a retrain that fails the reference's declared
    quality thresholds must refuse to register — the artifact is
    quarantined (audit trail) but no pointer moves, so serving can
    never load it."""
    import pytest as _pytest

    d = tmp_path / "refdata"
    d.mkdir()
    _write_fixtures(d)
    reg_dir = str(tmp_path / "reg_rejected")
    art = training.train_all(
        spark,
        str(d),
        reg_dir,
        als_overrides={"rank": 2, "maxIter": 1, "implicitPrefs": False},
        kmeans_k=5,
        # impossible threshold -> the gate must fail deterministically
        quality_thresholds={"min_precision_at_k": 2.0},
    )
    assert not art.gate_passed
    assert any("precision" in r for r in art.gate_reasons)

    from pyspark.ml.recommendation import ALSModel

    reg = training.ModelRegistry(reg_dir)
    # no latest/best pointer -> un-loadable through serving paths
    with _pytest.raises(FileNotFoundError):
        reg.load("als", ALSModel)
    with _pytest.raises(FileNotFoundError):
        reg.load("als", ALSModel, pointer="best")
    # ...but the quarantined version is on disk with its evidence
    versions = reg.versions("als")
    assert len(versions) == 1
    meta = reg.metadata("als", version=versions[0])
    assert meta["promoted"] is False and meta["gate_passed"] is False
    assert meta["gate_reasons"]
