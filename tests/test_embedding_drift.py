"""Embedding centroid drift (operators/profile.
embedding_centroid_drift): identity, scale, and direction cases."""

from big_data_song_recommendation_spark.operators.profile import (
    embedding_centroid_drift,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "grp string, embedding array<float>"
    )


def test_identical_populations_cos_one_ratio_one(spark):
    rows = [("a", [1.0, 2.0, 3.0]), ("a", [2.0, 1.0, 0.5])]
    out = embedding_centroid_drift(
        _emb(spark, rows), _emb(spark, rows), group=["grp"]
    ).collect()
    assert len(out) == 1
    r = out[0]
    # sqrt(n)*sqrt(n) can land one ulp off n — floor-6 then allows
    # 0.999999; never above 1
    assert 0.999998 <= r["centroid_cos"] <= 1.0
    assert 0.999998 <= r["mean_norm_ratio"] <= 1.000001
    assert (r["n_ref"], r["n_cur"]) == (2, 2)


def test_scaled_population_keeps_direction(spark):
    ref = [("a", [1.0, 0.0, 1.0]), ("a", [0.0, 1.0, 1.0])]
    cur = [("a", [3.0, 0.0, 3.0]), ("a", [0.0, 3.0, 3.0])]
    r = embedding_centroid_drift(
        _emb(spark, ref), _emb(spark, cur), group=["grp"]
    ).head()
    assert r["centroid_cos"] >= 0.999998  # same direction
    assert abs(r["mean_norm_ratio"] - 3.0) < 0.001


def test_orthogonal_drift_detected(spark):
    ref = [("a", [1.0, 0.0]), ("a", [1.0, 0.0])]
    cur = [("a", [0.0, 1.0]), ("a", [0.0, 1.0])]
    r = embedding_centroid_drift(
        _emb(spark, ref), _emb(spark, cur), group=["grp"]
    ).head()
    assert abs(r["centroid_cos"]) < 0.001


def test_groups_independent_and_global_mode(spark):
    ref = [("a", [1.0, 0.0]), ("b", [0.0, 1.0])]
    cur = [("a", [1.0, 0.0]), ("b", [1.0, 0.0])]
    out = {
        r["grp"]: r["centroid_cos"]
        for r in embedding_centroid_drift(
            _emb(spark, ref), _emb(spark, cur), group=["grp"]
        ).collect()
    }
    assert out["a"] >= 0.999998 and abs(out["b"]) < 0.001
    # ungrouped: one global row
    g = embedding_centroid_drift(_emb(spark, ref), _emb(spark, cur)).collect()
    assert len(g) == 1 and g[0]["n_ref"] == 2


def test_two_scans_total(spark):
    """Counts must ride the sums aggregate: the whole drift report
    costs exactly one scan per side (regression: separate count
    frames paid two extra whole-table scans)."""
    from big_data_song_recommendation_spark.sources.readers import load_table

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    from pyspark.sql import functions as F

    rep = embedding_centroid_drift(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 != 0),
        group=["label"],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 2


def test_one_sided_group_surfaces_with_null_metrics(spark):
    """ADVICE r7: a label present in only one snapshot is the drift
    event itself — it must SURFACE (full-outer join) with the missing
    side's n=0 and NULL cos/ratio, not silently vanish (old inner
    join), matching the DuckDB twin's guards."""
    ref = [("stays", [1.0, 0.0]), ("vanished", [0.5, 0.5])]
    cur = [("stays", [1.0, 0.0]), ("appeared", [0.0, 1.0])]
    out = {
        r["grp"]: r
        for r in embedding_centroid_drift(
            _emb(spark, ref), _emb(spark, cur), group=["grp"]
        ).collect()
    }
    assert set(out) == {"stays", "vanished", "appeared"}
    v, a = out["vanished"], out["appeared"]
    assert (v["n_ref"], v["n_cur"]) == (1, 0)
    assert v["centroid_cos"] is None and v["mean_norm_ratio"] is None
    assert (a["n_ref"], a["n_cur"]) == (0, 1)
    assert a["centroid_cos"] is None and a["mean_norm_ratio"] is None
    assert out["stays"]["centroid_cos"] >= 0.999998
