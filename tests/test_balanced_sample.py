"""Cluster-balanced sampling (operators/quality.srp_balanced_sample):
cap enforcement, determinism, bucket range, density flattening."""

from __future__ import annotations

from big_data_song_recommendation_spark.operators.quality import (
    srp_balanced_sample,
)
from big_data_song_recommendation_spark.sources.readers import load_table

from .conftest import SF_DIR


def _sample(spark, **kw):
    emb = load_table(spark, SF_DIR, "embeddings")
    return srp_balanced_sample(emb, **kw)


def test_cap_and_bucket_range(spark):
    planes, per_bucket = 4, 3
    out = _sample(spark, planes=planes, per_bucket=per_bucket).collect()
    per = {}
    for r in out:
        assert 0 <= r.bucket < 2**planes
        assert 1 <= r.smp_rank <= per_bucket
        per.setdefault(r.bucket, []).append(r.smp_rank)
    # ranks within a bucket are dense 1..n
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_deterministic_and_subset(spark):
    a = {(r.vec_id, r.bucket) for r in _sample(spark, planes=4, per_bucket=3).collect()}
    b = {(r.vec_id, r.bucket) for r in _sample(spark, planes=4, per_bucket=3).collect()}
    assert a == b
    emb_ids = {
        r.vec_id for r in load_table(spark, SF_DIR, "embeddings").select("vec_id").collect()
    }
    assert {v for v, _ in a} <= emb_ids


def test_flattens_density_vs_uniform(spark):
    """The per-bucket cap bounds ANY bucket's share of the sample at
    per_bucket rows — the property uniform sampling lacks."""
    per_bucket = 2
    out = _sample(spark, planes=3, per_bucket=per_bucket).collect()
    counts = {}
    for r in out:
        counts[r.bucket] = counts.get(r.bucket, 0) + 1
    assert counts and max(counts.values()) <= per_bucket


def test_larger_seed_changes_selection(spark):
    a = {r.vec_id for r in _sample(spark, planes=3, per_bucket=2, seed="smp").collect()}
    b = {r.vec_id for r in _sample(spark, planes=3, per_bucket=2, seed="alt").collect()}
    # different md5-uniform orderings pick different representatives
    assert a != b
