"""Persisted SRP-LSH serving layout (operators/similarity.py
build_srp_index / srp_knn_indexed / srp_hard_negatives_indexed):
identical neighbors to the in-session forms, bucket-pruned plans,
loud failure modes."""

import re

import pytest

from big_data_song_recommendation_spark.operators.similarity import (
    build_srp_index,
    srp_hard_negatives,
    srp_hard_negatives_indexed,
    srp_knn,
    srp_knn_indexed,
)
from big_data_song_recommendation_spark.sources.readers import load_table

from .conftest import SF_DIR

PLANES = 6  # matches the q75/q138 roster setting


@pytest.fixture(scope="module")
def srp_index(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    tables = build_srp_index(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        label_col="label",
        planes=PLANES,
        name="t_srp",
        n_buckets=4,
    )
    yield emb, tables
    for t in tables.values():
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_indexed_knn_matches_in_session(spark, srp_index):
    """The persisted-index server must return the EXACT rows (ids,
    sims, ranks) of the in-session bucket join — shared rerank tail
    over the stored raw vectors and precomputed norms."""
    emb, _ = srp_index
    ids = [0, 1, 2, 3, 4, 5, 6, 7]
    probes = emb.filter(emb.vec_id < 8)
    want = sorted(
        tuple(r)
        for r in srp_knn(
            emb, probes, planes=PLANES, k=3
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in srp_knn_indexed(spark, ids, name="t_srp", k=3).collect()
    )
    assert got == want and len(got) > 0


def test_indexed_multiprobe_matches_in_session(spark, srp_index):
    """multiprobe=True must agree between the in-session join and the
    persisted index (flips widen the IN-list, same rerank tail)."""
    emb, _ = srp_index
    ids = [0, 1, 2, 3]
    probes = emb.filter(emb.vec_id < 4)
    want = sorted(
        tuple(r)
        for r in srp_knn(
            emb, probes, planes=PLANES, k=3, multiprobe=True
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in srp_knn_indexed(
            spark, ids, name="t_srp", k=3, multiprobe=True
        ).collect()
    )
    assert got == want and len(got) > 0


def test_indexed_hard_negatives_match_in_session(spark, srp_index):
    emb, _ = srp_index
    ids = [0, 1, 2, 3, 4, 5, 6, 7]
    probes = emb.select("vec_id").filter(emb.vec_id < 8)
    want = sorted(
        tuple(r)
        for r in srp_hard_negatives(
            emb, probes, planes=PLANES, k=3
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in srp_hard_negatives_indexed(
            spark, ids, name="t_srp", k=3
        ).collect()
    )
    assert got == want and len(got) > 0


def test_indexed_plan_prunes_buckets_and_never_rehashes(spark, srp_index):
    """The serving plan must read selected BUCKETS of the candidate
    table (bucket pruning on the probes' bucket IN filter) and contain
    no Generate node — per-query IO is the probed buckets, never the
    signature recompute (explode over dims×planes)."""
    q = srp_knn_indexed(spark, [0], name="t_srp", k=3)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, plan
    matches = re.findall(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert matches, f"no bucket pruning in plan:\n{plan}"
    # both the probe-row lookup (by id) and the candidate read (by
    # bucket) prune; a single probe touches one bucket of each
    assert any(int(a) < int(b) for a, b in matches), matches


def test_probe_not_in_index_returns_empty(spark, srp_index):
    assert srp_knn_indexed(spark, [10**9], name="t_srp", k=3).count() == 0


def test_empty_probes_raise(spark, srp_index):
    with pytest.raises(ValueError):
        srp_knn_indexed(spark, [], name="t_srp")


def test_unlabeled_index_rejects_hard_negative_serving(spark, srp_index):
    emb, _ = srp_index
    tables = build_srp_index(
        emb.select("vec_id", "embedding"),
        planes=PLANES,
        name="t_srp_nolbl",
        n_buckets=4,
    )
    try:
        with pytest.raises(ValueError):
            srp_hard_negatives_indexed(spark, [0], name="t_srp_nolbl")
    finally:
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
