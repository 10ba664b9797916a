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


class TestMergeSrpIndex:
    """Insert-only incremental maintenance: merged == rebuilt must hold
    BIT-exactly (every stored row is a pure function of its own vector
    and the fixed hyperplanes), pruning must survive the append, and
    the failure modes must be loud."""

    @pytest.fixture()
    def split_corpus(self, spark):
        emb = load_table(spark, SF_DIR, "embeddings")
        old = emb.filter(emb.vec_id % 2 == 0)
        new = emb.filter(emb.vec_id % 2 == 1)
        yield emb, old, new
        for base in ("t_srp_m", "t_srp_full"):
            for s in ("by_bucket", "by_id", "meta"):
                spark.sql(f"DROP TABLE IF EXISTS {base}_{s}")

    def test_merged_equals_rebuilt(self, spark, split_corpus):
        from big_data_song_recommendation_spark.operators.similarity import (
            merge_srp_index,
        )

        emb, old, new = split_corpus
        build_srp_index(
            old, label_col="label", planes=PLANES, name="t_srp_m", n_buckets=4
        )
        merge_srp_index(new, name="t_srp_m", label_col="label")
        build_srp_index(
            emb, label_col="label", planes=PLANES, name="t_srp_full",
            n_buckets=4,
        )
        ids = [0, 1, 2, 3, 4, 5, 6, 7]
        got = sorted(
            tuple(r)
            for r in srp_knn_indexed(spark, ids, name="t_srp_m", k=3).collect()
        )
        want = sorted(
            tuple(r)
            for r in srp_knn_indexed(
                spark, ids, name="t_srp_full", k=3
            ).collect()
        )
        assert got == want and len(got) > 0
        # stored rows themselves are identical, not only the top-k view
        a = sorted(
            tuple(r) for r in spark.table("t_srp_m_by_bucket").collect()
        )
        b = sorted(
            tuple(r) for r in spark.table("t_srp_full_by_bucket").collect()
        )
        assert a == b
        # pruning survives the append: the merged table still reads
        # selected buckets only
        plan = (
            srp_knn_indexed(spark, [0], name="t_srp_m", k=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        matches = re.findall(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert matches and any(int(x) < int(y) for x, y in matches), plan

    def test_id_overlap_and_contract_violations_raise(
        self, spark, split_corpus
    ):
        from big_data_song_recommendation_spark.operators.similarity import (
            merge_srp_index,
        )
        from pyspark.sql import functions as F

        emb, old, new = split_corpus
        build_srp_index(
            old, label_col="label", planes=PLANES, name="t_srp_m", n_buckets=4
        )
        with pytest.raises(ValueError, match="already indexed"):
            merge_srp_index(old.limit(3), name="t_srp_m", label_col="label")
        with pytest.raises(ValueError, match="label_col"):
            merge_srp_index(new, name="t_srp_m")
        with pytest.raises(ValueError, match="dim"):
            merge_srp_index(
                new.withColumn("embedding", F.slice("embedding", 1, 3)),
                name="t_srp_m",
                label_col="label",
            )
        with pytest.raises(RuntimeError, match="build_srp_index first"):
            merge_srp_index(new, name="t_srp_absent", label_col="label")


def test_srp_idempotent_merge_replay(spark):
    """Round-10 replay contract on the vector side: re-merging the
    same delta with idempotent=True leaves both tables bit-identical;
    a partial overlap folds in only the new ids."""
    from big_data_song_recommendation_spark.operators.similarity import (
        merge_srp_index,
    )
    from big_data_song_recommendation_spark.sources.readers import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.filter("vec_id % 4 != 0")
    d1 = emb.filter("vec_id % 4 = 0 and vec_id % 8 = 0")
    tables = build_srp_index(
        base, planes=PLANES, name="t_srp_idem", n_buckets=4
    )
    try:
        merge_srp_index(d1, name="t_srp_idem", check_new_ids=False)
        snap = {
            t: sorted(tuple(r) for r in spark.table(n).collect())
            for t, n in tables.items()
            if t != "meta"
        }
        merge_srp_index(d1, name="t_srp_idem", idempotent=True)
        for t, rows in snap.items():
            assert sorted(
                tuple(r) for r in spark.table(tables[t]).collect()
            ) == rows, t
        d2 = emb.filter("vec_id % 4 = 0")  # superset of d1
        merge_srp_index(d2, name="t_srp_idem", idempotent=True)
        got = {r[0] for r in spark.table(tables["by_id"]).select("vec_id").collect()}
        assert got == {r[0] for r in emb.select("vec_id").collect()}
    finally:
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_srp_knn_compare_matches_standalone(spark):
    """The shared-subplan compare form (r12, q165's slim) must return
    ROW-IDENTICAL arms to the two standalone srp_knn calls it
    replaces — single == srp_knn(multiprobe=False), multi ==
    srp_knn(multiprobe=True), same (query, neighbor, sim, rnk)."""
    from big_data_song_recommendation_spark.operators.similarity import (
        srp_knn_compare,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    probes = emb.filter(emb.vec_id < 8)
    single, multi = srp_knn_compare(emb, probes, planes=PLANES, k=3)
    got_single = sorted(tuple(r) for r in single.collect())
    got_multi = sorted(tuple(r) for r in multi.collect())
    want_single = sorted(
        tuple(r)
        for r in srp_knn(emb, probes, planes=PLANES, k=3).collect()
    )
    want_multi = sorted(
        tuple(r)
        for r in srp_knn(
            emb, probes, planes=PLANES, k=3, multiprobe=True
        ).collect()
    )
    assert got_single == want_single
    assert got_multi == want_multi
