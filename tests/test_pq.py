"""Product quantization (operators/similarity.py pq_encode /
pq_adc_topk / pq_rerank_topk, committed codebooks in
ml/pq_codebooks.py): encode exactness, the re-rank recall guarantee,
and the failure modes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_song_recommendation_spark.ml.pq_codebooks import (
    PQ_CODEBOOKS,
    PQ_DIM,
    PQ_K,
    PQ_M,
)
from big_data_song_recommendation_spark.operators.similarity import (
    pq_adc_topk,
    pq_encode,
    pq_rerank_topk,
)
from big_data_song_recommendation_spark.sources.readers import load_table

from .conftest import SF_DIR

D_SUB = PQ_DIM // PQ_M


def test_codes_shape_and_range(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    rows = pq_encode(emb).collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert len(r.codes) == PQ_M
        assert all(0 <= c < PQ_K for c in r.codes)


def test_centroid_vectors_encode_to_their_own_codes(spark):
    """A vector assembled from one centroid per subspace must encode
    to exactly those indices (distance 0 beats everything; ties can't
    happen because the chosen centroids are verified unique)."""
    chosen = []
    for m in range(PQ_M):
        cents = [
            tuple(PQ_CODEBOOKS[m][c * D_SUB : (c + 1) * D_SUB])
            for c in range(PQ_K)
        ]
        # pick the lowest index whose centroid is unique in its book
        c = next(i for i in range(PQ_K) if cents.count(cents[i]) == 1)
        chosen.append(c)
    vec = [
        PQ_CODEBOOKS[m][chosen[m] * D_SUB + j] / 1_000_000.0
        for m in range(PQ_M)
        for j in range(D_SUB)
    ]
    df = spark.createDataFrame(
        [(0, vec)], "vec_id long, embedding array<double>"
    )
    assert list(pq_encode(df).collect()[0].codes) == chosen


def test_rerank_recall_never_below_adc(spark):
    """The q168 invariant, asserted per probe directly: exact-top-3
    hits of the re-ranked pipeline >= hits of plain ADC top-3."""
    from big_data_song_recommendation_spark.operators.similarity import (
        brute_force_knn,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    probes = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_knn(emb, probes, k=3).collect()
    }
    adc = {
        (r.query_id, r.neighbor_id)
        for r in pq_adc_topk(emb, probes, k=3).collect()
    }
    rr = {
        (r.query_id, r.neighbor_id)
        for r in pq_rerank_topk(emb, probes, k=3, candidates=20).collect()
    }
    for q in range(8):
        hits_adc = len({p for p in exact & adc if p[0] == q})
        hits_rr = len({p for p in exact & rr if p[0] == q})
        assert hits_rr >= hits_adc, q
    # and the pipeline is strictly useful on this corpus overall
    assert len(exact & rr) > len(exact & adc)


def test_custom_codebooks_and_failure_modes(spark):
    df = spark.createDataFrame(
        [(0, [0.1, 0.2, 0.3, 0.4])], "vec_id long, embedding array<double>"
    )
    books = [
        [0, 0, 1_000_000, 1_000_000],  # 2 centroids of dim 2
        [0, 0, 500_000, 500_000],
    ]
    codes = pq_encode(df, codebooks=(books, 4)).collect()[0].codes
    assert list(codes) == [0, 1]  # (0.1,0.2) nearer (0,0); (0.3,0.4) nearer (0.5,0.5)
    with pytest.raises(ValueError, match="not divisible"):
        pq_encode(df, codebooks=(books, 5))


def test_dim_mismatch_fails_loudly(spark):
    """ADVICE r9: a vector column shorter than the codebook dim used to
    NULL-poison element_at silently; now it raises up front — on the
    encode path and on the probe side of ADC."""
    from big_data_song_recommendation_spark.operators.similarity import (
        pq_adc_topk,
    )

    short = spark.createDataFrame(
        [(0, [0.1, 0.2])], "vec_id long, embedding array<double>"
    )
    ok = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3, 0.4])], "vec_id long, embedding array<double>"
    )
    books = [
        [0, 0, 1_000_000, 1_000_000],
        [0, 0, 500_000, 500_000],
    ]
    with pytest.raises(ValueError, match="dim 2"):
        pq_encode(short, codebooks=(books, 4))
    with pytest.raises(ValueError, match="probe vectors are dim 2"):
        pq_adc_topk(ok, short, codebooks=(books, 4))
    with pytest.raises(ValueError, match="ragged"):
        pq_encode(ok, codebooks=([books[0], books[1][:2]], 4))


def test_ivf_pq_full_fanout_equals_brute_force(spark):
    """IVF+PQ with nprobe == K and candidates ≥ corpus degenerates to
    the exact scan (routing covers every cell, the ADC cut keeps
    everything, re-rank is the exact cosine ranking) — and the
    n_scanned column equals corpus−1 per probe (self excluded)."""
    from big_data_song_recommendation_spark.ml.centroids import IVF_CENTROIDS
    from big_data_song_recommendation_spark.operators.similarity import (
        brute_force_knn,
        ivf_pq_topk,
    )
    from big_data_song_recommendation_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = emb.count()
    probes = emb.filter(F.col("vec_id") < 3)
    got = ivf_pq_topk(
        emb, probes, IVF_CENTROIDS,
        k=3, nprobe=len(IVF_CENTROIDS), candidates=n,
    )
    want = brute_force_knn(emb, probes, k=3)
    assert sorted(
        (r.query_id, r.neighbor_id, r.sim, r.rnk) for r in got.collect()
    ) == sorted(tuple(r) for r in want.collect())
    assert {r.n_scanned for r in got.collect()} == {n - 1}


def test_ivf_pq_small_nprobe_is_sublinear(spark):
    """With nprobe ≪ K each probe's candidate scan touches a strict
    subset of the corpus — the sub-linearity the composition exists
    for (also gated in-query by q173)."""
    from big_data_song_recommendation_spark.ml.centroids import IVF_CENTROIDS
    from big_data_song_recommendation_spark.operators.similarity import (
        ivf_pq_topk,
    )
    from big_data_song_recommendation_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = emb.count()
    probes = emb.filter(F.col("vec_id") < 3)
    got = ivf_pq_topk(emb, probes, IVF_CENTROIDS, k=3, nprobe=2).collect()
    assert len(got) > 0
    assert all(r.n_scanned < n for r in got)
