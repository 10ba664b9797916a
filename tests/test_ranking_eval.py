"""Graded ranking metrics (ml/evaluation.graded_ranking_metrics):
hand-computed NDCG/MRR/hits, perfect- and inverse-ranking bounds,
zero-signal users, and the integer-weight table."""

from __future__ import annotations

import math

from big_data_song_recommendation_spark.ml.evaluation import (
    DCG_SCALE,
    dcg_weights,
    graded_ranking_metrics,
)


def _metrics(spark, cand_rows, rel_rows, k=3):
    cand = spark.createDataFrame(cand_rows, "item long, rnk int")
    rel = spark.createDataFrame(rel_rows, "user_id long, item long, rel long")
    out = graded_ranking_metrics(cand, rel, k=k)
    return {r.user_id: (r.ndcg, r.mrr, r.hits) for r in out.collect()}


def test_weights_formula():
    W = dcg_weights(10)
    assert W[0] == DCG_SCALE  # log2(2) = 1
    assert W[2] == DCG_SCALE // 2  # log2(4) = 2
    for r, w in enumerate(W, start=1):
        assert w == round(DCG_SCALE / math.log2(r + 1))


def test_perfect_ranking_is_one(spark):
    # gains already descending in rank order → DCG == IDCG
    got = _metrics(
        spark,
        [(10, 1), (11, 2), (12, 3)],
        [(1, 10, 5), (1, 11, 3), (1, 12, 1)],
    )
    assert got == {1: (1.0, 1.0, 3)}


def test_inverse_ranking_hand_computed(spark):
    # gains 1,3,5 at ranks 1,2,3 against ideal 5,3,1
    W = dcg_weights(3)
    dcg = 1 * W[0] + 3 * W[1] + 5 * W[2]
    idcg = 5 * W[0] + 3 * W[1] + 1 * W[2]
    expect = math.floor(dcg / idcg * 1e6) / 1e6
    got = _metrics(
        spark,
        [(10, 1), (11, 2), (12, 3)],
        [(1, 10, 1), (1, 11, 3), (1, 12, 5)],
    )
    assert got == {1: (expect, 1.0, 3)}


def test_mrr_first_hit_and_partial_hits(spark):
    # only rank-2 item touched → mrr = 1/2, hits = 1
    got = _metrics(
        spark,
        [(10, 1), (11, 2), (12, 3)],
        [(1, 11, 7)],
    )
    ndcg, mrr, hits = got[1]
    assert (mrr, hits) == (0.5, 1)
    W = dcg_weights(3)
    assert ndcg == math.floor((7 * W[1]) / (7 * W[0]) * 1e6) / 1e6


def test_user_with_no_candidate_overlap_is_zero(spark):
    # clicked an item outside the candidate list: in scope (has
    # relevance rows) but zero gain on the grid → all-zero metrics
    got = _metrics(
        spark,
        [(10, 1), (11, 2)],
        [(1, 99, 4)],
        k=2,
    )
    assert got == {1: (0.0, 0.0, 0)}


def test_users_absent_from_relevance_are_out_of_scope(spark):
    got = _metrics(spark, [(10, 1)], [(7, 10, 1)], k=1)
    assert set(got) == {7}


def test_candidate_list_shorter_than_k(spark):
    """Regression: |candidates| < k pads the zip_with gains with
    NULLs; an un-coalesced fold poisoned IDCG to NULL and reported
    ndcg=0.0 for a PERFECT ranking."""
    got = _metrics(
        spark,
        [(10, 1), (11, 2)],  # only 2 candidates, k=10
        [(1, 10, 3), (1, 11, 1)],
        k=10,
    )
    assert got == {1: (1.0, 1.0, 2)}

    # and a hand-computed imperfect short list
    W = dcg_weights(10)
    dcg = 1 * W[0] + 3 * W[1]
    idcg = 3 * W[0] + 1 * W[1]
    expect = math.floor(dcg / idcg * 1e6) / 1e6
    got = _metrics(
        spark,
        [(10, 1), (11, 2)],
        [(2, 10, 1), (2, 11, 3)],
        k=10,
    )
    assert got == {2: (expect, 1.0, 2)}
