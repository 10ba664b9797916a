"""Committed trigram LM (round 10, VERDICT r9 #4): stupid-backoff
scoring against ml/lm_counts.py — Python-replay parity, tier
resolution, token-poor zero-fill, bucket thresholds, and the
front-door wiring."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from big_data_song_recommendation_spark.ml import lm
from big_data_song_recommendation_spark.ml import lm_counts as LMC
from big_data_song_recommendation_spark.operators.quality import (
    lm_perplexity_scores,
)


def _py_score(text: str) -> tuple[int, int]:
    """Pure-Python replay of the committed scoring: (n_trigrams,
    lm_score_micro)."""
    tri, bi23, uni = lm.score_maps()
    vocab = set(lm.vocab())
    norm = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", " ", text.lower())).strip()
    toks = [t if t in vocab else "<unk>" for t in norm.split(" ") if t]
    n = max(0, len(toks) - 2)
    if n == 0:
        return 0, 0
    s = 0
    for j in range(n):
        key = " ".join(toks[j : j + 3])
        b = " ".join(toks[j + 1 : j + 3])
        # explicit None checks, not `or`: a committed score of 0 is
        # falsy but must terminate the backoff exactly like the Spark
        # scorer's coalesce stops at a non-null 0
        t = tri.get(key)
        if t is None:
            t = bi23.get(b)
        if t is None:
            t = uni[toks[j + 2]]
        s += t
    return n, s // n


def test_scores_match_python_replay(spark):
    docs = spark.createDataFrame(
        [
            (1, "Data point alpha; data point beta. Data point alpha!"),
            (2, "zzz qqq unseen words drive the unigram backoff tier"),
            (3, "hi"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_trigrams, r.lm_score_micro, r.ppl_bucket)
        for r in lm_perplexity_scores(docs).collect()
    }
    assert len(got) == 4  # token-poor docs keep their zero-fill row
    for i, text in [(1, "Data point alpha; data point beta. Data point alpha!"),
                    (2, "zzz qqq unseen words drive the unigram backoff tier"),
                    (3, "hi"), (4, "")]:
        n, s = _py_score(text)
        assert got[i][:2] == (n, s), (i, got[i], (n, s))
    assert got[3] == (0, 0, "tail") and got[4] == (0, 0, "tail")


def test_bucket_thresholds_are_committed_tertiles(spark):
    """Applied to its own TRAINING corpus (sf0.01 — sf0.001's docs are
    a different draw and score out-of-domain low, all-tail) the
    committed split puts a nonzero share of docs in every bucket
    (tertiles by construction, modulo score ties)."""
    from big_data_song_recommendation_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    counts = {
        r.ppl_bucket: r.n
        for r in lm_perplexity_scores(docs)
        .groupBy("ppl_bucket")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(counts) == {"head", "middle", "tail"}
    assert LMC.LM_HEAD_MIN_MICRO > LMC.LM_MID_MIN_MICRO > 0


def test_front_door_lm_stage_filters_tail(spark):
    from big_data_song_recommendation_spark.operators.quality import (
        crawl_front_door,
    )

    mid = " ".join(
        k for k, _ in sorted(LMC.LM_TRI.items(), key=lambda t: -t[1])[:6]
    )
    html = (
        f"<html><body><p>{mid} and plenty of ordinary readable words.</p>"
        "<p>And a second clean line for the keep gate.</p></body></html>"
    )
    df = spark.createDataFrame(
        [(1, html)], "doc_id long, html string"
    )
    kept = crawl_front_door(df, lm_buckets=("head", "middle", "tail"))
    assert kept.count() == 1 and "ppl_bucket" in kept.columns
    none = crawl_front_door(df, lm_buckets=())
    assert none.count() == 0
