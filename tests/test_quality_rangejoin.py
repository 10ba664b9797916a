"""Round-2 curation operators: interval_join, repetition_metrics,
decontaminate, stratified_sample — behavior + scale-shape contracts."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_song_recommendation_spark.operators.quality import (
    decontaminate,
    repetition_metrics,
    stratified_sample,
)
from big_data_song_recommendation_spark.operators.rangejoin import interval_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# interval_join
# ---------------------------------------------------------------------------

def _points(spark):
    return spark.createDataFrame(
        [
            Row(pid=1, ts=_ts("2024-01-01 10:00:00")),  # == start: in
            Row(pid=2, ts=_ts("2024-01-01 10:59:59")),  # inside
            Row(pid=3, ts=_ts("2024-01-01 11:00:00")),  # == end: excluded
            Row(pid=4, ts=_ts("2024-01-01 09:59:59")),  # before
            Row(pid=5, ts=_ts("2024-01-01 10:30:00")),  # inside, crosses
        ]
    )


def _intervals(spark):
    return spark.createDataFrame(
        [
            Row(wid=100, start=_ts("2024-01-01 10:00:00"), end=_ts("2024-01-01 11:00:00")),
            # a second window straddling an hour-bucket boundary
            Row(wid=200, start=_ts("2024-01-01 10:30:00"), end=_ts("2024-01-01 11:30:00")),
        ]
    )


def test_interval_join_boundary_semantics(spark):
    out = interval_join(
        _points(spark), _intervals(spark), point_ts="ts", bucket_seconds=3600
    )
    got = {(r.pid, r.wid) for r in out.collect()}
    assert got == {(1, 100), (2, 100), (5, 100), (2, 200), (5, 200), (3, 200)}


def test_interval_join_end_inclusive(spark):
    out = interval_join(
        _points(spark),
        _intervals(spark),
        point_ts="ts",
        bucket_seconds=3600,
        end_exclusive=False,
    )
    got = {(r.pid, r.wid) for r in out.collect()}
    # pid=3 at exactly 11:00 now matches window 100 too
    assert (3, 100) in got


def test_interval_join_no_duplicate_candidates(spark):
    """A point inside an interval that spans two buckets must join
    exactly once (points bucket uniquely; only intervals explode)."""
    out = interval_join(
        _points(spark), _intervals(spark), point_ts="ts", bucket_seconds=3600
    )
    pairs = [(r.pid, r.wid) for r in out.collect()]
    assert len(pairs) == len(set(pairs))


def test_interval_join_rejects_oversized_interval(spark):
    bad = interval_join(
        _points(spark), _intervals(spark), point_ts="ts", bucket_seconds=60
    )
    with pytest.raises(Exception, match="interval_join|USER_RAISED"):
        bad.collect()


def test_interval_join_plans_equi_join_not_nested_loop(spark):
    """The whole point of the operator: the physical plan must be a
    hash/broadcast EQUI-join on the bucket, never a nested loop over
    |points| x |intervals|."""
    out = interval_join(
        _points(spark), _intervals(spark), point_ts="ts", bucket_seconds=3600
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_long_intervals_opt_in(spark):
    """allow_long_intervals=True: an interval spanning many buckets
    still joins correctly (sequence enumerates every bucket) — the
    default guard is a fan-out cost cap, not a correctness bound."""
    out = interval_join(
        _points(spark),
        _intervals(spark),
        point_ts="ts",
        bucket_seconds=60,  # far smaller than the 1h intervals
        allow_long_intervals=True,
    )
    got = {(r.pid, r.wid) for r in out.collect()}
    assert got == {(1, 100), (2, 100), (5, 100), (2, 200), (5, 200), (3, 200)}


def test_interval_join_survives_caller_bucket_column(spark):
    """A caller column literally named __bucket must survive the join
    untouched (the temp key is generated collision-free)."""
    pts = _points(spark).withColumn("__bucket", F.lit("keep-me"))
    out = interval_join(pts, _intervals(spark), point_ts="ts", bucket_seconds=3600)
    rows = out.collect()
    assert "__bucket" in out.columns
    assert {r["__bucket"] for r in rows} == {"keep-me"}
    assert {(r.pid, r.wid) for r in rows} == {
        (1, 100), (2, 100), (5, 100), (2, 200), (5, 200), (3, 200)
    }


# ---------------------------------------------------------------------------
# repetition_metrics
# ---------------------------------------------------------------------------

def test_repetition_metrics_flags_loops(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam ham spam ham spam ham spam ham"),
            Row(
                doc_id=2,
                text=(
                    "the quick brown fox jumps over a lazy dog while "
                    "seven wizards brew strange potions near ancient oaks"
                ),
            ),
        ]
    )
    rows = {r.doc_id: r for r in repetition_metrics(docs).collect()}

    r1 = rows[1]
    assert r1.n_tokens == 8
    # "spam ham" occurs 4x in 7 bigrams; covers 8/8 tokens
    assert r1.top_bigram == "spam ham"
    assert r1.top_bigram_frac == 1.0
    assert r1.distinct_ratio == 0.25
    assert bool(r1.repetitive) is True

    r2 = rows[2]
    assert r2.distinct_ratio == 1.0
    assert bool(r2.repetitive) is False


def test_repetition_metrics_single_token_doc(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="word")])
    r = repetition_metrics(docs).collect()[0]
    assert r.n_tokens == 1
    assert r.top_bigram is None
    assert r.top_bigram_frac == 0.0
    # distinct_ratio 1.0 and no bigram: still clean
    assert bool(r.repetitive) is False


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------

def test_decontaminate_flags_shared_5grams(spark):
    bench = spark.createDataFrame(
        [Row(doc_id=100, text="alpha beta gamma delta epsilon zeta")]
    )
    corpus = spark.createDataFrame(
        [
            # contains "alpha beta gamma delta epsilon" (and one more)
            Row(doc_id=1, text="intro alpha beta gamma delta epsilon zeta end"),
            Row(doc_id=2, text="totally unrelated words about something else here"),
        ]
    )
    out = {r.doc_id: r for r in decontaminate(corpus, bench, k=5).collect()}
    assert set(out) == {1}
    # the benchmark doc has exactly 2 distinct 5-grams, both of which
    # appear as windows inside doc 1's longer sentence
    assert out[1].n_overlap == 2
    assert out[1].n_bench_docs == 1


def test_decontaminate_min_overlap_threshold(spark):
    bench = spark.createDataFrame(
        [Row(doc_id=100, text="alpha beta gamma delta epsilon zeta")]
    )
    corpus = spark.createDataFrame(
        [Row(doc_id=1, text="intro alpha beta gamma delta epsilon zeta end")]
    )
    assert decontaminate(corpus, bench, k=5, min_overlap=3).count() == 0


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------

def test_stratified_sample_deterministic_and_partition_invariant(spark):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("zh")
        .alias("lang"),
    )
    frac = {"en": 0.5, "de": 0.1}
    a = stratified_sample(docs, "lang", "doc_id", frac, default_fraction=0.0)
    b = stratified_sample(
        docs.repartition(13), "lang", "doc_id", frac, default_fraction=0.0
    )
    ids_a = sorted(r.doc_id for r in a.collect())
    ids_b = sorted(r.doc_id for r in b.collect())
    assert ids_a == ids_b and len(ids_a) > 0

    by_lang = {
        r.lang: r.n
        for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert "zh" not in by_lang  # default fraction 0
    # ~667 per stratum; md5 buckets give ~50% / ~10% within wide bounds
    assert 250 < by_lang["en"] < 420
    assert 30 < by_lang["de"] < 110


def test_stratified_sample_no_shuffle(spark):
    docs = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    out = stratified_sample(docs, "lang", "doc_id", {"en": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bigram_lm_scores_rank_probable_above_gibberish(spark):
    from big_data_song_recommendation_spark.operators.quality import (
        bigram_lm_scores,
    )

    # docs 1-3 share the same high-frequency transitions; doc 4 is a
    # one-off permutation whose bigrams appear nowhere else
    common = "the cat sat on the mat"
    rows = [(1, common), (2, common), (3, common), (4, "mat the on sat cat the")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in bigram_lm_scores(df, "doc_id", "text").collect()}
    assert out[1]["avg_logp"] == out[2]["avg_logp"] == out[3]["avg_logp"]
    assert out[4]["avg_logp"] < out[1]["avg_logp"]
    assert out[1]["n_bigrams"] == 5


def test_bigram_lm_scores_smoothing_keeps_probs_finite(spark):
    from big_data_song_recommendation_spark.operators.quality import (
        bigram_lm_scores,
    )

    # a single-doc corpus: every bigram is unique, add-k must keep
    # logp finite and negative
    df = spark.createDataFrame([(1, "alpha beta gamma delta")], ["doc_id", "text"])
    [row] = bigram_lm_scores(df, "doc_id", "text", add_k=0.5).collect()
    assert row["n_bigrams"] == 3
    assert row["avg_logp"] < 0.0
    assert row["avg_logp"] > -60.0


def test_weighted_sample_bias_determinism_partition_invariance(spark):
    from big_data_song_recommendation_spark.operators.quality import (
        weighted_sample,
    )

    # 100 light items (w=1) + 10 heavy (w=50): a k=10 weighted draw
    # should pick mostly heavy items, on average over seeds
    rows = [("s", i, 1.0) for i in range(100)] + [
        ("s", 1000 + i, 50.0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["g", "id", "w"])
    heavy_hits = 0
    for seed in ("a", "b", "c"):
        got = weighted_sample(df, "g", "id", "w", k=10, seed=seed)
        ids = [r["id"] for r in got.collect()]
        assert len(ids) == 10
        heavy_hits += sum(1 for i in ids if i >= 1000)
    # E[heavy] ≈ 7-8/10 per draw; 3 draws ≥ 15 is a loose floor
    assert heavy_hits >= 15

    # deterministic + layout-invariant: same sample from any partitioning
    a = sorted(r["id"] for r in weighted_sample(df, "g", "id", "w", k=10).collect())
    b = sorted(
        r["id"]
        for r in weighted_sample(df.repartition(13), "g", "id", "w", k=10).collect()
    )
    assert a == b


def test_pack_sequences_budget_boundaries(spark):
    from big_data_song_recommendation_spark.operators.quality import (
        pack_sequences,
    )

    # budget 10; cumulative starts: 0,6,12,19,21 -> packs 0,0,1,1,2
    rows = [("s", 1, 6), ("s", 2, 6), ("s", 3, 7), ("s", 4, 2), ("s", 5, 3)]
    df = spark.createDataFrame(rows, ["g", "doc_id", "n"])
    out = {r["doc_id"]: r["pack_id"] for r in
           pack_sequences(df, "g", "doc_id", "n", budget=10).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 2}


def test_group_split_no_leakage_and_proportions(spark):
    from big_data_song_recommendation_spark.operators.quality import (
        group_split,
    )

    # 5000 rows over 1000 groups, 5 rows each: every group must land
    # wholly in one split, and fractions should be near 80/10/10
    df = spark.range(5000).selectExpr("id % 1000 AS g", "id AS row_id")
    out = group_split(df, "g")
    per_group = (
        out.groupBy("g").agg(F.countDistinct("split").alias("ns")).collect()
    )
    assert all(r["ns"] == 1 for r in per_group)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "valid", "test"}
    assert 0.7 < counts["train"] / 5000 < 0.9
    assert 0.05 < counts["valid"] / 5000 < 0.16
    assert 0.05 < counts["test"] / 5000 < 0.16

    # deterministic: same assignment under any partitioning
    a = {(r["g"], r["split"]) for r in out.select("g", "split").distinct().collect()}
    b = {(r["g"], r["split"]) for r in
         group_split(df.repartition(17), "g").select("g", "split").distinct().collect()}
    assert a == b


def test_group_split_rejects_bad_fractions(spark):
    from big_data_song_recommendation_spark.operators.quality import (
        group_split,
    )

    df = spark.range(10).selectExpr("id AS g")
    with pytest.raises(ValueError):
        group_split(df, "g", fractions={"a": 0.5, "b": 0.2})


def test_dsir_scores_prefer_target_like_docs(spark):
    """DSIR selection: docs sharing the target's n-gram profile must
    outscore off-domain docs; weights are integer-exact and
    partitioning-invariant (the engine's determinism contract)."""
    from big_data_song_recommendation_spark.operators.quality import (
        dsir_scores,
    )

    med = "the patient presented with acute symptoms and the doctor"
    web = "click here to win a free prize now and buy cheap deals"
    rows = []
    for i in range(40):  # target domain: medical
        rows.append(Row(doc_id=i, kind="med", text=f"{med} case {i}"))
    for i in range(40, 80):  # raw-only domain: spam
        rows.append(Row(doc_id=i, kind="web", text=f"{web} offer {i}"))
    # candidates: one med-like, one web-like, both UNLABELED
    rows.append(Row(doc_id=100, kind="cand", text=f"{med} followup"))
    rows.append(Row(doc_id=101, kind="cand", text=f"{web} voucher"))
    df = spark.createDataFrame(rows)

    scored = dsir_scores(
        df, F.col("kind") == "med", carry_cols=["kind"], n_buckets=64
    )
    w = {r["doc_id"]: r["weight_pt"] for r in scored.collect()}
    assert w[100] > w[101], f"med candidate must outscore spam: {w[100]} vs {w[101]}"
    assert all(isinstance(v, int) for v in w.values())

    w2 = {
        r["doc_id"]: r["weight_pt"]
        for r in dsir_scores(
            df.repartition(13), F.col("kind") == "med",
            carry_cols=["kind"], n_buckets=64,
        ).collect()
    }
    assert w == w2, "weights must be partitioning-invariant"
