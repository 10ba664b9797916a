"""HLL sketch rollup tables (operators/sketches.py): bounded error vs
exact, and the mergeability algebra that makes pre-aggregated sketch
tables sound (union of per-grain state == state of the union)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_song_recommendation_spark.operators import sketches
from big_data_song_recommendation_spark.sources.readers import load_table

from .conftest import SF_DIR


def test_rollup_error_bounded(spark):
    ev = load_table(spark, SF_DIR, "events").withColumn("day", F.to_date("ts"))
    daily = sketches.sketch_rollup(ev, ["day", "event_type"], "user_id")
    # coarser grain via union of stored sketches
    per_type = sketches.rollup_distinct(daily, ["event_type"]).collect()
    exact = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert per_type
    for r in per_type:
        e = exact[r["event_type"]]
        assert abs(r["approx_distinct"] - e) / e < 0.05, (r, e)


def test_union_of_grains_equals_sketch_of_union(spark):
    """estimate(union(per-day sketches)) must EXACTLY equal
    estimate(one sketch over all rows): HLL state union is lossless
    for same-lg_k sketches, which is what makes incremental rollup
    refresh correct (not merely approximately correct)."""
    ev = load_table(spark, SF_DIR, "events").withColumn("day", F.to_date("ts"))
    daily = sketches.sketch_rollup(ev, ["day"], "user_id")
    merged = sketches.rollup_distinct(daily, []).first()["approx_distinct"]
    direct = ev.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(sketches.DEFAULT_LG_K))
        ).alias("d")
    ).first()["d"]
    assert merged == direct
    # and row counts carry through the rollup
    assert (
        sketches.rollup_distinct(daily, []).first()["n_rows"] == ev.count()
    )


def test_rollup_is_single_shuffle(spark):
    ev = load_table(spark, SF_DIR, "events")
    plan = (
        sketches.sketch_rollup(ev, ["event_type"], "user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1  # map-side combined


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def _stream(spark, items):
    return spark.createDataFrame([(i,) for i in items], "item string")


def test_cms_never_undercounts(spark):
    from big_data_song_recommendation_spark.operators.sketches import (
        CMSParams,
        cms_counters,
        cms_estimate,
    )

    items = [f"u{i % 37}" for i in range(500)] + ["hot"] * 60
    df = _stream(spark, items)
    cms = CMSParams(depth=4, width=64)
    counters = cms_counters(df, "item", params=cms)
    exact = df.groupBy("item").count().withColumnRenamed("count", "exact")
    est = cms_estimate(exact, counters, "item", params=cms)
    rows = est.collect()
    assert rows and all(r["est"] >= r["exact"] for r in rows)
    hot = [r for r in rows if r["item"] == "hot"][0]
    # width 64 over 560 rows: the hot key's estimate stays near exact
    assert hot["exact"] == 60 and hot["est"] - hot["exact"] <= 2 * 560 // 64


def test_cms_state_is_bounded(spark):
    from big_data_song_recommendation_spark.operators.sketches import (
        CMSParams,
        cms_counters,
    )

    df = _stream(spark, [f"k{i}" for i in range(5000)])
    counters = cms_counters(df, "item", params=CMSParams(depth=3, width=32))
    assert counters.count() <= 3 * 32


def test_cms_merge_is_sum(spark):
    """Sketches of two partitions summed cell-wise equal the sketch of
    the union — the incremental-refresh contract."""
    from pyspark.sql import functions as F

    from big_data_song_recommendation_spark.operators.sketches import (
        CMSParams,
        cms_counters,
    )

    a = [f"x{i % 11}" for i in range(200)]
    b = [f"x{i % 7}" for i in range(150)]
    cms = CMSParams(depth=3, width=32)
    whole = cms_counters(_stream(spark, a + b), "item", params=cms)
    merged = (
        cms_counters(_stream(spark, a), "item", params=cms)
        .unionByName(cms_counters(_stream(spark, b), "item", params=cms))
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    w = {(r.j, r.bucket): r.cnt for r in whole.collect()}
    m = {(r.j, r.bucket): r.cnt for r in merged.collect()}
    assert w == m


def test_cms_absent_item_estimates_colliders_only(spark):
    from big_data_song_recommendation_spark.operators.sketches import (
        CMSParams,
        cms_counters,
        cms_estimate,
    )

    df = _stream(spark, ["a"] * 10)
    counters = cms_counters(df, "item", params=CMSParams())
    probe = _stream(spark, ["never-seen"])
    est = cms_estimate(probe, counters, "item", params=CMSParams()).head()
    # wide sketch, one distinct key: overwhelmingly likely some row
    # misses → min = 0; in any case never above the stream total
    assert 0 <= est["est"] <= 10


def test_kmv_exact_below_k(spark):
    """A sketch smaller than k holds every distinct hash — the
    estimate must be EXACT."""
    from pyspark.sql import functions as F

    from big_data_song_recommendation_spark.operators.sketches import (
        kmv_distinct_estimate,
        kmv_sketch,
    )

    df = _stream(spark, [f"v{i % 20}" for i in range(300)])
    sk = kmv_sketch(df, "item", k=64)
    agg = sk.agg(F.count("*").alias("n"), F.max("h").alias("hk"))
    got = agg.select(
        kmv_distinct_estimate(F.col("n"), F.col("hk"), k=64).alias("e")
    ).head()["e"]
    assert got == 20.0


def test_kmv_estimate_within_4_sigma(spark):
    from pyspark.sql import functions as F

    from big_data_song_recommendation_spark.operators.sketches import (
        kmv_distinct_estimate,
        kmv_sketch,
    )

    n = 5000
    df = _stream(spark, [f"v{i}" for i in range(n)])
    sk = kmv_sketch(df, "item", k=64)
    agg = sk.agg(F.count("*").alias("n"), F.max("h").alias("hk"))
    got = agg.select(
        kmv_distinct_estimate(F.col("n"), F.col("hk"), k=64).alias("e")
    ).head()["e"]
    assert abs(got - n) / n < 4 / (63**0.5)  # ~50%


def test_kmv_sharded_equals_global_rank(spark):
    """The two-phase sharded k-min must equal a naive global k-min —
    sharding is a parallelism trick, not an approximation."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from big_data_song_recommendation_spark.operators.dedup import hash60
    from big_data_song_recommendation_spark.operators.sketches import (
        kmv_sketch,
    )

    df = _stream(spark, [f"v{i}" for i in range(1000)])
    got = {
        r["h"]
        for r in kmv_sketch(df, "item", k=32, shards=8).collect()
    }
    naive = (
        df.select(hash60(F.col("item").cast("string"), "kmv").alias("h"))
        .distinct()
        .withColumn("r", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("r") <= 32)
    )
    assert got == {r["h"] for r in naive.collect()}


def test_kmv_union_bound_and_grouping(spark):
    """Grouped sketches stay bounded at k rows per group."""
    from big_data_song_recommendation_spark.operators.sketches import (
        kmv_sketch,
    )

    rows = [("a", f"x{i}") for i in range(500)] + [
        ("b", f"y{i}") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "grp string, item string")
    sk = kmv_sketch(df, "item", group=["grp"], k=16)
    counts = {r["grp"]: r["n"] for r in sk.groupBy("grp").agg(
        F.count("*").alias("n")
    ).collect()}
    assert counts == {"a": 16, "b": 10}


def test_bloom_no_false_negatives(spark):
    from big_data_song_recommendation_spark.operators.sketches import (
        BloomParams,
        bloom_bits,
        bloom_probe,
    )

    bp = BloomParams(m_bits=1 << 12, k_hashes=4)
    df = _stream(spark, [f"k{i}" for i in range(500)])
    bits = bloom_bits(df, "item", params=bp)
    got = bloom_probe(df.distinct(), bits, "item", params=bp).collect()
    assert len(got) == 500 and all(r["maybe_member"] for r in got)


def test_bloom_absent_keys_mostly_rejected(spark):
    from big_data_song_recommendation_spark.operators.sketches import (
        BloomParams,
        bloom_bits,
        bloom_probe,
    )

    bp = BloomParams(m_bits=1 << 16, k_hashes=4)
    bits = bloom_bits(_stream(spark, [f"k{i}" for i in range(200)]), "item",
                      params=bp)
    probe = _stream(spark, [f"absent{i}" for i in range(500)])
    fp = sum(
        r["maybe_member"]
        for r in bloom_probe(probe, bits, "item", params=bp).collect()
    )
    # n/m tiny -> p ~ (200*4/65536)^4; allow generous slack
    assert fp <= 2


def test_bloom_state_bounded_and_mergeable(spark):
    from pyspark.sql import functions as F

    from big_data_song_recommendation_spark.operators.sketches import (
        BloomParams,
        bloom_bits,
    )

    bp = BloomParams(m_bits=64, k_hashes=3)
    a = _stream(spark, [f"a{i}" for i in range(300)])
    b = _stream(spark, [f"b{i}" for i in range(300)])
    whole = bloom_bits(_stream(spark, [f"a{i}" for i in range(300)]
                               + [f"b{i}" for i in range(300)]), "item",
                       params=bp)
    merged = (
        bloom_bits(a, "item", params=bp)
        .unionByName(bloom_bits(b, "item", params=bp))
        .distinct()
    )
    assert whole.count() <= 64
    got = {r["bit"] for r in merged.collect()}
    want = {r["bit"] for r in whole.collect()}
    assert got == want  # union of filters == filter of union


def test_bloom_duplicate_probe_rows_keep_verdicts(spark):
    """ADVICE r7: a member probed twice must report maybe_member=True
    on BOTH rows (the old carry-grain groupBy merged the duplicates,
    overshooting the matched-bit count into a false negative) and
    output multiplicity must match input."""
    from big_data_song_recommendation_spark.operators.sketches import (
        BloomParams,
        bloom_bits,
        bloom_probe,
    )

    bp = BloomParams(m_bits=1 << 12, k_hashes=4)
    bits = bloom_bits(_stream(spark, [f"k{i}" for i in range(50)]), "item",
                      params=bp)
    probe = _stream(spark, ["k7", "k7", "k7", "absent-key", "absent-key"])
    got = bloom_probe(probe, bits, "item", params=bp).collect()
    assert len(got) == 5
    verdicts = sorted((r["item"], bool(r["maybe_member"])) for r in got)
    assert [v for i, v in verdicts if i == "k7"] == [True, True, True]


def test_cms_duplicate_item_rows_keep_multiplicity(spark):
    """ADVICE r7: cms_estimate output multiplicity matches the items
    input — duplicate probe rows each get their own (equal) row."""
    from big_data_song_recommendation_spark.operators.sketches import (
        CMSParams,
        cms_counters,
        cms_estimate,
    )

    cms = CMSParams(depth=4, width=64)
    counters = cms_counters(_stream(spark, ["a"] * 7 + ["b"] * 3), "item",
                            params=cms)
    probe = _stream(spark, ["a", "a", "b"])
    rows = cms_estimate(probe, counters, "item", params=cms).collect()
    assert len(rows) == 3
    ests = sorted((r["item"], r["est"]) for r in rows)
    assert ests[0] == ests[1] == ("a", ests[0][1]) and ests[0][1] >= 7


# -- bottom-k quantile sketch (round-8, the 5th family member) --------------

def test_bottomk_sample_mergeable(spark):
    """The union rule: bottom-k of (bottom-k(A) ∪ bottom-k(B)) must
    equal bottom-k(A ∪ B) — the property that makes the sample a
    SKETCH (per-partition/day sketches merge without re-scanning)."""
    from big_data_song_recommendation_spark.operators.sketches import (
        bottomk_sample,
    )

    rows = [(i, "g", float(i * 7 % 101)) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, g string, v double")
    a, b = df.filter("k < 200"), df.filter("k >= 200")
    direct = bottomk_sample(df, "k", group=["g"], k=32)
    merged = bottomk_sample(
        bottomk_sample(a, "k", group=["g"], k=32).drop("rnk").unionByName(
            bottomk_sample(b, "k", group=["g"], k=32).drop("rnk")
        ),
        "k",
        group=["g"],
        k=32,
    )
    got = sorted((r["k"], r["rnk"]) for r in merged.collect())
    want = sorted((r["k"], r["rnk"]) for r in direct.collect())
    assert got == want and len(want) == 32


def test_bottomk_sample_bounds_and_carry(spark):
    from big_data_song_recommendation_spark.operators.sketches import (
        bottomk_sample,
    )

    rows = [(i, "g%d" % (i % 3), float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, g string, v double")
    out = bottomk_sample(df, "k", group=["g"], k=10).collect()
    per = {}
    for r in out:
        per.setdefault(r["g"], []).append(r)
        assert {"k", "g", "v", "rnk"} <= set(r.asDict())
    assert all(len(v) == 10 for v in per.values())
    # deterministic: second run identical
    again = bottomk_sample(df, "k", group=["g"], k=10).collect()
    assert sorted(map(str, out)) == sorted(map(str, again))


def test_weighted_quantiles_matches_single(spark):
    from big_data_song_recommendation_spark.operators.ranks import (
        weighted_quantile,
        weighted_quantiles,
    )

    rows = [("a", float(v), w) for v, w in
            [(1, 3), (2, 1), (5, 4), (9, 2)]] + [
           ("b", float(v), 1) for v in range(1, 8)]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    multi = {
        r["g"]: (r["p25"], r["p50"], r["p75"])
        for r in weighted_quantiles(
            df, "v", "w", group=["g"],
            qs=[(1, 4, "p25"), (1, 2, "p50"), (3, 4, "p75")],
        ).collect()
    }
    for num, den, i in ((1, 4, 0), (1, 2, 1), (3, 4, 2)):
        single = {
            r["g"]: r["q"]
            for r in weighted_quantile(
                df, "v", "w", group=["g"], q_num=num, q_den=den, out="q"
            ).collect()
        }
        for g in ("a", "b"):
            assert multi[g][i] == single[g], (g, num, den)


def test_hh_summary_and_merge_guarantees(spark):
    """The determinized Misra-Gries contract: per-epoch reported
    counts are EXACT, unreported keys are bounded by the shard
    threshold, the merge under-counts by at most the absent-side
    thresholds and its threshold still bounds every unreported key,
    and state never exceeds shards*k rows."""
    from pyspark.sql import functions as F

    from big_data_song_recommendation_spark.operators.sketches import (
        HHParams,
        hh_merge,
        hh_summary,
    )

    # zipf-ish deterministic stream: key i appears 60//(i+1)+1 times,
    # split into two epochs by parity of a running index
    rows = [
        (j * 37 % 2, f"k{i:02d}")
        for i in range(30)
        for j in range(60 // (i + 1) + 1)
    ]
    df = spark.createDataFrame(rows, "epoch int, key string")
    P = HHParams(k=3, shards=2, seed="t")
    sa = hh_summary(df.filter("epoch = 0"), "key", params=P)
    sb = hh_summary(df.filter("epoch = 1"), "key", params=P)
    m = hh_merge(sa, sb, params=P).persist()
    try:
        assert sa.count() <= P.shards * P.k and m.count() <= P.shards * P.k
        exact = {
            r["key"]: r["n"]
            for r in df.groupBy("key").agg(F.count("*").alias("n")).collect()
        }
        ea = {
            r["key"]: r["n"]
            for r in df.filter("epoch = 0")
            .groupBy("key")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        # per-epoch: reported counts exact; unreported bounded by thr
        thr_a = {}
        for r in sa.collect():
            assert r["cnt"] == ea[r["key"]], r
            thr_a[r["shard"]] = r["thr"]
        merged = {r["key"]: r for r in m.collect()}
        thr_m = {r["shard"]: r["thr"] for r in m.collect()}
        for k, r in merged.items():
            assert r["cnt"] <= exact[k] <= r["cnt"] + r["err"], (k, r)
        # completeness: every unreported key bounded by its shard thr
        from big_data_song_recommendation_spark.operators.dedup import hash60

        shards = {
            r["key"]: r["s"]
            for r in spark.createDataFrame(
                [(k,) for k in exact], "key string"
            )
            .select("key", (hash60(F.col("key"), "t") % 2).alias("s"))
            .collect()
        }
        for k, n in exact.items():
            if k not in merged:
                assert n <= thr_m[shards[k]], (k, n, thr_m)
    finally:
        m.unpersist()


def test_quantile_summary_merge_rank_bound(spark):
    """The mergeable-quantile contract: each epoch summary is at most
    k rows with exact boundary ranks (last row at rank n), and every
    merged estimate's true rank is within the additive
    ceil(n_a/k)+ceil(n_b/k) bound of its target."""
    import math

    from pyspark.sql import functions as F

    from big_data_song_recommendation_spark.operators.sketches import (
        quantile_merge_estimate,
        quantile_summary,
    )

    # deterministic skewed values: i^2 % 9973, two epochs by parity
    rows = [(i % 2, float((i * i) % 9973)) for i in range(2000)]
    df = spark.createDataFrame(rows, "epoch int, v double")
    k = 8
    sa = quantile_summary(df.filter("epoch = 0"), "v", k=k)
    sb = quantile_summary(df.filter("epoch = 1"), "v", k=k)
    ra = sa.collect()
    assert len(ra) <= k
    assert max(r["r"] for r in ra) == 1000  # last boundary rank == n
    ests = quantile_merge_estimate([sa, sb], [10, 50, 99]).collect()
    vals = sorted(v for _, v in rows)
    slack = 2 * math.ceil(1000 / k)
    for r in ests:
        le = sum(1 for v in vals if v <= r["est"])
        lt = sum(1 for v in vals if v < r["est"])
        assert le >= r["target"] - slack and lt + 1 <= r["target"] + slack, r
