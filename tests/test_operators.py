"""Unit tests for the operator layer on dirty in-memory data — the
FIXTURES.md §A dirty-data cases (nulls, NaN, ±inf, "", "NULL",
duplicate ids, null keys)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_song_recommendation_spark.operators import aggregates, clean, joins


def _dirty_tracks(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), True),
            T.StructField("name", T.StringType(), True),
            T.StructField("tempo", T.DoubleType(), True),
            T.StructField("popularity", T.StringType(), True),
        ]
    )
    rows = [
        ("t1", "Song A", 120.0, "50"),
        ("t1", "Song A dup", 130.0, "60"),
        ("t2", "", float("nan"), "NULL"),
        ("t3", "NULL", float("inf"), "not_a_number"),
        (None, "no id", 99.0, "10"),
        ("t4", "Song D", None, ""),
    ]
    return spark.createDataFrame(rows, schema)


def test_try_cast_columns(spark):
    df = clean.try_cast_columns(_dirty_tracks(spark), {"popularity": "double"})
    vals = {r["id"]: r["popularity"] for r in df.collect()}
    assert vals["t3"] is None  # cast failure → null, no exception
    assert vals["t4"] is None or vals["t4"] == ""  # empty string → null
    assert vals["t2"] is None  # "NULL" sentinel not a number
    assert vals["t1"] in (50.0, 60.0)


def test_clean_defaults(spark):
    df = clean.try_cast_columns(_dirty_tracks(spark), {"popularity": "double"})
    df = clean.clean(df, {"tempo": 120.0, "popularity": 0.0, "name": "unknown"})
    rows = {r["id"]: r for r in df.collect()}
    assert rows["t2"]["tempo"] == 120.0  # NaN → default
    assert rows["t3"]["tempo"] == 120.0  # inf → default
    assert rows["t4"]["tempo"] == 120.0  # null → default
    assert rows["t2"]["name"] == "unknown"  # "" sentinel
    assert rows["t3"]["name"] == "unknown"  # "NULL" sentinel
    assert rows["t3"]["popularity"] == 0.0
    assert rows["t1"]["tempo"] in (120.0, 130.0)  # untouched real values


def test_drop_invalid_and_keep_first(spark):
    df = clean.try_cast_columns(_dirty_tracks(spark), {"popularity": "double"})
    df = clean.drop_invalid(df, ["id", "tempo"])
    ids = [r["id"] for r in df.collect()]
    assert None not in ids and "t2" not in ids and "t4" not in ids

    first = clean.keep_first_by(_dirty_tracks(spark), ["id"], ["name"])
    names = {r["id"]: r["name"] for r in first.collect()}
    assert names["t1"] == "Song A"  # deterministic winner


def test_fuzzy_lookup_join(spark):
    tracks = spark.createDataFrame(
        [("1", "Bohemian Rhapsody"), ("2", "bohemian"), ("3", "Unknown Tune"),
         ("4", "YELLOW SUBMARINE  ")],
        ["id", "song_name"],
    )
    emotions = spark.createDataFrame(
        [("Bohemian Rhapsody", "epic"), ("Yellow Submarine", "happy")],
        ["song", "emotion"],
    )
    out = joins.fuzzy_lookup_join(
        tracks, emotions, "song_name", "song", "emotion",
        fallback=F.lit("neutral"),
    )
    got = {r["id"]: (r["emotion"], r["emotion_match_tier"]) for r in out.collect()}
    assert got["1"] == ("epic", "exact")
    assert got["4"] == ("happy", "exact")  # trim+lower normalization
    assert got["2"] == ("epic", "contains")  # substring tier
    assert got["3"] == ("neutral", "fallback")
    assert out.count() == 4  # no fan-out from multi-match


def test_argmax_and_topk_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 5, "y"), ("b", 3, "z"), ("b", 2, "w")],
        ["grp", "score", "payload"],
    )
    am = {r["grp"]: (r["max_score"], r["payload"])
          for r in aggregates.argmax_per_group(df, ["grp"], "score", ["payload"]).collect()}
    assert am == {"a": (5, "y"), "b": (3, "z")}

    tk = aggregates.top_k_per_group(
        df, ["grp"], [F.desc("score"), F.asc("payload")], 1
    )
    assert {r["payload"] for r in tk.collect()} == {"y", "z"}


def test_positional_join(spark):
    left = spark.createDataFrame([(i,) for i in range(5)], ["l"])
    right = spark.createDataFrame([(i * 10,) for i in range(5)], ["r"])
    out = joins.positional_join(left, right).collect()
    assert len(out) == 5


def test_positional_join_multi_partition_no_global_sort(spark):
    """The scale contract for J6: positions come from partition-offset
    arithmetic, so pairing is exact across many partitions and the
    plan contains NO single-partition Exchange (the old global
    Window.orderBy(mid) form pulled the full dataset onto one task)."""
    left = spark.range(0, 1000, 1, 8).select(F.col("id").alias("l"))
    right = spark.range(0, 1000, 1, 8).select((F.col("id") * 10).alias("r"))
    joined = joins.positional_join(left, right)
    rows = joined.collect()
    assert len(rows) == 1000
    assert all(r["r"] == r["l"] * 10 for r in rows), "position pairing exact"
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_with_position_layout_properties(spark, tmp_path):
    """_with_position contract (docstring): bijection onto 1..N under
    EVERY layout; exact row->pos reproducibility on deterministic
    layouts (file scan, repartition); file-order agreement on the
    natural scan."""
    import pandas as pd

    pdf = pd.DataFrame({"k": range(97), "v": [f"r{i:03d}" for i in range(97)]})
    path = str(tmp_path / "pos.parquet")
    pdf.to_parquet(path, index=False)
    scan = spark.read.parquet(path)

    layouts = {
        "scan": scan,
        "repartition_5": scan.repartition(5),
        "repartition_1": scan.repartition(1),
        "coalesce_2": scan.repartition(6).coalesce(2),
    }
    for name, df in layouts.items():
        out = joins._with_position(df).collect()
        # bijection onto 1..N, values intact
        assert sorted(r["__pos"] for r in out) == list(range(1, 98)), name
        assert {r["v"] for r in out} == set(pdf["v"]), name

    # deterministic layouts: same mapping on re-evaluation
    for name in ("scan", "repartition_5"):
        a = {r["v"]: r["__pos"] for r in joins._with_position(layouts[name]).collect()}
        b = {r["v"]: r["__pos"] for r in joins._with_position(layouts[name]).collect()}
        assert a == b, f"{name}: mapping not reproducible"

    # natural scan follows file row order exactly
    got = joins._with_position(scan).orderBy("__pos").select("v").collect()
    assert [r["v"] for r in got] == list(pdf["v"])

    # positional_join self-pairing is the identity on a deterministic layout
    paired = joins.positional_join(
        scan.select(F.col("v").alias("lv")), scan.select(F.col("v").alias("rv"))
    ).collect()
    assert all(r["lv"] == r["rv"] for r in paired) and len(paired) == 97


def test_sql_string_interface(spark):
    """The engine's tables are queryable through plain spark.sql after
    register_views — the SQL API surface works end-to-end."""
    from big_data_song_recommendation_spark.sources.readers import register_views
    from .conftest import SF_DIR

    register_views(spark, SF_DIR)
    out = spark.sql(
        """
        SELECT r_name, COUNT(DISTINCT n_nationkey) AS n_nations
        FROM region JOIN nation ON r_regionkey = n_regionkey
        GROUP BY r_name ORDER BY r_name
        """
    ).collect()
    assert len(out) == 5
    assert sum(r["n_nations"] for r in out) == 25


def test_asof_join_matches_pandas_merge_asof(spark):
    """asof_join vs pd.merge_asof on both strict modes, including
    exact-timestamp collisions (the corner q29's oracle doesn't hit)."""
    from datetime import datetime, timedelta

    import pandas as pd
    from big_data_song_recommendation_spark.operators.asof import asof_join

    base = datetime(2024, 1, 1)
    right_rows = [
        (k, base + timedelta(minutes=7 * i), float(100 * k + i))
        for k in range(4) for i in range(6)
    ]
    left_rows = [
        (k, base + timedelta(minutes=m))
        for k in range(4)
        for m in (0, 3, 7, 20, 21, 36)  # 0/7/21 collide exactly with right ts
    ]
    right = spark.createDataFrame(right_rows, ["k", "ts", "price"])
    left = spark.createDataFrame(left_rows, ["k", "ts"])
    rpd = pd.DataFrame(right_rows, columns=["k", "ts", "price"]).sort_values("ts")
    lpd = pd.DataFrame(left_rows, columns=["k", "ts"]).sort_values("ts")

    for strict in (True, False):
        got = {
            (r["k"], r["ts"]): r["asof_price"]
            for r in asof_join(
                left, right, on="k", right_payload=["price"], strict=strict
            ).collect()
        }
        want_df = pd.merge_asof(
            lpd, rpd, on="ts", by="k",
            allow_exact_matches=not strict, direction="backward",
        )
        for _, row in want_df.iterrows():
            w = None if pd.isna(row["price"]) else float(row["price"])
            assert got[(row["k"], row["ts"].to_pydatetime())] == w, (
                f"strict={strict} k={row['k']} ts={row['ts']}"
            )

    # bounded lookback: matches older than the tolerance are dropped
    got_tol = {
        (r["k"], r["ts"]): (r["asof_price"], r["asof_ts"])
        for r in asof_join(
            left, right, on="k", right_payload=["price"],
            strict=False, tolerance="5 minutes",
        ).collect()
    }
    want_tol = pd.merge_asof(
        lpd, rpd, on="ts", by="k", allow_exact_matches=True,
        direction="backward", tolerance=pd.Timedelta(minutes=5),
    )
    for _, row in want_tol.iterrows():
        w = None if pd.isna(row["price"]) else float(row["price"])
        price, asof_ts = got_tol[(row["k"], row["ts"].to_pydatetime())]
        assert price == w, f"tolerance k={row['k']} ts={row['ts']}"
        assert (asof_ts is None) == (w is None), "asof_ts nulled with payload"


def test_approx_distinct_within_rsd(spark):
    """A3 at scale: HyperLogLog++ distinct counts land within ~3x the
    requested relative standard deviation of the exact counts."""
    from big_data_song_recommendation_spark.operators.aggregates import distinct_count
    from big_data_song_recommendation_spark.sources.readers import load_table
    from .conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r["n_user_id"]
        for r in distinct_count(ev, ["event_type"], "user_id").collect()
    }
    approx = {
        r["event_type"]: r["n_user_id"]
        for r in distinct_count(
            ev, ["event_type"], "user_id", approx=True, rsd=0.05
        ).collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.15 * n), (k, approx[k], n)


def test_stratified_sample_fractions(spark):
    """Per-stratum sampling hits the requested fractions (±40% rel at
    these row counts) and is deterministic under a fixed seed."""
    from big_data_song_recommendation_spark.operators.clean import stratified_sample
    from big_data_song_recommendation_spark.sources.readers import load_table
    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    base = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    fracs = {lang: (0.2 if lang == "en" else 0.8) for lang in base}
    s1 = stratified_sample(docs, "lang", fracs, seed=7)
    got = {r["lang"]: r["count"] for r in s1.groupBy("lang").count().collect()}
    for lang, n in base.items():
        want = fracs[lang] * n
        assert abs(got.get(lang, 0) - want) <= max(5, 0.4 * want), (lang, got.get(lang), want)
    s2 = stratified_sample(docs, "lang", fracs, seed=7)
    assert sorted(r["doc_id"] for r in s1.collect()) == sorted(
        r["doc_id"] for r in s2.collect()
    )


def test_cooccurrence_cap_bounds_fanout(spark):
    """The per-user item cap keeps hot users from quadratic pair
    emission, deterministically (lowest item ids kept)."""
    from big_data_song_recommendation_spark.operators import cooccur

    rows = [(1, i) for i in range(20)] + [(2, 0), (2, 1), (3, 0), (3, 1)]
    ui = spark.createDataFrame(rows, ["user_id", "item_id"])
    full = cooccur.cooccurrence_pairs(ui, min_support=1)
    assert full.count() == 20 * 19 // 2  # user1 clique; (0,1) merges into it
    capped = cooccur.cooccurrence_pairs(ui, min_support=1, max_items_per_user=5)
    # user1 contributes only C(5,2) pairs over items 0..4
    assert capped.count() == 10
    pair01 = capped.filter("item_a = 0 AND item_b = 1").first()
    assert pair01["n_co"] == 3  # users 1 (capped set), 2, 3


def test_s3a_conf_contract():
    """S12: object-store access is pure configuration — the helper
    must emit the canonical fs.s3a.* keys the hadoop-aws connector
    consumes, mirroring the reference MinIO client's connection
    contract (src/storage/minio_client.py:6-21, no live store
    needed)."""
    from big_data_song_recommendation_spark.session import (
        REFERENCE_BUCKETS,
        s3a_conf,
        s3a_conf_from_env,
    )

    conf = s3a_conf("localhost:9000", "ak", "sk")
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://localhost:9000"
    assert conf["spark.hadoop.fs.s3a.access.key"] == "ak"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "sk"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "false"

    tls = s3a_conf("minio.internal:9000", "ak", "sk", ssl=True)
    assert tls["spark.hadoop.fs.s3a.endpoint"] == "https://minio.internal:9000"
    assert tls["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "true"

    env = s3a_conf_from_env({})  # reference defaults
    assert env["spark.hadoop.fs.s3a.endpoint"] == "http://localhost:9000"
    assert env["spark.hadoop.fs.s3a.access.key"] == "minioadmin"
    env2 = s3a_conf_from_env({"MINIO_ENDPOINT": "store:9001", "MINIO_SSL": "true"})
    assert env2["spark.hadoop.fs.s3a.endpoint"] == "https://store:9001"

    assert len(REFERENCE_BUCKETS) == 6  # the reference's bucket layout


def test_profile_columns_mixed_types_and_nulls(spark):
    import datetime as dt

    from big_data_song_recommendation_spark.operators.profile import (
        profile_columns,
    )

    rows = [
        (1, "a", 2.0, dt.datetime(2024, 1, 1, 12, 0, 0)),
        (2, "b", 4.0, dt.datetime(2024, 6, 1, 0, 0, 0)),
        (3, None, None, None),
        (3, "a", 8.0, dt.datetime(2024, 1, 1, 12, 0, 0)),
    ]
    df = spark.createDataFrame(rows, ["k", "s", "v", "t"])
    out = {r["col_name"]: r for r in profile_columns(df).collect()}
    assert set(out) == {"k", "s", "v", "t"}
    k = out["k"]
    assert (k["n_rows"], k["n_null"], k["n_distinct"]) == (4, 0, 3)
    assert (k["min_num"], k["max_num"], k["median"]) == (1.0, 3.0, 2.5)
    assert k["min_str"] is None
    s = out["s"]
    assert (s["n_null"], s["n_distinct"]) == (1, 2)
    assert (s["min_str"], s["max_str"]) == ("a", "b")
    assert s["median"] is None
    v = out["v"]
    assert (v["n_null"], v["min_num"], v["max_num"], v["median"]) == (1, 2.0, 8.0, 4.0)
    t = out["t"]
    assert t["n_null"] == 1
    assert t["min_str"] == "2024-01-01 12:00:00"
    assert t["max_str"] == "2024-06-01 00:00:00"


def test_profile_columns_single_aggregate_job(spark):
    from big_data_song_recommendation_spark.operators.profile import (
        profile_columns,
    )

    df = spark.range(100).selectExpr("id AS a", "CAST(id % 7 AS STRING) AS b")
    plan = profile_columns(df, approximate=True)._jdf.queryExecution().executedPlan().toString()
    # approximate mode must not plan an Expand (exact multi-distinct does)
    assert "Expand" not in plan


def test_pagerank_mass_conserved_and_hub_ranks_highest(spark):
    from big_data_song_recommendation_spark.operators.graph import pagerank

    # star: node 1 linked with 2,3,4 (symmetric) — 1 is the hub
    half = [(1, 2), (1, 3), (1, 4)]
    edges = spark.createDataFrame(
        half + [(b, a) for a, b in half], ["src", "dst"]
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iterations=5).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9  # no rank mass leaked
    assert ranks[1] > ranks[2] == ranks[3] == ranks[4]


def test_pagerank_dangling_mass_redistributed(spark):
    from big_data_song_recommendation_spark.operators.graph import pagerank

    # 1 -> 2 -> 3, 3 dangling: without the correction the mass on 3
    # would vanish each round and the total would decay below 1
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iterations=10).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert ranks[3] > ranks[2] > ranks[1]  # downstream accumulates


def test_chi_square_independent_and_dependent_extremes(spark):
    from big_data_song_recommendation_spark.operators.aggregates import (
        chi_square,
    )

    # perfectly independent 2x2 (balanced cross): chi2 = 0
    indep = spark.createDataFrame(
        [("x", "p")] * 5 + [("x", "q")] * 5 + [("y", "p")] * 5 + [("y", "q")] * 5,
        ["a", "b"],
    )
    [r] = chi_square(indep, "a", "b").collect()
    assert (r["n"], r["r"], r["c"], r["dof"]) == (20, 2, 2, 1)
    assert r["chi2"] == 0.0

    # perfectly dependent 2x2 (a determines b): chi2 = n * (min(r,c)-1)
    dep = spark.createDataFrame(
        [("x", "p")] * 10 + [("y", "q")] * 10, ["a", "b"]
    )
    [r] = chi_square(dep, "a", "b").collect()
    assert r["chi2"] == 20.0
    assert r["dof"] == 1


def test_chi_square_counts_empty_cells(spark):
    from big_data_song_recommendation_spark.operators.aggregates import (
        chi_square,
    )

    # (y, q) never observed; its expected count must still contribute
    df = spark.createDataFrame(
        [("x", "p")] * 4 + [("x", "q")] * 4 + [("y", "p")] * 4, ["a", "b"]
    )
    [r] = chi_square(df, "a", "b").collect()
    # manual: totals ra={x:8,y:4}, cb={p:8,q:4}, n=12
    # e(x,p)=16/3, e(x,q)=8/3, e(y,p)=8/3, e(y,q)=4/3
    # chi2 = (4-16/3)^2/(16/3) + (4-8/3)^2/(8/3)*2 + (0-4/3)^2/(4/3) = 3.0
    assert abs(r["chi2"] - 3.0) < 1e-9


def test_equi_width_histogram_edges_and_degenerate(spark):
    from big_data_song_recommendation_spark.operators.aggregates import (
        equi_width_histogram,
    )

    df = spark.createDataFrame([(float(v),) for v in range(0, 100)], ["x"])
    out = {r["bin"]: r for r in equi_width_histogram(df, "x", bins=10).collect()}
    assert set(out) == set(range(10))
    assert all(out[b]["n"] == 10 for b in range(10))
    assert out[0]["lo_edge"] == 0.0
    # max value (99.0) lands in the closed top bin
    assert out[9]["n"] == 10

    same = spark.createDataFrame([(5.0,)] * 7, ["x"])
    [row] = equi_width_histogram(same, "x", bins=10).collect()
    assert (row["bin"], row["n"]) == (0, 7)


def test_gini_index_uniform_and_concentrated(spark):
    from big_data_song_recommendation_spark.operators.aggregates import (
        gini_index,
    )

    uniform = spark.createDataFrame(
        [(i, 5.0) for i in range(4)], ["id", "v"]
    )
    [r] = gini_index(uniform, "v", "id").collect()
    assert (r["n"], r["total"], r["gini"]) == (4, 20.0, 0.0)

    conc = spark.createDataFrame(
        [(1, 0.0), (2, 0.0), (3, 0.0), (4, 10.0)], ["id", "v"]
    )
    [r] = gini_index(conc, "v", "id").collect()
    assert r["gini"] == 0.75  # 2*40/(4*10) - 5/4


def test_triangle_count_k4_star_and_random_truth(spark):
    import itertools
    import random

    from big_data_song_recommendation_spark.operators.graph import (
        triangle_count,
    )

    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)], ["src", "dst"]
    )
    [r] = triangle_count(k4).collect()
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"], r["n_wedges"]) == (
        4, 6, 4, 12,
    )
    assert r["global_clustering"] == 1.0

    star = spark.createDataFrame([(0, i) for i in range(1, 6)], ["src", "dst"])
    [r] = triangle_count(star).collect()
    assert r["n_triangles"] == 0 and r["global_clustering"] == 0.0

    # randomized cross-check against brute-force enumeration
    rng = random.Random(7)
    nodes = list(range(20))
    edges = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(60)})
    truth = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if ((a, b) in edges or (b, a) in edges)
        and ((b, c) in edges or (c, b) in edges)
        and ((a, c) in edges or (c, a) in edges)
    )
    df = spark.createDataFrame(edges, ["src", "dst"])
    [r] = triangle_count(df).collect()
    assert r["n_triangles"] == truth


def test_personalized_pagerank_concentrates_on_seed_neighborhood(spark):
    from big_data_song_recommendation_spark.operators.graph import (
        personalized_pagerank,
    )

    # two disconnected triangles {1,2,3} and {4,5,6}; seed in the first
    half = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)]
    edges = spark.createDataFrame(
        half + [(b, a) for a, b in half], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    ranks = {r["node"]: r["rank"] for r in
             personalized_pagerank(edges, seeds, iterations=5).collect()}
    # mass stays in the seed's component; the other triangle gets none
    assert ranks[4] == ranks[5] == ranks[6] == 0.0
    assert ranks[1] > ranks[2] == ranks[3] > 0.0
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_linear_fit_exact_line_and_degenerates(spark):
    from big_data_song_recommendation_spark.operators.aggregates import (
        linear_fit,
    )

    line = spark.createDataFrame(
        [(float(x), 2.0 * x + 1.0) for x in range(10)], ["x", "y"]
    )
    [r] = linear_fit(line, "x", "y").collect()
    assert (r["n"], r["slope"], r["intercept"], r["r2"]) == (10, 2.0, 1.0, 1.0)

    const_x = spark.createDataFrame([(3.0, float(y)) for y in range(5)], ["x", "y"])
    [r] = linear_fit(const_x, "x", "y").collect()
    assert r["slope"] is None and r["intercept"] is None and r["r2"] is None

    const_y = spark.createDataFrame([(float(x), 7.0) for x in range(5)], ["x", "y"])
    [r] = linear_fit(const_y, "x", "y").collect()
    assert r["slope"] == 0.0 and r["intercept"] == 7.0 and r["r2"] is None


def test_mutual_information_extremes(spark):
    from big_data_song_recommendation_spark.operators.aggregates import (
        mutual_information,
    )

    # independent balanced 2x2: MI = 0, H(a) = H(b) = 1 bit
    indep = spark.createDataFrame(
        [("x", "p")] * 5 + [("x", "q")] * 5 + [("y", "p")] * 5 + [("y", "q")] * 5,
        ["a", "b"],
    )
    [r] = mutual_information(indep, "a", "b").collect()
    assert (r["h_a"], r["h_b"], r["mi"], r["nmi"]) == (1.0, 1.0, 0.0, 0.0)
    assert r["h_ab"] == 2.0

    # a determines b: MI = H(a) = H(b) = 1 bit, NMI = 1
    dep = spark.createDataFrame([("x", "p")] * 8 + [("y", "q")] * 8, ["a", "b"])
    [r] = mutual_information(dep, "a", "b").collect()
    assert (r["h_a"], r["h_b"], r["h_ab"]) == (1.0, 1.0, 1.0)
    assert r["mi"] == 1.0 and r["nmi"] == 1.0


def test_incremental_summary_equals_full_recompute(spark):
    """merge_summaries(summarize(a), summarize(b)) == summarize(a∪b)
    for every mergeable kind — the partial-aggregate IVM property."""
    from big_data_song_recommendation_spark.operators.aggregates import (
        merge_summaries,
        summarize,
    )

    measures = {
        "total": ("sum", "v"),
        "n": ("count", "v"),
        "lo": ("min", "v"),
        "hi": ("max", "v"),
    }
    a = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 5)], "k int, v int"
    )
    b = spark.createDataFrame(
        [(1, 1), (2, 50), (3, 7)], "k int, v int"
    )
    full = summarize(a.unionByName(b), ["k"], measures)
    inc = merge_summaries(
        summarize(a, ["k"], measures),
        summarize(b, ["k"], measures),
        ["k"],
        measures,
    )
    key = lambda df: {r.k: (r.total, r.n, r.lo, r.hi) for r in df.collect()}
    assert key(inc) == key(full)


def test_incremental_summary_retraction(spark):
    """Additive measures retract via negated delta summaries."""
    from pyspark.sql import functions as F

    from big_data_song_recommendation_spark.operators.aggregates import (
        merge_summaries,
        summarize,
    )

    measures = {"total": ("sum", "v"), "n": ("count", "v")}
    base = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 5)], "k int, v int"
    )
    removed = spark.createDataFrame([(1, 20)], "k int, v int")
    mv = summarize(base, ["k"], measures)
    retract = summarize(removed, ["k"], measures).select(
        "k", (-F.col("total")).alias("total"), (-F.col("n")).alias("n")
    )
    got = {
        r.k: (r.total, r.n)
        for r in merge_summaries(mv, retract, ["k"], measures).collect()
    }
    assert got == {1: (10, 1), 2: (5, 1)}


def test_summarize_rejects_unmergeable_kind(spark):
    import pytest as _pytest

    from big_data_song_recommendation_spark.operators.aggregates import (
        summarize,
    )

    df = spark.createDataFrame([(1, 1.0)], "k int, v double")
    with _pytest.raises(ValueError, match="unmergeable"):
        summarize(df, ["k"], {"a": ("avg", "v")})
