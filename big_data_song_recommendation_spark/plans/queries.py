"""Named acceptance queries (Spark side).

Each function takes ``(spark, sf_dir)`` and returns a DataFrame; its
DuckDB oracle twin lives in :mod:`.oracles` under the same key. Keys
map to SURVEY.md §2 operators (cited per-query).

Determinism rules (driver hashes values order-insensitively but
exactly):

- every computed float is wrapped in ``F.round(...)`` so engine-level
  ulp differences (shuffle-order double sums) cannot surface;
- every top-k/limit has a total-order sort (tie-break on a key);
- no nondeterministic functions (rand, current_timestamp) in checked
  queries;
- timestamps that appear in output are formatted to strings (Spark is
  session-TZ'd, DuckDB is UTC-naive).

Scale notes are inline: broadcast hints for dimension joins, window
top-k instead of sort-all, single-pass aggregations.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import scalars, text, vectors
from ..sources.readers import load_table, local_frame


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _ordered(df: DataFrame, *cols) -> DataFrame:
    """Presentation order hook for a BOUNDED final result (aggregate /
    top-k / per-entity summary rows, not raw fact rows).

    Round 13 (VERDICT r12 #6): a NO-OP by default. The sort here was
    always cosmetic — the driver's correctness compare is
    order-insensitive (it canonically sorts rows before hashing, as
    does ``scripts/correctness_sweep.py``), and no result feeds a
    ``limit``/``offset`` after this point (semantic sorts keep real
    ``orderBy`` inside the queries). What the cosmetic sort cost: one
    SinglePartition Exchange + sort stage per query — ~183 exchanges,
    ~6-9 s suite-wide at sf0.1, and at cluster scale a needless
    all-to-one funnel of every query's result. Guide §2.4 names "an
    orderBy used only to make output deterministic" as the canonical
    removable shuffle.

    ``SPARK_GRAFT_PRESENTATION_SORT=1`` restores the r12 behavior
    (single-partition total sort — TPC-H presentation-order fidelity
    for human eyes; ``df.orderBy`` is deliberately not used: its
    RangePartitioner sampling pass executes the entire child plan a
    second time, measured +0.54 s on q22)."""
    if os.environ.get("SPARK_GRAFT_PRESENTATION_SORT") == "1":
        return df.repartition(1).sortWithinPartitions(*cols)
    return df


# ---------------------------------------------------------------------------
# Relational core
# ---------------------------------------------------------------------------

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan→filter→8-agg groupBy (A1/A4/A5, P3).

    Single shuffle; partial aggregation is map-side (Catalyst default),
    so at 100 TB this moves only (flag,status)-grouped partials.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(_revenue()), 2).alias("sum_disc_price"),
            F.round(F.sum(_revenue() * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .transform(_ordered, "l_returnflag", "l_linestatus")
    )


def q02_top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filter→join→join→agg→top-10 (J1, A7, O1).

    customer is filtered before the join (predicate pushdown) and the
    revenue aggregate runs BELOW the joins (lineitem → order grain —
    (o_orderdate, o_orderpriority) are functionally dependent on
    o_orderkey so no re-grouping is needed after the join); top-10 is
    a TakeOrderedAndProject, not a full sort. At 100 TB the map-side
    combine on orderkey shrinks the only fact-fact shuffle ~4×."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # Reduce lineitem BEFORE aggregating: the segment filter keeps ~1/5
    # of orders, so joining first and aggregating the surviving rows
    # beats pre-aggregating all of lineitem (0.74 s -> 0.57 s at
    # sf0.1). NO forced broadcast anywhere: customer scales with SF
    # (1/5 of it still OOMs a 100 TB build side) and an explicit hint
    # cannot be demoted by AQE — both joins stay un-hinted except the
    # fact-fact SHUFFLE_HASH (a partitioning the groupBy then reuses,
    # so the query pays two exchanges and never sorts); AQE upgrades
    # either build side to a broadcast from ACTUAL stats when it fits.
    qualifying = orders.join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    return (
        li.join(
            qualifying.hint("shuffle_hash"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            # decimal-exact sum: the top-10 SELECTION rides this value,
            # so it must be engine-identical at any scale (see q117)
            F.round(F.sum(_revenue().cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("revenue")
        )
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q03_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 5-table star join → per-(region,nation) revenue
    (J1-J3 analogue on the TPC-H star; A3/A5).

    region/nation are broadcast (SURVEY.md §4 item 1) — at 100 TB the
    fact-side lineitem⋈orders join shuffles on orderkey and the tiny
    dims never shuffle at all.

    The aggregate is pushed BELOW the joins twice (lineitem → order
    grain → customer grain) so no DISTINCT machinery survives at all:
    ``n_orders`` is a summed per-customer count and ``n_customers`` a
    plain ``count(*)`` at customer grain. The dual fact-grain
    countDistinct version planned a 3-way Expand that replicated every
    lineitem row (4.7× the oracle wall at sf0.1); this shape's shuffles
    shrink monotonically (lineitem → ~¼ on orderkey combine → ~1/10 on
    custkey) — the plan a 100 TB star wants."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(F.sum(_revenue()).alias("order_rev"))
    per_cust = (
        per_order.join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            F.sum("order_rev").alias("cust_rev"),
            F.count("*").alias("cust_orders"),
        )
    )
    cust_geo = (
        cust.select("c_custkey", "c_nationkey")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "r_name", "n_name")
    )
    return (
        per_cust.join(cust_geo, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("cust_rev"), 2).alias("revenue"),
            F.sum("cust_orders").alias("n_orders"),
            F.count("*").alias("n_customers"),
        )
        .transform(_ordered, "r_name", "n_name")
    )


def q04_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type stats (A1/A3/A4/A5; exact distinct for the oracle —
    the scale path swaps in ``aggregates.distinct_count(approx=True)``,
    accuracy pinned by tests/test_operators.py)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
        .transform(_ordered, "event_type")
    )


def q05_top_events_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group (§2.5; replaces the reference's Python
    sort+slice A7/A9) — via the SALTED two-phase form
    (operators/aggregates.py top_k_per_group_salted): event_type is a
    5-value key, so a plain type-keyed window would funnel 1/5 of the
    fact table through one task each; the salted form takes per-slice
    top-3s in parallel and re-ranks only the tiny survivor set. Salt
    is a deterministic hash of the unique event id."""
    from ..operators.aggregates import top_k_per_group_salted

    ev = load_table(spark, sf_dir, "events")
    return top_k_per_group_salted(
        ev,
        ["event_type"],
        [F.desc("value"), F.asc("event_id")],
        3,
        salt_col=F.xxhash64("event_id"),
    ).select("event_type", "event_id", "user_id", "value", "rnk").transform(
        _ordered, "event_type", "rnk"
    )


def q06_orders_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination (O4, `GET /songs?limit&offset`): keyset-ordered
    offset+limit. Spark 3.4+ has native DataFrame.offset."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy("o_orderkey")
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .offset(40)
        .limit(20)
    )


def q07_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with ≥1 urgent order (U3
    analogue). Semi-join avoids materializing the join product."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        .transform(_ordered, "c_custkey")
    )


def q08_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): the reference's processed-files
    set-difference (U3/S14) as a relational operator."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .transform(_ordered, "c_custkey")
    )


def q09_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based CASE bucketing (F7/F8: popularity→rating thresholds)
    applied to event values, then a frequency histogram (A6)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("rating", scalars.rating_from_popularity("value"))
        .groupBy("rating")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .transform(_ordered, "rating")
    )


def q10_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-hour batch aggregation (T3/T4 batch twin): the
    streaming job computes the same groupBy over F.window."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_ts"
            )
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .transform(_ordered, "hour_ts")
    )


def q11_union_order_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-with-tag (U1: hybrid concat) then histogram."""
    orders = load_table(spark, sf_dir, "orders")
    high = orders.filter(F.col("o_totalprice") > 50000).select(
        F.lit("high_value").alias("bucket"), "o_orderstatus"
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    ).select(F.lit("recent").alias("bucket"), "o_orderstatus")
    return (
        high.unionByName(recent)
        .groupBy("bucket", "o_orderstatus")
        .agg(F.count("*").alias("n"))
        .transform(_ordered, "bucket", "o_orderstatus")
    )


def q12_part_type_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim join lineitem⋈part (J2 analogue) + per-type revenue. part
    SCALES with SF (200k rows/SF), so no forced broadcast hint — AQE
    broadcasts from actual stats while part fits and falls back to a
    shuffled join when it no longer does (a hint would pin the OOM)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type")
        .agg(
            F.round(F.sum(_revenue()), 2).alias("revenue"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_retail"),
            F.count("*").alias("n_items"),
        )
        .transform(_ordered, "p_type")
    )


def q13_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (F18:
    from_json/get_json_object) + aggregation."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.min("k").alias("min_k"),
        )
        .transform(_ordered, "event_type")
    )


# ---------------------------------------------------------------------------
# Documents: text analysis + dedup
# ---------------------------------------------------------------------------

def q14_doc_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + per-language stats (text-analysis operator)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("n_tokens", text.token_count("text"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .transform(_ordered, "lang")
    )


def q15_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text fingerprint (hash-groupBy dedup):
    per-doc keep/duplicate decision. Keeps the smallest doc_id per
    fingerprint group (deterministic)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        docs.withColumn("fp", text.fingerprint("text"))
        .withColumn("rnk", F.row_number().over(w))
        .select(
            "doc_id",
            "fp",
            (F.col("rnk") == 1).alias("keep"),
        )
        .transform(_ordered, "doc_id")
    )


# ---------------------------------------------------------------------------
# Embeddings: similarity search
# ---------------------------------------------------------------------------

def q16_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 3 probe vectors (M13/M14 rebuilt:
    all math in Catalyst higher-order fns, double precision).

    The probe side is broadcast, so at scale this is a single pass over
    the corpus with a map-side top-k (window on the tiny probe key)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dim = vectors.infer_dim(emb, "embedding")
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
    ).withColumn("qn", F.sqrt(vectors.sq_norm_expanded("qv", dim)))
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("nv"),
        F.col("label").alias("neighbor_label"),
    ).withColumn("nn", F.sqrt(vectors.sq_norm_expanded("nv", dim)))
    # per-row norms + unrolled codegen dot (see vectors.dot_expanded)
    sim = F.round(
        vectors.dot_expanded("qv", "nv", dim)
        / (F.col("qn") * F.col("nn")),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        corpus.join(F.broadcast(probes), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", sim)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", "neighbor_label", "sim", "rnk")
        .transform(_ordered, "query_id", "rnk")
    )


def q17_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram-shingle Jaccard ≥ 0.5 (the
    dedup ground truth; the LSH path q20 must find the same pairs)."""
    from ..operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, threshold=0.5
    ).transform(_ordered, "id_a", "id_b")


def q18_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-hash MinHash signatures (md5-derived 60-bit hashes — engine-
    portable, unlike xxhash64) for every doc."""
    from ..operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_signatures(
        docs, "doc_id", "text", num_hashes=8, k=3
    ).transform(_ordered, "doc_id")


def q19_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per doc over the token multiset."""
    from ..operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash(docs, "doc_id", "text", bits=16).transform(_ordered, "doc_id")


def q20_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH banded near-dup pairs, exact-Jaccard verified at
    ≥ 0.5. Oracle = the exact all-pairs Jaccard (q17's SQL): on this
    corpus every true pair has j≈0.98, where 32-hash/8-band collision
    probability is ≈1, so LSH must recover exactly the true pair set —
    a real recall check, not a tautology."""
    from ..operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=32, bands=8, k=3, verify_threshold=0.5
    ).transform(_ordered, "id_a", "id_b")


def q21_embedding_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ 0.4 via blocked numpy GEMM
    (the all-pairs throughput path; ``dedup.embedding_dup_pairs`` is
    the pure-expression exact-parity baseline it is tested against)."""
    from ..operators import dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_dup_pairs_blocked(
        emb, "vec_id", "embedding", threshold=0.4
    ).transform(_ordered, "id_a", "id_b")


def q22_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality metrics: token count, punctuation ratio,
    stopword ratio, composite quality score (Gopher/C4-style)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.token_count("text").alias("n_tokens"),
        scalars.stable_round(text.punct_ratio("text"), 4).alias("punct_ratio"),
        scalars.stable_round(text.stopword_ratio("text"), 4).alias("stopword_ratio"),
        text.quality_score("text").alias("quality"),
    ).transform(_ordered, "doc_id")


def q23_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword votes) vs. labeled lang —
    confusion-matrix counts."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("predicted", text.lang_id("text"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
        .transform(_ordered, "lang", "predicted")
    )


def q24_user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames (§2.5 superset): running spend per user (exact
    decimal accumulation → double; frame-ordered double sums are not
    engine-portable), lag, row_number."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.sum(F.col("value").cast("decimal(12,2)"))
        .over(wrun)
        .cast("double")
        .alias("running_spend"),
        F.row_number().over(w).alias("rn"),
    ).transform(_ordered, "user_id", "rn")


def q25_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap cumsum sessions per user (lag +
    running sum — the batch twin of streaming session_window)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = scalars.epoch_seconds("ts")
    gap = ts_s - F.lag(ts_s).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800.0), 1).otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn("new_sess", new_sess)
        .withColumn("session_id", F.sum("new_sess").over(wrun))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
        )
        .transform(_ordered, "user_id", "session_id")
    )


def q26_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (region → nation → grand total) with grouping_id — a
    capability beyond the reference that Spark/DuckDB both give free.

    The rollup runs over a (r_name, n_name) pre-aggregate (25 rows),
    not the joined fact: ROLLUP plans an Expand that replicates its
    input once per grouping set, and replicating lineitem-grain rows
    3× was the old plan's cost. Sums/counts re-aggregate losslessly;
    rounding stays at the outer level."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # aggregate push-below-join (q61/q121's reducer): lineitem first
    # collapses to (orderkey, rev, cnt) — map-side-combinable, the
    # only full-fact shuffle — so the orders join moves order-grain
    # rows, not lineitem-grain. Revenue is decimal-exact per product
    # (price and discount are 2-decimal, so the product is an exact
    # 4-decimal value) and re-associates losslessly through the
    # re-aggregation.
    lia = li.groupBy(F.col("l_orderkey").alias("lk")).agg(
        F.sum(_revenue().cast("decimal(18,4)")).alias("rev"),
        F.count("*").alias("cnt"),
    )
    pre = (
        lia.join(orders, F.col("lk") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum("rev").alias("rev"), F.sum("cnt").alias("cnt"))
    )
    return (
        pre.rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("rev"), 2).cast("double").alias("revenue"),
            F.sum("cnt").alias("n_items"),
            F.grouping_id().alias("grp_id"),
        )
        .transform(_ordered, "grp_id", "r_name", "n_name")
    )


def q27_daily_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type → columns of daily counts (reference has no
    pivot; Spark's .pivot vs oracle conditional aggregation)."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    piv = (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", types)
        .count()
    )
    return piv.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    ).transform(_ordered, "day")


def q28_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (median/p90) per event_type —
    percentile_disc semantics return actual data values, which are
    engine-portable (interpolated quantiles are not: engines differ
    in formula ulp). The per-type rank is the grouped TWO-PHASE form
    (operators/ranks.py): event_type is a 5-value key, so a plain
    type-keyed window would funnel 1/5 of the facts through one task
    each; bucketed ranks keep every task at bucket grain."""
    from ..operators.ranks import bucketed_rank, with_equi_width_bucket

    ev = load_table(spark, sf_dir, "events")
    ranked = bucketed_rank(
        with_equi_width_bucket(ev, "value", group=["event_type"]),
        [F.col("value").asc(), F.col("event_id").asc()],
        ["__vb"],
        group=["event_type"],
        out="rn",
    )
    n_per = ev.groupBy("event_type").agg(F.count("*").alias("n"))

    def disc(q: float) -> F.Column:
        return F.min(
            F.when(F.col("rn") == F.ceil(F.lit(q) * F.col("n")), F.col("value"))
        )

    return (
        ranked.join(F.broadcast(n_per), "event_type")
        .groupBy("event_type")
        .agg(
            disc(0.5).alias("median_value"),
            disc(0.9).alias("p90_value"),
            F.max("n").alias("n"),
        )
        .transform(_ordered, "event_type")
    )


def q29_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest strictly-
    prior click (sort-based union-window operator — single shuffle,
    no range join; operators/asof.py)."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    out = asof_join(
        purchases, clicks, on="user_id", tiebreak="event_id", strict=True
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_click_ts"),
    ).transform(_ordered, "event_id")


def q30_hash_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 deterministic hash-derived pseudo-attributes (md5 bucket →
    fixed pool pick), then a histogram over the synthetic attribute."""
    part = load_table(spark, sf_dir, "part")
    colors = ["red", "green", "blue", "gold", "silver"]
    return (
        part.withColumn("color", scalars.pick_deterministic("p_partkey", colors))
        .groupBy("color")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_retail"),
        )
        .transform(_ordered, "color")
    )


def q31_duration_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 ms→"m:ss" formatting (event value as seconds→ms), histogram
    of formatted buckets."""
    ev = load_table(spark, sf_dir, "events")
    ms = F.floor(F.col("value") * 1000)
    return (
        ev.withColumn("dur", scalars.format_duration(ms))
        .groupBy("dur")
        .agg(F.count("*").alias("n"))
        .transform(_ordered, "dur")
    )


def q32_cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping combinations in one
    pass (superset of the reference's flat groupBys; A6-A8)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
        .transform(_ordered, "status", "priority")
    )


def q33_intersect_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers with both an urgent AND a low-priority
    order (distinct set semantics on both engines)."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.intersect(low).transform(_ordered, "custkey")


def q34_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers who ordered but never urgently (distinct set
    difference; the row-set twin of the q08 anti-join)."""
    orders = load_table(spark, sf_dir, "orders")
    all_c = orders.select(F.col("o_custkey").alias("custkey"))
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    # subtract == EXCEPT DISTINCT (exceptAll would keep a customer whose
    # non-urgent order count merely exceeds their urgent count)
    return all_c.subtract(urgent).transform(_ordered, "custkey")


def q54_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-occurrence with lift — item-based CF's statistical
    core (complements ALS latent factors and content cosine). Distinct
    (user, item) pairs self-join on user; the per-user fan-out is
    capped by active-user filtering at scale (the shuffle key is
    user_id). Lift = P(a,b) / (P(a)·P(b)) over the user universe."""
    from ..operators import cooccur

    ev = load_table(spark, sf_dir, "events")
    ui = (
        # json_tuple: Generate is a pushdown barrier, so the null-filter
        # can't clone the JSON parse into the scan (q67's fix applied)
        ev.select("user_id", F.expr("json_tuple(props, 'k')").alias("k0"))
        .select("user_id", F.col("k0").cast("int").alias("item_id"))
        .filter(F.col("item_id").isNotNull())
        .distinct()
        .cache()  # read by the pair join AND the lift popularity scan
    )
    pairs = cooccur.cooccurrence_pairs(
        ui, min_support=3,
        max_items_per_user=cooccur.DEFAULT_MAX_ITEMS_PER_USER,
    )
    return (
        cooccur.with_lift(pairs, ui)
        .orderBy(F.desc("n_co"), F.asc("item_a"), F.asc("item_b"))
        .limit(50)
    )


def q53_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (equi on user + time-band predicate): purchases
    attributed to clicks by the same user within the preceding 30
    minutes. The equi key carries the shuffle; the range predicate
    evaluates within user partitions — the scalable non-equi shape
    (a pure theta-join would be a cross product)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    attributed = purchases.join(
        clicks,
        ["user_id"],
    ).filter(
        (F.col("cts") <= F.col("pts"))
        & (F.col("cts") > F.col("pts") - F.expr("INTERVAL 30 MINUTES"))
    )
    return (
        attributed.groupBy("user_id")
        .agg(
            F.countDistinct("purchase_id").alias("attributed_purchases"),
            F.count("*").alias("click_pairs"),
        )
        .transform(_ordered, "user_id")
    )


def q51_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight range predicates + single agg — the purest
    pushdown test (date + discount + quantity filters all reach the
    parquet scan; see tests/test_plan_shapes.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
            .alias("revenue_effect"),
            F.count("*").alias("n_lines"),
        )
    )


def q52_unpivot_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-type daily counts back to long
    (metric, value) rows — the inverse of q27's pivot, via the native
    ``unpivot`` operator."""
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("total"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    return (
        wide.unpivot(
            "day",
            ["total", "sum_value", "n_users"],
            "metric",
            "metric_value",
        )
        .withColumn("metric_value", F.round(F.col("metric_value"), 2))
        .transform(_ordered, "day", "metric")
    )


def q50_user_event_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: per-user sorted array of distinct event
    types + its cardinality. collect_set is order-nondeterministic —
    array_sort makes the value oracle-comparable (determinism rule)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    return (
        ev.groupBy("user_id")
        .agg(F.array_sort(F.collect_set("event_type")).alias("types"))
        .select(
            "user_id",
            F.array_join("types", ",").alias("event_types"),
            F.size("types").alias("n_types"),
        )
        .transform(_ordered, "user_id")
    )


def q48_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5: ntile — customers quartiled by account balance within
    market segment, with per-quartile stats. mktsegment is a 5-value
    key, so the quartile is the DISTRIBUTED ntile (grouped two-phase
    rank on negated balance + closed-form reconstruction) — no task
    ever sorts a whole segment."""
    from ..operators.ranks import (
        bucketed_rank,
        ntile_from_rank,
        with_equi_width_bucket,
    )

    cust = load_table(spark, sf_dir, "customer")
    ranked = bucketed_rank(
        with_equi_width_bucket(
            cust.withColumn("__neg", -F.col("c_acctbal")),
            "__neg",
            group=["c_mktsegment"],
        ).drop("__neg"),
        [F.desc("c_acctbal"), F.asc("c_custkey")],
        ["__vb"],
        group=["c_mktsegment"],
        out="__rn",
    )
    n_seg = cust.groupBy("c_mktsegment").agg(F.count("*").alias("__n"))
    return (
        ranked.join(F.broadcast(n_seg), "c_mktsegment")
        .withColumn(
            "quartile", ntile_from_rank(F.col("__rn"), F.col("__n"), 4)
        )
        .groupBy("c_mktsegment", "quartile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
        .transform(_ordered, "c_mktsegment", "quartile")
    )


def q49_first_last_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5: first_value/last_value over full-partition frames + the
    gap of each event from its user's first event (time since first)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "user_id",
        "event_id",
        F.first("event_type").over(wfull).alias("first_type"),
        F.last("event_type").over(wfull).alias("last_type"),
        (F.unix_timestamp("ts") - F.unix_timestamp(F.first("ts").over(wfull)))
        .alias("sec_since_first"),
    ).transform(_ordered, "user_id", "event_id")


def q36_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-agg + HAVING — per (brand, size bucket)
    count distinct suppliers, keep groups with ≥ 5.

    ONE distinct pays for everything: project lineitem through the
    part join (un-hinted — part scales with SF, AQE broadcasts it only
    while it fits) to (brand, bucket, suppkey), distinct THAT
    (map-side combinable at lineitem grain, same as a pair-distinct
    would be), and the supplier count per group is then a plain
    count(*) — no countDistinct Expand machinery, one shuffle total
    (0.74 s -> 0.55 s at sf0.1)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand", (F.col("p_size") % 5).alias("size_bucket"), "l_suppkey")
        .distinct()
        .groupBy("p_brand", "size_bucket")
        .agg(F.count("*").alias("n_suppliers"))
        .filter(F.col("n_suppliers") >= 5)
        .transform(_ordered, "p_brand", "size_bucket")
    )


def q37_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer-join histogram — how many customers have
    0, 1, 2, … orders (zero-order customers must appear)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .transform(_ordered, "n_orders")
    )


def q38_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-part avg as a correlated bound — revenue of
    lineitems under half the part's average quantity. The bound is
    sum(int-valued)/count, exact in IEEE → identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.groupBy(F.col("l_partkey").alias("bp")).agg(
        (F.sum("l_quantity") / F.count("*") * 0.5).alias("half_avg_qty"),
    )
    small = li.join(bounds, F.col("l_partkey") == F.col("bp")).filter(
        F.col("l_quantity") < F.col("half_avg_qty")
    )
    return small.agg(
        F.count("*").alias("n_lines"),
        F.round(F.sum(_revenue()), 2).alias("revenue"),
    )


def q39_late_shipment_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join with a cross-table predicate —
    orders having at least one lineitem shipped >60 days after the
    order date, counted by priority."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .transform(_ordered, "o_orderpriority")
    )


def q35_fuzzy_category_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4+S7: tiered fuzzy lookup (exact normalized → bidirectional
    containment → computed fallback) of part types against an
    in-memory dimension. The dim is built to fire every tier: exact
    ('economy','large'), fact⊃dim ('stand'⊂standard, 'omo'⊂promo),
    dim⊃fact ('small'⊂'smallest'), fallback (medium)."""
    from ..operators.joins import fuzzy_lookup_join

    part = load_table(spark, sf_dir, "part")
    dim = local_frame(
        spark,
        [
            ("economy", "budget"),
            ("stand", "mainline"),
            ("omo", "deal"),
            ("large", "big"),
            ("smallest", "tiny"),
        ],
        ["key", "category"],
    )
    out = fuzzy_lookup_join(
        part, dim, "p_type", "key", "category", fallback=F.lit("misc")
    )
    return (
        out.groupBy(
            F.col("category"), F.col("category_match_tier").alias("tier")
        )
        .agg(F.count("*").alias("n"))
        .transform(_ordered, "category", "tier")
    )


# ---------------------------------------------------------------------------
# Multimodal binary columns (training-data-pipeline superset): decode /
# feature-extract over opaque payload bytes via Arrow-batched
# mapInPandas; resize planning + frame sampling as pure column exprs.
# ---------------------------------------------------------------------------

def q44_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode+feature-extract over binary payloads (mapInPandas, Arrow
    batches). The deterministic fake decoder computes real byte-level
    stats (len / md5 / byte-sum / mean) from the payload, so the DuckDB
    oracle checks the whole binary path value-exactly."""
    from ..operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.media_from_documents(docs)
    return multimodal.decode_media(media).transform(_ordered, "doc_id")


def q45_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video rows: every 7th frame index + its
    presentation timestamp — explode(sequence(...)), metadata-only (the
    payload column is pruned from the scan entirely)."""
    from ..operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.media_from_documents(docs)
    return multimodal.sample_frames(media, every=7).transform(_ordered, "doc_id", "frame_index")


def q46_image_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning (max 256×256) for visual
    modalities — pure column expressions over the metadata struct."""
    from ..operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.media_from_documents(docs)
    return multimodal.resize_plan(media, max_w=256, max_h=256).transform(_ordered, "doc_id")


# ---------------------------------------------------------------------------
# ML serving queries — round-10 committed-artifact form (VERDICT r9 #1):
# the ITERATIVE fits (MLlib ALS, KMeans) run ONCE offline and only
# their outputs are committed (ml/als_factors.py by
# scripts/gen_als_factors.py; ml/centroids.py by
# scripts/gen_centroids.py — the ml/pq_codebooks.py discipline), so
# roster SERVING is exact integer arithmetic over literals that every
# q40/q41/q43/q47 DuckDB twin replays — the whole roster is now
# hash-checked. The training fits themselves stay covered by
# tests/test_ml.py and the seeded goldens (tests/golden/
# ml_goldens.json); reference fit-config parity lives at
# ml/recommend.py (als_config.json: src/spark/training.py:473-483).
# ---------------------------------------------------------------------------


def _event_users(spark: SparkSession, sf_dir: str, below: int) -> DataFrame:
    """The serving user set: distinct event users below the id cap
    that have at least one item interaction (non-null ``props.k`` —
    the same rows the ratings derivation keeps)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.get_json_object("props", "$.k").isNotNull())
        .filter(F.col("user_id") < below)
        .select("user_id")
        .distinct()
    )


def q40_als_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6/M7 serving: top-5 items per user (users < 20) over the
    COMMITTED ALS factor matrices — exact micro-squared integer dot
    products, ties to the smaller item id (ml/recommend.py
    recommend_top_n_committed). Ref parity: the recommendForUserSubset
    surface of ``src/app.py:233-245``, served factor-side; the seeded
    FIT that produced the factors is pinned by tests/test_ml_goldens."""
    from ..ml import recommend

    users = _event_users(spark, sf_dir, 20)
    return recommend.recommend_top_n_committed(spark, users, 5).transform(
        _ordered, "user_id", "rnk"
    )


def q41_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9 serving: cluster-size histogram over the COMMITTED KMeans
    centroids — assignment is the integer argmin fold
    (operators/similarity.centroid_assign, the pq_encode shape), so
    the histogram is hash-checked; the iterative fit ran once in
    scripts/gen_centroids.py (deterministic integer Lloyd)."""
    from ..ml.centroids import KM_CENTROIDS
    from ..operators.similarity import centroid_assign

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        centroid_assign(emb, KM_CENTROIDS)
        .groupBy("cluster")
        .agg(F.count("*").alias("n"))
        .transform(_ordered, F.desc("n"), F.asc("cluster"))
    )


def q42_tfidf_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11 serving form — TF-IDF features from the COMMITTED model
    (round 11, the last rows-only query graduated): the MLlib pipeline
    (Tokenizer → StopWordsRemover → CountVectorizer → IDF) fit ONCE
    offline (scripts/gen_tfidf_vocab.py, verified nnz-identical to the
    pipeline transform on the fit corpus) and only its vocabulary +
    IDF micro-int weights commit (ml/tfidf_vocab.py). Per language:
    doc count, mean nonzero-term count (committed-vocab membership —
    array_intersect over whitespace tokens), and mean per-doc TF-IDF
    mass (Σ tf·idf_micro, exact int64 both engines). The fit itself
    stays golden-pinned (tests/test_ml_goldens.py); the exact
    relational per-query TF-IDF twin is q73."""
    from ..ml.tfidf_vocab import MICRO, TFIDF_IDF_MICRO, TFIDF_VOCAB

    active = [
        (v, w) for v, w in zip(TFIDF_VOCAB, TFIDF_IDF_MICRO) if w != 0
    ]
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "
    )
    per_doc = docs.select(
        "doc_id",
        "lang",
        F.size(
            F.array_intersect(
                F.expr(
                    "array("
                    + ",".join(f"'{v}'" for v, _ in active)
                    + ")"
                ),
                toks,
            )
        ).alias("nnz"),
        toks.alias("__toks"),
    )
    # tf·idf mass: explode only rows whose token IS a vocab term (the
    # filter prunes before the shuffle), broadcast-join the ≤100-row
    # committed idf table (the lm_perplexity_scores tier discipline —
    # a literal map would re-scan linearly per row)
    idf = local_frame(spark, active, "tok string, idf_micro long")
    mass = (
        per_doc.select("doc_id", F.explode("__toks").alias("tok"))
        .join(F.broadcast(idf), "tok")
        .groupBy("doc_id")
        # each surviving token ROW contributes its idf once, so the
        # plain sum IS Σ tf·idf_micro — no separate tf aggregate
        .agg(F.sum("idf_micro").alias("score_micro"))
    )
    return (
        per_doc.join(mass, "doc_id", "left")
        .withColumn("score_micro", F.coalesce("score_micro", F.lit(0)))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            scalars.stable_round(F.avg("nnz"), 2).alias("avg_terms"),
            scalars.stable_round(
                F.avg("score_micro") / F.lit(float(MICRO)), 2
            ).alias("avg_score"),
        )
        .transform(_ordered, "lang")
    )


def q47_ivf_ann_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbors — the 100-TB similarity-search
    layout: COMMITTED coarse centroids route each probe to its nprobe
    nearest cells (integer L2 argmin); the exact cosine rerank runs
    only inside those cells (search cost ÷ n_centroids/nprobe vs.
    q16's full scan). Every stage is replayable integer/rounded-float
    arithmetic, so q47 is hash-checked (round-10; previously
    KMeans-seeded rows-only). At scale the assigned corpus is written
    partitioned by cluster → probe reads become partition pruning."""
    from ..ml.centroids import IVF_CENTROIDS
    from ..operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    return similarity.ivf_knn_committed(
        emb, probes, IVF_CENTROIDS, k=5, nprobe=4
    ).transform(_ordered, "query_id", "rnk")


def q43_hybrid_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 + M7 + M13: hybrid 0.7·collaborative + 0.3·content top-5,
    fully hash-checked (round-10): the collaborative arm scores the
    COMMITTED ALS factors (1/rank reciprocal weighting), the content
    arm takes cosine neighbors of each user's MOST-PLAYED item
    (integer play-count argmax, ties to the smaller item id — the
    round-10 fav rule: play counts are cross-engine exact where the
    old derived-rating argmax hinged on float bucket edges). All-
    DataFrame serving — no collect loops (the reference's
    ``src/app.py:233-245`` hotspot, fixed)."""
    from ..ml import recommend
    from ..operators import similarity

    ev = load_table(spark, sf_dir, "events")
    emb = load_table(spark, sf_dir, "embeddings")
    # two consumers (the collaborative arm's factor scoring and the
    # content arm's plays semi-join) — parse/distinct the events user
    # set once (r12; the stage profile showed three full events scans,
    # two of them this subplan)
    users = _event_users(spark, sf_dir, 10).localCheckpoint(eager=False)

    collab = recommend.recommend_top_n_committed(spark, users, 10).select(
        "user_id",
        F.col("item_id").cast("int").alias("item_id"),
        (F.lit(0.7) * (1.0 / F.col("rnk"))).alias("score"),
    )

    plays = (
        ev.select(
            F.col("user_id").cast("int").alias("user_id"),
            F.get_json_object("props", "$.k").cast("int").alias("item_id"),
        )
        .filter(F.col("item_id").isNotNull())
        .join(users.select(F.col("user_id").cast("int").alias("user_id")), "user_id")
        .groupBy("user_id", "item_id")
        .agg(F.count("*").alias("n_plays"))
    )
    w_fav = Window.partitionBy("user_id").orderBy(
        F.desc("n_plays"), F.asc("item_id")
    )
    fav = (
        plays.withColumn("__rn", F.row_number().over(w_fav))
        .filter(F.col("__rn") == 1)
        .select("user_id", F.col("item_id").alias("fav_item"))
    )
    probes = fav.join(emb, fav.fav_item == emb.vec_id, "inner").select(
        F.col("user_id").alias("vec_id"), "embedding"
    )
    # knn over the item-embedding space keyed by the probing user;
    # the user's own favorite item is excluded afterwards (the probe id
    # is a user id, so exclude_self would be comparing mixed id spaces)
    content = (
        similarity.brute_force_knn(emb, probes, k=10, exclude_self=False)
        .withColumnRenamed("query_id", "user_id")
        .join(fav, "user_id")
        .filter(F.col("neighbor_id") != F.col("fav_item"))
        .select(
            "user_id",
            F.col("neighbor_id").cast("int").alias("item_id"),
            (F.lit(0.3) * F.col("sim")).alias("score"),
        )
    )

    hybrid = collab.unionByName(content)
    w = Window.partitionBy("user_id").orderBy(F.desc("total"), F.asc("item_id"))
    return (
        hybrid.groupBy("user_id", "item_id")
        .agg(F.round(F.sum("score"), 6).alias("total"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .transform(_ordered, "user_id", "rnk")
    )


# ---------------------------------------------------------------------------
# TPC-H suite completion — every classic shape expressible on the
# driver's star schema. (No partsupp table and no commit/receipt dates
# exist, so Q2/Q9/Q11/Q12/Q20/Q21 have no faithful twin here; Q1/Q3/Q4/
# Q6/Q13/Q16/Q17 live above as q01/q02/q39/q51/q37/q36/q38.)
# ---------------------------------------------------------------------------

def q55_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: per-nation revenue where the customer and supplier share
    a nation (star join J1-J3 plus the same-nation theta predicate).

    orders carries the year filter and region the name filter BEFORE any
    fact join (pushdown); nation/region broadcast. The extra
    c_nationkey = s_nationkey predicate rides the supplier hash join as
    a non-equi residual — no additional shuffle vs q03."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .transform(_ordered, F.desc("revenue"), F.asc("n_name"))
    )


def q56_bilateral_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations per direction and
    year (two aliased dimension joins on one table).

    nation is pre-filtered to the two nations of interest before each
    broadcast, so the joins themselves discard all other flows — the
    pair-combination filter afterwards only removes same-nation rows."""
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("supp_nation")
    )
    n_cust = nation.select(
        F.col("n_nationkey").alias("cust_nkey"), F.col("n_name").alias("cust_nation")
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("supp_nkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cust_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .transform(_ordered, "supp_nation", "cust_nation", "l_year")
    )


def q57_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_1 suppliers' share of the ASIA ECONOMY-part
    market per order year (conditional-sum ratio over a 6-table join).

    part/orders/region are filtered before their joins; the share is a
    single grouped pass (sum-if over sum), no second scan."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_supp = nation.select(
        F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("supp_nation")
    )
    li = load_table(spark, sf_dir, "lineitem")
    vol = _revenue()
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("supp_nkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
        .transform(_ordered, "o_year")
    )


def q58_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in 1996Q1
    (fact filter → join → group → TakeOrderedAndProject).

    Both fact filters (returnflag on lineitem, quarter on orders) are
    applied scan-side; top-20 never sorts the full aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        # exact decimal arithmetic: the money columns carry 2-decimal
        # values, so decimal(18,2) products sum exactly and the total is
        # shuffle-order independent (this sum hit a double rounding
        # boundary at sf0.01)
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q59_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: monthly % of revenue from PROMO parts across 1996
    (conditional-sum ratio, month bucketing).

    One joined pass per month bucket; the part join prunes to
    (p_partkey, p_type) — ReadSchema should show just those columns."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    vol = _revenue()
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("promo_pct"),
            F.round(F.sum(vol), 2).alias("revenue"),
        )
        .transform(_ordered, "ship_month")
    )


def q60_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with max revenue in 1996Q1 (aggregate →
    global-max select, ties kept).

    The per-supplier aggregate is tiny, so the max is folded back in via
    a broadcast single-row join (no second scan of lineitem), and the
    winner row set is broadcast into the supplier dimension join."""
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_revenue()).alias("total_revenue"))
    )
    best = rev.join(
        F.broadcast(rev.agg(F.max("total_revenue").alias("max_rev"))),
        F.col("total_revenue") == F.col("max_rev"),
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(best), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 2).alias("total_revenue"),
        )
        .transform(_ordered, "s_suppkey")
    )


def q61_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers behind orders totalling >300 units (grouped
    HAVING as a pre-join reducer).

    The lineitem aggregate shrinks the fact side to qualifying orders
    BEFORE touching orders/customer — at 100 TB that aggregate is the
    only full-fact shuffle; everything after moves a few thousand rows."""
    big = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def q62_brand_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under an OR-of-ANDs predicate spanning both
    join sides (disjunctive pushdown).

    The brand disjunct common to all arms is extracted and applied to
    part scan-side explicitly; per-arm size×quantity conditions stay as
    the join residual."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#4", "Brand#19")
    )
    li = load_table(spark, sf_dir, "lineitem")
    arm1 = (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#19")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(arm1 | arm2)
        .agg(
            F.round(F.sum(_revenue()), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q63_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted to this schema — no phone column): per-nation
    count and balance of above-average-balance customers with no order
    since 2000 (scalar-subquery threshold + anti-join).

    The threshold is a 1-row broadcast nested-loop join; the "no recent
    order" test is a left_anti against the date-filtered orders
    projection (U3's idiomatic form)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    thresh = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .transform(_ordered, "n_name")
    )


def q65_grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (Spark 4 DataFrame API): event stats by
    (type), by (hour), and overall — the exact set list, NOT the full
    cube (cube would add the unwanted (type, hour) cells). One Expand +
    one aggregate shuffle, same plan family as q26/q32."""
    ev = load_table(spark, sf_dir, "events").withColumn("hr", F.hour("ts"))
    return (
        ev.groupingSets([["event_type"], ["hr"], []], "event_type", "hr")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("hr").cast("string"), F.lit("ALL")).alias("hr"),
            "n",
            "total_value",
        )
        .transform(_ordered, "event_type", "hr")
    )


def q66_near_dup_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup removal end to end: MinHash-LSH pairs (q20's exact
    configuration) → connected components (min-label propagation) →
    canonical-per-cluster kept, members dropped — per-language corpus
    shrinkage stats. The oracle recomputes the clustering as a DuckDB
    recursive-CTE transitive closure over the exact-Jaccard pair list
    (q20's parity already proves the two pair lists coincide here)."""
    from ..operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=32, bands=8, k=3, verify_threshold=0.5
    )
    # LSH-verified near-dup graphs are near-cliques; depth 3 is one
    # full round above the measured fixpoint depth (2 at every SF and
    # replication probed — NOTES_r3), traded for ZERO per-round driver
    # syncs. A deeper graph fails loudly in-plan, never under-merges.
    kept = dedup.drop_near_duplicates(docs, pairs, "doc_id", assume_diameter=3)
    return (
        docs.select("lang", "doc_id")
        .join(kept.select(F.col("doc_id"), F.lit(1).alias("__k")), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("__k").isNull(), 1).otherwise(0)).alias("n_dropped"),
            F.count("__k").alias("n_kept"),
        )
        .transform(_ordered, "lang")
    )


def q67_decayed_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implicit-feedback prep, oracle-visible: per-(user, item)
    time-decayed confidence (ml/recommend.py time_decayed_confidence)
    over the event stream against a fixed as-of anchor, top-100 by
    confidence. Float sums are rounded coarse (3 dp) in-plan —
    shuffle-order float accumulation differs from DuckDB's by ~ulp."""
    from ..ml.recommend import time_decayed_confidence

    # json_tuple (a Generator) instead of get_json_object: predicate
    # pushdown substitutes project aliases into the filter, so the
    # withColumn+filter form parses the JSON TWICE per row (measured
    # 0.70 s -> 0.51 s at sf0.1); a Generate is a pushdown barrier, so
    # the parse runs once and the null-filter tests the parsed output.
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", F.expr("json_tuple(props, 'k')").alias("k0"))
        .withColumn("item_id", F.col("k0").cast("int"))
        .filter(F.col("item_id").isNotNull())
    )
    conf = time_decayed_confidence(
        ev, as_of="2025-07-01 00:00:00", half_life_days=30.0
    )
    return (
        conf.select(
            "user_id",
            "item_id",
            scalars.stable_round(F.col("confidence"), 3).alias("confidence"),
        )
        .orderBy(F.desc("confidence"), F.asc("user_id"), F.asc("item_id"))
        .limit(100)
    )


def q68_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via the Spark 4 VARIANT type: parse_json
    once, typed try_variant_get extraction (the successor to q13's
    per-access get_json_object string-walking — VARIANT parses the
    JSON a single time into a binary form and all later extractions
    are O(field) lookups, the difference that matters when props grows
    to kilobytes at 100 TB). High-k share per event type."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("k") >= 50, 1).otherwise(0)).alias("n_high"),
            scalars.stable_round(
                F.sum(F.when(F.col("k") >= 50, 1).otherwise(0))
                / F.count("*").cast("double"),
                4,
            ).alias("pct_high"),
        )
        .transform(_ordered, "event_type")
    )


def q64_token_budget_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus token budget: whitespace vs BPE-pre-tokenizer
    counts and their fertility ratio (bpe/ws) — the estimator an LLM
    training pipeline runs before spending tokenizer compute. Both
    counters are pure Catalyst regex expressions (functions/text.py),
    one scan, one aggregate shuffle on lang."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        text.token_count("text").alias("ws"),
        text.bpe_token_count("text").alias("bpe"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
        )
        .withColumn(
            "fertility",
            F.when(
                F.col("ws_tokens") > 0,
                scalars.stable_round(F.col("bpe_tokens") / F.col("ws_tokens"), 4),
            ),
        )
        .transform(_ordered, "lang")
    )


# ---------------------------------------------------------------------------
# Round-2 curation suite: range join, repetition quality,
# decontamination, stratified sampling, keyword TF-IDF.
# ---------------------------------------------------------------------------

def q69_incident_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join (operators/rangejoin.py): the 20
    highest-value 'error' events each open a 1-hour incident window;
    count the traffic that lands inside each window. The naive
    ``ts BETWEEN start AND end`` predicate would plan a
    BroadcastNestedLoopJoin; ``interval_join`` rewrites it as an
    equi-join on an exploded time bucket — the hash-shuffle shape that
    survives |points| x |intervals| at 100 TB (plan-shape-tested)."""
    from ..operators.rangejoin import interval_join

    events = load_table(spark, sf_dir, "events")
    windows = (
        events.filter(F.col("event_type") == "error")
        .orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(20)
        .select(
            F.col("event_id").alias("window_id"),
            F.col("ts").alias("start"),
            (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end"),
        )
    )
    joined = interval_join(
        events, windows, point_ts="ts", bucket_seconds=3600
    ).filter(F.col("event_id") != F.col("window_id"))
    return (
        joined.groupBy("window_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_purchases"),
            # sum in exact decimal: a double sum's association order
            # differs between engines and flips floor() at the 2-decimal
            # boundary (observed: 63.07 vs 63.06). decimal sums are
            # order-independent, so both engines floor the same value.
            scalars.stable_round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2
            ).alias("sum_value"),
        )
        .transform(_ordered, "window_id")
    )


def q70_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics per document
    (operators/quality.py repetition_metrics): most-frequent-bigram
    coverage + distinct-token ratio + a repetitive verdict. One tokens
    explode feeding window/groupBys that share the doc-id hash
    partitioning — a single exchange for the whole metric chain."""
    from ..operators.quality import repetition_metrics

    docs = load_table(spark, sf_dir, "documents")
    return repetition_metrics(docs).transform(_ordered, "doc_id")


def q71_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/quality.py decontaminate):
    held-out set = doc_id % 20 == 0; flag training docs sharing any
    distinct 5-gram with it, with overlap breadth counts. Equi-join on
    the shingle string + two map-side-combinable counts — the GPT-3
    appendix-C pass at corpus scale."""
    from ..operators.quality import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    benchmark = docs.filter(F.col("doc_id") % 20 == 0)
    return decontaminate(corpus, benchmark, k=5).transform(_ordered, "doc_id")


def q72_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (operators/quality.py
    stratified_sample): per-language keep-rates via an md5-bucket
    predicate — replayable across runs/engines/partitionings, unlike
    Bernoulli sampleBy. The filter rides the scan: zero shuffle until
    the per-stratum audit aggregate."""
    from ..operators.quality import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    sampled = stratified_sample(
        docs,
        "lang",
        "doc_id",
        {"en": 0.5, "zh": 0.25, "de": 0.1},
        default_fraction=0.05,
        seed="r2",
    )
    return (
        sampled.groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .transform(_ordered, "lang")
    )


def q73_keyword_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-3 TF-IDF keywords per document — the interpretable
    twin of q42's ML-pipeline features. tf/df are plain aggregates; the
    corpus size N folds in via a broadcast 1-row cross join (no driver
    collect, VERDICT r1 lift pattern); ranking is a per-doc window on
    the 6-decimal-floored score so both engines rank identical values
    (tie-break: token asc)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(text.tokens("text")).alias("tok"),
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    # df derives from tf, NOT from a second explode pass: tf's output
    # is exactly the distinct (doc, token) pairs, so count(*) per token
    # IS the document frequency — one tokenize+explode of the corpus
    # instead of two, and a plain count instead of a countDistinct.
    df_ = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "tok")
        .join(F.broadcast(n))
        .withColumn(
            "s6",
            scalars.stable_round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("s6").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "doc_id",
            "rank",
            F.col("tok").alias("token"),
            scalars.stable_round("s6", 4).alias("tfidf"),
        )
        .transform(_ordered, "doc_id", "rank")
    )


def q74_winnow_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting (winnowing, SIGMOD'03 —
    operators/dedup.py winnow_fingerprints): 3-word shingle hashes,
    window-4 minima selected per doc, then doc pairs ranked by shared
    fingerprints — the MOSS plagiarism-detection shape, storing only
    ~2/(w+1) of the shingle hashes. Everything rides one doc-keyed
    exchange until the fingerprint equi-join."""
    from ..operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    return (
        dedup.winnow_shared_pairs(
            docs, "doc_id", "text", k=3, window=4, min_shared=2
        )
        .transform(_ordered, "id_a", "id_b")
    )


def q75_srp_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (operators/similarity.py srp_knn): deterministic
    signed-random-projection buckets (6 hyperplanes of hash-derived ±1
    components, fixed-point projections so the sign bits are
    bit-reproducible in any engine), candidates from a bucket
    equi-join, exact cosine re-rank. The oracle replays the identical
    hyperplanes in SQL — a fully correctness-checked LSH, unlike
    MLlib's RNG-seeded BucketedRandomProjectionLSH (q47's IVF is the
    rows-only scale path)."""
    from ..operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 8)
    return similarity.srp_knn(
        emb, probes, id_col="vec_id", vec_col="embedding", planes=6, k=3
    ).transform(_ordered, "query_id", "rnk")


def q76_salted_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-event-type distinct-user counts via two-phase salted
    aggregation (operators/skew.py salted_distinct_count): event_type
    is a pathological hot key (a handful of values own the whole
    table), so phase 1 distinct-counts (type, hash(user) % 32) shards
    and phase 2 sums — no reducer ever holds a full distinct set.
    Result is row-identical to the naive COUNT(DISTINCT...)."""
    from ..operators import skew

    ev = load_table(spark, sf_dir, "events")
    return skew.salted_distinct_count(
        ev, "event_type", "user_id", salts=32
    ).transform(_ordered, "event_type")


def q77_corpus_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram table: top-10 bigrams per language by occurrence
    (tie: bigram asc) with document frequency — the corpus-statistics
    pass every tokenizer/quality pipeline starts from. One posexplode +
    doc-keyed lead, then a (lang, bigram) aggregate; both
    map-side-combinable, no joins."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        "doc_id",
        F.posexplode(text.tokens("text")).alias("pos", "tok"),
    ).filter(F.col("tok") != "")  # before the window: no empty neighbors
    worder = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        toks.withColumn("nxt", F.lead("tok").over(worder))
        .filter(F.col("nxt").isNotNull())
        .select("lang", "doc_id", F.concat_ws(" ", "tok", "nxt").alias("bigram"))
    )
    agg = big.groupBy("lang", "bigram").agg(
        F.count("*").alias("n"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    # lang is a 5-value key over a vocabulary²-grain table: salted
    # two-phase top-k (per-slice top-10s in parallel, re-rank the tiny
    # survivor set) instead of a lang-partitioned window
    from ..operators.aggregates import top_k_per_group_salted

    return top_k_per_group_salted(
        agg,
        ["lang"],
        [F.col("n").desc(), F.col("bigram").asc()],
        10,
        salt_col=F.xxhash64("bigram"),
    ).transform(_ordered, "lang", "rnk")


def q78_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction + audit (functions/text.py redact_pii/pii_counts),
    driver-checkable: the synthetic corpus contains no PII-shaped spans
    (a bare redaction query would be trivially zero — VERDICT r3 item
    7), so the query SEEDS deterministic spans first: an email on every
    doc, an IPv4 on ``doc_id % 3 == 0``, a phone on ``doc_id % 5 == 0``
    — pure functions of doc_id, replayable identically in any engine.
    Output: per-language match counts before redaction and the
    RESIDUAL match count after (the audit invariant — must be 0).
    Chained ``regexp_replace``/``regexp_count`` column expressions,
    whole-stage codegen end to end, one groupBy shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "lang",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".7"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0, F.lit(" call +1 555-000-1234")
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    before = text.pii_counts(F.col("t"))
    after = text.pii_counts(text.redact_pii(F.col("t")))
    return (
        seeded.select("lang", before.alias("b"), after.alias("a"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("b.email").alias("n_email"),
            F.sum("b.ipv4").alias("n_ipv4"),
            F.sum("b.phone").alias("n_phone"),
            F.sum(
                F.col("a.email") + F.col("a.ipv4") + F.col("a.phone")
            ).alias("n_residual"),
        )
        .transform(_ordered, "lang")
    )


def q79_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 change-history compaction (operators/merge.py
    scd2_compact): each user's event_type stream collapses to validity
    intervals — the dimension-history table a warehouse MERGE pipeline
    maintains. One (user)-keyed window shuffle; the change-detect lag
    and the interval lead share a single Exchange+Sort. Restricted to
    user_id < 100 to keep the oracle compare bounded; (ts, event_id)
    gives each key a total order so the compaction is deterministic."""
    from ..operators.merge import scd2_compact

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    hist = scd2_compact(
        ev.select("user_id", "event_type", "ts", "event_id"),
        ["user_id"],
        "event_type",
        ts_col="ts",
        tie_breaks=["event_id"],
    )
    return hist.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        "is_current",
    ).transform(_ordered, "user_id", "valid_from")


def q80_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END curation: the composed corpus-in → training-set-out
    flow every stage of which is individually oracle-checked (q22
    quality, q15 exact dedup, q72 stratified sampling, q64 token
    budget) — quality gate ≥ 0.5 → fingerprint dedup (smallest doc_id
    survives) → per-language deterministic sample → per-language doc +
    token budget with an id checksum. Plan shape: one scan feeds the
    quality filter and fingerprint window (fp-keyed shuffle), the
    sample predicate is a pure filter, and the budget is one aggregate
    — at 100 TB the only data-dependent exchange is the fingerprint
    window, exactly like q15."""
    from ..operators.quality import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    passed = docs.filter(text.quality_score("text") >= 0.5)
    w = Window.partitionBy("fp").orderBy("doc_id")
    kept = (
        passed.withColumn("fp", text.fingerprint("text"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .drop("fp", "rnk")
    )
    sampled = stratified_sample(
        kept,
        "lang",
        "doc_id",
        {"en": 0.5, "zh": 0.25, "de": 0.1},
        default_fraction=0.05,
        seed="cur",
    )
    return (
        sampled.select(
            "lang",
            "doc_id",
            text.token_count("text").alias("ws"),
            text.bpe_token_count("text").alias("bpe"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .transform(_ordered, "lang")
    )


def q81_gap_filled_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly activity series, gap-filled forward
    (operators/timeseries.py gap_fill): irregular events → the dense
    fixed-step grid a forecasting/feature pipeline consumes. Grid rows
    are bounded per key (span/step), the observation join shares the
    (user, bucket) keying with the aggregation, and the forward fill
    is one window — no self-join. Users < 20 keeps the compare
    bounded; value sums are rounded in-plan (determinism rule)."""
    from ..operators.timeseries import gap_fill

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    series = gap_fill(
        ev,
        ["user_id"],
        "ts",
        F.round(F.sum("value"), 2),
        step_seconds=86400,
        fill="forward",
    )
    return series.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        F.round("value", 2).alias("value"),
        "is_gap",
    ).transform(_ordered, "user_id", "bucket")


def q82_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase
    (operators/funnel.py): per-stage user counts + conversion ratios.
    One per-user window partitioning carries every stage (no per-step
    self-joins); the rollup is a single aggregate + struct explode."""
    from ..operators.funnel import funnel_counts

    ev = load_table(spark, sf_dir, "events")
    return funnel_counts(ev, ["view", "click", "purchase"]).transform(
        _ordered, "stage"
    )


def q83_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    counted per weekly offset they return in. Two aggregates — first
    activity per user (map-side-combinable min), distinct
    (user, activity-week) — joined on user; the cohort grain re-uses
    the user keying. datediff on DATEs (engine-portable; week trunc is
    ISO-Monday in both engines)."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    weeks = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("act_week")
    ).distinct()
    return (
        weeks.join(first, "user_id")
        .select(
            "cohort_week",
            (F.datediff("act_week", "cohort_week") / 7).cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_users",
        )
        .transform(_ordered, "cohort_week", "week_offset")
    )


def q84_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup (operators/dedup.py chunk_dedup):
    fixed 8-token chunks, first corpus-wide occurrence retained — the
    distributed stand-in for RefinedWeb/MassiveText exact-substring
    dedup (suffix arrays don't shard; fixed windows do). Per-lang
    rollup: chunk totals, retained counts, docs that lost >= 1 chunk.
    Shape: chunking is array exprs in the scan projection, ONE window
    shuffle on the 60-bit chunk hash, then a doc-grain aggregate and a
    doc_id-keyed lang join — the same exchange profile as q15 at
    sub-doc grain."""
    from ..operators.dedup import chunk_dedup

    docs = load_table(spark, sf_dir, "documents")
    ch = chunk_dedup(docs, "doc_id", "text", chunk_tokens=8)
    per_doc = ch.groupBy("doc_id").agg(
        F.count("*").alias("nc"),
        F.sum(F.when(F.col("retained"), 1).otherwise(0)).alias("nr"),
    )
    return (
        per_doc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nc").alias("n_chunks"),
            F.sum("nr").alias("n_retained"),
            F.sum(F.when(F.col("nr") < F.col("nc"), 1).otherwise(0)).alias(
                "n_pruned_docs"
            ),
        )
        .transform(_ordered, "lang")
    )


def q85_bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-supervised LM quality signal (operators/quality.py
    bigram_lm_scores): corpus-trained add-k bigram model, per-doc avg
    log2-prob, rolled up per lang (doc count, mean/min/max score).
    The per-doc score is stable_round'ed BEFORE the lang rollup so
    both engines aggregate identical 4-digit inputs. Model tables
    derive from one shingle pass; the lang join is doc-grain."""
    from ..operators.quality import bigram_lm_scores

    docs = load_table(spark, sf_dir, "documents")
    scored = bigram_lm_scores(docs, "doc_id", "text", add_k=0.5)
    return (
        scored.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            scalars.stable_round(F.avg("avg_logp"), 4).alias("mean_logp"),
            scalars.stable_round(F.min("avg_logp"), 4).alias("min_logp"),
            scalars.stable_round(F.max("avg_logp"), 4).alias("max_logp"),
        )
        .transform(_ordered, "lang")
    )


def q86_events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the events table (operators/profile.py):
    null counts, exact cardinalities, ranges, numeric medians — one
    scan, one aggregate, per-column rows unfolded from the 1-row
    result. The exact-distinct Expand is the oracle-checked mode;
    ``approximate=True`` is the Expand-free sketch mode at scale."""
    from ..operators.profile import profile_columns

    ev = load_table(spark, sf_dir, "events")
    return profile_columns(
        ev, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).transform(_ordered, "col_name")


def q86b_events_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-evaluating APPROX profile gate (q119's pattern applied to
    q86): the declared 100 TB mode — ``profile_columns(approximate=
    True)``, one single-pass Expand-free aggregate with HLL sketches —
    checked INSIDE the query against exact per-column distincts:
    ``within_rsd`` asserts |hll − exact| / exact ≤ 3·rsd (rsd 0.05).
    The oracle recomputes n_rows/n_null exactly and expects every
    tolerance flag TRUE, so HLL drift beyond tolerance is a hash
    FAIL — the sketch path is oracle-gated without demanding
    cross-engine sketch equality (DuckDB's HLL differs numerically).
    Spark's HLL is deterministic (xxhash-based), so the flag is
    stable run-to-run.

    The exact side is ONE multi-distinct aggregate (Spark's Expand
    rewrite: a single event scan fanned 6× in-memory, map-side
    partials per column) unpivoted from its 1-row result — not six
    per-column aggregates, which re-scanned events six times (r5
    verdict). Whole query: exactly 2 scans, approx + exact."""
    from ..operators.profile import profile_columns

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ev = load_table(spark, sf_dir, "events")
    approx = profile_columns(ev, cols, approximate=True).select(
        "col_name", "n_rows", "n_null", F.col("n_distinct").alias("nd_hll")
    )
    exact = (
        ev.agg(
            *[F.countDistinct(F.col(c)).alias(f"__nd_{c}") for c in cols]
        )
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("col_name"),
                            F.col(f"__nd_{c}").alias("nd_exact"),
                        )
                        for c in cols
                    ]
                )
            ).alias("__s")
        )
        .select("__s.col_name", "__s.nd_exact")
    )
    return (
        approx.join(F.broadcast(exact), "col_name")
        .select(
            "col_name",
            "n_rows",
            "n_null",
            (
                F.abs(F.col("nd_hll") - F.col("nd_exact")).cast("double")
                / F.col("nd_exact").cast("double")
                <= F.lit(0.15)
            ).alias("within_rsd"),
        )
        .transform(_ordered, "col_name")
    )


def q87_item_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (operators/graph.py) over the
    symmetrized item co-occurrence graph (q54's edges, min_support 3)
    — graph-structural importance, the link-analysis complement to
    count-based popularity. 3 rounds, damping 0.85, dangling mass
    redistributed; the DuckDB twin unrolls the identical rounds as
    CTEs, so this is an ITERATIVE algorithm with an exact oracle.
    Per round: one src-keyed join + one dst-keyed aggregate; lineage
    cut per round with lazy localCheckpoint (q66's CC discipline)."""
    from ..operators import cooccur
    from ..operators.graph import pagerank

    ev = load_table(spark, sf_dir, "events")
    ui = (
        ev.select("user_id", F.expr("json_tuple(props, 'k')").alias("k0"))
        .select("user_id", F.col("k0").cast("int").alias("item_id"))
        .filter(F.col("item_id").isNotNull())
        .distinct()
    )
    pairs = cooccur.cooccurrence_pairs(
        ui, min_support=3,
        max_items_per_user=cooccur.DEFAULT_MAX_ITEMS_PER_USER,
    )
    edges = pairs.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    ).union(
        pairs.select(F.col("item_b").alias("src"), F.col("item_a").alias("dst"))
    )
    return (
        pagerank(edges, damping=0.85, iterations=3)
        .select(
            F.col("node").alias("item_id"),
            scalars.stable_round("rank", 6).alias("rank"),
        )
        .transform(_ordered, "item_id")
    )


def q88_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection (operators/timeseries.py mad_outliers):
    per-event-type median/MAD outlier flags on the value metric,
    rolled up to counts — the monitoring rule that survives the
    outliers it hunts (mean/σ does not). Exact grouped percentiles
    are the oracle-checked mode; approx_percentile is the sketch mode
    at extreme group cardinality."""
    from ..operators.timeseries import mad_outliers

    ev = load_table(spark, sf_dir, "events")
    flagged = mad_outliers(ev, ["event_type"], "value", n_mads=3.0)
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            scalars.stable_round(F.max("med"), 4).alias("med"),
            scalars.stable_round(F.max("mad"), 4).alias("mad"),
            F.sum(F.when(F.col("is_outlier"), 1).otherwise(0)).alias(
                "n_outliers"
            ),
        )
        .transform(_ordered, "event_type")
    )


def q89_weighted_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted deterministic corpus sampling
    (operators/quality.py weighted_sample, Efraimidis–Spirakis): 10
    docs per lang drawn with probability ∝ token count — the unbiased
    way to sample a fixed doc count when the budget is measured in
    TOKENS. Fully replayable (seeded md5 keys), so the DuckDB twin
    draws the identical sample. One hash + one per-lang top-k
    window."""
    from ..operators.quality import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    with_w = docs.select(
        "lang", "doc_id", text.token_count("text").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    return (
        weighted_sample(with_w, "lang", "doc_id", "n_tokens", k=10, seed="es")
        .select("lang", "doc_id", "n_tokens", "rnk")
        .transform(_ordered, "lang", "rnk")
    )


def q90_user_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic (operators/skew.py skew_report) on
    events.user_id — the measurement that decides plain shuffle vs
    AQE skew-split vs salted_join before a 100 TB join. One combinable
    groupBy + 1-row totals broadcast + TakeOrdered top-10."""
    from ..operators.skew import skew_report

    ev = load_table(spark, sf_dir, "events")
    return skew_report(ev, "user_id", top_k=10)


def q91_rolling_user_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE rolling window: per-user trailing-3-day spend/count
    at every event — the value-based frame (rangeBetween on epoch
    seconds) that row-frames can't express over irregular events.
    The frame sorts within the user partition only (no global sort);
    the sum rides the exact-decimal trick (q24) so shuffle order can't
    perturb float totals."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    sec = F.floor(scalars.epoch_seconds("ts")).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-259200, Window.currentRow)
    )
    return (
        ev.withColumn("sec", sec)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .over(w)
            .cast("double")
            .alias("spend_3d"),
            F.count("*").over(w).alias("n_3d"),
        )
        .transform(_ordered, "user_id", "event_id")
    )


def q92_priority_status_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test (operators/aggregates.py
    chi_square) between order priority and order status — the
    categorical-drift check a pipeline runs on dimensions vs
    outcomes. One data-grain aggregate; all statistic arithmetic on
    the r×c contingency table."""
    from ..operators.aggregates import chi_square

    orders = load_table(spark, sf_dir, "orders")
    return chi_square(orders, "o_orderpriority", "o_orderstatus")


def q93_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing (operators/quality.py
    pack_sequences): docs laid head-to-tail per lang in doc_id order,
    cut into 2048-token packs; per-pack doc/token totals. Integer
    window cumsum — exact in any engine, one stratum-keyed
    exchange."""
    from ..operators.quality import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    with_tok = docs.select(
        "lang", "doc_id", text.token_count("text").alias("n_tokens")
    )
    packed = pack_sequences(with_tok, "lang", "doc_id", "n_tokens", budget=2048)
    return (
        packed.groupBy("lang", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .transform(_ordered, "lang", "pack_id")
    )


def q94_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-based survivorship (operators/dedup.py
    select_canonicals): near-dup clusters (q66's LSH pair list +
    fixed-depth CC) keep their BEST-quality member, not an arbitrary
    id — per multi-doc cluster: size, canonical doc, canonical
    quality. Oracle recomputes the clusters as a recursive-CTE
    closure and the quality score with q22's exact SQL twin."""
    from ..operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=32, bands=8, k=3, verify_threshold=0.5
    )
    scored = docs.select("doc_id", text.quality_score("text").alias("quality"))
    ranked = dedup.select_canonicals(
        scored, pairs, "doc_id", "quality", assume_diameter=3
    )
    return (
        ranked.filter(F.col("n_members") >= 2)
        .groupBy("cluster")
        .agg(
            F.max("n_members").alias("n_members"),
            F.min(F.when(F.col("is_canonical"), F.col("doc_id"))).alias(
                "canonical_id"
            ),
            F.min(F.when(F.col("is_canonical"), F.col("quality"))).alias(
                "canonical_quality"
            ),
        )
        .transform(_ordered, "cluster")
    )


def q95_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion dedup (operators/dedup.py
    dedup_against_store): the 20 % batch (doc_id ≡ 0 mod 5) checked
    against the fingerprint store built from the other 80 %, then
    exact-deduped within itself — per-(lang, verdict) counts. The
    store side is fingerprints only: the compact state a forever-
    ingesting pipeline checkpoints."""
    from ..operators.dedup import dedup_against_store

    docs = load_table(spark, sf_dir, "documents")
    history = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    store = history.select(text.fingerprint("text").alias("fp"))
    out = dedup_against_store(batch, store, "doc_id", "text")
    return (
        out.groupBy("lang", "verdict")
        .agg(F.count("*").alias("n"))
        .transform(_ordered, "lang", "verdict")
    )


def q96_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/valid/test split (operators/quality.py
    group_split): every user's events land in ONE split via the
    seeded md5 bucket of the user id — the discipline row-level
    randomSplit violates for grouped data. Output per split: distinct
    users, events, value total — plus the straddle invariant (users
    in >1 split; 0 by construction, still computed as the checked
    contract)."""
    from ..operators.quality import group_split

    ev = load_table(spark, sf_dir, "events")
    tagged = group_split(ev, "user_id")
    # ONE fact pass: pre-aggregate to (user, split) grain — the split
    # tag adds no shuffle, so this is the query's only fact-grain
    # exchange — then both outputs (straddle audit, per-split stats)
    # roll up from the pre-aggregate. (user, split) rows are unique,
    # so count(*) per split ≡ countDistinct(user) and per-user split
    # counts ≡ countDistinct(split); decimal sums re-associate
    # exactly. Lazy localCheckpoint: two consumers, one execution.
    pre = (
        tagged.groupBy("user_id", "split")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("v"),
        )
        .localCheckpoint(eager=False)
    )
    leaked = (
        pre.groupBy("user_id")
        .agg(F.count("*").alias("ns"))
        .agg(
            F.sum(F.when(F.col("ns") > 1, 1).otherwise(0)).alias(
                "leaked_groups"
            )
        )
    )
    return (
        pre.groupBy("split")
        .agg(
            # count(user_id): non-null users only, preserving the old
            # countDistinct semantics for inputs with NULL group keys
            F.count("user_id").alias("n_users"),
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("v"), 2).cast("double").alias("value_total"),
        )
        .crossJoin(F.broadcast(leaked))
        .transform(_ordered, "split")
    )


def q97_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus lexical-diversity metrics per lang: type-token ratio
    and distinct-bigram ratio — the self-BLEU-adjacent diversity
    check run before training on generated/augmented text (low
    diversity = mode-collapsed or boilerplate-heavy slices).

    ONE corpus pass (r6 rewrite; was two scans + a shingle-grain
    join): posexplode tokens once, lead() over the doc-keyed window
    builds each bigram in codegen (shingle_rows' own O(n)-per-doc
    discipline), and a single multi-distinct aggregate rolls up all
    four metrics. The multi-distinct Expand here is the harmless kind
    (q86's lesson): 3x token rows through map-side partials that
    collapse to DISTINCT (lang, value) pairs - vocabulary-bounded
    shuffle state, vs. the old plan shuffling every shingle row
    through the lang join."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.col("doc_id"),
        F.posexplode(text.tokens("text")).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    paired = toks.withColumn("nxt", F.lead("tok").over(w))
    agg = paired.groupBy("lang").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("tok").alias("n_types"),
        F.count("nxt").alias("n_bigrams"),
        F.countDistinct(
            F.when(
                F.col("nxt").isNotNull(),
                F.concat_ws(" ", F.col("tok"), F.col("nxt")),
            )
        ).alias("n_distinct_bigrams"),
    )
    return (
        agg
        .select(
            "lang",
            "n_tokens",
            "n_types",
            scalars.stable_round(F.col("n_types") / F.col("n_tokens"), 4).alias(
                "ttr"
            ),
            "n_bigrams",
            "n_distinct_bigrams",
            scalars.stable_round(
                F.col("n_distinct_bigrams") / F.col("n_bigrams"), 4
            ).alias("bigram_diversity"),
        )
        .transform(_ordered, "lang")
    )


def q98_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (operators/aggregates.py
    equi_width_histogram) of order totals, 10 data-derived bins —
    min/max fold in as a 1-row broadcast, binning is per-row float
    arithmetic (order-independent → cross-engine bit parity), one
    combinable groupBy."""
    from ..operators.aggregates import equi_width_histogram

    orders = load_table(spark, sf_dir, "orders")
    return equi_width_histogram(orders, "o_totalprice", bins=10).transform(
        _ordered, "bin"
    )


def q99_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (operators/aggregates.py gini_index):
    Gini over per-customer revenue — rank·value products summed as
    exact decimals, only the closed-form division touches floats.
    The fact join shuffles on orderkey; the ranking runs at customer
    (dim) grain."""
    from ..operators.aggregates import gini_index

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            # decimal-exact sum: the ranking value must be engine-
            # identical at any scale (see q117)
            F.round(F.sum(_revenue().cast("decimal(18,4)")), 2).alias("rev")
        )
    )
    return gini_index(per_cust, "rev", "o_custkey").select(
        F.col("n").alias("n_customers"),
        F.round("total", 2).alias("total_revenue"),
        "gini",
    )


def q100_item_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census (operators/graph.py triangle_count) of the
    item co-occurrence graph — community density in one number
    (global clustering coefficient). Degree-ORIENTED wedge join, so
    per-node fan-out is bounded by oriented out-degree (O(√m)), never
    the raw hub degree; the oracle is the naive 3-way self-join,
    which agrees exactly at test scale."""
    from ..operators import cooccur
    from ..operators.graph import triangle_count

    ev = load_table(spark, sf_dir, "events")
    ui = (
        ev.select("user_id", F.expr("json_tuple(props, 'k')").alias("k0"))
        .select("user_id", F.col("k0").cast("int").alias("item_id"))
        .filter(F.col("item_id").isNotNull())
        .distinct()
    )
    pairs = cooccur.cooccurrence_pairs(
        ui, min_support=3,
        max_items_per_user=cooccur.DEFAULT_MAX_ITEMS_PER_USER,
    )
    return triangle_count(
        pairs.select(F.col("item_a").alias("src"), F.col("item_b").alias("dst"))
    )


def q101_daily_value_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resample (operators/timeseries.py resample_ohlc): the
    event value series downsampled to daily buckets per event_type —
    open/close are first/last by (ts, event_id), deterministic under
    timestamp ties (why the operator ranks instead of arg_min). One
    (key, bucket) window + one same-keyed aggregate."""
    from ..operators.timeseries import resample_ohlc

    ev = load_table(spark, sf_dir, "events")
    out = resample_ohlc(
        ev, ["event_type"], "ts", "value", "event_id", step_seconds=86400
    )
    return out.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd").alias("day"),
        F.round("open", 4).alias("open"),
        F.round("high", 4).alias("high"),
        F.round("low", 4).alias("low"),
        F.round("close", 4).alias("close"),
        "n",
    ).transform(_ordered, "event_type", "day")


def q102_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (operators/merge.py snapshot_diff):
    orders vs a deterministically perturbed twin (keys % 97 removed,
    % 13 repriced, % 89 re-keyed as inserts) — verdict counts +
    changed-column totals. One full-outer key join; the audit every
    MERGE deserves."""
    from ..operators.merge import snapshot_diff

    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    surv = orders.filter(k % 97 != 0).withColumn(
        "o_totalprice",
        F.when(
            k % 13 == 0,
            scalars.stable_round(F.col("o_totalprice") * 1.1, 2),
        ).otherwise(F.col("o_totalprice")),
    )
    # negated key, same reasoning as q128: +1e9 collided at SF>=167
    added = orders.filter(k % 89 == 0).withColumn("o_orderkey", -k)
    new = surv.unionByName(added)
    diff = snapshot_diff(
        orders, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )
    return (
        diff.groupBy("verdict")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_changed_cols").alias("changed_cols"),
        )
        .transform(_ordered, "verdict")
    )


def q103_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup (operators/dedup.py
    containment_pairs): pairs where the smaller doc's 3-shingle set
    is ≥ 50 % contained in the other — the excerpt/subset rule
    Jaccard can't express. Same shingle-join shuffle shape as q17."""
    from ..operators.dedup import containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(
        docs, "doc_id", "text", k=3, threshold=0.5
    ).transform(_ordered, "id_a", "id_b")


def q104_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit: orphan child rows per
    FK edge (lineitem→orders, orders→customer) — the constraint check
    a lakehouse runs per load since parquet enforces nothing. Each
    edge is one left_anti count; the parent side ships as a broadcast
    when dim-sized, and the anti-join pushes the single needed column
    into both scans."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def edge(name: str, child: DataFrame, ck: str, parent: DataFrame, pk: str):
        n_child = child.agg(F.count("*").alias("n_child_rows"))
        orphans = (
            child.select(F.col(ck))
            .join(parent.select(F.col(pk).alias(ck)), ck, "left_anti")
            .agg(F.count("*").alias("n_orphans"))
        )
        return n_child.crossJoin(F.broadcast(orphans)).select(
            F.lit(name).alias("fk_edge"), "n_child_rows", "n_orphans"
        )

    a = edge("lineitem->orders", li, "l_orderkey", orders, "o_orderkey")
    b = edge("orders->customer", orders, "o_custkey", cust, "c_custkey")
    return a.unionByName(b).transform(_ordered, "fk_edge")


def q105_session_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session behavior mining: event-type transition counts
    (Markov edges) inside 30-min-gap sessions (q25's sessionization),
    top-10 — the journey analysis a product pipeline derives from the
    same single per-user window chain: gap→session cumsum→lag
    transition, ONE user-keyed exchange end to end."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = scalars.epoch_seconds("ts")
    gap = ts_s - F.lag(ts_s).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800.0), 1).otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessioned = ev.withColumn("new_sess", new_sess).withColumn(
        "session_id", F.sum("new_sess").over(wrun)
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    trans = (
        sessioned.withColumn("prev_type", F.lag("event_type").over(ws))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    return (
        trans.orderBy(F.desc("n"), F.asc("prev_type"), F.asc("next_type"))
        .limit(10)
    )


def q106_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-walk-with-restart item recommendations
    (operators/graph.py personalized_pagerank): restart vector on the
    seed items (ids ≡ 0 mod 10), 3 rounds over the symmetrized
    co-occurrence graph — the graph-native collaborative signal
    complementing ALS (q40) and content cosine (q16). Exact unrolled-
    CTE oracle, like q87."""
    from ..operators import cooccur
    from ..operators.graph import personalized_pagerank

    ev = load_table(spark, sf_dir, "events")
    ui = (
        ev.select("user_id", F.expr("json_tuple(props, 'k')").alias("k0"))
        .select("user_id", F.col("k0").cast("int").alias("item_id"))
        .filter(F.col("item_id").isNotNull())
        .distinct()
    )
    pairs = cooccur.cooccurrence_pairs(
        ui, min_support=3,
        max_items_per_user=cooccur.DEFAULT_MAX_ITEMS_PER_USER,
    )
    edges = pairs.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    ).union(
        pairs.select(F.col("item_b").alias("src"), F.col("item_a").alias("dst"))
    )
    seeds = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .filter(F.col("node") % 10 == 0)
    )
    return (
        personalized_pagerank(edges, seeds, damping=0.85, iterations=3)
        .select(
            F.col("node").alias("item_id"),
            scalars.stable_round("rank", 6).alias("rank"),
        )
        .transform(_ordered, "item_id")
    )


def q107_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment analysis: 50/50 deterministic assignment
    (group_split's md5 buckets as the hypothetical treatment flag),
    purchase conversion per arm, two-proportion z-statistic — the
    readout every A/B pipeline computes. All counts integer-exact;
    the z formula is one shared-IEEE expression over them."""
    from ..operators.quality import group_split

    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    assigned = group_split(
        users, "user_id",
        fractions={"control": 0.5, "treatment": 0.5}, seed="ab",
    )
    # conversion = above-median total purchase value: ~50 % base rate
    # at ANY scale factor (a has-any-purchase rule saturates to p = 1
    # on dense event data, making the z denominator exactly 0)
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("tv")
        )
    )
    med = per_user.agg(F.percentile(F.col("tv"), F.lit(0.5)).alias("m"))
    conv = (
        per_user.crossJoin(F.broadcast(med))
        .filter(F.col("tv") > F.col("m"))
        .select("user_id")
        .withColumn("__c", F.lit(1))
    )
    j = assigned.join(conv, "user_id", "left")
    arm = j.groupBy("split").agg(
        F.count("*").alias("n"),
        F.sum(F.coalesce(F.col("__c"), F.lit(0))).alias("k"),
    )
    one = arm.agg(
        F.max(F.when(F.col("split") == "control", F.col("n"))).alias("n_c"),
        F.max(F.when(F.col("split") == "control", F.col("k"))).alias("k_c"),
        F.max(F.when(F.col("split") == "treatment", F.col("n"))).alias("n_t"),
        F.max(F.when(F.col("split") == "treatment", F.col("k"))).alias("k_t"),
    )
    p_c = F.col("k_c") / F.col("n_c")
    p_t = F.col("k_t") / F.col("n_t")
    p = (F.col("k_c") + F.col("k_t")) / (F.col("n_c") + F.col("n_t"))
    z = (p_t - p_c) / F.sqrt(
        p * (1 - p) * (1.0 / F.col("n_c") + 1.0 / F.col("n_t"))
    )
    return one.select(
        "n_c", "k_c", "n_t", "k_t",
        scalars.stable_round(p_c, 6).alias("rate_control"),
        scalars.stable_round(p_t, 6).alias("rate_treatment"),
        scalars.stable_round(z, 4).alias("z_score"),
    )


def q108_value_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization: percent_rank of the value metric
    within its event_type — the rank-based feature transform that is
    robust to arbitrary metric distributions. event_type is a
    LOW-CARDINALITY key (a type-keyed window funnels 1/|types| of the
    fact table through one task each), so the rank is two-phase
    (operators/ranks.py): per-(type, value-bin) counts → offsets →
    bin-partitioned local rank(); percent_rank reconstructs as
    (rank-1)/(n-1), its exact definition. Output bounded to users < 5
    for the compare."""
    from ..operators.ranks import bucketed_rank, with_equi_width_bucket

    ev = load_table(spark, sf_dir, "events")
    ranked = bucketed_rank(
        with_equi_width_bucket(ev, "value", group=["event_type"]),
        [F.col("value").asc()],
        ["__vb"],
        group=["event_type"],
        out="__rk",
        method="rank",
    )
    n_per = ev.groupBy("event_type").agg(F.count("*").alias("__n"))
    pct = F.when(
        F.col("__n") > 1,
        (F.col("__rk") - 1).cast("double") / (F.col("__n") - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        ranked.join(F.broadcast(n_per), "event_type")
        .withColumn("pct", pct)
        .filter(F.col("user_id") < 5)
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            scalars.stable_round("pct", 6).alias("pct"),
        )
        .transform(_ordered, "event_type", "event_id")
    )


def q109_label_scatter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-class separability report: per-label centroid (one
    (label, dim) aggregate over the exploded vectors) and intra-class
    L2² scatter stats — the Fisher-style check run before trusting
    labels for supervised filtering. Two exchanges: the (label, dim)
    centroid aggregate and the vec-grain distance rollup; the
    centroid table is dims×labels — broadcastable at any corpus
    size."""
    emb = load_table(spark, sf_dir, "embeddings")
    expl = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("dim", "x"),
    ).withColumn("x", F.col("x").cast("double"))
    cent = expl.groupBy("label", "dim").agg(F.avg("x").alias("c"))
    dist = (
        expl.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            scalars.stable_round(
                F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))),
                4,
            ).alias("d2")
        )
    )
    return (
        dist.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            scalars.stable_round(F.avg("d2"), 4).alias("mean_scatter"),
            scalars.stable_round(F.max("d2"), 4).alias("max_scatter"),
        )
        .transform(_ordered, "label")
    )


def q110_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency diagnostic (operators/aggregates.py
    linear_fit): OLS slope of ln(freq) on ln(rank) over the token
    frequency table — natural-language corpora sit near slope −1;
    synthetic/boilerplate slices drift, making this a corpus sanity
    gate. The VOCABULARY-grain total order is delivered by the
    two-phase bucketed rank (operators/ranks.py): buckets are
    (-count, 2-char token prefix) — exact per-frequency offsets, the
    huge count=1 tail sub-split by prefix — so no single task ever
    sorts the vocabulary; the fit is one combinable aggregate."""
    from ..operators.aggregates import linear_fit
    from ..operators.ranks import bucketed_rank

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(text.tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    ranked = bucketed_rank(
        freq,
        [F.col("c").desc(), F.col("tok").asc()],
        [(-F.col("c")), F.substring("tok", 1, 2)],
        out="__rn",
    )
    pts = ranked.select(
        F.log(F.col("__rn").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    return linear_fit(pts, "x", "y")


def q111_daily_event_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-trend drift monitor (linear_fit per group): daily event
    counts per type regressed on day index from each type's first day
    — the slope a pipeline alerts on when ingest volume decays. Day
    indexing is one type-partitioned window min; the fit aggregates
    per type."""
    from ..operators.aggregates import linear_fit

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("c"))
    wmin = Window.partitionBy("event_type")
    pts = daily.select(
        "event_type",
        F.datediff(F.col("d"), F.min("d").over(wmin)).alias("x"),
        F.col("c").alias("y"),
    )
    return linear_fit(pts, "x", "y", ["event_type"]).transform(
        _ordered, "event_type"
    )


def q112_type_hour_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (operators/aggregates.py mutual_information)
    between event type and hour-of-day — quantifies HOW MUCH temporal
    signal the type carries (feature-relevance, beyond q92's
    significance test). One data-grain aggregate; all information
    arithmetic on the contingency table."""
    from ..operators.aggregates import mutual_information

    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        "event_type", F.hour("ts").cast("string").alias("hr")
    )
    return mutual_information(tagged, "event_type", "hr")


def q113_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size distribution: q66's LSH pair list →
    connected components → how many clusters of each size — the
    dedup-report histogram that tells you whether duplication is
    pairwise noise or mirror farms. Component grain only after the
    clustering; the histogram is two tiny aggregates."""
    from ..operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=32, bands=8, k=3, verify_threshold=0.5
    )
    comp = dedup.connected_components(pairs, assume_diameter=3)
    sizes = comp.groupBy("comp").agg(F.count("*").alias("size"))
    return (
        sizes.groupBy("size")
        .agg(F.count("*").alias("n_clusters"))
        .transform(_ordered, "size")
    )


def q114_cross_source_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-slice novelty: for each source, the fraction of its
    distinct bigrams absent from every OTHER source — the dataset-
    version drift check run before mixing a new crawl into a trained
    corpus. One bigram pass; the membership test is a left_anti on
    the bigram string."""
    from ..operators.dedup import shingle_rows

    docs = load_table(spark, sf_dir, "documents")
    bg = (
        shingle_rows(docs, "doc_id", "text", 2)
        .join(docs.select("doc_id", "source"), F.col("sid") == F.col("doc_id"))
        .select("source", "sh")
        .distinct()
        # three consumers (per-source counts + both sides of the
        # membership semi-join) — tokenize/shingle the corpus ONCE
        .localCheckpoint(eager=False)
    )
    per_src = bg.groupBy("source").agg(F.count("*").alias("n_bigrams"))
    other = bg.alias("x").join(
        bg.alias("y"),
        (F.col("x.sh") == F.col("y.sh")) & (F.col("x.source") != F.col("y.source")),
        "left_semi",
    )
    shared = other.groupBy("source").agg(F.count("*").alias("n_shared"))
    return (
        per_src.join(shared, "source", "left")
        .select(
            "source",
            "n_bigrams",
            F.coalesce(F.col("n_shared"), F.lit(0)).alias("n_shared"),
            scalars.stable_round(
                (F.col("n_bigrams") - F.coalesce(F.col("n_shared"), F.lit(0)))
                / F.col("n_bigrams"),
                4,
            ).alias("novelty"),
        )
        .transform(_ordered, "source")
    )


def q115_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship latency distribution per priority: discrete
    median/p90 of days-to-ship (q28's engine-portable percentile
    method) + mean — the operational-SLA readout.

    days-to-ship is a BOUNDED-DOMAIN integer (TPC-H ships within ~4
    months), so the whole distribution collapses to a (priority, days)
    count table in ONE combinable fact-grain aggregate; the discrete
    value-at-rank ceil(q·n) is then the smallest days whose cumulative
    count reaches the rank — identical to the rank-window definition
    (ties on days all carry the same value), with every window running
    on the ~5×180-row count table, never at fact grain. The oracle
    keeps the literal rank-window form; both agree exactly."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lat = li.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        li["l_orderkey"] == orders["o_orderkey"],
    ).select(
        "o_orderpriority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "days"
        ),
    )
    grp = lat.groupBy("o_orderpriority", "days").agg(
        F.count("*").alias("cnt")
    # two consumers (cumulative window + totals) — run the fact join
    # once; the count table itself is ~5×180 rows
    ).localCheckpoint(eager=False)
    wcum = (
        Window.partitionBy("o_orderpriority")
        .orderBy("days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grp.withColumn("cum", F.sum("cnt").over(wcum))
    tot = grp.groupBy("o_orderpriority").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("days").cast("long") * F.col("cnt")).alias("sd"),
    )

    def disc(q: float) -> F.Column:
        rank = F.ceil(F.lit(q) * F.col("n")).cast("long")
        return F.min(F.when(F.col("cum") >= rank, F.col("days")))

    return (
        cum.join(F.broadcast(tot), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.max("n").alias("n_lines"),
            scalars.stable_round(
                F.max("sd").cast("double") / F.max("n").cast("double"), 4
            ).alias("mean_days"),
            disc(0.5).alias("median_days"),
            disc(0.9).alias("p90_days"),
        )
        .transform(_ordered, "o_orderpriority")
    )


def q116_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules from the co-occurrence pairs (q54's support
    machinery): directional confidence P(b|a) = n_co / n_a for both
    orientations, top-20 by confidence — item-based CF's
    interpretable rule form. The item-support join is UN-hinted: the
    item vocabulary is unbounded at corpus scale, so AQE decides
    broadcast-vs-shuffle from actual support-table stats."""
    from ..operators import cooccur

    ev = load_table(spark, sf_dir, "events")
    ui = (
        ev.select("user_id", F.expr("json_tuple(props, 'k')").alias("k0"))
        .select("user_id", F.col("k0").cast("int").alias("item_id"))
        .filter(F.col("item_id").isNotNull())
        .distinct()
    )
    pairs = cooccur.cooccurrence_pairs(
        ui, min_support=3,
        max_items_per_user=cooccur.DEFAULT_MAX_ITEMS_PER_USER,
    )
    supp = ui.groupBy(F.col("item_id").alias("iid")).agg(
        F.count("*").alias("n")
    )
    both = pairs.select(
        F.col("item_a").alias("ante"), F.col("item_b").alias("cons"), "n_co"
    ).union(
        pairs.select(
            F.col("item_b").alias("ante"), F.col("item_a").alias("cons"), "n_co"
        )
    )
    rules = both.join(
        supp, F.col("ante") == F.col("iid")
    ).select(
        "ante",
        "cons",
        "n_co",
        F.col("n").alias("n_ante"),
        scalars.stable_round(F.col("n_co") / F.col("n"), 4).alias("confidence"),
    )
    return rules.orderBy(
        F.desc("confidence"), F.asc("ante"), F.asc("cons")
    ).limit(20)


def q117_revenue_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve deciles for customer revenue (q99's Gini,
    spatialized): customers ranked by revenue into 10 ntiles,
    cumulative share of revenue per decile — exact-decimal sums, one
    closed-form division per row. The dashboard twin of the scalar
    Gini.

    The ntile is DISTRIBUTED (operators/ranks.py): two-phase bucketed
    rank + the closed-form ntile reconstruction — customer rows never
    funnel through a single-partition window; the only unpartitioned
    windows left run on the bucket-count and 10-row decile tables."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li["l_orderkey"] == orders["o_orderkey"],
        )
        .groupBy("o_custkey")
        .agg(
            # decimal-exact summation (q121's pattern): double sums are
            # ORDER-DEPENDENT, and at sf0.1 a handful of customers land
            # on different cents across engines — which swaps decile
            # membership at rank boundaries. Summing per-row
            # decimal(18,4) casts is associative-exact, so the ranking
            # value is engine-identical at any scale.
            F.round(F.sum(_revenue().cast("decimal(18,4)")), 2)
            .cast("decimal(18,2)")
            .alias("rev")
        )
    )
    from ..operators.ranks import (
        bucketed_rank,
        ntile_from_rank,
        with_equi_depth_bucket,
    )

    # three consumers (rank chain, total count, total revenue) — cut
    # the fact-join lineage once so it runs once
    per_cust = per_cust.localCheckpoint(eager=False)
    # equi-DEPTH buckets: per-customer revenue is Pareto-shaped, so
    # width bins concentrate; depth bins stay ~n/256 rows each and the
    # rank (hence every output value) is identical under either scheme
    ranked = bucketed_rank(
        with_equi_depth_bucket(per_cust, "rev"),
        [F.col("rev").asc(), F.col("o_custkey").asc()],
        ["__vb"],
        out="__rn",
    )
    n_tot = per_cust.agg(F.count("*").alias("__n"))
    tiled = ranked.crossJoin(F.broadcast(n_tot)).withColumn(
        "decile", ntile_from_rank(F.col("__rn"), F.col("__n"), 10)
    )
    per_dec = tiled.groupBy("decile").agg(
        F.count("*").alias("n_customers"), F.sum("rev").alias("d_rev")
    )
    # total revenue == sum over deciles; computing it from per_cust
    # keeps the rank chain single-consumer (no duplicated window)
    tot = per_cust.agg(F.sum("rev").alias("t_rev"))
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_dec.crossJoin(F.broadcast(tot))
        .withColumn("cum_rev", F.sum("d_rev").over(wc))
        .select(
            "decile",
            "n_customers",
            F.col("d_rev").cast("double").alias("decile_revenue"),
            scalars.stable_round(
                F.col("cum_rev").cast("double") / F.col("t_rev").cast("double"),
                6,
            ).alias("cum_share"),
        )
        .transform(_ordered, "decile")
    )


def q118_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals — the forensic
    data-quality check for fabricated/synthetic numeric columns:
    observed first-significant-digit frequencies vs log10(1 + 1/d),
    with the chi-square distance. Pure per-row string/log exprs + one
    9-row aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.regexp_replace(
            F.format_number(F.abs(F.col("o_totalprice")), 6), "[0.,]", ""
        ),
        1,
        1,
    ).cast("int")
    obs = (
        orders.filter(F.col("o_totalprice") != 0)
        .withColumn("d", digit)
        .groupBy("d")
        .agg(F.count("*").alias("o"))
    )
    tot = obs.agg(F.sum("o").alias("n"))
    expected = F.log(10.0, 1.0 + 1.0 / F.col("d"))
    cells = obs.crossJoin(F.broadcast(tot)).select(
        "d",
        "o",
        scalars.stable_round(F.col("o") / F.col("n"), 6).alias("obs_freq"),
        scalars.stable_round(expected, 6).alias("benford_freq"),
        ((F.col("o") - expected * F.col("n"))
         * (F.col("o") - expected * F.col("n"))
         / (expected * F.col("n"))).alias("__chi"),
    )
    return cells.select(
        "d", "o", "obs_freq", "benford_freq",
        scalars.stable_round("__chi", 4).alias("chi_term"),
    ).transform(_ordered, "d")


def q119_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELF-EVALUATING ANN quality gate: recall@3 of the
    deterministic SRP-LSH index (q75's exact configuration) against
    brute-force ground truth (q16's), per probe — the recall harness
    every ANN deployment runs, here as a checked QUERY because both
    sides are bit-reproducible. One broadcast brute pass + the bucket
    equi-join + a probe-grain hit join."""
    from ..operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 8)
    exact = similarity.brute_force_knn(emb, probes, k=3).select(
        "query_id", "neighbor_id"
    )
    approx = similarity.srp_knn(
        emb, probes, id_col="vec_id", vec_col="embedding", planes=6, k=3
    ).select(
        F.col("query_id").alias("aq"), F.col("neighbor_id").alias("an")
    )
    hits = exact.join(
        approx,
        (F.col("query_id") == F.col("aq"))
        & (F.col("neighbor_id") == F.col("an")),
        "left",
    )
    return (
        hits.groupBy("query_id")
        .agg(F.count("an").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            scalars.stable_round(F.col("n_hits") / 3.0, 4).alias("recall_at_3"),
        )
        .transform(_ordered, "query_id")
    )


def q120_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday×hour activity heatmap with global share — the load-
    profile matrix capacity planning reads. One combinable aggregate
    + a 1-row total broadcast; dayofweek is ISO-normalized to Monday=1
    on both engines."""
    ev = load_table(spark, sf_dir, "events")
    cell = ev.groupBy(
        # Spark dayofweek: Sunday=1 .. Saturday=7 -> ISO Monday=1
        ((F.dayofweek("ts") + 5) % 7 + 1).alias("dow"),
        F.hour("ts").alias("hr"),
    ).agg(F.count("*").alias("n"))
    tot = cell.agg(F.sum("n").alias("t"))
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "hr",
            "n",
            scalars.stable_round(F.col("n") / F.col("t"), 6).alias("share"),
        )
        .transform(_ordered, "dow", "hr")
    )


def q121_nation_revenue_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth per nation: monthly revenue
    (decimal-exact), lag window per nation, pct change — the
    top-mover/momentum report. nation (25 rows, SF-invariant) is the
    only forced broadcast; customer SCALES with SF so its join is
    un-hinted (AQE broadcasts it only while it fits). The MoM window
    shares the nation keying with the monthly aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    # ONE fact-grain shuffle total (r7, -25% wall vs the r6 shape):
    # lineitem collapses to order grain first (map-side combinable,
    # ~4:1), the orders/cust/nation joins ride that reduced stream
    # (AQE broadcasts orders+cust while they fit; at 100 TB the orders
    # join falls back to SMJ on o_orderkey where the aggregate side is
    # ALREADY hash-partitioned by l_orderkey — exchange reuse, no
    # re-shuffle), and the (nation, month) aggregate partial-aggs to
    # ≤ 25×|months| rows per task before its tiny exchange. The r6
    # shape spent an extra full shuffle on a (custkey, month)
    # intermediate whose grain was nearly order-grain anyway. Decimal
    # sums re-associate exactly; "yyyy-MM" formats at (nation, month)
    # grain, never per fact row.
    lia = li.groupBy("l_orderkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        ).alias("rev")
    )
    monthly = (
        lia.join(
            orders.select(
                "o_orderkey",
                "o_custkey",
                F.date_trunc("month", "o_orderdate").alias("mon"),
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            cust.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", "mon")
        .agg(F.sum("rev").alias("rev"))
        .withColumn("month", F.date_format("mon", "yyyy-MM"))
        .drop("mon")
    )
    w = Window.partitionBy("n_name").orderBy("month")
    prev = F.lag("rev").over(w)
    return (
        monthly.withColumn("prev", prev)
        .select(
            "n_name",
            "month",
            F.col("rev").cast("double").alias("revenue"),
            scalars.stable_round(
                F.when(
                    F.col("prev").isNotNull() & (F.col("prev") != 0),
                    (F.col("rev") - F.col("prev")).cast("double")
                    / F.col("prev").cast("double"),
                ),
                4,
            ).alias("mom_growth"),
        )
        .transform(_ordered, "n_name", "month")
    )


def q122_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG document chunking: fixed-size overlapping token windows
    (size 8, stride 6 → 2-token overlap) — the retrieval-prep
    operator every RAG/embedding pipeline runs before vectorizing.
    Pure Catalyst: one tokens() pass, chunk starts from ``sequence``,
    content via ``slice`` — no explode-per-token, no Python; the only
    exchange is the output sort. Partial tail chunks are KEPT (the
    standard rule; both engines apply it identically). Output bounded
    to doc_id < 40 for the compare: (doc_id, chunk_idx, n_tokens,
    chunk md5)."""
    size, stride = 8, 6
    docs = load_table(spark, sf_dir, "documents")
    base = (
        docs.filter(F.col("doc_id") < 40)
        .select(
            "doc_id",
            F.filter(text.tokens("text"), lambda t: t != "").alias("t"),
        )
        .withColumn("n", F.size("t"))
        .filter(F.col("n") > 0)
    )
    chunks = base.select(
        "doc_id",
        "t",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))
        ).alias("s"),
    )
    chunk = F.slice("t", F.col("s") + 1, size)
    return chunks.select(
        "doc_id",
        (F.col("s") / stride).cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    ).transform(_ordered, "doc_id", "chunk_idx")


def q123_quantized_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELF-EVALUATING int8-quantization quality gate (q119's pattern
    on the storage axis): recall@3 of brute-force cosine over the
    QUANTIZED corpus (operators/similarity.py quantize → reconstruct,
    the 4-8× bandwidth reduction an at-scale candidate scan runs on)
    against full-precision ground truth — per probe, both sides
    bit-reproducible, so the precision/recall trade the quantizer
    ships with is oracle-verified."""
    from ..operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 8)
    exact = similarity.brute_force_knn(emb, probes, k=3).select(
        "query_id", "neighbor_id"
    )
    approx = similarity.knn_quantized(emb, probes, k=3).select(
        F.col("query_id").alias("aq"), F.col("neighbor_id").alias("an")
    )
    hits = exact.join(
        approx,
        (F.col("query_id") == F.col("aq"))
        & (F.col("neighbor_id") == F.col("an")),
        "left",
    )
    return (
        hits.groupBy("query_id")
        .agg(F.count("an").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            scalars.stable_round(F.col("n_hits") / 3.0, 4).alias("recall_at_3"),
        )
        .transform(_ordered, "query_id")
    )


def q124_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-proportion corpus mixture (the Pile/Dolma domain-weights
    step): given target language shares, find the largest total token
    budget whose per-language split is feasible (scale = min over
    langs of available/target), then select docs per language in
    deterministic md5 order until each budget is met.

    The budget selection is the two-phase :func:`~.ranks.
    bucketed_cumsum` — hash-prefix buckets, per-bucket totals,
    offset prefix-sum, bucket-partitioned running sums — so the
    take-until-quota scan never funnels a language through one task.
    Integer-exact token arithmetic throughout; only the final share
    is rounded."""
    from ..operators.ranks import bucketed_cumsum

    targets = [
        ("en", 0.5), ("fr", 0.2), ("es", 0.15), ("de", 0.1), ("zh", 0.05),
    ]
    tmap = F.create_map(*[F.lit(x) for kv in targets for x in kv])
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        text.token_count("text").alias("tok"),
    ).withColumn("h", F.md5(F.col("doc_id").cast("string")))
    avail = d.groupBy("lang").agg(F.sum("tok").alias("avail"))
    shared = avail.withColumn("target_share", tmap[F.col("lang")]).filter(
        F.col("target_share").isNotNull()
    )
    scale = shared.agg(
        F.min(F.col("avail") / F.col("target_share")).alias("scale")
    )
    budgets = shared.crossJoin(F.broadcast(scale)).select(
        "lang",
        "avail",
        "target_share",
        F.floor(F.col("target_share") * F.col("scale")).alias("budget"),
    )
    cum = bucketed_cumsum(
        d,
        [F.col("h").asc(), F.col("doc_id").asc()],
        [F.substring("h", 1, 2)],
        "tok",
        group=["lang"],
        out="cum",
    )
    sel = cum.join(F.broadcast(budgets), "lang").filter(
        F.col("cum") <= F.col("budget")
    )
    per = sel.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("tok").alias("sel_tokens"),
        F.max("avail").alias("avail_tokens"),
        F.max("budget").alias("budget"),
        F.max("target_share").alias("target_share"),
    ).localCheckpoint(eager=False)
    tot = per.agg(F.sum("sel_tokens").alias("tot"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "sel_tokens",
            "avail_tokens",
            "budget",
            "target_share",
            scalars.stable_round(
                F.col("sel_tokens").cast("double") / F.col("tot").cast("double"),
                4,
            ).alias("achieved_share"),
        )
        .transform(_ordered, "lang")
    )


def q125_spearman_spend_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between customer account balance and
    realized revenue — the monotone-association check (robust to the
    heavy-tailed spend distribution Pearson is not). Both rankings run
    through the two-phase :func:`~.ranks.bucketed_avg_rank`
    (average-rank tie rule), and because average ranks are
    HALF-INTEGERS every sum in the correlation is exact in doubles —
    rank statistics are bit-stable cross-engine where raw double sums
    are not. Output: 1 row (n, rho)."""
    from ..operators.ranks import bucketed_avg_rank, with_equi_width_bucket

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    per = (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li["l_orderkey"] == orders["o_orderkey"],
        )
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum(_revenue().cast("decimal(18,4)")), 2).alias("b")
        )
        .join(
            cust.select("c_custkey", F.col("c_acctbal").alias("a")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("a", "b")
    )
    ra = bucketed_avg_rank(
        with_equi_width_bucket(per, "a"), "a", ["__vb"], out="ra"
    ).drop("__vb")
    rb = bucketed_avg_rank(
        with_equi_width_bucket(ra, "b", out="__vb2"), "b", ["__vb2"], out="rb"
    ).drop("__vb2")
    s = rb.agg(
        F.count("*").alias("n"),
        F.sum("ra").alias("sa"),
        F.sum("rb").alias("sb"),
        F.sum(F.col("ra") * F.col("rb")).alias("sab"),
        F.sum(F.col("ra") * F.col("ra")).alias("saa"),
        F.sum(F.col("rb") * F.col("rb")).alias("sbb"),
    )
    num = F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")
    da = F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")
    db = F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")
    return s.select(
        "n",
        scalars.stable_round(
            F.when((da > 0) & (db > 0), num / F.sqrt(da * db)), 6
        ).alias("rho"),
    )


def q126_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U between the value metric of two event types —
    the nonparametric two-sample test (complements q107's parametric
    z-test) plus the common-language effect size U/(n₁·n₂). Combined
    average ranks via the two-phase machinery; U = R₁ − n₁(n₁+1)/2 is
    exact (half-integer rank sums), only the effect size divides."""
    from ..operators.ranks import bucketed_avg_rank, with_equi_width_bucket

    ev = load_table(spark, sf_dir, "events")
    t = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_type", "value"
    )
    r = bucketed_avg_rank(
        with_equi_width_bucket(t, "value"), "value", ["__vb"], out="r"
    )
    g = r.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("r").alias("rsum")
    ).localCheckpoint(eager=False)  # 2 rows, two consumers below
    a = g.filter(F.col("event_type") == "click").select(
        F.col("n").alias("n_a"), F.col("rsum").alias("r_a")
    )
    b = g.filter(F.col("event_type") == "purchase").select(
        F.col("n").alias("n_b")
    )
    u = F.col("r_a") - F.col("n_a") * (F.col("n_a") + 1) / 2.0
    return a.crossJoin(F.broadcast(b)).select(
        "n_a",
        "n_b",
        u.alias("u_a"),
        scalars.stable_round(
            u / (F.col("n_a").cast("double") * F.col("n_b").cast("double")), 6
        ).alias("cles"),
    )


def q127_approx_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-evaluating sketch gate for grouped percentiles (the q86b
    pattern on the order-statistics axis): ``approx_percentile``
    (Greenwald-Khanna, the only sane grouped-percentile at 100 TB and
    the declared sketch mode of q28/q88) checked IN-QUERY against the
    exact percentile — the flag asserts the approx answer lands within
    the exact p45–p55 value band (i.e. within ±0.05 quantile error,
    5× the sketch's 1% accuracy parameter). The oracle recomputes the
    exact values and expects TRUE, so sketch drift is a hash FAIL
    without demanding cross-engine sketch equality."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.expr("approx_percentile(value, 0.5, 100)").alias("p50_approx"),
        F.percentile(F.col("value"), F.lit(0.5)).alias("p50_exact"),
        F.percentile(F.col("value"), F.lit(0.45)).alias("lo"),
        F.percentile(F.col("value"), F.lit(0.55)).alias("hi"),
    )
    return agg.select(
        "event_type",
        "n_events",
        scalars.stable_round("p50_exact", 4).alias("p50_exact"),
        (
            (F.col("p50_approx") >= F.col("lo"))
            & (F.col("p50_approx") <= F.col("hi"))
        ).alias("within_band"),
    ).transform(_ordered, "event_type")


def q128_orders_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ANSI-MERGE clause set (operators/merge.py merge_into) as a
    checked query: a deterministic CDC batch against orders — matched
    rows updated (10% repricing, status 'U') unless the matched
    target is 5-LOW priority (deleted), source-only keys inserted,
    untouched rows kept. Output: per-action row count + decimal-exact
    totalprice sum — the post-merge audit a lakehouse upsert job
    emits. One null-safe key join; CDC side broadcasts from stats."""
    from ..operators.merge import merge_into

    orders = load_table(spark, sf_dir, "orders")
    upd = (
        orders.filter(F.col("o_orderkey") % 97 == 0)
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 1.1, 2))
        .withColumn("o_orderstatus", F.lit("U"))
    )
    ins = (
        orders.filter(F.col("o_orderkey") % 89 == 3)
        # negated key: TPC-H orderkeys are >= 1 at every SF, so the
        # synthetic insert set can never collide with a real order —
        # key+10M collided from SF~1.7 (6M rows/SF), silently turning
        # inserts into matched updates at sweep scale (ADVICE r5)
        .withColumn("o_orderkey", -F.col("o_orderkey"))
        .withColumn("o_orderstatus", F.lit("N"))
    )
    merged = merge_into(
        orders,
        upd.unionByName(ins),
        ["o_orderkey"],
        when_matched_update={
            "o_totalprice": F.col("s.o_totalprice"),
            "o_orderstatus": F.col("s.o_orderstatus"),
        },
        when_matched_delete=F.col("t.o_orderpriority") == F.lit("5-LOW"),
    )
    return (
        merged.groupBy(F.col("__merge_action").alias("action"))
        .agg(
            F.count("*").alias("n_rows"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
            )
            .cast("double")
            .alias("total_price"),
        )
        .transform(_ordered, "action")
    )


def q129_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency / frequency / monetary
    quartile codes (the classic CRM segmentation), every quartile a
    DISTRIBUTED ntile (three two-phase bucketed ranks + the closed-
    form ntile reconstruction — no single-partition window at
    customer grain). All three ranking values are engine-exact: days
    and counts are integers, monetary is a decimal sum. Output:
    per-segment customer count + decimal-exact monetary total."""
    from ..operators.ranks import (
        bucketed_rank,
        ntile_from_rank,
        with_equi_width_bucket,
    )

    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("mx"))
    per = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last"),
            F.count("*").alias("f"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("m"),
        )
        .crossJoin(F.broadcast(anchor))
        .withColumn("r", F.datediff("mx", "last"))
        .drop("mx", "last")
        .localCheckpoint(eager=False)  # 3 rank chains + the count
    )
    n_tot = per.agg(F.count("*").alias("__n"))

    t = per
    for metric in ("r", "f", "m"):
        t = bucketed_rank(
            with_equi_width_bucket(t, metric, out=f"__vb_{metric}"),
            [F.col(metric).asc(), F.col("o_custkey").asc()],
            [f"__vb_{metric}"],
            out=f"__rn_{metric}",
        ).drop(f"__vb_{metric}")
    t = t.crossJoin(F.broadcast(n_tot))
    code = (
        ntile_from_rank(F.col("__rn_r"), F.col("__n"), 4) * 100
        + ntile_from_rank(F.col("__rn_f"), F.col("__n"), 4) * 10
        + ntile_from_rank(F.col("__rn_m"), F.col("__n"), 4)
    )
    return (
        t.withColumn("rfm_code", code)
        .groupBy("rfm_code")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("m"), 2).cast("double").alias("total_monetary"),
        )
        .transform(_ordered, "rfm_code")
    )


def q130_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers bucketed by first-order
    month, cumulative revenue per cohort over months-since-first-order
    (0..12) — the acquisition-quality readout (complements q83's
    retention counts with VALUE). One fact-grain aggregate
    (customer-month revenue); the cumulative window runs on the
    cohort×month AGGREGATE (~dozens of rows per cohort), never at
    fact grain. Month index is integer year/month
    arithmetic (months_between's fractional months are not portable);
    revenue sums are decimal-exact.

    One orders scan: the cohort month is min(m) over a custkey window
    ON the customer-month aggregate (high-cardinality partition key —
    distributed), not a second fact scan + groupBy + equi-join back
    (the r6 rewrite: 2 scans/3 shuffles → 1 scan/2 shuffles)."""
    orders = load_table(spark, sf_dir, "orders")
    cm = (
        orders.groupBy(
            "o_custkey", F.date_trunc("month", "o_orderdate").alias("m")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
        .withColumn(
            "cohort", F.min("m").over(Window.partitionBy("o_custkey"))
        )
        .withColumn(
            "month_index",
            (F.year("m") - F.year("cohort")) * 12
            + (F.month("m") - F.month("cohort")),
        )
        .filter(F.col("month_index") <= 12)
    )
    cell = cm.groupBy("cohort", "month_index").agg(
        F.count("*").alias("n_active"), F.sum("rev").alias("rev")
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("month_index")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cell.withColumn("cum_rev", F.sum("rev").over(w))
        .select(
            F.date_format("cohort", "yyyy-MM").alias("cohort"),
            "month_index",
            "n_active",
            F.round("cum_rev", 2).cast("double").alias("cum_revenue"),
        )
        .transform(_ordered, "cohort", "month_index")
    )


# Insertion order IS the driver-budget order: the round-4 gate walked
# the first 50 keys in insertion order, so the head leads with every
# query whose plan or oracle changed in round 6: the five co-occurrence
# queries (per-user fan-out cap, mirrored in their oracle CTEs), the
# split-aggregate profiles q86/q86b, the negated synthetic merge keys
# (q128/q102), and the whole ranks.py family (equi-depth buckets,
# long-exact ntile division, bucket-type guards) — re-proving each
# change at the driver. Key names unchanged.
def q131_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance selection (Xie et al. 2023): score every
    document by hashed-bigram target-vs-raw likelihood evidence
    (target = English docs) and keep the top-50 — the data-selection
    pass that resamples a crawl toward a domain before training.
    Integer-exact surrogate scoring (operators/quality.dsir_scores
    docstring has the derivation); the top-50 is a
    TakeOrderedAndProject, never a global sort. No reference twin —
    §2.13 LLM-pipeline mandate."""
    from ..operators.quality import dsir_scores

    docs = load_table(spark, sf_dir, "documents")
    scored = dsir_scores(
        docs, F.col("lang") == "en", carry_cols=["lang"], n_buckets=512
    )
    return scored.orderBy(
        F.col("weight_pt").desc(), F.col("doc_id").asc()
    ).limit(50)


def q132_event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debounce audit: per (user, event_type), how many
    events survive a 10-minute gap-debounce (operators/debounce.py —
    repeat-suppression before events feed training). Gap semantics
    (vs previous event) so the whole operator is one lag window on the
    high-cardinality key; the stateful vs-last-KEPT variant is the
    applyInPandas op unit-tested in tests/test_debounce.py. No
    reference twin; §2.15 pipeline mandate."""
    from ..operators.debounce import debounce_gap

    ev = load_table(spark, sf_dir, "events")
    kept = debounce_gap(
        ev, keys=["user_id", "event_type"], cooldown_s=600.0
    )
    totals = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_events")
    )
    kept_n = kept.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_kept")
    )
    return (
        totals.join(kept_n, ["user_id", "event_type"])
        .select(
            "user_id",
            "event_type",
            "n_events",
            "n_kept",
            (F.col("n_events") - F.col("n_kept")).alias("n_dropped"),
        )
        .transform(_ordered, "user_id", "event_type")
    )


def q133_status_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 interval build (gaps-and-islands): collapse each
    user's time-ordered event_type observations into validity
    intervals [valid_from, valid_to) with a per-user version counter
    and an is_current flag (operators/scd.py collapse_runs — the ONE
    gaps-and-islands implementation in the repo: q79's scd2_compact
    delegates to it; this query audits the versioned superset view —
    version numbers, per-island n_obs, µs-precision bounds — that the
    compaction view drops). Audited for a bounded user slice; the
    operator itself is one keyed shuffle + an island-grain window at
    any scale."""
    from ..operators.scd import collapse_runs

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    runs = collapse_runs(
        ev, keys=["user_id"], state_col="event_type", tiebreak="event_id"
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return runs.select(
        "user_id",
        "version",
        "state",
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.date_format("valid_to", fmt).alias("valid_to"),
        "n_obs",
        "is_current",
    ).transform(_ordered, "user_id", "version")


def q134_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily time-weighted average value per event type (TWAP — the
    irregular-series rollup OHLC can't give you: each observation is
    weighted by how long it HELD before the next one;
    operators/timeseries.time_weighted_avg). Partition key is
    (event_type, day) — the day component is what spreads a 5-value
    type key across the cluster and bounds per-partition sort state;
    window and rollup share one exchange. Integer-µs × decimal
    accumulation keeps the sums order-independent cross-engine."""
    from ..operators.timeseries import time_weighted_avg

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    return time_weighted_avg(
        ev, keys=["event_type", "day"], tiebreak="event_id"
    ).transform(_ordered, "event_type", "day")


def q135_semantic_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced corpus sampling (SemDeDup-style selection):
    deterministic SRP hyperplane buckets partition the embedding space
    into 2^5 semantic cells, then at most 8 rows survive per cell
    under an md5-uniform order (operators/quality.srp_balanced_sample)
    — density-flattened data selection, fully reproducible in any
    engine. §2.13 pipeline mandate; no reference twin."""
    from ..operators.quality import srp_balanced_sample

    emb = load_table(spark, sf_dir, "embeddings")
    return srp_balanced_sample(
        emb, planes=5, per_bucket=8
    ).transform(_ordered, "bucket", "smp_rank")


def q136_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is attributed
    to the user's most recent strictly-prior click or view within a
    3-day lookback (operators/asof.py with payload + tolerance — the
    q29 as-of operator exercised with its tolerance contract), then
    rolled up per channel. Tie at identical (ts): highest event_id
    wins (the operator's documented tiebreak), mirrored in the oracle.
    Single keyed shuffle for the as-of union-window; the rollup is a
    3-row aggregate."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    touches = ev.filter(F.col("event_type").isin("click", "view"))
    attributed = asof_join(
        purchases,
        touches,
        on="user_id",
        tiebreak="event_id",
        strict=True,
        tolerance="3 DAYS",
        right_payload=["event_type"],
    )
    return (
        attributed.groupBy(
            F.coalesce(F.col("asof_event_type"), F.lit("unattributed")).alias(
                "channel"
            )
        )
        .agg(
            F.count("*").alias("n_purchases"),
            # decimal-in/double-out: value is 2dp-exact, so the decimal
            # sum is order-independent across engines (q02/q117 pattern)
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .transform(_ordered, "channel")
    )


def q137_expectation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation suite over orders
    (operators/expectations.py — the deequ pattern: every check
    compiles into ONE aggregate pass; adding a check adds an
    expression, never a scan). Replaces the reference's imperative
    per-column try/except validation (src/spark/training.py:61-95)
    with a single-scan audit artifact."""
    from ..operators.expectations import expectation_audit

    orders = load_table(spark, sf_dir, "orders")
    audit = expectation_audit(
        orders,
        [
            ("min_rows", None, 1000),
            ("not_null", "o_orderkey"),
            ("unique", "o_orderkey"),
            ("not_null", "o_custkey"),
            ("accepted", "o_orderstatus", ["F", "O", "P"]),
            ("range", "o_totalprice", 0.0, 1_000_000.0),
            ("not_null", "o_orderdate"),
        ],
    )
    return audit.select(
        F.col("check").alias("check_kind"),
        F.col("column").alias("column_name"),
        "metric",
        "passed",
    ).transform(_ordered, "check_kind", "column_name")


def q138_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: each anchor's
    top-3 most-similar DIFFERENT-label vectors, candidates from the
    same deterministic SRP bucket index q75 serves ANN from
    (operators/similarity.srp_hard_negatives — mining and serving
    share one LSH layout). §2.13 pipeline mandate; no reference
    twin."""
    from ..operators.similarity import srp_hard_negatives

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.select("vec_id").filter(F.col("vec_id") < 8)
    return srp_hard_negatives(
        emb, probes, planes=6, k=3
    ).transform(_ordered, "anchor_id", "rnk")


def q139_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py): the
    first 8 merge rules learned from the documents corpus, with their
    weighted pair counts. DuckDB oracle: the 8 merge rounds unrolled
    as chained CTE stages (oracles._bpe_merges_sql — greedy leftmost
    re-merge expressed as string replace over a |-wrapped symbol
    list); also pinned against a pure-Python reference trainer in
    tests/test_bpe.py. Trains through the provably-safe batched
    selector (driver actions scale with rounds, not merges). §2.13
    pipeline mandate; no reference twin."""
    from ..operators.bpe import bpe_train, word_frequency_table

    docs = load_table(spark, sf_dir, "documents")
    merges, _ = bpe_train(word_frequency_table(docs), n_merges=8)
    rows = [
        (i + 1, l, r, l + r, c) for i, (l, r, c) in enumerate(merges)
    ]
    return local_frame(
        spark, rows, "step int, left string, right string, merged string, pair_count long"
    ).transform(_ordered, "step")


def q140_ranking_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded ranking evaluation (NDCG@10 / MRR / hits) of the
    popularity recommender: items ranked by purchase count, graded
    against each user's own click counts (ml/evaluation.
    graded_ranking_metrics — the ranking-quality eval the reference's
    RMSE-only M8 never computes). DCG terms are integer surrogates
    (rel × round(1e9/log2(r+1))), so the sums are exact and
    order-independent cross-engine; only the final ratios divide.
    Bounded user slice for the audit; the operator is
    broadcast-candidates + one (user,item) join at any scale."""
    from ..ml.evaluation import graded_ranking_metrics

    ev = load_table(spark, sf_dir, "events")
    item = F.get_json_object("props", "$.k").cast("long")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        item.alias("item")
    )
    pop = (
        purchases.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("item").asc())
    cand = pop.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 10
    )
    rel = (
        ev.filter(
            (F.col("event_type") == "click") & (F.col("user_id") < 30)
        )
        .select("user_id", item.alias("item"))
        .filter(F.col("item").isNotNull())
        .groupBy("user_id", "item")
        .agg(F.count("*").alias("rel"))
    )
    return graded_ranking_metrics(cand, rel, k=10).transform(
        _ordered, "user_id"
    )


def q141_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-drift monitor: PSI of the event value distribution,
    second half of the stream vs the first (operators/profile.
    psi_report — reference-decile bins from exact discrete
    percentiles, Laplace-smoothed shares, integer-micro-unit total).
    The time split is the integer epoch-µs midpoint, so the report is
    fully deterministic. The drift gate a 100 TB feature pipeline runs
    before every retrain; no reference twin (§2.13 mandate).

    The tagged population (3 columns) is checkpointed ONCE and feeds
    both sides — events parquet is scanned exactly twice (the min/max
    midpoint agg + the materialization), where the r7 shape re-ran
    the scan and the midpoint cross-join per psi_report consumer."""
    from ..operators.profile import psi_report

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    rng = ev.agg(F.min(us).alias("__mn"), F.max(us).alias("__mx")).select(
        F.call_function(
            "div", F.col("__mn") + F.col("__mx"), F.lit(2)
        ).alias("__mid")
    )
    tagged = (
        ev.select("event_id", "value", us.alias("__us"))
        .crossJoin(F.broadcast(rng))
        .localCheckpoint(eager=False)
    )
    ref = tagged.filter(F.col("__us") < F.col("__mid"))
    cur = tagged.filter(F.col("__us") >= F.col("__mid"))
    return psi_report(ref, cur, checkpoint=False).transform(
        _ordered, "bin"
    )


def q142_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters through a count-min sketch (operators/sketches.
    cms_counters/cms_estimate — the frequency member of the mergeable-
    sketch family next to the HLL rollup): top-10 users by exact event
    count, each with its CMS point estimate and two in-query gate
    flags — est ≥ exact (CMS never undercounts) and est − exact ≤
    2n/width (the ε-bound) — which the oracle pins as literal TRUE
    (q86b/q127 self-gate pattern: sketch drift becomes a hash FAIL).
    Deterministic md5 hash rows, so the sketch is bit-identical in any
    engine; the counter table is bounded at depth×width cells and
    broadcasts."""
    from ..operators.sketches import (
        CMSParams,
        cms_counters_from_counts,
        cms_estimate,
    )

    cms = CMSParams(depth=4, width=1024)
    ev = load_table(spark, sf_dir, "events")
    # ONE user-grain aggregation feeds both the exact top-k and the
    # sketch build (r12 — cms_counters_from_counts: cell counts are
    # Σ per-key counts, identical by associativity); previously the
    # events stream was scanned and depth-exploded a second time just
    # to recount what `exact` already holds
    exact = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("exact_n"))
        .localCheckpoint(eager=False)
    )
    counters = cms_counters_from_counts(
        exact, "user_id", "exact_n", params=cms
    )
    top = exact.orderBy(F.desc("exact_n"), F.asc("user_id")).limit(10)
    est = cms_estimate(top, counters, "user_id", params=cms, out="est_n")
    # deliberately a separate count-star pass: it scans NO columns
    # (metadata-weight), where deriving the total from `exact` would
    # recompute the user-grain aggregate for a second consumer
    tot = ev.agg(F.count("*").alias("__n"))
    return (
        est.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "exact_n",
            "est_n",
            (F.col("est_n") >= F.col("exact_n")).alias("over_ok"),
            (
                F.col("est_n") - F.col("exact_n")
                <= F.call_function(
                    "div", 2 * F.col("__n"), F.lit(cms.width)
                )
            ).alias("bound_ok"),
        )
        .transform(_ordered, "user_id")
    )


def q143_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 retrieval (operators/retrieval.bm25_topk) for a
    mixed rare+common query — the retrieval-grade extension of
    q73's TF-IDF (reference exposes TF-IDF features only:
    src/ml/content_features.py). 'dup' is the corpus's one rare term
    (df≈5%), so the result demonstrates idf dominance over raw tf;
    length-normalization (b=0.75) is the exact-rational int64 form
    derived in the module docstring, and per-term scores sum as
    floored int64 micro-units so the one ln() double never
    accumulates cross-engine (the q131/q141 discipline)."""
    from ..operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(
        docs, ["dup", "key", "vector"], id_col="doc_id", k=10
    ).transform(_ordered, "doc_id")


def q144_kmv_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation between event types through KMV
    sketches (operators/sketches.kmv_sketch — the set-operation member
    of the sketch family: HLL state cannot INTERSECT, k-minimum-values
    can, Beyer et al. SIGMOD'07). Per type-pair: union-size estimate
    from the merged k-min, Jaccard from the shared-membership fraction
    of the union-k, intersection = jaccard × union — each checked
    in-query against the exact distinct intersection with a ±50%% gate
    (4σ at k=64) that the oracle pins literal TRUE (q86b/q142 self-gate
    pattern). Deterministic md5 hashes → the ESTIMATES are bit-equal
    cross-engine, not just the exact counts.

    100 TB shape: one distinct shuffle inside the sketch (two-phase
    sharded k-min, no whole-group rank), one (type,user) distinct for
    the truth side whose self-join fans out ≤ n_types² per user;
    everything after is arithmetic over ≤ n_types·k sketch rows."""
    from ..operators.sketches import kmv_distinct_estimate, kmv_sketch

    K = 64
    ev = load_table(spark, sf_dir, "events")
    sk = kmv_sketch(ev, "user_id", group=["event_type"], k=K).select(
        F.col("event_type").alias("t"), "h"
    )
    du = ev.select("event_type", "user_id").distinct()
    exact = (
        du.alias("a")
        .join(
            du.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("exact_inter"))
    )
    p = exact.select("type_a", "type_b")
    u = (
        p.join(sk, F.col("t") == F.col("type_a"))
        .select("type_a", "type_b", "h")
        .union(
            p.join(sk, F.col("t") == F.col("type_b")).select(
                "type_a", "type_b", "h"
            )
        )
        .distinct()
    )
    wu = Window.partitionBy("type_a", "type_b").orderBy("h")
    uk = (
        u.withColumn("__r", F.row_number().over(wu))
        .filter(F.col("__r") <= K)
        .drop("__r")
    )
    m = uk.join(
        sk.select(F.col("t").alias("type_a"), "h", F.lit(1).alias("__a")),
        ["type_a", "h"],
        "left",
    ).join(
        sk.select(F.col("t").alias("type_b"), "h", F.lit(1).alias("__b")),
        ["type_b", "h"],
        "left",
    )
    agg = m.groupBy("type_a", "type_b").agg(
        F.count("*").alias("n_u"),
        F.max("h").alias("h_k"),
        F.sum(
            F.when(
                F.col("__a").isNotNull() & F.col("__b").isNotNull(), 1
            ).otherwise(0)
        ).alias("n_both"),
    )
    u_est = kmv_distinct_estimate(F.col("n_u"), F.col("h_k"), k=K)
    jacc = F.col("n_both").cast("double") / F.col("n_u").cast("double")
    return (
        agg.join(exact, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            scalars.stable_round(u_est, 4).alias("est_union"),
            scalars.stable_round(jacc, 4).alias("est_jaccard"),
            scalars.stable_round(jacc * u_est, 4).alias("est_inter"),
            "exact_inter",
            (
                F.abs(jacc * u_est - F.col("exact_inter"))
                <= 0.5 * F.col("exact_inter")
            ).alias("gate_ok"),
        )
        .transform(_ordered, "type_a", "type_b")
    )


def q145_name_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-similarity join over part names (operators/similarity.
    edit_distance_pairs): every distinct name pair within Levenshtein
    distance 2, with per-name part counts — catalog reconciliation /
    typo clustering, the symmetric-edit-distance complement of q35's
    containment-tiered fuzzy lookup. The length-band equi-join is
    lossless (|len diff| > d ⟹ dist > d) so the oracle's naive
    all-pairs join returns the identical set; Spark never builds the
    all-pairs space."""
    from ..operators.similarity import edit_distance_pairs

    part = load_table(spark, sf_dir, "part")
    return edit_distance_pairs(part, "p_name", max_dist=2).transform(
        _ordered, "name_a", "name_b"
    )


def q146_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor (operators/profile.
    embedding_centroid_drift — the vector counterpart of q141's PSI):
    per-label centroid cosine and mean-norm ratio between the even-id
    and odd-id halves of the embeddings table. Component sums are
    floored int64 micro-units, dot/norms decimal(38,0) (hugeint in
    the oracle), so the estimates are bit-equal cross-engine; only
    the final sqrt/divide are doubles, floored at 6 decimals."""
    from ..operators.profile import embedding_centroid_drift

    emb = load_table(spark, sf_dir, "embeddings")
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cur = emb.filter(F.col("vec_id") % 2 != 0)
    return embedding_centroid_drift(ref, cur, group=["label"]).transform(
        _ordered, "label"
    )


def q147_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (operators/
    retrieval.rrf_fuse, Cormack SIGIR'09): the q143 BM25 top-50 fused
    with a quality-prior top-50 (q22's Gopher/C4-style score) — the
    standard lexical+prior combiner, needing no score calibration
    because only ranks enter. The 1/(60+rank) contributions are exact
    integer micro-units (JVM div == DuckDB //), so the fusion has NO
    floating point at all; both input rankings are deterministic
    (int64 BM25 scores; 4-dec floored quality; doc_id tie-breaks)."""
    from ..operators.retrieval import bm25_topk, rrf_fuse

    docs = load_table(spark, sf_dir, "documents")
    bm25 = bm25_topk(docs, ["dup", "key", "vector"], k=50).select(
        "doc_id", "rank"
    )
    qual = (
        docs.select("doc_id", text.quality_score("text").alias("__q"))
        .orderBy(F.col("__q").desc(), F.col("doc_id").asc())
        .limit(50)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("__q").desc(), F.col("doc_id").asc()))
            .alias("rank"),
        )
    )
    return rrf_fuse(
        [("bm25", bm25), ("quality", qual)], id_col="doc_id", top=10
    ).transform(_ordered, "fused_rank")


def q148_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per brand
    (operators/ranks.weighted_quantile): the warehouse quantile the
    UNWEIGHTED q28/q127 percentiles can't answer — 'the price at
    which half the UNITS ship', not half the line items. Exact
    integer threshold test (cum·2 ≥ tot on long weights), value-grain
    window (brands × distinct prices, never fact rows), price passes
    through unarithmeticked so doubles are bit-identical."""
    from ..operators.ranks import weighted_quantile

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li["l_partkey"] == part["p_partkey"],
    )
    return weighted_quantile(
        joined,
        "l_extendedprice",
        "l_quantity",
        group=["p_brand"],
        out="median_price",
        tot_out="total_qty",
    ).transform(_ordered, "p_brand")


def q149_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard ≥ 0.5 near-dup pairs via prefix filtering
    (operators/dedup.prefix_filter_jaccard_pairs — Bayardo AllPairs):
    the exact-threshold set-similarity join completing the dedup
    tiering — q17 is the full self-join baseline, q20 the MinHash
    approximation, this is exact WITHOUT the full self-join (join
    keys are only each set's rarest L−ceil(tL)+1 shingles; the
    threshold verifies in integer arithmetic). The oracle is q17's
    naive all-pairs SQL with the same integer threshold — identical
    result sets prove the prefix filter lossless."""
    from ..operators.dedup import prefix_filter_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    return prefix_filter_jaccard_pairs(
        docs, "doc_id", "text", k=3, threshold_num=1, threshold_den=2
    ).transform(_ordered, "id_a", "id_b")


def q150_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership audit (operators/sketches.bloom_bits /
    bloom_probe — the membership member of the mergeable-sketch
    family: HLL counts, CMS frequencies, KMV intersects, Bloom
    answers 'possibly seen?'). Builds the filter over orders'
    custkeys, probes every customer, and checks both guarantees
    in-query against the exact semi-join truth: ZERO false negatives
    (pinned TRUE by the oracle) and a false-positive count inside a
    loose integer bound (1% of absentees + slack — no float exp() to
    disagree on). Deterministic md5 bit positions → the verdicts are
    bit-equal cross-engine.

    The distinct member-key set is computed ONCE (lazy localCheckpoint,
    the roster's multi-consumer pattern) and feeds BOTH the bit build
    and the exact truth side — one orders scan + one distinct shuffle
    instead of two of each (bloom_bits over the distinct set emits the
    identical bit table: the k positions depend only on the value)."""
    from ..operators.sketches import BloomParams, bloom_bits, bloom_probe

    bp = BloomParams(m_bits=1 << 16, k_hashes=4)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    members = (
        orders.select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    bits = bloom_bits(members, "c_custkey", params=bp)
    probed = bloom_probe(
        cust.select("c_custkey"), bits, "c_custkey", params=bp
    )
    truth = members.withColumn("__has", F.lit(True))
    j = probed.join(truth, "c_custkey", "left").select(
        "maybe_member",
        F.coalesce("__has", F.lit(False)).alias("has"),
    )
    agg = j.agg(
        F.count("*").alias("n_customers"),
        F.sum(F.col("has").cast("long")).alias("n_with_orders"),
        F.sum(F.col("maybe_member").cast("long")).alias("n_flagged"),
        F.sum((F.col("has") & ~F.col("maybe_member")).cast("long")).alias(
            "n_false_neg"
        ),
        F.sum((~F.col("has") & F.col("maybe_member")).cast("long")).alias(
            "n_false_pos"
        ),
    )
    return agg.select(
        "*",
        (F.col("n_false_neg") == 0).alias("no_false_neg"),
        (
            F.col("n_false_pos")
            <= F.greatest(
                F.lit(16),
                F.call_function(
                    "div",
                    F.col("n_customers") - F.col("n_with_orders"),
                    F.lit(100),
                ),
            )
        ).alias("fp_ok"),
    )


def q151_html_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → text extraction (functions/html.extract_text — the
    trafilatura-class regex-tier pipeline: drop script/style/comments,
    cut nav/header/footer/aside chrome, isolate the <article> region,
    flatten block tags to newlines, decode entities, normalize
    whitespace) plus the link-density boilerplate signal in integer
    micro-units. Each document is wrapped in a deterministic page
    (chrome + anchors + entities around its text) so every tier is
    exercised; the DuckDB twin runs the SAME patterns (generated from
    one list — Java-regex ∩ RE2 subset) and must produce the extracted
    text byte-identically. Whole-stage codegen end to end — a 100 TB
    crawl-curation front door with no UDF anywhere; no reference twin
    (§2.13 mandate)."""
    from ..functions.html import extract_text, link_density_micro

    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit(
            '<html><head><title>d</title><style>p{margin:0}</style>'
            '<script>var a = "<p>not text</p>";</script></head><body>'
            '<nav><a href="/">Home</a> | <a href="/about">About</a></nav>'
            "<article><h1>Doc "
        ),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit(" &amp; more &lt;raw&gt;</p><ul><li>lang: "),
        F.col("lang"),
        F.lit("</li><li>source: "),
        F.col("source"),
        F.lit(
            '</li></ul><a href="/next">next doc</a></article>'
            "<footer>&copy; corp</footer></body></html>"
        ),
    )
    return (
        docs.select(
            "doc_id",
            extract_text(html).alias("extracted"),
            link_density_micro(html).alias("link_density_micro"),
        )
        .select(
            "doc_id",
            "extracted",
            F.length("extracted").cast("long").alias("n_chars_extracted"),
            "link_density_micro",
        )
        .transform(_ordered, "doc_id")
    )


def q152_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION (operators/bpe.bpe_apply — the
    inference half of q139's trainer): learn 8 merge rules, ENCODE the
    corpus with them, and report the top-20 subword tokens by weighted
    occurrence count (plus the distinct words each appears in). Encode
    runs at VOCABULARY grain — distinct words, bounded by Heaps' law —
    never per corpus row; a corpus-grain consumer joins the encoded
    vocabulary back by word (the q139 scan-once discipline). DuckDB
    twin: the trainer's unrolled CTE chain carried one re-merge
    further (the fully-encoded vocabulary) + the same token aggregate.
    §2.13 pipeline mandate; no reference twin."""
    from ..operators.bpe import bpe_apply, bpe_train, word_frequency_table

    docs = load_table(spark, sf_dir, "documents")
    wf = word_frequency_table(docs).localCheckpoint(eager=False)
    merges, _ = bpe_train(wf, n_merges=8)
    enc = bpe_apply(wf, merges)
    return (
        enc.select("word", "freq", F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(
            F.countDistinct("word").alias("n_words"),
            F.sum("freq").alias("total_freq"),
        )
        .orderBy(F.col("total_freq").desc(), F.col("token").asc())
        .limit(20)
    )


def q153_c4_line_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level cleaning (operators/quality.c4_line_filter
    — Raffel et al. 2020 §2.2): the rule tier between extraction
    (q151) and the statistical gates (Gopher q70, perplexity q85).
    Each document is synthesized into a 7-line page where every rule
    fires at least once (short line, no terminal punctuation,
    javascript / cookie-policy boilerplate); the operator keeps lines
    with ≥3 words ending in terminal punctuation and no blacklist
    phrase, re-joins survivors in order, and gates the document on ≥2
    kept lines — ALL as one array-lambda projection (no explode, no
    shuffle; the verdict is emitted, not applied — the q78 audit
    pattern). DuckDB twin: the same predicates as list_filter lambdas.
    §2.13 pipeline mandate; no reference twin."""
    from ..operators.quality import c4_line_filter

    docs = load_table(spark, sf_dir, "documents")
    page = F.concat_ws(
        "\n",
        F.concat(
            F.lit("Doc "),
            F.col("doc_id").cast("string"),
            F.lit(" of the corpus."),
        ),
        F.concat(F.col("text"), F.lit(" tail marker.")),
        F.concat(F.lit("lang "), F.col("lang")),
        F.lit("Enable javascript to continue."),
        F.lit("Short line."),
        F.lit("See our cookie policy for details."),
        F.concat(F.lit("source "), F.col("source"), F.lit(" verified entry.")),
    )
    return (
        c4_line_filter(
            docs.select("doc_id", page.alias("page")),
            text_col="page",
            min_words_per_line=3,
            min_lines_kept=2,
        )
        .select("doc_id", "n_lines", "n_kept", "kept_doc", "clean_text")
        .transform(_ordered, "doc_id")
    )


def _synth_url() -> Column:
    """The deliberately-messy URL synthesis shared by q154 and q158
    (uppercase host, www., even/odd default-vs-explicit port, tracking
    params around real ones, a fragment, five TLD shapes including
    two-level suffixes). The DuckDB twins carry the same expression."""
    tld = (
        F.when(F.col("lang") == "en", "com")
        .when(F.col("lang") == "de", "co.uk")
        .when(F.col("lang") == "zh", "com.cn")
        .when(F.col("lang") == "fr", "fr")
        .otherwise("org")
    )
    return F.concat(
        F.lit("HTTPS://WWW."),
        F.col("source"),
        F.lit("-cdn.Example."),
        tld,
        F.when(F.col("doc_id") % 2 == 0, ":443").otherwise(":8443"),
        F.lit("/articles/"),
        F.col("doc_id").cast("string"),
        F.lit("?utm_source=feed&id="),
        F.col("doc_id").cast("string"),
        F.lit("&ref="),
        F.col("source"),
        F.lit("&utm_campaign=x#sec"),
        F.col("doc_id").cast("string"),
    )


def q154_url_canonicalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + registrable-domain extraction
    (functions/url.py): the crawl-dedup key stage — lowercase
    scheme/host, strip www. and default ports, drop fragments and
    utm_*/gclid/fbclid tracking params, sort surviving params — plus
    the co.uk-aware registrable domain (the per-domain rollup /
    blocklist key). Each document synthesizes a deliberately messy URL
    (uppercase host, www., an even/odd default-vs-explicit port, two
    tracking params around real ones, a fragment) over five TLD shapes
    including two-level suffixes; the DuckDB twin runs the identical
    regex tiers and the canonical strings hash byte-identical. Pure
    column expressions — whole-stage codegen, no UDF, no shuffle.
    §2.13 pipeline mandate; no reference twin."""
    from ..functions.url import canonical_url, host, registrable_domain

    docs = load_table(spark, sf_dir, "documents")
    u = docs.select("doc_id", _synth_url().alias("url"))
    h = host(F.col("url"))
    return u.select(
        "doc_id",
        h.alias("host"),
        registrable_domain(h).alias("domain"),
        canonical_url(F.col("url")).alias("canonical_url"),
    ).transform(_ordered, "doc_id")


def q155_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility (subword tokens per word) of
    the learned BPE — the eval a multilingual pipeline runs before
    committing to a vocabulary (a tokenizer that fragments one
    language 2× inflates its training cost 2×). This is the
    corpus-grain consumer the q152 docstring promises: the corpus is
    encoded by JOINING the (vocabulary-grain) encoded word table back
    to the document word stream — the vocabulary broadcasts while it
    fits (Heaps' law) and degrades to a shuffle join on word beyond
    that; the corpus itself is never re-encoded per row. Counts are
    exact int64 (the </w> end mark rides the subword count, same both
    engines); fertility is integer micro-units (q131 discipline).
    DuckDB twin: the trainer CTE chain + the same join-back. §2.13
    pipeline mandate; no reference twin."""
    from ..functions import text as Ftext
    from ..operators.bpe import bpe_apply, bpe_train, word_frequency_table

    docs = load_table(spark, sf_dir, "documents")
    wf = word_frequency_table(docs).localCheckpoint(eager=False)
    merges, _ = bpe_train(wf, n_merges=8)
    vocab = bpe_apply(wf, merges).select(
        "word", F.size("syms").cast("long").alias("nt")
    )
    words = docs.select(
        "lang", F.explode(Ftext.tokens("text")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.join(F.broadcast(vocab), "word")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_word_occurrences"),
            F.sum("nt").alias("n_subword_tokens"),
        )
        .select(
            "lang",
            "n_word_occurrences",
            "n_subword_tokens",
            F.call_function(
                "div",
                F.col("n_subword_tokens") * 1_000_000,
                F.col("n_word_occurrences"),
            ).alias("fertility_micro"),
        )
        .transform(_ordered, "lang")
    )


def q156_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate spans (operators/dedup.
    duplicated_spans — Lee et al. 2022): every verbatim ≥8-token run
    that also occurs earlier in the corpus, merged into maximal spans
    per document with keep-first semantics — the span-grain tier the
    dedup family lacked (q15 whole-doc, q84 chunks, q103 containment,
    q20/q149 set similarity). One row per document (zero-filled), so
    clean documents are visible, not dropped. DuckDB twin: identical
    k-gram hash counts, packed-int64 first-occurrence tie-break, and
    gaps-and-islands. §2.13 pipeline mandate; no reference twin."""
    from ..operators.dedup import duplicated_spans

    docs = load_table(spark, sf_dir, "documents")
    return duplicated_spans(docs, "doc_id", "text", k=8).transform(
        _ordered, "doc_id"
    )


def q157_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch — the FIFTH member completing the
    sketch family (HLL counts, CMS frequencies, KMV intersects, Bloom
    membership, bottom-k-sample QUANTILES): a deterministic
    bottom-k-by-hash row sample per order priority
    (operators/sketches.bottomk_sample — mergeable by 'keep the k
    smallest of the union', unlike a reservoir), whose sample median
    estimates the group median. Audited in-query against the exact
    p40/p60 band (one shared value-grain pass via
    ranks.weighted_quantiles) with the gate pinned TRUE by the oracle
    (the q86b/q127/q142 self-gate pattern); the estimate itself is
    ALSO hash-checked — deterministic md5 sampling makes it bit-equal
    cross-engine, not just within tolerance."""
    from ..operators.ranks import weighted_quantile, weighted_quantiles
    from ..operators.sketches import bottomk_sample

    pri = "o_orderpriority"
    orders = load_table(spark, sf_dir, "orders").select(
        pri, "o_orderkey", "o_totalprice"
    )
    sample = bottomk_sample(
        orders, "o_orderkey", group=[pri], k=1024
    ).withColumn("__one", F.lit(1))
    est = weighted_quantile(
        sample,
        "o_totalprice",
        "__one",
        group=[pri],
        out="est_median",
        tot_out="sample_n",
    )
    band = weighted_quantiles(
        orders.withColumn("__one", F.lit(1)),
        "o_totalprice",
        "__one",
        group=[pri],
        qs=[(2, 5, "p40"), (1, 2, "exact_median"), (3, 5, "p60")],
        tot_out="n_rows",
    )
    return (
        est.join(band, pri)
        .select(
            pri,
            "n_rows",
            "sample_n",
            "est_median",
            "exact_median",
            "p40",
            "p60",
            (
                (F.col("est_median") >= F.col("p40"))
                & (F.col("est_median") <= F.col("p60"))
            ).alias("in_band"),
        )
        .transform(_ordered, pri)
    )


def q158_domain_curation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain curation rollup through the FULL crawl front door
    (operators/quality.crawl_front_door — the batch twin of the
    streaming CurationSink preprocess hook): each document becomes a
    messy page (q151-style chrome + boilerplate) at a messy URL
    (q154's synthesis), the front door extracts / C4-cleans /
    canonicalizes, and the survivors aggregate per registrable domain
    — the blocklist-decision table a crawl pipeline maintains (docs,
    hosts, kept lines, clean chars per domain). The DuckDB twin is
    COMPOSED from the same generators as q151/q153/q154 (shared
    extraction CTEs, shared C4 predicate, the q154 oracle verbatim as
    a subquery), so the composed pipeline is oracle-proven end to
    end, not just its stages. Exact-integer outputs only."""
    from ..functions.url import host, registrable_domain
    from ..operators.quality import crawl_front_door

    docs = load_table(spark, sf_dir, "documents")
    page = F.concat(
        F.lit(
            "<html><head><script>var x = 1;</script></head><body>"
            '<nav><a href="/">Home</a> | <a href="/about">About</a></nav>'
            "<article><p>Doc "
        ),
        F.col("doc_id").cast("string"),
        F.lit(" of the corpus.</p><p>"),
        F.col("text"),
        F.lit(" tail marker.</p><p>lang "),
        F.col("lang"),
        F.lit(
            "</p><p>Enable javascript to continue.</p></article>"
            "<footer>&copy; corp</footer></body></html>"
        ),
    )
    src = docs.select(
        "doc_id", page.alias("html"), _synth_url().alias("url")
    )
    fd = crawl_front_door(src, url_col="url")
    h = host(F.col("url"))
    return (
        fd.select(
            registrable_domain(h).alias("domain"),
            h.alias("__host"),
            "n_kept",
            F.length("text").cast("long").alias("__chars"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("__host").alias("n_hosts"),
            F.sum("n_kept").alias("kept_lines"),
            F.sum("__chars").alias("clean_chars"),
        )
        .transform(_ordered, "domain")
    )


def q159_sequence_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk packing manifest (operators/quality.
    sequence_manifest): documents laid head-to-tail per lang and cut
    into 512-token training sequences, one row per (sequence, doc)
    overlap with exact within-doc token spans — the loader map that
    fills fixed contexts ACROSS document boundaries (q93 packs whole
    docs to their start pack; this splits the boundary docs — together
    they are both halves of a pretraining data loader). Whitespace
    token counts (q64's metric), pure integer arithmetic, one
    lang-keyed exchange. DuckDB twin: same cumsum/div/clamp algebra.
    §2.13 pipeline mandate; no reference twin."""
    from ..operators.quality import sequence_manifest

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang", "doc_id", text.token_count("text").alias("n_tokens")
    )
    return sequence_manifest(
        d, "lang", "doc_id", "n_tokens", budget=512
    ).transform(_ordered, "lang", "seq_id", "doc_id")


def q160_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span REMOVAL (operators/dedup.
    remove_duplicated_spans — the surgery half of q156's detector,
    completing Lee et al. 2022): every verbatim ≥8-token run that also
    occurs earlier in the corpus is cut out of the document, first
    occurrence kept corpus-wide; clean documents pass through intact.
    Shares the detector's span core (one shingle-hash shuffle), then
    one in-row indexed F.filter does the cutting — the token stream is
    never exploded. Output text is the normalized token stream.
    §2.13 pipeline mandate; no reference twin."""
    from ..operators.dedup import remove_duplicated_spans

    docs = load_table(spark, sf_dir, "documents")
    return remove_duplicated_spans(docs, "doc_id", "text", k=8).transform(
        _ordered, "doc_id"
    )


def q161_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring (operators/quality.
    quality_model_scores): every document scored by the COMMITTED
    hashed-bigram logistic regression (ml/quality_weights.py — trained
    once by scripts/gen_quality_weights.py on the rule-tier teacher
    label, holdout AUC 0.93), the CCNet/GPT-3/LLaMA learned-curation
    stage complementing q22's heuristics and q153's C4 rules. The
    linear margin factorizes per gram occurrence, so scoring is ONE
    map-only in-row fold over the hashed-bigram stream against a
    constant-folded integer weight array — zero shuffles, zero Python,
    exact int64 cross-engine (q131 discipline). Learned upgrade of the
    reference's rule CASE (ref src/data_processor.py:164-186)."""
    from ..ml.quality_weights import QCLF_BIAS_MICRO, QCLF_WEIGHTS_MICRO
    from ..operators.quality import quality_model_scores

    docs = load_table(spark, sf_dir, "documents")
    return quality_model_scores(
        docs,
        QCLF_WEIGHTS_MICRO,
        QCLF_BIAS_MICRO,
        carry_cols=["lang"],
    ).transform(_ordered, "doc_id")


def q162_incremental_view_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh, composed end-to-end
    (operators/aggregates.summarize + merge_summaries — each
    property-tested, here composed as a roster query): a per-returnflag
    lineitem summary is maintained through a simulated INSERT batch
    (orderkey % 5 == 0 arrives as the delta) and then a RETRACTION of
    the same batch (negated additive measures), with both IVM
    invariants proven IN-QUERY:

    - ``matches_full``  — initial ⊕ delta == full recompute, every key
      and measure (sum/count/min/max);
    - ``retract_matches_initial`` — ⊖ delta recovers the additive
      initial state (min/max excluded: not retractable, the documented
      merge_summaries contract).

    Both gates must hash TRUE against the DuckDB twin, which builds
    the same two-batch refresh from scratch. 100 TB shape: refresh
    cost ∝ delta key set (two summary-grain unions), never a base
    rescan; all measures pure int64."""
    from ..operators.aggregates import merge_summaries, summarize

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        "l_orderkey",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    keys = ["l_returnflag"]
    measures = {
        "n_rows": ("count", "qty"),
        "sum_qty": ("sum", "qty"),
        "min_ok": ("min", "l_orderkey"),
        "max_ok": ("max", "l_orderkey"),
    }
    additive = {"n_rows": ("count", "qty"), "sum_qty": ("sum", "qty")}
    initial = summarize(base.filter(F.col("l_orderkey") % 5 != 0), keys, measures)
    delta = summarize(base.filter(F.col("l_orderkey") % 5 == 0), keys, measures)
    mv1 = merge_summaries(initial, delta, keys, measures)
    full = summarize(base, keys, measures)
    retract = delta.select(
        "l_returnflag",
        (-F.col("n_rows")).alias("n_rows"),
        (-F.col("sum_qty")).alias("sum_qty"),
    )
    mv2 = merge_summaries(
        mv1.select("l_returnflag", "n_rows", "sum_qty"),
        retract,
        keys,
        additive,
    )
    f = full.select(
        "l_returnflag",
        F.col("n_rows").alias("f_n"),
        F.col("sum_qty").alias("f_s"),
        F.col("min_ok").alias("f_mn"),
        F.col("max_ok").alias("f_mx"),
    )
    i = initial.select(
        "l_returnflag",
        F.col("n_rows").alias("i_n"),
        F.col("sum_qty").alias("i_s"),
    )
    r = mv2.select(
        "l_returnflag",
        F.col("n_rows").alias("r_n"),
        F.col("sum_qty").alias("r_s"),
    )
    return (
        mv1.join(f, "l_returnflag")
        .join(i, "l_returnflag")
        .join(r, "l_returnflag")
        .select(
            "l_returnflag",
            "n_rows",
            "sum_qty",
            "min_ok",
            "max_ok",
            (
                (F.col("n_rows") == F.col("f_n"))
                & (F.col("sum_qty") == F.col("f_s"))
                & (F.col("min_ok") == F.col("f_mn"))
                & (F.col("max_ok") == F.col("f_mx"))
            ).alias("matches_full"),
            (
                (F.col("r_n") == F.col("i_n"))
                & (F.col("r_s") == F.col("i_s"))
            ).alias("retract_matches_initial"),
        )
        .transform(_ordered, "l_returnflag")
    )


def q163_langid_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based language ID (operators/langid.langid_model_scores):
    every document scored by the COMMITTED Bernoulli naive-Bayes over
    hashed boundary-padded char trigrams (ml/langid_weights.py —
    trained once by scripts/gen_langid_weights.py distilling the
    stopword heuristic, holdout agreement 0.98 vs 0.91 majority), the
    learned upgrade of q23's stopword votes (the directive's
    fastText-lid-style curation stage, trained on the corpus itself —
    no external model). Output: model vs heuristic vs labeled-lang
    confusion counts plus the corpus-wide model↔heuristic agreement
    (integer micro-units) and its self-gate (≥ 0.95, pinned TRUE by
    the oracle hash — the q86b pattern). Scoring is MAP-ONLY constant-
    folded folds; the confusion agg + one single-partition window over
    ≤|classes|² rows are the only exchanges."""
    from ..ml.langid_weights import LID_BIASES_MICRO, LID_WEIGHTS_MICRO
    from ..operators.langid import langid_model_scores

    docs = load_table(spark, sf_dir, "documents")
    staged = docs.withColumn("heur_lang", text.lang_id("text"))
    scored = langid_model_scores(
        staged,
        LID_WEIGHTS_MICRO,
        LID_BIASES_MICRO,
        carry_cols=["lang", "heur_lang"],
    )
    g = scored.groupBy("lang", "pred_lang", "heur_lang").agg(
        F.count("*").alias("n_docs")
    )
    w = Window.partitionBy()
    agree = F.sum(
        F.when(
            F.col("pred_lang") == F.col("heur_lang"), F.col("n_docs")
        ).otherwise(F.lit(0))
    ).over(w)
    total = F.sum("n_docs").over(w)
    agreement = F.call_function("div", agree * F.lit(1_000_000), total)
    return g.select(
        "lang",
        "pred_lang",
        "heur_lang",
        "n_docs",
        agreement.alias("agreement_micro"),
        (agreement >= F.lit(950_000)).alias("gate_agreement"),
    ).transform(_ordered, "lang", "pred_lang", "heur_lang")


def q164_fertility_by_model_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility grouped by the LEARNED language label —
    q155's eval consuming q163's model predictions instead of the
    labeled column: the composition a real curation pipeline runs
    (its corpora are unlabeled; every per-language eval downstream of
    LID consumes model labels). Same exact-integer BPE join-back as
    q155; the language column is a MAP-ONLY scoring fold, so the plan
    shape is q155's plus zero exchanges. DuckDB twin: the trainer CTE
    chain + the generated lid scoring CTEs (cannot drift from either
    model)."""
    from ..functions import text as Ftext
    from ..ml.langid_weights import LID_BIASES_MICRO, LID_WEIGHTS_MICRO
    from ..operators.bpe import bpe_apply, bpe_train, word_frequency_table
    from ..operators.langid import langid_model_scores

    docs = load_table(spark, sf_dir, "documents")
    wf = word_frequency_table(docs).localCheckpoint(eager=False)
    merges, _ = bpe_train(wf, n_merges=8)
    vocab = bpe_apply(wf, merges).select(
        "word", F.size("syms").cast("long").alias("nt")
    )
    # lazy checkpoint: projection collapse would inline the per-doc
    # scoring fold below the token explode and re-evaluate it PER
    # TOKEN; materializing the doc-grain labels once keeps the scorer
    # at doc grain (0.9 s vs 3.7 s at sf0.1)
    scored = langid_model_scores(
        docs, LID_WEIGHTS_MICRO, LID_BIASES_MICRO, carry_cols=["text"]
    ).localCheckpoint(eager=False)
    words = scored.select(
        "pred_lang", F.explode(Ftext.tokens("text")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.join(F.broadcast(vocab), "word")
        .groupBy("pred_lang")
        .agg(
            F.count("*").alias("n_word_occurrences"),
            F.sum("nt").alias("n_subword_tokens"),
        )
        .select(
            "pred_lang",
            "n_word_occurrences",
            "n_subword_tokens",
            F.call_function(
                "div",
                F.col("n_subword_tokens") * 1_000_000,
                F.col("n_word_occurrences"),
            ).alias("fertility_micro"),
        )
        .transform(_ordered, "pred_lang")
    )


def q165_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH recall gate (operators/similarity.srp_knn
    ``multiprobe=True`` — Lv et al. VLDB'07, deterministic all-flips
    form): per probe, recall@3 hits of single-bucket SRP vs
    Hamming-1 multi-probe against brute-force truth, with the
    superset invariant gated IN-QUERY (``gate_no_worse`` — multi-probe
    candidates ⊇ single-probe candidates, so hits cannot drop; pinned
    TRUE by the oracle hash). The recall lever every LSH deployment
    reaches for before re-tuning planes; same bit-reproducible
    hyperplanes as q75/q119, so the DuckDB twin replays all three
    sides exactly."""
    from ..operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 8)
    exact = similarity.brute_force_knn(emb, probes, k=3).select(
        "query_id", "neighbor_id"
    )
    # ONE shared signature/norm/bucket-join subplan feeds both arms
    # (similarity.srp_knn_compare — r12, the q168/q175 shared-arm
    # slim): the single-probe candidates are the own-bucket subset of
    # the multi-probe set, so the second srp_knn pipeline was pure
    # recomputation. Rows pinned identical to the standalone calls.
    single_df, multi_df = similarity.srp_knn_compare(
        emb, probes, planes=6, k=3
    )
    single = single_df.select(
        F.col("query_id").alias("sq"), F.col("neighbor_id").alias("sn")
    )
    multi = multi_df.select(
        F.col("query_id").alias("mq"), F.col("neighbor_id").alias("mn")
    )
    hs = (
        exact.join(
            single,
            (F.col("query_id") == F.col("sq"))
            & (F.col("neighbor_id") == F.col("sn")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("sn").alias("n_hits_single"))
    )
    hm = (
        exact.join(
            multi,
            (F.col("query_id") == F.col("mq"))
            & (F.col("neighbor_id") == F.col("mn")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("mn").alias("n_hits_multi"))
    )
    return (
        hs.join(hm, "query_id")
        .select(
            "query_id",
            "n_hits_single",
            "n_hits_multi",
            (F.col("n_hits_multi") >= F.col("n_hits_single")).alias(
                "gate_no_worse"
            ),
        )
        .transform(_ordered, "query_id")
    )


def q166_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repeated-line removal
    (operators/quality.dedup_lines_within_doc): keep-first dedup of
    each page's lines on the normalized (lower+trim) key — the
    curation stage between C4 line rules (q153) and cross-document
    span dedup (q156/q160), catching boilerplate that repeats WITHIN
    a page (nav top+bottom, duplicated footers, scraper stutter).
    Each document is synthesized into an 8-line page where the nav,
    the body line, the lang line, and a case-variant footer each
    repeat; the operator keeps 4. Map-only — split, normalized twin
    array, keep-first filter, reassembly are all array lambdas (no
    explode, no shuffle). DuckDB twin: positional unnest +
    row_number() keep-first + ordered string_agg. §2.13 pipeline
    mandate; no reference twin."""
    from ..operators.quality import dedup_lines_within_doc

    docs = load_table(spark, sf_dir, "documents")
    nav = F.lit("Home | About | Contact.")
    body = F.concat(
        F.lit("Doc "), F.col("doc_id").cast("string"), F.lit(": "), F.col("text")
    )
    langline = F.concat(F.lit("lang "), F.col("lang"), F.lit(" entry."))
    page = F.concat_ws(
        "\n",
        nav,
        body,
        langline,
        nav,
        body,
        F.lit("Copyright 2026."),
        F.lit("copyright 2026. "),
        langline,
    )
    return (
        dedup_lines_within_doc(
            docs.select("doc_id", page.alias("page")), text_col="page"
        )
        .select("doc_id", "n_lines", "n_kept_lines", "n_removed", "dedup_text")
        .transform(_ordered, "doc_id")
    )


def q167_near_dup_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup ADMISSION probe (operators/dedup.near_dup_pairs_vs_
    corpus — the in-session form of the persisted MinHash band index,
    one shared `_mh_agreement_pairs` tail so the two cannot drift):
    "is this incoming batch a near-duplicate of the existing corpus?"
    Corpus = even docs; probe batch = odd docs with an appended tail
    (near-dups) plus every 10th doc re-ingested verbatim under a new
    id (exact mirrors — est 1.0). Estimated Jaccard = MinHash
    signature agreement in integer micro-units (unbiased, stderr
    ≈ sqrt(J(1-J)/16)); candidates via banded md5 keys (band index
    salted in), never all-pairs. DuckDB twin replays normalization,
    shingling, the affine MinHash family, banding, and the agreement
    division exactly. §2.13 admission-control mandate; ref parity:
    exact-title dedup at src/data_processor.py:71, upgraded to
    near-dup at corpus scale."""
    from ..operators.dedup import near_dup_pairs_vs_corpus

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    mutated = docs.filter(F.col("doc_id") % 2 == 1).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" appended tail note.")).alias("text"),
    )
    mirror = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text"
    )
    return near_dup_pairs_vs_corpus(
        old, mutated.unionByName(mirror)
    ).transform(_ordered, "probe_id", "corpus_id")


def q168_pq_rerank_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization two-stage retrieval gate (operators/
    similarity.pq_encode / pq_adc_topk / pq_rerank_topk — Jégou et
    al. 2011): vectors compress to M=8 codebook codes (≈64× smaller
    candidate scan), ADC generates 20 candidates per probe from the
    codes alone, and the exact cosine re-rank recovers precision from
    the raw vectors. Per probe: recall@3 hits of plain ADC vs the
    re-ranked pipeline against brute-force truth, with the provable
    invariant gated IN-QUERY (``gate_no_worse`` — an exact-top-3
    member in ADC top-3 is in the candidate set and at most 2 corpus
    vectors out-sim it, so re-rank hits ⊇ ADC hits; pinned TRUE by
    the oracle hash). Codebooks are COMMITTED integer-micro
    centroids (ml/pq_codebooks.py, deterministic integer Lloyd), so
    the DuckDB twin replays encode, ADC, and re-rank bit-exactly.
    The storage-axis sibling of q123 (int8) and the routing sibling
    of q47 (IVF); measured lift on this corpus: 2/24 → 11/24."""
    from ..operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 8)
    exact = similarity.brute_force_knn(emb, probes, k=3).select(
        "query_id", "neighbor_id"
    ).localCheckpoint(eager=False)  # feeds both hit joins
    # ONE shared encode+ADC pass: ADC top-3 is the head of the top-20
    # candidate ranking (similarity.pq_two_stage — round 12; this
    # query previously scored the corpus once per stage)
    adc_df, rr_df = similarity.pq_two_stage(emb, probes, k=3, candidates=20)
    adc = adc_df.select(
        F.col("query_id").alias("aq"), F.col("neighbor_id").alias("an")
    )
    rr = rr_df.select(
        F.col("query_id").alias("rq"), F.col("neighbor_id").alias("rn")
    )
    ha = (
        exact.join(
            adc,
            (F.col("query_id") == F.col("aq"))
            & (F.col("neighbor_id") == F.col("an")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("an").alias("n_hits_adc"))
    )
    hr = (
        exact.join(
            rr,
            (F.col("query_id") == F.col("rq"))
            & (F.col("neighbor_id") == F.col("rn")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("rn").alias("n_hits_rerank"))
    )
    return (
        ha.join(hr, "query_id")
        .select(
            "query_id",
            "n_hits_adc",
            "n_hits_rerank",
            (F.col("n_hits_rerank") >= F.col("n_hits_adc")).alias(
                "gate_no_worse"
            ),
        )
        .transform(_ordered, "query_id")
    )


def q169_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level filtering (operators/quality.url_blocklist_filter —
    the FIRST stage of RefinedWeb/C4-class crawl pipelines, the
    cheapest reject before extraction runs): registrable-domain
    blocklist join (two-level-suffix-aware, the q154 domain logic)
    plus a blocked-URL-pattern tier compiled to one alternation
    regex. Same deliberately-messy URL synthesis as q154 (five TLD
    shapes incl. two-level suffixes); the de/zh domains are
    blocklisted and doc ids ending in 7 are pattern-blocked. Emits,
    never drops (q78 audit pattern). DuckDB twin replays host
    parsing, the registrable-domain CASE, the IN, and the regex.
    §2.13 front-door mandate; composes BEFORE crawl_front_door."""
    from ..operators.quality import url_blocklist_filter

    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select("doc_id", _synth_url().alias("url"))
    return (
        url_blocklist_filter(
            urls,
            ["example.co.uk", "example.com.cn"],
            blocked_url_patterns=(r"/articles/[0-9]*7\?",),
        )
        .select(
            "doc_id",
            "url_domain",
            "blocked_domain",
            "blocked_pattern",
            "kept_url",
        )
        .transform(_ordered, "doc_id")
    )


#: the clean tail q170 appends; the mojibake variant is GENERATED from
#: it with the same byte-level misread the repair table is built from,
#: so query and oracle share one source of truth
_Q170_CLEAN_TAIL = " café — it’s “great” naïve ½é"


def _q170_mojibake(s: str) -> str:
    from ..functions.text import _cp1252_or_latin1

    return "".join(_cp1252_or_latin1(b) for b in s.encode("utf-8"))


def q170_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding repair (functions/text.repair_mojibake — the
    ftfy-class curation stage reduced to its dominant failure mode,
    UTF-8 misread as cp1252): a 54-entry GENERATED repair table
    (never hand-typed) applied as one chain of literal global
    replaces, longest-first — map-only, codegen, no Python. Every
    third document gets a mojibake'd tail (generated by the same
    byte-level misread), the rest the clean tail; the operator must
    repair exactly the former and pass the latter through
    (``had_mojibake`` / ``n_chars_fixed`` audit the split). DuckDB
    twin embeds the same generated pairs as a nested replace chain
    (control bytes spelled via chr()). §2.13 curation mandate; no
    reference twin (its corpus arrives clean)."""
    from ..functions import text as Ftext

    docs = load_table(spark, sf_dir, "documents")
    tail = F.when(
        F.col("doc_id") % 3 == 0, F.lit(_q170_mojibake(_Q170_CLEAN_TAIL))
    ).otherwise(F.lit(_Q170_CLEAN_TAIL))
    staged = docs.select(
        "doc_id", F.concat(F.col("text"), tail).alias("page")
    ).select("doc_id", "page", Ftext.repair_mojibake("page").alias("fixed_text"))
    return staged.select(
        "doc_id",
        (F.col("page") != F.col("fixed_text")).alias("had_mojibake"),
        (F.length("page") - F.length("fixed_text"))
        .cast("long")
        .alias("n_chars_fixed"),
        "fixed_text",
    ).transform(_ordered, "doc_id")


#: q171's injected sentence — clean form here, mojibake'd by the same
#: generator the repair table is built from (shared source of truth)
_Q171_CLEAN_LINE = "Great café — it’s naïve effort."


def _q171_source(docs: DataFrame) -> DataFrame:
    """The synthesized crawl corpus the capstone queries share (q171,
    q176): every document wrapped in chrome-laden HTML with a
    duplicated boilerplate paragraph, a mojibake'd sentence on every
    third page, and a synthetic URL."""
    moji = F.when(
        F.col("doc_id") % 3 == 0, F.lit(_q170_mojibake(_Q171_CLEAN_LINE))
    ).otherwise(F.lit(_Q171_CLEAN_LINE))
    page = F.concat(
        F.lit(
            "<html><head><script>var x = 1;</script></head><body>"
            '<nav><a href="/">Home</a> | <a href="/about">About</a></nav>'
            "<article><p>Doc "
        ),
        F.col("doc_id").cast("string"),
        F.lit(" of the corpus.</p><p>"),
        F.col("text"),
        F.lit(
            " tail marker.</p>"
            "<p>Subscribe to our newsletter today.</p>"
            "<p>Subscribe to our newsletter today.</p><p>"
        ),
        moji,
        F.lit("</p><p>lang "),
        F.col("lang"),
        F.lit(
            "</p><p>Enable javascript to continue.</p></article>"
            "<footer>&copy; corp</footer></body></html>"
        ),
    )
    return docs.select(
        "doc_id", page.alias("html"), _synth_url().alias("url")
    )


def q171_full_front_door_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE crawl front door, composed and oracle-proven end
    to end (q158's capstone extended with the round's three new
    stages): URL blocklist (q169 — de-domain docs drop before
    extraction), encoding repair (q170 — every third page carries a
    mojibake'd sentence the repair must fix in the RAW html),
    extraction (q151), C4 line rules (q153), intra-doc line dedup
    (q166 — a duplicated subscribe-boilerplate paragraph collapses),
    URL canonicalization (q154), rolled up per registrable domain
    with exact-integer audit sums (docs, hosts, C4-kept lines,
    dedup-removed lines, final clean chars). The DuckDB twin is
    COMPOSED from the same stage generators — and synthesizes the
    CLEAN page directly, so a broken Spark-side repair diverges the
    hash (the round-trip is the load-bearing claim). Map-only + one
    window, the same callable the streaming sink runs."""
    from ..functions.url import host, registrable_domain
    from ..operators.quality import crawl_front_door

    src = _q171_source(load_table(spark, sf_dir, "documents"))
    fd = crawl_front_door(
        src,
        url_col="url",
        blocked_domains=["example.co.uk"],
        fix_encoding=True,
        dedup_lines=True,
    )
    h = host(F.col("url"))
    return (
        fd.select(
            registrable_domain(h).alias("domain"),
            h.alias("__host"),
            "n_kept",
            "n_dup_lines",
            F.length("text").cast("long").alias("__chars"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("__host").alias("n_hosts"),
            F.sum("n_kept").alias("kept_lines"),
            F.sum("n_dup_lines").alias("dup_lines_removed"),
            F.sum("__chars").alias("clean_chars"),
        )
        .transform(_ordered, "domain")
    )


def q172_admission_two_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-tier near-dup admission, composed (operators/dedup.
    near_dup_pairs_vs_corpus → admission_verify_exact): the cheap
    signature-agreement ESTIMATE admits candidate pairs (q167's
    chain), then the EXACT tier computes each admitted pair's true
    Jaccard from the real shingle sets — integer micro-units both
    tiers, so the estimate's error is itself oracle-pinned per pair
    (mirrors land at exactly 1.0/1.0; mutated tails show the
    estimator's ±stderr scatter around truth). This is the documented
    ingest discipline: gate on the estimate, verify before
    destructive decisions. Twin wraps the q167 oracle verbatim as the
    candidate subquery and adds the exact intersection tier."""
    from ..operators.dedup import admission_two_tier

    docs = load_table(spark, sf_dir, "documents")
    # both tiers (signature estimate + exact shingle verify) re-derive
    # the corpus and probe slices — cut each once (r12, two consumers
    # apiece; the synthesized probe union alone is two more documents
    # scans per consumer)
    old = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", "text")
        .localCheckpoint(eager=False)
    )
    probes = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" appended tail note.")).alias(
                "text"
            ),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 0).select(
                (F.col("doc_id") + 2000000).alias("doc_id"), "text"
            )
        )
        .localCheckpoint(eager=False)
    )
    # r13: both tiers fused over one shingle pipeline per side
    # (dedup.admission_two_tier — row-identical to the composed
    # near_dup_pairs_vs_corpus → admission_verify_exact, test-pinned)
    return (
        admission_two_tier(old, probes)
        .select(
            "probe_id", "corpus_id", "est_jaccard_micro",
            "exact_jaccard_micro",
        )
        .transform(_ordered, "probe_id", "corpus_id")
    )


def q173_ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ composition (VERDICT r9 #2): committed coarse centroids
    route each probe to its 4 nearest cells, the candidate scan reads
    PQ codes (ADC int64 lookup sums) ONLY inside those cells, and an
    exact cosine re-rank of the top-20 survivors yields top-3 — the
    IVFADC layout where routing is the sub-linear axis and PQ the
    compression axis (operators/similarity.ivf_pq_topk). Self-audit
    form (the q119/q168 class): carries brute-force truth in-query and
    emits per-probe recall plus the SCANNED-ROW count against the
    corpus size, gating sub-linearity in-query — at sf0.01 each probe
    scans ~4/16 of the corpus instead of all of it. Twin replays
    assignment, routing, ADC, re-rank, and the counts from the same
    committed literals."""
    from ..ml.centroids import IVF_CENTROIDS
    from ..operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 8)
    # the approx result feeds TWO consumers (hits join + scanned
    # rollup); without a barrier the whole route/encode/ADC/rerank DAG
    # executes twice per run — the materialized slice is ≤ 8·k rows
    # (round 11: q173 was the suite's 2nd-slowest query, harness cost)
    approx = similarity.ivf_pq_topk(
        emb, probes, IVF_CENTROIDS, k=3, nprobe=4, candidates=20
    ).localCheckpoint(eager=False)
    exact = similarity.brute_force_knn(emb, probes, k=3).select(
        "query_id", "neighbor_id"
    )
    hits = (
        exact.join(
            approx.select("query_id", "neighbor_id").withColumn(
                "__hit", F.lit(1)
            ),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("__hit").alias("n_hits"))
    )
    scanned = approx.groupBy("query_id").agg(
        F.max("n_scanned").alias("n_scanned")
    )
    n_corpus = emb.agg(F.count("*").alias("n_corpus"))
    return (
        hits.join(scanned, "query_id", "left")
        .withColumn("n_scanned", F.coalesce("n_scanned", F.lit(0)))
        .crossJoin(F.broadcast(n_corpus))
        .withColumn(
            "gate_sublinear", F.col("n_scanned") < F.col("n_corpus")
        )
        .transform(_ordered, "query_id")
    )


def q174_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet perplexity filter (VERDICT r9 #4): every document scored
    against the COMMITTED trigram stupid-backoff LM
    (operators/quality.lm_perplexity_scores; counts in
    ml/lm_counts.py, trained once by scripts/gen_lm_counts.py) and
    bucketed head/middle/tail by the committed training tertiles —
    the canonical learned-curation stage beside q161's quality
    classifier and q163's language ID. Integer micro arithmetic end
    to end; the twin derives per-n-gram scores from the SAME
    ml/lm.score_maps(), so scoring is hash-checked."""
    from ..operators.quality import lm_perplexity_scores

    docs = load_table(spark, sf_dir, "documents")
    return lm_perplexity_scores(docs).transform(_ordered, "doc_id")


def q175_residual_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual vs raw product quantization under identical IVF
    routing (the IVFADC refinement q173's docstring flags as the
    documented trade): both paths route probes to the same 4 cells
    and re-rank the same number of ADC survivors (candidates=5 — small
    enough that the re-rank cannot mask candidate quality), differing
    ONLY in what the codes quantize — raw vectors (ml/pq_codebooks)
    vs residuals against the assigned coarse centroid
    (ml/pq_residual_codebooks; score = ⟨q,c_L⟩ + Σ LUT[m][code_m]).
    Emits per-probe hits@3 vs brute-force truth for both, plus the
    corpus-level no-worse gate (measured: residual lifts 4/24 → 8/24
    at sf0.01). Twin replays both integer paths from the same
    committed literals."""
    from pyspark.sql import Window as W

    from ..ml.centroids import IVF_CENTROIDS
    from ..operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 8)
    # brute-force truth feeds BOTH arms' hits joins: one barrier
    # (≤ 8·k rows) instead of two full corpus scans per run — the
    # shared-truth-subplan slim (VERDICT r10 next-round #1c)
    exact = similarity.brute_force_knn(emb, probes, k=3).select(
        "query_id", "neighbor_id"
    ).localCheckpoint(eager=False)

    def hits(approx, name):
        return (
            exact.join(
                approx.select("query_id", "neighbor_id").withColumn(
                    "__h", F.lit(1)
                ),
                ["query_id", "neighbor_id"],
                "left",
            )
            .groupBy("query_id")
            .agg(F.count("__h").alias(name))
        )

    # ONE shared assignment/routing/norm subplan feeds both arms
    # (similarity.ivf_pq_compare — VERDICT r11 #5); each arm keeps
    # only its own encode scan + ADC tail
    raw, res = similarity.ivf_pq_compare(
        emb, probes, IVF_CENTROIDS, k=3, nprobe=4, candidates=5
    )
    both = hits(raw, "n_hits_raw").join(hits(res, "n_hits_res"), "query_id")
    w_all = W.partitionBy()
    return (
        both.withColumn(
            "gate_residual_total_no_worse",
            F.sum("n_hits_res").over(w_all)
            >= F.sum("n_hits_raw").over(w_all),
        )
        .transform(_ordered, "query_id")
    )


def q182_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile summaries with the GK/KLL rank-error bound
    gated IN-QUERY (round 12 — operators/sketches.quantile_summary /
    quantile_merge_estimate): the percentile monitoring a 100 TB lake
    keeps per epoch — k values at equi-depth boundary ranks (two-phase
    rank, never a single-partition sort; k rows stored per epoch, not
    n), merged by weighted union with errors ADDING. lineitem prices
    split into two epochs (l_orderkey parity, k=16 each); the merged
    p25/p50/p75/p90 estimates are checked against the EXACT ranks:
    the estimate's true-rank interval [count(<est)+1, count(≤est)]
    must meet [target−slack, target+slack] with
    slack = ceil(n_a/k) + ceil(n_b/k) — the additive mergeable-
    summary guarantee, hash-pinned TRUE. Shape: one rank pass per
    epoch; the merge windows run over Σk summary rows (metadata-
    scale, the bucket-offset exemption). Twin replays the boundary-
    rank rule, the weighted union, and both exact counts."""
    from ..operators.sketches import quantile_merge_estimate, quantile_summary

    li = load_table(spark, sf_dir, "lineitem")
    # one lineitem scan, cut once (r12): the summary pipeline walks it
    # 4× (bucket stats, bucket counts, offset join, epoch sizes) and
    # the exact-truth arm again — the roster's multi-consumer
    # lazy-checkpoint discipline. Both parity epochs run through ONE
    # grouped rank pass (quantile_summary(group=["__pm"]) — identical
    # per-epoch values, half the stages), and the ≤2k-row grouped
    # summary is cut once for its two epoch slices so the rank
    # pipeline executes once.
    price = li.select(
        (F.col("l_orderkey") % 2).alias("__pm"),
        F.col("l_extendedprice").alias("__v"),
    ).localCheckpoint(eager=False)
    s = quantile_summary(
        price, "__v", k=16, group=["__pm"]
    ).localCheckpoint(eager=False)
    sa = s.filter(F.col("__pm") == 0).drop("__pm")
    sb = s.filter(F.col("__pm") == 1).drop("__pm")
    ests = quantile_merge_estimate([sa, sb], [25, 50, 75, 90])
    slack = (
        sa.select(F.col("n").alias("__na"))
        .limit(1)
        .crossJoin(sb.select(F.col("n").alias("__nb")).limit(1))
        .select(
            (
                F.floor((F.col("__na") + 15) / 16)
                + F.floor((F.col("__nb") + 15) / 16)
            )
            .cast("long")
            .alias("slack")
        )
    )
    truth = (
        price.select("__v")
        .crossJoin(F.broadcast(ests))
        .groupBy("pm", "est", "target", "N")
        .agg(
            F.sum((F.col("__v") <= F.col("est")).cast("long")).alias(
                "rank_le"
            ),
            F.sum((F.col("__v") < F.col("est")).cast("long")).alias(
                "rank_lt"
            ),
        )
    )
    return (
        truth.crossJoin(F.broadcast(slack))
        .select(
            "pm",
            "est",
            "target",
            "rank_le",
            "rank_lt",
            "slack",
            (
                (F.col("rank_le") >= F.col("target") - F.col("slack"))
                & (F.col("rank_lt") + 1 <= F.col("target") + F.col("slack"))
            ).alias("gate_rank_error"),
        )
        .transform(_ordered, "pm")
    )


def q181_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable heavy-hitter summaries with in-query Misra-Gries
    guarantees (round 12 — operators/sketches.hh_summary / hh_merge):
    the hot-token monitoring a 100 TB ingest keeps per epoch (hot
    boilerplate lines and tokens ARE heavy hitters — the C4 line
    rule's SMALL side). The corpus tokens split into two epoch
    summaries (doc_id parity), each an exact-per-shard top-k with the
    largest-dropped-count threshold (shards·k state, never |vocab|),
    merged with bounded under-count. Both guarantees gate IN-QUERY
    against the exact token counts (q168's self-audit discipline):
    ``gate_bounds`` — every reported key's est ≤ true ≤ est + err;
    ``gate_complete`` — no unreported key exceeds its shard's
    threshold. Shape (r12): ONE token-grain count shuffle at
    (epoch, key) grain (map-side combinable) feeds both epoch
    summaries AND the exact-truth gate — the epoch summary is the
    parity slice, the exact count the parity roll-up (identical
    values to per-epoch recounts by associativity of count) — then
    per-shard windows over DISTINCT keys; the merge is summary-sized.
    Twin replays the md5 shards, both top-k/threshold constructions,
    the full-outer merge, and both gates."""
    from ..functions.text import normalized_text
    from ..operators.dedup import hash60
    from ..operators.sketches import (
        HHParams,
        hh_merge,
        hh_summary_from_counts,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(normalized_text("text"), " "), lambda t: t != ""
            )
        ).alias("tok"),
    )
    P = HHParams(k=4, shards=4, seed="hh")
    # one tokenize pass + one (epoch, key)-grain count shuffle; three
    # consumers (epoch A summary, epoch B summary, exact truth) — the
    # roster's multi-consumer lazy-checkpoint discipline
    counts_pk = (
        toks.groupBy(
            (F.col("doc_id") % 2).alias("__pm"),
            F.col("tok").cast("string").alias("key"),
        )
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    sa = hh_summary_from_counts(
        counts_pk.filter(F.col("__pm") == 0).select("key", "cnt"), params=P
    )
    sb = hh_summary_from_counts(
        counts_pk.filter(F.col("__pm") == 1).select("key", "cnt"), params=P
    )
    m = hh_merge(sa, sb, params=P)
    exact = counts_pk.groupBy("key").agg(
        F.sum("cnt").alias("true_cnt")
    )
    thr_by_shard = m.groupBy("shard").agg(F.max("thr").alias("__thr"))
    unrep = (
        exact.withColumn("shard", hash60(F.col("key"), P.seed) % P.shards)
        .join(m.select("shard", "key"), ["shard", "key"], "left_anti")
        .groupBy("shard")
        .agg(F.max("true_cnt").alias("__max_unrep"))
    )
    comp = (
        thr_by_shard.join(unrep, "shard", "left")
        .select(
            (
                F.coalesce("__max_unrep", F.lit(0)) <= F.col("__thr")
            ).alias("__ok")
        )
        .agg(F.min("__ok").alias("gate_complete"))
    )
    return (
        m.join(exact, "key")
        .crossJoin(F.broadcast(comp))
        .select(
            "shard",
            "key",
            "cnt",
            "err",
            "thr",
            "true_cnt",
            (
                (F.col("cnt") <= F.col("true_cnt"))
                & (F.col("true_cnt") <= F.col("cnt") + F.col("err"))
            ).alias("gate_bounds"),
            "gate_complete",
        )
        .transform(_ordered, "shard", "key")
    )


def q180_decontamination_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE verdict row per training document with BOTH decontamination
    passes (round 12, VERDICT r11 #6): modern data cards report n-gram
    AND embedding-space contamination together, but q71 and q177 run
    as separate passes — this composes them with the front_door_audit
    emit-never-drop pattern: every corpus doc (q71's %20 split) gets a
    row; the n-gram columns coalesce to 0, the semantic columns stay
    NULL when clean (at SFs where embeddings cover a doc prefix only,
    uncovered docs are semantically NULL by construction), and
    ``verdict`` folds the four outcomes (both/ngram/semantic/clean).
    Plan: the UNION of the two existing shapes — q71's shingle
    equi-join + q177's SRP bucket join — plus two joins of the SMALL
    flagged sets back onto the corpus ids (broadcast under AQE; the
    corpus side adds no new shuffle). Twin: the q71 and q177 oracle
    texts verbatim as CTE subqueries + the same two left joins."""
    from ..operators.quality import decontaminate, semantic_decontaminate

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    ng = decontaminate(corpus, bench, k=5)
    sem_bench = emb.filter(F.col("vec_id") % 41 == 1).select(
        (F.col("vec_id") + 10**9).alias("vec_id"),
        F.expr(
            "transform(CAST(embedding AS ARRAY<DOUBLE>), (x, i) -> "
            "CASE WHEN i = 0 THEN x + 0.002 ELSE x END)"
        ).alias("embedding"),
    )
    sem = semantic_decontaminate(emb, sem_bench, threshold=0.999, planes=6)
    out = (
        corpus.select("doc_id")
        .join(ng, "doc_id", "left")
        .join(
            sem.select(
                F.col("vec_id").alias("doc_id"),
                F.col("bench_id").alias("sem_bench_id"),
                F.col("sim").alias("sem_sim"),
            ),
            "doc_id",
            "left",
        )
    )
    ngf = F.col("n_overlap").isNotNull()
    smf = F.col("sem_bench_id").isNotNull()
    return out.select(
        "doc_id",
        F.coalesce("n_overlap", F.lit(0).cast("long")).alias("n_overlap"),
        F.coalesce("n_bench_docs", F.lit(0).cast("long")).alias(
            "n_bench_docs"
        ),
        ngf.alias("ngram_flagged"),
        "sem_bench_id",
        "sem_sim",
        smf.alias("sem_flagged"),
        F.when(ngf & smf, "both")
        .when(ngf, "ngram")
        .when(smf, "semantic")
        .otherwise("clean")
        .alias("verdict"),
    ).transform(_ordered, "doc_id")


def q179_front_door_batch_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's per-shard paragraph dedup INSIDE the front door (round
    12, VERDICT r11 #3 — the ``FrontDoorConfig.batch_line_cap`` stage
    landed in r11 unit-tested but with no oracle row): q171's
    synthesized crawl runs mojibake repair → extraction → C4 →
    intra-doc line dedup → the batch line cap (Wenzek et al. 2020
    dedup paragraphs per shard BEFORE the LM scores). The stage
    removes exactly the cross-document boilerplate the intra-doc pass
    cannot see — the subscribe banner's SURVIVING copy (one per doc
    after q166's pass, corpus-count ≫ cap) and the shared clean
    sentence — while per-doc-unique lines keep every copy. Non-gating:
    every post-C4 doc keeps its audit row. Shape: the front door's
    map-only chain + the stage's two spreadable exchanges (line-keyed
    count, id-keyed rebuild; the hot set is the SMALL side). Twin:
    q176's stage CTE composition + q178's count/flag/rebuild CTEs over
    the post-intra-dedup text."""
    from ..operators.quality import (
        FrontDoorConfig,
        crawl_front_door_configured,
    )

    src = _q171_source(load_table(spark, sf_dir, "documents"))
    fd = crawl_front_door_configured(
        src,
        FrontDoorConfig(
            fix_encoding=True, dedup_lines=True, batch_line_cap=2
        ),
    )
    return fd.select(
        "doc_id",
        "n_kept",
        "n_dup_lines",
        "n_batch_dup_lines",
        F.length("text").cast("long").alias("clean_chars"),
    ).transform(_ordered, "doc_id")


def q178_corpus_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4's GLOBAL line rule (round 11 —
    operators/quality.dedup_lines_across_corpus): every copy of a line
    repeated past the cap ACROSS the corpus is discarded, the
    boilerplate the intra-doc pass (q166) cannot see. Each document
    synthesizes a 5-line page: a cookie banner shared by ALL docs and
    a lang line shared by hundreds (both removed at cap=2), a pair
    line shared by exactly 2 docs and a unique body (both kept — the
    cap's threshold semantics, not just 'seen twice'). Shape: one
    line-keyed count shuffle; the hot set (repeated boilerplate only)
    anti-joins back small-side; one id-keyed rebuild. Twin: positional
    unnest + global counts + ordered string_agg."""
    from ..operators.quality import dedup_lines_across_corpus

    docs = load_table(spark, sf_dir, "documents")
    page = F.concat_ws(
        "\n",
        F.lit("Accept all cookies to continue."),
        F.concat(
            F.lit("Doc "), F.col("doc_id").cast("string"),
            F.lit(": "), F.col("text"),
        ),
        F.concat(F.lit("lang "), F.col("lang"), F.lit(" section.")),
        F.concat(
            F.lit("pair "),
            F.floor(F.col("doc_id") / 2).cast("string"),
            F.lit(" marker."),
        ),
        F.lit(""),
    )
    out = dedup_lines_across_corpus(
        docs.select("doc_id", page.alias("text")),
        max_occurrences=2,
    )
    return out.select(
        "doc_id",
        "n_lines",
        "n_kept_lines",
        "n_removed",
        F.length("clean_text").cast("long").alias("clean_chars"),
    ).transform(_ordered, "doc_id")


def q177_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING-space decontamination (round 11 —
    operators/quality.semantic_decontaminate): the semantic complement
    of q71's n-gram pass, catching the paraphrase/translation leaks
    token overlap misses. The benchmark is SYNTHESIZED the q171 way —
    every 41st corpus vector, first component perturbed by +0.002 and
    id remapped — so contamination exists at the operator's designed
    operating point (near-dup similarity), deterministically at every
    SF. Candidates come from the deterministic SRP bucket equi-join
    (benchmark side Hamming-1 multi-probed and broadcast — bounded by
    the eval suite, never |corpus|·|benchmark|), exact 6-dp cosine
    verifies, argmax per corpus vector (ties to the smaller bench id).
    The oracle replays the synthesis, the hyperplanes, the probe
    expansion, and the verify from the same md5 literals. Recall vs
    the exhaustive blocked-GEMM truth is pinned in
    tests/test_dedup_similarity.py."""
    from ..operators.quality import semantic_decontaminate

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 41 == 1).select(
        (F.col("vec_id") + 10**9).alias("vec_id"),
        F.expr(
            "transform(CAST(embedding AS ARRAY<DOUBLE>), (x, i) -> "
            "CASE WHEN i = 0 THEN x + 0.002 ELSE x END)"
        ).alias("embedding"),
    )
    return semantic_decontaminate(
        emb, bench, threshold=0.999, planes=6
    ).transform(_ordered, "vec_id")


def q176_front_door_lm_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone with the CCNet stage order COMPLETE: q171's full
    front door (blocklist → mojibake repair → extraction → C4 →
    intra-doc line dedup → canonical-URL dedup) plus the committed
    trigram-LM perplexity gate LAST (``lm_buckets=('head',
    'middle')`` — the tail third of the reference distribution drops,
    exactly CCNet's split), rolled up per registrable domain with the
    bucket mix, the LM score mass, and the audit sums. The twin
    composes q171's stage generators with q174's scoring CTEs over the
    POST-pipeline text, so the whole nine-stage pipeline — including
    the learned gate's verdicts on cleaned text — is hash-checked."""
    from ..functions.url import host, registrable_domain
    from ..operators.quality import crawl_front_door

    src = _q171_source(load_table(spark, sf_dir, "documents"))
    fd = crawl_front_door(
        src,
        url_col="url",
        blocked_domains=["example.co.uk"],
        fix_encoding=True,
        dedup_lines=True,
        lm_buckets=("head", "middle"),
    )
    h = host(F.col("url"))
    return (
        fd.select(
            registrable_domain(h).alias("domain"),
            "n_kept",
            "n_dup_lines",
            "lm_score_micro",
            "ppl_bucket",
            F.length("text").cast("long").alias("__chars"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("ppl_bucket") == "head").cast("long")).alias(
                "n_head"
            ),
            F.sum((F.col("ppl_bucket") == "middle").cast("long")).alias(
                "n_middle"
            ),
            F.sum("n_kept").alias("kept_lines"),
            F.sum("n_dup_lines").alias("dup_lines_removed"),
            F.sum("lm_score_micro").alias("lm_score_sum"),
            F.sum("__chars").alias("clean_chars"),
        )
        .transform(_ordered, "domain")
    )


_QUERY_FNS: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q182_quantile_sketch": q182_quantile_sketch,
    "q181_heavy_hitters": q181_heavy_hitters,
    "q180_decontamination_card": q180_decontamination_card,
    "q179_front_door_batch_dedup": q179_front_door_batch_dedup,
    "q178_corpus_line_dedup": q178_corpus_line_dedup,
    "q177_semantic_decontamination": q177_semantic_decontamination,
    "q176_front_door_lm_rollup": q176_front_door_lm_rollup,
    "q175_residual_pq_recall": q175_residual_pq_recall,
    "q174_lm_perplexity": q174_lm_perplexity,
    "q173_ivf_pq_search": q173_ivf_pq_search,
    "q172_admission_two_tier": q172_admission_two_tier,
    "q171_full_front_door_rollup": q171_full_front_door_rollup,
    "q170_mojibake_repair": q170_mojibake_repair,
    "q169_url_blocklist": q169_url_blocklist,
    "q168_pq_rerank_recall": q168_pq_rerank_recall,
    "q167_near_dup_admission": q167_near_dup_admission,
    "q166_line_dedup": q166_line_dedup,
    "q165_multiprobe_recall": q165_multiprobe_recall,
    "q164_fertility_by_model_lang": q164_fertility_by_model_lang,
    "q163_langid_model": q163_langid_model,
    "q162_incremental_view_refresh": q162_incremental_view_refresh,
    "q161_quality_classifier": q161_quality_classifier,
    "q160_span_removal": q160_span_removal,
    "q159_sequence_manifest": q159_sequence_manifest,
    "q158_domain_curation_rollup": q158_domain_curation_rollup,
    "q157_quantile_sketch": q157_quantile_sketch,
    "q156_duplicated_spans": q156_duplicated_spans,
    "q155_tokenizer_fertility": q155_tokenizer_fertility,
    "q154_url_canonicalization": q154_url_canonicalization,
    "q153_c4_line_cleaning": q153_c4_line_cleaning,
    "q152_bpe_token_stats": q152_bpe_token_stats,
    "q151_html_extraction": q151_html_extraction,
    "q150_bloom_membership": q150_bloom_membership,
    "q149_prefix_filter_pairs": q149_prefix_filter_pairs,
    "q148_weighted_median_price": q148_weighted_median_price,
    "q147_hybrid_rrf": q147_hybrid_rrf,
    "q146_embedding_drift": q146_embedding_drift,
    "q145_name_typo_pairs": q145_name_typo_pairs,
    "q144_kmv_audience_overlap": q144_kmv_audience_overlap,
    "q143_bm25_search": q143_bm25_search,
    "q142_cms_heavy_hitters": q142_cms_heavy_hitters,
    "q141_drift_psi": q141_drift_psi,
    "q140_ranking_ndcg": q140_ranking_ndcg,
    "q139_bpe_merges": q139_bpe_merges,
    "q138_hard_negative_mining": q138_hard_negative_mining,
    "q133_status_intervals": q133_status_intervals,
    "q134_time_weighted_value": q134_time_weighted_value,
    "q135_semantic_balanced_sample": q135_semantic_balanced_sample,
    "q136_purchase_attribution": q136_purchase_attribution,
    "q137_expectation_audit": q137_expectation_audit,
    "q132_event_debounce": q132_event_debounce,
    "q131_dsir_selection": q131_dsir_selection,
    "q26_rollup_revenue": q26_rollup_revenue,
    "q54_item_cooccurrence": q54_item_cooccurrence,
    "q87_item_pagerank": q87_item_pagerank,
    "q100_item_graph_triangles": q100_item_graph_triangles,
    "q106_personalized_pagerank": q106_personalized_pagerank,
    "q116_association_rules": q116_association_rules,
    "q86_events_profile": q86_events_profile,
    "q86b_events_profile_approx": q86b_events_profile_approx,
    "q128_orders_merge": q128_orders_merge,
    "q102_snapshot_diff": q102_snapshot_diff,
    "q117_revenue_lorenz": q117_revenue_lorenz,
    "q99_revenue_gini": q99_revenue_gini,
    "q129_rfm_segmentation": q129_rfm_segmentation,
    "q48_ntile_quartiles": q48_ntile_quartiles,
    "q28_value_percentiles": q28_value_percentiles,
    "q108_value_percent_rank": q108_value_percent_rank,
    "q110_zipf_fit": q110_zipf_fit,
    "q125_spearman_spend_balance": q125_spearman_spend_balance,
    "q126_mann_whitney": q126_mann_whitney,
    "q124_corpus_mixture": q124_corpus_mixture,
    "q05_top_events_per_type": q05_top_events_per_type,
    "q77_corpus_bigrams": q77_corpus_bigrams,
    "q74_winnow_fingerprint_pairs": q74_winnow_fingerprint_pairs,
    "q75_srp_lsh_ann": q75_srp_lsh_ann,
    "q76_salted_distinct_users": q76_salted_distinct_users,
    "q78_pii_redaction": q78_pii_redaction,
    "q122_doc_chunks": q122_doc_chunks,
    "q123_quantized_recall": q123_quantized_recall,
    "q127_approx_percentile_gate": q127_approx_percentile_gate,
    "q130_cohort_ltv": q130_cohort_ltv,
    "q96_leakage_free_split": q96_leakage_free_split,
    "q97_lexical_diversity": q97_lexical_diversity,
    "q115_fulfillment_latency": q115_fulfillment_latency,
    "q02_top_orders_by_revenue": q02_top_orders_by_revenue,
    "q12_part_type_revenue": q12_part_type_revenue,
    "q36_supplier_diversity": q36_supplier_diversity,
    "q121_nation_revenue_momentum": q121_nation_revenue_momentum,
    "q95_incremental_dedup": q95_incremental_dedup,
    "q92_priority_status_chi2": q92_priority_status_chi2,
    "q112_type_hour_mutual_info": q112_type_hour_mutual_info,
    "q120_activity_heatmap": q120_activity_heatmap,
    "q119_ann_recall_eval": q119_ann_recall_eval,
    "q118_benford_audit": q118_benford_audit,
    "q114_cross_source_novelty": q114_cross_source_novelty,
    "q113_dup_cluster_sizes": q113_dup_cluster_sizes,
    "q111_daily_event_trend": q111_daily_event_trend,
    "q109_label_scatter": q109_label_scatter,
    "q107_ab_test_ztest": q107_ab_test_ztest,
    "q105_session_transitions": q105_session_transitions,
    "q104_referential_integrity": q104_referential_integrity,
    "q103_containment_pairs": q103_containment_pairs,
    "q101_daily_value_ohlc": q101_daily_value_ohlc,
    "q98_price_histogram": q98_price_histogram,
    "q94_canonical_selection": q94_canonical_selection,
    "q93_sequence_packing": q93_sequence_packing,
    "q91_rolling_user_spend": q91_rolling_user_spend,
    "q90_user_key_skew": q90_user_key_skew,
    "q89_weighted_corpus_sample": q89_weighted_corpus_sample,
    "q88_value_outliers": q88_value_outliers,
    "q85_bigram_lm_quality": q85_bigram_lm_quality,
    "q84_chunk_dedup": q84_chunk_dedup,
    "q83_cohort_retention": q83_cohort_retention,
    "q82_conversion_funnel": q82_conversion_funnel,
    "q81_gap_filled_series": q81_gap_filled_series,
    "q80_curation_pipeline": q80_curation_pipeline,
    "q79_scd2_history": q79_scd2_history,
    "q55_local_supplier_volume": q55_local_supplier_volume,
    "q56_bilateral_shipping": q56_bilateral_shipping,
    "q57_national_market_share": q57_national_market_share,
    "q58_returned_item_revenue": q58_returned_item_revenue,
    "q59_promo_revenue_share": q59_promo_revenue_share,
    "q60_top_supplier": q60_top_supplier,
    "q61_large_volume_customers": q61_large_volume_customers,
    "q62_brand_quantity_revenue": q62_brand_quantity_revenue,
    "q63_dormant_high_balance": q63_dormant_high_balance,
    "q64_token_budget_by_lang": q64_token_budget_by_lang,
    "q65_grouping_sets_events": q65_grouping_sets_events,
    "q66_near_dup_removal": q66_near_dup_removal,
    "q67_decayed_confidence": q67_decayed_confidence,
    "q68_variant_props": q68_variant_props,
    "q69_incident_window_join": q69_incident_window_join,
    "q70_repetition_quality": q70_repetition_quality,
    "q71_decontamination": q71_decontamination,
    "q72_stratified_sample": q72_stratified_sample,
    "q73_keyword_tfidf": q73_keyword_tfidf,
    "q01_pricing_summary": q01_pricing_summary,
    "q03_region_revenue": q03_region_revenue,
    "q04_event_type_stats": q04_event_type_stats,
    "q06_orders_page": q06_orders_page,
    "q07_active_customers": q07_active_customers,
    "q08_inactive_customers": q08_inactive_customers,
    "q09_value_buckets": q09_value_buckets,
    "q10_hourly_events": q10_hourly_events,
    "q11_union_order_classes": q11_union_order_classes,
    "q13_props_json": q13_props_json,
    "q14_doc_stats_by_lang": q14_doc_stats_by_lang,
    "q15_doc_exact_dedup": q15_doc_exact_dedup,
    "q16_knn_cosine": q16_knn_cosine,
    "q17_ngram_jaccard_pairs": q17_ngram_jaccard_pairs,
    "q18_minhash_signatures": q18_minhash_signatures,
    "q19_simhash": q19_simhash,
    "q20_minhash_lsh_pairs": q20_minhash_lsh_pairs,
    "q21_embedding_dup_pairs": q21_embedding_dup_pairs,
    "q22_doc_quality": q22_doc_quality,
    "q23_lang_confusion": q23_lang_confusion,
    "q24_user_running_totals": q24_user_running_totals,
    "q25_sessionization": q25_sessionization,
    "q27_daily_event_pivot": q27_daily_event_pivot,
    "q29_asof_last_click": q29_asof_last_click,
    "q30_hash_attributes": q30_hash_attributes,
    "q31_duration_format": q31_duration_format,
    "q32_cube_order_stats": q32_cube_order_stats,
    "q33_intersect_buyers": q33_intersect_buyers,
    "q34_except_customers": q34_except_customers,
    "q35_fuzzy_category_match": q35_fuzzy_category_match,
    "q37_order_count_distribution": q37_order_count_distribution,
    "q38_small_quantity_revenue": q38_small_quantity_revenue,
    "q39_late_shipment_priorities": q39_late_shipment_priorities,
    "q49_first_last_gap": q49_first_last_gap,
    "q50_user_event_arrays": q50_user_event_arrays,
    "q51_forecast_revenue": q51_forecast_revenue,
    "q52_unpivot_event_stats": q52_unpivot_event_stats,
    "q53_click_attribution": q53_click_attribution,
    "q44_multimodal_decode": q44_multimodal_decode,
    "q45_video_frame_sample": q45_video_frame_sample,
    "q46_image_resize_plan": q46_image_resize_plan,
    "q40_als_recommendations": q40_als_recommendations,
    "q41_kmeans_clusters": q41_kmeans_clusters,
    "q42_tfidf_features": q42_tfidf_features,
    "q43_hybrid_recommendations": q43_hybrid_recommendations,
    "q47_ivf_ann_search": q47_ivf_ann_search,
}


# ---------------------------------------------------------------------------
# Prepared-plan layer.
#
# A DataFrame is an immutable lazy logical plan, so re-serving the same
# (session, sf_dir, query) triple can reuse the built plan verbatim —
# the prepared-statement cache every query service keeps (and what the
# serving layer in plans/serving.py does per request). Building a plan
# costs 40 ms-1.4 s of driver-side py4j round trips (one per Column op;
# measured via scripts/floor_probe.py: 13.8 s across the 78-query suite
# at sf0.1), all of which is per-plan, not per-execution.
#
# Execution is NOT cached: every action re-runs the full plan against
# storage. Same discipline as sources/readers._TABLE_CACHE (the session
# object is held in the value so a recycled id() can't alias a new
# session). Kill-switch: SPARK_GRAFT_PLAN_CACHE=0.
# ---------------------------------------------------------------------------

_PLAN_CACHE: dict[tuple[int, str, str], tuple[SparkSession, DataFrame]] = {}


def _prepared(
    name: str, fn: Callable[[SparkSession, str], DataFrame]
) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        if os.environ.get("SPARK_GRAFT_PLAN_CACHE", "1") == "0":
            return fn(spark, sf_dir)
        key = (id(spark), sf_dir, name)
        hit = _PLAN_CACHE.get(key)
        if hit is not None and hit[0] is spark:
            return hit[1]
        df = fn(spark, sf_dir)
        _PLAN_CACHE[key] = (spark, df)
        return df

    run.__name__ = fn.__name__
    run.__doc__ = fn.__doc__
    run.__wrapped__ = fn  # type: ignore[attr-defined]
    return run


def _registry_order() -> list[str]:
    """Round-changed queries first (the external correctness gate only
    checks the first ~50 registry entries in insertion order).

    ``registry_head.txt`` is generated by ``scripts/registry_head.py``
    from the git diff vs the previous round's artifact commit, so a
    changed plan can no longer hide past the gate window the way the
    round-6 q26 rewrite did.  Unknown/stale names are ignored.
    """
    head_path = os.path.join(os.path.dirname(__file__), "registry_head.txt")
    head: list[str] = []
    try:
        with open(head_path) as fh:
            head = [
                ln.strip()
                for ln in fh
                if ln.strip() and not ln.lstrip().startswith("#")
            ]
    except OSError:
        pass
    head = [n for n in head if n in _QUERY_FNS]
    return head + [n for n in _QUERY_FNS if n not in head]


def evict_plan_cache(spark: SparkSession, names: set[str] | None = None) -> int:
    """Drop this session's prepared-plan cache entries (all, or only
    the named queries).  Public twin of the internal ``_PLAN_CACHE`` so
    callers (``session.release_query_state``) never reach into module
    privates.  Returns the number of entries evicted."""
    sid = id(spark)
    victims = [
        k
        for k in _PLAN_CACHE
        if k[0] == sid and (names is None or k[2] in names)
    ]
    for k in victims:
        del _PLAN_CACHE[k]
    return len(victims)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    name: _prepared(name, _QUERY_FNS[name]) for name in _registry_order()
}
