"""Mergeable-sketch rollup tables: pre-aggregated HyperLogLog state
per grain, unioned at query time.

The 100 TB pattern: an exact countDistinct over a year of events
re-shuffles raw data per query; a warehouse instead maintains a small
per-(day, dim) SKETCH table — binary HLL state, mergeable by union —
and answers any date-range distinct-count by unioning a handful of
sketches. Spark 4 ships the Apache DataSketches HLL as native
aggregates (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``), so the whole pattern is expression-level:
the rollup is one map-side-combinable groupBy, the query is a tiny
aggregate over pre-shrunk state, and the sketch column stores/ships
like any binary column (write the rollup bucketed or Z-ordered like
any other table).

No oracle twin: HLL estimates are library-specific (DuckDB's HLL
differs), so correctness is pinned by tests instead — error vs exact
bounded, and the algebraic property that makes the pattern safe:
estimate(union of per-grain sketches) == estimate(sketch of the union)
EXACTLY (same binary state), not just approximately.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: log2 of HLL register count; 12 → ~1.6% relative standard error,
#: 2.5 KB max state per sketch. Raise for tighter error at scale.
DEFAULT_LG_K = 12


def sketch_rollup(
    df: DataFrame,
    grain: list[str],
    col: str,
    *,
    lg_k: int = DEFAULT_LG_K,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Per-grain HLL state: ``(grain…, sketch binary, n_rows)``.
    One map-side-combinable shuffle; the output is the table you
    persist and incrementally refresh (union new partitions in)."""
    return df.groupBy(*grain).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias(sketch_col),
        F.count("*").alias("n_rows"),
    )


def rollup_distinct(
    sketches: DataFrame,
    group: list[str],
    *,
    sketch_col: str = "sketch",
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Distinct-count at a coarser grain by UNIONING stored sketches —
    the query-time half: touches only pre-aggregated state, never the
    raw fact rows. Empty ``group`` gives the global rollup."""
    agg = F.hll_sketch_estimate(
        F.hll_union_agg(F.col(sketch_col), F.lit(False))
    ).alias("approx_distinct")
    if group:
        return sketches.groupBy(*group).agg(agg, F.sum("n_rows").alias("n_rows"))
    return sketches.agg(agg, F.sum("n_rows").alias("n_rows"))


def estimate(df: DataFrame, col: str, *, lg_k: int = DEFAULT_LG_K) -> Column:
    """One-shot HLL estimate column (no rollup table) — the direct
    replacement for approx_count_distinct with an inspectable lg_k."""
    return F.hll_sketch_estimate(F.hll_sketch_agg(F.col(col), F.lit(lg_k)))


@dataclass(frozen=True)
class CMSParams:
    """Count-min sketch geometry. Build and probe MUST share one
    instance: a depth/width/seed mismatch between
    :func:`cms_counters` and :func:`cms_estimate` silently re-hashes
    probes into empty cells and breaks the never-undercounts bound,
    so both functions take the params as a single object rather than
    loose keywords."""

    depth: int = 4
    width: int = 1024
    seed: str = "cms"


def cms_counters(
    df: DataFrame,
    col: str,
    *,
    params: CMSParams = CMSParams(),
) -> DataFrame:
    """Count-min sketch as a mergeable rollup table: ``depth`` rows of
    ``width`` counters, stored relationally as ``(j, bucket, cnt)``
    (non-empty cells only). Row ``j``'s hash is the deterministic
    md5-60 family (``{seed}{j}:<value>``) — NO RNG state, so two
    engines (or two incremental refreshes) build bit-identical
    sketches, and sketches MERGE by summing ``cnt`` on (j, bucket) —
    the same union-then-sum refresh contract as the HLL rollup above.

    State is bounded at depth×width cells however many distinct keys
    the stream carries; the point-estimate upper bound is
    ``exact ≤ est ≤ exact + εn`` with ε≈2/width per row and failure
    probability shrinking geometrically in depth.
    """
    from .dedup import hash60

    v = F.col(col).cast("string")
    rows = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(params.depth - 1))).alias("j"),
        v.alias("__v"),
    ).select(
        "j",
        (
            hash60(
                F.concat(F.col("j").cast("string"), F.lit(":"), F.col("__v")),
                params.seed,
            )
            % F.lit(int(params.width))
        ).alias("bucket"),
    )
    return rows.groupBy("j", "bucket").agg(F.count("*").alias("cnt"))


def cms_counters_from_counts(
    counts: DataFrame,
    key: str = "key",
    cnt: str = "cnt",
    *,
    params: CMSParams = CMSParams(),
) -> DataFrame:
    """:func:`cms_counters` from a PRE-AGGREGATED exact histogram
    ``(key, cnt)`` — cell counts are Σ over keys hashing to the cell,
    so summing per-key counts is identical to counting raw rows
    (r12: q142 shares ONE key-grain aggregation between its exact
    top-k and the sketch build instead of scanning the stream
    twice)."""
    from .dedup import hash60

    v = F.col(key).cast("string")
    rows = counts.select(
        F.explode(F.sequence(F.lit(0), F.lit(params.depth - 1))).alias("j"),
        v.alias("__v"),
        F.col(cnt).alias("__n"),
    ).select(
        "j",
        (
            hash60(
                F.concat(F.col("j").cast("string"), F.lit(":"), F.col("__v")),
                params.seed,
            )
            % F.lit(int(params.width))
        ).alias("bucket"),
        "__n",
    )
    return rows.groupBy("j", "bucket").agg(F.sum("__n").alias("cnt"))


def cms_estimate(
    items: DataFrame,
    counters: DataFrame,
    col: str,
    *,
    params: CMSParams = CMSParams(),
    out: str = "est",
    key_col: str | None = None,
) -> DataFrame:
    """Point-estimate (min over the ``depth`` counter rows) for each
    item in ``items`` against a :func:`cms_counters` table. The
    counter table is bounded (≤ depth×width rows) so it broadcasts;
    the lookup is a map-side join however large ``items`` is. Items
    absent from the sketch estimate 0 (their cells may still be
    occupied by colliders — the estimate stays an upper bound).
    Output multiplicity matches input exactly: the re-gather after
    the depth-explode groups on ``key_col`` when the caller supplies
    a unique per-row key, else on a generated
    ``monotonically_increasing_id`` — note the generated id is
    recompute-sensitive (a stage retry over a NONDETERMINISTIC
    upstream can reassign ids across the explode boundary and
    mis-group probe rows), so pass ``key_col`` whenever the items
    frame has a natural unique key or a nondeterministic lineage.
    ``params`` must be the SAME object the counters were built with
    (see :class:`CMSParams`)."""
    from .dedup import hash60

    v = F.col(col).cast("string")
    keyed = (
        items.withColumn("__rid", F.col(key_col))
        if key_col is not None
        else items.withColumn("__rid", F.monotonically_increasing_id())
    )
    probes = (
        keyed
        .select(
            "*",
            F.explode(F.sequence(F.lit(0), F.lit(params.depth - 1))).alias(
                "j"
            ),
        )
        .withColumn(
            "bucket",
            hash60(
                F.concat(F.col("j").cast("string"), F.lit(":"), v), params.seed
            )
            % F.lit(int(params.width)),
        )
    )
    carry = [c for c in items.columns]
    return (
        probes.join(F.broadcast(counters), ["j", "bucket"], "left")
        .na.fill({"cnt": 0})
        .groupBy("__rid", *carry)
        .agg(F.min("cnt").alias(out))
        .drop("__rid")
    )


def kmv_sketch(
    df: DataFrame,
    col: str,
    *,
    group: list[str] | None = None,
    k: int = 64,
    seed: str = "kmv",
    shards: int = 64,
) -> DataFrame:
    """K-minimum-values distinct sketch per group: the ``k`` smallest
    DISTINCT 60-bit hashes of ``col``. KMV is the set-operation member
    of the sketch family — unlike HLL state it supports INTERSECTION:
    the k-min of a union is computable from two sketches, and the
    fraction of union-k members present in both sketches estimates
    Jaccard (Beyer et al., SIGMOD'07).

    Deterministic md5-derived hashes (dedup.hash60), so the sketch —
    and any estimate derived from it — is bit-identical in any engine.

    100 TB shape: one distinct shuffle at (group, hash) grain, then a
    TWO-PHASE k-min — phase 1 ranks within (group, h % shards) so no
    single task ever ranks a whole group's distinct set (the k global
    minima are necessarily among the per-shard k minima), phase 2
    ranks the ≤ shards·k survivors per group. Output ≤ k rows/group:
    ``(group…, h, rnk)``.
    """
    from pyspark.sql import Window

    from .dedup import hash60

    g = list(group or [])
    d = df.select(
        *g, hash60(F.col(col).cast("string"), seed).alias("h")
    ).distinct()
    w1 = Window.partitionBy(*g, "__s").orderBy("h")
    survivors = (
        d.withColumn("__s", F.col("h") % F.lit(int(shards)))
        .withColumn("__r", F.row_number().over(w1))
        .filter(F.col("__r") <= int(k))
        .drop("__s", "__r")
    )
    w2 = Window.partitionBy(*g).orderBy("h")
    return survivors.withColumn("rnk", F.row_number().over(w2)).filter(
        F.col("rnk") <= int(k)
    )


def kmv_distinct_estimate(n_s: Column, h_k: Column, *, k: int) -> Column:
    """Distinct-count estimate from a KMV sketch's aggregate stats:
    ``n_s`` = sketch size, ``h_k`` = largest retained hash. A sketch
    smaller than ``k`` holds EVERY distinct hash, so the count is
    exact; otherwise the classic (k−1)·H/h_k with H = 2^60 (the
    hash60 range). The one double literal (k−1)·2^60 is exactly
    representable, and the int64→double cast of ``h_k`` rounds
    identically in any IEEE engine — the estimate is cross-engine
    bit-stable."""
    return F.when(n_s < int(k), n_s.cast("double")).otherwise(
        F.lit(float(k - 1) * 2.0**60) / h_k.cast("double")
    )


@dataclass(frozen=True)
class BloomParams:
    """Bloom filter geometry — build and probe MUST share one instance
    (the CMSParams rule: a bits/hashes/seed mismatch silently breaks
    the no-false-negatives guarantee)."""

    m_bits: int = 1 << 16
    k_hashes: int = 4
    seed: str = "bloom"


def bloom_bits(
    df: DataFrame,
    col: str,
    *,
    params: BloomParams = BloomParams(),
) -> DataFrame:
    """Bloom filter as a relational sketch: the DISTINCT set bit
    positions (≤ m_bits rows however large the input), mergeable by
    plain UNION/DISTINCT — the membership member of the sketch family
    (HLL counts, CMS estimates frequency, KMV intersects, Bloom
    answers "possibly seen?"). Deterministic md5 bit positions
    (dedup.hash60), so the filter — and every probe verdict — is
    bit-identical in any engine.

    100 TB shape: one explode(k) + distinct shuffle bounded by m_bits
    output rows; the bits table broadcasts to probes."""
    from .dedup import hash60

    v = F.col(col).cast("string")
    return (
        df.select(
            F.explode(
                F.sequence(F.lit(0), F.lit(params.k_hashes - 1))
            ).alias("j"),
            v.alias("__v"),
        )
        .select(
            (
                hash60(
                    F.concat(F.col("j").cast("string"), F.lit(":"), F.col("__v")),
                    params.seed,
                )
                % F.lit(int(params.m_bits))
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    items: DataFrame,
    bits: DataFrame,
    col: str,
    *,
    params: BloomParams = BloomParams(),
    out: str = "maybe_member",
    key_col: str | None = None,
) -> DataFrame:
    """Membership probe: an item is a possible member iff ALL
    ``k_hashes`` of its bit positions are set. No false negatives by
    construction; false-positive rate ≈ (1 − e^{−kn/m})^k. The bits
    table is bounded (≤ m_bits rows) so it broadcasts; the probe is a
    map-side join however large ``items`` is. The re-gather groups on
    ``key_col`` when the caller supplies a unique per-row key, else
    on a generated ``monotonically_increasing_id``, so duplicate
    probe rows each keep their own (correct) verdict and output
    multiplicity matches input — never a collapsed group whose
    matched-bit count overshoots ``k_hashes`` into a false negative.
    The generated id is recompute-sensitive (a stage retry over a
    NONDETERMINISTIC upstream can reassign ids across the explode
    boundary and mis-group probe rows) — pass ``key_col`` whenever
    the items frame has a natural unique key or a nondeterministic
    lineage. ``params`` must be the SAME object the bits were built
    with (see :class:`BloomParams`).
    """
    from .dedup import hash60

    v = F.col(col).cast("string")
    keyed = (
        items.withColumn("__rid", F.col(key_col))
        if key_col is not None
        else items.withColumn("__rid", F.monotonically_increasing_id())
    )
    probes = (
        keyed
        .select(
            "*",
            F.explode(F.sequence(F.lit(0), F.lit(params.k_hashes - 1))).alias(
                "__j"
            ),
        )
        .withColumn(
            "__bit",
            hash60(
                F.concat(F.col("__j").cast("string"), F.lit(":"), v),
                params.seed,
            )
            % F.lit(int(params.m_bits)),
        )
    )
    carry = list(items.columns)
    # ONE broadcast left join: unmatched positions keep a NULL marker,
    # so items with zero set bits survive to the aggregate and report
    # False — no second pass over `items` to restore them
    return (
        probes.join(
            F.broadcast(
                bits.withColumnRenamed("bit", "__bit").withColumn(
                    "__set", F.lit(1)
                )
            ),
            "__bit",
            "left",
        )
        .groupBy("__rid", *carry)
        .agg((F.count("__set") == params.k_hashes).alias(out))
        .drop("__rid")
    )


def bottomk_sample(
    df: DataFrame,
    key: str,
    *,
    group: list[str] | None = None,
    k: int = 256,
    seed: str = "qsk",
    shards: int = 64,
) -> DataFrame:
    """Deterministic mergeable uniform ROW sample per group: the ``k``
    rows whose ``hash60(key)`` is smallest — :func:`kmv_sketch`'s
    two-phase shape at ROW grain (no distinct; ``key`` should be
    unique per row — a repeated key samples by identity, biasing the
    sample toward duplicated rows' single representative).

    This is the QUANTILE member of the sketch family: a bottom-k-by-
    hash sample is a uniform sample whose union rule is "keep the k
    smallest of the merged sets" — mergeable across partitions, days,
    or tables exactly like KMV — and any order statistic of the sample
    estimates the population's (Chaudhuri et al.; the reservoir
    alternative is NOT mergeable deterministically). Deterministic
    md5 hashes ⇒ the sample, hence every estimate from it, is
    bit-identical in any engine.

    100 TB shape: phase 1 ranks within (group, h % shards) so no task
    ranks a whole group; phase 2 ranks ≤ shards·k survivors. Output
    ≤ k rows/group, carrying every input column plus ``rnk``."""
    from pyspark.sql import Window

    from .dedup import hash60

    g = list(group or [])
    d = df.withColumn(
        "__h", hash60(F.col(key).cast("string"), seed)
    )
    w1 = Window.partitionBy(*g, "__s").orderBy("__h", key)
    survivors = (
        d.withColumn("__s", F.col("__h") % F.lit(int(shards)))
        .withColumn("__r", F.row_number().over(w1))
        .filter(F.col("__r") <= int(k))
        .drop("__s", "__r")
    )
    w2 = Window.partitionBy(*g).orderBy("__h", key)
    return (
        survivors.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= int(k))
        .drop("__h")
    )


@dataclass(frozen=True)
class HHParams:
    """Heavy-hitter summary parameters. ``k`` counters kept per shard,
    ``shards`` deterministic md5 shards (each key lives in exactly ONE
    shard), ``seed`` namespaces the hash family. State bound:
    ``shards·k`` rows per epoch summary."""

    k: int = 8
    shards: int = 8
    seed: str = "hh"


def hh_summary(
    df: DataFrame, col: str, *, params: HHParams = HHParams()
) -> DataFrame:
    """Misra-Gries/SpaceSaving-grade HEAVY-HITTER summary, DETERMINIZED
    for the committed-artifact discipline: the classic streaming
    algorithms keep k counters whose values depend on arrival order —
    correct but un-hash-checkable across engines — so the summary here
    derives from EXACT per-shard histograms instead: keys md5-shard
    (``hash60 % shards``), each shard keeps its top-``k`` keys by
    (count desc, key asc) with their EXACT counts, and records ``thr``
    — the largest DROPPED count in the shard (0 when nothing dropped).

    The two Misra-Gries guarantees carry over, gated in-query by q181:

    - reported counts are exact (ε = 0 within one epoch — stronger
      than MG's ε·n under-count);
    - any UNREPORTED key's true count ≤ its shard's ``thr`` (the key
      lives wholly in that shard, so missing top-k bounds it) —
      every key with count > max(thr) is guaranteed reported.

    100 TB shape: the build is ONE key-keyed count shuffle (map-side
    combinable, spreadable keys) + a per-shard window over distinct
    keys; the ARTIFACT kept per epoch is ``shards·k`` rows instead of
    |vocab| — the same build-full/store-tiny warehouse pattern as
    :func:`sketch_rollup`, and epoch summaries MERGE with bounded
    error (:func:`hh_merge`). Output: (shard, key, cnt, thr)."""
    v = F.col(col).cast("string")
    counts = (
        df.select(v.alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("cnt"))
    )
    return hh_summary_from_counts(counts, params=params)


def hh_summary_from_counts(
    counts: DataFrame, *, params: HHParams = HHParams()
) -> DataFrame:
    """:func:`hh_summary` from a PRE-AGGREGATED exact histogram
    ``(key string, cnt long)`` — the shard/top-k/threshold tail of the
    build, split out (r12) so a caller holding one shared per-epoch
    count table (q181: epoch summaries AND the exact-truth gate from
    ONE token-grain shuffle) doesn't re-tokenize and re-count per
    summary. Values are identical to :func:`hh_summary` by
    construction — this IS its tail."""
    from pyspark.sql import Window

    from .dedup import hash60

    counts = counts.withColumn(
        "shard", (hash60(F.col("key"), params.seed) % params.shards)
    )
    w = Window.partitionBy("shard").orderBy(F.desc("cnt"), F.asc("key"))
    ranked = counts.withColumn("__rn", F.row_number().over(w))
    wsh = Window.partitionBy("shard")
    return (
        ranked.withColumn(
            "thr",
            F.coalesce(
                F.max(
                    F.when(F.col("__rn") > params.k, F.col("cnt"))
                ).over(wsh),
                F.lit(0).cast("long"),
            ),
        )
        .filter(F.col("__rn") <= params.k)
        .select("shard", "key", "cnt", "thr")
    )


def hh_merge(
    a: DataFrame, b: DataFrame, *, params: HHParams = HHParams()
) -> DataFrame:
    """Merge two epoch summaries (the Agarwal et al. 2012 mergeable-
    summaries contract): full-outer sum on (shard, key) — a key kept
    on one side only may have been dropped (count ≤ thr) on the other,
    so its estimate UNDER-counts by at most that side's ``thr`` —
    then re-top-k per shard. The merged ``thr`` bounds any unreported
    key: ``thr_a + thr_b`` (dropped both epochs) vs the largest
    estimate dropped AT the merge plus its absent-side slack,
    whichever is larger. Gates carried per row for q181's in-query
    audit: ``est ≤ true ≤ est + err`` with
    ``err = (absent-side thr sum)``, and unreported keys ≤ ``thr``.
    Associative state: ``shards·k`` rows in, same out."""
    from pyspark.sql import Window

    ka = a.select(
        "shard", "key",
        F.col("cnt").alias("cnt_a"), F.col("thr").alias("thr_a"),
    )
    kb = b.select(
        "shard", "key",
        F.col("cnt").alias("cnt_b"), F.col("thr").alias("thr_b"),
    )
    # per-shard thr of each side (constant within a shard) — recovered
    # from any of the side's rows so absent-side slack joins in
    tha = a.select("shard", "thr").groupBy("shard").agg(
        F.max("thr").alias("__tha")
    )
    thb = b.select("shard", "thr").groupBy("shard").agg(
        F.max("thr").alias("__thb")
    )
    merged = (
        ka.join(kb, ["shard", "key"], "full_outer")
        .join(tha, "shard", "left")
        .join(thb, "shard", "left")
        .na.fill({"__tha": 0, "__thb": 0})
        .select(
            "shard",
            "key",
            (
                F.coalesce("cnt_a", F.lit(0))
                + F.coalesce("cnt_b", F.lit(0))
            ).alias("cnt"),
            (
                F.when(F.col("cnt_a").isNull(), F.col("__tha")).otherwise(0)
                + F.when(F.col("cnt_b").isNull(), F.col("__thb")).otherwise(0)
            ).cast("long").alias("err"),
            (F.col("__tha") + F.col("__thb")).alias("__thrsum"),
        )
    )
    w = Window.partitionBy("shard").orderBy(
        F.desc("cnt"), F.asc("key")
    )
    wsh = Window.partitionBy("shard")
    ranked = merged.withColumn("__rn", F.row_number().over(w))
    return (
        ranked.withColumn(
            "thr",
            F.greatest(
                F.col("__thrsum"),
                F.coalesce(
                    F.max(
                        F.when(
                            F.col("__rn") > params.k,
                            F.col("cnt") + F.col("err"),
                        )
                    ).over(wsh),
                    F.lit(0).cast("long"),
                ),
            ),
        )
        .filter(F.col("__rn") <= params.k)
        .select("shard", "key", "cnt", "err", "thr")
    )


def quantile_summary(
    df: DataFrame,
    col: str,
    *,
    k: int = 16,
    group: list[str] | None = None,
) -> DataFrame:
    """GK/KLL-grade mergeable QUANTILE summary, determinized the
    :func:`hh_summary` way: instead of an order-dependent compactor
    state, the summary is the value at the LAST global rank of each of
    ``k`` equi-depth buckets — computed with the two-phase
    ``bucketed_rank`` (equi-width value bucket; never a full
    single-partition sort). Ranks are tie-insensitive for this use:
    equal values may permute ranks, but the VALUE at a rank is a
    multiset property, so the summary is bit-identical in any engine.

    Output (≤ k rows): ``(q, value, r, n)`` — bucket index
    ``q = ceil(r·k/n)``, the value at global rank ``r`` (r ascending,
    r_last = n), epoch size ``n`` on every row. Any quantile answered
    from the summary carries rank error ≤ ``ceil(n/k)``; summaries
    from disjoint epochs merge by weighted union
    (:func:`quantile_merge_estimate`) with errors adding. The build is
    one count-shuffle rank pass; the ARTIFACT is k rows — the same
    build-full/store-tiny contract as the other summaries here.

    ``group`` (r12) builds one summary PER GROUP in a single pass —
    the stats/rank/size machinery all take the same group key, so N
    epoch summaries cost one pipeline instead of N (q182: both parity
    epochs in one rank pass; guide §2.4, share the exchange). The
    per-group summary values are IDENTICAL to separate per-epoch
    calls: min/max, ranks, and sizes are all computed within the
    group, which is exactly what a filtered per-epoch call sees.
    Output gains the group columns."""
    from .ranks import bucketed_rank, with_equi_width_bucket

    g = list(group or [])
    base = df.select(
        *g, F.col(col).alias("__v")
    ).filter(F.col("__v").isNotNull())
    staged = with_equi_width_bucket(base, "__v", out="__vb", group=g or None)
    ranked = bucketed_rank(
        staged,
        [F.col("__v")],
        ["__vb"],
        group=g or None,
        out="__rn",
        checkpoint=False,
    )
    if g:
        nrow = base.groupBy(*g).agg(F.count("*").alias("__n"))
        j = ranked.join(F.broadcast(nrow), g)
    else:
        nrow = base.agg(F.count("*").alias("__n"))
        j = ranked.crossJoin(F.broadcast(nrow))
    bucket_i = F.floor(
        (F.col("__rn") * k + F.col("__n") - 1) / F.col("__n")
    ).cast("long")
    next_i = F.floor(
        ((F.col("__rn") + 1) * k + F.col("__n") - 1) / F.col("__n")
    ).cast("long")
    return (
        j.filter(next_i > bucket_i)
        .select(
            *g,
            bucket_i.alias("q"),
            F.col("__v").alias("value"),
            F.col("__rn").alias("r"),
            F.col("__n").alias("n"),
        )
    )


def quantile_merge_estimate(
    summaries: list[DataFrame], probes_pm: list[int]
) -> DataFrame:
    """Answer quantiles from MERGED epoch summaries (the mergeable-
    summaries union): each summary point carries integer weight
    ``r - lag(r)`` (its depth-bucket size), the union accumulates
    weight in (value, side, r) order, and the ``p`` estimate is the
    smallest value whose cumulative weight reaches
    ``ceil(p·N)``, N = Σ epoch sizes. Probes are per-cent INTEGERS
    (``probes_pm``) so targets stay exact int arithmetic. Rank error
    ≤ Σ ceil(nᵢ/kᵢ) — q182 gates that bound in-query against the
    exact ranks. The union is summary-sized (Σkᵢ rows), so the global
    windows here are metadata-scale by construction — the
    bucket-offset-table exemption, not a corpus window."""
    from pyspark.sql import Window

    pts = None
    for i, s in enumerate(summaries):
        p = s.select(
            F.lit(i).alias("side"), "q", "value", "r", "n"
        )
        pts = p if pts is None else pts.unionByName(p)
    w_side = Window.partitionBy("side").orderBy("r")
    weighted = pts.withColumn(
        "w", F.col("r") - F.coalesce(F.lag("r").over(w_side), F.lit(0))
    )
    w_cum = Window.orderBy("value", "side", "r").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # drop the epoch-size column before the probe join: Spark's
    # case-insensitive resolver would see pts' `n` and probes' `N`
    # as one ambiguous name
    cum = weighted.drop("n", "q").withColumn("cw", F.sum("w").over(w_cum))
    total = (
        pts.groupBy("side").agg(F.max("n").alias("__n"))
        .agg(F.sum("__n").alias("N"))
    )
    probes = None
    for pm in probes_pm:
        pr = total.select(
            F.lit(int(pm)).alias("pm"),
            F.floor((F.lit(int(pm)) * F.col("N") + 99) / 100)
            .cast("long")
            .alias("target"),
            "N",
        )
        probes = pr if probes is None else probes.unionByName(pr)
    hit = cum.join(
        F.broadcast(probes), F.col("cw") >= F.col("target"), "inner"
    )
    w_min = Window.partitionBy("pm").orderBy("value", "side", "r")
    return (
        hit.withColumn("__rk", F.row_number().over(w_min))
        .filter(F.col("__rk") == 1)
        .select("pm", F.col("value").alias("est"), "target", "N")
    )
