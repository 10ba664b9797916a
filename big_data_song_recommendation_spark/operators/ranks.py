"""Distributed total-order ranking — the two-phase replacement for
``Window.orderBy(...)`` with no partition spec.

A global window moves EVERY row through one task (Spark's own
``WindowExec: No Partition Defined`` warning): correct at test scale,
a stuck task at 100 TB. The classic fix is two-phase ranking:

1. bucket every row by an expression that is MONOTONE non-decreasing
   along the sort order (so bucket boundaries respect the order);
2. count rows per bucket (one combinable aggregate — the only
   data-grain shuffle) and prefix-sum those counts into per-bucket
   rank OFFSETS — a window over the bucket-count table, which is
   metadata-sized (bucket cardinality, never data cardinality);
3. rank locally inside each bucket (window partitioned on the bucket
   key — parallel, balanced by the bucketing) and add the offset.

``global_rank = bucket_offset + local_rank`` reproduces row_number /
rank over the total order exactly, provided order-ties never span a
bucket boundary — guaranteed when the bucket is a function of a
prefix of the order key (equi-width value bins, the value itself, a
string prefix).

No reference twin: the reference ranks with pandas sorts on collected
frames (ref ``src/data_processing.py`` value_counts/sort_values); this
module is the 100 TB-safe form of the same semantics.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NullType, NumericType

from ..functions import scalars

__all__ = [
    "with_equi_width_bucket",
    "with_equi_depth_bucket",
    "with_string_prefix_bucket",
    "bucketed_rank",
    "ntile_from_rank",
]


def _require_numeric(df: DataFrame, value: Column | str, fn: str) -> Column:
    """Both bucketing schemes bin via a cast to double, which is only
    MONOTONE for numeric inputs — a string key would all land in the
    NULL bin (one task again) or, for numeric-looking strings, bucket
    non-monotonically vs string order. Fail loudly instead; string
    keys need a prefix bucket (e.g. ``F.substring(key, 1, 1)``) passed
    straight to :func:`bucketed_rank`."""
    v = F.col(value) if isinstance(value, str) else value
    dt = df.select(v).schema[0].dataType
    if not isinstance(dt, (NumericType, NullType)):
        raise TypeError(
            f"{fn} requires a numeric sort key, got {dt.simpleString()}; "
            "bucket string keys with a prefix expression instead"
        )
    return v.cast("double")


def with_equi_width_bucket(
    df: DataFrame,
    value: Column | str,
    *,
    bins: int = 256,
    group: list[str] | None = None,
    out: str = "__vb",
) -> DataFrame:
    """Attach an equi-width bin of ``value`` (per ``group`` when given)
    as column ``out`` — the standard monotone bucket for numeric sort
    keys (non-numeric types raise: see :func:`_require_numeric`).
    Min/max fold in as a tiny broadcast aggregate (never a
    driver action); the top edge closes into the last bin; a
    degenerate min==max group lands wholly in bin 0.

    Equi-width bins balance roughly-uniform values; heavily skewed
    value distributions concentrate buckets — acceptable for ranking
    (each bucket is still far below a global window) and refinable by
    raising ``bins`` or switching to :func:`with_equi_depth_bucket`.
    """
    g = list(group or [])
    v = _require_numeric(df, value, "with_equi_width_bucket")
    b = int(bins)
    stats = (
        df.groupBy(*g).agg(F.min(v).alias("__lo"), F.max(v).alias("__hi"))
        if g
        else df.agg(F.min(v).alias("__lo"), F.max(v).alias("__hi"))
    )
    if g:
        # null-safe group join: a NULL group is a legal rank partition
        # (window partitionBy groups NULLs together); a plain equi-join
        # would silently drop those rows
        st = stats.select(
            *[F.col(c).alias(f"{c}__s") for c in g], "__lo", "__hi"
        )
        cond = None
        for c in g:
            e = df[c].eqNullSafe(st[f"{c}__s"])
            cond = e if cond is None else (cond & e)
        joined = df.join(F.broadcast(st), cond).drop(
            *[f"{c}__s" for c in g]
        )
    else:
        joined = df.crossJoin(F.broadcast(stats))
    bin_ = (
        # NULL value → NULL bin explicitly: least() SKIPS nulls, which
        # would otherwise drop null rows into the top bin — a NULL bin
        # instead sorts NULLS FIRST, matching asc-nulls-first rank order
        F.when(v.isNull(), F.lit(None))
        .when(F.col("__hi") == F.col("__lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(b - 1),
                F.floor(
                    (v - F.col("__lo"))
                    * F.lit(float(b))
                    / (F.col("__hi") - F.col("__lo"))
                ),
            )
        )
        .cast("int")
    )
    return joined.withColumn(out, bin_).drop("__lo", "__hi")


def with_equi_depth_bucket(
    df: DataFrame,
    value: Column | str,
    *,
    bins: int = 256,
    group: list[str] | None = None,
    out: str = "__vb",
    accuracy: int = 10_000,
) -> DataFrame:
    """Equi-DEPTH alternative to :func:`with_equi_width_bucket` for
    heavy-tailed sort keys (revenue, spend, token counts): bucket
    edges come from ``approx_percentile`` so each bucket holds roughly
    ``1/bins`` of the rows however skewed the values — equi-width on a
    Pareto-ish column concentrates nearly everything in bin 0 and the
    "parallel" local rank degenerates back toward one task.

    The bin is ``#(edges < v)`` over the broadcast edge array — a
    monotone non-decreasing function of ``v`` (ties share a bin), so
    it satisfies the :func:`bucketed_rank` bucket contract exactly;
    approximation error in the percentiles only shifts bucket
    BOUNDARIES (changing balance, never correctness). NULL values get
    a NULL bin (sorts first, same asc-nulls-first contract as
    equi-width). One pass over the data for the sketch (combinable
    aggregate), then a tiny broadcast join.

    Per-row cost (ADVICE r6): the count is a two-level search, not a
    linear scan — a coarse array of every ``⌈√bins⌉``-th edge is built
    once in the broadcast stats row, each fact row scans the ≤√bins
    coarse edges then a √bins-wide ``slice`` of the full array, so the
    default 256 bins costs ~32 comparisons/row instead of 255.  (A
    true per-row binary search would need log₂b chained ``when``s that
    each inline the accumulator twice — 2^log₂b expression copies —
    so √b staging is the codegen-friendly shape.)
    """
    g = list(group or [])
    v = _require_numeric(df, value, "with_equi_depth_bucket")
    b = int(bins)
    if b <= 1:
        # degenerate single bucket: no edges to search (the coarse
        # F.sequence below would throw on an empty 1..0 range)
        return df.withColumn(
            out,
            F.when(v.isNull(), F.lit(None)).otherwise(F.lit(0)).cast("int"),
        )
    # percentile grid as a split-literal (functions.scalars
    # double_array_lit): one py4j call and 4 plan nodes instead of a
    # round trip + CreateArray child per bin — ConstantFolding
    # collapses it to the identical foldable array literal before the
    # aggregate sees it (values exact: repr/parse round-trip)
    pcts = [i / b for i in range(1, b)]
    edges_agg = F.percentile_approx(
        v, scalars.double_array_lit(pcts), F.lit(int(accuracy))
    ).alias("__edges")
    stats = df.groupBy(*g).agg(edges_agg) if g else df.agg(edges_agg)
    m = b - 1  # edge-array length
    step = max(int(math.isqrt(b)), 1)
    # coarse[j] = edges[(j+1)*step] (1-indexed): if c1 coarse edges are
    # < v then exactly c1*step full edges are < v, and the remainder
    # lies inside one step-wide slice of the full array
    stats = stats.withColumn(
        "__coarse",
        F.transform(
            F.sequence(F.lit(step), F.lit(m), F.lit(step)),
            lambda i: F.element_at(F.col("__edges"), i.cast("int")),
        ),
    )
    if g:
        st = stats.select(
            *[F.col(c).alias(f"{c}__s") for c in g], "__edges", "__coarse"
        )
        cond = None
        for c in g:
            e = df[c].eqNullSafe(st[f"{c}__s"])
            cond = e if cond is None else (cond & e)
        joined = df.join(F.broadcast(st), cond).drop(
            *[f"{c}__s" for c in g]
        )
    else:
        joined = df.crossJoin(F.broadcast(stats))

    def _count_lt(arr: Column) -> Column:
        return F.aggregate(
            arr, F.lit(0), lambda acc, e: acc + F.when(e < v, 1).otherwise(0)
        )

    # two-level search: c1 coarse edges < v ⇒ the first c1*step full
    # edges are < v; the remainder is counted inside one step-wide
    # slice (slice() clips at the array end, so no bounds arithmetic)
    c1 = _count_lt(F.col("__coarse"))
    fine = _count_lt(F.slice(F.col("__edges"), c1 * step + 1, step))
    bin_ = (
        F.when(v.isNull(), F.lit(None))
        .otherwise(c1 * step + fine)
        .cast("int")
    )
    return joined.withColumn(out, bin_).drop("__edges", "__coarse")


def with_string_prefix_bucket(
    df: DataFrame,
    value: Column | str,
    *,
    width: int = 2,
    out: str = "__vb",
) -> DataFrame:
    """Monotone bucket for STRING sort keys: the ``width`` characters
    that follow the catalog-wide longest common prefix.

    A fixed ``substring(key, 1, 2)`` degenerates to ONE bucket (one
    rank task again) whenever every id shares a long common prefix —
    'item_000001'-style ids, dates cast to string all starting '20'
    (ADVICE r6).  Skipping the LCP first makes the bucket land on the
    characters that actually vary.

    The LCP of a whole (lexicographically ordered) set equals the LCP
    of its min and max, so it folds in as a tiny broadcast aggregate —
    no driver action, no extra scan at rank time.  Because every key
    shares the LCP by construction, comparing suffixes after it is
    exactly string order: the bucket is monotone non-decreasing along
    the key, satisfying the :func:`bucketed_rank` contract.  NULL keys
    get a NULL bucket (asc-nulls-first, same as the numeric schemes).
    """
    v = F.col(value) if isinstance(value, str) else value
    v = v.cast("string")
    stats = df.agg(F.min(v).alias("__plo"), F.max(v).alias("__phi"))
    # LCP length of (lo, hi): count of leading positions where the
    # chars match — a per-STATS-row scan (1 row), never per fact row
    lcp = F.aggregate(
        F.sequence(
            F.lit(1),
            F.greatest(
                F.least(F.length("__plo"), F.length("__phi")), F.lit(0)
            ),
        ),
        F.lit(0),
        lambda acc, i: F.when(
            (acc == i - 1)
            & (
                F.col("__plo").substr(i, F.lit(1))
                == F.col("__phi").substr(i, F.lit(1))
            ),
            i,
        ).otherwise(acc),
    )
    stats = stats.select(lcp.alias("__lcp"))
    joined = df.crossJoin(F.broadcast(stats))
    bucket = F.when(
        v.isNull(), F.lit(None).cast("string")
    ).otherwise(v.substr(F.col("__lcp") + 1, F.lit(int(width))))
    return joined.withColumn(out, bucket).drop("__lcp")


def bucketed_rank(
    df: DataFrame,
    order: list[Column],
    buckets: list[Column | str],
    *,
    group: list[str] | None = None,
    out: str = "rank",
    method: str = "row_number",
    checkpoint: bool = True,
) -> DataFrame:
    """Two-phase total-order rank: ``out`` = row_number() (or rank())
    over ``order`` within each ``group`` (global when no group),
    computed WITHOUT a single-partition window.

    ``buckets`` must be monotone non-decreasing along ``order`` within
    each group and of bounded (metadata-scale) cardinality — e.g. the
    :func:`with_equi_width_bucket` / :func:`with_equi_depth_bucket`
    bin, the leading sort value itself, or a string prefix of the
    leading sort column. For
    ``method="rank"`` ties must also never span buckets, which holds
    whenever the bucket is a function of a prefix of the order key.

    NULL contract: a NULL bucket sorts FIRST in the offset prefix-sum,
    so a nullable bucket column matches ``order`` only when the
    leading sort key is ASCENDING nulls-first (Spark's asc default).
    Ranking by a DESC leading key over a nullable bucket would rank
    NULLs first, diverging from desc NULLS LAST — pass a non-null
    bucket (or coalesce the key) for descending orders.

    Plan shape: one combinable groupBy on (group, buckets) for the
    counts; one prefix-sum window over that bucket-count table (the
    only unpartitioned window — metadata-sized by the bucket-
    cardinality contract); one join of the offsets back (no forced
    broadcast — AQE promotes it while the table fits); one window
    partitioned on (group, buckets) for the local ranks.

    ``checkpoint=True`` (default) cuts the upstream lineage with a
    lazy ``localCheckpoint`` so the two consumers below don't both
    recompute it. Tradeoff: the checkpointed blocks live on executor
    block managers until the session ends (long sessions chaining many
    ranks accumulate storage), and truncated lineage cannot recompute
    on executor loss — callers with cheap upstreams (a bare scan) or
    their own persist/checkpoint discipline should pass
    ``checkpoint=False``.
    """
    g = list(group or [])
    bcols = [F.col(b) if isinstance(b, str) else b for b in buckets]
    bnames = [f"__rb{i}" for i in range(len(bcols))]
    work = df
    for name, col in zip(bnames, bcols):
        work = work.withColumn(name, col)
    if checkpoint:
        # two consumers (bucket counts + offset join) would otherwise
        # both recompute the FULL upstream lineage — cut it once,
        # lazily (the q66 connected-components discipline): nothing
        # materializes until the query's action, then both branches
        # read the same partitions
        work = work.localCheckpoint(eager=False)

    cnts = work.groupBy(*g, *bnames).agg(F.count("*").alias("__bc"))
    woff = (
        Window.partitionBy(*g).orderBy(*bnames)
        if g
        else Window.orderBy(*bnames)
    ).rowsBetween(Window.unboundedPreceding, -1)
    keys = g + bnames
    offs = cnts.select(
        *[F.col(k).alias(f"{k}__o") for k in keys],
        F.coalesce(F.sum("__bc").over(woff), F.lit(0)).alias("__boff"),
    )
    # null-safe equi-join: a NULL sort key ranks first (asc nulls
    # first), it must not vanish at the offset lookup
    cond = None
    for k in keys:
        c = work[k].eqNullSafe(offs[f"{k}__o"])
        cond = c if cond is None else (cond & c)
    wloc = Window.partitionBy(*g, *bnames).orderBy(*order)
    rk = F.row_number() if method == "row_number" else F.rank()
    return (
        work.join(offs, cond)
        .withColumn(out, (F.col("__boff") + rk.over(wloc)).cast("long"))
        .drop(*bnames, *[f"{k}__o" for k in keys], "__boff")
    )


def bucketed_cumsum(
    df: DataFrame,
    order: list[Column],
    buckets: list[Column | str],
    value: Column | str,
    *,
    group: list[str] | None = None,
    out: str = "cum",
    checkpoint: bool = True,
) -> DataFrame:
    """Two-phase INCLUSIVE running sum of ``value`` along ``order``
    (per ``group``), same skeleton as :func:`bucketed_rank`: per-bucket
    value totals → prefix-summed into bucket offsets (metadata-sized
    window) → bucket-partitioned local running sums + offset. The
    budget-selection primitive (take rows in deterministic order until
    a cumulative quota is met) at any scale.

    Same bucket / NULL-ordering / ``checkpoint`` contracts as
    :func:`bucketed_rank`; exact only when
    ``value`` sums without rounding (integers / decimals — the long
    token counts this exists for)."""
    g = list(group or [])
    v = F.col(value) if isinstance(value, str) else value
    bcols = [F.col(b) if isinstance(b, str) else b for b in buckets]
    bnames = [f"__cb{i}" for i in range(len(bcols))]
    work = df.withColumn("__cv", v)
    for name, col in zip(bnames, bcols):
        work = work.withColumn(name, col)
    if checkpoint:
        work = work.localCheckpoint(eager=False)

    tots = work.groupBy(*g, *bnames).agg(F.sum("__cv").alias("__bt"))
    woff = (
        Window.partitionBy(*g).orderBy(*bnames)
        if g
        else Window.orderBy(*bnames)
    ).rowsBetween(Window.unboundedPreceding, -1)
    keys = g + bnames
    offs = tots.select(
        *[F.col(k).alias(f"{k}__o") for k in keys],
        F.coalesce(F.sum("__bt").over(woff), F.lit(0)).alias("__coff"),
    )
    cond = None
    for k in keys:
        c = work[k].eqNullSafe(offs[f"{k}__o"])
        cond = c if cond is None else (cond & c)
    wloc = (
        Window.partitionBy(*g, *bnames)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        work.join(offs, cond)
        .withColumn(out, F.col("__coff") + F.sum("__cv").over(wloc))
        .drop(*bnames, *[f"{k}__o" for k in keys], "__coff", "__cv")
    )


def bucketed_avg_rank(
    df: DataFrame,
    value: str,
    buckets: list[Column | str],
    *,
    group: list[str] | None = None,
    out: str = "avg_rank",
) -> DataFrame:
    """FRACTIONAL (average) rank of ``value`` ascending — the tie rule
    rank statistics (Spearman's ρ, Mann-Whitney U) are defined on:
    tied values share the mean of the positions they span,
    ``min_rank + (n_ties − 1)/2``.

    Distributed exactly like :func:`bucketed_rank` (min-rank via the
    two-phase bucket scheme) plus one value-keyed tie-count window —
    a key that spreads by construction. Average ranks are
    half-integers, so downstream sums stay EXACT in doubles — which
    is what makes rank statistics bit-stable cross-engine where raw
    double sums are not."""
    g = list(group or [])
    r = bucketed_rank(
        df,
        [F.col(value).asc()],
        buckets,
        group=group,
        out="__rmin",
        method="rank",
    )
    wt = Window.partitionBy(*g, value)
    return r.withColumn(
        out,
        F.col("__rmin") + (F.count("*").over(wt) - 1) / 2.0,
    ).drop("__rmin")


def _floordiv(a: Column, b: Column) -> Column:
    """Exact ``floor(a / b)`` for non-negative longs via Spark's
    integer ``div`` operator — JVM long division, never the double
    path (``(a / b).cast("long")`` is only an estimate: IEEE relative
    error 2^-52 scales with the QUOTIENT, so a 2^60-row count div 7 is
    off by ~36 — measured, and exactly the tile-boundary misplacement
    ADVICE r5 called out)."""
    return F.call_function("div", a.cast("long"), b.cast("long"))


def ntile_from_rank(rank: Column, n: Column, tiles: int) -> Column:
    """SQL ``ntile(tiles)`` reconstructed from a 1-based total-order
    rank and the row count: the first ``n % tiles`` tiles hold
    ``n div tiles + 1`` rows, the rest ``n div tiles`` — the exact
    standard semantics, so a :func:`bucketed_rank` feeds distributed
    ntile without the global window SQL ntile plans. All divisions go
    through :func:`_floordiv` (long-exact), so tile boundaries stay
    correct for any row count a long can hold — raw double division
    would misplace boundary rows once counts pass ~2^52."""
    t = F.lit(int(tiles))
    base = _floordiv(n, t)
    rem = n % t
    big = rem * (base + 1)
    return (
        F.when(rank <= big, _floordiv(rank - 1, base + 1) + 1)
        .otherwise(
            rem + _floordiv(rank - big - 1, F.greatest(base, F.lit(1))) + 1
        )
        .cast("int")
    )


def weighted_quantile(
    df: DataFrame,
    value: str,
    weight: str,
    *,
    group: list[str] | None = None,
    q_num: int = 1,
    q_den: int = 2,
    out: str = "wq",
    tot_out: str | None = None,
) -> DataFrame:
    """Exact weighted quantile per group: the smallest ``value`` whose
    cumulative weight reaches ``q_num/q_den`` of the group's total
    (q_num=1, q_den=2 → the lower weighted median). The threshold test
    is pure integer arithmetic (``cum·q_den ≥ q_num·tot`` on long
    weights), so there is no quantile-interpolation convention to
    disagree on cross-engine, and the value itself is only ORDERED and
    MIN'd — never entered into arithmetic — so doubles pass through
    bit-identical.

    Weights must be integral (casts to long; fractional weights would
    reintroduce order-dependent double sums — scale them to integer
    units first).

    100 TB shape: collapse to VALUE grain first (``groupBy(group,
    value)``) — the running-sum window then ranks distinct values per
    group, not fact rows, so a 25-brand × billions-rows table windows
    over brands × distinct-prices only. Two exchanges, both value
    grain: the aggregate's (group, value) hash (fed map-side by the
    partial agg — the only fact-grain work) and the window's re-key
    to ``group`` alone (r12 audit; a single ``group``-keyed exchange
    would serve both but only by repartitioning BEFORE the aggregate,
    which forfeits the map-side partial over fact rows — the wrong
    trade at scale). Bounded-value-domain columns (2-decimal prices,
    integer counts) keep the window input metadata-sized; unbounded
    domains should bucket through :func:`bucketed_cumsum` instead.
    """
    return weighted_quantiles(
        df,
        value,
        weight,
        group=group,
        qs=[(q_num, q_den, out)],
        tot_out=tot_out,
    )


def weighted_quantiles(
    df: DataFrame,
    value: str,
    weight: str,
    *,
    group: list[str] | None = None,
    qs: list[tuple[int, int, str]],
    tot_out: str | None = None,
) -> DataFrame:
    """Several exact weighted quantiles from ONE value-grain pass:
    ``qs`` is ``[(q_num, q_den, out_col), …]`` — each is the same
    integer threshold test as :func:`weighted_quantile`, evaluated as
    an extra flag column over the shared cumulative window, so a
    p40/p50/p60 band costs exactly what one quantile costs (one
    exchange, two windows, one aggregate)."""
    g = list(group or [])
    vg = df.groupBy(*g, value).agg(
        F.sum(F.col(weight).cast("long")).alias("__w")
    )
    wp = Window.partitionBy(*g)
    cum = F.sum("__w").over(
        wp.orderBy(value).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    tot = F.sum("__w").over(wp)
    flags = [
        (cum * F.lit(int(q_den)) >= F.lit(int(q_num)) * tot).alias(
            f"__ok{i}"
        )
        for i, (q_num, q_den, _) in enumerate(qs)
    ]
    flagged = vg.select(
        *g, F.col(value), *flags, tot.alias("__tot")
    )
    aggs = [
        F.min(F.when(F.col(f"__ok{i}"), F.col(value))).alias(out)
        for i, (_, _, out) in enumerate(qs)
    ]
    if tot_out:
        aggs.append(F.max("__tot").alias(tot_out))
    return flagged.groupBy(*g).agg(*aggs)
