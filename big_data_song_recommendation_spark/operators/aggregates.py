"""Aggregation operators (SURVEY.md §2.4-§2.6, A1-A11, O1-O6).

All single-shuffle shapes; the reference computed these with Python
loops over collected lists (``src/streaming_service.py:306-382``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def histogram(df: DataFrame, col: str, count_name: str = "n") -> DataFrame:
    """A6: frequency histogram (emotion/action distribution)."""
    return df.groupBy(col).agg(F.count("*").alias(count_name))


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """O1-O3: global top-k. Spark compiles orderBy+limit into
    TakeOrderedAndProject — no full sort, per-partition heaps only.
    Pass a total order (tie-break on a key) for determinism."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    k: int,
    rank_name: str = "rnk",
) -> DataFrame:
    """A7/A9/§2.5: top-k per group via row_number window. One shuffle
    on the group key; state per group is O(k) after AQE."""
    w = Window.partitionBy(*group).orderBy(*order)
    return df.withColumn(rank_name, F.row_number().over(w)).filter(
        F.col(rank_name) <= k
    )


def top_k_per_group_salted(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    k: int,
    *,
    salt_col: Column,
    salt_buckets: int = 64,
    rank_name: str = "rnk",
) -> DataFrame:
    """Two-phase top-k per LOW-CARDINALITY group: a plain group-keyed
    window funnels 1/|groups| of the table through one task each.
    Phase 1 takes the top-k within each (group, salt) slice — the
    exact top-k rows of a group are each top-k within their own slice,
    so no qualifying row is lost; phase 2 re-ranks only the
    |groups|·salt_buckets·k survivors. ``salt_col`` must be
    DETERMINISTIC (hash a unique id — never rand()/partition id, which
    break re-execution and oracle reproducibility).
    """
    salted = df.withColumn(
        "__salt", F.pmod(salt_col, F.lit(int(salt_buckets)))
    )
    w1 = Window.partitionBy(*group, "__salt").orderBy(*order)
    survivors = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__salt", "__r1")
    )
    w2 = Window.partitionBy(*group).orderBy(*order)
    return survivors.withColumn(rank_name, F.row_number().over(w2)).filter(
        F.col(rank_name) <= k
    )


def argmax_per_group(
    df: DataFrame, group: list[str], order_col: str, payload: list[str]
) -> DataFrame:
    """A9: per-group argmax carrying payload columns (the reference's
    'featured tracks': per-track max rating + display struct) via
    ``max_by`` — single aggregation, no self-join."""
    aggs = [F.max(order_col).alias(f"max_{order_col}")] + [
        F.max_by(p, order_col).alias(p) for p in payload
    ]
    return df.groupBy(*group).agg(*aggs)


def distinct_count(
    df: DataFrame, group: list[str], col: str, *, approx: bool = False, rsd: float = 0.05
) -> DataFrame:
    """A3: distinct counts. ``approx=True`` switches to HyperLogLog++
    (`approx_count_distinct`) — the only sane option at 100 TB; exact
    mode exists for oracle-checked correctness queries."""
    agg = (
        F.approx_count_distinct(col, rsd) if approx else F.countDistinct(col)
    ).alias(f"n_{col}")
    return df.groupBy(*group).agg(agg)


def paginate(
    df: DataFrame, sort: list[Column], limit: int, offset: int = 0
) -> DataFrame:
    """O4: keyset-ordered limit/offset (the `/songs` endpoint). The
    reference collected limit+offset rows to the driver and sliced in
    Python (``src/app.py:175-183``); Spark 3.4+ pushes offset into the
    plan."""
    out = df.orderBy(*sort)
    if offset:
        out = out.offset(offset)
    return out.limit(limit)


def chi_square(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns — the standard drift / association check a feature
    pipeline runs between a dimension and an outcome (is priority
    independent of status?). Expression-level (not MLlib's
    ``ChiSquareTest``) so the statistic is ORACLE-checkable.

    ``chi2 = Σ_cells (o - e)²/e`` with ``e = row_total·col_total/N``,
    summed over the FULL r×c cross (empty cells contribute ``e`` —
    deriving cells from observed pairs only understates the
    statistic). Shape: one (a,b) aggregate at data grain; everything
    after runs on the r×c contingency table (catalog-bounded, not
    data-bounded) — the cross join and the totals broadcast are dim-
    sized. Output: 1 row (n, r, c, dof, chi2).

    CONTRACT: rows with a NULL in either column are EXCLUDED up front
    (the standard complete-case test). Without the filter a NULL group
    would be counted in the marginals/N but could never equi-join back
    onto the r×c cross, silently inflating chi2 (ADVICE r4).
    """
    from ..functions.scalars import stable_round

    obs = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .agg(F.count("*").alias("o"))
    )
    ra = obs.groupBy("a").agg(F.sum("o").alias("ra"))
    cb = obs.groupBy("b").agg(F.sum("o").alias("cb"))
    nn = obs.agg(F.sum("o").alias("n"))
    cells = (
        ra.crossJoin(cb)
        .join(obs, ["a", "b"], "left")
        .crossJoin(F.broadcast(nn))
    )
    e = F.col("ra") * F.col("cb") / F.col("n")
    d = F.coalesce(F.col("o"), F.lit(0)) - e
    return cells.agg(
        F.max("n").alias("n"),
        F.countDistinct("a").alias("r"),
        F.countDistinct("b").alias("c"),
        ((F.countDistinct("a") - 1) * (F.countDistinct("b") - 1)).alias("dof"),
        stable_round(F.sum(d * d / e), 4).alias("chi2"),
    )


def equi_width_histogram(
    df: DataFrame, col: str, *, bins: int = 10
) -> DataFrame:
    """Equi-width histogram with DATA-DERIVED edges: global min/max
    fold in as a 1-row broadcast (never a driver-side action), each
    row bins via pure per-row float arithmetic — order-independent,
    so cross-engine bit parity holds without rounding tricks. The
    top edge closes the last bin (``least(bins-1, ...)``), the
    degenerate min==max table lands wholly in bin 0.

    One scan + a tiny broadcast + one combinable groupBy — the shape
    survives any scale. Output: (bin, lo_edge, hi_edge, n) for
    non-empty bins.
    """
    from ..functions.scalars import stable_round

    b = int(bins)
    x = F.col(col).cast("double")
    stats = df.agg(
        F.min(x).alias("__lo"), F.max(x).alias("__hi")
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(b))
    bin_ = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(b - 1),
            F.floor((x - F.col("__lo")) * F.lit(float(b))
                    / (F.col("__hi") - F.col("__lo"))),
        )
    ).cast("int")
    grouped = (
        df.crossJoin(F.broadcast(stats))
        .withColumn("bin", bin_)
        .groupBy("bin")
        .agg(
            F.first("__lo").alias("__lo"),
            F.first("__hi").alias("__hi"),
            F.count("*").alias("n"),
        )
    )
    return grouped.select(
        "bin",
        stable_round(F.col("__lo") + F.col("bin") * width, 4).alias("lo_edge"),
        stable_round(
            F.col("__lo") + (F.col("bin") + 1) * width, 4
        ).alias("hi_edge"),
        "n",
    )


def gini_index(df: DataFrame, value_col: str, id_col: str) -> DataFrame:
    """Gini concentration index over an ENTITY-grain value table →
    1 row (n, total, gini) — the inequality measure a revenue/usage
    dashboard reports (0 = uniform, →1 = winner-takes-all), and a
    skew summary complementing :func:`~..operators.skew.skew_report`.

    ``gini = 2·Σ iˣ·xᵢ / (n·Σx) − (n+1)/n`` with x ascending (ties
    broken on the id for determinism). Rank·value products and totals
    are summed as EXACT decimals, so only the final closed-form
    division touches floats — bit-identical cross-engine.

    The ranking needs a TOTAL order, delivered distributed: the
    two-phase :func:`~.ranks.bucketed_rank` over equi-DEPTH value
    buckets (approx_percentile edges → per-bucket counts → offset
    prefix-sum → partitioned local ranks) — no single-partition window
    ever touches the entity rows, so the shape survives any entity
    count. Equi-depth, not equi-width: the values a Gini is computed
    ON are by definition heavy-tailed (that's what it measures), so
    width-based bins would pile most entities into bin 0 while depth
    bins hold ~n/bins rows each whatever the distribution (r5 ADVICE).
    Bucket edges only shift BOUNDARIES, never rank values — the
    result is bit-identical under either scheme.
    """
    from ..functions.scalars import stable_round
    from .ranks import bucketed_rank, with_equi_depth_bucket

    x = F.col(value_col).cast("decimal(18,2)")
    # entity table is consumed by the bucket-stats agg AND the bucket
    # join — cut its (often join-heavy) lineage once
    ent = df.select(F.col(value_col), F.col(id_col)).localCheckpoint(
        eager=False
    )
    b = with_equi_depth_bucket(ent, value_col)
    ranked = bucketed_rank(
        b,
        [F.col(value_col).asc(), F.col(id_col).asc()],
        ["__vb"],
        out="__i",
    ).select(x.alias("__x"), "__i")
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum("__x").alias("__s"),
        F.sum(F.col("__i") * F.col("__x")).alias("__w"),
    )
    s_d = F.col("__s").cast("double")
    w_d = F.col("__w").cast("double")
    return agg.select(
        "n",
        s_d.alias("total"),
        stable_round(
            (F.lit(2.0) * w_d) / (F.col("n") * s_d)
            - (F.col("n") + 1) / F.col("n"),
            6,
        ).alias("gini"),
    )


def linear_fit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group OLS ``y = intercept + slope·x`` via the closed-form
    normal equations over five sums in ONE combinable aggregate — the
    trend/fit primitive for drift monitors (daily volume trends) and
    distribution diagnostics (Zipf log-log slope). Expression-level,
    not MLlib, so the statistics are oracle-checkable.

    Degenerate groups come back NULL, never an ANSI divide error:
    constant x → slope/intercept/r2 NULL; constant y (den_y = 0) →
    r2 NULL. Output: group cols + (n, slope, intercept, r2).
    """
    from ..functions.scalars import stable_round

    g = list(group_cols or [])
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    agg = df.groupBy(*[F.col(c) for c in g]).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = F.when(den != 0, num / den)
    intercept = F.when(
        den != 0, (F.col("sy") - (num / den) * F.col("sx")) / F.col("n")
    )
    r2 = F.when((den != 0) & (den_y != 0), (num * num) / (den * den_y))
    return agg.select(
        *[F.col(c) for c in g],
        "n",
        stable_round(slope, 4).alias("slope"),
        stable_round(intercept, 4).alias("intercept"),
        stable_round(r2, 4).alias("r2"),
    )


def mutual_information(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Mutual information (and entropies) between two categorical
    columns — the information-theoretic association measure that,
    unlike :func:`chi_square`'s significance test, quantifies HOW MUCH
    one column tells you about the other (feature-relevance ranking,
    redundant-dimension detection). ``nmi`` normalizes by
    ``min(H(a), H(b))`` → [0, 1].

    Only observed cells contribute (0·log 0 = 0), so the data-grain
    work is ONE (a, b) aggregate; every log/ratio runs on the
    catalog-bounded contingency table. Output: 1 row
    (n, h_a, h_b, h_ab, mi, nmi).

    CONTRACT: rows with a NULL in either column are EXCLUDED up front
    (complete-case, same as :func:`chi_square`): a NULL cell would be
    dropped by the marginal equi-joins while still counted in N, so
    probabilities would no longer sum to 1 (ADVICE r4).
    """
    from ..functions.scalars import stable_round

    obs = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .agg(F.count("*").alias("o"))
    )
    ra = obs.groupBy("a").agg(F.sum("o").alias("ra"))
    cb = obs.groupBy("b").agg(F.sum("o").alias("cb"))
    nn = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(F.broadcast(ra), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(nn))
    )
    p_ab = F.col("o") / F.col("n")
    h_ab = -F.sum(p_ab * F.log2(p_ab))
    mi = F.sum(
        p_ab
        * F.log2(
            (F.col("o") * F.col("n"))
            / (F.col("ra") * F.col("cb"))
        )
    )
    marg_a = ra.crossJoin(F.broadcast(nn)).agg(
        (-F.sum((F.col("ra") / F.col("n")) * F.log2(F.col("ra") / F.col("n"))))
        .alias("h_a")
    )
    marg_b = cb.crossJoin(F.broadcast(nn)).agg(
        (-F.sum((F.col("cb") / F.col("n")) * F.log2(F.col("cb") / F.col("n"))))
        .alias("h_b")
    )
    joint = cells.agg(
        F.max("n").alias("n"), h_ab.alias("h_ab"), mi.alias("mi")
    )
    return (
        joint.crossJoin(F.broadcast(marg_a))
        .crossJoin(F.broadcast(marg_b))
        .select(
            "n",
            stable_round("h_a", 4).alias("h_a"),
            stable_round("h_b", 4).alias("h_b"),
            stable_round("h_ab", 4).alias("h_ab"),
            stable_round("mi", 4).alias("mi"),
            stable_round(
                F.when(
                    F.least(F.col("h_a"), F.col("h_b")) > 0,
                    F.col("mi") / F.least(F.col("h_a"), F.col("h_b")),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("nmi"),
        )
    )


# ---------------------------------------------------------------------------
# incremental aggregate maintenance (partial-aggregate IVM)
# ---------------------------------------------------------------------------

#: measure kinds whose partial states merge associatively
MERGEABLE_KINDS = ("sum", "count", "min", "max")


def summarize(
    df: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """Partial-aggregate summary table — the materialized-view state
    the incremental pattern maintains. ``measures`` maps output column
    → ``(kind, source_col)`` with kind in sum/count/min/max (count
    ignores its source). ``avg`` is intentionally absent: store
    (sum, count) and derive it at read time — averages do not merge,
    their components do. Distinct counts don't merge either; store HLL
    state instead (operators/sketches.sketch_rollup — same contract).
    """
    aggs = []
    for out, (kind, src) in measures.items():
        if kind == "sum":
            aggs.append(F.sum(src).alias(out))
        elif kind == "count":
            aggs.append(F.count(F.lit(1)).alias(out))
        elif kind == "min":
            aggs.append(F.min(src).alias(out))
        elif kind == "max":
            aggs.append(F.max(src).alias(out))
        else:
            raise ValueError(
                f"unmergeable measure kind {kind!r}; expected one of "
                f"{MERGEABLE_KINDS}"
            )
    return df.groupBy(*keys).agg(*aggs)


def merge_summaries(
    mv: DataFrame,
    delta: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Fold a delta summary into the materialized state: sums and
    counts ADD (so an insert-only refresh is one union + re-aggregate
    of two summary tables — never a rescan of the base), min/max take
    min/max. Refresh cost is proportional to the DELTA's key set, not
    the view.

    Retraction contract: deletes are handled for sum/count by feeding
    a delta summarized from the removed rows with NEGATED sums/counts
    (additive groups retract); min/max are NOT retractable — a delete
    touching a group's current extremum requires recomputing that
    group from base data (the standard IVM limitation; Flink solves it
    with per-group state, a batch view solves it with a targeted
    re-aggregate of the affected keys)."""
    both = mv.unionByName(delta)
    aggs = []
    for out, (kind, _src) in measures.items():
        if kind in ("sum", "count"):
            aggs.append(F.sum(out).alias(out))
        elif kind == "min":
            aggs.append(F.min(out).alias(out))
        elif kind == "max":
            aggs.append(F.max(out).alias(out))
        else:
            raise ValueError(f"unmergeable measure kind {kind!r}")
    return both.groupBy(*keys).agg(*aggs)
