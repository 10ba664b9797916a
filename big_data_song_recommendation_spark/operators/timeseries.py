"""Time-series regularization: per-key time grids, gap detection, and
forward-fill — turning an irregular event stream into the fixed-step
series a forecasting / feature pipeline consumes.

Shapes (all expression-level, scale notes inline):

- the grid is ``sequence(min_bucket, max_bucket, step)`` EXPLODED per
  key — rows generated are bounded by (span/step) per key, never a
  cross join against a global calendar;
- observed aggregates join the grid on (key, bucket) — one shuffle
  keyed exactly like the aggregation that produced them, so at scale
  the exchange is shared/aligned;
- forward-fill is ``last(value, ignorenulls=True)`` over an unbounded-
  preceding window per key — one sort within the same key
  partitioning, no self-join (the naive as-of formulation).

The reference has no time-series surface at all; this is engine
superset territory (SURVEY §2 events analytics family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketize(ts_col: str, step_seconds: int) -> Column:
    """Epoch-floor bucketing to a fixed step, returned as TIMESTAMP.
    ``timestamp_seconds(floor(epoch/step)*step)`` — engine-portable
    (DuckDB twin: ``to_timestamp(floor(epoch(ts)/step)*step)``)."""
    ep = F.col(ts_col).cast("timestamp_ltz").cast("double")
    return F.timestamp_seconds(
        (F.floor(ep / step_seconds) * step_seconds).cast("long")
    )


def gap_fill(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_agg: Column,
    *,
    step_seconds: int = 3600,
    fill: str = "forward",
) -> DataFrame:
    """Regularize to a per-key fixed-step grid.

    Aggregates ``value_agg`` per (keys, bucket), generates each key's
    dense bucket range, left-joins observations in, marks gaps, and
    fills: ``fill='forward'`` carries the last observed value,
    ``'zero'`` fills 0.0, ``'none'`` leaves NULLs.

    Output: ``(keys…, bucket, value, is_gap)``.
    """
    if fill not in ("forward", "zero", "none"):
        raise ValueError(f"unknown fill mode {fill!r}")
    b = bucketize(ts_col, step_seconds)
    obs = df.groupBy(*keys, b.alias("bucket")).agg(value_agg.alias("__v"))
    span = obs.groupBy(*keys).agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    grid = span.select(
        *keys,
        F.explode(
            F.sequence(
                "__lo", "__hi", F.expr(f"INTERVAL {int(step_seconds)} SECONDS")
            )
        ).alias("bucket"),
    )
    joined = grid.join(obs, [*keys, "bucket"], "left").withColumn(
        "is_gap", F.col("__v").isNull()
    )
    if fill == "forward":
        w = (
            Window.partitionBy(*keys)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        value = F.last("__v", ignorenulls=True).over(w)
    elif fill == "zero":
        value = F.coalesce(F.col("__v"), F.lit(0.0))
    else:
        value = F.col("__v")
    return joined.select(*keys, "bucket", value.alias("value"), "is_gap")


def mad_outliers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    *,
    n_mads: float = 3.0,
    scale: float = 1.4826,
) -> DataFrame:
    """Robust per-group outlier flagging: |x - median| > n_mads ·
    scale · MAD, where MAD = median(|x - median|). The
    median/MAD pair is the outlier detector that SURVIVES outliers
    (mean/stddev z-scores get dragged by the very points they should
    flag) — the standard metric-monitoring / sensor-cleaning rule;
    ``scale`` 1.4826 makes MAD a consistent σ estimator under
    normality.

    Shape: two grouped EXACT percentile aggregates (median, then MAD
    over the residuals) and two key-equi joins back onto the rows —
    all three shuffles share the group keying, so Catalyst aligns the
    exchanges. Exact grouped percentiles sort within each (spreadable)
    group; at extreme per-group cardinality swap in
    ``approx_percentile`` for the sketch mode.

    Output: input rows + (med, mad, is_outlier). A group whose MAD is
    0 (over half the values identical) flags only exact deviants when
    any deviation exists — the documented degenerate case: threshold
    0 means every x != median is an outlier.
    """
    keys = [F.col(k) for k in key_cols]
    med = df.groupBy(*keys).agg(
        F.percentile(F.col(value_col).cast("double"), F.lit(0.5)).alias("med")
    )
    with_med = df.join(med, key_cols)
    mad = with_med.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.percentile(
            F.abs(F.col(value_col).cast("double") - F.col("med")), F.lit(0.5)
        ).alias("mad")
    )
    return (
        with_med.join(mad, key_cols)
        .withColumn(
            "is_outlier",
            F.abs(F.col(value_col).cast("double") - F.col("med"))
            > F.lit(float(n_mads) * float(scale)) * F.col("mad"),
        )
    )


def resample_ohlc(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    id_col: str,
    *,
    step_seconds: int,
) -> DataFrame:
    """Downsample an irregular series to fixed buckets with
    open/high/low/close + count — the resample shape every metrics /
    market-data pipeline runs. Open/close are the FIRST/LAST values
    by (ts, id) within the bucket — the id tie-break makes same-
    timestamp rows deterministic in any engine (arg_min/min_by alone
    is not, which is why this uses a ranked window, not the argmin
    aggregates).

    Shape: one (key, bucket) window + one aggregate on the identical
    partitioning — Catalyst plans a single exchange for both. Output:
    key cols + (bucket, open, high, low, close, n).
    """
    b = bucketize(ts_col, step_seconds)
    keys = [F.col(k) for k in key_cols]
    with_b = df.withColumn("bucket", b)
    w = Window.partitionBy(*keys, "bucket").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    wc = Window.partitionBy(*keys, "bucket")
    ranked = with_b.select(
        *keys,
        "bucket",
        F.col(value_col).alias("__v"),
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(wc).alias("__cnt"),
    )
    return ranked.groupBy(*[F.col(k) for k in key_cols], "bucket").agg(
        F.min(F.when(F.col("__rn") == 1, F.col("__v"))).alias("open"),
        F.max("__v").alias("high"),
        F.min("__v").alias("low"),
        F.min(F.when(F.col("__rn") == F.col("__cnt"), F.col("__v"))).alias(
            "close"
        ),
        F.count("*").alias("n"),
    )


def time_weighted_avg(
    df: DataFrame,
    *,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str | None = None,
) -> DataFrame:
    """Time-weighted average of an irregular series (the TWAP / kdb
    ``wavg``-over-durations rollup): each observation holds its value
    until the NEXT observation in the same key partition, so its
    weight is that holding duration; the last observation of a
    partition has no duration and drops out.

    Returns ``keys…, n_intervals, twav``.

    Exactness contract: durations are integer microseconds
    (``unix_micros`` deltas) and the value is summed as
    ``decimal(18,6)·µs`` — order-independent exact accumulation for
    fixed-point inputs; only the final ratio goes through doubles
    (floored to 6 dp). The weight window and the rollup share the SAME
    partitioning keys, so Catalyst plans ONE exchange: the groupBy
    reuses the window's hash partitioning. Pick keys with enough
    cardinality to spread (e.g. (series, day) — a bare 5-value type
    key would funnel 1/5 of the facts through one task; the day
    component is also what bounds per-partition sort memory at 100 TB).
    """
    from ..functions.scalars import stable_round

    order: list[Column] = [F.col(ts_col)]
    if tiebreak is not None:
        order.append(F.col(tiebreak))
    w = Window.partitionBy(*keys).orderBy(*order)
    # NTZ-tolerant: the repo pins session tz to UTC (load_table), so
    # the NTZ→LTZ cast is value-preserving
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    timed = df.withColumn("__dur_us", F.lead(us).over(w) - us).filter(
        F.col("__dur_us").isNotNull()
    )
    wv = F.col(value_col).cast("decimal(18,6)") * F.col("__dur_us")
    return (
        timed.groupBy(*keys)
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum(wv).alias("__swv"),
            F.sum("__dur_us").alias("__sw"),
        )
        .select(
            *keys,
            "n_intervals",
            stable_round(
                F.col("__swv").cast("double") / F.col("__sw").cast("double"),
                6,
            ).alias("twav"),
        )
    )
