"""Point-in-interval (range) join — an operator the reference cannot
express (its pandas loops cap at 10k rows, ref src/app_optimized.py:149)
and Spark only plans as BroadcastNestedLoopJoin when written naively.

``interval_join`` rewrites ``p.ts BETWEEN i.start AND i.end`` as an
EQUI-join on a time bucket:

- ``F.sequence(floor(start/w), floor(end/w))`` explodes each interval
  into EVERY bucket it spans, so the rewrite is correct for any
  interval length; ``bucket_seconds`` >= the longest interval merely
  bounds the fan-out at <= 2 bucket rows per interval;
- each point lands in exactly ONE bucket, so the equi-join emits no
  duplicate (point, interval) candidates and needs no post-dedup;
- the band predicate re-applies exactly on the candidates.

This is the shape that survives 100 TB: a hash-partitioned shuffle on
the bucket key with AQE skew splitting, instead of a nested-loop whose
work is |points| x |intervals|. When the interval side is small Spark
still broadcasts the exploded buckets — same plan, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fresh_col(name: str, *dfs: DataFrame) -> str:
    """A column name not present in any input schema (ADVICE r2: a
    hardcoded temp name silently corrupted callers that already had
    it)."""
    taken = {c for df in dfs for c in df.columns}
    cand = name
    i = 0
    while cand in taken:
        i += 1
        cand = f"{name}{i}"
    return cand


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
    end_exclusive: bool = True,
    allow_long_intervals: bool = False,
) -> DataFrame:
    """Inner-join each point row to every interval row whose
    ``[start, end)`` (or ``[start, end]`` when ``end_exclusive=False``)
    contains ``point_ts``. All columns of both sides survive; name
    collisions are the caller's to resolve beforehand.

    The sequence-explode enumerates every bucket an interval spans, so
    results are correct for ANY interval length. ``bucket_seconds`` is
    a COST cap, not a correctness bound: an interval longer than one
    bucket explodes into >2 rows (an interval spanning k buckets costs
    k candidate rows). By default intervals longer than
    ``bucket_seconds`` fail closed with a per-row ``raise_error`` so a
    mis-sized width surfaces as an error instead of a silent fan-out
    blowup; pass ``allow_long_intervals=True`` to accept the extra
    rows knowingly (results stay exact either way).
    """
    w = F.lit(int(bucket_seconds))

    def _sec(df: DataFrame, name: str) -> Column:
        # TIMESTAMP_NTZ (Spark 4 parquet inference) cannot cast to
        # long directly; the timestamp_ltz hop is legal from every
        # timestamp flavor and a no-op for numerics-as-seconds.
        if dict(df.dtypes)[name].startswith("timestamp"):
            return F.col(name).cast("timestamp_ltz").cast("long")
        return F.col(name).cast("long")

    start_s = _sec(intervals, start_col)
    end_s = _sec(intervals, end_col)

    bucket = _fresh_col("__bucket", points, intervals)
    seq = F.sequence(F.floor(start_s / w), F.floor(end_s / w))
    if allow_long_intervals:
        exploded = seq
    else:
        exploded = F.when(
            end_s - start_s > w,
            # fan-out cap: fail instead of silently exploding k rows
            F.raise_error(
                F.lit(
                    "interval_join: interval longer than "
                    f"bucket_seconds={int(bucket_seconds)}; pass "
                    "allow_long_intervals=True to accept the fan-out"
                )
            ).cast("array<bigint>"),
        ).otherwise(seq)

    iv = intervals.withColumn(bucket, F.explode(exploded))
    pt = points.withColumn(bucket, F.floor(_sec(points, point_ts) / w))

    upper = (
        F.col(point_ts) < F.col(end_col)
        if end_exclusive
        else F.col(point_ts) <= F.col(end_col)
    )
    return (
        pt.join(iv, on=bucket, how="inner")
        .filter((F.col(point_ts) >= F.col(start_col)) & upper)
        .drop(bucket)
    )
