"""Point-in-interval (range) join — an operator the reference cannot
express (its pandas loops cap at 10k rows, ref src/app_optimized.py:149)
and Spark only plans as BroadcastNestedLoopJoin when written naively.

``interval_join`` rewrites ``p.ts BETWEEN i.start AND i.end`` as an
EQUI-join on a time bucket:

- pick a bucket width >= the longest interval (caller-supplied; it is a
  schema-level contract like a watermark, not a data scan);
- each interval explodes into the buckets it covers (<= 2 buckets when
  the width bound holds);
- each point lands in exactly ONE bucket, so the equi-join emits no
  duplicate (point, interval) candidates and needs no post-dedup;
- the band predicate re-applies exactly on the candidates.

This is the shape that survives 100 TB: a hash-partitioned shuffle on
``__bucket`` with AQE skew splitting, instead of a nested-loop whose
work is |points| x |intervals|. When the interval side is small Spark
still broadcasts the exploded buckets — same plan, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
    end_exclusive: bool = True,
) -> DataFrame:
    """Inner-join each point row to every interval row whose
    ``[start, end)`` (or ``[start, end]`` when ``end_exclusive=False``)
    contains ``point_ts``. All columns of both sides survive; name
    collisions are the caller's to resolve beforehand.

    ``bucket_seconds`` must be >= the longest interval's length or
    candidates would be silently missed — enforced fail-closed with a
    per-row ``raise_error`` guard (a filter, costing nothing extra:
    it rides the same projection that computes the bucket span).
    """
    w = F.lit(int(bucket_seconds))
    start_s = F.col(start_col).cast("long")
    end_s = F.col(end_col).cast("long")

    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.when(
                end_s - start_s > w,
                # fail closed instead of silently dropping matches
                F.raise_error(
                    F.lit(
                        "interval_join: interval longer than "
                        f"bucket_seconds={int(bucket_seconds)}"
                    )
                ).cast("array<bigint>"),
            ).otherwise(F.sequence(F.floor(start_s / w), F.floor(end_s / w)))
        ),
    )
    pt = points.withColumn(
        "__bucket", F.floor(F.col(point_ts).cast("long") / w)
    )

    upper = (
        F.col(point_ts) < F.col(end_col)
        if end_exclusive
        else F.col(point_ts) <= F.col(end_col)
    )
    return (
        pt.join(iv, on="__bucket", how="inner")
        .filter((F.col(point_ts) >= F.col(start_col)) & upper)
        .drop("__bucket")
    )
