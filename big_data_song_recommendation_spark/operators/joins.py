"""Join operators (SURVEY.md §2.3, J1-J6).

Every dimension join broadcasts the small side explicitly — at 100 TB
the fact table never shuffles for a dim lookup. The fuzzy tiers of J4
are confined to broadcast-size dimensions by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import normalize_key


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Column,
    how: str = "left",
) -> DataFrame:
    """J1/J2: fact ⋈ broadcast(dim). The reference pre-renamed
    conflicting columns (``src/spark/training.py:173-188``); callers
    here pass pre-projected dims for the same reason."""
    return fact.join(F.broadcast(dim), on, how)


def normalized_key_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    how: str = "left",
) -> DataFrame:
    """J3: equi-join on lower(trim(key)) — the tracks⋈emotions
    name join (``src/spark/training.py:211-228``) without its
    case-sensitivity bug."""
    return left.join(
        F.broadcast(right),
        normalize_key(left[left_key]) == normalize_key(right[right_key]),
        how,
    )


def fuzzy_lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    payload: str,
    fallback: Column | None = None,
) -> DataFrame:
    """J4: tiered lookup — exact normalized match, then bidirectional
    substring containment, then an optional computed fallback
    (``src/data_processor.py:137-162``).

    The dim side must be broadcast-small (the reference's emotion map
    is); the containment tier is a broadcast nested-loop theta-join,
    which is acceptable only because dim is tiny — this mirrors the
    reference's O(n·m) scan but distributes the fact side.

    Adds column ``payload`` (from dim) filled by the first tier that
    matches; ``{payload}_match_tier`` records which tier fired
    (exact/contains/fallback/none).
    """
    fact = fact.withColumn("__fid", F.monotonically_increasing_id())
    fk = normalize_key(F.col(fact_key))

    # tier 1: exact normalized equi-join (unique dim key, no fan-out)
    d1 = dim.select(
        normalize_key(F.col(dim_key)).alias("__dk"),
        F.col(payload).alias("__exact_payload"),
    ).dropDuplicates(["__dk"])
    out = fact.join(F.broadcast(d1), fk == F.col("__dk"), "left").drop("__dk")

    # tier 2: bidirectional containment for tier-1 misses only. The
    # theta-join can multi-match, so resolve deterministically (min)
    # per fact row and join the resolution back on __fid.
    misses = out.filter(F.col("__exact_payload").isNull()).select("__fid", F.col(fact_key))
    d2 = dim.select(
        normalize_key(F.col(dim_key)).alias("__ck"),
        F.col(payload).alias("__contains_payload"),
    ).dropDuplicates(["__ck"])
    mk = normalize_key(F.col(fact_key))
    tier2 = (
        misses.join(
            F.broadcast(d2), mk.contains(F.col("__ck")) | F.col("__ck").contains(mk)
        )
        .groupBy("__fid")
        .agg(F.min("__contains_payload").alias("__contains_payload"))
    )
    out = out.join(tier2, "__fid", "left")

    value = F.coalesce(
        F.col("__exact_payload"),
        F.col("__contains_payload"),
        *([fallback] if fallback is not None else []),
    )
    tier = (
        F.when(F.col("__exact_payload").isNotNull(), "exact")
        .when(F.col("__contains_payload").isNotNull(), "contains")
        .when(F.lit(fallback is not None) & value.isNotNull(), "fallback")
        .otherwise("none")
    )
    return (
        out.withColumn(payload, value)
        .withColumn(f"{payload}_match_tier", tier)
        .drop("__fid", "__exact_payload", "__contains_payload")
    )


def positional_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """J6 done right: join by row position via row_number (the
    reference used a modulo into a collected list,
    ``src/app.py:233-245``)."""
    from pyspark.sql import Window

    lw = left.withColumn(
        "__pos", F.row_number().over(Window.orderBy(F.monotonically_increasing_id()))
    )
    rw = right.withColumn(
        "__pos", F.row_number().over(Window.orderBy(F.monotonically_increasing_id()))
    )
    return lw.join(rw, "__pos", "inner").drop("__pos")
