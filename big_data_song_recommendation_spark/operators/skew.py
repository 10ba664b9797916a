"""Skew mitigation for hot keys (SURVEY.md §4 item 2).

AQE's skew-join handling (on by default in session.py) splits
oversized SORT-MERGE partitions at runtime; these operators cover the
cases AQE can't:

- :func:`salted_join` — a big⋈big equi-join where one side's key
  distribution is pathological (a handful of keys own most rows).
  The skewed side gets a deterministic salt ∈ [0, S); the other side
  is replicated S×. The shuffle key becomes (key, salt), spreading
  each hot key over S reducers. Output is row-identical to the
  unsalted join.
- :func:`salted_distinct_count` — exact COUNT(DISTINCT x) per hot key
  via two-phase aggregation: (key, salt-of-value) partial distinct,
  then merge. The classic fix when one group's distinct-set state
  exceeds a single reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    *,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the SKEWED side salted and ``other`` replicated.

    The salt is derived from the whole skewed row (xxhash64 over all
    columns) so co-located duplicates still spread; replication is an
    in-plan ``explode(sequence(...))`` — no driver loops, no data
    duplication at rest. Replication factor × |other| is the cost:
    use for big⋈big where ``other`` is too large to broadcast but
    S× its shuffle volume is still cheaper than one hot reducer."""
    salted = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salts))
    )
    replicated = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    out = salted.join(replicated, [on, "__salt"], how)
    return out.drop("__salt")


def salted_distinct_count(
    df: DataFrame, key: str, value: str, *, salts: int = 32
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT value) in two shuffles, neither of
    which concentrates a hot key's state on one task:
    phase 1 groups by (key, hash(value) % S) and distinct-counts the
    shard; phase 2 sums the shard counts. Distinct values land in
    exactly one shard, so the sum is exact."""
    sharded = df.withColumn("__shard", F.pmod(F.xxhash64(F.col(value)), F.lit(salts)))
    partial = sharded.groupBy(key, "__shard").agg(
        F.countDistinct(value).alias("__partial")
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias(f"n_distinct_{value}"))


def skew_report(df: DataFrame, key_col: str, *, top_k: int = 10) -> DataFrame:
    """Key-distribution diagnostic for a prospective shuffle/join key:
    the top-``top_k`` heavy hitters with their row share and their
    ratio to the mean rows-per-key — the measurement that DECIDES
    between a plain shuffle, AQE skew-split, and :func:`salted_join`
    (a ratio_to_mean in the hundreds on a big⋈big join key is the
    signal to salt). Run it at ingest grain, not ad hoc: at 100 TB it
    is one map-side-combinable groupBy + a 1-row broadcast of the
    totals, and the top-k is a TakeOrdered, never a global sort.

    Output: (key [stringified], n, share, ratio_to_mean, rnk).
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count("*").alias("n")
    )
    stats = counts.agg(
        F.sum("n").alias("total"), F.count("*").alias("n_keys")
    )
    from pyspark.sql import Window

    from ..functions.scalars import stable_round

    top = (
        counts.crossJoin(F.broadcast(stats))
        .orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(int(top_k))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("key").asc())
    return top.select(
        "key",
        "n",
        stable_round(F.col("n") / F.col("total"), 6).alias("share"),
        stable_round(F.col("n") * F.col("n_keys") / F.col("total"), 4).alias(
            "ratio_to_mean"
        ),
    ).withColumn("rnk", F.row_number().over(w))
